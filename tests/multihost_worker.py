"""Worker process for tests/test_multihost.py.

Usage: python tests/multihost_worker.py RANK COORDINATOR TP

Joins a 2-process gloo group with 2 local CPU devices, builds the global
('dp','tp') mesh, and checks a tiny-UNet forward and one adamw training
step over the process group against the locally-computed full-batch
single-process result (deterministic data; replicated params)."""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("XLA_FLAGS", None)  # parent suite forces 8 virtual devices

from stroke_derenderer_tpu.utils import honor_platform_env  # noqa: E402

honor_platform_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from stroke_derenderer_tpu.config import BinarizerConfig  # noqa: E402
from stroke_derenderer_tpu.parallel.multihost import (  # noqa: E402
    fold_in_process, global_mesh, initialize, shard_host_batch,
)
from stroke_derenderer_tpu.train import binarize_loss  # noqa: E402
from stroke_derenderer_tpu.weights.store import (  # noqa: E402
    init_binarizer_variables,
)


def main() -> None:
    rank, coord, tp = int(sys.argv[1]), sys.argv[2], int(sys.argv[3])
    initialize(coord, num_processes=2, process_id=rank,
               local_device_count=2)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4
    mesh = global_mesh(tp=tp)
    assert mesh.shape["dp"] * mesh.shape["tp"] == 4

    cfg = BinarizerConfig(features=(8,), bottleneck=16, height=16, width=48,
                          compute_dtype="float32")
    model, variables = init_binarizer_variables(cfg, seed=0)

    # Deterministic global batch; every process builds only ITS rows.
    full = np.stack([
        np.random.default_rng(100 + i).uniform(0, 1, (16, 48, 3))
        for i in range(4)
    ]).astype(np.float32)
    masks = (full[..., :1] > 0.5).astype(np.float32)
    local_sl = slice(rank * 2, rank * 2 + 2)

    repl = NamedSharding(mesh, P())
    variables_g = jax.device_put(variables, repl)
    x_g = shard_host_batch(mesh, full[local_sl])
    y_g = shard_host_batch(mesh, masks[local_sl])

    @jax.jit
    def fwd_mean(v, x):
        return jnp.mean(model.apply(v, x))

    got = float(fwd_mean(variables_g, x_g))
    want = float(fwd_mean(variables, jnp.asarray(full)))
    assert abs(got - want) < 1e-5, (got, want)

    tx = optax.adamw(1e-3)

    def loss_fn(params, x, y):
        probs = model.apply({"params": params}, x)
        return binarize_loss(probs, y)

    @jax.jit
    def step(params, opt_state, x, y):
        loss, grads = jax.value_and_grad(loss_fn)(params, x, y)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params_g = variables_g["params"]
    opt_g = jax.device_put(tx.init(variables["params"]), repl)
    new_g, _, loss_g = step(params_g, opt_g, x_g, y_g)

    new_l, _, loss_l = step(variables["params"], tx.init(variables["params"]),
                            jnp.asarray(full), jnp.asarray(masks))
    assert abs(float(loss_g) - float(loss_l)) < 1e-5
    mean_g = float(jnp.mean(jnp.concatenate(
        [v.reshape(-1) for v in jax.tree_util.tree_leaves(new_g)])))
    mean_l = float(jnp.mean(jnp.concatenate(
        [v.reshape(-1) for v in jax.tree_util.tree_leaves(new_l)])))
    assert abs(mean_g - mean_l) < 1e-6, (mean_g, mean_l)

    assert fold_in_process(7) == 7 + rank * 100_003

    # The REAL train loop over the process group, including the
    # checkpoint/export path (host-gather of sharded state + process-0
    # writer): under tp>=2 the params are tp-sharded AND dp-replicated
    # across hosts — serializing them without the gather crashes.
    out_dir = sys.argv[4]
    from stroke_derenderer_tpu.train.loop import train_binarizer
    train_binarizer(cfg, steps=2, batch_size=2, out_dir=out_dir,
                    ckpt_every=1, log_every=1, mesh=mesh)
    from pathlib import Path as _P
    if rank == 0:
        assert (_P(out_dir) / "binarizer.msgpack").exists()
        assert (_P(out_dir) / "ckpt_binarizer").exists()

    print(f"WORKER-OK {rank} dp={mesh.shape['dp']} tp={mesh.shape['tp']} "
          f"loss={float(loss_g):.5f}", flush=True)


if __name__ == "__main__":
    main()
