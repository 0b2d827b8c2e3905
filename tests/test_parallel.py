"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import importlib.util

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from stroke_derenderer_tpu.parallel import make_mesh, batch_sharding, shard_params


def test_mesh_shapes():
    mesh = make_mesh(8, tp=2)
    assert mesh.shape == {"dp": 4, "tp": 2}
    mesh = make_mesh(8)
    assert mesh.shape == {"dp": 8, "tp": 1}


def test_sharded_binarizer_forward_matches_single_device():
    from stroke_derenderer_tpu.config import BinarizerConfig
    from stroke_derenderer_tpu.weights.store import init_binarizer_variables

    cfg = BinarizerConfig(features=(8, 16), bottleneck=32,
                          height=32, width=96, compute_dtype="float32")
    model, variables = init_binarizer_variables(cfg, seed=0)
    x = jax.random.uniform(jax.random.PRNGKey(1), (8, 32, 96, 3))

    ref = np.asarray(model.apply(variables, x))

    mesh = make_mesh(8, tp=2)
    vs = {"params": shard_params(variables["params"], mesh)}
    xs = jax.device_put(x, batch_sharding(mesh, x.ndim))
    with mesh:
        out = np.asarray(jax.jit(model.apply)(vs, xs))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_sharded_decode_matches_single_device():
    from stroke_derenderer_tpu.models import AttentiveDecoder, greedy_decode

    dec = AttentiveDecoder(vocab_size=51, embed_dim=8, attention_dim=8,
                           decoder_dim=8, encoder_dim=16, dtype=jnp.float32)
    v = dec.init(jax.random.PRNGKey(0), jnp.zeros((1, 9, 16)),
                 jnp.zeros((1, 3), jnp.int32))
    enc = jax.random.normal(jax.random.PRNGKey(2), (8, 9, 16))
    ref = np.asarray(greedy_decode(dec, v, enc, 10))

    mesh = make_mesh(8)  # pure dp
    encs = jax.device_put(enc, NamedSharding(mesh, P("dp", None, None)))
    with mesh:
        out = np.asarray(jax.jit(
            lambda e: greedy_decode(dec, v, e, 10))(encs))
    assert np.array_equal(out, ref)


# Slow tier: the driver itself executes dryrun_multichip(8) and the entry
# compile check every round (MULTICHIP_r0N.json), so the default tier
# duplicating its ~8 min of single-core compile buys no extra coverage.
# Run with --runslow before touching __graft_entry__ or the parallel layer.
@pytest.mark.slow
@pytest.mark.parametrize("n", [8, 4, 2, 1])
def test_graft_dryrun(n):
    spec = importlib.util.spec_from_file_location(
        "graft_entry", "/root/repo/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(n)


@pytest.mark.slow  # driver-duplicated (see test_graft_dryrun note)
def test_graft_entry_compiles():
    spec = importlib.util.spec_from_file_location(
        "graft_entry", "/root/repo/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    jax.jit(fn).lower(*args).compile()
