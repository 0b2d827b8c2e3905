"""Device mesh + sharding layout.

The reference is a single-process CPU script with zero distributed code
(SURVEY.md §2.4); scaling here is native JAX SPMD: a ('dp', 'tp') mesh over
ICI, batch axes sharded on 'dp', and the widest weight matrices sharded on
'tp' so XLA inserts the all-gathers/psums. There is no custom comm layer to
write — collectives ride the compiler.

Layout choices (see train/steps.py for use):
  * tile/glyph batch axes  -> P('dp')   (inference and training)
  * UNet conv kernels      -> P(..., 'tp') on the output-channel axis;
    activations re-shard per-layer automatically under GSPMD
  * decoder embedding      -> P('tp', None)  (vocab-sharded lookup)
  * decoder vocab head     -> P(None, 'tp')  (column-parallel matmul)
  * everything else        -> replicated
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, dp: int | None = None,
              tp: int = 1) -> Mesh:
    """Build a ('dp', 'tp') mesh. Defaults: tp=1, dp=all devices."""
    devices = jax.devices()
    n = n_devices or len(devices)
    if dp is None:
        dp = n // tp
    assert dp * tp == n, f"dp*tp ({dp}*{tp}) != n_devices ({n})"
    arr = np.asarray(devices[:n]).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch) axis on 'dp', replicate the rest."""
    return NamedSharding(mesh, P("dp", *([None] * (ndim - 1))))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def tile_sharding(mesh: Mesh, ndim: int, width: int) -> NamedSharding:
    """Sharding for NHWC tile batches: batch on 'dp' and — when the mesh
    has a tp extent that divides the tile width — the WIDTH axis on 'tp'
    (sequence parallelism over the line's pixel-width axis; the UNet's
    convs get their halo exchanges from GSPMD). Falls back to dp-only."""
    tp = int(mesh.shape["tp"])
    if ndim == 4 and tp > 1 and width % tp == 0:
        return NamedSharding(mesh, P("dp", None, "tp", None))
    return batch_sharding(mesh, ndim)


# ------------------------- parameter partitioning -------------------------

def _spec_for_path(path: str, leaf) -> P:
    """Heuristic tensor-parallel layout from a flax param path."""
    if leaf.ndim == 4 and path.endswith("kernel"):       # conv (kh,kw,cin,cout)
        return P(None, None, None, "tp")
    if "embedding" in path and leaf.ndim == 2:           # (vocab, embed)
        return P("tp", None)
    if path.endswith(("fc/kernel", "enc_att/kernel")) and leaf.ndim == 2:
        return P(None, "tp")                              # column-parallel
    return P()


def _flatten_with_paths(tree):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    paths = ["/".join(str(getattr(k, "key", k)) for k in path)
             for path, _ in flat]
    leaves = [leaf for _, leaf in flat]
    return paths, leaves, treedef


def param_partition_specs(params) -> "jax.tree_util.PyTreeDef":
    """PartitionSpec pytree matching ``params``."""
    paths, leaves, treedef = _flatten_with_paths(params)
    specs = [_spec_for_path(p, l) for p, l in zip(paths, leaves)]
    return jax.tree_util.tree_unflatten(treedef, specs)


def binarizer_param_spec(params):
    return param_partition_specs(params)


def decoder_param_spec(params):
    return param_partition_specs(params)


def shard_params(params, mesh: Mesh):
    """device_put params with their tensor-parallel layout. Dimensions not
    divisible by the 'tp' extent fall back to replication."""
    tp = mesh.shape["tp"]

    def place(path_spec, leaf):
        spec = path_spec
        # Replicate anything tp doesn't divide evenly.
        for axis, name in enumerate(spec):
            if name == "tp" and leaf.shape[axis] % tp != 0:
                spec = P()
                break
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    specs = param_partition_specs(params)
    return jax.tree.map(place, specs, params,
                        is_leaf=lambda x: isinstance(x, P))
