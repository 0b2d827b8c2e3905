from stroke_derenderer_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, batch_sharding, replicate, tile_sharding,
    binarizer_param_spec, decoder_param_spec, shard_params,
)


def __getattr__(name):  # lazy: two_stage pulls the full pipeline/model
    # stack and multihost pulls jax.distributed — neither belongs in the
    # import path of mesh-only consumers (train loop, bench).
    if name == "TwoStagePipeline":
        from stroke_derenderer_tpu.parallel.two_stage import TwoStagePipeline
        return TwoStagePipeline
    if name == "multihost":
        from stroke_derenderer_tpu.parallel import multihost
        return multihost
    raise AttributeError(name)
