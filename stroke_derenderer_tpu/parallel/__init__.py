from stroke_derenderer_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, batch_sharding, replicate, tile_sharding,
    binarizer_param_spec, decoder_param_spec, shard_params,
)
from stroke_derenderer_tpu.parallel.two_stage import TwoStagePipeline  # noqa: F401
from stroke_derenderer_tpu.parallel import multihost  # noqa: F401
