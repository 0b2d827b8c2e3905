from stroke_derenderer_tpu.models.unet import AttentionUNet  # noqa: F401
from stroke_derenderer_tpu.models.encoder import ResNetEncoder, encode_postprocess  # noqa: F401
from stroke_derenderer_tpu.models.decoder import (  # noqa: F401
    AttentiveDecoder, beam_decode, greedy_decode,
)
