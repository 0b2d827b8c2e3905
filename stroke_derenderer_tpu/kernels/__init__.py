from stroke_derenderer_tpu.kernels.decode_attention import (  # noqa: F401
    fused_attention_gate, fused_attention_gate_reference,
)
from stroke_derenderer_tpu.kernels.fused_beam import (  # noqa: F401
    fused_beam_decode, fused_beam_decode_sharded,
)
from stroke_derenderer_tpu.kernels.fused_decode import (  # noqa: F401
    fused_greedy_decode, fused_greedy_decode_sharded, pack_decoder_weights,
)
