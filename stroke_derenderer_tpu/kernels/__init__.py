from stroke_derenderer_tpu.kernels.decode_attention import (  # noqa: F401
    fused_attention_gate, fused_attention_gate_reference,
)
