from stroke_derenderer_tpu.eval.metrics import (  # noqa: F401
    binarization_f1, stroke_coverage, stroke_dtw, strokes_chamfer,
    evaluate_pair,
)
