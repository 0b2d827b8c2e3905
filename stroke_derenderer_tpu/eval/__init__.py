from stroke_derenderer_tpu.eval.metrics import (  # noqa: F401
    binarization_f1, binarization_f1_tol, stroke_coverage, stroke_dtw,
    stroke_dtw_assigned, stroke_dtw_split, strokes_chamfer, evaluate_pair,
)
