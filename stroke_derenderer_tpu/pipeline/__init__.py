from stroke_derenderer_tpu.pipeline.binarize import Binarizer  # noqa: F401
from stroke_derenderer_tpu.pipeline.strokes import StrokeEstimator  # noqa: F401
