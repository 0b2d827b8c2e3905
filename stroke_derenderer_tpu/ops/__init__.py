from stroke_derenderer_tpu.ops import resize, tiling, normalize, grouping, strokes  # noqa: F401
