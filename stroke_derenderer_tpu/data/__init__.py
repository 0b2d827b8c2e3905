from stroke_derenderer_tpu.data.synthetic import (  # noqa: F401
    random_strokes, rasterize_strokes, tokens_from_strokes,
    make_glyph_sample, make_line_sample, glyph_batches, tile_batches,
)
