from stroke_derenderer_tpu.data.synthetic import (  # noqa: F401
    HAND_PROBS, random_strokes, rasterize_strokes, tokens_from_strokes,
    make_glyph_sample, make_line_sample, glyph_batches, tile_batches,
    mixed_strokes, partitioned_glyph_batches,
)
from stroke_derenderer_tpu.data.letters import (  # noqa: F401
    LETTER_TEMPLATES, line_of_words, sample_word, word_strokes,
)
from stroke_derenderer_tpu.data.real import (  # noqa: F401
    discover_pairs, load_pair, real_glyph_batches, real_tile_batches,
)
