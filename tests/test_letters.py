"""Letterform synthetic family (data/letters.py) + the 'hand'/'letters'
style plumbing through data/synthetic.py.

The reference derenders handwritten TEXT lines (its README:3-5); these
generators supply script-structured training data (baseline, x-height,
stems/bowls, multi-stroke letters) under the same hard never-truncate
token-budget contract as the curve families."""

import numpy as np

from stroke_derenderer_tpu.config import BOS, EOS, PAD
from stroke_derenderer_tpu.data.letters import (
    LETTER_TEMPLATES, line_of_words, sample_word, word_strokes,
)
from stroke_derenderer_tpu.data.synthetic import (
    HAND_PROBS, make_line_sample, make_partitioned_glyph_sample,
    mixed_strokes, rasterize_strokes,
)


def _token_cost(strokes):
    """2 tokens/vertex + one BOS between strokes + trailing EOS — the exact
    decode-grammar accounting (reference evaluate_strokes.py:94-135)."""
    return (sum(2 * np.asarray(x).size for x, _ in strokes)
            + max(len(strokes) - 1, 0) + 1)


def test_templates_stay_inside_em_box():
    for c, (adv, strokes) in LETTER_TEMPLATES.items():
        assert 0.2 < adv < 1.0, c
        for s in strokes:
            assert s.shape[1] == 2 and s.shape[0] >= 2, c
            assert s[:, 0].min() >= -1e-9 and s[:, 0].max() <= adv + 1e-9, c
            assert s[:, 1].min() >= -1e-9 and s[:, 1].max() <= 1.05, c


def test_sample_word_letters_known():
    rng = np.random.default_rng(0)
    for _ in range(50):
        w = sample_word(rng)
        assert 2 <= len(w) <= 6
        assert all(c in LETTER_TEMPLATES for c in w)


def test_word_strokes_budget_and_bounds():
    rng = np.random.default_rng(1)
    for i in range(200):
        shape = (int(rng.integers(20, 130)), int(rng.integers(20, 600)))
        budget = int(rng.integers(7, 386))
        ws = word_strokes(rng, sample_word(rng), shape, token_budget=budget)
        assert _token_cost(ws) <= budget, (i, shape, budget)
        for x, y in ws:
            assert x.size == y.size >= 3
            assert x.min() >= 0 and x.max() <= shape[1] - 1
            assert y.min() >= 0 and y.max() <= shape[0] - 1


def test_word_strokes_tiny_budget_returns_empty_not_truncated():
    rng = np.random.default_rng(2)
    ws = word_strokes(rng, "emo", (64, 200), token_budget=5)
    assert ws == []


def test_word_strokes_writing_order_is_left_to_right():
    """First-vertex x positions advance with the letters (natural writing
    order feeds sort_strokes / the decode grammar)."""
    rng = np.random.default_rng(3)
    ws = word_strokes(rng, "lil", (100, 400), token_budget=2000,
                      slant=0.0, jitter=0.0)
    assert len(ws) >= 3
    first_stroke_x = [float(x[0]) for x, _ in ws]
    # the three l/i stems appear at increasing x
    stems = sorted(first_stroke_x)
    assert first_stroke_x[0] < first_stroke_x[-1]
    assert stems[0] < stems[-1] - 20


def test_hand_mix_budget_contract():
    rng = np.random.default_rng(4)
    for i in range(100):
        shape = (108, int(rng.integers(30, 600)))
        ss = mixed_strokes(rng, shape, token_budget=382,
                           style_probs=HAND_PROBS)
        assert len(ss) >= 1
        assert _token_cost(ss) <= 382, i


def test_mixed_default_rng_sequence_unchanged():
    """Adding the 'word' style must NOT move the default 'mixed' family:
    pinned mixed-set evals across rounds depend on identical samples for
    identical seeds. Golden captured before the letters integration."""
    rng = np.random.default_rng(123)
    ss = mixed_strokes(rng, (100, 300), token_budget=286)
    sig = [(round(float(np.sum(x)), 3), round(float(np.sum(y)), 3), x.size)
           for x, y in ss]
    assert sig == [(2420.471, 1022.907, 18)]


def test_line_of_words_renders_ink():
    rng = np.random.default_rng(5)
    strokes = line_of_words(rng, (96, 900))
    assert len(strokes) >= 2
    mask = rasterize_strokes(strokes, (96, 900), thickness=2)
    assert mask.sum() > 200
    for x, y in strokes:
        assert x.min() >= 0 and x.max() <= 899
        assert y.min() >= 0 and y.max() <= 95


def test_make_line_sample_letters_and_hand_styles():
    for style in ("letters", "hand"):
        img, mask = make_line_sample(np.random.default_rng(6), 128, 900,
                                     style=style)
        assert img.shape == (128, 900, 3) and img.dtype == np.uint8
        assert mask.shape == (128, 900) and set(np.unique(mask)) <= {0, 1}
        assert mask.sum() > 100, style


def test_partitioned_glyph_sample_letters_and_hand():
    """Training pairs through the inference partition pipeline for the new
    styles: targets terminate with EOS inside the horizon (never-truncate
    contract) and the crop matches the model input frame."""
    for style in ("letters", "hand"):
        rng = np.random.default_rng(7)
        model_in, crop, toks = make_partitioned_glyph_sample(
            rng, max_length=384, style=style)
        assert model_in.shape == (224, 224, 3)
        assert crop.shape == (224, 224)
        assert toks.shape == (384,)
        non_pad = toks[toks != PAD]
        assert non_pad[-1] == EOS
        # never-truncate: EOS is not at the horizon edge by forced overwrite
        assert (toks == EOS).sum() == 1
        body = non_pad[:-1]
        verts = body[body != BOS]
        assert verts.size % 2 == 0 and verts.size >= 6
