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


def test_cursive_joins_reduce_stroke_count_within_budget():
    """join_prob=1 fuses adjacent-letter strokes (semi-cursive words like
    the reference demo input) without breaking the token-budget contract."""
    rng_a, rng_b = np.random.default_rng(8), np.random.default_rng(8)
    sep = word_strokes(rng_a, "nine", (100, 400), token_budget=2000,
                       join_prob=0.0)
    cur = word_strokes(rng_b, "nine", (100, 400), token_budget=2000,
                       join_prob=1.0)
    assert len(cur) < len(sep)
    rng = np.random.default_rng(9)
    for i in range(100):
        budget = int(rng.integers(20, 386))
        ws = word_strokes(rng, sample_word(rng), (90, 500),
                          token_budget=budget, join_prob=1.0)
        assert _token_cost(ws) <= budget, (i, budget)


def test_ruled_photo_render():
    """Ruled paper adds colored distractor rows; ink pixels stay dark; the
    plain branch's rng sequence is byte-identical to before."""
    from stroke_derenderer_tpu.data.synthetic import _photo_render

    mask = np.zeros((64, 200), np.uint8)
    mask[30:33, 20:180] = 1
    img = _photo_render(np.copy(mask), np.random.default_rng(10), ruled=True)
    assert img.shape == (64, 200, 3) and img.dtype == np.uint8
    # ink is dark in every channel
    assert img[31, 100].max() < 120
    # some non-ink rows are visibly chromatic (ruling lines) or tinted
    off_ink = img[mask == 0].astype(int)
    chroma = off_ink.max(1) - off_ink.min(1)
    assert (chroma > 25).sum() > 50
    # plain branch: identical draws to the ruled branch's shared prefix
    a = _photo_render(np.copy(mask), np.random.default_rng(11))
    b = _photo_render(np.copy(mask), np.random.default_rng(11))
    np.testing.assert_array_equal(a, b)
    assert a[..., 0].tolist() == a[..., 1].tolist()  # grayscale


def test_make_line_sample_ruled_probability():
    rng = np.random.default_rng(12)
    got_ruled = 0
    for _ in range(8):
        img, mask = make_line_sample(rng, 96, 400, style="letters", ruled=1.0)
        off = img[mask == 0].astype(int)
        got_ruled += int(((off.max(1) - off.min(1)) > 25).sum() > 30)
    assert got_ruled >= 6  # tint/ruling visible in nearly all samples


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
