"""Eval metrics + synthetic data generator tests."""

import numpy as np
import pytest

from stroke_derenderer_tpu.data import (
    glyph_batches, make_glyph_sample, make_line_sample, random_strokes,
    rasterize_strokes, tile_batches, tokens_from_strokes,
)
from stroke_derenderer_tpu.eval import (
    binarization_f1, evaluate_pair, stroke_dtw, strokes_chamfer,
)
from stroke_derenderer_tpu.ops.strokes import tokens_to_strokes


def test_f1_bounds(rng):
    a = rng.random((64, 64)) > 0.5
    assert binarization_f1(a, a) == 1.0
    assert binarization_f1(a, ~a) == 0.0
    assert 0.0 < binarization_f1(a, rng.random((64, 64)) > 0.5) < 1.0


def test_dtw_identity_and_order_insensitivity(rng):
    s1 = (np.linspace(0, 10, 8), np.linspace(0, 5, 8))
    s2 = (np.linspace(20, 30, 9), np.linspace(1, 2, 9))
    assert stroke_dtw([s1, s2], [s1, s2]) == pytest.approx(0.0, abs=1e-9)
    # Reversed orientation matches too.
    r1 = (s1[0][::-1], s1[1][::-1])
    assert stroke_dtw([r1, s2], [s1, s2]) == pytest.approx(0.0, abs=1e-9)
    # A shifted copy is strictly worse.
    sh = (s1[0] + 3, s1[1] + 3)
    assert stroke_dtw([sh, s2], [s1, s2]) > 0.3


def test_dtw_unmatched_penalty():
    s1 = (np.array([0.0, 1.0]), np.array([0.0, 1.0]))
    extra = (np.array([50.0, 51.0]), np.array([50.0, 51.0]))
    full = stroke_dtw([s1], [s1])
    with_extra = stroke_dtw([s1, extra], [s1])
    assert with_extra > full


def test_chamfer_and_pair(rng):
    s = [(rng.uniform(0, 100, 10), rng.uniform(0, 50, 10))]
    assert strokes_chamfer(s, s) == pytest.approx(0.0, abs=1e-9)
    m = rng.random((32, 32)) > 0.5
    res = evaluate_pair(m, m, s, s)
    assert res["binarization_f1"] == 1.0
    assert res["stroke_dtw"] == pytest.approx(0.0, abs=1e-9)


def test_token_grammar_roundtrip(rng):
    """tokens_from_strokes must be the exact inverse of tokens_to_strokes
    on rounded integer coordinates."""
    for seed in range(5):
        r = np.random.default_rng(seed)
        strokes = random_strokes(r, 3, (224, 224), points_per_stroke=10)
        toks = tokens_from_strokes(strokes, 224, 384)
        back = tokens_to_strokes(toks, 224)
        assert len(back) == len(strokes)
        for (bx, by), (ox, oy) in zip(back, strokes):
            np.testing.assert_array_equal(
                bx, np.clip(np.round(ox), 0, 223).astype(int))
            np.testing.assert_array_equal(
                by, np.clip(np.round(oy), 0, 223).astype(int))


def test_token_truncation_keeps_eos():
    strokes = [(np.arange(300, dtype=float), np.arange(300, dtype=float) % 224)]
    toks = tokens_from_strokes(strokes, 224, 64)
    assert toks.shape == (64,)
    assert toks[63] == 2 or 2 in toks  # EOS present


def test_rasterize_covers_stroke_points(rng):
    strokes = random_strokes(rng, 2, (64, 200))
    mask = rasterize_strokes(strokes, (64, 200), thickness=1)
    for x, y in strokes:
        xi = np.clip(np.round(x).astype(int), 0, 199)
        yi = np.clip(np.round(y).astype(int), 0, 63)
        assert mask[yi, xi].all()


def test_line_sample_shapes(rng):
    img, mask = make_line_sample(rng, 128, 640)
    assert img.shape == (128, 640, 3) and img.dtype == np.uint8
    assert mask.shape == (128, 640) and set(np.unique(mask)) <= {0, 1}
    # Ink is darker than paper.
    assert img[mask > 0, 0].mean() < img[mask == 0, 0].mean()


def test_batch_iterators(rng):
    tiles, masks = next(tile_batches(rng, 2, 64, 192))
    assert tiles.shape == (2, 64, 192, 3) and tiles.max() <= 1.0
    assert masks.shape == (2, 64, 192, 1)
    crops, tok_in, tok_out = next(glyph_batches(rng, 2, 56, seq_len=16))
    assert crops.shape == (2, 56, 56, 3)
    assert tok_in.shape == (2, 16) and tok_out.shape == (2, 16)
    assert (tok_in[:, 0] == 1).all()  # BOS
    # tok_out is tok_in shifted left by one.
    assert np.array_equal(tok_in[:, 1:], tok_out[:, :-1])


def test_glyph_sample_normalized(rng):
    crop, toks = make_glyph_sample(rng, 224, 64)
    assert crop.shape == (224, 224, 3) and crop.dtype == np.float32
    assert toks.shape == (64,)


def test_fragment_strokes_budget_safe_and_structured():
    """fragment_strokes (residual-ink augmentation): never increases the
    token footprint (so budgeted samples still never truncate), produces
    >= as many strokes, each fragment a contiguous sub-polyline of its
    source, and is deterministic under a seeded rng."""
    from stroke_derenderer_tpu.data.synthetic import (
        fragment_strokes, mixed_strokes,
    )

    def token_count(strokes):
        # 2 tokens per vertex + a BOS between strokes + trailing EOS.
        return sum(2 * np.asarray(x).size for x, _ in strokes) \
            + max(len(strokes) - 1, 0) + 1

    for seed in range(10):
        r = np.random.default_rng(seed)
        strokes = mixed_strokes(r, (108, 300), token_budget=380)
        frags = fragment_strokes(np.random.default_rng(seed + 100), strokes,
                                 cut_prob=1.0)
        assert token_count(frags) <= token_count(strokes)
        assert len(frags) >= len(strokes)
        assert all(np.asarray(x).size >= 4 for x, _ in frags)
        # Every fragment is a contiguous run of some source stroke.
        for fx, fy in frags:
            ok = False
            for sx, sy in strokes:
                sx = np.asarray(sx)
                for start in range(sx.size - fx.size + 1):
                    if (np.array_equal(sx[start:start + fx.size], fx) and
                            np.array_equal(np.asarray(sy)[start:start + fx.size], fy)):
                        ok = True
                        break
                if ok:
                    break
            assert ok
        again = fragment_strokes(np.random.default_rng(seed + 100), strokes,
                                 cut_prob=1.0)
        assert len(again) == len(frags)
        for (ax, ay), (bx, by) in zip(again, frags):
            np.testing.assert_array_equal(ax, bx)
            np.testing.assert_array_equal(ay, by)


def test_partitioned_glyph_sample_mixed_never_truncates():
    """The mixed style (with the fragment augmentation active) must keep
    every target within budget: EOS in-range, never force-written over a
    vertex (round-1 failure mode: truncated targets teach early EOS)."""
    from stroke_derenderer_tpu.data.synthetic import (
        make_partitioned_glyph_sample,
    )

    for seed in range(6):
        r = np.random.default_rng(seed)
        _, _, toks = make_partitioned_glyph_sample(r, max_length=96,
                                                   style="mixed")
        eos_pos = np.flatnonzero(toks == 2)
        assert eos_pos.size >= 1
        # Everything after EOS is PAD, and the token right before EOS is a
        # y-vertex token (>= 3 + 224) — i.e. no mid-vertex truncation.
        assert (toks[eos_pos[0] + 1:] == 0).all()
        if eos_pos[0] > 0:
            assert toks[eos_pos[0] - 1] >= 3 + 224 or toks[eos_pos[0] - 1] == 1


def test_dtw_vectorized_matches_loop(rng):
    """VERDICT r2 item 6: the anti-diagonal vectorized _dtw must agree with
    the scalar-loop oracle bit-for-bit across shapes incl. degenerate ones."""
    from stroke_derenderer_tpu.eval.metrics import _dtw, _dtw_loop
    cases = [(1, 1), (1, 7), (7, 1), (2, 2), (5, 9), (40, 40), (63, 17)]
    for n, m in cases:
        a = rng.normal(size=(n, 2)) * 50
        b = rng.normal(size=(m, 2)) * 50
        assert _dtw(a, b) == pytest.approx(_dtw_loop(a, b), rel=1e-12)
    for _ in range(30):
        n, m = int(rng.integers(1, 80)), int(rng.integers(1, 80))
        a = rng.normal(size=(n, 2)) * 100
        b = rng.normal(size=(m, 2)) * 100
        assert _dtw(a, b) == pytest.approx(_dtw_loop(a, b), rel=1e-12)
    assert _dtw(np.zeros((0, 2)), np.zeros((3, 2))) == float("inf")


def test_stroke_dtw_matches_scalar_oracle(rng):
    """stroke_dtw's batched-matrix path must reproduce the original
    per-pair greedy algorithm (re-implemented here over _dtw_loop)."""
    from stroke_derenderer_tpu.eval.metrics import _dtw_loop, stroke_dtw

    def oracle(pred_strokes, target_strokes):
        pred = [np.stack([np.asarray(x), np.asarray(y)], -1)
                for x, y in pred_strokes if np.asarray(x).size]
        tgt = [np.stack([np.asarray(x), np.asarray(y)], -1)
               for x, y in target_strokes if np.asarray(x).size]
        if not pred and not tgt:
            return 0.0
        if not pred or not tgt:
            return float("inf")

        def best(p, cands):
            return min(min(_dtw_loop(p, t), _dtw_loop(p[::-1], t))
                       for t in cands)
        used = np.zeros(len(tgt), bool)
        dists, leftovers = [], []
        for p in pred:
            b, bj = float("inf"), -1
            for j, t in enumerate(tgt):
                if used[j]:
                    continue
                d = min(_dtw_loop(p, t), _dtw_loop(p[::-1], t))
                if d < b:
                    b, bj = d, j
            if bj >= 0:
                used[bj] = True
                dists.append(b)
            else:
                leftovers.append(p)
        pen = [best(p, tgt) for p in leftovers]
        pen += [best(t, pred) for j, t in enumerate(tgt) if not used[j]]
        total = dists + pen
        return float(np.mean(total)) if total else float("inf")

    def mk(k):
        return [(rng.normal(size=n) * 40, rng.normal(size=n) * 40)
                for n in rng.integers(2, 60, size=k)]

    for pk, tk in [(1, 1), (3, 3), (5, 2), (2, 5), (4, 4)]:
        p, t = mk(pk), mk(tk)
        assert stroke_dtw(p, t) == pytest.approx(oracle(p, t), rel=1e-10)
    assert stroke_dtw([], []) == 0.0
    assert stroke_dtw(mk(2), []) == float("inf")


def test_tile_batches_narrow_padding():
    """narrow>0 emits right-zero-padded tiles (the inference pad contract):
    image and mask are exactly zero beyond the rendered width."""
    import numpy as np

    from stroke_derenderer_tpu.data.synthetic import tile_batches

    rng = np.random.default_rng(5)
    tiles, masks = next(tile_batches(rng, 8, n_batches=1, narrow=1.0))
    assert tiles.shape == (8, 128, 384, 3) and masks.shape == (8, 128, 384, 1)
    found_pad = False
    for t, m in zip(tiles, masks):
        cols = np.where((t.sum(axis=(0, 2)) == 0)
                        & (m.sum(axis=(0, 2)) == 0))[0]
        if len(cols):
            found_pad = True
            assert cols[-1] == 383  # pad reaches the right edge
    assert found_pad
