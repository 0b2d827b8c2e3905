"""Token grammar / stroke post-processing parity vs the reference."""

import numpy as np
import pytest

from stroke_derenderer_tpu.config import BOS, EOS, PAD
from stroke_derenderer_tpu.ops import strokes as sops

from tests.conftest import requires_reference


def _random_tokens(rng, length=120, image_size=224):
    toks = rng.integers(3, 3 + 2 * image_size, length).astype(np.int64)
    # Sprinkle specials.
    for _ in range(6):
        toks[rng.integers(0, length)] = BOS
    for _ in range(4):
        toks[rng.integers(0, length)] = PAD
    toks[rng.integers(length // 2, length)] = EOS
    return toks


@pytest.mark.parametrize("seed", range(10))
def test_grammar_matches_reference_semantics(seed):
    """Mirror of the reference decode loop (evaluate_strokes.py:94-135),
    re-derived independently as the oracle here."""
    rng = np.random.default_rng(seed)
    toks = _random_tokens(rng)

    # Oracle: literal reading of the reference grammar.
    seqs, seq = [], []
    for t in toks:
        if t == BOS:
            seqs.append(seq)
            seq = []
        elif t == EOS:
            seqs.append(seq)
            break
        elif t == PAD:
            continue
        else:
            seq.append(int(t) - 3)
    else:
        seqs.append(seq)
    seqs = [s for s in seqs if s]
    expected = []
    for s in seqs:
        if len(s) % 2:
            s = s[:-1]
        expected.append((np.array(s[::2]), np.array(s[1::2]) - 224))

    got = sops.tokens_to_strokes(toks, 224)
    assert len(got) == len(expected)
    for (gx, gy), (ex, ey) in zip(got, expected):
        assert np.array_equal(gx, ex) and np.array_equal(gy, ey)


def test_grammar_no_eos_flushes_tail():
    toks = np.array([BOS, 10, 250, 11, 251])
    out = sops.tokens_to_strokes(toks, 224)
    assert len(out) == 1
    assert np.array_equal(out[0][0], [7, 8])
    assert np.array_equal(out[0][1], [247 - 224, 248 - 224])


@requires_reference
@pytest.mark.parametrize("seed", range(8))
def test_clip_matches_reference(seed):
    from derenderer.helper.partition import clip_strokes as ref_clip
    rng = np.random.default_rng(seed)
    strokes = [(rng.uniform(-40, 260, 15), rng.uniform(-40, 260, 15)) for _ in range(5)]
    ours = sops.clip_strokes(strokes, (224, 224))
    ref = ref_clip(strokes, (224, 224))
    for (ox, oy), (rx, ry) in zip(ours, ref):
        assert np.array_equal(ox, rx) and np.array_equal(oy, ry)


@requires_reference
@pytest.mark.parametrize("seed", range(8))
def test_inverse_transform_matches_reference(seed):
    from derenderer.helper.partition import inverse_transform as ref_inv
    rng = np.random.default_rng(seed)
    strokes = [(rng.uniform(0, 224, 9), rng.uniform(0, 224, 9)) for _ in range(4)]
    t1, t2, ratio = (3.0, 7.0), (1.5, 2.5), 0.43
    ours = sops.inverse_transform(strokes, t1, ratio, t2)
    ref = ref_inv(strokes, t1, ratio, t2)
    for (ox, oy), (rx, ry) in zip(ours, ref):
        np.testing.assert_allclose(ox, rx)
        np.testing.assert_allclose(oy, ry)


@requires_reference
@pytest.mark.parametrize("seed", range(10))
def test_sort_matches_reference(seed):
    from derenderer.helper.partition import sort_strokes as ref_sort
    rng = np.random.default_rng(seed)
    # Distinct int endpoints avoid the reference's unstable-sort ties.
    strokes = []
    used = set()
    for _ in range(7):
        n = rng.integers(2, 10)
        x = rng.uniform(0, 500, n)
        y = rng.uniform(0, 128, n)
        key = (int(x[0]), int(y[0]), int(x[-1]), int(y[-1]))
        if key in used:
            continue
        used.add(key)
        strokes.append((x, y))
    ours = sops.sort_strokes(strokes)
    ref = ref_sort(strokes)
    assert len(ours) == len(ref)
    for (ox, oy), (rx, ry) in zip(ours, ref):
        np.testing.assert_allclose(ox, rx)
        np.testing.assert_allclose(oy, ry)


def test_merge_stroke_fragments_joins_touching_chains():
    # Three fragments of one horizontal line (gaps ~2 px) + one far stroke.
    a = (np.arange(0.0, 20.0), np.zeros(20))
    b = (np.arange(22.0, 40.0), np.zeros(18))
    c = (np.arange(41.0, 60.0), np.zeros(19))
    far = (np.arange(0.0, 10.0), np.full(10, 90.0))
    out = sops.merge_stroke_fragments([far, c, a, b], tol=4.0)
    assert len(out) == 2
    joined = max(out, key=lambda s: s[0].size)
    assert joined[0].size == 20 + 18 + 19
    # Chain is continuous and monotone (either direction is a valid join).
    d = np.diff(joined[0])
    assert np.all(d > 0) or np.all(d < 0)
    np.testing.assert_array_equal(joined[1], 0)


def test_merge_stroke_fragments_respects_tol_and_orientation():
    # Tail-to-tail adjacency: second fragment arrives reversed.
    a = (np.arange(0.0, 10.0), np.zeros(10))          # tail at x=9
    b = (np.arange(25.0, 10.0, -1.0), np.zeros(15))   # tail at x=11
    out = sops.merge_stroke_fragments([a, b], tol=3.0)
    assert len(out) == 1
    assert np.all(np.diff(out[0][0]) != 0)
    # Beyond tol: untouched.
    outside = sops.merge_stroke_fragments([a, (np.arange(20.0, 30.0),
                                               np.zeros(10))], tol=3.0)
    assert len(outside) == 2


def test_refine_strokes_snaps_within_radius():
    from stroke_derenderer_tpu.ops.strokes import refine_strokes
    mask = np.zeros((32, 64), bool)
    mask[10, 5:40] = True  # horizontal ink line at y=10
    strokes = [(np.array([6.0, 20.0, 55.0]), np.array([12.0, 8.0, 25.0]))]
    # Legacy vertex-only mode (densify=0): exact old semantics.
    out = refine_strokes(strokes, mask, max_shift=3.0, densify=0)
    (x, y), = out
    # First two vertices are 2 px off the line: snapped onto it.
    assert y[0] == 10.0 and y[1] == 10.0
    assert x[0] == 6.0 and x[1] == 20.0
    # Third vertex is ~19 px from any ink: untouched.
    assert (x[2], y[2]) == (55.0, 25.0)
    # On-ink vertices never move.
    on = refine_strokes([(np.array([7.0]), np.array([10.0]))], mask, 3.0,
                        densify=0)
    assert on[0][0][0] == 7.0 and on[0][1][0] == 10.0
    # Empty mask / no strokes are passthroughs.
    assert refine_strokes(strokes, np.zeros((4, 4), bool)) == strokes
    assert refine_strokes([], mask) == []


def test_refine_strokes_densified_follows_ink():
    """Default mode: densify -> centroid snap -> resample to the original
    vertex count. A 2-vertex chord across curved ink gets pulled onto it
    pointwise while keeping its vertex count."""
    from stroke_derenderer_tpu.ops.strokes import refine_strokes
    mask = np.zeros((40, 80), bool)
    xs = np.arange(10, 70)
    ys = (20 + 8 * np.sin((xs - 10) / 59 * np.pi)).round().astype(int)
    mask[ys, xs] = True  # an arc of ink
    # Straight 5-vertex chord between the arc's endpoints, up to ~8px off.
    stroke = (np.linspace(10.0, 69.0, 5), np.full(5, 20.0))
    (rx, ry), = refine_strokes([stroke], mask, max_shift=9.0)
    assert rx.size == 5  # vertex economy preserved
    # Interior points moved toward the arc (y > 20 along the bulge).
    assert ry[1:-1].mean() > 22.0
    # Every refined vertex lies within ~2px of the ink.
    d = np.hypot(rx[:, None] - xs[None, :], ry[:, None] - ys[None, :])
    assert d.min(axis=1).max() < 2.5


def test_decode_tokens_batch_parity():
    """Fused batch decode == tokens_to_strokes + clip + inverse per glyph
    (modulo empty strokes, which sort_strokes drops anyway)."""
    from stroke_derenderer_tpu.ops.strokes import (
        clip_strokes, decode_tokens_batch, inverse_transform,
        tokens_to_strokes)
    rng = np.random.default_rng(123)
    for trial in range(60):
        n = int(rng.integers(1, 10))
        L = int(rng.integers(2, 100))
        toks = rng.integers(0, 451, size=(n, L)).astype(np.int32)
        if trial % 3 == 0:
            toks[rng.random(toks.shape) < 0.3] = 1  # BOS-heavy
        t1 = rng.uniform(-50, 50, (n, 2))
        t2 = rng.uniform(0, 5, (n, 2))
        ratio = rng.uniform(0.1, 3.0, n)
        got = decode_tokens_batch(toks, 224, (224, 224), t1, ratio, t2)
        for i in range(n):
            s = tokens_to_strokes(toks[i], 224)
            s = clip_strokes(s, (224, 224))
            s = inverse_transform(s, tuple(t1[i]), ratio[i], tuple(t2[i]))
            s = [(x, y) for x, y in s if x.size]
            assert len(s) == len(got[i])
            for (xa, ya), (xb, yb) in zip(s, got[i]):
                np.testing.assert_allclose(xa, xb, atol=1e-9)
                np.testing.assert_allclose(ya, yb, atol=1e-9)
