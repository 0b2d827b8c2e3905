"""Wide oracle-parity fuzz (VERDICT r2 item 7): hundreds of seeds per quirk
surface against the reference's own helpers (imported from /root/reference as
golden oracles, conftest), plus adversarial degenerate masks.

Seeds are swept in CHUNK-sized groups inside each parametrized case so the
default tier stays fast (pytest fixture overhead is per-case, not per-seed);
assertion messages carry the failing seed.

Reference oracles: partition.py:248-358 (islands/grouping/packing),
partition.py:64-157 (clip/inverse/resize_and_pad), partition.py:159-214
(sort), split.py:10-39 (tiling), evaluate_strokes.py:94-135 (token grammar).
"""

import numpy as np
import pytest

from stroke_derenderer_tpu.config import BOS, EOS, PAD, StrokesConfig
from stroke_derenderer_tpu.ops import grouping
from stroke_derenderer_tpu.ops import strokes as sops
from stroke_derenderer_tpu.ops.device_partition import plan_partitions
from stroke_derenderer_tpu.ops.tiling import plan_tiles
from stroke_derenderer_tpu.pipeline.strokes import compute_partitions

from tests.conftest import requires_reference

CHUNK = 25
CHUNKS = range(8)  # 8 x 25 = 200 seeds per property
CFG = StrokesConfig()


# ---------------------------------------------------------------- masks ----
def _mask_blobs(rng, h=128, w=700):
    """Standard random rectangles (the round-1 generator)."""
    img = np.zeros((h, w), np.uint8)
    for _ in range(int(rng.integers(2, 16))):
        y, x = rng.integers(0, h - 8), rng.integers(0, w - 12)
        bh, bw = rng.integers(1, 24), rng.integers(1, 48)
        img[y:y + bh, x:x + bw] = 1
    return img


def _mask_nested(rng, h=128, w=700):
    """Hollow boxes with islands inside: exercises the containment graph
    (reference partition.py builds a containment relation, then packs)."""
    img = np.zeros((h, w), np.uint8)
    for _ in range(int(rng.integers(1, 5))):
        y, x = int(rng.integers(0, h - 40)), int(rng.integers(0, w - 80))
        bh, bw = int(rng.integers(30, 41)), int(rng.integers(50, 81))
        img[y:y + bh, x:x + bw] = 1
        img[y + 2:y + bh - 2, x + 2:x + bw - 2] = 0  # hollow it
        for _ in range(int(rng.integers(0, 4))):     # inner islands
            iy = int(rng.integers(y + 4, y + bh - 6))
            ix = int(rng.integers(x + 4, x + bw - 6))
            img[iy:iy + 2, ix:ix + 2] = 1
    return img


def _mask_specks(rng, h=128, w=700):
    """Many single-pixel islands (degenerate crops, 1-px bounding boxes)."""
    img = np.zeros((h, w), np.uint8)
    n = int(rng.integers(5, 60))
    ys = rng.integers(0, h, n)
    xs = rng.integers(0, w, n)
    img[ys, xs] = 1
    return img


def _mask_strands(rng, h=128, w=700):
    """1-px-thin horizontal/vertical strands: extreme aspect ratios push the
    resize_and_pad ratio math to its edges."""
    img = np.zeros((h, w), np.uint8)
    for _ in range(int(rng.integers(2, 9))):
        if rng.integers(0, 2):
            y = int(rng.integers(0, h))
            x0 = int(rng.integers(0, w - 10))
            img[y, x0:x0 + int(rng.integers(5, min(300, w - x0)))] = 1
        else:
            x = int(rng.integers(0, w))
            y0 = int(rng.integers(0, h - 5))
            img[y0:y0 + int(rng.integers(5, h - y0)), x] = 1
    return img


MASK_GENS = [_mask_blobs, _mask_nested, _mask_specks, _mask_strands]


def _gen_mask(seed):
    rng = np.random.default_rng(seed)
    return MASK_GENS[seed % len(MASK_GENS)](rng)


def _crops_equal(ours, theirs, seed, what):
    ours_d = {pos: crop for crop, pos in ours}
    ref_d = {pos: crop for crop, pos in theirs}
    assert set(ours_d) == set(ref_d), (what, seed)
    for pos in ours_d:
        assert np.array_equal(ours_d[pos], ref_d[pos]), (what, seed, pos)


# ------------------------------------------------------- islands/groups ----
@requires_reference
@pytest.mark.parametrize("chunk", CHUNKS)
def test_fuzz_islands_parity(chunk):
    from derenderer.helper.partition import get_binarized_islands as ref_fn
    for seed in range(chunk * CHUNK, (chunk + 1) * CHUNK):
        img = _gen_mask(seed)
        ours = grouping.get_binarized_islands(img, margin=2)
        ref, _, _ = ref_fn(img, margin=2)
        _crops_equal(ours, ref, seed, "islands")


@requires_reference
@pytest.mark.parametrize("chunk", CHUNKS)
def test_fuzz_group_islands_parity(chunk):
    from derenderer.helper import partition as ref
    for seed in range(chunk * CHUNK, (chunk + 1) * CHUNK):
        img = _gen_mask(seed)
        ours = grouping.group_islands(
            grouping.get_binarized_islands(img, 2), (128, 128))
        theirs = ref.group_islands(
            ref.get_binarized_islands(img, 2)[0], (128, 128))
        assert len(ours) == len(theirs), seed
        _crops_equal(ours, theirs, seed, "group_islands")


@requires_reference
@pytest.mark.parametrize("chunk", CHUNKS)
def test_fuzz_group_intervals_parity(chunk):
    """Interval packing incl. ties: duplicated starts, zero/one-width
    intervals, widths far beyond the packing budget."""
    from derenderer.helper.partition import group_intervals as ref_group
    for seed in range(chunk * CHUNK, (chunk + 1) * CHUNK):
        rng = np.random.default_rng(seed)
        n = int(rng.integers(1, 40))
        starts = np.sort(rng.integers(0, 800, n))
        if seed % 3 == 0 and n > 4:  # force duplicate starts (packing ties)
            starts[1::2] = starts[::2][: len(starts[1::2])]
            starts = np.sort(starts)
        widths = rng.integers(1, 400, n)
        if seed % 5 == 0:
            widths[rng.integers(0, n)] = 1  # degenerate 1-px interval
        intervals = [(int(a), int(a + w)) for a, w in zip(starts, widths)]
        budget = int(rng.choice([64, 128, 257]))
        assert (grouping.group_intervals(intervals, budget)
                == ref_group(intervals, budget)), (seed, budget)


@requires_reference
@pytest.mark.parametrize("chunk", CHUNKS)
def test_fuzz_resize_and_pad_parity(chunk):
    from derenderer.helper.partition import resize_and_pad_image
    for seed in range(chunk * CHUNK, (chunk + 1) * CHUNK):
        rng = np.random.default_rng(seed)
        # Includes 1-px rows/cols and near-target sizes.
        h = int(rng.choice([1, 2, 3, int(rng.integers(4, 250))]))
        w = int(rng.choice([1, 2, 3, int(rng.integers(4, 250))]))
        img = rng.integers(0, 256, (h, w), dtype=np.uint8)
        ours, ratio, (x_off, y_off) = grouping.resize_and_pad_np(
            img, (224, 224), margin=1)
        ref_img, ref_ratio, (rx, ry) = resize_and_pad_image(
            img, (224, 224), margin=1)
        assert ours.shape == ref_img.shape, (seed, h, w)
        assert np.abs(ours.astype(int) - ref_img.astype(int)).max() <= 1, seed
        assert ratio == pytest.approx(ref_ratio), seed
        assert (x_off, y_off) == (rx, ry), seed


# ------------------------------------------------------------- grammar ----
def _grammar_oracle(toks, image_size):
    """Literal reading of the reference decode grammar
    (evaluate_strokes.py:94-135), kept deliberately naive."""
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
    out = []
    for s in seqs:
        if len(s) % 2:
            s = s[:-1]
        out.append((np.array(s[::2]), np.array(s[1::2]) - image_size))
    return out


@pytest.mark.parametrize("chunk", CHUNKS)
def test_fuzz_grammar_parity(chunk):
    for seed in range(chunk * CHUNK, (chunk + 1) * CHUNK):
        rng = np.random.default_rng(seed)
        length = int(rng.integers(1, 200))
        toks = rng.integers(0, 3 + 2 * 224, length).astype(np.int64)
        # seed-dependent special-token density (incl. none at all)
        for sp, k in ((BOS, seed % 9), (PAD, seed % 5), (EOS, seed % 3)):
            for _ in range(k):
                toks[rng.integers(0, length)] = sp
        expected = _grammar_oracle(toks, 224)
        got = sops.tokens_to_strokes(toks, 224)
        assert len(got) == len(expected), seed
        for (gx, gy), (ex, ey) in zip(got, expected):
            assert np.array_equal(gx, ex) and np.array_equal(gy, ey), seed


@requires_reference
@pytest.mark.parametrize("chunk", CHUNKS)
def test_fuzz_clip_inverse_parity(chunk):
    from derenderer.helper.partition import clip_strokes as ref_clip
    from derenderer.helper.partition import inverse_transform as ref_inv
    for seed in range(chunk * CHUNK, (chunk + 1) * CHUNK):
        rng = np.random.default_rng(seed)
        strokes = [(rng.uniform(-80, 320, int(rng.integers(1, 30))),)
                   for _ in range(int(rng.integers(0, 8)))]
        strokes = [(x[0], rng.uniform(-80, 320, x[0].size)) for x in strokes]
        ours = sops.clip_strokes(strokes, (224, 224))
        ref = ref_clip(strokes, (224, 224))
        assert len(ours) == len(ref), seed
        for (ox, oy), (rx, ry) in zip(ours, ref):
            assert np.array_equal(ox, rx) and np.array_equal(oy, ry), seed
        t1 = (float(rng.uniform(-10, 10)), float(rng.uniform(-10, 10)))
        t2 = (float(rng.uniform(-5, 5)), float(rng.uniform(-5, 5)))
        ratio = float(rng.uniform(0.05, 3.0))
        oi = sops.inverse_transform(ours, t1, ratio, t2)
        ri = ref_inv(ref, t1, ratio, t2)
        for (ox, oy), (rx, ry) in zip(oi, ri):
            np.testing.assert_allclose(ox, rx, err_msg=str(seed))
            np.testing.assert_allclose(oy, ry, err_msg=str(seed))


@requires_reference
@pytest.mark.parametrize("chunk", CHUNKS)
def test_fuzz_sort_parity_distinct_keys(chunk):
    from derenderer.helper.partition import sort_strokes as ref_sort
    for seed in range(chunk * CHUNK, (chunk + 1) * CHUNK):
        rng = np.random.default_rng(seed)
        strokes, used = [], set()
        for _ in range(int(rng.integers(1, 12))):
            n = int(rng.integers(1, 14))
            x, y = rng.uniform(0, 500, n), rng.uniform(0, 128, n)
            key = (int(x[0]), int(y[0]), int(x[-1]), int(y[-1]))
            # The reference argsorts int-cast endpoints with an UNSTABLE
            # kind, so tie order is implementation-defined there; exact
            # parity is only a contract on distinct keys (tie behavior is
            # covered by test_fuzz_sort_ties_multiset below).
            if key in used or key[:2] == key[2:]:
                continue
            used.add(key)
            strokes.append((x, y))
        ours = sops.sort_strokes(strokes)
        ref = ref_sort(strokes)
        assert len(ours) == len(ref), seed
        for (ox, oy), (rx, ry) in zip(ours, ref):
            np.testing.assert_allclose(ox, rx, err_msg=str(seed))
            np.testing.assert_allclose(oy, ry, err_msg=str(seed))


@requires_reference
@pytest.mark.parametrize("chunk", CHUNKS)
def test_fuzz_sort_ties_multiset(chunk):
    """On TIED int-cast endpoints the reference's unstable argsort makes the
    order implementation-defined — the invariant that must hold is that both
    sides emit the same multiset of (possibly re-oriented) strokes and a
    non-decreasing (x, y) start-endpoint key sequence."""
    from derenderer.helper.partition import sort_strokes as ref_sort
    for seed in range(chunk * CHUNK, (chunk + 1) * CHUNK):
        rng = np.random.default_rng(seed)
        base = rng.integers(0, 6, 2)
        strokes = []
        for _ in range(int(rng.integers(2, 9))):
            n = int(rng.integers(2, 6))
            # Endpoints collide after the int cast: same cell +- <1.0
            x = base[0] + rng.uniform(0, 0.99, n)
            y = base[1] + rng.uniform(0, 0.99, n)
            strokes.append((x, y))

        def norm(ss):
            out = set()
            for x, y in ss:
                fwd = (tuple(np.round(x, 6)), tuple(np.round(y, 6)))
                rev = (fwd[0][::-1], fwd[1][::-1])
                out.add(min(fwd, rev))
            return out

        ours = sops.sort_strokes(strokes)
        ref = ref_sort(strokes)
        assert norm(ours) == norm(ref), seed
        for ss in (ours, ref):
            keys = [(int(x[0]), int(y[0])) for x, y in ss]
            assert keys == sorted(keys), seed


# -------------------------------------------------------------- tiling ----
@requires_reference
def test_fuzz_tiling_parity_width_sweep():
    """Every width 1..2048 plus larger strides: the tile plan arithmetic AND
    the cut tile contents must match the reference split helper exactly
    (split.py:10-39)."""
    import derenderer.helper.split as ref_split
    from stroke_derenderer_tpu.ops.tiling import cut_tiles_np
    rng = np.random.default_rng(0)
    for w in list(range(1, 2049, 7)) + list(range(2049, 12000, 311)):
        img = rng.integers(0, 256, (16, w), dtype=np.uint8).astype(np.float32)
        tiles_ref, widths_ref = ref_split.split_image(img, 384, 64)
        plan = plan_tiles(w, 384, 64)
        assert plan.num_tiles == len(tiles_ref), w
        assert list(plan.widths) == list(widths_ref), w
        ours = cut_tiles_np(img[:, :, None], plan)[:, :, :, 0]
        for i, t in enumerate(tiles_ref):
            assert np.array_equal(ours[i], t), (w, i)


# --------------------------------------------------- degenerate masks -----
@requires_reference
@pytest.mark.parametrize("mask_name,builder", [
    ("empty", lambda: np.zeros((128, 500), np.uint8)),
    ("full", lambda: np.ones((128, 500), np.uint8)),
    ("single_pixel", lambda: np.eye(1, 500 * 128, 70 * 500 + 3,
                                    dtype=np.uint8).reshape(128, 500)),
    ("one_column", lambda: np.pad(np.ones((128, 1), np.uint8),
                                  ((0, 0), (250, 249)))),
    ("one_row", lambda: np.pad(np.ones((1, 500), np.uint8),
                               ((64, 63), (0, 0)))),
    ("checker", lambda: (np.indices((128, 500)).sum(0) % 2).astype(np.uint8)),
])
def test_degenerate_masks_parity(mask_name, builder):
    from derenderer.helper import partition as ref
    img = builder()
    ours = grouping.get_binarized_islands(img, margin=2)
    theirs, _, _ = ref.get_binarized_islands(img, margin=2)
    _crops_equal(ours, theirs, mask_name, "islands")
    g_ours = grouping.group_islands(ours, (128, 128))
    g_ref = ref.group_islands(theirs, (128, 128))
    assert len(g_ours) == len(g_ref), mask_name
    _crops_equal(g_ours, g_ref, mask_name, "groups")


def test_gid_dtype_switch_over_127_groups():
    """>127 glyph groups must flip the device-partition group-id image to
    int16 (pipeline/strokes.py int8-when-fits transfer optimization) and the
    plan must still agree with the host partitioner on count + transforms."""
    # 160 islands spaced wider than the 128-px packing budget so interval
    # grouping cannot collapse them below 128 partitions.
    img = np.zeros((128, 140 * 160 + 16), np.uint8)
    for i in range(160):
        x = 8 + 140 * i
        img[60:63, x:x + 3] = 1
    parts = compute_partitions(img, CFG)
    plan = plan_partitions(img, CFG.margin, CFG.image_size)
    assert plan is not None
    n = len(plan.partitions)
    assert n == len(parts) and n > 127, n
    assert int(plan.gid_img.max()) == n - 1  # ids wouldn't fit int8
    from stroke_derenderer_tpu.ops.device_partition import pack_gid
    # Dense-dtype switch (allow_rle=False isolates it; the adaptive RLE
    # transport on top of it is pinned separately in
    # tests/test_device_partition.py).
    _, fmt = pack_gid(plan.gid_img, n, allow_rle=False)
    assert fmt == "i16"
    # ...and a 15-group mask must take the nibble-packed transport.
    z = np.zeros((128, 256), np.int16)
    assert pack_gid(z, 15, allow_rle=False)[1] == "nib"
    assert pack_gid(z, 16, allow_rle=False)[1] == "i8"
    for hp, dp in zip(parts, plan.partitions):
        assert hp["translate1"] == tuple(dp["translate1"])
        assert abs(hp["ratio"] - dp["ratio"]) < 1e-12
        assert hp["translate2"] == tuple(dp["translate2"])
