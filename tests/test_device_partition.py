"""Device-side glyph partitioning tests (ops/device_partition.py): the
group-id-image + interpolation-row program must reproduce the host
compositing/resize/pad path (pipeline/strokes.py compute_partitions) —
crops within 1 LSB, transform bookkeeping exact, pipeline tokens equal."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from stroke_derenderer_tpu.config import StrokesConfig
from stroke_derenderer_tpu.ops.device_partition import (
    PartitionPlan, gather_crops, pack_gid, plan_partitions,
)
from stroke_derenderer_tpu.pipeline import StrokeEstimator
from stroke_derenderer_tpu.pipeline.strokes import compute_partitions

CFG = StrokesConfig()


def _random_mask(seed, w=None):
    rng = np.random.default_rng(seed)
    w = w or int(rng.integers(200, 900))
    mask = np.zeros((128, w), np.uint8)
    for _ in range(int(rng.integers(3, 9))):
        cx, cy = int(rng.integers(10, w - 10)), int(rng.integers(10, 118))
        rw, rh = int(rng.integers(3, 60)), int(rng.integers(3, 40))
        y0, y1 = max(0, cy - rh), min(cy + rh, 128)
        x0, x1 = max(0, cx - rw), min(cx + rw, w)
        mask[y0:y1, x0:x1] = rng.integers(0, 2, (y1 - y0, x1 - x0))
    return mask


def _device_crops(plan, packed: bool = False, allow_rle: bool = True):
    coords = tuple(jnp.asarray(getattr(plan, k))
                   for k in PartitionPlan.COORD_KEYS)
    if packed:
        gid, fmt = pack_gid(plan.gid_img, len(plan.partitions),
                            allow_rle=allow_rle)
        gid = (tuple(jnp.asarray(g) for g in gid)
               if isinstance(gid, tuple) else jnp.asarray(gid))
        return np.asarray(gather_crops(gid, coords, fmt))
    return np.asarray(gather_crops(jnp.asarray(plan.gid_img), coords))


def test_packed_gid_crops_identical():
    """Nibble-packed gid transport must be lossless: same crops bit-for-bit
    as the unpacked int16 path (pack_gid/unpack_gid round trip)."""
    mask = _random_mask(11, w=512)  # even width -> nibble format eligible
    plan = plan_partitions(mask, CFG.margin, CFG.image_size)
    assert plan is not None
    gid, fmt = pack_gid(plan.gid_img, len(plan.partitions))
    if len(plan.partitions) <= 15:
        assert fmt == "nib" and gid.shape[-1] == mask.shape[1] // 2
    np.testing.assert_array_equal(_device_crops(plan, packed=True),
                                  _device_crops(plan))


@pytest.mark.parametrize("seed", [0, 1, 2, 7])
def test_crops_match_host_oracle(seed):
    mask = _random_mask(seed)
    parts = compute_partitions(mask, CFG)
    plan = plan_partitions(mask, CFG.margin, CFG.image_size)
    if not parts:
        assert plan is None
        return
    assert len(plan.partitions) == len(parts)
    crops = _device_crops(plan)
    host = np.stack([p["image"] for p in parts]).astype(np.float32)
    diff = np.abs(crops - host)
    # Host rounds after its numpy resize, device after its matmuls: both
    # within 1 LSB of cv2; ties may round differently on a few pixels.
    assert diff.max() <= 1.0
    assert (diff == 0).mean() >= 0.995
    for hp, dp in zip(parts, plan.partitions):
        assert hp["translate1"] == tuple(dp["translate1"])
        assert abs(hp["ratio"] - dp["ratio"]) < 1e-12
        assert hp["translate2"] == tuple(dp["translate2"])


def test_empty_mask_returns_none():
    assert plan_partitions(np.zeros((128, 300), np.uint8), CFG.margin,
                           CFG.image_size) is None


def test_pipeline_device_partition_strokes():
    """The full device-partitioned pipeline must produce well-formed strokes
    on the same partitions as the host path (tokens may differ on <=1-LSB
    crop rounding; the partition count and coordinate frames must agree)."""
    tiny = StrokesConfig(encoder_arch="tiny", embed_dim=16, attention_dim=16,
                         decoder_dim=16, max_length=24,
                         compute_dtype="float32")
    host_est = StrokeEstimator(tiny)
    dev_est = StrokeEstimator(
        dataclasses.replace(tiny, device_partition=True),
        variables=(host_est.enc_vars, host_est.dec_vars,
                   host_est.proj_vars))
    mask = _random_mask(3, w=700) > 0
    host_strokes = host_est.process_image(mask, max_length=12)
    dev_strokes = dev_est.process_image(mask, max_length=12)
    for x, y in dev_strokes:
        assert x.shape == y.shape
    # Identical geometry plans -> identical stroke counts is not guaranteed
    # under crop rounding ties, but both must live in the same frame.
    assert isinstance(host_strokes, list) and isinstance(dev_strokes, list)


def test_pipeline_device_partition_exact_when_crops_equal():
    """On a mask whose device crops match the host crops bit-exactly, the
    device-partitioned pipeline must emit byte-identical strokes."""
    tiny = StrokesConfig(encoder_arch="tiny", embed_dim=16, attention_dim=16,
                         decoder_dim=16, max_length=24,
                         compute_dtype="float32")
    for seed in range(10):
        mask = _random_mask(seed)
        parts = compute_partitions(mask, CFG)
        plan = plan_partitions(mask, CFG.margin, CFG.image_size)
        if not parts:
            continue
        crops = _device_crops(plan)
        host = np.stack([p["image"] for p in parts]).astype(np.float32)
        if not np.array_equal(crops, host):
            continue
        host_est = StrokeEstimator(tiny)
        dev_est = StrokeEstimator(
            dataclasses.replace(tiny, device_partition=True),
            variables=(host_est.enc_vars, host_est.dec_vars,
                       host_est.proj_vars))
        hs = host_est.process_image(mask > 0, max_length=12)
        ds = dev_est.process_image(mask > 0, max_length=12)
        assert len(hs) == len(ds)
        for (hx, hy), (dx, dy) in zip(hs, ds):
            assert np.array_equal(hx, dx) and np.array_equal(hy, dy)
        return
    pytest.skip("no bit-exact crop case found across seeds")


def test_process_images_device_matches_per_image():
    """The cross-image batched device program must produce exactly the same
    strokes as the per-image device path."""
    tiny = StrokesConfig(encoder_arch="tiny", embed_dim=16, attention_dim=16,
                         decoder_dim=16, max_length=24,
                         compute_dtype="float32", device_partition=True)
    est = StrokeEstimator(tiny)
    masks = [_random_mask(s, w=300 + 100 * s) > 0 for s in range(3)]
    batched = est.process_images(masks, max_length=12)
    single = [est.process_image(m, max_length=12) for m in masks]
    assert len(batched) == len(single)
    for bs, ss in zip(batched, single):
        assert len(bs) == len(ss)
        for (bx, by), (sx, sy) in zip(bs, ss):
            assert np.array_equal(bx, sx) and np.array_equal(by, sy)


def test_plan_ink_counts_match_mask():
    """plan.ink (the decode-length proxy driving block-sorted dispatch)
    sums each group's member-island foreground pixels exactly."""
    rng = np.random.default_rng(5)
    mask = np.zeros((64, 512), np.uint8)
    for _ in range(12):
        y, x = rng.integers(4, 56), rng.integers(4, 500)
        mask[y:y + rng.integers(2, 8), x:x + rng.integers(2, 10)] = 255
    plan = plan_partitions(mask, margin=2, out_size=224)
    assert plan is not None and plan.ink is not None
    assert plan.ink.sum() == int((mask > 0).sum())
    # per-group: ink equals the foreground owned by that group's gid pixels
    for g in range(len(plan.partitions)):
        assert plan.ink[g] == int(((plan.gid_img == g) & (mask > 0)).sum())


def test_rle_gid_roundtrip_exact():
    """RLE transport is lossless on compressible (real-shaped) gid images
    and stacks, including -1 background and width padding."""
    from stroke_derenderer_tpu.ops.device_partition import unpack_gid
    rng = np.random.default_rng(3)
    for shape in [(128, 512), (4, 128, 768)]:
        gid = np.full(shape, -1, np.int16)
        # sparse block structure: long runs, like host-built label maps
        flat = gid.reshape(-1)
        for _ in range(40):
            a = int(rng.integers(0, flat.size - 60))
            flat[a:a + int(rng.integers(3, 60))] = int(rng.integers(0, 14))
        packed, fmt = pack_gid(gid, 14, allow_rle=True)
        assert fmt == f"rle:{'x'.join(str(d) for d in shape)}", fmt
        assert isinstance(packed, tuple) and packed[0].dtype == np.int32
        out = np.asarray(unpack_gid(tuple(jnp.asarray(p) for p in packed),
                                    fmt))
        np.testing.assert_array_equal(out, gid)


def test_rle_gid_falls_back_on_noise():
    """High-entropy gid content must keep the dense format (RLE only wins
    with the >40% margin that pays for the device expansion)."""
    rng = np.random.default_rng(4)
    gid = rng.integers(-1, 14, (128, 512)).astype(np.int16)
    _, fmt = pack_gid(gid, 14, allow_rle=True)
    assert fmt == "nib"


def test_rle_gid_crops_identical():
    """Crops through the RLE transport match the dense path bit-for-bit."""
    mask = np.zeros((128, 512), bool)
    for k in range(6):  # smooth strokes -> compressible gid image
        x = np.arange(30 + 70 * k, 90 + 70 * k) % 512
        y = (64 + 40 * np.sin(np.linspace(0, 3, x.size) + k)).astype(int)
        mask[np.clip(y, 0, 127), x] = True
        mask[np.clip(y + 1, 0, 127), x] = True
    plan = plan_partitions(mask, CFG.margin, CFG.image_size)
    assert plan is not None
    gid, fmt = pack_gid(plan.gid_img, len(plan.partitions), allow_rle=True)
    assert fmt.startswith("rle:")
    np.testing.assert_array_equal(
        _device_crops(plan, packed=True, allow_rle=True),
        _device_crops(plan, packed=True, allow_rle=False))


def test_pipeline_gid_rle_output_invariance():
    """StrokeEstimator batched device path: gid_rle on/off -> identical
    strokes."""
    from stroke_derenderer_tpu.config import StrokesConfig
    from stroke_derenderer_tpu.pipeline.strokes import StrokeEstimator
    masks = []
    for s in range(2):
        m = np.zeros((128, 384), bool)
        x = np.arange(40, 340)
        y = (60 + 30 * np.sin(x / (17.0 + s))).astype(int)
        m[y, x] = True
        m[y + 1, x] = True
        masks.append(m)
    est_on = StrokeEstimator(StrokesConfig(encoder_arch="tiny", embed_dim=32,
                                           attention_dim=32, decoder_dim=32,
                                           gid_rle=True))
    est_off = StrokeEstimator(StrokesConfig(encoder_arch="tiny", embed_dim=32,
                                            attention_dim=32, decoder_dim=32,
                                            gid_rle=False),
                              variables=(est_on.enc_vars, est_on.dec_vars,
                                         est_on.proj_vars))
    a = est_on.process_images(masks, max_length=12)
    b = est_off.process_images(masks, max_length=12)
    for sa, sb in zip(a, b):
        assert len(sa) == len(sb)
        for pa, pb in zip(sa, sb):
            np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))
