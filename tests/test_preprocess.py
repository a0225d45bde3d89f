"""Preprocess tests with the reference's hand-computed truths.

The resize truths are the exact expected arrays of the reference kernel
tests (test/detect/kernel_test.cu:71-90: a 4x4x3 ramp image resized 2x and
0.5x), validating that the separable-matmul resize reproduces the CUDA
bilinear kernel bit-for-bit after uint8 truncation. Border and blob behavior
are validated through the fused letterbox output.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from rm_radar_tpu.ops import preprocess


def _ramp_image(h=4, w=4, c=3):
    return np.arange(h * w * c, dtype=np.uint8).reshape(h, w, c)


def _reference_resize(src: np.ndarray, dst_h: int, dst_w: int) -> np.ndarray:
    """Direct (slow) reimplementation of the reference bilinear sampling for
    oracle purposes: src = dst * src/dst, truncating low index, clamped high
    index, uint8 truncation."""
    sh, sw, c = src.shape
    out = np.zeros((dst_h, dst_w, c), np.uint8)
    for y in range(dst_h):
        for x in range(dst_w):
            sy = y * sh / dst_h
            sx = x * sw / dst_w
            y0, x0 = int(sy), int(sx)
            y1, x1 = min(y0 + 1, sh - 1), min(x0 + 1, sw - 1)
            ly, lx = sy - y0, sx - x0
            val = (
                src[y0, x0] * (1 - ly) * (1 - lx)
                + src[y0, x1] * (1 - ly) * lx
                + src[y1, x0] * ly * (1 - lx)
                + src[y1, x1] * ly * lx
            )
            out[y, x] = val.astype(np.uint8)
    return out


def _resize_via_matrices(src: np.ndarray, dst_h: int, dst_w: int) -> np.ndarray:
    ry = preprocess._resample_matrix(dst_h, src.shape[0])
    rx = preprocess._resample_matrix(dst_w, src.shape[1])
    out = np.einsum("oh,hwc->owc", ry, src.astype(np.float32))
    out = np.einsum("owc,pw->opc", out, rx)
    return np.floor(np.clip(out, 0, 255)).astype(np.uint8)


# Hand-computed truth from the reference kernel test (ResizeDouble),
# flattened 8x8x3: the first two rows shown here, full check via oracle.
def test_resize_double_matches_reference_truth():
    src = _ramp_image()
    got = _resize_via_matrices(src, 8, 8)
    truth_first_rows = np.array(
        [0, 1, 2, 1, 2, 3, 3, 4, 5, 4, 5, 6, 6, 7, 8, 7, 8, 9, 9, 10, 11, 9, 10, 11],
        np.uint8,
    ).reshape(8, 3)
    np.testing.assert_array_equal(got[0], truth_first_rows)
    np.testing.assert_array_equal(got, _reference_resize(src, 8, 8))


def test_resize_half_matches_reference_truth():
    src = _ramp_image()
    got = _resize_via_matrices(src, 2, 2)
    truth = np.array(
        [0, 1, 2, 6, 7, 8, 24, 25, 26, 30, 31, 32], np.uint8
    ).reshape(2, 2, 3)
    np.testing.assert_array_equal(got, truth)


def test_resize_oracle_random_sizes(rng):
    """Non-dyadic scale factors: the separable (matmul) evaluation order can
    flip a uint8 truncation boundary on isolated pixels vs. the reference's
    4-corner order — tolerate |diff| <= 1 on < 2% of pixels, exact elsewhere.
    """
    src = rng.integers(0, 256, size=(7, 5, 3), dtype=np.uint8)
    for dh, dw in [(14, 10), (3, 2), (7, 5), (13, 4)]:
        got = _resize_via_matrices(src, dh, dw).astype(int)
        want = _reference_resize(src, dh, dw).astype(int)
        diff = np.abs(got - want)
        assert diff.max() <= 1
        assert np.count_nonzero(diff) <= 4  # isolated boundary pixels only


def test_letterbox_shapes_and_padding():
    # 1280x720 -> 640x640: resized to 640x360, dh=140 -> top=140, bottom=140.
    img = np.full((720, 1280, 3), 200, np.uint8)
    blob, pparam = preprocess.letterbox(jnp.asarray(img))
    blob = np.asarray(blob)
    assert blob.shape == (640, 640, 3)
    assert float(pparam.dh) == 140.0
    np.testing.assert_allclose(blob[0, :, :], 128.0 / 255.0)  # top pad row
    np.testing.assert_allclose(blob[139, :, :], 128.0 / 255.0)
    np.testing.assert_allclose(blob[140, :, :], 200.0 / 255.0)  # image start
    np.testing.assert_allclose(blob[499, :, :], 200.0 / 255.0)  # image end
    np.testing.assert_allclose(blob[500, :, :], 128.0 / 255.0)


def test_letterbox_bgr_to_rgb():
    img = np.zeros((640, 640, 3), np.uint8)
    img[..., 0] = 255  # blue channel (BGR)
    blob, _ = preprocess.letterbox(jnp.asarray(img))
    blob = np.asarray(blob)
    np.testing.assert_allclose(blob[..., 2], 1.0)  # now in RGB slot 2
    np.testing.assert_allclose(blob[..., 0], 0.0)


def test_letterbox_crop_matches_static_path(rng):
    """Cropping with the fused paths (MXU-matmul and gather formulations)
    must equal materializing the crop and running the static matmul path."""
    img = rng.integers(0, 256, size=(100, 120, 3), dtype=np.uint8)
    x, y, w, h = 10, 20, 60, 40
    crop = img[y : y + h, x : x + w]
    blob_static, pp_static = preprocess.letterbox(jnp.asarray(crop), 64, 64)
    for method in ("mxu", "gather"):
        blob_fused, pp_fused = preprocess.letterbox_crop(
            jnp.asarray(img),
            jnp.asarray([x, y, w, h], jnp.float32),
            64,
            64,
            method=method,
        )
        assert np.isclose(float(pp_static.ratio), float(pp_fused.ratio))
        assert np.isclose(float(pp_static.dw), float(pp_fused.dw))
        assert np.isclose(float(pp_static.dh), float(pp_fused.dh))
        np.testing.assert_allclose(
            np.asarray(blob_fused), np.asarray(blob_static), atol=1.01 / 255.0
        )
        # Exact on >99% of pixels (fp reassociation can flip a truncation
        # boundary on isolated pixels).
        exact = np.mean(np.asarray(blob_fused) == np.asarray(blob_static))
        assert exact > 0.99, method


def test_letterbox_crop_edge_cases(rng):
    img = rng.integers(0, 256, size=(50, 60, 3), dtype=np.uint8)
    # Degenerate and out-of-range crops must not crash (masked by callers).
    for rect in ([0.0, 0.0, 0.0, 0.0], [55.0, 45.0, 30.0, 30.0], [-5.0, -5.0, 20.0, 20.0]):
        blob, _ = preprocess.letterbox_crop(
            jnp.asarray(img), jnp.asarray(rect, jnp.float32), 32, 32
        )
        assert np.isfinite(np.asarray(blob)).all()


def test_letterbox_batch():
    imgs = np.stack([np.full((720, 1280, 3), v, np.uint8) for v in (10, 250)])
    blobs, pparams = preprocess.letterbox_batch(jnp.asarray(imgs), 640, 640)
    assert blobs.shape == (2, 640, 640, 3)
    assert pparams.ratio.shape == (2,)
    np.testing.assert_allclose(np.asarray(blobs)[0, 300, 300], 10.0 / 255.0)
    np.testing.assert_allclose(np.asarray(blobs)[1, 300, 300], 250.0 / 255.0)


def test_letterbox_crop_s2d_matches_plain(rng):
    """The s2d-layout crop must equal space_to_depth(plain crop blob)."""
    from rm_radar_tpu.models.yolov8 import space_to_depth

    img = rng.integers(0, 256, size=(100, 120, 3), dtype=np.uint8)
    for rect in ([10.0, 20.0, 60.0, 40.0], [0.0, 0.0, 120.0, 100.0], [30.0, 5.0, 17.0, 33.0]):
        box = jnp.asarray(rect, jnp.float32)
        blob, pp = preprocess.letterbox_crop(jnp.asarray(img), box, 64, 64)
        blob_s2d, pp2 = preprocess.letterbox_crop_s2d(jnp.asarray(img), box, 64, 64)
        expected = np.asarray(space_to_depth(np.asarray(blob)[None]))[0]
        np.testing.assert_allclose(
            np.asarray(blob_s2d), expected, atol=1.01 / 255.0, err_msg=str(rect)
        )
        exact = np.mean(np.asarray(blob_s2d) == expected)
        assert exact > 0.99, (rect, exact)
        assert np.isclose(float(pp.ratio), float(pp2.ratio))
        assert np.isclose(float(pp.dh), float(pp2.dh))


def test_crop_batch_windowed_matches_full(rng):
    """The windowed crop fast path (dynamic_slice neighborhood) must equal
    the full-extent path within one uint8 truncation level (fp reassociation
    across the different contraction extents can flip isolated truncation
    boundaries, as with the other fused-crop formulations), and frames with
    an oversize valid car must fall back to the full path (one batch-level
    lax.cond)."""

    def assert_blob_equal(a, b):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(a, b, atol=1.01 / 255.0)
        assert np.mean(a == b) > 0.99
    import functools

    import jax

    from rm_radar_tpu.detect.detector import _crop_batch
    from rm_radar_tpu.types import Detections

    img = jnp.asarray(rng.integers(0, 256, size=(100, 120, 3), dtype=np.uint8))
    crop_fn = functools.partial(
        preprocess.letterbox_crop, dst_height=32, dst_width=32
    )
    boxes = np.asarray(
        [
            [10.3, 20.7, 30.0, 25.0],
            [80.0, 60.0, 39.9, 39.9],  # right/bottom edge: window clamps
            [-5.0, -5.0, 20.0, 20.0],  # negative origin
            [0.0, 0.0, 1.0, 1.0],
        ],
        np.float32,
    )

    def cars(valid):
        return Detections(
            xywh=jnp.asarray(boxes),
            label=jnp.zeros(4, jnp.int32),
            confidence=jnp.ones(4, jnp.float32),
            valid=jnp.asarray(valid),
        )

    full_blobs, full_pp = _crop_batch(img, cars([True] * 4), crop_fn, 0)
    for window in (40, 64, 100):
        blobs, pp = jax.jit(
            lambda c: _crop_batch(img, c, crop_fn, window)
        )(cars([True] * 4))
        assert_blob_equal(blobs, full_blobs)
        np.testing.assert_array_equal(np.asarray(pp.ratio), np.asarray(full_pp.ratio))
        np.testing.assert_array_equal(np.asarray(pp.dw), np.asarray(full_pp.dw))

    # Oversize valid car -> fallback; oversize *invalid* car -> windowed path
    # still used and valid slots unchanged.
    big = boxes.copy()
    big[1] = [5.0, 5.0, 90.0, 80.0]
    for valid, expect_same_all in (([True] * 4, True), ([True, False, True, True], False)):
        c = Detections(
            xywh=jnp.asarray(big),
            label=jnp.zeros(4, jnp.int32),
            confidence=jnp.ones(4, jnp.float32),
            valid=jnp.asarray(valid),
        )
        ref_blobs, _ = _crop_batch(img, c, crop_fn, 0)
        win_blobs, _ = jax.jit(lambda cc: _crop_batch(img, cc, crop_fn, 40))(c)
        if expect_same_all:
            assert_blob_equal(win_blobs, ref_blobs)
        else:  # masked slot may differ; every valid slot must not
            for i, v in enumerate(valid):
                if v:
                    assert_blob_equal(
                        np.asarray(win_blobs)[i], np.asarray(ref_blobs)[i]
                    )


def test_letterbox_s2d_matches_reference_path(rng):
    """letterbox_s2d (the 2D channel-encoded matmul formulation) must equal
    space_to_depth(letterbox(img)) exactly in f32, including pad placement,
    BGR->RGB order and uint8 truncation — across aspect ratios that pad
    rows, pad columns, or neither."""
    from rm_radar_tpu.models.yolov8 import space_to_depth

    for (h, w), dst in (((100, 128), 64), ((128, 100), 64), ((64, 64), 64),
                        ((127, 53), 32)):
        img = jnp.asarray(rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8))
        blob, pp = preprocess.letterbox(img, dst, dst)
        expected = np.asarray(space_to_depth(np.asarray(blob)[None]))[0]
        got, pp2 = preprocess.letterbox_s2d(img, dst, dst)
        np.testing.assert_array_equal(np.asarray(got), expected, err_msg=str((h, w)))
        assert np.isclose(float(pp.ratio), float(pp2.ratio))
        assert np.isclose(float(pp.dw), float(pp2.dw))
        assert np.isclose(float(pp.dh), float(pp2.dh))


def _assert_quantization_tie_equal(banded, dense, msg, max_rate=5e-4):
    """Banded == dense up to floor-boundary quantization ties: any
    difference must be exactly one 1/255 step and touch <= max_rate of
    elements (a K-sliced dot regroups f32 accumulation / FMA, which can
    move a pre-floor value by 1 ulp across an integer boundary)."""
    b = np.asarray(banded)
    d = np.asarray(dense)
    diff = np.abs(b - d)
    bad = diff > 0
    if bad.any():
        # A one-step flip is floor(x)+-1 before the /255 scale; the two
        # quotients round separately, so the observed diff is 1/255 only to
        # within a few ulp (~1.5e-5 relative). Anything near 2/255 would be
        # a real (non-tie) error and fails this bound by ~1e5x.
        np.testing.assert_allclose(
            diff[bad], 1.0 / 255.0, rtol=1e-4,
            err_msg=f"{msg}: non-tie difference",
        )
    rate = bad.mean()
    assert rate <= max_rate, f"{msg}: tie rate {rate} > {max_rate}"


def test_letterbox_s2d_banded_matches_dense(rng):
    """The banded block lowering (band_block > 0) must equal the dense
    letterbox_s2d up to floor-boundary quantization ties, for every block
    size, including blocks that do not divide the output and all-pad
    blocks (excluded matrix entries are exactly 0.0; only the accumulation
    grouping differs)."""
    for (h, w), dst in (((100, 128), 64), ((128, 100), 64), ((64, 64), 64),
                        ((2048 // 8, 2592 // 8), 64), ((127, 53), 32)):
        img = jnp.asarray(rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8))
        dense, pp = preprocess.letterbox_s2d(img, dst, dst)
        for block in (4, 8, 13, dst):
            banded, pp2 = preprocess.letterbox_s2d(
                img, dst, dst, band_block=block
            )
            _assert_quantization_tie_equal(
                banded, dense, f"{(h, w)} block={block}"
            )
            assert float(pp.ratio) == float(pp2.ratio)


@pytest.mark.slow
def test_letterbox_s2d_banded_at_shipped_shape(rng):
    """Same bound at the real camera shape and shipped car input
    (2048x2592 -> 512) with the A/B candidate block sizes (measured tie
    rate there: ~9e-5)."""
    img = jnp.asarray(
        rng.integers(0, 256, size=(2048, 2592, 3), dtype=np.uint8)
    )
    dense, pp = preprocess.letterbox_s2d(img, 512, 512)
    for block in (8, 16, 32):
        banded, pp2 = preprocess.letterbox_s2d(img, 512, 512, band_block=block)
        _assert_quantization_tie_equal(banded, dense, f"block={block}")
        assert float(pp.ratio) == float(pp2.ratio)
