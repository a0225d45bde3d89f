"""Foreground-compaction kernel tests: the Pallas sparse-scan (interpret
mode on CPU), the dense top_k lowering, and a numpy oracle must agree on
scan order, values and padding."""

import numpy as np
import jax.numpy as jnp

from rm_radar_tpu.ops.pallas_kernels import (
    foreground_compact_blocked,
    foreground_compact_pallas,
    foreground_compact_topk,
)


def _oracle(diff, n):
    flat = np.asarray(diff).reshape(-1)
    nz = np.flatnonzero(flat)[:n]
    idx = np.full(n, -1, np.int64)
    val = np.zeros(n, np.float32)
    idx[: len(nz)] = nz
    val[: len(nz)] = flat[nz]
    return idx, val


def _check(diff, n):
    want_idx, want_val = _oracle(diff, n)
    for fn in (
        foreground_compact_pallas,
        foreground_compact_topk,
        foreground_compact_blocked,
    ):
        idx, val = fn(jnp.asarray(diff), n)
        np.testing.assert_array_equal(np.asarray(idx), want_idx, err_msg=fn.__name__)
        np.testing.assert_allclose(np.asarray(val), want_val, err_msg=fn.__name__)


def test_sparse_random(rng):
    diff = np.zeros((64, 128), np.float32)
    ys = rng.integers(0, 64, size=40)
    xs = rng.integers(0, 128, size=40)
    diff[ys, xs] = rng.uniform(1.0, 5.0, size=40).astype(np.float32)
    _check(diff, 64)


def test_empty():
    _check(np.zeros((16, 128), np.float32), 32)


def test_overflow_takes_first_n_in_scan_order():
    diff = np.zeros((16, 128), np.float32)
    diff[3, :] = 1.0  # 128 nonzeros in one row
    diff[10, 5] = 2.0
    idx, val = _oracle(diff, 16)
    _check(diff, 16)
    # Sanity on the oracle itself: first 16 are the row-3 prefix.
    assert list(idx) == [3 * 128 + c for c in range(16)]


def test_dense_block():
    diff = np.zeros((24, 128), np.float32)
    diff[8:16, 32:40] = 7.0
    _check(diff, 128)


def test_blocked_falls_back_when_bands_exceeded():
    # Nonzeros spread over more bands than max_bands: the lax.cond fallback
    # keeps the result exact (equal to the dense lowering).
    diff = np.zeros((64, 128), np.float32)
    diff[::2, 0] = 3.0  # 32 nonzero 2-row bands
    want_idx, want_val = _oracle(diff, 40)
    for max_bands in (8, 32):  # 8 forces the dense fallback
        idx, val = foreground_compact_blocked(
            jnp.asarray(diff), 40, band_rows=2, max_bands=max_bands
        )
        np.testing.assert_array_equal(np.asarray(idx), want_idx, err_msg=str(max_bands))
        np.testing.assert_allclose(np.asarray(val), want_val)


# --------------------------------------------------- round-4 re-audit kernels
#
# On the CPU backend both run in Pallas interpret mode; on a real TPU the
# same tests exercise the compiled Mosaic kernels (interpret=None default).


def _identity_locator(max_points=512, max_fg=64):
    import dataclasses

    from rm_radar_tpu.configs import LocatorConfig
    from rm_radar_tpu.geometry import LidarCalib

    cfg = LocatorConfig(
        image_width=256,
        image_height=128,
        zoom_factor=0.5,
        min_depth_diff=0.5,
        max_depth_diff=4.0,
        max_distance=1e9,
        max_points=max_points,
        max_foreground=max_fg,
        candidate_compaction="dedup3_topk",
    )
    calib = LidarCalib.create(np.eye(3), np.eye(4), np.eye(4), cfg.zoom_factor)
    return cfg, calib


def _locator_state_with_fg(rng, cfg, calib):
    from rm_radar_tpu.locate import locator as loc

    def cloud(z):
        u = rng.uniform(1, 126, 400)
        v = rng.uniform(1, 62, 400)
        pts = np.stack([u / 0.5 * z, v / 0.5 * z, np.full(400, z)], -1)
        out = np.zeros((cfg.max_points, 3), np.float32)
        out[:400] = pts.astype(np.float32)
        return jnp.asarray(out)

    state = loc.make_state(cfg)
    state, diff = loc.update(state, cloud(8.0), calib, cfg)
    for _ in range(3):
        state, diff = loc.update(state, cloud(6.0), calib, cfg)
    return state, diff


def test_compact_candidates_pallas_equals_dedup3_topk():
    from rm_radar_tpu.locate import locator as loc
    from rm_radar_tpu.ops.pallas_kernels import compact_candidates_pallas

    cfg, calib = _identity_locator()
    rng = np.random.default_rng(0)
    state, diff = _locator_state_with_fg(rng, cfg, calib)
    for n_out in (cfg.max_foreground, 16):  # normal + saturated
        want = loc._compact_from_candidates(
            diff, state.pix_queue, state.depth_queue, n_out,
            method="dedup3_topk",
        )
        got = compact_candidates_pallas(
            diff, state.pix_queue, state.depth_queue, n_out
        )
        np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(want[0]))
        np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(want[1]))


def test_compact_candidates_pallas_via_cluster_method():
    """The config-level lowering ("dedup3_pallas") produces the identical
    Foreground through the public cluster() path."""
    import dataclasses

    from rm_radar_tpu.locate import locator as loc

    cfg, calib = _identity_locator()
    rng = np.random.default_rng(1)
    state, diff = _locator_state_with_fg(rng, cfg, calib)
    fg_ref = loc.cluster(diff, calib, cfg, candidates=state)
    cfg_p = dataclasses.replace(cfg, candidate_compaction="dedup3_pallas")
    # Same enqueue pruning class (both startswith dedup3) -> state pairs.
    fg_pal = loc.cluster(diff, calib, cfg_p, candidates=state)
    for a, b in zip(fg_ref, fg_pal):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_crop_letterbox_s2d_pallas_matches_xla():
    from rm_radar_tpu.ops.pallas_kernels import crop_letterbox_s2d_pallas
    from rm_radar_tpu.ops.preprocess import letterbox_crop_s2d

    import jax

    rng = np.random.default_rng(0)
    img = jnp.asarray(
        rng.integers(0, 255, size=(512, 640, 3), dtype=np.uint8)
    )
    boxes = jnp.asarray(
        np.array(
            [
                [100.3, 50.7, 200.9, 150.2],
                [0.0, 0.0, 640.0, 512.0],  # exceeds window -> fits False
                [300.0, 300.0, 40.0, 90.0],
                [630.0, 500.0, 30.0, 30.0],  # clamped at the edges
            ],
            np.float32,
        )
    )
    blob, pp, fits = crop_letterbox_s2d_pallas(img, boxes, 64, 64, window=256)
    want_blob, want_pp = jax.vmap(
        lambda b: letterbox_crop_s2d(img, b, 64, 64)
    )(boxes)
    fits = np.asarray(fits)
    assert fits.tolist() == [True, False, True, True]
    for i in range(4):
        if fits[i]:
            np.testing.assert_array_equal(
                np.asarray(blob[i]), np.asarray(want_blob[i]), err_msg=str(i)
            )
    for f in pp._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(pp, f)), np.asarray(getattr(want_pp, f))
        )


def test_crop_batch_pallas_cascade_equivalence():
    """RM_RADAR_CROP_PALLAS=1 through the full RobotDetector cascade on a
    tiny config equals the XLA crop path exactly (f32)."""
    import os

    import jax

    from rm_radar_tpu.configs import RobotDetectorConfig
    from rm_radar_tpu.detect.detector import RobotDetector

    cfg = RobotDetectorConfig(
        max_cars=4,
        max_armors_per_car=4,
        input_width=64,
        input_height=64,
        armor_input_width=64,
        armor_input_height=64,
        car_conf_thresh=0.01,
        armor_conf_thresh=0.01,
        crop_window=96,
    )
    det = RobotDetector(cfg, "n", "n", dtype=jnp.float32)
    img = np.random.default_rng(7).integers(
        0, 255, size=(128, 160, 3), dtype=np.uint8
    )
    want = jax.device_get(jax.jit(det.detect_fn)(img))
    os.environ["RM_RADAR_CROP_PALLAS"] = "1"
    try:
        got = jax.device_get(jax.jit(det.detect_fn)(img))
    finally:
        os.environ.pop("RM_RADAR_CROP_PALLAS")
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)
