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
