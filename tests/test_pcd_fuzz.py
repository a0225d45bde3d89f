"""Fuzz tests for the PCD parsers (native C++ and Python fallback).

The parser consumes external files (the reference trusts PCL here); both
implementations must never crash or corrupt memory on malformed input —
negative/oversized POINTS counts, truncated payloads, junk bytes — and must
agree with each other on well-formed files. (The negative-POINTS binary case
originally drove a (size_t)(-n*12) memcpy in the native layer: heap
corruption, caught by this suite.)
"""

import io

import numpy as np
import pytest

from rm_radar_tpu import native
from rm_radar_tpu.utils import io as rio


def _native_parse(data: bytes):
    if not native.available():
        pytest.skip("native parser not built")
    return native.parse_pcd_bytes(data)


HEADER = (
    b"# .PCD v0.7\nVERSION 0.7\nFIELDS x y z\nSIZE 4 4 4\nTYPE F F F\n"
    b"COUNT 1 1 1\nWIDTH %d\nHEIGHT 1\nPOINTS %d\nDATA %s\n"
)


def _ascii_pcd(points, claimed=None):
    n = len(points) if claimed is None else claimed
    body = "\n".join(" ".join(f"{v:.6g}" for v in p) for p in points)
    return HEADER % (n, n, b"ascii") + body.encode()


def _binary_pcd(points, claimed=None):
    n = len(points) if claimed is None else claimed
    body = np.asarray(points, "<f4").tobytes()
    return HEADER % (n, n, b"binary") + body


def test_negative_points_count():
    for data in (
        HEADER % (0, -5, b"binary") + b"\x00" * 48,
        HEADER % (0, -5, b"ascii") + b"1 2 3\n",
    ):
        out = _native_parse(data)
        assert out.shape == (0, 3)


def test_oversized_points_claim():
    # Claims a billion points, ships three.
    pts = [[1, 2, 3], [4, 5, 6], [7, 8, 9]]
    for data in (
        _ascii_pcd(pts, claimed=10**9),
        _binary_pcd(pts, claimed=10**9),
    ):
        out = _native_parse(data)
        assert len(out) <= 3  # truncated to the real payload
        if len(out) == 3:
            np.testing.assert_allclose(out, pts)


def test_truncated_binary_payload():
    data = _binary_pcd([[1, 2, 3], [4, 5, 6]])
    out = _native_parse(data[:-7])  # cuts into the second point
    assert len(out) == 1
    np.testing.assert_allclose(out[0], [1, 2, 3])


def test_random_junk_never_crashes():
    rng = np.random.default_rng(0)
    for _ in range(200):
        blob = rng.integers(0, 256, size=rng.integers(0, 400), dtype=np.uint8).tobytes()
        try:
            _native_parse(blob)
        except ValueError:
            pass  # malformed header is a fine answer; crashing is not


def test_mutated_valid_files_never_crash():
    rng = np.random.default_rng(1)
    base_ascii = _ascii_pcd([[1.5, -2.5, 3e4], [0, 0, 1]])
    base_bin = _binary_pcd([[1.5, -2.5, 3e4], [0, 0, 1]])
    for base in (base_ascii, base_bin):
        for _ in range(150):
            b = bytearray(base)
            for _ in range(rng.integers(1, 6)):
                b[rng.integers(0, len(b))] = rng.integers(0, 256)
            try:
                _native_parse(bytes(b))
            except ValueError:
                pass


def test_native_matches_python_fallback(tmp_path):
    rng = np.random.default_rng(2)
    pts = rng.uniform(-3e4, 3e4, size=(137, 3)).astype(np.float32)
    p = tmp_path / "c.pcd"
    rio.save_pcd(str(p), pts)
    via_file = rio.load_pcd(str(p))  # native when built
    data = p.read_bytes()
    nat = _native_parse(data)
    np.testing.assert_allclose(nat, via_file, rtol=1e-6)
    np.testing.assert_allclose(nat, pts, rtol=1e-4, atol=0.5)
