"""Fused letterbox preprocessing (resize + pad + blob) for TPU.

The reference runs three CUDA kernels per image — bilinear resize
(detector.cu:40-81), constant-border pad with value 128 (detector.cu:102-133)
and BGR→RGB planar float blob (detector.cu:151-171) — orchestrated over one
CUDA stream per image (detector.cu:439-502). On TPU the whole chain is one
fused XLA computation per image with no intermediate buffers:

* For the *static* full-frame path, bilinear resampling is expressed as two
  small matmuls (separable interpolation): ``out = R_y @ img @ R_x`` where
  R_y/R_x are trace-time numpy constants with two nonzeros per row. This runs
  on the MXU instead of a gather — the TPU-native formulation.
* For the *dynamic* crop path (armor cascade: crop rectangles are traced
  values), resampling is two one-axis gathers + lerps, which XLA lowers to
  efficient row/column gathers.

Sampling semantics exactly mirror the reference bilinear kernel:
``src = dst * src_size / dst_size`` (no half-pixel offset), low index by
float truncation, high index clamped to ``src_size - 1``, and the result is
truncated to uint8 (detector.cu:53-79) before scaling by 1/255.

The resized extent is ``round(size / ratio)`` — the reference computes the
pad split from the rounded size (preparam.h:50-51) but truncates the resize
target (detector.cu:394-400), leaving a one-pixel stale row at the bottom of
the network input for e.g. 2048-high frames. We use the rounded size for both
(consciously fixed; documented divergence of at most one edge row).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import compute_pre_param
from ..types import Array, PreParams


def _round_half_away(x: float) -> int:
    return int(math.floor(x + 0.5)) if x >= 0 else -int(math.floor(-x + 0.5))


def _resample_matrix(dst: int, src: int) -> np.ndarray:
    """[dst, src] bilinear sampling matrix with reference semantics."""
    m = np.zeros((dst, src), np.float32)
    pos = np.arange(dst, dtype=np.float64) * (src / dst)
    low = np.floor(pos).astype(np.int64)
    high = np.minimum(low + 1, src - 1)
    frac = (pos - low).astype(np.float32)
    m[np.arange(dst), low] += 1.0 - frac
    m[np.arange(dst), high] += frac
    return m


def letterbox(
    image: Array,
    dst_height: int = 640,
    dst_width: int = 640,
    pad_value: float = 128.0,
) -> Tuple[Array, PreParams]:
    """Letterbox a uint8 BGR HWC image of static shape to a float RGB blob.

    Returns ([dst_h, dst_w, 3] float32 RGB in [0, 1], PreParams).
    """
    src_h, src_w = int(image.shape[0]), int(image.shape[1])
    pparam = compute_pre_param(src_h, src_w, dst_height, dst_width)
    ratio = 1.0 / min(dst_height / src_h, dst_width / src_w)
    rh = _round_half_away(src_h / ratio)
    rw = _round_half_away(src_w / ratio)
    dh = (dst_height - rh) * 0.5
    dw = (dst_width - rw) * 0.5
    top = _round_half_away(dh - 0.1)
    bottom = _round_half_away(dh + 0.1)
    left = _round_half_away(dw - 0.1)
    right = _round_half_away(dw + 0.1)

    # Default matmul precision: exact on CPU (where bit-parity tests run);
    # on TPU the single-pass bf16 MXU path costs at most one uint8 level of
    # rounding, invisible to detection and 6x faster than HIGHEST.
    ry = jnp.asarray(_resample_matrix(rh, src_h))
    rx = jnp.asarray(_resample_matrix(rw, src_w))
    img = image.astype(jnp.float32)
    resized = jnp.einsum("oh,hwc->owc", ry, img)
    resized = jnp.einsum("owc,pw->opc", resized, rx)
    # uint8 truncation parity with the reference kernel's final cast.
    resized = jnp.floor(jnp.clip(resized, 0.0, 255.0))
    padded = jnp.pad(
        resized,
        ((top, bottom), (left, right), (0, 0)),
        constant_values=pad_value,
    )
    # BGR -> RGB, scale to [0, 1] (blobKernel semantics).
    blob = padded[..., ::-1] * (1.0 / 255.0)
    return blob, pparam


def _letterbox_s2d_matrices(
    src_h: int, src_w: int, dst_height: int, dst_width: int
):
    """Trace-time constants for :func:`letterbox_s2d` (numpy)."""
    ratio = 1.0 / min(dst_height / src_h, dst_width / src_w)
    rh = _round_half_away(src_h / ratio)
    rw = _round_half_away(src_w / ratio)
    dh = (dst_height - rh) * 0.5
    dw = (dst_width - rw) * 0.5
    top = _round_half_away(dh - 0.1)
    left = _round_half_away(dw - 0.1)

    ry = _resample_matrix(rh, src_h)  # [rh, src_h]
    rx = _resample_matrix(rw, src_w)  # [rw, src_w]
    # Fold the pad placement into blob-indexed matrices (pad rows/cols all
    # zero; the 128 fill is applied by mask afterwards).
    ry_blob = np.zeros((dst_height, src_h), np.float32)
    ry_blob[top : top + rh] = ry
    row_valid = np.zeros((dst_height,), bool)
    row_valid[top : top + rh] = True
    col_valid = np.zeros((dst_width,), bool)
    col_valid[left : left + rw] = True

    # Column matrix in channel-interleaved 2D form: source lane 3*w + c_src,
    # output lane o*6 + q*3 + c_rgb for blob column x = 2*o + q, with the
    # BGR->RGB flip folded in (c_src = 2 - c_rgb).
    w2 = dst_width // 2
    wx = np.zeros((src_w * 3, w2 * 6), np.float32)
    xs, ws = np.nonzero(rx)  # blob-resized col x, source col w
    for x, w in zip(xs, ws):
        o, q = (left + x) // 2, (left + x) % 2
        for c_rgb in range(3):
            wx[3 * w + (2 - c_rgb), o * 6 + q * 3 + c_rgb] = rx[x, w]
    return ry_blob, wx, row_valid, col_valid


def _banded_left(const_m: np.ndarray, x: Array, block: int, mm_dtype) -> Array:
    """``const_m @ x`` exploiting the constant's banded sparsity.

    The resample matrices have two nonzeros per row in a monotone band, so a
    dense [M, K] matmul wastes ~K/(2·M/K-span) of its FLOPs multiplying
    structural zeros. Splitting the output into static row blocks and slicing
    each block's nonzero source range (known at trace time) keeps everything
    on the MXU while cutting the FLOPs ~block/(band). The excluded entries
    are exactly 0.0, so every output element sums the same nonzero products —
    but the *accumulation grouping* of a K-sliced dot differs from the dense
    one (vectorized partial sums / FMA contraction), which can move a result
    by 1 ulp. Downstream of the letterbox's floor() quantization that flips
    values sitting exactly on an integer boundary by one 1/255 step: measured
    ~1e-4 of output elements at the full camera shape (tests/
    test_preprocess.py asserts the bound). Not bit-exact — quantization-tie
    differences only.
    """
    m = const_m.shape[0]
    outs = []
    for b0 in range(0, m, block):
        blk = const_m[b0 : b0 + block]
        nz = np.nonzero(blk.any(axis=0))[0]
        if nz.size == 0:
            outs.append(jnp.zeros((blk.shape[0], x.shape[1]), jnp.float32))
            continue
        lo, hi = int(nz[0]), int(nz[-1]) + 1
        outs.append(
            jnp.matmul(
                jnp.asarray(blk[:, lo:hi], mm_dtype),
                x[lo:hi],
                preferred_element_type=jnp.float32,
            )
        )
    return jnp.concatenate(outs, axis=0)


def _banded_right(x: Array, const_m: np.ndarray, block: int, mm_dtype) -> Array:
    """``x @ const_m`` exploiting banded sparsity (see :func:`_banded_left`)."""
    n = const_m.shape[1]
    outs = []
    for c0 in range(0, n, block):
        blk = const_m[:, c0 : c0 + block]
        nz = np.nonzero(blk.any(axis=1))[0]
        if nz.size == 0:
            outs.append(jnp.zeros((x.shape[0], blk.shape[1]), jnp.float32))
            continue
        lo, hi = int(nz[0]), int(nz[-1]) + 1
        outs.append(
            jnp.matmul(
                x[:, lo:hi],
                jnp.asarray(blk[lo:hi], mm_dtype),
                preferred_element_type=jnp.float32,
            )
        )
    return jnp.concatenate(outs, axis=1)


def letterbox_s2d(
    image: Array,
    dst_height: int = 640,
    dst_width: int = 640,
    pad_value: float = 128.0,
    matmul_dtype=None,
    band_block: int = 0,
) -> Tuple[Array, PreParams]:
    """Static letterbox emitting the space-to-depth blob layout directly.

    Equals ``space_to_depth(letterbox(image)[None])[0]`` (tested), i.e.
    [dst_h/2, dst_w/2, 12] with (p, q, c) channel order — what the YOLOv8
    s2d stem consumes via ``pre_s2d=True``.

    Why it exists: the reshape/transpose space-to-depth of a [640, 640, 3]
    blob costs ~1.5 ms on v5e (3-wide minor dims tile terribly), and a
    parity-split variant of the [H, W, 3] einsums measured neutral for the
    same reason. This formulation never materializes a minor-dim-3 tensor:
    the image is viewed as [H, W*3] (a free reshape of the contiguous HWC
    layout), one row-resample matmul per row parity produces [dst_h/2, W*3],
    and one column matmul against a constant [W*3, dst_w/2*6] matrix — which
    encodes column resampling, the q parity split, channel deinterleave and
    the BGR->RGB flip as one linear map — lands directly in s2d layout.

    ``band_block`` > 0 additionally lowers both matmuls as banded block
    matmuls (:func:`_banded_left`): output blocks of ``band_block`` rows
    (``6 * band_block`` lanes for the column matmul) each contract only
    against their static nonzero source band — ~an order of magnitude fewer
    MXU FLOPs at full-camera downscale ratios (2592->512 is a 5x band).
    Output is equal up to floor-boundary quantization ties (~1e-4 of
    elements move by one 1/255 step at the full camera shape; see
    :func:`_banded_left`).
    """
    src_h, src_w = int(image.shape[0]), int(image.shape[1])
    pparam = compute_pre_param(src_h, src_w, dst_height, dst_width)
    ry_blob, wx, row_valid, col_valid = _letterbox_s2d_matrices(
        src_h, src_w, dst_height, dst_width
    )
    mm_dtype = matmul_dtype or jnp.float32
    img2d = image.reshape(src_h, src_w * 3).astype(mm_dtype)
    wx_c = None if band_block else jnp.asarray(wx, mm_dtype)
    h2, w2 = dst_height // 2, dst_width // 2
    halves = []
    for p in (0, 1):
        if band_block:
            rows = _banded_left(
                ry_blob[p::2], img2d, band_block, mm_dtype
            ).astype(mm_dtype)
            out = _banded_right(rows, wx, 6 * band_block, mm_dtype)
        else:
            ry_p = jnp.asarray(ry_blob[p::2], mm_dtype)  # [h2, src_h]
            rows = jnp.matmul(
                ry_p, img2d, preferred_element_type=jnp.float32
            ).astype(mm_dtype)
            out = jnp.matmul(
                rows, wx_c, preferred_element_type=jnp.float32
            )  # [h2, w2*6]
        out = jnp.floor(jnp.clip(out.reshape(h2, w2, 6), 0.0, 255.0))
        mask = (
            row_valid[p::2][:, None, None]
            & np.repeat(col_valid.reshape(w2, 2), 3, axis=-1)[None]
        )
        halves.append(jnp.where(mask, out, pad_value))
    blob = jnp.concatenate(halves, axis=-1) * (1.0 / 255.0)
    return blob, pparam


def letterbox_batch(
    images: Array, dst_height: int = 640, dst_width: int = 640
) -> Tuple[Array, PreParams]:
    """Batched static letterbox: [B, H, W, 3] uint8 -> [B, dst, dst, 3] f32.

    All images share one size (the multi-camera case), so the resampling
    matrices are shared and the whole batch is two batched matmuls.
    """
    fn = lambda im: letterbox(im, dst_height, dst_width)
    blobs, pparams = jax.vmap(fn)(images)
    return blobs, pparams


def _axis_gather_lerp(
    img: Array, pos: Array, limit: Array, offset: Array, axis: int
) -> Array:
    """Bilinear sample along one axis at traced positions.

    ``pos``: [n] float sample coordinates relative to the crop; ``limit``:
    crop extent (clamp to limit-1); ``offset``: crop origin in the full image.
    """
    low = jnp.floor(pos).astype(jnp.int32)
    high = jnp.minimum(low + 1, limit - 1)
    frac = (pos - low.astype(jnp.float32))[
        (slice(None),) + (None,) * (img.ndim - 1 - axis)
    ]
    lo = jnp.take(img, low + offset, axis=axis)
    hi = jnp.take(img, high + offset, axis=axis)
    return lo.astype(jnp.float32) * (1.0 - frac) + hi.astype(jnp.float32) * frac


def _traced_resample_matrix(
    dst: int, src_size: int, positions: Array, offset: Array, limit: Array
) -> Array:
    """[dst, src_size] bilinear weight matrix for traced sample positions.

    ``positions`` are crop-relative float coords per output pixel; ``offset``
    is the crop origin, ``limit`` the crop extent (high index clamps to
    limit-1, reference detector.cu:57-59). Built with broadcast comparisons
    (VPU) so the resample itself runs on the MXU as a matmul — arbitrary
    gathers are the slowest primitive on TPU, matmuls the fastest.
    """
    low = jnp.floor(positions).astype(jnp.int32)
    high = jnp.minimum(low + 1, limit - 1)
    frac = positions - low.astype(jnp.float32)
    src = jnp.arange(src_size, dtype=jnp.int32)[None, :]
    low_abs = (low + offset)[:, None]
    high_abs = (high + offset)[:, None]
    return ((src == low_abs).astype(jnp.float32) * (1.0 - frac)[:, None]
            + (src == high_abs).astype(jnp.float32) * frac[:, None])


def letterbox_crop_s2d(
    image: Array,
    crop_xywh: Array,
    dst_height: int = 640,
    dst_width: int = 640,
    pad_value: float = 128.0,
    matmul_dtype=None,
) -> Tuple[Array, PreParams]:
    """Fused crop + letterbox emitting the blob in space-to-depth layout.

    Produces [dst_h/2, dst_w/2, 12] directly (channel order (p, q, c) —
    exactly what YoloV8's s2d stem consumes via ``pre_s2d=True``), by
    splitting the output-row/column resample matrices by parity: four small
    einsums instead of two big ones (same total FLOPs), and the blob never
    exists in [dst, dst, 3] form — killing the stem's reshape/transpose
    layout-copy chain (~1.9 ms at batch 8 on v5e).
    Matches depth_to_space(letterbox_crop(...)) exactly (tested).
    """
    src_h, src_w = int(image.shape[0]), int(image.shape[1])
    x0 = jnp.clip(crop_xywh[0].astype(jnp.int32), 0, src_w - 1)
    y0 = jnp.clip(crop_xywh[1].astype(jnp.int32), 0, src_h - 1)
    cw = jnp.clip(crop_xywh[2].astype(jnp.int32), 1, src_w - x0)
    ch = jnp.clip(crop_xywh[3].astype(jnp.int32), 1, src_h - y0)
    cwf = cw.astype(jnp.float32)
    chf = ch.astype(jnp.float32)

    pparam = compute_pre_param(chf, cwf, dst_height, dst_width)
    from ..geometry import letterbox_padding, round_half_away

    rh = round_half_away(chf / pparam.ratio).astype(jnp.int32)
    rw = round_half_away(cwf / pparam.ratio).astype(jnp.int32)
    top, _, left, _ = letterbox_padding(pparam)

    oy = jnp.arange(dst_height, dtype=jnp.int32) - top
    ox = jnp.arange(dst_width, dtype=jnp.int32) - left
    y_valid = (oy >= 0) & (oy < rh)
    x_valid = (ox >= 0) & (ox < rw)
    ys = jnp.clip(oy.astype(jnp.float32) * (chf / rh.astype(jnp.float32)), 0.0, chf - 1.0)
    xs = jnp.clip(ox.astype(jnp.float32) * (cwf / rw.astype(jnp.float32)), 0.0, cwf - 1.0)

    mm_dtype = matmul_dtype or jnp.float32
    img = image.astype(mm_dtype)
    halves = []
    masks = []
    rows_p = []
    for p in (0, 1):
        ry = _traced_resample_matrix(
            dst_height // 2, src_h, ys[p::2], y0, ch
        ).astype(mm_dtype)
        rows_p.append(
            jnp.einsum(
                "os,swc->owc", ry, img, preferred_element_type=jnp.float32
            ).astype(mm_dtype)
        )
    for p in (0, 1):
        for q in (0, 1):
            rx = _traced_resample_matrix(
                dst_width // 2, src_w, xs[q::2], x0, cw
            ).astype(mm_dtype)
            halves.append(
                jnp.einsum(
                    "owc,pw->opc",
                    rows_p[p],
                    rx,
                    preferred_element_type=jnp.float32,
                )
            )
            masks.append(
                (y_valid[p::2][:, None] & x_valid[q::2][None, :])[..., None]
            )
    out = jnp.stack(halves, axis=2)  # [H/2, W/2, 4, 3]
    mask = jnp.stack(masks, axis=2)
    out = jnp.floor(jnp.clip(out, 0.0, 255.0))
    out = jnp.where(mask, out, pad_value)
    blob = out[..., ::-1] * (1.0 / 255.0)  # BGR->RGB within each (p, q) block
    h2, w2 = dst_height // 2, dst_width // 2
    return blob.reshape(h2, w2, 12), pparam


def letterbox_crop(
    image: Array,
    crop_xywh: Array,
    dst_height: int = 640,
    dst_width: int = 640,
    pad_value: float = 128.0,
    method: str = "mxu",
    matmul_dtype=None,
) -> Tuple[Array, PreParams]:
    """Crop a (traced) rect out of a full image and letterbox it — fused.

    Replaces the reference's host-side ``image(rect).clone()`` per car
    (detector.cpp:417-424) followed by the CUDA preprocess: the crop never
    materializes; the resample reads straight from the full image with the
    crop origin folded into the gather indices.

    ``crop_xywh`` is float (x, y, w, h) in full-image pixels; the reference
    constructs an int cv::Rect from the float detection (truncation), which
    we reproduce. Degenerate/invalid crops (w or h < 1) are clamped to 1 px;
    callers mask those outputs.

    ``method``: "mxu" (default) expresses the resample as two matmuls with
    traced weight matrices — the fast path on TPU where arbitrary gathers
    serialize; "gather" uses two one-axis gathers + lerps (bit-closest to
    the reference's 4-corner kernel; fine on CPU).

    ``matmul_dtype``: optional reduced dtype (e.g. bfloat16) for the MXU
    resample operands, accumulating in f32. Pixel values are exact in bf16;
    the interpolation weights round to ~0.4%, bounding the error at about
    one uint8 level — irrelevant when the blob feeds a bf16 network, so the
    detector cascade uses bf16 here. Default None keeps exact f32.
    """
    src_h, src_w = int(image.shape[0]), int(image.shape[1])
    x0 = jnp.clip(crop_xywh[0].astype(jnp.int32), 0, src_w - 1)
    y0 = jnp.clip(crop_xywh[1].astype(jnp.int32), 0, src_h - 1)
    cw = jnp.clip(crop_xywh[2].astype(jnp.int32), 1, src_w - x0)
    ch = jnp.clip(crop_xywh[3].astype(jnp.int32), 1, src_h - y0)
    cwf = cw.astype(jnp.float32)
    chf = ch.astype(jnp.float32)

    pparam = compute_pre_param(chf, cwf, dst_height, dst_width)
    # Resized extent (in the dst frame) and integer paddings, traced.
    from ..geometry import letterbox_padding, round_half_away

    rh = round_half_away(chf / pparam.ratio).astype(jnp.int32)
    rw = round_half_away(cwf / pparam.ratio).astype(jnp.int32)
    top, _, left, _ = letterbox_padding(pparam)

    # Sample positions for every output pixel: out pixel o maps to resized
    # coordinate (o - pad), valid when 0 <= o - pad < resized extent;
    # source position = (o - pad) * crop / resized.
    oy = jnp.arange(dst_height, dtype=jnp.int32) - top
    ox = jnp.arange(dst_width, dtype=jnp.int32) - left
    y_valid = (oy >= 0) & (oy < rh)
    x_valid = (ox >= 0) & (ox < rw)
    ys = oy.astype(jnp.float32) * (chf / rh.astype(jnp.float32))
    xs = ox.astype(jnp.float32) * (cwf / rw.astype(jnp.float32))
    ys = jnp.clip(ys, 0.0, chf - 1.0)
    xs = jnp.clip(xs, 0.0, cwf - 1.0)

    if method == "mxu":
        mm_dtype = matmul_dtype or jnp.float32
        ry = _traced_resample_matrix(dst_height, src_h, ys, y0, ch).astype(mm_dtype)
        rx = _traced_resample_matrix(dst_width, src_w, xs, x0, cw).astype(mm_dtype)
        rows = jnp.einsum(
            "os,swc->owc",
            ry,
            image.astype(mm_dtype),
            preferred_element_type=jnp.float32,
        ).astype(mm_dtype)
        out = jnp.einsum(
            "owc,pw->opc", rows, rx, preferred_element_type=jnp.float32
        )
    else:
        rows = _axis_gather_lerp(image, ys, ch, y0, axis=0)  # [dst_h, W, 3]
        out = _axis_gather_lerp(rows, xs, cw, x0, axis=1)
    out = jnp.floor(jnp.clip(out, 0.0, 255.0))
    mask = (y_valid[:, None] & x_valid[None, :])[..., None]
    out = jnp.where(mask, out, pad_value)
    # NOTE: emitting the blob in bf16 was measured SLOWER (+1.3 ms e2e):
    # a bf16 [., ., 3] tensor tiles as (16, 128) with a 3-wide minor dim —
    # worse than f32 (8, 128). The f32 blob stands.
    blob = out[..., ::-1] * (1.0 / 255.0)
    return blob, pparam
