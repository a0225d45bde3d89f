"""Pallas TPU kernels for ops where XLA's lowering is the bottleneck.

Currently: sparse foreground compaction. The locate stage needs the first N
nonzero pixels (index + depth) of the 1.3M-pixel diff image in scan order
(reference locate.cpp:237-249 walks the image on the CPU). XLA offers two
lowerings, both dense: ``jnp.nonzero(size=N)`` (full-image scatter, ~13 ms on
v5e) and a ``top_k`` over negated indices (~2.8 ms). But the diff image is
*extremely* sparse (foreground clusters are capped at 1000 points,
locator.h:63), so a sequential-grid Pallas kernel that vector-scans row
blocks and only falls into the scalar compaction loop for rows that contain
foreground beats both: the dense part is one pass of vector reductions at
HBM speed, the sparse part touches only the ~dozens of nonzero rows, and an
SMEM counter carries the output cursor across the (sequential) TPU grid.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


from ..types import Array


def _compact_kernel(diff_ref, idx_ref, val_ref, count_ref, *, n_out, width, block_rows):
    """One grid step: scan a [block_rows, width] block of the diff image.

    All outputs are SMEM (TPU only allows scalar element stores there):
    idx [n_out], val [n_out] and the running cursor count [1], which doubles
    as the result's valid length. Slots past the final count are left
    unwritten and masked by the caller.
    """
    import jax.experimental.pallas as pl

    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        count_ref[0] = 0

    block = diff_ref[:, :]
    base_row = step * block_rows
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, width), 1)

    # Static unroll over the (few) block rows. Mosaic forbids dynamic
    # per-element VMEM access, so nonzero extraction is done with vector
    # reductions only: repeatedly take the leftmost unconsumed nonzero
    # column (masked min over a column iota) and read its value with a
    # one-hot masked sum — a handful of VPU reductions per emitted pixel.
    for r in range(block_rows):
        row = block[r : r + 1, :]  # [1, width], static slice
        row_mask = row != 0.0
        row_count = jnp.sum(row_mask.astype(jnp.int32))

        @pl.when(row_count > 0)
        def _scan_row(row=row, row_mask=row_mask, row_count=row_count, r=r):
            def body(k, consumed_col):
                live = row_mask & (cols > consumed_col)
                col = jnp.min(jnp.where(live, cols, width))
                value = jnp.sum(jnp.where(cols == col, row, 0.0))

                @pl.when(count_ref[0] < n_out)
                def _emit():
                    cursor = count_ref[0]
                    idx_ref[cursor] = (base_row + r) * width + col
                    val_ref[cursor] = value
                    count_ref[0] = cursor + 1

                return col

            jax.lax.fori_loop(0, row_count, body, jnp.int32(-1))


def foreground_compact_pallas(
    diff: Array, n_out: int, block_rows: int = 8
) -> tuple[Array, Array]:
    """First ``n_out`` nonzero pixels of ``diff`` in scan order.

    Returns (flat_idx [n_out] int32 with -1 padding, value [n_out] f32).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h, w = diff.shape
    assert h % block_rows == 0, (h, block_rows)
    grid = (h // block_rows,)
    kernel = functools.partial(
        _compact_kernel, n_out=n_out, width=w, block_rows=block_rows
    )
    idx, val, count = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (block_rows, w), lambda i: (i, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=(
            # Scalar (per-element) stores are only legal to SMEM on TPU;
            # n_out * 8 bytes of output fits comfortably.
            pl.BlockSpec((n_out,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((n_out,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_out,), jnp.int32),
            jax.ShapeDtypeStruct((n_out,), jnp.float32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ),
        interpret=jax.default_backend() != "tpu",
    )(diff)
    live = jnp.arange(n_out, dtype=jnp.int32) < count[0]
    return jnp.where(live, idx, -1), jnp.where(live, val, 0.0)


def foreground_compact_blocked(
    diff: Array, n_out: int, band_rows: int = 8, max_bands: int = 64
) -> tuple[Array, Array]:
    """Sparsity-exploiting two-stage compaction, pure XLA, always exact.

    Stage 1 reduces the mask to per-band (``band_rows`` image rows) nonzero
    counts — one cheap dense pass — and selects the first ``max_bands``
    nonzero bands in scan order. Stage 2 runs the top_k compaction only over
    the gathered bands (max_bands * band_rows * W keys instead of H * W),
    cutting the dominant sort. When the foreground spans more bands than
    ``max_bands`` — where the banded path would silently drop later pixels —
    a ``lax.cond`` falls back to the exact dense lowering, so the result
    always equals :func:`foreground_compact_topk`.
    """
    h, w = diff.shape
    assert h % band_rows == 0
    bands = h // band_rows
    band_w = band_rows * w
    banded = diff.reshape(bands, band_w)
    counts = jnp.sum(banded != 0.0, axis=1)
    n_nonzero_bands = jnp.sum(counts > 0)

    kb = min(max_bands, bands)

    def sparse_path(banded):
        band_keys = jnp.where(
            counts > 0, -jnp.arange(bands, dtype=jnp.float32), -jnp.inf
        )
        bk, band_idx = jax.lax.top_k(band_keys, kb)
        band_valid = jnp.isfinite(bk)
        sel = jnp.take(banded, band_idx, axis=0)  # [kb, band_w] row gather
        base = (band_idx * band_w)[:, None]
        local = jnp.arange(band_w, dtype=jnp.int32)[None, :]
        gidx = base + local
        keys = jnp.where(
            (sel != 0.0) & band_valid[:, None],
            -gidx.astype(jnp.float32),
            -jnp.inf,
        ).reshape(-1)
        top_vals, pos = jax.lax.top_k(keys, n_out)
        valid = jnp.isfinite(top_vals)
        safe = jnp.minimum(pos, keys.shape[0] - 1)
        values = jnp.take(sel.reshape(-1), safe)
        indices = jnp.take(gidx.reshape(-1), safe)
        return (
            jnp.where(valid, indices, -1).astype(jnp.int32),
            jnp.where(valid, values, 0.0),
        )

    def dense_path(banded):
        return foreground_compact_topk(banded.reshape(h, w), n_out)

    return jax.lax.cond(n_nonzero_bands <= kb, sparse_path, dense_path, banded)


def foreground_compact_topk(diff: Array, n_out: int) -> tuple[Array, Array]:
    """Dense XLA fallback: top_k over negated pixel indices (exact same
    result; ~2.8 ms at 1.3M pixels on v5e)."""
    h, w = diff.shape
    flat = diff.reshape(-1)
    keys = jnp.where(
        flat != 0.0, -jnp.arange(h * w, dtype=jnp.float32), -jnp.inf
    )
    top_vals, idx = jax.lax.top_k(keys, n_out)
    valid = jnp.isfinite(top_vals)
    safe = jnp.minimum(idx, h * w - 1)
    return (
        jnp.where(valid, idx, -1).astype(jnp.int32),
        jnp.where(valid, flat[safe], 0.0),
    )


def foreground_compact(
    diff: Array, n_out: int, use_pallas: bool = False
) -> tuple[Array, Array]:
    """Default: the dense top_k lowering — measured fastest on v5e (2.6 ms
    at 1.3M px). The alternatives were built and measured, and both lose:

    * Pallas sparse-scan kernel: correct on TPU, but Mosaic's sequential
      scalar loops cost ~54 ms — kept as a reference implementation.
    * Blocked two-stage XLA (band select + local top_k): exact via a dense
      lax.cond fallback, but the band row-gather alone costs ~40 ms — XLA
      gathers on TPU lose to sorting the whole image.

    Conclusion recorded in PERF.md: sort-based compaction IS the
    TPU-idiomatic primitive for this op.
    """
    if use_pallas:
        return foreground_compact_pallas(diff, n_out)
    return foreground_compact_topk(diff, n_out)


# ---------------------------------------------------------------------------
# Round-4 production re-audit kernels (PERF.md "re-audit plan" #1 and #2).
# Both ship BEHIND FLAGS (default off): the XLA lowerings they challenge won
# every round-3 A/B, and these exist so the production-hardware re-audit is
# a flag flip with equality tests already green (VERDICT r3 #3).
# ---------------------------------------------------------------------------


def _crop_s2d_grid_params(
    image, boxes_xywh, dst_height, dst_width, window, blk, band_h
):
    """XLA-side (traced) per-car sampling parameters for the fused
    crop+letterbox kernel. Mirrors ops/preprocess.letterbox_crop_s2d's box
    handling exactly (int truncation + clamping, reference detector.cpp:
    417-424 crop semantics; sampling per detector.cu:53-79).

    ``blk``/``band_h`` size the kernel's per-block source band: Mosaic
    cannot dynamically slice single uint8 window rows (sublane tiling 32),
    so each grid block instead reads a 32-aligned ``band_h``-row slice
    covering all of its bilinear source rows and resamples it with a
    one-hot lerp matmul. ``band_base`` is that slice's per-block origin;
    crops whose source rows would overflow the band (possible only for
    boxes near/over the window bound) are folded into ``fits`` = False —
    the caller's XLA fallback handles them, same as window overflow.
    """
    from ..geometry import compute_pre_param, letterbox_padding, round_half_away

    src_h, src_w = int(image.shape[0]), int(image.shape[1])
    # win_h is 32-aligned (uint8 sublane tiling) so every 32-aligned band
    # base up to win_h - band_h exists — in particular the one covering the
    # window's LAST rows (crops clamped to the bottom of the frame land
    # there); +8 slack absorbs ystart's align-down.
    win_h = min(-(-(min(window, src_h) + 32) // 32) * 32, src_h)
    win_w = min(-(-min(window, src_w) // 128) * 128 + 128, src_w)
    assert win_h % 32 == 0 and src_h % 32 == 0, (win_h, src_h)

    def per_car(box):
        x0 = jnp.clip(box[0].astype(jnp.int32), 0, src_w - 1)
        y0 = jnp.clip(box[1].astype(jnp.int32), 0, src_h - 1)
        cw = jnp.clip(box[2].astype(jnp.int32), 1, src_w - x0)
        ch = jnp.clip(box[3].astype(jnp.int32), 1, src_h - y0)
        cwf, chf = cw.astype(jnp.float32), ch.astype(jnp.float32)
        pparam = compute_pre_param(chf, cwf, dst_height, dst_width)
        rh = round_half_away(chf / pparam.ratio).astype(jnp.int32)
        rw = round_half_away(cwf / pparam.ratio).astype(jnp.int32)
        top, _, left, _ = letterbox_padding(pparam)

        # Window origin: 32-aligned rows (uint8 sublane tiling; Mosaic must
        # prove the DMA start), lane-aligned (x128) pixels so the uint8
        # [H, W*3] view's DMA lane start (3*xstart) is 128-aligned.
        ystart = jnp.clip(y0 - y0 % 32, 0, src_h - win_h)
        xstart = jnp.clip(x0 - x0 % 128, 0, src_w - win_w)
        fits = (y0 + ch <= ystart + win_h) & (x0 + cw <= xstart + win_w)

        oy = jnp.arange(dst_height, dtype=jnp.int32) - top
        y_valid = (oy >= 0) & (oy < rh)
        ys = jnp.clip(
            oy.astype(jnp.float32) * (chf / rh.astype(jnp.float32)),
            0.0,
            chf - 1.0,
        )
        ylow = jnp.floor(ys).astype(jnp.int32)
        yhigh = jnp.minimum(ylow + 1, ch - 1)
        yfrac = ys - ylow.astype(jnp.float32)

        ox = jnp.arange(dst_width, dtype=jnp.int32) - left
        x_valid = (ox >= 0) & (ox < rw)
        xs = jnp.clip(
            ox.astype(jnp.float32) * (cwf / rw.astype(jnp.float32)),
            0.0,
            cwf - 1.0,
        )
        xlow = jnp.floor(xs).astype(jnp.int32)
        xhigh = jnp.minimum(xlow + 1, cw - 1)
        xfrac = xs - xlow.astype(jnp.float32)

        # Row params in the kernel's parity-major [2, H2] layout
        # (s2d row i of parity p <- blob row 2*i + p).
        def par(v):
            return jnp.stack([v[0::2], v[1::2]], axis=0)

        # Column params in the kernel's j layout: j = o*6 + q*3 + c_rgb for
        # blob column x = 2*o + q; source lane = 3*(x_src - xstart) +
        # (2 - c_rgb) — the BGR->RGB flip folded in.
        j = jnp.arange((dst_width // 2) * 6, dtype=jnp.int32)
        c = j % 3
        x_of_j = 2 * (j // 6) + (j // 3) % 2
        jxlow = 3 * (xlow[x_of_j] + x0 - xstart) + (2 - c)
        jxhigh = 3 * (xhigh[x_of_j] + x0 - xstart) + (2 - c)
        jxfrac = xfrac[x_of_j]
        jxvalid = x_valid[x_of_j].astype(jnp.float32)

        # Per-block band origin (window-relative, 32-aligned). ylow/yhigh
        # are nondecreasing in output row, so block b's source rows span
        # [wl[first out row], wh[last out row]]; exact per-box coverage is
        # checked here (band_ok) instead of proving a worst-case bound.
        wl = ylow + y0 - ystart  # [dst_height], window-relative
        wh = yhigh + y0 - ystart
        nblk = dst_height // (2 * blk)
        lo_min = wl.reshape(nblk, 2 * blk)[:, 0]
        hi_max = wh.reshape(nblk, 2 * blk)[:, -1]
        # win_h and band_h are both 32-aligned, so the upper clip bound is
        # too (the kernel promises Mosaic a 32-aligned slice origin).
        band_base = jnp.clip(lo_min - lo_min % 32, 0, win_h - band_h)
        band_ok = jnp.all(hi_max - band_base < band_h)
        fits = fits & band_ok

        return dict(
            pparam=pparam,
            fits=fits,
            band_base=band_base,
            ystart=ystart,
            xstart3=3 * xstart,
            ylow=par(ylow + y0 - ystart),
            yhigh=par(yhigh + y0 - ystart),
            yfrac=par(yfrac),
            yvalid=par(y_valid.astype(jnp.float32)),
            jxlow=jxlow,
            jxhigh=jxhigh,
            jxfrac=jxfrac,
            jxvalid=jxvalid,
        )

    out = jax.vmap(per_car)(boxes_xywh)
    return out, win_h, win_w


def _crop_s2d_kernel(
    ystart_ref,
    xstart3_ref,
    band_base_ref,
    ylow_ref,
    yhigh_ref,
    yfrac_ref,
    yvalid_ref,
    jxlow_ref,
    jxhigh_ref,
    jxfrac_ref,
    jxvalid_ref,
    img_ref,
    out_ref,
    win_ref,
    rx_ref,
    ry_ref,
    rows_ref,
    sem_ref,
    *,
    blk,
    band_h,
    win_w3,
    pad_value,
    mm_dtype,
):
    """One grid step: 2 * ``blk`` blob rows of one car's s2d blob.

    At each car's first block the kernel DMAs the car's source window
    (uint8, [win_h, win_w3] of the [H, W*3] frame view) HBM->VMEM and builds
    the column resample matrix rx [win_w3, JW] in VMEM from the prefetched
    per-column (low lane, high lane, frac) vectors — one-hot rows built by
    iota comparison, so the column resample runs on the MXU with no gather
    anywhere. Each block then assembles its 2*blk bilinear row lerps from
    dynamic sublane slices of the window and fires two [blk, win_w3] x
    [win_w3, JW] matmuls (one per row parity), landing output directly in
    the parity-major s2d layout.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    car = pl.program_id(0)
    b = pl.program_id(1)

    @pl.when(b == 0)
    def _setup():
        rows = pl.ds(pl.multiple_of(ystart_ref[car], 32), win_ref.shape[0])
        # A lane slice must be 128-aligned in offset AND length; when the
        # window spans the full image width (win_w3 == the array's dim 1,
        # xstart always 0) skip it — a full dimension has no such rule.
        src = (
            img_ref.at[rows]
            if win_w3 == img_ref.shape[1]
            else img_ref.at[
                rows, pl.ds(pl.multiple_of(xstart3_ref[car], 128), win_w3)
            ]
        )
        dma = pltpu.make_async_copy(
            src,
            win_ref,
            sem_ref,
        )
        dma.start()
        jw = rx_ref.shape[1]
        lane = jax.lax.broadcasted_iota(jnp.int32, (win_w3, jw), 0)
        jl = jxlow_ref[0, :, :]  # [1, JW]
        jh = jxhigh_ref[0, :, :]
        jf = jxfrac_ref[0, :, :]
        rx_ref[:, :] = (
            (lane == jl).astype(jnp.float32) * (1.0 - jf)
            + (lane == jh).astype(jnp.float32) * jf
        ).astype(mm_dtype)
        dma.wait()

    # Bilinear row lerps as a one-hot matmul over the block's source band.
    # Mosaic cannot dynamically slice single uint8 window rows (sublane
    # tiling 32, no unsigned->float cast), so the block reads its
    # 32-aligned [band_h, win_w3] source band once (coverage guaranteed by
    # the wrapper's band_ok & fits), builds the [2*blk, band_h] lerp matrix
    # RY from SMEM row params by iota comparison (rows have exactly the two
    # bilinear weights 1-f / f — same terms as the XLA path's row einsum),
    # and lands the resampled rows with one MXU matmul.
    base = pl.multiple_of(band_base_ref[car, b], 32)
    band = (
        win_ref[pl.ds(base, band_h), :]
        .astype(jnp.int32)
        .astype(jnp.float32)
        .astype(mm_dtype)
    )
    band_iota = jax.lax.broadcasted_iota(jnp.int32, (1, band_h), 1)
    for p in (0, 1):
        for t in range(blk):
            row = b * blk + t
            lo_rel = ylow_ref[car, p, row] - base
            hi_rel = yhigh_ref[car, p, row] - base
            f = yfrac_ref[car, p, row]
            ry_row = jnp.where(
                band_iota == lo_rel, 1.0 - f, 0.0
            ) + jnp.where(band_iota == hi_rel, f, 0.0)
            ry_ref[p * blk + t : p * blk + t + 1, :] = ry_row.astype(
                mm_dtype
            )
    rows_ref[:, :] = jnp.dot(
        ry_ref[:, :], band, preferred_element_type=jnp.float32
    ).astype(mm_dtype)

    jxv = jxvalid_ref[0, :, :]  # [1, JW]
    for p in (0, 1):
        res = jnp.dot(
            rows_ref[p * blk : (p + 1) * blk, :],
            rx_ref[:, :],
            preferred_element_type=jnp.float32,
        )
        res = jnp.floor(jnp.clip(res, 0.0, 255.0))
        yv = yvalid_ref[0, p]  # [blk, 1] f32
        res = jnp.where((yv > 0.0) & (jxv > 0.0), res, pad_value)
        out_ref[0, p, :, :] = res * (1.0 / 255.0)


def crop_letterbox_s2d_pallas(
    image: Array,
    boxes_xywh: Array,
    dst_height: int,
    dst_width: int,
    pad_value: float = 128.0,
    window: int = 768,
    matmul_dtype=None,
    block_rows: int = 8,
    interpret: bool | None = None,
):
    """Band-DMA fused crop+letterbox for all car slots of ONE frame,
    emitting s2d blobs (PERF.md re-audit kernel #1).

    Replaces the per-car XLA crop einsums that contract over the full
    2048/2592 image extents (ops/preprocess.letterbox_crop_s2d, vmapped in
    detect/detector._crop_batch): here each car's cost is one ~2 MB uint8
    window DMA plus matmuls over the window only. f32 results are
    bit-identical to ``vmap(letterbox_crop_s2d)`` whenever every crop fits
    the aligned ``window`` (the caller guards with the same fits-cond as
    the windowed XLA path); with bfloat16 operands the error bound is the
    same ~one-uint8-level as the XLA bf16 path (tested).

    Returns (blob [R, dst_h/2, dst_w/2, 12] f32, PreParams with leading R).
    Reference semantics: crop detector.cpp:417-424, bilinear/pad/blob
    detector.cu:40-171.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    src_h, src_w = int(image.shape[0]), int(image.shape[1])
    r = int(boxes_xywh.shape[0])
    h2, w2 = dst_height // 2, dst_width // 2
    jw = w2 * 6
    blk = min(block_rows, h2)
    assert h2 % blk == 0, (h2, blk)
    nblk = h2 // blk
    mm_dtype = matmul_dtype or jnp.float32

    # Static band height: per-block source-row span is ~2*blk*ratio where
    # ratio <= max(win_h/dst_h, win_w/dst_w) for any crop that fits the
    # window, plus 2 rows bilinear slack and 31 rows 32-alignment slack.
    # Coverage is still checked exactly per box (band_ok -> fits).
    win_h_probe = min(-(-(min(window, src_h) + 32) // 32) * 32, src_h)
    win_w_probe = min(-(-min(window, src_w) // 128) * 128 + 128, src_w)
    ratio_max = max(win_h_probe / dst_height, win_w_probe / dst_width)
    band_h = -(-(int(2 * blk * ratio_max) + 2 + 31) // 32) * 32
    band_h = min(band_h, win_h_probe)

    params, win_h, win_w = _crop_s2d_grid_params(
        image, boxes_xywh, dst_height, dst_width, window, blk, band_h
    )
    win_w3 = win_w * 3
    # Mosaic's DMA checker wants every lane extent 128-aligned. The sliced
    # path guarantees it structurally (win_w uncapped is a multiple of 128
    # and so is 3*win_w... since 3 is odd, 128 | 3w iff 128 | w); the
    # full-width path (win_w == src_w, only reachable for images narrower
    # than window+128, i.e. tests/tiny inputs) pads the 2D view's columns
    # to the next 128 multiple — the resample matrix never addresses the
    # padded lanes (its one-hot rows are built from real source indices),
    # so results are unchanged.
    assert win_w == src_w or win_w3 % 128 == 0, (win_w, src_w)
    img2d = image.reshape(src_h, src_w * 3)
    if win_w3 % 128:
        lane_pad = 128 - win_w3 % 128
        img2d = jnp.pad(img2d, ((0, 0), (0, lane_pad)))
        win_w3 += lane_pad

    kernel = functools.partial(
        _crop_s2d_kernel,
        blk=blk,
        band_h=band_h,
        win_w3=win_w3,
        pad_value=pad_value,
        mm_dtype=mm_dtype,
    )
    # Mosaic block-spec rules (lowering.py::_check_block_mappings): SMEM
    # refs are exempt only as WHOLE arrays (trivial window) — per-car
    # scalar/row params therefore pass unblocked and the kernel indexes
    # them by program_id(0); blocked VMEM refs must tile (8, 128) or span
    # the array dim, so the per-car column vectors carry a unit middle
    # axis ([r, 1, jw] with (1, 1, jw) blocks — last two dims span).
    smem_whole = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    vrow = lambda: pl.BlockSpec(
        (1, 1, jw), lambda r_, b_: (r_, 0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        grid=(r, nblk),
        in_specs=[
            smem_whole(),  # ystart [r]
            smem_whole(),  # xstart3 [r]
            smem_whole(),  # band_base [r, nblk]
            smem_whole(),  # ylow (window-relative) [r, 2, h2]
            smem_whole(),  # yhigh
            smem_whole(),  # yfrac
            # yvalid as a VMEM [blk, 1]-per-block plane (vector reads are
            # not legal from SMEM).
            pl.BlockSpec(
                (1, 2, blk, 1),
                lambda r_, b_: (r_, 0, b_, 0),
                memory_space=pltpu.VMEM,
            ),
            vrow(),  # jxlow
            vrow(),  # jxhigh
            vrow(),  # jxfrac
            vrow(),  # jxvalid
            pl.BlockSpec(memory_space=pltpu.ANY),  # full frame, manual DMA
        ],
        out_specs=pl.BlockSpec(
            (1, 2, blk, jw),
            lambda r_, b_: (r_, 0, b_, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((r, 2, h2, jw), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((win_h, win_w3), jnp.uint8),
            pltpu.VMEM((win_w3, jw), mm_dtype),
            pltpu.VMEM((2 * blk, band_h), mm_dtype),
            pltpu.VMEM((2 * blk, win_w3), mm_dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(
        params["ystart"],
        params["xstart3"],
        params["band_base"],
        params["ylow"],
        params["yhigh"],
        params["yfrac"],
        params["yvalid"].astype(jnp.float32)[..., None],
        params["jxlow"][:, None, :],
        params["jxhigh"][:, None, :],
        params["jxfrac"][:, None, :],
        params["jxvalid"][:, None, :],
        img2d,
    )
    # [R, 2, H2, W2*6] -> [R, H2, W2, 12] with (p, q, c) channel order:
    # free minor split per parity plane + channel concat (no transpose).
    blob = jnp.concatenate(
        [out[:, 0].reshape(r, h2, w2, 6), out[:, 1].reshape(r, h2, w2, 6)],
        axis=-1,
    )
    return blob, params["pparam"], params["fits"]


def _compact_rows_kernel(
    key_ref,
    val_ref,
    okey_ref,
    oval_ref,
    count_ref,
    *,
    n_out,
    chunk,
    q,
):
    """One grid step: scan one [q, chunk] slice of the queue rows' candidate
    keys (pixel-sorted, hw sentinel for non-foreground) and append each
    row's foreground entries to its SMEM output, stopping at ``n_out``.

    Rows are pixel-sorted (enqueue dedup, locator._dedup_cloud_candidates),
    so position order == key order and the first ``n_out`` emitted per row
    are the row's smallest foreground pixels — which provably contain every
    member of the global first-``n_out``-unique selection (each row carries
    <= 1 candidate per pixel). The vector part is one mask+count per row per
    chunk; the scalar emission loop runs only for chunks that contain
    foreground and stops once the row's quota is filled.

    The grid runs over chunks only and the block carries all ``q`` rows
    (statically unrolled; q = queue_size, 3 by default): Mosaic requires
    rank-2 VMEM blocks to tile (8, 128) or span the array dim, so a
    [1, chunk] per-row block over a [q, p] array is not lowerable — the
    per-row outputs/counters live as whole-array SMEM (trivial windows are
    exempt from the tiling rule).
    """
    import jax.experimental.pallas as pl

    c = pl.program_id(0)

    @pl.when(c == 0)
    def _init():
        for row in range(q):
            count_ref[row, 0] = 0

    sentinel = jnp.int32(2**30)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    for row in range(q):
        keys = key_ref[row : row + 1, :]  # [1, chunk] i32
        vals = val_ref[row : row + 1, :]
        mask = keys < sentinel
        n = jnp.sum(mask.astype(jnp.int32))

        @pl.when((n > 0) & (count_ref[row, 0] < n_out))
        def _scan(row=row, keys=keys, vals=vals, mask=mask, n=n):
            def body(k, consumed_col):
                live = mask & (cols > consumed_col)
                col = jnp.min(jnp.where(live, cols, chunk))
                key_v = jnp.sum(jnp.where(cols == col, keys, 0))
                val_v = jnp.sum(jnp.where(cols == col, vals, 0.0))

                @pl.when(count_ref[row, 0] < n_out)
                def _emit():
                    cur = count_ref[row, 0]
                    okey_ref[row, cur] = key_v
                    oval_ref[row, cur] = val_v
                    count_ref[row, 0] = cur + 1

                return col

            jax.lax.fori_loop(0, n, body, jnp.int32(-1))


def compact_candidates_pallas(
    diff: Array,
    pix_queue: Array,
    depth_queue: Array,
    n_out: int,
    chunk: int = 512,
    interpret: bool | None = None,
) -> tuple[Array, Array]:
    """Pallas lowering of the dedup3 candidate compaction (PERF.md re-audit
    kernel #2): the M-wide first top_k pass (M = Q * max_points keys) is
    replaced by a per-row scan-and-append kernel emitting each queue row's
    first ``n_out`` foreground candidates; the selection tail (small top_k,
    dedup-first, final top_k) stays in XLA over Q*n_out keys.

    EXACTLY equals locator._compact_from_candidates(method="dedup3_topk")
    — and like it REQUIRES enqueue-pruned queues (<= 1 candidate per pixel
    per row, pixel-sorted): per-row quota exactness is proven in the kernel
    docstring; no runtime fallback branch, so the lowering is safe under
    vmap (batch serving) where a lax.cond would execute both branches.
    Reference op being replaced: foreground extraction, locate.cpp:237-249.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    hw = diff.size
    q, p = pix_queue.shape
    assert p % chunk == 0, (p, chunk)
    assert hw < 2**30  # kernel sentinel must exceed any pixel key
    flat = diff.reshape(-1)
    safe = jnp.minimum(pix_queue, hw - 1)
    is_fg = (pix_queue < hw) & (depth_queue != 0.0) & (
        flat[safe] == depth_queue
    )
    key = jnp.where(is_fg, pix_queue, jnp.int32(2**30))

    kernel = functools.partial(
        _compact_rows_kernel, n_out=n_out, chunk=chunk, q=q
    )
    okey, oval, counts = pl.pallas_call(
        kernel,
        grid=(p // chunk,),
        in_specs=[
            pl.BlockSpec(
                (q, chunk), lambda c_: (0, c_), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (q, chunk), lambda c_: (0, c_), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((q, n_out), jnp.int32),
            jax.ShapeDtypeStruct((q, n_out), jnp.float32),
            jax.ShapeDtypeStruct((q, 1), jnp.int32),
        ),
        interpret=interpret,
    )(key, depth_queue)

    # Slots past each row's count are uninitialized; mask, then run the
    # dedup3_topk selection tail over the Q*n_out survivors (instead of M).
    live = (
        jnp.arange(n_out, dtype=jnp.int32)[None, :] < counts
    )
    okey = jnp.where(live, okey, hw).reshape(-1)
    oval = jnp.where(live, oval, 0.0).reshape(-1)
    m = okey.shape[0]
    k = min(n_out, m)
    t = min(q * k, m)
    neg_t, pos_t = jax.lax.top_k(-okey, t)
    skey = -neg_t
    first = jnp.concatenate([jnp.ones((1,), bool), skey[1:] != skey[:-1]])
    keep = first & (skey < hw)
    key2 = jnp.where(keep, skey, hw)
    neg, pos = jax.lax.top_k(-key2, k)
    vals = oval[pos_t[pos]]
    idx = -neg
    valid = idx < hw
    pad = n_out - k
    idx = jnp.pad(
        jnp.where(valid, idx, -1).astype(jnp.int32), (0, pad),
        constant_values=-1,
    )
    val = jnp.pad(jnp.where(valid, vals, 0.0), (0, pad))
    return idx, val
