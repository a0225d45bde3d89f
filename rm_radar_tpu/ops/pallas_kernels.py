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
