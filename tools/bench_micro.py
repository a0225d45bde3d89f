#!/usr/bin/env python
"""Per-op microbenchmarks for the hot non-conv ops of the frame pipeline.

Produces the measurement base behind PERF.md's scheduling decisions (crop
resample formulation, foreground compaction lowering, NMS, projection).
Timing uses the forced-execution pattern this environment requires
(block_until_ready is lazy over the tunnel): async host copies consumed at
the end of each loop.

Usage: python tools/bench_micro.py [op ...]   (default: all)
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, args, iters=30, warmup=3):
    import jax

    out = jax.jit(fn)(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf)
    jfn = jax.jit(fn)
    for _ in range(warmup):
        out = jfn(*args)
    handles = []
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jfn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        leaf.copy_to_host_async()
        handles.append(leaf)
    for h in handles:
        np.asarray(h)
    return (time.perf_counter() - t0) / iters * 1e3


def main() -> int:
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/rm_radar_jax_cache")
        or None,
    )

    ops = sys.argv[1:] or ["crop", "compact", "nms", "project", "letterbox"]
    rng = np.random.default_rng(0)
    results = {}

    if "crop" in ops:
        from rm_radar_tpu.ops.preprocess import letterbox_crop, letterbox_crop_s2d

        img = jax.device_put(
            rng.integers(0, 255, size=(2048, 2592, 3), dtype=np.uint8)
        )
        boxes = jax.device_put(
            np.stack(
                [
                    [100.0 + 50 * i, 200.0 + 40 * i, 300.0 + 20 * i, 250.0]
                    for i in range(8)
                ]
            ).astype(np.float32)
        )
        for dst in (640, 320):
            fn = lambda im, bx, d=dst: jax.vmap(
                lambda b: letterbox_crop_s2d(
                    im, b, d, d, matmul_dtype=jnp.bfloat16
                )[0]
            )(bx)
            results[f"crop_s2d_bf16_x8@{dst}"] = timeit(fn, (img, boxes))
            fn2 = lambda im, bx, d=dst: jax.vmap(
                lambda b: letterbox_crop(im, b, d, d, matmul_dtype=jnp.bfloat16)[0]
            )(bx)
            results[f"crop_plain_bf16_x8@{dst}"] = timeit(fn2, (img, boxes))

            # Windowed fast path (detect/detector.py:_crop_batch): slice a
            # 768px neighborhood per car before the resample einsums.
            from rm_radar_tpu.detect.detector import _crop_batch
            from rm_radar_tpu.types import Detections

            cars = Detections(
                xywh=boxes,
                label=jnp.zeros(8, jnp.int32),
                confidence=jnp.ones(8, jnp.float32),
                valid=jnp.ones(8, bool),
            )
            crop_fn = lambda im, crop_xywh, d=dst: letterbox_crop_s2d(
                im, crop_xywh, d, d, matmul_dtype=jnp.bfloat16
            )
            results[f"crop_s2d_windowed768_x8@{dst}"] = timeit(
                lambda im, c, d=dst: _crop_batch(im, c, crop_fn, 768)[0],
                (img, cars),
            )

    if "compact" in ops:
        from rm_radar_tpu.ops.pallas_kernels import (
            foreground_compact_blocked,
            foreground_compact_topk,
        )

        diff = np.zeros((1024, 1296), np.float32)
        ys = rng.integers(0, 1024, size=600)
        xs = rng.integers(0, 1296, size=600)
        diff[ys, xs] = rng.uniform(500, 4000, size=600).astype(np.float32)
        d = jax.device_put(diff)
        results["compact_topk_2048"] = timeit(
            lambda x: foreground_compact_topk(x, 2048), (d,)
        )
        results["compact_blocked_2048"] = timeit(
            lambda x: foreground_compact_blocked(x, 2048), (d,)
        )

        # Point-driven compaction (locate/locator.py): sorts the queued
        # point projections (3 x 16384 candidates) instead of 1.3M pixels.
        from rm_radar_tpu.locate.locator import _compact_from_candidates

        pq = np.full((3, 16384), diff.size, np.int32)
        dq = np.zeros((3, 16384), np.float32)
        flat = diff.reshape(-1)
        nz = np.flatnonzero(flat)
        for q in range(3):
            take = rng.choice(nz, size=500, replace=False)
            pq[q, : len(take)] = take
            dq[q, : len(take)] = flat[take]
        pq_d, dq_d = jax.device_put(pq), jax.device_put(dq)
        results["compact_candidates_2048"] = timeit(
            lambda x, p, v: _compact_from_candidates(x, p, v, 2048),
            (d, pq_d, dq_d),
        )

    if "nms" in ops:
        from rm_radar_tpu.ops.detect_ops import nms

        xywh = jax.device_put(
            rng.uniform(0, 600, size=(8400, 4)).astype(np.float32)
        )
        label = jax.device_put(np.zeros(8400, np.int32))
        conf = jax.device_put(rng.uniform(0, 1, size=8400).astype(np.float32))
        results["nms_topk512"] = timeit(
            lambda a, b, c: nms(a, b, c, 0.65, 0.25, 512, 20),
            (xywh, label, conf),
        )

    if "project" in ops:
        from rm_radar_tpu.configs import LocatorConfig
        from rm_radar_tpu.geometry import LidarCalib
        from rm_radar_tpu.locate.locator import project_cloud
        from rm_radar_tpu.configs import Calibration

        cfg = LocatorConfig()
        calib_cfg = Calibration()
        calib = LidarCalib.create(
            calib_cfg.intrinsic_np(),
            calib_cfg.lidar_to_camera_np(),
            calib_cfg.world_to_camera_np(),
            cfg.zoom_factor,
        )
        pts = jax.device_put(
            rng.uniform(500, 25000, size=(16384, 3)).astype(np.float32)
        )
        results["project_16k"] = timeit(
            lambda p: project_cloud(p, calib, cfg)[0], (pts,)
        )

    if "letterbox" in ops:
        from rm_radar_tpu.ops.preprocess import letterbox
        from rm_radar_tpu.models.yolov8 import space_to_depth

        img = jax.device_put(
            rng.integers(0, 255, size=(2048, 2592, 3), dtype=np.uint8)
        )
        results["letterbox_full"] = timeit(lambda im: letterbox(im)[0], (img,))
        results["letterbox_full+s2d"] = timeit(
            lambda im: space_to_depth(letterbox(im)[0][None]), (img,)
        )

        from rm_radar_tpu.ops.preprocess import letterbox_s2d

        results["letterbox_s2d_2dmatmul"] = timeit(
            lambda im: letterbox_s2d(im)[0], (img,)
        )

    for k, v in results.items():
        print(f"{k}: {v:.3f} ms")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
