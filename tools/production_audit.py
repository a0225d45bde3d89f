#!/usr/bin/env python
"""One-command production-hardware re-audit (PERF.md re-audit plan).

Everything the dev environment could NOT settle is pinned here so that the
day a non-tunneled v5e (or any production TPU) is available, the whole
checklist is one command:

    python tools/production_audit.py [--quick] [--xprof] [--out audit.json]

Stages (each skippable on failure; all results land in one JSON report):

1. **Rate floor re-derivation.** The dev chip measured ~59 TF/s bf16
   against the v5e datasheet's 394 TF/s (PERF.md "Session drift") — every
   FLOP-math expectation in PERF.md was scaled by that floor. This stage
   re-measures achieved matmul TF/s and HBM GB/s so the conv-floor
   estimates (e.g. car stage ~1.7 ms at 59 TF/s -> ~0.26 ms at datasheet)
   can be re-derived for the real machine.
2. **Pallas kernel equality on real Mosaic** (tools/tpu_pallas_check.py):
   interpret-mode green is not TPU green; this re-runs the 9 on-chip
   equality checks for crop_letterbox_s2d_pallas / compact_candidates_
   pallas / the sparse-scan compactor.
3. **Kernel flag A/Bs** (tools/ab_batch8.py, interleaved same-session —
   the only trustworthy comparison): RM_RADAR_CROP_PALLAS 0/1,
   RM_RADAR_COMPACTION dedup3_topk/dedup3_pallas, RM_RADAR_LETTERBOX_BAND
   0/16, RM_RADAR_ENQUEUE_DEDUP sort/scatter. On the dev chip all four
   measured within noise of each other (round-4 A/B table); on production
   hardware the ~0.3-0.5 ms expected wins become measurable.
4. **Headline bench** (bench.py batch-8 + stream) for the record.
5. **xprof trace** (--xprof; DEFAULT OFF because jax.profiler.trace
   crashes the tunneled axon backend with FAILED_PRECONDITION — CLAUDE.md):
   traces 8 batch-8 steps to --xprof-dir for op-level attribution, the
   per-op evidence the DCE-ablation profiler approximates today.

The int8 question (PERF.md "Levers queued"): int8 conv lowering needs an
xprof-verified MXU-bound car stage first — stage 5's trace answers whether
the conv share is compute- or layout-bound before any quantization work.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def stage_rates(report: dict) -> None:
    """Measure achieved bf16 matmul TF/s and HBM copy GB/s."""
    import jax
    import jax.numpy as jnp

    n = 8192
    a = jnp.ones((n, n), jnp.bfloat16)
    b = jnp.ones((n, n), jnp.bfloat16)
    mm = jax.jit(lambda a, b: a @ b)
    mm(a, b).block_until_ready()  # compile + warm
    reps = 8
    t0 = time.perf_counter()
    out = a
    for _ in range(reps):
        out = mm(out, b)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    tflops = 2 * n**3 / dt / 1e12
    # HBM: out-of-place add of 2 GB-scale arrays (3 array traversals).
    m = 8192 * 4096
    x = jnp.ones((m,), jnp.float32)
    y = jnp.ones((m,), jnp.float32)
    add = jax.jit(lambda x, y: x + y)
    add(x, y).block_until_ready()
    t0 = time.perf_counter()
    z = add(x, y)
    z.block_until_ready()
    gbps = 3 * m * 4 / (time.perf_counter() - t0) / 1e9
    report["rates"] = {
        "matmul_bf16_tflops": round(tflops, 1),
        "datasheet_tflops": 394,
        "rate_floor": round(tflops / 394, 3),
        "hbm_add_gbps": round(gbps, 1),
        "datasheet_gbps": 800,
    }
    log(f"rates: {report['rates']}")


def stage_subprocess(report: dict, key: str, cmd: list, timeout: int) -> None:
    log(f"== {key}: {' '.join(cmd)}")
    try:
        p = subprocess.run(
            cmd, capture_output=True, text=True, timeout=timeout, cwd=REPO
        )
        tail = (p.stdout + p.stderr).strip().splitlines()[-12:]
        report[key] = {"rc": p.returncode, "tail": tail}
        log("\n".join(tail))
    except Exception as e:  # timeout, missing file — record and continue
        report[key] = {"error": repr(e)}
        log(f"{key} failed: {e!r}")


def stage_xprof(report: dict, trace_dir: str) -> None:
    """Op-level trace of 8 batch-8 device-tracked steps."""
    import jax

    from rm_radar_tpu.configs import RadarConfig, RobotDetectorConfig
    from rm_radar_tpu.pipeline import Radar
    from rm_radar_tpu.utils.io import pad_points

    radar = Radar(
        RadarConfig(detector=RobotDetectorConfig(max_cars=8)),
        car_variant="m",
        armor_variant="m",
    )
    rng = np.random.default_rng(0)
    imgs = jax.device_put(
        rng.integers(0, 255, (8, 2048, 2592, 3), np.uint8)
    )
    clds = jax.device_put(
        np.stack(
            [
                pad_points(
                    rng.uniform(1000, 25000, (10000, 3)).astype(np.float32),
                    radar.config.locator.max_points,
                )
            ]
            * 8
        )
    )
    carries = radar.make_batch_tracked_state(8)
    step = radar.batch_step(tracked=True, max_cars=8)
    ts = [jax.device_put(np.full((8,), 1.0 + 0.1 * i, np.float32))
          for i in range(9)]
    carries, batch = step(carries, imgs, clds, ts[0])  # compile
    np.asarray(batch.confidence)
    with jax.profiler.trace(trace_dir):
        for i in range(8):
            carries, batch = step(carries, imgs, clds, ts[i + 1])
        np.asarray(batch.confidence)
    report["xprof"] = {"trace_dir": trace_dir}
    log(f"xprof trace written to {trace_dir}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="audit.json")
    ap.add_argument("--quick", action="store_true",
                    help="fewer A/B rounds (2 instead of 4)")
    ap.add_argument("--xprof", action="store_true",
                    help="run the jax.profiler trace stage (CRASHES the "
                    "tunneled axon dev backend; production hardware only)")
    ap.add_argument("--xprof-dir", default="/tmp/rm_radar_xprof")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/rm_radar_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    report: dict = {"devices": [str(d) for d in jax.devices()]}
    log(f"devices: {report['devices']}")

    stage_rates(report)
    stage_subprocess(
        report, "pallas_check",
        [sys.executable, "tools/tpu_pallas_check.py"], 3600,
    )
    rounds = "2" if args.quick else "4"
    for key, env, values, extra in [
        ("ab_crop_pallas", "RM_RADAR_CROP_PALLAS", "0,1", []),
        ("ab_compaction", "RM_RADAR_COMPACTION",
         "dedup3_topk,dedup3_pallas", []),
        ("ab_letterbox_band", "RM_RADAR_LETTERBOX_BAND", "0,16", []),
        ("ab_enqueue_dedup", "RM_RADAR_ENQUEUE_DEDUP", "sort,scatter", []),
    ]:
        stage_subprocess(
            report, key,
            [sys.executable, "tools/ab_batch8.py", "--env", env,
             "--values", values, "--rounds", rounds, "--car-size", "512",
             "--armor-size", "256"] + extra,
            7200,
        )
    stage_subprocess(
        report, "bench_batch8", [sys.executable, "bench.py"], 3600
    )
    if args.xprof:
        try:
            stage_xprof(report, args.xprof_dir)
        except Exception as e:
            report["xprof"] = {"error": repr(e)}
            log(f"xprof stage failed: {e!r}")
    else:
        report["xprof"] = {
            "skipped": "pass --xprof on production hardware (crashes the "
            "tunneled axon dev backend)"
        }

    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    log(f"report -> {args.out}")
    print(json.dumps({k: v for k, v in report.items() if k == "rates"}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
