"""Lightweight per-stage timing + jax.profiler hooks.

The reference has no in-code tracing (timing evidence is external, see
reference README.md:35-38 / doc/识别优化.md:29-44); since ms/frame is this
framework's north-star metric, we provide a small stage timer and an optional
jax.profiler trace context.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, List

import numpy as np


class StageTimer:
    """Accumulates wall-clock samples per named stage.

    Usage::

        timer = StageTimer()
        with timer.stage("detect"):
            result = detect_fn(image)
            jax.block_until_ready(result)
        print(timer.summary())
    """

    def __init__(self) -> None:
        self._samples: Dict[str, List[float]] = defaultdict(list)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._samples[name].append(time.perf_counter() - t0)

    def samples(self, name: str) -> np.ndarray:
        return np.asarray(self._samples[name])

    def percentile_ms(self, name: str, q: float = 50.0, skip_first: int = 0) -> float:
        s = self.samples(name)[skip_first:]
        return float(np.percentile(s, q) * 1e3) if len(s) else float("nan")

    def summary(self, skip_first: int = 1) -> str:
        lines = []
        for name in self._samples:
            s = self.samples(name)[skip_first:]
            if not len(s):
                s = self.samples(name)
            lines.append(
                f"{name}: p50={np.percentile(s, 50) * 1e3:.3f}ms "
                f"p99={np.percentile(s, 99) * 1e3:.3f}ms "
                f"mean={np.mean(s) * 1e3:.3f}ms n={len(s)}"
            )
        return "\n".join(lines)

    def reset(self) -> None:
        self._samples.clear()


@contextlib.contextmanager
def maybe_profile(trace_dir: str | None):
    """Optionally wrap a block in a jax.profiler trace.

    Guarded on tunneled/plugin backends (platform "axon"): jax.profiler's
    trace is NOT supported there — it kills the backend mid-run with
    FAILED_PRECONDITION and the tunnel needs minutes to recover (measured;
    see PERF.md "xprof unusable"). On such backends this raises instead of
    crashing the device; per-op evidence comes from the DCE-ablation tool
    (tools/profile_batch8.py) and run_stream's frame_log. Set
    RM_RADAR_FORCE_PROFILER=1 to override (e.g. a future plugin version).
    """
    if trace_dir:
        import os

        import jax
        import jax.profiler

        platform = jax.devices()[0].platform
        if platform == "axon" and os.environ.get(
            "RM_RADAR_FORCE_PROFILER", "0"
        ) != "1":
            raise RuntimeError(
                "jax.profiler.trace crashes the tunneled 'axon' backend "
                "(FAILED_PRECONDITION, minutes of recovery — PERF.md). Use "
                "tools/profile_batch8.py (DCE ablation) or run_stream "
                "frame_log instead, or RM_RADAR_FORCE_PROFILER=1 to insist."
            )
        with jax.profiler.trace(trace_dir):
            yield
    else:
        yield
