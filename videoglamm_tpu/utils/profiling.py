"""Tracing / profiling hooks.

The reference has no profiler at all (SURVEY §5.1 — wall-clock AverageMeters
only, utils/trainer.py:93-94). This module adds the TPU-native equivalents:
XProf traces via jax.profiler, named trace annotations that show up on the
trace timeline, a host-side step timer with percentile stats, and a
per-device HBM usage report.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import numpy as np


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture an XProf trace viewable in TensorBoard's profile plugin /
    xprof (`jax.profiler.trace`)."""
    import jax
    with jax.profiler.trace(log_dir):
        yield


@contextlib.contextmanager
def annotate(name: str):
    """Named region on the device trace timeline."""
    import jax
    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """Host-side step timing with percentile summaries; forces completion of
    the given array before stopping the clock (the axon TPU tunnel does not
    synchronize on block_until_ready — pass a scalar and it is fetched)."""

    def __init__(self):
        self.samples: List[float] = []
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.time()

    def stop(self, sync_value=None) -> float:
        if sync_value is not None:
            try:
                float(np.asarray(sync_value).reshape(-1)[0])
            except Exception:
                pass
        dt = time.time() - self._t0
        self.samples.append(dt)
        return dt

    def summary(self) -> Dict[str, float]:
        s = np.asarray(self.samples)
        if not len(s):
            return {}
        return {
            "mean_s": float(s.mean()),
            "p50_s": float(np.percentile(s, 50)),
            "p90_s": float(np.percentile(s, 90)),
            "p99_s": float(np.percentile(s, 99)),
            "n": int(len(s)),
        }


def device_memory_report() -> List[Dict]:
    """Per-device HBM usage (live bytes) where the backend exposes it."""
    import jax
    out = []
    for d in jax.devices():
        stats = {}
        try:
            stats = d.memory_stats() or {}
        except Exception:
            pass
        out.append({
            "device": str(d),
            "bytes_in_use": stats.get("bytes_in_use"),
            "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
            "bytes_limit": stats.get("bytes_limit"),
        })
    return out
