"""Profiling and structured run telemetry.

The reference's observability is prints plus ad-hoc jsonl timing
(`feature.py:96-105`, `sed.py:178-185`). Here:

* `profile_trace` wraps any region in a `jax.profiler` trace capture for
  xprof/tensorboard inspection of device timelines;
* `StepClock` accumulates wall-time and converts window counts to the
  BASELINE throughput unit (audio-hours/sec) for per-epoch jsonl records;
* `annotate` names regions so device traces attribute time to framework
  phases (sampling / forward / backward / metrics).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax

FRAMES_PER_SEC = 44100 / 1024.0


@contextlib.contextmanager
def profile_trace(log_dir: str) -> Iterator[None]:
    """Capture a device profile for the enclosed region (no-op on failure —
    profiling must never take down a training run)."""
    started = False
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception as e:  # pragma: no cover - platform dependent
        print(f"[tracing] profiler unavailable: {e}")
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


def annotate(name: str):
    """Named trace region (context manager) for device timeline attribution."""
    return jax.profiler.TraceAnnotation(name)


class StepClock:
    """Wall-clock + throughput accounting for training epochs."""

    def __init__(self, window_frames: int, frames_per_sec: float = FRAMES_PER_SEC):
        self.window_frames = window_frames
        self.frames_per_sec = frames_per_sec
        self.reset()

    def reset(self) -> None:
        self.windows = 0
        self.elapsed = 0.0
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed += time.perf_counter() - self._t0
        self._t0 = None

    def add_windows(self, n: int) -> None:
        self.windows += n

    @property
    def audio_seconds(self) -> float:
        return self.windows * self.window_frames / self.frames_per_sec

    @property
    def audio_hours_per_sec(self) -> float:
        if self.elapsed == 0:
            return 0.0
        return self.audio_seconds / 3600.0 / self.elapsed

    def record(self) -> dict:
        return {
            "windows": self.windows,
            "elapsed_sec": round(self.elapsed, 4),
            "audio_hours_per_sec": round(self.audio_hours_per_sec, 4),
        }
