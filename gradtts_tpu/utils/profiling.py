"""Profiling & timing harness.

The reference has no tracing at all — only wall-clock RTF prints
(/root/reference/inference.py:87-91) and an unused torch-tb-profiler pin
(SURVEY.md §5). TPU-native replacements:

- ``trace(logdir)``: jax.profiler trace context (XLA device traces,
  viewable in TensorBoard's profile plugin / xprof);
- ``time_jitted(fn, *args)``: correct device timing — warmup compile,
  then block_until_ready around the timed calls;
- ``Throughput``: running audio-seconds/sec (and items/sec) counters
  mirroring the RTF formula ``t*sr/(frames*hop)`` as a rate.
"""

import contextlib
import time
from typing import Callable, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str, create_perfetto_link: bool = False):
    """Capture an XLA profile into ``logdir`` (TensorBoard-readable)."""
    jax.profiler.start_trace(logdir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_jitted(fn: Callable, *args, iters: int = 10, warmup: int = 2,
                **kwargs) -> dict:
    """Median/mean wall time of a jitted callable with proper device
    synchronization. Returns seconds-based stats + the last output."""
    out = None
    for _ in range(max(1, warmup)):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    return {
        'median_s': times[len(times) // 2],
        'mean_s': sum(times) / len(times),
        'min_s': times[0],
        'iters': iters,
        'last_output': out,
    }


class Throughput:
    """Running throughput counters for synthesis/training loops.

    audio-seconds/sec is the headline metric (BASELINE.md); RTF is its
    reciprocal per utterance.
    """

    def __init__(self, sample_rate: int = 22050, hop_length: int = 256):
        self.sample_rate = sample_rate
        self.hop_length = hop_length
        self.reset()

    def reset(self):
        self._t0: Optional[float] = None
        self.frames = 0
        self.items = 0
        self.elapsed = 0.0

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self):
        assert self._t0 is not None, 'start() first'
        self.elapsed += time.perf_counter() - self._t0
        self._t0 = None

    def add(self, frames: int, items: int = 1):
        self.frames += int(frames)
        self.items += items

    @property
    def audio_seconds(self) -> float:
        return self.frames * self.hop_length / self.sample_rate

    @property
    def audio_sec_per_sec(self) -> float:
        return self.audio_seconds / self.elapsed if self.elapsed else 0.0

    @property
    def rtf(self) -> float:
        """Real-time factor: synthesis seconds per audio second (the
        reference's per-utterance print, aggregated)."""
        return self.elapsed / self.audio_seconds if self.frames else 0.0

    def summary(self) -> dict:
        return {
            'items': self.items,
            'audio_seconds': self.audio_seconds,
            'elapsed_s': self.elapsed,
            'audio_sec_per_sec': self.audio_sec_per_sec,
            'rtf': self.rtf,
        }
