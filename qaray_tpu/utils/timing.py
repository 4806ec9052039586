"""Frame timing with running average + profiler hooks.

Equivalent of the reference's TimeFrame START/STOP/KILL state machine
(renderers/renderer.cpp:41-63): per-frame wall clock, a moving average that
skips the first frame (compile warm-up here, cold caches there), and the
same end-of-run summary line. `profile()` wraps a block in a jax.profiler
trace — the per-kernel visibility the reference never had.
"""

from __future__ import annotations

import contextlib
import time


class FrameTimer:
    def __init__(self):
        self.avg = 0.0
        self.num_frames = -1  # don't count the first frame
        self._start = None

    def start(self):
        self._start = time.time()

    def stop(self) -> float:
        elapsed = time.time() - self._start
        print(f"\nElapsed Time is {elapsed:f} s")
        self.num_frames += 1
        if self.num_frames > 0:
            self.avg += (elapsed - self.avg) / self.num_frames
        return elapsed

    def kill(self):
        print(f"\nProgram Ends, Average Frame Time {self.avg:f} s\n")


@contextlib.contextmanager
def profile(log_dir: str | None):
    """jax.profiler trace around a block when log_dir is set."""
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield
