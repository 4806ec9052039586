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


def enable_compile_cache():
    """Persistent XLA/Mosaic compile cache for production entry points.

    The megakernel on many-light scenes takes minutes to compile through
    the tunneled TPU runtime; the persistent cache makes that a one-time
    cost per machine. QARAY_COMPILE_CACHE overrides the location, =0
    disables."""
    import os

    import jax

    d = os.environ.get(
        "QARAY_COMPILE_CACHE", os.path.expanduser("~/.cache/qaray_jax")
    )
    if not d or d == "0":
        return
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
