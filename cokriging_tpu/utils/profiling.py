"""Tracing / benchmarking helpers.

The reference has no profiling at all (SURVEY.md section 5); this adds a
jax.profiler trace context and a wall-clock timer that forces device
completion, so numbers mean device time, not dispatch time.
"""

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(dirname: str = "/tmp/cokriging_tpu_trace"):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(dirname)
    try:
        yield dirname
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Wall-clock timer that blocks on device work.

    >>> with Timer() as t:
    ...     out = jitted(x)
    ...     t.block_on(out)
    >>> t.seconds
    """

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def block_on(self, tree):
        jax.tree_util.tree_map(
            lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x,
            tree,
        )

    def __exit__(self, *exc):
        self.seconds = time.perf_counter() - self.t0
        return False
