"""Runtime observability and persistence helpers.

The reference has no tracing/profiling/checkpoint subsystems (SURVEY.md
section 5); its only persistent state is in-memory caches keyed by
full-precision reprs.  The TPU-native equivalents provided here:

* profiling: `jax.profiler` traces (viewable in TensorBoard/XProf) and
  XLA's static cost model (fiat_tpu.ir.cost_analysis);
* "checkpoint/resume" of compiled state: JAX's persistent compilation
  cache, so recompiling an element zoo across processes is a disk hit
  rather than an XLA compile.
"""

import contextlib

import jax


def enable_compilation_cache(path="/tmp/fiat_tpu_xla_cache",
                             min_compile_time_secs=0.5):
    """Persist compiled executables across processes (the rebuild's
    replacement for the reference's in-memory construction caches)."""
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_time_secs)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


@contextlib.contextmanager
def profile_trace(logdir="/tmp/fiat_tpu_profile"):
    """Capture a device profile of the enclosed block:

        with profile_trace("/tmp/prof"):
            tables = tabulator(points)
            jax.block_until_ready(tables)
    """
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def annotate(name):
    """Named profiler span for the enclosed computation."""
    return jax.profiler.TraceAnnotation(name)
