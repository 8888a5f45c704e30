"""Observability and debugging aids (SURVEY.md §7 auxiliary subsystems).

The reference's tooling is coarse wall-clock phase logs (modes.cpp:35-95)
and ASan in debug builds.  TPU-native equivalents:

- :func:`maybe_profile`: wraps a region in a ``jax.profiler`` trace when a
  directory is given (CLI key ``profile=DIR``); view with TensorBoard or
  xprof.
- debug switches via environment (no code changes needed at call sites):
  ``WAVELET_TPU_DEBUG_NANS=1`` enables ``jax_debug_nans`` (the analogue of
  the reference's sanitizer builds for numeric bugs) and
  ``WAVELET_TPU_DISABLE_JIT=1`` runs op-by-op for step debugging.
"""

from __future__ import annotations

import contextlib
import logging
import os
import time

log = logging.getLogger("wavelet_tpu")


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    """Enable JAX's persistent compilation cache (verified to work through
    the axon remote-compile backend: ~30-50 s kernel compiles drop to ~0.1 s
    on reruns).  Default location: ``.jax_cache`` beside the package; set
    ``WAVELET_TPU_CACHE=0`` to disable or a path to relocate."""
    env = os.environ.get("WAVELET_TPU_CACHE", "")
    if env == "0":
        return
    if env in ("1", "true", "yes"):
        env = ""          # plain enable, not a relocation path
    if cache_dir is None:
        cache_dir = env or os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache")
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def apply_platform_env() -> None:
    """Honor ``WAVELET_TPU_PLATFORM`` (e.g. ``cpu``) deterministically.

    A plain ``JAX_PLATFORMS`` env var can be overridden by site-level
    plugins that call ``jax.config.update`` after reading it; an explicit
    config update here always wins.  Entry points (CLI, bench scripts)
    call this before any device work."""
    import jax

    if os.environ.get("WAVELET_TPU_PLATFORM"):
        jax.config.update("jax_platforms",
                          os.environ["WAVELET_TPU_PLATFORM"])


def apply_env_debug_flags() -> None:
    """Install debug configuration from environment variables (call once at
    CLI startup; harmless if repeated)."""
    import jax

    if os.environ.get("WAVELET_TPU_DEBUG_NANS", "0") == "1":
        jax.config.update("jax_debug_nans", True)
        log.info("jax_debug_nans enabled")
    if os.environ.get("WAVELET_TPU_DISABLE_JIT", "0") == "1":
        jax.config.update("jax_disable_jit", True)
        log.info("jit disabled (op-by-op debugging mode)")


@contextlib.contextmanager
def maybe_profile(trace_dir: str | None):
    """Profile the enclosed region into ``trace_dir`` if set, else no-op."""
    if not trace_dir:
        yield
        return
    import jax

    log.info("Capturing jax.profiler trace to %s", trace_dir)
    with jax.profiler.trace(trace_dir):
        yield


class _Phase:
    """Mutable handle yielded by :func:`phase_timer`; set ``nbytes`` inside
    the block to get a GB/s figure, read ``seconds`` after it."""

    def __init__(self, nbytes):
        self.nbytes = nbytes
        self.seconds = 0.0


@contextlib.contextmanager
def phase_timer(name: str, nbytes: int | None = None,
                message: str | None = None):
    """Log a phase's wall time (and GB/s when a byte count is given) — the
    TPU build's version of the reference's chrono phase logs (modes.cpp:93,
    107, 170), plus the throughput figure BASELINE.json's metric asks for.

    ``message`` overrides the default "name: N s" wording with a reference-
    parity log line (one ``%s`` placeholder receives the seconds)."""
    ph = _Phase(nbytes)
    t0 = time.perf_counter()
    yield ph
    ph.seconds = time.perf_counter() - t0
    text = (message % ph.seconds) if message else f"{name}: {ph.seconds:.3f} s"
    if ph.nbytes:
        text += " (%.3g GB/s)" % (ph.nbytes / 1e9 / max(ph.seconds, 1e-12))
    log.info("%s", text)
