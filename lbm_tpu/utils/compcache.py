"""Persistent XLA compilation cache wiring.

Compilation on remote-compile TPU runtimes is the dominant startup cost and
its latency is highly variable (measured 2.6 s - 226 s for the same-size
program on this environment's remote service).  JAX's persistent compilation
cache eliminates it entirely on repeat: the compiled executable is stored
on local disk keyed by HLO hash, and a warm run loads it in a few seconds
(measured 226 s -> 6.9 s on the 1024x1024 block-kernel scan).

Combined with the driver's fixed-length segmented execution
(models/driver.py:_SEGMENT_STEPS) the cache key no longer depends on the
step count, so any run of a given (grid, variant, backend) after the first
skips compilation regardless of --steps.

The reference has no analog — its compile cost is `make` (SerialCode/
Makefile:7-8), paid once per build rather than per run; this brings the
JAX workflow to the same amortization.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/lbm_tpu/xla")


def enable_persistent_cache(cache_dir: str | None = None) -> str | None:
    """Point JAX's compilation cache at a local directory.

    Must run before the first compilation.  Respects an explicit
    JAX_COMPILATION_CACHE_DIR (jax reads it natively; we do not override).
    Set LBM_NO_COMPILE_CACHE=1 to disable.  Returns the directory in use,
    or None when disabled.
    """
    if os.environ.get("LBM_NO_COMPILE_CACHE"):
        return None
    env_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if env_dir:
        return env_dir
    import jax

    path = cache_dir or _DEFAULT_DIR
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # Cache even fast compiles: remote-compile latency is erratic, so a
        # compile that was cheap once may not be next time.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        return None  # older jax without these knobs, or read-only disk
    return path
