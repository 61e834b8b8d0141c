#!/usr/bin/env bash
# Runtime environment knobs (the analog of the reference's OpenMP/env.sh,
# which pins thread count and core binding for the CPU build).
#
# Source this before running: `source scripts/env.sh`

# Keep the repo importable without clobbering plugin site paths.
export PYTHONPATH="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd):${PYTHONPATH:-}"

# Preallocate most of HBM for the solver (default JAX behavior); flip to
# false when sharing the chip.
export XLA_PYTHON_CLIENT_PREALLOCATE=${XLA_PYTHON_CLIENT_PREALLOCATE:-true}

# Async collectives (the latency-hiding scheduler overlapping ppermute halo
# exchanges with interior compute) are on by default in recent XLA. The
# explicit knob is --xla_tpu_enable_async_collective_fusion; some libtpu
# builds reject unknown XLA_FLAGS outright, so it is not forced here.

# Optional: persistent XLA compilation cache (JAX_COMPILATION_CACHE_DIR=dir).
# Speeds up repeat runs when the runtime's compile service honors it; the
# axon remote-compile service keeps its own server-side cache with its own
# eviction, so hits are best-effort.
