"""Scoped-VMEM limit control for the Pallas kernels.

Every VMEM budget in this repo (`fused_pallas`/`temporal_pallas`/
`skew_pallas._VMEM_BUDGET`, `resident_pallas._VMEM_STATE_BUDGET`) was
calibrated against Mosaic's DEFAULT scoped-VMEM allocation limit (~16 MiB:
observed OOM-at-compile for ~16.6 MiB footprints, BENCHMARKS.md).  The
physical VMEM of a v5e core is 128 MiB, and
``pltpu.CompilerParams(vmem_limit_bytes=...)`` raises the compiler's limit
toward it — trading pipeline headroom for resident state.

``LBM_VMEM_LIMIT_MB=<int>`` opts in at runtime: every kernel's
``pallas_call`` passes the raised limit and the planners scale their
calibrated budgets proportionally.  Unset (or <=16) keeps the measured
default behavior bit-for-bit.  The variable is read at build time, not
import time, so sweeps can probe several limits in one process.
"""

from __future__ import annotations

import os

# Mosaic's default scoped-VMEM allocation limit (MiB), the calibration
# baseline for all budget constants.
DEFAULT_LIMIT_MB = 16


def env_limit_set() -> bool:
    """Whether the user pinned a limit via LBM_VMEM_LIMIT_MB."""
    try:
        return int(os.environ.get("LBM_VMEM_LIMIT_MB", "0")) > DEFAULT_LIMIT_MB
    except ValueError:
        return False


def limit_mb(explicit: int | None = None) -> int:
    """Active scoped-VMEM limit in MiB (>= the 16 MiB default).

    ``explicit`` lets a kernel pin its own limit (the auto raised-resident
    regime, resident_pallas.auto_limit_mb); the env variable remains the
    user override and callers pass explicit=None when it is set."""
    if explicit is not None and explicit > DEFAULT_LIMIT_MB:
        return explicit
    try:
        v = int(os.environ.get("LBM_VMEM_LIMIT_MB", "0"))
    except ValueError:
        v = 0
    return v if v > DEFAULT_LIMIT_MB else DEFAULT_LIMIT_MB


def compiler_params(explicit: int | None = None) -> dict:
    """Extra ``pl.pallas_call`` kwargs for the active limit ({} at default)."""
    mb = limit_mb(explicit)
    if mb == DEFAULT_LIMIT_MB:
        return {}
    from jax.experimental.pallas import tpu as pltpu

    return {
        "compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=mb * 2**20
        )
    }


def scale(budget_at_default: int, explicit: int | None = None) -> int:
    """Scale a budget calibrated at the 16 MiB default to the active limit."""
    return budget_at_default * limit_mb(explicit) // DEFAULT_LIMIT_MB
