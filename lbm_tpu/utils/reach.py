"""Bounded device-backend reachability probe.

The axon TPU tunnel can hang outright — ``jax.devices()`` then blocks
forever (observed for 4+ hours), taking any in-process diagnostic down
with it.  Probing in a SUBPROCESS with a hard timeout keeps the caller
responsive; a hung child is killed by ``subprocess.run``'s timeout.

Used by ``bench.py`` (round-artifact collection must never hang) and
``lbm_tpu info --probe`` (the user-facing tunnel diagnostic).
"""

from __future__ import annotations

import subprocess
import sys


def device_reachable(timeout_s: float = 180.0) -> bool:
    """True iff ``jax.devices()`` completes within ``timeout_s`` seconds."""
    try:
        subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s,
            check=True,
            capture_output=True,
        )
        return True
    except Exception:
        return False
