"""Fused collide-stream Pallas TPU kernel (placeholder — jnp fallback).

The hand-tuned kernel lands in the next milestone; until then `supports`
reports False so variant auto-selection uses the XLA-fused jnp step.
"""

from __future__ import annotations

import numpy as np

from lbm_tpu.params import LBMParams


def supports(params: LBMParams) -> bool:
    return False


def make_step(params: LBMParams, obstacles: np.ndarray):
    raise NotImplementedError("pallas backend not yet implemented; use variant=jnp")


def make_slab_step(params: LBMParams, nloc: int, nx: int):
    raise NotImplementedError("pallas backend not yet implemented; use backend=jnp")
