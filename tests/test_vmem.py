"""LBM_VMEM_LIMIT_MB: raised scoped-VMEM limits (ops/vmem.py).

Unset, everything must behave exactly as the calibrated default.  Raised,
the planners scale their budgets (bigger blocks become legal) and every
pallas_call passes CompilerParams(vmem_limit_bytes=...) — results stay
identical, the limit only changes legal layouts.  Real VMEM feasibility can
only be proven on hardware (scripts/exp_vmemlimit.py); these tests pin the
plumbing.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from lbm_tpu.core import lattice
from lbm_tpu.ops import fused_jnp, fused_pallas, skew_pallas, temporal_pallas, vmem
from lbm_tpu.params import LBMParams


def test_default_is_noop(monkeypatch):
    monkeypatch.delenv("LBM_VMEM_LIMIT_MB", raising=False)
    assert vmem.limit_mb() == vmem.DEFAULT_LIMIT_MB
    assert vmem.compiler_params() == {}
    assert vmem.scale(1000) == 1000
    # Values at or below the default (and junk) are clamped to the default.
    monkeypatch.setenv("LBM_VMEM_LIMIT_MB", "8")
    assert vmem.limit_mb() == vmem.DEFAULT_LIMIT_MB
    monkeypatch.setenv("LBM_VMEM_LIMIT_MB", "banana")
    assert vmem.limit_mb() == vmem.DEFAULT_LIMIT_MB


def test_raised_limit_scales_planners(monkeypatch):
    monkeypatch.delenv("LBM_VMEM_LIMIT_MB", raising=False)
    b_default = fused_pallas.pick_block_rows(1024, 1024)
    k_default = temporal_pallas._plan(2048, 2048, 8)[4]
    s_default = skew_pallas._plan(1024, 1024, 4)[3]
    monkeypatch.setenv("LBM_VMEM_LIMIT_MB", "96")
    kw = vmem.compiler_params()
    assert kw["compiler_params"].vmem_limit_bytes == 96 * 2**20
    assert fused_pallas.pick_block_rows(1024, 1024) > b_default
    assert temporal_pallas._plan(2048, 2048, 8)[4] >= k_default
    assert skew_pallas._plan(1024, 1024, 4)[3] > s_default


def test_raised_limit_keeps_results_identical(monkeypatch):
    # Interpret mode ignores the compiler params; this pins that the kwarg
    # plumbing does not disturb kernel construction or results.
    params = LBMParams(nx=128, ny=32, max_iters=4, reynolds_dim=10,
                       density=0.1, accel=0.005, omega=1.85)
    r = np.random.default_rng(3)
    mask = r.random((32, 128)) < 0.08
    mask[0, :] = mask[-1, :] = True
    f0 = jnp.asarray(lattice.equilibrium_rest(params.density, 32, 128))
    obst = jnp.asarray(mask)

    def run_steps(n):
        f = f0
        for _ in range(n):
            f, _ = fused_jnp.fused_step_single(f, obst, params)
        return np.asarray(f)

    f_ref = run_steps(4)
    monkeypatch.setenv("LBM_VMEM_LIMIT_MB", "64")
    run = skew_pallas.make_run_all(params, mask, 4, K=2)
    f_s, _ = run(f0)
    np.testing.assert_allclose(np.asarray(f_s), f_ref, atol=5e-7)
