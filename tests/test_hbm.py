"""HBM-pipelined temporal sweep (ops/hbm_pallas.py) vs the jnp path.

Same contract as the other temporal kernels (tests/test_temporal.py): on
TPU the K-sweep is bitwise-identical to K single steps on fields; CPU
interpret accumulates ~1-ulp differences, so comparisons use the same
few-ulp atol.  The sweep body is shared with the ca in-place engine
(resident_pallas._inplace_slab_sweep), so these tests also pin the
manual-DMA pipeline's part schedule: wrap pieces at both grid edges,
driven-row injection in whichever part holds the accelerated row, and
part-major av grouping.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from lbm_tpu.core import lattice
from lbm_tpu.ops import hbm_pallas
from lbm_tpu.params import LBMParams


def _scene(ny, nx, seed):
    params = LBMParams(
        nx=nx, ny=ny, max_iters=16, reynolds_dim=10,
        density=0.1, accel=0.005, omega=1.85,
    )
    r = np.random.default_rng(seed)
    mask = r.random((ny, nx)) < 0.08
    mask[0, :] = mask[-1, :] = True
    return params, mask


def _run_jnp(params, mask, steps):
    from lbm_tpu.ops import fused_jnp

    obst = jnp.asarray(mask)
    f = jnp.asarray(
        lattice.equilibrium_rest(params.density, params.ny, params.nx)
    )
    tots = []
    for _ in range(steps):
        f, tu = fused_jnp.fused_step_single(f, obst, params)
        tots.append(float(tu))
    return np.asarray(f), np.asarray(tots, np.float32)


def test_plan_shape():
    params, _ = _scene(64, 256, 0)
    plan = hbm_pallas._plan(params, 8)
    assert plan is not None
    r, b, slots, limit = plan
    assert 64 % r == 0 and r % 8 == 0 and 64 // r >= 3
    assert (r + 16) % b == 0
    assert not hbm_pallas.supports(params, 4)  # K must be a multiple of 8
    assert not hbm_pallas.supports(params, 8, clone_cols_nx=200)
    assert not hbm_pallas.supports(params, 8, storage="i16")


def test_sweep_matches_jnp():
    params, mask = _scene(64, 256, 3)
    f_j, tot_j = _run_jnp(params, mask, 16)
    run = hbm_pallas.make_run_all(params, mask, 16, 8)
    f0 = jnp.asarray(lattice.equilibrium_rest(params.density, 64, 256))
    f_h, tots = run(f0)
    np.testing.assert_allclose(np.asarray(f_h), f_j, atol=5e-7)
    np.testing.assert_allclose(np.asarray(tots, np.float32), tot_j, rtol=1e-4)


def test_remainder_steps():
    params, mask = _scene(64, 256, 5)
    f_j, tot_j = _run_jnp(params, mask, 11)
    run = hbm_pallas.make_run_all(params, mask, 11, 8)
    f0 = jnp.asarray(lattice.equilibrium_rest(params.density, 64, 256))
    f_h, tots = run(f0)
    assert tots.shape == (11,)
    np.testing.assert_allclose(np.asarray(f_h), f_j, atol=5e-7)
    np.testing.assert_allclose(np.asarray(tots, np.float32), tot_j, rtol=1e-4)


def test_matches_ca_inplace_composition():
    """Same parts → the fused pipeline must agree with the per-part
    make_ca_inplace_runner composition it replaces (fields bitwise on a
    common backend; av identical grouping → identical floats)."""
    from lbm_tpu.ops import resident_pallas

    params, mask = _scene(64, 256, 7)
    plan = hbm_pallas._plan(params, 8)
    assert plan is not None
    R = plan[0]
    f0 = jnp.asarray(lattice.equilibrium_rest(params.density, 64, 256))
    sweep = hbm_pallas.make_sweep(params, mask, 8)
    f_h, av_h = sweep(f0)

    runner = resident_pallas.make_ca_inplace_runner(
        params, 64, 256, 8, 64, parts=64 // R
    )
    obst = np.zeros((64 + 16, 256), np.float32)
    m = np.asarray(mask, np.float32)
    obst[8:-8] = m
    obst[:8] = m[-8:]
    obst[-8:] = m[:8]
    f_ca, av_ca = runner(
        f0,
        f0[:, -8:, :],
        f0[:, :8, :],
        jnp.asarray(obst),
        0,
    )
    np.testing.assert_allclose(
        np.asarray(f_h), np.asarray(f_ca), atol=5e-7
    )
    np.testing.assert_allclose(
        np.asarray(av_h), np.asarray(av_ca), rtol=1e-6
    )


def test_driver_forced_hbm_matches_auto(tmp_path, monkeypatch):
    """End-to-end through the driver: LBM_TEMPORAL_IMPL=hbm on a grid
    that maps it must reproduce the auto path's av_vels within interpret
    tolerance (fields are bitwise on TPU; av grouping differs part-major
    vs the skew pair's row grouping)."""
    from lbm_tpu.io.scene import Scene
    from lbm_tpu.models.driver import RunConfig, run_simulation

    params, mask = _scene(64, 256, 9)
    scene = Scene(params=params, obstacles=mask)
    r_ref = run_simulation(
        scene, RunConfig(num_steps=16, variant="pallas", temporal_k=1)
    )
    monkeypatch.setenv("LBM_TEMPORAL_IMPL", "hbm")
    r_hbm = run_simulation(
        scene, RunConfig(num_steps=16, variant="pallas", temporal_k=8)
    )
    np.testing.assert_allclose(
        np.asarray(r_hbm.av_vels),
        np.asarray(r_ref.av_vels),
        rtol=2e-6,
    )
    np.testing.assert_allclose(
        np.asarray(r_hbm.f),
        np.asarray(r_ref.f),
        atol=5e-7,
    )
