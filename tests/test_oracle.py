"""Unit and golden-prefix tests for the NumPy serial oracle."""

import numpy as np
import pytest

from lbm_tpu.core import lattice, oracle
from lbm_tpu.io import load_scene
from lbm_tpu.utils import invariants
from tests.conftest import requires_reference


def test_equilibrium_rest_weights():
    f = lattice.equilibrium_rest(0.9, 4, 8)
    assert f.shape == (9, 4, 8)
    assert np.allclose(f[0], 0.9 * 4 / 9, rtol=1e-6)
    assert np.allclose(f[1:5], 0.9 / 9, rtol=1e-6)
    assert np.allclose(f[5:], 0.9 / 36, rtol=1e-6)
    # Density of each cell is exactly the configured density.
    assert np.allclose(f.sum(axis=0), 0.9, rtol=1e-6)


def test_equilibrium_rest_device_matches_host():
    """The device-side broadcast init (no multi-GB host upload at 4096²+)
    must be bitwise-identical to the host-built array."""
    host = lattice.equilibrium_rest(0.1, 6, 16)
    dev = np.asarray(lattice.equilibrium_rest_device(0.1, 6, 16))
    assert dev.dtype == host.dtype
    np.testing.assert_array_equal(dev, host)


def test_rest_state_is_fixed_point_without_accel(small_params, small_obstacles):
    """With accel=0 the rest equilibrium must be a fixed point."""
    params = small_params.replace(accel=0.0)
    f0 = lattice.equilibrium_rest(params.density, params.ny, params.nx)
    f, av = oracle.run(params, small_obstacles, f=f0, num_steps=3)
    np.testing.assert_allclose(f, f0, atol=1e-7)
    np.testing.assert_allclose(av, 0.0, atol=1e-7)


def test_mass_conservation(small_params, small_obstacles):
    """The driven-row injection is mass-neutral, so total density is
    conserved (SerialCode/d2q9-bgk.c:234-241)."""
    f, _ = oracle.run(small_params, small_obstacles, num_steps=50)
    expected = small_params.density * small_params.nx * small_params.ny
    assert invariants.total_density(f) == pytest.approx(expected, rel=1e-5)


def test_accelerate_only_touches_driven_row(small_params, small_obstacles):
    f = lattice.equilibrium_rest(small_params.density, small_params.ny, small_params.nx)
    before = f.copy()
    oracle.accelerate_flow(f, small_obstacles, small_params)
    jj = small_params.accel_row
    changed = np.any(f != before, axis=0)
    assert not changed[np.arange(small_params.ny) != jj].any()
    # Obstacle cells on the driven row unchanged.
    assert not changed[jj][small_obstacles[jj]].any()
    # Net mass on the row unchanged.
    assert f.sum(dtype=np.float64) == pytest.approx(before.sum(dtype=np.float64))


def test_accelerate_positivity_guard(small_params):
    """Cells whose west-side speeds would go non-positive are skipped
    (SerialCode/d2q9-bgk.c:229-232)."""
    obst = np.zeros((small_params.ny, small_params.nx), dtype=bool)
    f = lattice.equilibrium_rest(small_params.density, small_params.ny, small_params.nx)
    jj = small_params.accel_row
    f[3, jj, 4] = 0.0  # this cell's west speed cannot afford the decrement
    before = f[:, jj, 4].copy()
    oracle.accelerate_flow(f, obst, small_params)
    np.testing.assert_array_equal(f[:, jj, 4], before)
    assert f[1, jj, 5] > before[1]  # neighbour cell was accelerated


def test_propagate_periodic_wrap():
    """A pulse streams one lattice unit per step in each direction with
    periodic wrap (SerialCode/d2q9-bgk.c:248-277)."""
    f = np.zeros((9, 4, 4), dtype=np.float32)
    f[:, 0, 0] = 1.0  # pulse at the corner exercises the wrap
    tmp = oracle.propagate(f)
    for k in range(9):
        jj = lattice.CY[k] % 4
        ii = lattice.CX[k] % 4
        assert tmp[k, jj, ii] == 1.0
        assert tmp[k].sum() == 1.0


def test_rebound_mirrors_opposites():
    f = np.zeros((9, 3, 3), dtype=np.float32)
    tmp = np.arange(9, dtype=np.float32)[:, None, None] * np.ones((3, 3), np.float32)
    obst = np.zeros((3, 3), dtype=bool)
    obst[1, 1] = True
    oracle.rebound(f, tmp, obst)
    for k in range(1, 9):
        assert f[k, 1, 1] == lattice.OPP[k]
        assert f[k, 0, 0] == 0.0  # fluid cells untouched by rebound


def test_collision_preserves_moments(small_params):
    """BGK collision conserves per-cell density and momentum in exact
    arithmetic; verify to float tolerance on random positive state."""
    rng = np.random.default_rng(42)
    tmp = rng.uniform(0.01, 0.1, size=(9, 8, 8)).astype(np.float32)
    f = np.zeros_like(tmp)
    obst = np.zeros((8, 8), dtype=bool)
    oracle.collision(f, tmp, obst, small_params)
    rho_before = oracle.local_density(tmp)
    rho_after = oracle.local_density(f)
    np.testing.assert_allclose(rho_after, rho_before, rtol=1e-5)
    ux_b, uy_b = oracle.velocity(tmp)
    ux_a, uy_a = oracle.velocity(f)
    np.testing.assert_allclose(ux_a, ux_b, atol=1e-5)
    np.testing.assert_allclose(uy_a, uy_b, atol=1e-5)


@requires_reference
def test_oracle_matches_golden_prefix_128x128():
    """First 200 steps of av_vels match the reference golden data well
    inside the 1% contract (check/check.py:19-24)."""
    sc = load_scene(
        "/root/reference/dataSet/input_128x128.params",
        "/root/reference/dataSet/obstacles_128x128.dat",
    )
    _, av = oracle.run(sc.params, sc.obstacles, num_steps=200)
    gold = np.loadtxt("/root/reference/check/128x128.av_vels.dat", usecols=[1])[:200]
    rel = 100.0 * np.abs((gold - av) / av)
    assert rel.max() < 0.1, f"max rel diff {rel.max():.4f}%"
