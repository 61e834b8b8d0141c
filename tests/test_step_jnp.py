"""Fused jnp step vs the NumPy oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lbm_tpu.core import lattice, oracle
from lbm_tpu.ops import fused_jnp


STEPS = 25


@pytest.fixture
def small_f0(small_params):
    return lattice.equilibrium_rest(
        small_params.density, small_params.ny, small_params.nx
    )


def run_jnp(params, obstacles, f0, steps):
    step = fused_jnp.make_single_step(params, obstacles)
    f = jnp.asarray(f0)
    tot = []
    for _ in range(steps):
        f, tu = step(f)
        tot.append(float(tu))
    fluid = obstacles.size - np.count_nonzero(obstacles)
    return np.asarray(f), np.array(tot, np.float32) / np.float32(fluid)


def test_fused_step_matches_oracle(small_params, small_obstacles, small_f0):
    f_o, av_o = oracle.run(small_params, small_obstacles, num_steps=STEPS)
    f_j, av_j = run_jnp(small_params, small_obstacles, small_f0, STEPS)
    np.testing.assert_allclose(f_j, f_o, atol=2e-7)
    np.testing.assert_allclose(av_j, av_o, rtol=1e-4)


def test_slab_form_matches_full_grid(small_params, small_obstacles, small_f0):
    """The ghosted-slab step with wrap ghosts must equal the periodic
    full-grid step bitwise — the sharded compute path's correctness anchor."""
    obst = small_obstacles
    obst_slab = jnp.asarray(np.concatenate([obst[-1:], obst, obst[:1]], axis=0))

    @jax.jit
    def step_slab(f):
        slab = jnp.concatenate([f[:, -1:], f, f[:, :1]], axis=1)
        return fused_jnp.fused_step_slab(slab, obst_slab, small_params, row_offset=0)

    step = fused_jnp.make_single_step(small_params, obst)
    f_a = f_b = jnp.asarray(small_f0)
    for _ in range(STEPS):
        f_a, tu_a = step(f_a)
        f_b, tu_b = step_slab(f_b)
    np.testing.assert_array_equal(np.asarray(f_a), np.asarray(f_b))


def test_mass_conserved_under_jit(small_params, small_obstacles, small_f0):
    f, _ = run_jnp(small_params, small_obstacles, small_f0, 50)
    expected = small_params.density * small_params.nx * small_params.ny
    assert f.sum(dtype=np.float64) == pytest.approx(expected, rel=1e-5)


def test_accel_row_slab_masking(small_params, small_obstacles, small_f0):
    """Splitting the grid into two stacked slabs with correct row offsets
    reproduces the full-grid step (accel row handled by global-row masking)."""
    p, obst = small_params, small_obstacles
    ny = p.ny
    h = ny // 2
    step = fused_jnp.make_single_step(p, obst)
    f = jnp.asarray(small_f0)

    def two_slab_step(f):
        outs = []
        tots = []
        for r, off in ((0, 0), (1, h)):
            rows = np.arange(off - 1, off + h + 1) % ny
            slab = f[:, rows, :]
            oslab = jnp.asarray(obst[rows])
            out, tot = fused_jnp.fused_step_slab(slab, oslab, p, row_offset=off)
            outs.append(out)
            tots.append(tot)
        return jnp.concatenate(outs, axis=1), tots[0] + tots[1]

    f_a = f_b = f
    for _ in range(STEPS):
        f_a, _ = step(f_a)
        f_b, _ = jax.jit(two_slab_step)(f_b)
    np.testing.assert_array_equal(np.asarray(f_a), np.asarray(f_b))
