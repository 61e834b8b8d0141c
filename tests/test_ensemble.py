"""Batched parameter sweeps (tools/ensemble.py + the sweep CLI)."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from lbm_tpu.core import lattice
from lbm_tpu.ops import fused_jnp
from lbm_tpu.params import LBMParams
from lbm_tpu.tools.ensemble import parse_range, run_ensemble


@pytest.fixture(scope="module")
def scene():
    params = LBMParams(
        nx=32, ny=16, max_iters=12, reynolds_dim=10,
        density=0.1, accel=0.005, omega=1.85,
    )
    mask = np.zeros((16, 32), dtype=bool)
    mask[0, :] = mask[-1, :] = True
    mask[6:8, 10:12] = True
    return params, mask


def test_instance_matches_single_run(scene):
    """The ensemble instance whose parameters equal the scene's must
    reproduce the single-run jnp path exactly (same shared math, omega as
    a traced scalar instead of a baked constant)."""
    params, mask = scene
    res = run_ensemble(
        params, mask, omegas=[1.2, params.omega, 1.9], num_steps=12
    )
    obst = jnp.asarray(mask)
    f = jnp.asarray(lattice.equilibrium_rest(params.density, 16, 32))
    tots = []
    for _ in range(12):
        f, tu = fused_jnp.fused_step_single(f, obst, params)
        tots.append(float(tu))
    tot_cells = int(mask.size - mask.sum())
    np.testing.assert_allclose(res.f[1], np.asarray(f), atol=1e-7)
    # |u| reduction order differs under vmap batching: last-ulp tolerance.
    np.testing.assert_allclose(
        res.av_vels[:, 1], np.asarray(tots, np.float32) / tot_cells, rtol=1e-4
    )


def test_omega_monotonicity(scene):
    """Physics sanity: lower omega (higher viscosity) damps the flow."""
    params, mask = scene
    res = run_ensemble(params, mask, omegas=[1.2, 1.5, 1.9], num_steps=12)
    final = res.av_vels[-1]
    assert final[0] < final[2]
    assert res.av_vels.shape == (12, 3)
    assert np.all(np.isfinite(res.f))


def test_accel_broadcast_and_validation(scene):
    params, mask = scene
    res = run_ensemble(
        params, mask, omegas=[1.5, 1.5], accels=[0.005, 0.02], num_steps=6
    )
    # Stronger driving, faster flow.
    assert res.av_vels[-1, 1] > res.av_vels[-1, 0]
    with pytest.raises(ValueError, match="accels"):
        run_ensemble(params, mask, omegas=[1.5, 1.6], accels=[0.005])


def test_parse_range():
    np.testing.assert_allclose(
        parse_range("1.2:1.8:3"), [1.2, 1.5, 1.8], rtol=1e-6
    )
    np.testing.assert_allclose(parse_range("1.2,1.9"), [1.2, 1.9], rtol=1e-6)
    assert parse_range("1.85").shape == (1,)
    with pytest.raises(ValueError):
        parse_range("1:2")


def test_sweep_cli(tmp_path):
    from lbm_tpu.cli import main
    from lbm_tpu.tools.scenegen import main as scene_main

    scene_main(
        ["--grid", "32x16", "--preset", "cavity",
         "--out-dir", str(tmp_path), "--name", "t"]
    )
    rc = main(
        ["sweep", str(tmp_path / "input_t.params"),
         str(tmp_path / "obstacles_t.dat"),
         "--omega", "1.3:1.9:4", "--steps", "8",
         "--out-dir", str(tmp_path / "sweep"), "--av-vels"]
    )
    assert rc == 0
    summary = (tmp_path / "sweep" / "sweep_summary.dat").read_text().splitlines()
    assert len(summary) == 5  # header + 4 instances
    assert os.path.exists(tmp_path / "sweep" / "av_vels_003.dat")


def test_geometry_sweep(scene):
    """A (B, ny, nx) obstacle batch runs a geometry sweep: each instance
    matches its own single-geometry run."""
    params, mask = scene
    masks = np.stack([mask, mask.copy()])
    masks[1, 10:12, 20:24] = True  # variant geometry
    res = run_ensemble(params, masks, omegas=params.omega, num_steps=10)
    assert res.av_vels.shape == (10, 2)
    for i in range(2):
        obst = jnp.asarray(masks[i])
        f = jnp.asarray(lattice.equilibrium_rest(params.density, 16, 32))
        tots = []
        for _ in range(10):
            f, tu = fused_jnp.fused_step_single(f, obst, params)
            tots.append(float(tu))
        cells = int(masks[i].size - masks[i].sum())
        np.testing.assert_allclose(res.f[i], np.asarray(f), atol=1e-7)
        np.testing.assert_allclose(
            res.av_vels[:, i], np.asarray(tots, np.float32) / cells, rtol=1e-4
        )
    # The two geometries genuinely diverge.
    assert np.abs(res.av_vels[-1, 0] - res.av_vels[-1, 1]) > 0

    with pytest.raises(ValueError, match="does not match"):
        run_ensemble(params, masks, omegas=[1.5, 1.6, 1.7], num_steps=2)
