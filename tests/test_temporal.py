"""Temporal-blocking kernel (ops/temporal_pallas.py) vs the jnp path.

On real TPU hardware the K-step sweep is bitwise-identical to K single
steps (verified on-device); CPU interpret mode accumulates ~1-ulp
differences per step, so these tests use a few-ulp atol like the other
interpret-mode comparisons in tests/test_pallas.py.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from lbm_tpu.core import lattice
from lbm_tpu.models.driver import RunConfig, run_simulation
from lbm_tpu.ops import fused_jnp, temporal_pallas
from lbm_tpu.params import LBMParams


def _scene(ny, nx, seed):
    params = LBMParams(
        nx=nx, ny=ny, max_iters=12, reynolds_dim=10,
        density=0.1, accel=0.005, omega=1.85,
    )
    r = np.random.default_rng(seed)
    mask = r.random((ny, nx)) < 0.08
    mask[0, :] = mask[-1, :] = True
    return params, mask


def _run_jnp(params, mask, steps):
    obst = jnp.asarray(mask)
    f = jnp.asarray(lattice.equilibrium_rest(params.density, params.ny, params.nx))
    tots = []
    for _ in range(steps):
        f, tu = fused_jnp.fused_step_single(f, obst, params)
        tots.append(float(tu))
    return np.asarray(f), np.asarray(tots, np.float32)


@pytest.mark.parametrize("K,steps", [(2, 8), (3, 9), (4, 8)])
def test_sweep_matches_jnp(K, steps):
    params, mask = _scene(32, 128, seed=K)
    f_j, tot_j = _run_jnp(params, mask, steps)
    run = temporal_pallas.make_run_all(params, mask, steps, K)
    f0 = jnp.asarray(lattice.equilibrium_rest(params.density, 32, 128))
    f_t, tots = run(f0)
    np.testing.assert_allclose(np.asarray(f_t), f_j, atol=5e-7)
    np.testing.assert_allclose(np.asarray(tots, np.float32), tot_j, rtol=1e-4)


def test_remainder_steps_via_single_step_kernel():
    # num_steps not a multiple of K: the tail runs as single-step launches.
    params, mask = _scene(32, 128, seed=7)
    f_j, tot_j = _run_jnp(params, mask, 7)
    run = temporal_pallas.make_run_all(params, mask, 7, K=4)
    f0 = jnp.asarray(lattice.equilibrium_rest(params.density, 32, 128))
    f_t, tots = run(f0)
    assert tots.shape == (7,)
    np.testing.assert_allclose(np.asarray(f_t), f_j, atol=5e-7)
    np.testing.assert_allclose(np.asarray(tots, np.float32), tot_j, rtol=1e-4)


def test_driven_row_inside_seam_strip():
    # ny=16: the accel row (ny-2=14) lies inside the K=4 seam strip
    # (rows 12..15), exercising the strip's exact global-row accel masks.
    params, mask = _scene(16, 128, seed=3)
    assert params.accel_row >= 16 - 4
    f_j, tot_j = _run_jnp(params, mask, 8)
    run = temporal_pallas.make_run_all(params, mask, 8, K=4)
    f0 = jnp.asarray(lattice.equilibrium_rest(params.density, 16, 128))
    f_t, tots = run(f0)
    np.testing.assert_allclose(np.asarray(f_t), f_j, atol=5e-7)
    np.testing.assert_allclose(np.asarray(tots, np.float32), tot_j, rtol=1e-4)


def test_folded_wide_grid():
    params, mask = _scene(16, 2048, seed=5)
    f_j, _ = _run_jnp(params, mask, 6)
    run = temporal_pallas.make_run_all(
        params, mask, 6, K=2, folded_io=True
    )
    f0 = lattice.equilibrium_rest(params.density, 16, 2048)
    f0 = jnp.asarray(np.asarray(f0, np.float32).reshape(9, 32, 1024))
    f_t, _ = run(f0)
    np.testing.assert_allclose(
        np.asarray(f_t).reshape(9, 16, 2048), f_j, atol=5e-7
    )


def test_fold3_wide_grid():
    # Non-power-of-2 fold (nx=3072 -> F=3): the planner must pick a block
    # height that is a multiple of BOTH the ghost group and the fold (see
    # fused_pallas.pick_block_rows) so every lane rotation starts at a
    # fold-group boundary.
    params, mask = _scene(16, 3072, seed=11)
    assert temporal_pallas._plan(16, 3072, 2)[4] % 3 == 0
    f_j, _ = _run_jnp(params, mask, 4)
    run = temporal_pallas.make_run_all(params, mask, 4, K=2, folded_io=True)
    f0 = lattice.equilibrium_rest(params.density, 16, 3072)
    f0 = jnp.asarray(np.asarray(f0, np.float32).reshape(9, 48, 1024))
    f_t, _ = run(f0)
    np.testing.assert_allclose(
        np.asarray(f_t).reshape(9, 16, 3072), f_j, atol=5e-7
    )


def test_i16_storage_stays_inside_quant_tolerance():
    from lbm_tpu.ops import quant

    params, mask = _scene(32, 128, seed=9)
    f_j, _ = _run_jnp(params, mask, 8)
    run = temporal_pallas.make_run_all(params, mask, 8, K=2, storage="i16")
    f0 = jnp.asarray(lattice.equilibrium_rest(params.density, 32, 128))
    f_t, tots = run(quant.quantize(f0, params.density))
    f_t = np.asarray(quant.dequantize(jnp.asarray(f_t), params.density))
    # quantized once per K steps: comfortably inside the per-step i16 error
    np.testing.assert_allclose(f_t, f_j, atol=2e-5)
    assert np.all(np.isfinite(np.asarray(tots)))


def test_folded_width_requires_folded_io():
    # F>1 without folded_io would slice an unfolded array with folded-view
    # indices; must fail loudly instead (ADVICE r2).
    params, mask = _scene(16, 2048, seed=5)
    with pytest.raises(ValueError, match="folded_io=True"):
        temporal_pallas.make_sweep(params, mask, K=2, folded_io=False)


def test_forced_temporal_k_warns_when_unmappable():
    # An explicit --temporal-k the grid cannot map must warn, not silently
    # fall back to the single-step kernel (ADVICE r2).
    from lbm_tpu.parallel import modes

    params, mask = _scene(8, 128, seed=2)  # ny=8 < 2K for K=8
    assert not temporal_pallas.supports(params, 8)
    with pytest.warns(UserWarning, match="temporal"):
        hook = modes._temporal_run_all(params, mask, temporal_k=8)
    assert hook is None


def test_supports_guards():
    params, _ = _scene(32, 128, seed=0)
    assert temporal_pallas.supports(params, 2)
    assert not temporal_pallas.supports(params, 1)  # K<2 is not temporal
    bad_nx = params.replace(nx=100)
    assert not temporal_pallas.supports(bad_nx, 2)
    tiny = params.replace(ny=4)  # accel_row=2 < K=4 / ny < 2K
    assert not temporal_pallas.supports(tiny, 4)


def test_driver_temporal_path_matches_per_step():
    # End-to-end: run_simulation with the temporal run_all vs disabled.
    from lbm_tpu.io.scene import Scene

    params, mask = _scene(32, 128, seed=11)
    params = params.replace(max_iters=10)
    scene = Scene(params=params, obstacles=mask)
    res_t = run_simulation(
        scene, RunConfig(variant="pallas", temporal_k=2)
    )
    res_1 = run_simulation(
        scene, RunConfig(variant="pallas", temporal_k=1)
    )
    np.testing.assert_allclose(res_t.f, res_1.f, atol=5e-7)
    np.testing.assert_allclose(res_t.av_vels, res_1.av_vels, rtol=1e-4)


def test_temporal_segmented_execution_is_invisible():
    """Segment boundaries must stay bitwise-invisible on the temporal path:
    two 6-step segments of sweeps perform the identical op sequence as one
    12-step run (the driver contract _SEGMENT_STEPS relies on)."""
    from lbm_tpu.io.scene import Scene

    params, mask = _scene(32, 128, seed=17)
    params = params.replace(max_iters=12)
    scene = Scene(params=params, obstacles=mask)
    whole = run_simulation(
        scene, RunConfig(variant="pallas", temporal_k=2, segment_steps=0)
    )
    seg = run_simulation(
        scene, RunConfig(variant="pallas", temporal_k=2, segment_steps=6)
    )
    np.testing.assert_array_equal(seg.f, whole.f)
    np.testing.assert_array_equal(seg.av_vels, whole.av_vels)


def test_lane_padded_temporal_path():
    # nx=100: lane padding + clone columns, refreshed at every sweep level.
    params, mask = _scene(32, 100, seed=13)
    params = params.replace(max_iters=8)
    from lbm_tpu.io.scene import Scene

    scene = Scene(params=params, obstacles=mask)
    res_t = run_simulation(scene, RunConfig(variant="pallas", temporal_k=2))
    res_j = run_simulation(scene, RunConfig(variant="jnp"))
    np.testing.assert_allclose(res_t.f, res_j.f, atol=5e-7)
    np.testing.assert_allclose(res_t.av_vels, res_j.av_vels, rtol=1e-4)


def test_pick_k_policy():
    """The depth heuristic mirrors the measured tables in BENCHMARKS.md."""
    from lbm_tpu.ops import temporal_pallas
    from lbm_tpu.params import LBMParams

    def p(n, nx=None):
        return LBMParams(nx=nx or n, ny=n, max_iters=1, reynolds_dim=10,
                         density=0.1, accel=0.01, omega=1.85)

    # DRAM-bound f32: K=8 at fold<=2, K=4 at fold 4.
    assert temporal_pallas.pick_k(p(2048)) == 8
    assert temporal_pallas.pick_k(p(4096)) == 4
    # 8192^2 now folds to F=4 @2048 lanes (fused_pallas._fold_factor auto
    # policy; measured 14,733 MLUPS skew K=4 vs 4,183 at the old fold-8,
    # same session) so the temporal sweep re-engages at K=4.
    assert temporal_pallas.pick_k(p(8192)) == 4
    assert temporal_pallas.pick_k(p(8192), storage="i16") == 4
    # Fold >= 8 still disables temporal blocking entirely (measured
    # collapse: 8192^2 fold-8 skew K=4 154 MLUPS vs single-step 1966).
    assert temporal_pallas.pick_k(p(16384)) == 1
    assert temporal_pallas.pick_k(p(16384), storage="i16") == 1
    # Cached i16 keeps its own table (1024^2 K=4, 768^2 K=2).
    assert temporal_pallas.pick_k(p(1024), storage="i16") == 4
    assert temporal_pallas.pick_k(p(768), storage="i16") == 2
