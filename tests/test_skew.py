"""Skewed temporal kernel (ops/skew_pallas.py) vs the jnp path.

The forward/reverse pair must be exactly 2K single steps: on TPU bitwise on
fields, in CPU interpret mode within the few-ulp atol the other kernel
comparisons use (tests/test_pallas.py).  The multi-block carry chain is the
heart of the schedule, so most cases force a small block height.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from lbm_tpu.core import lattice
from lbm_tpu.ops import fused_jnp, skew_pallas
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
    obst = jnp.asarray(mask)
    f = jnp.asarray(lattice.equilibrium_rest(params.density, params.ny, params.nx))
    tots = []
    for _ in range(steps):
        f, tu = fused_jnp.fused_step_single(f, obst, params)
        tots.append(float(tu))
    return np.asarray(f), np.asarray(tots, np.float32)


@pytest.mark.parametrize(
    "K,B,ny", [(2, 8, 32), (3, 8, 32), (4, 8, 32), (4, 16, 64), (8, 8, 64)]
)
def test_pair_matches_jnp_multiblock(K, B, ny):
    params, mask = _scene(ny, 128, seed=K + B)
    steps = 2 * K
    f_j, tot_j = _run_jnp(params, mask, steps)
    run = skew_pallas.make_run_all(params, mask, steps, K, block_rows=B)
    f0 = jnp.asarray(lattice.equilibrium_rest(params.density, ny, 128))
    f_t, tots = run(f0)
    np.testing.assert_allclose(np.asarray(f_t), f_j, atol=5e-7)
    np.testing.assert_allclose(np.asarray(tots, np.float32), tot_j, rtol=1e-4)


def test_single_block_grid():
    # nb=1: every carry substitutes the seam strip on both sweeps.
    params, mask = _scene(32, 128, seed=5)
    f_j, tot_j = _run_jnp(params, mask, 8)
    run = skew_pallas.make_run_all(params, mask, 8, K=4)
    f0 = jnp.asarray(lattice.equilibrium_rest(params.density, 32, 128))
    f_t, tots = run(f0)
    np.testing.assert_allclose(np.asarray(f_t), f_j, atol=5e-7)
    np.testing.assert_allclose(np.asarray(tots, np.float32), tot_j, rtol=1e-4)


def test_multiple_pairs_and_remainder_tail():
    # 21 steps at K=2: 5 pairs of 4 + a single-step tail of 1.
    params, mask = _scene(32, 128, seed=7)
    f_j, tot_j = _run_jnp(params, mask, 21)
    run = skew_pallas.make_run_all(params, mask, 21, K=2, block_rows=8)
    f0 = jnp.asarray(lattice.equilibrium_rest(params.density, 32, 128))
    f_t, tots = run(f0)
    assert tots.shape == (21,)
    np.testing.assert_allclose(np.asarray(f_t), f_j, atol=2e-6)
    np.testing.assert_allclose(np.asarray(tots, np.float32), tot_j, rtol=1e-4)


def test_accel_row_inside_wrap_regions():
    # ny=16, K=4: the driven row (14) sits inside the forward seam strip
    # (last 8 rows), the reverse strip's wrapped range, AND the rotated
    # coordinates differ — exercises the three-offset accel masks.
    params, mask = _scene(16, 128, seed=3)
    f_j, tot_j = _run_jnp(params, mask, 8)
    run = skew_pallas.make_run_all(params, mask, 8, K=4, block_rows=8)
    f0 = jnp.asarray(lattice.equilibrium_rest(params.density, 16, 128))
    f_t, tots = run(f0)
    np.testing.assert_allclose(np.asarray(f_t), f_j, atol=5e-7)
    np.testing.assert_allclose(np.asarray(tots, np.float32), tot_j, rtol=1e-4)


def test_folded_wide_grid():
    params, mask = _scene(16, 2048, seed=5)
    f_j, _ = _run_jnp(params, mask, 8)
    run = skew_pallas.make_run_all(
        params, mask, 8, K=2, folded_io=True, block_rows=8
    )
    f0 = lattice.equilibrium_rest(params.density, 16, 2048)
    f0 = jnp.asarray(np.asarray(f0, np.float32).reshape(9, 32, 1024))
    f_t, _ = run(f0)
    np.testing.assert_allclose(
        np.asarray(f_t).reshape(9, 16, 2048), f_j, atol=5e-7
    )


def test_fold3_wide_grid():
    # Non-power-of-2 fold (nx=3072 -> F=3): blocks must start at fold-group
    # boundaries (B % F == 0) or _group_roll's iota%F phase borrows the
    # periodic x-wrap lane from the wrong fold-group row.  _plan must pick a
    # lcm(8,3)=24-aligned B; forced to 24 here for a 2-block carry chain.
    params, mask = _scene(16, 3072, seed=11)
    assert skew_pallas._plan(16, 3072, 2)[3] % 3 == 0
    f_j, _ = _run_jnp(params, mask, 4)
    run = skew_pallas.make_run_all(
        params, mask, 4, K=2, folded_io=True, block_rows=24
    )
    f0 = lattice.equilibrium_rest(params.density, 16, 3072)
    f0 = jnp.asarray(np.asarray(f0, np.float32).reshape(9, 48, 1024))
    f_t, _ = run(f0)
    np.testing.assert_allclose(
        np.asarray(f_t).reshape(9, 16, 3072), f_j, atol=5e-7
    )


def test_forced_block_rows_must_be_fold_aligned():
    params, mask = _scene(16, 3072, seed=11)
    with pytest.raises(ValueError, match="24-alignment"):
        skew_pallas.make_pair(
            params, mask, K=2, folded_io=True, block_rows=8
        )


def test_i16_storage_stays_inside_quant_tolerance():
    from lbm_tpu.ops import quant

    params, mask = _scene(32, 128, seed=9)
    f_j, _ = _run_jnp(params, mask, 8)
    run = skew_pallas.make_run_all(
        params, mask, 8, K=2, storage="i16", block_rows=8
    )
    f0 = jnp.asarray(lattice.equilibrium_rest(params.density, 32, 128))
    f_t, tots = run(quant.quantize(f0, params.density))
    f_t = np.asarray(quant.dequantize(jnp.asarray(f_t), params.density))
    np.testing.assert_allclose(f_t, f_j, atol=2e-5)
    assert np.all(np.isfinite(np.asarray(tots)))


def test_supports_guards():
    params, _ = _scene(32, 128, seed=0)
    assert skew_pallas.supports(params, 2)
    assert skew_pallas.supports(params, 4)
    assert not skew_pallas.supports(params, 1)  # K<2 is not temporal
    bad_nx = params.replace(nx=100)
    assert not skew_pallas.supports(bad_nx, 2)
    tiny = params.replace(ny=4)  # ny < 2K: no seam strip fits
    assert not skew_pallas.supports(tiny, 4)


def test_folded_width_requires_folded_io():
    params, mask = _scene(16, 2048, seed=5)
    with pytest.raises(ValueError, match="folded_io=True"):
        skew_pallas.make_pair(params, mask, K=2, folded_io=False)


def test_impl_choice_policy(monkeypatch):
    from lbm_tpu.ops import temporal_pallas
    from lbm_tpu.parallel import modes

    params, _ = _scene(32, 128, seed=0)
    # auto prefers the skewed pair (it won or tied the trapezoid at every
    # measured grid, BENCHMARKS.md round 3), unless forced
    assert modes.temporal_impl_choice(params, 2) == "skew"
    monkeypatch.setenv("LBM_TEMPORAL_IMPL", "skew")
    assert modes.temporal_impl_choice(params, 2) == "skew"
    monkeypatch.setenv("LBM_TEMPORAL_IMPL", "trapezoid")
    assert modes.temporal_impl_choice(params, 2) == "trapezoid"
    monkeypatch.delenv("LBM_TEMPORAL_IMPL")
    # the pair also maps where the trapezoid cannot: its VMEM floor scales
    # with nx*K (minimum block = the K*F-row ghost group), which forbids
    # f32 K=8 at 4096^2.  Pure planning arithmetic, nothing is compiled.
    wide = params.replace(nx=4096, ny=4096)
    assert not temporal_pallas.supports(wide, 8)
    assert skew_pallas.supports(wide, 8)
    assert modes.temporal_impl_choice(wide, 8) == "skew"
    # a trapezoid-only config falls back: K=16 i16 at 4096^2 maps the pair
    # only under i16's halved buffers; under f32 neither maps.
    assert modes.temporal_impl_choice(wide, 16, storage="i16") == "skew"
    assert modes.temporal_impl_choice(wide, 16, storage="f32") is None
    # i16 below ~256 MiB working set prefers the trapezoid (1024^2 K=4:
    # 16.4k vs the pair's 15.0k same-session; 2048^2 K=8: 19.2k vs 16.1k),
    # and flips back to the pair at DRAM scale (4096^2 i16: 17.2k vs 16.4k).
    mid = params.replace(nx=1024, ny=1024)
    assert modes.temporal_impl_choice(mid, 4, storage="i16") == "trapezoid"
    assert modes.temporal_impl_choice(mid, 4, storage="f32") == "skew"
    big = params.replace(nx=2048, ny=2048)
    assert modes.temporal_impl_choice(big, 8, storage="i16") == "trapezoid"
    assert modes.temporal_impl_choice(wide, 8, storage="i16") == "skew"


def test_driver_skew_path_matches_per_step(monkeypatch):
    # End-to-end through run_simulation: grid too big for the resident
    # kernel so make_run_all is the temporal hook; forced skew impl must
    # match the per-step kernel path.
    from lbm_tpu.io.scene import Scene
    from lbm_tpu.models.driver import RunConfig, run_simulation

    params, mask = _scene(256, 1024, seed=11)
    params = params.replace(max_iters=8)
    scene = Scene(params=params, obstacles=mask)
    monkeypatch.setenv("LBM_TEMPORAL_IMPL", "skew")
    res_s = run_simulation(scene, RunConfig(variant="pallas", temporal_k=2))
    monkeypatch.delenv("LBM_TEMPORAL_IMPL")
    res_1 = run_simulation(scene, RunConfig(variant="pallas", temporal_k=1))
    np.testing.assert_allclose(res_s.f, res_1.f, atol=5e-7)
    np.testing.assert_allclose(res_s.av_vels, res_1.av_vels, rtol=1e-4)


def test_skew_segmented_execution_matches_whole(monkeypatch):
    # Segment boundaries at pair multiples keep the identical op sequence.
    from lbm_tpu.io.scene import Scene
    from lbm_tpu.models.driver import RunConfig, run_simulation

    params, mask = _scene(256, 1024, seed=17)
    params = params.replace(max_iters=16)
    scene = Scene(params=params, obstacles=mask)
    monkeypatch.setenv("LBM_TEMPORAL_IMPL", "skew")
    whole = run_simulation(
        scene, RunConfig(variant="pallas", temporal_k=2, segment_steps=0)
    )
    seg = run_simulation(
        scene, RunConfig(variant="pallas", temporal_k=2, segment_steps=8)
    )
    np.testing.assert_array_equal(seg.f, whole.f)
    np.testing.assert_array_equal(seg.av_vels, whole.av_vels)
