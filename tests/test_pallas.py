"""Pallas kernels (interpret mode on CPU) vs the jnp reference path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lbm_tpu.core import lattice
from lbm_tpu.io import load_scene
from lbm_tpu.ops import fused_jnp, fused_pallas, resident_pallas
from lbm_tpu.params import LBMParams
from tests.conftest import requires_reference


@pytest.fixture(scope="module")
def scene128():
    # A lane-aligned scene (the pallas kernels require nx % 128 == 0).
    params = LBMParams(
        nx=128, ny=32, max_iters=10, reynolds_dim=10,
        density=0.1, accel=0.005, omega=1.85,
    )
    mask = np.zeros((params.ny, params.nx), dtype=bool)
    mask[0, :] = mask[-1, :] = True
    mask[:, 0] = mask[:, -1] = True
    mask[10:12, 40:44] = True
    return params, mask


def _run_jnp(params, mask, steps):
    step = fused_jnp.make_single_step(params, mask)
    f = jnp.asarray(lattice.equilibrium_rest(params.density, params.ny, params.nx))
    tots = []
    for _ in range(steps):
        f, tu = step(f)
        tots.append(float(tu))
    return np.asarray(f), np.asarray(tots, np.float32)


def test_supports():
    good = LBMParams(nx=256, ny=64, max_iters=1, reynolds_dim=10,
                     density=0.1, accel=0.005, omega=1.85)
    bad = LBMParams(nx=100, ny=64, max_iters=1, reynolds_dim=10,
                    density=0.1, accel=0.005, omega=1.85)
    assert fused_pallas.supports(good)
    assert not fused_pallas.supports(bad)
    assert resident_pallas.supports(good)
    big = LBMParams(nx=1024, ny=1024, max_iters=1, reynolds_dim=10,
                    density=0.1, accel=0.01, omega=1.85)
    assert fused_pallas.supports(big)
    assert not resident_pallas.supports(big)  # 75 MB state exceeds VMEM


def test_block_kernel_matches_jnp(scene128):
    params, mask = scene128
    f_j, tot_j = _run_jnp(params, mask, 6)
    step = jax.jit(fused_pallas.make_step(params, mask, interpret=True))
    f = jnp.asarray(lattice.equilibrium_rest(params.density, params.ny, params.nx))
    tots = []
    for _ in range(6):
        f, tu = step(f)
        tots.append(float(tu))
    np.testing.assert_array_equal(np.asarray(f), f_j)
    np.testing.assert_allclose(np.asarray(tots, np.float32), tot_j, rtol=1e-6)


def test_block_kernel_multiblock(scene128, monkeypatch):
    """Force several row blocks so inter-block ghost rows are exercised."""
    params, mask = scene128
    monkeypatch.setattr(fused_pallas, "_VMEM_BUDGET", 512 * 1024)
    assert fused_pallas.pick_block_rows(params.ny, params.nx) < params.ny
    f_j, _ = _run_jnp(params, mask, 5)
    step = jax.jit(fused_pallas.make_step(params, mask, interpret=True))
    f = jnp.asarray(lattice.equilibrium_rest(params.density, params.ny, params.nx))
    for _ in range(5):
        f, _ = step(f)
    # Interpret mode on CPU compiles each block shape separately, so XLA's
    # FMA contraction may differ by 1 ulp from the full-grid jnp step (on
    # real TPU the block kernel matches the jnp step bitwise).
    np.testing.assert_allclose(np.asarray(f), f_j, atol=5e-8)


@pytest.mark.parametrize("steps,chunk", [(7, 4), (8, 4), (5, 8), (6, 6)])
def test_resident_kernel_matches_jnp(scene128, steps, chunk):
    """Odd/even chunks and remainders all land in the right buffer."""
    params, mask = scene128
    f_j, tot_j = _run_jnp(params, mask, steps)
    run = jax.jit(resident_pallas.make_run_all(params, mask, steps, chunk=chunk,
                                               interpret=True))
    f0 = jnp.asarray(lattice.equilibrium_rest(params.density, params.ny, params.nx))
    f, tots = run(f0)
    assert tots.shape == (steps,)
    np.testing.assert_array_equal(np.asarray(f), f_j)
    np.testing.assert_allclose(np.asarray(tots), tot_j, rtol=1e-6)


@pytest.mark.parametrize("av_mode", ["rows", "vector"])
def test_resident_av_modes_match_scalar(scene128, av_mode):
    """The monolithic kernel's av reduction variants (VERDICT r4 #3):
    fields bitwise-identical to the 'scalar' mode (only the |u| reduction
    grouping moves), av within float-reorder tolerance."""
    params, mask = scene128
    f0 = jnp.asarray(lattice.equilibrium_rest(params.density, params.ny, params.nx))
    runs = {
        m: jax.jit(resident_pallas.make_run_all(
            params, mask, 6, chunk=3, interpret=True, av_mode=m
        ))
        for m in ("scalar", av_mode)
    }
    f_s, tot_s = runs["scalar"](f0)
    f_m, tot_m = runs[av_mode](f0)
    assert tot_m.shape == (6,)
    np.testing.assert_array_equal(np.asarray(f_m), np.asarray(f_s))
    np.testing.assert_allclose(np.asarray(tot_m), np.asarray(tot_s), rtol=1e-6)


def test_auto_av_mode_policy():
    """Mono-band grids ride the measured 'vector' av layout; the fallback
    to 'scalar' engages only when the (chunk, nx) av buffer would eat the
    calibrated _fits slack (modeled as chunk extra mask rows)."""
    from lbm_tpu.parallel import modes
    from lbm_tpu.params import LBMParams

    assert resident_pallas.auto_av_mode(128, 128) == "vector"
    assert resident_pallas.auto_av_mode(256, 256) == "vector"
    # At the mono budget edge (128x1024 = exactly the calibrated budget)
    # the (chunk, nx) av buffer no longer fits the slack.
    assert resident_pallas._fits(128, 1024, 128)
    assert resident_pallas.auto_av_mode(128, 1024) == "scalar"
    # The driver's mono-resident program carries the policy into its
    # whole-run hook (build succeeds and stays on the resident variant).
    params = LBMParams(nx=128, ny=128, max_iters=4, reynolds_dim=10,
                       density=0.1, accel=0.005, omega=1.85)
    import numpy as np

    mask = np.zeros((128, 128), bool)
    mask[0] = mask[-1] = True
    prog = modes.build_single_program(params, mask, backend="pallas")
    assert prog.variant == "pallas-resident"
    assert prog.make_run_all(4) is not None


@pytest.mark.parametrize("storage", ["f32", "i16"])
def test_inplace_vector_av_matches_default(scene128, storage):
    """The in-place kernel's round-5 'vector' av option (lane reduce moved
    outside the kernel): fields BITWISE vs the default rows layout; av
    within the documented ~1-ulp float-sum grouping contract (the outside
    XLA lane reduce may associate differently than the in-kernel one).  A
    measured perf negative at the 1024² flagship (BENCHMARKS Rooflines)
    but kept as a tested option."""
    params, mask = scene128
    f0 = jnp.asarray(
        lattice.equilibrium_rest(params.density, params.ny, params.nx)
    )
    if storage == "i16":
        from lbm_tpu.ops import quant

        f0 = quant.quantize(f0, params.density)
    runs = [
        jax.jit(resident_pallas.make_run_all(
            params, mask, 6, chunk=3, interpret=True, inplace=True,
            limit_mb=48, storage=storage, av_mode=m,
        ))
        for m in ("rows", "vector")
    ]
    f_r, tot_r = runs[0](f0)
    f_v, tot_v = runs[1](f0)
    np.testing.assert_array_equal(np.asarray(f_v), np.asarray(f_r))
    np.testing.assert_allclose(
        np.asarray(tot_v), np.asarray(tot_r), rtol=3e-6
    )


@pytest.mark.parametrize("steps,chunk", [(5, 4), (6, 3)])
def test_blocked_resident_matches_jnp(scene128, steps, chunk):
    """The block-tiled resident step (big grids under a raised VMEM limit):
    window selection + accel-row substitution + per-block partials must
    reproduce the jnp step.  Forced here on a small grid (128x128, B=8 ->
    16 blocks) so wrap windows and the driven row's window substitution are
    all exercised; fields bitwise (same op order per cell), av within
    float-reorder tolerance (block partials sum in block order)."""
    params, mask = scene128
    f_j, tot_j = _run_jnp(params, mask, steps)
    run = jax.jit(resident_pallas.make_run_all(
        params, mask, steps, chunk=chunk, interpret=True, force_blocked=True
    ))
    f0 = jnp.asarray(lattice.equilibrium_rest(params.density, params.ny, params.nx))
    f, tots = run(f0)
    assert tots.shape == (steps,)
    np.testing.assert_allclose(np.asarray(f), f_j, atol=5e-8)
    np.testing.assert_allclose(np.asarray(tots), tot_j, rtol=1e-5)


def test_blocked_resident_supports_requires_raised_limit(monkeypatch):
    # 512^2 (28 MB 3x-state) exceeds the default budget; with a raised
    # scoped-VMEM limit the blocked regime takes it.
    big = LBMParams(nx=512, ny=512, max_iters=1, reynolds_dim=10,
                    density=0.1, accel=0.01, omega=1.85)
    monkeypatch.delenv("LBM_VMEM_LIMIT_MB", raising=False)
    assert not resident_pallas.supports(big)
    monkeypatch.setenv("LBM_VMEM_LIMIT_MB", "64")
    assert resident_pallas.supports(big)
    assert resident_pallas._pick_block_rows(512, 512) % 8 == 0
    # 1024^2 needs ~80 MB of state: still rejected at 64M, mapped at 120M.
    big2 = LBMParams(nx=1024, ny=1024, max_iters=1, reynolds_dim=10,
                     density=0.1, accel=0.01, omega=1.85)
    assert not resident_pallas.supports(big2)
    monkeypatch.setenv("LBM_VMEM_LIMIT_MB", "120")
    assert resident_pallas.supports(big2)


def test_resident_through_driver(scene128):
    from lbm_tpu.io.scene import Scene
    from lbm_tpu.models import RunConfig, run_simulation

    params, mask = scene128
    scene = Scene(params=params.replace(max_iters=9), obstacles=mask)
    res_j = run_simulation(scene, RunConfig(variant="jnp"))
    res_p = run_simulation(scene, RunConfig(variant="pallas"))
    assert res_p.variant == "pallas-resident"
    np.testing.assert_array_equal(res_p.f, res_j.f)
    np.testing.assert_allclose(res_p.av_vels, res_j.av_vels, rtol=1e-5)


@requires_reference
def test_pallas_golden_prefix():
    sc = load_scene(
        "/root/reference/dataSet/input_128x128.params",
        "/root/reference/dataSet/obstacles_128x128.dat",
    )
    run = jax.jit(
        resident_pallas.make_run_all(sc.params, sc.obstacles, 60, chunk=30,
                                     interpret=True)
    )
    f0 = jnp.asarray(
        lattice.equilibrium_rest(sc.params.density, sc.params.ny, sc.params.nx)
    )
    _, tots = run(f0)
    av = np.asarray(tots) / np.float32(sc.num_fluid_cells)
    gold = np.loadtxt("/root/reference/check/128x128.av_vels.dat", usecols=[1])[:60]
    rel = 100 * np.abs((gold - av) / av)
    assert rel.max() < 0.1


def test_wide_grid_fallback():
    """Grids too wide for any aligned block reject cleanly, and the auto
    policy falls back to jnp instead of crashing."""
    from lbm_tpu.io.scene import Scene
    from lbm_tpu.models.driver import RunConfig, _pick_variant

    # 128-aligned but not 1024-foldable and too wide for an aligned block:
    # neither the block kernel nor the resident kernel can map it.
    wide = LBMParams(nx=128 * 127, ny=16, max_iters=1, reynolds_dim=10,
                     density=0.1, accel=0.005, omega=1.85)
    assert not fused_pallas.supports(wide)
    with pytest.raises(ValueError, match="VMEM"):
        fused_pallas.pick_block_rows(wide.ny, wide.nx)
    sc = Scene(params=wide, obstacles=np.zeros((wide.ny, wide.nx), dtype=bool))
    assert _pick_variant(sc, RunConfig(num_devices=1)) == "jnp"


def test_folded_wide_grid_matches_jnp():
    """Widths that are multiples of 1024 run FOLDED (state stored as
    (9, ny*F, 1024)); results match the jnp step on the original grid."""
    from lbm_tpu.parallel import modes

    # ny large enough that the resident kernel cannot take over: the
    # pallas-folded program (folded state storage) must be selected.
    params = LBMParams(nx=2048, ny=128, max_iters=6, reynolds_dim=10,
                       density=0.1, accel=0.005, omega=1.85)
    assert fused_pallas._fold_factor(params.nx) == 2
    assert fused_pallas.supports(params)
    mask = np.zeros((128, 2048), dtype=bool)
    mask[0, :] = mask[-1, :] = True
    mask[4:6, 100:104] = True
    mask[5, 2000:2010] = True  # asymmetry across the fold boundary

    pj = modes.build_single_program(params, mask, backend="jnp")
    pp = modes.build_single_program(params, mask, backend="pallas")
    assert pp.variant == "pallas-folded"
    sj, sp = pj.init_state, pp.init_state
    stj, stp = jax.jit(pj.step), jax.jit(pp.step)
    for _ in range(6):
        sj, tj = stj(sj)
        sp, tp = stp(sp)
    fj = np.asarray(pj.f_of(sj))
    fp = np.asarray(pp.f_of(sp))
    assert fp.shape == fj.shape
    np.testing.assert_allclose(fp, fj, atol=5e-8)
    np.testing.assert_allclose(float(tp), float(tj), rtol=1e-5)


def test_fold3_wide_grid_matches_jnp():
    """Non-power-of-2 fold (nx=3072 -> F=3): pick_block_rows must return a
    multiple of lcm(8, 3) = 24 so every block (and its fold-row ghosts)
    starts at a fold-group boundary — _group_roll phases iota%F from the
    piece start, and a misaligned B silently borrows the periodic x-wrap
    lane from the wrong fold-group row."""
    from lbm_tpu.parallel import modes

    params = LBMParams(nx=3072, ny=128, max_iters=4, reynolds_dim=10,
                       density=0.1, accel=0.005, omega=1.85)
    assert fused_pallas._fold_factor(params.nx) == 3
    assert fused_pallas.pick_block_rows(128 * 3, 1024, fold=3) % 24 == 0
    mask = np.zeros((128, 3072), dtype=bool)
    mask[0, :] = mask[-1, :] = True
    mask[4:6, 100:104] = True
    mask[5, 3000:3010] = True  # asymmetry across the fold boundary

    pj = modes.build_single_program(params, mask, backend="jnp")
    pp = modes.build_single_program(params, mask, backend="pallas")
    assert pp.variant == "pallas-folded"
    sj, sp = pj.init_state, pp.init_state
    stj, stp = jax.jit(pj.step), jax.jit(pp.step)
    for _ in range(4):
        sj, tj = stj(sj)
        sp, tp = stp(sp)
    fj = np.asarray(pj.f_of(sj))
    fp = np.asarray(pp.f_of(sp))
    assert fp.shape == fj.shape
    np.testing.assert_allclose(fp, fj, atol=5e-8)
    np.testing.assert_allclose(float(tp), float(tj), rtol=1e-5)


def test_fold_width_auto_policy():
    """The fold auto-policy prefers the narrowest width whose factor is
    <= 4 (8192 -> F=4 @2048 lanes: 14,733 MLUPS vs 4,183 at fold-8, same
    session — BENCHMARKS.md), falling back to the width minimizing the
    factor (16384 -> F=8 @2048)."""
    assert fused_pallas._fold_factor(4096) == 4   # width 1024, unchanged
    assert fused_pallas._fold_factor(8192) == 4   # width 2048
    assert fused_pallas._fold_factor(6144) == 3   # width 2048 (1024 -> F=6)
    assert fused_pallas._fold_factor(16384) == 8  # min-factor fallback


def test_fold_width_override_matches_jnp(monkeypatch):
    """LBM_FOLD_W overrides the fold lane width for layout experiments
    (e.g. probing fold-4 at 8192^2 instead of the collapsing fold-8,
    BENCHMARKS.md).  nx=2048 with LBM_FOLD_W=512 -> F=4 at 512 lanes;
    fields must still match the jnp step."""
    from lbm_tpu.parallel import modes

    monkeypatch.setenv("LBM_FOLD_W", "512")
    params = LBMParams(nx=2048, ny=32, max_iters=4, reynolds_dim=10,
                       density=0.1, accel=0.005, omega=1.85)
    assert fused_pallas._fold_factor(params.nx) == 4
    mask = np.zeros((32, 2048), dtype=bool)
    mask[0, :] = mask[-1, :] = True
    mask[4:6, 100:104] = True
    mask[7, 2000:2010] = True  # asymmetry across fold boundaries

    pj = modes.build_single_program(params, mask, backend="jnp")
    pp = modes.build_single_program(params, mask, backend="pallas")
    sj, sp = pj.init_state, pp.init_state
    stj, stp = jax.jit(pj.step), jax.jit(pp.step)
    for _ in range(4):
        sj, tj = stj(sj)
        sp, tp = stp(sp)
    np.testing.assert_allclose(np.asarray(pp.f_of(sp)),
                               np.asarray(pj.f_of(sj)), atol=5e-8)
    np.testing.assert_allclose(float(tp), float(tj), rtol=1e-5)


def test_footprint_model_monotone():
    """Block picks respect the calibrated VMEM boundary (nx=1024 -> B=64,
    nx=2048 -> B<=16, nx=4096 -> B=8), matching measured compile limits."""
    assert fused_pallas.pick_block_rows(1024, 1024) == 64
    assert fused_pallas.pick_block_rows(2048, 2048) <= 16
    assert fused_pallas.pick_block_rows(4096, 4096) == 8


class TestLanePadding:
    """VERDICT r1 #10: grids with nx % 128 != 0 run on the Pallas path via
    transparent lane padding (blocked pad columns; the two outermost are
    live clones of the wrapped edge columns, refreshed each step and
    encoded 0.5 so they take the driven-row injection without entering
    tot_u)."""

    def _params(self, ny=100, nx=100, iters=30):
        from lbm_tpu.params import LBMParams

        return LBMParams(nx=nx, ny=ny, max_iters=iters, reynolds_dim=10,
                         density=0.1, accel=0.005, omega=1.85)

    @pytest.mark.parametrize("walled_x", [True, False])
    def test_single_device_matches_jnp(self, walled_x):
        from lbm_tpu.parallel import modes

        params = self._params()
        mask = np.zeros((100, 100), dtype=bool)
        mask[0, :] = mask[-1, :] = True
        if walled_x:
            mask[:, 0] = mask[:, -1] = True
        pj = modes.build_single_program(params, mask, backend="jnp")
        pp = modes.build_single_program(params, mask, backend="pallas")
        assert pp.variant == "pallas-lanepad"
        sj, sp = pj.init_state, pp.init_state
        stj, stp = jax.jit(pj.step), jax.jit(pp.step)
        for _ in range(30):
            sj, tj = stj(sj)
            sp, tp = stp(sp)
        fj = np.asarray(pj.f_of(sj))
        fp = np.asarray(pp.f_of(sp))
        assert fp.shape == (9, 100, 100)
        np.testing.assert_allclose(fp, fj, atol=5e-8)
        np.testing.assert_allclose(float(tp), float(tj), rtol=1e-5)

    @pytest.mark.parametrize("mode", ["sync", "overlap", "async"])
    def test_sharded_matches_jnp_backend(self, mode):
        from lbm_tpu.parallel import mesh as mesh_lib
        from lbm_tpu.parallel import modes

        params = self._params()
        mask = np.zeros((100, 100), dtype=bool)
        mask[0, :] = mask[-1, :] = True  # open x seam
        mesh2 = mesh_lib.make_row_mesh(2)
        pj = modes.build_sharded_program(params, mask, mesh2, mode=mode, backend="jnp")
        pp = modes.build_sharded_program(params, mask, mesh2, mode=mode, backend="pallas")
        sj, sp = pj.init_state, pp.init_state
        stj, stp = jax.jit(pj.step), jax.jit(pp.step)
        for _ in range(10):
            sj, _ = stj(sj)
            sp, _ = stp(sp)
        fj = np.asarray(pj.f_of(sj))
        fp = np.asarray(pp.f_of(sp))
        assert fp.shape == (9, 100, 100)
        np.testing.assert_allclose(fp, fj, atol=5e-8)

    def test_auto_picks_pallas_for_unaligned_width(self):
        from lbm_tpu.io.scene import Scene
        from lbm_tpu.models.driver import RunConfig, _pick_variant

        params = self._params()
        mask = np.zeros((100, 100), dtype=bool)
        scene = Scene(params=params, obstacles=mask)
        cfg = RunConfig(variant="auto", num_devices=1)
        assert _pick_variant(scene, cfg) == "pallas"
