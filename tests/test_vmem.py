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


def _sq(n):
    return LBMParams(nx=n, ny=n, max_iters=1, reynolds_dim=10,
                     density=0.1, accel=0.01, omega=1.85)


def test_auto_limit_ladder(monkeypatch):
    """The measured raised-limit ladder (resident_pallas.auto_raised_plan):
    48 MiB in-place single-buffer band everywhere it fits (round-4 driver
    A/B: it beat the monolithic band at 512²/768² and runs the 1024²
    flagship at 27.0k MLUPS), the 120 MiB monolithic band as fallback /
    forced alternative, None beyond the ceilings; gated to TPU and to no
    explicit env override."""
    import jax

    from lbm_tpu.ops import resident_pallas

    monkeypatch.delenv("LBM_VMEM_LIMIT_MB", raising=False)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert resident_pallas.auto_limit_mb(_sq(128)) is None  # default covers
    # In-place everywhere it fits since round 4 (driver full-run A/B:
    # 512² 24.8k vs mono 23.3k, 768² 26.6k vs 25.3k); LBM_RESIDENT_KIND
    # forces the monolithic band.
    assert resident_pallas.auto_raised_plan(_sq(512)) == (48, True)
    assert resident_pallas.auto_raised_plan(_sq(768)) == (48, True)
    monkeypatch.setenv("LBM_RESIDENT_KIND", "mono")
    assert resident_pallas.auto_raised_plan(_sq(512)) == (120, False)
    assert resident_pallas.auto_raised_plan(_sq(768)) == (120, False)
    monkeypatch.delenv("LBM_RESIDENT_KIND")
    assert resident_pallas.auto_raised_plan(_sq(1024)) == (48, True)
    assert resident_pallas._pick_inplace_block_rows(1024, 1024, 48) == 32
    # 1280^2-class: too big for 48 MiB but inside the 81 MB ref ceiling.
    assert resident_pallas.auto_raised_plan(_sq(1280)) == (88, True)
    # 1536^2: 94.3 MB of refs crashed the compile helper at 88 — streaming.
    assert resident_pallas.auto_raised_plan(_sq(1536)) is None
    assert resident_pallas.auto_limit_mb(_sq(2048)) is None
    # i16 band (round 4, measured): streams wherever f32 keeps a resident
    # band (1024² i16 in-place 15.2-15.5k LOST to streaming i16 19.9k);
    # in-place where f32 cannot map (1536²: 18.5k @48, 1792²: 19.7k @72 —
    # both the grid bests); None again at 2048² (the i16 kernel crashes
    # the compile helper at every limit >= 80, and 72 MiB of i16 state
    # cannot fit under the 72 MiB band cap).
    assert resident_pallas.auto_raised_plan(_sq(512), "i16") is None
    assert resident_pallas.auto_raised_plan(_sq(1024), "i16") is None
    assert resident_pallas.auto_raised_plan(_sq(1280), "i16") is None
    assert resident_pallas.auto_raised_plan(_sq(1536), "i16") == (48, True)
    assert resident_pallas.auto_raised_plan(_sq(1792), "i16") == (72, True)
    assert resident_pallas.auto_raised_plan(_sq(2048), "i16") is None
    # A non-lane-aligned width never maps the resident kernels.
    assert resident_pallas.auto_limit_mb(_sq(1024).replace(nx=1000)) is None
    # Explicit env override takes precedence (the env drives every kernel).
    monkeypatch.setenv("LBM_VMEM_LIMIT_MB", "64")
    assert resident_pallas.auto_limit_mb(_sq(1024)) is None
    monkeypatch.delenv("LBM_VMEM_LIMIT_MB")
    # CPU backend: interpret would walk the kernel cell-by-cell; keep off.
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert resident_pallas.auto_limit_mb(_sq(1024)) is None


def test_explicit_limit_arg_matches_env(monkeypatch):
    """vmem.scale/compiler_params with an explicit mb behave exactly like
    the env-set path, and the env wins when both are given to limit_mb."""
    monkeypatch.delenv("LBM_VMEM_LIMIT_MB", raising=False)
    assert vmem.limit_mb(88) == 88
    assert vmem.scale(16, 88) == 88
    cp = vmem.compiler_params(88)
    assert cp["compiler_params"].vmem_limit_bytes == 88 * 2**20
    assert not vmem.env_limit_set()
    monkeypatch.setenv("LBM_VMEM_LIMIT_MB", "32")
    assert vmem.env_limit_set()
    assert vmem.limit_mb() == 32


def test_raised_resident_through_driver_planning(monkeypatch):
    """build_single_program prefers the raised-limit resident regime in its
    measured bands on TPU, and --temporal-k opts back into the sweeps."""
    import jax

    from lbm_tpu.parallel import modes

    monkeypatch.delenv("LBM_VMEM_LIMIT_MB", raising=False)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    params = _sq(1024)
    mask = np.zeros((1024, 1024), bool)
    mask[0, :] = mask[-1, :] = True
    # Build only consults planning functions; no kernel compiles here
    # (make_run_all is a lazy hook).
    prog = modes.build_single_program(params, mask, backend="pallas")
    assert prog.variant == "pallas-resident"
    assert prog.make_run_all is not None
    prog_k = modes.build_single_program(
        params, mask, backend="pallas", temporal_k=4
    )
    assert prog_k.variant == "pallas"


def test_raised_resident_hook_one_step(monkeypatch):
    """The 1024² raised band runs the in-place single-buffer kernel, whose
    aliased output is never stack-allocated — unlike the ping-pong blocked
    kernel (length-1 scan inlining OOM'd at 88 MiB), it accepts a 1-step
    advance rather than declining to the per-step kernel."""
    import jax

    from lbm_tpu.parallel import modes

    monkeypatch.delenv("LBM_VMEM_LIMIT_MB", raising=False)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    params = _sq(1024)
    mask = np.zeros((1024, 1024), bool)
    mask[0, :] = mask[-1, :] = True
    prog = modes.build_single_program(params, mask, backend="pallas")
    assert prog.variant == "pallas-resident"
    assert prog.make_run_all(1) is not None  # lazy hook; nothing compiles
    assert prog.make_run_all(2) is not None


def test_driver_falls_back_when_run_all_hook_declines():
    """_make_scan uses the per-step path when make_run_all returns None."""
    from lbm_tpu.models import driver
    from lbm_tpu.parallel import modes

    params = _sq(16)
    mask = np.zeros((16, 16), bool)
    mask[0, :] = mask[-1, :] = True
    prog = modes.build_single_program(params, mask, backend="jnp")
    ref = driver._make_scan(prog, 3, None, False)(prog.init_state)

    declined = modes.build_single_program(params, mask, backend="jnp")
    declined.make_run_all = lambda n: None
    got = driver._make_scan(declined, 3, None, False)(declined.init_state)
    np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(got[0]))
    np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(got[1]))


def test_inplace_resident_matches_blocked_bitwise():
    """The single-buffer in-place kernel (aliased state, carry rows for the
    overwritten block boundaries) is bitwise-identical on fields to the
    ping-pong blocked kernel.  av partials differ by float-sum grouping:
    since round 4 the in-place kernel accumulates a row-reduced lane
    vector per block and lane-reduces once per step (measured 7.5 us/step
    cheaper at 1024² than the per-block scalar reduction), so its av sums
    in a different order than the blocked kernel's per-block scalars."""
    from lbm_tpu.core import lattice
    from lbm_tpu.ops import resident_pallas

    ny, nx = 32, 128
    rng = np.random.default_rng(7)
    mask = np.zeros((ny, nx), bool)
    mask[0, :] = mask[-1, :] = True
    mask[:, 0] = mask[:, -1] = True
    mask[10:14, 40:44] = True
    params = LBMParams(nx=nx, ny=ny, max_iters=13, reynolds_dim=10,
                       density=0.1, accel=0.005, omega=1.85)
    f0 = np.asarray(lattice.equilibrium_rest(params.density, ny, nx))
    f0 = f0 * (1 + 0.01 * rng.random((9, ny, nx), dtype=np.float32))

    # chunk 5 exercises the scan-of-chunks path AND a remainder chunk (13 =
    # 2*5 + 3); B=8 matches force_blocked's block height.
    fb, avb = resident_pallas.make_run_all(
        params, mask, 13, chunk=5, force_blocked=True
    )(f0)
    fi, avi = resident_pallas.make_run_all(
        params, mask, 13, chunk=5, inplace=True, block_rows=8
    )(f0)
    np.testing.assert_array_equal(np.asarray(fi), np.asarray(fb))
    np.testing.assert_allclose(np.asarray(avi), np.asarray(avb), rtol=1e-6)
    # The legacy per-block scalar layout (ablate hook) keeps fields
    # bitwise; av regroups (the blocked kernel also row-reduces since
    # round 4, so neither product path sums per-block scalars anymore).
    fs, avs = resident_pallas.make_run_all(
        params, mask, 13, chunk=5, inplace=True, block_rows=8,
        _ablate="avscalar",
    )(f0)
    np.testing.assert_array_equal(np.asarray(fs), np.asarray(fb))
    np.testing.assert_allclose(np.asarray(avs), np.asarray(avb), rtol=1e-6)

    # A different block height keeps fields bitwise; av reorders (~1 ulp).
    fi16, avi16 = resident_pallas.make_run_all(
        params, mask, 13, chunk=5, inplace=True, block_rows=16
    )(f0)
    np.testing.assert_array_equal(np.asarray(fi16), np.asarray(fb))
    np.testing.assert_allclose(
        np.asarray(avi16), np.asarray(avb), rtol=1e-5
    )


def test_inplace_resident_i16_matches_streaming_i16():
    """The int16 in-place resident kernel shares the streaming i16 block
    kernel's per-step quantization contract: dequantize on read, f32
    stencil math, requantize on store.  On TPU the fields are bitwise
    (tools/verify_device.py probes that); under CPU interpret the two
    compilations differ by ~1 ulp in f32 (CLAUDE.md invariants), which at
    a rounding tie flips an int16 by one unit — so here the contract is
    |diff| <= 1 quantization step on a handful of cells."""
    from lbm_tpu.core import lattice
    from lbm_tpu.ops import fused_pallas, quant, resident_pallas

    ny, nx = 32, 128
    rng = np.random.default_rng(11)
    mask = np.zeros((ny, nx), bool)
    mask[0, :] = mask[-1, :] = True
    mask[12:16, 60:64] = True
    params = LBMParams(nx=nx, ny=ny, max_iters=13, reynolds_dim=10,
                       density=0.1, accel=0.005, omega=1.85)
    f0 = np.asarray(lattice.equilibrium_rest(params.density, ny, nx))
    f0 = f0 * (1 + 0.01 * rng.random((9, ny, nx), dtype=np.float32))
    q0 = quant.quantize(jnp.asarray(f0), float(params.density))

    step = fused_pallas.make_step(params, mask, storage="i16")
    q_ref = q0
    av_ref = []
    for _ in range(4):
        q_ref, tot = step(q_ref)
        av_ref.append(float(tot))

    # 4 steps = one 3-chunk plus a remainder chunk (scan-of-chunks + tail).
    # Longer horizons amplify the interpret-mode rounding-tie flips through
    # the quantization feedback (13 steps reach |diff|=4) — that growth is
    # the interpret noise compounding, not a kernel contract.
    qi, avi = resident_pallas.make_run_all(
        params, mask, 4, chunk=3, inplace=True, block_rows=8, storage="i16"
    )(q0)
    assert np.asarray(qi).dtype == np.int16
    d = np.abs(np.asarray(qi).astype(np.int32)
               - np.asarray(q_ref).astype(np.int32))
    assert d.max() <= 1, f"max int16 diff {d.max()} (> 1 quantization step)"
    assert (d != 0).mean() < 0.01, f"{(d != 0).sum()} cells differ (ties only)"
    # av partials group per block (B rows) vs the streaming kernel's rows,
    # and the tie-flipped cells feed the |u| sums: float-sum reordering
    # plus one quantization step across ~0.3% of cells.
    np.testing.assert_allclose(np.asarray(avi), np.asarray(av_ref), rtol=1e-4)


def test_i16_program_routes_inplace_resident_on_tpu_only():
    """_i16_single_program consults auto_raised_plan(storage='i16'): on the
    CPU backend the plan is None (the ladder is v5e-measured), so the
    program keeps the streaming variant; the make_run_all hook must still
    advance the quantized state correctly."""
    from lbm_tpu.ops import resident_pallas
    from lbm_tpu.parallel import modes

    params = _sq(16)
    mask = np.zeros((16, 16), bool)
    mask[0, :] = mask[-1, :] = True
    # CPU backend: the raised-limit i16 band must not engage.
    assert resident_pallas.auto_raised_plan(params, "i16") is None
