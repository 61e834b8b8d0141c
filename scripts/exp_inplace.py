"""Tune the in-place single-buffer resident kernel on the real device.

Round-4 questions (VERDICT r3 items 2 and 3):

1. **Flagship headroom** — 1024² in-place B=32 @48 MiB runs ~41.8 µs/step
   (25.1k MLUPS) against a ~28 µs inferred pure-VPU floor.  Sweep B past the
   verified 8..40 window (the 1× footprint leaves room the ping-pong kernel
   never had) and mask dtype (i8 vs f32) to find where the curve actually
   peaks, and whether per-block overhead (carry rows, window concats, av
   partial stores) is the missing ~14 µs.
2. **Sub-flagship bands** — 512²/768² currently route to the 120 MiB
   monolithic band on ~2x-degraded round-3 data.  Measure in-place @48 MiB
   (lower limits measured FASTER at 1024²) head-to-head with the monolithic
   kernel on a healthy session.

Timing per BENCHMARKS.md: materialize (np.asarray / float()) to sync —
jax.block_until_ready lies under the axon tunnel — and best-of-N.

Usage: python scripts/exp_inplace.py [bsweep|bands|i16 ...]
Env:   LBM_INP_STEPS (default 2000), LBM_INP_REPS (default 3),
       LBM_INP_BS (comma list for bsweep), LBM_INP_GRIDS (for bands)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _scene(n, steps):
    from lbm_tpu.params import LBMParams

    params = LBMParams(
        nx=n, ny=n, max_iters=steps, reynolds_dim=10,
        density=0.1, accel=0.01, omega=1.85,
    )
    mask = np.zeros((n, n), dtype=bool)
    mask[0, :] = mask[-1, :] = True
    mask[:, 0] = mask[:, -1] = True
    return params, mask


def _time_run(run, f0, n, steps, reps):
    t0 = time.perf_counter()
    _, tot = run(f0)
    float(np.asarray(tot)[-1])
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _, tot = run(f0)
        float(np.asarray(tot)[-1])
        best = min(best, time.perf_counter() - t0)
    return n * n * steps / best / 1e6, best, compile_s


def _run_case(n, steps, reps, mb, *, inplace=True, block_rows=None,
              storage="f32", tag="", ablate=""):
    import jax.numpy as jnp

    from lbm_tpu.core import lattice
    from lbm_tpu.models.driver import _HoistedJit
    from lbm_tpu.ops import quant, resident_pallas

    params, mask = _scene(n, steps)
    f0 = jnp.asarray(lattice.equilibrium_rest(params.density, n, n))
    if storage == "i16":
        f0 = quant.quantize(f0, float(params.density))
    try:
        run = _HoistedJit(
            resident_pallas.make_run_all(
                params, mask, steps, limit_mb=mb, inplace=inplace,
                block_rows=block_rows, storage=storage, _ablate=ablate,
            ),
            donate=False,
        )
        mlups, best, compile_s = _time_run(run, f0, n, steps, reps)
    except Exception as e:
        print(f"{tag}: FAIL {type(e).__name__}: "
              f"{str(e).splitlines()[0][:160]}", flush=True)
        return None
    us = best / steps * 1e6
    print(f"{tag}: {mlups:8.0f} MLUPS ({us:.1f} us/step, "
          f"compile {compile_s:.0f} s)", flush=True)
    return mlups


def probe_bsweep(steps, reps):
    """1024² in-place block-height sweep past the 40-row cap, both limits."""
    bs = [int(b) for b in os.environ.get(
        "LBM_INP_BS", "16,32,64,128,256,512").split(",")]
    n = 1024
    for mb in (48, 88):
        for b in bs:
            if n % b:
                continue
            _run_case(n, steps, reps, mb, block_rows=b,
                      tag=f"inplace {n}^2 B={b} limit={mb}M")


def probe_bands(steps, reps):
    """512²/768²: in-place @48 vs the monolithic @120 routing."""
    grids = [int(g) for g in os.environ.get(
        "LBM_INP_GRIDS", "512,768").split(",")]
    for n in grids:
        _run_case(n, steps, reps, 120, inplace=False,
                  tag=f"mono     {n}^2 limit=120M")
        for b in (None, 32, 64):
            btag = "auto" if b is None else b
            _run_case(n, steps, reps, 48, block_rows=b,
                      tag=f"inplace  {n}^2 B={btag} limit=48M")


def probe_i16(steps, reps):
    """i16 in-place at its auto-plan bands (1024/1536/2048) plus a B sweep
    at the flagship for the codec-overhead picture."""
    for n, mb in ((1024, 48), (1536, 48), (2048, 88)):
        _run_case(n, steps, reps, mb, storage="i16",
                  tag=f"i16-inp  {n}^2 B=auto limit={mb}M")
    for b in (32, 64, 128):
        _run_case(1024, steps, reps, 48, storage="i16", block_rows=b,
                  tag=f"i16-inp  1024^2 B={b} limit=48M")


def probe_ablate(steps, reps):
    """Per-phase accounting of the flagship in-place kernel (VERDICT r3 #2):
    surgically remove one cost at a time from the REAL kernel.  Ablated
    kernels compute WRONG fields — timing only."""
    n, mb = 1024, 48
    b = int(os.environ.get("LBM_INP_ABL_B", "32"))
    abls = os.environ.get(
        "LBM_INP_ABLS",
        ",;noav;nocarry;norot;nostream;nostream,noav,nocarry;avscalar",
    ).split(";")
    for abl in abls:
        abl = abl.strip().strip(",")
        _run_case(n, steps, reps, mb, block_rows=b, ablate=abl,
                  tag=f"ablate   {n}^2 B={b} [{abl or 'baseline'}]")


def probe_smallgrid(steps, reps):
    """The 512² dip (VERDICT r3 #3): per-cell rate curve across the
    monolithic band, mono limit variants, and the in-place kernel."""
    for n in (256, 384, 512, 640, 768):
        if (3 * 9 * n + n) * n * 4 <= 66 * 2**20:
            for mb in (120, 48):
                if mb == 48 and (3 * 9 * n + n) * n * 4 > 44 * 2**20:
                    continue
                _run_case(n, steps, reps, mb, inplace=False,
                          tag=f"mono     {n}^2 limit={mb}M")
        for b in (32, 64):
            if n % b:
                continue
            _run_case(n, steps, reps, 48, block_rows=b,
                      tag=f"inplace  {n}^2 B={b} limit=48M")


def probe_limits(steps, reps):
    """Does the scoped-VMEM LIMIT VALUE itself cost time?  The smallgrid
    curve fits ~13 us/step of fixed cost at raised limits (256² mono@120:
    18.6 us vs ~3 us at the default limit per the round-2/3 driver ledger).
    Same kernel, same grid, only vmem_limit_bytes varies."""
    from lbm_tpu.ops import resident_pallas

    for n in (256, 512, 768):
        for mb in (None, 24, 32, 48, 120):
            if (3 * 9 * n + n) * n * 4 <= (mb or 16) * 2**20 * 0.95:
                _run_case(n, steps, reps, mb, inplace=False,
                          tag=f"mono     {n}^2 limit={mb or 'default'}")
        for mb in (24, 32, 48):
            need = resident_pallas._inplace_need_bytes(n, n, 32)
            if need <= mb * 2**20:
                _run_case(n, steps, reps, mb, block_rows=32,
                          tag=f"inplace  {n}^2 B=32 limit={mb}M")


def probe_i16edge(steps, reps):
    """Bisect the i16 in-place compile ceiling: 1536² (43 MB, known good)
    -> 1792² (61 MB) -> 2048² (80.2 MB, known HTTP-500)."""
    for n, mb in ((1792, 88), (1536, 48)):
        _run_case(n, steps, reps, mb, storage="i16",
                  tag=f"i16-inp  {n}^2 B=auto limit={mb}M")


def main() -> int:
    steps = int(os.environ.get("LBM_INP_STEPS", "2000"))
    reps = int(os.environ.get("LBM_INP_REPS", "3"))
    which = sys.argv[1:] or ["bsweep"]
    from lbm_tpu.utils.compcache import enable_persistent_cache

    enable_persistent_cache()
    if "bsweep" in which:
        probe_bsweep(steps, reps)
    if "bands" in which:
        probe_bands(steps, reps)
    if "i16" in which:
        probe_i16(steps, reps)
    if "ablate" in which:
        probe_ablate(steps, reps)
    if "smallgrid" in which:
        probe_smallgrid(steps, reps)
    if "i16edge" in which:
        probe_i16edge(steps, reps)
    if "limits" in which:
        probe_limits(steps, reps)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
