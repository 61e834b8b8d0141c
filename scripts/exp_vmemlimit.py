"""Probe raised scoped-VMEM limits (ops/vmem.py) on the real device.

Every VMEM budget in the kernels was calibrated against Mosaic's DEFAULT
~16 MiB scoped-VMEM allocation limit; pltpu.CompilerParams(vmem_limit_bytes)
can raise it toward the 128 MiB physical VMEM of a v5e core.  Two questions
only hardware can answer:

1. Does the VMEM-RESIDENT kernel (zero HBM traffic between steps) map grids
   far beyond its current 14 MiB state budget — 512^2 (29 MB), 768^2
   (66 MB)?  If it runs at its small-grid rates (12-24k MLUPS), it beats the
   skewed temporal pair (13.7k / 15.2k) at those grids.
2. Do the streaming kernels gain from bigger blocks (fewer block boundaries)
   once the planner budget scales — e.g. skew 1024^2 K=4 B=128/256, 2048^2
   K=8 B=64 f32 (the config the default limit rejects at 16.64 MiB)?

Timing per BENCHMARKS.md rules: materialize (np.asarray) to sync — never
block_until_ready under the axon tunnel — and best-of-N.

Usage: python scripts/exp_vmemlimit.py [resident|skew ...]
Env:   LBM_VMEML_LIMITS (comma MiB list, default "32,64,100,120"),
       LBM_VMEML_STEPS (default 2000), LBM_VMEML_REPS (default 3)
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


def probe_resident(limits, steps, reps):
    import jax.numpy as jnp

    from lbm_tpu.core import lattice
    from lbm_tpu.models.driver import _HoistedJit
    from lbm_tpu.ops import resident_pallas

    for n in (384, 512, 768, 1024):
        params, mask = _scene(n, steps)
        state_mb = 3 * 9 * n * n * 4 / 2**20
        f0 = jnp.asarray(lattice.equilibrium_rest(params.density, n, n))
        for mb in limits:
            os.environ["LBM_VMEM_LIMIT_MB"] = str(mb)
            tag = f"resident {n}^2 (~{state_mb:.0f} MB 3xstate) limit={mb}M"
            if not resident_pallas.supports(params):
                print(f"{tag}: budget-rejected", flush=True)
                continue
            try:
                run = _HoistedJit(
                    resident_pallas.make_run_all(params, mask, steps),
                    donate=False,
                )
                mlups, best, compile_s = _time_run(run, f0, n, steps, reps)
            except Exception as e:
                print(f"{tag}: FAIL {type(e).__name__}: "
                      f"{str(e).splitlines()[0][:120]}", flush=True)
                continue
            print(f"{tag}: {mlups:8.0f} MLUPS (best {best*1e3:.1f} ms, "
                  f"compile {compile_s:.0f} s)", flush=True)


def probe_skew(limits, steps, reps):
    import jax.numpy as jnp

    from lbm_tpu.core import lattice
    from lbm_tpu.models.driver import _HoistedJit
    from lbm_tpu.ops import fused_pallas, skew_pallas

    cases = [  # (n, K, B candidates beyond the default-limit plan)
        (1024, 4, (128, 256)),
        (1024, 8, (64, 128)),
        (2048, 8, (32, 64)),
        (4096, 4, (32, 64)),
    ]
    for n, K, bs in cases:
        params, mask = _scene(n, steps)
        F = fused_pallas._fold_factor(n)
        f0 = jnp.asarray(lattice.equilibrium_rest(params.density, n, n))
        if F > 1:
            f0 = f0.reshape(9, n * F, n // F)
        for mb in limits:
            os.environ["LBM_VMEM_LIMIT_MB"] = str(mb)
            for B in bs:
                if (n * F) % B or B % (8 * F // np.gcd(8, F)):
                    continue
                tag = f"skew {n}^2 K={K} B={B} limit={mb}M"
                try:
                    run = _HoistedJit(skew_pallas.make_run_all(
                        params, mask, steps, K,
                        folded_io=F > 1, block_rows=B,
                    ), donate=False)
                    mlups, best, compile_s = _time_run(
                        run, f0, n, steps, reps
                    )
                except Exception as e:
                    print(f"{tag}: FAIL {type(e).__name__}: "
                          f"{str(e).splitlines()[0][:120]}", flush=True)
                    continue
                print(f"{tag}: {mlups:8.0f} MLUPS (best {best*1e3:.1f} ms, "
                      f"compile {compile_s:.0f} s)", flush=True)


def probe_block(limits, steps, reps):
    """Single-step block kernel with planner blocks scaled to the raised
    limit (fused_pallas._plan honors vmem.scale) — does the flagship path
    gain from fewer block boundaries?"""
    import jax.numpy as jnp
    from jax import lax

    from lbm_tpu.core import lattice
    from lbm_tpu.models.driver import _HoistedJit
    from lbm_tpu.ops import fused_pallas

    for n in (1024, 2048):
        params, mask = _scene(n, steps)
        F = fused_pallas._fold_factor(n)
        f0 = jnp.asarray(lattice.equilibrium_rest(params.density, n, n))
        if F > 1:
            f0 = f0.reshape(9, n * F, n // F)
        for mb in [16] + list(limits):
            os.environ["LBM_VMEM_LIMIT_MB"] = str(mb)
            _, _, _, B = fused_pallas._plan(n, n)
            tag = f"block {n}^2 B={B} fold={F} limit={mb}M"
            try:
                step = fused_pallas.make_step(params, mask, folded_io=F > 1)

                def run_all(f, _step=step):
                    return lax.scan(
                        lambda s, _: _step(s), f, None, length=steps
                    )

                run = _HoistedJit(run_all, donate=False)
                mlups, best, compile_s = _time_run(run, f0, n, steps, reps)
            except Exception as e:
                print(f"{tag}: FAIL {type(e).__name__}: "
                      f"{str(e).splitlines()[0][:120]}", flush=True)
                continue
            print(f"{tag}: {mlups:8.0f} MLUPS (best {best*1e3:.1f} ms, "
                  f"compile {compile_s:.0f} s)", flush=True)


def main() -> int:
    limits = [int(v) for v in
              os.environ.get("LBM_VMEML_LIMITS", "32,64,100,120").split(",")]
    steps = int(os.environ.get("LBM_VMEML_STEPS", "2000"))
    reps = int(os.environ.get("LBM_VMEML_REPS", "3"))
    which = sys.argv[1:] or ["resident", "skew"]
    if "resident" in which:
        probe_resident(limits, steps, reps)
    if "skew" in which:
        probe_skew(limits, steps, reps)
    if "block" in which:
        probe_block(limits, steps, reps)
    return 0


if __name__ == "__main__":
    sys.exit(main())
