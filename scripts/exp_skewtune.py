"""Tune the skewed-pair block height per (grid, K) on the real device.

The analytic VMEM footprint (ops/skew_pallas._footprint) is calibrated
conservatively and the ledger shows it over-predicts: block heights it
rejects can compile and run faster (fewer blocks -> less per-block
overhead).  This experiment force-compiles candidate (K, B) configs via
``make_run_all(..., block_rows=B)`` and times them raw on device,
materializing results (np.asarray) because jax.block_until_ready returns
early under the axon tunnel (BENCHMARKS.md timing rules).

Usage: python scripts/exp_skewtune.py [n ...]   (default 1024)
Env:   LBM_TUNE_STEPS (default 2000), LBM_TUNE_REPS (default 3),
       LBM_TUNE_KS (comma list, default "4,8"),
       LBM_TUNE_BS (comma list, default "16,32,64,128,256")
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax
    import jax.numpy as jnp

    from lbm_tpu.core import lattice
    from lbm_tpu.ops import fused_pallas, skew_pallas
    from lbm_tpu.params import LBMParams

    grids = [int(a) for a in sys.argv[1:]] or [1024]
    steps = int(os.environ.get("LBM_TUNE_STEPS", "2000"))
    reps = int(os.environ.get("LBM_TUNE_REPS", "3"))

    for n in grids:
        params = LBMParams(
            nx=n, ny=n, max_iters=steps, reynolds_dim=10,
            density=0.1, accel=0.01, omega=1.85,
        )
        mask = np.zeros((n, n), dtype=bool)
        mask[0, :] = mask[-1, :] = True
        mask[:, 0] = mask[:, -1] = True
        F = fused_pallas._fold_factor(n)
        rows_v = n * F
        folded = F > 1
        f0 = jnp.asarray(
            lattice.equilibrium_rest(params.density, n, n)
        )
        if folded:
            f0 = f0.reshape(9, rows_v, n // F)

        bs = [int(b) for b in
              os.environ.get("LBM_TUNE_BS", "16,32,64,128,256").split(",")]
        ks = [int(k) for k in
              os.environ.get("LBM_TUNE_KS", "4,8").split(",")]
        cands = [b for b in bs if rows_v % b == 0 and b >= 2 * F]
        for K in ks:
            if steps % (2 * K):
                continue
            auto_b = None
            try:
                auto_b = skew_pallas._plan(n, n, K)[3]
            except ValueError:
                pass
            for B in cands:
                tag = f"{n}^2 K={K} B={B}" + (" (auto)" if B == auto_b else "")
                try:
                    # Hoist the obstacle constants out of the module like the
                    # driver does — plain jit embeds them, and at 8192^2 the
                    # 256 MB payload exceeds the remote-compile size limit
                    # (HTTP 413).
                    from lbm_tpu.models.driver import _HoistedJit

                    run = _HoistedJit(skew_pallas.make_run_all(
                        params, mask, steps, K,
                        folded_io=folded, block_rows=B,
                    ), donate=False)
                    t0 = time.perf_counter()
                    f, tot = run(f0)
                    float(np.asarray(tot)[-1])  # materialize = sync
                    compile_s = time.perf_counter() - t0
                except Exception as e:  # Mosaic VMEM / layout rejections
                    print(f"{tag}: FAIL {type(e).__name__}: "
                          f"{str(e).splitlines()[0][:120]}", flush=True)
                    continue
                best = float("inf")
                for _ in range(reps):
                    t0 = time.perf_counter()
                    f, tot = run(f0)
                    float(np.asarray(tot)[-1])
                    best = min(best, time.perf_counter() - t0)
                mlups = n * n * steps / best / 1e6
                print(f"{tag}: {mlups:8.0f} MLUPS  "
                      f"(best {best*1e3:.1f} ms, compile {compile_s:.0f} s)",
                      flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
