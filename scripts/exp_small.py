"""Small-grid fixed-cost ablation (VERDICT r4 #3): the reference's headline
scene (128x128) runs 12-13k MLUPS against 27k at 1024² — ~0.7 us/step of
cost that does not scale with cells.  This script measures, on the real
chip, where the monolithic resident kernel's per-step time goes at 128² and
256²:

- av_mode scalar/rows/vector: the per-step |u| reduction's cross-lane
  shuffles (scalar = the rounds-2-4 layout; vector removes ALL cross-lane
  work from the hot loop, reducing outside the kernel);
- ablations (results WRONG, timing honest): noav (reduction gone entirely),
  nostream (no lane/sublane rolls), noaccel (no driven-row injection);
- chunk length 256 vs 1024/2048: per-chunk dispatch amortization.

Usage: python scripts/exp_small.py [quick]
Env:   LBM_SMALL_REPS (default 3), LBM_SMALL_STEPS (default 20000)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _scene(n):
    from lbm_tpu.params import LBMParams

    params = LBMParams(
        nx=n, ny=n, max_iters=100, reynolds_dim=10,
        density=0.1, accel=0.005, omega=1.85,
    )
    mask = np.zeros((n, n), dtype=bool)
    mask[0, :] = mask[-1, :] = True
    mask[:, 0] = mask[:, -1] = True
    return params, mask


def main() -> int:
    import jax
    import jax.numpy as jnp

    from lbm_tpu.core import lattice
    from lbm_tpu.ops import resident_pallas
    from lbm_tpu.utils.compcache import enable_persistent_cache

    enable_persistent_cache()
    reps = int(os.environ.get("LBM_SMALL_REPS", "3"))
    steps = int(os.environ.get("LBM_SMALL_STEPS", "20000"))
    if len(sys.argv) > 1 and sys.argv[1] == "quick":
        steps = 2000

    for n in (128, 256):
        params, mask = _scene(n)
        f0 = jnp.asarray(
            lattice.equilibrium_rest(params.density, n, n), jnp.float32
        )
        cells = n * n
        print(f"=== {n}x{n}  ({steps} steps, best of {reps}) ===", flush=True)

        cases = [
            ("scalar c256", dict(chunk=256, av_mode="scalar")),
            ("rows   c256", dict(chunk=256, av_mode="rows")),
            ("vector c256", dict(chunk=256, av_mode="vector")),
            ("scalar c1024", dict(chunk=1024, av_mode="scalar")),
            ("vector c1024", dict(chunk=1024, av_mode="vector")),
            ("vector c2048", dict(chunk=2048, av_mode="vector")),
            ("ABL noav  c256", dict(chunk=256, _ablate="noav")),
            ("ABL nostream c256", dict(chunk=256, _ablate="nostream")),
            ("ABL noaccel c256", dict(chunk=256, _ablate="noaccel")),
            ("ABL noav+nostream+noaccel", dict(chunk=256, _ablate="noav,nostream,noaccel")),
        ]
        for label, kw in cases:
            try:
                run = jax.jit(resident_pallas.make_run_all(
                    params, mask, steps, **kw
                ))
                t0 = time.perf_counter()
                f, tots = run(f0)
                float(np.asarray(tots[-1]))
                cs = time.perf_counter() - t0
                best = float("inf")
                for _ in range(reps):
                    t0 = time.perf_counter()
                    f, tots = run(f0)
                    float(np.asarray(tots[-1]))
                    best = min(best, time.perf_counter() - t0)
                mlups = cells * steps / best / 1e6
                print(f"{label:28s} {mlups:8.0f} MLUPS  "
                      f"({best / steps * 1e6:.3f} us/step, compile {cs:.0f} s)",
                      flush=True)
            except Exception as e:
                print(f"{label:28s} FAIL {type(e).__name__}: "
                      f"{str(e).splitlines()[0][:120]}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
