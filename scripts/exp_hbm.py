"""HBM-pipelined temporal sweep (ops/hbm_pallas.py) vs the auto path.

The round-5 DRAM-plateau accounting (BENCHMARKS.md Rooflines) showed both
zero-recompute K=8 schedules at 2048^2 landing at ~239 us/step — 65-74% of
resident-codegen compute efficiency — with the parts-carried in-place
composition paying ~47 us/step of SERIAL part DMA (each sub-sweep a
separate pallas call).  The hbm impl keeps the same resident-class sweep
body but hides the part DMA behind compute with a hand-rolled
triple-buffered async-copy pipeline.  This script A/Bs FULL DRIVER RUNS
(compute-bracket MLUPS, best-of-N, scalar materialization only).

Usage: python scripts/exp_hbm.py [quick]
Env:   LBM_HBM_REPS (default 2), LBM_HBM_STEPS (default scene max_iters),
       LBM_HBM_CASES ("grid;grid..."), plus the module knobs
       LBM_HBM_R / LBM_HBM_SLOTS / LBM_HBM_LIMIT.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from lbm_tpu.models.driver import RunConfig, run_simulation
    from lbm_tpu.tools.bench import load_or_make_scene
    from lbm_tpu.utils.compcache import enable_persistent_cache

    enable_persistent_cache()
    reps = int(os.environ.get("LBM_HBM_REPS", "2"))
    steps_env = os.environ.get("LBM_HBM_STEPS")
    quick = len(sys.argv) > 1 and sys.argv[1] == "quick"

    cases = os.environ.get("LBM_HBM_CASES", "2048x2048;4096x4096").split(";")

    for grid in cases:
        scene = load_or_make_scene(grid)
        steps = (
            int(steps_env)
            if steps_env
            else (2000 if quick else scene.params.max_iters)
        )
        print(f"=== {grid} f32  ({steps} steps, best of {reps}) ===",
              flush=True)

        def bench(label, impl=None, temporal_k=None):
            if impl:
                os.environ["LBM_TEMPORAL_IMPL"] = impl
            try:
                best = None
                for _ in range(reps):
                    r = run_simulation(
                        scene,
                        RunConfig(num_steps=steps, temporal_k=temporal_k),
                    )
                    if best is None or r.mlups > best.mlups:
                        best = r
                print(f"{label:26s} {best.mlups:8.0f} MLUPS  "
                      f"({best.variant})", flush=True)
                return best
            except Exception as e:
                print(f"{label:26s} FAIL {type(e).__name__}: "
                      f"{str(e).splitlines()[0][:140]}", flush=True)
                return None
            finally:
                if impl:
                    os.environ.pop("LBM_TEMPORAL_IMPL", None)

        auto = bench("auto")
        hbm = bench("hbm K=8", impl="hbm", temporal_k=8)
        if auto and hbm:
            import numpy as np

            d = float(
                np.abs(
                    np.asarray(auto.av_vels) - np.asarray(hbm.av_vels)
                ).max()
            )
            rel = d / max(float(np.abs(np.asarray(auto.av_vels)).max()), 1e-30)
            print(f"av_vels max rel dev hbm-vs-auto: {rel:.2e}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
