"""Grid-level ca composition vs the single-device auto path (VERDICT r4 #1).

Over ONE device the exact comm-avoiding mode degenerates into a grid-level
K-sweep engine: the ring exchange IS the periodic wrap, and the parts-
carried in-place sub-sweeps move each HBM byte once per K steps.  Round 4
measured it above the auto skew path at 2048^2 (17.1k vs 16.8k) but never
tried 4096^2/8192^2 (f32) or 2048^2 i16 — this script A/Bs FULL DRIVER
RUNS (the published-metric methodology: compute-bracket MLUPS with one
materialization RTT, best-of-N) so a winner can be promoted into
_pick_variant with the same numbers the README quotes.

Usage: python scripts/exp_ca1.py [quick]
Env:   LBM_CA1_REPS (default 2), LBM_CA1_STEPS (default: scene default),
       LBM_CA1_CASES (override "grid,storage;..." list)
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
    reps = int(os.environ.get("LBM_CA1_REPS", "2"))
    steps_env = os.environ.get("LBM_CA1_STEPS")
    quick = len(sys.argv) > 1 and sys.argv[1] == "quick"

    cases = [
        ("2048x2048", "f32"),
        ("4096x4096", "f32"),
        ("8192x8192", "f32"),
        ("2048x2048", "i16"),
    ]
    env_cases = os.environ.get("LBM_CA1_CASES", "")
    if env_cases:
        cases = [tuple(c.split(",")) for c in env_cases.split(";")]

    for grid, storage in cases:
        scene = load_or_make_scene(grid)
        steps = (
            int(steps_env)
            if steps_env
            else (2000 if quick else scene.params.max_iters)
        )
        print(f"=== {grid} {storage}  ({steps} steps, best of {reps}) ===",
              flush=True)

        def bench(label, engine=None, **kw):
            if engine:
                os.environ["LBM_CA_ENGINE"] = engine
            try:
                best = None
                for _ in range(reps):
                    r = run_simulation(
                        scene,
                        RunConfig(num_steps=steps, storage=storage, **kw),
                    )
                    if best is None or r.mlups > best.mlups:
                        best = r
                print(f"{label:26s} {best.mlups:8.0f} MLUPS  "
                      f"({best.variant})", flush=True)
            except Exception as e:
                print(f"{label:26s} FAIL {type(e).__name__}: "
                      f"{str(e).splitlines()[0][:120]}", flush=True)
            finally:
                if engine:
                    os.environ.pop("LBM_CA_ENGINE", None)

        bench("auto")
        bench("ca dev1 K=8", variant="ca", num_devices=1, staleness=8)
        bench("ca dev1 K=4", variant="ca", num_devices=1, staleness=4)
        if storage == "i16":
            # auto i16 ca routes to the slab engine; the round-5 in-place
            # i16 engine needs the force.
            bench("ca dev1 K=8 inplace", engine="inplace",
                  variant="ca", num_devices=1, staleness=8)
            bench("ca dev1 K=4 inplace", engine="inplace",
                  variant="ca", num_devices=1, staleness=4)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
