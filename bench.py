"""Headline benchmark: MLUPS on the 1024x1024 scene, single chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline compares against the reference's best published configuration
for this grid: fully-async MPI on 80 cores = 1796 MLUPS (README.md:129,
derived in BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    grid = os.environ.get("LBM_BENCH_GRID", "1024x1024")
    steps = os.environ.get("LBM_BENCH_STEPS")
    variant = os.environ.get("LBM_BENCH_VARIANT", "auto")
    storage = os.environ.get("LBM_BENCH_STORAGE", "f32")

    try:
        from lbm_tpu.tools.bench import run_bench

        report = run_bench(
            grid=grid,
            variant=variant,
            steps=int(steps) if steps else None,
            # Best-of-N: run-to-run spread on the shared TPU tunnel is large
            # (BENCHMARKS.md); 4 repeats cost only warm-start seconds each.
            repeats=int(os.environ.get("LBM_BENCH_REPEATS", "4")),
            storage=storage,
        )
        out = {
            "metric": report["metric"],
            "value": report["value"],
            "unit": report["unit"],
            "vs_baseline": report["vs_baseline"],
        }
    except Exception as e:  # emit the one-line JSON contract, but fail loudly
        out = {
            "metric": f"MLUPS {grid}",
            "value": 0,
            "unit": "MLUPS",
            "vs_baseline": 0,
            "error": f"{type(e).__name__}: {e}",
        }
        print(json.dumps(out))
        return 1

    # On-device correctness artifact (VERDICT r2 #7): record kernel-path
    # bitwise + golden-prefix evidence for this round in VERIFY_TPU.json and
    # surface the verdict in the bench line.  LBM_BENCH_SKIP_VERIFY=1 skips
    # (e.g. for quick interactive sweeps).
    if not os.environ.get("LBM_BENCH_SKIP_VERIFY"):
        try:
            from lbm_tpu.tools.verify_device import run_verify

            verify = run_verify()
        except Exception as e:
            verify = {"ok": False, "error": f"{type(e).__name__}: {e}"}
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "VERIFY_TPU.json"), "w",
        ) as fp:
            json.dump(verify, fp, indent=1)
            fp.write("\n")
        out["verify_ok"] = bool(verify.get("ok"))

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
