"""Performance regression gate (``make perfcheck``).

Runs a quick bench on one representative grid per kernel path and fails if
any falls below a conservative floor.  Floors sit at roughly HALF the
best-of-N rates recorded in BENCHMARKS.md so the shared TPU tunnel's
run-to-run spread (up to ~2x) does not produce false alarms — this catches
"the kernel fell off its fast path" regressions (wrong kernel selected,
fold/temporal disabled, pipeline deoptimized), not percent-level drift.
"""

from __future__ import annotations

import sys

# (grid, storage, steps) -> floor MLUPS.  One row per kernel path:
# VMEM-resident, skewed temporal pair (cached / flagship / DRAM depths),
# i16 storage.  Since round 3 the auto temporal impl is the skewed pair
# (parallel/modes.temporal_impl_choice), so the f32 block-kernel rows below
# exercise skew at pick_k's depth for that grid.
CHECKS = [
    ("128x128", "f32", 20000, 5500, "VMEM-resident kernel"),
    # Raised-limit resident rows (round 3): measured 17.3k/21.0k/16.4k
    # through the driver on a ~2x-degraded session — the resident kernel is
    # largely insensitive to tunnel degradation, so HALF those rates is a
    # very safe floor that still catches a fall back to the streaming path.
    # In-place single-buffer resident (round 3): 21.0-22.7k measured, and
    # resident kernels are largely degradation-immune — half the band's
    # low end still cleanly separates it from the ~17k streaming fallback.
    ("1024x1024", "f32", 4000, 10000, "in-place resident B=32 @48MiB (flagship)"),
    # Round 4: the in-place band took the sub-flagship grids too (512²
    # 24.8k driver full-run; floor stays at half the old mono-band rate —
    # still far above any streaming fallback).
    ("512x512", "f32", 4000, 8000, "in-place resident @48MiB"),
    ("2048x2048", "f32", 2000, 7500, "skewed temporal pair K=8 (DRAM)"),
    ("4096x4096", "f32", 2000, 9000, "skewed temporal pair K=4 (DRAM, deep fold)"),
    ("2048x2048", "i16", 2000, 9000, "int16 storage path"),
    ("1024x1024", "i16", 4000, 8000, "int16 temporal K=4 (trapezoid)"),
    # i16 in-place resident band (round 4): 1536² measured 18.5k @48MiB
    # (the grid's best; streaming i16 trap K=2 was 15.5k) — half the band
    # rate still sits above the streaming fallback's degraded readings.
    ("1536x1536", "i16", 2000, 9000, "int16 in-place resident @48MiB"),
    # Fold auto-policy row (round 3): 8192² folds F=4 @2048 lanes and runs
    # skew K=4 at 14,733 MLUPS (fold-8 single-step was 4,183 same session).
    # Floor at half guards the policy itself — a return to fold-8 reads ~4k.
    ("8192x8192", "f32", 400, 7000, "fold-4 @2048 lanes, skew K=4"),
    # ca regression gate (VERDICT r4 #5): the multi-device auto default's
    # kernel family, exercised on one chip through the grid-level
    # composition (--variant ca --devices 1: the ring exchange is the
    # periodic wrap).  2048² K=8 rides the in-place split engine behind
    # the parts-carried whole-run hook — measured 17.1k (round 4) /
    # 17.5k (round 5) MLUPS on full driver runs; floor at half.  A
    # regression in engine selection or the parts-carried hook reads
    # ~12k (slab) or ~3k (per-step kernel) here.
    ("2048x2048", "f32", 2000, 8500, "grid-level ca (inplace, parts-carried)",
     {"variant": "ca", "devices": 1, "staleness": 8}),
]


def main() -> int:
    from lbm_tpu.tools.bench import run_bench

    failures = []
    for grid, storage, steps, floor, label, *extra in CHECKS:
        kw = extra[0] if extra else {}
        r = run_bench(grid=grid, steps=steps, repeats=2, storage=storage, **kw)
        v = r["value"]
        ok = v >= floor
        print(
            f"{'OK  ' if ok else 'FAIL'} {grid:>9s} {storage}  "
            f"{v:8.0f} MLUPS  (floor {floor}; {label})",
            flush=True,
        )
        if not ok:
            failures.append((grid, storage, v, floor))
    if failures:
        print(
            f"{len(failures)} path(s) below their regression floor — "
            "see BENCHMARKS.md for the expected rates",
            file=sys.stderr,
        )
        return 1
    print("all kernel paths at speed")
    return 0


if __name__ == "__main__":
    sys.exit(main())
