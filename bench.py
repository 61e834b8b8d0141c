"""Headline benchmark: MLUPS on the 1024x1024 scene, single chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
vs_baseline compares against the reference's best published configuration
for this grid: fully-async MPI on 80 cores = 1796 MLUPS (README.md:129,
derived in BASELINE.md).

Default storage policy "best" measures f32 and i16 and reports the faster
("storage" names the winner, "alt" records the loser) — the same rule the
reference's headline follows: its published number is the fastest variant
inside the 1% golden contract (the stale-halo async build), and i16 is
this framework's <=0.1%-measured-deviation storage mode whose golden
prefix the verify artifact re-checks on device every round.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


# Degraded-tunnel guard: the shared TPU tunnel has hours-long windows where
# execution runs ~10x below the healthy band (CLAUDE.md perf ledger).  A
# reading below ONE QUARTER of the perfcheck regression floor (floors are
# themselves ~half the healthy best-of-N rate, lbm_tpu/tools/perfcheck.py)
# cannot be kernel regression or ordinary 2x noise — it is the tunnel.  In
# that case wait and re-measure a few times so the recorded artifact
# reflects the hardware, not the outage; if it never recovers, record the
# reading tagged "degraded".
_RETRY_SLEEP_S = 150
_MAX_RETRIES = 3

# The tunnel can also hang OUTRIGHT (jax.devices() blocks forever — observed
# for 4+ hours).  An in-process jax import would then hang this script and
# the whole round-end artifact collection with it, so device reachability is
# probed in a subprocess with a hard timeout first.
_PROBE_TIMEOUT_S = 180
_PROBE_ATTEMPTS = 4
_PROBE_SLEEP_S = 120


def _device_reachable(timeout_s: float = _PROBE_TIMEOUT_S) -> bool:
    from lbm_tpu.utils.reach import device_reachable

    return device_reachable(timeout_s)


def _degraded_floor(grid: str, storage: str) -> float | None:
    from lbm_tpu.tools.perfcheck import CHECKS

    for g, s, _steps, floor, _label, *extra in CHECKS:
        if extra:
            continue  # variant-pinned gate rows are not the auto floor
        if g == grid and s == storage:
            return floor / 4.0
    return None


def main() -> int:
    grid = os.environ.get("LBM_BENCH_GRID", "1024x1024")
    steps = os.environ.get("LBM_BENCH_STEPS")
    variant = os.environ.get("LBM_BENCH_VARIANT", "auto")
    # "best" measures f32 AND i16 and reports the faster — matching the
    # reference, whose headline IS its fastest <1%-error variant (the
    # stale-halo async build, README.md:124-129); i16 is this framework's
    # documented <=0.1%-deviation storage mode (BENCHMARKS.md), and the
    # verify artifact records its golden-prefix deviation each round.
    storage = os.environ.get("LBM_BENCH_STORAGE", "best")

    import time

    for attempt in range(_PROBE_ATTEMPTS):
        if _device_reachable():
            break
        last = attempt + 1 == _PROBE_ATTEMPTS
        print(
            f"bench: device backend unreachable (tunnel hang?), attempt "
            f"{attempt + 1}/{_PROBE_ATTEMPTS}"
            + ("" if last else f"; retrying in {_PROBE_SLEEP_S}s"),
            file=sys.stderr,
            flush=True,
        )
        if not last:
            time.sleep(_PROBE_SLEEP_S)
    else:
        print(
            json.dumps(
                {
                    "metric": f"MLUPS {grid}",
                    "value": 0,
                    "unit": "MLUPS",
                    "vs_baseline": 0,
                    "error": "device backend unreachable (tunnel hang)",
                }
            )
        )
        return 1

    try:
        import jax

        from lbm_tpu.tools.bench import run_bench

        primary = "f32" if storage == "best" else storage
        kwargs = dict(
            grid=grid,
            variant=variant,
            steps=int(steps) if steps else None,
            # Best-of-N: run-to-run spread on the shared TPU tunnel is large
            # (BENCHMARKS.md); 4 repeats cost only warm-start seconds each.
            repeats=int(os.environ.get("LBM_BENCH_REPEATS", "4")),
            storage=primary,
        )
        report = run_bench(**kwargs)
        floor = _degraded_floor(grid, primary)
        degraded = False
        if (
            floor is not None
            and variant == "auto"
            and jax.default_backend() != "cpu"
        ):
            for _ in range(_MAX_RETRIES):
                if report["value"] >= floor:
                    break
                print(
                    f"bench: {report['value']:.0f} MLUPS is below the "
                    f"degraded-tunnel threshold ({floor:.0f}); retrying in "
                    f"{_RETRY_SLEEP_S}s",
                    file=sys.stderr,
                    flush=True,
                )
                time.sleep(_RETRY_SLEEP_S)
                retry = run_bench(**kwargs)
                if retry["value"] > report["value"]:
                    report = retry
            degraded = report["value"] < floor
        alt = None
        if storage == "best":
            # Measure i16 once (same repeats) and take it only if it beats
            # the (possibly retried) f32 rate.  Grids i16 cannot map just
            # keep the f32 number.
            try:
                report16 = run_bench(**{**kwargs, "storage": "i16"})
            except Exception as e:
                print(f"bench: i16 candidate skipped ({e})", file=sys.stderr)
                report16 = None
            if report16 is not None:
                win, alt = (
                    (report16, report)
                    if report16["value"] > report["value"]
                    else (report, report16)
                )
                report = win
                # A faster i16 winner above the threshold means the tunnel
                # (and the artifact) is fine even if the f32 pass was slow.
                if degraded and floor is not None and report["value"] >= floor:
                    degraded = False
        out = {
            "metric": report["metric"],
            "value": report["value"],
            "unit": report["unit"],
            "vs_baseline": report["vs_baseline"],
            "storage": report["storage"],
        }
        if alt is not None:
            out["alt"] = {
                "metric": alt["metric"],
                "value": alt["value"],
                "storage": alt["storage"],
            }
        if degraded:
            out["degraded_tunnel"] = True
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
