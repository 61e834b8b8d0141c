"""Sharded-discipline head-to-head on the virtual 8-device CPU mesh.

Measures wall-clock step rates for sync / overlap / async / chunked / ca on
the SAME mesh, scene, and (pallas, interpret-lowered) slab backend, in two
regimes:

- latency-dominated: tiny 8-row shards, where per-step collective cost is
  a large fraction of the step — the regime that separates per-step
  disciplines (sync/overlap/async: 1 exchange/step) from amortized ones
  (chunked/ca: 1 exchange per K steps);
- compute-dominated: 64-row shards, where slab compute hides discipline
  overhead.

CPU-mesh caveats (recorded with the numbers in BENCHMARKS.md): interpret
lowering makes the per-cell compute slower than TPU Mosaic kernels and
shared-memory "collectives" cheaper than ICI, so this measures *relative
discipline overhead*, not absolute TPU rates.  The single-chip kernel-side
rates (BENCHMARKS.md ca/chunked sections) complete the picture.

Usage: python scripts/exp_disciplines.py [steps]
"""

from __future__ import annotations

import sys
import time

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

from lbm_tpu.params import LBMParams  # noqa: E402
from lbm_tpu.parallel import mesh as mesh_lib  # noqa: E402
from lbm_tpu.parallel import modes  # noqa: E402


def scene(ny, nx, seed=5):
    params = LBMParams(
        nx=nx, ny=ny, max_iters=100, reynolds_dim=10,
        density=0.1, accel=0.005, omega=1.85,
    )
    r = np.random.default_rng(seed)
    mask = r.random((ny, nx)) < 0.05
    mask[0, :] = mask[-1, :] = True
    return params, mask


def time_mode(params, mask, mesh, mode, staleness, steps, repeats=3):
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", UserWarning)
        prog = modes.build_sharded_program(
            params, mask, mesh, mode=mode, staleness=staleness,
            backend="pallas",
        )
    step = jax.jit(prog.step)
    st = prog.init_state
    st, t = step(st)  # compile + warm
    jax.block_until_ready(t)
    calls = steps // prog.steps_per_call
    best = float("inf")
    for _ in range(repeats):
        s = prog.init_state
        t0 = time.perf_counter()
        for _ in range(calls):
            s, t = step(s)
            # Block per call: on a 1-core host, letting dispatches pile up
            # can starve a collective rendezvous past its 40 s timeout.
            jax.block_until_ready(t)
        best = min(best, time.perf_counter() - t0)
    cells = params.ny * params.nx
    return cells * calls * prog.steps_per_call / best / 1e6, prog.variant


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    n_dev = 8
    mesh = mesh_lib.make_row_mesh(n_dev)
    cases = [
        ("sync", 1), ("overlap", 1), ("async", 1),
        ("chunked", 4), ("ca", 4),
    ]
    for label, (ny, nx) in (
        ("latency-dominated (8-row shards)", (64, 256)),
        ("compute-dominated (64-row shards)", (512, 512)),
    ):
        params, mask = scene(ny, nx)
        print(f"\n== {label}: {ny}x{nx} over {n_dev} shards, {steps} steps ==")
        base = None
        for mode, stal in cases:
            try:
                mlups, variant = time_mode(params, mask, mesh, mode, stal, steps)
            except ValueError as e:
                print(f"{mode:>8s}: unmappable ({e})")
                continue
            base = base or mlups
            print(f"{variant:>12s}: {mlups:8.1f} MLUPS  ({mlups / base:4.2f}x sync)")


if __name__ == "__main__":
    main()
