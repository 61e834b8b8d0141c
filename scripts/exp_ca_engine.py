"""Per-shard ca-engine head-to-head on the real chip (VERDICT r3 #4/#6).

Measures, per shard shape, the three K-sweep-class kernels that serve the
sharded disciplines — frozen ghosts, repeated sweeps, best-of-N:

- ``resident``: the monolithic VMEM-resident extended-slab exact ca sweep
  (ops/resident_pallas.make_ca_chunk_runner, round 4);
- ``inplace``: the single-buffer blocked resident exact ca sweep (round 4,
  ops/resident_pallas.make_ca_inplace_runner — the grid in-place kernel's
  structure on the extended slab);
- ``slab``: the streaming temporal slab sweep the ca mode used exclusively
  through round 3 (ops/temporal_pallas.make_slab_sweep);
- ``ghosted``: the lossy chunked mode's VMEM-resident ghost kernel — the
  37.6k MLUPS/shard design point the exact modes were ~3x behind
  (ops/resident_pallas.make_ghosted_chunk_runner);

plus the ``single``-step block kernel (what sync/overlap run per step, on
an unghosted shard-sized grid — a lower bound on their per-shard cost,
since the real slabs also carry 2 halo rows) to firm up the auto-policy
gate boundary on-chip (VERDICT r3 #6).

Frozen ghosts make the numbers *kernel* rates: what a pod chip would
sustain between exchanges, excluding ICI time (unavailable here).

Usage: python scripts/exp_ca_engine.py
Env:   LBM_CAE_SWEEPS (default 2500 K-sweeps per timing — enough steps
       that the one ~27 ms dispatch-RTT is <10% bias), LBM_CAE_REPS (3),
       LBM_CAE_CASES ("nloc,nx,K;..." shape override),
       LBM_CAE_INPLACE_B (force the in-place engine's block height),
       LBM_CAE_STORAGE=i16 (quantized state: measures the slab sweep and
       the single-step kernel, the engines with i16 variants)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _params(ny, nx, steps):
    from lbm_tpu.params import LBMParams

    return LBMParams(
        nx=nx, ny=ny, max_iters=steps, reynolds_dim=10,
        density=0.1, accel=0.01, omega=1.85,
    )


def _time(fn, args, cells_per_step, steps_per_call, calls, reps):
    import jax

    # Materialize ONE SCALAR of the result: np.asarray of the full state
    # would ship ~5 MB back through the tunnel per timed rep (~100 ms at
    # tunnel bandwidth — 10x the kernel time at these shard sizes) and
    # jax.block_until_ready lies on axon.  The scalar fetch forces
    # execution at one dispatch-RTT (~27 ms) of fixed cost, amortized over
    # steps_per_call*calls steps.
    run = jax.jit(
        lambda a: jax.lax.scan(
            lambda f, _: (fn(f, *a[1:])[0], 0.0), a[0], None, length=calls
        )[0][0, 0, 0]
    )
    t0 = time.perf_counter()
    float(run(args))
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(args))
        best = min(best, time.perf_counter() - t0)
    steps = steps_per_call * calls
    return cells_per_step * steps / best / 1e6, best / steps * 1e6, compile_s


def main() -> int:
    import jax.numpy as jnp

    from lbm_tpu.core import lattice
    from lbm_tpu.ops import fused_pallas, resident_pallas, temporal_pallas
    from lbm_tpu.utils.compcache import enable_persistent_cache

    enable_persistent_cache()
    sweeps = int(os.environ.get("LBM_CAE_SWEEPS", "2500"))
    reps = int(os.environ.get("LBM_CAE_REPS", "3"))

    # (nloc, nx, K, note): 2048^2 over 8/4/2 chips spans the auto-policy
    # gate (shard_ws = 72*nloc*nx bytes; >80 MB -> ca); 1024^2/8 is the
    # cached regime where the per-step disciplines win today.
    cases = [
        (128, 1024, 4, "1024^2/8 cached regime"),
        (256, 2048, 4, "2048^2/8 ws=36MB"),
        (512, 2048, 4, "2048^2/4 ws=72MB gate boundary"),
        (512, 2048, 8, "2048^2/4 K=8"),
        (1024, 2048, 8, "2048^2/2 ws=144MB ca regime"),
    ]
    env_cases = os.environ.get("LBM_CAE_CASES", "")
    if env_cases:  # "nloc,nx,K;..." override for smoke tests
        cases = [
            tuple(int(v) for v in c.split(",")) + ("env",)
            for c in env_cases.split(";")
        ]
    for nloc, nx, K, note in cases:
        ny_global = nloc * 4  # pretend 4-shard globals; only wrap math uses it
        params = _params(ny_global, nx, 100)
        r = np.random.default_rng(11)
        f = jnp.asarray(
            np.asarray(
                lattice.equilibrium_rest(params.density, nloc, nx), np.float32
            ) * (1.0 + 0.01 * r.random((9, nloc, nx), dtype=np.float32))
        )
        storage = os.environ.get("LBM_CAE_STORAGE", "f32")
        if storage == "i16":
            from lbm_tpu.ops import quant

            f = quant.quantize(f, params.density)
        lo = jnp.asarray(np.asarray(f[:, -K:, :]))
        hi = jnp.asarray(np.asarray(f[:, :K, :]))
        mask = np.zeros((nloc + 2 * K, nx), dtype=bool)
        mask[:, 0] = mask[:, -1] = True
        obst_ext = jnp.asarray(mask.astype(np.float32))
        off = jnp.int32(nloc)  # interior shard
        cells = nloc * nx
        print(f"--- shard {nloc}x{nx} K={K} ({note}, {storage})", flush=True)

        if storage == "i16":
            # i16 engines: the streaming slab sweep, the in-place blocked
            # resident sweep (round 5 — per-step quantization), and the
            # single-step kernel as the per-step proxy.
            if resident_pallas.supports_ca_inplace(
                nloc, nx, K, ny_global, "i16"
            ):
                try:
                    force_b = os.environ.get("LBM_CAE_INPLACE_B")
                    eng = resident_pallas.make_ca_inplace_runner(
                        params, nloc, nx, K, ny_global=ny_global,
                        block_rows=int(force_b) if force_b else None,
                        storage="i16",
                    )
                    mlups, us, cs = _time(
                        eng, (f, lo, hi, obst_ext, off), cells, K, sweeps,
                        reps,
                    )
                    print(f"inplace-i16: {mlups:6.0f} MLUPS/shard "
                          f"({us:.2f} us/step, compile {cs:.0f} s)",
                          flush=True)
                except Exception as e:
                    print(f"inplace-i16: FAIL {type(e).__name__}: "
                          f"{str(e).splitlines()[0][:140]}", flush=True)
            else:
                print("inplace-i16: does not map", flush=True)
            if temporal_pallas.supports_shard(params, nloc, nx, K):
                try:
                    eng = temporal_pallas.make_slab_sweep(
                        params, nloc, nx, K, ny_global=ny_global,
                        storage="i16",
                    )
                    mlups, us, cs = _time(
                        eng, (f, lo, hi, obst_ext, off), cells, K, sweeps,
                        reps,
                    )
                    print(f"slab-i16: {mlups:8.0f} MLUPS/shard "
                          f"({us:.2f} us/step, compile {cs:.0f} s)",
                          flush=True)
                except Exception as e:
                    print(f"slab-i16: FAIL {type(e).__name__}: "
                          f"{str(e).splitlines()[0][:140]}", flush=True)
            else:
                print("slab-i16: does not map", flush=True)
            sp = _params(nloc, nx, 100)
            mask1 = np.zeros((nloc, nx), dtype=bool)
            mask1[:, 0] = mask1[:, -1] = True
            if fused_pallas.supports(sp):
                try:
                    step = fused_pallas.make_step(sp, mask1, storage="i16")
                    mlups, us, cs = _time(
                        lambda g: step(g), (f,), cells, 1, sweeps * K, reps
                    )
                    print(f"single-i16: {mlups:6.0f} MLUPS/shard "
                          f"({us:.2f} us/step, compile {cs:.0f} s)",
                          flush=True)
                except Exception as e:
                    print(f"single-i16: FAIL {type(e).__name__}: "
                          f"{str(e).splitlines()[0][:140]}", flush=True)
            continue

        if resident_pallas.supports_ca_shard(nloc, nx, K):
            try:
                eng = resident_pallas.make_ca_chunk_runner(
                    params, nloc, nx, K, ny_global=ny_global
                )
                mlups, us, cs = _time(
                    eng, (f, lo, hi, obst_ext, off), cells, K, sweeps, reps
                )
                print(f"resident: {mlups:8.0f} MLUPS/shard ({us:.2f} us/step,"
                      f" compile {cs:.0f} s)", flush=True)
            except Exception as e:
                print(f"resident: FAIL {type(e).__name__}: "
                      f"{str(e).splitlines()[0][:140]}", flush=True)
        else:
            print("resident: does not map", flush=True)

        if resident_pallas.supports_ca_inplace(nloc, nx, K, ny_global):
            try:
                force_b = os.environ.get("LBM_CAE_INPLACE_B")
                eng = resident_pallas.make_ca_inplace_runner(
                    params, nloc, nx, K, ny_global=ny_global,
                    block_rows=int(force_b) if force_b else None,
                )
                mlups, us, cs = _time(
                    eng, (f, lo, hi, obst_ext, off), cells, K, sweeps, reps
                )
                print(f"inplace:  {mlups:8.0f} MLUPS/shard ({us:.2f} us/step,"
                      f" compile {cs:.0f} s)", flush=True)
            except Exception as e:
                print(f"inplace:  FAIL {type(e).__name__}: "
                      f"{str(e).splitlines()[0][:140]}", flush=True)
        else:
            print("inplace:  does not map", flush=True)

        if temporal_pallas.supports_shard(params, nloc, nx, K):
            try:
                eng = temporal_pallas.make_slab_sweep(
                    params, nloc, nx, K, ny_global=ny_global
                )
                mlups, us, cs = _time(
                    eng, (f, lo, hi, obst_ext, off), cells, K, sweeps, reps
                )
                print(f"slab:     {mlups:8.0f} MLUPS/shard ({us:.2f} us/step,"
                      f" compile {cs:.0f} s)", flush=True)
            except Exception as e:
                print(f"slab:     FAIL {type(e).__name__}: "
                      f"{str(e).splitlines()[0][:140]}", flush=True)
        else:
            print("slab:     does not map", flush=True)

        if resident_pallas.supports_shard(nloc, nx):
            try:
                eng = resident_pallas.make_ghosted_chunk_runner(
                    params, nloc, nx, K
                )
                mlups, us, cs = _time(
                    eng, (f, lo[:, -1:, :], hi[:, :1, :], obst_ext[K - 1: -(K - 1)] if K > 1 else obst_ext, off),
                    cells, K, sweeps, reps,
                )
                print(f"ghosted:  {mlups:8.0f} MLUPS/shard ({us:.2f} us/step,"
                      f" compile {cs:.0f} s)  [lossy chunked]", flush=True)
            except Exception as e:
                print(f"ghosted:  FAIL {type(e).__name__}: "
                      f"{str(e).splitlines()[0][:140]}", flush=True)
        else:
            print("ghosted:  does not map", flush=True)

        sp = _params(nloc, nx, 100)
        mask1 = np.zeros((nloc, nx), dtype=bool)
        mask1[:, 0] = mask1[:, -1] = True
        if fused_pallas.supports(sp):
            try:
                step = fused_pallas.make_step(sp, mask1)
                mlups, us, cs = _time(
                    lambda g: step(g), (f,), cells, 1, sweeps * K, reps
                )
                print(f"single:   {mlups:8.0f} MLUPS/shard ({us:.2f} us/step,"
                      f" compile {cs:.0f} s)  [sync/overlap per-step proxy]",
                      flush=True)
            except Exception as e:
                print(f"single:   FAIL {type(e).__name__}: "
                      f"{str(e).splitlines()[0][:140]}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
