"""Parts-carried in-place ca composition rate (frozen ghosts, scalar fetch).

Measures the rate the SPLIT in-place ca engine sustains when the shard
state stays as per-part arrays across the K-sweep scan (the schedule the
modes.py make_run_all hook runs on plain runs), vs the per-step split
runner's slice/concat round-trips.  Round-4 results (healthy session):
1024x2048 K=8 x2 -> 18.0k MLUPS/shard (per-step split: 11.9k, slab 13.1k),
2048x2048 K=8 x4 -> 17.6k, 512x4096 K=8 x2 -> 18.7k.

Usage: python scripts/exp_ca_partscarry.py
Env:   PC_CASES "nloc,nx,K,parts;..." (default 1024,2048,8,2),
       PC_SWEEPS (500), PC_REPS (3)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

def main():
    import jax, jax.numpy as jnp
    from lbm_tpu.params import LBMParams
    from lbm_tpu.core import lattice
    from lbm_tpu.ops import resident_pallas as rp
    from lbm_tpu.utils.compcache import enable_persistent_cache
    enable_persistent_cache()
    cases = os.environ.get("PC_CASES", "1024,2048,8,2")
    sweeps = int(os.environ.get("PC_SWEEPS", "500"))
    reps = int(os.environ.get("PC_REPS", "3"))
    for case in cases.split(";"):
        nloc, nx, K, parts = (int(v) for v in case.split(","))
        sub = nloc // parts
        ny_global = nloc * 4
        params = LBMParams(nx=nx, ny=ny_global, max_iters=100, reynolds_dim=10,
                           density=0.1, accel=0.01, omega=1.85)
        inner = rp.make_ca_inplace_runner(params, sub, nx, K, ny_global=ny_global, parts=1)
        r = np.random.default_rng(11)
        f = np.asarray(lattice.equilibrium_rest(params.density, nloc, nx), np.float32)
        f *= 1.0 + 0.01 * r.random((9, nloc, nx), dtype=np.float32)
        parts_arrs = tuple(jnp.asarray(f[:, i*sub:(i+1)*sub, :]) for i in range(parts))
        glo = jnp.asarray(f[:, -K:, :]); ghi = jnp.asarray(f[:, :K, :])
        mask = np.zeros((nloc + 2*K, nx), dtype=np.float32)
        mask[:, 0] = mask[:, -1] = 1.0
        obst = jnp.asarray(mask)
        off = jnp.int32(nloc)

        def body(carry, _):
            ps = carry
            av = None
            new = []
            for i in range(parts):
                lo_i = ps[i-1][:, -K:, :] if i > 0 else glo
                hi_i = ps[i+1][:, :K, :] if i < parts-1 else ghi
                out_i, av_i = inner(ps[i], lo_i, hi_i,
                                    obst[i*sub : i*sub + sub + 2*K, :],
                                    off + i*sub)
                new.append(out_i)
                av = av_i if av is None else av + av_i
            return tuple(new), av[0]

        run = jax.jit(lambda ps: jax.lax.scan(body, ps, None, length=sweeps)[0][0][0, 0, 0])
        t0 = time.perf_counter(); float(run(parts_arrs)); cs = time.perf_counter() - t0
        best = min(
            (lambda t0=time.perf_counter(): (float(run(parts_arrs)), time.perf_counter() - t0)[1])()
            for _ in range(reps)
        )
        steps = sweeps * K
        mlups = nloc * nx * steps / best / 1e6
        print(f"parts-carried {nloc}x{nx} K={K} x{parts}: {mlups:8.0f} MLUPS/shard "
              f"({best/steps*1e6:.2f} us/step, compile {cs:.0f} s)", flush=True)

if __name__ == "__main__":
    main()
