"""Experiment: block-major (nb, 9, B, nx) state layout for the fused kernel.

Hypothesis (BENCHMARKS.md rooflines): at DRAM-bound sizes the plane-major
kernel reaches only ~38% of peak bandwidth because each block arrives as 9
separate strided plane streams; a block-major layout makes each block one
contiguous DMA.  A/B at driver level (full scans, best-of-N) — short
microbenchmarks on this tunnel are unreliable.

Usage: python scripts/exp_blockmajor.py [ny nx steps reps] [--f32]
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from lbm_tpu.core import lattice
from lbm_tpu.ops import fused_pallas as fp
from lbm_tpu.ops import quant, stencil_math
from lbm_tpu.params import LBMParams

NS = lattice.NSPEEDS
F32 = jnp.float32


def _bm_kernel(
    row_off_ref, f_ref, ghi_ref, lo_ref, hi_ref, obst_ref, out_ref, sum_ref,
    prev_ref, *, block_rows, omega, accel_row, w1a, w2a, fold, storage, density,
):
    i = pl.program_id(0)
    nb = pl.num_programs(0)
    B = block_rows
    F = fold
    start = pl.multiple_of(i * B, B)
    row_off = row_off_ref[0, 0]

    if storage == "i16":
        deq = lambda x, k: quant.dequantize_plane(x, k, density)
        enq = lambda x, k: quant.quantize_plane(x, k, density)
    else:
        deq = lambda x, k: x
        enq = lambda x, k: x

    fluid_body = obst_ref[0, 0:B, :] < F32(0.75)
    view_iota = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)
    row_mask_body = (row_off + (start + view_iota) // F) == accel_row
    body = [deq(f_ref[0, k], k) for k in range(NS)]
    body = stencil_math.accel_planes(body, fluid_body, row_mask_body, F32(w1a), F32(w2a))

    at_lo_edge = i == 0
    at_hi_edge = i == nb - 1
    glo = [deq(jnp.where(at_lo_edge, lo_ref[k], prev_ref[k]), k) for k in range(NS)]
    ghi = [deq(jnp.where(at_hi_edge, hi_ref[k], ghi_ref[0, k, 0:F]), k) for k in range(NS)]
    fluid_lo = obst_ref[0, B : B + F, :] < F32(0.75)
    fluid_hi = obst_ref[0, B + F : B + 2 * F, :] < F32(0.75)
    glo = stencil_math.accel_planes(
        glo, fluid_lo, (row_off + start // F - 1) == accel_row, F32(w1a), F32(w2a)
    )
    ghi = stencil_math.accel_planes(
        ghi, fluid_hi, (row_off + (start + B) // F) == accel_row, F32(w1a), F32(w2a)
    )

    for k in range(NS):
        prev_ref[k] = f_ref[0, k, B - F : B]

    streamed = []
    for k in range(NS):
        cy = lattice.CY[k]
        if cy == 1:
            rows = jnp.concatenate([glo[k], body[k][: B - F]], axis=0)
        elif cy == -1:
            rows = jnp.concatenate([body[k][F:], ghi[k]], axis=0)
        else:
            rows = body[k]
        streamed.append(fp._fold_roll_x(rows, lattice.CX[k], F))

    obst_own = obst_ref[0, 0:B] > F32(0.25)
    out_planes, partial = stencil_math.collide_and_av(streamed, obst_own, F32(omega))
    for k in range(NS):
        out_ref[0, k] = enq(out_planes[k], k)

    @pl.when(i == 0)
    def _():
        sum_ref[0, 0] = partial

    @pl.when(i != 0)
    def _():
        sum_ref[0, 0] = sum_ref[0, 0] + partial


def make_bm_step(params, obstacles, storage="i16"):
    ny, nx = obstacles.shape
    F, rows_v, nx_v, B = fp._plan(ny, nx)
    nb = rows_v // B
    G = max(8, F)
    assert B % G == 0
    w1a, w2a = lattice.accel_weights(params.density, params.accel)
    dtype = jnp.int16 if storage == "i16" else jnp.float32

    kernel = functools.partial(
        _bm_kernel, block_rows=B, omega=float(params.omega),
        accel_row=params.accel_row, w1a=float(w1a), w2a=float(w2a), fold=F,
        storage=storage, density=float(params.density),
    )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((1, NS, B, nx_v), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, NS, G, nx_v), lambda i: ((i + 1) % nb, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),  # lo (NS,F,nx_v)
        pl.BlockSpec(memory_space=pltpu.VMEM),  # hi
        pl.BlockSpec((1, fp._obst_block_rows(B, F), nx_v), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    ]
    out_specs = (
        pl.BlockSpec((1, NS, B, nx_v), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
    )
    call = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((NS, F, nx_v), dtype)],
        out_shape=(
            jax.ShapeDtypeStruct((nb, NS, B, nx_v), dtype),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        interpret=jax.default_backend() == "cpu",
    )

    obst_f = obstacles.astype(np.float32)
    obst_ext = np.concatenate([obst_f[-1:], obst_f, obst_f[:1]], axis=0)
    obst_ext = obst_ext.reshape((ny + 2) * F, nx // F)
    obst_blocks = jnp.asarray(fp._block_obstacles(obst_ext, B, F))
    row_off = jnp.zeros((1, 1), dtype=jnp.int32)

    def step(fb):
        # fb: (nb, NS, B, nx_v).  Periodic ghosts: last/first original rows.
        lo = fb[nb - 1, :, B - F :, :]
        hi = fb[0, :, :F, :]
        new_fb, tot = call(row_off, fb, fb, lo, hi, obst_blocks)
        return new_fb, tot[0, 0]

    def to_bm(f):
        # (9, ny, nx) -> folded view -> (nb, 9, B, nx_v)
        fv = np.asarray(f, dtype=np.float32).reshape(NS, rows_v, nx_v)
        fb = np.transpose(fv.reshape(NS, nb, B, nx_v), (1, 0, 2, 3)).copy()
        q = jnp.asarray(fb)
        if storage == "i16":
            # quantize plane-wise on axis 1
            q = jnp.stack(
                [quant.quantize_plane(q[:, k], k, float(params.density)) for k in range(NS)],
                axis=1,
            )
        return q

    def from_bm(q):
        if storage == "i16":
            q = jnp.stack(
                [quant.dequantize_plane(q[:, k], k, float(params.density)) for k in range(NS)],
                axis=1,
            )
        fv = jnp.transpose(q, (1, 0, 2, 3)).reshape(NS, rows_v, nx_v)
        return np.asarray(fv).reshape(NS, ny, nx)

    return step, to_bm, from_bm


def timed_scan(step, state0, steps, reps):
    def run(state, n):
        def body(s, _):
            s, tot = step(s)
            return s, tot
        return lax.scan(body, state, None, length=n)

    r = jax.jit(run, static_argnums=1)
    out = r(state0, steps)
    jax.block_until_ready(out[1])
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        out = r(state0, steps)
        jax.block_until_ready(out[1])
        best = min(best, time.time() - t0)
    return best / steps, out


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    storage = "f32" if "--f32" in sys.argv else "i16"
    ny, nx, steps, reps = (int(x) for x in (args + ["4096", "4096", "500", "4"])[:4])
    params = LBMParams(nx=nx, ny=ny, max_iters=steps, reynolds_dim=10,
                       density=0.1, accel=0.01, omega=1.85)
    mask = np.zeros((ny, nx), dtype=bool)
    mask[0, :] = mask[-1, :] = True
    mask[:, 0] = mask[:, -1] = True
    f0 = lattice.equilibrium_rest(params.density, ny, nx)
    cells = ny * nx

    # A: current plane-major kernel (folded io)
    F = fp._fold_factor(nx)
    step_a = fp.make_step(params, mask, folded_io=F > 1, storage=storage)
    fv = jnp.asarray(f0.reshape(NS, ny * F, nx // F) if F > 1 else f0)
    state_a = quant.quantize(fv, params.density) if storage == "i16" else fv
    dt_a, out_a = timed_scan(step_a, state_a, steps, reps)
    print(f"plane-major {storage}: {dt_a*1e6:.0f} us/step  {cells/dt_a/1e6:.0f} MLUPS")

    # B: block-major kernel
    step_b, to_bm, from_bm = make_bm_step(params, mask, storage=storage)
    state_b = to_bm(f0)
    dt_b, out_b = timed_scan(step_b, state_b, steps, reps)
    print(f"block-major {storage}: {dt_b*1e6:.0f} us/step  {cells/dt_b/1e6:.0f} MLUPS")

    # Correctness: same per-step tot_u series and same final fields.
    ta, tb = np.asarray(out_a[1]), np.asarray(out_b[1])
    print(f"tot_u series max rel diff: {np.abs(ta-tb).max()/np.abs(ta).max():.2e}")
    fa = np.asarray(out_a[0]).astype(np.int32) if storage == "i16" else np.asarray(out_a[0])
    fb_arr = from_bm(out_b[0])
    fa_arr = (
        quant.dequantize(out_a[0], params.density)
        if storage == "i16"
        else out_a[0]
    )
    fa_arr = np.asarray(fa_arr).reshape(NS, ny, nx)
    print(f"field max abs diff: {np.abs(fa_arr - fb_arr).max():.2e}")


if __name__ == "__main__":
    main()
