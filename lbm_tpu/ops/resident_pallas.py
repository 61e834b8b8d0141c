"""VMEM-resident multi-step Pallas kernel for small grids.

For grids whose full distribution state fits in on-chip VMEM (all the
reference's benchmark scenes except 1024x1024), this kernel runs a *chunk of
timesteps per launch* with the state ping-ponging between two VMEM buffers:
zero HBM traffic and zero dispatch overhead between steps.  Per-step |u|
sums are written to an SMEM vector and flushed once per chunk.

This is the TPU-structural analog of the reference's headline optimization —
keeping the hot loop free of synchronization and off-chip traffic
(MPI_Testall_OptimizedVersion/d2q9-bgk.c:251-307 eliminates waiting; here we
eliminate the HBM round trip an XLA scan step must make, which XLA cannot do
across scan iterations).

Physics math is shared with the other backends (ops/stencil_math.py), so
fields stay bitwise-identical to the jnp and block-Pallas paths.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lbm_tpu.core import lattice
from lbm_tpu.ops import stencil_math, vmem
from lbm_tpu.params import LBMParams

F32 = jnp.float32
NS = lattice.NSPEEDS
LANE = 128

# VMEM budget: two f buffers + roughly one f worth of live temporaries
# (streamed planes / equilibria) + the mask must fit the 16 MiB scoped VMEM.
# Calibrated on v5e: a 128x1024 shard (3x state = 14.2 MiB) OOMs at 19 MiB
# scoped usage, a 96x1024 shard (10.6 MiB) compiles and runs.
_VMEM_STATE_BUDGET = 14 * 1024 * 1024
DEFAULT_CHUNK = 256


def _fits(ny: int, nx: int, mask_rows: int) -> bool:
    return (
        3 * NS * ny * nx * 4 + mask_rows * nx * 4
        <= vmem.scale(_VMEM_STATE_BUDGET)
    )


def supports(params: LBMParams) -> bool:
    return (
        params.nx % LANE == 0
        and params.ny % 8 == 0
        and _fits(params.ny, params.nx, params.ny)
    )


def _roll2d(x: jax.Array, cy: int, cx: int) -> jax.Array:
    """Periodic roll on (ny, nx): out[j, i] = x[j - cy, i - cx] (static shifts)."""
    if cy == 1:
        x = jnp.concatenate([x[-1:], x[:-1]], axis=0)
    elif cy == -1:
        x = jnp.concatenate([x[1:], x[:1]], axis=0)
    if cx == 1:
        x = jnp.concatenate([x[:, -1:], x[:, :-1]], axis=1)
    elif cx == -1:
        x = jnp.concatenate([x[:, 1:], x[:, :1]], axis=1)
    return x


def _chunk_kernel(
    f_ref,  # (9, ny, nx) VMEM in
    obst_ref,  # (ny, nx) f32 VMEM in
    fout_ref,  # (9, ny, nx) VMEM out
    av_ref,  # (chunk, 1) f32 SMEM out
    *,
    chunk: int,
    ny: int,
    omega: float,
    accel_row: int,
    w1a: float,
    w2a: float,
):
    fluid = obst_ref[...] == F32(0.0)
    obst = jnp.logical_not(fluid)
    row_mask = (
        jax.lax.broadcasted_iota(jnp.int32, (ny, 1), 0) == accel_row
    )

    def one_step(src_ref, dst_ref, t):
        planes = [src_ref[k] for k in range(NS)]
        planes = stencil_math.accel_planes(
            planes, fluid, row_mask, F32(w1a), F32(w2a)
        )
        streamed = [
            _roll2d(planes[k], lattice.CY[k], lattice.CX[k]) for k in range(NS)
        ]
        out, partial = stencil_math.collide_and_av(streamed, obst, F32(omega))
        for k in range(NS):
            dst_ref[k] = out[k]
        av_ref[t, 0] = partial

    pairs = chunk // 2

    def body(it, _):
        one_step(f_ref, fout_ref, 2 * it)
        one_step(fout_ref, f_ref, 2 * it + 1)
        return 0

    lax.fori_loop(0, pairs, body, 0)

    if chunk % 2 == 1:
        one_step(f_ref, fout_ref, chunk - 1)
    else:
        # Even number of steps: final state sits in f_ref; publish it.
        for k in range(NS):
            fout_ref[k] = f_ref[k]


def _use_interpret() -> bool:
    return jax.default_backend() == "cpu"


def make_chunk_runner(
    params: LBMParams,
    obstacles: np.ndarray,
    chunk: int,
    interpret: bool | None = None,
):
    """Build ``f -> (f_after_chunk, av_sums (chunk,))``, fully on-chip."""
    ny, nx = obstacles.shape
    if not supports(params):
        raise ValueError(f"grid {ny}x{nx} does not fit the VMEM-resident kernel")
    if interpret is None:
        interpret = _use_interpret()
    w1a, w2a = lattice.accel_weights(params.density, params.accel)
    kernel = functools.partial(
        _chunk_kernel,
        chunk=chunk,
        ny=ny,
        omega=float(params.omega),
        accel_row=params.accel_row,
        w1a=float(w1a),
        w2a=float(w2a),
    )
    obst_f = jnp.asarray(obstacles, dtype=jnp.float32)

    call = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((NS, ny, nx), jnp.float32),
            jax.ShapeDtypeStruct((chunk, 1), jnp.float32),
        ),
        interpret=interpret,
        **vmem.compiler_params(),
        cost_estimate=pl.CostEstimate(
            flops=chunk * 130 * ny * nx,
            bytes_accessed=2 * NS * ny * nx * 4,
            transcendentals=chunk * ny * nx,
        ),
    )

    def run_chunk(f):
        new_f, av = call(f, obst_f)
        return new_f, av[:, 0]

    return run_chunk


def make_run_all(
    params: LBMParams,
    obstacles: np.ndarray,
    num_steps: int,
    chunk: int = DEFAULT_CHUNK,
    interpret: bool | None = None,
):
    """Build ``f0 -> (f_final, tot_us (num_steps,))`` running the whole loop
    as scan-of-chunks (each chunk one resident kernel launch)."""
    chunk = max(1, min(chunk, num_steps)) if num_steps else 1
    n_full, rem = divmod(num_steps, chunk)
    run_chunk = make_chunk_runner(params, obstacles, chunk, interpret)
    run_rem = (
        make_chunk_runner(params, obstacles, rem, interpret) if rem else None
    )

    def run_all(f):
        tot_us = []
        if n_full:
            f, avs = lax.scan(lambda f, _: run_chunk(f), f, None, length=n_full)
            tot_us.append(avs.reshape(-1))
        if run_rem is not None:
            f, av_r = run_rem(f)
            tot_us.append(av_r)
        if not tot_us:
            return f, jnp.zeros((0,), dtype=jnp.float32)
        return f, jnp.concatenate(tot_us) if len(tot_us) > 1 else tot_us[0]

    return run_all


# --- ghost-aware resident chunks: the multi-chip per-shard fast path --------


def supports_shard(nloc: int, nx: int) -> bool:
    return nx % LANE == 0 and nloc % 8 == 0 and _fits(nloc, nx, nloc + 2)


def _ghosted_chunk_kernel(
    row_off_ref,  # (1, 1) int32 SMEM: global row of local row 0
    f_ref,  # (9, nloc, nx) VMEM in
    glo_ref,  # (9, 1, nx) VMEM in: ghost row below, fixed for the chunk
    ghi_ref,  # (9, 1, nx) VMEM in: ghost row above, fixed for the chunk
    obst_ref,  # (nloc+2, nx) f32 VMEM in (ghost-extended)
    fout_ref,  # (9, nloc, nx) VMEM out
    av_ref,  # (chunk, 1) f32 SMEM out
    *,
    chunk: int,
    nloc: int,
    omega: float,
    accel_row: int,
    w1a: float,
    w2a: float,
):
    """Advance ``chunk`` steps of one shard with frozen ghost rows.

    The per-shard compute of the chunked-async discipline: ghost rows stay
    fixed across the chunk (age 1..k), so the whole chunk runs without HBM
    traffic or collectives.  Semantics are identical to k applications of the
    jnp ghosted-slab step with a constant slab boundary.
    """
    fluid_ext = obst_ref[...] == F32(0.0)
    fluid_body = fluid_ext[1 : nloc + 1]
    obst_body = jnp.logical_not(fluid_body)
    row_off = row_off_ref[0, 0]
    row_mask_body = (
        row_off + jax.lax.broadcasted_iota(jnp.int32, (nloc, 1), 0) == accel_row
    )

    # Ghost rows are constant, so their (idempotent per-step) driven-row
    # injection is precomputed once.
    glo = [glo_ref[k] for k in range(NS)]  # (1, nx) each
    ghi = [ghi_ref[k] for k in range(NS)]
    glo = stencil_math.accel_planes(
        glo, fluid_ext[0:1], (row_off - 1) == accel_row, F32(w1a), F32(w2a)
    )
    ghi = stencil_math.accel_planes(
        ghi, fluid_ext[nloc + 1 :], (row_off + nloc) == accel_row, F32(w1a), F32(w2a)
    )

    def one_step(src_ref, dst_ref, t):
        planes = [src_ref[k] for k in range(NS)]
        planes = stencil_math.accel_planes(
            planes, fluid_body, row_mask_body, F32(w1a), F32(w2a)
        )
        streamed = []
        for k in range(NS):
            cy, cx = lattice.CY[k], lattice.CX[k]
            if cy == 1:
                rows = jnp.concatenate([glo[k], planes[k][:-1]], axis=0)
            elif cy == -1:
                rows = jnp.concatenate([planes[k][1:], ghi[k]], axis=0)
            else:
                rows = planes[k]
            if cx == 1:
                rows = jnp.concatenate([rows[:, -1:], rows[:, :-1]], axis=1)
            elif cx == -1:
                rows = jnp.concatenate([rows[:, 1:], rows[:, :1]], axis=1)
            streamed.append(rows)
        out, partial = stencil_math.collide_and_av(streamed, obst_body, F32(omega))
        for k in range(NS):
            dst_ref[k] = out[k]
        av_ref[t, 0] = partial

    def body(it, _):
        one_step(f_ref, fout_ref, 2 * it)
        one_step(fout_ref, f_ref, 2 * it + 1)
        return 0

    lax.fori_loop(0, chunk // 2, body, 0)

    if chunk % 2 == 1:
        one_step(f_ref, fout_ref, chunk - 1)
    else:
        for k in range(NS):
            fout_ref[k] = f_ref[k]


def make_ghosted_chunk_runner(
    params: LBMParams,
    nloc: int,
    nx: int,
    chunk: int,
    interpret: bool | None = None,
):
    """Build the per-shard chunk step:
    ``(f, ghost_lo, ghost_hi, obst_ext_f32, row_offset) -> (f', av (chunk,))``.
    """
    if not supports_shard(nloc, nx):
        raise ValueError(
            f"shard {nloc}x{nx} does not fit the VMEM-resident chunk kernel"
        )
    if interpret is None:
        interpret = _use_interpret()
    w1a, w2a = lattice.accel_weights(params.density, params.accel)
    kernel = functools.partial(
        _ghosted_chunk_kernel,
        chunk=chunk,
        nloc=nloc,
        omega=float(params.omega),
        accel_row=params.accel_row,
        w1a=float(w1a),
        w2a=float(w2a),
    )
    call = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((NS, nloc, nx), jnp.float32),
            jax.ShapeDtypeStruct((chunk, 1), jnp.float32),
        ),
        interpret=interpret,
        **vmem.compiler_params(),
        cost_estimate=pl.CostEstimate(
            flops=chunk * 130 * nloc * nx,
            bytes_accessed=2 * NS * nloc * nx * 4,
            transcendentals=chunk * nloc * nx,
        ),
    )

    def run_chunk(f, ghost_lo, ghost_hi, obst_ext, row_offset):
        row_off = jnp.asarray(row_offset, dtype=jnp.int32).reshape(1, 1)
        new_f, av = call(row_off, f, ghost_lo, ghost_hi, obst_ext)
        return new_f, av[:, 0]

    return run_chunk
