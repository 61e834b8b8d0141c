"""HBM-pipelined whole-grid temporal K-sweep (hand-rolled async DMA).

DRAM-bound grids (2048²+) run temporal K-step sweeps to cut HBM traffic,
but every existing schedule leaves something on the table at 2048²: the
skewed pair streams through Mosaic's revolving block pipeline (per-cell
codegen ~65-75% of the resident kernel's rate — BENCHMARKS.md Rooflines),
and the parts-carried in-place ca composition reaches resident-class
codegen but pays its part DMAs *serially* (each sub-sweep is a separate
pallas call: load → compute → store with no overlap; the measured ~47
µs/step of unhidden DMA at 2048² is almost exactly its gap to the
compute bound).

This kernel fuses the parts loop into ONE pallas call and hides the DMA
with a triple-buffered hand-rolled pipeline (the guide's double-buffering
pattern, `pltpu.make_async_copy` + DMA semaphores):

- the grid is split into P uniform row-parts; each part's ghost-extended
  slab (rows ± K, periodic wrap) is DMA'd HBM→VMEM, swept K steps IN
  PLACE by the exact ca sweep body (`resident_pallas._inplace_slab_sweep`
  — bitwise-shared with the sharded ca engine), and its central rows
  DMA'd back;
- loads are issued one full compute-window ahead (load of part p+2
  starts right after compute of part p), stores are waited two windows
  later — with 3 slots the core never blocks on a transfer;
- reads/writes go to separate HBM buffers (no aliasing: the
  input_output_aliases-across-steps hazard documented in CLAUDE.md never
  arises; XLA ping-pongs the two buffers across scan iterations).

Fields are bitwise-identical to K single steps (the part sweep IS the ca
sub-sweep: K-deep local ghosts, redundant boundary recompute); av
partials sum part-major (the documented ~1-ulp float-grouping contract,
same as resident_pallas.make_ca_inplace_runner's split composition).

Reference parity: this is the same traffic optimization the reference
reaches for with MPI_Testall overlap (MPI_Testall_OptimizedVersion/
d2q9-bgk.c:251-307 — keep the hot loop from waiting on transfers), done
the TPU way: explicit DMA/compute overlap inside one kernel.

f32, unfolded, un-cloned grids only (the DMA row offsets must stay
8-aligned and the slab layout unfolded); everything else keeps its
measured auto path.
"""

from __future__ import annotations

import functools
import os

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lbm_tpu.core import lattice
from lbm_tpu.ops import fused_pallas, resident_pallas, vmem
from lbm_tpu.params import LBMParams

F32 = jnp.float32
NS = lattice.NSPEEDS

SLOTS = 3  # loads lead compute by one window, stores trail by one
DEFAULT_LIMIT_MB = 48  # the in-place family's verified compile band


def _need_bytes(ext: int, nx: int, b: int, slots: int) -> int:
    """Scoped-VMEM model: ``slots`` ghost-extended slabs + obstacle slabs
    (all f32) + the in-place sweep's per-block temporaries, carry/save
    rows, and driven-row scratch (resident_pallas' calibrated 1x model)."""
    return (
        slots * (NS + 1) * ext * nx * 4
        + resident_pallas._blocked_temp_bytes(b, nx)
        + 2 * NS * nx * 4
        + 16 * nx * 4
    )


def _pick_block_rows(ext: int, nx: int, slots: int, limit_mb: int) -> int | None:
    best = None
    for b in range(8, min(ext, 40) + 1, 8):
        if ext % b:
            continue
        if _need_bytes(ext, nx, b, slots) <= limit_mb * 2**20:
            best = b
        else:
            break
    return best


def _plan(
    params: LBMParams, K: int, storage: str = "f32"
) -> tuple[int, int, int, int] | None:
    """(part_rows R, block_rows B, slots, limit_mb) or None when the grid
    cannot map the pipelined sweep.

    R is the largest 8-aligned uniform divisor of ny whose 3-slot slabs
    fit the 48 MiB band (larger R = less redundant ghost compute, 2K/R).
    ``LBM_HBM_R`` / ``LBM_HBM_SLOTS`` / ``LBM_HBM_LIMIT`` pin the knobs
    for measurement scripts (forced configs past the verified band may
    crash the remote compile helper — crash, not corruption)."""
    if storage != "f32" or K < 2 or K % 8:
        return None
    ny, nx = params.ny, params.nx
    # The part slabs compute at the NATIVE lane width (no folding — the
    # fold policy exists for the streaming block kernels); the only width
    # requirements are lane alignment and the VMEM plan below.
    if nx % 128:
        return None
    slots = int(os.environ.get("LBM_HBM_SLOTS", SLOTS))
    limit = int(os.environ.get("LBM_HBM_LIMIT", DEFAULT_LIMIT_MB))
    env_r = os.environ.get("LBM_HBM_R")
    if env_r:
        r = int(env_r)
        if ny % r or r % 8:
            return None
        b = _pick_block_rows(r + 2 * K, nx, slots, limit)
        return (r, b, slots, limit) if b else None
    best = None
    for r in range(8, ny // 3 + 1, 8):  # pipeline needs >= 3 parts
        if ny % r:
            continue
        ext = r + 2 * K
        if ext > ny:  # one-hot driven-row contract: <= one image per slab
            break
        b = _pick_block_rows(ext, nx, slots, limit)
        if b:
            best = (r, b, slots, limit)
    return best


def supports(
    params: LBMParams,
    K: int,
    clone_cols_nx: int | None = None,
    storage: str = "f32",
) -> bool:
    """Whether the pipelined HBM sweep maps this grid at depth K
    (f32, unfolded, un-cloned, K a multiple of 8, >= 3 uniform parts)."""
    if clone_cols_nx is not None:
        return False
    return _plan(params, K, storage) is not None


def _wrap_pieces(a: int, n: int, ny: int) -> list[tuple[int, int, int]]:
    """Split source rows [a, a+n) mod ny into <= 2 contiguous pieces:
    (src_row, count, dst_row).  All offsets stay 8-aligned when a and n
    are (K and R are multiples of 8)."""
    if a < 0:
        return [(a + ny, -a, 0), (0, n + a, -a)]
    if a + n > ny:
        return [(a, ny - a, 0), (0, a + n - ny, ny - a)]
    return [(a, n, 0)]


def _hbm_sweep_kernel(
    fin_ref,  # (9, ny, nx) f32 ANY (HBM) — pre-sweep state, read-only
    obst_ref,  # (ny, nx) f32 ANY (HBM)
    fout_ref,  # (9, ny, nx) f32 ANY (HBM) — post-sweep state
    av_ref,  # (K, 1) f32 SMEM — per-level |u| totals (part-major sums)
    *bufs,
    K: int,
    ny: int,
    nx: int,
    part_rows: int,
    block_rows: int,
    slots: int,
    ny_global: int,
    omega: float,
    accel_row: int,
    w1a: float,
    w2a: float,
    density: float,
):
    R = part_rows
    P = ny // R
    ext = R + 2 * K
    slabs = bufs[:slots]  # (9, ext, nx) f32 VMEM each
    oslabs = bufs[slots : 2 * slots]  # (ext, nx) f32 VMEM each
    ar_ref = bufs[2 * slots]  # (16, nx) f32 VMEM
    lsem = bufs[2 * slots + 1]  # DMA (slots, 2): f-state load pieces
    osem = bufs[2 * slots + 2]  # DMA (slots, 2): obstacle load pieces
    ssem = bufs[2 * slots + 3]  # DMA (slots,):   central-row stores

    def load_copies(p):
        s = p % slots
        fcs, ocs = [], []
        for i, (src, cnt, dst) in enumerate(
            _wrap_pieces(p * R - K, ext, ny)
        ):
            fcs.append(
                pltpu.make_async_copy(
                    fin_ref.at[:, src : src + cnt, :],
                    slabs[s].at[:, dst : dst + cnt, :],
                    lsem.at[s, i],
                )
            )
            ocs.append(
                pltpu.make_async_copy(
                    obst_ref.at[src : src + cnt, :],
                    oslabs[s].at[dst : dst + cnt, :],
                    osem.at[s, i],
                )
            )
        return fcs + ocs

    def store_copy(p):
        s = p % slots
        return pltpu.make_async_copy(
            slabs[s].at[:, K : K + R, :],
            fout_ref.at[:, p * R : (p + 1) * R, :],
            ssem.at[s],
        )

    def part_has_accel(p) -> bool:
        lo = p * R - K
        return any(
            (lo + j) % ny_global == accel_row for j in range(ext)
        )

    for c in load_copies(0):
        c.start()
    if P > 1:
        for c in load_copies(1):
            c.start()

    for p in range(P):
        for c in load_copies(p):
            c.wait()

        def av_write(t, value, first=(p == 0)):
            if first:
                av_ref[t, 0] = value
            else:
                av_ref[t, 0] = av_ref[t, 0] + value

        resident_pallas._inplace_slab_sweep(
            slabs[p % slots],
            oslabs[p % slots],
            ar_ref,
            p * R - K,
            av_write,
            K=K,
            nloc=R,
            block_rows=block_rows,
            ny_global=ny_global,
            omega=omega,
            accel_row=accel_row,
            w1a=w1a,
            w2a=w2a,
            storage="f32",
            density=density,
            has_accel=part_has_accel(p),
        )

        # Issue the next load only now (a full compute window ahead of its
        # wait): issuing earlier would force the store-wait below to block
        # on an in-flight transfer instead of a long-finished one.
        q = p + slots - 1
        if q < P:
            if q >= slots:  # slot q%slots last stored from at part q-slots
                store_copy(q - slots).wait()
            for c in load_copies(q):
                c.start()
        store_copy(p).start()

    for p in range(max(P - slots, 0), P):
        store_copy(p).wait()


def make_sweep(
    params: LBMParams,
    obstacles: np.ndarray,
    K: int,
    interpret: bool | None = None,
    clone_cols_nx: int | None = None,
    folded_io: bool = False,
    storage: str = "f32",
):
    """``f (9, ny, nx) -> (f', tot_us (K,))`` — K timesteps per call,
    fields bitwise-equal to K single steps."""
    if clone_cols_nx is not None or folded_io:
        raise ValueError("hbm sweep supports unfolded, un-cloned grids only")
    plan = _plan(params, K, storage)
    if plan is None:
        raise ValueError(
            f"{params.nx}x{params.ny} cannot map the hbm-pipelined sweep "
            f"at K={K} (f32, unfolded, >= 3 uniform 8-aligned parts)"
        )
    R, B, slots, limit = plan
    if interpret is None:
        interpret = resident_pallas._use_interpret()
    ny, nx = params.ny, params.nx
    ext = R + 2 * K
    w1a, w2a = lattice.accel_weights(params.density, params.accel)
    kernel = functools.partial(
        _hbm_sweep_kernel,
        K=K,
        ny=ny,
        nx=nx,
        part_rows=R,
        block_rows=B,
        slots=slots,
        ny_global=ny,
        omega=float(params.omega),
        accel_row=params.accel_row,
        w1a=float(w1a),
        w2a=float(w2a),
        density=float(params.density),
    )
    grid_cells = params.nx * params.ny
    call = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((NS, ny, nx), jnp.float32),
            jax.ShapeDtypeStruct((K, 1), jnp.float32),
        ),
        scratch_shapes=(
            [pltpu.VMEM((NS, ext, nx), jnp.float32)] * slots
            + [pltpu.VMEM((ext, nx), jnp.float32)] * slots
            + [
                pltpu.VMEM((16, nx), jnp.float32),
                pltpu.SemaphoreType.DMA((slots, 2)),
                pltpu.SemaphoreType.DMA((slots, 2)),
                pltpu.SemaphoreType.DMA((slots,)),
            ]
        ),
        interpret=interpret,
        **vmem.compiler_params(limit),
        cost_estimate=pl.CostEstimate(
            flops=130 * grid_cells * K,
            bytes_accessed=(2 * NS + 1) * grid_cells * 4 * ext // R,
            transcendentals=0,
        ),
    )
    obst = jnp.asarray(np.asarray(obstacles), jnp.float32)

    def sweep(f):
        f_out, av = call(f, obst)
        return f_out, av[:, 0]

    return sweep


def make_run_all(
    params: LBMParams,
    obstacles: np.ndarray,
    num_steps: int,
    K: int,
    interpret: bool | None = None,
    clone_cols_nx: int | None = None,
    folded_io: bool = False,
    storage: str = "f32",
):
    """Whole-run fast path: ``f0 -> (f_final, tot_us (num_steps,))`` as a
    scan over pipelined K-step sweeps plus single-step remainder launches
    (bitwise equal to num_steps single steps on fields) — the same
    composition contract as temporal_pallas/skew_pallas.make_run_all."""
    sweep = make_sweep(
        params, obstacles, K, interpret,
        clone_cols_nx=clone_cols_nx, folded_io=folded_io, storage=storage,
    )
    n_sweeps, rem = divmod(num_steps, K)
    step_rem = None
    if rem:
        step_rem = fused_pallas.make_step(
            params, obstacles, interpret,
            clone_cols_nx=clone_cols_nx, folded_io=folded_io, storage=storage,
        )

    def run_all(f):
        tot_parts = []
        if n_sweeps:
            f, tots = lax.scan(
                lambda f, _: sweep(f), f, None, length=n_sweeps
            )
            tot_parts.append(tots.reshape(-1))
        for _ in range(rem):
            f, tot = step_rem(f)
            tot_parts.append(tot[None])
        if not tot_parts:
            return f, jnp.zeros((0,), dtype=jnp.float32)
        return f, (
            jnp.concatenate(tot_parts) if len(tot_parts) > 1 else tot_parts[0]
        )

    return run_all
