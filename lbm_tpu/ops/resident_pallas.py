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
from lbm_tpu.ops import fused_pallas, quant, stencil_math, vmem
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


def _fits(ny: int, nx: int, mask_rows: int, limit_mb: int | None = None) -> bool:
    return (
        3 * NS * ny * nx * 4 + mask_rows * nx * 4
        <= vmem.scale(_VMEM_STATE_BUDGET, limit_mb)
    )


def supports(params: LBMParams, limit_mb: int | None = None) -> bool:
    if params.nx % LANE != 0 or params.ny % 8:
        return False
    return _fits(params.ny, params.nx, params.ny, limit_mb) or _blocked_fits(
        params.ny, params.nx, limit_mb
    )


def auto_raised_plan(
    params: LBMParams, storage: str = "f32"
) -> tuple[int, bool] | None:
    """(limit_mb, inplace) for the raised-VMEM auto regime, or None
    (default-limit behavior / streaming territory).

    Measured ladder (rounds 3-4, scripts/exp_vmemlimit.py +
    scripts/exp_inplace.py + driver full-run A/Bs):

    - **In-place single-buffer band** (1x state + mask + temps, raw-MiB
      model — _inplace_need_bytes): 48 MiB where it fits, else 88 MiB for
      refs up to the 81 MB verified ceiling (1280²-class).  The auto
      choice for EVERY raised-band grid since round 4: healthy-session
      driver full runs measured 512² **24.8k** / 768² **26.6k** / 1024²
      **27.0k** MLUPS, above the monolithic band at each (23.3k / 25.3k /
      n.a.).  Lower limits measured FASTER at the same config (48: 22.3k,
      56: 21.0-22.3k, 64: 21.9k, 88: 21.3k, round-3 probe session).
    - **120 MiB, monolithic band** (3x state + mask <= 66 MB): the
      fallback where in-place cannot map, and forceable for A/Bs
      (LBM_RESIDENT_KIND=mono).  Compiles clean at 120 MiB up to its band.
    - **88 MiB, ping-pong blocked band** (2x state + mask + temps <=
      81 MB): retained as the fallback the in-place band strictly
      dominates (1x always fits where 2x does).  96 MiB and above CRASH
      the remote compile helper (HTTP 500), as does exceeding ~81 MB of
      refs at 88 (1536² in-place: 94.3 MB -> HTTP 500) — 88/81 MB is the
      measured ceiling.
    - Anything larger: None (the streaming kernels' territory).

    Gated to the TPU backend (the ladder is v5e-measured; CPU interpret
    walks resident kernels cell-by-cell) and to no explicit user override
    (LBM_VMEM_LIMIT_MB set -> the env drives every kernel instead).
    """
    if vmem.env_limit_set():
        return None
    if params.nx % LANE != 0 or params.ny % 8:
        return None
    if storage == "f32" and _fits(params.ny, params.nx, params.ny):
        return None  # default limit already covers it (small grids)
    import jax

    if jax.default_backend() == "cpu":
        return None
    ny, nx = params.ny, params.nx
    if storage == "i16":
        # int16 state halves the resident footprint, extending the in-place
        # band through grids f32 cannot map.  Only the in-place kernel has
        # an i16 variant — the mono/ping-pong bands stay f32-only.
        # Measured gates (round 4, scripts/exp_inplace.py i16/i16edge):
        # - wherever f32 keeps a resident band, the STREAMING i16 sweeps
        #   beat i16 in-place (1024²: temporal 19.9k vs in-place 15.2-15.5k
        #   MLUPS — the dequant-on-read/requant-on-store codec taxes every
        #   window), so those grids return None and stream;
        # - 1536² i16 in-place @48 MiB measured **18.5k** vs the 15.5k
        #   streaming best; 1792² @64 ran 19.5k, @72 **19.7k** — the
        #   band's wins;
        # - the i16 kernel CRASHES the remote compile helper (HTTP 500) at
        #   limits >= 80 MiB regardless of refs (1536² @88 crashes with the
        #   same refs that run at 48; 1792² @88, 2048² @80 and @88 crash;
        #   @64/@72 run) — its dequantized f32 window temporaries blow the
        #   wider bands, so the band tops out at 72 MiB.  2048² i16 state
        #   (72 MiB) + mask cannot fit under 72 -> streaming trapezoid
        #   stays that grid's path.
        if _fits(ny, nx, ny) or auto_raised_plan(params, "f32") is not None:
            return None
        for mb in (48, 72):
            if not _inplace_fits_i16(ny, nx, mb):
                continue
            try:
                _pick_inplace_block_rows(
                    ny, nx, mb,
                    1 if _inplace_mask_i8(ny, nx, mb, state_bytes=2) else 4,
                    state_bytes=2,
                )
            except ValueError:
                continue  # evaluate the wider band independently
            return mb, True
        return None
    import os

    # LBM_RESIDENT_KIND forces the raised band's kernel family
    # ("mono" / "inplace"; A/B escape hatch, same pattern as
    # LBM_TEMPORAL_IMPL / LBM_CA_ENGINE).  Auto prefers IN-PLACE
    # everywhere it fits since round 4: the healthy-session driver
    # full-run A/B measured it above the monolithic band at both
    # sub-flagship grids (512²: 24.8k vs 23.3k; 768²: 26.6k vs 25.3k
    # MLUPS — the round-3 16.4k/21.0k ledger rows were ~2x-degraded
    # sessions, and the "512² dip" was that artifact, not a kernel
    # property).
    kind = os.environ.get("LBM_RESIDENT_KIND", "auto").strip().lower()
    mono = (3 * NS * ny + ny) * nx * 4
    mono_ok = mono <= 66 * 2**20 and _fits(ny, nx, ny, 120)
    if kind == "mono" and mono_ok:
        return 120, False
    for mb in (48, 88):
        if not _inplace_fits(ny, nx, mb):
            continue
        try:
            _pick_inplace_block_rows(
                ny, nx, mb, 1 if _inplace_mask_i8(ny, nx, mb) else 4
            )
        except ValueError:
            continue  # evaluate the wider band independently
        return mb, True
    if mono_ok:
        return 120, False  # in-place never fit but 3x state does: mono
    blocked = (2 * NS * ny + ny) * nx * 4 + _blocked_temp_bytes(8, nx)
    if blocked <= 81 * 2**20 and _blocked_fits(ny, nx, 88):
        return 88, False
    return None


def auto_av_mode(ny: int, nx: int, chunk: int = DEFAULT_CHUNK) -> str:
    """Measured av-reduction layout for the MONOLITHIC resident kernel
    (round 5, scripts/exp_small.py, v5e, 20k-step single calls): 'vector'
    (row-reduce only; the (chunk, nx) lane vectors leave the kernel as a
    VMEM result and XLA reduces them outside the hot loop) ran ~0.10-0.13
    us/step faster than the rounds-2-4 'scalar' full cross-lane reduce at
    BOTH mono-band grids (128^2: 1.742 vs 1.842; 256^2: 3.460 vs 3.591),
    and 'rows' sat in between — cross-lane shuffles are the measurable av
    cost at VMEM-resident sizes, echoing the round-4 in-place-kernel
    finding.  Per-step av values are independent of the chunk length in
    this mode (each step's lane vector reduces in one fixed order), so
    frames/segment decompositions stay self-consistent; vs 'scalar' the
    grouping differs (the documented ~1-ulp av contract; fields bitwise).
    Falls back to 'scalar' when the (chunk, nx) av buffer would eat the
    calibrated _fits slack (modeled as chunk extra mask rows)."""
    if _fits(ny, nx, ny + chunk):
        return "vector"
    return "scalar"


def auto_limit_mb(params: LBMParams) -> int | None:
    """The raised scoped-VMEM limit the auto policy uses (auto_raised_plan
    without the kernel-choice bit), or None."""
    plan = auto_raised_plan(params)
    return plan[0] if plan else None


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
    av_ref,  # (chunk, 1) f32 SMEM out — or (chunk, nx) f32 VMEM ("vector")
    *,
    chunk: int,
    ny: int,
    omega: float,
    accel_row: int,
    w1a: float,
    w2a: float,
    av_mode: str = "scalar",
    ablate: str = "",
):
    # ``av_mode`` (VERDICT r4 #3, the small-grid fixed-cost hunt): how the
    # per-step |u| partial leaves the kernel.  Fields are bitwise-identical
    # across all three; only the reduction grouping differs (the documented
    # ~1-ulp av contract).
    #   scalar  full cross-lane reduce per step -> SMEM (rounds 2-4)
    #   rows    sublane row-reduce per step, ONE lane reduce -> SMEM
    #   vector  row-reduce only; the (chunk, nx) lane vectors go out as a
    #           VMEM result and the lane reduction happens OUTSIDE the
    #           kernel (XLA fuses it into the scan) — zero cross-lane
    #           shuffles inside the hot loop
    # ``ablate`` (scripts/exp_small.py only — never set from product
    # paths): surgically removes one phase for per-phase accounting;
    # results are WRONG under ablation.  noaccel / nostream / noav.
    fluid = obst_ref[...] == F32(0.0)
    obst = jnp.logical_not(fluid)
    row_mask = (
        jax.lax.broadcasted_iota(jnp.int32, (ny, 1), 0) == accel_row
    )

    def one_step(src_ref, dst_ref, t):
        planes = [src_ref[k] for k in range(NS)]
        if "noaccel" not in ablate:
            planes = stencil_math.accel_planes(
                planes, fluid, row_mask, F32(w1a), F32(w2a)
            )
        if "nostream" in ablate:
            streamed = planes
        else:
            streamed = [
                _roll2d(planes[k], lattice.CY[k], lattice.CX[k])
                for k in range(NS)
            ]
        if "noav" in ablate:
            rho, u_x, u_y = stencil_math.moments(streamed)
            u_sq = u_x * u_x + u_y * u_y
            out = stencil_math.collide(
                streamed, obst, F32(omega), rho, u_x, u_y, u_sq
            )
            av_ref[t, 0] = F32(0.0)
        elif av_mode == "scalar":
            out, partial = stencil_math.collide_and_av(
                streamed, obst, F32(omega)
            )
            av_ref[t, 0] = partial
        else:
            out, partial = stencil_math.collide_and_av_rows(
                streamed, obst, F32(omega)
            )
            if av_mode == "rows":
                av_ref[t, 0] = jnp.sum(partial, dtype=F32)
            else:  # vector (t is a loop tracer -> dynamic row slice)
                av_ref[pl.ds(t, 1), :] = partial
        for k in range(NS):
            dst_ref[k] = out[k]

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


# --- block-tiled resident steps: big grids under a raised VMEM limit --------
#
# The monolithic _chunk_kernel's per-step temporaries are full-grid tensors
# (~1-3 extra states live at once), which caps it near the _fits budget.
# Tiling each step over row blocks bounds the temporaries to O(B) rows while
# the two state buffers stay fully VMEM-resident — the kernel whose working
# set is dominated by exactly 2x state + mask.  With the raised scoped-VMEM
# limit (ops/vmem.py, LBM_VMEM_LIMIT_MB) this extends the zero-HBM-per-step
# regime to 512^2 (76 MB) and 768^2-class grids on a 128 MiB-VMEM core.
#
# Within a step, block i reads only the ping buffer (including its
# neighbors' rows — free, the whole state is resident) and writes disjoint
# rows of the pong buffer, so no carries or seam recomputation exist at
# all; streaming is window *selection* (src rows [r0-cy, r0+B-cy)), not a
# roll.  The driven row is handled by substituting pre-computed
# accel-adjusted rows into any window that covers it (same values the
# full-grid masked injection produces).  Fields are bitwise-identical to
# the monolithic kernel; the per-step |u| total sums block partials in
# block order (float-sum reordering vs the monolithic full-grid sum, ~1
# ulp on av_vels — same contract as the temporal/skew kernels).


def _blocked_temp_bytes(b: int, nx: int) -> int:
    """Live per-block temporaries: 9 windows + 9 streamed + 9 out planes of
    ~b rows plus moments/equilibria — ~32 (b, nx) f32 buffers."""
    return 32 * b * nx * 4


def _blocked_fits(ny: int, nx: int, limit_mb: int | None = None) -> bool:
    """Blocked-resident feasibility: 2x state + mask + minimal-block
    temporaries inside the scaled budget.  Only active under a RAISED
    scoped-VMEM limit: at the default 16 MiB the monolithic budget already
    covers everything the chip was measured to map, and flipping grids
    between kernels without hardware measurements is not worth it."""
    if vmem.limit_mb(limit_mb) == vmem.DEFAULT_LIMIT_MB:
        return False
    state = (2 * NS * ny + ny) * nx * 4
    return state + _blocked_temp_bytes(8, nx) <= vmem.scale(
        _VMEM_STATE_BUDGET, limit_mb
    )


def _inplace_need_bytes(
    ny: int, nx: int, b: int, mask_bytes: int = 4, state_bytes: int = 4
) -> int:
    """Scoped-VMEM need of the in-place kernel: ONE state + mask + the
    per-block temporaries + the carry/save rows.  Unlike the ping-pong
    kernel (whose live temps exceed the analytic model ~4x), the in-place
    kernel's compiled footprint matches this 1x model against the RAW MiB
    limit: 1024² B=32 compiles at 48 MiB where the model predicts
    50.32 MB vs the 50.33 MB cap (round 3, exact fit).

    ``state_bytes=2`` models the int16-state variant (ops/quant.py
    fixed-point deviations): the resident buffer halves while the per-block
    temporaries stay f32 (windows dequantize on read, stores requantize)."""
    return (
        NS * ny * nx * state_bytes
        + ny * nx * mask_bytes
        + _blocked_temp_bytes(b, nx)
        + 2 * NS * nx * 4  # save0 + carry rows (dequantized f32 values)
    )


# Measured compile-helper ceiling for the in-place kernel's total VMEM refs
# at the 88 MiB band (round 3): 80.7 MB compiles, 87.3 MB (1536² with an
# int8 mask) and 94.3 MB (f32 mask) both crash the remote helper with
# HTTP 500.  Raising the limit past 88 also crashes regardless of refs.
_INPLACE_REF_CEILING = 81 * 2**20

# The int16-state variant's compile envelope is TIGHTER than f32's along
# the LIMIT axis, not the refs axis: 1536² i16 @88 MiB crashes the helper
# (HTTP 500) with the very refs that run at 48, and 1792²/2048² crash at
# every limit >= 80 while 1792² runs at 64 and 72 (19.5-19.7k MLUPS) —
# the dequantized f32 window temporaries blow the raised scoped-VMEM
# budget itself.  auto_raised_plan therefore caps the i16 band's limit at
# 72 MiB; this refs ceiling (measured-good 1792² ~ 62 MB, rounded up) is
# a belt-and-braces bound under that cap.
_INPLACE_I16_REF_CEILING = 66 * 2**20


def _inplace_fits_i16(ny: int, nx: int, limit_mb: int | None = None) -> bool:
    return (
        _inplace_fits(ny, nx, limit_mb, state_bytes=2)
        and _inplace_need_bytes(ny, nx, 8, mask_bytes=1, state_bytes=2)
        <= _INPLACE_I16_REF_CEILING
    )


def _inplace_cap(limit_mb: int | None = None) -> int:
    return min(vmem.limit_mb(limit_mb) * 2**20, _INPLACE_REF_CEILING)


def _inplace_mask_i8(
    ny: int, nx: int, limit_mb: int | None = None, state_bytes: int = 4
) -> bool:
    """Whether the in-place kernel should store the obstacle mask as int8:
    only when the f32 mask does not fit the capped budget but the i8 one
    does (the i8 compare goes through an in-kernel f32 convert — the
    direct i8 compare hits a Mosaic mask-relayout error, BENCHMARKS.md)."""
    cap = _inplace_cap(limit_mb)
    return (
        _inplace_need_bytes(ny, nx, 8, state_bytes=state_bytes) > cap
        and _inplace_need_bytes(ny, nx, 8, mask_bytes=1, state_bytes=state_bytes)
        <= cap
    )


def _inplace_fits(
    ny: int, nx: int, limit_mb: int | None = None, state_bytes: int = 4
) -> bool:
    """In-place blocked-resident feasibility at the capped limit (see
    _inplace_need_bytes; the mask drops to int8 where that is what fits).
    Only active under a raised limit — at the default 16 MiB the
    monolithic kernel owns everything that fits."""
    lim = vmem.limit_mb(limit_mb)
    if lim == vmem.DEFAULT_LIMIT_MB:
        return False
    return _inplace_need_bytes(
        ny, nx, 8, mask_bytes=1, state_bytes=state_bytes
    ) <= _inplace_cap(limit_mb)


def _pick_inplace_block_rows(
    ny: int,
    nx: int,
    limit_mb: int | None = None,
    mask_bytes: int = 4,
    state_bytes: int = 4,
) -> int:
    """Block height for the in-place kernel: the largest fitting 8-aligned
    divisor of ny up to 40 rows.  Measured at 1024² (round 3, one healthy
    session, best-of-N): B=8 21.6k, B=16 21.7-21.9k, B=32 **22.3-22.7k**,
    B=64 21.5-21.6k, B=128 21.1k MLUPS — the curve peaks at 32; the cap
    keeps unverified shapes near the optimum instead of maxing out VMEM."""
    cap = _inplace_cap(limit_mb)
    best = None
    for b in range(8, min(ny, 40) + 1, 8):
        if ny % b:
            continue
        if _inplace_need_bytes(ny, nx, b, mask_bytes, state_bytes) <= cap:
            best = b
        else:
            break
    if best is None:
        raise ValueError(
            f"no row block of a {ny}x{nx} grid fits the in-place resident "
            "VMEM headroom"
        )
    return best


def _pick_block_rows(ny: int, nx: int, limit_mb: int | None = None) -> int:
    """Largest 8-aligned divisor of ny (capped at 256 rows) whose block
    temporaries fit the headroom the two resident state buffers leave.

    Compile-verified override: at the 88 MiB blocked band (1024²-class,
    ~80 MB state — the only band auto_limit_mb sends here) B=16 fits the
    real Mosaic stack and runs ~4% faster than B=8 (16.6k vs 15.9k raw,
    round 3), while B=32 needs 98.4M and fails.  The analytic temp model
    under-predicts live temporaries ~4x (≈135 rows per block row vs the
    modeled 32), so trust the verified entry over the model there."""
    if vmem.limit_mb(limit_mb) == 88 and ny % 16 == 0:
        return 16
    head = vmem.scale(_VMEM_STATE_BUDGET, limit_mb) - (2 * NS * ny + ny) * nx * 4
    best = None
    for b in range(8, min(ny, 256) + 1, 8):
        if ny % b:
            continue
        if _blocked_temp_bytes(b, nx) <= head:
            best = b
        else:
            break
    if best is None:
        raise ValueError(
            f"no row block of a {ny}x{nx} grid fits the blocked-resident "
            "VMEM headroom"
        )
    return best


def _blocked_chunk_kernel(
    f_ref,  # (9, ny, nx) VMEM in
    obst_ref,  # (ny, nx) f32 VMEM in
    fout_ref,  # (9, ny, nx) VMEM out
    av_ref,  # (chunk, 1) f32 SMEM out
    *,
    chunk: int,
    ny: int,
    block_rows: int,
    omega: float,
    accel_row: int,
    w1a: float,
    w2a: float,
):
    B = block_rows
    nb = ny // B
    fluid_ar = obst_ref[accel_row : accel_row + 1, :] == F32(0.0)
    ar_mask = jnp.full((1, 1), True)

    def one_step(src, dst, t):
        # Accel-adjusted source rows at the driven row (pre-stream values;
        # bitwise the full-grid masked injection's result at that row).
        planes_ar = [src[k, accel_row : accel_row + 1, :] for k in range(NS)]
        adj = stencil_math.accel_planes(
            planes_ar, fluid_ar, ar_mask, F32(w1a), F32(w2a)
        )

        def window(k, r0):
            # Post-accel source rows [r0-cy, r0+B-cy), periodic, then the
            # lane rotation.  Split into static segments at wrap rows and at
            # the driven row (which substitutes adj[k]); the concat output
            # gives the rotation a canonical-layout input.
            cy = lattice.CY[k]
            parts = []
            run_start = None
            for j in range(r0 - cy, r0 + B - cy):
                jm = j % ny
                single = jm != j or jm == accel_row
                if single:
                    if run_start is not None:
                        parts.append(src[k, run_start:j, :])
                        run_start = None
                    parts.append(
                        adj[k] if jm == accel_row else src[k, jm : jm + 1, :]
                    )
                elif run_start is None:
                    run_start = j
            if run_start is not None:
                parts.append(src[k, run_start : r0 + B - cy, :])
            if len(parts) == 1 and lattice.CX[k] != 0:
                # Mosaic legality (CLAUDE.md): a lane-rotation input must
                # carry the canonical layout a concatenate produces — never
                # a raw (possibly 8-row-misaligned) offset ref slice, which
                # a windowed interior block otherwise passes here.
                p = parts[0]
                parts = [p[:-1], p[-1:]]
            w = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
            return fused_pallas._roll_x(w, lattice.CX[k])

        tot = None
        for i in range(nb):
            r0 = i * B
            obst_blk = obst_ref[r0 : r0 + B, :] != F32(0.0)
            streamed = [window(k, r0) for k in range(NS)]
            # Row-reduced av partials (round 4): per-block SCALAR |u|
            # reductions cost the in-place kernel 7.5 us/step at 1024^2
            # B=32 (cross-lane shuffles once per block); accumulate (1, nx)
            # lane vectors instead and lane-reduce ONCE per step.  Fields
            # bitwise; av grouping = the documented temporal contract.
            out, partial = stencil_math.collide_and_av_rows(
                streamed, obst_blk, F32(omega)
            )
            for k in range(NS):
                dst[k, r0 : r0 + B, :] = out[k]
            tot = partial if tot is None else tot + partial
        av_ref[t, 0] = jnp.sum(tot, dtype=F32)

    pairs = chunk // 2

    def body(it, _):
        one_step(f_ref, fout_ref, 2 * it)
        one_step(fout_ref, f_ref, 2 * it + 1)
        return 0

    lax.fori_loop(0, pairs, body, 0)

    if chunk % 2 == 1:
        one_step(f_ref, fout_ref, chunk - 1)
    else:
        for k in range(NS):
            fout_ref[k] = f_ref[k]


# --- single-buffer in-place blocked-resident steps ---------------------------
#
# The ping-pong kernels above hold TWO full states in VMEM.  But each block's
# step is read-then-write: every source row a block consumes is materialized
# as a value before its output rows are stored, so the state can be updated
# IN PLACE (one buffer, pallas_call input_output_aliases) provided the rows
# other blocks still need after being overwritten are carried as values:
#
#   blocks run bottom-up, so when block j (rows [jB, jB+B)) executes, rows
#   >= jB still hold OLD data and rows < jB hold NEW data.  Its windows span
#   old rows [jB-1, jB+B]; the only overwritten one is jB-1 (the top row of
#   block j-1) — carried forward as a value saved before block j-1's store.
#   The periodic wrap needs old row ny-1 at block 0 (still old — fine) and
#   old row 0 at block nb-1 (overwritten first) — saved once per step.
#
# Halving the resident state admits the flagship grid at HALF the raised
# scoped-VMEM limit with 4x the block height (1024^2: 1x state + mask
# = 41.9 MB, B=64 temporaries fit at 88 MiB where the ping-pong kernel's
# 79.8 MB state capped B at 16), removes the even-chunk publish copy, and
# steps clear of the >=96 MiB remote-compile-helper crash band.  Fields are
# bitwise-identical to the ping-pong kernels (same stencil_math ops over
# the same values; only the buffering differs).
#
# This is the resident-kernel analog of halving storage traffic (ops/quant)
# — here it is VMEM *capacity* that halves, the resource that sets the
# block height and therefore the per-block overhead share.


def _inplace_blocked_kernel(
    fin_ref,  # (9, ny, nx) VMEM in — ALIASED to f_ref below; never touched
    obst_ref,  # (ny, nx) f32 (or int8 at the capacity edge) VMEM in
    f_ref,  # (9, ny, nx) VMEM out == the live state, updated in place
    av_ref,  # (chunk, 1) f32 SMEM out — or (chunk, nx) VMEM ("vector")
    *,
    chunk: int,
    ny: int,
    block_rows: int,
    omega: float,
    accel_row: int,
    w1a: float,
    w2a: float,
    storage: str = "f32",
    density: float = 0.0,
    av_mode: str = "rows",
    ablate: str = "",
):
    del fin_ref  # aliased into f_ref; reads/writes go through one name so
    # Mosaic sees every read-write dependency in program order
    # ``ablate`` (scripts/exp_inplace.py only — never set from product
    # paths): comma flags that surgically remove one cost from the REAL
    # kernel so the per-phase accounting is measured, not inferred
    # (BENCHMARKS.md Rooflines).  Results are WRONG under ablation:
    #   nostream  straight block reads — no window stitching, no rotation
    #   norot     window stitching kept, lane rotation skipped
    #   nocarry   skip the carry-row save (reads the overwritten row)
    #   noav      skip the |u| reduction (moments+collide only)
    B = block_rows
    nb = ny // B
    # Storage codec (ops/quant.py): i16 keeps the resident state as int16
    # fixed-point deviations — every row READ dequantizes to f32 before the
    # window concat (the same load->dequant->accel->stream->collide->quant
    # per-step order as the streaming block kernel, fused_pallas.py), every
    # block STORE requantizes.  f32 codecs are identity, so that path's ops
    # are byte-for-byte what they were.
    deq, enq = quant.plane_codec(storage, density)

    def _mask_f32(rows):
        # int8 masks (capacity-edge grids) compare through an f32 convert:
        # the direct i8 compare hits a Mosaic mask-relayout error
        # (BENCHMARKS.md failed-experiments ledger).
        return rows if rows.dtype == jnp.float32 else rows.astype(jnp.float32)

    fluid_ar = _mask_f32(obst_ref[accel_row : accel_row + 1, :]) == F32(0.0)
    ar_mask = jnp.full((1, 1), True)

    def one_step(t):
        # Accel-adjusted driven row (pre-stream values of the OLD state).
        planes_ar = [
            deq(f_ref[k, accel_row : accel_row + 1, :], k) for k in range(NS)
        ]
        adj = stencil_math.accel_planes(
            planes_ar, fluid_ar, ar_mask, F32(w1a), F32(w2a)
        )
        # Old row 0, consumed by block nb-1's wrap after block 0 overwrote it.
        save0 = [deq(f_ref[k, 0:1, :], k) for k in range(NS)]
        carry = None  # old row r0-1 for the current block (value)

        def window(k, r0, carry_k):
            # Same assembly as the ping-pong kernel, with two extra
            # substitutions: row r0-1 comes from the carry (overwritten by
            # the previous block) and wrap row ny->0 from save0.  The accel
            # substitution keeps priority — adj IS the old driven row.
            # Every part is dequantized at read, so the concat (and the
            # lane rotation after it) runs on f32 regardless of storage.
            cy = lattice.CY[k]
            parts = []
            run_start = None
            for j in range(r0 - cy, r0 + B - cy):
                jm = j % ny
                single = jm != j or jm == accel_row or j == r0 - 1
                if single:
                    if run_start is not None:
                        parts.append(deq(f_ref[k, run_start:j, :], k))
                        run_start = None
                    if jm == accel_row:
                        parts.append(adj[k])
                    elif j == ny:  # wrap above the last block: old row 0
                        parts.append(save0[k])
                    elif j == r0 - 1 and r0 > 0:  # overwritten below-row
                        parts.append(
                            carry_k if carry_k is not None
                            else deq(f_ref[k, jm : jm + 1, :], k)  # nocarry
                        )
                    else:  # j == -1 -> old row ny-1 (still old at block 0)
                        parts.append(deq(f_ref[k, jm : jm + 1, :], k))
                elif run_start is None:
                    run_start = j
            if run_start is not None:
                parts.append(deq(f_ref[k, run_start : r0 + B - cy, :], k))
            if len(parts) == 1 and lattice.CX[k] != 0:
                p = parts[0]  # Mosaic legality: canonical layout for rotation
                parts = [p[:-1], p[-1:]]
            w = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
            if "norot" in ablate:
                return w
            return fused_pallas._roll_x(w, lattice.CX[k])

        tot = None
        for i in range(nb):
            r0 = i * B
            obst_blk = _mask_f32(obst_ref[r0 : r0 + B, :]) != F32(0.0)
            if "nostream" in ablate:
                streamed = [deq(f_ref[k, r0 : r0 + B, :], k) for k in range(NS)]
            else:
                streamed = [window(k, r0, carry[k] if carry else None)
                            for k in range(NS)]
            # Old top row of this block: the next block's below-row.  Read
            # BEFORE this block's store overwrites it.
            if "nocarry" not in ablate:
                carry = [
                    deq(f_ref[k, r0 + B - 1 : r0 + B, :], k) for k in range(NS)
                ]
            if "noav" in ablate:
                rho, u_x, u_y = stencil_math.moments(streamed)
                u_sq = u_x * u_x + u_y * u_y
                out = stencil_math.collide(
                    streamed, obst_blk, F32(omega), rho, u_x, u_y, u_sq
                )
                partial = None
            elif "avscalar" in ablate:
                # Round-3 layout: a full scalar |u| reduction PER BLOCK.
                # Kept for the measured comparison (BENCHMARKS Rooflines);
                # the lane-vector accumulation below replaced it in round 4.
                out, partial = stencil_math.collide_and_av(
                    streamed, obst_blk, F32(omega)
                )
            else:
                # Accumulate a (1, nx) row-reduced |u| vector per block and
                # lane-reduce ONCE per step: the per-block scalar reduction
                # measured 7.5 us/step at 1024^2 (13% of the whole kernel).
                out, partial = stencil_math.collide_and_av_rows(
                    streamed, obst_blk, F32(omega)
                )
            for k in range(NS):
                f_ref[k, r0 : r0 + B, :] = enq(out[k], k)
            if partial is not None:
                tot = partial if tot is None else tot + partial
        if av_mode == "vector":
            # Round-5: ship the (1, nx) row-reduced lane vector as a VMEM
            # result row and reduce OUTSIDE the kernel (the mono kernel's
            # vector layout) — removes the last per-step cross-lane
            # shuffle from the hot loop.
            av_ref[pl.ds(t, 1), :] = (
                jnp.zeros_like(av_ref[0:1, :]) if tot is None else tot
            )
        else:
            av_ref[t, 0] = (
                F32(0.0) if tot is None
                else tot if tot.ndim == 0
                else jnp.sum(tot, dtype=F32)
            )

    def body(t, _):
        one_step(t)
        return 0

    lax.fori_loop(0, chunk, body, 0)


def _use_interpret() -> bool:
    return jax.default_backend() == "cpu"


def make_chunk_runner(
    params: LBMParams,
    obstacles: np.ndarray,
    chunk: int,
    interpret: bool | None = None,
    force_blocked: bool = False,
    limit_mb: int | None = None,
    inplace: bool = False,
    block_rows: int | None = None,
    storage: str = "f32",
    av_mode: str = "scalar",
    _ablate: str = "",
):
    """Build ``f -> (f_after_chunk, av_sums (chunk,))``, fully on-chip.

    Grids beyond the monolithic kernel's temporary budget run the
    block-tiled step variant (requires a raised scoped-VMEM limit —
    ``limit_mb`` kernel-pinned, or LBM_VMEM_LIMIT_MB, ops/vmem.py).
    ``force_blocked`` pins the blocked kernel for testing.

    ``storage='i16'`` (in-place kernel only) keeps the resident state as
    int16 fixed-point deviations (ops/quant.py): half the VMEM, which
    admits the 2048²-class grids f32 cannot map.  Per-step quantization —
    the same lossy contract as the single-step i16 block kernel (fields
    bitwise-equal to it on TPU)."""
    ny, nx = obstacles.shape
    if storage not in ("f32", "i16"):
        raise ValueError(f"unknown storage {storage!r}; use 'f32' or 'i16'")
    if storage == "i16" and not inplace:
        raise ValueError(
            "storage 'i16' maps only the in-place resident kernel "
            "(pass inplace=True)"
        )
    if av_mode not in ("scalar", "rows", "vector"):
        raise ValueError(f"unknown av_mode {av_mode!r}")
    if av_mode != "scalar" and not inplace and (
        force_blocked or not _fits(ny, nx, ny, limit_mb)
    ):
        raise ValueError(
            "av_mode applies to the monolithic and in-place resident "
            "kernels (the ping-pong blocked kernel already row-reduces "
            "per block)"
        )
    if inplace and av_mode == "rows":
        # The in-place kernel's default IS the rows layout (row-reduced
        # block partials, one lane reduce per step) — 'rows' and 'scalar'
        # name the same kernel there; 'vector' moves the lane reduce out.
        av_mode = "scalar"
    state_bytes = 2 if storage == "i16" else 4
    if not (supports(params, limit_mb) or force_blocked or inplace):
        raise ValueError(f"grid {ny}x{nx} does not fit the VMEM-resident kernel")
    if interpret is None:
        interpret = _use_interpret()
    w1a, w2a = lattice.accel_weights(params.density, params.accel)
    aliases = {}
    mask_dtype = jnp.float32
    state_dtype = jnp.int16 if storage == "i16" else jnp.float32
    if inplace:
        if _inplace_mask_i8(ny, nx, limit_mb, state_bytes):
            mask_dtype = jnp.int8
        kernel = functools.partial(
            _inplace_blocked_kernel,
            chunk=chunk,
            ny=ny,
            block_rows=block_rows
            or _pick_inplace_block_rows(
                ny, nx, limit_mb,
                1 if mask_dtype == jnp.int8 else 4,
                state_bytes,
            ),
            omega=float(params.omega),
            accel_row=params.accel_row,
            w1a=float(w1a),
            w2a=float(w2a),
            storage=storage,
            density=float(params.density),
            av_mode="vector" if av_mode == "vector" else "rows",
            ablate=_ablate,
        )
        # Single-buffer update: the state input aliases the state output, so
        # the launch holds ONE resident copy (1x state VMEM, no publish copy).
        aliases = dict(input_output_aliases={0: 0})
    elif force_blocked or not _fits(ny, nx, ny, limit_mb):
        kernel = functools.partial(
            _blocked_chunk_kernel,
            chunk=chunk,
            ny=ny,
            block_rows=(
                _pick_block_rows(ny, nx, limit_mb)
                if not force_blocked or _blocked_fits(ny, nx, limit_mb)
                else 8
            ),
            omega=float(params.omega),
            accel_row=params.accel_row,
            w1a=float(w1a),
            w2a=float(w2a),
        )
    else:
        kernel = functools.partial(
            _chunk_kernel,
            chunk=chunk,
            ny=ny,
            omega=float(params.omega),
            accel_row=params.accel_row,
            w1a=float(w1a),
            w2a=float(w2a),
            av_mode=av_mode,
            ablate=_ablate,
        )
    obst_f = jnp.asarray(obstacles, dtype=mask_dtype)

    # "vector" av leaves the kernel as (chunk, nx) row-reduced lane vectors
    # in VMEM; the lane reduction happens outside (XLA fuses it into the
    # scan) — zero cross-lane shuffles inside the hot loop.  Only the
    # monolithic kernel takes this path (small grids, VERDICT r4 #3).
    vector_av = av_mode == "vector"
    call = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(
                memory_space=pltpu.VMEM if vector_av else pltpu.SMEM
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((NS, ny, nx), state_dtype),
            jax.ShapeDtypeStruct(
                (chunk, nx) if vector_av else (chunk, 1), jnp.float32
            ),
        ),
        interpret=interpret,
        **aliases,
        **vmem.compiler_params(limit_mb),
        cost_estimate=pl.CostEstimate(
            flops=chunk * 130 * ny * nx,
            bytes_accessed=2 * NS * ny * nx * state_bytes,
            transcendentals=chunk * ny * nx,
        ),
    )

    if vector_av:

        def run_chunk(f):
            new_f, av = call(f, obst_f)
            return new_f, jnp.sum(av, axis=1, dtype=jnp.float32)

    else:

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
    force_blocked: bool = False,
    limit_mb: int | None = None,
    inplace: bool = False,
    block_rows: int | None = None,
    storage: str = "f32",
    av_mode: str = "scalar",
    _ablate: str = "",
):
    """Build ``f0 -> (f_final, tot_us (num_steps,))`` running the whole loop
    as scan-of-chunks (each chunk one resident kernel launch).

    ``storage='i16'`` takes/returns the quantized int16 state (in-place
    kernel only; see make_chunk_runner)."""
    chunk = max(1, min(chunk, num_steps)) if num_steps else 1
    ny, nx = obstacles.shape
    if (
        num_steps >= 2
        and not inplace
        and (force_blocked or not _fits(ny, nx, ny, limit_mb))
    ):
        # Blocked-resident compile-shape constraint (measured, round 3): a
        # length-1 scan gets INLINED by XLA, and the inlined pallas call's
        # full-state output tuple is then stack-allocated in scoped VMEM
        # (observed: "allocating on stack for %closed_call" needing 109.78M
        # against the 88M limit at 1024²), while the identical kernel under
        # a while-loop of length >= 2 compiles and runs.  Keep n_full >= 2.
        # (The in-place kernel's aliased output is never stack-allocated.)
        chunk = min(chunk, max(1, num_steps // 2))
    n_full, rem = divmod(num_steps, chunk)
    run_chunk = make_chunk_runner(
        params, obstacles, chunk, interpret, force_blocked, limit_mb,
        inplace=inplace, block_rows=block_rows, storage=storage,
        av_mode=av_mode, _ablate=_ablate,
    )
    run_rem = (
        make_chunk_runner(
            params, obstacles, rem, interpret, force_blocked, limit_mb,
            inplace=inplace, block_rows=block_rows, storage=storage,
            av_mode=av_mode, _ablate=_ablate,
        )
        if rem
        else None
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


# --- exact communication-avoiding resident sweep: the ca-mode fast path -----
#
# The ca discipline (parallel/modes.py::step_ca) exchanges the K raw boundary
# rows once per K steps and recomputes the boundary levels locally — bitwise-
# equal to K synchronous steps.  Its original engine is the temporal slab
# SWEEP (ops/temporal_pallas.py), which streams row blocks through VMEM with
# seam-strip bookkeeping at every level: correct, but ~3x off the ghosted
# VMEM-resident chunk kernel that serves the lossy chunked mode.
#
# This kernel runs the same exact schedule fully VMEM-resident: the
# K-extended slab [ghost_lo | shard | ghost_hi] ping-pongs between two VMEM
# buffers and every step recomputes the WHOLE extended slab with the
# monolithic _chunk_kernel's periodic roll.  The in-slab wrap rows are
# garbage (the true neighbors live on other shards), but garbage propagates
# inward exactly one row per step from each edge — after step t the
# contaminated rows are [0, t+1) and [ext-t-1, ext), while step t+1 only
# reads rows [t+1, ext-t-1): the standard shrinking-trapezoid validity
# argument, paid as compute on 2K extra rows instead of per-level seam
# strips.  After K steps the central nloc rows are bitwise-equal to K
# synchronous exchanged steps (same stencil_math ops over the same values).
#
# The driven-row injection and the av reduction need GLOBAL row identities:
# the accel mask compares (row_offset - K + i) mod ny_global against the
# driven row (ghost rows evolve exactly as they do on their owner shard),
# and the per-step |u| partial masks to the central nloc rows so each cell
# is counted by exactly one shard (float-sum grouping differs from the slab
# sweep's block partials — same ~1-ulp av_vels contract, fields bitwise).


def supports_ca_shard(nloc: int, nx: int, K: int) -> bool:
    """Whether the resident ca sweep can map an nloc-row shard at depth K
    (at the default or the compile-verified raised VMEM limit)."""
    return (
        K >= 2
        and nx % LANE == 0
        and nloc % 8 == 0
        and (nloc + 2 * K) % 8 == 0
        and nloc >= K
        and _ca_resident_limit(nloc, nx, K) is not None
    )


def _ca_resident_limit(nloc: int, nx: int, K: int) -> int | None:
    """Scoped-VMEM limit for the resident ca sweep: 0 (default limit) when
    the 3x-extended-state monolithic budget fits, else the compile-verified
    120 MiB band for 3x-state <= 66 MB (auto_raised_plan's mono ceiling),
    else None (the temporal slab sweep's streaming territory)."""
    ext = nloc + 2 * K
    if _fits(ext, nx, ext):
        return 0
    if (3 * NS * ext + ext) * nx * 4 <= 66 * 2**20 and _fits(ext, nx, ext, 120):
        return 120
    return None


def _ca_ext_kernel(
    row_off_ref,  # (1, 1) int32 SMEM: global row of local row 0
    ext_ref,  # (9, nloc + 2K, nx) VMEM in: [ghost_lo | shard | ghost_hi]
    obst_ref,  # (nloc + 2K, nx) f32 VMEM in (K-deep ghost-extended)
    out_ref,  # (9, nloc + 2K, nx) VMEM out (central nloc rows valid)
    av_ref,  # (K, 1) f32 SMEM out
    *,
    K: int,
    nloc: int,
    ny_global: int,
    omega: float,
    accel_row: int,
    w1a: float,
    w2a: float,
):
    ext = nloc + 2 * K
    fluid = obst_ref[...] == F32(0.0)
    obst = jnp.logical_not(fluid)
    iota = jax.lax.broadcasted_iota(jnp.int32, (ext, 1), 0)
    # Global row of extended row i (shard 0's lower ghosts wrap to the top).
    grow = (row_off_ref[0, 0] - K + iota) % ny_global
    row_mask = grow == accel_row
    central = (iota >= K) & (iota < K + nloc)
    av_mask = fluid & central

    def one_step(src_ref, dst_ref, t):
        planes = [src_ref[k] for k in range(NS)]
        planes = stencil_math.accel_planes(
            planes, fluid, row_mask, F32(w1a), F32(w2a)
        )
        streamed = [
            _roll2d(planes[k], lattice.CY[k], lattice.CX[k]) for k in range(NS)
        ]
        rho, u_x, u_y = stencil_math.moments(streamed)
        u_sq = u_x * u_x + u_y * u_y
        out = stencil_math.collide(streamed, obst, F32(omega), rho, u_x, u_y, u_sq)
        for k in range(NS):
            dst_ref[k] = out[k]
        av_ref[t, 0] = stencil_math.speed_sum(u_sq, av_mask)

    # K is small (2..16) and static: unroll the ping-pong in Python.
    for t in range(K):
        src, dst = (ext_ref, out_ref) if t % 2 == 0 else (out_ref, ext_ref)
        one_step(src, dst, t)
    if K % 2 == 0:
        for k in range(NS):
            out_ref[k] = ext_ref[k]


def make_ca_chunk_runner(
    params: LBMParams,
    nloc: int,
    nx: int,
    K: int,
    ny_global: int,
    interpret: bool | None = None,
):
    """Build the resident exact-ca per-shard sweep:
    ``(f, ghost_lo (9,K,nx), ghost_hi (9,K,nx), obst_ext, row_offset)
    -> (f', tot_u (K,))`` — drop-in for temporal_pallas.make_slab_sweep."""
    if not supports_ca_shard(nloc, nx, K):
        raise ValueError(
            f"shard {nloc}x{nx} at depth K={K} does not fit the resident "
            "ca sweep"
        )
    if interpret is None:
        interpret = _use_interpret()
    limit = _ca_resident_limit(nloc, nx, K) or None
    ext = nloc + 2 * K
    w1a, w2a = lattice.accel_weights(params.density, params.accel)
    kernel = functools.partial(
        _ca_ext_kernel,
        K=K,
        nloc=nloc,
        ny_global=ny_global,
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
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((NS, ext, nx), jnp.float32),
            jax.ShapeDtypeStruct((K, 1), jnp.float32),
        ),
        interpret=interpret,
        **vmem.compiler_params(limit),
        cost_estimate=pl.CostEstimate(
            flops=K * 130 * ext * nx,
            bytes_accessed=2 * NS * ext * nx * 4,
            transcendentals=K * ext * nx,
        ),
    )

    def run_sweep(f, ghost_lo, ghost_hi, obst_ext, row_offset):
        row_off = jnp.asarray(row_offset, dtype=jnp.int32).reshape(1, 1)
        ext_f = jnp.concatenate([ghost_lo, f, ghost_hi], axis=1)
        new_ext, av = call(row_off, ext_f, obst_ext.astype(jnp.float32))
        return new_ext[:, K : K + nloc, :], av[:, 0]

    return run_sweep


# --- in-place blocked exact-ca sweep: resident ca at grid-kernel rates -----
#
# The monolithic _ca_ext_kernel above holds TWO extended-slab states plus
# full-slab per-step temporaries, which (a) caps it at small shards and
# (b) collapses its rate past ~112 rows (measured, ca_engine_choice's table)
# for the same reason the grid-level monolithic band loses to the in-place
# blocked kernel: Mosaic schedules huge single-block ops poorly.  This
# variant runs the SAME shrinking-validity schedule with the in-place
# single-buffer block structure of _inplace_blocked_kernel — 1x ext state
# via input_output_aliases, O(B)-row temporaries, carry rows, row-reduced
# av partials — so the engine steps 512x2048-class shards at grid-kernel
# rates (its band ceiling is 48 MiB, _ca_inplace_plan — the wider raised
# bands the grid kernel runs at hang or HTTP-500 the compile helper here).
#
# The one structural difference from the grid kernel: under shard_map the
# driven row's position in the extended slab is a RUNTIME value (row_offset
# differs per shard while the compiled program is shared), so the grid
# kernel's static window substitution cannot express the injection.
# Instead:
#   - positional one-hot masks mark the driven row (and its wrap-shifted
#     images, one per streaming offset cy) from the row_offset scalar;
#   - the driven row's current planes live in a (16, nx) VMEM scratch,
#     seeded at sweep start by a masked sublane sum (the mask has at most
#     one live row — gated by ext <= ny_global — so the sum IS that row,
#     bitwise) and refreshed each step by the one block that stores it
#     (pl.when on a per-block predicate; the captured values are already
#     live block outputs, no extra VMEM reads);
#   - each window substitutes the accel-adjusted row where its positional
#     mask fires (jnp.where with the (B, 1) mask), which reproduces the
#     monolithic kernel's full-slab masked accel_planes values bitwise.
#     Planes the injection leaves unchanged (0, 2, 4) skip the select.
#
# Fields are bitwise-equal to _ca_ext_kernel on every slab row each step
# (same stencil_math ops over the same values — the in-place schedule
# reproduces the pure periodic step exactly, as the grid kernel proves),
# hence bitwise-equal to K synchronous exchanged steps on the central
# rows.  The |u| partial masks to the central rows (each cell counted by
# exactly ONE shard) and accumulates row-reduced lane vectors like the
# round-4 grid kernel (float-sum grouping differs from the monolithic
# engine's whole-slab sum — the documented ~1-ulp av contract).


def _ca_inplace_need(
    ext: int, nx: int, b: int, mask_bytes: int = 4, state_bytes: int = 4
) -> int:
    # _inplace_need_bytes + the (16, nx) driven-row scratch.
    return (
        _inplace_need_bytes(ext, nx, b, mask_bytes, state_bytes)
        + 16 * nx * 4
    )


def _ca_inplace_plan(
    nloc: int, nx: int, K: int, storage: str = "f32"
) -> tuple[int, bool] | None:
    """(scoped-VMEM limit, mask_i8) for the in-place ca sweep, or None.

    Limit 0 means the 16 MiB default; otherwise the 48 MiB band — the ONLY
    raised band verified for this kernel.  The grid-level in-place kernel
    runs at 72 and 88 MiB, but the ca variant's raised bands are hostile
    past 48 (round-4 measured negatives): 768x2048 K=8 @72 (65.5 MiB refs)
    HANGS the remote compile helper, and 1024x2048 K=8 @88 with the int8
    mask (83.3 MiB refs, inside the grid kernel's 81 MiB verified ceiling)
    HTTP-500s it — so those shards fall back to the streaming slab sweep
    (13.4k MLUPS/shard at 1024x2048 K=8) instead of auto-routing into a
    crash.  The mask drops to int8 only when that is what fits the band
    (the grid kernel's capacity-edge rule, _inplace_mask_i8).

    ``storage='i16'`` halves the resident slab bytes (round 5) under the
    same 48 MiB band cap, bounded additionally by the grid i16 kernel's
    measured refs ceiling (_INPLACE_I16_REF_CEILING — its dequantized f32
    window temporaries crash the compile helper well before f32's limit)."""
    ext = nloc + 2 * K
    state_bytes = 2 if storage == "i16" else 4
    ceiling = (
        _INPLACE_I16_REF_CEILING if storage == "i16" else _INPLACE_REF_CEILING
    )
    for mb in (vmem.DEFAULT_LIMIT_MB, 48):
        cap = min(mb * 2**20, ceiling)
        if _ca_inplace_need(ext, nx, 8, 4, state_bytes) <= cap:
            return (0 if mb == vmem.DEFAULT_LIMIT_MB else mb), False
        if _ca_inplace_need(ext, nx, 8, 1, state_bytes) <= cap:
            return (0 if mb == vmem.DEFAULT_LIMIT_MB else mb), True
    return None


def _ca_pick_block_rows(
    ext: int,
    nx: int,
    limit_mb: int | None,
    mask_bytes: int = 4,
    state_bytes: int = 4,
) -> int:
    """Largest fitting 8-aligned divisor of ext up to 40 rows (the grid
    kernel's measured B=32-class optimum; ext is rarely 32-divisible)."""
    ceiling = (
        _INPLACE_I16_REF_CEILING if state_bytes == 2 else _INPLACE_REF_CEILING
    )
    cap = min(vmem.limit_mb(limit_mb) * 2**20, ceiling)
    best = None
    for b in range(8, min(ext, 40) + 1, 8):
        if ext % b:
            continue
        if _ca_inplace_need(ext, nx, b, mask_bytes, state_bytes) <= cap:
            best = b
        else:
            break
    if best is None:
        raise ValueError(
            f"no row block of a {ext}x{nx} extended slab fits the in-place "
            "ca VMEM headroom"
        )
    return best


def _ca_inplace_maps_whole(
    nloc: int, nx: int, K: int, ny_global: int, storage: str = "f32"
) -> bool:
    # The single-sweep (parts=1) feasibility test.
    ext = nloc + 2 * K
    return (
        K >= 2
        and nx % LANE == 0
        and nloc % 8 == 0
        and ext % 8 == 0
        and nloc >= K
        and ext <= ny_global
        and _ca_inplace_plan(nloc, nx, K, storage) is not None
    )


def ca_inplace_parts(
    nloc: int, nx: int, K: int, ny_global: int, storage: str = "f32"
) -> int | None:
    """Sub-slab count for the in-place ca sweep: 1 when the whole shard
    fits the engine's VMEM band, the smallest even split whose sub-slabs
    do otherwise, None when no split maps.

    Intra-shard splitting is the communication-avoiding trick applied a
    second time, WITHIN the chip: a shard too tall for the in-place band
    runs as ``parts`` independent sub-sweeps, each reading a K-deep ghost
    region from the neighboring sub-slab's pre-sweep state (local data —
    no exchange) and recomputing its boundary evolution exactly like the
    inter-chip schedule does.  Fields stay bitwise-equal to K synchronous
    steps (the sub-sweep IS the ca sweep at a smaller nloc); the cost is
    (parts-1)*2K rows of redundant boundary compute, already included in
    the measured per-shard rates.  This keeps the 21.0k MLUPS/shard
    512x2048-class kernel serving 1024x2048 shards (slab: 13.4k) and maps
    4096-lane shards no monolithic engine can hold."""
    max_parts = max(1, nloc // max(K, 8))
    for parts in range(1, max_parts + 1):
        if nloc % parts:
            continue
        sub = nloc // parts
        if _ca_inplace_maps_whole(sub, nx, K, ny_global, storage):
            return parts
    return None


def supports_ca_inplace(
    nloc: int, nx: int, K: int, ny_global: int, storage: str = "f32"
) -> bool:
    """Whether the in-place blocked ca sweep maps an nloc-row shard at
    depth K, possibly as split sub-sweeps (:func:`ca_inplace_parts`).
    ``ext <= ny_global`` guarantees the driven row has at most one image
    in the extended slab (the one-hot extraction's contract)."""
    return ca_inplace_parts(nloc, nx, K, ny_global, storage) is not None


def _inplace_slab_sweep(
    f_ref,  # (9, ext, nx) ref (VMEM in/out or scratch) — updated in place
    obst_ref,  # (ext, nx) ref (f32 or int8 encodings)
    ar_ref,  # (16, nx) f32 scratch: rows 0-8 = driven-row planes
    base,  # global row of slab row 0 MINUS nothing: global row of f_ref
    # row 0 (int or traced SMEM scalar; may be negative pre-wrap)
    av_write,  # av_write(t, value): per-level |u| total sink
    *,
    K: int,
    nloc: int,
    block_rows: int,
    ny_global: int,
    omega: float,
    accel_row: int,
    w1a: float,
    w2a: float,
    storage: str = "f32",
    density: float = 0.0,
    has_accel: bool = True,
):
    """K in-place blocked steps over a ghost-extended (9, nloc+2K, nx)
    slab — the shared compute body of the ca in-place engine
    (:func:`_ca_inplace_kernel`) and the HBM-pipelined whole-grid sweep
    (ops/hbm_pallas.py), kept bitwise-identical between them.

    ``has_accel=False`` (static) elides the driven-row machinery for
    slabs that provably never see the accelerated row — the injection
    masks would be all-False constants anyway; skipping them keeps the
    unrolled multi-part kernel body small."""
    B = block_rows
    ext = nloc + 2 * K
    nb = ext // B
    # Storage codec (ops/quant.py): i16 keeps the resident extended slab as
    # int16 fixed-point deviations — every row READ dequantizes to f32,
    # every block STORE requantizes (the grid-level in-place i16 kernel's
    # per-step contract; the slab i16 ca engine instead quantizes once per
    # sweep, so the two i16 ca engines agree within the quantization
    # envelope, not bitwise — both are documented lossy modes).  f32 codecs
    # are identity, so that path's ops are byte-for-byte what they were.
    deq, enq = quant.plane_codec(storage, density)

    def _mask_f32(rows):
        # int8 masks (capacity-edge shards) compare through an f32 convert:
        # the direct i8 compare hits a Mosaic mask-relayout error
        # (BENCHMARKS.md failed-experiments ledger).
        return rows if rows.dtype == jnp.float32 else rows.astype(jnp.float32)

    iota = jax.lax.broadcasted_iota(jnp.int32, (ext, 1), 0)

    def _arow(shift: int):
        # arow shifted by a streaming offset WITH the in-slab wrap: window
        # row r of a block holds source row (r - cy) mod ext, so the mask a
        # cy-offset window needs at row r is arow[(r - cy) mod ext].
        jm = jnp.remainder(iota - shift, ext)
        return jnp.remainder(base + jm, ny_global) == accel_row

    central = (iota >= K) & (iota < K + nloc)
    if has_accel:
        arow = _arow(0)
        m_cy = {-1: _arow(-1), 0: arow, 1: _arow(1)}
        arow_f = arow.astype(F32)
        fluid_ar = (
            jnp.sum(_mask_f32(obst_ref[...]) * arow_f, axis=0, keepdims=True)
            == F32(0.0)
        )
        ar_mask = jnp.full((1, 1), True)
        has_ar = [
            jnp.sum(arow_f[i * B : (i + 1) * B]) > F32(0.0)
            for i in range(nb)
        ]

        # Seed the driven-row scratch from the sweep-start slab (one-hot
        # extraction: at most one live mask row, so the masked sum IS the
        # row).
        for k in range(NS):
            ar_ref[k : k + 1, :] = jnp.sum(
                deq(f_ref[k], k) * arow_f, axis=0, keepdims=True
            )

    def one_step(t):
        if has_accel:
            planes_ar = [ar_ref[k : k + 1, :] for k in range(NS)]
            adj = stencil_math.accel_planes(
                planes_ar, fluid_ar, ar_mask, F32(w1a), F32(w2a)
            )
        # Old row 0: block nb-1's wrap read after block 0 overwrote it.
        save0 = [deq(f_ref[k, 0:1, :], k) for k in range(NS)]
        carry = None  # old row r0-1 for the current block (value)

        def window(k, r0, carry_k):
            # Same assembly as _inplace_blocked_kernel minus the static
            # accel substitution (the driven row is positional here).
            # Every part is dequantized at read, so the concat (and the
            # lane rotation after it) runs on f32 regardless of storage.
            cy = lattice.CY[k]
            parts = []
            run_start = None
            for j in range(r0 - cy, r0 + B - cy):
                jm = j % ext
                single = jm != j or j == r0 - 1
                if single:
                    if run_start is not None:
                        parts.append(deq(f_ref[k, run_start:j, :], k))
                        run_start = None
                    if j == ext:  # wrap above the top block: old row 0
                        parts.append(save0[k])
                    elif j == r0 - 1 and r0 > 0:  # overwritten below-row
                        parts.append(carry_k)
                    else:  # j == -1 -> old row ext-1 (still old at block 0)
                        parts.append(deq(f_ref[k, jm : jm + 1, :], k))
                elif run_start is None:
                    run_start = j
            if run_start is not None:
                parts.append(deq(f_ref[k, run_start : r0 + B - cy, :], k))
            if len(parts) == 1 and lattice.CX[k] != 0:
                p = parts[0]  # Mosaic: canonical layout for the rotation
                parts = [p[:-1], p[-1:]]
            w = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
            # Dynamic driven-row injection: substitute the accel-adjusted
            # row wherever this window's positional mask fires — the exact
            # values the monolithic kernel's masked accel_planes produces.
            if has_accel and k not in (0, 2, 4):  # 0/2/4 are unchanged
                w = jnp.where(m_cy[cy][r0 : r0 + B], adj[k], w)
            return fused_pallas._roll_x(w, lattice.CX[k])

        tot = None
        for i in range(nb):
            r0 = i * B
            obst_blk = _mask_f32(obst_ref[r0 : r0 + B, :]) != F32(0.0)
            streamed = [
                window(k, r0, carry[k] if carry else None) for k in range(NS)
            ]
            # Old top row of this block — the next block's below-row.
            carry = [
                deq(f_ref[k, r0 + B - 1 : r0 + B, :], k) for k in range(NS)
            ]
            out, partial = stencil_math.collide_and_av_rows(
                streamed, obst_blk, F32(omega),
                row_mask=central[r0 : r0 + B],
            )
            for k in range(NS):
                f_ref[k, r0 : r0 + B, :] = enq(out[k], k)

            # Refresh the driven-row scratch from the block that stores it
            # (post-step values feed the NEXT step's injection).  Only that
            # block executes the masked extraction; the operands are its
            # already-live outputs — passed through the storage codec so
            # the injected row equals what a re-read of the stored state
            # would give (i16: the quantized value, keeping the scratch
            # consistent with every other read of that row).
            if has_accel:
                @pl.when(has_ar[i])
                def _(out=out, r0=r0):
                    sl = arow_f[r0 : r0 + B]
                    for k in range(NS):
                        ar_ref[k : k + 1, :] = jnp.sum(
                            deq(enq(out[k], k), k) * sl, axis=0, keepdims=True
                        )

            tot = partial if tot is None else tot + partial
        av_write(t, jnp.sum(tot, dtype=F32))

    def body(t, _):
        one_step(t)
        return 0

    lax.fori_loop(0, K, body, 0)


def _ca_inplace_kernel(
    row_off_ref,  # (1, 1) int32 SMEM: global row of local row 0
    fin_ref,  # (9, ext, nx) VMEM in — ALIASED into f_ref; never touched
    obst_ref,  # (ext, nx) f32 VMEM in (K-deep ghost-extended)
    f_ref,  # (9, ext, nx) VMEM out == the live slab, updated in place
    av_ref,  # (K, 1) f32 SMEM out
    ar_ref,  # (16, nx) f32 VMEM scratch: rows 0-8 = driven-row planes
    *,
    K: int,
    nloc: int,
    block_rows: int,
    ny_global: int,
    omega: float,
    accel_row: int,
    w1a: float,
    w2a: float,
    storage: str = "f32",
    density: float = 0.0,
):
    del fin_ref  # aliased into f_ref (one name => Mosaic sees every
    # read-write dependency in program order)

    def av_write(t, value):
        av_ref[t, 0] = value

    _inplace_slab_sweep(
        f_ref, obst_ref, ar_ref, row_off_ref[0, 0] - K, av_write,
        K=K, nloc=nloc, block_rows=block_rows, ny_global=ny_global,
        omega=omega, accel_row=accel_row, w1a=w1a, w2a=w2a,
        storage=storage, density=density,
    )


def make_ca_inplace_runner(
    params: LBMParams,
    nloc: int,
    nx: int,
    K: int,
    ny_global: int,
    interpret: bool | None = None,
    block_rows: int | None = None,
    mask_i8: bool | None = None,
    parts: int | None = None,
    storage: str = "f32",
):
    """Build the in-place blocked exact-ca per-shard sweep:
    ``(f, ghost_lo (9,K,nx), ghost_hi (9,K,nx), obst_ext, row_offset)
    -> (f', tot_u (K,))`` — drop-in for make_ca_chunk_runner /
    temporal_pallas.make_slab_sweep.

    ``mask_i8``: None follows the capacity plan (_ca_inplace_plan drops the
    obstacle mask to int8 only when the f32 mask does not fit); True/False
    force the encoding for parity tests and measurement scripts.

    ``parts``: None follows :func:`ca_inplace_parts` (1 when the whole
    shard fits the VMEM band, else the smallest fitting sub-slab split);
    an explicit count forces it.  Split sweeps run ONE compiled sub-shard
    kernel ``parts`` times with K-deep ghosts sliced from the pre-sweep
    state (fields bitwise vs the unsplit sweep; av partials sum in part
    order — the documented ~1-ulp float-sum grouping contract).

    ``storage='i16'`` takes/returns the quantized int16 state and ghost
    rows (ops/quant.py): half the resident VMEM and HALF the exchanged
    halo bytes on the ICI ring.  Per-STEP quantization (the grid-level
    in-place i16 kernel's contract) — agrees with the slab i16 ca engine
    (once-per-sweep quantization) within the quantization envelope, not
    bitwise."""
    if storage not in ("f32", "i16"):
        raise ValueError(f"unknown storage {storage!r}; use 'f32' or 'i16'")
    if parts is None:
        parts = ca_inplace_parts(nloc, nx, K, ny_global, storage)
        if parts is None:
            raise ValueError(
                f"shard {nloc}x{nx} at depth K={K} does not fit the "
                "in-place ca sweep (no sub-slab split maps either)"
            )
    if parts > 1:
        if nloc % parts or not _ca_inplace_maps_whole(
            nloc // parts, nx, K, ny_global, storage
        ):
            raise ValueError(
                f"cannot split a {nloc}x{nx} shard into {parts} in-place "
                f"ca sub-sweeps at depth K={K}"
            )
        sub = nloc // parts
        inner = make_ca_inplace_runner(
            params, sub, nx, K, ny_global,
            interpret=interpret, block_rows=block_rows, mask_i8=mask_i8,
            parts=1, storage=storage,
        )

        def _rows(f, ghost_lo, ghost_hi, a, b):
            # Rows [a, b) of the virtual (ghost_lo | f | ghost_hi) slab
            # WITHOUT materializing it: every part's inputs are direct
            # slices of the caller's arrays (the first split build paid an
            # extra full-slab concat + re-slice round-trip through HBM —
            # ~35 us/step at 1024x2048 — before the inner concat).
            pieces = []
            if a < K:
                pieces.append(ghost_lo[:, a : min(b, K), :])
            if b > K and a < K + nloc:
                pieces.append(f[:, max(a - K, 0) : b - K, :])
            if b > K + nloc:
                pieces.append(ghost_hi[:, max(a - K - nloc, 0) : b - K - nloc, :])
            return pieces[0] if len(pieces) == 1 else jnp.concatenate(
                pieces, axis=1
            )

        def run_split(f, ghost_lo, ghost_hi, obst_ext, row_offset):
            outs = []
            av = None
            for i in range(parts):
                r = i * sub
                out_i, av_i = inner(
                    _rows(f, ghost_lo, ghost_hi, K + r, K + r + sub),
                    _rows(f, ghost_lo, ghost_hi, r, r + K),
                    _rows(f, ghost_lo, ghost_hi, K + r + sub, 2 * K + r + sub),
                    obst_ext[r : r + sub + 2 * K, :],
                    row_offset + i * sub,
                )
                outs.append(out_i)
                av = av_i if av is None else av + av_i
            return jnp.concatenate(outs, axis=1), av

        return run_split
    if not _ca_inplace_maps_whole(nloc, nx, K, ny_global, storage):
        raise ValueError(
            f"shard {nloc}x{nx} at depth K={K} does not fit the in-place "
            "ca sweep"
        )
    if interpret is None:
        interpret = _use_interpret()
    state_bytes = 2 if storage == "i16" else 4
    state_dtype = jnp.int16 if storage == "i16" else jnp.float32
    plan_limit, plan_mask_i8 = _ca_inplace_plan(nloc, nx, K, storage)
    if mask_i8 is None:
        mask_i8 = plan_mask_i8
    limit = plan_limit or None
    mask_dtype = jnp.int8 if mask_i8 else jnp.float32
    ext = nloc + 2 * K
    if block_rows is not None:
        # A forced block height re-derives its own band: the plan's limit
        # assumed the B=8 minimal footprint.  72/88 stay reachable HERE
        # (experiment escape hatch, scripts/exp_ca_engine.py) even though
        # the auto plan caps at 48 — the wider bands hang/500 the compile
        # helper at the shapes auto would route there.  (i16 keeps the
        # tighter grid-kernel refs ceiling and tops out at 72.)
        need = _ca_inplace_need(
            ext, nx, block_rows, 1 if mask_i8 else 4, state_bytes
        )
        bands = (
            (vmem.DEFAULT_LIMIT_MB, 48, 72)
            if storage == "i16"
            else (vmem.DEFAULT_LIMIT_MB, 48, 72, 88)
        )
        ceiling = (
            _INPLACE_I16_REF_CEILING
            if storage == "i16"
            else _INPLACE_REF_CEILING
        )
        for mb in bands:
            if need <= min(mb * 2**20, ceiling):
                limit = None if mb == vmem.DEFAULT_LIMIT_MB else mb
                break
        else:
            raise ValueError(
                f"forced block_rows={block_rows} needs "
                f"{need / 2**20:.1f} MiB — past every verified band"
            )
    w1a, w2a = lattice.accel_weights(params.density, params.accel)
    kernel = functools.partial(
        _ca_inplace_kernel,
        K=K,
        nloc=nloc,
        block_rows=block_rows
        or _ca_pick_block_rows(
            ext, nx, limit, 1 if mask_i8 else 4, state_bytes
        ),
        ny_global=ny_global,
        omega=float(params.omega),
        accel_row=params.accel_row,
        w1a=float(w1a),
        w2a=float(w2a),
        storage=storage,
        density=float(params.density),
    )
    call = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((NS, ext, nx), state_dtype),
            jax.ShapeDtypeStruct((K, 1), jnp.float32),
        ),
        input_output_aliases={1: 0},
        scratch_shapes=[pltpu.VMEM((16, nx), jnp.float32)],
        interpret=interpret,
        **vmem.compiler_params(limit),
        cost_estimate=pl.CostEstimate(
            flops=K * 130 * ext * nx,
            bytes_accessed=2 * NS * ext * nx * state_bytes,
            transcendentals=K * ext * nx,
        ),
    )

    def run_sweep(f, ghost_lo, ghost_hi, obst_ext, row_offset):
        row_off = jnp.asarray(row_offset, dtype=jnp.int32).reshape(1, 1)
        ext_f = jnp.concatenate([ghost_lo, f, ghost_hi], axis=1)
        new_ext, av = call(row_off, ext_f, obst_ext.astype(mask_dtype))
        return new_ext[:, K : K + nloc, :], av[:, 0]

    return run_sweep
