"""K-step temporal-blocking Pallas kernel: K timesteps per HBM sweep.

The block kernel (ops/fused_pallas.py) is bound by the f read+write streams:
beyond the chip's ~75 MB fast-memory regime the measured streaming rate is
~300-400 GB/s, and removing any other stream (obstacles, ghost groups) or
even all collision arithmetic does not change its step time.  The only way
to go faster is to move fewer bytes per step.

This kernel advances each VMEM-resident block K timesteps in one sweep, so
the f arrays cross HBM once per K steps instead of once per step — the
temporal analog of the reference's fused-sweep optimization
(OpenMP/d2q9-bgk.c:260-498 fuses all per-step passes into one memory sweep;
here K whole steps fuse into one sweep).  Traffic per step drops ~K-fold at
the cost of a slightly larger ghost fetch and K-1 small boundary-row
recomputations per block.

Dataflow (view rows; one original row = ``fold`` view rows, F below):

- level 0 is the input state x = f(t); level l is f(t+l); the block owns
  output rows [iB, iB+B) of level K;
- level l is computed over rows [iB, iB+B+(K-l)F): each level keeps (K-l)
  extra original rows ABOVE the body, feeding level l+1's top row.  The
  level-0 upper rows ride the pipeline as the same aligned modular-indexed
  ghost-group fetch the single-step kernel uses;
- the F view rows just BELOW the block at every level are carried in VMEM
  scratch from block i-1 (grid steps run sequentially), one carry ref per
  level — the temporal generalization of the single-step kernel's
  ghost-row scratch;
- block 0 has no carries: the rows below it are the periodic wrap rows at
  the TOP of the grid, whose level-l values are not computed yet this
  sweep.  They are recomputed locally from the last K original rows of x
  (``lo_ref``) via a small triangular seam chain — bitwise identical to the
  values the last block will produce, since the inputs and operation order
  are identical;
- per-level |u| partials accumulate into a (K, 1) SMEM cell; the sweep
  returns one tot_u per timestep, bitwise-summed in block order.

All cell math is ops/stencil_math.py, so fields stay bitwise-identical to K
applications of the jnp / single-step Pallas step (tested).  With
``storage='i16'`` only the HBM state is int16 fixed-point (ops/quant.py);
every intermediate level stays f32 in VMEM, so quantization error is paid
once per K steps instead of every step.
"""

from __future__ import annotations

import functools
import math

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
LANE = fused_pallas.LANE

# Scoped-VMEM budget (bytes): margin under the 16 MiB hardware limit.
_VMEM_BUDGET = int(15.2 * 1024 * 1024)


def _align8(n: int) -> int:
    return ((n + 7) // 8) * 8


def _obst_rows(b: int, K: int, F: int) -> int:
    """Aligned obstacle-block rows: [body b | above K*F | lo F | seam K*F]."""
    return _align8(b + 2 * K * F + F)


def _footprint(b: int, nx: int, K: int, F: int, f_bytes: int) -> int:
    """Estimated scoped-VMEM bytes at block height ``b`` (calibrated like
    fused_pallas._kernel_footprint: pipeline double buffers + the live
    f32 level-chain values)."""
    KF = K * F
    G = _align8(KF)
    return (
        # pipeline: 2x body in, 2x body out, 2x ghost group, lo_ref
        f_bytes * NS * nx * (4 * b + 2 * G + KF)
        # live f32 chain: ~4 buffers of (b + KF) rows (piece, streamed, out)
        + 4 * NS * (b + KF) * nx * 4
        # obstacle double buffer + per-level carries
        + 2 * _obst_rows(b, K, F) * nx * 4
        + NS * K * F * nx * 4
    )


# Measured-good block heights per (storage, fold, K) at nx_v=1024 on v5e.
# The analytic footprint model is deliberately conservative (Mosaic's actual
# stack allocation reuses chain buffers it cannot predict); these configs
# were compile- and run-verified, and each larger-B entry measured faster
# than its conservative-B fallback (BENCHMARKS.md).  OOM-verified rejects:
# f32 fold=2 K=8 B=64 (16.64M), i16 fold=4 K=8 B=64 (17.85M).
_TUNED_B = {
    ("f32", 1, 2): 64,
    ("f32", 2, 4): 64,
    ("i16", 2, 4): 64,
    ("i16", 2, 8): 64,
    ("i16", 4, 4): 64,
}


def _plan(
    n_rows: int,
    nx: int,
    K: int,
    clone_nx: int | None = None,
    storage: str = "f32",
):
    """Choose (fold, rows_v, nx_v, G, block_rows); raises ValueError when no
    layout fits VMEM."""
    fold = 1 if clone_nx is not None else fused_pallas._fold_factor(nx)
    rows_v, nx_v = n_rows * fold, nx // fold
    G = _align8(K * fold)
    # Blocks must also start at fold-group boundaries (lane rotations phase
    # iota%F from the piece start — see fused_pallas.pick_block_rows); for
    # power-of-2 folds lcm(G, fold) == G, so measured configs are unchanged.
    align = math.lcm(G, fold)
    tuned = _TUNED_B.get((storage, fold, K))
    if tuned and nx_v == 1024 and rows_v % tuned == 0 and tuned % align == 0:
        return fold, rows_v, nx_v, G, tuned
    best = None
    for b in range(align, rows_v + 1, align):
        if rows_v % b:
            continue
        if _footprint(b, nx_v, K, fold, 4) <= vmem.scale(_VMEM_BUDGET):
            best = b
        else:
            break
    if best is None:
        raise ValueError(
            f"no {align}-aligned row block of a {n_rows}x{nx} grid fits the "
            f"VMEM budget for the K={K} temporal kernel"
        )
    return fold, rows_v, nx_v, G, best


def supports(
    params: LBMParams,
    K: int,
    clone_nx: int | None = None,
    storage: str = "f32",
) -> bool:
    """True when the K-step sweep can map this grid.

    Beyond the block-kernel constraints, the driven row must not sit in the
    first K rows: the last block's wrapped upper ghost rows reuse the plain
    global-row arithmetic, which only stays exact when the accel row cannot
    appear among wrapped rows (it is ny-2 in every reference scene)."""
    if K < 2 or params.nx % LANE != 0:
        return False
    if params.accel_row < K or params.ny < 2 * K:
        return False
    try:
        _plan(params.ny, params.nx, K, clone_nx, storage)
    except ValueError:
        return False
    return True


def _sweep_kernel(
    rows_ref,  # (1, 2) int32 SMEM: [global ORIGINAL row of local row 0,
    #            global ORIGINAL row of lo_ref's first row]
    f_ref,  # (NS, B, nx_v) VMEM: level-0 body rows (auto-pipelined)
    ghi_ref,  # (NS, G, nx_v) VMEM: ghost group starting at view row (i+1)B
    lo_ref,  # (NS, K*F, nx_v) VMEM: the K original rows BELOW the shard
    #          (single device: the wrap rows, i.e. the last K rows of x)
    hi_ref,  # (NS, K*F, nx_v) VMEM: the K original rows ABOVE the shard
    #          (single device: the wrap rows, i.e. the first K rows of x);
    #          selected by the top block in place of the wrapped ghost group
    obst_ref,  # (1, P, nx_v) VMEM: [body B | above KF | lo F | seam KF | pad]
    out_ref,  # (NS, B, nx_v) VMEM: level-K body rows
    av_ref,  # (K, 1) f32 SMEM: per-level |u| accumulators
    *carries,  # K VMEM scratch refs (NS, F, nx_v): level-l rows [iB-F, iB)
    block_rows: int,
    K: int,
    fold: int,
    omega: float,
    accel_row: int,
    w1a: float,
    w2a: float,
    clone_nx: int | None = None,
    storage: str = "f32",
    density: float = 0.0,
):
    i = pl.program_id(0)
    nb = pl.num_programs(0)
    B = block_rows
    F = fold
    KF = K * F
    start = pl.multiple_of(i * B, B)
    row_off = rows_ref[0, 0]
    lo_row0 = rows_ref[0, 1]
    at_lo_edge = i == 0
    at_hi_edge = i == nb - 1

    deq, enq = quant.plane_codec(storage, density)
    w1 = F32(w1a)
    w2 = F32(w2a)
    om = F32(omega)

    def refresh_clones(planes):
        # Lane padding: clone columns refreshed at EVERY level (the next
        # level's lane rotation reads them); shared with the single-step
        # kernel's output-write refresh.
        return fused_pallas.refresh_clone_planes(planes, clone_nx)

    # --- gather level-0 pieces -------------------------------------------
    body = [deq(f_ref[k], k) for k in range(NS)]
    up = [
        deq(jnp.where(at_hi_edge, hi_ref[k], ghi_ref[k, 0:KF]), k)
        for k in range(NS)
    ]
    piece = [jnp.concatenate([body[k], up[k]], axis=0) for k in range(NS)]
    seam_prev = [deq(lo_ref[k], k) for k in range(NS)]  # x below the shard

    obst_body_above = obst_ref[0, 0 : B + KF, :]  # rows [iB, iB+B+KF)
    obst_lo = obst_ref[0, B + KF : B + KF + F, :]  # rows [iB-F, iB)
    # Obstacles of the K rows below the shard (single device: the wrap rows)
    obst_seam = obst_ref[0, B + KF + F : B + KF + F + KF, :]

    # Original-row index of piece row r (the top block's ghost rows of a
    # PERIODIC grid evaluate out of range, which is safe: supports()
    # guarantees the accel row is not among the first K rows).
    piece_iota = jax.lax.broadcasted_iota(jnp.int32, (B + KF, 1), 0)
    piece_org = row_off + (start + piece_iota) // F
    seam_iota = jax.lax.broadcasted_iota(jnp.int32, (KF, 1), 0)
    seam_org = lo_row0 + seam_iota // F

    def seam_step(s_prev, first_rows):
        """Advance the KF-row seam strip one level: the level-l values of
        the last K original rows from the level-(l-1) strip plus the main
        chain's level-(l-1) rows [iB, iB+F).

        Runs ONLY at block 0 (under pl.when): the strip is dead weight for
        every other block, and tracing it unconditionally costs nb times
        its work per sweep (measured: it erased most of the temporal win).

        The strip keeps a fixed KF-row shape; validity shrinks by F rows
        per level from the BOTTOM (the lowest lF rows after l steps are
        garbage, refilled from the strip's own bottom rows), which leaves
        exactly the (K-l)F rows a block-0 consumer at level l+1 needs.  The
        valid rows are bitwise identical to the values the last block
        computes for the same rows, since inputs and operation order match.

        Mosaic layout note (applies to the main chain too): every input to
        the lane rotation must carry the canonical vector layout, so each
        row window is materialized as a two-part row-concatenate rather
        than a raw offset slice."""
        in_s = [
            jnp.concatenate([s_prev[k], first_rows[k]], axis=0)
            for k in range(NS)
        ]
        obst_in = jnp.concatenate([obst_seam, obst_body_above[:F]], axis=0)
        org_in = jnp.concatenate([seam_org, piece_org[:F]], axis=0)
        acc = stencil_math.accel_planes(
            in_s, obst_in < F32(0.75), org_in == accel_row, w1, w2
        )
        streamed = []
        for k in range(NS):
            cy = lattice.CY[k]
            if cy == 1:
                rows = jnp.concatenate(
                    [acc[k][:F], acc[k][: KF - F]], axis=0
                )
            elif cy == -1:
                rows = jnp.concatenate(
                    [acc[k][F:KF], acc[k][KF : KF + F]], axis=0
                )
            else:
                rows = acc[k][:KF]
            streamed.append(fused_pallas._fold_roll_x(rows, lattice.CX[k], F))
        rho, u_x, u_y = stencil_math.moments(streamed)
        u_sq = u_x * u_x + u_y * u_y
        s_l = stencil_math.collide(
            streamed, obst_seam > F32(0.25), om, rho, u_x, u_y, u_sq
        )
        return refresh_clones(s_l)

    # --- level chain ------------------------------------------------------
    # Entering level l, ``piece`` holds level l-1 over rows
    # [iB, iB+B+(K-l+1)F); the level-(l-1) wrap strip sits in seam_ref
    # (written by block 0 at the previous level; level 1 reads lo_ref
    # directly).  Carries update AFTER consumption so block i+1 reads this
    # block's level-(l-1) boundary row.
    seam_ref = carries[K]
    for l in range(1, K + 1):
        T = B + (K - l) * F
        R = T + F  # rows of the incoming piece
        carry = carries[l - 1]
        seam_prev = (
            seam_prev if l == 1 else [seam_ref[k] for k in range(NS)]
        )
        lo = [
            jnp.where(at_lo_edge, seam_prev[k][-F:], carry[k])
            for k in range(NS)
        ]
        lo_org = jnp.where(
            at_lo_edge, lo_row0 + K - 1, row_off + start // F - 1
        )
        lo_is_accel = lo_org == accel_row
        lo_fluid = (
            jnp.where(at_lo_edge, obst_seam[KF - F :], obst_lo) < F32(0.75)
        )
        first_rows = [piece[k][:F] for k in range(NS)]
        for k in range(NS):
            carry[k] = piece[k][B - F : B]

        acc = stencil_math.accel_planes(
            piece, obst_body_above[:R] < F32(0.75),
            piece_org[:R] == accel_row, w1, w2,
        )
        lo_acc = stencil_math.accel_planes(lo, lo_fluid, lo_is_accel, w1, w2)
        streamed = []
        for k in range(NS):
            cy = lattice.CY[k]
            if cy == 1:
                rows = jnp.concatenate([lo_acc[k], acc[k][: T - F]], axis=0)
            elif cy == -1:
                # Two-part concat (not a raw [F : T+F] slice): lane rotation
                # requires the canonical layout a concatenate produces.
                rows = jnp.concatenate(
                    [acc[k][F:T], acc[k][T : T + F]], axis=0
                )
            else:
                rows = acc[k][:T]
            streamed.append(fused_pallas._fold_roll_x(rows, lattice.CX[k], F))
        rho, u_x, u_y = stencil_math.moments(streamed)
        u_sq = u_x * u_x + u_y * u_y
        obst_T = obst_body_above[:T]
        out = stencil_math.collide(
            streamed, obst_T > F32(0.25), om, rho, u_x, u_y, u_sq
        )
        piece = refresh_clones(out)
        # av-fluid excludes walls AND clone columns (encoding 0.5), unlike
        # the accel-fluid mask (< 0.75) which lets clones take the injection.
        partial = stencil_math.speed_sum(
            u_sq[:B], jnp.logical_not(obst_T[:B] > F32(0.25))
        )

        @pl.when(i == 0)
        def _():
            av_ref[l - 1, 0] = partial

        @pl.when(i != 0)
        def _():
            av_ref[l - 1, 0] = av_ref[l - 1, 0] + partial

        if l < K:

            @pl.when(i == 0)
            def _(s_prev=seam_prev, fr=first_rows):
                s_new = seam_step(s_prev, fr)
                for k in range(NS):
                    seam_ref[k] = s_new[k]

    for k in range(NS):
        out_ref[k] = enq(piece[k], k)


def _block_obstacles(
    obst_v: np.ndarray, B: int, K: int, F: int
) -> np.ndarray:
    """Per-block aligned obstacle layout (nb, P, nx_v) float32:
    [body B | above K*F | lo F | seam K*F | pad]."""
    rows_v, nx_v = obst_v.shape
    nb = rows_v // B
    KF = K * F
    P = _obst_rows(B, K, F)
    ext = np.concatenate([obst_v, obst_v, obst_v], axis=0)  # wrap both ways
    out = np.zeros((nb, P, nx_v), dtype=np.float32)
    for i in range(nb):
        s = rows_v + i * B  # body start inside ext
        out[i, 0 : B + KF] = ext[s : s + B + KF]
        out[i, B + KF : B + KF + F] = ext[s - F : s]
        out[i, B + KF + F : B + KF + F + KF] = obst_v[rows_v - KF :]
    return out


def make_sweep(
    params: LBMParams,
    obstacles: np.ndarray,
    K: int,
    interpret: bool | None = None,
    clone_cols_nx: int | None = None,
    folded_io: bool = False,
    storage: str = "f32",
):
    """Build ``f -> (f_after_K_steps, tot_u (K,))`` for a periodic grid.

    With ``folded_io`` the state arrives and stays in the folded
    (9, ny*F, 1024) view.  ``storage='i16'`` stores HBM state as int16
    fixed-point; intermediate levels stay f32 (ops/quant.py)."""
    ny, nx = obstacles.shape
    if not supports(params, K, clone_cols_nx, storage=storage):
        raise ValueError(
            f"temporal kernel (K={K}, {storage}) cannot map a {ny}x{nx} grid"
        )
    call, F, rows_v, nx_v, B = _build_sweep_call(
        params, ny, nx, K, interpret, clone_cols_nx, storage
    )
    if folded_io and F == 1:
        raise ValueError("folded_io requires a foldable width (nx = F*1024)")
    if F > 1 and not folded_io:
        raise ValueError(
            "F>1 requires folded_io=True (pass the (9, ny*F, nx/F) view)"
        )
    KF = K * F

    obst_f = (
        fused_pallas.clone_col_encoding(obstacles, clone_cols_nx)
        if clone_cols_nx is not None
        else obstacles.astype(np.float32)
    )
    obst_v = obst_f.reshape(rows_v, nx_v)
    obst_blocks = jnp.asarray(_block_obstacles(obst_v, B, K, F))
    # [row of local row 0, row of lo_ref's first row]: periodic wrap ghosts.
    rows_smem = jnp.asarray([[0, params.ny - K]], dtype=jnp.int32)

    def sweep(f):
        new_f, tot = call(
            rows_smem, f, f, f[:, rows_v - KF :, :], f[:, :KF, :], obst_blocks
        )
        return new_f, tot[:, 0]

    return sweep


def _build_sweep_call(
    params: LBMParams,
    n_rows: int,
    nx: int,
    K: int,
    interpret: bool | None,
    clone_nx: int | None,
    storage: str,
):
    """Shared pallas_call builder for the periodic (make_sweep) and shard
    (make_slab_sweep) wrappers.  Returns (call, F, rows_v, nx_v, B) where
    ``call(rows_smem, f, f, lo, hi, obst_blocks) -> (f', tot (K, 1))``."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    F, rows_v, nx_v, G, B = _plan(n_rows, nx, K, clone_nx, storage)
    nb = rows_v // B
    w1a, w2a = lattice.accel_weights(params.density, params.accel)

    gB = B // G
    nG = rows_v // G
    ghi_spec = pl.BlockSpec(
        (NS, G, nx_v), lambda i: (0, (i * gB + gB) % nG, 0),
        memory_space=pltpu.VMEM,
    )

    kernel = functools.partial(
        _sweep_kernel,
        block_rows=B,
        K=K,
        fold=F,
        omega=float(params.omega),
        accel_row=params.accel_row,
        w1a=float(w1a),
        w2a=float(w2a),
        clone_nx=clone_nx,
        storage=storage,
        density=float(params.density),
    )
    f_dtype = jnp.int16 if storage == "i16" else jnp.float32
    f_bytes = 2 if storage == "i16" else 4
    P = _obst_rows(B, K, F)

    call = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # rows (1, 2)
            pl.BlockSpec(
                (NS, B, nx_v), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            ),
            ghi_spec,
            pl.BlockSpec(memory_space=pltpu.VMEM),  # lo_ref (NS, KF, nx_v)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # hi_ref (NS, KF, nx_v)
            pl.BlockSpec(
                (1, P, nx_v), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (NS, B, nx_v), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((K, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ),
        scratch_shapes=(
            # K per-level boundary-row carries + the block-0 seam strip.
            [pltpu.VMEM((NS, F, nx_v), jnp.float32) for _ in range(K)]
            + [pltpu.VMEM((NS, K * F, nx_v), jnp.float32)]
        ),
        out_shape=(
            jax.ShapeDtypeStruct((NS, rows_v, nx_v), f_dtype),
            jax.ShapeDtypeStruct((K, 1), jnp.float32),
        ),
        interpret=interpret,
        **vmem.compiler_params(),
        cost_estimate=pl.CostEstimate(
            flops=K * 160 * n_rows * nx,
            bytes_accessed=2 * NS * n_rows * nx * f_bytes + n_rows * nx * 4,
            transcendentals=K * n_rows * nx,
        ),
    )
    return call, F, rows_v, nx_v, B


def supports_shard(
    params: LBMParams, nloc: int, nx: int, K: int, clone_nx: int | None = None
) -> bool:
    """Whether the K-step slab sweep can map an nloc-row shard."""
    if K < 2 or nx % LANE != 0:
        return False
    if params.accel_row < K or nloc < K:
        return False
    try:
        _plan(nloc, nx, K, clone_nx)
    except ValueError:
        return False
    return True


def make_slab_sweep(
    params: LBMParams,
    nloc: int,
    nx: int,
    K: int,
    interpret: bool | None = None,
    clone_cols_nx: int | None = None,
    storage: str = "f32",
    ny_global: int | None = None,
):
    """Sharded per-shard K-step sweep for the communication-avoiding mode:

    ``(f_shard, lo, hi, obst_ext, row_offset) -> (f', tot_u (K,))``

    where lo/hi are the K original rows adjacent to the shard (exchanged
    once per sweep) and obst_ext is the (nloc + 2K, nx) ghost-extended
    obstacle slab.  Advancing K exact steps from K-deep raw halos is the
    standard communication-avoiding stencil schedule: the boundary levels
    are recomputed locally (the kernel's seam chain for the lower edge, the
    in-piece upper strips for the top), so results are bitwise-identical to
    K synchronous exchanged steps."""
    if not supports_shard(params, nloc, nx, K, clone_cols_nx):
        raise ValueError(
            f"temporal slab sweep (K={K}) cannot map a {nloc}x{nx} shard"
        )
    call, F, rows_v, nx_v, B = _build_sweep_call(
        params, nloc, nx, K, interpret, clone_cols_nx, storage
    )
    KF = K * F
    nb = rows_v // B
    P = _obst_rows(B, K, F)
    pad = jnp.zeros((P - (B + 2 * KF + F), nx_v), dtype=jnp.float32)

    ny_g = ny_global if ny_global is not None else params.ny

    def sweep(f_shard, lo, hi, obst_ext, row_offset):
        off = jnp.asarray(row_offset, dtype=jnp.int32)
        # Shard 0's lo rows are the global wrap rows at the TOP of the grid:
        # the seam chain's accel masks need their TRUE indices (the driven
        # row ny-2 is always among them for K >= 2), so the base wraps
        # modulo the global row count.
        rows_smem = jnp.stack([off, (off - K) % ny_g]).reshape(1, 2)
        if F > 1:
            # Row-major fold (a relayout copy on TPU, amortized over the
            # K-step sweep; hot sharded paths should pre-fold upstream).
            f_shard = f_shard.reshape(NS, rows_v, nx_v)
            lo = lo.reshape(NS, KF, nx_v)
            hi = hi.reshape(NS, KF, nx_v)
        # obst_ext view rows: [0, KF) below, [KF, KF+rows_v) shard,
        # [KF+rows_v, 2KF+rows_v) above.
        ob = obst_ext.astype(jnp.float32).reshape((nloc + 2 * K) * F, nx_v)
        obst_blocks = jnp.stack(
            [
                jnp.concatenate(
                    [
                        ob[KF + i * B : KF + (i + 1) * B + KF],  # body+above
                        ob[KF + i * B - F : KF + i * B],  # lo F rows
                        ob[0:KF],  # the K rows below the shard
                        pad,
                    ],
                    axis=0,
                )
                for i in range(nb)
            ]
        )
        new_f, tot = call(rows_smem, f_shard, f_shard, lo, hi, obst_blocks)
        if F > 1:
            new_f = new_f.reshape(NS, nloc, nx)
        return new_f, tot[:, 0]

    return sweep


def pick_k(params: LBMParams, storage: str = "f32") -> int:
    """Depth heuristic, from measured v5e rates (BENCHMARKS.md).

    - DRAM-bound (>80 MB working set): temporal blocking wins big (2048^2
      f32: 14.5k vs 4.1k MLUPS at K=8; 4096^2 i16: 16.4k vs 8.4k at K=4).
      Deep folds cap the depth at 4: K=8 at fold 4 needs a 32-row ghost
      group that leaves no useful block size.
    - With the skewed pair (the auto impl since round 3 —
      modes.temporal_impl_choice), K=4 wins from 512^2 through 4096^2 f32
      (512^2 13.7k, 768^2 15.2k, 1024^2 15.3k vs 11.7-12.1k single-step
      same-session, 4096^2 19.3k vs 15.1k at K=8 whose B=16 blocks go
      compute-bound); 2048^2 K=8 ties K=4 (16.4k/16.2k) so fold<=2 keeps
      K=8.  The 1024^2 balance point that forbade the trapezoid
      (single-step won there) flips ON with the pair.
    - Where only the trapezoid maps, the old table still holds: the
      1024^2-class balance point stays single-step and cached grids keep
      K=2 (512^2: 12.7k vs 10.4k; 768^2: 14.9k vs 13.8k).
    - i16 has its own measured K-table (round 3, same-session controls):
      1024^2 K=4 16.4k vs K=2 13.0k vs K=1 11.0k; 768^2 K=2 13.1k vs K=1
      10.5k; 1536^2 K=2 15.5k vs the deep-sweep 12.5k; 2048^2 keeps K=8
      (19.2k); 512^2 stays single-step.

    Override with LBM_TEMPORAL_K (1 disables)."""
    import os

    env = os.environ.get("LBM_TEMPORAL_K")
    if env:
        return int(env)
    f_bytes = 2 if storage == "i16" else 4
    working_set = 2 * NS * params.ny * params.nx * f_bytes
    mib = 1024 * 1024
    if fused_pallas._fold_factor(params.nx) >= 8:
        # Measured negative result (round 3, 8192² under the old fold-8
        # layout, same session): the temporal kernels COLLAPSE at fold 8 —
        # skew K=4 154 MLUPS, K=2 360, i16 K=4 230, vs the single-step
        # block kernel's 1966 (the expected DRAM rate for that session).
        # At F=8 the VMEM budget forces B=16 view rows, so the per-level
        # carry (2F=16) equals the whole window: ≥3x window amplification
        # and 64 KB DMAs.  8192² itself now auto-folds F=4 @2048 lanes
        # (fused_pallas._fold_factor), where skew K=4 measured 14,733;
        # this guard still protects nx >= 16384 (F=8 @2048).
        return 1
    if storage == "i16":
        if working_set > 128 * mib:
            return 8 if fused_pallas._fold_factor(params.nx) <= 2 else 4
        if working_set > 80 * mib:
            return 2
        if working_set > 24 * mib:
            return 4
        return 2 if working_set > 12 * mib else 1
    if working_set > 80 * mib:
        return 8 if fused_pallas._fold_factor(params.nx) <= 2 else 4

    def _skew_maps(k: int) -> bool:
        from lbm_tpu.ops import skew_pallas  # local: avoid import cycle

        return skew_pallas.supports(params, k, storage=storage)

    if _skew_maps(4):
        return 4
    if working_set <= 64 * mib:
        return 2
    return 1


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
    scan over K-step sweeps plus single-step remainder launches (bitwise
    equal to num_steps single steps on fields)."""
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
