"""Shared per-cell D2Q9-BGK math, written for VPU economy.

Used by both the jnp step (ops/fused_jnp.py) and the Pallas kernel
(ops/fused_pallas.py) so the two backends produce bitwise-identical fields.

Two deviations from the literal reference expression order
(SerialCode/d2q9-bgk.c:306-458), both mathematically identical in exact
arithmetic and verified to stay far inside the 1% output tolerance over full
40000-step runs:

- **paired equilibria**: opposite directions share their quadratic term,
  ``d_equ(+-u) = A +- Bu`` with ``A = w*rho*(1 + 4.5u^2 - 1.5|u|^2)`` and
  ``Bu = w*rho*3u`` — half the arithmetic of evaluating the 2nd-order
  equilibrium separately per direction;
- **moment-reused av_velocity**: BGK conserves per-cell density and momentum
  (the equilibrium has the same first moments), so |u| for the per-step
  reduction is computed from the pre-collision moments instead of re-deriving
  them from post-collision distributions as the reference does
  (SerialCode/d2q9-bgk.c:409-458).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lbm_tpu.core import lattice

F32 = jnp.float32
NS = lattice.NSPEEDS


def accel_planes(planes, fluid, row_mask, w1, w2):
    """Driven-row injection on 9 (R, nx) planes.

    ``row_mask`` (R, 1) selects rows whose global index is the driven row;
    the guard requires a fluid cell whose three decremented west-side speeds
    stay positive (SerialCode/d2q9-bgk.c:216-246).
    """
    zero = F32(0.0)
    ok = (
        row_mask
        & fluid
        & (planes[3] - w1 > zero)
        & (planes[6] - w2 > zero)
        & (planes[7] - w2 > zero)
    )
    okf = ok.astype(F32)
    d1 = okf * w1
    d2 = okf * w2
    return [
        planes[0],
        planes[1] + d1,
        planes[2],
        planes[3] - d1,
        planes[4],
        planes[5] + d2,
        planes[6] - d2,
        planes[7] - d2,
        planes[8] + d2,
    ]


def moments(t):
    """Per-cell density and velocity from 9 distribution planes
    (SerialCode/d2q9-bgk.c:324-347)."""
    rho = ((((((((t[0] + t[1]) + t[2]) + t[3]) + t[4]) + t[5]) + t[6]) + t[7]) + t[8])
    u_x = ((t[1] + t[5] + t[8]) - (t[3] + t[6] + t[7])) / rho
    u_y = ((t[2] + t[5] + t[6]) - (t[4] + t[7] + t[8])) / rho
    return rho, u_x, u_y


def collide(t, obst, omega, rho, u_x, u_y, u_sq):
    """Bounce-back + paired-equilibrium BGK relaxation.

    ``t`` are the 9 streamed planes; obstacle cells receive mirrored streamed
    values (rebound, SerialCode/d2q9-bgk.c:279-304), fluid cells relax toward
    equilibrium (collision, SerialCode/d2q9-bgk.c:306-407).
    """
    one = F32(1.0)
    usq_term = u_sq * F32(1.5)
    w0rho = (F32(4.0 / 9.0) * rho)
    w1rho = (F32(1.0 / 9.0) * rho)
    w2rho = (F32(1.0 / 36.0) * rho)
    base = one - usq_term

    d_equ = [None] * NS
    d_equ[0] = w0rho * base
    for kp, km, u, wrho in (
        (1, 3, u_x, w1rho),
        (2, 4, u_y, w1rho),
        (5, 7, u_x + u_y, w2rho),
        (6, 8, u_y - u_x, w2rho),
    ):
        a = wrho * (base + F32(4.5) * (u * u))
        b = wrho * (F32(3.0) * u)
        d_equ[kp] = a + b
        d_equ[km] = a - b

    out = []
    for k in range(NS):
        relaxed = t[k] + omega * (d_equ[k] - t[k])
        if k == 0:
            out.append(jnp.where(obst, t[0], relaxed))
        else:
            out.append(jnp.where(obst, t[lattice.OPP[k]], relaxed))
    return out


def speed_sum(u_sq, fluid):
    """Sum over fluid cells of |u| = sqrt(u_sq)."""
    return jnp.sum(jnp.where(fluid, jnp.sqrt(u_sq), F32(0.0)), dtype=F32)


def collide_and_av(streamed, obst, omega):
    """Full post-stream cell update: returns (9 planes, tot_u partial)."""
    rho, u_x, u_y = moments(streamed)
    u_sq = u_x * u_x + u_y * u_y
    out = collide(streamed, obst, omega, rho, u_x, u_y, u_sq)
    fluid = jnp.logical_not(obst)
    return out, speed_sum(u_sq, fluid)


def collide_and_av_rows(streamed, obst, omega, row_mask=None):
    """collide_and_av with the |u| partial reduced over ROWS only.

    Returns (9 planes, (1, nx) lane vector).  On the TPU VPU the sublane
    (row) reduction is plain adds while the lane reduction needs cross-lane
    shuffles — callers that loop over row blocks accumulate these vectors
    and lane-reduce ONCE per step (measured: the per-block scalar
    reduction cost the in-place kernel 7.5 us/step at 1024², 13% — round-4
    ablation, BENCHMARKS.md Rooflines).  Same values as collide_and_av up
    to float-sum reordering (the documented av-partial grouping contract).

    ``row_mask`` (rows, 1) bool, optional: rows excluded from the |u|
    partial (ghost-extended slabs count only their central rows — the
    in-place ca engine, ops/resident_pallas._ca_inplace_kernel); fields
    are unaffected."""
    rho, u_x, u_y = moments(streamed)
    u_sq = u_x * u_x + u_y * u_y
    out = collide(streamed, obst, omega, rho, u_x, u_y, u_sq)
    fluid = jnp.logical_not(obst)
    if row_mask is not None:
        fluid = fluid & row_mask
    vec = jnp.sum(
        jnp.where(fluid, jnp.sqrt(u_sq), F32(0.0)),
        axis=0, keepdims=True, dtype=F32,
    )
    return out, vec
