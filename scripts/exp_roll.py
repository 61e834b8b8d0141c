"""Lane-rotation strategy experiment: concat-based roll vs pltpu.roll.

Every kernel streams 6 of the 9 planes through a periodic lane rotation
(ops/fused_pallas._fold_roll_x), currently built as edge-column concat —
the form CLAUDE.md's Mosaic-legality note requires canonical layout for.
Mosaic also exposes a native rotate (pltpu.roll); if it lowers to the
hardware vector rotate it could shave the copy the concat form pays.

This script measures both inside a VMEM-resident kernel shaped like the
monolithic resident step (roll + multiply-accumulate over 9 planes,
repeated R times per launch) and checks bitwise agreement on device.

Usage:  python scripts/exp_roll.py [ny nx [reps]]
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

from lbm_tpu.ops import fused_pallas  # noqa: E402

NS = 9
CX = (0, 1, 0, -1, 0, 1, -1, -1, 1)


def _roll_concat(x, shift):
    return fused_pallas._roll_x(x, shift)


def _roll_native(x, shift):
    if shift == 0:
        return x
    # pltpu.roll requires a non-negative shift; roll by -1 == roll by nx-1.
    return pltpu.roll(x, shift % x.shape[1], axis=1)


def _kernel(f_ref, out_ref, *, reps, roll):
    def body(_, acc):
        planes = [f_ref[k] for k in range(NS)]
        rolled = [roll(planes[k], CX[k]) for k in range(NS)]
        s = rolled[0]
        for k in range(1, NS):
            s = s + rolled[k]
        return acc + s

    out_ref[0] = lax.fori_loop(0, reps, body, jnp.zeros_like(f_ref[0]))


def build(ny, nx, reps, roll):
    call = pl.pallas_call(
        functools.partial(_kernel, reps=reps, roll=roll),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, ny, nx), jnp.float32),
        interpret=jax.default_backend() == "cpu",
    )
    return jax.jit(lambda f: call(f))


def main():
    ny = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    nx = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 512

    rng = np.random.default_rng(0)
    f = jnp.asarray(rng.random((NS, ny, nx), dtype=np.float32))

    outs = {}
    for name, roll in (("concat", _roll_concat), ("native", _roll_native)):
        fn = build(ny, nx, reps, roll)
        out = np.asarray(fn(f))  # compile + warm
        outs[name] = out
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(fn(f))
            best = min(best, time.perf_counter() - t0)
        rolls = reps * 6  # six planes actually rotate
        gb = rolls * ny * nx * 4 / 1e9
        print(
            f"{name}: best {best*1e3:.2f} ms for {reps} reps "
            f"({best/reps*1e6:.1f} us/rep, rotated-plane touch {gb/best:.0f} GB/s)"
        )
    same = np.array_equal(outs["concat"], outs["native"])
    md = float(np.max(np.abs(outs["concat"] - outs["native"])))
    print(f"bitwise equal: {same} (max|d|={md:.3e})")


if __name__ == "__main__":
    main()
