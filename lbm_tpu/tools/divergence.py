"""Sync-vs-async divergence probe (``lbm_tpu run --divergence``).

The reference README's central claim is that stale-halo asynchrony trades
<1% accuracy for up to 2.2x speed (README.md:9-13), but the repo offers no
tool to *measure* that trade — only end-of-run golden checks.  This probe
runs the synchronous and stale-halo programs side by side in one on-device
scan and emits the per-step deviation curve (SURVEY.md §4's wishlist item),
so the accuracy cost of a staleness configuration is observable directly.

Outputs: a CSV (step, av_sync, av_async, av_rel_pct, field_rel_linf,
field_rms) and optionally a two-panel PNG.
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from lbm_tpu.io.scene import Scene
from lbm_tpu.parallel import mesh as mesh_lib
from lbm_tpu.parallel import modes


@dataclasses.dataclass
class DivergenceResult:
    av_sync: np.ndarray  # (steps,)
    av_async: np.ndarray  # (steps,)
    field_rel_linf: np.ndarray  # (steps,) max|f_s - f_a| / max|f_s|
    field_rms: np.ndarray  # (steps,) rms of f_s - f_a
    mode: str
    staleness: int
    num_devices: int

    @property
    def av_rel_pct(self) -> np.ndarray:
        with np.errstate(divide="ignore", invalid="ignore"):
            return 100.0 * np.abs(self.av_async - self.av_sync) / self.av_sync

    def summary(self) -> str:
        return (
            f"divergence over {len(self.av_sync)} steps "
            f"({self.mode}, staleness={self.staleness}, "
            f"{self.num_devices} shards): "
            f"max av deviation {np.nanmax(self.av_rel_pct):.4f}%, "
            f"final field Linf {self.field_rel_linf[-1]:.3e}, "
            f"final field rms {self.field_rms[-1]:.3e}"
        )


def run_divergence(
    scene: Scene,
    num_devices: int | None = None,
    mode: str = "async",
    staleness: int = 1,
    num_steps: int | None = None,
    backend: str | None = "jnp",
) -> DivergenceResult:
    """Run sync and async side by side; returns the per-step deviation."""
    params = scene.params
    steps = num_steps if num_steps is not None else params.max_iters
    mesh = mesh_lib.make_row_mesh(num_devices)
    n_dev = mesh.shape[mesh_lib.ROWS]
    if mode not in ("async",):
        raise ValueError(
            f"--divergence probes the stale-halo modes; got mode={mode!r}"
        )
    sync_prog = modes.build_sharded_program(
        params, scene.obstacles, mesh, mode="sync", backend=backend
    )
    async_prog = modes.build_sharded_program(
        params, scene.obstacles, mesh, mode=mode, staleness=staleness,
        backend=backend,
    )

    def body(carry, _):
        ss, sa = carry
        ss, tu_s = sync_prog.step(ss)
        sa, tu_a = async_prog.step(sa)
        fs = sync_prog.f_of(ss)
        d = jnp.abs(fs - async_prog.f_of(sa))
        rel_linf = jnp.max(d) / jnp.max(jnp.abs(fs))
        rms = jnp.sqrt(jnp.mean(jnp.square(d)))
        return (ss, sa), (tu_s, tu_a, rel_linf, rms)

    @jax.jit
    def run(ss, sa):
        _, series = lax.scan(body, (ss, sa), None, length=steps)
        return series

    tu_s, tu_a, rel_linf, rms = run(sync_prog.init_state, async_prog.init_state)
    cells = np.float32(sync_prog.tot_cells)
    return DivergenceResult(
        av_sync=np.asarray(tu_s, np.float32) / cells,
        av_async=np.asarray(tu_a, np.float32) / cells,
        field_rel_linf=np.asarray(rel_linf, np.float32),
        field_rms=np.asarray(rms, np.float32),
        mode=mode,
        staleness=staleness,
        num_devices=n_dev,
    )


def write_csv(path: str | os.PathLike, res: DivergenceResult) -> None:
    with open(path, "w") as fh:
        fh.write("step,av_sync,av_async,av_rel_pct,field_rel_linf,field_rms\n")
        av_pct = res.av_rel_pct
        for t in range(len(res.av_sync)):
            fh.write(
                f"{t},{res.av_sync[t]:.9e},{res.av_async[t]:.9e},"
                f"{av_pct[t]:.6e},{res.field_rel_linf[t]:.6e},"
                f"{res.field_rms[t]:.6e}\n"
            )


def write_plot(path: str | os.PathLike, res: DivergenceResult) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    steps = np.arange(len(res.av_sync))
    fig, (ax1, ax2) = plt.subplots(2, 1, figsize=(8, 7), sharex=True)
    ax1.plot(steps, res.av_rel_pct, lw=0.8)
    ax1.axhline(1.0, color="tab:red", ls="--", lw=0.8, label="1% contract")
    ax1.set_ylabel("av_velocity deviation (%)")
    ax1.set_yscale("log")
    ax1.legend(loc="lower right")
    ax1.set_title(
        f"sync vs {res.mode} (staleness={res.staleness}, "
        f"{res.num_devices} shards)"
    )
    ax2.plot(steps, res.field_rel_linf, lw=0.8, label="rel Linf")
    ax2.plot(steps, res.field_rms, lw=0.8, label="rms")
    ax2.set_xlabel("timestep")
    ax2.set_ylabel("field deviation")
    ax2.set_yscale("log")
    ax2.legend(loc="lower right")
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)
