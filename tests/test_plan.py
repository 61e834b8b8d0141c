"""--plan vs driver consistency.

`describe_plan` promises to predict every failure mode before running
(models/plan.py; CLI `run --plan`).  Drift between the printed plan and the
executed path has now been caught twice by review (r3: frames-remainder
tail suppressed; earlier: chunk-tail wording), so this pins the contract
mechanically: over a variant x storage x observable x step-count matrix,
the plan contains "will FAIL" exactly when `run_simulation` raises.
"""

import numpy as np
import pytest

from lbm_tpu.io.scene import Scene
from lbm_tpu.models.driver import RunConfig, run_simulation
from lbm_tpu.models.plan import describe_plan
from lbm_tpu.params import LBMParams


@pytest.fixture(scope="module")
def plan_scene():
    params = LBMParams(
        nx=128, ny=32, max_iters=10, reynolds_dim=10,
        density=0.1, accel=0.005, omega=1.85,
    )
    r = np.random.default_rng(7)
    mask = r.random((32, 128)) < 0.08
    mask[0, :] = mask[-1, :] = True
    return Scene(params=params, obstacles=mask)


@pytest.mark.parametrize(
    "variant,staleness",
    [("sync", None), ("async", 1), ("chunked", 2), ("ca", 4)],
)
@pytest.mark.parametrize("storage", ["f32", "i16"])
@pytest.mark.parametrize("obs", ["frames", "debug"])
def test_plan_predicts_driver_outcome(plan_scene, variant, staleness, storage, obs):
    # steps=10 exercises the remainder path for the multi-step programs
    # (chunked spc=2, ca spc=4); frame interval 4 divides both chunks.
    cfg = RunConfig(
        variant=variant,
        num_devices=4,
        staleness=staleness,
        storage=storage,
        num_steps=10,
        frame_interval=4 if obs == "frames" else None,
        debug=obs == "debug",
    )
    plan = describe_plan(plan_scene, cfg)
    predicted_fail = "will FAIL" in plan
    try:
        res = run_simulation(plan_scene, cfg)
    except ValueError:
        assert predicted_fail, (
            f"driver raised but the plan did not predict it:\n{plan}"
        )
    else:
        assert not predicted_fail, (
            f"plan predicted failure but the run succeeded:\n{plan}"
        )
        assert res.av_vels.shape == (10,)
        assert np.all(np.isfinite(res.av_vels))
        if obs == "frames":
            assert res.frames is not None
            assert res.frames.shape[0] == 3  # ceil(10/4) captures


def test_plan_misaligned_chunked_frames_predicted(plan_scene):
    # interval 3 is not a multiple of the 2-step chunk: the driver rejects,
    # the plan must say so.
    cfg = RunConfig(
        variant="chunked", num_devices=4, staleness=2, num_steps=12,
        frame_interval=3,
    )
    plan = describe_plan(plan_scene, cfg)
    assert "will FAIL" in plan
    with pytest.raises(ValueError):
        run_simulation(plan_scene, cfg)
