"""Driver (scan loop, frames, timing) and variant registry tests."""

import numpy as np
import pytest

from lbm_tpu.core import oracle
from lbm_tpu.io.scene import Scene
from lbm_tpu.models import RunConfig, run_simulation, resolve_variant
from lbm_tpu.models.variants import VARIANTS


@pytest.fixture
def scene(small_params, small_obstacles):
    return Scene(params=small_params.replace(max_iters=30), obstacles=small_obstacles)


def test_variant_registry_covers_reference_ladder():
    analogs = {v.reference_analog.split("/")[0] for v in VARIANTS.values()}
    for ref_dir in (
        "SerialCode",
        "OpenMP",
        "MPI",
        "MPI_Waitall",
        "MPI_Testall_OptimizedVersion",
        "MPI_Testall_ComplexVersion",
    ):
        assert any(ref_dir in v.reference_analog for v in VARIANTS.values()), ref_dir
    assert resolve_variant("testall") == "async"
    assert resolve_variant("openmp") == "jnp"
    with pytest.raises(ValueError):
        resolve_variant("nope")


def test_driver_jnp_matches_oracle(scene):
    result = run_simulation(scene, RunConfig(variant="jnp"))
    f_o, av_o = oracle.run(scene.params, scene.obstacles)
    np.testing.assert_allclose(result.f, f_o, atol=2e-7)
    np.testing.assert_allclose(result.av_vels, av_o, rtol=1e-4)
    assert result.timer.elapsed["compute"] > 0
    assert np.isfinite(result.reynolds)


def test_driver_serial_variant(scene):
    result = run_simulation(scene, RunConfig(variant="serial"))
    f_o, av_o = oracle.run(scene.params, scene.obstacles)
    np.testing.assert_array_equal(result.f, f_o)
    np.testing.assert_array_equal(result.av_vels, av_o)


def test_driver_sharded(scene):
    ref = run_simulation(scene, RunConfig(variant="jnp"))
    for variant in ("sync", "overlap"):
        res = run_simulation(scene, RunConfig(variant=variant, num_devices=8))
        np.testing.assert_array_equal(res.f, ref.f)
    res = run_simulation(scene, RunConfig(variant="async", num_devices=8))
    rel = np.abs(res.f - ref.f).max() / np.abs(ref.f).max()
    assert rel < 1e-2


def test_driver_frames(scene):
    result = run_simulation(
        scene, RunConfig(variant="jnp", frame_interval=10)
    )
    assert result.frames is not None
    assert result.frames.shape == (3, scene.params.ny, scene.params.nx)
    np.testing.assert_array_equal(result.frame_steps, [0, 10, 20])
    # Frames are |u| with obstacles zeroed; frame 0 is the state after the
    # first step: driven row has moved, so non-zero somewhere.
    assert result.frames[0][scene.obstacles].max() == 0.0
    assert result.frames[-1].max() > 0.0
    # Later frames show more developed flow.
    assert result.frames[-1].max() >= result.frames[0].max()


def test_driver_frames_sharded(scene):
    ref = run_simulation(scene, RunConfig(variant="jnp", frame_interval=10))
    res = run_simulation(
        scene, RunConfig(variant="sync", num_devices=8, frame_interval=10)
    )
    np.testing.assert_array_equal(res.frames, ref.frames)


def test_mlups_metric(scene):
    result = run_simulation(scene, RunConfig(variant="jnp"))
    assert result.mlups > 0


def test_driver_frames_sharded_indivisible(scene):
    """ADVICE r1 (medium): frames + sharded variant on ny not divisible by
    the device count must work — buffer allocated at the padded extents and
    cropped back to the user grid."""
    ref = run_simulation(scene, RunConfig(variant="jnp", frame_interval=10))
    res = run_simulation(
        scene, RunConfig(variant="sync", num_devices=3, frame_interval=10)
    )
    assert res.frames.shape == ref.frames.shape
    np.testing.assert_array_equal(res.frames, ref.frames)


def test_serial_rejects_checkpointing(scene):
    """ADVICE r1: serial + resume/checkpoint must raise, not silently ignore."""
    with pytest.raises(ValueError, match="serial"):
        run_simulation(scene, RunConfig(variant="serial", resume_from="x.npz"))
    with pytest.raises(ValueError, match="serial"):
        run_simulation(scene, RunConfig(variant="serial", checkpoint_every=10))


def test_resumed_mlups_counts_only_new_steps(scene, tmp_path):
    """ADVICE r1: MLUPS on resumed runs must use steps computed this run."""
    ck_dir = tmp_path / "ck"
    run_simulation(
        scene,
        RunConfig(variant="jnp", checkpoint_every=10, checkpoint_dir=str(ck_dir)),
    )
    ck = sorted(ck_dir.glob("ckpt_*.npz"))[0]  # step 10 of 30
    res = run_simulation(scene, RunConfig(variant="jnp", resume_from=str(ck)))
    assert len(res.av_vels) == 30
    assert res.steps_computed == 20
    cells = scene.params.ny * scene.params.nx
    expected = cells * 20 / res.timer.elapsed["compute"] / 1e6
    assert res.mlups == pytest.approx(expected)
