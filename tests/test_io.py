"""Scene I/O and writer format tests."""

import numpy as np
import pytest

from lbm_tpu.core import lattice
from lbm_tpu.io import load_obstacles, load_params, load_scene, scene, writers
from tests.conftest import requires_reference


def test_load_params_roundtrip(tmp_path):
    p = tmp_path / "input.params"
    p.write_text("128\n256\n40000\n10\n0.1\n0.005\n1.85\n")
    params = load_params(p)
    assert (params.nx, params.ny, params.max_iters, params.reynolds_dim) == (
        128, 256, 40000, 10)
    assert params.density == pytest.approx(0.1)
    assert params.accel == pytest.approx(0.005)
    assert params.omega == pytest.approx(1.85)
    assert params.accel_row == 254


def test_load_params_rejects_short_file(tmp_path):
    p = tmp_path / "input.params"
    p.write_text("128\n256\n")
    with pytest.raises(scene.SceneError):
        load_params(p)


def test_load_obstacles(tmp_path):
    p = tmp_path / "obstacles.dat"
    p.write_text("0 0 1\n3 1 1\n2 2 1\n")
    mask = load_obstacles(p, 4, 4)
    expected = np.zeros((4, 4), dtype=bool)
    expected[0, 0] = expected[1, 3] = expected[2, 2] = True
    np.testing.assert_array_equal(mask, expected)


@pytest.mark.parametrize(
    "line", ["5 0 1", "0 5 1", "1 1 2", "1 1"],
    ids=["x-range", "y-range", "blocked!=1", "two-fields"],
)
def test_load_obstacles_validation(tmp_path, line):
    p = tmp_path / "obstacles.dat"
    p.write_text(line + "\n")
    with pytest.raises(scene.SceneError):
        load_obstacles(p, 4, 4)


def test_python_and_native_parsers_agree(tmp_path):
    from lbm_tpu.io import native

    if not native.available():
        pytest.skip("native io library not built")
    rng = np.random.default_rng(0)
    pts = {(int(x), int(y)) for x, y in rng.integers(0, 32, size=(100, 2))}
    p = tmp_path / "obstacles.dat"
    p.write_text("".join(f"{x} {y} 1\n" for x, y in sorted(pts)))
    py = scene._load_obstacles_py(p, 32, 32)
    nat = native.load_obstacles(str(p), 32, 32)
    np.testing.assert_array_equal(py, nat)


def test_write_av_vels_format(tmp_path):
    path = tmp_path / "av_vels.dat"
    vals = np.array([1.094269153342e-05, 0.25, 3.0], dtype=np.float32)
    writers.write_av_vels(path, vals)
    lines = path.read_text().splitlines()
    assert lines[0].startswith("0:\t") and "E-05" in lines[0]
    assert lines[1] == "1:\t2.500000000000E-01"
    got = writers.read_av_vels(path)
    np.testing.assert_allclose(got, vals.astype(np.float64), rtol=1e-12)


def test_write_final_state_format(tmp_path, small_params, small_obstacles):
    f = lattice.equilibrium_rest(small_params.density, small_params.ny, small_params.nx)
    path = tmp_path / "final_state.dat"
    writers.write_final_state(path, f, small_obstacles, small_params)
    lines = path.read_text().splitlines()
    assert len(lines) == small_params.nx * small_params.ny
    # Row-major order with ii fastest, like the reference writer
    # (SerialCode/d2q9-bgk.c:679-724).
    first = lines[0].split()
    assert first[0] == "0" and first[1] == "0" and first[6] == "1"
    # At rest equilibrium: velocity zero everywhere; the checked column
    # (index 5 = pressure, check/check.py:61-63) equals density/3 everywhere.
    fs = writers.read_final_state(path)
    np.testing.assert_allclose(fs[:, 2], 0.1 / 3.0, rtol=1e-6)
    u_cols = np.loadtxt(path, usecols=[2, 3, 4])
    assert np.all(u_cols == 0.0)
    # An interior fluid line has obstacle flag 0 and the same pressure.
    cell = lines[small_params.nx + 1].split()
    assert cell[6] == "0"
    assert float(cell[5]) == pytest.approx(0.1 / 3.0, rel=1e-6)


def test_native_and_python_writers_agree(tmp_path, small_params, small_obstacles):
    from lbm_tpu.io import native

    if not native.available():
        pytest.skip("native io library not built")
    rng = np.random.default_rng(1)
    f = lattice.equilibrium_rest(small_params.density, small_params.ny, small_params.nx)
    f = f * (1.0 + 0.01 * rng.standard_normal(f.shape)).astype(np.float32)
    ux, uy, u, p = writers.macroscopics(f, small_obstacles, small_params)

    nat_path, py_path = tmp_path / "nat.dat", tmp_path / "py.dat"
    assert native.write_final_state(str(nat_path), ux, uy, u, p, small_obstacles)
    writers._write_final_state_py(py_path, ux, uy, u, p, small_obstacles, small_params)
    assert nat_path.read_text() == py_path.read_text()

    av = rng.random(17).astype(np.float32)
    assert native.write_av_vels(str(tmp_path / "nat_av.dat"), av)
    writers.write_av_vels = writers.write_av_vels  # no-op, clarity
    with open(tmp_path / "py_av.dat", "w") as fp:
        fp.writelines("%d:\t%.12E\n" % (i, av[i]) for i in range(len(av)))
    assert (tmp_path / "nat_av.dat").read_text() == (tmp_path / "py_av.dat").read_text()


@requires_reference
def test_reference_scene_loads():
    sc = load_scene(
        "/root/reference/dataSet/input_128x128.params",
        "/root/reference/dataSet/obstacles_128x128.dat",
    )
    assert (sc.params.nx, sc.params.ny) == (128, 128)
    # Closed box: full bottom and top rows, left and right columns blocked.
    assert sc.obstacles[0].all() and sc.obstacles[-1].all()
    assert sc.obstacles[:, 0].all() and sc.obstacles[:, -1].all()
    assert sc.num_fluid_cells == 15876


def test_write_velocity_data(tmp_path, small_params, small_obstacles):
    """Per-fluid-cell velocity dump format (SerialCode/d2q9-bgk.c:760-800)."""
    f = lattice.equilibrium_rest(small_params.density, small_params.ny, small_params.nx)
    path = tmp_path / "velocity_per_timestep.dat"
    writers.write_velocity_data(path, f, small_obstacles, timestep=0, append=False)
    writers.write_velocity_data(path, f, small_obstacles, timestep=1)
    lines = path.read_text().splitlines()
    n_fluid = small_obstacles.size - int(small_obstacles.sum())
    assert len(lines) == 2 * n_fluid
    first = lines[0].split()
    assert first[0] == "0" and len(first) == 5
    assert lines[n_fluid].split()[0] == "1"
