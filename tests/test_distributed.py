"""Multi-process (jax.distributed) smoke tests — VERDICT r1 #5.

The reference's flagship runs were 2 nodes x 40 MPI ranks
(MPI/job_submit_d2q9-bgk:4-6); this exercises the >1-process code path the
framework uses on real pods, with 2 local CPU processes x 4 virtual devices
each and bitwise equality against single-device sync.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _spawn(pid: int, nprocs: int, port: int, mode: str):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.Popen(
        [
            sys.executable, "-m", "lbm_tpu.tools.dist_smoke",
            "--process-id", str(pid), "--num-processes", str(nprocs),
            "--coordinator", f"127.0.0.1:{port}", "--mode", mode,
        ],
        env=env, cwd=REPO,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )


@pytest.mark.parametrize("mode", ["sync", "async", "ca"])
def test_two_process_smoke(mode):
    port = _free_port()
    procs = [_spawn(i, 2, port, mode) for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out}"
        assert "DIST_SMOKE_OK" in out, out
    # Both processes must agree on the reduced observable.
    tot = [line for line in outs[0].splitlines() if "DIST_SMOKE_OK" in line]
    tot1 = [line for line in outs[1].splitlines() if "DIST_SMOKE_OK" in line]
    assert tot[0].split("tot_u=")[1] == tot1[0].split("tot_u=")[1]


def test_run_pod_dryrun():
    """scripts/run_pod.sh --dryrun exits 0 on this box (VERDICT done
    criterion)."""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        ["bash", os.path.join(REPO, "scripts", "run_pod.sh"), "--dryrun"],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert proc.stdout.count("DIST_SMOKE_OK") == 2, proc.stdout
