"""The repo-root bench entrypoint's degraded-tunnel guard.

The shared TPU tunnel has hours-long ~10x-degraded windows (CLAUDE.md perf
ledger); the recorded per-round benchmark artifact must reflect the
hardware, not the outage.  bench.main() re-measures (bounded retries with a
sleep) when the reading falls below a quarter of the perfcheck floor for
that grid/storage, and tags the output "degraded_tunnel" if it never
recovers.  These tests drive the guard with mocked measurements.
"""

import json

import pytest

import bench as bench_entry


@pytest.fixture
def bench_env(monkeypatch):
    monkeypatch.setenv("LBM_BENCH_GRID", "1024x1024")
    monkeypatch.setenv("LBM_BENCH_SKIP_VERIFY", "1")
    monkeypatch.delenv("LBM_BENCH_STEPS", raising=False)
    monkeypatch.delenv("LBM_BENCH_VARIANT", raising=False)
    monkeypatch.delenv("LBM_BENCH_STORAGE", raising=False)
    # No real sleeping or subprocess probing in tests.
    monkeypatch.setattr(bench_entry, "_RETRY_SLEEP_S", 0)
    monkeypatch.setattr(bench_entry, "_PROBE_SLEEP_S", 0)
    monkeypatch.setattr(bench_entry, "_device_reachable", lambda *a, **k: True)


def _mock_measurements(monkeypatch, values):
    """Feed successive run_bench results; record call count."""
    calls = []

    def fake_run_bench(**kwargs):
        v = values[min(len(calls), len(values) - 1)]
        calls.append(kwargs)
        return {
            "metric": "MLUPS 1024x1024 mock",
            "value": v,
            "unit": "MLUPS",
            "vs_baseline": round(v / 1796.0, 3),
            "storage": kwargs.get("storage", "f32"),
        }

    import lbm_tpu.tools.bench as tools_bench

    monkeypatch.setattr(tools_bench, "run_bench", fake_run_bench)
    return calls


def _mock_backend(monkeypatch, name):
    import jax

    monkeypatch.setattr(jax, "default_backend", lambda: name)


def test_degraded_floor_lookup():
    # 1024x1024 f32 perfcheck floor is 10000 (in-place resident band) ->
    # degraded threshold 2500.
    assert bench_entry._degraded_floor("1024x1024", "f32") == pytest.approx(2500.0)
    assert bench_entry._degraded_floor("999x999", "f32") is None


def test_healthy_reading_no_retry(bench_env, monkeypatch, capsys):
    # Default storage "best": one f32 pass + one i16 candidate; the tie
    # keeps f32 as the reported storage.
    calls = _mock_measurements(monkeypatch, [15000.0])
    _mock_backend(monkeypatch, "tpu")
    assert bench_entry.main() == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["value"] == 15000.0
    assert out["storage"] == "f32"
    assert out["alt"]["storage"] == "i16"
    assert "degraded_tunnel" not in out
    assert len(calls) == 2
    assert [c["storage"] for c in calls] == ["f32", "i16"]


def test_best_storage_reports_the_faster_candidate(bench_env, monkeypatch, capsys):
    # i16 measures faster than f32 -> it becomes the headline, f32 the alt.
    calls = _mock_measurements(monkeypatch, [15000.0, 19000.0])
    _mock_backend(monkeypatch, "tpu")
    assert bench_entry.main() == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["value"] == 19000.0
    assert out["storage"] == "i16"
    assert out["alt"] == {
        "metric": "MLUPS 1024x1024 mock", "value": 15000.0, "storage": "f32",
    }
    assert len(calls) == 2


def test_explicit_storage_skips_the_candidate(bench_env, monkeypatch, capsys):
    monkeypatch.setenv("LBM_BENCH_STORAGE", "f32")
    calls = _mock_measurements(monkeypatch, [15000.0])
    _mock_backend(monkeypatch, "tpu")
    assert bench_entry.main() == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["value"] == 15000.0
    assert "alt" not in out
    assert len(calls) == 1


def test_degraded_reading_retries_until_recovery(bench_env, monkeypatch, capsys):
    calls = _mock_measurements(monkeypatch, [900.0, 1100.0, 14000.0])
    _mock_backend(monkeypatch, "tpu")
    assert bench_entry.main() == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["value"] == 14000.0
    assert "degraded_tunnel" not in out
    # two f32 retries after the degraded readings, then the i16 candidate
    # (which repeats the last mock value and ties, keeping f32).
    assert len(calls) == 4


def test_degraded_reading_tagged_when_never_recovering(
    bench_env, monkeypatch, capsys
):
    calls = _mock_measurements(monkeypatch, [900.0])
    _mock_backend(monkeypatch, "tpu")
    assert bench_entry.main() == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["value"] == 900.0
    assert out["degraded_tunnel"] is True
    # initial measurement + bounded retries + the i16 candidate
    assert len(calls) == 1 + bench_entry._MAX_RETRIES + 1


def test_fast_i16_winner_clears_the_degraded_tag(bench_env, monkeypatch, capsys):
    # f32 stays under the threshold through every retry, but the i16
    # candidate comes back healthy: the artifact reflects the hardware.
    calls = _mock_measurements(
        monkeypatch, [900.0, 900.0, 900.0, 900.0, 16000.0]
    )
    _mock_backend(monkeypatch, "tpu")
    assert bench_entry.main() == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["value"] == 16000.0
    assert out["storage"] == "i16"
    assert "degraded_tunnel" not in out
    assert len(calls) == 5


def test_unreachable_device_emits_error_json(bench_env, monkeypatch, capsys):
    # A hard tunnel hang (jax.devices() blocking forever) must produce the
    # one-line error JSON after bounded probe attempts, not hang the driver.
    monkeypatch.setattr(bench_entry, "_device_reachable", lambda *a, **k: False)
    calls = _mock_measurements(monkeypatch, [15000.0])
    assert bench_entry.main() == 1
    out = json.loads(capsys.readouterr().out.strip())
    assert out["value"] == 0
    assert "unreachable" in out["error"]
    assert len(calls) == 0  # never reached run_bench


def test_probe_reports_unreachable_on_timeout(monkeypatch):
    # The probe must turn a hung `jax.devices()` (subprocess timeout) into
    # False rather than propagate.  NOTE: the probe cannot be run for real
    # in this suite — the axon plugin overrides JAX_PLATFORMS=cpu in fresh
    # interpreters and dials the tunnel, so its outcome here depends on
    # tunnel health, which is exactly the signal bench wants in production.
    import subprocess

    def fake_run(*a, **k):
        raise subprocess.TimeoutExpired(cmd="x", timeout=1)

    monkeypatch.setattr(subprocess, "run", fake_run)
    assert bench_entry._device_reachable(timeout_s=1) is False


def test_cpu_backend_skips_retry(bench_env, monkeypatch, capsys):
    # The pytest/CI backend is CPU; tiny interpret-mode rates must not
    # trigger sleeps or retries there.
    calls = _mock_measurements(monkeypatch, [50.0])
    _mock_backend(monkeypatch, "cpu")
    assert bench_entry.main() == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["value"] == 50.0
    assert "degraded_tunnel" not in out
    assert len(calls) == 2  # f32 + the i16 candidate, no retries
