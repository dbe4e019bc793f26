"""bench.probe_backend decision logic: when it probes vs skips.

The probe exists so a dead TPU tunnel yields one parseable JSON error line
instead of an unparseable hang/traceback (VERDICT r3 item 3). These tests pin
the *decision* layer — the subprocess itself is stubbed, so they run in
milliseconds and never touch a backend.
"""

import subprocess

import pytest

import bench


class _ProbeAttempted(Exception):
    pass


@pytest.fixture
def deny_subprocess(monkeypatch):
    """Any attempt to spawn the probe subprocess raises _ProbeAttempted."""

    def _boom(*a, **k):
        raise _ProbeAttempted

    monkeypatch.setattr(subprocess, "Popen", _boom)


def test_probe_disabled_by_knob(monkeypatch, deny_subprocess):
    monkeypatch.setenv("MARF_BENCH_PROBE", "0")
    monkeypatch.setenv("JAX_PLATFORMS", "tpu")
    bench.probe_backend()  # returns without spawning


@pytest.mark.parametrize("platforms", ["cpu", "cpu,tpu", "CPU"])
def test_probe_skipped_on_cpu_first(monkeypatch, deny_subprocess, platforms):
    monkeypatch.delenv("MARF_BENCH_PROBE", raising=False)
    monkeypatch.setenv("JAX_PLATFORMS", platforms)
    bench.probe_backend()


def test_probe_skipped_on_legacy_platform_name(monkeypatch, deny_subprocess):
    monkeypatch.delenv("MARF_BENCH_PROBE", raising=False)
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    monkeypatch.setenv("JAX_PLATFORM_NAME", "cpu")
    bench.probe_backend()


@pytest.mark.parametrize("platforms", ["tpu", "tpu,cpu", ""])
def test_probe_attempted_when_tunnel_involved(monkeypatch, deny_subprocess, platforms):
    # 'tpu,cpu' fallback configs MUST still probe — the tpu attempt is the
    # thing that hangs on a dead tunnel (the round-3 BENCH rc=1 artifact).
    monkeypatch.delenv("MARF_BENCH_PROBE", raising=False)
    monkeypatch.delenv("JAX_PLATFORM_NAME", raising=False)
    if platforms:
        monkeypatch.setenv("JAX_PLATFORMS", platforms)
    else:
        monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    with pytest.raises(_ProbeAttempted):
        bench.probe_backend()


def test_lock_wait_skipped_for_owner_and_cpu(monkeypatch, tmp_path):
    lock = tmp_path / "tpu_lock"
    lock.touch()
    monkeypatch.setattr(bench, "TPU_LOCK", str(lock))
    monkeypatch.setattr(bench.time, "sleep", lambda s: (_ for _ in ()).throw(AssertionError("slept")))
    # owner: never waits even with the lock present
    monkeypatch.setenv("MARF_TPU_LOCK_OWNER", "1")
    monkeypatch.setenv("JAX_PLATFORMS", "tpu")
    bench.wait_for_tpu_lock()
    # cpu-only: lock is irrelevant
    monkeypatch.delenv("MARF_TPU_LOCK_OWNER", raising=False)
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    bench.wait_for_tpu_lock()


def test_lock_wait_until_cleared(monkeypatch, tmp_path):
    """With the lock held (sweep in flight), bench waits and proceeds once
    the lock clears — instead of colliding on the one-TPU-process rule."""
    lock = tmp_path / "tpu_lock"
    lock.touch()
    monkeypatch.setattr(bench, "TPU_LOCK", str(lock))
    monkeypatch.delenv("MARF_TPU_LOCK_OWNER", raising=False)
    monkeypatch.setenv("JAX_PLATFORMS", "tpu")
    sleeps = []

    def fake_sleep(s):
        sleeps.append(s)
        if len(sleeps) == 2:
            lock.unlink()  # sweep finished

    monkeypatch.setattr(bench.time, "sleep", fake_sleep)
    bench.wait_for_tpu_lock()
    assert len(sleeps) == 2


def test_golden_record_json_serializable_with_numpy_psnr():
    """Metrics arrive as numpy scalars; the golden record must still be pure
    Python, or json.dumps(result) dies AFTER the timed run (this crashed every
    golden-checked TPU sweep stage once — np.bool_ leaked via `and`)."""
    import json

    import numpy as np

    g = {"psnr": 25.05, "band": 2.5}
    for psnr in (np.float32(25.0), np.float64(30.0), float("nan")):
        ok, rec = bench.golden_record(psnr, g)
        assert isinstance(ok, bool)
        json.dumps(rec)  # must not raise
    assert bench.golden_record(np.float32(25.0), g)[0] is True
    assert bench.golden_record(np.float64(30.0), g)[0] is False
    assert bench.golden_record(float("nan"), g)[0] is False


def test_probe_code_executes_an_op(monkeypatch):
    """The probe subprocess must EXECUTE a computation, not just enumerate:
    a wedged chip (round-4c, after a timeout SIGTERM'd a profiling run) keeps
    answering jax.devices() while every execute hangs >35 min — an
    enumeration-only probe passes that state and bench then hangs unparseably
    inside the real build."""
    captured = {}

    class _FakeProc:
        returncode = 0

        def communicate(self, timeout=None):
            return "TPU", ""

    def fake_popen(args, **k):
        captured["code"] = args[-1]
        return _FakeProc()

    monkeypatch.delenv("MARF_BENCH_PROBE", raising=False)
    monkeypatch.setenv("JAX_PLATFORMS", "tpu")
    monkeypatch.setattr(subprocess, "Popen", fake_popen)
    bench.probe_backend()
    # the probe must EXECUTE a matmul and FETCH the result to the host —
    # ready events can signal early on this runtime (PERF.md round-5), so
    # a block_until_ready-style probe could pass a wedged chip
    assert "asarray" in captured["code"]
    assert "@" in captured["code"]


def test_probe_failure_emits_parseable_json(monkeypatch, capsys):
    """A probe that exits non-zero produces one JSON line + SystemExit(2)."""
    import json

    monkeypatch.delenv("MARF_BENCH_PROBE", raising=False)
    monkeypatch.setenv("JAX_PLATFORMS", "tpu")

    class _FakeProc:
        returncode = 1

        def communicate(self, timeout=None):
            return "", "RuntimeError: UNAVAILABLE: tunnel down"

    monkeypatch.setattr(subprocess, "Popen", lambda *a, **k: _FakeProc())
    with pytest.raises(SystemExit) as e:
        bench.probe_backend()
    assert e.value.code == 2
    line = capsys.readouterr().out.strip().splitlines()[0]
    rec = json.loads(line)
    assert rec["value"] is None
    assert rec["error"] == "backend_unavailable"
    assert "UNAVAILABLE" in rec["extra"]["detail"]
