"""bench.py wedge-protection wrapper: the parent process must stay
jax-free and survive hung/failed children by retrying, because the axon
chip-claim leg can block ``jax.devices()`` forever (docs/PERF.md; the
driver runs bench.py unattended at round close)."""
import json
import subprocess

import pytest

import bench


class _Fake:
    def __init__(self, returncode=0, stdout="", stderr=""):
        self.returncode = returncode
        self.stdout = stdout
        self.stderr = stderr


JSON_LINE = json.dumps({"metric": "m", "value": 1.0, "unit": "u",
                        "vs_baseline": 1.0}) + "\n"


def test_child_flag_runs_measurement_inline(monkeypatch):
    ran = []
    monkeypatch.setenv(bench._CHILD_FLAG, "1")
    monkeypatch.setattr(bench, "child_main", lambda: ran.append(True))
    bench.main()
    assert ran == [True]


def test_parent_forwards_child_json(monkeypatch, capsys):
    calls = []

    def fake_run(cmd, env=None, timeout=None, capture_output=None, text=None):
        calls.append((cmd, env, timeout))
        return _Fake(stdout=JSON_LINE, stderr="# batch 8: ...\n")

    monkeypatch.delenv(bench._CHILD_FLAG, raising=False)
    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    bench.main()
    out = capsys.readouterr()
    assert out.out == JSON_LINE
    assert "# batch 8" in out.err
    assert len(calls) == 1
    assert calls[0][1][bench._CHILD_FLAG] == "1"
    assert calls[0][2] == bench._CHILD_TIMEOUT_S


def test_parent_retries_after_hang_then_succeeds(monkeypatch, capsys):
    attempts = []

    def fake_run(cmd, **kw):
        attempts.append(1)
        if len(attempts) == 1:
            raise subprocess.TimeoutExpired(cmd, kw["timeout"])
        return _Fake(stdout=JSON_LINE)

    monkeypatch.delenv(bench._CHILD_FLAG, raising=False)
    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    bench.main()
    out = capsys.readouterr()
    assert out.out == JSON_LINE
    assert len(attempts) == 2
    assert "wedged" in out.err


def test_parent_exits_nonzero_when_all_attempts_fail(monkeypatch, capsys):
    monkeypatch.delenv(bench._CHILD_FLAG, raising=False)
    monkeypatch.setattr(bench.subprocess, "run",
                        lambda cmd, **kw: _Fake(returncode=3))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    with pytest.raises(SystemExit) as ei:
        bench.main()
    assert ei.value.code == 1
    assert capsys.readouterr().out == ""  # no JSON line on failure
