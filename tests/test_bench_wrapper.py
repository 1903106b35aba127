"""bench.py wedge-protection wrapper: the parent process must stay
jax-free and survive hung/failed children by retrying, because the axon
chip-claim leg can block ``jax.devices()`` forever (docs/PERF.md; the
driver runs bench.py unattended at round close)."""
import json
import os
import sys
import time

import pytest

import bench

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

    def fake_run_child(cmd, env, timeout=bench._CHILD_TIMEOUT_S):
        calls.append((cmd, env, timeout))
        return 0, JSON_LINE, "# batch 8: ...\n"

    monkeypatch.delenv(bench._CHILD_FLAG, raising=False)
    monkeypatch.setattr(bench, "_run_child", fake_run_child)
    bench.main()
    out = capsys.readouterr()
    assert out.out == JSON_LINE
    assert "# batch 8" in out.err
    assert len(calls) == 1
    assert calls[0][1][bench._CHILD_FLAG] == "1"


def test_parent_retries_after_hang_then_succeeds(monkeypatch, capsys):
    attempts = []

    def fake_run_child(cmd, env, timeout=bench._CHILD_TIMEOUT_S):
        attempts.append(1)
        if len(attempts) == 1:
            return None  # wedged child, killed
        return 0, JSON_LINE, ""

    monkeypatch.delenv(bench._CHILD_FLAG, raising=False)
    monkeypatch.setattr(bench, "_run_child", fake_run_child)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    bench.main()
    out = capsys.readouterr()
    assert out.out == JSON_LINE
    assert len(attempts) == 2
    assert "wedged" in out.err


def test_parent_exits_nonzero_when_all_attempts_fail(monkeypatch, capsys):
    monkeypatch.delenv(bench._CHILD_FLAG, raising=False)
    monkeypatch.setattr(bench, "_run_child",
                        lambda cmd, env, timeout=0: (3, "", ""))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    with pytest.raises(SystemExit) as ei:
        bench.main()
    assert ei.value.code == 1
    assert capsys.readouterr().out == ""  # no JSON line on failure


def test_run_child_kills_wedged_process_group(tmp_path):
    """The failure mode the wrapper exists for: a wedged child that
    forked a helper inheriting stdout/stderr. subprocess.run(timeout=...)
    would kill the child and then block forever draining the pipes the
    helper still holds; _run_child kills the whole session's process
    group, so the parent returns promptly with a wedge verdict."""
    script = tmp_path / "wedge.py"
    script.write_text(
        "import subprocess, sys, time\n"
        "# helper inherits this process's stdout/stderr pipe fds\n"
        "subprocess.Popen([sys.executable, '-c', 'import time; "
        "time.sleep(600)'])\n"
        "print('child alive', flush=True)\n"
        "time.sleep(600)\n")
    t0 = time.monotonic()
    res = bench._run_child([sys.executable, str(script)],
                           dict(os.environ), timeout=2)
    elapsed = time.monotonic() - t0
    assert res is None  # reported as wedged, not as a normal exit
    assert elapsed < 20  # and WITHOUT hanging on the helper's pipe ends


def test_run_child_returns_output_on_normal_exit():
    code, out, err = bench._run_child(
        [sys.executable, "-c",
         "import sys; print('ok'); print('e', file=sys.stderr)"],
        dict(os.environ), timeout=60)
    assert code == 0 and out.strip() == "ok" and err.strip() == "e"
