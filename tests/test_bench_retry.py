"""Fault-injection tests for the bench.py retry orchestrator (VERDICT r4
Next #1): the driver runs `python bench.py` exactly once per round, so a
transient TPU abort must not zero the round's perf record. The orchestrator
runs the measurement in a child process and retries with backend re-init
(fresh process) and, on the last attempt, with the persistent compile cache
disabled. These tests exercise the wrapper with --selftest (no TPU, no
model) via the SIU3R_BENCH_FAULT_ONCE hook."""

import json
import os
import subprocess
import sys

BENCH = os.path.join(os.path.dirname(__file__), "..", "bench.py")


def _run(env_extra, timeout=120):
    env = dict(os.environ, **env_extra)
    proc = subprocess.run(
        [sys.executable, os.path.abspath(BENCH), "--selftest"],
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        timeout=timeout,
    )
    last_json = None
    for line in reversed(proc.stdout.decode().strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            last_json = json.loads(line)
            break
    return proc, last_json


def test_selftest_clean():
    proc, parsed = _run({})
    assert proc.returncode == 0
    assert parsed is not None
    assert parsed["metric"] == "bench_selftest"
    assert "retries" not in parsed


def test_transient_fault_is_retried(tmp_path):
    """First child attempt dies (simulated TPU abort); retry succeeds and
    the emitted JSON records one retry — the round-4 failure mode covered."""
    sentinel = tmp_path / "fault_once"
    proc, parsed = _run({"SIU3R_BENCH_FAULT_ONCE": str(sentinel)})
    assert proc.returncode == 0
    assert parsed is not None
    assert parsed["metric"] == "bench_selftest"
    assert parsed["value"] == 1.0
    assert parsed.get("retries") == 1
    assert sentinel.exists()
    assert b"injected fault" in proc.stderr


def test_persistent_fault_still_emits_json(tmp_path):
    """Every attempt dies (sentinel path is uncreatable): the orchestrator
    must still print a parseable {"error": ...} record — parsed is never
    null for the driver."""
    sentinel = tmp_path / "no_such_dir" / "fault"
    proc, parsed = _run({"SIU3R_BENCH_FAULT_ONCE": str(sentinel)})
    assert proc.returncode == 0
    assert parsed is not None
    assert "error" in parsed
    assert parsed["value"] == 0.0
