"""bench.py peak-subprocess retry logic (no TPU, subprocess mocked).

The peak measurement runs in a child process that historically got ONE
attempt; a wedged tunnel claim (chip healthy, claim never returns — the
NOTES playbook failure mode) silently dropped the peak field from the
round record.  measure_peak_subprocess now retries once inside a budget
that always reserves PEAK_REST_RESERVE_S for the rest of the bench.
These tests pin that contract: retry count, budget clamping, the
skip-when-starved guard, and no-retry on a clean empty child.
"""

import importlib.util
import json
import os
import subprocess
import time
import types

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(ROOT, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _fake_run(script):
    """subprocess.run stand-in: script is a list of either 'timeout' or a
    stdout string; one entry consumed per call.  Records given timeouts."""
    calls = []

    def run(cmd, capture_output=None, text=None, timeout=None):
        calls.append(timeout)
        action = script[len(calls) - 1]
        if action == "timeout":
            raise subprocess.TimeoutExpired(cmd, timeout)
        return types.SimpleNamespace(stdout=action, stderr="")

    return run, calls


def test_retry_after_timeout_returns_second_attempt(bench, monkeypatch):
    good = json.dumps({"peak": 850.0, "batch": 128, "mad": 0.3})
    run, calls = _fake_run(["timeout", good + "\n"])
    monkeypatch.setattr(subprocess, "run", run)
    deadline = time.time() + bench.BENCH_DEADLINE_S
    rec = bench.measure_peak_subprocess(deadline)
    assert rec == {"peak": 850.0, "batch": 128, "mad": 0.3}
    assert len(calls) == 2


def test_both_attempts_timeout_returns_none(bench, monkeypatch):
    run, calls = _fake_run(["timeout", "timeout"])
    monkeypatch.setattr(subprocess, "run", run)
    rec = bench.measure_peak_subprocess(time.time() + bench.BENCH_DEADLINE_S)
    assert rec is None
    assert len(calls) == 2


def test_budget_clamped_to_rest_reserve(bench, monkeypatch):
    # 1300s to deadline with a 900s reserve leaves a 400s first attempt;
    # mock it to consume ~0s so the retry sees roughly the same window.
    run, calls = _fake_run(["timeout", "timeout"])
    monkeypatch.setattr(subprocess, "run", run)
    bench.measure_peak_subprocess(time.time() + bench.PEAK_REST_RESERVE_S + 400)
    assert len(calls) == 2
    assert all(180 <= t <= 400.5 for t in calls), calls


def test_starved_budget_skips_without_spawning(bench, monkeypatch):
    # under the 180s claim+compile+measure floor: must not even spawn
    run, calls = _fake_run([])
    monkeypatch.setattr(subprocess, "run", run)
    rec = bench.measure_peak_subprocess(
        time.time() + bench.PEAK_REST_RESERVE_S + 100)
    assert rec is None
    assert calls == []


def test_no_deadline_keeps_legacy_900s_budget(bench, monkeypatch):
    run, calls = _fake_run(["timeout", "timeout"])
    monkeypatch.setattr(subprocess, "run", run)
    assert bench.measure_peak_subprocess() is None
    assert calls == [900.0, 900.0]


def test_clean_empty_child_is_not_retried(bench, monkeypatch):
    # peak_only prints {} when no batch size works: a real answer, not a
    # transport failure — retrying would double the cost for nothing
    run, calls = _fake_run([json.dumps({}) + "\n"])
    monkeypatch.setattr(subprocess, "run", run)
    rec = bench.measure_peak_subprocess(time.time() + bench.BENCH_DEADLINE_S)
    assert rec is None
    assert len(calls) == 1
