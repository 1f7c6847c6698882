"""The measurement-queue supervisor's retry path, exercised deliberately.

VERDICT r4 weak #6/#10: in round 4 the only step that died mid-queue
(hier_routed, rc=-15) was superseded manually instead of retried by the
machinery built for exactly that, so the retry path had never been
proven against reality. These tests drive queue_supervisor.main() with
stub steps on CPU: a step that is killed once and then succeeds must be
retried to completion; a step that keeps failing with a live tunnel must
exhaust MAX_ATTEMPTS and stop; wedge-induced failures (probe dead) must
NOT burn the retry budget.
"""

import importlib
import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "benchmarks"))

import queue_supervisor as qs  # noqa: E402


@pytest.fixture
def sandbox(tmp_path, monkeypatch):
    logs = tmp_path / "logs"
    logs.mkdir()
    monkeypatch.setattr(qs, "LOGS", str(logs))
    monkeypatch.setattr(qs, "STATE_PATH", str(logs / "queue_state.json"))
    monkeypatch.setattr(qs, "HERE", str(tmp_path))
    monkeypatch.setattr(qs, "probe", lambda timeout=120: True)
    monkeypatch.setattr(qs.time, "sleep", lambda s: None)
    return tmp_path


def _artifact_step(tmp_path, name, fail_times):
    """A step that dies (rc 7, no artifact) fail_times times, then writes
    its artifact — the completion predicate only passes after that."""
    art = tmp_path / f"{name}.json"
    counter = tmp_path / f"{name}.count"
    script = tmp_path / f"{name}.py"
    script.write_text(
        "import json, os, sys\n"
        f"cnt_path = {str(counter)!r}\n"
        "n = int(open(cnt_path).read()) if os.path.exists(cnt_path) else 0\n"
        "open(cnt_path, 'w').write(str(n + 1))\n"
        f"if n < {fail_times}:\n"
        "    sys.exit(7)  # simulates a killed/failed measurement\n"
        f"json.dump({{'ok': True}}, open({str(art)!r}, 'w'))\n"
    )

    def done():
        try:
            with open(art) as f:
                return json.load(f).get("ok") is True
        except Exception:
            return False

    return (name, [sys.executable, str(script)], 60, {}, done, None, None), \
        counter


def test_failed_step_is_retried_to_completion(sandbox, monkeypatch):
    step, counter = _artifact_step(sandbox, "flaky", fail_times=1)
    monkeypatch.setattr(qs, "STEPS", [step])
    assert qs.main() == 0
    assert int(counter.read_text()) == 2  # one failure + one retry
    state = qs.load_state()
    assert state["flaky"]["attempts"] == 1  # only the real failure counted


def test_persistent_failure_exhausts_attempts(sandbox, monkeypatch):
    step, counter = _artifact_step(sandbox, "broken", fail_times=99)
    monkeypatch.setattr(qs, "STEPS", [step])
    monkeypatch.setattr(qs, "MAX_ATTEMPTS", 3)
    assert qs.main() == 1  # gives up, does not hot-loop forever
    assert int(counter.read_text()) == 3
    assert qs.load_state()["broken"]["attempts"] == 3


def test_wedge_failures_do_not_burn_attempts(sandbox, monkeypatch):
    """A failure with a DEAD tunnel must not count toward MAX_ATTEMPTS:
    the supervisor goes back to waiting instead."""
    step, counter = _artifact_step(sandbox, "wedged", fail_times=2)
    monkeypatch.setattr(qs, "STEPS", [step])
    # probe: up to start each pass, dead when re-checked after failure 1,
    # alive from then on
    calls = {"n": 0}

    def flaky_probe(timeout=120):
        calls["n"] += 1
        return calls["n"] != 2  # the post-failure re-probe reports dead

    monkeypatch.setattr(qs, "probe", flaky_probe)
    assert qs.main() == 0
    state = qs.load_state()
    # 3 runs total (2 failures + success) but only ONE live-tunnel failure
    assert int(counter.read_text()) == 3
    assert state["wedged"]["attempts"] == 1


def test_partial_artifact_is_backed_up_before_retry(sandbox, monkeypatch):
    """A step with a backup target must have its partial artifact copied
    to .bak before a retry overwrites it."""
    name = "soak"
    art = sandbox / "soak.json"
    art.write_text(json.dumps({"epochs": 10}))  # partial progress
    script = sandbox / f"{name}.py"
    script.write_text(
        f"import json; json.dump({{'epochs': 500}}, open({str(art)!r}, 'w'))")

    def done():
        try:
            with open(art) as f:
                return json.load(f).get("epochs", 0) >= 500
        except Exception:
            return False

    step = (name, [sys.executable, str(script)], 60, {}, done, None,
            "soak.json")
    monkeypatch.setattr(qs, "STEPS", [step])
    assert qs.main() == 0
    with open(str(art) + ".bak") as f:
        assert json.load(f) == {"epochs": 10}
    assert done()
