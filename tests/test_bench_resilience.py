"""bench.py resilience machinery (VERDICT r4 item 1).

Round 4's driver bench died rc=124 with zero rows because results printed
only at process exit. These tests pin the machinery that prevents a repeat:
rows stream as measured, any exit path emits ONE parseable JSON line with
whatever exists, the headline picks the best serving row present, and a
section failure records an error row instead of killing the run.

Subprocess tests drive the real CLI against a tiny budget so the watchdog
path is exercised for real (CPU platform — no TPU needed to reach the
partial dump).
"""

import json
import os
import signal
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _fresh_bench():
    """Import bench with clean module state (its ROWS/STATE are globals)."""
    import importlib

    sys.path.insert(0, REPO)
    import bench

    importlib.reload(bench)
    return bench


def test_headline_prefers_best_serving_row():
    bench = _fresh_bench()
    name, val = bench._headline({
        "greedy_k8_infer_videos_per_s": 500.0,
        "greedy_dev_bf16_B16_videos_per_s": 678.0,
        "greedy_dev_bf16_B32_videos_per_s": 570.0,
        "greedy_infer_dev_bf16_fused_videos_per_s": 593.0,
        "greedy_infer_dev_videos_per_s": 588.0,
    })
    assert name == "greedy_dev_bf16_B16" and val == 678.0


def test_headline_with_no_rows_is_null_not_crash():
    bench = _fresh_bench()
    name, val = bench._headline({"device_health_probe_s": 2.0})
    assert name is None and val == 0.0


def test_finalize_emits_valid_partial_json(capsys):
    bench = _fresh_bench()
    bench.emit("greedy_dev_bf16_B16_videos_per_s", 600.0)
    bench.emit("some_other_row", 1.0)
    bench.finalize(partial=True, reason="unit test")
    out = capsys.readouterr().out.strip().splitlines()[-1]
    d = json.loads(out)
    assert d["partial"] is True and d["partial_reason"] == "unit test"
    assert d["value"] == 600.0
    assert d["rows"]["some_other_row"] == 1.0
    # idempotent: a second finalize (e.g. signal during finalize) is a no-op
    bench.finalize(partial=True, reason="again")
    assert capsys.readouterr().out.strip() == ""


def test_section_failure_records_error_row_and_continues():
    bench = _fresh_bench()
    with bench.section("doomed"):
        raise ValueError("boom with a long message " + "x" * 500)
    assert bench.ROWS["doomed_error"].startswith("ValueError: boom")
    assert len(bench.ROWS["doomed_error"]) < 250


@pytest.mark.slow
def test_cli_budget_expiry_dumps_partial_json_rc0():
    """The real CLI with a 10s budget must exit 0 with a parseable partial
    JSON even though nothing was measured yet."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"  # health probe + setup run on CPU instantly
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--budget-s", "10"],
        capture_output=True, text=True, timeout=300, env=env, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-500:]
    d = json.loads(r.stdout.strip().splitlines()[-1])
    assert d["partial"] is True
    assert d["metric"] == "dvc_inference_videos_per_sec_per_chip"


@pytest.mark.slow
def test_cli_sigterm_dumps_partial_json():
    """SIGTERM mid-run (what `timeout` sends) produces the partial JSON —
    the exact scenario that produced round 4's empty BENCH."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    p = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "bench.py"), "--budget-s", "600"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        cwd=REPO,
    )
    try:
        time.sleep(15)  # past the health probe, into setup/measure
        p.send_signal(signal.SIGTERM)
        out, err = p.communicate(timeout=120)
    finally:
        if p.poll() is None:
            p.kill()
    lines = [ln for ln in out.strip().splitlines() if ln.startswith("{")]
    assert lines, f"no JSON line after SIGTERM; stderr tail: {err[-300:]}"
    d = json.loads(lines[-1])
    assert d["partial"] is True and "SIGTERM" in d["partial_reason"]
