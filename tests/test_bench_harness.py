"""The bench orchestrator must print its final JSON line no matter what
individual stages do (round 2's score was lost to a stage crash that killed
the process before the final print — VERDICT.md round 2, item 1).

These tests run the REAL ``bench.py`` parent in a subprocess on CPU with
tiny shapes, injecting stage failures/hangs via the BENCH_INJECT_* hooks,
and assert rc == 0 with a parseable last-line JSON every time.
"""

import json
import os
import subprocess
import sys

import pytest

BENCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "bench.py")


def _run_bench(env_extra, timeout=600):
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        BENCH_NSIDE="16",
        BENCH_K20_NSIDE="16",
        BENCH_MODEL_NSIDE="16",
        BENCH_BATCH="2",
        # default-off: each test opts specific stages in
        BENCH_CORE="0", BENCH_MODEL="0", BENCH_GATHER="0",
        BENCH_K20="0", BENCH_SMOOTH="0",
    )
    env.update(env_extra)
    proc = subprocess.run(
        [sys.executable, BENCH], env=env, text=True, timeout=timeout,
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
    )
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    assert lines, "bench printed nothing to stdout"
    return proc.returncode, json.loads(lines[-1])


def test_all_stages_injected_to_fail_still_prints_json():
    rc, result = _run_bench({
        "BENCH_CORE": "1", "BENCH_GATHER": "1", "BENCH_K20": "1",
        "BENCH_INJECT_FAIL": "core,gather,k20",
    })
    assert rc == 0
    assert result["unit"] == "maps/s"
    assert result["value"] == 0.0
    extra = result["extra"]
    assert "core_error" in extra
    assert "gather_error" in extra
    assert "k20_error" in extra
    assert "headline_error" in extra


def test_hung_stage_is_killed_and_json_prints():
    rc, result = _run_bench({
        "BENCH_GATHER": "1",
        "BENCH_INJECT_HANG": "gather",
        # small budget so the timeout math resolves quickly; the hang is
        # killed at max(remaining-30, MIN_STAGE_S) with MIN_STAGE_S=5
        "BENCH_BUDGET_S": "40",
        "BENCH_MIN_STAGE_S": "5",
    }, timeout=300)
    assert rc == 0
    assert "timeout" in result["extra"].get("gather_error", "")


def test_core_runs_and_headline_banked_on_cpu():
    """End-to-end tiny run: the core stage measures a real step_ms and the
    parent computes the headline from it."""
    rc, result = _run_bench({"BENCH_CORE": "1"}, timeout=900)
    assert rc == 0
    assert result["value"] > 0
    assert result["extra"]["step_ms"] > 0
    # train sub-stage banked too (same child, later marker)
    assert ("train_step_ms" in result["extra"]
            or "train_step_error" in result["extra"])


def test_partial_crash_keeps_earlier_stage_results():
    """A crash in a LATER stage must not lose earlier stages' numbers —
    the exact round-2 failure mode."""
    rc, result = _run_bench({
        "BENCH_CORE": "1", "BENCH_K20": "1",
        "BENCH_INJECT_FAIL": "k20",
        "BENCH_RECOVER_S": "0",
    }, timeout=900)
    assert rc == 0
    assert result["value"] > 0          # headline survived
    assert "k20_error" in result["extra"]
