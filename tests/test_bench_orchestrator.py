"""Unit coverage for bench.py's full-mode orchestrator.

The orchestrator is the driver-facing entry (the end-of-round capture
runs plain `python bench.py`): it must print the headline JSON line the
moment the headline leg returns, kill diagnostic legs at the budget
deadline, retry the headline under HOIG_COMPILE_LITE after a timeout,
and merge per-leg details without clobbering the frozen baseline entry.
Round 4 lost its entire benchmark to exactly these failure modes
(rc=124, parsed=null — see PERF.md round-5 notes), so the logic is
tested with a faked subprocess layer; no TPU or compile service needed.
"""

import json
import os
import subprocess
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


class FakeProc:
    def __init__(self, stdout, returncode=0):
        self.stdout = stdout
        self.returncode = returncode


def _leg_output(name, extra=None):
    d = {f"{name}_images_per_sec_per_chip": 15.0,
         f"{name}_step_ms": 266.5, f"{name}_compile_s": 30.0}
    if extra:
        d.update(extra)
    return "noise\nLEGDETAILS " + json.dumps(d) + "\n"


def _run_orchestrator(monkeypatch, tmp_path, fake_run, budget="2700"):
    monkeypatch.chdir(tmp_path)  # BENCH_DETAILS.json lands here
    monkeypatch.setenv("HOIG_BENCH_BUDGET_S", budget)
    monkeypatch.setattr(subprocess, "run", fake_run)
    bench.orchestrate()
    return json.load(open(tmp_path / "BENCH_DETAILS.json"))


def test_happy_path_merges_legs_and_prints_headline(
    monkeypatch, tmp_path, capsys
):
    calls = []

    def fake_run(cmd, env=None, stdout=None, text=None, timeout=None):
        name = env["HOIG_BENCH_LEG"]
        calls.append((name, env.get("HOIG_COMPILE_LITE")))
        extra = (
            {"baseline_estimate": {"a100_img_s_rederived_diagnostic": 17.2}}
            if name == "gen_fwd" else None
        )
        return FakeProc(_leg_output(name, extra))

    details = _run_orchestrator(monkeypatch, tmp_path, fake_run)

    assert [c[0] for c in calls] == ["train_bf16", *bench.DIAG_LEGS]
    assert all(lite is None for _, lite in calls)
    out = capsys.readouterr().out
    headline = json.loads(
        [l for l in out.splitlines() if l.startswith("{")][0]
    )
    assert headline["value"] == 15.0
    assert headline["unit"] == "images/sec/chip"
    assert headline["vs_baseline"] == round(15.0 / bench.A100_EST_IMG_S, 3)
    # the gen_fwd leg's baseline diagnostic merged WITHOUT clobbering the
    # frozen denominator entry
    be = details["baseline_estimate"]
    assert be["a100_train_img_s_per_gpu_FROZEN"] == bench.A100_EST_IMG_S
    assert be["a100_img_s_rederived_diagnostic"] == 17.2
    assert details["compile_s_total"] == pytest.approx(150.0)


def test_headline_timeout_retries_with_compile_lite(
    monkeypatch, tmp_path, capsys
):
    calls = []

    def fake_run(cmd, env=None, stdout=None, text=None, timeout=None):
        name = env["HOIG_BENCH_LEG"]
        lite = env.get("HOIG_COMPILE_LITE")
        calls.append((name, lite, timeout))
        if name == "train_bf16" and lite != "1":
            raise subprocess.TimeoutExpired(cmd, timeout)
        return FakeProc(_leg_output(name))

    details = _run_orchestrator(monkeypatch, tmp_path, fake_run)

    assert calls[0][0] == "train_bf16" and calls[0][1] is None
    # first attempt capped at 45% of the budget
    assert calls[0][2] == pytest.approx(0.45 * 2700.0, rel=0.01)
    assert calls[1][0] == "train_bf16" and calls[1][1] == "1"
    assert details["headline_mode"] == "compile_lite_fallback"
    out = capsys.readouterr().out
    assert any(l.startswith("{") for l in out.splitlines())


def test_headline_failure_exits_nonzero_without_fake_number(
    monkeypatch, tmp_path, capsys
):
    def fake_run(cmd, env=None, stdout=None, text=None, timeout=None):
        raise subprocess.TimeoutExpired(cmd, timeout)

    with pytest.raises(SystemExit):
        _run_orchestrator(monkeypatch, tmp_path, fake_run)
    # no headline JSON line may be fabricated
    out = capsys.readouterr().out
    assert not any(l.startswith("{") for l in out.splitlines())


def test_diagnostic_legs_skipped_once_budget_exhausted(
    monkeypatch, tmp_path
):
    calls = []

    def fake_run(cmd, env=None, stdout=None, text=None, timeout=None):
        name = env["HOIG_BENCH_LEG"]
        calls.append(name)
        if name != "train_bf16" and timeout is not None:
            # a cold diagnostic leg hangs past its deadline: must be
            # killed, recorded, and NOT abort the remaining legs
            raise subprocess.TimeoutExpired(cmd, timeout)
        return FakeProc(_leg_output(name))

    # budget large enough to START each leg (the per-leg timeout then
    # kills it): all legs attempted, none recorded, run exits cleanly
    details = _run_orchestrator(monkeypatch, tmp_path, fake_run)
    assert calls == ["train_bf16", *bench.DIAG_LEGS]
    assert set(details["legs_skipped_for_budget"]) == set(bench.DIAG_LEGS)
    assert "train_bf16_b8_images_per_sec_per_chip" not in details


def test_cross_batch_sanity_flags_disagreement(monkeypatch, tmp_path):
    def fake_run(cmd, env=None, stdout=None, text=None, timeout=None):
        name = env["HOIG_BENCH_LEG"]
        if name == "train_bf16_b8":
            # 40x the per-image throughput of the b4 leg: impossible
            return FakeProc(_leg_output(name, {
                f"{name}_images_per_sec_per_chip": 600.0,
            }))
        return FakeProc(_leg_output(name))

    details = _run_orchestrator(monkeypatch, tmp_path, fake_run)
    assert "SANITY_FAIL_b4_vs_b8" in details
