"""bench.py driver contract: stdout carries EXACTLY one parseable JSON line.

The round driver runs ``python bench.py`` and records stdout; any stray
print (selfcheck audit lines, context) must ride stderr.  These tests mock
the heavy pieces (backend probe, data, cascade) and pin the contract for
the normal, --train-fallback, and selfcheck-failure paths.
"""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from _helpers import tiny_windows


@pytest.fixture
def fallback_world(monkeypatch):
    """bench.main wired to a CPU-fallback world with a stub cascade."""
    from mmego_tpu import infer
    from mmego_tpu.data import dataset as dataset_mod
    import mmego_tpu.utils.platform as platform_mod

    monkeypatch.setattr(platform_mod, "ensure_reachable_backend",
                        lambda *a, **k: ("cpu", "unreachable"))
    monkeypatch.setattr(dataset_mod, "load_split",
                        lambda cfg, split: tiny_windows(
                            np.random.RandomState(0), 5))
    monkeypatch.setattr(bench, "_load_params",
                        lambda cfg: ("params", "state", True))

    def fake_evaluate(cfg, **kw):
        assert kw.get("verbose") is False
        return {"it_per_s": 123.4, "windows": 5, "elapsed_s": 0.04,
                "avg_cm": 2.0, "upper_cm": 1.9, "lower_cm": 2.2,
                "rot_deg": 3.6}

    monkeypatch.setattr(infer, "evaluate", fake_evaluate)
    return monkeypatch


def _stdout_json(capsys):
    out, _ = capsys.readouterr()
    lines = [l for l in out.splitlines() if l.strip()]
    assert len(lines) == 1, f"stdout must be ONE JSON line, got: {lines!r}"
    return json.loads(lines[0])


def test_fallback_inference_line(fallback_world, monkeypatch, capsys):
    monkeypatch.setattr(bench, "_selfcheck", lambda *a, **k: True)
    assert bench.main([]) == 0
    j = _stdout_json(capsys)
    assert j["metric"] == "cascade_inference_throughput"
    assert j["value"] == 123.4 and j["unit"] == "it/s"
    assert j["vs_baseline"] == round(123.4 / bench.BASELINE_IT_S, 2)
    # reproducibility companion: median of the winning batch's passes
    assert j["median_it_s"] == 123.4
    # a CPU number must never be mistaken for an accelerator result
    assert j["platform"] == "cpu" and "note" in j


def test_fallback_train_skips_immediately(fallback_world, capsys):
    assert bench.main(["--train"]) == 1
    j = _stdout_json(capsys)
    assert j["metric"] == "train_epoch_time_all_stages"
    assert j["value"] == 0.0 and "error" in j and j["platform"] == "cpu"


def test_selfcheck_failure_refuses_to_publish(fallback_world, monkeypatch,
                                              capsys):
    monkeypatch.setattr(bench, "_selfcheck", lambda *a, **k: False)
    assert bench.main([]) == 1
    j = _stdout_json(capsys)
    assert j["value"] == 0.0 and j["error"] == "backend selfcheck failed"


def test_train_bench_reports_medians_and_survives_one_epoch(monkeypatch):
    """The training artifact reports the MEDIAN of post-compile epochs (the
    round-3 min-of-2 inherited tunnel jitter) plus the min for context, and
    must not crash when a stage records a single epoch (early stop)."""
    from mmego_tpu.train import loop

    fake_times = {"imu": [9.0, 2.0, 1.0, 3.0, 2.5, 2.2],   # median 2.35? no:
                  # steady = [2.0, 1.0, 3.0, 2.5, 2.2] -> median 2.2, min 1.0
                  "upper": [5.0, 4.0],                      # -> 4.0 / 4.0
                  "lower": [7.0]}                           # 1 epoch -> 7.0

    def fake(name):
        def run(cfg, verbose, max_epochs, timings):
            timings.extend(fake_times[name])
        return run

    monkeypatch.setattr(loop, "train_imu", fake("imu"))
    monkeypatch.setattr(loop, "train_upper", fake("upper"))
    monkeypatch.setattr(loop, "train_lower", fake("lower"))
    stages = bench.train_bench()
    assert stages["imu_s"] == 2.2 and stages["imu_min_s"] == 1.0
    assert stages["upper_s"] == 4.0 and stages["upper_min_s"] == 4.0
    # single-epoch stage: falls back to the only recorded time, no crash
    assert stages["lower_s"] == 7.0 and stages["lower_min_s"] == 7.0
