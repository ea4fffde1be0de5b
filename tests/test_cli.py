"""CLI surface: flag parsing, precedence, dispatch, and --profile wiring.

The argparse surface is the reference's public contract
(``/root/reference/main.py:7-23``); these tests pin it with the heavy
work (trainers, evaluator, profiler) mocked out.
"""

import numpy as np
import pytest

from mmego_tpu import cli


def _args(argv):
    return cli.build_parser().parse_args(argv)


def test_reference_flags_all_parse():
    a = _args(["--train", "--network", "Upper_Net", "--epochs", "5",
               "--lr", "3e-4", "--batch_size", "10", "--log_dir", "42",
               "--load_IMU_path", "a.npz", "--load_Upper_path", "b.pth",
               "--load_Lower_path", "c.pth", "--device", "cuda:0",
               "--colab"])
    assert a.network == "Upper_Net" and a.train and not a.infer
    assert a.epochs == 5 and a.lr == 3e-4 and a.batch_size == 10
    assert a.log_dir == 42 and a.device == "cuda:0" and a.colab


def test_augment_flags():
    cfg = cli.config_from_args(_args(
        ["--train", "--network", "Upper_Net", "--augment_overlap",
         "--augment_cloud_sigma", "0.01"]))
    assert cfg.augment_overlap and cfg.augment_cloud_sigma == 0.01
    off = cli.config_from_args(_args(["--train", "--network", "Upper_Net"]))
    assert not off.augment_overlap and off.augment_cloud_sigma == 0.0


def test_cli_overrides_win_over_defaults():
    cfg = cli.config_from_args(_args(
        ["--train", "--network", "IMU_Net", "--epochs", "7", "--lr", "1e-5",
         "--log_dir", "99", "--load_Upper_path", "up.pth"]))
    assert cfg.epochs == 7 and cfg.lr == 1e-5 and cfg.idx == 99
    assert cfg.model_upper_path == "up.pth"
    # untouched flags keep their defaults
    assert cfg.batch_size == type(cfg)().batch_size


@pytest.mark.parametrize("network,attr", [("IMU_Net", "train_imu"),
                                          ("Upper_Net", "train_upper"),
                                          ("Lower_Net", "train_lower")])
def test_train_dispatch(monkeypatch, network, attr):
    from mmego_tpu.train import loop

    called = []
    for name in ("train_imu", "train_upper", "train_lower"):
        monkeypatch.setattr(loop, name,
                            lambda cfg, _n=name: called.append(_n))
    assert cli.main(["--train", "--network", network]) == 0
    assert called == [attr]


def test_train_without_network_exits(monkeypatch):
    from mmego_tpu.train import loop
    for name in ("train_imu", "train_upper", "train_lower"):
        monkeypatch.setattr(loop, name, lambda cfg: None)
    with pytest.raises(SystemExit):
        cli.main(["--train"])


def test_profile_wraps_train(monkeypatch):
    """--profile must trace --train runs too (it silently didn't, once) and
    stop the trace even when the trainer raises."""
    import jax

    from mmego_tpu.train import loop

    events = []
    monkeypatch.setattr(jax.profiler, "start_trace",
                        lambda path: events.append(("start", path)))
    monkeypatch.setattr(jax.profiler, "stop_trace",
                        lambda: events.append(("stop",)))
    monkeypatch.setattr(loop, "train_imu",
                        lambda cfg: events.append(("train",)))
    assert cli.main(["--train", "--network", "IMU_Net", "--profile"]) == 0
    assert [e[0] for e in events] == ["start", "train", "stop"]

    events.clear()
    monkeypatch.setattr(loop, "train_imu",
                        lambda cfg: (_ for _ in ()).throw(RuntimeError("x")))
    with pytest.raises(RuntimeError):
        cli.main(["--train", "--network", "IMU_Net", "--profile"])
    assert [e[0] for e in events] == ["start", "stop"]


def test_infer_dispatch(monkeypatch):
    from mmego_tpu import infer
    from mmego_tpu.viz import curves

    seen = {}

    def fake_eval(cfg, return_preds):
        seen["cfg"] = cfg
        assert return_preds is False
        return {"per_joint_cm": np.zeros(21)}

    monkeypatch.setattr(infer, "evaluate", fake_eval)
    monkeypatch.setattr(curves, "draw_joint_bar", lambda *a, **k: None)
    assert cli.main(["--infer", "--log_dir", "5"]) == 0
    assert seen["cfg"].idx == 5


def test_infer_ensemble_dispatch(monkeypatch):
    from mmego_tpu import infer

    seen = {}
    monkeypatch.setattr(infer, "evaluate_ensemble",
                        lambda cfg, stacks: seen.update(stacks=stacks))
    assert cli.main(["--infer", "--ensemble", "headline,/tmp/a,/tmp/b"]) == 0
    assert seen["stacks"] == ["headline", "/tmp/a", "/tmp/b"]
