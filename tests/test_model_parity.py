"""Activation parity vs the reference implementation.

Fixtures in tests/fixtures were produced by running the *reference* torch
models (shipped Upper/Lower checkpoints; recorded-weight IMU net) on recorded
inputs -- see tests/gen_fixtures.py.  These tests import the same checkpoints
through checkpoint/torch_import and require our pure-JAX forward passes to
reproduce the reference activations to float32 tolerance.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from mmego_tpu.checkpoint import torch_import
from mmego_tpu.models import imu_net, upper_net, lower_net

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures")
_REF_UPPER = os.path.join(
    os.path.dirname(__file__), "..", "..", "reference", "Resource",
    "Pretrained_model", "Upper_Net", "epoch451_batch20frame20lr3e-05.pth")
_REF_LOWER = os.path.join(
    os.path.dirname(__file__), "..", "..", "reference", "Resource",
    "Pretrained_model", "Lower_Net", "epoch161_batch20frame20lr0.0003.pth")

needs_ckpts = pytest.mark.skipif(
    not (os.path.exists(_REF_UPPER) and os.path.exists(_REF_LOWER)),
    reason="reference checkpoints absent")


@pytest.fixture(scope="module")
def fx():
    return dict(np.load(os.path.join(FIXDIR, "cascade_parity.npz")))


@needs_ckpts
def test_upper_net_parity(fx):
    params, state = torch_import.import_upper(_REF_UPPER)
    joints, q, cloud_h, _ = upper_net.upper_net_apply(
        params, state, jnp.asarray(fx["cloud"]), jnp.asarray(fx["bones"]),
        jnp.asarray(fx["r"]), jnp.asarray(fx["t"]))
    np.testing.assert_allclose(np.asarray(cloud_h), fx["cloud_after_upper"],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(q), fx["upper_q"], rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(joints), fx["upper_l"],
                               rtol=1e-3, atol=1e-4)


@needs_ckpts
def test_lower_net_parity(fx):
    params, state = torch_import.import_lower(_REF_LOWER)
    joints, q, _ = lower_net.lower_net_apply(
        params, state, jnp.asarray(fx["upper_l"]),
        jnp.asarray(fx["cloud_after_upper"]), jnp.asarray(fx["bones"]),
        jnp.asarray(fx["r"]), jnp.asarray(fx["t"]))
    np.testing.assert_allclose(np.asarray(q), fx["lower_q"], rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(joints), fx["lower_l"],
                               rtol=1e-3, atol=1e-4)


@needs_ckpts
def test_lower_net_bf16_storage_bound(fx, monkeypatch):
    """Pin the OPT-IN bf16 ST-GCN storage path's deviation from goldens.

    The measured max joint shift is ~1.7 cm -- the reason bf16 storage is
    NOT the default (models/stgcn.py::_storage_dtype).  This test keeps the
    opt-in path working and documents its error envelope; if a future
    kernel change brings the bound under ~2 mm, flipping the default
    becomes worth re-evaluating.
    """
    monkeypatch.setenv("MMEGO_GCN_STORAGE", "bfloat16")
    params, state = torch_import.import_lower(_REF_LOWER)
    joints, q, _ = lower_net.lower_net_apply(
        params, state, jnp.asarray(fx["upper_l"]),
        jnp.asarray(fx["cloud_after_upper"]), jnp.asarray(fx["bones"]),
        jnp.asarray(fx["r"]), jnp.asarray(fx["t"]))
    assert float(np.max(np.abs(np.asarray(joints) - fx["lower_l"]))) < 2.5e-2
    assert float(np.max(np.abs(np.asarray(q) - fx["lower_q"]))) < 0.12


def test_imu_net_parity():
    data = dict(np.load(os.path.join(FIXDIR, "imu_parity.npz")))
    sd = {k[len("sd__"):]: v for k, v in data.items() if k.startswith("sd__")}

    from mmego_tpu.checkpoint.torch_import import _linear, _lstm  # noqa: internal reuse
    params = {
        "fc1": _linear(sd, "fc1"),
        "rnn_fast": _lstm(sd, "rnn_fast", num_layers=2),
        "attn": _linear(sd, "attn"),
        "rnn_slow": _lstm(sd, "rnn_slow", num_layers=2),
        "fc2": _linear(sd, "fc2"),
    }
    r, t = imu_net.imu_net_apply(params, jnp.asarray(data["imu"]))
    np.testing.assert_allclose(np.asarray(r), data["r"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(t), data["t"], rtol=1e-4, atol=1e-5)
