"""Pallas LSTM recurrence kernel vs the lax.scan reference (interpret mode;
the same kernel is bit-exact against the scan on real TPU hardware)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.experimental.pallas import tpu as pltpu

from mmego_tpu.nn import lstm as lstm_mod
from mmego_tpu.ops import pallas_lstm


@pytest.mark.parametrize("reverse", [False, True])
def test_kernel_matches_scan(reverse):
    params = lstm_mod.lstm_init(jax.random.PRNGKey(0), 64, 32, 1, True)
    p = params[0]["bwd" if reverse else "fwd"]
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(100, 20, 64).astype(np.float32))
    want, _ = lstm_mod._scan_direction(p, x, reverse, None, None)
    with pltpu.force_tpu_interpret_mode():
        got = pallas_lstm.lstm_scan_direction(p, x, reverse)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_kernel_pads_ragged_batch():
    params = lstm_mod.lstm_init(jax.random.PRNGKey(1), 16, 16, 1, True)
    p = params[0]["fwd"]
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(7, 5, 16).astype(np.float32))  # 7 % BLOCK_B != 0
    want, _ = lstm_mod._scan_direction(p, x, False, None, None)
    with pltpu.force_tpu_interpret_mode():
        got = pallas_lstm.lstm_scan_direction(p, x, False)
    assert got.shape == (7, 5, 16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_lstm_apply_pallas_gate():
    """pallas_ctl.override routes eval-mode lstm_apply through fused_stack."""
    from mmego_tpu.ops import pallas_ctl

    params = lstm_mod.lstm_init(jax.random.PRNGKey(2), 12, 8, 2, True)
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(4, 6, 12).astype(np.float32))
    with pallas_ctl.override(False):
        want, _ = lstm_mod.lstm_apply(params, x)
    with pallas_ctl.override(True), pltpu.force_tpu_interpret_mode():
        got, _ = lstm_mod.lstm_apply(params, x)
    # fused_stack stores x/y and weights in bf16 (gates/state stay f32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=3e-2)
    assert np.abs(np.asarray(want)).max() > 0.05  # tolerance is meaningful


def test_fused_stack_matches_scan_stack():
    """v2 kernel: 2-layer bidirectional stack vs the lax.scan stack."""
    from mmego_tpu.ops import pallas_ctl

    params = lstm_mod.lstm_init(jax.random.PRNGKey(3), 24, 16, 2, True)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(37, 9, 24).astype(np.float32))  # ragged batch
    with pallas_ctl.override(False):
        want, _ = lstm_mod.lstm_apply(params, x)
    with pltpu.force_tpu_interpret_mode():
        got = pallas_lstm.fused_stack(params, x)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=3e-2)
    corr = np.corrcoef(np.asarray(got).ravel(), np.asarray(want).ravel())[0, 1]
    assert corr > 0.999


def test_fused_stack_differentiable_via_scan_vjp():
    """Eval-mode forwards are legitimately differentiated (stage-1 training
    runs with train=False, dropout 0 -- Train_IMU.py:50).  The kernel's
    custom_vjp must route the backward pass through the scan surrogate and
    produce gradients matching the pure-scan path."""
    from mmego_tpu.ops import pallas_ctl

    params = lstm_mod.lstm_init(jax.random.PRNGKey(5), 12, 8, 2, True)
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(5, 6, 12).astype(np.float32))

    def loss(p, path_pallas):
        with pallas_ctl.override(path_pallas):
            out, _ = lstm_mod.lstm_apply(p, x)
        return jnp.sum(out * out)

    with pltpu.force_tpu_interpret_mode():
        g_kernel = jax.grad(lambda p: loss(p, True))(params)
    g_scan = jax.grad(lambda p: loss(p, False))(params)
    for a, b in zip(jax.tree.leaves(g_kernel), jax.tree.leaves(g_scan)):
        # backward recomputes via the scan in f32; only the incoming
        # cotangents differ (bf16 forward values), so gradients agree tightly
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0.05, atol=0.05)


def test_imu_net_tm_pooling_grad_matches_scan_path():
    """imu_net's kernel path (fused_stack_tm_attn + time-major pooling) must be
    differentiable and agree with the scan path's gradients -- this is the
    exact trace stage-1 training hits on TPU (train=False, dropout 0)."""
    from mmego_tpu.models import imu_net
    from mmego_tpu.ops import pallas_ctl

    params = imu_net.imu_net_init(jax.random.PRNGKey(7), hidden=16,
                                  num_layers=2)
    rng = np.random.RandomState(7)
    imu = jnp.asarray(rng.randn(2, 2, 20, 15).astype(np.float32))

    def loss(p, path_pallas):
        with pallas_ctl.override(path_pallas):
            r, t = imu_net.imu_net_apply(p, imu)
        return jnp.sum(r * r) + jnp.sum(t * t)

    with pltpu.force_tpu_interpret_mode():
        g_kernel = jax.grad(lambda p: loss(p, True))(params)
    g_scan = jax.grad(lambda p: loss(p, False))(params)
    flat_k = jnp.concatenate([x.ravel() for x in jax.tree.leaves(g_kernel)])
    flat_s = jnp.concatenate([x.ravel() for x in jax.tree.leaves(g_scan)])
    corr = np.corrcoef(np.asarray(flat_k), np.asarray(flat_s))[0, 1]
    assert corr > 0.999
    assert float(jnp.abs(flat_k).sum()) > 0


def test_fused_stack_tm_attn_matches_posthoc_logits():
    """In-kernel attention logits == post-hoc einsum over the halves (both
    directions' scratch column orders; bf16-grade tolerance since the
    kernel's aw rides the MXU in bf16)."""
    pll = pallas_lstm

    params = lstm_mod.lstm_init(jax.random.PRNGKey(0), 24, 16, 2, True)
    x_tm = jax.random.normal(jax.random.PRNGKey(1), (7, 40, 24), jnp.float32)
    aw = jax.random.normal(jax.random.PRNGKey(2), (32, 1), jnp.float32)
    ab = jnp.full((1,), 0.3, jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        y_f, y_b = pll._fused_stack_tm_pre_impl(params, x_tm)
        y_f2, y_b2, logits = pll._fused_stack_tm_attn_impl(params, x_tm, aw, ab)
    np.testing.assert_array_equal(np.asarray(y_f2), np.asarray(y_f))
    np.testing.assert_array_equal(np.asarray(y_b2), np.asarray(y_b))
    ref = (jnp.einsum("tbh,ho->tbo", y_f.astype(jnp.float32), aw[:16]) +
           jnp.einsum("tbh,ho->tbo", y_b.astype(jnp.float32), aw[16:]) + ab)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_plan_routing(monkeypatch):
    """_plan: small batches -> one whole-batch v2 block; large -> pipe 448;
    explicit block_b overrides size but not the small-batch v2 downgrade."""
    from mmego_tpu.ops import pallas_lstm as pll

    monkeypatch.delenv("MMEGO_LSTM_PIPE", raising=False)
    assert pll._plan(835) == (False, 840)         # slow stack: one v2 block
    assert pll._plan(16700) == (True, 448)        # fast stack: pipe
    assert pll._plan(16700, 384) == (True, 384)   # explicit sweep override
    assert pll._plan(40, 8) == (False, 8)         # tiny test shapes stay v2
    monkeypatch.setenv("MMEGO_LSTM_PIPE", "0")
    assert pll._plan(16700) == (False, pll.BLOCK_B)
