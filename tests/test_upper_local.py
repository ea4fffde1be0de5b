import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from mmego_tpu.models import upper_local
from mmego_tpu.ops import rotation


def test_upper_local_shapes_and_finite():
    params, state = upper_local.upper_local_init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    cloud = jnp.asarray(rng.randn(2, 4, 64, 6).astype(np.float32))
    bones = jnp.asarray(np.tile(rng.randn(1, 20, 3).astype(np.float32) * 0.2, (2, 1, 1)))
    r = rotation.rot6d_to_matrix(jnp.asarray(rng.randn(2, 4, 6).astype(np.float32)))
    t = jnp.asarray(rng.randn(2, 4, 3).astype(np.float32) * 0.1)
    joints, q, cloud_h, _ = jax.jit(upper_local.upper_local_apply)(
        params, state, cloud, bones, r, t)
    assert joints.shape == (2, 4, 15, 3)
    assert q.shape == (2, 4, 14, 3, 3)
    assert np.isfinite(np.asarray(joints)).all()


def test_conv3d_full_matches_torch():
    """The collapsed 3^3-kernel conv must equal torch Conv3d on a 3^3 grid."""
    torch.manual_seed(0)
    conv = torch.nn.Conv3d(5, 7, kernel_size=3)
    x = np.random.RandomState(0).randn(4, 5, 3, 3, 3).astype(np.float32)
    with torch.no_grad():
        want = conv(torch.from_numpy(x)).numpy().reshape(4, 7)
    p = {"w": jnp.asarray(conv.weight.detach().numpy()),
         "b": jnp.asarray(conv.bias.detach().numpy())}
    got = upper_local._conv3d_full_apply(p, jnp.asarray(x.transpose(0, 2, 3, 4, 1)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


@pytest.fixture(scope="module")
def upper_local_grads():
    """One JITTED grad of the full local-variant forward, shared by the
    trainability and gradient-flow tests (eager jax.grad dispatches the whole
    model op-by-op and dominated the suite's wall time)."""
    params, state = upper_local.upper_local_init(jax.random.PRNGKey(1))
    rng = np.random.RandomState(1)
    cloud = jnp.asarray(rng.randn(1, 3, 32, 6).astype(np.float32))
    bones = jnp.asarray(rng.randn(1, 20, 3).astype(np.float32) * 0.2)
    r = jnp.broadcast_to(jnp.eye(3), (1, 3, 3, 3))
    t = jnp.zeros((1, 3, 3))
    target = jnp.asarray(rng.randn(1, 3, 15, 3).astype(np.float32))

    def loss_fn(p):
        joints, _, _, _ = upper_local.upper_local_apply(
            p, state, cloud, bones, r, t, train=True, rng=jax.random.PRNGKey(2))
        return jnp.sum(jnp.abs(joints - target))

    return jax.jit(jax.grad(loss_fn))(params)


def test_upper_local_trainable(upper_local_grads):
    norms = [float(jnp.abs(x).sum())
             for x in jax.tree.leaves(upper_local_grads)]
    assert sum(1 for v in norms if v > 0) > len(norms) * 0.8


def test_local_branch_gradients_flow_through_anchor_grouping(upper_local_grads):
    """The local branch sits entirely downstream of the anchor-grouping
    top_k gather; its gradients must be nonzero (the top_k INDICES are
    non-differentiable, the gathered features are not)."""
    for branch in ("local_pointnet", "local_attn", "voxel", "arnn",
                   "comb_fc1", "comb_fc2"):
        total = sum(float(jnp.abs(x).sum())
                    for x in jax.tree.leaves(upper_local_grads[branch]))
        assert total > 0.0, f"no gradient reached params[{branch!r}]"


@pytest.mark.slow
def test_train_upper_local_via_trainer(tmp_path, monkeypatch):
    """cfg.upper_local routes the stage-2 trainer onto UpperNetwlocal and the
    loss moves; checkpoints land under the run tree."""
    import os
    import unittest.mock as mock
    from mmego_tpu.config import Config
    from mmego_tpu.checkpoint import store
    from mmego_tpu.models import imu_net
    from mmego_tpu.train import loop

    from _helpers import tiny_windows

    rng = np.random.RandomState(5)
    n, l, pts = 6, 4, 16

    def _data(n):
        return tiny_windows(rng, n, l=l, pts=pts)

    cfg = Config(idx=95, frame_no=l, pc_no=pts, lower_pc_no=8, batch_size=4,
                 early_stop_patience=100, save_slot=100, upper_local=True,
                 report_root=str(tmp_path / "runs"),
                 model_imu_path=str(tmp_path / "imu.npz"))
    data = {"train": _data(n), "test": _data(4)}
    monkeypatch.setenv("MMEGO_DP", "off")
    monkeypatch.setattr(loop.dataset_mod, "load_split",
                        lambda c, split: data[split])
    orig_init = imu_net.imu_net_init
    with mock.patch.object(loop.imu_net, "imu_net_init",
                           lambda r: orig_init(r, hidden=16)):
        imu_params, _ = loop.train_imu(cfg.replace(upper_local=False),
                                       max_epochs=1, verbose=False)
        store.save(cfg.model_imu_path, imu_params)
        (params, state), ckpt = loop.train_upper(cfg, max_epochs=2,
                                                 verbose=False)
    assert ckpt is not None and os.path.exists(ckpt)
    # the checkpoint round-trips against the local-variant template
    from mmego_tpu.models import upper_local as ul
    template, _ = ul.upper_local_init(jax.random.PRNGKey(0))
    loaded = store.load(ckpt, template)
    assert len(jax.tree.leaves(loaded)) == len(jax.tree.leaves(template))
