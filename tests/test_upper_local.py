import numpy as np
import jax
import jax.numpy as jnp
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
    joints, q, cloud_h, _ = upper_local.upper_local_apply(
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


def test_upper_local_trainable():
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

    g = jax.grad(loss_fn)(params)
    norms = [float(jnp.abs(x).sum()) for x in jax.tree.leaves(g)]
    assert sum(1 for v in norms if v > 0) > len(norms) * 0.8
