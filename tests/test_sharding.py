"""Multi-device data-parallel tests on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from mmego_tpu.parallel import mesh as mesh_mod


def test_mesh_spans_devices():
    mesh = mesh_mod.make_mesh()
    assert mesh.devices.size == 8
    mesh4 = mesh_mod.make_mesh(4)
    assert mesh4.devices.size == 4


def test_shard_batch_layout():
    mesh = mesh_mod.make_mesh()
    x = np.arange(8 * 4, dtype=np.float32).reshape(8, 4)
    sx = mesh_mod.shard_batch(mesh, x)
    assert len(sx.addressable_shards) == 8
    assert sx.addressable_shards[0].data.shape == (1, 4)
    np.testing.assert_array_equal(np.asarray(sx), x)


def test_replicated_params():
    mesh = mesh_mod.make_mesh()
    p = {"w": np.ones((3, 3), np.float32)}
    rp = mesh_mod.replicate(mesh, p)
    assert rp["w"].addressable_shards[0].data.shape == (3, 3)


def test_dp_grad_matches_single_device():
    """A jitted loss/grad over a sharded batch must equal the single-device
    result -- XLA inserts the cross-device reduction."""
    mesh = mesh_mod.make_mesh()
    rng = np.random.RandomState(0)
    w0 = jnp.asarray(rng.randn(16, 8).astype(np.float32))
    x = rng.randn(32, 16).astype(np.float32)
    y = rng.randn(32, 8).astype(np.float32)

    def loss(w, x, y):
        return jnp.sum((x @ w - y) ** 2)

    g_single = jax.grad(loss)(w0, jnp.asarray(x), jnp.asarray(y))

    xs = mesh_mod.shard_batch(mesh, jnp.asarray(x))
    ys = mesh_mod.shard_batch(mesh, jnp.asarray(y))
    ws = mesh_mod.replicate(mesh, w0)
    g_dp = jax.jit(jax.grad(loss))(ws, xs, ys)
    np.testing.assert_allclose(np.asarray(g_dp), np.asarray(g_single),
                               rtol=1e-4, atol=1e-4)


def test_pad_to_multiple():
    x = np.arange(10).reshape(10, 1)
    padded, n = mesh_mod.pad_to_multiple(x, 8)
    assert padded.shape == (16, 1) and n == 10
    padded2, n2 = mesh_mod.pad_to_multiple(x[:8], 8)
    assert padded2.shape == (8, 1) and n2 == 8


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (4, 20, 21, 3)
    assert np.isfinite(np.asarray(out)).all()
