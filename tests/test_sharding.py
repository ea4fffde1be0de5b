"""Multi-device data-parallel tests on the 8-device virtual CPU mesh."""

import os

import numpy as np
import pytest
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


@pytest.mark.slow
def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


@pytest.mark.slow
def test_entry_compiles():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (4, 20, 21, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_make_mesh_refuses_short():
    """Requesting more devices than exist must raise, never shrink."""
    with pytest.raises(ValueError, match="refusing"):
        mesh_mod.make_mesh(16)


# ---------------------------------------------------------------------------
# Tensor parallelism (parallel/tp.py)
# ---------------------------------------------------------------------------

def test_tp_spec_rule():
    """Shape-based placement: last divisible axis sharded, else fall back
    leftward, else replicate."""
    from jax.sharding import PartitionSpec as P
    from mmego_tpu.parallel import tp

    assert tp.spec_for((64, 256), 2) == P(None, "model")   # LSTM wi/wh
    assert tp.spec_for((256,), 2) == P("model")            # gate bias
    assert tp.spec_for((128, 87), 2) == P("model")         # head: row-parallel
    assert tp.spec_for((87,), 2) == P()                    # indivisible 1-D
    assert tp.spec_for((1,), 2) == P()                     # attn scalar bias
    assert tp.spec_for((), 2) == P()                       # optax count
    assert tp.spec_for((64, 256), 1) == P()                # tp off


def test_tp_mesh_and_shard_tree():
    """make_mesh(model=2) folds a model axis; shard_tree actually splits
    feature axes (not a silent replicate)."""
    from mmego_tpu.parallel import tp

    mesh = mesh_mod.make_mesh(8, model=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    with pytest.raises(ValueError, match="divisible"):
        mesh_mod.make_mesh(7, model=2)

    tree = {"wi": jnp.zeros((16, 64)), "b": jnp.zeros((64,)),
            "odd": jnp.zeros((3,))}
    st = tp.shard_tree(mesh, tree)
    assert st["wi"].addressable_shards[0].data.shape == (16, 32)
    assert st["b"].addressable_shards[0].data.shape == (32,)
    assert st["odd"].addressable_shards[0].data.shape == (3,)


def test_tp_per_leaf_rules_beat_shape_heuristic():
    """The rules escape hatch: a leaf whose batch-like axis is divisible
    (the heuristic would feature-shard it) is kept replicated by an
    explicit path rule; unmatched leaves still follow the heuristic, and
    rule order decides ties (first match wins)."""
    from jax.sharding import PartitionSpec as P
    from mmego_tpu.parallel import tp

    mesh = mesh_mod.make_mesh(8, model=2)
    tree = {"embed": {"table": jnp.zeros((32, 64))},
            "lstm": {"wi": jnp.zeros((16, 64))}}
    st = tp.shard_tree(mesh, tree, rules=[(r"embed.*table", P())])
    # pinned replicated despite a divisible last axis
    assert st["embed"]["table"].addressable_shards[0].data.shape == (32, 64)
    # sibling untouched by the rule: heuristic still shards the gate axis
    assert st["lstm"]["wi"].addressable_shards[0].data.shape == (16, 32)

    # first match wins over a later, broader rule
    st2 = tp.shard_tree(
        mesh, tree, rules=[(r"wi", P("model", None)), (r".", P())])
    assert st2["lstm"]["wi"].addressable_shards[0].data.shape == (8, 64)
    assert st2["embed"]["table"].addressable_shards[0].data.shape == (32, 64)


def test_data_mesh_env_matrix(monkeypatch):
    """_data_mesh honors the MMEGO_DP x MMEGO_TP matrix: dp-only (1-D),
    dp x tp (2-D over all devices), pure tp (1 x k over exactly k), off."""
    from mmego_tpu.train import loop

    monkeypatch.setenv("MMEGO_PALLAS", "0")

    monkeypatch.setenv("MMEGO_DP", "auto")
    monkeypatch.setenv("MMEGO_TP", "1")
    assert dict(loop._data_mesh().shape) == {"data": 8}

    monkeypatch.setenv("MMEGO_TP", "2")
    assert dict(loop._data_mesh().shape) == {"data": 4, "model": 2}

    monkeypatch.setenv("MMEGO_DP", "off")
    assert dict(loop._data_mesh().shape) == {"data": 1, "model": 2}

    monkeypatch.setenv("MMEGO_TP", "1")
    assert loop._data_mesh() is None


def test_tp_kernel_default_is_scoped_not_env(monkeypatch):
    """Building a TP mesh must NOT mutate process env (the round-3 advisor
    finding: os.environ.setdefault leaked a kernels-off default into later
    single-device inference).  The off default now lives in a pallas_ctl
    default_override scope active only inside _tp_scoped-wrapped steps."""
    from mmego_tpu.ops import pallas_ctl
    from mmego_tpu.train import loop

    monkeypatch.delenv("MMEGO_PALLAS", raising=False)
    monkeypatch.setenv("MMEGO_DP", "auto")
    monkeypatch.setenv("MMEGO_TP", "2")
    mesh = loop._data_mesh()
    assert "MMEGO_PALLAS" not in os.environ  # no process-global mutation

    probe = lambda: pallas_ctl._DEFAULT_OVERRIDE.get()
    assert loop._tp_scoped(mesh, probe)() == (False,)  # scoped inside a step
    assert pallas_ctl._DEFAULT_OVERRIDE.get() == ()    # gone outside it

    # DP-only meshes scope kernels off too (batch-sharded eval forwards are
    # as GSPMD-opaque as TP ones); only the mesh-free single-chip path --
    # where the per-epoch eval runs the fused kernels -- passes through.
    monkeypatch.setenv("MMEGO_TP", "1")
    assert loop._tp_scoped(loop._data_mesh(), probe)() == (False,)
    assert loop._tp_scoped(None, probe) is probe


def test_tp_grad_matches_single_device():
    """Loss + grad with the weight model-sharded on a 4x2 mesh must equal
    the single-device result (GSPMD inserts the TP collectives)."""
    from mmego_tpu.parallel import tp
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = mesh_mod.make_mesh(8, model=2)
    rng = np.random.RandomState(0)
    w0 = jnp.asarray(rng.randn(16, 8).astype(np.float32))
    x = rng.randn(32, 16).astype(np.float32)
    y = rng.randn(32, 8).astype(np.float32)

    def loss(w, x, y):
        return jnp.sum((x @ w - y) ** 2)

    g_single = jax.grad(loss)(w0, jnp.asarray(x), jnp.asarray(y))

    put_b = lambda a: jax.device_put(
        jnp.asarray(a), NamedSharding(mesh, P("data")))
    ws = tp.shard_tree(mesh, w0)
    assert ws.addressable_shards[0].data.shape == (16, 4)
    g_tp = jax.jit(jax.grad(loss))(ws, put_b(x), put_b(y))
    np.testing.assert_allclose(np.asarray(g_tp), np.asarray(g_single),
                               rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# DP engagement on a real stage trainer
# ---------------------------------------------------------------------------

def _tiny_world(tmp_path, monkeypatch, batch_size, n_train=16):
    """A tiny Upper-stage training world (mocked splits + small IMU ckpt)."""
    import unittest.mock as mock
    from mmego_tpu.config import Config
    from _helpers import tiny_windows
    from mmego_tpu.checkpoint import store
    from mmego_tpu.models import imu_net
    from mmego_tpu.train import loop

    rng = np.random.RandomState(3)

    def _data(n):
        return tiny_windows(rng, n)

    cfg = Config(idx=9, frame_no=4, pc_no=16, lower_pc_no=8,
                 batch_size=batch_size, early_stop_patience=100, save_slot=100,
                 report_root=str(tmp_path / "runs"),
                 model_imu_path=str(tmp_path / "imu.npz"),
                 model_upper_path=str(tmp_path / "upper.npz"),
                 model_lower_path=str(tmp_path / "lower.npz"))
    data = {"train": _data(n_train), "test": _data(8)}
    monkeypatch.setattr(loop.dataset_mod, "load_split",
                        lambda c, split: data[split])
    orig_init = imu_net.imu_net_init
    small = mock.patch.object(loop.imu_net, "imu_net_init",
                              lambda rng: orig_init(rng, hidden=16))
    with small:
        imu_params, _ = loop.train_imu(cfg, max_epochs=1, verbose=False)
    store.save(cfg.model_imu_path, imu_params)
    return cfg, small


def _train_upper_params(cfg, small_imu, mode: str, monkeypatch):
    """mode: 'dp' (8-device data mesh), 'off' (single device), or 'tp'
    (4x2 dp x tp mesh via MMEGO_TP=2)."""
    from mmego_tpu.train import loop
    monkeypatch.setenv("MMEGO_DP", "off" if mode == "off" else "auto")
    monkeypatch.setenv("MMEGO_TP", "2" if mode == "tp" else "1")
    with small_imu:
        (params, _), _ = loop.train_upper(cfg, max_epochs=1, verbose=False)
    return jax.device_get(params)


@pytest.mark.slow
def test_train_upper_dp_matches_single_device(tmp_path, monkeypatch):
    """Training a REAL stage data-parallel on the 8-device mesh must agree
    with the single-device run: same data order, same rng keys, only the
    gradient reduction differs (GSPMD psum vs on-device sum)."""
    cfg, small = _tiny_world(tmp_path, monkeypatch, batch_size=8)
    p_sd = _train_upper_params(cfg.replace(idx=92), small, "off", monkeypatch)
    flat_sd = jax.tree.leaves(p_sd)
    # MMEGO_TP=2 additionally covers parallel/tp.py: a 4x2 dp x tp mesh
    # with feature-sharded parameters -- the TP collectives GSPMD inserts
    # may never change the math either.
    for mode, idx in (("dp", 91), ("tp", 94)):
        p = _train_upper_params(cfg.replace(idx=idx), small, mode,
                                monkeypatch)
        flat = jax.tree.leaves(p)
        assert len(flat) == len(flat_sd)
        for a, b in zip(flat, flat_sd):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-4, err_msg=mode)


@pytest.mark.slow
def test_train_upper_dp_engages_on_indivisible_batch(tmp_path, monkeypatch):
    """batch_size 6 on an 8-device mesh: the batch must be PADDED and
    sharded (the round-1 silent unsharded fallback is gone)."""
    from mmego_tpu.train import loop

    seen = []
    orig = loop._shard

    def spy(mesh, arrays, w):
        arrays2, w2 = orig(mesh, arrays, w)
        seen.append((mesh, arrays2[0].shape[0],
                     len(arrays2[0].addressable_shards)
                     if hasattr(arrays2[0], "addressable_shards") else 1))
        return arrays2, w2

    # Build the world (its train_imu prerun also calls _shard under the
    # AMBIENT MMEGO_DP) before installing the spy and pinning DP on, so the
    # assertions below only see the run under test.
    cfg, small = _tiny_world(tmp_path, monkeypatch, batch_size=6, n_train=6)
    monkeypatch.setenv("MMEGO_DP", "auto")
    monkeypatch.setattr(loop, "_shard", spy)
    with small:
        loop.train_upper(cfg.replace(idx=93), max_epochs=1, verbose=False)
    assert seen, "spy never called"
    for mesh, b, n_shards in seen:
        assert mesh is not None
        assert b % 8 == 0, "batch was not padded to a device multiple"
        assert n_shards == 8, "batch was not sharded over the mesh"


def test_init_multihost_arg_plumbing(monkeypatch):
    """init_multihost forwards the coordinator triple to
    jax.distributed.initialize (explicit form) and passes nothing in the
    auto-detect form -- validates the plumbing that a real multi-host slice
    would exercise (single-host harness cannot run the call itself)."""
    import jax.distributed
    from mmego_tpu.parallel import mesh as mesh_mod

    calls = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **kw: calls.append(kw))
    mesh_mod.init_multihost()
    mesh_mod.init_multihost("10.0.0.1:8476", num_processes=4, process_id=2)
    assert calls[0] == {}
    assert calls[1] == {"coordinator_address": "10.0.0.1:8476",
                        "num_processes": 4, "process_id": 2}
