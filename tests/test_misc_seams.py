"""Coverage for small load-bearing seams: metric packing, the ordered
prefetching loader, and the Pallas kernel switch."""

import numpy as np
import jax.numpy as jnp

from mmego_tpu.train import metrics
from mmego_tpu.data import ingest
from mmego_tpu.ops import pallas_ctl


def test_metric_sums_pack_roundtrip():
    rng = np.random.RandomState(0)
    s = {
        "joint_sum": jnp.asarray(rng.rand(21).astype(np.float32)),
        "bone_sum": jnp.asarray(rng.rand(20).astype(np.float32)),
        "upper_sum": jnp.asarray(np.float32(3.5)),
        "lower_sum": jnp.asarray(np.float32(4.5)),
        "count": jnp.asarray(np.float32(840.0)),
    }
    v = metrics.pack_metric_sums(s)
    assert v.shape == (metrics.PACKED_LEN,)
    out = metrics.unpack_metric_sums(np.asarray(v))
    np.testing.assert_array_equal(out["joint_sum"], np.asarray(s["joint_sum"]))
    np.testing.assert_array_equal(out["bone_sum"], np.asarray(s["bone_sum"]))
    assert out["upper_sum"] == 3.5 and out["lower_sum"] == 4.5
    assert out["count"] == 840.0


def test_iter_loaded_preserves_order_with_workers():
    """The prefetching loader must yield results in exact walk order (the
    consuming thread owns all stateful calibration/RNG work)."""
    import time

    def slow_load(p):
        # deterministic per-index jitter so out-of-order completion would be
        # exposed identically on every run (hash(p) varies by PYTHONHASHSEED)
        time.sleep(0.001 * ((int(p[1:4]) * 3) % 7))
        return {"path": p}

    paths = [f"f{i:03d}.mat" for i in range(50)]
    got = [d["path"] for d in ingest._iter_loaded(slow_load, paths, workers=4)]
    assert got == paths
    got1 = [d["path"] for d in ingest._iter_loaded(slow_load, paths, workers=0)]
    assert got1 == paths


def test_ingest_cache_key_tracks_loader_source(tmp_path):
    """VERDICT r4 #8: the cache tag derives from ingest.py's source bytes,
    so editing the loader without remembering a version bump can never
    serve a stale cache.  Verified by importing a byte-modified copy of the
    module and checking its cache_key diverges."""
    import importlib.util
    import shutil

    from mmego_tpu.data import ingest

    k1 = ingest.cache_key("/data", 20, 128, 0)
    assert k1 == ingest.cache_key("/data", 20, 128, 0)   # stable in-process

    src = ingest.__file__.rstrip("c")
    mod_path = tmp_path / "ingest_edited.py"
    shutil.copy(src, mod_path)
    with open(mod_path, "a") as f:
        f.write("\n# loader edited\n")
    spec = importlib.util.spec_from_file_location("ingest_edited", mod_path)
    edited = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(edited)
    assert edited.cache_key("/data", 20, 128, 0) != k1


def test_pallas_ctl_override_and_env(monkeypatch):
    with pallas_ctl.override(True):
        assert pallas_ctl.enabled("lstm") is True
        assert pallas_ctl.enabled("attn") is True
        with pallas_ctl.override(False):
            assert pallas_ctl.enabled("lstm") is False
        assert pallas_ctl.enabled("lstm") is True
    # CPU backend (the test mesh): everything off by default, env cannot
    # force kernels onto a backend that cannot lower them
    assert pallas_ctl.enabled("lstm") is False
    monkeypatch.setenv("MMEGO_PALLAS", "1")
    assert pallas_ctl.enabled("lstm") is False
    monkeypatch.delenv("MMEGO_PALLAS")


def test_pallas_ctl_default_override_resolution(monkeypatch):
    """default_override replaces the per-op DEFAULTS (step 3b) -- it must
    lose to an explicit env setting but beat the built-in table.  Backend
    faked as TPU so the on_tpu gate doesn't mask the precedence."""
    import jax

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    with pallas_ctl.default_override(False):
        assert pallas_ctl.enabled("lstm") is False       # beats default ON
        monkeypatch.setenv("MMEGO_PALLAS", "1")
        assert pallas_ctl.enabled("lstm") is True        # env wins
        monkeypatch.delenv("MMEGO_PALLAS")
        with pallas_ctl.override(True):
            assert pallas_ctl.enabled("lstm") is True    # override wins all
    with pallas_ctl.default_override(True):
        assert pallas_ctl.enabled("attn") is True        # beats default OFF
    assert pallas_ctl.enabled("lstm") is True            # scope fully unwound
    assert pallas_ctl.enabled("attn") is False


def test_pallas_ctl_snapshot_and_scope(monkeypatch):
    """snapshot() captures the full resolution (context + env + backend);
    snapshot_scope re-imposes it EXACTLY, beating every other step -- the
    mechanism that makes the kernel switch a jit cache key (infer.py)."""
    import jax

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    snap = pallas_ctl.snapshot()
    assert dict(snap)["lstm"] is True and dict(snap)["attn"] is False
    # force_off resolves with defaults off but an explicit env still wins
    assert not any(on for _, on in pallas_ctl.snapshot(force_off=True))
    monkeypatch.setenv("MMEGO_PALLAS_ATTN", "1")
    assert dict(pallas_ctl.snapshot(force_off=True))["attn"] is True
    monkeypatch.delenv("MMEGO_PALLAS_ATTN")
    # scope beats env, default_override and the per-op table
    monkeypatch.setenv("MMEGO_PALLAS", "1")
    with pallas_ctl.snapshot_scope((("attn", False), ("lstm", False))):
        assert pallas_ctl.enabled("lstm") is False
        assert pallas_ctl.enabled("attn") is False
    monkeypatch.delenv("MMEGO_PALLAS")
    with pallas_ctl.default_override(False):
        with pallas_ctl.snapshot_scope((("lstm", True),)):
            assert pallas_ctl.enabled("lstm") is True
            assert pallas_ctl.enabled("attn") is False   # absent -> off
    assert pallas_ctl.enabled("lstm") is True            # unwound


def test_tp_scoped_warns_on_env_forced_kernels(monkeypatch):
    """ADVICE r4: forcing MMEGO_PALLAS=1 under a mesh silently loses the
    sharding benefit (GSPMD all-gathers around the opaque kernel) -- the
    mesh scopes must warn loudly.  Env still wins (documented contract)."""
    import warnings

    import jax

    from mmego_tpu.parallel import mesh as mesh_mod
    from mmego_tpu.train import loop

    mesh = mesh_mod.make_mesh(n_devices=2)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setenv("MMEGO_PALLAS", "1")
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        loop._tp_scoped(mesh, lambda: None)
    assert any("opaque to GSPMD" in str(w.message) for w in caught)
    monkeypatch.delenv("MMEGO_PALLAS")
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        loop._tp_scoped(mesh, lambda: None)
    assert not caught


def test_ensure_reachable_backend_branches(monkeypatch):
    """bench.py's tunnel-down guard: a requested-CPU env short-circuits (and
    still pins the config), a healthy probe reports the platform it actually
    ran on, a dead probe pins CPU and says "unreachable" (config updates are
    no-ops here because the test process already initialised backends)."""
    from mmego_tpu.utils import platform as plat

    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    called = []
    assert plat.ensure_reachable_backend(
        probe=lambda t: called.append(t)) == ("cpu", "requested")
    assert called == []  # no probe when CPU was explicitly requested

    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    assert plat.ensure_reachable_backend(
        probe=lambda t: "axon") == ("axon", "probed")
    assert plat.ensure_reachable_backend(
        probe=lambda t: None, retries=0) == ("cpu", "unreachable")

    # transient blip: first probe fails, the single retry succeeds -- the
    # round's accelerator artifact is salvaged instead of pinned to CPU
    attempts = []
    def flaky(t):
        attempts.append(t)
        return "axon" if len(attempts) > 1 else None
    assert plat.ensure_reachable_backend(
        probe=flaky, retry_delay_s=0.0) == ("axon", "probed")
    assert len(attempts) == 2

    # hard outage: every attempt fails -> CPU pin, bounded attempt count
    attempts.clear()
    assert plat.ensure_reachable_backend(
        probe=lambda t: attempts.append(t), retries=2,
        retry_delay_s=0.0) == ("cpu", "unreachable")
    assert len(attempts) == 3

    # plugin-less dev box: env unset, JAX silently resolves to CPU -- the
    # probe's reported platform (not reachability) is what gets published
    monkeypatch.delenv("JAX_PLATFORMS")
    assert plat.ensure_reachable_backend(
        probe=lambda t: "cpu") == ("cpu", "probed")
