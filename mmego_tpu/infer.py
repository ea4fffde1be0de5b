"""Batched inference: the ``--infer`` benchmark path, one fused XLA program.

Replaces the reference's per-window Python loop (``Demo_test.py:86-163``,
batch 1, host->device copy per window, 29.5 it/s) with: dataset resident on
device, cascade jit-compiled once, windows pushed through in large batches.
The 835-window demo set is processed in ceil(835/infer_batch) dispatches.
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from mmego_tpu.config import Config
from mmego_tpu.data import dataset as dataset_mod
from mmego_tpu.ops import pallas_ctl
from mmego_tpu.parallel import mesh as mesh_mod
from mmego_tpu.models import cascade, imu_net, upper_net, lower_net
from mmego_tpu.checkpoint import store, torch_import
from mmego_tpu.train import metrics as metrics_mod


def load_cascade_params(cfg: Config) -> Tuple[cascade.CascadeParams, cascade.CascadeState]:
    """Resolve the three stage checkpoints (.pth -> torch importer,
    .npz -> native store), reproducing the reference's load cascade
    (Demo_test.py:51-58)."""
    def resolve(path, fallback_pth):
        if not path.endswith(".pth") and not os.path.exists(path) \
                and os.path.exists(fallback_pth):
            return fallback_pth
        return path

    def load_with_state(path, template_p, template_s):
        state_path = os.path.splitext(path)[0] + ".state.npz"
        if not os.path.exists(state_path):
            raise FileNotFoundError(
                f"Checkpoint {path} has no BN-state sidecar ({state_path}). "
                "Inference needs the BatchNorm running stats saved alongside "
                "the params; copy the .state.npz that the trainer wrote next "
                "to this checkpoint (train resume would fall back to init "
                "stats, but eval through init stats produces garbage).")
        return store.load(path, template_p), store.load(state_path, template_s)

    upper_path = resolve(cfg.model_upper_path, cfg.reference_upper_pth)
    lower_path = resolve(cfg.model_lower_path, cfg.reference_lower_pth)

    if upper_path.endswith(".pth"):
        upper_p, upper_s = torch_import.import_upper(upper_path)
    else:
        template_p, template_s = upper_net.upper_net_init(jax.random.PRNGKey(0))
        upper_p, upper_s = load_with_state(upper_path, template_p, template_s)
    if lower_path.endswith(".pth"):
        lower_p, lower_s = torch_import.import_lower(lower_path)
    else:
        template_p, template_s = lower_net.lower_net_init(jax.random.PRNGKey(0))
        lower_p, lower_s = load_with_state(lower_path, template_p, template_s)

    if cfg.model_imu_path.endswith(".pth"):
        imu_p = torch_import.import_imu(cfg.model_imu_path)
    elif os.path.exists(cfg.model_imu_path):
        imu_p = store.load(cfg.model_imu_path, imu_net.imu_net_init(jax.random.PRNGKey(0)))
    else:
        raise FileNotFoundError(
            f"IMU_Net checkpoint not found at {cfg.model_imu_path}. The "
            "reference repo ships no IMU checkpoint (SURVEY.md §0); train one "
            "with `python main.py --train --network IMU_Net` or pass "
            "--load_IMU_path.")
    # One bulk device placement (store.load keeps leaves on host).
    params = jax.device_put(
        cascade.CascadeParams(imu=imu_p, upper=upper_p, lower=lower_p))
    state = jax.device_put(cascade.CascadeState(upper=upper_s, lower=lower_s))
    return params, state


# Shared repeat-last-row padding primitive (parallel/mesh.pad_leading).
_pad_to = mesh_mod.pad_leading


from functools import partial


@partial(jax.jit, static_argnums=(5, 6, 7))
def _cascade_jit(params, state, cloud, imu, bones, lower_pc_no, imu_used,
                 kernels):
    # Params/state are ARGUMENTS, not closures: closing over them would embed
    # 23M weights as HLO constants -- multi-minute compiles, 200MB executables
    # and a compilation-cache key that never stabilises across processes.
    # ``kernels`` (a pallas_ctl.snapshot) is STATIC: the Pallas switch is
    # part of the jit cache key, so one shared binding safely serves
    # kernels-on (single-device) and kernels-off (mesh/GSPMD) callers.
    with pallas_ctl.snapshot_scope(kernels):
        return cascade.cascade_apply(params, state, cloud, imu, bones,
                                     lower_pc_no, imu_used)


def _cascade_metrics_acc(params, state, cloud, imu, bones, key_gt, w,
                         lower_pc_no, imu_used, acc, kernels):
    """Cascade + metrics, accumulated into one flat device vector.

    Every host interaction with a tunneled TPU costs a full network round
    trip (~25-30 ms measured) -- fetching the 5 metric arrays separately per
    batch burned ~130 ms of pure latency on a 250 ms eval.  Batches are
    dispatched asynchronously into a donated accumulator and the host fetches
    ONE small vector at the very end."""
    with pallas_ctl.snapshot_scope(kernels):
        out = cascade.cascade_apply(params, state, cloud, imu, bones,
                                    lower_pc_no, imu_used)
        s = metrics_mod.metric_sums(out["all"], key_gt, out["upper"],
                                    out["lower"], w)
    return acc + metrics_mod.pack_metric_sums(s)


# ONE shared binding for every caller, mesh or not: the trailing ``kernels``
# static argument (a pallas_ctl.snapshot, re-imposed inside the trace) keys
# the cache by kernel choice, so a kernels-ON jaxpr traced by a same-shape
# single-device call can never be reused under GSPMD.
_cascade_metrics_acc_jit = partial(jax.jit, static_argnums=(7, 8, 10),
                                   donate_argnums=(9,))(_cascade_metrics_acc)


def jit_cascade(params, state, lower_pc_no: int = 64, imu_used: bool = True):
    """Bind params/state onto the module-level jitted cascade (one compile
    per input shape + kernel state, shared by every caller in the process)."""
    return lambda c, i, b: _cascade_jit(params, state, c, i, b,
                                        lower_pc_no, imu_used,
                                        pallas_ctl.snapshot())


def run_cascade_batched(params, state, data, batch: int, lower_pc_no: int = 64,
                        imu_used: bool = True, fn=None) -> Dict[str, np.ndarray]:
    """Run the jitted cascade over all windows in fixed-size batches.

    The final partial batch is padded (static shapes -> single compile) and
    trimmed after.  Returns stacked host arrays for upper/lower/all.
    """
    if fn is None:
        fn = jit_cascade(params, state, lower_pc_no, imu_used)
    n = len(data)
    outs = {"upper": [], "lower": [], "all": []}
    for start in range(0, n, batch):
        sl = data.take(slice(start, start + batch))
        m = len(sl.cloud)
        out = fn(jnp.asarray(_pad_to(sl.cloud, batch)),
                 jnp.asarray(_pad_to(sl.imu, batch)),
                 jnp.asarray(_pad_to(sl.bones, batch)))
        for k in outs:
            outs[k].append(np.asarray(out[k][:m]))
    return {k: np.concatenate(v, axis=0) for k, v in outs.items()}


def evaluate_ensemble(cfg: Config, stacks, data=None,
                      verbose: bool = True) -> Dict:
    """Metric block for a prediction-level ensemble of checkpoint stacks.

    ``stacks``: directories each holding ``{imu,upper,lower}_net.ckpt.npz``
    (+ BN-state sidecars), e.g. ``artifacts/chain13_aug``; the literal name
    ``"headline"`` resolves to the default artifact paths.  Predictions of
    all members are averaged (the serving counterpart is
    ``serve.EnsemblePredictor``); measured gains in docs/PARITY.md.
    """
    if data is None:
        data = dataset_mod.load_split(cfg, "vis")

    outs = []
    for stack in stacks:
        if stack == "headline":
            c = cfg
        else:
            c = cfg.replace(
                model_imu_path=os.path.join(stack, "imu_net.ckpt.npz"),
                model_upper_path=os.path.join(stack, "upper_net.ckpt.npz"),
                model_lower_path=os.path.join(stack, "lower_net.ckpt.npz"))
        params, state = load_cascade_params(c)
        outs.append(run_cascade_batched(
            params, state, data, min(cfg.infer_batch, len(data)),
            cfg.lower_pc_no, cfg.imu_used))
    avg = {k: np.mean([o[k] for o in outs], axis=0) for k in outs[0]}
    s = metrics_mod.metric_sums(
        jnp.asarray(avg["all"]), jnp.asarray(data.key),
        jnp.asarray(avg["upper"]), jnp.asarray(avg["lower"]))
    m = metrics_mod.finalize_metric_sums(
        [{k: np.asarray(v) for k, v in s.items()}])
    m["windows"] = len(data)
    m["members"] = len(outs)
    if verbose:
        print(f"ensemble of {len(outs)} stacks over {len(data)} windows")
        print(metrics_mod.format_report(m))
    return m


def eval_imu_frames(cfg: Config, data=None, imu_params=None) -> Dict:
    """Per-frame IMU error traces + plot (``Train_IMU.eval_all_imu``,
    Train_IMU.py:187-218): geodesic rotation error in degrees and head
    position error in cm for every frame of the vis split, in order."""
    from mmego_tpu.models import imu_net as imu_mod
    from mmego_tpu.ops import rotation as rot_mod
    from mmego_tpu.viz import curves

    if data is None:
        data = dataset_mod.load_split(cfg, "vis")
    if imu_params is None:
        params, _ = load_cascade_params(cfg)
        imu_params = params.imu
    fn = jax.jit(lambda x: imu_mod.imu_net_apply(imu_params, x))
    ang_l, pos_l = [], []
    batch = min(cfg.infer_batch, len(data))
    for start in range(0, len(data), batch):
        sl = data.take(slice(start, min(start + batch, len(data))))
        m = len(sl.imu)
        r, t = fn(jnp.asarray(_pad_to(sl.imu, batch)))
        ang = rot_mod.angle_minus_deg(r[:m], jnp.asarray(sl.r_r0r))
        pos = jnp.sqrt(jnp.sum(jnp.square(
            t[:m] - jnp.asarray(sl.key[:, :, 20, :])), axis=-1)) * 100.0
        ang_l.extend(np.asarray(ang).reshape(-1).tolist())
        pos_l.extend(np.asarray(pos).reshape(-1).tolist())
    out_path = curves.draw_frame_loss(ang_l, pos_l, cfg)
    return {"angle_deg": ang_l, "pos_cm": pos_l, "plot": out_path}


def stage_timing(cfg: Config, data=None, params=None, state=None,
                 repeats: int = 5) -> Dict[str, float]:
    """Per-stage latency breakdown over one device batch (the TPU-native
    equivalent of the reference's ad-hoc ``eval_hand`` stage timers,
    Train_Lower.py:429-446).  Each stage is jitted separately; times are the
    mean of ``repeats`` chained async dispatches forced complete by a single
    end fetch (per-repeat fetches would add a tunnel RTT to every sample)."""
    from mmego_tpu.models import imu_net as imu_mod
    from mmego_tpu.models import upper_net as upper_mod
    from mmego_tpu.models import lower_net as lower_mod

    if data is None:
        data = dataset_mod.load_split(cfg, "vis")
    if params is None:
        params, state = load_cascade_params(cfg)
    batch = min(cfg.infer_batch, len(data))
    sl = data.take(slice(0, batch))
    cloud = jnp.asarray(sl.cloud)
    imu = jnp.asarray(sl.imu)
    bones = jnp.asarray(sl.bones)

    # params as jit ARGUMENTS (closures would embed them as HLO constants;
    # see _cascade_jit)
    imu_jit = jax.jit(imu_mod.imu_net_apply)
    upper_jit = jax.jit(lambda p, s, c, b, r, t: upper_mod.upper_net_apply(
        p, s, c, b, r, t, cfg.imu_used)[:3])
    lower_jit = jax.jit(lambda p, s, u, c, b, r, t: lower_mod.lower_net_apply(
        p, s, u, c, b, r, t, cfg.lower_pc_no, cfg.imu_used)[0])
    imu_fn = lambda x: imu_jit(params.imu, x)
    upper_fn = lambda c, b, r, t: upper_jit(params.upper, state.upper, c, b, r, t)
    lower_fn = lambda u, c, b, r, t: lower_jit(params.lower, state.lower,
                                               u, c, b, r, t)

    def _sync(tree):
        # block_until_ready does not reliably wait on tunneled TPU backends;
        # fetching forces real completion.
        for leaf in jax.tree.leaves(tree):
            np.asarray(leaf)

    r, t = imu_fn(imu)
    upper_l, _, cloud_h = upper_fn(cloud, bones, r, t)
    lower_l = lower_fn(upper_l, cloud_h, bones, r, t)
    _sync(lower_l)

    out = {"batch_windows": batch}
    for name, thunk in [
        ("imu_s", lambda: imu_fn(imu)[0]),
        ("upper_s", lambda: upper_fn(cloud, bones, r, t)[0]),
        ("lower_s", lambda: lower_fn(upper_l, cloud_h, bones, r, t)),
    ]:
        # Warm with the SAME reduce+fetch used in the timed region, so the
        # timed window contains neither the reduction's first compile nor a
        # cold fetch path; the one remaining fetch RTT (~26 ms) is amortised
        # over all `repeats` dispatches.
        _sync(jax.tree.map(jnp.sum, thunk()))
        # Chain `repeats` async dispatches and force completion once: a
        # per-repeat fetch would add a full tunnel round trip (~26 ms
        # measured) to every sample and swamp the device time.
        t0 = time.perf_counter()
        for _ in range(repeats):
            o = thunk()
        _sync(jax.tree.map(jnp.sum, o))
        out[name] = (time.perf_counter() - t0) / repeats
    return out


def evaluate(cfg: Config, data=None, params=None, state=None,
             time_it: bool = True, verbose: bool = True,
             batch: Optional[int] = None, return_preds: bool = False,
             full_warmup: bool = True) -> Dict:
    """The full --infer evaluation: metrics block + throughput.

    With more than one visible device (and ``MMEGO_DP`` != "off") the
    window batches shard over a 1-D data mesh; metrics are identical to the
    single-device run (tests/test_sharding.py::test_evaluate_dp_*).

    ``full_warmup=False`` warms the compile with one batch dispatch instead
    of a whole-set pass -- for CPU-fallback benchmarking, where a full pass
    costs minutes and compile exclusion only needs the program built.

    ``return_preds=True`` additionally materialises every window's joint
    predictions via a SECOND compiled program (metrics-free cascade) and a
    full extra pass over the set -- off by default; metrics alone need one
    program and no bulk D2H.  (Default CHANGED in round 3: it was ``True``
    through round 2 -- callers that relied on ``"preds"``/``"gt"`` in the
    returned dict must now pass ``return_preds=True`` explicitly.)

    The whole window set is pushed to HBM once; the timed region covers, per
    device batch, the full cascade + on-device metric accumulation + the D2H
    fetch of the resulting metric sums -- i.e. everything needed to produce
    the final numbers on the host for all 835 windows.  (The reference's
    29.5 it/s includes its per-window host->device copies and per-window
    metric syncs; keeping data HBM-resident is the architectural win being
    measured.)  NOTE: timing is measured by fetching results, because
    ``block_until_ready`` on dispatched-but-unfetched buffers does not
    reliably wait on tunneled TPU backends.
    """
    if data is None:
        data = dataset_mod.load_split(cfg, "vis")
    if params is None:
        params, state = load_cascade_params(cfg)

    # Data-parallel eval: with more than one visible device (and MMEGO_DP
    # not "off") the window batches shard over a 1-D data mesh -- the same
    # GSPMD recipe as the trainers (parallel/mesh.py), params replicated,
    # the packed metric accumulation psum'd by the partitioner.  The
    # reference has no counterpart (single-device, Config/config.py:31-34);
    # the common one-chip case takes the mesh-free path below unchanged.
    # Works multi-controller too: batches and params place via
    # mesh.put_global (each process contributes its addressable shards);
    # tests/_multihost_worker.py runs this path across two OS processes.
    mesh = None
    if os.environ.get("MMEGO_DP", "auto") != "off" and jax.device_count() > 1:
        mesh = mesh_mod.make_mesh()

    n = len(data)
    batch = min(batch or cfg.infer_batch, n)
    if mesh is not None:
        n_dev = dict(mesh.shape)[mesh_mod.DATA_AXIS]
        batch = -(-batch // n_dev) * n_dev  # device multiple; w masks pad
    padded = -(-n // batch) * batch
    nb = padded // batch

    w_np = np.zeros((padded,), np.float32)
    w_np[:n] = 1.0
    host = [_pad_to(np.asarray(a), padded)
            for a in (data.cloud, data.imu, data.bones, data.key)] + [w_np]

    if mesh is None:
        # Device-resident inputs, padded once to a batch multiple.
        devd = [jnp.asarray(a) for a in host]
        kernels = pallas_ctl.snapshot()

        def take_batch(i):
            # whole-set batches skip the slice: x[0:n] of an n-row device
            # array still dispatches a full-size device copy (~480 MB of
            # cloud, ~1.2 ms/pass in the cascade profile)
            if nb == 1:
                return devd
            sl = slice(i * batch, (i + 1) * batch)
            return [a[sl] for a in devd]
    else:
        # Batch-major layout (nb, batch, ...) with the BATCH axis sharded
        # over ``data``: indexing the leading axis hands the jit one device
        # batch already aligned to shard boundaries, so no dispatch ever
        # pays a cross-device reshard of its inputs (ADVICE r4).
        from jax.sharding import NamedSharding, PartitionSpec as P
        s = NamedSharding(mesh, P(None, mesh_mod.DATA_AXIS))
        devd = [mesh_mod.put_global(a.reshape((nb, batch) + a.shape[1:]), s)
                for a in host]
        params, state = mesh_mod.place_params(mesh, (params, state))
        # The mesh kernel policy (defaults off under GSPMD, env wins with a
        # loud warning) lives in ONE place: pallas_ctl.mesh_snapshot.
        kernels = pallas_ctl.mesh_snapshot()

        def take_batch(i):
            return [a[i] for a in devd]

    def acc0():
        z = jnp.zeros((metrics_mod.PACKED_LEN,), jnp.float32)
        return (z if mesh is None
                else mesh_mod.put_global(z, mesh_mod.replicated(mesh)))

    def step_batch(i, acc):
        c, im, bo, k, w = take_batch(i)
        return _cascade_metrics_acc_jit(
            params, state, c, im, bo, k, w, cfg.lower_pc_no, cfg.imu_used,
            acc, kernels)

    def run_all():
        # Async dispatch chain: each batch adds its packed metric sums into
        # the (donated) accumulator; the single host fetch at the end both
        # forces completion of every batch and pays the tunnel round trip
        # exactly once.
        acc = acc0()
        for i in range(nb):
            acc = step_batch(i, acc)
        return metrics_mod.unpack_metric_sums(np.asarray(acc))

    if full_warmup:
        run_all()                               # warmup/compile dispatch
    else:
        np.asarray(step_batch(0, acc0()))       # fetch forces completion
    t0 = time.perf_counter()
    sums = run_all()
    elapsed = time.perf_counter() - t0

    m = metrics_mod.finalize_metric_sums([sums])
    m["windows"] = len(data)
    m["elapsed_s"] = elapsed
    m["it_per_s"] = len(data) / elapsed
    if verbose:
        print(f"{len(data)}it [{elapsed:.2f}s, {m['it_per_s']:.2f}it/s]")
        print(metrics_mod.format_report(m))
    if return_preds:
        if jax.process_count() > 1:
            raise NotImplementedError(
                "return_preds=True is single-controller only: the bulk "
                "prediction fetch needs every output shard addressable. "
                "Run the metrics-only evaluate() multi-process and a "
                "separate single-process pass for predictions.")
        # The shared _cascade_jit binding is safe under the mesh too: the
        # ``kernels`` static argument keys the cache (no fresh jit needed).
        fn = lambda c, i, b: _cascade_jit(params, state, c, i, b,
                                          cfg.lower_pc_no, cfg.imu_used,
                                          kernels)
        m["preds"] = run_cascade_batched(params, state, data, batch,
                                         cfg.lower_pc_no, cfg.imu_used,
                                         fn=fn)
    return m
