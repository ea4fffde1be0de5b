"""One-way importer: reference torch ``state_dict`` checkpoints -> pytrees.

The reference ships ``torch.save(state_dict())`` zip archives for Upper_Net
and Lower_Net (key/shape schema in SURVEY.md §2.4); this module maps them
into this framework's parameter/state pytrees.  Conversion rules:

  * Linear:     w (out, in)      -> w.T             (right-multiply layout)
  * Conv1d k=1: w (out, in, 1)   -> w[:, :, 0].T    (pointwise == linear)
  * Conv2d:     kept in torch OIHW layout (conv2d_apply consumes it directly)
  * BatchNorm:  weight/bias -> scale/bias (params); running stats -> state
  * LSTM:       weight_ih/hh (4H, in) -> transposed; b = b_ih + b_hh
                (cuDNN i,f,g,o gate order is shared, so no gate permute)

torch is imported lazily and only used for deserialisation.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def load_state_dict(path: str) -> dict:
    import torch  # lazy: only needed when importing reference checkpoints

    sd = torch.load(path, map_location="cpu")
    return {k: np.asarray(v.detach().numpy()) for k, v in sd.items()
            if k.endswith("num_batches_tracked") is False}


def _linear(sd, prefix):
    return {"w": np.ascontiguousarray(sd[f"{prefix}.weight"].T),
            "b": np.ascontiguousarray(sd[f"{prefix}.bias"])}


def _pointwise(sd, prefix):
    return {"w": np.ascontiguousarray(sd[f"{prefix}.weight"][:, :, 0].T),
            "b": np.ascontiguousarray(sd[f"{prefix}.bias"])}


def _conv2d(sd, prefix):
    return {"w": np.ascontiguousarray(sd[f"{prefix}.weight"]),
            "b": np.ascontiguousarray(sd[f"{prefix}.bias"])}


def _bn(sd, prefix):
    params = {"scale": np.ascontiguousarray(sd[f"{prefix}.weight"]),
              "bias": np.ascontiguousarray(sd[f"{prefix}.bias"])}
    state = {"mean": np.ascontiguousarray(sd[f"{prefix}.running_mean"]),
             "var": np.ascontiguousarray(sd[f"{prefix}.running_var"])}
    return params, state


def _lstm(sd, prefix, num_layers, bidirectional=True):
    layers = []
    for layer in range(num_layers):
        entry = {}
        directions = (("", "fwd"), ("_reverse", "bwd")) if bidirectional else (("", "fwd"),)
        for sfx, key in directions:
            wi = sd[f"{prefix}.weight_ih_l{layer}{sfx}"]
            wh = sd[f"{prefix}.weight_hh_l{layer}{sfx}"]
            bi = sd[f"{prefix}.bias_ih_l{layer}{sfx}"]
            bh = sd[f"{prefix}.bias_hh_l{layer}{sfx}"]
            entry[key] = {"wi": np.ascontiguousarray(wi.T), "wh": np.ascontiguousarray(wh.T),
                          "b": np.ascontiguousarray(bi + bh)}
        layers.append(entry)
    return layers


def _conv_bn_stack(sd, conv_names, bn_names):
    params, state = [], []
    for conv, bn in zip(conv_names, bn_names):
        bnp, bns = _bn(sd, bn)
        params.append({"lin": _pointwise(sd, conv), "bn": bnp})
        state.append({"bn": bns})
    return params, state


# ---------------------------------------------------------------------------
# Upper_Net (checkpoint schema: module0 / module1 / mlpHead)
# ---------------------------------------------------------------------------

def import_upper(path: str) -> Tuple[dict, dict]:
    sd = load_state_dict(path)
    params, state = {}, {}

    params["pointnet"], state["pointnet"] = _conv_bn_stack(
        sd, [f"module0.conv{i}" for i in (1, 2, 3)],
        [f"module0.cb{i}" for i in (1, 2, 3)])
    params["global_pointnet"], state["global_pointnet"] = _conv_bn_stack(
        sd, [f"module1.gpointnet.conv{i}" for i in (1, 2, 3)],
        [f"module1.gpointnet.cb{i}" for i in (1, 2, 3)])
    params["global_attn"] = {"attn": _linear(sd, "module1.gpointnet.attn")}
    params["grnn"] = _lstm(sd, "module1.grnn", num_layers=3)
    params["head_fc1"] = _linear(sd, "mlpHead.fc1")
    params["head_fc2"] = _linear(sd, "mlpHead.fc2")
    return params, state


# ---------------------------------------------------------------------------
# Lower_Net (checkpoint schema: pointEncoder / keyEncoder.gcn / fusion)
# ---------------------------------------------------------------------------

def import_lower(path: str) -> Tuple[dict, dict]:
    sd = load_state_dict(path)
    params, state = {}, {}

    params["point_encoder"], state["point_encoder"] = _conv_bn_stack(
        sd, [f"pointEncoder.module0.conv{i}" for i in (1, 2, 3)],
        [f"pointEncoder.module0.cb{i}" for i in (1, 2, 3)])

    g = "keyEncoder.gcn"
    gcn_p = {"A": np.ascontiguousarray(sd[f"{g}.A"]), "edge_importance": [], "blocks": []}
    gcn_s = {"blocks": []}
    dbn_p, dbn_s = _bn(sd, f"{g}.data_bn")
    gcn_p["data_bn"], gcn_s["data_bn"] = dbn_p, dbn_s
    for i in range(3):
        b = f"{g}.gcn_networks.{i}"
        bn1_p, bn1_s = _bn(sd, f"{b}.tcn.0")
        bn2_p, bn2_s = _bn(sd, f"{b}.tcn.3")
        res_p, res_s = _bn(sd, f"{b}.residual.1")
        gcn_p["blocks"].append({
            "gcn_conv": _conv2d(sd, f"{b}.gcn.conv"),
            "tcn_bn1": bn1_p,
            "tcn_conv": _conv2d(sd, f"{b}.tcn.2"),
            "tcn_bn2": bn2_p,
            "res_conv": _conv2d(sd, f"{b}.residual.0"),
            "res_bn": res_p,
        })
        gcn_s["blocks"].append({"tcn_bn1": bn1_s, "tcn_bn2": bn2_s, "res_bn": res_s})
        gcn_p["edge_importance"].append(np.ascontiguousarray(sd[f"{g}.edge_importance.{i}"]))
    gcn_p["fcn"] = _conv2d(sd, f"{g}.fcn")
    params["gcn"], state["gcn"] = gcn_p, gcn_s

    params["to_q"] = _linear(sd, "fusion.to_q")
    params["to_k"] = _linear(sd, "fusion.to_k")
    params["to_v"] = _linear(sd, "fusion.to_v")
    params["fusion_attn"] = {"attn": _linear(sd, "fusion.attn")}
    params["rnn_pk"] = _lstm(sd, "fusion.rnn_pk", num_layers=3)
    params["fc0"] = _linear(sd, "fusion.fc0")
    params["fc1"] = _linear(sd, "fusion.fc1")
    params["fc2"] = _linear(sd, "fusion.fc2")
    return params, state


# ---------------------------------------------------------------------------
# IMU_Net (no shipped checkpoint upstream; importer provided for externally
# supplied weights, schema per Net/IMU_Net.py:50-65)
# ---------------------------------------------------------------------------

def import_imu(path: str) -> dict:
    sd = load_state_dict(path)
    return {
        "fc1": _linear(sd, "fc1"),
        "rnn_fast": _lstm(sd, "rnn_fast", num_layers=2),
        "attn": _linear(sd, "attn"),
        "rnn_slow": _lstm(sd, "rnn_slow", num_layers=2),
        "fc2": _linear(sd, "fc2"),
    }
