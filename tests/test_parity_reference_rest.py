"""Forward-output parity vs the reference for the last model families:
MLP, ESCM, SNR, MSSM, PEPNet (completes transplant parity for all 14)."""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")

torch = pytest.importorskip("torch")
if REF not in sys.path:
    sys.path.insert(0, REF)

import jax
import jax.numpy as jnp

from mmlrec_tpu.features import DenseFeat, FeatureLayout, SparseFeat
from mmlrec_tpu.models import get_model

from tests.test_parity_reference_more import (  # reuse helpers
    B,
    EMB,
    N_DENSE,
    N_SPARSE,
    VOCAB,
    _cols,
    _copy_embeddings,
    _copy_mlp,
    _copy_mlp_stack,
    _inputs,
    _our_cfg,
    _ref_config,
    _run_pair,
    _set,
)


def test_mlp_forward_parity():
    from model.mlp import MLP as RefMLP

    layout, ref_cols = _cols()
    cfg = _our_cfg("mlp")
    ours = get_model("mlp", layout, cfg)
    ids, dense, _ = _inputs()
    variables = ours.init(jax.random.PRNGKey(0), ids, dense, None, train=False)
    p = variables["params"]

    ref = RefMLP(ref_cols, device="cpu", config=_ref_config("mlp"))
    _copy_embeddings(ref, p, layout)
    for i in range(2):
        _copy_mlp(ref.mlp_layers[i], p[f"mlp_layer_{i}"], 1)
    _set(ref.final_layer.weight, np.asarray(p["final_layer"]["kernel"]).T)
    for t in range(2):
        _set(ref.out[t].bias, np.asarray(p["out"]["bias"])[t : t + 1])
    _run_pair("mlp", ours, variables, ref)


def test_escm_forward_parity():
    from model.escm import ESCM as RefESCM

    layout, ref_cols = _cols()
    cfg = _our_cfg("escm")
    ours = get_model("escm", layout, cfg)
    ids, dense, _ = _inputs()
    variables = ours.init(jax.random.PRNGKey(0), ids, dense, None, train=False)
    p = variables["params"]

    ref = RefESCM(ref_cols, device="cpu", config=_ref_config("escm"))
    _copy_embeddings(ref, p, layout)
    _copy_mlp(ref.ctr_dnn, p["ctr_dnn"], 2)
    _copy_mlp(ref.cvr_dnn, p["cvr_dnn"], 2)
    _set(ref.ctr_dnn_final_layer.weight, np.asarray(p["ctr_final"]["kernel"]).T)
    _set(ref.cvr_dnn_final_layer.weight, np.asarray(p["cvr_final"]["kernel"]).T)
    _set(ref.out.bias, np.asarray(p["out_bias"]))
    _run_pair("escm", ours, variables, ref)


def _copy_snr_gate(ref_gate, gp, elementwise):
    _set(ref_gate.alpha, np.asarray(gp["alpha"]))
    u = np.asarray(gp["u"])
    trans = np.asarray(gp["trans"])
    out_dim, in_dim = trans.shape[0], trans.shape[1]
    if elementwise:
        for i in range(out_dim):
            for j in range(in_dim):
                _set(ref_gate.u[i][j], u[i, j])
                _set(ref_gate.trans_matrix[i][j], trans[i, j])
    else:
        _set(ref_gate.u, u)
        for i in range(out_dim):
            for j in range(in_dim):
                _set(ref_gate.trans_matrix[i][j], trans[i, j])


def test_snr_forward_parity():
    from model.snr_trans import SNR_trans as RefSNR

    layout, ref_cols = _cols()
    cfg = _our_cfg("snr_trans")
    ours = get_model("snr_trans", layout, cfg)
    ids, dense, _ = _inputs()
    variables = ours.init(jax.random.PRNGKey(0), ids, dense, None, train=False)
    p = variables["params"]

    ref = RefSNR(ref_cols, device="cpu", config=_ref_config("snr_trans"))
    _copy_embeddings(ref, p, layout)
    for i in range(2):  # expert levels
        _copy_mlp_stack(ref.trans[f"trans{i + 1}"], p[f"trans_{i + 1}"], 1)
        _copy_snr_gate(ref.trans[f"gate{i + 1}"], p[f"gate_{i + 1}"], False)
    _copy_mlp_stack(ref.tower_dnn, p["tower_dnn"], 1)
    for t in range(2):
        _set(ref.tower_dnn_final_layer[t].weight,
             np.asarray(p["tower_final"]["kernel"])[t].T)
        _set(ref.out[t].bias, np.asarray(p["out"]["bias"])[t : t + 1])
    _run_pair("snr_trans", ours, variables, ref)


def test_mssm_forward_parity():
    from model.mssm import MSSM as RefMSSM

    layout, ref_cols = _cols()
    cfg = _our_cfg("mssm")
    ours = get_model("mssm", layout, cfg)
    ids, dense, _ = _inputs()
    variables = ours.init(jax.random.PRNGKey(0), ids, dense, None, train=False)
    p = variables["params"]

    ref = RefMSSM(ref_cols, device="cpu", config=_ref_config("mssm"))
    _copy_embeddings(ref, p, layout)
    for i in range(2):
        _copy_mlp_stack(ref.mssm[f"expert{i + 1}"], p[f"trans_{i + 1}"], 1)
        _copy_snr_gate(ref.mssm[f"gate{i + 1}"], p[f"gate_{i + 1}"], True)
    _copy_mlp_stack(ref.tower_dnn, p["tower_dnn"], 1)
    for t in range(2):
        _set(ref.tower_dnn_final_layer[t].weight,
             np.asarray(p["tower_final"]["kernel"])[t].T)
        _set(ref.out[t].bias, np.asarray(p["out"]["bias"])[t : t + 1])
    _run_pair("mssm", ours, variables, ref)


def test_pepnet_forward_parity():
    from model.pepnet import PepNet as RefPepNet

    layout, ref_cols = _cols()
    cfg = _our_cfg("pepnet")
    ours = get_model("pepnet", layout, cfg)
    ids, dense, _ = _inputs()
    variables = ours.init(jax.random.PRNGKey(0), ids, dense, None, train=False)
    p = variables["params"]

    ref = RefPepNet(ref_cols, device="cpu", config=_ref_config("pepnet"))
    _copy_embeddings(ref, p, layout)

    # EPNet feature gate: ours GateNN(dense_0, dense_1); ref Sequential
    # (Linear, act, Linear, Sigmoid) -> indices 0, 2
    fg = p["feature_gate"]
    _set(ref.feature_gate.gate[0].weight, np.asarray(fg["dense_0"]["kernel"]).T)
    _set(ref.feature_gate.gate[0].bias, np.asarray(fg["dense_0"]["bias"]))
    _set(ref.feature_gate.gate[2].weight, np.asarray(fg["dense_1"]["kernel"]).T)
    _set(ref.feature_gate.gate[2].bias, np.asarray(fg["dense_1"]["bias"]))

    n_layers = 2  # dnn_hidden_units
    for t in range(2):
        block = ref.ppn[t]
        for i in range(n_layers + 1):
            gl = p[f"gate_{i}"]
            _set(block.gate_layers[i].gate[0].weight,
                 np.asarray(gl["dense_0"]["kernel"])[t].T)
            _set(block.gate_layers[i].gate[0].bias,
                 np.asarray(gl["dense_0"]["bias"])[t])
            _set(block.gate_layers[i].gate[2].weight,
                 np.asarray(gl["dense_1"]["kernel"])[t].T)
            _set(block.gate_layers[i].gate[2].bias,
                 np.asarray(gl["dense_1"]["bias"])[t])
        for i in range(n_layers):
            ml = p[f"mlp_{i}"]
            _set(block.mlp_layers[i][0].weight, np.asarray(ml["kernel"])[t].T)
            _set(block.mlp_layers[i][0].bias, np.asarray(ml["bias"])[t])
        _set(block.mlp_layers[n_layers].weight,
             np.asarray(p["mlp_final"]["kernel"])[t].T)
        _set(block.mlp_layers[n_layers].bias,
             np.asarray(p["mlp_final"]["bias"])[t])
        _set(ref.out[t].bias, np.asarray(p["out"]["bias"])[t : t + 1])
    _run_pair("pepnet", ours, variables, ref)
