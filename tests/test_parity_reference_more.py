"""Forward-output parity vs the reference for the remaining model families
(same transplant methodology as test_parity_reference.py)."""

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
from mmlrec_tpu.synthetic import make_config

N_SPARSE, N_DENSE, VOCAB, EMB, B = 6, 3, 40, 8, 32


def _ref_config(model_name, mc_extra=None):
    mc = {
        "task_name": "mtl",
        "model_name": model_name,
        "task_names": ["ctr", "ctcvr"],
        "task_types": ["binary", "binary"],
        "num_experts": 4,
        "expert_dnn_hidden_units": [32, 16],
        "gate_dnn_hidden_units": [8],
        "tower_dnn_hidden_units": [8],
        "task_weight_hidden_units": [8],
        "dnn_hidden_units": [32, 16],
        "bottom_dnn_hidden_units": [32, 16],
        "shared_hidden_unit": 24,
        "shared_expert_num": 2,
        "specific_expert_num": 2,
        "num_levels": 2,
        "emb": EMB,
        "l2_reg_embedding": 0.0,
        "l2_reg_dnn": 0.0,
        "dnn_dropout": 0.0,
        "dnn_use_bn": False,
        "dnn_activation": "relu",
    }
    mc.update(mc_extra or {})
    return {
        "data_config": {"num_domains": 1, "label_columns": ["l1", "l2"],
                        "scene_feature": "s0"},
        "model_config": mc,
        "optim_config": {"lr": 1e-3},
        "training_config": {},
        "save_config": {},
    }


def _our_cfg(model_name, **kw):
    defaults = dict(
        model_name=model_name, n_sparse=N_SPARSE, n_dense=N_DENSE, emb=EMB,
        hidden=(32, 16), gate=(8,), tower=(8,),
        shared_expert_num=2, specific_expert_num=2, num_levels=2,
        shared_hidden_unit=24,
    )
    defaults.update(kw)
    return make_config(**defaults)


def _inputs():
    rng = np.random.default_rng(0)
    ids = rng.integers(0, VOCAB, (B, N_SPARSE)).astype(np.int64)
    dense = rng.random((B, N_DENSE)).astype(np.float32)
    x_ref = torch.from_numpy(np.concatenate([ids.astype(np.float32), dense], 1))
    return jnp.asarray(ids, jnp.int32), jnp.asarray(dense), x_ref


def _cols():
    from model.utils import DenseFeat as RDense, SparseFeat as RSparse

    ours = [SparseFeat(f"s{i}", VOCAB, EMB) for i in range(N_SPARSE)] + [
        DenseFeat(f"d{i}", 1) for i in range(N_DENSE)
    ]
    ref = [RSparse(f"s{i}", VOCAB, EMB) for i in range(N_SPARSE)] + [
        RDense(f"d{i}", 1) for i in range(N_DENSE)
    ]
    return FeatureLayout(ours), ref


def _set(param, value):
    with torch.no_grad():
        param.copy_(torch.from_numpy(np.ascontiguousarray(value)))


def _copy_embeddings(ref_model, p, layout):
    table = np.asarray(p["embeddings"]["fused"]["table"])
    offset = 0
    for slot in layout.sparse_slots:
        v = slot.feature.vocabulary_size
        _set(ref_model.embedding_dict[slot.feature.name].weight,
             table[offset : offset + v])
        offset += v


def _copy_mlp_stack(ref_dnn_list, stacked, n_layers, stride=1, base=0):
    for k, dnn in enumerate(ref_dnn_list):
        kk = base + k * stride
        for i in range(n_layers):
            _set(dnn.linears[i].weight,
                 np.asarray(stacked[f"dense_{i}"]["kernel"])[kk].T)
            _set(dnn.linears[i].bias, np.asarray(stacked[f"dense_{i}"]["bias"])[kk])


def _copy_mlp(ref_dnn, ours, n_layers):
    for i in range(n_layers):
        _set(ref_dnn.linears[i].weight, np.asarray(ours[f"dense_{i}"]["kernel"]).T)
        _set(ref_dnn.linears[i].bias, np.asarray(ours[f"dense_{i}"]["bias"]))


def _run_pair(name, ours_model, variables, ref_model):
    ids, dense, x_ref = _inputs()
    ref_model.eval()
    with torch.no_grad():
        expect = ref_model(x_ref, None).numpy()
    got = np.asarray(ours_model.apply(variables, ids, dense, None, train=False))
    np.testing.assert_allclose(got, expect, rtol=2e-4, atol=1e-6, err_msg=name)


def test_star_forward_parity():
    from model.star import STAR as RefSTAR

    layout, ref_cols = _cols()
    cfg = _our_cfg("star")
    ours = get_model("star", layout, cfg)
    ids, dense, _ = _inputs()
    variables = ours.init(jax.random.PRNGKey(0), ids, dense, None, train=False)
    p = variables["params"]

    ref = RefSTAR(ref_cols, device="cpu", config=_ref_config("star"))
    _copy_embeddings(ref, p, layout)
    for j in range(2):  # dnn_hidden_units layers
        lp = p[f"linear_{j}"]
        _set(ref.linears[j].shared_weight, np.asarray(lp["shared_kernel"]))
        _set(ref.linears[j].shared_bias, np.asarray(lp["shared_bias"]))
        for d in range(2):
            _set(ref.linears[j].specific_weights[d], np.asarray(lp["specific_kernel"])[d])
            _set(ref.linears[j].specific_biases[d], np.asarray(lp["specific_bias"])[d])
    for i in range(2):
        fp = p[f"final_{i}"]
        _set(ref.final_layers[i].shared_weight, np.asarray(fp["shared_kernel"]))
        _set(ref.final_layers[i].shared_bias, np.asarray(fp["shared_bias"]))
        for d in range(2):
            _set(ref.final_layers[i].specific_weights[d], np.asarray(fp["specific_kernel"])[d])
            _set(ref.final_layers[i].specific_biases[d], np.asarray(fp["specific_bias"])[d])
        _set(ref.out[i].bias, np.asarray(p["out"]["bias"])[i : i + 1])
    _run_pair("star", ours, variables, ref)


def test_ple_forward_parity():
    from model.ple import PLE as RefPLE

    T, spec, shared, levels = 2, 2, 2, 2
    layout, ref_cols = _cols()
    cfg = _our_cfg("ple")
    ours = get_model("ple", layout, cfg)
    ids, dense, _ = _inputs()
    variables = ours.init(jax.random.PRNGKey(0), ids, dense, None, train=False)
    p = variables["params"]

    ref = RefPLE(ref_cols, device="cpu", config=_ref_config("ple"))
    _copy_embeddings(ref, p, layout)
    for lv in range(levels):
        sp = p[f"specific_experts_{lv}"]
        for t in range(T):
            _copy_mlp_stack(ref.specific_experts[lv][t], sp, 2, base=t * spec)
        sh = p[f"shared_experts_{lv}"]
        # reference builds specific_expert_num shared experts but only uses
        # the first shared_expert_num (model/ple.py:47-48 vs :120-122)
        _copy_mlp_stack(ref.shared_experts[lv][0][:shared], sh, 2)
        gp = p[f"specific_gate_dnn_{lv}"]
        for t in range(T):
            _copy_mlp_stack(ref.specific_gate_dnn[lv][t], gp, 1, base=t)
            _set(ref.specific_gate_dnn_final_layer[lv][t].weight,
                 np.asarray(p[f"specific_gate_final_{lv}"]["kernel"])[t].T)
        _copy_mlp(ref.shared_gate_dnn[lv], p[f"shared_gate_dnn_{lv}"], 1)
        _set(ref.shared_gate_dnn_final_layer[lv].weight,
             np.asarray(p[f"shared_gate_final_{lv}"]["kernel"]).T)
    _copy_mlp_stack(ref.tower_dnn, p["tower_dnn"], 1)
    for t in range(T):
        _set(ref.tower_dnn_final_layer[t].weight,
             np.asarray(p["tower_final"]["kernel"])[t].T)
        _set(ref.out[t].bias, np.asarray(p["out"]["bias"])[t : t + 1])
    _run_pair("ple", ours, variables, ref)


def test_hmoe_forward_parity():
    from model.hmoe import HMOE as RefHMOE

    layout, ref_cols = _cols()
    cfg = _our_cfg("hmoe")
    ours = get_model("hmoe", layout, cfg)
    ids, dense, _ = _inputs()
    variables = ours.init(jax.random.PRNGKey(0), ids, dense, None, train=False)
    p = variables["params"]

    ref = RefHMOE(ref_cols, device="cpu", config=_ref_config("hmoe"))
    _copy_embeddings(ref, p, layout)
    _copy_mlp_stack(ref.expert_dnn, p["expert_dnn"], 2)
    _copy_mlp_stack(ref.gate_dnn, p["gate_dnn"], 1)
    _copy_mlp_stack(ref.tower_dnn, p["tower_dnn"], 1)
    _copy_mlp_stack(ref.task_weight, p["task_weight"], 1)
    for t in range(2):
        _set(ref.gate_dnn_final_layer[t].weight,
             np.asarray(p["gate_final"]["kernel"])[t].T)
        _set(ref.task_weight_final_layer[t].weight,
             np.asarray(p["task_weight_final"]["kernel"])[t].T)
        _set(ref.tower_dnn_final_layer[t].weight,
             np.asarray(p["tower_final"]["kernel"])[t].T)
        _set(ref.out[t].bias, np.asarray(p["out"]["bias"])[t : t + 1])
    _run_pair("hmoe", ours, variables, ref)


def test_cross_stitch_forward_parity():
    from model.cross_stitch import CrossStitch as RefCS

    layout, ref_cols = _cols()
    cfg = _our_cfg("cross_stitch")
    ours = get_model("cross_stitch", layout, cfg)
    ids, dense, _ = _inputs()
    variables = ours.init(jax.random.PRNGKey(0), ids, dense, None, train=False)
    p = variables["params"]

    ref = RefCS(ref_cols, device="cpu", config=_ref_config("cross_stitch"))
    _copy_embeddings(ref, p, layout)
    _copy_mlp(ref.shared_layer, p["shared_layer"], 1)
    for i in range(2):  # dnn_hidden_units layers
        _copy_mlp_stack(ref.cross_stitch[f"task_layer_{i}"], p[f"task_layer_{i}"], 1)
        _set(ref.cross_stitch[f"gate_{i}"].cross_stitch_weight,
             np.asarray(p[f"gate_{i}"]["cross_stitch_weight"]))
    _copy_mlp_stack(ref.tower_dnn, p["tower_dnn"], 1)
    for t in range(2):
        _set(ref.tower_dnn_final_layer[t].weight,
             np.asarray(p["tower_final"]["kernel"])[t].T)
        _set(ref.out[t].bias, np.asarray(p["out"]["bias"])[t : t + 1])
    _run_pair("cross_stitch", ours, variables, ref)


def test_aitm_forward_parity():
    from model.aitm import AITM as RefAITM

    layout, ref_cols = _cols()
    cfg = _our_cfg("aitm")
    ours = get_model("aitm", layout, cfg)
    ids, dense, _ = _inputs()
    variables = ours.init(jax.random.PRNGKey(0), ids, dense, None, train=False)
    p = variables["params"]

    ref = RefAITM(ref_cols, device="cpu", config=_ref_config("aitm"))
    _copy_embeddings(ref, p, layout)
    _copy_mlp_stack(ref.bottom, p["bottom"], 2)
    _copy_mlp_stack(ref.tower_dnn, p["tower_dnn"], 1)
    att = p["attention"]
    for ref_lin, ours_name in ((ref.h1, "h1"), (ref.h2, "h2"), (ref.h3, "h3")):
        _set(ref_lin.weight, np.asarray(att[ours_name]["kernel"]).T)
        _set(ref_lin.bias, np.asarray(att[ours_name]["bias"]))
    _set(ref.g[0].weight, np.asarray(p["g_0"]["kernel"]).T)
    _set(ref.g[0].bias, np.asarray(p["g_0"]["bias"]))
    for t in range(2):
        _set(ref.tower_dnn_final_layer[t].weight,
             np.asarray(p["tower_final"]["kernel"])[t].T)
        _set(ref.out[t].bias, np.asarray(p["out"]["bias"])[t : t + 1])
    _run_pair("aitm", ours, variables, ref)


def test_apg_forward_parity():
    from model.apg import APG as RefAPG

    layout, ref_cols = _cols()
    cfg = _our_cfg("apg")
    ours = get_model("apg", layout, cfg)
    ids, dense, _ = _inputs()
    variables = ours.init(jax.random.PRNGKey(0), ids, dense, None, train=False)
    p = variables["params"]

    ref = RefAPG(ref_cols, device="cpu", config=_ref_config("apg"))
    _copy_embeddings(ref, p, layout)
    for i in range(2):  # dnn_hidden_units layers
        lp = p[f"apg_layer_{i}"]
        rl = ref.apg_layers[i]
        _set(rl.specific_weight_kk.linears[0].weight,
             np.asarray(lp["specific_weight_kk"]["kernel"]).T)
        _set(rl.specific_weight_kk.linears[0].bias,
             np.asarray(lp["specific_weight_kk"]["bias"]))
        _set(rl.specific_bias_kk.linears[0].weight,
             np.asarray(lp["specific_bias_kk"]["kernel"]).T)
        _set(rl.specific_bias_kk.linears[0].bias,
             np.asarray(lp["specific_bias_kk"]["bias"]))
        _set(rl.shared_weight_nk, np.asarray(lp["w_nk"]))
        _set(rl.shared_bias_nk, np.asarray(lp["b_nk"]))
        _set(rl.shared_weight_km, np.asarray(lp["w_km"]))
        _set(rl.shared_bias_km, np.asarray(lp["b_km"]))
    for t in range(2):
        _set(ref.final_layer[t].weight,
             np.asarray(p["final_layer"]["kernel"])[t].T)
        _set(ref.out[t].bias, np.asarray(p["out"]["bias"])[t : t + 1])
    _run_pair("apg", ours, variables, ref)


def test_mmoe_msl_masked_forward_parity():
    """MSL forward WITH an active domain mask on both sides (the reference's
    in-forward mask multiply, model/mmoe.py:101-102)."""
    from model.mmoe import MMOE as RefMMOE

    hidden, gate, tower = (32, 16), (8,), (8,)
    layout, ref_cols = _cols()
    cfg = _our_cfg("mmoe", task_name="msl", num_domains=2)
    cfg.model_config.masked_loss = True
    ours = get_model("mmoe", layout, cfg)
    ids, dense, x_ref = _inputs()
    rng = np.random.default_rng(1)
    dom = rng.integers(0, 2, B)
    dmask_np = np.eye(2)[dom].astype(np.float32)
    dmask = jnp.asarray(dmask_np)
    variables = ours.init(jax.random.PRNGKey(0), ids, dense, dmask, train=False)
    p = variables["params"]

    ref_raw = _ref_config("mmoe")
    ref_raw["model_config"]["task_name"] = "msl"
    ref_raw["data_config"]["num_domains"] = 2
    ref_raw["data_config"]["label_columns"] = ["l", "l"]
    ref = RefMMOE(ref_cols, device="cpu", config=ref_raw)
    ref.eval()
    _copy_embeddings(ref, p, layout)
    from tests.test_parity_reference import _copy_mlp_stack as _cms

    _cms(ref.expert_dnn, p["expert_dnn"], len(hidden))
    _cms(ref.gate_dnn, p["gate_dnn"], len(gate))
    _cms(ref.tower_dnn, p["tower_dnn"], len(tower))
    for t in range(2):
        _set(ref.gate_dnn_final_layer[t].weight,
             np.asarray(p["gate_final"]["kernel"])[t].T)
        _set(ref.tower_dnn_final_layer[t].weight,
             np.asarray(p["tower_final"]["kernel"])[t].T)
        _set(ref.out[t].bias, np.asarray(p["out"]["bias"])[t : t + 1])

    with torch.no_grad():
        expect = ref(x_ref, torch.from_numpy(dmask_np)).numpy()
    got = np.asarray(ours.apply(variables, ids, dense, dmask, train=False))
    np.testing.assert_allclose(got, expect, rtol=2e-4, atol=1e-6)
