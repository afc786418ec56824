"""Training-LOSS parity vs the reference, per model family.

Forward parity (tests/test_parity_reference*.py) pins the model math; this
pins the full training objective at NONZERO L1/L2 coefficients:

    data loss (BCE-sum over heads / ESCM-IPW)  reference basemodel.py:283-299
  + get_regularization_loss()                  reference basemodel.py:524-540
  + aux_loss                                   reference basemodel.py:305

against our ``multitask_loss + l2_regularization(..., REG_DNN_PREFIXES)``.
The reference's l2_reg_dnn inclusion set is idiosyncratic per model (each
model registers a hand-picked module list via add_regularization_weight —
e.g. SNR/MSSM register only the tower DNN, STAR/APG/PepNet register nothing)
so this is the test that keeps every model's REG_DNN_PREFIXES honest.

Mechanism: reuses the forward-parity tests' transplant code by monkeypatching
their ``_run_pair`` hook to capture the transplanted (ours, variables, ref)
triple, and their ``_ref_config`` to construct the reference model with
nonzero l2 coefficients (registration happens at reference __init__).
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")

torch = pytest.importorskip("torch")
if REF not in sys.path:
    sys.path.insert(0, REF)

import jax.numpy as jnp

import tests.test_parity_reference as t1
import tests.test_parity_reference_more as t2
import tests.test_parity_reference_rest as t3
from mmlrec_tpu.train.losses import l2_regularization, multitask_loss

L2_EMB, L2_DNN = 0.013, 0.0077

# family -> (module owning _run_pair/_ref_config, forward-parity test fn name)
CASES = {
    "mmoe": (t1, "test_mmoe_forward_parity"),
    "esmm": (t1, "test_esmm_forward_parity"),
    "sharedbottom": (t1, "test_sharedbottom_forward_parity"),
    "star": (t2, "test_star_forward_parity"),
    "ple": (t2, "test_ple_forward_parity"),
    "hmoe": (t2, "test_hmoe_forward_parity"),
    "cross_stitch": (t2, "test_cross_stitch_forward_parity"),
    "aitm": (t2, "test_aitm_forward_parity"),
    "apg": (t2, "test_apg_forward_parity"),
    "mlp": (t3, "test_mlp_forward_parity"),
    "escm": (t3, "test_escm_forward_parity"),
    "snr_trans": (t3, "test_snr_forward_parity"),
    "mssm": (t3, "test_mssm_forward_parity"),
    "pepnet": (t3, "test_pepnet_forward_parity"),
}


def _build_pair(name, monkeypatch):
    module, fn_name = CASES[name]
    box = {}

    def capture(_name, ours, variables, ref, *a, **k):
        box["triple"] = (ours, variables, ref)

    # _ref_config lives in t1 (own signature) / t2; t3 imported t2's by value
    if module is t1:
        orig = t1._ref_config

        def cfg_with_l2(model_name, hidden, gate, tower):
            raw = orig(model_name, hidden, gate, tower)
            raw["model_config"]["l2_reg_embedding"] = L2_EMB
            raw["model_config"]["l2_reg_dnn"] = L2_DNN
            return raw

        monkeypatch.setattr(t1, "_ref_config", cfg_with_l2)
    else:
        orig = t2._ref_config

        def cfg_with_l2(model_name, mc_extra=None):
            mc_extra = dict(mc_extra or {})
            mc_extra["l2_reg_embedding"] = L2_EMB
            mc_extra["l2_reg_dnn"] = L2_DNN
            return orig(model_name, mc_extra)

        monkeypatch.setattr(t2, "_ref_config", cfg_with_l2)
        monkeypatch.setattr(t3, "_ref_config", cfg_with_l2)
    monkeypatch.setattr(module, "_run_pair", capture)
    getattr(module, fn_name)()
    return box["triple"]


def _labels(n_cols=2):
    rng = np.random.default_rng(7)
    return rng.integers(0, 2, (t2.B, n_cols)).astype(np.float32)


def _reference_total(ref, name, y_np):
    """Reference training objective: basemodel.py:283-305 (mtl branch)."""
    import torch.nn.functional as F

    _, _, x_ref = t2._inputs()
    y = torch.from_numpy(y_np)
    ref.eval()
    with torch.no_grad():
        y_pred = ref(x_ref, None).squeeze()
        if name == "escm":
            # basemodel.py:284-292
            loss_0 = F.binary_cross_entropy(y_pred[:, 0], y[:, 0], reduction="sum")
            loss_1 = F.binary_cross_entropy(y_pred[:, 1], y[:, 1], reduction="sum")
            loss_2 = F.binary_cross_entropy(y_pred[:, 2], y[:, 1], reduction="sum")
            ctr_num = torch.sum(y[:, 0])
            o = y[:, 0].float()
            loss_1 = ref.counterfact_ipw(loss_1, ctr_num, o, y_pred[:, 0])
            data = loss_0 + loss_1 * ref.counterfactual_w + loss_2 * ref.global_w
        else:
            data = sum(
                F.binary_cross_entropy(y_pred[:, i], y[:, i], reduction="sum")
                for i in range(2)
            )
        reg = ref.get_regularization_loss()
        aux = ref.aux_loss
    return (
        float(data),
        float(reg.sum()),
        float(data + reg.sum() + (aux.sum() if torch.is_tensor(aux) else aux)),
    )


def _our_total(ours, variables, name, y_np):
    ids, dense, _ = t2._inputs()
    probs = ours.apply(variables, ids, dense, None, train=False)
    y = jnp.asarray(y_np)
    w = jnp.ones((t2.B,), jnp.float32)
    data = multitask_loss(
        probs, y, w, ["binary_crossentropy", "binary_crossentropy"],
        "mtl", 1, model_name=name,
    )
    prefixes = type(ours).REG_DNN_PREFIXES
    reg = l2_regularization(variables["params"], L2_EMB, L2_DNN,
                            dnn_prefixes=prefixes)
    return float(data), float(reg), float(data + reg)


@pytest.mark.parametrize("name", sorted(CASES))
def test_training_loss_parity(name, monkeypatch):
    ours, variables, ref = _build_pair(name, monkeypatch)
    y_np = _labels()
    ref_data, ref_reg, ref_total = _reference_total(ref, name, y_np)
    our_data, our_reg, our_total = _our_total(ours, variables, name, y_np)
    # reg compared at tight rtol: an inclusion-set mismatch shifts it by the
    # missing/extra group's full share
    np.testing.assert_allclose(our_reg, ref_reg, rtol=1e-4, err_msg=f"{name} reg")
    np.testing.assert_allclose(our_data, ref_data, rtol=1e-4,
                               err_msg=f"{name} data loss")
    np.testing.assert_allclose(our_total, ref_total, rtol=1e-4,
                               err_msg=f"{name} total")
