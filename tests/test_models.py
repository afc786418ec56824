import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmlrec_tpu.config import ExperimentConfig
from mmlrec_tpu.features import DenseFeat, FeatureLayout, SparseFeat
from mmlrec_tpu.models import MODEL_REGISTRY, get_model
from mmlrec_tpu.synthetic import make_config

B = 16
N_SPARSE, N_DENSE, VOCAB = 5, 3, 50


@pytest.fixture(scope="module")
def layout():
    cols = [SparseFeat(f"s{i}", VOCAB, 8) for i in range(N_SPARSE)] + [
        DenseFeat(f"d{i}", 1) for i in range(N_DENSE)
    ]
    return FeatureLayout(cols)


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, VOCAB, (B, N_SPARSE)), jnp.int32)
    dense = jnp.asarray(rng.random((B, N_DENSE)), jnp.float32)
    return ids, dense


def _cfg(task_name="mtl", model_name="mmoe", **kw):
    cfg = make_config(
        task_name=task_name,
        model_name=model_name,
        n_sparse=N_SPARSE,
        n_dense=N_DENSE,
        hidden=(32, 16),
        tower=(8,),
        gate=(8,),
        **kw,
    )
    return cfg


@pytest.mark.parametrize("name", sorted(MODEL_REGISTRY))
def test_forward_shapes_mtl(name, layout, batch):
    cfg = _cfg(model_name=name if name != "pcg" else "mmoe")
    model = get_model(name, layout, cfg)
    ids, dense = batch
    variables = model.init(jax.random.PRNGKey(0), ids, dense, None, train=False)
    out = model.apply(variables, ids, dense, None, train=False)
    expected_cols = {"escm": 3, "escm_dr": 4}.get(name, 2)
    assert out.shape == (B, expected_cols)
    assert bool(jnp.all(jnp.isfinite(out)))
    if name not in ("escm", "escm_dr"):  # ESCM's ctcvr column is a product
        assert bool(jnp.all((out >= 0) & (out <= 1)))


MSL_MODELS = ["sharedbottom", "mmoe", "ple", "star", "mlp", "hmoe", "snr_trans",
              "mssm", "apg", "pepnet", "cross_stitch"]


@pytest.mark.parametrize("name", MSL_MODELS)
def test_msl_domain_mask_gates_heads(name, layout, batch):
    cfg = _cfg(task_name="msl", model_name=name, num_domains=2)
    cfg.model_config.masked_loss = True
    model = get_model(name, layout, cfg)
    ids, dense = batch
    dom = np.arange(B) % 2
    dmask = jnp.asarray(np.eye(2)[dom], jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), ids, dense, dmask, train=False)
    out = model.apply(variables, ids, dense, dmask, train=False)
    # head i must be zeroed outside its domain (reference mmoe.py:101-102)
    out = np.asarray(out)
    for i in range(2):
        assert np.allclose(out[dom != i, i], 0.0)
        assert not np.allclose(out[dom == i, i], 0.0)


def test_mtmsl_mask_pattern(layout, batch):
    cfg = _cfg(task_name="mtmsl", model_name="star", num_tasks=4, num_domains=2)
    cfg.model_config.masked_loss = True
    model = get_model("star", layout, cfg)
    ids, dense = batch
    dom = np.arange(B) % 2
    dmask = jnp.asarray(np.eye(2)[dom], jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), ids, dense, dmask, train=False)
    out = np.asarray(model.apply(variables, ids, dense, dmask, train=False))
    assert out.shape == (B, 4)
    for i in range(4):
        j = i % 2  # reference mmoe.py:103-106
        assert np.allclose(out[dom != j, i], 0.0)


def test_esmm_ctcvr_is_product(layout, batch):
    cfg = _cfg(model_name="esmm")
    model = get_model("esmm", layout, cfg)
    ids, dense = batch
    variables = model.init(jax.random.PRNGKey(0), ids, dense, None, train=False)
    out = np.asarray(model.apply(variables, ids, dense, None, train=False))
    # pCTCVR = pCTR * pCVR <= pCTR (reference esmm.py:60)
    assert (out[:, 1] <= out[:, 0] + 1e-6).all()


def test_escm_column_semantics(layout, batch):
    cfg = _cfg(model_name="escm")
    model = get_model("escm", layout, cfg)
    ids, dense = batch
    variables = model.init(jax.random.PRNGKey(0), ids, dense, None, train=False)
    out = np.asarray(model.apply(variables, ids, dense, None, train=False))
    np.testing.assert_allclose(out[:, 2], out[:, 0] * out[:, 1], rtol=1e-5)


def test_layer_output_capture(layout, batch):
    """sow()-based layer capture (reference save_layer_output,
    model/mmoe.py:110-118)."""
    cfg = _cfg(model_name="mmoe")
    model = get_model("mmoe", layout, cfg)
    ids, dense = batch
    variables = model.init(jax.random.PRNGKey(0), ids, dense, None, train=False)
    _, mutated = model.apply(
        variables, ids, dense, None, train=False, mutable=["intermediates"]
    )
    inter = mutated["intermediates"]
    for key in ("dnn_input", "expert_outputs", "mmoe_outputs", "gate_outputs",
                "tower_outputs"):
        assert key in inter, key


def test_aitm_requires_two_tasks(layout, batch):
    cfg = _cfg(model_name="aitm", task_name="msl", num_domains=3)
    model = get_model("aitm", layout, cfg)
    ids, dense = batch
    with pytest.raises(ValueError):
        model.init(jax.random.PRNGKey(0), ids, dense, None, train=False)


def test_models_gradients_flow(layout, batch):
    cfg = _cfg(model_name="mmoe")
    model = get_model("mmoe", layout, cfg)
    ids, dense = batch
    variables = model.init(jax.random.PRNGKey(0), ids, dense, None, train=False)

    def loss(params):
        out = model.apply({"params": params}, ids, dense, None, train=False)
        return jnp.sum((out - 0.5) ** 2)

    grads = jax.grad(loss)(variables["params"])
    flat = jax.tree_util.tree_leaves(grads)
    assert any(bool(jnp.any(g != 0)) for g in flat)
    # embedding table receives gradient
    g_table = grads["embeddings"]["fused"]["table"]
    assert bool(jnp.any(g_table != 0))


@pytest.mark.parametrize("name", sorted(set(MODEL_REGISTRY) - {"pcg", "escm_dr"}))
def test_wide_linear_opt_in(name, layout, batch):
    """use_wide_linear (opt-in inventory close-out of the reference's dead
    Linear term, basemodel.py:14-66): creates a 'wide_linear' param group
    whose table moves every head's output."""
    cfg = _cfg(model_name=name)
    cfg.model_config.extra["use_wide_linear"] = True
    model = get_model(name, layout, cfg)
    ids, dense = batch
    v = model.init(jax.random.PRNGKey(0), ids, dense, None, train=False)
    assert "wide_linear" in v["params"]
    out = model.apply(v, ids, dense, None, train=False)
    p2 = jax.tree.map(lambda x: x, v["params"])
    p2["wide_linear"]["table"] = p2["wide_linear"]["table"] + 1.0
    out2 = model.apply({**v, "params": p2}, ids, dense, None, train=False)
    assert float(jnp.max(jnp.abs(out - out2))) > 1e-4


def test_wide_linear_trains_with_l2(layout, batch):
    """Wide term end-to-end: fit() with l2_reg_linear > 0 updates the wide
    params (reference basemodel.py:130 registers them at l2_reg_linear)."""
    from mmlrec_tpu.train import Trainer

    cfg = _cfg(model_name="mmoe")
    cfg.model_config.extra["use_wide_linear"] = True
    cfg.model_config.l2_reg_linear = 1e-3
    model = get_model("mmoe", layout, cfg)
    tr = Trainer(model, seed=0).compile()
    rng = np.random.default_rng(1)
    n = 64
    x_ids = rng.integers(0, VOCAB, (n, N_SPARSE)).astype(np.int32)
    x_dense = rng.random((n, N_DENSE)).astype(np.float32)
    y = rng.integers(0, 2, (n, 2)).astype(np.float32)
    inputs = {f"s{i}": x_ids[:, i] for i in range(N_SPARSE)}
    inputs.update({f"d{i}": x_dense[:, i] for i in range(N_DENSE)})
    before = np.asarray(tr_init_table(tr, inputs, y))
    tr.fit(inputs, y, batch_size=32, epochs=2, verbose=0)
    after = np.asarray(tr.variables["params"]["wide_linear"]["table"])
    assert np.abs(after - before).max() > 0


def tr_init_table(tr, inputs, y):
    # initialize params without training to snapshot the wide table
    if tr.variables is None:
        tr.fit(inputs, y, batch_size=32, epochs=0, verbose=0)
    return tr.variables["params"]["wide_linear"]["table"]


def test_snr_stochastic_gates_opt_in(layout, batch):
    """snr_stochastic_gates: per-step hard-concrete u re-draw (the
    reference's commented-out line, mssm.py:40) — train outputs vary with
    the rng, eval is deterministic, and alpha still receives gradient."""
    cfg = _cfg(model_name="mssm")
    cfg.model_config.extra["snr_stochastic_gates"] = True
    model = get_model("mssm", layout, cfg)
    ids, dense = batch
    v = model.init(jax.random.PRNGKey(0), ids, dense, None, train=False)
    assert "u" not in v["params"]["gate_1"]  # u is noise, not a param

    t1 = model.apply(v, ids, dense, None, train=True,
                     rngs={"dropout": jax.random.PRNGKey(1)})
    t2 = model.apply(v, ids, dense, None, train=True,
                     rngs={"dropout": jax.random.PRNGKey(2)})
    assert float(jnp.max(jnp.abs(t1 - t2))) > 1e-6

    e1 = model.apply(v, ids, dense, None, train=False)
    e2 = model.apply(v, ids, dense, None, train=False)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))
    assert np.isfinite(np.asarray(e1)).all()

    def loss(p):
        out = model.apply({"params": p}, ids, dense, None, train=True,
                          rngs={"dropout": jax.random.PRNGKey(3)})
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(v["params"])
    assert float(jnp.max(jnp.abs(g["gate_1"]["alpha"]))) > 0


@pytest.mark.parametrize("model_name", ["snr_trans", "mssm"])
def test_snr_gate_alpha_per_connection(layout, batch, model_name):
    """snr_gate_alpha='per_connection': the hard-concrete location alpha is
    shaped like u (Louizos-style L0), so stochastic gates carry a learnable
    PER-CONNECTION routing signal instead of one global rate (the
    scalar-alpha drop-connect degeneration diagnosed in BASELINE.md).
    Reference alpha is torch.rand(1) (snr_trans.py:13) — this is an
    intended-mode extension."""
    cfg = _cfg(model_name=model_name)
    cfg.model_config.extra["snr_stochastic_gates"] = True
    cfg.model_config.extra["snr_gate_alpha"] = "per_connection"
    model = get_model(model_name, layout, cfg)
    ids, dense = batch
    v = model.init(jax.random.PRNGKey(0), ids, dense, None, train=False)
    E = cfg.model_config.num_experts
    a1 = v["params"]["gate_1"]["alpha"]
    units0 = cfg.model_config.expert_dnn_hidden_units[0]
    if model_name == "mssm":  # elementwise gate: alpha per (out, in, unit)
        assert a1.shape == (E, E, units0)
    else:  # SNR: alpha per (out, in) connection
        assert a1.shape == (E, E)

    def loss(p):
        out = model.apply({"params": p}, ids, dense, None, train=True,
                          rngs={"dropout": jax.random.PRNGKey(3)})
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(v["params"])["gate_1"]["alpha"]
    # distinct connections receive DISTINCT gradients — the routing signal
    # the scalar variant cannot represent
    assert float(jnp.max(jnp.abs(g))) > 0
    assert float(jnp.std(g)) > 0

    # eval is deterministic and finite
    e1 = model.apply(v, ids, dense, None, train=False)
    e2 = model.apply(v, ids, dense, None, train=False)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))
    assert np.isfinite(np.asarray(e1)).all()


def test_snr_gate_alpha_scalar_default_unchanged(layout, batch):
    """Default snr_gate_alpha='scalar' keeps the reference-shaped (1,)
    alpha and identical outputs to a build without the knob present."""
    ids, dense = batch
    outs = []
    for extra in ({}, {"snr_gate_alpha": "scalar"}):
        cfg = _cfg(model_name="snr_trans")
        cfg.model_config.extra.update(extra)
        model = get_model("snr_trans", layout, cfg)
        v = model.init(jax.random.PRNGKey(0), ids, dense, None, train=False)
        assert v["params"]["gate_1"]["alpha"].shape == (1,)
        outs.append(np.asarray(
            model.apply(v, ids, dense, None, train=False)))
    np.testing.assert_array_equal(outs[0], outs[1])


def test_snr_gate_noise_warmup():
    """snr_gate_noise_warmup_epochs (round 5): the first E epochs train
    with the deterministic midpoint gate, then the hard-concrete noise
    engages — separate compiled step variants (_gw cache keys)."""
    import jax.numpy as jnp

    from mmlrec_tpu.synthetic import make_config, make_data
    from mmlrec_tpu.train import Trainer

    kw = dict(task_name="mtl", model_name="snr_trans", n_sparse=4,
              n_dense=2, hidden=(16, 8), tower=(8,), gate=(8,),
              batch_size=64, lr=3e-3, snr_stochastic_gates=True,
              snr_gate_alpha="per_connection")

    def fit(warmup, force_active=None, epochs=2):
        cfg = make_config(**kw, snr_gate_noise_warmup_epochs=warmup)
        layout, x, y, _ = make_data(cfg, n=256, seed=0)
        tr = Trainer(get_model("snr_trans", layout, cfg), seed=0).compile()
        if force_active is not None:
            tr._gate_warmup_active = force_active
        tr.fit(x, y, batch_size=64, epochs=epochs, verbose=0, shuffle=False)
        return tr

    # warmup >= epochs: every train step uses the midpoint gate — equal to
    # forcing the warmup context for the whole fit
    tr_a = fit(warmup=10)
    tr_b = fit(warmup=0, force_active=True)
    ta = np.asarray(tr_a.variables["params"]["embeddings"]["fused"]["table"])
    tb = np.asarray(tr_b.variables["params"]["embeddings"]["fused"]["table"])
    np.testing.assert_array_equal(ta, tb)
    assert any(k.endswith("_gw") for k in tr_a._step_fns)

    # warmup crossing mid-fit: both program variants get built, training
    # stays finite, and the result DIFFERS from the all-warmup run (the
    # noise really engages after epoch 1)
    tr_c = fit(warmup=1, epochs=3)
    assert any(k.endswith("_gw") for k in tr_c._step_fns)
    assert any(
        (k.startswith("scan_") or k.startswith("train_step")
         or k.startswith("slice_step") or k == "gather_step")
        and not k.endswith("_gw")
        for k in tr_c._step_fns
    )
    assert np.isfinite(tr_c.history[-1]["loss"])
    tr_d = fit(warmup=10, epochs=3)
    td = np.asarray(tr_d.variables["params"]["embeddings"]["fused"]["table"])
    tc = np.asarray(tr_c.variables["params"]["embeddings"]["fused"]["table"])
    assert not np.array_equal(tc, td)
