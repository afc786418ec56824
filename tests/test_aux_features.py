"""Auxiliary feature coverage: Dice activation, varlen sequence features
end-to-end, CKA loss training, validation_split, dropout/BN training."""

import jax
import jax.numpy as jnp
import numpy as np

from mmlrec_tpu.features import DenseFeat, FeatureLayout, SparseFeat, VarLenSparseFeat
from mmlrec_tpu.models import get_model
from mmlrec_tpu.ops.layers import Dice, MLP
from mmlrec_tpu.synthetic import make_config, make_data
from mmlrec_tpu.train import Trainer

KEY = jax.random.PRNGKey(0)


def test_dice_activation_shapes_and_range():
    x = jax.random.normal(KEY, (16, 8)) * 3
    mod = Dice()
    variables = mod.init(KEY, x, train=True)
    y, _ = mod.apply(variables, x, train=True, mutable=["batch_stats"])
    assert y.shape == x.shape
    # alpha init 0 -> negative part scaled toward 0, positive part kept-ish
    y_eval = mod.apply(variables, x, train=False)
    assert y_eval.shape == x.shape


def test_mlp_with_dice():
    x = jax.random.normal(KEY, (8, 5))
    mod = MLP([7], activation="dice")
    variables = mod.init(KEY, x, train=True)
    y, _ = mod.apply(variables, x, train=True, mutable=["batch_stats"])
    assert y.shape == (8, 7)


def test_varlen_feature_through_trainer():
    """Behaviour-sequence feature end-to-end (reference VarLenSparseFeat
    machinery exists but is never produced by its data pipeline —
    SURVEY §2.4.6; it IS supported here)."""
    maxlen, vocab = 6, 30
    cols = [
        SparseFeat("user", 20, 8),
        VarLenSparseFeat(SparseFeat("hist", vocab, 8), maxlen=maxlen,
                         combiner="mean"),
        DenseFeat("price", 1),
    ]
    layout = FeatureLayout(cols)
    cfg = make_config(task_name="mtl", model_name="sharedbottom", n_sparse=1,
                      n_dense=1, hidden=(16,), tower=(8,), gate=(8,))
    model = get_model("sharedbottom", layout, cfg)

    rng = np.random.default_rng(0)
    n = 400
    x = {
        "user": rng.integers(0, 20, n),
        # 0 is the padding id: mask = (id != 0) (reference model/utils.py:454)
        "hist": np.where(rng.random((n, maxlen)) < 0.5,
                         rng.integers(1, vocab, (n, maxlen)), 0),
        "price": rng.random(n).astype(np.float32),
    }
    y = rng.integers(0, 2, (n, 2)).astype(np.float32)
    tr = Trainer(model, seed=0).compile()
    tr.fit(x, y, batch_size=128, epochs=2, verbose=0)
    preds = tr.predict(x, batch_size=128)
    assert preds.shape == (n, 2)
    assert np.isfinite(preds).all()


def test_varlen_with_length_column():
    maxlen = 4
    cols = [
        SparseFeat("s", 10, 4),
        VarLenSparseFeat(SparseFeat("seq", 15, 4), maxlen=maxlen,
                         combiner="sum", length_name="seq_len"),
    ]
    layout = FeatureLayout(cols)
    cfg = make_config(task_name="mtl", model_name="mlp", n_sparse=1, n_dense=0,
                      hidden=(8,), tower=(4,), gate=(4,))
    model = get_model("mlp", layout, cfg)
    rng = np.random.default_rng(1)
    n = 64
    x = {
        "s": rng.integers(0, 10, n),
        "seq": rng.integers(0, 15, (n, maxlen)),
        "seq_len": rng.integers(1, maxlen + 1, n),
    }
    tr = Trainer(model, seed=0).compile()
    ids, dense = tr.pack_inputs(x)
    assert ids.shape == (n, 1 + maxlen + 1)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(ids),
                           jnp.asarray(dense), None, train=False)
    out = model.apply(variables, jnp.asarray(ids), jnp.asarray(dense), None,
                      train=False)
    assert out.shape == (n, 2)


def test_cka_loss_training():
    """use_cka_loss with masked MSL training (the reference's CKA import is
    missing entirely — basemodel.py:548; implemented here)."""
    cfg = make_config(task_name="msl", model_name="mlp", num_domains=2,
                      n_sparse=4, n_dense=2, hidden=(16,), tower=(8,),
                      gate=(8,), epochs=2, batch_size=128,
                      use_cka_loss=True, masked_loss=True)
    assert cfg.model_config.use_cka_loss
    layout, x, y, _ = make_data(cfg, n=600, seed=0)
    model = get_model("mlp", layout, cfg)
    tr = Trainer(model, seed=0).compile()
    tr.fit(x, y, batch_size=128, epochs=2, verbose=0)
    assert np.isfinite(tr.history[-1]["loss"])


def test_validation_split_path():
    cfg = make_config(task_name="mtl", model_name="sharedbottom", n_sparse=3,
                      n_dense=1, hidden=(8,), tower=(4,), gate=(4,),
                      epochs=2, batch_size=128)
    layout, x, y, _ = make_data(cfg, n=500, seed=0)
    model = get_model("sharedbottom", layout, cfg)
    tr = Trainer(model, seed=0).compile()
    tr.fit(x, y, batch_size=128, epochs=2, validation_split=0.2, verbose=0)
    assert "val_auc" in tr.history[-1]


def test_dropout_and_bn_training():
    cfg = make_config(task_name="mtl", model_name="mmoe", n_sparse=4,
                      n_dense=2, hidden=(16, 8), tower=(8,), gate=(8,),
                      epochs=2, batch_size=128, dnn_dropout=0.3,
                      dnn_use_bn=True)
    layout, x, y, _ = make_data(cfg, n=500, seed=0)
    model = get_model("mmoe", layout, cfg)
    tr = Trainer(model, seed=0).compile()
    tr.fit(x, y, batch_size=128, epochs=2, verbose=0)
    assert np.isfinite(tr.history[-1]["loss"])
    # batch stats must have been updated during training
    bs = tr.variables.get("batch_stats", {})
    assert bs, "expected batch_stats collection with dnn_use_bn"
    preds = tr.predict(x, batch_size=128)
    assert np.isfinite(preds).all()
