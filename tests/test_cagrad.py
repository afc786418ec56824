import jax.numpy as jnp
import numpy as np

from mmlrec_tpu.models import get_model
from mmlrec_tpu.synthetic import make_config, make_data
from mmlrec_tpu.train import Trainer
from mmlrec_tpu.train.cagrad import cagrad_merge


def test_cagrad_agreeing_grads_close_to_mean():
    g = {"a": jnp.asarray([1.0, 2.0, 3.0])}
    merged = cagrad_merge([g, g], alpha=0.5)
    # identical task grads: g0 == gw == g, d = g * (1 + c/||g||)/(1+a^2)
    # with c = a*||g|| -> d = g * (1+a)/(1+a^2) = g * 1.2
    np.testing.assert_allclose(np.asarray(merged["a"]),
                               np.asarray(g["a"]) * 1.2, rtol=1e-3)


def test_cagrad_conflicting_grads_bounded():
    g1 = {"a": jnp.asarray([1.0, 0.0])}
    g2 = {"a": jnp.asarray([-1.0, 0.001])}
    merged = cagrad_merge([g1, g2], alpha=0.5)
    v = np.asarray(merged["a"])
    assert np.all(np.isfinite(v))
    # conflict-averse: the merged direction must not hurt the worse task
    # more than the plain average would amplify it
    assert abs(v[0]) <= 1.0


def test_cagrad_training_runs():
    cfg = make_config(task_name="mtl", model_name="mmoe", n_sparse=4,
                      n_dense=2, hidden=(16, 8), tower=(8,), gate=(8,),
                      epochs=3, batch_size=128, lr=3e-3, use_cagrad=True)
    layout, x, y, _ = make_data(cfg, n=800, seed=0)
    model = get_model("mmoe", layout, cfg)
    tr = Trainer(model, seed=0).compile()
    tr.fit(x, y, batch_size=128, epochs=3, verbose=0)
    assert np.isfinite(tr.history[-1]["loss"])
    assert tr.history[-1]["loss"] < tr.history[0]["loss"]
