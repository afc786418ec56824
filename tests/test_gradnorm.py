import jax
import jax.numpy as jnp
import numpy as np

from mmlrec_tpu.models import get_model
from mmlrec_tpu.synthetic import make_config, make_data
from mmlrec_tpu.train import Trainer
from mmlrec_tpu.train.gradnorm import gradnorm_update


def test_gradnorm_update_math():
    w = jnp.asarray([1.0, 1.0])
    losses = jnp.asarray([2.0, 1.0])
    initial = jnp.asarray([2.0, 2.0])
    # task 0 has larger grads -> its weight should go DOWN relative to task 1
    g0 = {"a": jnp.ones((4,)) * 3.0}
    g1 = {"a": jnp.ones((4,)) * 1.0}
    new_w, norms = gradnorm_update(w, losses, initial, [g0, g1], alpha=1.0, lr=0.1)
    assert abs(float(jnp.sum(new_w)) - 2.0) < 1e-5  # renormalized to T
    assert float(new_w[0]) < float(new_w[1])
    np.testing.assert_allclose(np.asarray(norms), [6.0, 2.0], rtol=1e-5)


def test_gradnorm_training_runs_and_rebalances():
    cfg = make_config(
        task_name="mtl", model_name="mmoe", n_sparse=4, n_dense=2,
        hidden=(16, 8), tower=(8,), gate=(8,), epochs=2, batch_size=128,
        lr=3e-3, use_gradnorm=True,
    )
    assert cfg.model_config.extra["use_gradnorm"] is True
    layout, x, y, _ = make_data(cfg, n=800, seed=0)
    model = get_model("mmoe", layout, cfg)
    tr = Trainer(model, seed=0).compile()
    tr.fit(x, y, batch_size=128, epochs=2, verbose=0)
    assert np.isfinite(tr.history[-1]["loss"])
