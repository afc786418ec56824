"""optax.flatten wrapping (Trainer._use_flat_optimizer).

The fused single-vector optimizer update must be bit-exact vs the
per-tensor form for the element-wise optimizers the reference offers
(basemodel.py:569-584), and must stay off in the configurations where it
could hurt (mesh; legacy masked sparse path; big table without two-phase).
"""

import numpy as np

from mmlrec_tpu.models import get_model
from mmlrec_tpu.synthetic import make_config, make_data
from mmlrec_tpu.train import Trainer


def _fit(extra_overrides=None, **cfg_kw):
    cfg = make_config(
        task_name="mtl", model_name="mmoe", emb=4, n_sparse=4, n_dense=2,
        hidden=(16, 8), tower=(8,), gate=(8,), batch_size=64, **cfg_kw,
    )
    if extra_overrides:
        cfg.model_config.extra.update(extra_overrides)
    layout, x, y, _ = make_data(cfg, n=256, seed=0)
    model = get_model("mmoe", layout, cfg)
    tr = Trainer(model, seed=0).compile()
    tr.fit(x, y, batch_size=64, epochs=2, verbose=0)
    return tr, x


def test_flat_matches_plain_bitwise():
    tr_flat, x = _fit()
    tr_plain, _ = _fit(extra_overrides={"flat_optimizer": False})
    assert tr_flat._use_flat_optimizer()
    assert not tr_plain._use_flat_optimizer()
    p_flat = tr_flat.predict(x, 64)
    p_plain = tr_plain.predict(x, 64)
    np.testing.assert_array_equal(p_flat, p_plain)


def test_flat_skipped_for_large_table_without_two_phase():
    cfg = make_config(
        task_name="mtl", model_name="mmoe", emb=8, n_sparse=4,
        n_dense=2, hidden=(16, 8), tower=(8,), gate=(8,),
    )
    layout, _, _, _ = make_data(cfg, n=8, vocab=1 << 18, seed=0)
    tr = Trainer(get_model("mmoe", layout, cfg), seed=0)
    assert not tr._use_flat_optimizer()  # 4 * 2^18 * 8 = 2^23 elems >= 2^22


def test_flat_enabled_for_large_table_with_two_phase():
    cfg = make_config(
        task_name="mtl", model_name="mmoe", emb=8, n_sparse=4,
        n_dense=2, hidden=(16, 8), tower=(8,), gate=(8,),
        two_phase_embedding=True,
    )
    layout, _, _, _ = make_data(cfg, n=8, vocab=1 << 18, seed=0)
    tr = Trainer(get_model("mmoe", layout, cfg), seed=0)
    assert tr._use_flat_optimizer()


def test_flat_skipped_under_mesh():
    import jax
    from mmlrec_tpu.parallel import create_mesh

    mesh = create_mesh(data=2, model=1, devices=jax.devices()[:2])
    cfg = make_config(
        task_name="mtl", model_name="mmoe", emb=4, n_sparse=4, n_dense=2,
        hidden=(16, 8), tower=(8,), gate=(8,),
    )
    layout, _, _, _ = make_data(cfg, n=8, seed=0)
    tr = Trainer(get_model("mmoe", layout, cfg), seed=0, mesh=mesh)
    assert not tr._use_flat_optimizer()


def test_flat_two_phase_fit_runs():
    tr, x = _fit(extra_overrides={"two_phase_embedding": True})
    assert tr._use_flat_optimizer()
    assert np.isfinite(tr.history[-1]["loss"])
    assert np.isfinite(tr.predict(x, 64)).all()
