import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmlrec_tpu.models import get_model
from mmlrec_tpu.synthetic import make_config, make_data
from mmlrec_tpu.train import Trainer
from mmlrec_tpu.train.sparse_embedding import (
    init_sparse_adam,
    sparse_adam_row_update,
)


def test_sparse_adam_matches_dense_when_all_rows_touched():
    """When every row is touched every step, SparseAdam == dense Adam."""
    import optax

    V, D = 8, 4
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(V, D)), jnp.float32)
    lr = 0.01
    dense_opt = optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
    dense_state = dense_opt.init(table)
    sp_state = init_sparse_adam(table)
    dense_table, sparse_table = table, table
    all_rows = jnp.arange(V)

    for step in range(5):
        g = jnp.asarray(rng.normal(size=(V, D)), jnp.float32)
        upd, dense_state = dense_opt.update(g, dense_state, dense_table)
        dense_table = optax.apply_updates(dense_table, upd)
        sparse_table, sp_state = sparse_adam_row_update(
            sparse_table, g, all_rows, sp_state, lr=lr
        )
    np.testing.assert_allclose(
        np.asarray(sparse_table), np.asarray(dense_table), rtol=1e-5, atol=1e-6
    )


def test_sparse_adam_leaves_untouched_rows_alone():
    V, D = 10, 3
    table = jnp.ones((V, D))
    g = jnp.zeros((V, D)).at[2].set(1.0).at[5].set(-1.0)
    state = init_sparse_adam(table)
    new_table, state = sparse_adam_row_update(
        table, g, jnp.asarray([2, 5, 2]), state, lr=0.1  # duplicate id
    )
    nt = np.asarray(new_table)
    np.testing.assert_allclose(nt[[0, 1, 3, 4, 6, 7, 8, 9]], 1.0)
    assert nt[2, 0] < 1.0 and nt[5, 0] > 1.0  # moved against gradient sign
    assert int(state.count) == 1


def test_sparse_embedding_training_end_to_end():
    cfg = make_config(task_name="mtl", model_name="mmoe", n_sparse=4,
                      n_dense=2, hidden=(16, 8), tower=(8,), gate=(8,),
                      epochs=3, batch_size=128, lr=3e-3,
                      sparse_embedding_update=True)
    layout, x, y, _ = make_data(cfg, n=800, seed=0)
    model = get_model("mmoe", layout, cfg)
    tr = Trainer(model, seed=0).compile()
    table_before = None
    tr.fit(x, y, batch_size=128, epochs=3, verbose=0)
    assert np.isfinite(tr.history[-1]["loss"])
    assert tr.history[-1]["loss"] < tr.history[0]["loss"]
    # the table actually moved (sparse path, not the zeroed optax route)
    table = np.asarray(tr.variables["params"]["embeddings"]["fused"]["table"])
    assert np.abs(table).max() > 1e-3  # init std is 1e-4; training moved rows


def test_sparse_vs_dense_quality_similar():
    kw = dict(task_name="mtl", model_name="sharedbottom", n_sparse=4,
              n_dense=2, hidden=(16, 8), tower=(8,), gate=(8,), epochs=4,
              batch_size=128, lr=3e-3)
    results = {}
    for name, extra in (("dense", {}), ("sparse", {"sparse_embedding_update": True})):
        cfg = make_config(**kw, **extra)
        layout, x, y, _ = make_data(cfg, n=1200, seed=0)
        _, xv, yv, _ = make_data(cfg, n=400, seed=1)
        model = get_model("sharedbottom", layout, cfg)
        tr = Trainer(model, seed=0).compile()
        tr.fit(x, y, batch_size=128, epochs=4, validation_data=(xv, yv), verbose=0)
        results[name] = max(h["val_auc"] for h in tr.history)
    assert abs(results["dense"] - results["sparse"]) < 0.05


# ---------------------------------------------------------------------------
# two-phase embedding step
# ---------------------------------------------------------------------------


def test_batch_dedup_metadata():
    from mmlrec_tpu.train.sparse_embedding import batch_dedup_metadata

    flat = np.asarray([[3, 5, 3, 7, 5, 3]])
    inv, rep = batch_dedup_metadata(flat)
    np.testing.assert_array_equal(inv[0], [0, 1, 0, 3, 1, 0])
    np.testing.assert_array_equal(rep[0], [1, 1, 0, 1, 0, 0])


def test_two_phase_sparse_adam_matches_row_update():
    """Row-cotangent two-phase update == dense-cotangent row update,
    including duplicate ids, for both plain and lane-packed layouts."""
    from mmlrec_tpu.train.sparse_embedding import (
        batch_dedup_metadata,
        two_phase_sparse_adam,
    )

    V, D, K = 16, 4, 10
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(V, D)), jnp.float32)
    flat_ids = np.asarray([1, 7, 1, 3, 9, 7, 7, 2, 14, 1], np.int32)
    g_rows = jnp.asarray(rng.normal(size=(K, D)), jnp.float32)
    inv, rep = batch_dedup_metadata(flat_ids[None, :])
    lr = 0.05

    # reference: dense cotangent (autodiff would scatter-add dup rows)
    g_table = jnp.zeros((V, D)).at[flat_ids].add(g_rows)
    old_table, old_state = sparse_adam_row_update(
        table, g_table, jnp.asarray(flat_ids), init_sparse_adam(table), lr=lr
    )

    new_table, new_state = two_phase_sparse_adam(
        table, g_rows, jnp.asarray(flat_ids), jnp.asarray(inv[0]),
        jnp.asarray(rep[0]), init_sparse_adam(table), lr=lr, pack_factor=1,
    )
    np.testing.assert_allclose(np.asarray(new_table), np.asarray(old_table),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(new_state.mu), np.asarray(old_state.mu),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(new_state.nu), np.asarray(old_state.nu),
                               rtol=1e-5, atol=1e-6)

    # lane-packed layout: physical [V/2, 2*D], logical row r at
    # [r//2, (r%2)*D:(r%2+1)*D]
    packed = table.reshape(V // 2, 2 * D)
    p_table, p_state = two_phase_sparse_adam(
        packed, g_rows, jnp.asarray(flat_ids), jnp.asarray(inv[0]),
        jnp.asarray(rep[0]),
        init_sparse_adam(packed), lr=lr, pack_factor=2,
    )
    np.testing.assert_allclose(
        np.asarray(p_table).reshape(V, D), np.asarray(old_table),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(p_state.nu).reshape(V, D), np.asarray(old_state.nu),
        rtol=1e-5, atol=1e-6,
    )


def test_two_phase_training_end_to_end():
    cfg = make_config(task_name="mtl", model_name="mmoe", n_sparse=4,
                      n_dense=2, hidden=(16, 8), tower=(8,), gate=(8,),
                      epochs=3, batch_size=128, lr=3e-3,
                      two_phase_embedding=True)
    layout, x, y, _ = make_data(cfg, n=800, seed=0)
    model = get_model("mmoe", layout, cfg)
    tr = Trainer(model, seed=0).compile()
    tr.fit(x, y, batch_size=128, epochs=3, verbose=0)
    assert np.isfinite(tr.history[-1]["loss"])
    assert tr.history[-1]["loss"] < tr.history[0]["loss"]
    table = np.asarray(tr.variables["params"]["embeddings"]["fused"]["table"])
    assert np.abs(table).max() > 1e-3


def test_two_phase_block_shuffle_end_to_end():
    cfg = make_config(task_name="mtl", model_name="sharedbottom", n_sparse=4,
                      n_dense=2, hidden=(16, 8), tower=(8,), gate=(8,),
                      epochs=2, batch_size=128, lr=3e-3,
                      two_phase_embedding=True)
    layout, x, y, _ = make_data(cfg, n=700, seed=0)  # non-divisible -> pad tail
    model = get_model("sharedbottom", layout, cfg)
    tr = Trainer(model, seed=0).compile()
    tr.fit(x, y, batch_size=128, epochs=2, shuffle="block", verbose=0)
    assert np.isfinite(tr.history[-1]["loss"])


def test_two_phase_epoch_prefetch_matches_synchronous():
    """The full-shuffle epoch-metadata thread-ahead (trainer.py _fs_host_prep)
    must be numerically invisible: the worker only moves WHEN the numpy prep
    runs, and the rng_np permutation draw sequence is unchanged."""
    kw = dict(task_name="mtl", model_name="sharedbottom", n_sparse=4,
              n_dense=2, hidden=(16, 8), tower=(8,), gate=(8,), epochs=3,
              batch_size=128, lr=3e-3, two_phase_embedding=True)
    tables = {}
    for name, extra in (
        ("sync", {"prefetch_batches": 0}),  # fs_pool gate is off
        ("ahead", {}),  # default prefetch_batches=2 -> thread-ahead active
    ):
        cfg = make_config(**kw, **extra)
        layout, x, y, _ = make_data(cfg, n=900, seed=0)  # non-divisible tail
        model = get_model("sharedbottom", layout, cfg)
        tr = Trainer(model, seed=0).compile()
        tr.fit(x, y, batch_size=128, epochs=3, shuffle=True, verbose=0)
        tables[name] = np.asarray(
            tr.variables["params"]["embeddings"]["fused"]["table"]
        )
    np.testing.assert_array_equal(tables["ahead"], tables["sync"])


def test_two_phase_matches_sparse_update_path():
    """Both flags implement SparseAdam; same data + seed must give (nearly)
    identical tables after training."""
    kw = dict(task_name="mtl", model_name="sharedbottom", n_sparse=4,
              n_dense=2, hidden=(16, 8), tower=(8,), gate=(8,), epochs=2,
              batch_size=128, lr=3e-3)
    tables = {}
    for name, extra in (
        ("rowupd", {"sparse_embedding_update": True}),
        ("twophase", {"two_phase_embedding": True}),
    ):
        cfg = make_config(**kw, **extra)
        layout, x, y, _ = make_data(cfg, n=800, seed=0)
        model = get_model("sharedbottom", layout, cfg)
        tr = Trainer(model, seed=0).compile()
        tr.fit(x, y, batch_size=128, epochs=2, verbose=0)
        tables[name] = np.asarray(
            tr.variables["params"]["embeddings"]["fused"]["table"]
        )
    np.testing.assert_allclose(tables["twophase"], tables["rowupd"],
                               rtol=1e-4, atol=1e-6)


def test_two_phase_bf16_moments():
    """table_opt_dtype=bfloat16 halves moment storage; training stays sane
    and close to the f32-moment run."""
    kw = dict(task_name="mtl", model_name="sharedbottom", n_sparse=4,
              n_dense=2, hidden=(16, 8), tower=(8,), gate=(8,), epochs=3,
              batch_size=128, lr=3e-3)
    tables = {}
    for name, extra in (
        ("f32", {"two_phase_embedding": True}),
        ("bf16", {"two_phase_embedding": True, "table_opt_dtype": "bfloat16"}),
    ):
        cfg = make_config(**kw, **extra)
        layout, x, y, _ = make_data(cfg, n=800, seed=0)
        model = get_model("sharedbottom", layout, cfg)
        tr = Trainer(model, seed=0).compile()
        tr.fit(x, y, batch_size=128, epochs=3, verbose=0)
        if name == "bf16":
            assert tr._train_state["table_opt"].mu.dtype == jnp.bfloat16
        assert np.isfinite(tr.history[-1]["loss"])
        tables[name] = np.asarray(
            tr.variables["params"]["embeddings"]["fused"]["table"]
        )
    # moments rounding perturbs rows only slightly
    np.testing.assert_allclose(tables["bf16"], tables["f32"], atol=5e-3)


def test_batch_phys_metadata():
    from mmlrec_tpu.train.sparse_embedding import batch_phys_metadata

    # pack_factor=2: logical ids 6,7 share physical row 3
    flat = np.asarray([[6, 7, 6, 2, 9, 2]])
    pids, pinv, nuniq = batch_phys_metadata(flat, pack_factor=2,
                                            n_phys_rows=64, chunk=4)
    assert pids.shape == (1, 8) and pinv.shape == (1, 6)
    assert nuniq.shape == (1, 1) and nuniq[0, 0] == 3
    # strictly unique; real slots sorted ascending, pads at the tail
    assert len(np.unique(pids[0])) == 8
    np.testing.assert_array_equal(pids[0, :3], np.sort(pids[0, :3]))
    # touched physical rows {3, 1, 4} present; pinv maps each logical id
    # to its physical row's slot
    phys = flat[0] // 2
    np.testing.assert_array_equal(pids[0][pinv[0]], phys)
    # pad rows untouched by the batch
    pad_slots = np.setdiff1d(np.arange(8), np.unique(pinv[0]))
    assert not np.intersect1d(pids[0][pad_slots], phys).size


def test_batch_phys_metadata_needs_headroom():
    import pytest as _pytest

    from mmlrec_tpu.train.sparse_embedding import batch_phys_metadata

    with _pytest.raises(ValueError):
        batch_phys_metadata(np.zeros((1, 8), np.int64), 1, n_phys_rows=8,
                            chunk=8)


def _unique_case(mdt=jnp.float32, use_pallas=False):
    from mmlrec_tpu.train.sparse_embedding import (
        batch_step_metadata,
        two_phase_sparse_adam,
        two_phase_sparse_adam_unique,
    )

    V, D, P, K = 32, 4, 2, 12
    rng = np.random.default_rng(3)
    packed = jnp.asarray(rng.normal(size=(V // P, P * D)), jnp.float32)
    # duplicates AND a physical collision (ids 8, 9 share physical row 4)
    flat_ids = np.asarray([8, 9, 8, 3, 21, 9, 14, 3, 30, 21, 2, 8], np.int64)
    g_rows = jnp.asarray(rng.normal(size=(K, D)), jnp.float32)
    inv, rep, pids, pinv, nuniq, prep = batch_step_metadata(
        flat_ids[None, :], P, V // P, chunk=4)
    state0 = init_sparse_adam(packed, dtype=mdt)
    lr = 0.05
    base_t, base_s = two_phase_sparse_adam(
        packed, g_rows, jnp.asarray(flat_ids, jnp.int32), jnp.asarray(inv[0]),
        jnp.asarray(rep[0]), state0, lr=lr, pack_factor=P,
    )
    uniq_t, uniq_s = two_phase_sparse_adam_unique(
        packed, g_rows, jnp.asarray(flat_ids, jnp.int32), jnp.asarray(inv[0]),
        jnp.asarray(rep[0]), jnp.asarray(pids[0]), jnp.asarray(pinv[0]),
        state0, lr=lr, pack_factor=P, use_pallas=use_pallas, interpret=True,
        n_real=jnp.asarray(nuniq[0]), prep=jnp.asarray(prep[0]),
    )
    return (base_t, base_s), (uniq_t, uniq_s)


def test_two_phase_unique_matches_baseline_xla():
    (bt, bs), (ut, us) = _unique_case()
    np.testing.assert_allclose(np.asarray(ut), np.asarray(bt), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(us.mu), np.asarray(bs.mu), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(us.nu), np.asarray(bs.nu), rtol=1e-6)


def test_two_phase_unique_matches_baseline_pallas():
    (bt, bs), (ut, us) = _unique_case(use_pallas=True)
    np.testing.assert_allclose(np.asarray(ut), np.asarray(bt), rtol=1e-6,
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(us.mu), np.asarray(bs.mu),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(us.nu), np.asarray(bs.nu),
                               rtol=1e-6, atol=1e-7)


def test_two_phase_unique_bf16_moments():
    for pallas in (False, True):
        (bt, bs), (ut, us) = _unique_case(mdt=jnp.bfloat16, use_pallas=pallas)
        np.testing.assert_allclose(np.asarray(ut), np.asarray(bt), atol=1e-3)
        np.testing.assert_allclose(
            np.asarray(us.mu).astype(np.float32),
            np.asarray(bs.mu).astype(np.float32), atol=2e-2)


def _train_table(table_update, shuffle=True, vocab=400, use_device_data=True):
    # small shapes: interpret-mode pallas executes per-row DMA loops in
    # Python on every call, so work size = suite time
    kw = dict(task_name="mtl", model_name="sharedbottom", n_sparse=4,
              n_dense=2, hidden=(16, 8), tower=(8,), gate=(8,), epochs=2,
              batch_size=64, lr=3e-3, two_phase_embedding=True)
    if table_update != "scatter":
        kw["table_update"] = table_update
    cfg = make_config(**kw, vocab=vocab)
    layout, x, y, _ = make_data(cfg, n=320, seed=0, vocab=vocab)
    model = get_model("sharedbottom", layout, cfg)
    tr = Trainer(model, seed=0).compile()
    tr.fit(x, y, batch_size=64, epochs=2, shuffle=shuffle, verbose=0)
    return np.asarray(tr.variables["params"]["embeddings"]["fused"]["table"])


def test_trainer_table_update_unique_matches_scatter():
    """Full fit with table_update=unique reproduces the default scatter
    path (same seed, shuffle, data) — full-shuffle AND block modes."""
    for shuffle in (True, "block"):
        base = _train_table("scatter", shuffle=shuffle)
        uniq = _train_table("unique", shuffle=shuffle)
        np.testing.assert_allclose(uniq, base, rtol=1e-5, atol=1e-7)


def test_trainer_table_update_pallas_matches_scatter():
    base = _train_table("scatter")
    pal = _train_table("pallas")
    np.testing.assert_allclose(pal, base, rtol=1e-5, atol=1e-7)


def test_trainer_table_update_validation():
    import pytest as _pytest

    kw = dict(task_name="mtl", model_name="sharedbottom", n_sparse=4,
              n_dense=2, hidden=(16, 8), tower=(8,), gate=(8,), epochs=1,
              batch_size=128, lr=3e-3)
    cfg = make_config(**kw, table_update="unique")  # without two_phase
    layout, x, y, _ = make_data(cfg, n=200, seed=0)
    with _pytest.raises(ValueError, match="two_phase"):
        Trainer(get_model("sharedbottom", layout, cfg), seed=0)
    cfg2 = make_config(**kw, two_phase_embedding=True, table_update="bogus")
    with _pytest.raises(ValueError, match="scatter|unique|pallas"):
        Trainer(get_model("sharedbottom", layout, cfg2), seed=0)


def test_pack_unpack_monu_roundtrip():
    from mmlrec_tpu.train.sparse_embedding import pack_monu, unpack_monu

    rng = np.random.default_rng(0)
    mu = jnp.asarray(rng.normal(size=(5, 8)), jnp.float32).astype(jnp.bfloat16)
    nu = jnp.asarray(np.abs(rng.normal(size=(5, 8))), jnp.float32).astype(jnp.bfloat16)
    c = pack_monu(mu, nu)
    assert c.dtype == jnp.float32 and c.shape == (5, 8)
    m2, n2 = unpack_monu(c)
    np.testing.assert_array_equal(np.asarray(m2).view(np.uint16),
                                  np.asarray(mu).view(np.uint16))
    np.testing.assert_array_equal(np.asarray(n2).view(np.uint16),
                                  np.asarray(nu).view(np.uint16))


def test_two_phase_packed_moments_matches_baseline():
    """Packed bf16-pair moments track the split-bf16 baseline closely and
    leave untouched rows bit-identical; table matches within bf16 moment
    rounding.  Two chained steps exercise warm-moment gathers."""
    from mmlrec_tpu.train.sparse_embedding import (
        SparseAdamPackedState,
        batch_step_metadata,
        two_phase_sparse_adam,
        two_phase_sparse_adam_unique,
        unpack_monu,
    )

    V, D, P, K = 32, 4, 2, 12
    rng = np.random.default_rng(7)
    packed_tab = jnp.asarray(rng.normal(size=(V // P, P * D)), jnp.float32)
    flat_ids = np.asarray([8, 9, 8, 3, 21, 9, 14, 3, 30, 21, 2, 8], np.int64)
    inv, rep, pids, pinv, nuniq, prep = batch_step_metadata(
        flat_ids[None, :], P, V // P, chunk=4)
    args = (jnp.asarray(flat_ids, jnp.int32), jnp.asarray(inv[0]),
            jnp.asarray(rep[0]))
    uargs = args[:1] + (args[1], args[2], jnp.asarray(pids[0]),
                        jnp.asarray(pinv[0]))
    lr = 0.05

    for use_pallas in (False, True):
        bt, bs = packed_tab, init_sparse_adam(packed_tab, dtype=jnp.bfloat16)
        ut, us = packed_tab, init_sparse_adam(packed_tab, packed=True)
        for step in range(2):
            g = jnp.asarray(rng.normal(size=(K, D)), jnp.float32)
            bt, bs = two_phase_sparse_adam(
                bt, g, *args, bs, lr=lr, pack_factor=P)
            ut, us = two_phase_sparse_adam_unique(
                ut, g, *uargs, us, lr=lr, pack_factor=P,
                use_pallas=use_pallas, interpret=True,
                n_real=jnp.asarray(nuniq[0]), prep=jnp.asarray(prep[0]))
        assert isinstance(us, SparseAdamPackedState)
        np.testing.assert_allclose(np.asarray(ut), np.asarray(bt), atol=2e-3)
        mu_p, nu_p = unpack_monu(us.monu)
        np.testing.assert_allclose(
            np.asarray(mu_p).astype(np.float32),
            np.asarray(bs.mu).astype(np.float32), atol=2e-2)
        np.testing.assert_allclose(
            np.asarray(nu_p).astype(np.float32),
            np.asarray(bs.nu).astype(np.float32), atol=2e-2)
        # untouched physical rows bit-identical (zero moments, zero table)
        touched = np.unique(flat_ids // P)
        untouched = np.setdiff1d(np.arange(V // P), touched)
        np.testing.assert_array_equal(
            np.asarray(ut[untouched]), np.asarray(packed_tab[untouched]))
        np.testing.assert_array_equal(
            np.asarray(us.monu[untouched]), 0.0)


def test_trainer_pallas_bf16_uses_packed_moments():
    from mmlrec_tpu.train.sparse_embedding import SparseAdamPackedState

    kw = dict(task_name="mtl", model_name="sharedbottom", n_sparse=4,
              n_dense=2, hidden=(16, 8), tower=(8,), gate=(8,), epochs=2,
              batch_size=64, lr=3e-3, two_phase_embedding=True, vocab=400,
              table_update="pallas", table_opt_dtype="bfloat16")
    cfg = make_config(**kw)
    layout, x, y, _ = make_data(cfg, n=256, seed=0, vocab=400)
    tr = Trainer(get_model("sharedbottom", layout, cfg), seed=0).compile()
    tr.fit(x, y, batch_size=64, epochs=2, verbose=0)
    assert isinstance(tr._train_state["table_opt"], SparseAdamPackedState)
    assert np.isfinite(tr.history[-1]["loss"])

    # close to the split-bf16 scatter baseline
    kw2 = {k: v for k, v in kw.items() if k != "table_update"}
    cfg2 = make_config(**kw2)
    layout2, x2, y2, _ = make_data(cfg2, n=600, seed=0, vocab=400)
    tr2 = Trainer(get_model("sharedbottom", layout2, cfg2), seed=0).compile()
    tr2.fit(x2, y2, batch_size=128, epochs=2, verbose=0)
    t1 = np.asarray(tr.variables["params"]["embeddings"]["fused"]["table"])
    t2 = np.asarray(tr2.variables["params"]["embeddings"]["fused"]["table"])
    # packed SETS round_bf16(new) while split scatter ADDS in bf16 — the
    # rounding paths diverge a little more per step at small batches
    np.testing.assert_allclose(t1, t2, atol=2.5e-2)


def test_table_update_auto_resolves_scatter_on_cpu():
    """'auto' (the default) picks the pallas kernel only on a real TPU;
    on CPU it resolves to scatter (interpret-mode kernels have no perf
    benefit and would slow the suite)."""
    kw = dict(task_name="mtl", model_name="sharedbottom", n_sparse=4,
              n_dense=2, hidden=(16, 8), tower=(8,), gate=(8,), epochs=1,
              batch_size=128, lr=3e-3, two_phase_embedding=True, vocab=400)
    for extra in ({}, {"table_update": "auto"}):
        cfg = make_config(**kw, **extra)
        layout, x, y, _ = make_data(cfg, n=200, seed=0, vocab=400)
        tr = Trainer(get_model("sharedbottom", layout, cfg), seed=0)
        assert tr.table_update == "scatter"


def test_table_update_headroom_resolution():
    """Fit-time Kp headroom check: explicit pallas on a too-small table
    raises with guidance; an auto-resolved choice silently falls back."""
    import pytest as _pytest

    kw = dict(task_name="mtl", model_name="sharedbottom", n_sparse=4,
              n_dense=2, hidden=(16, 8), tower=(8,), gate=(8,), epochs=1,
              batch_size=128, lr=3e-3, two_phase_embedding=True, vocab=50)
    cfg = make_config(**kw, table_update="pallas")  # 200 rows << Kp=512
    layout, x, y, _ = make_data(cfg, n=300, seed=0, vocab=50)
    tr = Trainer(get_model("sharedbottom", layout, cfg), seed=0).compile()
    with _pytest.raises(ValueError, match="physical table"):
        tr.fit(x, y, batch_size=128, epochs=1, verbose=0)

    # auto-resolved: downgrade instead of raising (simulate the TPU auto
    # choice, which the CPU constructor never makes)
    tr2 = Trainer(get_model("sharedbottom", layout, cfg), seed=0).compile()
    tr2._table_update_auto = True
    tr2.fit(x, y, batch_size=128, epochs=1, verbose=0)
    assert tr2.table_update == "scatter"
    assert np.isfinite(tr2.history[-1]["loss"])


def test_checkpoint_table_opt_layout_portable(tmp_path):
    """Checkpoints store the split (mu, nu) layout regardless of the
    runtime's packed choice, so a packed-mode run restores into a
    scatter-mode trainer (and back) bit-exactly."""
    from mmlrec_tpu.train.sparse_embedding import (
        SparseAdamPackedState,
        SparseAdamState,
        unpack_monu,
    )

    kw = dict(task_name="mtl", model_name="sharedbottom", n_sparse=4,
              n_dense=2, hidden=(16, 8), tower=(8,), gate=(8,), epochs=1,
              batch_size=64, lr=3e-3, two_phase_embedding=True, vocab=400,
              table_opt_dtype="bfloat16")
    cfg_p = make_config(**kw, table_update="pallas")
    layout, x, y, _ = make_data(cfg_p, n=128, seed=0, vocab=400)
    tr = Trainer(get_model("sharedbottom", layout, cfg_p), seed=0).compile()
    tr.fit(x, y, batch_size=64, epochs=1, verbose=0)
    assert isinstance(tr._train_state["table_opt"], SparseAdamPackedState)
    path = tr.save_training_state(str(tmp_path))

    # restore into a scatter-mode trainer (e.g. resuming on CPU)
    cfg_s = make_config(**kw)
    layout2, x2, y2, _ = make_data(cfg_s, n=128, seed=0, vocab=400)
    tr2 = Trainer(get_model("sharedbottom", layout2, cfg_s), seed=0).compile()
    tr2.fit(x2, y2, batch_size=64, epochs=2, verbose=0, resume_from=path)
    st = tr2._train_state["table_opt"]
    assert isinstance(st, SparseAdamState)
    # restore into a packed-mode trainer round-trips bit-exactly
    tr3 = Trainer(get_model("sharedbottom", layout, cfg_p), seed=0).compile()
    tr3.fit(x, y, batch_size=64, epochs=2, verbose=0, resume_from=path)
    st3 = tr3._train_state["table_opt"]
    # after one more epoch both trained further; check the RESTORED layouts
    # via a direct roundtrip instead:
    from mmlrec_tpu.train.sparse_embedding import to_runtime_state, to_split_state
    split = to_split_state(tr._train_state["table_opt"])
    back = to_runtime_state(split, packed=True)
    np.testing.assert_array_equal(
        np.asarray(back.monu), np.asarray(tr._train_state["table_opt"].monu))


def test_two_phase_unique_monu_gather_pallas_matches_xla():
    """monu_gather='pallas' (HBM row-DMA kernel, genuine interpreter)
    reproduces the XLA take bitwise inside the packed two-phase update.
    K=256 so the kernel's K %% 256 == 0 routing constraint is met."""
    from mmlrec_tpu.train.sparse_embedding import (
        batch_step_metadata,
        two_phase_sparse_adam_unique,
    )

    V, D, P, K = 1024, 4, 2, 256
    rng = np.random.default_rng(5)
    packed = jnp.asarray(rng.normal(size=(V // P, P * D)), jnp.float32)
    flat_ids = rng.integers(0, 64, K).astype(np.int64)  # heavy duplicates
    g_rows = jnp.asarray(rng.normal(size=(K, D)), jnp.float32)
    inv, rep, pids, pinv, nuniq, prep = batch_step_metadata(
        flat_ids[None, :], P, V // P, chunk=8)
    state0 = init_sparse_adam(packed, dtype=jnp.bfloat16, packed=True)
    # one warm step so monu is non-zero (the gather has real payloads)
    args = (jnp.asarray(flat_ids, jnp.int32), jnp.asarray(inv[0]),
            jnp.asarray(rep[0]), jnp.asarray(pids[0]), jnp.asarray(pinv[0]))
    kw = dict(lr=0.05, pack_factor=P, use_pallas=True,
              n_real=jnp.asarray(nuniq[0]), prep=jnp.asarray(prep[0]))
    t1, s1 = two_phase_sparse_adam_unique(
        packed, g_rows, *args, state0, interpret=True, **kw)
    # xla column rides the pure-JAX reference path (pinned equal to the
    # genuine interpreter elsewhere) so only ONE slow interpreted write
    # kernel runs; the pallas column interprets the gather for real
    outs = {
        "xla": two_phase_sparse_adam_unique(
            t1, g_rows, *args, s1, interpret=True, monu_gather="xla", **kw),
        "pallas": two_phase_sparse_adam_unique(
            t1, g_rows, *args, s1, interpret="pallas", monu_gather="pallas",
            **kw),
    }
    np.testing.assert_array_equal(
        np.asarray(outs["pallas"][0]), np.asarray(outs["xla"][0]))
    np.testing.assert_array_equal(
        np.asarray(outs["pallas"][1].monu), np.asarray(outs["xla"][1].monu))


def test_trainer_table_container_stacked_matches_split():
    """table_container='stacked' (moment container folded into a [2Vp, W]
    table param + dual strided-write kernel) reproduces the split pallas
    path bitwise: top half == split table, bottom half == split monu."""
    from mmlrec_tpu.train.sparse_embedding import SparseAdamFoldedState

    kw = dict(task_name="mtl", model_name="sharedbottom", n_sparse=4,
              n_dense=2, hidden=(16, 8), tower=(8,), gate=(8,), epochs=2,
              batch_size=64, lr=3e-3, two_phase_embedding=True, vocab=400,
              table_update="pallas", table_opt_dtype="bfloat16")
    outs = {}
    for container in ("split", "stacked"):
        cfg = make_config(**kw, table_container=container)
        layout, x, y, _ = make_data(cfg, n=320, seed=0, vocab=400)
        model = get_model("sharedbottom", layout, cfg)
        tr = Trainer(model, seed=0).compile()
        tr.fit(x, y, batch_size=64, epochs=2, verbose=0)
        outs[container] = tr
    split_t = np.asarray(
        outs["split"].variables["params"]["embeddings"]["fused"]["table"])
    split_monu = np.asarray(outs["split"]._train_state["table_opt"].monu)
    fat = np.asarray(
        outs["stacked"].variables["params"]["embeddings"]["fused"]["table"])
    assert isinstance(
        outs["stacked"]._train_state["table_opt"], SparseAdamFoldedState)
    Vp = fat.shape[0] // 2
    assert Vp == split_t.shape[0]
    np.testing.assert_array_equal(fat[:Vp], split_t)
    np.testing.assert_array_equal(fat[Vp:], split_monu)
    # predictions from the fat leaf match the split model's
    cfg = make_config(**kw, table_container="split")
    layout, x, y, _ = make_data(cfg, n=320, seed=0, vocab=400)
    p1 = np.asarray(outs["split"].predict(x, 64))
    p2 = np.asarray(outs["stacked"].predict(x, 64))
    np.testing.assert_array_equal(p1, p2)


def test_stacked_container_checkpoint_resume(tmp_path):
    """A stacked-container run checkpoints (moments ride inside the fat
    params leaf) and resumes into another stacked trainer with identical
    continued training vs an uninterrupted run."""
    kw = dict(task_name="mtl", model_name="sharedbottom", n_sparse=4,
              n_dense=2, hidden=(16, 8), tower=(8,), gate=(8,), epochs=2,
              batch_size=64, lr=3e-3, two_phase_embedding=True, vocab=400,
              table_update="pallas", table_opt_dtype="bfloat16",
              table_container="stacked")
    cfg = make_config(**kw)
    layout, x, y, _ = make_data(cfg, n=256, seed=0, vocab=400)

    # uninterrupted 2-epoch run (no shuffle so the resumed rng stream
    # does not need replaying)
    tr_full = Trainer(get_model("sharedbottom", layout, cfg), seed=0).compile()
    tr_full.fit(x, y, batch_size=64, epochs=2, shuffle=False, verbose=0)

    tr1 = Trainer(get_model("sharedbottom", layout, cfg), seed=0).compile()
    tr1.fit(x, y, batch_size=64, epochs=1, shuffle=False, verbose=0)
    path = tr1.save_training_state(str(tmp_path))
    tr2 = Trainer(get_model("sharedbottom", layout, cfg), seed=0).compile()
    tr2.fit(x, y, batch_size=64, epochs=2, shuffle=False, verbose=0,
            resume_from=path)
    a = np.asarray(tr_full.variables["params"]["embeddings"]["fused"]["table"])
    b = np.asarray(tr2.variables["params"]["embeddings"]["fused"]["table"])
    np.testing.assert_array_equal(a, b)


def test_dedup_route_gather_matches_scatter():
    """dedup_route='gather' (designated-contributor gather + residual
    scatter) reproduces the full-scatter accumulation BITWISE on both the
    split-packed and stacked-container pallas paths, duplicates included."""
    kw = dict(task_name="mtl", model_name="sharedbottom", n_sparse=4,
              n_dense=2, hidden=(16, 8), tower=(8,), gate=(8,), epochs=2,
              batch_size=64, lr=3e-3, two_phase_embedding=True, vocab=80,
              table_update="pallas", table_opt_dtype="bfloat16")
    for container in ("split", "stacked"):
        tables = {}
        for route in ("scatter", "gather"):
            cfg = make_config(**kw, table_container=container,
                              dedup_route=route)
            # small vocab -> heavy duplicate ids within every batch
            layout, x, y, _ = make_data(cfg, n=320, seed=0, vocab=80)
            model = get_model("sharedbottom", layout, cfg)
            tr = Trainer(model, seed=0).compile()
            assert tr.dedup_route == route
            tr.fit(x, y, batch_size=64, epochs=2, verbose=0)
            tables[route] = np.asarray(
                tr.variables["params"]["embeddings"]["fused"]["table"])
        np.testing.assert_array_equal(tables["gather"], tables["scatter"])


def test_resolve_table_container(monkeypatch):
    """main.py's pre-model-build auto opt-in to the stacked container:
    engages only for two_phase + pallas-eligible + bf16 + headroom + TPU
    (platform mocked); never overrides an explicit setting."""
    from mmlrec_tpu.train import resolve_table_container

    def cfg_layout(**kw):
        base = dict(task_name="mtl", model_name="sharedbottom", n_sparse=4,
                    n_dense=2, hidden=(16, 8), tower=(8,), gate=(8,),
                    batch_size=64, vocab=70000)
        base.update(kw)
        vocab = base.pop("vocab")
        cfg = make_config(**base)
        layout, *_ = make_data(cfg, n=8, seed=0, vocab=vocab)
        return cfg, layout

    class _Dev:
        platform = "tpu"

    # positive: all conditions hold (mocked TPU)
    monkeypatch.setattr(jax, "devices", lambda *a, **k: [_Dev()])
    cfg, layout = cfg_layout(two_phase_embedding=True,
                             table_opt_dtype="bfloat16")
    resolve_table_container(cfg, layout)
    assert cfg.model_config.extra["table_container"] == "stacked"

    # explicit user setting wins
    cfg, layout = cfg_layout(two_phase_embedding=True,
                             table_opt_dtype="bfloat16",
                             table_container="split")
    resolve_table_container(cfg, layout)
    assert cfg.model_config.extra["table_container"] == "split"

    # each missing condition keeps it unset
    for kw in (dict(),                                  # no two_phase
               dict(two_phase_embedding=True),          # f32 moments
               dict(two_phase_embedding=True,
                    table_opt_dtype="bfloat16",
                    table_update="scatter"),            # scatter pinned
               dict(two_phase_embedding=True,
                    table_opt_dtype="bfloat16",
                    vocab=40)):                         # no headroom
        cfg, layout = cfg_layout(**kw)
        resolve_table_container(cfg, layout)
        assert cfg.model_config.extra.get("table_container") is None, kw

    # CPU platform -> no-op
    monkeypatch.undo()
    cfg, layout = cfg_layout(two_phase_embedding=True,
                             table_opt_dtype="bfloat16")
    resolve_table_container(cfg, layout)
    assert cfg.model_config.extra.get("table_container") is None

def test_route_r_cap_quantized_and_monotone():
    """The gather-route residual capacity is quantized to 256*2^k and
    honors a caller-supplied monotone floor, so the resid shapes (and the
    jitted step program specialized on them) stay stable across epochs /
    streaming batches instead of retracing whenever the max duplicate
    count crosses a 256 boundary (ADVICE r3, medium)."""
    from mmlrec_tpu.train.sparse_embedding import batch_step_metadata

    rng = np.random.default_rng(0)
    K, P, V = 512, 2, 4096

    def r_cap(ids, r_cap_min=0):
        meta = batch_step_metadata(
            ids, P, V, want_route=True, r_cap_min=r_cap_min)
        accperm, resid_pos, resid_slot = meta[6:9]
        assert resid_pos.shape == resid_slot.shape
        return resid_pos.shape[1]

    # few duplicates -> minimum cap
    ids = rng.permutation(4000)[:K][None, :].astype(np.int64)
    assert r_cap(ids) == 256

    # ~384 residuals would previously produce a 512-cap; the quantum is
    # the same here but 700 residuals must jump to 1024, not 768
    ids_dup = rng.integers(0, 90, (1, K)).astype(np.int64)  # heavy dups
    # resid lists only possibly-nonzero contributors: logical-first &
    # ~physical-first (round-4 zipf pruning, probe_zipf_contention.py)
    n_resid = len(np.unique(ids_dup)) - len(np.unique(ids_dup // P))
    cap = r_cap(ids_dup)
    assert cap >= n_resid and cap in (256, 512, 1024)
    assert cap & (cap - 1) == 0  # power of two

    # monotone floor wins over the computed need
    assert r_cap(ids, r_cap_min=cap) == cap

    # Trainer tracks the largest cap seen and passes it back
    cfg = make_config(task_name="mtl", model_name="sharedbottom", n_sparse=4,
                      n_dense=2, hidden=(8,), tower=(4,), gate=(4,),
                      batch_size=64, lr=3e-3, two_phase_embedding=True,
                      vocab=400, table_update="pallas",
                      table_opt_dtype="bfloat16")
    layout, x, y, _ = make_data(cfg, n=256, seed=0, vocab=400)
    tr = Trainer(get_model("sharedbottom", layout, cfg), seed=0).compile()
    assert tr.dedup_route == "gather"
    tr._route_r_cap = 512
    offs = np.asarray(tr._fused_offsets)[None, :]
    flat = (np.asarray(tr.pack_inputs(x)[0][:64]).astype(np.int64)
            + offs).reshape(1, -1)
    meta = tr._step_metadata(flat)
    assert meta[7].shape[1] == 512  # floor honored
    assert tr._route_r_cap == 512


def test_stacked_checkpoint_restores_into_split_trainer(tmp_path):
    """save_training_state writes the platform-independent SPLIT layout
    even for stacked-container runs (fat param sliced, bf16 moment pairs
    unpacked), so the checkpoint restores into a split-configured trainer
    — and a split checkpoint refolds into a stacked one (ADVICE r3)."""
    kw = dict(task_name="mtl", model_name="sharedbottom", n_sparse=4,
              n_dense=2, hidden=(16, 8), tower=(8,), gate=(8,), epochs=2,
              batch_size=64, lr=3e-3, two_phase_embedding=True, vocab=400,
              table_update="pallas", table_opt_dtype="bfloat16")
    data_kw = dict(n=256, seed=0, vocab=400)

    def make_trainer(container):
        cfg = make_config(**kw, table_container=container)
        layout, x, y, _ = make_data(cfg, **data_kw)
        tr = Trainer(get_model("sharedbottom", layout, cfg), seed=0).compile()
        return tr, x, y

    # full uninterrupted runs in both containers (pinned equal elsewhere)
    tr_full, x, y = make_trainer("split")
    tr_full.fit(x, y, batch_size=64, epochs=2, shuffle=False, verbose=0)

    for src, dst in (("stacked", "split"), ("split", "stacked")):
        tr1, x, y = make_trainer(src)
        tr1.fit(x, y, batch_size=64, epochs=1, shuffle=False, verbose=0)
        path = tr1.save_training_state(str(tmp_path / f"{src}_to_{dst}"))
        tr2, x, y = make_trainer(dst)
        tr2.fit(x, y, batch_size=64, epochs=2, shuffle=False, verbose=0,
                resume_from=path)
        got = np.asarray(
            tr2.variables["params"]["embeddings"]["fused"]["table"])
        want = np.asarray(
            tr_full.variables["params"]["embeddings"]["fused"]["table"])
        if dst == "stacked":
            got = got[: got.shape[0] // 2]
        np.testing.assert_array_equal(got, want, err_msg=f"{src}->{dst}")


def test_stacked_auto_demotes_on_fit_batch_headroom(monkeypatch):
    """A larger-than-config fit() batch that breaks the unique-metadata
    headroom demotes an AUTO-engaged stacked container back to split +
    scatter with a warning, instead of crashing after model construction
    (ADVICE r3).  An EXPLICIT stacked setting still raises."""
    import warnings

    import pytest

    from mmlrec_tpu.train import resolve_table_container

    # emb=128, P=1 satisfies the 128-lane condition without a huge vocab:
    # total vocab 4*400=1600 -> 1664 physical rows
    base = dict(task_name="mtl", model_name="sharedbottom", n_sparse=4,
                n_dense=2, emb=128, hidden=(8,), tower=(4,), gate=(4,),
                batch_size=16, lr=3e-3, two_phase_embedding=True,
                table_opt_dtype="bfloat16")

    class _Dev:
        platform = "tpu"

    monkeypatch.setattr(jax, "devices", lambda *a, **k: [_Dev()])
    cfg = make_config(**base)
    layout, x, y, _ = make_data(cfg, n=1024, seed=0, vocab=400)
    # headroom holds at the config batch (16*4=64 ids -> Kp=256 < 1664)
    resolve_table_container(cfg, layout)
    assert cfg.model_config.extra["table_container"] == "stacked"
    assert cfg.model_config.extra.get("_table_container_auto")

    # construction must also see "TPU" so auto table_update resolves to
    # pallas (the real-hardware scenario); undo before fit so the actual
    # CPU training below uses real devices — the demotion happens before
    # any pallas kernel would run
    model = get_model("sharedbottom", layout, cfg)
    tr = Trainer(model, seed=0).compile()
    monkeypatch.undo()
    assert tr.table_update == "pallas" and tr.table_container == "stacked"
    # library caller fits with a batch far above the config's: 512*4=2048
    # ids -> Kp=2048 >= 1664 physical rows -> headroom broken
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        tr.fit(x, y, batch_size=512, epochs=1, shuffle=False, verbose=0)
    assert any("demoting" in str(wi.message) for wi in w)
    assert tr.table_container == "split"
    assert tr.table_update == "scatter"
    assert cfg.model_config.extra["table_container"] == "split"
    # the run actually trained (params exist in the split shape)
    t = tr.variables["params"]["embeddings"]["fused"]["table"]
    assert t.shape[0] == 1664  # split layout, not the fat 2*1664

    # explicit stacked: raises with the container named
    cfg2 = make_config(**base, table_container="stacked",
                       table_update="pallas")
    layout2, x2, y2, _ = make_data(cfg2, n=1024, seed=0, vocab=400)
    model2 = get_model("sharedbottom", layout2, cfg2)
    tr2 = Trainer(model2, seed=0).compile()
    with pytest.raises(ValueError, match="stacked"):
        tr2.fit(x2, y2, batch_size=512, epochs=1, verbose=0)

def test_monu_pack_bit_layout():
    """The same-shape integer pack/unpack forms (round 4) are bit-identical
    to the original shape-changing bitcast forms, so containers written by
    either are interchangeable (checkpoints, resumed runs)."""
    from mmlrec_tpu.train.sparse_embedding import (
        pack_monu,
        pack_monu_rounded,
        unpack_monu,
        unpack_monu_f32,
    )

    rng = np.random.default_rng(0)
    mu = jnp.asarray(rng.normal(size=(16, 8)), jnp.float32)
    nu = jnp.asarray(np.abs(rng.normal(size=(16, 8))), jnp.float32)

    # original forms, inlined as the reference
    def pack_ref(mu_bf16, nu_bf16):
        return jax.lax.bitcast_convert_type(
            jnp.stack([mu_bf16.astype(jnp.bfloat16),
                       nu_bf16.astype(jnp.bfloat16)], axis=-1),
            jnp.float32,
        )

    def unpack_ref(container):
        pairs = jax.lax.bitcast_convert_type(container, jnp.bfloat16)
        return pairs[..., 0], pairs[..., 1]

    c_ref = pack_ref(mu, nu)
    c_new = pack_monu(mu.astype(jnp.bfloat16), nu.astype(jnp.bfloat16))
    np.testing.assert_array_equal(
        np.asarray(c_ref).view(np.uint32), np.asarray(c_new).view(np.uint32))
    np.testing.assert_array_equal(
        np.asarray(c_ref).view(np.uint32),
        np.asarray(pack_monu_rounded(mu, nu)).view(np.uint32))

    mu_r, nu_r = unpack_ref(c_ref)
    mu_n, nu_n = unpack_monu(c_ref)
    np.testing.assert_array_equal(np.asarray(mu_r), np.asarray(mu_n))
    np.testing.assert_array_equal(np.asarray(nu_r), np.asarray(nu_n))

    # f32 direct unpack == bf16 unpack + astype(f32), bitwise
    mu_f, nu_f = unpack_monu_f32(c_ref)
    np.testing.assert_array_equal(
        np.asarray(mu_r.astype(jnp.float32)), np.asarray(mu_f))
    np.testing.assert_array_equal(
        np.asarray(nu_r.astype(jnp.float32)), np.asarray(nu_f))

def test_route_bitwise_at_pack_factor_16():
    """Function-level bitwise pin of the FULL route stack (accperm/resid +
    routed g_sum) at a production-like pack factor (P=16), heavy
    duplicates included.  The trainer-level pin (vocab 80) covers P=1;
    at P>1 trainer-LEVEL comparisons can differ by ULPs because XLA may
    compile the f32 sqrt/divide chain differently between the two
    programs (extra route inputs change fusion decisions) — the route
    MATH itself is exact, which is what this pins."""
    from mmlrec_tpu.train.sparse_embedding import (
        SparseAdamFoldedState,
        batch_step_metadata,
        two_phase_sparse_adam_unique,
    )

    P, D, K, Vp = 16, 8, 512, 1024
    rng = np.random.default_rng(7)
    fat = jnp.asarray(rng.normal(size=(2 * Vp, P * D)), jnp.float32)
    flat_ids = rng.integers(0, Vp * P, K).astype(np.int64)
    flat_ids[:50] = flat_ids[0]  # heavy duplicates of one logical id
    flat_ids[50:60] = flat_ids[0] + 1  # same PHYSICAL row, other lanes
    g_rows = jnp.asarray(rng.normal(size=(K, D)), jnp.float32)
    meta = batch_step_metadata(flat_ids[None, :], P, Vp, chunk=8,
                               want_route=True)
    (inv, rep, pids, pinv, nuniq, prep, accperm, resid_pos, resid_slot,
     gdup_pos, gdup_tgt) = (jnp.asarray(a[0]) for a in meta)
    st = SparseAdamFoldedState(count=jnp.zeros((), jnp.int32))
    common = dict(lr=0.05, pack_factor=P, use_pallas=True, interpret=True,
                  n_real=nuniq, prep=prep, chunk=8)
    args = (fat, g_rows, jnp.asarray(flat_ids, jnp.int32), inv, rep, pids,
            pinv, st)
    t_scatter, _ = two_phase_sparse_adam_unique(*args, **common)
    t_route, _ = two_phase_sparse_adam_unique(
        *args, accperm=accperm, resid_pos=resid_pos, resid_slot=resid_slot,
        gdup_pos=gdup_pos, gdup_tgt=gdup_tgt, **common)
    np.testing.assert_array_equal(
        np.asarray(t_scatter).view(np.uint32),
        np.asarray(t_route).view(np.uint32))

    # the two gradient-dedup forms agree bitwise at every CONSUMED
    # (first-occurrence) position
    gs_old = jnp.zeros_like(g_rows).at[inv].add(g_rows)
    gs_new = g_rows.at[gdup_tgt].add(g_rows[gdup_pos], mode="drop")
    m = np.asarray(rep) > 0
    np.testing.assert_array_equal(
        np.asarray(gs_old)[m].view(np.uint32),
        np.asarray(gs_new)[m].view(np.uint32))


def test_trainer_update_space_slot_matches_position():
    """update_space='slot' (slot-space pair-gather + one-plane route +
    slot-granularity wide-lane Adam, two_phase_sparse_adam_slot) is
    BITWISE equal to the position-space stacked path — heavy-duplicate
    data (vocab 80) exercises the routed gradients and residuals."""
    kw = dict(task_name="mtl", model_name="sharedbottom", n_sparse=4,
              n_dense=2, hidden=(16, 8), tower=(8,), gate=(8,), epochs=2,
              batch_size=64, lr=3e-3, two_phase_embedding=True, vocab=80,
              table_update="pallas", table_opt_dtype="bfloat16",
              table_container="stacked", dedup_route="gather")
    outs = {}
    for space in ("position", "slot"):
        cfg = make_config(**kw, update_space=space)
        layout, x, y, _ = make_data(cfg, n=320, seed=0, vocab=80)
        model = get_model("sharedbottom", layout, cfg)
        tr = Trainer(model, seed=0).compile()
        assert tr.update_space == space
        tr.fit(x, y, batch_size=64, epochs=2, verbose=0)
        outs[space] = tr
    a = np.asarray(
        outs["position"].variables["params"]["embeddings"]["fused"]["table"])
    b = np.asarray(
        outs["slot"].variables["params"]["embeddings"]["fused"]["table"])
    np.testing.assert_array_equal(a, b)
    cfg = make_config(**kw, update_space="slot")
    layout, x, y, _ = make_data(cfg, n=320, seed=0, vocab=80)
    p1 = np.asarray(outs["position"].predict(x, 64))
    p2 = np.asarray(outs["slot"].predict(x, 64))
    np.testing.assert_array_equal(p1, p2)


def test_trainer_update_space_slot_validation():
    """update_space='slot' validates its prerequisites."""
    kw = dict(task_name="mtl", model_name="sharedbottom", n_sparse=4,
              n_dense=2, hidden=(16, 8), tower=(8,), gate=(8,),
              batch_size=64, lr=3e-3, two_phase_embedding=True, vocab=80,
              table_update="pallas", table_opt_dtype="bfloat16")
    cfg = make_config(**kw, update_space="slot", table_container="split")
    layout, x, y, _ = make_data(cfg, n=128, seed=0, vocab=80)
    with pytest.raises(ValueError, match="stacked"):
        Trainer(get_model("sharedbottom", layout, cfg), seed=0).compile()
    cfg = make_config(**kw, update_space="bogus")
    with pytest.raises(ValueError, match="position|slot"):
        Trainer(get_model("sharedbottom", layout, cfg), seed=0).compile()


def test_trainer_update_space_auto_resolution():
    """update_space='auto' (the default) resolves from the first metadata
    batch's physical duplication: heavy-duplicate data -> slot, near-unique
    -> position; sticky once resolved."""
    kw = dict(task_name="mtl", model_name="sharedbottom", n_sparse=4,
              n_dense=2, hidden=(16, 8), tower=(8,), gate=(8,),
              batch_size=64, lr=3e-3, two_phase_embedding=True,
              table_update="pallas", table_opt_dtype="bfloat16",
              table_container="stacked", dedup_route="gather")
    # vocab 80: 64*4 ids over 320 rows -> heavy duplication -> slot
    cfg = make_config(**kw, vocab=80)
    layout, x, y, _ = make_data(cfg, n=192, seed=0, vocab=80)
    tr = Trainer(get_model("sharedbottom", layout, cfg), seed=0).compile()
    assert tr.update_space == "auto"
    tr.fit(x, y, batch_size=64, epochs=1, verbose=0)
    assert tr.update_space == "slot"
    assert np.isfinite(tr.history[-1]["loss"])

    # huge vocab -> near-unique batches -> position
    cfg = make_config(**kw, vocab=50000)
    layout, x, y, _ = make_data(cfg, n=192, seed=0, vocab=50000)
    tr = Trainer(get_model("sharedbottom", layout, cfg), seed=0).compile()
    tr.fit(x, y, batch_size=64, epochs=1, verbose=0)
    assert tr.update_space == "position"

    # split container: auto falls back to position
    cfg = make_config(**{**kw, "table_container": "split"}, vocab=80)
    layout, x, y, _ = make_data(cfg, n=192, seed=0, vocab=80)
    tr = Trainer(get_model("sharedbottom", layout, cfg), seed=0).compile()
    tr.fit(x, y, batch_size=64, epochs=1, verbose=0)
    assert tr.update_space == "position"


def test_native_step_metadata_matches_numpy():
    """The single-pass C++ metadata kernel (native/step_metadata.cpp) is
    output-identical to the numpy formulation across uniform / zipfian /
    degenerate duplicate structures, caps and floors included."""
    pytest.importorskip("ctypes")
    from mmlrec_tpu.train.sparse_embedding import batch_step_metadata

    try:
        from mmlrec_tpu.native import get_meta_lib

        get_meta_lib()
    except Exception:
        pytest.skip("native toolchain unavailable")

    rng = np.random.default_rng(0)
    K, P, V = 512, 4, 4096
    cases = {
        "uniform": rng.integers(0, V, (3, K)),
        "heavy": rng.integers(0, 60, (2, K)),
        "zipfish": (rng.zipf(1.2, (2, K)) - 1) % V,
        "all_same": np.full((1, K), 7),
        "all_unique": rng.permutation(V)[:K][None, :],
    }
    for name, ids in cases.items():
        ids = ids.astype(np.int64)
        for want_route in (False, True):
            for r_cap_min in (0, 512):
                a = batch_step_metadata(
                    ids, P, V, want_route=want_route, r_cap_min=r_cap_min,
                    use_native=False)
                b = batch_step_metadata(
                    ids, P, V, want_route=want_route, r_cap_min=r_cap_min,
                    use_native=True)
                assert len(a) == len(b), name
                for i, (x, y) in enumerate(zip(a, b)):
                    np.testing.assert_array_equal(
                        np.asarray(x), np.asarray(y),
                        err_msg=f"{name} route={want_route} "
                                f"floor={r_cap_min} out[{i}]")
