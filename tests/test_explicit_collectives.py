"""Explicit shard_map collective embedding path (parallel/shard_embedding.py,
parallel/explicit_step.py) on the 8-way virtual CPU mesh: primitive-level
equality with the dense formulations and full-train-step equality with the
single-device two-phase step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from mmlrec_tpu.models import get_model
from mmlrec_tpu.parallel import create_mesh
from mmlrec_tpu.parallel.shard_embedding import (
    owned_gather,
    owned_scatter_add,
    sharded_two_phase_sparse_adam,
)
from mmlrec_tpu.synthetic import make_config, make_data
from mmlrec_tpu.train import Trainer
from mmlrec_tpu.train.sparse_embedding import (
    SparseAdamState,
    batch_dedup_metadata,
    gather_rows,
    init_sparse_adam,
    two_phase_sparse_adam,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def _mesh1d(n=8):
    return jax.sharding.Mesh(np.asarray(jax.devices()[:n]), ("model",))


def _shard_rows(mesh, x):
    return jax.device_put(x, NamedSharding(mesh, P("model", *[None] * (x.ndim - 1))))


@pytest.mark.parametrize("pack_factor", [1, 4])
def test_owned_gather_matches_dense(pack_factor):
    mesh = _mesh1d()
    rng = np.random.default_rng(0)
    dim = 8
    rows_phys, cols = 64, dim * pack_factor  # 64 physical rows over 8 devices
    table = jnp.asarray(rng.normal(size=(rows_phys, cols)), jnp.float32)
    n_logical = rows_phys * pack_factor
    ids = jnp.asarray(rng.integers(0, n_logical, 37), jnp.int32)

    want = gather_rows(table, ids, dim, pack_factor)
    got = jax.jit(
        jax.shard_map(
            lambda t, i: owned_gather(t, i, dim, pack_factor),
            mesh=mesh, in_specs=(P("model", None), P()), out_specs=P(),
            check_vma=False,
        )
    )(_shard_rows(mesh, table), ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


@pytest.mark.parametrize("pack_factor", [1, 4])
def test_owned_scatter_add_matches_dense(pack_factor):
    mesh = _mesh1d()
    rng = np.random.default_rng(1)
    dim = 8
    rows_phys, cols = 64, dim * pack_factor
    table = jnp.asarray(rng.normal(size=(rows_phys, cols)), jnp.float32)
    n_logical = rows_phys * pack_factor
    # unique ids (scatter-add order under duplicates is the caller's concern)
    ids = jnp.asarray(rng.permutation(n_logical)[:37].astype(np.int32))
    delta = jnp.asarray(rng.normal(size=(37, dim)), jnp.float32)

    from mmlrec_tpu.train.sparse_embedding import _scatter_add_rows

    want = _scatter_add_rows(table, ids, delta, pack_factor)
    got = jax.jit(
        jax.shard_map(
            lambda t, i, d: owned_scatter_add(t, i, d, pack_factor),
            mesh=mesh, in_specs=(P("model", None), P(), P()),
            out_specs=P("model", None), check_vma=False,
        )
    )(_shard_rows(mesh, table), ids, delta)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


@pytest.mark.parametrize("pack_factor,mdt", [(1, None), (4, None), (1, "bfloat16")])
def test_sharded_sparse_adam_matches_dense(pack_factor, mdt):
    mesh = _mesh1d()
    rng = np.random.default_rng(2)
    dim = 8
    rows_phys, cols = 64, dim * pack_factor
    table = jnp.asarray(rng.normal(size=(rows_phys, cols)), jnp.float32)
    n_logical = rows_phys * pack_factor
    K = 48
    flat = rng.integers(0, n_logical, (1, K))  # duplicates likely
    inv, rep = batch_dedup_metadata(flat)
    flat_ids = jnp.asarray(flat[0], jnp.int32)
    inv, rep = jnp.asarray(inv[0]), jnp.asarray(rep[0])
    g_rows = jnp.asarray(rng.normal(size=(K, dim)), jnp.float32)
    state = init_sparse_adam(table, dtype=mdt)
    # a couple of warm steps so moments are nonzero
    t1, s1 = two_phase_sparse_adam(table, g_rows, flat_ids, inv, rep, state,
                                   lr=1e-2, pack_factor=pack_factor)
    t2, s2 = two_phase_sparse_adam(t1, 0.5 * g_rows, flat_ids, inv, rep, s1,
                                   lr=1e-2, pack_factor=pack_factor)

    def sharded(t, mu, nu, cnt, g, f, iv, rp):
        st = SparseAdamState(mu=mu, nu=nu, count=cnt)
        nt, ns = sharded_two_phase_sparse_adam(
            t, g, f, iv, rp, st, lr=1e-2, pack_factor=pack_factor)
        return nt, ns.mu, ns.nu, ns.count

    rs = P("model", None)
    fn = jax.jit(jax.shard_map(
        sharded, mesh=mesh,
        in_specs=(rs, rs, rs, P(), P(), P(), P(), P()),
        out_specs=(rs, rs, rs, P()), check_vma=False,
    ))
    st, smu, snu, scnt = fn(_shard_rows(mesh, table), _shard_rows(mesh, state.mu),
                            _shard_rows(mesh, state.nu), state.count,
                            g_rows, flat_ids, inv, rep)
    st, smu, snu, scnt = fn(st, smu, snu, scnt, 0.5 * g_rows, flat_ids, inv, rep)
    np.testing.assert_allclose(np.asarray(st), np.asarray(t2), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(smu), np.asarray(s2.mu), rtol=1e-5,
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(snu), np.asarray(s2.nu), rtol=1e-5,
                               atol=1e-7)
    assert int(scnt) == int(s2.count) == 2


def _setup_two_phase(mesh, explicit):
    extra = {"two_phase_embedding": True}
    if explicit:
        extra["explicit_collective_embedding"] = True
    cfg = make_config(task_name="mtl", model_name="mmoe", n_sparse=4,
                      n_dense=2, hidden=(16, 8), tower=(8,), gate=(8,),
                      batch_size=64, lr=3e-3, **extra)
    layout, x, y, _ = make_data(cfg, n=512, seed=0)
    model = get_model("mmoe", layout, cfg)
    return Trainer(model, seed=0, mesh=mesh).compile(), x, y


def test_explicit_step_matches_single_device():
    """Full fit() through the explicit shard_map step == unsharded two-phase."""
    tr_single, x, y = _setup_two_phase(None, explicit=False)
    tr_single.fit(x, y, batch_size=64, epochs=2, verbose=0, shuffle=False)
    tr_exp, x2, y2 = _setup_two_phase(create_mesh(data=4, model=2),
                                      explicit=True)
    tr_exp.fit(x2, y2, batch_size=64, epochs=2, verbose=0, shuffle=False)
    p1 = tr_single.predict(x, batch_size=64)
    p2 = tr_exp.predict(x2, batch_size=64)
    np.testing.assert_allclose(p1, p2, rtol=2e-3, atol=2e-4)
    # table really is row-sharded over 'model' after training
    tbl = tr_exp._train_state["params"]["embeddings"]["fused"]["table"]
    spec = tbl.sharding.spec
    assert spec and spec[0] == "model"


def test_explicit_step_matches_gspmd_mesh():
    """Explicit collectives == GSPMD partitioning on the same mesh."""
    mesh = create_mesh(data=4, model=2)
    tr_g, x, y = _setup_two_phase(mesh, explicit=False)
    tr_g.fit(x, y, batch_size=64, epochs=1, verbose=0, shuffle=False)
    tr_e, x2, y2 = _setup_two_phase(create_mesh(data=4, model=2),
                                    explicit=True)
    tr_e.fit(x2, y2, batch_size=64, epochs=1, verbose=0, shuffle=False)
    p1 = tr_g.predict(x, batch_size=64)
    p2 = tr_e.predict(x2, batch_size=64)
    np.testing.assert_allclose(p1, p2, rtol=2e-3, atol=2e-4)


def test_explicit_step_msl_domain_mask():
    """msl regime (domain_mask present in the batch) through the explicit path."""
    extra = {"two_phase_embedding": True, "explicit_collective_embedding": True}
    cfg = make_config(task_name="msl", model_name="mmoe", n_sparse=4,
                      n_dense=2, hidden=(16, 8), tower=(8,), gate=(8,),
                      batch_size=64, lr=3e-3, **extra)
    layout, x, y, _ = make_data(cfg, n=256, seed=1)
    model = get_model("mmoe", layout, cfg)
    tr = Trainer(model, seed=0, mesh=create_mesh(data=4, model=2)).compile()
    tr.fit(x, y, batch_size=64, epochs=1, verbose=0, shuffle=False)
    assert np.isfinite(tr.history[-1]["loss"])


@pytest.mark.parametrize("mdt", [None, "bfloat16"])
def test_explicit_step_pallas_matches_scatter(mdt):
    """The sharded write-only-kernel update (table_update='pallas' +
    explicit collectives) matches the explicit scatter update through a
    full fit, for split-f32 and packed-bf16 moments."""
    def setup(pallas):
        extra = {"two_phase_embedding": True,
                 "explicit_collective_embedding": True}
        if pallas:
            extra["table_update"] = "pallas"
        if mdt:
            extra["table_opt_dtype"] = mdt
        # small shapes: interpret-mode pallas runs per-row Python loops
        cfg = make_config(task_name="mtl", model_name="mmoe", n_sparse=4,
                          n_dense=2, hidden=(16, 8), tower=(8,), gate=(8,),
                          batch_size=32, lr=3e-3, vocab=400, **extra)
        layout, x, y, _ = make_data(cfg, n=128, seed=0, vocab=400)
        model = get_model("mmoe", layout, cfg)
        return (
            Trainer(model, seed=0, mesh=create_mesh(data=2, model=4)).compile(),
            x, y,
        )

    tr_sc, x, y = setup(False)
    tr_sc.fit(x, y, batch_size=32, epochs=2, verbose=0, shuffle=False)
    tr_pl, x2, y2 = setup(True)
    tr_pl.fit(x2, y2, batch_size=32, epochs=2, verbose=0, shuffle=False)
    if mdt == "bfloat16":
        from mmlrec_tpu.train.sparse_embedding import SparseAdamPackedState

        assert isinstance(tr_pl._train_state["table_opt"], SparseAdamPackedState)
    p1 = tr_sc.predict(x, batch_size=32)
    p2 = tr_pl.predict(x2, batch_size=32)
    atol = 5e-3 if mdt == "bfloat16" else 2e-4
    np.testing.assert_allclose(p1, p2, rtol=2e-3, atol=atol)


@pytest.mark.parametrize("chunks", [2, 4])
def test_chunked_grad_exchange_matches_unchunked(chunks):
    """grad_exchange_chunks pipelines the row-cotangent all-gather in C
    tiles (scatter of tile c overlaps tile c+1's wire time) — numerics must
    match the single-all-gather exchange (f32 accumulation order inside the
    duplicate-reduction scatter may differ, hence allclose not bitwise)."""
    def setup(c):
        extra = {"two_phase_embedding": True,
                 "explicit_collective_embedding": True}
        if c > 1:
            extra["grad_exchange_chunks"] = c
        cfg = make_config(task_name="mtl", model_name="mmoe", n_sparse=4,
                          n_dense=2, hidden=(16, 8), tower=(8,), gate=(8,),
                          batch_size=64, lr=3e-3, **extra)
        layout, x, y, _ = make_data(cfg, n=256, seed=0)
        model = get_model("mmoe", layout, cfg)
        return (
            Trainer(model, seed=0, mesh=create_mesh(data=4, model=2)).compile(),
            x, y,
        )

    tr_1, x, y = setup(1)
    tr_1.fit(x, y, batch_size=64, epochs=2, verbose=0, shuffle=False)
    tr_c, x2, y2 = setup(chunks)
    tr_c.fit(x2, y2, batch_size=64, epochs=2, verbose=0, shuffle=False)
    p1 = tr_1.predict(x, batch_size=64)
    p2 = tr_c.predict(x2, batch_size=64)
    np.testing.assert_allclose(p1, p2, rtol=1e-4, atol=1e-6)


def test_chunked_grad_exchange_pallas():
    """Chunked exchange composes with the sharded write-only kernel."""
    extra = {"two_phase_embedding": True,
             "explicit_collective_embedding": True,
             "grad_exchange_chunks": 2, "table_update": "pallas"}
    cfg = make_config(task_name="mtl", model_name="mmoe", n_sparse=4,
                      n_dense=2, hidden=(16, 8), tower=(8,), gate=(8,),
                      batch_size=32, lr=3e-3, vocab=400, **extra)
    layout, x, y, _ = make_data(cfg, n=128, seed=0, vocab=400)
    model = get_model("mmoe", layout, cfg)
    tr = Trainer(model, seed=0, mesh=create_mesh(data=2, model=4)).compile()
    tr.fit(x, y, batch_size=32, epochs=1, verbose=0, shuffle=False)
    assert np.isfinite(tr.history[-1]["loss"])


def test_explicit_staged_fit_matches_streaming():
    """The explicit-collective step driven by the device-staged scan runner
    (shard_map inside jit/lax.scan) is bitwise the streaming per-batch
    explicit path."""
    tr_stream, x, y = _setup_two_phase(create_mesh(data=4, model=2),
                                       explicit=True)
    tr_stream._device_data_bytes_cap = 0  # force streaming
    tr_stream.fit(x, y, batch_size=64, epochs=2, verbose=0, shuffle=False)
    tr_staged, x2, y2 = _setup_two_phase(create_mesh(data=4, model=2),
                                         explicit=True)
    tr_staged.fit(x2, y2, batch_size=64, epochs=2, verbose=0, shuffle=False)
    assert any(
        k.startswith("scan_") or k == "gather_step"
        for k in tr_staged._step_fns
    ), list(tr_staged._step_fns)
    np.testing.assert_array_equal(
        tr_stream.predict(x, batch_size=64),
        tr_staged.predict(x2, batch_size=64),
    )
    tbl = tr_staged._train_state["params"]["embeddings"]["fused"]["table"]
    assert tbl.sharding.spec and tbl.sharding.spec[0] == "model"

def test_explicit_step_dedup_route_gather_matches_scatter():
    """Round-4 port of the gather-route dedup to the explicit-collective
    step (VERDICT r3 #2): the per-plane designated-contributor gather +
    residual accumulation reproduces the shard-local [Kp, 2W] scatter
    BITWISE on the 8-device virtual mesh (int32 payload adds commute),
    duplicates included (small vocab -> heavy in-batch duplicates)."""
    tables = {}
    for route in ("scatter", "gather"):
        extra = {"two_phase_embedding": True,
                 "explicit_collective_embedding": True,
                 "table_update": "pallas",
                 "table_opt_dtype": "bfloat16",
                 "dedup_route": route}
        cfg = make_config(task_name="mtl", model_name="mmoe", n_sparse=4,
                          n_dense=2, hidden=(16, 8), tower=(8,), gate=(8,),
                          batch_size=32, lr=3e-3, vocab=80, **extra)
        layout, x, y, _ = make_data(cfg, n=128, seed=0, vocab=80)
        model = get_model("mmoe", layout, cfg)
        tr = Trainer(model, seed=0, mesh=create_mesh(data=2, model=4)).compile()
        assert tr.dedup_route == route
        tr.fit(x, y, batch_size=32, epochs=2, verbose=0, shuffle=False)
        tables[route] = np.asarray(
            jax.device_get(
                tr._train_state["params"]["embeddings"]["fused"]["table"]))
    np.testing.assert_array_equal(tables["gather"], tables["scatter"])

@pytest.mark.parametrize("model_name", ["mssm", "star"])
def test_explicit_step_batch_stats_models(model_name):
    """Round-4 synced batch-norm under explicit collectives (VERDICT r3
    #5): BN layers psum their batch moments over 'data'
    (ops/layers.py bn_cross_replica_axis), so dnn_use_bn models — the
    reference's census/mssm and amazon/star configs — train on the
    explicit path and match the unsharded two-phase run.  Running batch
    stats must come back replicated and equal to the single-device ones."""
    def setup(mesh):
        extra = {"two_phase_embedding": True}
        if mesh is not None:
            extra["explicit_collective_embedding"] = True
        kw = dict(task_name="mtl", model_name=model_name, n_sparse=4,
                  n_dense=2, hidden=(16, 8), tower=(8,), gate=(8,),
                  batch_size=64, lr=3e-3, dnn_use_bn=True, **extra)
        if model_name == "star":
            kw["task_name"] = "msl"  # STAR is a domain model
        cfg = make_config(**kw)
        layout, x, y, _ = make_data(cfg, n=64, seed=0)
        model = get_model(model_name, layout, cfg)
        return Trainer(model, seed=0, mesh=mesh).compile(), x, y

    # ONE step, tight tolerance: per-step stats agree to ~1e-8; longer
    # runs amplify f32 reduction-order noise chaotically (BN divides by
    # sqrt(var) ~ the 1e-4 init scale, a ~1e4x amplifier per step)
    tr_s, x, y = setup(None)
    tr_s.fit(x, y, batch_size=64, epochs=1, verbose=0, shuffle=False)
    tr_e, x2, y2 = setup(create_mesh(data=4, model=2))
    tr_e.fit(x2, y2, batch_size=64, epochs=1, verbose=0, shuffle=False)
    # running statistics match the single-device run
    bs_s = jax.tree_util.tree_leaves(tr_s._train_state["batch_stats"])
    bs_e = jax.tree_util.tree_leaves(tr_e._train_state["batch_stats"])
    assert bs_s and len(bs_s) == len(bs_e)
    for a, b in zip(bs_s, bs_e):
        np.testing.assert_allclose(np.asarray(a), np.asarray(jax.device_get(b)),
                                   rtol=1e-5, atol=1e-6)
    # predictions: looser — backward through train-time BN divides by
    # sqrt(batch var) ~ the 1e-4 init scale, amplifying the psum
    # reduction-order noise into the first param update (the no-BN
    # equivalents in this file use the same 2e-3 band)
    p1 = tr_s.predict(x, batch_size=64)
    p2 = tr_e.predict(x2, batch_size=64)
    np.testing.assert_allclose(p1, p2, rtol=2e-3, atol=5e-4)


def test_explicit_step_dropout_matches_single_device():
    """Round-5 dropout under explicit collectives (VERDICT r4 #6): masks
    are drawn for the GLOBAL batch and row-sliced per shard
    (ops/layers.py dropout_global_batch), so a dnn_dropout>0 fit on the
    explicit path matches the unsharded two-phase run — bit-identical
    masks, psum reduction-order noise only."""
    def setup(mesh):
        extra = {"two_phase_embedding": True}
        if mesh is not None:
            extra["explicit_collective_embedding"] = True
        cfg = make_config(task_name="mtl", model_name="mmoe", n_sparse=4,
                          n_dense=2, hidden=(16, 8), tower=(8,), gate=(8,),
                          batch_size=64, lr=3e-3, dnn_dropout=0.3, **extra)
        layout, x, y, _ = make_data(cfg, n=256, seed=0)
        model = get_model("mmoe", layout, cfg)
        return Trainer(model, seed=0, mesh=mesh).compile(), x, y

    tr_s, x, y = setup(None)
    tr_s.fit(x, y, batch_size=64, epochs=2, verbose=0, shuffle=False)
    tr_e, x2, y2 = setup(create_mesh(data=4, model=2))
    tr_e.fit(x2, y2, batch_size=64, epochs=2, verbose=0, shuffle=False)
    p1 = tr_s.predict(x, batch_size=64)
    p2 = tr_e.predict(x2, batch_size=64)
    np.testing.assert_allclose(p1, p2, rtol=2e-3, atol=2e-4)
    # a WRONG dropout stream (e.g. per-shard masks) would diverge fast:
    # check the tables agree too
    t1 = np.asarray(tr_s._train_state["params"]["embeddings"]["fused"]["table"])
    t2 = np.asarray(
        jax.device_get(tr_e._train_state["params"]["embeddings"]["fused"]["table"]))
    np.testing.assert_allclose(t1, t2, rtol=1e-4, atol=1e-6)
