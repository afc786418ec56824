"""Stacked table+moment container on the explicit-collective mesh
(round 5, VERDICT r4 #1): shard-major layout helpers, bitwise primitive
parity with the single-chip folded/slot updates, and full-fit equality
through the explicit shard_map step on the 8-device virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from mmlrec_tpu.models import get_model
from mmlrec_tpu.parallel import create_mesh
from mmlrec_tpu.parallel.shard_embedding import (
    sharded_two_phase_sparse_adam_folded,
)
from mmlrec_tpu.synthetic import make_config, make_data
from mmlrec_tpu.train import Trainer
from mmlrec_tpu.train.sparse_embedding import (
    SparseAdamFoldedState,
    batch_step_metadata,
    fold_stacked_planes,
    split_stacked_planes,
    stacked_table_rows,
    two_phase_sparse_adam_slot,
    two_phase_sparse_adam_unique,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


@pytest.mark.parametrize("n_shards", [1, 2, 4, 8])
def test_fold_split_roundtrip_and_row_map(n_shards):
    rng = np.random.RandomState(0)
    Vp, W = 64, 16
    table = jnp.asarray(rng.rand(Vp, W).astype(np.float32))
    monu = jnp.asarray(rng.rand(Vp, W).astype(np.float32))
    fat = fold_stacked_planes(table, monu, n_shards)
    t2, m2 = split_stacked_planes(fat, n_shards)
    np.testing.assert_array_equal(np.asarray(t2), np.asarray(table))
    np.testing.assert_array_equal(np.asarray(m2), np.asarray(monu))
    # row map: fat[map(p)] == table[p] for every physical row
    p = jnp.arange(Vp)
    np.testing.assert_array_equal(
        np.asarray(fat[stacked_table_rows(p, Vp, n_shards)]),
        np.asarray(table),
    )
    # shard-locality: rows [d*2r, (d+1)*2r) are exactly [table_d; monu_d]
    r = Vp // n_shards
    for d in range(n_shards):
        blk = np.asarray(fat[d * 2 * r : (d + 1) * 2 * r])
        np.testing.assert_array_equal(blk[:r], np.asarray(table[d * r : (d + 1) * r]))
        np.testing.assert_array_equal(blk[r:], np.asarray(monu[d * r : (d + 1) * r]))


def _route_meta(flat, Vp, chunk=8):
    (inv, rep, pids, pinv, nuniq, prep, accperm, resid_pos, resid_slot,
     gdup_pos, gdup_tgt) = batch_step_metadata(
        flat, 1, Vp, chunk=chunk, want_route=True)
    to_j = lambda a: jnp.asarray(a[0])
    return dict(
        inv=to_j(inv), rep=to_j(rep), pids=to_j(pids), pinv=to_j(pinv),
        nuniq=to_j(nuniq), prep=to_j(prep), accperm=to_j(accperm),
        resid_pos=to_j(resid_pos), resid_slot=to_j(resid_slot),
        gdup_pos=to_j(gdup_pos), gdup_tgt=to_j(gdup_tgt),
    )


@pytest.mark.parametrize("update_space", ["position", "slot"])
def test_sharded_folded_update_matches_single_chip(update_space):
    """The mesh folded update runs the IDENTICAL per-lane op chain as the
    single-chip stacked path: untouched rows (pads included) come back
    bitwise unchanged, touched rows match to 1-2 ulp (the two programs
    compile separately, so XLA's FMA/fusion choices may differ per lane —
    measured exactly 1-2 ulp on CPU)."""
    from mmlrec_tpu.train.sparse_embedding import pack_monu

    mesh = jax.sharding.Mesh(np.asarray(jax.devices()[:8]), ("model",))
    n = 8
    rng = np.random.RandomState(3)
    Vp, W = 64, 16  # pack_factor 1, dim == W
    K = 48
    table = jnp.asarray(rng.randn(Vp, W).astype(np.float32) * 0.1)
    # realistic container: packed bf16 (mu, nu) pairs with nu >= 0
    monu = pack_monu(
        jnp.asarray(rng.randn(Vp, W).astype(np.float32) * 0.01).astype(jnp.bfloat16),
        jnp.asarray((rng.rand(Vp, W) * 1e-3).astype(np.float32)).astype(jnp.bfloat16),
    )
    flat = rng.randint(0, Vp, (1, K)).astype(np.int64)
    m = _route_meta(flat, Vp)
    flat_ids = jnp.asarray(flat[0].astype(np.int32))
    g_rows = jnp.asarray(rng.randn(K, W).astype(np.float32))
    state = SparseAdamFoldedState(count=jnp.asarray(2, jnp.int32))
    route = dict(accperm=m["accperm"], resid_pos=m["resid_pos"],
                 resid_slot=m["resid_slot"], gdup_pos=m["gdup_pos"],
                 gdup_tgt=m["gdup_tgt"])

    # single-chip reference (plane-major fat param)
    fat1 = jnp.concatenate([table, monu])
    if update_space == "slot":
        sup_slot = jnp.take(table, jnp.clip(m["pids"], 0, Vp - 1), axis=0)
        monu_slot = jnp.take(monu, jnp.clip(m["pids"], 0, Vp - 1), axis=0)
        want_fat, want_st = two_phase_sparse_adam_slot(
            fat1, g_rows, flat_ids, m["rep"], m["pids"], m["nuniq"],
            sup_slot, monu_slot, state, lr=1e-2, interpret=True, chunk=8,
            **route,
        )
    else:
        want_fat, want_st = two_phase_sparse_adam_unique(
            fat1, g_rows, flat_ids, m["inv"], m["rep"], m["pids"],
            m["pinv"], state, lr=1e-2, use_pallas=True, interpret=True,
            n_real=m["nuniq"], prep=m["prep"], chunk=8, **route,
        )
    want_t, want_m = split_stacked_planes(want_fat, 1)

    # sharded: shard-major re-layout, shard_map over 8 devices
    fat8 = fold_stacked_planes(table, monu, n)

    def body(fat_shard, g, f, iv, rp, pd, pv, nu, pr, cnt, *rt):
        st = SparseAdamFoldedState(count=cnt)
        nf, ns = sharded_two_phase_sparse_adam_folded(
            fat_shard, g, f, iv, rp, pd, pv, nu, pr, st, lr=1e-2,
            interpret=True, update_space=update_space, chunk=8,
            **dict(zip(
                ("accperm", "resid_pos", "resid_slot", "gdup_pos",
                 "gdup_tgt"), rt)),
        )
        return nf, ns.count

    rs = P("model", None)
    fn = jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(rs,) + (P(),) * 14,
        out_specs=(rs, P()), check_vma=False,
    ))
    got_fat, got_cnt = fn(
        jax.device_put(fat8, NamedSharding(mesh, rs)),
        g_rows, flat_ids, m["inv"], m["rep"], m["pids"], m["pinv"],
        m["nuniq"], m["prep"], state.count,
        m["accperm"], m["resid_pos"], m["resid_slot"], m["gdup_pos"],
        m["gdup_tgt"],
    )
    got_t, got_m = split_stacked_planes(jnp.asarray(jax.device_get(got_fat)), n)
    # untouched rows (incl. every pad pid) are bitwise unchanged — the
    # sharded bounds windows wrote exactly the owned real slots
    touched = np.zeros(Vp, bool)
    touched[np.asarray(m["pids"])[: int(m["nuniq"][0])]] = True
    np.testing.assert_array_equal(
        np.asarray(got_t)[~touched], np.asarray(table)[~touched])
    np.testing.assert_array_equal(
        np.asarray(got_m)[~touched], np.asarray(monu)[~touched])
    np.testing.assert_array_equal(
        np.asarray(want_t)[~touched], np.asarray(table)[~touched])
    # touched rows: identical op chain, <= few-ulp program-fusion noise
    np.testing.assert_allclose(
        np.asarray(got_t), np.asarray(want_t), rtol=1e-5, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(got_m), np.asarray(want_m), rtol=1e-2, atol=1e-12)
    assert int(got_cnt) == int(want_st.count) == 3


def _setup_stacked(mesh, update_space="position", seed=0):
    extra = dict(
        two_phase_embedding=True, table_update="pallas",
        table_opt_dtype="bfloat16", table_container="stacked",
        dedup_route="gather", update_space=update_space,
    )
    if mesh is not None:
        extra["explicit_collective_embedding"] = True
        extra["stacked_shards"] = mesh.shape["model"]
    cfg = make_config(task_name="mtl", model_name="sharedbottom", n_sparse=4,
                      n_dense=2, hidden=(16, 8), tower=(8,), gate=(8,),
                      batch_size=64, lr=3e-3, vocab=80, **extra)
    layout, x, y, _ = make_data(cfg, n=256, seed=seed, vocab=80)
    model = get_model("sharedbottom", layout, cfg)
    return Trainer(model, seed=0, mesh=mesh).compile(), x, y


def test_explicit_stacked_fit_matches_single_device():
    """Full fit through the mesh folded path == the single-chip stacked
    fit (psum reduction-order noise only); the fat param stays row-sharded
    and its TABLE PLANE (mapped back from shard-major) matches."""
    tr_s, x, y = _setup_stacked(None)
    tr_s.fit(x, y, batch_size=64, epochs=2, verbose=0, shuffle=False)
    mesh = create_mesh(data=4, model=2)
    tr_e, x2, y2 = _setup_stacked(mesh)
    tr_e.fit(x2, y2, batch_size=64, epochs=2, verbose=0, shuffle=False)
    p1 = tr_s.predict(x, batch_size=64)
    p2 = tr_e.predict(x2, batch_size=64)
    np.testing.assert_allclose(p1, p2, rtol=2e-3, atol=2e-4)
    fat_s = np.asarray(
        tr_s._train_state["params"]["embeddings"]["fused"]["table"])
    fat_e = jnp.asarray(jax.device_get(
        tr_e._train_state["params"]["embeddings"]["fused"]["table"]))
    spec = tr_e._train_state["params"]["embeddings"]["fused"]["table"].sharding.spec
    assert spec and spec[0] == "model"
    t_s = split_stacked_planes(jnp.asarray(fat_s), 1)[0]
    t_e = split_stacked_planes(fat_e, 2)[0]
    np.testing.assert_allclose(np.asarray(t_e), np.asarray(t_s),
                               rtol=2e-3, atol=1e-5)


def test_explicit_stacked_slot_matches_position_on_mesh():
    """update_space='slot' on the mesh is bitwise-equal to the mesh
    position path (same pin the single-chip pair holds)."""
    mesh = create_mesh(data=4, model=2)
    outs = {}
    for space in ("position", "slot"):
        tr, x, y = _setup_stacked(create_mesh(data=4, model=2), space)
        tr.fit(x, y, batch_size=64, epochs=2, verbose=0, shuffle=False)
        outs[space] = np.asarray(jax.device_get(
            tr._train_state["params"]["embeddings"]["fused"]["table"]))
    np.testing.assert_array_equal(outs["slot"], outs["position"])


def test_mesh_stacked_checkpoint_restores_into_split_single_device():
    """A mesh-stacked training state saves in the portable split layout
    and restores into a single-device split-container trainer."""
    mesh = create_mesh(data=4, model=2)
    tr_e, x, y = _setup_stacked(mesh)
    tr_e.fit(x, y, batch_size=64, epochs=1, verbose=0, shuffle=False)
    split = tr_e._state_to_split_layout(tr_e._train_state)
    table = np.asarray(jax.device_get(
        split["params"]["embeddings"]["fused"]["table"]))
    fat = jnp.asarray(jax.device_get(
        tr_e._train_state["params"]["embeddings"]["fused"]["table"]))
    np.testing.assert_array_equal(
        table, np.asarray(split_stacked_planes(fat, 2)[0]))
    # round trip back to the runtime layout is bit-exact
    back = tr_e._state_to_runtime_layout(split)
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(
            back["params"]["embeddings"]["fused"]["table"])),
        np.asarray(fat),
    )


def test_mesh_stacked_validation():
    """Mis-declared stacked_shards and the GSPMD path raise."""
    mesh = create_mesh(data=4, model=2)
    extra = dict(
        two_phase_embedding=True, table_update="pallas",
        table_opt_dtype="bfloat16", table_container="stacked",
        dedup_route="gather", explicit_collective_embedding=True,
        stacked_shards=4,  # mesh model axis is 2
    )
    cfg = make_config(task_name="mtl", model_name="sharedbottom", n_sparse=4,
                      n_dense=2, hidden=(16, 8), tower=(8,), gate=(8,),
                      batch_size=64, lr=3e-3, vocab=80, **extra)
    layout, x, y, _ = make_data(cfg, n=128, seed=0, vocab=80)
    with pytest.raises(ValueError, match="stacked_shards"):
        Trainer(get_model("sharedbottom", layout, cfg), seed=0, mesh=mesh)
    extra2 = {**extra, "stacked_shards": 2}
    extra2.pop("explicit_collective_embedding")
    cfg2 = make_config(task_name="mtl", model_name="sharedbottom", n_sparse=4,
                       n_dense=2, hidden=(16, 8), tower=(8,), gate=(8,),
                       batch_size=64, lr=3e-3, vocab=80, **extra2)
    layout2, *_ = make_data(cfg2, n=128, seed=0, vocab=80)
    with pytest.raises(ValueError):
        Trainer(get_model("sharedbottom", layout2, cfg2), seed=0, mesh=mesh)


def test_resolve_table_container_mesh_auto(monkeypatch):
    """stacked_auto_conditions (round 5): the auto opt-in extends to an
    explicit-collective mesh — stacked_shards resolves from the 'model'
    axis; GSPMD meshes and indivisible row counts stay split."""
    from mmlrec_tpu.train.trainer import resolve_table_container
    import mmlrec_tpu.train.trainer as trainer_mod

    class _Dev:
        platform = "tpu"

    class _FakeMesh:
        def __init__(self, model):
            self.shape = {"data": 8 // model, "model": model}
            self.devices = np.full((8 // model, model), _Dev())

    def make(explicit, vocab=1 << 16):
        cfg = make_config(
            task_name="mtl", model_name="sharedbottom", n_sparse=4,
            n_dense=2, vocab=vocab, hidden=(16, 8), tower=(8,), gate=(8,),
            batch_size=64, two_phase_embedding=True,
            table_opt_dtype="bfloat16",
            **({"explicit_collective_embedding": True} if explicit else {}),
        )
        layout, *_ = make_data(cfg, n=64, seed=0, vocab=vocab)
        return cfg, layout

    # pretend we're on a TPU for the single-device branch of the predicate
    monkeypatch.setattr(
        trainer_mod.jax, "devices", lambda *a: [_Dev()], raising=False)

    cfg, layout = make(explicit=True)
    resolve_table_container(cfg, layout, mesh=_FakeMesh(2))
    assert cfg.model_config.extra.get("table_container") == "stacked"
    assert cfg.model_config.extra.get("stacked_shards") == 2

    # GSPMD mesh (no explicit collectives): stays split
    cfg2, layout2 = make(explicit=False)
    resolve_table_container(cfg2, layout2, mesh=_FakeMesh(2))
    assert cfg2.model_config.extra.get("table_container") is None

    # explicit flag without a mesh: predicate stays off (the explicit
    # path requires a mesh; single-chip auto is the mesh=None branch)
    cfg3, layout3 = make(explicit=True)
    resolve_table_container(cfg3, layout3, mesh=None)
    assert cfg3.model_config.extra.get("table_container") is None
