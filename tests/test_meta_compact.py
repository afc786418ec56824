"""Metadata upload compaction (train/staging.py, round 5).

The per-epoch two-phase metadata stacks upload as uint16/uint8 with
device-side decode (and dead arrays as 1-wide dummies on the route
paths); training numerics must be BITWISE unchanged, including the
sentinel remap at the K == 65536 boundary.
"""

import jax.numpy as jnp
import numpy as np

from mmlrec_tpu.models import get_model
from mmlrec_tpu.synthetic import make_config, make_data
from mmlrec_tpu.train import Trainer
from mmlrec_tpu.train.staging import MetaCodec


def test_meta_codec_roundtrip_boundary_sentinels():
    """encode/decode is exact for every kind, including slot16 sentinels
    at the 65536 boundary (Kp == 65536 stores its drop value Kp as 65535
    and remaps on device)."""
    steps, K, Kp = 2, 65536, 65536
    rng = np.random.RandomState(0)
    inv = rng.randint(0, K, (steps, K)).astype(np.int32)
    rep = rng.randint(0, 2, (steps, K)).astype(np.float32)
    resid_slot = rng.randint(0, K - 1, (steps, 64)).astype(np.int32)
    resid_slot[:, 32:] = Kp  # drop sentinel, one past uint16
    gdup_tgt = rng.randint(0, K - 1, (steps, 64)).astype(np.int32)
    gdup_tgt[:, 40:] = K
    codec = MetaCodec((
        ("idx16", 0), ("mask8", 0), ("slot16", Kp), ("slot16", K),
        ("dead", 0), ("raw", 0),
    ))
    raw = rng.randint(0, 10**7, (steps, 16)).astype(np.int32)
    meta = (inv, rep, resid_slot, gdup_tgt, inv, raw)
    enc = codec.encode(meta)
    assert enc[0].dtype == np.uint16 and enc[1].dtype == np.uint8
    assert enc[2].dtype == np.uint16 and enc[4].shape == (steps, 1)
    dec = codec.decode(tuple(jnp.asarray(a[0]) for a in enc))
    np.testing.assert_array_equal(np.asarray(dec[0]), inv[0])
    np.testing.assert_array_equal(np.asarray(dec[1]), rep[0])
    np.testing.assert_array_equal(np.asarray(dec[2]), resid_slot[0])
    np.testing.assert_array_equal(np.asarray(dec[3]), gdup_tgt[0])
    np.testing.assert_array_equal(np.asarray(dec[5]), raw[0])


def _fit_pair(kw, fit_kw, n=320, vocab=80):
    outs = {}
    for name, compact in (("on", True), ("off", False)):
        cfg = make_config(**kw, meta_compact=compact)
        layout, x, y, _ = make_data(cfg, n=n, seed=0, vocab=vocab)
        model = get_model(kw["model_name"], layout, cfg)
        tr = Trainer(model, seed=0).compile()
        tr.fit(x, y, verbose=0, **fit_kw)
        outs[name] = (
            tr,
            np.asarray(tr.variables["params"]["embeddings"]["fused"]["table"]),
        )
    return outs


def test_fit_meta_compact_bitwise_stacked_route():
    """Full-shuffle fit with the stacked container + gather route (dead
    inv dummy, uint16 accperm/resid, uint8 masks): params bitwise equal
    to the uncompacted run, and the codec actually engaged."""
    kw = dict(task_name="mtl", model_name="sharedbottom", n_sparse=4,
              n_dense=2, hidden=(16, 8), tower=(8,), gate=(8,), epochs=2,
              batch_size=64, lr=3e-3, two_phase_embedding=True, vocab=80,
              table_update="pallas", table_opt_dtype="bfloat16",
              table_container="stacked", dedup_route="gather")
    outs = _fit_pair(kw, dict(batch_size=64, epochs=2, shuffle=True))
    assert isinstance(outs["on"][0]._meta_codec, MetaCodec)
    assert outs["off"][0]._meta_codec is None
    np.testing.assert_array_equal(outs["on"][1], outs["off"][1])


def test_fit_meta_compact_bitwise_block_mode():
    """Block mode stages the encoded stacks once; per-epoch device
    reorder + slice-decode must match the uncompacted run bitwise."""
    kw = dict(task_name="mtl", model_name="sharedbottom", n_sparse=4,
              n_dense=2, hidden=(16, 8), tower=(8,), gate=(8,), epochs=2,
              batch_size=64, lr=3e-3, two_phase_embedding=True, vocab=80,
              table_update="pallas", table_opt_dtype="bfloat16",
              table_container="stacked", dedup_route="gather")
    outs = _fit_pair(kw, dict(batch_size=64, epochs=2, shuffle="block"))
    assert isinstance(outs["on"][0]._meta_codec, MetaCodec)
    np.testing.assert_array_equal(outs["on"][1], outs["off"][1])


def test_fit_meta_compact_bitwise_scatter_update():
    """Two-phase scatter update ((inv, rep) only — inv is ALIVE here and
    rides uint16): bitwise-equal params."""
    kw = dict(task_name="mtl", model_name="sharedbottom", n_sparse=4,
              n_dense=2, hidden=(16, 8), tower=(8,), gate=(8,), epochs=2,
              batch_size=128, lr=3e-3, two_phase_embedding=True)
    outs = _fit_pair(kw, dict(batch_size=128, epochs=2, shuffle=True),
                     n=900, vocab=1000)
    assert isinstance(outs["on"][0]._meta_codec, MetaCodec)
    np.testing.assert_array_equal(outs["on"][1], outs["off"][1])
