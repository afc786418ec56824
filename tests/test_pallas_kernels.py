"""Pallas kernel correctness (interpret mode on CPU; the same kernels run
compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from mmlrec_tpu.ops.pallas_kernels import (
    embed_concat,
    fused_embed_concat,
    gated_expert_mix,
    multihead_score,
)

KEY = jax.random.PRNGKey(0)


def test_fused_embed_concat_matches_xla():
    V, D, B, F, Nd = 64, 8, 40, 5, 3
    table = jax.random.normal(KEY, (V, D))
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, F), 0, V)
    dense = jax.random.normal(jax.random.PRNGKey(2), (B, Nd))
    got = fused_embed_concat(table, ids, dense, block_b=16, interpret=True)
    expect = jnp.concatenate(
        [jnp.take(table, ids, axis=0).reshape(B, F * D), dense], axis=1
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), rtol=1e-6)


def test_embed_concat_backward_is_scatter_add():
    V, D, B, F, Nd = 16, 4, 8, 3, 2
    table = jax.random.normal(KEY, (V, D))
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, F), 0, V)
    dense = jax.random.normal(jax.random.PRNGKey(2), (B, Nd))

    def loss_pallas(t, d):
        return jnp.sum(embed_concat(t, ids, d, interpret=True) ** 2)

    def loss_xla(t, d):
        out = jnp.concatenate([jnp.take(t, ids, axis=0).reshape(B, F * D), d], 1)
        return jnp.sum(out**2)

    g1t, g1d = jax.grad(loss_pallas, argnums=(0, 1))(table, dense)
    g2t, g2d = jax.grad(loss_xla, argnums=(0, 1))(table, dense)
    np.testing.assert_allclose(np.asarray(g1t), np.asarray(g2t), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g1d), np.asarray(g2d), rtol=1e-5)


def test_gated_expert_mix_matches_xla():
    B, T, E, D = 24, 3, 4, 16
    logits = jax.random.normal(KEY, (B, T, E))
    experts = jax.random.normal(jax.random.PRNGKey(1), (B, E, D))
    got = gated_expert_mix(logits, experts, block_b=8, interpret=True)
    expect = jnp.einsum("bte,bed->btd", jax.nn.softmax(logits, -1), experts)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), rtol=1e-5,
                               atol=1e-6)


def test_multihead_score_matches_xla():
    B, T, H = 32, 4, 8
    tower = jax.random.normal(KEY, (B, T, H))
    w = jax.random.normal(jax.random.PRNGKey(1), (T, H))
    b = jax.random.normal(jax.random.PRNGKey(2), (T,))
    got = multihead_score(tower, w, b, block_b=16, interpret=True)
    expect = jax.nn.sigmoid(jnp.sum(tower * w[None], -1) + b[None])
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), rtol=1e-5,
                               atol=1e-6)


def test_non_divisible_batch_tiles():
    V, D, B, F, Nd = 32, 4, 37, 3, 2  # 37 % 16 != 0
    table = jax.random.normal(KEY, (V, D))
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, F), 0, V)
    dense = jax.random.normal(jax.random.PRNGKey(2), (B, Nd))
    got = fused_embed_concat(table, ids, dense, block_b=16, interpret=True)
    expect = jnp.concatenate(
        [jnp.take(table, ids, axis=0).reshape(B, F * D), dense], axis=1
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), rtol=1e-6)


def test_pallas_rows_add_matches_xla_scatter():
    from mmlrec_tpu.ops.pallas_scatter import pallas_rows_add

    V, D, K = 64, 128, 16
    rng = np.random.RandomState(0)
    ids = jnp.asarray(
        rng.choice(V, size=K, replace=False).astype(np.int32)  # unique
    )
    table = jnp.asarray(rng.rand(V, D).astype(np.float32))
    mu = jnp.asarray(rng.rand(V, D).astype(np.float32))
    d_t = jnp.asarray(rng.randn(K, D).astype(np.float32))
    d_m = jnp.asarray(rng.randn(K, D).astype(np.float32))
    got_t, got_m = pallas_rows_add(
        (table, mu), ids, (d_t, d_m), chunk=8, interpret="pallas"
    )
    np.testing.assert_allclose(
        np.asarray(got_t), np.asarray(table.at[ids].add(d_t)), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(got_m), np.asarray(mu.at[ids].add(d_m)), rtol=1e-6
    )


def test_pallas_rows_add_bf16_storage():
    from mmlrec_tpu.ops.pallas_scatter import pallas_rows_add

    V, D, K = 32, 128, 8
    rng = np.random.RandomState(1)
    ids = jnp.asarray(rng.choice(V, size=K, replace=False).astype(np.int32))
    nu = jnp.asarray(rng.rand(V, D).astype(np.float32)).astype(jnp.bfloat16)
    d_n = jnp.asarray(rng.randn(K, D).astype(np.float32))
    (got,) = pallas_rows_add((nu,), ids, (d_n,), chunk=8, interpret="pallas")
    expect = (
        jnp.take(nu, ids, axis=0).astype(jnp.float32) + d_n
    ).astype(jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(got[np.asarray(ids)]).astype(np.float32),
        np.asarray(expect).astype(np.float32), rtol=1e-2,
    )
    untouched = np.setdiff1d(np.arange(V), np.asarray(ids))
    np.testing.assert_array_equal(
        np.asarray(got[untouched]).astype(np.float32),
        np.asarray(nu[untouched]).astype(np.float32),
    )


def test_pallas_rows_write_sets_rows_and_skips_pads():
    from mmlrec_tpu.ops.pallas_scatter import pallas_rows_write

    V, D, K = 64, 128, 16
    rng = np.random.RandomState(2)
    real = rng.choice(V, size=10, replace=False).astype(np.int32)
    pads = np.setdiff1d(np.arange(V), real)[: K - 10].astype(np.int32)
    ids = jnp.asarray(np.concatenate([np.sort(real), pads]))
    table = jnp.asarray(rng.rand(V, D).astype(np.float32))
    monu = jnp.asarray(rng.rand(V, D).astype(np.float32))
    vals_t = jnp.asarray(rng.randn(K, D).astype(np.float32))
    vals_m = jnp.asarray(rng.randn(K, D).astype(np.float32))
    n_real = jnp.asarray([10], jnp.int32)
    got_t, got_m = pallas_rows_write(
        (table, monu), ids, (vals_t, vals_m), n_real=n_real, chunk=4,
        interpret="pallas",
    )
    # written rows take the new values (chunks 0-1 full, chunk 2 boundary)
    np.testing.assert_allclose(
        np.asarray(got_t[np.sort(real)]), np.asarray(vals_t[:10]), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(got_m[np.sort(real)]), np.asarray(vals_m[:10]), rtol=1e-6)
    # pad rows (slots >= n_real) keep their previous contents bit-exactly
    untouched = np.setdiff1d(np.arange(V), real)
    np.testing.assert_array_equal(
        np.asarray(got_t[untouched]), np.asarray(table[untouched]))
    np.testing.assert_array_equal(
        np.asarray(got_m[untouched]), np.asarray(monu[untouched]))


def test_pallas_rows_write_pipelined_matches_unpipelined():
    """Software-pipelined write kernel (manual double-buffered value
    windows, waits deferred one chunk): identical results to
    pallas_rows_write, including boundary chunks, pads, and the sharded
    [lo, hi) bounds mode."""
    from mmlrec_tpu.ops.pallas_scatter import (
        pallas_rows_write,
        pallas_rows_write_pipelined,
    )

    V, D, K = 64, 128, 16
    rng = np.random.RandomState(7)
    real = rng.choice(V, size=10, replace=False).astype(np.int32)
    pads = np.setdiff1d(np.arange(V), real)[: K - 10].astype(np.int32)
    ids = jnp.asarray(np.concatenate([np.sort(real), pads]))
    table = jnp.asarray(rng.rand(V, D).astype(np.float32))
    monu = jnp.asarray(rng.rand(V, D).astype(np.float32))
    vals_t = jnp.asarray(rng.randn(K, D).astype(np.float32))
    vals_m = jnp.asarray(rng.randn(K, D).astype(np.float32))
    for bounds in (None, jnp.asarray([3, 10], jnp.int32)):
        kw = dict(chunk=4, interpret="pallas")
        if bounds is None:
            kw["n_real"] = jnp.asarray([10], jnp.int32)
        else:
            kw["bounds"] = bounds
        ref_t, ref_m = pallas_rows_write(
            (table, monu), ids, (vals_t, vals_m), **kw)
        got_t, got_m = pallas_rows_write_pipelined(
            (table, monu), ids, (vals_t, vals_m), **kw)
        np.testing.assert_array_equal(np.asarray(got_t), np.asarray(ref_t))
        np.testing.assert_array_equal(np.asarray(got_m), np.asarray(ref_m))


def test_rows_kernels_reference_path_matches_interpreter():
    """interpret=True now runs a fast pure-JAX reference of the kernel
    contract (the CPU suite's path); pin it bit-equal to the genuine
    pallas interpreter (interpret="pallas") for write AND rmw forms,
    including pads, boundary chunks, and the sharded [lo, hi) window."""
    from mmlrec_tpu.ops.pallas_scatter import (
        pallas_rows_update,
        pallas_rows_write,
    )

    V, D, K = 64, 128, 16
    rng = np.random.RandomState(11)
    real = rng.choice(V, size=10, replace=False).astype(np.int32)
    pads = np.setdiff1d(np.arange(V), real)[: K - 10].astype(np.int32)
    ids = jnp.asarray(np.concatenate([np.sort(real), pads]))
    table = jnp.asarray(rng.rand(V, D).astype(np.float32))
    monu = jnp.asarray(rng.rand(V, D).astype(np.float32))
    vals_t = jnp.asarray(rng.randn(K, D).astype(np.float32))
    vals_m = jnp.asarray(rng.randn(K, D).astype(np.float32))
    for kw in (
        {"n_real": jnp.asarray([10], jnp.int32)},
        {"bounds": jnp.asarray([3, 10], jnp.int32)},
    ):
        a = pallas_rows_write((table, monu), ids, (vals_t, vals_m),
                              chunk=4, interpret="pallas", **kw)
        b = pallas_rows_write((table, monu), ids, (vals_t, vals_m),
                              chunk=4, interpret=True, **kw)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    # rmw form: one "add" array + one "set" (masked byte-merge) array;
    # pad-slot deltas zero / masks zero, as the contract requires
    d_t = jnp.asarray(rng.randn(K, D).astype(np.float32))
    d_t = d_t.at[10:].set(0.0)
    d_m = jnp.asarray(rng.randn(K, D).astype(np.float32))
    mask = jnp.asarray((rng.rand(K, D) > 0.5).astype(np.float32))
    d_m = d_m * mask
    mask = mask.at[10:].set(0.0)
    kwu = dict(modes=("add", "set"), masks=(None, mask),
               n_real=jnp.asarray([10], jnp.int32), chunk=4)
    a = pallas_rows_update((table, monu), ids, (d_t, d_m),
                           interpret="pallas", **kwu)
    b = pallas_rows_update((table, monu), ids, (d_t, d_m),
                           interpret=True, **kwu)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_pallas_rows_gather_hbm_reference_matches_interpreter():
    """pallas_rows_gather_hbm: interpret=True (pure-JAX jnp.take reference)
    == interpret="pallas" (genuine pallas interpreter), duplicates
    included — the monu-gather routing of the two-phase unique update."""
    from mmlrec_tpu.ops.pallas_gather import pallas_rows_gather_hbm

    V, D, K = 64, 128, 16
    rng = np.random.RandomState(7)
    ids = jnp.asarray(
        rng.choice(V, size=K, replace=True).astype(np.int32)  # dups OK
    )
    table = jnp.asarray(rng.rand(V, D).astype(np.float32))
    ref = pallas_rows_gather_hbm(table, ids, chunk=8, interpret=True)
    got = pallas_rows_gather_hbm(table, ids, chunk=8, interpret="pallas")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    np.testing.assert_array_equal(
        np.asarray(ref), np.asarray(jnp.take(table, ids, axis=0))
    )


def test_pallas_rows_gather_dual_n_real_matches_interpreter():
    """pallas_rows_gather_dual with n_real: real slots fetch [2, 1, W]
    strided pairs, tail pads are skipped (NaN-poisoned in the reference so
    accidental pad consumption fails loudly on CPU — advisor r4);
    the slot-space update's phase-1 gather (round 4)."""
    from mmlrec_tpu.ops.pallas_gather import pallas_rows_gather_dual

    V, W, K = 64, 128, 16
    rng = np.random.RandomState(3)
    ids = jnp.asarray(rng.choice(V, size=K, replace=True).astype(np.int32))
    stacked = jnp.asarray(rng.rand(2, V, W).astype(np.float32))
    n_real = jnp.asarray([11], jnp.int32)
    ref = pallas_rows_gather_dual(stacked, ids, n_real=n_real, chunk=4,
                                  interpret=True)
    got = pallas_rows_gather_dual(stacked, ids, n_real=n_real, chunk=4,
                                  interpret="pallas")
    # pad rows are undefined (NaN poison in the reference, undefined in
    # the interpreter, uninitialized under Mosaic) — pin the REAL slots
    np.testing.assert_array_equal(np.asarray(got)[:, :11],
                                  np.asarray(ref)[:, :11])
    want = np.array(jnp.take(stacked, ids, axis=1))
    np.testing.assert_array_equal(np.asarray(ref)[:, :11], want[:, :11])
    assert np.isnan(np.asarray(ref)[:, 11:]).all()

    # n_real=None keeps the original full-fetch contract
    full = pallas_rows_gather_dual(stacked, ids, chunk=4, interpret="pallas")
    np.testing.assert_array_equal(
        np.asarray(full), np.asarray(jnp.take(stacked, ids, axis=1)))
