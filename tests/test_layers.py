import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmlrec_tpu.ops import (
    CrossStitchLayer,
    DomainBatchNorm,
    FusedEmbedding,
    GateNN,
    MLP,
    PredictionHeads,
    SharedSpecificDense,
    SNRGate,
    StackedDense,
    StackedMLP,
    sequence_pooling,
)

KEY = jax.random.PRNGKey(0)


def test_stacked_dense_matches_per_member_matmul():
    x = jax.random.normal(KEY, (7, 5))
    mod = StackedDense(stack=3, features=4)
    params = mod.init(KEY, x)
    y = mod.apply(params, x)
    kernel = params["params"]["kernel"]
    bias = params["params"]["bias"]
    for k in range(3):
        np.testing.assert_allclose(
            np.asarray(y[:, k]), np.asarray(x @ kernel[k] + bias[k]), rtol=1e-5
        )
    # rank-3 input: member k sees its own slice
    x3 = jax.random.normal(KEY, (7, 3, 5))
    y3 = mod.apply(params, x3)
    for k in range(3):
        np.testing.assert_allclose(
            np.asarray(y3[:, k]), np.asarray(x3[:, k] @ kernel[k] + bias[k]), rtol=1e-5
        )


def test_stacked_mlp_is_k_independent_mlps():
    x = jax.random.normal(KEY, (6, 5))
    smlp = StackedMLP(stack=2, hidden_units=[8, 3], init_std=0.5)
    params = smlp.init(KEY, x)
    y = smlp.apply(params, x)
    p = params["params"]
    for k in range(2):
        h = x
        for i in range(2):
            h = jax.nn.relu(h @ p[f"dense_{i}"]["kernel"][k] + p[f"dense_{i}"]["bias"][k])
        np.testing.assert_allclose(np.asarray(y[:, k]), np.asarray(h), rtol=1e-5)


def test_prediction_heads_sigmoid_and_bias():
    heads = PredictionHeads(task_types=("binary", "regression"))
    logits = jnp.asarray([[0.0, 2.0]])
    params = heads.init(KEY, logits)
    y = heads.apply(params, logits)
    np.testing.assert_allclose(np.asarray(y), [[0.5, 2.0]], rtol=1e-6)


def test_cross_stitch_identity_at_init():
    # eye init (reference model/cross_stitch.py:12) => passthrough
    x = jax.random.normal(KEY, (4, 3, 6))
    mod = CrossStitchLayer()
    params = mod.init(KEY, x)
    np.testing.assert_allclose(np.asarray(mod.apply(params, x)), np.asarray(x), rtol=1e-5)


def test_shared_specific_dense_math():
    x = jax.random.normal(KEY, (5, 4))
    mod = SharedSpecificDense(num_domains=3, features=2)
    params = mod.init(KEY, x)
    y = mod.apply(params, x)
    p = params["params"]
    for d in range(3):
        expect = (
            x @ (p["specific_kernel"][d] * p["shared_kernel"])
            + p["specific_bias"][d]
            + p["shared_bias"]
        )
        np.testing.assert_allclose(np.asarray(y[:, d]), np.asarray(expect), rtol=1e-5)


def test_shared_specific_freeze_ref_faithful():
    x = jax.random.normal(KEY, (5, 4))
    mod = SharedSpecificDense(num_domains=3, features=2, freeze_ref_faithful=True)
    params = mod.init(KEY, x)

    def loss(p):
        return jnp.sum(mod.apply({"params": p}, x) ** 2)

    g = jax.grad(loss)(params["params"])
    # reference bug: only the LAST domain's specific params train
    # (model/utils.py:181-191)
    assert np.allclose(np.asarray(g["specific_kernel"][:2]), 0.0)
    assert not np.allclose(np.asarray(g["specific_kernel"][2]), 0.0)
    assert not np.allclose(np.asarray(g["shared_kernel"]), 0.0)


def test_snr_gate_matches_naive_loop():
    B, IN, OUT, U = 3, 4, 2, 5
    x = jax.random.normal(KEY, (B, IN, U))
    mod = SNRGate(input_dim=IN, output_dim=OUT, units=U, elementwise=False)
    params = mod.init(KEY, x)
    y = mod.apply(params, x)
    p = params["params"]
    u, alpha, trans = p["u"], p["alpha"], p["trans"]
    s = jax.nn.sigmoid(jnp.log(u) - jnp.log(1 - u) + jnp.log(alpha[0]) / 0.9)
    z = jnp.clip(s * 1.2 - 0.1, 0.0, 1.0)
    for i in range(OUT):
        expect = sum(x[:, j] @ trans[i, j] * z[i, j] for j in range(IN))
        np.testing.assert_allclose(np.asarray(y[:, i]), np.asarray(expect), rtol=1e-4)


def test_snr_gate_elementwise_mssm():
    B, IN, OUT, U = 3, 2, 2, 4
    x = jax.random.normal(KEY, (B, IN, U))
    mod = SNRGate(input_dim=IN, output_dim=OUT, units=U, elementwise=True)
    params = mod.init(KEY, x)
    y = mod.apply(params, x)
    p = params["params"]
    u, alpha, trans = p["u"], p["alpha"], p["trans"]
    s = jax.nn.sigmoid(jnp.log(u) - jnp.log(1 - u) + jnp.log(alpha[0]) / 0.9)
    z = jnp.clip(s * 1.2 - 0.1, 0.0, 1.0)  # [OUT, IN, U]
    for i in range(OUT):
        expect = sum((x[:, j] @ trans[i, j]) * z[i, j][None, :] for j in range(IN))
        np.testing.assert_allclose(np.asarray(y[:, i]), np.asarray(expect), rtol=1e-4)


def test_gate_nn_output_range():
    x = jax.random.normal(KEY, (10, 6)) * 10
    mod = GateNN(output_dim=4, hidden_dim=8)
    params = mod.init(KEY, x)
    y = np.asarray(mod.apply(params, x))
    assert (y >= 0).all() and (y <= 2).all()  # 2*sigmoid (pepnet.py:31-32)


def test_sequence_pooling_modes():
    seq = jnp.asarray(
        [[[1.0, 2.0], [3.0, 4.0], [100.0, 100.0]]]
    )  # [1, 3, 2], last pos masked
    mask = jnp.asarray([[1.0, 1.0, 0.0]])
    np.testing.assert_allclose(
        np.asarray(sequence_pooling(seq, mask, "sum")), [[4.0, 6.0]]
    )
    np.testing.assert_allclose(
        np.asarray(sequence_pooling(seq, mask, "mean")), [[2.0, 3.0]], rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(sequence_pooling(seq, mask, "max")), [[3.0, 4.0]]
    )


def test_fused_embedding_offsets():
    mod = FusedEmbedding(vocab_sizes=(3, 5), dim=4, pad_to=8)
    ids = jnp.asarray([[0, 0], [2, 4]], jnp.int32)
    params = mod.init(KEY, ids)
    out = mod.apply(params, ids)
    table = params["params"]["table"]
    np.testing.assert_allclose(np.asarray(out[0, 0]), np.asarray(table[0]))
    np.testing.assert_allclose(np.asarray(out[0, 1]), np.asarray(table[3]))  # offset 3
    np.testing.assert_allclose(np.asarray(out[1, 1]), np.asarray(table[7]))
    assert table.shape[0] == 8  # padded


def test_fused_embedding_matmul_grad_matches_scatter():
    """The one-hot einsum table cotangent (ops/embedding.py
    take_rows_matmul_grad) must equal the scatter-add cotangent to f32
    rounding, with an identical forward, including duplicate ids in a batch
    and untouched/padding rows staying zero."""
    vocabs, dim = (5, 3, 9), 4
    ids = jnp.asarray(
        [[0, 2, 8], [4, 2, 8], [0, 0, 0], [4, 1, 3]], jnp.int32
    )  # duplicates across rows and within columns
    mods = {
        mode: FusedEmbedding(vocab_sizes=vocabs, dim=dim, pad_to=8, grad_mode=mode)
        for mode in ("matmul", "scatter")
    }
    params = mods["scatter"].init(KEY, ids)
    outs = {m: mods[m].apply(params, ids) for m in mods}
    np.testing.assert_array_equal(np.asarray(outs["matmul"]), np.asarray(outs["scatter"]))
    grads = {
        m: np.asarray(
            jax.grad(lambda p, m=m: (jnp.sin(mods[m].apply(p, ids)) ** 2).sum())(
                params
            )["params"]["table"]
        )
        for m in mods
    }
    np.testing.assert_allclose(grads["matmul"], grads["scatter"], rtol=1e-5, atol=1e-7)
    # rows beyond the fused vocab (padding) and never-gathered rows get 0
    assert np.all(grads["matmul"][sum(vocabs):] == 0)
    touched = {0, 4, 5 + 2, 5 + 0, 5 + 1, 8 + 8, 8 + 3, 8 + 0}
    untouched = sorted(set(range(sum(vocabs))) - touched)
    assert np.all(grads["matmul"][untouched] == 0)


def test_fused_embedding_matmul_grad_auto_budget():
    """auto mode falls back to scatter when the one-hot would exceed the
    budget (huge vocab), and uses the matmul path under it."""
    from mmlrec_tpu.ops import embedding as emb_mod

    ids = jnp.asarray([[1, 2]], jnp.int32)
    small = FusedEmbedding(vocab_sizes=(4, 4), dim=2, pad_to=8, grad_mode="auto")
    params = small.init(KEY, ids)
    # under budget: the custom_vjp primitive appears in the jaxpr
    jaxpr = str(jax.make_jaxpr(lambda p: small.apply(p, ids))(params))
    assert "custom_vjp" in jaxpr
    old = emb_mod.MATMUL_GRAD_BUDGET_BYTES
    try:
        emb_mod.MATMUL_GRAD_BUDGET_BYTES = 0  # force over-budget
        jaxpr2 = str(jax.make_jaxpr(lambda p: small.apply(p, ids))(params))
        assert "custom_vjp" not in jaxpr2
    finally:
        emb_mod.MATMUL_GRAD_BUDGET_BYTES = old


def test_fused_embedding_lane_packed_matches_plain():
    """Packed [rows/P, 128] layout is bit-exact vs the plain layout.

    Packing is the large-table fast path (docs/perf_notes.md "Packed
    gather"); here it is forced on a tiny table to check the math.
    """
    vocabs, dim = (7, 13, 6), 16  # P = 128 // 16 = 8
    ids = jnp.asarray([[0, 0, 0], [6, 12, 5], [3, 7, 2], [1, 1, 1]], jnp.int32)
    plain = FusedEmbedding(vocab_sizes=vocabs, dim=dim, pad_to=8, packed=False)
    packed = FusedEmbedding(vocab_sizes=vocabs, dim=dim, pad_to=8, packed=True)
    p_plain = plain.init(KEY, ids)
    p_packed = packed.init(KEY, ids)
    tbl = p_packed["params"]["table"]
    assert tbl.shape[1] == 128 and tbl.shape[0] * 8 == p_packed["params"]["table"].size // dim
    # transplant: logical row r -> physical [r//P, (r%P)*dim:(r%P+1)*dim]
    logical = np.asarray(p_plain["params"]["table"])
    rows = logical.shape[0]
    phys = np.zeros(tbl.shape, np.float32)
    phys.reshape(-1, dim)[:rows] = logical
    p_packed = {"params": {"table": jnp.asarray(phys)}}
    np.testing.assert_array_equal(
        np.asarray(plain.apply(p_plain, ids)), np.asarray(packed.apply(p_packed, ids))
    )
    # gradients agree row-for-row under the same transplant map
    g_plain = jax.grad(lambda p: (plain.apply(p, ids) ** 2).sum())(p_plain)
    g_packed = jax.grad(lambda p: (packed.apply(p, ids) ** 2).sum())(p_packed)
    np.testing.assert_allclose(
        np.asarray(g_packed["params"]["table"]).reshape(-1, dim)[:rows],
        np.asarray(g_plain["params"]["table"]),
        rtol=1e-6,
    )


def test_pack_factor_auto_threshold():
    from mmlrec_tpu.ops.embedding import pack_factor_for

    assert pack_factor_for(1000, 16) == 1  # tiny -> plain
    assert pack_factor_for(1 << 20, 16) == 8  # large -> packed
    assert pack_factor_for(1 << 20, 128) == 1  # already lane-wide
    assert pack_factor_for(1 << 20, 24) == 1  # 128 % 24 != 0
    assert pack_factor_for(1 << 20, 32, packed=False) == 1  # explicit off


def test_domain_bn_intended_mode_normalizes_per_domain():
    B, F, D = 64, 3, 2
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(5.0, 2.0, (B, F)), jnp.float32)
    dom = rng.integers(0, D, B)
    mask = jnp.asarray(np.eye(D)[dom], jnp.float32)
    mod = DomainBatchNorm(num_features=F, num_domains=D, mode="intended")
    variables = mod.init(KEY, x, mask, train=True)
    y, mutated = mod.apply(variables, x, mask, train=True, mutable=["batch_stats"])
    y = np.asarray(y)
    for d in range(D):
        rows = y[dom == d]
        np.testing.assert_allclose(rows.mean(axis=0), 0.0, atol=1e-4)
        np.testing.assert_allclose(rows.std(axis=0), 1.0, atol=2e-2)
    # EMA moved toward the domain means
    pm = np.asarray(mutated["batch_stats"]["pop_mean"])
    assert (pm != 0).all()


def test_domain_bn_reference_mode_uses_whole_batch_stats():
    B, F, D = 32, 2, 2
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (B, F)), jnp.float32)
    dom = rng.integers(0, D, B)
    mask = jnp.asarray(np.eye(D)[dom], jnp.float32)
    mod = DomainBatchNorm(num_features=F, num_domains=D, mode="reference")
    variables = mod.init(KEY, x, mask, train=True)
    y, _ = mod.apply(variables, x, mask, train=True, mutable=["batch_stats"])
    m = np.asarray(jnp.mean(x, 0))
    v = np.asarray(jnp.var(x, 0))
    expect = (np.asarray(x) - m) / np.sqrt(v + 1e-5)  # gamma=1, beta=0 at init
    np.testing.assert_allclose(np.asarray(y), expect, rtol=1e-4, atol=1e-5)


def test_domain_bn_eval_uses_population_stats():
    B, F, D = 16, 2, 2
    x = jax.random.normal(KEY, (B, F))
    mask = jnp.asarray(np.eye(D)[np.arange(B) % D], jnp.float32)
    mod = DomainBatchNorm(num_features=F, num_domains=D)
    variables = mod.init(KEY, x, mask, train=True)
    y = mod.apply(variables, x, mask, train=False)
    # pop_mean=0, pop_var=1, gamma=1, beta=0 -> identity
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=1e-4, atol=1e-5)


def test_mlp_bn_dropout_shapes():
    x = jax.random.normal(KEY, (8, 5))
    mod = MLP([7, 3], use_bn=True, dropout_rate=0.5)
    variables = mod.init(KEY, x)
    y, mutated = mod.apply(
        variables, x, train=True, mutable=["batch_stats"], rngs={"dropout": KEY}
    )
    assert y.shape == (8, 3)
    assert "batch_stats" in mutated
    y_eval = mod.apply(variables, x, train=False)
    assert y_eval.shape == (8, 3)


def test_wide_linear_math():
    """WideLinear (reference Linear, basemodel.py:14-66): sum of 1-dim
    sparse embeddings + dense @ weight."""
    import jax
    import numpy as np
    from mmlrec_tpu.ops.layers import WideLinear

    rng = np.random.default_rng(0)
    vocabs, n_dense, B = (5, 7), 3, 8
    ids = jnp.asarray(rng.integers(0, 5, (B, 2)), jnp.int32)
    dense = jnp.asarray(rng.random((B, n_dense)), jnp.float32)
    m = WideLinear(vocab_sizes=vocabs, n_dense=n_dense)
    v = m.init(jax.random.PRNGKey(0), ids, dense)
    out = np.asarray(m.apply(v, ids, dense))
    table = np.asarray(v["params"]["table"])[:, 0]
    kernel = np.asarray(v["params"]["kernel"])
    offsets = np.array([0, 5])
    expect = (
        table[np.asarray(ids) + offsets[None, :]].sum(1, keepdims=True)
        + np.asarray(dense) @ kernel
    )
    np.testing.assert_allclose(out, expect, rtol=1e-6)


def test_snr_gate_grad_finite_when_u_escapes_unit_interval():
    """Regression (protocol parity suite, mssm seeds 1/5): a TRAINED gate u
    pushed past 1.0 by adam must yield finite gradients.  The old clip
    bound 1.0 - 1e-8 rounds to exactly 1.0 in f32, so log1p(-u_safe) was
    -inf and the clip-masked grad 0 * -inf = NaN."""
    import jax
    import numpy as np
    from mmlrec_tpu.ops.layers import SNRGate

    gate = SNRGate(input_dim=2, output_dim=2, units=4, elementwise=True)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(3, 2, 4)), jnp.float32)
    v = gate.init(jax.random.PRNGKey(0), x)
    p = jax.tree.map(lambda a: a, v["params"])
    u = np.asarray(p["u"]).copy()
    u.flat[0] = 1.0001  # adam overshoot past the unit interval
    u.flat[1] = -0.0001
    p["u"] = jnp.asarray(u)

    def loss(params):
        return jnp.sum(gate.apply({"params": params}, x) ** 2)

    val, grads = jax.value_and_grad(loss)(p)
    assert np.isfinite(float(val))
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all()
