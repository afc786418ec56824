"""PCGrad math validation (VERDICT r3 #4).

The reference spells the intended math out in model/optimizer.py:47-67
(_project_conflicting) but ships a broken call site (a scalar total loss
where a list of objectives is expected, basemodel.py:309-310).  These
tests pin mmlrec_tpu.train.pcgrad.pcgrad_merge to:

* hand-computed conflicting / agreeing 2-3 task cases,
* the projection property (projected g_i . g_j >= 0 for conflicts; for
  T=2 it holds exactly, and each projection never grows the norm),
* a line-for-line numpy replica of the reference's _project_conflicting
  with the per-iteration random.shuffle replaced by identity order (our
  documented deterministic-order deviation), over random inputs,
* shared-vs-task-specific merge granularity (mean on shared parameter
  tensors, sum on task-specific ones — reference optimizer.py:52-66).
"""

import jax.numpy as jnp
import numpy as np

from mmlrec_tpu.train.pcgrad import pcgrad_merge


def _merge_vec(task_grads):
    """pcgrad_merge on single-leaf vector pytrees -> np vector."""
    out = pcgrad_merge([{"w": jnp.asarray(g, jnp.float32)} for g in task_grads])
    return np.asarray(out["w"])


def test_pcgrad_hand_computed_conflict():
    """g1=[1,0], g2=[-1,1]: g1.g2=-1<0.
    g1' = g1 - (-1/2)g2 = [0.5, 0.5]; g2' = g2 - (-1/1)g1 = [0, 1];
    both leaves nonzero everywhere -> shared -> mean = [0.25, 0.75]."""
    merged = _merge_vec([[1.0, 0.0], [-1.0, 1.0]])
    np.testing.assert_allclose(merged, [0.25, 0.75], atol=1e-6)


def test_pcgrad_agreeing_tasks_untouched():
    """Non-conflicting gradients pass through: mean of the originals."""
    merged = _merge_vec([[1.0, 0.0], [1.0, 1.0]])
    np.testing.assert_allclose(merged, [1.0, 0.5], atol=1e-6)


def test_pcgrad_three_task_hand_computed():
    """Three tasks, sequential projection in deterministic order
    j = 0..T-1 (the reference shuffles; ours is pinned).  Worked by hand:

    g0=[2,0], g1=[0,2], g2=[-1,-1]
    task0: j0 self no-op; j1 dot=0 no-op; j2 dot=-2<0, coef=-2/2=-1
           -> g0' = [2,0] + [-1,-1]... minus coef*g2 = [2,0] - (-1)[-1,-1]
           = [1,-1]
    task1: j0 dot=0; j1 self; j2 dot=-2, coef=-1 -> [0,2]-(-1)[-1,-1]=[-1,1]
    task2: j0 dot=-2<0 coef=-2/4=-0.5 -> [-1,-1]+0.5[2,0]=[0,-1]
           j1 dot(g, g1)= -2 <0 coef=-0.5 -> [0,-1]+0.5[0,2]=[0,0]
           j2 dot=0 no-op -> [0,0]
    all shared -> mean = [0, 0]
    """
    merged = _merge_vec([[2.0, 0.0], [0.0, 2.0], [-1.0, -1.0]])
    np.testing.assert_allclose(merged, [0.0, 0.0], atol=1e-6)


def test_pcgrad_task_specific_params_summed():
    """Per-leaf granularity: a leaf some task leaves at exactly zero is
    task-specific -> merged by SUM; leaves touched by every task -> MEAN
    (reference has_grads prod + merged_grad[~shared] sum)."""
    g0 = {"shared": jnp.asarray([2.0]), "head0": jnp.asarray([1.0, 2.0]),
          "head1": jnp.asarray([0.0, 0.0])}
    g1 = {"shared": jnp.asarray([4.0]), "head0": jnp.asarray([0.0, 0.0]),
          "head1": jnp.asarray([3.0, 5.0])}
    merged = pcgrad_merge([g0, g1])
    # no conflicts (shared grads agree; head dots are 0)
    np.testing.assert_allclose(np.asarray(merged["shared"]), [3.0])  # mean
    np.testing.assert_allclose(np.asarray(merged["head0"]), [1.0, 2.0])  # sum
    np.testing.assert_allclose(np.asarray(merged["head1"]), [3.0, 5.0])  # sum


def _project_pair(gi, gj):
    dot = float(np.dot(gi, gj))
    if dot < 0:
        return gi - dot / (np.dot(gj, gj) + 1e-12) * gj
    return gi


def test_pcgrad_projection_property_two_tasks():
    """For T=2 the PCGrad guarantee is exact: each projected gradient has
    non-negative dot with the OTHER task's original gradient, and
    projection never grows the norm.  Checked by reconstructing the
    per-task projections and verifying the merge equals their mean."""
    rng = np.random.default_rng(0)
    for _ in range(20):
        g = rng.normal(size=(2, 16)).astype(np.float32)
        merged = _merge_vec([g[0], g[1]])
        p0 = _project_pair(g[0], g[1])
        p1 = _project_pair(g[1], g[0])
        assert np.dot(p0, g[1]) >= -1e-4
        assert np.dot(p1, g[0]) >= -1e-4
        assert np.linalg.norm(p0) <= np.linalg.norm(g[0]) + 1e-5
        assert np.linalg.norm(p1) <= np.linalg.norm(g[1]) + 1e-5
        np.testing.assert_allclose(merged, (p0 + p1) / 2, rtol=2e-4,
                                   atol=1e-5)


def _reference_pcgrad_replica(grads):
    """numpy line-for-line replica of the reference _project_conflicting
    (model/optimizer.py:47-67) with random.shuffle -> identity order and
    reduction='mean' (its only reachable branch), all-shared params."""
    pc = [g.astype(np.float64).copy() for g in grads]
    for g_i in pc:
        for g_j in grads:  # reference iterates the ORIGINAL list
            g_i_g_j = np.dot(g_i, g_j)
            if g_i_g_j < 0:
                g_i -= g_i_g_j * g_j / (np.linalg.norm(g_j) ** 2)
    return np.stack(pc).mean(axis=0)


def test_pcgrad_matches_reference_replica():
    """pcgrad_merge == the repaired reference math (identity order) on
    random all-shared inputs, T in {2, 3, 4}."""
    rng = np.random.default_rng(1)
    for T in (2, 3, 4):
        for _ in range(10):
            g = rng.normal(size=(T, 24)).astype(np.float32)
            # make conflicts common
            g[1:] -= 1.2 * g[0] * rng.uniform(0, 1, size=(T - 1, 1))
            want = _reference_pcgrad_replica(list(g))
            got = _merge_vec(list(g))
            np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_pcgrad_multi_leaf_pytree_roundtrip():
    """Pytree structure is preserved and flattening order is consistent:
    a multi-leaf merge equals the single-vector merge of the same data."""
    rng = np.random.default_rng(2)
    a = rng.normal(size=(2, 3)).astype(np.float32)
    b = rng.normal(size=(4,)).astype(np.float32)
    a2 = rng.normal(size=(2, 3)).astype(np.float32)
    b2 = rng.normal(size=(4,)).astype(np.float32)
    tree_merged = pcgrad_merge(
        [{"a": jnp.asarray(a), "b": jnp.asarray(b)},
         {"a": jnp.asarray(a2), "b": jnp.asarray(b2)}]
    )
    flat_merged = _merge_vec(
        [np.concatenate([a.ravel(), b.ravel()]),
         np.concatenate([a2.ravel(), b2.ravel()])]
    )
    got = np.concatenate(
        [np.asarray(tree_merged["a"]).ravel(), np.asarray(tree_merged["b"])]
    )
    np.testing.assert_allclose(got, flat_merged, rtol=1e-5, atol=1e-6)
