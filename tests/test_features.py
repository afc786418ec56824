import numpy as np
import pytest

from mmlrec_tpu.features import (
    DenseFeat,
    FeatureLayout,
    SparseFeat,
    VarLenSparseFeat,
    get_feature_names,
)


def test_sparse_auto_dim():
    # reference model/utils.py:337-338: auto -> 6 * vocab**0.25
    f = SparseFeat("a", 10000, "auto")
    assert f.embedding_dim == 6 * int(10000**0.25)


def test_layout_spans_and_input_dim():
    cols = [
        SparseFeat("s1", 10, 4),
        SparseFeat("s2", 20, 4),
        DenseFeat("d1", 3),
        DenseFeat("d2", 1),
    ]
    layout = FeatureLayout(cols)
    assert layout.num_id_slots == 2
    assert layout.num_dense_dims == 4
    assert layout.input_dim == 4 + 4 + 4
    assert layout.sparse_feature_index("s2") == 1
    assert get_feature_names(cols) == ["s1", "s2", "d1", "d2"]


def test_layout_dedupes_by_name():
    cols = [SparseFeat("s", 10, 4), SparseFeat("s", 10, 4), DenseFeat("d", 1)]
    layout = FeatureLayout(cols)
    assert layout.num_id_slots == 1


def test_varlen_layout():
    vl = VarLenSparseFeat(SparseFeat("hist", 50, 8), maxlen=5, combiner="mean",
                          length_name="hist_len")
    layout = FeatureLayout([SparseFeat("s", 10, 8), vl, DenseFeat("d", 1)])
    assert layout.num_id_slots == 1 + 5 + 1
    slot = layout.varlen_slots[0]
    assert (slot.start, slot.end, slot.length_slot) == (1, 6, 6)
    assert layout.input_dim == 8 + 8 + 1


def test_embedding_specs_shared_name():
    a = SparseFeat("a", 10, 4, embedding_name="shared")
    b = SparseFeat("b", 10, 4, embedding_name="shared")
    layout = FeatureLayout([a, b])
    assert list(layout.embedding_specs) == ["shared"]
