"""Label ontology parity (reference src/model/dataset.py:24-74)."""

import numpy as np

from mmd_tpu.data import labels as lb


def test_category_to_labels_table():
    assert lb.category_to_labels("Support_Text") == (0, 1, 1, 1)
    assert lb.category_to_labels("Support_Multimodal") == (0, 0, 0, 0)
    assert lb.category_to_labels("Insufficient_Text") == (1, 1, 1, 1)
    assert lb.category_to_labels("Insufficient_Multimodal") == (1, 1, 1, 0)
    assert lb.category_to_labels("Refute") == (2, 2, 2, 2)
    # Unknown category defaults to all-NEI (reference dataset.py:124)
    assert lb.category_to_labels("Nonsense") == (1, 1, 1, 1)


def test_reverse_map_roundtrip():
    for cat in lb.CATEGORIES:
        assert lb.labels_to_category(lb.category_to_labels(cat)) == cat
    assert lb.labels_to_category((2, 1, 0, 0)) is None


def test_simplified_mapping():
    # 5-class idx -> 3-class idx: Support_*->0, Insufficient_*->1, Refute->2
    expected = [0, 0, 1, 1, 2]
    for idx, want in enumerate(expected):
        assert lb.convert_to_simplified_category(idx) == want


def test_vectorized_category_to_labels():
    cats = ["Refute", "Support_Text", "UNKNOWN", "Insufficient_Multimodal"]
    out = lb.categories_to_label_array(cats)
    np.testing.assert_array_equal(
        out,
        np.array([[2, 2, 2, 2], [0, 1, 1, 1], [1, 1, 1, 1], [1, 1, 1, 0]]),
    )


def test_paths_to_category_idx():
    arr = np.array([[0, 0, 0, 0], [2, 2, 2, 2], [0, 1, 1, 0]])
    idx = lb.paths_to_category_idx(arr)
    np.testing.assert_array_equal(idx, [1, 4, -1])
