"""NumPy metrics vs sklearn ground truth."""

import numpy as np
import pytest
from sklearn import metrics as skm

from mmd_tpu.training import metrics as M


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_f1_matches_sklearn(seed):
    rng = np.random.default_rng(seed)
    y_true = rng.integers(0, 3, 200)
    y_pred = rng.integers(0, 3, 200)
    assert M.f1_score(y_true, y_pred, 3, "weighted") == pytest.approx(
        skm.f1_score(y_true, y_pred, average="weighted"))
    assert M.f1_score(y_true, y_pred, 3, "micro") == pytest.approx(
        skm.f1_score(y_true, y_pred, average="micro"))
    assert M.f1_score(y_true, y_pred, 3, "macro") == pytest.approx(
        skm.f1_score(y_true, y_pred, average="macro"))
    np.testing.assert_allclose(
        M.f1_score(y_true, y_pred, 3, None),
        skm.f1_score(y_true, y_pred, average=None), atol=1e-12)
    assert M.accuracy(y_true, y_pred) == pytest.approx(
        skm.accuracy_score(y_true, y_pred))


def test_precision_recall_match_sklearn():
    rng = np.random.default_rng(3)
    y_true = rng.integers(0, 5, 300)
    y_pred = rng.integers(0, 5, 300)
    prec, rec, f1, support = M.precision_recall_f1(y_true, y_pred, 5)
    sp, sr, sf, ss = skm.precision_recall_fscore_support(
        y_true, y_pred, labels=range(5), zero_division=0)
    np.testing.assert_allclose(prec, sp, atol=1e-12)
    np.testing.assert_allclose(rec, sr, atol=1e-12)
    np.testing.assert_allclose(f1, sf, atol=1e-9)
    np.testing.assert_array_equal(support, ss)


def test_weighted_accuracy_refute_x4():
    # eval_factify.py:59-83 semantics: Refute (class 4) counts 4x
    y_true = np.array([0, 4, 4, 4])
    y_pred = np.array([0, 4, 0, 0])
    # weights: 1,4,4,4 -> correct weight = 1+4 = 5, total 13
    assert M.weighted_accuracy(y_true, y_pred, {4: 4.0}) == pytest.approx(5 / 13)


def test_confusion_and_per_category():
    y_true = np.array([0, 0, 1, 2, 2, 2])
    y_pred = np.array([0, 1, 1, 2, 2, 0])
    cm = M.confusion_matrix(y_true, y_pred, 3)
    np.testing.assert_array_equal(cm, [[1, 1, 0], [0, 1, 0], [1, 0, 2]])
    np.testing.assert_allclose(
        M.per_category_accuracy(y_true, y_pred, 3), [0.5, 1.0, 2 / 3])
