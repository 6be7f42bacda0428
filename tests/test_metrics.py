"""Metric implementations vs scikit-learn (and torchmetrics where semantics differ)."""

import numpy as np
import pytest
import sklearn.metrics as skm

from anomalyclip_tpu.eval import metrics as M


@pytest.fixture(scope="module")
def binary_data():
    rng = np.random.default_rng(0)
    labels = rng.integers(0, 2, size=500)
    scores = np.clip(labels * 0.4 + rng.normal(0.3, 0.25, size=500), 0, 1)
    return scores, labels


def test_roc_curve_matches_sklearn(binary_data):
    scores, labels = binary_data
    fpr, tpr, thr = M.roc_curve(scores, labels)
    want_fpr, want_tpr, want_thr = skm.roc_curve(labels, scores, drop_intermediate=False)
    np.testing.assert_allclose(fpr, want_fpr)
    np.testing.assert_allclose(tpr, want_tpr)
    np.testing.assert_allclose(thr[1:], want_thr[1:])  # sentinel convention differs


def test_auroc_matches_sklearn(binary_data):
    scores, labels = binary_data
    assert M.auroc(scores, labels) == pytest.approx(skm.roc_auc_score(labels, scores))


def test_pr_curve_and_ap_match_sklearn(binary_data):
    scores, labels = binary_data
    precision, recall, _ = M.precision_recall_curve(scores, labels)
    want_p, want_r, _ = skm.precision_recall_curve(labels, scores)
    np.testing.assert_allclose(precision, want_p)
    np.testing.assert_allclose(recall, want_r)
    assert M.average_precision(scores, labels) == pytest.approx(
        skm.average_precision_score(labels, scores)
    )


def test_ties_handled_like_sklearn():
    labels = np.array([0, 1, 0, 1, 1, 0, 0, 1])
    scores = np.array([0.2, 0.2, 0.5, 0.5, 0.5, 0.8, 0.1, 0.1])
    assert M.auroc(scores, labels) == pytest.approx(skm.roc_auc_score(labels, scores))
    assert M.average_precision(scores, labels) == pytest.approx(
        skm.average_precision_score(labels, scores)
    )


def test_per_class_metrics_and_normal_masking():
    rng = np.random.default_rng(1)
    num_classes, t = 5, 400
    labels = rng.integers(0, num_classes, size=t)
    probs = rng.random((t, num_classes))
    mc = M.per_class_auroc(probs, labels, num_classes)
    for c in range(num_classes):
        want = skm.roc_auc_score((labels == c).astype(int), probs[:, c])
        assert mc[c] == pytest.approx(want)

    # absent class -> 0, then nan-masked out of the mean
    labels2 = np.where(labels == 4, 0, labels)
    mc2 = M.per_class_auroc(probs, labels2, num_classes)
    assert mc2[4] == 0.0
    mean = M.mean_excluding_normal(mc2, normal_id=1)
    manual = np.array([mc2[0], mc2[2], mc2[3]])
    assert mean == pytest.approx(manual.mean())


def test_optimal_threshold_is_youden_point(binary_data):
    scores, labels = binary_data
    thr = M.optimal_roc_threshold(scores, labels)
    fpr, tpr, thresholds = skm.roc_curve(labels, scores, drop_intermediate=False)
    want = thresholds[np.argmax(tpr - fpr)]
    assert thr == pytest.approx(want)


def test_f1_and_confusion():
    labels = np.array([0, 0, 1, 1, 1])
    preds = np.array([0, 1, 1, 1, 0])
    assert M.binary_f1(preds, labels) == pytest.approx(skm.f1_score(labels, preds))

    cm = M.confusion_matrix_normalized(preds, labels, 2)
    want = skm.confusion_matrix(labels, preds, normalize="true")
    np.testing.assert_allclose(cm, want)


def test_gated_predictions_semantics():
    scores = np.array([0.1, 0.9, 0.9])
    normal_id = 1
    # columns without normal: [c0, c2]; full = [c0, normal, c2]
    class_probs_full = np.array(
        [[0.5, 0.1, 0.2], [0.1, 0.1, 0.7], [0.8, 0.1, 0.3]]
    )
    y_pred, top1, top5 = M.gated_class_predictions(
        scores, class_probs_full, normal_id, threshold=0.5
    )
    # frame 0 gated -> normal; frame 1 -> argmax over [0.1, 0.7] = c2 (shifted 2)
    np.testing.assert_array_equal(y_pred, [1, 2, 0])
    np.testing.assert_array_equal(top1, [1, 2, 0])
    # gated frame's top-5 list starts with normal id
    assert top5[0][0] == normal_id
    assert top5[1][0] == 2


def test_detection_metrics_block():
    rng = np.random.default_rng(2)
    t, num_classes, normal_id = 300, 4, 2
    labels = rng.integers(0, num_classes, size=t)
    scores = np.where(labels != normal_id, 0.6, 0.3) + rng.normal(0, 0.1, t)
    scores = np.clip(scores, 0, 1)
    class_probs = rng.random((t, num_classes - 1)) * scores[:, None]
    out = M.detection_metrics(scores, labels, class_probs, normal_id, num_classes)
    labels_binary = (labels != normal_id).astype(int)
    assert out["auc_roc"] == pytest.approx(skm.roc_auc_score(labels_binary, scores))
    assert out["auc_pr"] == pytest.approx(skm.average_precision_score(labels_binary, scores))
    assert 0 <= out["mean_mc_auroc"] <= 1


def test_single_class_detection_metrics_are_nan():
    """sklearn refuses single-class labels; returning a finite 0.0 would read
    as a catastrophically bad epoch to early stopping and sweeps, so the
    detection-level metrics return nan (which module._fit's early-stopping
    monitor filters as undefined)."""
    from anomalyclip_tpu.eval.metrics import auroc, average_precision

    scores = np.linspace(0, 1, 16)
    assert np.isnan(auroc(scores, np.zeros(16, dtype=np.int64)))
    assert np.isnan(auroc(scores, np.ones(16, dtype=np.int64)))
    assert np.isnan(average_precision(scores, np.zeros(16, dtype=np.int64)))
