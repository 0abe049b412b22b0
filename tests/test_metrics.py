"""mammodissect.metrics vs scikit-learn reference implementations."""
import numpy as np
import pytest
import sklearn.metrics as skm

from mammodissect import metrics as M

RNG = np.random.default_rng(3)


@pytest.fixture(scope="module", params=[50, 501])
def labeled(request):
    n = request.param
    gt = (RNG.random(n) < 0.3).astype(np.float64)
    pred = np.clip(RNG.normal(loc=gt * 0.4 + 0.3, scale=0.25), 0, 1)
    return gt, pred


def test_auroc(labeled):
    gt, pred = labeled
    assert M.auroc(gt, pred) == pytest.approx(skm.roc_auc_score(gt, pred), abs=1e-10)


def test_auroc_with_ties():
    gt = np.array([0, 0, 1, 1, 0, 1])
    pred = np.array([0.5, 0.5, 0.5, 0.9, 0.1, 0.9])
    assert M.auroc(gt, pred) == pytest.approx(skm.roc_auc_score(gt, pred), abs=1e-10)


def test_auroc_degenerate():
    assert np.isnan(M.auroc([1, 1], [0.2, 0.3]))


def test_pr_auc(labeled):
    gt, pred = labeled
    prec, rec, _ = skm.precision_recall_curve(gt, pred)
    assert M.pr_auc(gt, pred) == pytest.approx(skm.auc(rec, prec), abs=1e-8)


def test_compute_auprc(labeled):
    gt, pred = labeled
    assert M.compute_auprc(gt, pred) == pytest.approx(
        skm.average_precision_score(gt, pred), abs=1e-8
    )


def test_pfbeta_known_values():
    gt = np.array([1, 1, 0, 0])
    pred = np.array([1.0, 1.0, 0.0, 0.0])
    assert M.pfbeta(gt, pred) == pytest.approx(1.0)
    assert M.pfbeta_binarized(gt, pred) == pytest.approx(1.0)
    # all-prob 0.5: c_precision = 1/2, c_recall = 1/2 -> pF1 = 1/2
    assert M.pfbeta(gt, np.full(4, 0.5)) == pytest.approx(0.5)


def test_pfbeta_binarized_maximizes(labeled):
    gt, pred = labeled
    best = M.pfbeta_binarized(gt, pred)
    for th in np.linspace(0.01, 0.99, 33):
        assert best >= M.pfbeta(gt, (pred >= th).astype(float)) - 1e-9


def test_accuracy():
    assert M.compute_accuracy_np_array([1, 0, 1], [1, 1, 1]) == pytest.approx(2 / 3)


def test_f1_macro(labeled):
    gt = RNG.integers(0, 4, size=100)
    pred = RNG.integers(0, 4, size=100)
    assert M.f1_macro(gt, pred) == pytest.approx(skm.f1_score(gt, pred, average="macro"))


def test_optimal_roc_threshold():
    gt = np.array([0, 0, 0, 1, 1, 1])
    pred = np.array([0.1, 0.2, 0.3, 0.7, 0.8, 0.9])
    th = M.optimal_roc_threshold(gt, pred)
    assert 0.3 < th <= 0.7


def test_optimal_roc_threshold_with_ties():
    """Regression: Youden-J must be evaluated at DISTINCT thresholds only —
    pred >= th cannot stop inside a tie group, and the mid-tie cumulative
    positions previously inflated J at unreachable operating points."""
    from mammodissect.metrics import optimal_roc_threshold

    gt = np.array([1, 0, 0, 1, 0])
    pred = np.array([0.5, 0.5, 0.5, 0.4, 0.3])
    th = optimal_roc_threshold(gt, pred)
    assert th == 0.4  # J(0.4)=+1/3 beats J(0.5)=-1/6 and J(0.3)=0


def test_pallas_fits_bounds_units():
    from mammodissect.ops.pallas_wpmi import pallas_fits

    assert pallas_fits(2000)                       # image bound only
    assert pallas_fits(2000, 512, 100)             # per-layer width: enabled
    assert not pallas_fits(2000, 6992, 100)        # all-layer concat: SMEM-bound
    assert not pallas_fits(100_000)                # VMEM-bound
