"""SAP metric parity vs the reference sdf_utils/sap.py (sklearn-based oracle)."""

import os

import numpy as np
import pytest

from msd_tpu.metrics import sap as msap

REF = "/root/reference"
needs_reference = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference repo not mounted"
)


def _ref_sap():
    import importlib.util

    spec = importlib.util.spec_from_file_location("ref_sap", os.path.join(REF, "sdf_utils", "sap.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    n = 120
    codes = rng.normal(size=(n, 6))
    # factor 0 driven by code 0; factor 1 mostly by code 2 with noise
    factors = np.stack(
        [codes[:, 0] * 2 + 0.1 * rng.normal(size=n), np.tanh(codes[:, 2]) + 0.2 * rng.normal(size=n)],
        axis=1,
    )
    binary = (factors[:, :1] > 0).astype(float)
    return factors, codes, binary


@needs_reference
def test_sap_regression_parity(data):
    factors, codes, _ = data
    ref = _ref_sap()
    want = ref.sap(factors, codes, continuous_factors=True, regression=True)
    got = msap.sap(factors, codes, continuous_factors=True, regression=True)
    assert got == pytest.approx(want, abs=1e-6)
    np.testing.assert_allclose(
        msap.sap_score_matrix(factors, codes, regression=True),
        ref.sap_score_matrix(factors, codes, regression=True),
        atol=1e-6,
    )


@needs_reference
def test_sap_classification_parity(data):
    factors, codes, _ = data
    ref = _ref_sap()
    want = ref.sap(factors, codes, continuous_factors=True, nb_bins=3, regression=False)
    got = msap.sap(factors, codes, continuous_factors=True, nb_bins=3, regression=False)
    # decision trees are deterministic given identical inputs/depths
    assert got == pytest.approx(want, abs=1e-6)


@needs_reference
def test_locatello_parity(data):
    factors, codes, binary = data
    ref = _ref_sap()
    want_score, want_matrix = ref.sap_binary_classification_locatello(binary, codes, random_state=0)
    got_score, got_matrix = msap.sap_binary_classification_locatello(binary, codes, random_state=0)
    np.testing.assert_allclose(got_matrix, want_matrix, atol=1e-8)
    assert got_score == pytest.approx(want_score, abs=1e-8)


def test_sap_detects_disentanglement():
    rng = np.random.default_rng(1)
    n = 200
    codes = rng.normal(size=(n, 4))
    # perfectly disentangled: factor = code 1 exactly
    factors = codes[:, 1:2].copy()
    assert msap.sap(factors, codes, regression=True) > 0.9
    # entangled: factor spread over all codes
    factors2 = codes.sum(axis=1, keepdims=True)
    assert msap.sap(factors2, codes, regression=True) < 0.3


def test_holdout_accuracies(data):
    factors, codes, binary = data
    train_acc, test_acc = msap.sap_classification_holdout(binary, codes, continuous_factors=False)
    # code 0 drives the binary factor -> its accuracy should beat noise dims
    assert np.nanmax(train_acc) == train_acc[0, 0]
    assert np.isfinite(test_acc[0, 0])


@needs_reference
def test_prediction_debug_parity(data):
    """SAPDebugPredictions surface: regression/classification/holdout/
    Locatello prediction summaries match the reference (sap.py:177-282,
    :285-393, :396-420, :503-511)."""
    factors, codes, binary = data
    ref = _ref_sap()

    want = ref.sap_regression_predictions(factors, codes, pred_sample_n=3)
    got = msap.sap_regression_predictions(factors, codes, pred_sample_n=3)
    for f in range(len(want)):
        for c in range(len(want[0])):
            assert got[f][c]["pred_mean"] == pytest.approx(want[f][c]["pred_mean"], abs=1e-8)
            assert got[f][c]["pred_std"] == pytest.approx(want[f][c]["pred_std"], abs=1e-8)
            np.testing.assert_allclose(got[f][c]["pred_sample"], want[f][c]["pred_sample"], atol=1e-8)

    wantc = ref.sap_classification_predictions(binary, codes, continuous_factors=False, pred_sample_n=2)
    gotc = msap.sap_classification_predictions(binary, codes, continuous_factors=False, pred_sample_n=2)
    for c in range(codes.shape[1]):
        assert gotc[0][c]["pred_counts"] == wantc[0][c]["pred_counts"]
        assert gotc[0][c]["true_counts"] == wantc[0][c]["true_counts"]
        assert gotc[0][c]["pred_sample"] == wantc[0][c]["pred_sample"]

    wt, ws, wp = ref.sap_classification_holdout_predictions(
        binary, codes, continuous_factors=False, pred_sample_n=2
    )
    gt_, gs, gp = msap.sap_classification_holdout_predictions(
        binary, codes, continuous_factors=False, pred_sample_n=2
    )
    np.testing.assert_allclose(gt_, wt, atol=1e-8)
    np.testing.assert_allclose(gs, ws, atol=1e-8)
    for c in range(codes.shape[1]):
        if wp[0][c] is None:
            assert gp[0][c] is None
            continue
        assert gp[0][c]["test_pred_counts"] == wp[0][c]["test_pred_counts"]
        assert gp[0][c]["test_pred_sample"] == wp[0][c]["test_pred_sample"]

    wl = ref.sap_binary_classification_locatello(binary, codes, return_predictions=True, pred_sample_n=2)
    gl = msap.sap_binary_classification_locatello(binary, codes, return_predictions=True, pred_sample_n=2)
    assert gl[0] == pytest.approx(wl[0], abs=1e-8)
    np.testing.assert_allclose(gl[1], wl[1], atol=1e-8)
    for c in range(codes.shape[1]):
        if wl[2][0][c] is None:
            assert gl[2][0][c] is None
            continue
        assert gl[2][0][c]["pred_counts"] == wl[2][0][c]["pred_counts"]
        assert gl[2][0][c]["pred_sample"] == wl[2][0][c]["pred_sample"]
