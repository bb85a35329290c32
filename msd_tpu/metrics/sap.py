"""SAP disentanglement metrics.

Native implementation of the metric family exposed by the reference's
sdf_utils/sap.py (Kumar et al. SAP, ICLR 2018; Locatello-protocol linear-SVM
variant): per-(factor, latent) score matrices from 1-D predictors, with the
SAP score being the mean top-2 gap per factor.

* regression variant: per-cell linear-regression R^2 (clipped at 0)
  (ref: sdf_utils/sap.py:84-132).
* classification variant: per-cell decision trees with depth selected by
  5-fold CV over depths 1..9 (ref: :135-234), with optional train/test
  holdout accuracies (ref: :285-393).
* Locatello variant: per-cell linear SVM test error; SAP = mean gap between
  the two lowest errors (ref: :423-525).

Factors/codes handling matches the reference: continuous factors are
min-max scaled then binned into ``nb_bins`` via digitize over a [0, 1]
linspace; codes are min-max scaled for classification.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def get_bin_index(x, nb_bins):
    """Discretize a [0,1]-scaled variable into nb_bins (ref: sap.py:26-36)."""
    bins = np.linspace(0, 1, nb_bins + 1)
    return np.digitize(x, bins[:-1], right=False).astype(int)


def _value_counts(values):
    """{value: count} summary of a prediction vector (ref: sap.py:39-43)."""
    if values is None:
        return {}
    vals, counts = np.unique(values, return_counts=True)
    return {float(v): int(n) for v, n in zip(vals, counts)}


def _minmax_scale(x):
    x = np.asarray(x, np.float64)
    lo = np.nanmin(x, axis=0, keepdims=True)
    hi = np.nanmax(x, axis=0, keepdims=True)
    span = np.where(hi - lo > 0, hi - lo, 1.0)
    return (x - lo) / span


def _as_2d(a):
    a = np.asarray(a)
    return a.reshape(-1, 1) if a.ndim == 1 else a


def _linreg_r2(x, y):
    """R^2 of the 1-D least-squares fit y ~ a*x + b."""
    x = x.reshape(-1).astype(np.float64)
    y = y.reshape(-1).astype(np.float64)
    xm, ym = x.mean(), y.mean()
    vx = np.sum((x - xm) ** 2)
    if vx <= 0:
        a = 0.0
    else:
        a = np.sum((x - xm) * (y - ym)) / vx
    pred = a * (x - xm) + ym
    ss_res = np.sum((y - pred) ** 2)
    ss_tot = np.sum((y - ym) ** 2)
    if ss_tot <= 0:
        return 0.0
    return 1.0 - ss_res / ss_tot


def _sap_regression_matrix(factors, codes):
    nf, nc = factors.shape[1], codes.shape[1]
    s = np.zeros((nf, nc))
    for f in range(nf):
        for c in range(nc):
            s[f, c] = max(0.0, _linreg_r2(codes[:, c], factors[:, f]))
    return s


def _best_tree(x, y, max_depths=range(1, 10), cv=5):
    from sklearn import tree
    from sklearn.model_selection import cross_val_score

    best_score, best_sp = 0.0, 0
    for sp in max_depths:
        clf = tree.DecisionTreeClassifier(max_depth=sp)
        try:
            score = cross_val_score(clf, x, y, cv=cv).mean()
        except ValueError:
            score = 0.0
        if score > best_score:
            best_score, best_sp = score, sp
    clf = tree.DecisionTreeClassifier(max_depth=best_sp if best_sp else 1)
    clf.fit(x, y)
    return clf


def _sap_classification_matrix(factors, codes):
    from sklearn.metrics import accuracy_score

    nf, nc = factors.shape[1], codes.shape[1]
    s = np.zeros((nf, nc))
    for f in range(nf):
        for c in range(nc):
            x = codes[:, c].reshape(-1, 1)
            y = factors[:, f].reshape(-1)
            clf = _best_tree(x, y)
            s[f, c] = accuracy_score(clf.predict(x), y)
    return s


def _mean_top2_gap(s_matrix):
    gaps = []
    for f in range(s_matrix.shape[0]):
        row = np.sort(s_matrix[f, :])
        gaps.append(row[-1] - row[-2])
    return float(np.mean(gaps))


def sap(factors, codes, continuous_factors=True, nb_bins=10, regression=True):
    """SAP score (ref: sdf_utils/sap.py:46-81)."""
    factors = _as_2d(factors)
    codes = _as_2d(codes)
    if regression:
        assert continuous_factors, "Cannot perform SAP regression with discrete factors."
        return _mean_top2_gap(_sap_regression_matrix(factors, codes))
    if continuous_factors:
        factors = get_bin_index(_minmax_scale(factors), nb_bins)
    codes = _minmax_scale(codes)
    return _mean_top2_gap(_sap_classification_matrix(factors, codes))


def sap_score_matrix(factors, codes, continuous_factors=True, nb_bins=10, regression=True):
    """Per-(factor, latent) score matrix (ref: sap.py:237-258)."""
    factors = _as_2d(factors)
    codes = _as_2d(codes)
    if regression:
        assert continuous_factors
        return _sap_regression_matrix(factors, codes)
    if continuous_factors:
        factors = get_bin_index(_minmax_scale(factors), nb_bins)
    codes = _minmax_scale(codes)
    return _sap_classification_matrix(factors, codes)


def sap_classification_predictions(
    factors, codes, continuous_factors=True, nb_bins=10, pred_sample_n=0
):
    """Prediction summaries ({pred,true}_counts per (factor, latent) cell)
    from the whole-data Kumar decision trees (ref: sap.py:177-282)."""
    factors = _as_2d(factors)
    codes = _as_2d(codes)
    if continuous_factors:
        factors = get_bin_index(_minmax_scale(factors), nb_bins)
    codes = _minmax_scale(codes)
    nf, nc = factors.shape[1], codes.shape[1]
    pred_info = [[None for _ in range(nc)] for _ in range(nf)]
    for f in range(nf):
        for c in range(nc):
            clf = _best_tree(codes[:, c].reshape(-1, 1), factors[:, f].reshape(-1))
            y_pred = clf.predict(codes[:, c].reshape(-1, 1))
            info = {
                "pred_counts": _value_counts(y_pred),
                "true_counts": _value_counts(factors[:, f]),
            }
            if pred_sample_n and pred_sample_n > 0:
                info["pred_sample"] = y_pred[:pred_sample_n].tolist()
            pred_info[f][c] = info
    return pred_info


def sap_regression_predictions(factors, codes, pred_sample_n=0):
    """Per-cell linear-regression prediction summaries (mean/std[/sample])
    (ref: sap.py:396-420)."""
    factors = _as_2d(factors)
    codes = _as_2d(codes)
    nf, nc = factors.shape[1], codes.shape[1]
    pred_info = [[None for _ in range(nc)] for _ in range(nf)]
    for f in range(nf):
        y = factors[:, f].reshape(-1).astype(np.float64)
        ym = y.mean()
        for c in range(nc):
            x = codes[:, c].reshape(-1).astype(np.float64)
            xm = x.mean()
            vx = np.sum((x - xm) ** 2)
            a = 0.0 if vx <= 0 else np.sum((x - xm) * (y - ym)) / vx
            y_pred = a * (x - xm) + ym
            info = {
                "pred_mean": float(np.mean(y_pred)) if y_pred.size else float("nan"),
                "pred_std": float(np.std(y_pred)) if y_pred.size else float("nan"),
            }
            if pred_sample_n and pred_sample_n > 0:
                info["pred_sample"] = y_pred[:pred_sample_n].tolist()
            pred_info[f][c] = info
    return pred_info


def sap_classification_holdout_predictions(
    factors, codes, continuous_factors=True, nb_bins=10, train_frac=0.8,
    random_state=0, pred_sample_n=0,
):
    """Train/test accuracy matrices + per-cell prediction summaries with an
    80/20 holdout (ref: sap.py:285-393)."""
    from sklearn.metrics import accuracy_score
    from sklearn.model_selection import train_test_split

    factors = _as_2d(factors)
    codes = _as_2d(codes)
    nf, nc = factors.shape[1], codes.shape[1]
    train_acc = np.full((nf, nc), np.nan)
    test_acc = np.full((nf, nc), np.nan)
    pred_info = [[None for _ in range(nc)] for _ in range(nf)]
    if factors.shape[0] < 4:
        return train_acc, test_acc, pred_info
    if continuous_factors:
        factors = get_bin_index(_minmax_scale(factors), nb_bins)
    codes = _minmax_scale(codes)

    for f in range(nf):
        y_all = factors[:, f].reshape(-1)
        for c in range(nc):
            x_all = codes[:, c].reshape(-1, 1)
            mask = np.isfinite(y_all.astype(float)) & np.isfinite(x_all.reshape(-1))
            y, x = y_all[mask], x_all[mask]
            if y.size < 4 or np.unique(y).size < 2:
                continue
            test_size = max(1, int(round((1.0 - train_frac) * y.size)))
            train_size = y.size - test_size
            if train_size < 2:
                continue
            try:
                xt, xs, yt, ys = train_test_split(
                    x, y, test_size=test_size, train_size=train_size,
                    random_state=random_state, stratify=y,
                )
            except ValueError:
                xt, xs, yt, ys = train_test_split(
                    x, y, test_size=test_size, train_size=train_size,
                    random_state=random_state, stratify=None,
                )
            clf = _best_tree(xt, yt)
            yp_t, yp_s = clf.predict(xt), clf.predict(xs)
            train_acc[f, c] = accuracy_score(yt, yp_t)
            test_acc[f, c] = accuracy_score(ys, yp_s)
            info = {
                "train_pred_counts": _value_counts(yp_t),
                "train_true_counts": _value_counts(yt),
                "test_pred_counts": _value_counts(yp_s),
                "test_true_counts": _value_counts(ys),
            }
            if pred_sample_n and pred_sample_n > 0:
                info["train_pred_sample"] = yp_t[:pred_sample_n].tolist()
                info["test_pred_sample"] = yp_s[:pred_sample_n].tolist()
            pred_info[f][c] = info
    return train_acc, test_acc, pred_info


def sap_classification_holdout(
    factors, codes, continuous_factors=True, nb_bins=10, train_frac=0.8, random_state=0
) -> Tuple[np.ndarray, np.ndarray]:
    """Train/test accuracy matrices with an 80/20 holdout
    (ref: sap.py:285-393)."""
    train_acc, test_acc, _ = sap_classification_holdout_predictions(
        factors, codes, continuous_factors=continuous_factors, nb_bins=nb_bins,
        train_frac=train_frac, random_state=random_state,
    )
    return train_acc, test_acc


def sap_binary_classification_locatello(
    factors, codes, train_frac=0.8, C=0.01, random_state=0,
    return_predictions=False, pred_sample_n=0,
):
    """Locatello-protocol SAP: per-cell linear-SVM test errors; score =
    mean gap between the two lowest errors per factor (ref: sap.py:423-525).

    With ``return_predictions`` also returns per-cell prediction summaries
    ({pred,true}_counts[, samples]) for debug logging (ref: :503-511)."""
    from sklearn.metrics import accuracy_score
    from sklearn.model_selection import train_test_split
    from sklearn.preprocessing import StandardScaler
    from sklearn.svm import LinearSVC

    factors = _as_2d(factors)
    codes = _as_2d(codes)
    n = factors.shape[0]
    nf, nc = factors.shape[1], codes.shape[1]
    error_matrix = np.full((nf, nc), np.nan)
    pred_info = [[None for _ in range(nc)] for _ in range(nf)] if return_predictions else None

    def _early():
        if return_predictions:
            return float("nan"), error_matrix, pred_info
        return float("nan"), error_matrix

    if n < 4:
        return _early()
    test_size = max(1, int(round((1.0 - train_frac) * n)))
    train_size = n - test_size
    if train_size < 2:
        return _early()

    for f in range(nf):
        y_all = factors[:, f].reshape(-1)
        for c in range(nc):
            x_all = codes[:, c].reshape(-1, 1)
            mask = np.isfinite(y_all.astype(float)) & np.isfinite(x_all.reshape(-1))
            y, x = y_all[mask], x_all[mask]
            if y.size < 4 or np.unique(y).size < 2:
                continue
            try:
                xt, xs, yt, ys = train_test_split(
                    x, y, test_size=test_size, train_size=train_size,
                    random_state=random_state, stratify=y,
                )
            except ValueError:
                xt, xs, yt, ys = train_test_split(
                    x, y, test_size=test_size, train_size=train_size,
                    random_state=random_state, stratify=None,
                )
            scaler = StandardScaler()
            xt = scaler.fit_transform(xt)
            xs = scaler.transform(xs)
            clf = LinearSVC(C=C, max_iter=5000)
            clf.fit(xt, yt)
            y_pred = clf.predict(xs)
            error_matrix[f, c] = 1.0 - accuracy_score(ys, y_pred)
            if return_predictions:
                info = {
                    "pred_counts": _value_counts(y_pred),
                    "true_counts": _value_counts(ys),
                }
                if pred_sample_n and pred_sample_n > 0:
                    info["pred_sample"] = y_pred[:pred_sample_n].tolist()
                    info["true_sample"] = ys[:pred_sample_n].tolist()
                pred_info[f][c] = info

    gaps = []
    for f in range(nf):
        vals = error_matrix[f, :]
        vals = np.sort(vals[np.isfinite(vals)])
        if vals.size >= 2:
            gaps.append(vals[1] - vals[0])
    score = float(np.mean(gaps)) if gaps else float("nan")
    if return_predictions:
        return score, error_matrix, pred_info
    return score, error_matrix
