"""lr02: the distributed GD loop must track a NumPy reference doing
the identical arithmetic (same features, same epochs, same learning
rate) to float tolerance — the summation order is the only divergence
allowed. Iterative, so no SQL oracle; this test is the gate."""

from __future__ import annotations

import numpy as np
import pytest

from ntripmonitor_spark.plans.registry import REGISTRY


def _ref_fit(X: np.ndarray, y: np.ndarray, iters: int, lr: float) -> np.ndarray:
    w = np.zeros(X.shape[1])
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(X @ w)))
        w -= lr * (X.T @ (p - y)) / len(y)
    return w


def test_lr02_matches_numpy_reference(spark, sf_dir):
    from ntripmonitor_spark.plans.pipeline import _lr02_features

    feats = _lr02_features(spark, sf_dir).collect()
    y = np.array([r.is_en for r in feats], dtype=float)
    X = np.column_stack([
        np.ones(len(feats)),
        np.array([r.stop_ratio for r in feats]),
        np.array([r.alpha_ratio for r in feats]),
    ])
    w_ref = _ref_fit(X, y, iters=20, lr=1.0)
    acc_ref = float(np.mean((X @ w_ref > 0).astype(int) == y.astype(int)))

    row = REGISTRY["lr02_logreg_quality"].fn(spark, sf_dir).collect()[0]
    got = np.array([row.w0, row.w_stop_ratio, row.w_alpha_ratio])
    assert np.allclose(got, w_ref, atol=1e-6), f"{got} vs {w_ref}"
    assert row.train_acc == pytest.approx(acc_ref, abs=1e-6)
    assert row.n == len(feats)


def test_lr02_learns_signal(spark, sf_dir):
    """The stopword feature genuinely separates English: training
    accuracy must beat the majority-class baseline."""
    row = REGISTRY["lr02_logreg_quality"].fn(spark, sf_dir).collect()[0]
    from ntripmonitor_spark.plans.pipeline import _lr02_features

    feats = _lr02_features(spark, sf_dir)
    base = feats.selectExpr("avg(is_en) as p").collect()[0].p
    majority = max(base, 1 - base)
    assert row.train_acc >= majority, (row.train_acc, majority)
