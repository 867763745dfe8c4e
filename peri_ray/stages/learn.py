"""Distributed model fitting for learned curation filters — the
fastText/DCLM-shaped "train a small quality classifier, score the
corpus" step of web-pipeline curation, on Ray Data's iterative
pattern (like stages.similarity.kmeans_fit): model state lives on the
driver between iterations, each iteration is ONE streaming
``map_batches`` pass emitting a fixed-size gradient partial per block,
and scoring is a shuffle-free broadcast map.

Reference anchor: peri validates records and never learns; this
derives from the north rule's curation framing (quality classifiers
are standard Common-Crawl pipeline stages — e.g. fastText language /
quality filters in CCNet, DCLM, FineWeb-Edu).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


class _LogRegPartial:
    """Batch -> one (grad, loss, n) partial for full-batch logistic
    regression under the broadcast weights.  Fixed size: d+1 floats
    per block regardless of rows."""

    def __init__(self, feature_cols, label_col, w_ref):
        self.feature_cols = list(feature_cols)
        self.label_col = label_col
        self.w_ref = w_ref

    def __call__(self, t: pa.Table) -> pa.Table:
        import ray

        w = ray.get(self.w_ref)
        X = np.column_stack(
            [t.column(c).combine_chunks().cast(pa.float64())
             .fill_null(0.0).to_numpy(zero_copy_only=False)
             for c in self.feature_cols]
            + [np.ones(t.num_rows)])
        y = (t.column(self.label_col).combine_chunks().cast(pa.float64())
             .fill_null(0.0).to_numpy(zero_copy_only=False))
        z = X @ w
        p = 1.0 / (1.0 + np.exp(-z))
        grad = X.T @ (p - y)
        # clipped log-loss (exact zero/one probs would inf out)
        eps = 1e-12
        loss = -np.sum(y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps))
        return pa.table({
            "grad": pa.array([grad.tolist()], pa.list_(pa.float64())),
            "loss": pa.array([float(loss)], pa.float64()),
            "n": pa.array([t.num_rows], pa.int64()),
        })


def logreg_fit(ds, feature_cols: list[str], label_col: str,
               iters: int = 50, lr: float = 0.5, l2: float = 0.0,
               batch_size: int | None = 65536):
    """Full-batch logistic regression by gradient descent — the
    smallest useful learned filter, distributed exactly like
    ``kmeans_fit``: weights (d+1 floats, bias last) re-broadcast with
    ``ray.put`` each iteration; every iteration is one streaming pass
    whose per-block partials are d+1 floats (no shuffle, nothing
    materialized).  Deterministic up to float association order of the
    partial merge (numerically stable in practice; pin tolerances,
    not bits, in tests).  Returns ``(w, mean_losses)``.

    Full-batch GD (not SGD) is the right distributed shape here: one
    pass per step, no sample order, and curation classifiers are tiny
    (a handful of engineered features) so tens of passes are cheap
    relative to one corpus scan at 100 TB — and each pass streams."""
    import ray

    d = len(feature_cols)
    w = np.zeros(d + 1)
    losses = []
    for _ in range(iters):
        w_ref = ray.put(w)
        grad = np.zeros(d + 1)
        loss = 0.0
        n = 0
        for r in ds.map_batches(
                _LogRegPartial(feature_cols, label_col, w_ref),
                batch_format="pyarrow",
                batch_size=batch_size).take_all():
            grad += np.asarray(r["grad"])
            loss += r["loss"]
            n += r["n"]
        if n == 0:
            raise ValueError("logreg_fit: empty input")
        grad = grad / n + l2 * w
        w = w - lr * grad
        losses.append(loss / n)
    return w, losses


def logreg_score(ds, w: np.ndarray, feature_cols: list[str],
                 id_col: str, out_col: str = "score",
                 batch_size: int | None = 65536):
    """Score every row under the trained weights — one shuffle-free
    broadcast map; (id, sigmoid(x·w))."""
    import ray

    w_ref = ray.put(np.asarray(w, np.float64))
    cols = list(feature_cols)

    def _s(t: pa.Table) -> pa.Table:
        ww = ray.get(w_ref)
        X = np.column_stack(
            [t.column(c).combine_chunks().cast(pa.float64())
             .fill_null(0.0).to_numpy(zero_copy_only=False)
             for c in cols] + [np.ones(t.num_rows)])
        p = 1.0 / (1.0 + np.exp(-(X @ ww)))
        return pa.table({id_col: t.column(id_col),
                         out_col: pa.array(p)})

    return ds.map_batches(_s, batch_format="pyarrow",
                          batch_size=batch_size)


def threshold_sweep(ds, score_col: str, label_col: str,
                    thresholds, batch_size: int | None = 65536) -> pa.Table:
    """Classifier operating-curve report: exact TP/FP/FN/TN plus
    precision/recall at each candidate threshold — how a quality-filter
    cutoff is actually chosen before gating a corpus.  One streaming
    pass: each batch emits a (T x 4) int partial (T = #thresholds),
    the driver merges T rows — zero shuffle at any corpus size.  Rows
    with a null score or label are excluded (the SQL WHERE ... IS NOT
    NULL convention); precision/recall are float(int)/float(int) so a
    SQL twin's int->double divisions are bit-identical, null when the
    denominator is zero."""
    th = np.asarray(sorted(thresholds), np.float64)

    def _part(t: pa.Table) -> pa.Table:
        s = t.column(score_col).combine_chunks()
        y = t.column(label_col).combine_chunks()
        ok = pc.and_(pc.is_valid(s), pc.is_valid(y))
        s_ = s.filter(ok).to_numpy(zero_copy_only=False).astype(np.float64)
        y_ = y.filter(ok).to_numpy(zero_copy_only=False).astype(bool)
        tp = np.empty(len(th), np.int64)
        fp = np.empty(len(th), np.int64)
        fn = np.empty(len(th), np.int64)
        tn = np.empty(len(th), np.int64)
        for i, tt in enumerate(th):
            pred = s_ >= tt
            tp[i] = int((pred & y_).sum())
            fp[i] = int((pred & ~y_).sum())
            fn[i] = int((~pred & y_).sum())
            tn[i] = int((~pred & ~y_).sum())
        return pa.table({"threshold": pa.array(th),
                         "tp": pa.array(tp), "fp": pa.array(fp),
                         "fn": pa.array(fn), "tn": pa.array(tn)})

    sums = {float(t): [0, 0, 0, 0] for t in th}
    for r in ds.map_batches(_part, batch_format="pyarrow",
                            batch_size=batch_size).take_all():
        s = sums[r["threshold"]]
        s[0] += r["tp"]
        s[1] += r["fp"]
        s[2] += r["fn"]
        s[3] += r["tn"]
    tps, fps, fns, tns, precs, recs = [], [], [], [], [], []
    for t in th:
        tp, fp, fn, tn = sums[float(t)]
        tps.append(tp)
        fps.append(fp)
        fns.append(fn)
        tns.append(tn)
        precs.append(float(tp) / float(tp + fp) if tp + fp else None)
        recs.append(float(tp) / float(tp + fn) if tp + fn else None)
    return pa.table({
        "threshold": pa.array(th),
        "tp": pa.array(tps, pa.int64()), "fp": pa.array(fps, pa.int64()),
        "fn": pa.array(fns, pa.int64()), "tn": pa.array(tns, pa.int64()),
        "precision": pa.array(precs, pa.float64()),
        "recall": pa.array(recs, pa.float64()),
    })
