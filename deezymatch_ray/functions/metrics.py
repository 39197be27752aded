"""Evaluation aggregates: classification metrics and Mean Average
Precision, computed the Ray way — per-batch partial counts summed by a
tiny aggregate, full per-group work only inside map_groups.

Reference parity:
- A4 accuracy/precision/recall/F1 (macro + weighted) as in
  rnn_networks.py:415-419/:675-681 (sklearn semantics, zero_division=0).
- A5 MAP as in utils.py:67-95: group pair scores by query string, AP per
  group with the reference's skip-all-negative-groups rule; groups are
  seeded-shuffled before the stable sort to randomize ties exactly like
  the reference's per-group permutation (utils.py:83-86).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def confusion_counts(
    scored: ray.data.Dataset, label_col: str = "label", pred_col: str = "pred",
) -> dict[str, int]:
    """Distributed confusion counts: per-batch partials → driver sum."""

    def fn(batch: pa.Table) -> pa.Table:
        y = np.asarray(batch[label_col].to_pylist(), dtype=bool)
        p = np.asarray(batch[pred_col].to_pylist(), dtype=bool)
        return pa.table({
            "tp": pa.array([int((y & p).sum())], type=pa.int64()),
            "fp": pa.array([int((~y & p).sum())], type=pa.int64()),
            "tn": pa.array([int((~y & ~p).sum())], type=pa.int64()),
            "fn": pa.array([int((y & ~p).sum())], type=pa.int64()),
        })

    parts = scored.map_batches(fn, batch_format="pyarrow")
    return {k: int(parts.sum(k) or 0) for k in ("tp", "fp", "tn", "fn")}


def classification_metrics(counts: dict[str, int]) -> dict[str, float]:
    """accuracy, per-class P/R/F1, macro-F1, weighted-F1 from confusion
    counts (sklearn `average='macro'/'weighted'` semantics, binary)."""
    tp, fp, tn, fn = counts["tp"], counts["fp"], counts["tn"], counts["fn"]
    n = tp + fp + tn + fn

    def prf(tp_, fp_, fn_):
        p = tp_ / (tp_ + fp_) if tp_ + fp_ else 0.0
        r = tp_ / (tp_ + fn_) if tp_ + fn_ else 0.0
        f = 2 * p * r / (p + r) if p + r else 0.0
        return p, r, f

    p1, r1, f1_pos = prf(tp, fp, fn)
    p0, r0, f1_neg = prf(tn, fn, fp)
    n_pos, n_neg = tp + fn, tn + fp
    return {
        "accuracy": (tp + tn) / n if n else 0.0,
        "precision_pos": p1, "recall_pos": r1, "f1_pos": f1_pos,
        "precision_neg": p0, "recall_neg": r0, "f1_neg": f1_neg,
        "macro_f1": (f1_pos + f1_neg) / 2.0,
        "weighted_f1": (f1_pos * n_pos + f1_neg * n_neg) / n if n else 0.0,
    }


def average_precision(y: np.ndarray, scores: np.ndarray) -> float:
    """sklearn ``average_precision_score`` semantics: AP = Σ (R_k - R_{k-1})
    · P_k over descending-score prefixes (ties grouped)."""
    order = np.argsort(-scores, kind="stable")
    y = np.asarray(y, dtype=np.float64)[order]
    s = scores[order]
    # group ties: evaluate only at the last index of each tie run
    distinct = np.flatnonzero(np.concatenate([s[1:] != s[:-1], [True]]))
    tp_cum = np.cumsum(y)
    n_pos = tp_cum[-1]
    if n_pos == 0:
        return 0.0
    ks = distinct + 1
    prec = tp_cum[distinct] / ks
    rec = tp_cum[distinct] / n_pos
    rec_prev = np.concatenate([[0.0], rec[:-1]])
    return float(((rec - rec_prev) * prec).sum())


def map_score(
    scored: ray.data.Dataset,
    query_col: str = "s1",
    label_col: str = "label",
    score_col: str = "pred_score",
    seed: int = 123,
) -> float:
    """A5 MAP: per-query AP via groupby().map_groups, mean on the driver,
    skipping groups with no positive label (utils.py:88-93)."""

    def ap_group(df: pd.DataFrame) -> pd.DataFrame:
        y = df[label_col].to_numpy(dtype=bool)
        if not y.any():
            return pd.DataFrame({"ap": [], "skip": []})
        rng = np.random.default_rng(seed)
        perm = rng.permutation(len(df))  # tie randomization (utils.py:83-86)
        return pd.DataFrame({
            "ap": [average_precision(y[perm], df[score_col].to_numpy()[perm])],
            "skip": [0],
        })

    aps = scored.groupby(query_col).map_groups(ap_group, batch_format="pandas")
    vals = [r["ap"] for r in aps.take_all()]
    return float(np.mean(vals)) if vals else 0.0
