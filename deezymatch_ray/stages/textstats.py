"""Text-analysis stages: token counts, quality scores, language ID,
document fingerprints.

All are stateless ``map_batches`` transforms over (id, text); the
quality/token kernels mirror exactly-SQL-expressible formulas so the
driver's DuckDB oracle can verify them value-for-value (rounding applied
identically on both sides).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from deezymatch_ray.functions.dedup import words

_STOPWORDS = ("the", "a")


def text_stats(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """(id, n_chars, n_tokens, uniq_ratio, stop_ratio) per document.

    SQL mirror (DuckDB):
      n_chars   = length(text)
      n_tokens  = len(string_split_regex(trim(text), '\\s+'))
      uniq_ratio= round(len(list_distinct(words))/len(words), 6)
      stop_ratio= round(len(list_filter(words, w -> w in ('the','a')))
                  / len(words), 6)
    """

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        n = len(texts)
        n_tokens = np.zeros(n, dtype=np.int64)
        uniq = np.zeros(n, dtype=np.float64)
        stop = np.zeros(n, dtype=np.float64)
        for i, t in enumerate(texts):
            w = words(t or "")
            n_tokens[i] = len(w)
            uniq[i] = round(len(set(w)) / len(w), 6)
            stop[i] = round(sum(1 for x in w if x in _STOPWORDS) / len(w), 6)
        return pa.table({
            id_col: batch[id_col],
            "n_chars": pc.utf8_length(batch[text_col]).cast(pa.int64()),
            "n_tokens": pa.array(n_tokens),
            "uniq_ratio": pa.array(uniq),
            "stop_ratio": pa.array(stop),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def fingerprints(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """(id, fp) — md5 of lower(trim(text)); identical to DuckDB's
    ``md5(lower(trim(text)))``. The exact-dedup / lineage key."""

    def fn(batch: pa.Table) -> pa.Table:
        norm = pc.utf8_lower(pc.utf8_trim_whitespace(batch[text_col]))
        fps = [hashlib.md5((s or "").encode("utf-8")).hexdigest() for s in norm.to_pylist()]
        return pa.table({id_col: batch[id_col], "fp": pa.array(fps, type=pa.string())})

    return ds.map_batches(fn, batch_format="pyarrow")


WINNOW_B = 257           # polynomial rolling-hash base
WINNOW_M = (1 << 31) - 1  # Mersenne modulus — keeps every SQL-side term in BIGINT


def rolling_fingerprints(
    ds: ray.data.Dataset,
    k: int = 8,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03): polynomial rolling hash over every k-char gram, minimum
    per w-gram window, DISTINCT minima per document → (doc_id, fp).

    Any two documents sharing a substring of length ≥ k + w - 1 share at
    least one fingerprint (the winnowing guarantee), so the fp column is
    a join/groupby key for partial-overlap detection at corpus scale —
    the "rolling hash" fingerprint family next to the exact-dup md5.

    Fully vectorized per document (sliding-window matmul for the hash,
    sliding min for the window) and mirrored exactly by a DuckDB window
    query (__ray_entry__), hence hash parameters in plain integer
    arithmetic rather than a crypto digest.
    """
    powers = np.array(
        [pow(WINNOW_B, k - 1 - j, WINNOW_M) for j in range(k)], dtype=np.int64
    )

    def fn(batch: pa.Table) -> pa.Table:
        from numpy.lib.stride_tricks import sliding_window_view

        ids = batch[id_col].to_pylist()
        texts = batch[text_col].to_pylist()
        out_id: list = []
        out_fp: list[int] = []
        for i, t in enumerate(texts):
            s = t or ""
            if len(s) < k:
                continue
            codes = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
            grams = sliding_window_view(codes, k)          # [n-k+1, k]
            h = ((grams % WINNOW_M) * powers).sum(axis=1) % WINNOW_M
            if len(h) < w:
                mins = np.array([h.min()])
            else:
                mins = sliding_window_view(h, w).min(axis=1)
            for fp in np.unique(mins):
                out_id.append(ids[i])
                out_fp.append(int(fp))
        return pa.table({
            id_col: pa.array(out_id),
            "fp": pa.array(out_fp, type=pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


# character n-gram profiles per language: crude, deterministic heuristic
# (the sandbox has no langid model); profiles chosen from orthographic
# signals that survive in short texts.
_LANG_HINTS: dict[str, tuple[str, ...]] = {
    "de": ("ß", "ü", "ö", "ä", " der ", " und ", " sch"),
    "fr": ("é", "è", "ê", " le ", " la ", " les ", " est "),
    "es": ("ñ", "¿", "¡", " el ", " los ", " es "),
    "zh": ("的", "是", "不", "了"),
}


def lang_id(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """(id, lang_pred) via hint-count heuristic; 'en' when no profile
    fires. Deterministic — same text, same prediction."""

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        preds = []
        for t in texts:
            s = f" {(t or '').lower()} "
            best, best_n = "en", 0
            for lang, hints in _LANG_HINTS.items():
                cnt = sum(s.count(h) for h in hints)
                if cnt > best_n:
                    best, best_n = lang, cnt
            preds.append(best)
        return pa.table({id_col: batch[id_col], "lang_pred": pa.array(preds, type=pa.string())})

    return ds.map_batches(fn, batch_format="pyarrow")


def token_counts(
    ds: ray.data.Dataset, text_col: str = "text"
) -> ray.data.Dataset:
    """Corpus token frequencies (token, n) — flat_map + one groupby
    shuffle; pre-aggregated per batch before shuffling (combiner)."""

    def explode(batch: pa.Table) -> pa.Table:
        from collections import Counter

        counter: Counter = Counter()
        for t in batch[text_col].to_pylist():
            counter.update(words(t or ""))
        return pa.table({
            "token": pa.array(list(counter.keys()), type=pa.string()),
            "partial_n": pa.array(list(counter.values()), type=pa.int64()),
        })

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("partial_n", alias_name="n"))
    )


# BPE-ish pre-tokenizer: letter runs / digit runs / single punctuation —
# the GPT-2-style split shape restricted to a pattern Python's re and
# DuckDB's RE2 interpret identically: no \p classes, and an EXPLICIT
# ASCII whitespace set (\s is Unicode-aware in Python but ASCII-only in
# RE2, so a bare \s would make the two sides tokenize NBSP/vertical-tab
# differently)
BPE_SPLIT_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\t\n\x0b\x0c\r ]"


def token_counts_regex(
    ds: ray.data.Dataset,
    pattern: str = BPE_SPLIT_PATTERN,
    text_col: str = "text",
) -> ray.data.Dataset:
    """Corpus token frequencies under a regex pre-tokenizer (token, n) —
    same combiner-then-groupby shape as ``token_counts``; the compiled
    pattern is the per-batch state."""
    import re

    rx = re.compile(pattern)

    def explode(batch: pa.Table) -> pa.Table:
        from collections import Counter

        counter: Counter = Counter()
        for t in batch[text_col].to_pylist():
            counter.update(rx.findall(t or ""))
        return pa.table({
            "token": pa.array(list(counter.keys()), type=pa.string()),
            "partial_n": pa.array(list(counter.values()), type=pa.int64()),
        })

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("partial_n", alias_name="n"))
    )
