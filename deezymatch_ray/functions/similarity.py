"""Classical string-similarity kernels, batch-vectorized in NumPy.

The reference delegates distance computation to faiss L2 / sklearn cosine
over learned embeddings (candidateRanker.py:361-392, :420-429); classical
edit distances are the baseline scorers our engine adds alongside the
learned one (per the north star). All kernels operate on *batches* of
pairs: Python-level work is O(batch) string→codepoint conversion only;
the DP/matching loops are vectorized across the pair axis.
"""

from __future__ import annotations

import numpy as np

_MAX_CODEPOINT_DTYPE = np.int32


def _encode_batch(strs: list[str], max_len: int | None = None) -> tuple[np.ndarray, np.ndarray]:
    """Pad a batch of strings into an int32 codepoint matrix.

    Returns (codes [N, L] padded with -1, lengths [N]).
    """
    n = len(strs)
    lens = np.fromiter((len(s) for s in strs), dtype=np.int64, count=n)
    L = int(lens.max()) if n and lens.max() > 0 else 1
    if max_len is not None:
        L = min(L, max_len)
        lens = np.minimum(lens, max_len)
    codes = np.full((n, L), -1, dtype=_MAX_CODEPOINT_DTYPE)
    for i, s in enumerate(strs):
        if s:
            arr = np.frombuffer(s[:L].encode("utf-32-le"), dtype=np.uint32)
            codes[i, : len(arr)] = arr.astype(_MAX_CODEPOINT_DTYPE)
    return codes, lens


def levenshtein_batch(s1: list[str], s2: list[str]) -> np.ndarray:
    """Unit-cost edit distance per pair, vectorized across the batch.

    Classic Wagner–Fischer DP; the two positional loops run over string
    length (≤ max batch length), every op inside is a NumPy vector over
    the N pairs — no Python per-row loop.
    """
    assert len(s1) == len(s2)
    n = len(s1)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    a, la = _encode_batch(list(s1))
    b, lb = _encode_batch(list(s2))
    L1, L2 = a.shape[1], b.shape[1]
    # dp rows over i (prefix of a); inner loop over j has a left-dependency,
    # so iterate j and vectorize across pairs.
    prev = np.broadcast_to(np.arange(L2 + 1, dtype=np.int64), (n, L2 + 1)).copy()
    # positions beyond len(b) must not shrink results: clamp at the end by
    # gathering dp[la, lb]; standard DP already yields dp[i][j] for all j.
    for i in range(1, L1 + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        ai = a[:, i - 1][:, None]  # [n,1]
        cost = (ai != b).astype(np.int64)  # [n, L2]
        for j in range(1, L2 + 1):
            cur[:, j] = np.minimum(
                np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1),
                prev[:, j - 1] + cost[:, j - 1],
            )
        # rows where i > la keep their final row (distance frozen at la)
        done = i > la
        if done.any():
            cur[done] = prev[done]
        prev = cur
    return prev[np.arange(n), lb]


def jaro_batch(s1: list[str], s2: list[str]) -> np.ndarray:
    """Jaro similarity per pair, vectorized across the batch."""
    assert len(s1) == len(s2)
    n = len(s1)
    if n == 0:
        return np.zeros(0, dtype=np.float64)
    a, la = _encode_batch(list(s1))
    b, lb = _encode_batch(list(s2))
    L1, L2 = a.shape[1], b.shape[1]
    match_dist = np.maximum(np.maximum(la, lb) // 2 - 1, 0)  # [n]

    b_valid = np.arange(L2)[None, :] < lb[:, None]  # [n, L2]
    b_matched = np.zeros((n, L2), dtype=bool)
    a_match_j = np.full((n, L1), -1, dtype=np.int64)
    for i in range(L1):
        in_a = i < la
        window = np.abs(i - np.arange(L2)[None, :]) <= match_dist[:, None]
        cand = (a[:, i][:, None] == b) & window & b_valid & ~b_matched
        cand &= in_a[:, None]
        has = cand.any(axis=1)
        j = np.argmax(cand, axis=1)
        b_matched[np.flatnonzero(has), j[has]] = True
        a_match_j[has, i] = j[has]

    m = (a_match_j >= 0).sum(axis=1)  # [n]
    # transpositions: a's matched chars in i-order vs b's matched chars in
    # j-order; scatter both into compact [n, max_m] matrices via cumsum.
    max_m = int(m.max()) if n else 0
    t = np.zeros(n, dtype=np.int64)
    if max_m > 0:
        a_chars = np.full((n, max_m), -1, dtype=_MAX_CODEPOINT_DTYPE)
        b_chars = np.full((n, max_m), -2, dtype=_MAX_CODEPOINT_DTYPE)
        a_has = a_match_j >= 0
        a_rank = np.cumsum(a_has, axis=1) - 1  # rank among matches, by i
        rows, cols = np.nonzero(a_has)
        a_chars[rows, a_rank[rows, cols]] = a[rows, cols]
        b_rank = np.cumsum(b_matched, axis=1) - 1  # rank among matches, by j
        rows_b, cols_b = np.nonzero(b_matched)
        b_chars[rows_b, b_rank[rows_b, cols_b]] = b[rows_b, cols_b]
        t = ((a_chars != b_chars) & (a_chars != -1)).sum(axis=1) // 2

    with np.errstate(divide="ignore", invalid="ignore"):
        mf = m.astype(np.float64)
        jaro = (mf / la + mf / lb + (mf - t) / mf) / 3.0
    jaro = np.where(m == 0, 0.0, jaro)
    # both-empty strings are defined as similarity 1.0
    jaro = np.where((la == 0) & (lb == 0), 1.0, jaro)
    return jaro


def jaro_winkler_batch(
    s1: list[str],
    s2: list[str],
    prefix_weight: float = 0.1,
    boost_threshold: float = 0.7,
    max_prefix: int = 4,
) -> np.ndarray:
    """Jaro–Winkler similarity (standard parameters; matches DuckDB's
    ``jaro_winkler_similarity`` — verified in tests/test_similarity.py)."""
    jaro = jaro_batch(s1, s2)
    n = len(s1)
    if n == 0:
        return jaro
    a, la = _encode_batch(list(s1), max_len=max_prefix)
    b, lb = _encode_batch(list(s2), max_len=max_prefix)
    L = min(a.shape[1], b.shape[1])
    eq = (a[:, :L] == b[:, :L]) & (a[:, :L] != -1)
    # common prefix length = index of first mismatch
    ell = np.where(eq.all(axis=1), eq.sum(axis=1), np.argmin(eq, axis=1))
    boosted = jaro + prefix_weight * ell * (1.0 - jaro)
    return np.where(jaro > boost_threshold, boosted, jaro)


# American Soundex letter→digit codes; unmapped (vowels h w y) drop.
_SOUNDEX_MAP = {
    **dict.fromkeys("bfpv", "1"),
    **dict.fromkeys("cgjkqsxz", "2"),
    **dict.fromkeys("dt", "3"),
    "l": "4",
    **dict.fromkeys("mn", "5"),
    "r": "6",
}


def soundex(s: str) -> str:
    """American Soundex of the first ASCII-letter run of ``s``.

    Used as the phonetic blocking key (SURVEY §7.2 step 4). Non-latin
    strings (no ASCII letter) return "" — callers must treat "" as
    "no phonetic key", not as a joinable value.
    """
    s = s.lower()
    letters = [c for c in s if "a" <= c <= "z"]
    if not letters:
        return ""
    first = letters[0]
    out = first.upper()
    prev_code = _SOUNDEX_MAP.get(first, "")
    for c in letters[1:]:
        code = _SOUNDEX_MAP.get(c, "")
        if c in "hw":
            continue  # h/w are transparent: do not reset prev_code
        if code and code != prev_code:
            out += code
            if len(out) == 4:
                break
        prev_code = code
    return (out + "000")[:4]


def soundex_batch(strs: list[str]) -> list[str]:
    return [soundex(s) if s is not None else "" for s in strs]
