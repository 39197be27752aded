"""Batch similarity kernels vs scalar references and DuckDB's built-in
levenshtein / jaro_winkler_similarity (independent oracle)."""

from __future__ import annotations

import random

import duckdb
import numpy as np
import pytest

from deezymatch_ray.functions.similarity import (
    jaro_batch,
    jaro_winkler_batch,
    levenshtein_batch,
    soundex,
)


def _lev_scalar(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _rand_pairs(n=300, seed=7):
    rng = random.Random(seed)
    alpha = "abcdefgç éÑ池"
    out = []
    for _ in range(n):
        la, lb = rng.randint(0, 12), rng.randint(0, 12)
        out.append(
            ("".join(rng.choice(alpha) for _ in range(la)),
             "".join(rng.choice(alpha) for _ in range(lb)))
        )
    # adversarial cases
    out += [("", ""), ("a", ""), ("", "a"), ("abc", "abc"), ("martha", "marhta"),
            ("dixon", "dicksonx"), ("Крутой", "Krutoy"), ("aaaa", "aaa")]
    return out


def test_levenshtein_matches_scalar_and_duckdb():
    pairs = _rand_pairs()
    s1 = [a for a, _ in pairs]
    s2 = [b for _, b in pairs]
    got = levenshtein_batch(s1, s2)
    want = np.array([_lev_scalar(a, b) for a, b in pairs])
    np.testing.assert_array_equal(got, want)
    con = duckdb.connect()
    for (a, b), g in zip(pairs, got):
        # duckdb's levenshtein is BYTE-based; parity only holds for ASCII
        # (oracle SQL queries therefore use ASCII columns only)
        if a and b and a.isascii() and b.isascii():
            (d,) = con.execute("select levenshtein(?, ?)", [a, b]).fetchone()
            assert d == g, (a, b)


def test_jaro_winkler_matches_duckdb():
    pairs = _rand_pairs(seed=13)
    s1 = [a for a, _ in pairs]
    s2 = [b for _, b in pairs]
    got = jaro_winkler_batch(s1, s2)
    con = duckdb.connect()
    for (a, b), g in zip(pairs, got):
        if not a or not b or not a.isascii() or not b.isascii():
            continue  # duckdb similarity functions are byte-based
        (d,) = con.execute("select jaro_winkler_similarity(?, ?)", [a, b]).fetchone()
        assert abs(d - g) < 1e-9, (a, b, d, g)


def test_jaro_known_values():
    got = jaro_batch(["martha", "dixon"], ["marhta", "dicksonx"])
    np.testing.assert_allclose(got, [0.944444444, 0.766666666], atol=1e-8)
    jw = jaro_winkler_batch(["martha"], ["marhta"])
    np.testing.assert_allclose(jw, [0.9611111111], atol=1e-9)


@pytest.mark.parametrize(
    "s,code",
    [
        ("Robert", "R163"),
        ("Rupert", "R163"),
        ("Ashcraft", "A261"),
        ("Ashcroft", "A261"),
        ("Tymczak", "T522"),
        ("Pfister", "P236"),
        ("Honeyman", "H555"),
        ("Крутой", ""),  # no ASCII letters → no phonetic key
    ],
)
def test_soundex(s, code):
    assert soundex(s) == code
