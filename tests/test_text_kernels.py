"""Tokenizer/normalizer goldens ported from the reference test suite
(DeezyMatch/tests/test_utils.py:8-203) — exact token-list / string
equality — plus vectorized-kernel parity checks."""

from __future__ import annotations

import pyarrow as pa
import pytest

from deezymatch_ray.functions.text import (
    normalize_array,
    normalize_string,
    qgram_keys_table,
    string_split,
)

X = "py 001 $  "


@pytest.mark.parametrize(
    "kwds,expected",
    [
        (
            {"tokenize": ["char"], "prefix_suffix": ["|", "|"]},
            ["|", "p", "y", " ", "0", "0", "1", " ", "$", " ", " ", "|"],
        ),
        (
            {"tokenize": ["char"], "prefix_suffix": ["|", ""]},
            ["|", "p", "y", " ", "0", "0", "1", " ", "$", " ", " "],
        ),
        (
            {"tokenize": ["char"], "prefix_suffix": [""]},
            ["p", "y", " ", "0", "0", "1", " ", "$", " ", " "],
        ),
        (
            {"tokenize": ["char"], "prefix_suffix": ""},
            ["p", "y", " ", "0", "0", "1", " ", "$", " ", " "],
        ),
        (
            {"tokenize": ["ngram"], "min_gram": 1, "max_gram": 1, "prefix_suffix": ""},
            ["p", "y", " ", "0", "0", "1", " ", "$", " ", " "],
        ),
        (
            {
                "tokenize": ["ngram", "word"],
                "min_gram": 3,
                "max_gram": 3,
                "token_sep": "$",
                "prefix_suffix": "",
            },
            ["py ", "y 0", " 00", "001", "01 ", "1 $", " $ ", "$  ", "py 001 ", "  "],
        ),
        (
            {
                "tokenize": ["ngram", "word"],
                "min_gram": 3,
                "max_gram": 3,
                "token_sep": "$",
                "prefix_suffix": ["|", "|"],
            },
            [
                "|py", "py ", "y 0", " 00", "001", "01 ", "1 $", " $ ", "$  ", "  |",
                "py 001 ", "  ",
            ],
        ),
        (
            {"tokenize": ["word"], "token_sep": "default", "prefix_suffix": ""},
            ["py", "001"],
        ),
        (
            {"tokenize": ["word"], "token_sep": "$", "prefix_suffix": ""},
            ["py 001 ", "  "],
        ),
        (
            {"tokenize": ["word"], "token_sep": "$ ", "prefix_suffix": ""},
            ["py", "001"],
        ),
    ],
)
def test_string_split_goldens(kwds, expected):
    assert string_split(X, **kwds) == expected


def test_string_split_gram_assertions():
    with pytest.raises(AssertionError):
        string_split(X, tokenize=["char", "ngram", "word"], min_gram=0, max_gram=3,
                     prefix_suffix=["|", "|"])
    with pytest.raises(AssertionError):
        string_split(X, tokenize=["char", "ngram", "word"], min_gram=3, max_gram=2,
                     prefix_suffix=["|", "|"])


def test_normalize_string_goldens():
    x = " PY _ 001 $ :)  .  .  "
    assert normalize_string(x, lowercase=True, strip=True) == "py _ 001 $ :)  .  ."
    assert normalize_string(x, lowercase=False, strip=True) == "PY _ 001 $ :)  .  ."
    assert normalize_string(x, lowercase=False, strip=False) == " PY _ 001 $ :)  .  .  "


def test_normalize_nfkd_and_latin():
    # NFKD decomposes; lowercase + latin scrub behavior
    s = "Ĉa fé!"
    ref = normalize_string(s, only_latin_letters=True)
    # same per-element result via the vectorized kernel
    arr = normalize_array(pa.array([s]), only_latin_letters=True)
    assert arr.to_pylist() == [ref]


def test_normalize_array_matches_scalar():
    vals = [" PY _ 001 $ :)  .  .  ", "Łódź  ", "Крутой", None, "", "mixed Ça VA "]
    for flags in [
        {},
        {"uni2ascii": False},
        {"lowercase": False},
        {"strip": False},
        {"only_latin_letters": True},
    ]:
        got = normalize_array(pa.array(vals, type=pa.string()), **flags).to_pylist()
        want = [None if v is None else normalize_string(v, **flags) for v in vals]
        assert got == want


def test_qgram_keys_match_string_split():
    texts = ["marta", "ab", "", "martha"]
    ids = list(range(len(texts)))
    tab = qgram_keys_table(
        pa.array(ids, type=pa.int64()), pa.array(texts), n=3, prefix="|", suffix="|",
        distinct=False,
    )
    got: dict[int, list[str]] = {i: [] for i in ids}
    # table is offset-major; regroup per id preserving offset order per id
    for i, k in zip(tab["id"].to_pylist(), tab["key"].to_pylist()):
        got[i].append(k)
    for i, t in zip(ids, texts):
        want = string_split(t, tokenize=["ngram"], min_gram=3, max_gram=3,
                            prefix_suffix=["|", "|"])
        assert sorted(got[i]) == sorted(want), (i, t)
