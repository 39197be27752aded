"""lang_id kernel vs its generated DuckDB oracle on genuinely
multilingual strings (the sf corpora are English word-salad, so the
driver's oracle row only exercises the all-zero → 'en' branch; this
covers the hint-count and tie-break branches)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa
import ray.data

from deezymatch_ray.stages import textstats

MULTILINGUAL = [
    ("d0", "the quick brown fox jumps over the lazy dog"),          # en
    ("d1", "der Hund und die Katze laufen schnell über die Straße"),  # de
    ("d2", "le chat est sur la table et les enfants sont là"),        # fr
    ("d3", "¿dónde está el niño? los señores comen mañana"),          # es
    ("d4", "这是一个测试 他说的不是真的 我们了解了"),                    # zh
    ("d5", ""),                                                       # empty → en
    ("d6", "é è ß ü"),                                                # tie: de beats fr? fr 2 vs de 2 → de
]


def test_rolling_fingerprints_winnowing_guarantee_and_oracle():
    """Winnowing: docs sharing a substring of length ≥ k+w-1 share ≥ 1
    fingerprint; edge docs (shorter than k; fewer than w grams) handled;
    matches the generated DuckDB oracle exactly."""
    import __ray_entry__ as E
    from deezymatch_ray.stages.textstats import rolling_fingerprints

    k, w = 8, 4
    shared = "the quick brown fox jumps"  # len 25 ≥ k+w-1
    rows = [
        ("d0", f"aaa {shared} zzz unique tail one"),
        ("d1", f"bbbbb {shared} other ending entirely"),
        ("d2", "completely different text with no overlap at all"),
        ("d3", "short"),          # < k → no fingerprints
        ("d4", "elevenchars"),    # 11 chars → 4 grams = w → 1 full window
    ]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": [r[0] for r in rows], "text": [r[1] for r in rows],
    }))
    got = rolling_fingerprints(ds, k=k, w=w).to_pandas()
    by_doc = {d: set(g["fp"]) for d, g in got.groupby("doc_id")}
    assert by_doc["d0"] & by_doc["d1"]            # winnowing guarantee
    assert "d3" not in by_doc                     # too short
    assert len(by_doc["d4"]) >= 1
    con = duckdb.connect()
    con.register("documents_src", pd.DataFrame(rows, columns=["doc_id", "text"]))
    con.execute("CREATE VIEW documents AS SELECT * FROM documents_src")
    want = con.execute(E.oracle_sql()["rolling_fingerprints"]).df()
    g = got.sort_values(["doc_id", "fp"]).reset_index(drop=True)
    w_ = want.sort_values(["doc_id", "fp"]).reset_index(drop=True)
    assert g["doc_id"].tolist() == w_["doc_id"].tolist()
    assert g["fp"].tolist() == w_["fp"].tolist()


def test_token_counts_regex_matches_oracle_on_punct_and_digits():
    """BPE-ish regex tokenizer (letter runs / digit runs / single
    punctuation) vs the DuckDB regexp_extract_all oracle on text the sf
    corpus doesn't exercise (punctuation, digits, mixed runs)."""
    import __ray_entry__ as E
    from deezymatch_ray.stages.textstats import token_counts_regex

    rows = [
        ("d0", "hello, world!! it's 2026-08-17... really?"),
        ("d1", "abc123def  45.67 (nested) [brackets]"),
        ("d2", ""),
    ]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": [r[0] for r in rows], "text": [r[1] for r in rows],
    }))
    got = token_counts_regex(ds).to_pandas().sort_values("token").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents_src", pd.DataFrame(rows, columns=["doc_id", "text"]))
    con.execute("CREATE VIEW documents AS SELECT * FROM documents_src")
    want = con.execute(E.oracle_sql()["token_counts_bpe"]).df().sort_values(
        "token").reset_index(drop=True)
    assert got["token"].tolist() == want["token"].tolist()
    assert got["n"].tolist() == want["n"].tolist()
    assert {"123", "45", ".", ",", "(", "["} <= set(got["token"])


def test_lang_id_kernel_matches_generated_oracle():
    import __ray_entry__ as E

    ds = ray.data.from_arrow(pa.table({
        "doc_id": [d for d, _ in MULTILINGUAL],
        "text": [t for _, t in MULTILINGUAL],
    }))
    got = textstats.lang_id(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)

    con = duckdb.connect()
    con.register("documents_src", pd.DataFrame(MULTILINGUAL, columns=["doc_id", "text"]))
    con.execute("CREATE VIEW documents AS SELECT * FROM documents_src")
    want = con.execute(E.oracle_sql()["lang_id"]).df().sort_values("doc_id").reset_index(drop=True)

    assert got["lang_pred"].tolist() == want["lang_pred"].tolist()
    # sanity: the heuristic actually discriminates
    assert got["lang_pred"].tolist()[:6] == ["en", "de", "fr", "es", "zh", "en"]
