"""Deterministic synthetic data: interleaved text+media span documents.

The engine's primary input (per the task's input hint) is a table

    doc_id: string
    spans:  list<struct<kind:string, text:string, media_ref:string, offset:int32>>

which does not exist in the driver's test tables, so we synthesize it
here — deterministically (fixed seed, no external data), at any scale.
Name corpus + corruption styles mirror the reference's toponym pair data
(``/root/reference/dataset/dataset-string-matching_train.txt``: diacritics,
Cyrillic transliterations, OCR-style edits; pair format per
``data_processing.py:55``). Ground-truth ``entity_id`` goes to a sidecar
table the engine itself never reads.

A document's *join text* (the string used for blocking/scoring) is the
concatenation of its ``kind="text"`` span texts in order; generation
splits each name into 1-3 text spans so the concatenation reconstructs it
exactly, with 0-2 media spans interleaved at seeded positions.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_SYLLABLES = [
    "bra", "kov", "lin", "sta", "ver", "mon", "tal", "gor", "nov", "mir",
    "bel", "kra", "dan", "ros", "chi", "lan", "pet", "sor", "vil", "mar",
    "tan", "bur", "kal", "del", "riv", "san", "ter", "ost", "grad", "pol",
]
_SUFFIXES = ["", "", "o", "a", "sk", "grad", "ville", "burg", "ton", "ia"]

_DIACRITIC_MAP = {"a": "á", "e": "é", "i": "í", "o": "ó", "u": "ú", "c": "ç", "n": "ñ", "s": "š", "z": "ž", "g": "ğ"}
_OCR_MAP = {"o": "0", "l": "1", "i": "l", "e": "c", "m": "rn", "n": "h", "u": "v", "t": "f"}
_TRANSLIT_MAP = {
    "a": "а", "b": "б", "v": "в", "g": "г", "d": "д", "e": "е", "z": "з",
    "i": "и", "k": "к", "l": "л", "m": "м", "n": "н", "o": "о", "p": "п",
    "r": "р", "s": "с", "t": "т", "u": "у", "f": "ф",
}


def make_entity_names(n_entities: int, seed: int = 42) -> list[str]:
    rng = np.random.default_rng(seed)
    names = []
    seen = set()
    while len(names) < n_entities:
        k = int(rng.integers(2, 4))
        name = "".join(_SYLLABLES[i] for i in rng.integers(0, len(_SYLLABLES), k))
        name += _SUFFIXES[int(rng.integers(0, len(_SUFFIXES)))]
        if int(rng.integers(0, 4)) == 0:  # two-word toponym
            k2 = int(rng.integers(1, 3))
            name += " " + "".join(_SYLLABLES[i] for i in rng.integers(0, len(_SYLLABLES), k2))
        name = name.capitalize()
        if name not in seen:
            seen.add(name)
            names.append(name)
    return names


def corrupt_name(name: str, rng: np.random.Generator) -> str:
    """One seeded corruption pass in a reference-like style."""
    style = int(rng.integers(0, 5))
    chars = list(name)
    if style == 0:  # diacritics
        idxs = [i for i, c in enumerate(chars) if c.lower() in _DIACRITIC_MAP]
        for i in idxs:
            if rng.random() < 0.5:
                rep = _DIACRITIC_MAP[chars[i].lower()]
                chars[i] = rep.upper() if chars[i].isupper() else rep
        return "".join(chars)
    if style == 1:  # OCR-style substitutions
        out = []
        for c in chars:
            if c.lower() in _OCR_MAP and rng.random() < 0.25:
                out.append(_OCR_MAP[c.lower()])
            else:
                out.append(c)
        return "".join(out)
    if style == 2:  # transliteration to Cyrillic-style
        out = []
        for c in chars:
            lc = c.lower()
            if lc in _TRANSLIT_MAP:
                rep = _TRANSLIT_MAP[lc]
                out.append(rep.upper() if c.isupper() else rep)
            else:
                out.append(c)
        return "".join(out)
    if style == 3:  # adjacent swap
        if len(chars) > 3:
            i = int(rng.integers(1, len(chars) - 1))
            chars[i], chars[i - 1] = chars[i - 1], chars[i]
        return "".join(chars)
    # style 4: single-char delete or duplicate
    if len(chars) > 3:
        i = int(rng.integers(1, len(chars)))
        if rng.random() < 0.5:
            del chars[i - 1]
        else:
            chars.insert(i, chars[i - 1])
    return "".join(chars)


def make_variant(name: str, entity_id: int, variant_id: int, seed: int = 42) -> str:
    """Deterministic variant v of entity e; variant 0 is the canonical name."""
    if variant_id == 0:
        return name
    rng = np.random.default_rng((seed, entity_id, variant_id))
    v = name
    for _ in range(1 + int(rng.integers(0, 2))):
        v = corrupt_name(v, rng)
    return v


SPAN_TYPE = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)

DOCUMENTS_SCHEMA = pa.schema([("doc_id", pa.string()), ("spans", pa.list_(SPAN_TYPE))])


def _spans_for(doc_id: str, text: str, rng: np.random.Generator) -> list[dict]:
    """Split ``text`` into 1-3 text spans, interleave 0-2 media spans.

    Concatenating the text spans in order reconstructs ``text`` exactly;
    offsets are strictly increasing."""
    n_cuts = int(rng.integers(0, 3))
    cuts = sorted(set(int(c) for c in rng.integers(1, max(len(text), 2), n_cuts) if 0 < c < len(text)))
    pieces = []
    prev = 0
    for c in cuts + [len(text)]:
        pieces.append(text[prev:c])
        prev = c
    spans = []
    offset = 0
    n_media = int(rng.integers(0, 3))
    media_positions = set(int(p) for p in rng.integers(0, len(pieces) + 1, n_media))
    media_idx = 0
    for slot, piece in enumerate(pieces):
        if slot in media_positions:
            spans.append({"kind": "media", "text": "",
                          "media_ref": f"media://img/{doc_id}-{media_idx}",
                          "offset": offset})
            media_idx += 1
            offset += 1
        spans.append({"kind": "text", "text": piece, "media_ref": "", "offset": offset})
        offset += len(piece)
    if len(pieces) in media_positions:
        spans.append({"kind": "media", "text": "",
                      "media_ref": f"media://img/{doc_id}-{media_idx}",
                      "offset": offset})
    return spans


def make_documents(
    n_docs: int, seed: int = 42, variants_per_entity: int = 4
) -> tuple[pa.Table, pa.Table]:
    """Build (documents, truth) tables with ``n_docs`` rows.

    Entities get 1..variants_per_entity+1 documents each (seeded), so
    expected cluster size ≈ (variants_per_entity+2)/2.
    """
    n_entities = max(1, int(n_docs / (1 + (variants_per_entity + 1) / 2)))
    names = make_entity_names(n_entities, seed)
    rng = np.random.default_rng((seed, 1))
    doc_ids: list[str] = []
    spans_col: list[list[dict]] = []
    truth_entity: list[int] = []
    truth_text: list[str] = []
    i = 0
    eid = 0
    while i < n_docs:
        eid_cur = eid % n_entities
        n_var = 1 + int(rng.integers(0, variants_per_entity + 1))
        for v in range(min(n_var, n_docs - i)):
            doc_id = f"d-{i:08d}"
            text = make_variant(names[eid_cur], eid_cur, v, seed)
            doc_rng = np.random.default_rng((seed, 2, i))
            doc_ids.append(doc_id)
            spans_col.append(_spans_for(doc_id, text, doc_rng))
            truth_entity.append(eid_cur)
            truth_text.append(text)
            i += 1
        eid += 1
    documents = pa.table(
        {"doc_id": pa.array(doc_ids, type=pa.string()),
         "spans": pa.array(spans_col, type=pa.list_(SPAN_TYPE))},
        schema=DOCUMENTS_SCHEMA,
    )
    truth = pa.table(
        {"doc_id": pa.array(doc_ids, type=pa.string()),
         "entity_id": pa.array(truth_entity, type=pa.int64()),
         "text": pa.array(truth_text, type=pa.string())}
    )
    return documents, truth


def make_labeled_pairs(
    n_pairs: int, seed: int = 42, max_variant: int = 5, n_entities: int | None = None
) -> pa.Table:
    """Balanced (s1, s2, label) pairs in the reference training format
    (data_processing.py:55): positives are variants of one entity;
    negatives are 50% *blocking-hard* (different entities sharing a
    normalized 3-gram — the population the blocked scorer actually sees)
    and 50% random. ``max_variant`` matches ``make_documents``'s variant
    range so the training distribution covers the corpus distribution."""
    # cap: the syllable name space saturates in the low hundreds of
    # thousands, and generation slows sharply near saturation
    n_entities = n_entities or max(4, min(n_pairs // 4, 50_000))
    names = make_entity_names(n_entities, seed)
    lowered = [n.lower() for n in names]
    # 3-gram index over bounded lowered names for hard-negative sampling
    gram_index: dict[str, list[int]] = {}
    for i, s in enumerate(lowered):
        b = f"|{s}|"
        for g in {b[j : j + 3] for j in range(len(b) - 2)}:
            gram_index.setdefault(g, []).append(i)
    rng = np.random.default_rng((seed, 3))
    s1, s2, label = [], [], []
    for i in range(n_pairs):
        if i % 2 == 0:  # positive
            e = int(rng.integers(0, n_entities))
            v1 = int(rng.integers(0, max_variant))
            v2 = int(rng.integers(1, max_variant))
            s1.append(make_variant(names[e], e, v1, seed))
            s2.append(make_variant(names[e], e, v2, seed))
            label.append(True)
        else:  # negative
            e1 = int(rng.integers(0, n_entities))
            if i % 4 == 1:  # hard negative: shares a blocking 3-gram
                # sample ONE random shared gram's posting list (O(1) per
                # pair; unioning every gram's list is quadratic at scale)
                b = f"|{lowered[e1]}|"
                grams = sorted({b[j : j + 3] for j in range(len(b) - 2)})
                e2 = e1
                for _ in range(4):  # few retries if we drew e1 itself
                    g = grams[int(rng.integers(0, len(grams)))]
                    pool = gram_index.get(g, ())
                    cand = pool[int(rng.integers(0, len(pool)))]
                    if cand != e1:
                        e2 = cand
                        break
                if e2 == e1:
                    e2 = (e1 + 1) % n_entities
            else:
                e2 = int(rng.integers(0, n_entities))
                if e2 == e1:
                    e2 = (e1 + 1) % n_entities
            s1.append(make_variant(names[e1], e1, int(rng.integers(0, max_variant)), seed))
            s2.append(make_variant(names[e2], e2, int(rng.integers(0, max_variant)), seed))
            label.append(False)
    return pa.table({"s1": pa.array(s1), "s2": pa.array(s2), "label": pa.array(label)})


def make_query_candidates(
    n_queries: int = 30, n_candidates: int = 40, seed: int = 42
) -> tuple[pa.Table, pa.Table]:
    """Queries ⊂ corrupted candidate variants (reference sample scale:
    README.md:178-182). When queries == candidates the self-match
    invariant of tests/test_pipeline_ngram.py:102-105 applies."""
    names = make_entity_names(n_candidates, seed)
    cands = pa.table({"name": pa.array(names)})
    rng = np.random.default_rng((seed, 4))
    q = []
    for i in range(n_queries):
        e = int(rng.integers(0, n_candidates))
        q.append(make_variant(names[e], e, int(rng.integers(0, 3)), seed))
    return pa.table({"name": pa.array(q)}), cands


def write_documents(path: str, n_docs: int, seed: int = 42, row_group_size: int = 64 * 1024) -> str:
    """Write documents+truth parquet under ``path`` (a directory)."""
    os.makedirs(path, exist_ok=True)
    documents, truth = make_documents(n_docs, seed)
    pq.write_table(documents, os.path.join(path, "documents_spans.parquet"),
                   row_group_size=row_group_size)
    pq.write_table(truth, os.path.join(path, "truth.parquet"))
    return path
