"""Driver-contract guard rails for ``__ray_entry__``.

The driver's correctness gate runs every ``queries()`` entry AND its
``oracle_sql()`` string at sf0.01. These tests catch the cheap failure
modes before the driver does: an oracle that no longer parses/plans in
DuckDB, an oracle key without a query, or a query surface that drifted
(missing callables). Full value comparison stays where it belongs —
per-stage oracle tests and the driver's own sweep — so this file adds
seconds, not minutes.
"""

from __future__ import annotations

import duckdb
import pytest

SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def entry():
    import __ray_entry__ as E

    return E


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return c


def test_every_oracle_key_has_a_query(entry):
    qs, os_ = entry.queries(), entry.oracle_sql()
    assert set(os_) <= set(qs), sorted(set(os_) - set(qs))
    # the one intentionally rows-only query (model scores are not SQL)
    assert set(qs) - set(os_) == {"rank_part_names"}


def test_every_oracle_sql_plans_in_duckdb(entry, con):
    """EXPLAIN each oracle against the real sf0.001 views: catches
    syntax errors, renamed columns and type errors without paying the
    execution cost of the heavy recursive/self-join oracles."""
    for name, sql in entry.oracle_sql().items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as e:  # pragma: no cover - failure path
            pytest.fail(f"oracle_sql[{name!r}] does not plan: {e}")


def test_queries_are_callables(entry):
    for name, fn in entry.queries().items():
        assert callable(fn), name
