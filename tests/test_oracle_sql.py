"""Fast guard: every oracle SQL string must parse/bind in DuckDB against
the real sf0.001 tables (EXPLAIN only — no execution), and every oracle
key must have a matching queries() entry.  Catches SQL typos and
contract drift without waiting for a full selfcheck."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as em

SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def test_oracle_keys_subset_of_queries():
    q, o = em.queries(), em.oracle_sql()
    assert set(o) <= set(q), sorted(set(o) - set(q))


def test_every_oracle_explains(con):
    for name, sql in em.oracle_sql().items():
        try:
            con.sql(f"EXPLAIN {sql}")
        except Exception as e:  # noqa: BLE001
            raise AssertionError(f"oracle {name} failed to bind: {e}") from e


def test_coverage_doc_references_real_queries():
    """Every query name cited in COVERAGE.md must exist in queries() —
    guards the operator->validation map against drift."""
    import re

    text = open("COVERAGE.md").read()
    cited = set(re.findall(r"`([vdomr]\d+_[a-z0-9_]+)`", text))
    assert cited, "coverage map cites no queries?"
    missing = cited - set(em.queries())
    assert not missing, f"COVERAGE.md cites unknown queries: {sorted(missing)}"
