"""Every oracle_sql() entry must EXECUTE in DuckDB.

ADVICE r8 flagged that new oracles can merge unexercised: pytest never
ran oracle SQL, so a syntax/typo bug surfaced only when the driver's
rotating window reached the query — an ambiguous red a round later.
This suite executes every oracle against the sf0.001 views (no Spark
session involved, so it is cheap) and asserts it returns rows with the
declared column names.  Value parity stays the gate's job
(tools/check_oracles.py); this is the merge-time syntax/shape gate.
"""

import os

import duckdb
import pytest

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _oracles():
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entry

    return entry.oracle_sql()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


@pytest.mark.parametrize("name", sorted(_oracles()))
def test_oracle_executes_in_duckdb(con, name):
    cur = con.sql(_oracles()[name])
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    assert cols, name
    assert len(cols) == len(set(cols)), f"{name}: duplicate column names"
    # every oracle returns SOME rows at sf0.001 except genuinely-empty
    # result shapes; an unexpectedly empty oracle is usually a typo'd
    # filter — keep a small allowlist rather than weakening the assert
    may_be_empty = set()
    if name not in may_be_empty:
        assert rows, f"{name}: oracle returned 0 rows at sf0.001"
