"""Every oracle-gated query, compared locally against its DuckDB
oracle at sf0.001 — closes the driver's correctness-rotation blind
spot: the per-round CORRECTNESS check caps at 50 of the ~68 queries()
entries, so a regression in a rotated-out query could otherwise hide
for a round. This is the same compare the driver runs (row count,
column names, order-insensitive values), via tools/check_oracle.py.
"""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _oracle_names():
    import __ray_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    missing = sorted(set(oracles) - set(qs))
    assert not missing, f"oracle_sql without queries entry: {missing}"
    return sorted(oracles)


@pytest.fixture(scope="module")
def duck():
    import duckdb

    from tools.check_oracle import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


@pytest.fixture(scope="module")
def entry_mod(ray_session):
    import __ray_entry__ as e

    return e


@pytest.mark.parametrize("name", _oracle_names())
def test_oracle_parity(name, entry_mod, duck):
    from tools.check_oracle import compare, to_pandas

    ray_df = to_pandas(entry_mod.queries()[name](SF_DIR))
    sql_df = duck.sql(entry_mod.oracle_sql()[name]).df()
    errs = compare(name, ray_df, sql_df)
    assert not errs, f"{name}: " + "; ".join(errs)
