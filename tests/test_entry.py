"""Driver-contract test: every queries() entry runs at sf0.001 and
matches its oracle_sql() in DuckDB (a local simulation of the driver's
CORRECTNESS gate — row count, column names, order-insensitive values).
The full gate (incl. sf0.01) runs via tools/check_oracle.py."""

import sys

import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


@pytest.fixture(scope="module")
def entry_mod(ray_session):
    import __ray_entry__ as e

    return e


def test_entry_smoke(entry_mod):
    out = entry_mod.entry()
    assert len(out) > 0
    assert set(out.columns) == {"query_id", "doc_id", "score"}


def test_oracle_keys_subset(entry_mod):
    qs, os_ = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(os_) <= set(qs)
    # the engine-core queries must all be oracle-gated
    for name in ("bm25_topk", "term_df", "doc_sha256", "dedup_exact"):
        assert name in os_


# parametrize over the LIVE contract: every oracle-gated query is
# checked, every oracle-less query gets the rows-only check — a new
# queries()/oracle_sql() entry is covered the moment it is registered
def _contract_names():
    import __ray_entry__ as e

    oracle = sorted(e.oracle_sql())
    rows_only = sorted(set(e.queries()) - set(e.oracle_sql()))
    return oracle, rows_only


_ORACLE_NAMES, _ROWS_ONLY_NAMES = _contract_names()


@pytest.mark.parametrize("name", _ORACLE_NAMES)
def test_query_matches_oracle(entry_mod, duck, name):
    from tools.check_oracle import compare, to_pandas

    ray_df = to_pandas(entry_mod.queries()[name](SF))
    sql_df = duck.sql(entry_mod.oracle_sql()[name]).df()
    errs = compare(name, ray_df, sql_df)
    assert not errs, errs


@pytest.mark.parametrize("name", _ROWS_ONLY_NAMES)
def test_rows_only_queries_run(entry_mod, name):
    from tools.check_oracle import to_pandas

    df = to_pandas(entry_mod.queries()[name](SF))
    assert isinstance(df, pd.DataFrame)
    assert len(df) >= 0
