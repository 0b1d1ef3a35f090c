"""Driver-contract checks: entry() runs, queries()/oracle_sql() keys align,
and a sampled subset matches the DuckDB oracle (the driver's gate, locally)."""

import duckdb
import pytest

import __spark_entry__ as entrymod
from tools.selfcheck import TABLES, compare

SAMPLE = ["sink_counts", "final_state", "reconcile_findings", "watermarks"]


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert len(df.columns) > 0
    assert df.count() >= 0


def test_oracle_keys_subset_of_queries():
    q, o = entrymod.queries(), entrymod.oracle_sql()
    assert set(o) <= set(q)
    # every query is either oracled or deliberately rows-only
    assert len(o) >= 15


@pytest.mark.parametrize("name", SAMPLE)
def test_query_matches_oracle(spark, sf_dir, name):
    q, o = entrymod.queries(), entrymod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    spdf = q[name](spark, sf_dir).toPandas()
    dpdf = con.execute(o[name]).df()
    assert compare(name, spdf, dpdf) == []
