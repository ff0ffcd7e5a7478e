"""Driver-contract tests: entry(), queries(), oracle_sql() consistency."""

import os

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


def test_entry_runs(spark):
    import __spark_entry__ as m
    df = m.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "n_points" in df.columns


def test_queries_have_oracles_or_rows_only():
    import __spark_entry__ as m
    qs = m.queries()
    oracles = m.oracle_sql()
    assert len(qs) >= 40
    missing = set(oracles) - set(qs)
    assert not missing  # every oracle belongs to a query


@pytest.mark.parametrize("name", [
    "tpch_q1", "st_point_accessors", "st_contains_point_in_box",
    "text_token_stats", "sim_cosine_topk", "knn_join_k3",
])
def test_query_matches_duckdb_at_sf0001(spark, name):
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as m
    from tools.check_correctness import compare, duck_con
    sdf = m.queries()[name](spark, SF).toPandas()
    odf = duck_con(SF).execute(m.oracle_sql()[name]).fetchdf()
    ok, msg = compare(sdf, odf)
    assert ok, msg
