"""Driver-contract smoke: entry() + a sample of queries() at sf0.001."""

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def test_entry_runs(spark):
    df = entry.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"o_orderpriority", "n_rows", "n_invalid"} <= set(df.columns)


def test_queries_have_oracles_or_are_marked(spark):
    qs = entry.queries()
    oracles = entry.oracle_sql()
    assert set(oracles) <= set(qs)
    # every oracle-checked query name resolves to a callable
    assert all(callable(f) for f in qs.values())
    # sql strings reference only pre-registered views
    for sql in oracles.values():
        assert "read_parquet" not in sql


def test_sampled_queries_run_small(spark):
    qs = entry.queries()
    for name in ["q01_pricing_summary", "q15_winner_selection", "q25_cosine_topk"]:
        df = qs[name](spark, SF)
        assert df.count() > 0
