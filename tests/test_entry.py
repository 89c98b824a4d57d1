import importlib

import __spark_entry__ as entry_mod


def test_entry_runs(spark):
    importlib.reload(entry_mod)
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"part_id", "constraint", "status", "metrics"} <= set(df.columns)
    assert all(r.status in ("pass", "fail", "insufficient_data", "error") for r in rows)


def test_query_and_oracle_keys_align():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 30
    # every registered query carries a DuckDB value oracle (q30, the last
    # rows-only twin, was retired in round 3 — q40 is the oracled simhash)
    assert set(q) - set(o) == set()
