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
    # rows-only checks are the documented exceptions (q30: xxhash64 bit-level
    # fingerprint has no DuckDB equivalent; q29/q34 gained md5-based oracles)
    assert set(q) - set(o) == {"q30_simhash"}
