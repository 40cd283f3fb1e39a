"""Pre-flight for the driver's correctness gate: run every
__spark_entry__.queries() entry on Spark AND its oracle_sql() on DuckDB at
the same sf dir, compare row count, column names, and an order-insensitive
value multiset.

Usage: python tools/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def normalize(df, float_dp=6):
    import math

    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False):
        vals = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                vals.append("NULL")
            elif isinstance(v, float):
                vals.append(f"{round(v, float_dp):.{float_dp}f}")
            elif isinstance(v, (list, tuple)):
                vals.append(str(list(v)))
            else:
                vals.append(str(v))
        out.append("|".join(vals))
    return cols, sorted(out)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as entry_mod
    from mysql_time_machine_spark.session import get_spark

    spark = get_spark("contract-check", master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, os_ = entry_mod.queries(), entry_mod.oracle_sql()
    failures, passed, weak = [], [], []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = fn(spark, sf_dir).toPandas()
            if name not in os_:
                weak.append(f"{name} (rows={len(got)}, no oracle)")
                continue
            exp = con.sql(os_[name]).df()
            gc, gv = normalize(got)
            ec, ev = normalize(exp)
            if gc != ec:
                failures.append(f"{name}: columns {gc} != {ec}")
            elif len(gv) != len(ev):
                failures.append(f"{name}: rows {len(gv)} != {len(ev)}")
            elif gv != ev:
                bad = next(i for i, (a, b) in enumerate(zip(gv, ev)) if a != b)
                failures.append(f"{name}: value mismatch at sorted-row {bad}:\n  spark={gv[bad]}\n  duck ={ev[bad]}")
            else:
                passed.append(f"{name} ({len(gv)} rows)")
        except Exception as e:  # noqa: BLE001
            failures.append(f"{name}: EXCEPTION {type(e).__name__}: {str(e)[:400]}")

    print(f"PASS ({len(passed)}):")
    for p in passed:
        print("  ✓", p)
    if weak:
        print(f"WEAK/rows-only ({len(weak)}):")
        for w in weak:
            print("  ~", w)
    if failures:
        print(f"FAIL ({len(failures)}):")
        for f_ in failures:
            print("  ✗", f_)
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
