"""Local mimic of the driver's correctness gate: run each queries() entry
on Spark and its oracle_sql() twin on DuckDB over the same parquet tables,
compare row count + column names + order-insensitive values.

Usage: python scripts/check_oracle.py [sf_dir] [name ...]
"""

import math
import sys

sys.path.insert(0, ".")

import duckdb  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from chavinha_mini_search_engine_spark.session import get_spark  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_val(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    return str(v)


def rows_key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_val(r[i]) for i in order) for r in rows)


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf)
        srows = sdf.collect()
        scols = [c.lower() for c in sdf.columns]
        if name not in oracles:
            print(f"{name:24s} rows-only: {len(srows)} rows  cols={scols}")
            continue
        res = con.execute(oracles[name])
        ocols = [d[0].lower() for d in res.description]
        orows = res.fetchall()
        status = []
        if sorted(scols) != sorted(ocols):
            status.append(f"COLS {scols} vs {ocols}")
        if len(srows) != len(orows):
            status.append(f"COUNT {len(srows)} vs {len(orows)}")
        if not status:
            sk = rows_key([tuple(r) for r in srows], scols)
            ok = rows_key(orows, ocols)
            if sk != ok:
                diff = [(a, b) for a, b in zip(sk, ok) if a != b][:3]
                status.append(f"VALUES differ, e.g. {diff}")
        if status:
            failures += 1
            print(f"{name:24s} FAIL: {'; '.join(status)}")
        else:
            print(f"{name:24s} OK ({len(srows)} rows)")
    print("FAILURES:", failures)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
