"""Driver-simulation: run every QUERIES entry on Spark AND its DuckDB
oracle at a given sf, compare row count + schema + order-insensitive
values. Usage:

    python tools/check_oracle.py [sf_dir] [query ...]

Exits nonzero if any hash-checkable query mismatches.
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, ".")

from gelly_streaming_spark.queries import QUERIES  # noqa: E402
from gelly_streaming_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if hasattr(v, "isoformat"):
        return v.isoformat(sep=" ").replace("+00:00", "")
    return str(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [c for _, c in sorted(zip(cols, cols))], out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    failures = []
    for name, (fn, sql) in QUERIES.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = [c.lower() for c in sdf.columns]
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        if sql is None:
            print(f"ok   {name}: rows-only, {len(srows)} rows")
            continue
        try:
            res = con.execute(sql)
            dcols = [d[0].lower() for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        if sorted(scols) != sorted(dcols):
            failures.append(name)
            print(f"FAIL {name}: schema {sorted(scols)} vs {sorted(dcols)}")
            continue
        _, sn = norm_rows(scols, srows)
        _, dn = norm_rows(dcols, drows)
        if len(sn) != len(dn):
            failures.append(name)
            print(f"FAIL {name}: rowcount {len(sn)} vs {len(dn)}")
            s_only = [r for r in sn if r not in set(dn)][:3]
            d_only = [r for r in dn if r not in set(sn)][:3]
            print(f"  spark-only: {s_only}\n  duck-only:  {d_only}")
            continue
        if sn != dn:
            failures.append(name)
            diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
            print(f"FAIL {name}: value mismatch, e.g. {diffs}")
            continue
        print(f"PASS {name}: {len(sn)} rows")
    if failures:
        print(f"\n{len(failures)} FAILURES: {failures}")
        sys.exit(1)
    print("\nall queries match")


if __name__ == "__main__":
    main()
