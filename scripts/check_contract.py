"""Local replica of the driver's correctness gate: run every
__spark_entry__.queries() entry and its oracle_sql() twin side-by-side,
compare row count, schema width, and order-insensitive values.

Usage: python scripts/check_contract.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from whoosh_novo_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(rows) -> list[tuple]:
    def _c(v):
        if isinstance(v, float):
            return round(v, 9)
        return v

    return sorted(tuple(_c(v) for v in r) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("contract-check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, os_ = entry.queries(), entry.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            failures += 1
            continue
        sql = os_.get(name)
        if sql is None:
            print(f"ok?  {name}: rows={len(srows)} (no oracle — rows-only check)")
            continue
        try:
            res = con.execute(sql)
            ocols = [d[0] for d in res.description]
            orows = [tuple(r) for r in res.fetchall()]
        except Exception as e:
            print(f"FAIL {name}: duckdb error {type(e).__name__}: {e}")
            failures += 1
            continue
        ns, no = norm(srows), norm(orows)
        if sorted(scols) != sorted(ocols):
            print(f"FAIL {name}: schema {scols} vs {ocols}")
            failures += 1
        elif len(ns) != len(no):
            print(f"FAIL {name}: rowcount {len(ns)} vs {len(no)}")
            print("  spark:", ns[:3], "\n  oracle:", no[:3])
            failures += 1
        elif ns != no:
            diffs = [(a, b) for a, b in zip(ns, no) if a != b]
            print(f"FAIL {name}: {len(diffs)} differing rows; first: {diffs[:3]}")
            failures += 1
        else:
            print(f"PASS {name}: {len(ns)} rows")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
