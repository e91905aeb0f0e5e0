"""Self-check harness replicating the driver's correctness gate:
run every __spark_entry__.queries() entry on Spark and its oracle_sql()
on DuckDB over the same parquet tables, compare row count + schema +
order-insensitive values.

Usage:
    python tools/check_oracle.py [sf_dir] [query ...]

Defaults to /root/testdata/sf0.01 and all queries. Exit code 0 iff every
checked query matches (rows-only queries must merely run and return a
stable schema).
"""

from __future__ import annotations

import math
import sys
import time

import os as _os

# __file__ is only guaranteed absolute on Python 3.11+; abspath
# keeps `python tools/<script>.py` working everywhere
ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(rows, columns):
    """Sort columns by name, normalize cell values, sort rows — the
    order-insensitive comparable form."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])

    def norm_cell(v):
        if v is None:
            return None
        if isinstance(v, bool):
            return int(v)
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return round(v, 9)
        if isinstance(v, (int, str)):
            return v
        return str(v)

    # rows may contain NULLs (outer joins): sort on a type-tagged key so
    # None/int/str never compare directly
    def row_key(row):
        return tuple(
            (v is not None, type(v).__name__, v) if v is not None
            else (False, "", 0)
            for v in row
        )

    return sorted(
        (tuple(norm_cell(r[i]) for i in order) for r in rows), key=row_key
    )


def main() -> int:
    import duckdb
    from dataproc_spark.core import get_spark
    import __spark_entry__ as entrymod

    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    wanted = [a for a in args if "/" not in a] or None

    spark = get_spark("check_oracle")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = wanted or list(qs)
    unknown = [n for n in names if n not in qs]
    if unknown:
        # fail with a clear message, not a KeyError mid-loop: a typo'ed
        # query name (or a relative sf_dir without '/' misparsed as a
        # name) should not crash before any result prints
        sys.exit(
            f"unknown query name(s): {unknown} — pass registry names "
            "(and sf_dir as a path containing '/')"
        )
    failures = []
    for name in names:
        fn = qs[name]
        t0 = time.perf_counter()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name:28s} spark error: {type(e).__name__}: {str(e)[:2000]}")
            continue
        spark_s = time.perf_counter() - t0
        if name not in oracles:
            print(f"rows  {name:28s} rows={len(srows):7d}  cols={scols} "
                  f"spark={spark_s:5.1f}s (rows-only)")
            continue
        try:
            t1 = time.perf_counter()
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
            duck_s = time.perf_counter() - t1
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name:28s} duckdb error: {str(e)[:2000]}")
            continue
        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"schema: spark={sorted(scols)} duck={sorted(ocols)}")
        elif len(srows) != len(orows):
            problems.append(f"rowcount: spark={len(srows)} duck={len(orows)}")
        else:
            a = normalize(srows, scols)
            b = normalize(orows, ocols)
            if a != b:
                diff = next(
                    (i for i, (x, y) in enumerate(zip(a, b)) if x != y), None
                )
                problems.append(
                    f"values differ at sorted row {diff}:\n"
                    f"        spark={a[diff] if diff is not None else None}\n"
                    f"        duck ={b[diff] if diff is not None else None}"
                )
        if problems:
            failures.append(name)
            print(f"FAIL  {name:28s} rows={len(srows):7d} " + "; ".join(problems))
        else:
            print(
                f"OK    {name:28s} rows={len(srows):7d}  "
                f"spark={spark_s:5.1f}s duck={duck_s:5.1f}s"
            )
    print()
    if failures:
        print(f"{len(failures)}/{len(names)} FAILED: {failures}")
        return 1
    print(f"all {len(names)} queries match")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
