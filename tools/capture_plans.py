"""Capture .explain("formatted") for declared queries into plans/$PLANS_ROUND (default r16)/.

Usage:
    python tools/capture_plans.py <suffix> [query ...]

Writes plans/<round>/<query>_<suffix>.txt for each named query (default:
every bench headline + extended query). The suffix is "before" for the
round-start snapshot and "after" for post-change evidence.

Plans are captured at the bench scale factor dir ($SPARK_GRAFT_SF_DIR,
default /root/testdata/sf0.1) so Exchange counts / join strategies match
what the bench actually runs. Queries whose construction itself runs
Spark jobs (collect-based model derivation, scratch-file roundtrips)
still produce a plan for the RETURNED frame — the jobs run as a side
effect, same as in the bench.
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from dataproc_spark.core import get_spark
from dataproc_spark import queries as registry


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    if not names:
        import bench

        names = list(bench.BENCH_QUERIES) + list(bench.EXTENDED_QUERIES)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(ROOT, "plans", os.environ.get("PLANS_ROUND", "r16"))
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture_plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as exc:  # noqa: BLE001 — capture harness boundary
            plan = f"ERROR capturing plan: {type(exc).__name__}: {exc}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
