"""Time registry queries against a scale-probe dir (see
gen_scale_probe.py) and print one JSON line per query:
``{"name": ..., "sec": ..., "rows": ...}``.

Usage: ``python tools/run_scale_probe.py /tmp/scale100 dedup_minhash
doc_novelty ...`` — results are driven to completion with a count()
(the probe measures execution, not materialization to the driver).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dataproc_spark import get_spark
from dataproc_spark.queries import REGISTRY


def main() -> None:
    sf_dir, names = sys.argv[1], sys.argv[2:]
    spark = get_spark(
        "scale_probe",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE", "64")),
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        fn = REGISTRY[name][0]
        t0 = time.time()
        try:
            rows = fn(spark, sf_dir).count()
            err = None
        except Exception as exc:  # keep probing the rest
            rows, err = -1, f"{type(exc).__name__}: {exc}"[:200]
        print(json.dumps({
            "name": name, "sec": round(time.time() - t0, 1),
            "rows": rows, "err": err,
        }), flush=True)


if __name__ == "__main__":
    main()
