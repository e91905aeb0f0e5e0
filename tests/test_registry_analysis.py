"""Registry-wide analysis smoke: force Catalyst analysis of EVERY batch
query over the real sf0.001 testdata.

The driver's correctness gate records only the first 50 registry entries
per round, so a type regression in a rotated-out query can hide for a
full round (exactly how the r4 events-ts breakage stayed invisible).
Resolving each query's schema catches the whole AnalysisException class
(missing columns, type mismatches, unresolvable expressions) across all
93 entries in seconds — no execution, no oracle needed.

Streaming queries are excluded: constructing them runs a full
availableNow drain (they are covered by the driver window, unit tests,
and tools/check_oracle.py). Queries whose construction writes a sink or
materializes a driver-side scalar still run that part — acceptable at
sf0.001.
"""

from __future__ import annotations

import os

import pytest

from dataproc_spark.queries import REGISTRY

_SF_DIR = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")

#: construction triggers a streaming drain — covered elsewhere, skip here
_STREAMING = {name for name in REGISTRY if name.startswith("stream_")}


@pytest.mark.skipif(
    not os.path.isdir(_SF_DIR), reason="driver testdata not present"
)
@pytest.mark.parametrize(
    "name", [n for n in REGISTRY if n not in _STREAMING]
)
def test_registry_query_analyzes(spark, name):
    fn, _sql = REGISTRY[name]
    df = fn(spark, _SF_DIR)
    assert len(df.schema.fields) > 0, name
