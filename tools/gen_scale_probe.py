"""Synthesize an Rx replica of sf0.1 in /tmp/scale{R}: dims verbatim,
fact tables replicated with per-replica key shifts, ~24 row groups per
file so scans split into parallel tasks. R comes from $SCALE_R
(default 10); r5 ran 10 and 30, r6 adds 100."""
import os
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc

SRC = "/root/testdata/sf0.1"
R = int(os.environ.get("SCALE_R", "10"))
DST = f"/tmp/scale{R}"
os.makedirs(DST, exist_ok=True)

DIMS = ["region", "nation", "supplier", "part"]
# fact -> {column: offset_source_column}
SHIFTS = {
    "customer": {"c_custkey": "c_custkey"},
    "orders": {"o_orderkey": "o_orderkey", "o_custkey": "c_custkey"},
    "lineitem": {"l_orderkey": "o_orderkey"},
    "events": {"event_id": "event_id", "user_id": "user_id"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
}

# max key per source column (for offsets)
maxes = {}
def maxof(table, col):
    key = (table, col)
    if key not in maxes:
        t = pq.read_table(f"{SRC}/{table}.parquet", columns=[col])
        maxes[key] = pc.max(t[col]).as_py() + 1
    return maxes[key]

COL_SRC_TABLE = {"c_custkey": "customer", "o_orderkey": "orders",
                 "event_id": "events", "user_id": "events",
                 "doc_id": "documents", "vec_id": "embeddings"}

for d in DIMS:
    t = pq.read_table(f"{SRC}/{d}.parquet")
    pq.write_table(t, f"{DST}/{d}.parquet")
    print(d, t.num_rows)

for fact, shifts in SHIFTS.items():
    t = pq.read_table(f"{SRC}/{fact}.parquet")
    reps = []
    for r in range(R):
        cols = {}
        for name in t.column_names:
            col = t[name]
            if name in shifts and r > 0:
                off = maxof(COL_SRC_TABLE[shifts[name]], shifts[name]) * r
                col = pc.add(col, pa.scalar(off, type=col.type))
            cols[name] = col
        reps.append(pa.table(cols))
    big = pa.concat_tables(reps)
    rg = max(1, big.num_rows // 24)
    pq.write_table(big, f"{DST}/{fact}.parquet", row_group_size=rg)
    print(fact, big.num_rows, "rows,", rg, "rows/rowgroup")
print("DONE")
