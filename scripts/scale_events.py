#!/usr/bin/env python3
"""Scale the events table M-fold, schema-preserving (driver-side test tooling).

The events.ts column is physically TIMESTAMP(NANOS) parquet — Spark reads it
(nanosAsLong) but cannot write it back, and the DuckDB oracles need the real
timestamp type for epoch_ns(ts). So the M-fold multiply of events runs here
with pyarrow: copy i shifts event_id and user_id by i * 10^ceil(log10(max+1)),
matching graft.ScaleGen's offsets for the Spark-written tables.

Usage: scale_events.py <srcDir> <dstDir> <multiplier>
"""
import sys
import pyarrow as pa
import pyarrow.parquet as pq


def offset_for(col) -> int:
    mx = max(col.to_pylist())
    off = 1
    while off <= mx:
        off *= 10
    return off


def main() -> None:
    src, dst, m = sys.argv[1], sys.argv[2], int(sys.argv[3])
    t = pq.read_table(f"{src}/events.parquet")
    ev_off = offset_for(t["event_id"])
    user_off = offset_for(t["user_id"])
    copies = []
    for i in range(m):
        cols = {}
        for name in t.schema.names:
            if name == "event_id":
                cols[name] = pa.compute.add(t[name], i * ev_off)
            elif name == "user_id":
                cols[name] = pa.compute.add(t[name], i * user_off)
            else:
                cols[name] = t[name]
        copies.append(pa.table(cols, schema=t.schema))
    out = pa.concat_tables(copies)
    pq.write_table(out, f"{dst}/events.parquet",
                   use_deprecated_int96_timestamps=False,
                   coerce_timestamps=None)
    print(f"[scale_events] {out.num_rows} rows -> {dst}/events.parquet")


if __name__ == "__main__":
    main()
