#!/usr/bin/env python3
"""Rewrite a Spark-written events.parquet directory as one file whose
`ts` column is TIMESTAMP(NANOS), matching the driver-generated testdata
layout. Spark reads NANOS as BIGINT under
spark.sql.legacy.parquet.nanosAsLong and cannot write the type back, so
a ScaleData scale-up leaves ts as int64 — fine for the engine, but the
DuckDB oracles (date_part on ts) need the timestamp type.

Usage: ts_nanos.py <spark-events-dir> <out-file>
(driver-side tooling, like check.py — the engine itself never uses this)
"""
import glob
import sys

import pyarrow as pa
import pyarrow.dataset as ds
import pyarrow.parquet as pq


def main():
    src, dst = sys.argv[1], sys.argv[2]
    t = ds.dataset(sorted(glob.glob(f"{src}/*.parquet"))).to_table()
    i = t.schema.get_field_index("ts")
    ts = t.column(i).cast(pa.timestamp("ns"))
    t = t.set_column(i, pa.field("ts", pa.timestamp("ns")), ts)
    # version 2.6 keeps NANOS instead of coercing to micros
    pq.write_table(t, dst, version="2.6")
    print(f"wrote {t.num_rows} rows with ts TIMESTAMP(NANOS) to {dst}")


if __name__ == "__main__":
    main()
