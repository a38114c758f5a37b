#!/usr/bin/env python3
"""Per-query DuckDB wall times over a testdata SF dir, using the
oracle SQL a prior `graft.Verify` run dumped (oracle_sql.json).
Mirrors the driver's yardstick: register the parquet tables as views,
warm once, then time a fetchall. Usage:

  python3 tools/duck_times.py /root/testdata/sf0.1 /tmp/graft_verify [reps]
"""
import json
import sys
import time
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, out_dir = Path(sys.argv[1]), Path(sys.argv[2])
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    con = duckdb.connect()
    for t in TABLES:
        p = sf_dir / f"{t}.parquet"
        if p.exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    times = {}
    for name, sql in sorted(oracle.items()):
        try:
            con.execute(sql).fetchall()  # warm
            best = None
            for _ in range(reps):
                t0 = time.monotonic()
                con.execute(sql).fetchall()
                dt = time.monotonic() - t0
                best = dt if best is None else min(best, dt)
            times[name] = round(best, 4)
        except Exception as e:  # noqa: BLE001
            times[name] = f"err: {e}"[:120]
    total = sum(v for v in times.values() if isinstance(v, float))
    print(json.dumps({"total": round(total, 3), "queries": times}, indent=1))


if __name__ == "__main__":
    main()
