#!/usr/bin/env python3
"""Build BENCH_sf1_r{N}.json: the sf1 full-suite bench joined with the
canonical sf0.1 run, recording the per-query sf0.1->sf1 wall-clock
ratio (data grows 10x; a scan-bound query should land near ~10x, a
quadratic one near ~100x, fixed-overhead harness queries near ~1x).
Scale regressions - like the pre-r15 fixed-width SRP 75x blowup -
surface here without waiting for a judge.

Usage: sf1_ratios.py <sf1_bench.json> <sf01_bench.json> <out.json>
"""
import json
import sys


def main() -> None:
    sf1 = json.load(open(sys.argv[1]))
    sf01 = json.load(open(sys.argv[2]))
    ratios = {}
    for q, t1 in sf1["queries"].items():
        t0 = sf01["queries"].get(q)
        if t0 and t0 > 0 and t1 > 0:
            ratios[q] = round(t1 / t0, 2)
    out = {
        "sf1_total": sf1["value"],
        "sf01_total": sf01["value"],
        "total_ratio": round(sf1["value"] / sf01["value"], 2),
        "sf1_duckdb_total": sf1.get("duckdb_total"),
        "sf1_duckdb_count": sf1.get("duckdb_count"),
        "sf1_queries": sf1["queries"],
        "scaling_ratio_sf01_to_sf1": dict(
            sorted(ratios.items(), key=lambda kv: -kv[1])),
        "worst": sorted(ratios.items(), key=lambda kv: -kv[1])[:8],
    }
    json.dump(out, open(sys.argv[3], "w"), indent=1)
    print(json.dumps(out["worst"]))


if __name__ == "__main__":
    main()
