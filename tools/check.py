#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py [sfdir] [outdir]
  1. Expects `graft.Verify` to have written outdir/<name>/ parquet + oracle_sql.json
  2. Registers the sfdir parquet tables as DuckDB views
  3. Runs each oracle SQL, compares (schema, rows) against the Spark output

Dev-only tool (driver-side python env); NOT part of the library.
"""
import duckdb, glob, json, os, sys

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm_cell(v):
    import math, datetime
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    return repr(v)

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.isdir(p):
            # Spark-written table (e.g. a ScaleData scale-up): a directory
            # of part files rather than the driver's single-file layout
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            files = sorted(glob.glob(f"{out}/{name}/*.parquet"))
            if not files:
                print(f"FAIL {name}: no spark output")
                n_fail += 1
                continue
            got = con.sql(f"SELECT * FROM read_parquet({files!r})")
            exp = con.sql(sql)
            gcols = sorted(got.columns)
            ecols = sorted(exp.columns)
            if gcols != ecols:
                print(f"FAIL {name}: columns spark={gcols} oracle={ecols}")
                n_fail += 1
                continue
            gtypes = dict(zip(got.columns, [str(t) for t in got.types]))
            etypes = dict(zip(exp.columns, [str(t) for t in exp.types]))
            tmism = {c: (gtypes[c], etypes[c]) for c in gcols if gtypes[c] != etypes[c]}
            grows = sorted([tuple(norm_cell(v) for v in r)
                            for r in got.select(", ".join(f'"{c}"' for c in gcols)).fetchall()])
            erows = sorted([tuple(norm_cell(v) for v in r)
                            for r in exp.select(", ".join(f'"{c}"' for c in ecols)).fetchall()])
            if grows != erows:
                n_fail += 1
                print(f"FAIL {name}: rows spark={len(grows)} oracle={len(erows)}")
                for i, (g, e) in enumerate(zip(grows, erows)):
                    if g != e:
                        print(f"  first diff at sorted row {i}:\n    spark : {g}\n    oracle: {e}")
                        break
                else:
                    if len(grows) != len(erows):
                        longer, which = (grows, "spark") if len(grows) > len(erows) else (erows, "oracle")
                        print(f"  extra row in {which}: {longer[min(len(grows), len(erows))]}")
            elif tmism:
                n_fail += 1
                print(f"FAIL {name}: rows ok but type mismatch {tmism}")
            else:
                n_pass += 1
                print(f"PASS {name} ({len(grows)} rows)")
        except Exception as e:
            n_fail += 1
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:300]}")
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
