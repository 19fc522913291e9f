#!/usr/bin/env python3
"""Dev-only emulation of the driver's DuckDB oracle compare (NOT engine code).

Usage: python3 tools/check.py [--budget <sec>] <outDir> <sfDir> [query ...]
Reads <outDir>/<name>/ parquet (written by graft.Verify) and
<outDir>/oracle_sql.json, runs each SQL in DuckDB with the sf tables
registered as views, and compares rows/schema/values.

--budget <sec>: ALSO fail (after printing per-query results) when the
oracle SQL wall-clock total exceeds <sec>, printing the slowest oracles.
This is the regression guard for the round-7 failure mode: oracle cost
growing silently with the inventory until the driver's correctness gate
times out and records an EMPTY round. Run the full suite with
`--budget 120` before round end (the healthy full pass is ~30-60 s on
this host; the driver's own budget is far above that, so 120 trips well
before the gate is at risk).
"""
import sys, json, glob, os, time
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(v):
    if isinstance(v, float):
        return round(v, 6)
    return v

def main():
    # --budget is recognized ANYWHERE; any other --flag is an error.
    # Otherwise `check.py OUT SF --budget 120` would silently treat
    # '--budget' as a query-name filter, match nothing, and exit green
    # having checked nothing — the guard must never no-op quietly.
    args = sys.argv[1:]
    budget = None
    i = 0
    rest = []
    while i < len(args):
        if args[i] == "--budget":
            budget = float(args[i + 1]); i += 2
        elif args[i].startswith("--"):
            sys.exit(f"unknown flag {args[i]} (only --budget <sec> is supported)")
        else:
            rest.append(args[i]); i += 1
    out_dir, sf_dir = rest[0], rest[1]
    only = set(rest[2:])
    oracle_secs = {}
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            # Spark-written fixture (ScaleGen tmp/sfN): a directory of
            # part files, vs the driver's single-file testdata layout
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output");  n_bad += 1; continue
        try:
            t0 = time.monotonic()
            exp = con.execute(sql).fetch_arrow_table()
            oracle_secs[name] = time.monotonic() - t0
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_bad += 1; continue
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetch_arrow_table()
        # driver sorts columns by name before hashing
        ecols, gcols = sorted(exp.column_names), sorted(got.column_names)
        if ecols != gcols:
            print(f"FAIL {name}: cols exp={ecols} got={gcols}"); n_bad += 1; continue
        erows = [[norm(v) for v in row] for row in zip(*[exp.column(c).to_pylist() for c in ecols])]
        grows = [[norm(v) for v in row] for row in zip(*[got.column(c).to_pylist() for c in ecols])]
        if len(erows) != len(grows):
            print(f"FAIL {name}: rows exp={len(erows)} got={len(grows)}"); n_bad += 1; continue
        if erows != grows:
            bad = next(i for i, (a, b) in enumerate(zip(erows, grows)) if a != b)
            print(f"FAIL {name}: first diff row {bad}:\n  exp={erows[bad]}\n  got={grows[bad]}")
            n_bad += 1; continue
        # schema (arrow logical types) — driver also checks schema match
        etypes = {c: str(exp.schema.field(c).type) for c in ecols}
        gtypes = {c: str(got.schema.field(c).type) for c in ecols}
        flag = "" if etypes == gtypes else f"  [type-diff exp={etypes} got={gtypes}]"
        print(f"OK   {name}: {len(erows)} rows{flag}")
        n_ok += 1
    if only and n_ok + n_bad == 0:
        sys.exit(f"no query matched the filter {sorted(only)} — "
                 "a typo'd name must not read as a green run")
    print(f"== {n_ok} ok, {n_bad} bad ==")
    if budget is not None:
        total = sum(oracle_secs.values())
        slow = sorted(oracle_secs.items(), key=lambda kv: -kv[1])[:10]
        print(f"== oracle wall {total:.1f}s (budget {budget:.0f}s); slowest: "
              + ", ".join(f"{k}={v:.1f}s" for k, v in slow) + " ==")
        if total > budget:
            print(f"BUDGET EXCEEDED: oracle suite {total:.1f}s > {budget:.0f}s — "
                  "a query's oracle cost grew; fix it (AS MATERIALIZED on "
                  "re-inlined CTEs, tighter tau, smaller closure) before the "
                  "driver's gate repeats round 7's empty-artifact failure")
            sys.exit(1)
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
