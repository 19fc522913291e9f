#!/usr/bin/env python3
"""Dev-only emulation of the driver's DuckDB oracle compare (NOT engine code).

Usage: python3 tools/check.py [--budget <sec>] [--closure-materialized]
       <outDir> <sfDir> [query ...]
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
import sys, json, glob, os, re, time
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(v):
    if isinstance(v, float):
        return round(v, 6)
    return v


# The transitive-closure block every dupClusters-family oracle carries
# (dupClustersCte in PipelineQueries plus its two inline copies): a
# recursive reach(a, b) materializing FULL pairwise reachability —
# O(n*m) pair rows in DuckDB, 2-25 min per oracle at sf1 — followed by
# the per-node component-min label. --closure-materialized replaces it
# with a linear union-find over the same `und` edge list (component min
# == least(a, min reachable b), exactly minr's label), computed once in
# Python and registered as a table. Both modes are compared query-for-
# query at sf0.01 before trusting the fast mode (see SURVEY round 15).
CLOSURE_RE = re.compile(
    r"reach\(a,\s*b\)\s+AS\s+\(\s*"
    r"SELECT\s+a,\s*b\s+FROM\s+und\s+UNION\s+"
    r"SELECT\s+r\.a,\s*u\.b\s+FROM\s+reach\s+r\s+JOIN\s+und\s+u\s+"
    r"ON\s+r\.b\s*=\s*u\.a\),\s*"
    r"minr\s+AS\s+\(SELECT\s+a\s+AS\s+(\w+),\s*"
    r"least\(a,\s*min\(b\)\)\s+AS\s+cluster\s+"
    r"FROM\s+reach\s+GROUP\s+BY\s+a\)")

# und's own definition (the symmetrized candidate edges): once the edge
# list is cached, rewriting und to read the cache lets DuckDB dead-code
# every prefix CTE that only fed the closure (sigs/bands/cand or the
# kmeans chain) in the FINAL execution — the prefix then runs ONCE (for
# edge collection) instead of twice.
UND_RE = re.compile(
    r"und\s+AS\s+MATERIALIZED\s+\(SELECT\s+doc_a\s+AS\s+a,\s*doc_b\s+AS\s+b"
    r"\s+FROM\s+cand\s+UNION\s+SELECT\s+doc_b,\s*doc_a\s+FROM\s+cand\)")


def materialize_closure(con, sql):
    """Rewrite the recursive-closure block to a union-find result table.

    Returns the rewritten SQL, or None when the oracle carries no
    closure block. The prefix CTEs (everything before `reach`) run once
    to produce the symmetric edge list `und`; union-find labels each
    node with its component minimum — the exact value minr computes.
    """
    m = CLOSURE_RE.search(sql)
    if not m:
        return None
    import pyarrow as pa
    prefix = sql[:m.start()].rstrip().rstrip(",")
    # arrow end-to-end: fetchall/executemany at millions of edges cost
    # MORE than the closure they replace (measured: 21 min for the two
    # heaviest sf1 oracles on the row-at-a-time path)
    und_tbl = con.execute(prefix + "\nSELECT a, b FROM und").fetch_arrow_table()
    ea = und_tbl.column("a").to_pylist()
    eb = und_tbl.column("b").to_pylist()
    parent = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:      # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(ea, eb):
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by MIN root so the root IS the component minimum
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    nodes = sorted(parent)
    labels = [find(n) for n in nodes]
    try:
        con.unregister("minr_mat"); con.unregister("und_mat")
    except Exception:
        pass
    con.register("minr_mat", pa.table(
        {"doc_id": pa.array(nodes, pa.int64()),
         "cluster": pa.array(labels, pa.int64())}))
    con.register("und_mat", und_tbl)
    id_col = m.group(1)  # doc_id (text family) or vec_id (semdedup family)
    out = (sql[:m.start()] +
           f"minr AS (SELECT doc_id AS {id_col}, cluster FROM minr_mat)" +
           sql[m.end():])
    # feed und from the cache too: prefix CTEs that only served the
    # closure become dead code in the final execution (CTEs the tail
    # still references — curation's `f`, the base tables — are unaffected)
    return UND_RE.sub("und AS (SELECT a, b FROM und_mat)", out, count=1)

def main():
    # --budget is recognized ANYWHERE; any other --flag is an error.
    # Otherwise `check.py OUT SF --budget 120` would silently treat
    # '--budget' as a query-name filter, match nothing, and exit green
    # having checked nothing — the guard must never no-op quietly.
    args = sys.argv[1:]
    budget = None
    closure_mat = False
    json_out = None
    i = 0
    rest = []
    while i < len(args):
        if args[i] == "--budget":
            budget = float(args[i + 1]); i += 2
        elif args[i] == "--closure-materialized":
            closure_mat = True; i += 1
        elif args[i] == "--json":
            json_out = args[i + 1]; i += 2
        elif args[i].startswith("--"):
            sys.exit(f"unknown flag {args[i]} (flags: --budget <sec>, "
                     "--closure-materialized, --json <file>)")
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
    n_ok = n_bad = n_type_diff = 0
    # per-query record in the driver's CORRECTNESS_r{N}.json entry shape,
    # written by --json — the committed-artifact face of a local sweep
    results = {}

    def rec(name, rm=None, sm=None, hm=None, sr=None, orr=None, err=None):
        results[name] = {"rows_match": rm, "schema_match": sm,
                         "hash_match": hm, "spark_rows": sr,
                         "oracle_rows": orr, "err": err}
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            rec(name, err="no_spark_output"); n_bad += 1; continue
        try:
            t0 = time.monotonic()
            run_sql = sql
            if closure_mat:
                rewritten = materialize_closure(con, sql)
                if rewritten is not None:
                    run_sql = rewritten
            exp = con.execute(run_sql).fetch_arrow_table()
            oracle_secs[name] = time.monotonic() - t0
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            rec(name, err=f"oracle_error: {e}"); n_bad += 1; continue
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetch_arrow_table()
        # driver sorts columns by name before hashing
        ecols, gcols = sorted(exp.column_names), sorted(got.column_names)
        if ecols != gcols:
            print(f"FAIL {name}: cols exp={ecols} got={gcols}")
            rec(name, sm=False, sr=got.num_rows, orr=exp.num_rows,
                err="schema_mismatch"); n_bad += 1; continue
        erows = [[norm(v) for v in row] for row in zip(*[exp.column(c).to_pylist() for c in ecols])]
        grows = [[norm(v) for v in row] for row in zip(*[got.column(c).to_pylist() for c in ecols])]
        if len(erows) != len(grows):
            print(f"FAIL {name}: rows exp={len(erows)} got={len(grows)}")
            rec(name, rm=False, sm=True, sr=len(grows), orr=len(erows),
                err="rows_mismatch"); n_bad += 1; continue
        if erows != grows:
            bad = next(i for i, (a, b) in enumerate(zip(erows, grows)) if a != b)
            print(f"FAIL {name}: first diff row {bad}:\n  exp={erows[bad]}\n  got={grows[bad]}")
            rec(name, rm=True, sm=True, hm=False, sr=len(grows),
                orr=len(erows), err="hash_mismatch"); n_bad += 1; continue
        # schema (arrow logical types) — the driver's gate FAILS a
        # type mismatch even when values hash equal, so a committed
        # --json artifact must count it as a failure too (a green
        # artifact the real gate would fail is worse than no artifact)
        etypes = {c: str(exp.schema.field(c).type) for c in ecols}
        gtypes = {c: str(got.schema.field(c).type) for c in ecols}
        if etypes != gtypes:
            print(f"FAIL {name}: type-diff exp={etypes} got={gtypes}")
            rec(name, rm=True, sm=False, hm=True, sr=len(grows),
                orr=len(erows), err="type_mismatch")
            n_type_diff += 1; n_bad += 1; continue
        print(f"OK   {name}: {len(erows)} rows")
        rec(name, rm=True, sm=True, hm=True,
            sr=len(grows), orr=len(erows))
        n_ok += 1
    if only and n_ok + n_bad == 0:
        sys.exit(f"no query matched the filter {sorted(only)} — "
                 "a typo'd name must not read as a green run")
    # by-design rows-only queries (no oracle): record their spark row
    # counts so the artifact covers the FULL inventory like the driver's
    nob = f"{out_dir}/no_oracle_by_design.json"
    if json_out and not only and os.path.exists(nob):
        for name in sorted(json.load(open(nob))):
            files = glob.glob(f"{out_dir}/{name}/*.parquet")
            sr = (con.execute(f"SELECT count(*) FROM read_parquet({files!r})")
                  .fetchone()[0] if files else None)
            rec(name, sr=sr, err="no_oracle")
    print(f"== {n_ok} ok, {n_bad} bad ==")
    if json_out:
        meta = {"_meta": {"sf_dir": sf_dir, "out_dir": out_dir,
                          "n_ok": n_ok, "n_bad": n_bad,
                          "n_type_diff": n_type_diff,
                          "closure_materialized": closure_mat,
                          "oracle_wall_sec": round(sum(oracle_secs.values()), 1),
                          "slowest": {k: round(v, 1) for k, v in sorted(
                              oracle_secs.items(), key=lambda kv: -kv[1])[:10]}}}
        with open(json_out, "w") as f:
            json.dump({**meta, **dict(sorted(results.items()))}, f, indent=1)
        print(f"== wrote {json_out} ({len(results)} entries) ==")
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
