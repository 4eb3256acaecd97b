#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name> parquet (written by graft.Verify), runs the
paired oracle SQL from <outDir>/oracle_sql.json in DuckDB against the
<sfDir> tables, then compares: schema (column names), row count, and a
hash over values with columns sorted by name and rows sorted by all
columns. Floats must be bit-identical (that is the engine's protocol).
"""
import duckdb, glob, json, os, sys

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(con, rel_sql):
    df = con.execute(rel_sql).fetch_arrow_table()
    cols = sorted(df.column_names)
    rows = []
    for batch in df.to_batches():
        d = batch.to_pylist()
        rows.extend(tuple(repr(r[c]) for c in cols) for r in d)
    rows.sort()
    return cols, rows

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    names = sorted(n for n in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, n)))
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            results[name] = "EMPTY-OUTPUT"
            continue
        got_cols, got = canon(con, f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        if name not in oracle:
            # Sketch/stateful ops are intentionally oracle-less (SURVEY
            # §2 exclusions): informational, excluded from pass/fail.
            results[name] = f"NO-ORACLE (skipped) rows={len(got)}"
            continue
        try:
            exp_cols, exp = canon(con, oracle[name])
        except Exception as e:
            results[name] = f"ORACLE-SQL-ERROR {str(e)[:200]}"
            continue
        if got_cols != exp_cols:
            results[name] = f"SCHEMA-MISMATCH got={got_cols} exp={exp_cols}"
        elif len(got) != len(exp):
            results[name] = f"ROWCOUNT got={len(got)} exp={len(exp)}"
        elif got != exp:
            bad = next(i for i, (g, e) in enumerate(zip(got, exp)) if g != e)
            results[name] = (f"VALUE-MISMATCH first at sorted-row {bad}: "
                             f"got={got[bad]} exp={exp[bad]}")
        else:
            results[name] = "OK"
    if not results:
        print("NO QUERY OUTPUTS FOUND — wrong dir or Verify crashed", file=sys.stderr)
        sys.exit(2)
    width = max(len(n) for n in results)
    gated = {n: v for n, v in results.items() if not v.startswith("NO-ORACLE")}
    n_ok = sum(1 for v in gated.values() if v == "OK")
    for n, v in sorted(results.items()):
        print(f"{n:<{width}}  {v[:500]}")
    print(f"-- {n_ok}/{len(gated)} OK ({len(results) - len(gated)} oracle-less, skipped)")
    sys.exit(0 if n_ok == len(gated) else 1)

if __name__ == "__main__":
    main()
