#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/localverify.py <sfdir> <outdir>
Reads each <outdir>/<name>/ parquet (written by graft.Verify), runs the
matching SQL from <outdir>/oracle_sql.json in DuckDB against the same
parquet tables, and compares: schema (sorted column names), row count,
and values (rows sorted, columns sorted by name, floats rounded).
Strictly a dev tool — not part of the engine.
"""
import json, math, sys, glob, os
import duckdb

def canon(rows, colnames):
    # EXACT string compare (no tolerance): every oracled query is built
    # to match DuckDB bit-for-bit — identical rounding applied on both
    # sides, count-ratio metrics where engine summation order differs,
    # double-cast list math. A tolerance here would hide regressions.
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for r in rows:
        rr = []
        for i in order:
            v = r[i]
            if isinstance(v, float) and math.isnan(v):
                v = "NaN"
            rr.append(str(v))
        out.append(tuple(rr))
    out.sort()
    return out

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(f"{sfdir}/*.parquet"):
        name = os.path.basename(p)[:-len(".parquet")]
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    results = {}
    for resdir in sorted(glob.glob(f"{outdir}/*/")):
        name = os.path.basename(resdir.rstrip("/"))
        got = con.sql(f"SELECT * FROM '{resdir}/*.parquet'")
        gcols, grows = got.columns, got.fetchall()
        if name not in oracle:
            results[name] = f"ROWS_ONLY rows={len(grows)} " + \
                ("OK" if len(grows) > 0 else "EMPTY!")
            continue
        try:
            want = con.sql(oracle[name])
            wcols, wrows = want.columns, want.fetchall()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            continue
        if sorted(c.lower() for c in gcols) != sorted(c.lower() for c in wcols):
            results[name] = f"SCHEMA_MISMATCH got={sorted(gcols)} want={sorted(wcols)}"
            continue
        # the driver's hash is TYPE-sensitive (r1: DuckDB HUGEINT vs
        # Spark BIGINT failed despite value-exact rows) — compare dtypes
        gtypes = {c.lower(): str(t) for c, t in zip(gcols, got.types)}
        wtypes = {c.lower(): str(t) for c, t in zip(wcols, want.types)}
        if gtypes != wtypes:
            bad = {c: (gtypes[c], wtypes[c])
                   for c in gtypes if gtypes[c] != wtypes[c]}
            results[name] = f"TYPE_MISMATCH (spark, oracle)={bad}"
            continue
        if len(grows) != len(wrows):
            results[name] = f"ROWCOUNT got={len(grows)} want={len(wrows)}"
            continue
        g, w = canon(grows, gcols), canon(wrows, wcols)
        if g != w:
            diffs = [(a, b) for a, b in zip(g, w) if a != b][:3]
            results[name] = f"VALUE_MISMATCH e.g. {diffs}"
        else:
            results[name] = f"OK rows={len(grows)}"
    npass = sum(1 for v in results.values()
                if v.startswith("OK") or "ROWS_ONLY" in v and "EMPTY" not in v)
    for k in sorted(results):
        flag = " " if results[k].startswith("OK") or \
            ("ROWS_ONLY" in results[k] and "EMPTY" not in results[k]) else "X"
        print(f"[{flag}] {k}: {results[k]}")
    print(f"== {npass}/{len(results)} pass ==")
    sys.exit(0 if npass == len(results) else 1)

if __name__ == "__main__":
    main()
