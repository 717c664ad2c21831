#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfdir> <verify_out_dir>
Runs each oracle_sql.json query in DuckDB over <sfdir>'s parquet tables,
loads the engine's parquet result, sorts columns by name and rows by all
columns, and compares values (exact for ints/strings, tolerant for floats).
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

def load(sfdir, out):
    con = duckdb.connect()
    for p in glob.glob(f"{sfdir}/*.parquet"):
        name = os.path.basename(p)[:-len(".parquet")]
        # driver testdata ships single files; generated tiers (GenScaleTier)
        # are Spark-written directories of part files
        pat = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{pat}')")
    return con

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)

def main(sfdir, outdir, only=None):
    con = load(sfdir, outdir)
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    # declared-vs-swept fence (r12 lesson: the sf1 artifact silently covered
    # 120/121 because the dump predated one query). Verify writes the full
    # declared-query manifest beside the dumps; a full sweep (no `only`
    # subset) must cover every declared name or fail LOUDLY here.
    declared_path = f"{outdir}/declared.json"
    if only is None and os.path.exists(declared_path):
        declared = set(json.load(open(declared_path)))
        dumped = {os.path.basename(d) for d in glob.glob(f"{outdir}/*") if os.path.isdir(d)}
        undumped = declared - dumped
        if undumped:
            print(f"FAIL sweep: declared queries with no engine dump: {sorted(undumped)}")
            print("\n0 pass / 1 fail (sweep-completeness fence)")
            return 1
        # an oracle-less query is a LEGITIMATE (weaker, rows-only) state the
        # driver supports — Verify warns about it; this sweep just can't
        # check it, so surface it without failing (the fence's target is a
        # dump missing from the sweep, the r12 sf1 gap)
        missing = declared - set(oracle)
        if missing:
            print(f"WARN sweep: declared queries with no oracle "
                  f"(rows-only on the driver side): {sorted(missing)}")
    if only:
        unknown = only - set(oracle)
        if unknown:
            # a typo'd name silently matching nothing would read as success
            print(f"ERROR: unknown query name(s): {sorted(unknown)}")
            return 2
        oracle = {k: v for k, v in oracle.items() if k in only}
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        resdir = f"{outdir}/{name}"
        try:
            got = pd.concat([pd.read_parquet(p) for p in sorted(glob.glob(f"{resdir}/*.parquet"))], ignore_index=True)
        except Exception as e:
            print(f"FAIL {name}: engine result unreadable: {e}"); n_fail += 1; continue
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(e.columns)}"); n_fail += 1; continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} != {len(e)}"); n_fail += 1; continue
        ok = True
        for c in g.columns:
            a, b = g[c], e[c]
            if np.issubdtype(a.dtype, np.floating) or np.issubdtype(b.dtype, np.floating):
                af = a.astype(float).to_numpy(); bf = b.astype(float).to_numpy()
                eq = np.isclose(af, bf, rtol=1e-9, atol=1e-9, equal_nan=True)
                exact = np.array_equal(af, bf, equal_nan=True)
                if not eq.all():
                    print(f"FAIL {name}: col {c} differs, e.g. {af[~eq][:3]} vs {bf[~eq][:3]}"); ok = False; break
                if not exact:
                    print(f"  WARN {name}: col {c} float not bit-exact (close though)")
            else:
                if not a.astype(str).equals(b.astype(str)):
                    d = a.astype(str) != b.astype(str)
                    print(f"FAIL {name}: col {c} differs, e.g. {a[d][:3].tolist()} vs {b[d][:3].tolist()}"); ok = False; break
        if ok: n_pass += 1; print(f"PASS {name} ({len(g)} rows)")
        else: n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None))
