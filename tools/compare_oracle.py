#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: for each query output
under OUT_DIR, run its DuckDB oracle (oracle_sql.json) against the same
parquet tables and compare (columns sorted by name, exact values).

Usage: python3 tools/compare_oracle.py /tmp/verify_out /root/testdata/sf0.01
"""
import json, sys, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = n_noora = 0
    # registry<->board completeness: every oracle key must have an output
    # dir (a query that fails at analysis time writes an _ERROR sentinel,
    # see Verify.scala — it must show up RED here, never be absent)
    dirs = {os.path.basename(d) for d in glob.glob(os.path.join(out_dir, "q*"))}
    for missing in sorted(set(oracle) - dirs):
        n_fail += 1
        print(f"FAIL {missing}: no output dir (query never ran?)")
    for qdir in sorted(glob.glob(os.path.join(out_dir, "q*"))):
        name = os.path.basename(qdir)
        err = os.path.join(qdir, "_ERROR")
        if os.path.exists(err):
            n_fail += 1
            msg = open(err).read().splitlines()[:1]
            print(f"FAIL {name}: _ERROR: {msg[0] if msg else '(empty)'}")
            continue
        got = pq.read_table(qdir).to_pandas()
        got = got.reindex(sorted(got.columns), axis=1)
        if name not in oracle:
            n_noora += 1
            print(f"  (rows-only) {name}: {len(got)} rows")
            continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            n_fail += 1
            print(f"FAIL {name}: oracle error: {e}")
            continue
        exp = exp.reindex(sorted(exp.columns), axis=1)
        ok = True
        msgs = []
        if list(got.columns) != list(exp.columns):
            ok = False
            msgs.append(f"columns: spark={list(got.columns)} duck={list(exp.columns)}")
        elif len(got) != len(exp):
            ok = False
            msgs.append(f"rows: spark={len(got)} duck={len(exp)}")
        else:
            # row order is deterministic on both sides; compare positionally
            for c in got.columns:
                a, b = got[c].values, exp[c].values
                try:
                    import numpy as np
                    if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                        eq = (pd.isna(a) & pd.isna(b)) | (a == b)
                    else:
                        eq = pd.Series(a).astype(object).eq(pd.Series(b).astype(object)).values
                    if not eq.all():
                        ok = False
                        i = int((~eq).argmax())
                        msgs.append(f"col {c} row {i}: spark={a[i]!r} duck={b[i]!r} "
                                    f"(dtypes {a.dtype}/{b.dtype}, {int((~eq).sum())} diffs)")
                except Exception as e:
                    ok = False
                    msgs.append(f"col {c}: compare error {e} (dtypes {a.dtype}/{b.dtype})")
        if ok:
            n_pass += 1
            print(f"PASS {name} ({len(got)} rows)")
        else:
            n_fail += 1
            print(f"FAIL {name}: " + "; ".join(msgs))
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noora} rows-only")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
