#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify's parquet dumps
against the DuckDB oracle and diff. Usage:
    python3 tools/self_check.py <sfDir> <verifyOutDir> [query ...]
(Requires `sbt "runMain graft.Verify <sfDir> <outDir>"` to have run first.)

This is a build-time validation tool only — the engine itself has no Python.
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        if only and name not in only:
            continue
        files = glob.glob(f"{d}/*.parquet")
        got = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
        if name not in oracle:
            n_skip += 1
            print(f"SKIP {name}: no oracle ({len(got)} rows)")
            continue
        try:
            want = con.execute(oracle[name]).df()
        except Exception as e:
            n_fail += 1
            print(f"FAIL {name}: oracle error: {e}")
            continue
        got = got.reindex(sorted(got.columns), axis=1).reset_index(drop=True)
        want = want.reindex(sorted(want.columns), axis=1).reset_index(drop=True)
        if list(got.columns) != list(want.columns):
            n_fail += 1
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            continue
        if len(got) != len(want):
            n_fail += 1
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            continue
        ok = True
        for c in got.columns:
            a, b = got[c], want[c]
            try:
                ak, bk = a.dtype.kind, b.dtype.kind
                if {ak, bk} <= set('if') and ak != bk:
                    # Numeric KIND mismatch (e.g. Spark BIGINT vs DuckDB
                    # HUGEINT->float64): the values may compare equal but the
                    # driver's hash sees different types — that's exactly the
                    # canonicalization bug class this gate must catch.
                    same = False
                    print(f"FAIL {name}: column {c} numeric kind mismatch "
                          f"(spark {a.dtype} vs oracle {b.dtype}) — cast the oracle side")
                elif ak == 'f' or bk == 'f':
                    # Driver-strict: floats must be BIT-exact; queries that
                    # aggregate doubles must round on both sides (SURVEY §2).
                    af, bf = a.astype(float), b.astype(float)
                    same = bool(((a.isna() & b.isna()) | (af.values == bf.values)).all())
                else:
                    # str() of int/str/bool/date is an exact rendering.
                    same = (a.astype(str).fillna("<null>") == b.astype(str).fillna("<null>")).all()
            except Exception as e:
                same = False
            if not same:
                ok = False
                mism = (a.astype(str) != b.astype(str))
                idx = mism[mism].index[:3]
                print(f"FAIL {name}: column {c} differs, e.g. rows {list(idx)}:")
                for i in idx:
                    print(f"    got={a.iloc[i]!r} want={b.iloc[i]!r}")
                break
        if ok:
            n_pass += 1
            print(f"PASS {name} ({len(got)} rows)")
        else:
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} no-oracle")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
