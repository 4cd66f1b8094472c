#!/usr/bin/env python3
"""Dev-only local replica of the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <outDir> [query...]

Reads each <outDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from <outDir>/oracle_sql.json in DuckDB with views named
after the parquet tables in <sfDir>, sorts columns by name then rows,
and diffs values exactly (floats: bit-exact first, then 1e-9 report).
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

def norm(df: pd.DataFrame) -> pd.DataFrame:
    import datetime, decimal
    df = df.reindex(sorted(df.columns), axis=1)
    # STRICT (replicates the driver's gate): stringify values as-is.
    # Decimal is NOT coerced to float — Decimal('2547.40') must stay
    # "2547.40" so a Spark-decimal vs oracle-float64 mismatch FAILS here
    # exactly like it fails the driver's hash (ADVICE r1; VERDICT r1 #1).
    for c in df.columns:
        s = df[c]
        if str(s.dtype).startswith('datetime64'):
            # NaT must normalize to None, matching parquet-side nulls
            # (object columns hold None, datetime64 holds NaT -> 'nan').
            df[c] = s.dt.strftime('%Y-%m-%d %H:%M:%S.%f').where(s.notna(), None)
            continue
        if s.dtype == object:
            nn = s.dropna()
            v = nn.iloc[0] if len(nn) else None
            if isinstance(v, decimal.Decimal):
                df[c] = s.apply(lambda x: str(x) if x is not None else None)
            elif isinstance(v, datetime.datetime):
                df[c] = s.apply(lambda x: x.strftime('%Y-%m-%d %H:%M:%S.%f') if x is not None else None)
            elif isinstance(v, datetime.date):
                df[c] = s.apply(lambda x: x.strftime('%Y-%m-%d 00:00:00.000000') if x is not None else None)
            elif isinstance(v, (list, np.ndarray)):
                df[c] = s.apply(lambda x: str([round(float(e), 6) for e in x]) if x is not None else None)
            else:
                df[c] = s.apply(lambda x: str(x) if x is not None and not (isinstance(x, float) and np.isnan(x)) else None)
    df = df.sort_values(by=list(df.columns), na_position='first').reset_index(drop=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(os.path.join(out_dir, 'oracle_sql.json')))
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, '*.parquet')):
        name = os.path.basename(p).replace('.parquet', '')
        con.execute(f"create view {name} as select * from read_parquet('{p}')")
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        res_path = os.path.join(out_dir, name)
        if not os.path.isdir(res_path):
            print(f"FAIL {name}: no spark result dir"); n_fail += 1; continue
        try:
            got = pd.concat([pd.read_parquet(f) for f in sorted(glob.glob(res_path + '/*.parquet'))], ignore_index=True)
        except Exception as e:
            print(f"FAIL {name}: read spark result: {e}"); n_fail += 1; continue
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns spark={list(g.columns)} oracle={list(e.columns)}"); n_fail += 1; continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows spark={len(g)} oracle={len(e)}"); n_fail += 1; continue
        ok = True
        for c in g.columns:
            gv, ev = g[c], e[c]
            try:
                # dtype parity is part of the gate: a Decimal-vs-float64
                # column pair hashes differently in the driver even when
                # values are numerically identical.
                if gv.dtype.kind != ev.dtype.kind:
                    print(f"FAIL {name}: col {c} dtype mismatch spark={gv.dtype} oracle={ev.dtype}")
                    ok = False
                    continue
                if gv.dtype.kind == 'f' or ev.dtype.kind == 'f':
                    gf = gv.astype(float); ef = ev.astype(float)
                    both_nan = gf.isna() & ef.isna()
                    eq = (gf == ef) | both_nan
                    if not eq.all():
                        close = (np.isclose(gf, ef, rtol=1e-9, atol=1e-12) | both_nan)
                        tag = "CLOSE-BUT-NOT-EXACT" if close.all() else "MISMATCH"
                        i = (~eq).idxmax()
                        print(f"FAIL {name}: col {c} {tag} e.g. row {i}: spark={gf[i]!r} oracle={ef[i]!r}")
                        ok = False
                else:
                    gs = gv.astype(str); es = ev.astype(str)
                    if not (gs == es).all():
                        i = (gs != es).idxmax()
                        print(f"FAIL {name}: col {c} e.g. row {i}: spark={gv[i]!r} oracle={ev[i]!r}")
                        ok = False
            except Exception as ex:
                print(f"FAIL {name}: col {c} compare error: {ex}"); ok = False
        if ok:
            print(f"PASS {name} ({len(g)} rows, {len(g.columns)} cols)"); n_pass += 1
        else:
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == '__main__':
    main()
