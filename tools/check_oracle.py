#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB over views named after the
parquet tables in <sfDir>, then compares: schema (sorted column names), row
count, and values (exact hash + float-tolerance diagnosis so we can tell
"wrong" from "last-ulp drift").
"""
import json, sys, math
import duckdb
import pyarrow.parquet as pq

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def canon(rows, cols):
    # sort columns by name, then rows lexicographically (None first)
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in idx))
    def key(t):
        return tuple((v is not None, str(type(v)), str(v)) for v in t)
    return sorted(out, key=key), [cols[i] for i in idx]

def eq(a, b):
    if a is None or b is None:
        return a is None and b is None, True
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return False, False
        if math.isnan(fa) and math.isnan(fb):
            return True, True
        # the driver hashes dtype-sensitively: an int64 1 on one side and a
        # float64 1.0 on the other (e.g. DuckDB floor()->DOUBLE,
        # sum(BIGINT)->HUGEINT->float64) is a hash MISMATCH even though the
        # values are numerically equal
        same_kind = isinstance(a, float) == isinstance(b, float)
        exact = same_kind and fa == fb
        close = fa == fb or abs(fa-fb) <= 1e-9*max(1.0, abs(fa), abs(fb))
        return exact, close
    if isinstance(a, (list, tuple)) or isinstance(b, (list, tuple)):
        a = list(a) if a is not None else None
        b = list(b) if b is not None else None
        return a == b, a == b
    # normalize datetimes/decimals via str
    if type(a) != type(b):
        return str(a) == str(b), str(a) == str(b)
    return a == b, a == b

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name, sql in sorted(oracle.items()):
        # Both sides go through pandas, like the driver: this surfaces dtype
        # coercions (DuckDB HUGEINT->float64, nullable int->float64) that a
        # raw fetchall() would hide.
        def df_rows(df):
            def scal(v):
                if hasattr(v, "tolist") and getattr(v, "ndim", 0):
                    return v.tolist()  # ndarray cell (list column)
                if hasattr(v, "item"):
                    return v.item()    # numpy scalar -> python int/float/bool
                return v
            return [tuple(scal(v) for v in row)
                    for row in df.itertuples(index=False, name=None)]
        try:
            df_s = pq.read_table(f"{out_dir}/{name}").to_pandas()
            scols = list(df_s.columns)
            srows = df_rows(df_s)
        except Exception as e:
            results[name] = f"SPARK_READ_FAIL: {e}"
            print(f"FAIL  {name}: spark output unreadable: {e}")
            continue
        try:
            df_o = con.execute(sql).df()
            ocols = list(df_o.columns)
            orows = df_rows(df_o)
        except Exception as e:
            results[name] = f"ORACLE_FAIL: {e}"
            print(f"FAIL  {name}: oracle error: {str(e).splitlines()[0]}")
            continue
        s, sc = canon(srows, scols)
        o, oc = canon(orows, ocols)
        if sc != oc:
            results[name] = f"SCHEMA: spark={sc} oracle={oc}"
            print(f"FAIL  {name}: schema {sc} vs {oc}")
            continue
        if len(s) != len(o):
            results[name] = f"ROWS: spark={len(s)} oracle={len(o)}"
            print(f"FAIL  {name}: rows {len(s)} vs {len(o)}")
            continue
        exact_all, close_all, first_diff = True, True, None
        for rs, ro in zip(s, o):
            for vs, vo in zip(rs, ro):
                ex, cl = eq(vs, vo)
                exact_all &= ex
                close_all &= cl
                if not cl and first_diff is None:
                    first_diff = (vs, vo)
        if exact_all:
            results[name] = "OK"
            print(f"ok    {name}  ({len(s)} rows)")
        elif close_all:
            results[name] = "CLOSE"
            print(f"CLOSE {name}: values within 1e-9 but NOT bit-exact (hash would fail)")
        else:
            results[name] = f"VALUES: {first_diff}"
            print(f"FAIL  {name}: value diff e.g. {first_diff}")
    bad = {k: v for k, v in results.items() if v != "OK"}
    print(f"\n{len(results)-len(bad)}/{len(results)} exact-match",
          f"; issues: {list(bad)}" if bad else "")
    return 1 if bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
