#!/usr/bin/env python3
"""Local pre-validation of SparkEntry queries against the DuckDB oracle.

Mimics the driver's correctness gate: for each query, read the Spark
parquet output, run the oracle SQL over the raw tables, sort columns by
name, sort rows, and compare row counts / schemas / value hashes.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir> [query ...]
"""
import json, sys, hashlib
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df):
    cols = sorted(df.columns)
    rows = [tuple(r) for r in df[cols].itertuples(index=False, name=None)]
    def key(row):
        # sort by the SAME rounded representation the hash uses, so
        # sub-1e-9 float jitter can't reorder rows between engines
        return tuple(
            (v is None, repr(round(v, 9)) if isinstance(v, float) else str(v))
            for v in row)
    rows.sort(key=key)
    return cols, rows

def rhash(rows):
    h = hashlib.sha256()
    for r in rows:
        for v in r:
            if isinstance(v, float):
                v = repr(round(v, 9))
            h.update(str(v).encode())
            h.update(b"\x1f")
        h.update(b"\x1e")
    return h.hexdigest()

# Driver-safe type vocabulary (the r15 q145/q150 lesson: DECIMAL outputs
# hash red on the driver even when values are exact, and pandas' float64
# round-trip masks it locally). DuckDB DESCRIBE type strings; list/struct
# wrappers are unwrapped recursively before the check.
SAFE_TYPES = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT", "UBIGINT",
              "UINTEGER", "DOUBLE", "FLOAT", "VARCHAR", "BOOLEAN", "DATE",
              "TIMESTAMP", "TIMESTAMP WITH TIME ZONE", "TIMESTAMP_NS",
              "BLOB"}

def unsafe_types(duck_type):
    t = duck_type.strip()
    if t.endswith("[]"):
        return unsafe_types(t[:-2])
    if t.startswith("STRUCT(") and t.endswith(")"):
        inner, bad, depth, cur = t[7:-1], [], 0, ""
        for ch in inner:  # split on top-level commas only
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            if ch == "," and depth == 0:
                bad += unsafe_types(cur.strip().split(" ", 1)[1]); cur = ""
            else:
                cur += ch
        if cur.strip():
            bad += unsafe_types(cur.strip().split(" ", 1)[1])
        return bad
    return [] if t in SAFE_TYPES else [t]

def type_lint(con, name, spark_src, oracle_sql):
    """Both sides' DESCRIBE'd column types must stay driver-safe."""
    errs = []
    for side, q in (("spark", f"SELECT * FROM {spark_src}"),
                    ("oracle", oracle_sql)):
        for row in con.sql(f"DESCRIBE {q}").fetchall():
            col, typ = row[0], row[1]
            for bad in unsafe_types(typ):
                errs.append(f"{side} col `{col}` has non-driver-safe type {bad}")
    return errs

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    fails = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        try:
            lint = type_lint(con, name, f"'{out_dir}/{name}/*.parquet'",
                             oracle[name])
            if lint:
                fails += 1
                print(f"FAIL {name}: type lint")
                for e in lint:
                    print(f"      {e}")
                continue
            spark_df = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            oracle_df = con.sql(oracle[name]).df()
            sc, sr = canon(spark_df)
            oc, orows = canon(oracle_df)
            stypes = [str(spark_df[c].dtype) for c in sc]
            otypes = [str(oracle_df[c].dtype) for c in oc]
            ok_rows = len(sr) == len(orows)
            ok_cols = sc == oc
            ok_types = stypes == otypes
            ok_hash = ok_rows and ok_cols and rhash(sr) == rhash(orows)
            status = "OK  " if (ok_rows and ok_cols and ok_hash and ok_types) else "FAIL"
            if status == "FAIL":
                fails += 1
            print(f"{status} {name}: rows {len(sr)}/{len(orows)} cols_match={ok_cols} types_match={ok_types} hash={ok_hash}")
            if not ok_cols:
                print(f"      spark cols: {sc}\n      oracle cols: {oc}")
            if not ok_types:
                print(f"      spark types:  {list(zip(sc, stypes))}\n      oracle types: {list(zip(oc, otypes))}")
            if ok_cols and ok_rows and not ok_hash:
                # show first diffs
                for i, (a, b) in enumerate(zip(sr, orows)):
                    ar = tuple(round(v, 9) if isinstance(v, float) else v for v in a)
                    br = tuple(round(v, 9) if isinstance(v, float) else v for v in b)
                    if str(ar) != str(br):
                        print(f"      first diff at row {i}:\n       spark:  {a}\n       oracle: {b}")
                        break
        except Exception as e:
            fails += 1
            print(f"ERR  {name}: {str(e)[:300]}")
    print(f"\n{'ALL GREEN' if fails == 0 else f'{fails} FAILURES'}")
    sys.exit(1 if fails else 0)

main()
