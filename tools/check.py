#!/usr/bin/env python3
"""Local stand-in for the driver's t2 gate: run each oracle_sql.json entry
in DuckDB over the same parquet tables and compare against the parquet the
Verify main dumped. Dev tool only — the shipped library has no Python.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import glob, json, math, sys
import duckdb
import pyarrow.parquet as pq
import pyarrow.types as patypes

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    # array-typed columns (e.g. a query that leaks an array<long>) arrive
    # as list/ndarray: normalize element-wise to a stable string so rows
    # stay sortable instead of crashing pandas/sorted()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(norm(x) for x in v) + "]"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    return str(v)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM parquet_scan('{out_dir}/{name}/*.parquet')").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            n_bad += 1
            continue
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {str(e)[:300]}")
            n_bad += 1
            continue
        got = got.reindex(sorted(got.columns), axis=1)
        exp = exp.reindex(sorted(exp.columns), axis=1)
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            n_bad += 1
            continue
        # Numeric-kind drift (int64 vs float64, e.g. an uncast DuckDB
        # sum(BIGINT) -> HUGEINT) hashes differently in the driver even
        # when %.9g-normalized values match. Compare the DECLARED types
        # (Spark's parquet schema vs DuckDB's DESCRIBE of the oracle),
        # not pandas dtype kinds: pandas promotes nullable int64 columns
        # to float64 and ships HUGEINT/DECIMAL as object dtype, so a
        # dtype-kind gate misses exactly the drifts it exists to catch.
        try:
            spark_schema = pq.read_schema(
                sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))[0])
            duck_types = {r[0]: str(r[1]).upper()
                          for r in con.execute(f"DESCRIBE {sql}").fetchall()}
            def duck_floaty(t):
                return t in ("FLOAT", "DOUBLE", "REAL", "FLOAT4", "FLOAT8")
            kind_bad = []
            for field in spark_schema:
                dt = duck_types.get(field.name)
                if dt is None:
                    continue  # name drift is caught by the column check above
                sf, df_ = patypes.is_floating(field.type), duck_floaty(dt)
                # only floatness matters for the %.9g hash (int widths and
                # int-vs-HUGEINT normalize identically); decimal-vs-int
                # drift surfaces in the value compare ("5" vs "5.000000")
                if patypes.is_integer(field.type) or sf:
                    if dt in ("HUGEINT", "BIGINT", "INTEGER", "SMALLINT",
                              "TINYINT", "UBIGINT", "UINTEGER") or df_:
                        if sf != df_:
                            kind_bad.append((field.name, str(field.type), dt))
            if kind_bad:
                print(f"FAIL {name}: declared-type floatness drift {kind_bad}")
                n_bad += 1
                continue
        except Exception as e:
            print(f"warn {name}: type gate skipped: {str(e)[:120]}")
        g = sorted(tuple(norm(v) for v in row) for row in got.itertuples(index=False))
        e = sorted(tuple(norm(v) for v in row) for row in exp.itertuples(index=False))
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}")
            n_bad += 1
        elif g != e:
            diff = [(a, b) for a, b in zip(g, e) if a != b]
            print(f"FAIL {name}: {len(diff)} mismatched rows of {len(g)}; first: {diff[0]}")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(g)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
