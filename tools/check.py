#!/usr/bin/env python3
"""Local stand-in for the driver's t2 gate: run each oracle_sql.json entry
in DuckDB over the same parquet tables and compare against the parquet the
Verify main dumped. Dev tool only — the shipped library has no Python.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [--json <out.json>]
       python3 tools/check.py --dtypes-only <sfDir> <oracleSqlJson>
       python3 tools/check.py --selftest

--json writes the full per-query record
  {name: {rows_match, schema_match, hash_match, err}} — the builder-side
correctness artifact committed as correctness_full_r<N>.json at every
round close (the driver's CORRECTNESS_r12.json arrived empty; a round
must be auditable from the repo alone).

--dtypes-only runs the oracle-side output-dtype sweep alone (DESCRIBE every
oracle SQL, no Verify output needed): the driver's checker materializes the
oracle via `fetchdf`, which renders HUGEINT/DECIMAL as float64/object and
FLOAT4 at float32 repr — types that hash differently from the Spark parquet
even when the VALUES are identical (the r11 `rel_quantile_merge` red: an
uncast `max(sum() OVER)` left `n` as HUGEINT -> "60000.0" vs BIGINT
"60000"). No such type may reach an oracle's final SELECT.
--selftest plants a HUGEINT/DECIMAL/FLOAT4 query and asserts the sweep
flags each (and passes a clean twin).
"""
import glob, json, math, re, sys
import duckdb
import pyarrow.parquet as pq
import pyarrow.types as patypes

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def banned_oracle_types(duck_types):
    """Columns whose DuckDB type `fetchdf` materializes differently than
    the driver reads the matching Spark parquet column: HUGEINT/UHUGEINT
    (-> float64 or object), DECIMAL (-> float64, scale-dependent repr),
    FLOAT4/REAL (float32 shortest-repr vs Spark's double)."""
    bad = []
    for col, t in duck_types.items():
        tu = t.upper()
        if (tu in ("HUGEINT", "UHUGEINT", "FLOAT", "FLOAT4", "REAL")
                or tu.startswith("DECIMAL")):
            bad.append((col, t))
    return bad

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

def main(sf_dir, out_dir, json_out=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    record = {}

    def rec(name, rows=False, schema=False, hashm=False, err=None):
        record[name] = {"rows_match": rows, "schema_match": schema,
                        "hash_match": hashm, "err": err}

    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM parquet_scan('{out_dir}/{name}/*.parquet')").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            rec(name, err=f"spark output missing: {str(e)[:200]}")
            n_bad += 1
            continue
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {str(e)[:300]}")
            rec(name, err=f"oracle sql error: {str(e)[:200]}")
            n_bad += 1
            continue
        got = got.reindex(sorted(got.columns), axis=1)
        exp = exp.reindex(sorted(exp.columns), axis=1)
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            rec(name, err=f"columns {list(got.columns)} vs {list(exp.columns)}")
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
            # hard ban first: types fetchdf renders asymmetrically are
            # wrong regardless of what the Spark side declares
            banned = banned_oracle_types(duck_types)
            if banned:
                print(f"FAIL {name}: oracle output has banned dtype {banned}")
                rec(name, err=f"banned oracle dtype {banned}")
                n_bad += 1
                continue
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
                rec(name, err=f"floatness drift {kind_bad}")
                n_bad += 1
                continue
        except Exception as e:
            print(f"warn {name}: type gate skipped: {str(e)[:120]}")
        g = sorted(tuple(norm(v) for v in row) for row in got.itertuples(index=False))
        e = sorted(tuple(norm(v) for v in row) for row in exp.itertuples(index=False))
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}")
            rec(name, schema=True, err=f"rows {len(g)} vs {len(e)}")
            n_bad += 1
        elif g != e:
            diff = [(a, b) for a, b in zip(g, e) if a != b]
            print(f"FAIL {name}: {len(diff)} mismatched rows of {len(g)}; first: {diff[0]}")
            rec(name, rows=True, schema=True,
                err=f"{len(diff)} mismatched rows of {len(g)}")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(g)} rows)")
            rec(name, rows=True, schema=True, hashm=True)
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail")
    # Fill the correctness-shaped skeleton Verify wrote into the output
    # dir (VERDICT r14 #6): entries this compare covered get their real
    # verdicts; non-oracled entries (signature queries) keep Verify's
    # nulls. A stdout-less driver still finds the per-query file here.
    import os
    skel_path = f"{out_dir}/correctness.json"
    if os.path.exists(skel_path):
        try:
            skel = json.load(open(skel_path))
            skel.update(record)
            with open(skel_path, "w") as f:
                json.dump(skel, f, indent=1, sort_keys=True)
            print(f"filled {skel_path} ({len(record)} of {len(skel)} rows)")
        except Exception as e:
            print(f"warn: skeleton fill failed: {e}")
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"n_ok": n_ok, "n_fail": n_bad,
                       "n_oracled": len(oracle), "queries": record},
                      f, indent=1, sort_keys=True)
        print(f"wrote {json_out} ({len(record)} rows)")
    return 1 if n_bad else 0

def dtypes_only(sf_dir, oracle_json):
    """Sweep EVERY oracle SQL's declared output schema for banned types.
    Needs only the oracle_sql.json (Verify dumps it) — no Spark output."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(oracle_json))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            duck_types = {r[0]: str(r[1])
                          for r in con.execute(f"DESCRIBE {sql}").fetchall()}
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {str(e)[:200]}")
            n_bad += 1
            continue
        bad = banned_oracle_types(duck_types)
        if bad:
            print(f"FAIL {name}: banned oracle output dtype {bad}")
            n_bad += 1
        else:
            n_ok += 1
    print(f"== dtypes: {n_ok} ok, {n_bad} fail (of {len(oracle)})")
    return 1 if n_bad else 0

def selftest():
    con = duckdb.connect()
    con.execute("CREATE VIEW t AS SELECT * FROM (VALUES (1,'a'),(2,'b')) v(x,s)")
    planted = {
        # the exact r11 red: sum() OVER widens to HUGEINT, max() keeps it
        "hugeint_window": "WITH c AS (SELECT x, sum(x) OVER (ORDER BY x) AS cum "
                          "FROM t) SELECT max(cum) AS n FROM c",
        "decimal_out": "SELECT CAST(1.5 AS DECIMAL(10,2)) AS d",
        "float4_out": "SELECT CAST(1.5 AS FLOAT4) AS f",
    }
    clean = {
        "bigint_window": "WITH c AS (SELECT x, sum(x) OVER (ORDER BY x) AS cum "
                         "FROM t) SELECT CAST(max(cum) AS BIGINT) AS n FROM c",
        "double_out": "SELECT CAST(1.5 AS DOUBLE) AS d",
    }
    fails = 0
    for name, sql in planted.items():
        types = {r[0]: str(r[1]) for r in con.execute(f"DESCRIBE {sql}").fetchall()}
        if not banned_oracle_types(types):
            print(f"SELFTEST FAIL: planted {name} ({types}) not flagged")
            fails += 1
    for name, sql in clean.items():
        types = {r[0]: str(r[1]) for r in con.execute(f"DESCRIBE {sql}").fetchall()}
        bad = banned_oracle_types(types)
        if bad:
            print(f"SELFTEST FAIL: clean {name} wrongly flagged {bad}")
            fails += 1
    print("selftest:", "FAIL" if fails else
          f"ok ({len(planted)} planted flagged, {len(clean)} clean pass)")
    return 1 if fails else 0

if __name__ == "__main__":
    if sys.argv[1] == "--selftest":
        sys.exit(selftest())
    elif sys.argv[1] == "--dtypes-only":
        sys.exit(dtypes_only(sys.argv[2], sys.argv[3]))
    else:
        jout = None
        if "--json" in sys.argv:
            jout = sys.argv[sys.argv.index("--json") + 1]
        sys.exit(main(sys.argv[1], sys.argv[2], jout))
