#!/usr/bin/env python3
"""Execute the GENERATED PostgreSQL ON CONFLICT upsert against DuckDB's
Postgres-flavored ON CONFLICT implementation. Dev tool only.

The sandbox has no Postgres server, H2, or pgjdbc, so the PG dialect
string can't be executed over JDBC; but it IS executable SQL — DuckDB
implements the same `INSERT ... ON CONFLICT (keys) DO UPDATE SET c =
EXCLUDED.c` surface. graft.Verify dumps the exact string the Scala
generator emits (merge_sql.json), so what runs here is the production
statement, not a hand-copied twin that could drift.

Checks:
  1. The statement parses and executes (insert path).
  2. Re-running with changed values takes the conflict-update path and
     leaves exactly the merged state (idempotent-intent semantics).

Usage: python3 tools/pg_dialect_check.py <verifyOutDir>
"""
import json
import sys

import duckdb


def main(out_dir):
    sql = json.load(open(f"{out_dir}/merge_sql.json"))["pg_upsert"]
    con = duckdb.connect()
    con.execute(
        """CREATE TABLE ride_metrics (
             city VARCHAR NOT NULL, window_end TIMESTAMP NOT NULL,
             total_trips BIGINT, average_fare DOUBLE,
             PRIMARY KEY (city, window_end))""")
    con.execute(
        """CREATE TABLE ride_metrics_micro_batch (
             city VARCHAR, last_updated TIMESTAMP,
             total_trips BIGINT, average_fare DOUBLE)""")

    # batch 1: two fresh keys -> pure insert path
    con.execute(
        """INSERT INTO ride_metrics_micro_batch VALUES
             ('cairo', TIMESTAMP '2024-01-01 00:01:00', 10, 12.5),
             ('giza',  TIMESTAMP '2024-01-01 00:01:00',  4,  7.0)""")
    con.execute(sql)

    # batch 2: one conflicting key (updated values) + one fresh key
    con.execute("DELETE FROM ride_metrics_micro_batch")
    con.execute(
        """INSERT INTO ride_metrics_micro_batch VALUES
             ('cairo', TIMESTAMP '2024-01-01 00:02:00', 13, 11.0),
             ('alex',  TIMESTAMP '2024-01-01 00:02:00',  2,  9.0)""")
    # NOTE: batch 2's cairo row carries the SAME window_end key in the
    # real pipeline; emulate by aligning last_updated -> window_end via
    # the statement's own column mapping (sourceCols order)
    con.execute("UPDATE ride_metrics_micro_batch "
                "SET last_updated = TIMESTAMP '2024-01-01 00:01:00' "
                "WHERE city = 'cairo'")
    con.execute(sql)

    got = sorted(con.execute(
        "SELECT city, window_end, total_trips, average_fare "
        "FROM ride_metrics").fetchall())
    want = sorted([
        ("alex", __import__("datetime").datetime(2024, 1, 1, 0, 2), 2, 9.0),
        ("cairo", __import__("datetime").datetime(2024, 1, 1, 0, 1), 13, 11.0),
        ("giza", __import__("datetime").datetime(2024, 1, 1, 0, 1), 4, 7.0),
    ])
    if got != want:
        print(f"FAIL pg_upsert: merged state {got} != {want}")
        return 1
    print("ok   pg_upsert: ON CONFLICT insert + conflict-update paths "
          "executed, merged state exact")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))
