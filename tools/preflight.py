"""Correctness pre-flight: mirror the driver's oracle-differential check.

Runs every ``queries()`` entry at sf0.01 and compares row count, schema
width, and an order-insensitive value hash against ``oracle_sql()`` run
through DuckDB over the same parquet fixtures. Columns are sorted by
name before hashing (the driver contract), so aliases must agree between
the Spark query and the oracle SQL.

Usage::

    python tools/preflight.py              # all queries
    python tools/preflight.py tpch_q5 ...  # a subset

Exit code 0 iff every oracle-backed query hash-matches and every
rows-only query runs clean.
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from real_time_big_data_architect_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def value_hash(rows, colnames) -> str:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted(
        "\x1f".join(_norm(row[i]) for i in order) for row in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def _norm(v) -> str:
    if v is None:
        return "\\N"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def main() -> int:
    only = set(sys.argv[1:])
    spark = get_spark("preflight")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    t_start = time.perf_counter()
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:  # noqa: BLE001
            failures.append((name, f"spark error: {exc}"))
            print(f"FAIL  {name}: spark error: {str(exc)[:200]}")
            continue
        if name not in oracles:
            print(f"ok    {name}: rows-only, {len(srows)} rows "
                  f"({time.perf_counter() - t0:.1f}s)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as exc:  # noqa: BLE001
            failures.append((name, f"oracle error: {exc}"))
            print(f"FAIL  {name}: oracle error: {str(exc)[:200]}")
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rows {len(srows)} != {len(orows)}")
        if len(scols) != len(ocols) or sorted(scols) != sorted(ocols):
            problems.append(f"cols {sorted(scols)} != {sorted(ocols)}")
        elif value_hash(srows, scols) != value_hash(orows, ocols):
            problems.append("hash mismatch")
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            print(f"pass  {name}: {len(srows)} rows "
                  f"({time.perf_counter() - t0:.1f}s)")

    print(f"\ntotal {time.perf_counter() - t_start:.1f}s; "
          f"{len(failures)} failures")
    for name, why in failures:
        print(f"  {name}: {why}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
