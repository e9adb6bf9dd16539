"""Correctness pre-flight: mirror the driver's oracle-differential check.

Runs every ``queries()`` entry at sf0.01 and compares row count, schema
width, and an order-insensitive value hash against ``oracle_sql()`` run
through DuckDB over the same parquet fixtures. Columns are sorted by
name before hashing (the driver contract), so aliases must agree between
the Spark query and the oracle SQL.

Both result sets travel through pandas, matching the driver: the Spark
side via ``df.toPandas()`` (a nullable BIGINT with nulls becomes
float64), the oracle side via ``con.execute(sql).df()`` (DuckDB types a
bare ``SUM()`` over integers as HUGEINT and pandas coerces HUGEINT and
DECIMAL to float64). An oracle whose output column is not explicitly
CAST therefore hashes as ``2879.0`` against Spark's ``2879`` and fails
here exactly as it fails in the driver (observed on tpch_q12 in r3).
Dates are normalized to midnight datetimes on both sides (DuckDB DATE
arrives as datetime64 while Spark DateType arrives as datetime.date —
the driver treats these as equal, r3 ``date_arith`` green).

Usage::

    python tools/preflight.py                       # all queries
    python tools/preflight.py tpch_q5 ...           # a subset
    python tools/preflight.py --json PREFLIGHT.json # also write artifact

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


def _from_pandas(v):
    """Map a pandas/numpy cell to the plain-Python value the hash sees.

    Deliberately does NOT undo dtype coercion: a HUGEINT column arrives
    as float64 and stays float, so the hash diverges from Spark's int —
    the same divergence the driver reports. Dates are widened to
    midnight datetimes so DATE-typed columns compare equal across the
    two pandas representations (datetime64 vs datetime.date objects).
    """
    import datetime

    import numpy as np
    import pandas as pd

    if isinstance(v, np.ndarray):
        return [_from_pandas(x) for x in v.tolist()]
    if isinstance(v, (list, tuple)):
        return [_from_pandas(x) for x in v]
    if isinstance(v, dict):
        return {k: _from_pandas(x) for k, x in v.items()}
    if v is pd.NaT or (isinstance(v, float) and v != v):
        return None
    if isinstance(v, np.bool_):
        return bool(v)
    if isinstance(v, np.integer):
        return int(v)
    if isinstance(v, np.floating):
        return float(v)
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime()
    if isinstance(v, datetime.date) and not isinstance(v, datetime.datetime):
        return datetime.datetime.combine(v, datetime.time())
    return v


def _rows_from_pandas(df):
    return [
        tuple(_from_pandas(v) for v in row)
        for row in df.itertuples(index=False, name=None)
    ]


def _driver_canon_check(pdf) -> str | None:
    """Replicate the driver's frame-level canonicalization verbatim.

    The driver sorts the whole pandas frame with
    ``DataFrame.sort_values(by=all columns)`` before hashing; list /
    ndarray / dict cells make pandas' lexsort raise ``TypeError:
    unhashable type`` — a failure this preflight's own string-row
    canonicalizer silently survives (the r4 blind spot: PREFLIGHT_r4
    was 224/224 green while the driver went red on ``array_hof`` and
    ``array_set_ops``). Returns the error string, or None if the frame
    is driver-canonicalizable.
    """
    try:
        cols = sorted(pdf.columns)
        if cols:
            pdf[cols].sort_values(by=cols, ignore_index=True)
        return None
    except Exception as exc:  # noqa: BLE001
        return f"{type(exc).__name__}: {exc}"


def fetch_oracle_pandas(con, sql):
    """Driver-equivalent oracle fetch: DuckDB -> pandas -> rows.

    Raises if the oracle frame itself is not driver-canonicalizable
    (same frame-level sort_values gate as the Spark side).
    """
    odf = con.execute(sql).df()
    canon_err = _driver_canon_check(odf)
    if canon_err is not None:
        raise TypeError(f"oracle not driver-canonicalizable: {canon_err}")
    return list(odf.columns), _rows_from_pandas(odf)


def main() -> int:
    argv = sys.argv[1:]
    json_path = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            print("usage: preflight.py [query ...] [--json PATH]")
            return 2
        json_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    only = set(argv)
    report = {}
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
        # each fn() builds fresh DataFrames, so prior queries' persist()s
        # are dead weight in storage memory — left in place they evict
        # live caches of later queries (measured on the bench suite)
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            spdf = sdf.toPandas()
            srows = _rows_from_pandas(spdf)
        except Exception as exc:  # noqa: BLE001
            failures.append((name, f"spark error: {exc}"))
            report[name] = {"err": f"spark error: {str(exc)[:300]}"}
            print(f"FAIL  {name}: spark error: {str(exc)[:200]}")
            continue
        if name in oracles:
            canon_err = _driver_canon_check(spdf)
            if canon_err is not None:
                failures.append((name, f"driver-canon error: {canon_err}"))
                report[name] = {
                    "err": f"driver-canon error: {canon_err[:300]}"
                }
                print(f"FAIL  {name}: driver-canon error: {canon_err[:200]}")
                continue
        if name not in oracles:
            report[name] = {"rows_only": True, "spark_rows": len(srows),
                            "err": None}
            print(f"ok    {name}: rows-only, {len(srows)} rows "
                  f"({time.perf_counter() - t0:.1f}s)")
            continue
        try:
            ocols, orows = fetch_oracle_pandas(con, oracles[name])
        except Exception as exc:  # noqa: BLE001
            failures.append((name, f"oracle error: {exc}"))
            report[name] = {"err": f"oracle error: {str(exc)[:300]}"}
            print(f"FAIL  {name}: oracle error: {str(exc)[:200]}")
            continue
        rows_match = len(srows) == len(orows)
        schema_match = (len(scols) == len(ocols)
                        and sorted(scols) == sorted(ocols))
        hash_match = (rows_match and schema_match
                      and value_hash(srows, scols) == value_hash(orows, ocols))
        report[name] = {
            "rows_match": rows_match, "schema_match": schema_match,
            "hash_match": hash_match, "spark_rows": len(srows),
            "oracle_rows": len(orows), "err": None,
        }
        problems = []
        if not rows_match:
            problems.append(f"rows {len(srows)} != {len(orows)}")
        if not schema_match:
            problems.append(f"cols {sorted(scols)} != {sorted(ocols)}")
        elif rows_match and not hash_match:
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
    if json_path:
        import json

        with open(json_path, "w") as fh:
            json.dump(report, fh, indent=1, sort_keys=True)
        print(f"wrote {json_path} ({len(report)} queries)")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
