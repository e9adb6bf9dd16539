"""One-off: run the adversarial differential per query, catching errors,
so every divergent/crashing query is listed in one pass (the pytest
version stops at the first exception). Not part of the shipped suite."""

from __future__ import annotations

import datetime as dt
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from real_time_big_data_architect_spark.plans import workload
from real_time_big_data_architect_spark.session import get_spark
from tools.preflight import _rows_from_pandas, value_hash

import tests.test_adversarial_oracle as adv


def main() -> None:
    spark = get_spark()
    tmp = tempfile.mkdtemp(prefix="advprobe")

    class _Factory:
        def mktemp(self, name):
            import pathlib

            p = pathlib.Path(tmp) / name
            p.mkdir(parents=True, exist_ok=True)
            return p

    gen = adv.adv_dir.__wrapped__(spark, _Factory())
    adv_dir = gen if isinstance(gen, str) else next(iter(gen))
    qs = workload.build_queries()
    oracles = workload.build_oracle_sql()
    con = duckdb.connect()
    for t in (
        "events", "documents", "embeddings", "orders", "customer",
        "lineitem", "part", "supplier", "nation", "region",
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{adv_dir}/{t}.parquet')"
        )
    only = set(sys.argv[1:])
    failures = []
    for name in adv._full_list():
        if only and name not in only:
            continue
        spark.catalog.clearCache()
        try:
            sdf = qs[name](spark, adv_dir)
            scols = sdf.columns
            srows = _rows_from_pandas(sdf.toPandas())
        except Exception as e:  # noqa: BLE001
            failures.append(f"{name}: SPARK {type(e).__name__}: {str(e)[:150]}")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append(f"{name}: ORACLE {type(e).__name__}: {str(e)[:150]}")
            continue
        ocols = list(odf.columns)
        orows = _rows_from_pandas(odf)
        if len(srows) != len(orows):
            failures.append(f"{name}: rows {len(srows)} != {len(orows)}")
        elif value_hash(srows, scols) != value_hash(orows, ocols):
            failures.append(f"{name}: value hash mismatch")
    print(f"\n{len(failures)} divergences:")
    for f in failures:
        print(" ", f)


if __name__ == "__main__":
    main()
