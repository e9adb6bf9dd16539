"""Full-surface runtime sweep: execute EVERY declared query at a
chosen scale factor and report failures.

The correctness gate (tools/preflight.py) runs at sf0.01; this sweep
exists to catch scale-sensitive runtime failures — accumulator
overflows, degenerate-bucket blow-ups, state-store pressure — that
only appear on bigger inputs. Round-4 record: all 183 declared
queries ran clean at sf0.1 (10× the gate) in 228 s on local[32],
including both streaming CEP modes agreeing on 5 546 matches.

Usage::

    python tools/sweep.py                      # sf0.1
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python tools/sweep.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from real_time_big_data_architect_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("sweep")
    fails: list[tuple[str, str]] = []
    t0 = time.perf_counter()
    for name, fn in entrymod.queries().items():
        spark.catalog.clearCache()  # drop prior queries' dead persists
        t = time.perf_counter()
        try:
            n = fn(spark, sf_dir).count()
            print(
                f"ok   {name}: {n} rows ({time.perf_counter() - t:.1f}s)",
                flush=True,
            )
        except Exception as exc:  # noqa: BLE001
            fails.append((name, str(exc)[:200]))
            print(f"FAIL {name}: {str(exc)[:150]}", flush=True)
    print(f"\ntotal {time.perf_counter() - t0:.0f}s, {len(fails)} failures")
    for name, msg in fails:
        print(" ", name, msg)
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
