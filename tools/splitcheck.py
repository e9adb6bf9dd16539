"""Full-surface SPLIT-INVARIANCE differential (r9 continuation).

Correctness at 100 TB requires results that do not depend on the
accidents of partitioning: cluster shuffle-partition counts are never
what they are locally, scans split wherever file/row-group boundaries
fall, and Arrow transfers batch wherever maxRecordsPerBatch lands.
Any operator whose result shifts under those knobs (order-dependent
float accumulation, per-batch instead of per-group kernel state,
first()/limit without a defined order leaking into a RESULT value) is
wrong at scale even though the default-config differential passes.

This tool re-runs the ENTIRE declared surface through the same
DuckDB-oracle hash differential as ``tools/preflight.py``, but on a
session with adversarially perturbed execution geometry:

- ``spark.sql.shuffle.partitions = 7``  (vs the shipped 32; odd, so
  hash partitioning regroups every key)
- ``spark.sql.files.maxPartitionBytes = 32k`` + ``openCostInBytes = 0``
  (single-file fixtures scan as many splits instead of one)
- ``spark.sql.execution.arrow.maxRecordsPerBatch = 777`` (every
  pandas/Arrow kernel sees different batch boundaries — a kernel that
  accumulates per-frame instead of per-iterator/per-group diverges)

Pass criterion is identical to preflight: every oracle-backed query
hash-matches DuckDB, rows-only queries run clean. A query green under
BOTH geometries is measured split-invariant.

Usage::

    python tools/splitcheck.py                  # all queries
    python tools/splitcheck.py tpch_q5 ...      # a subset
    python tools/splitcheck.py --conf spark.sql.adaptive.enabled=false \
        --conf spark.sql.shuffle.partitions=13   # extra geometry axes
        # (--conf overrides stack on top of the default perturbation)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from real_time_big_data_architect_spark.session import get_spark  # noqa: E402

PERTURBED_SHUFFLE = 7
PERTURBED_CONF = {
    "spark.sql.files.maxPartitionBytes": str(32 * 1024),
    "spark.sql.files.openCostInBytes": "0",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "777",
}


def main() -> int:
    from tools import preflight

    conf = dict(PERTURBED_CONF)
    shuffle = PERTURBED_SHUFFLE
    # --conf k=v overrides stack on the default perturbation (repeated
    # flag); consumed here so preflight.main sees only query names
    while "--conf" in sys.argv:
        i = sys.argv.index("--conf")
        if i + 1 >= len(sys.argv) or "=" not in sys.argv[i + 1]:
            print("usage: splitcheck.py [--conf key=value ...] [query ...]",
                  file=sys.stderr)
            return 2
        k, _, v = sys.argv[i + 1].partition("=")
        if k == "spark.sql.shuffle.partitions":
            shuffle = int(v)
        else:
            conf[k] = v
        del sys.argv[i : i + 2]

    # preflight.main() builds its session through this hook; rebind it
    # so the differential runs on the perturbed geometry. getOrCreate
    # would otherwise re-apply the default shuffle-partition count.
    preflight.get_spark = lambda name="splitcheck", **kw: get_spark(
        name,
        shuffle_partitions=shuffle,
        extra_conf=conf,
    )
    return preflight.main()


if __name__ == "__main__":
    raise SystemExit(main())
