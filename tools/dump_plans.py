"""Dump .explain("formatted") for declared queries into plans/<tag>/.

Usage:
    python tools/dump_plans.py <tag> [query ...]       # default: HEADLINE set
    python tools/dump_plans.py <tag> --suffix after [query ...]

Writes plans/<tag>/<query>_<suffix>.txt (suffix defaults to "before").
Plan capture is mostly driver-side; a few operators execute bounded
collects while *building* the plan (IVF centroids, bloom filters), and
the eager-checkpoint loop operators (bfs_khop, pagerank,
recursive_cte_reachability, the streaming drains) run their real jobs
at plan-build time — those run at the bench SF dir.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from real_time_big_data_architect_spark.plans import workload
from real_time_big_data_architect_spark.plans.explain import formatted_plan
from real_time_big_data_architect_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    if not args:
        raise SystemExit("usage: dump_plans.py <tag> [--suffix S] [query ...]")
    tag = args.pop(0)
    suffix = "before"
    if args[:1] == ["--suffix"]:
        if len(args) < 2:
            raise SystemExit("--suffix requires a value")
        suffix = args[1]
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(here, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    if not args:
        import bench

        args = list(bench.HEADLINE)

    spark = get_spark("dump_plans")
    qs = workload.build_queries()
    for name in args:
        try:
            plan = formatted_plan(qs[name](spark, sf_dir))
        except Exception as exc:  # noqa: BLE001 — record, keep going
            plan = f"ERROR capturing plan: {exc!r}\n"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
