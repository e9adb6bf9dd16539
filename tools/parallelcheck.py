"""Serial-stage audit: find queries whose wall time hides a one-task
stage doing heavy work.

AQE sizes post-shuffle partitions by BYTES, so a stage whose input is
small but whose per-row compute is expensive can get coalesced onto a
single core — the whole query then runs at 1/32 of the machine while
every monitoring number (shuffle MB, spill, row counts) looks healthy.
That is exactly how `dedup_levenshtein` hid a 3.6 s serial
edit-distance stage behind a few-MB block relation (r8; fixed with an
explicit round-robin repartition below the pair explode — see
SHUFFLES.md).

This probe runs every declared BATCH query once warm and once
measured, attributes the measured run's completed stages via the
Spark UI REST API, and flags stages with numTasks == 1 whose
executorRunTime exceeds a threshold. One-task stages that are cheap
(collect of a scalar, final single-row aggregations) are normal; a
one-task stage burning hundreds of ms of executor time is a
parallelism bug at any scale.

Usage::

    python tools/parallelcheck.py             # sf0.1, all batch queries
    python tools/parallelcheck.py <name> ...  # subset
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from real_time_big_data_architect_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
#: ms of executor run time in a single-task stage before we flag it.
#: The fixtures are single-file parquet, so every query legitimately
#: has a one-task SCAN stage whose cost is IO + decompress — measured
#: up to ~0.6 s for the widest text scans when the compute has been
#: fanned out off it. The threshold sits above that floor: a one-task
#: stage burning more executor time than a raw scan read is compute
#: riding the scan (or an AQE-coalesced exchange), which a real lake's
#: split count will NOT fix because the collapse happens post-shuffle.
SERIAL_MS = 700

#: queries whose one-task stage is verified to be the raw single-file
#: scan itself (IO + parquet decompress, compute fanned out off it) —
#: a fixture artifact a real lake's split count fixes at the source
ALLOW: dict[str, str] = {
    "dedup_simhash": (
        "documents text-column scan, ~0.6-0.8 s IO/decompress; the "
        "signature kernel and band bucketing run 32-way after fan_out "
        "(stage-verified 2026-08-15)"
    ),
}


def _stages(url: str, appid: str) -> dict:
    rows = []
    for status in ("complete", "skipped"):
        with urllib.request.urlopen(
            f"{url}/api/v1/applications/{appid}/stages?status={status}"
        ) as r:
            rows.extend(json.load(r))
    return {(s["stageId"], s["attemptId"]): s for s in rows}


def main() -> int:
    spark = get_spark(
        "parallelcheck", extra_conf={"spark.ui.enabled": "true"}
    )
    url = spark.sparkContext.uiWebUrl
    appid = spark.sparkContext.applicationId
    queries = entrymod.queries()
    subset = sys.argv[1:]
    wanted = subset or [
        n for n in queries if not (n.startswith("stream_") or n == "pyds_writer_roundtrip")
    ]
    flags: list[tuple[str, int, int, int]] = []
    worst_serial: dict[str, int] = {}
    for name in wanted:
        fn = queries[name]
        try:
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            before = _stages(url, appid)
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            after = _stages(url, appid)
        except Exception as exc:  # noqa: BLE001
            print(f"ERROR {name}: {exc}")
            continue
        new = [s for k, s in after.items() if k not in before]
        worst = 0
        worst_any = 0
        for s in new:
            run_ms = int(s.get("executorRunTime", 0) or 0)
            if int(s.get("numTasks", 0) or 0) == 1:
                worst_any = max(worst_any, run_ms)
                if run_ms >= SERIAL_MS and name not in ALLOW:
                    flags.append((name, s["stageId"], run_ms, 1))
                    worst = max(worst, run_ms)
        worst_serial[name] = worst_any
        status = f"FLAG serial stage {worst} ms" if worst else (
            "ok (allowlisted scan)" if name in ALLOW else "ok"
        )
        print(f"{name:32s} {status}")
    print()
    if flags:
        print(f"{len(flags)} serial-stage flags:")
        for name, sid, ms, _ in sorted(flags, key=lambda t: -t[2]):
            print(f"  {name:32s} stage {sid:5d} {ms:6d} ms in 1 task")
    else:
        print("0 serial-stage flags")
    if not subset:  # full run: write the committed artifact
        _write_md(worst_serial, flags)
        print("wrote PARALLEL.md")
    spark.stop()
    return 1 if flags else 0


def _write_md(worst_serial: dict[str, int], flags: list) -> None:
    lines = [
        "# PARALLEL — serial-stage audit (tools/parallelcheck.py)",
        "",
        f"SF: {SF_DIR.rsplit('sf', 1)[-1]}; threshold: a one-task stage"
        f" with ≥ {SERIAL_MS} ms of executor run time. The fixtures are"
        " single-file parquet, so a one-task SCAN (IO + decompress,"
        " measured ≤ ~0.6 s) is expected; anything above the threshold"
        " is compute riding the scan or an AQE-coalesced exchange —"
        " the byte-sizing failure mode that serializes compute-dense"
        " stages while every shuffle/spill metric looks healthy"
        " (found and fixed on 13 queries in r8; see SHUFFLES.md §AQE).",
        "",
        f"Result: **{len(flags)} flags** over {len(worst_serial)} batch"
        " queries. Worst one-task stage per query (ms of executor"
        " time), top 20:",
        "",
        "| query | worst 1-task stage ms |",
        "|---|---:|",
    ]
    top = sorted(worst_serial.items(), key=lambda kv: -kv[1])[:20]
    for name, ms in top:
        note = " (allowlisted scan)" if name in ALLOW and ms >= SERIAL_MS else ""
        lines.append(f"| {name}{note} | {ms} |")
    lines.append("")
    with open(
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "PARALLEL.md"),
        "w",
    ) as f:
        f.write("\n".join(lines))


if __name__ == "__main__":
    raise SystemExit(main())
