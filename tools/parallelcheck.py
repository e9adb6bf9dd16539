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

Streaming coverage (r8 verdict item 3): the 20 ``stream_*`` queries
execute their stateful work and foreachBatch bodies as BATCH jobs
inside each micro-batch, so the same one-task failure mode can hide
there — invisible to PLANAUDIT (no static plan) and to LATENCY (wall
clock only). The streaming section drains every stream query (the
multi-batch file-source ones over a ×4-scaled 4-chunk corpus, the
rest over the fixture) and applies the same stage attribution to all
jobs the drain ran.

Usage::

    python tools/parallelcheck.py             # batch + streaming audit
    python tools/parallelcheck.py <name> ...  # subset (batch or stream)
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


#: multi-batch streaming drains run over this ×-scaled 4-chunk corpus
#: (the LATENCY ×4 shape) so per-batch stages carry real work
STREAM_SCALE_MULT = 4

#: streaming allowlist — one-task stages verified to be fixture scan
#: IO or bounded driver-facing finalization, not serialized compute
STREAM_ALLOW: dict[str, str] = {}


def _stages(url: str, appid: str) -> dict:
    rows = []
    for status in ("complete", "skipped"):
        with urllib.request.urlopen(
            f"{url}/api/v1/applications/{appid}/stages?status={status}"
        ) as r:
            rows.extend(json.load(r))
    return {(s["stageId"], s["attemptId"]): s for s in rows}


def _attribute(name: str, before: dict, after: dict, allow: dict,
               flags: list, worst_serial: dict) -> None:
    new = [s for k, s in after.items() if k not in before]
    worst = 0
    worst_any = 0
    for s in new:
        run_ms = int(s.get("executorRunTime", 0) or 0)
        if int(s.get("numTasks", 0) or 0) == 1:
            worst_any = max(worst_any, run_ms)
            if run_ms >= SERIAL_MS and name not in allow:
                flags.append((name, s["stageId"], run_ms, 1))
                worst = max(worst, run_ms)
    worst_serial[name] = worst_any
    status = f"FLAG serial stage {worst} ms" if worst else (
        "ok (allowlisted)" if name in allow else "ok"
    )
    print(f"{name:32s} {status}", flush=True)


def _audit_streaming(spark, url: str, appid: str, subset: list[str],
                     flags: list, worst_serial: dict) -> None:
    """Drain every stream query and attribute its micro-batch stages.

    Multi-batch file-source queries drain the LATENCY ×4 4-chunk
    corpus (real per-batch work + watermark movement); the rest (CDC /
    poll / single-file) drain their usual fixture inputs.
    """
    import tempfile

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from latency import MULTI_BATCH, _split_scaled_events

    queries = entrymod.queries()
    streamers = {k: v for k, v in queries.items() if k.startswith("stream_")}
    wanted = [n for n in (subset or list(streamers)) if n in streamers]
    if not wanted:
        return
    with tempfile.TemporaryDirectory() as tmp:
        _split_scaled_events(spark, SF_DIR, tmp, STREAM_SCALE_MULT, n=4)
        for name in wanted:
            src = tmp if name in MULTI_BATCH else SF_DIR
            before = _stages(url, appid)
            try:
                streamers[name](spark, src).collect()
            except Exception as exc:  # noqa: BLE001
                print(f"ERROR {name}: {exc}")
                continue
            after = _stages(url, appid)
            _attribute(name, before, after, STREAM_ALLOW, flags, worst_serial)


def main() -> int:
    spark = get_spark(
        "parallelcheck", extra_conf={"spark.ui.enabled": "true"}
    )
    url = spark.sparkContext.uiWebUrl
    appid = spark.sparkContext.applicationId
    queries = entrymod.queries()
    # session warm-up (uncounted), the sweep.py r7 discipline: the
    # first MEASURED query otherwise absorbs JVM/codegen/commit-path
    # ramp in its one-task write stage and flags spuriously — observed
    # in r11 when the new least-recently-certified registry order moved
    # partition_prune_scan/profile_table to the front (941 ms measured
    # first-in-session vs 365 ms steady-state for the same stage)
    try:
        entrymod.entry(spark).write.format("noop").mode("overwrite").save()
        from real_time_big_data_architect_spark.tables import register_views

        register_views(spark, SF_DIR)
    except Exception:  # noqa: BLE001 — warm-up is best-effort
        pass
    subset = sys.argv[1:]
    wanted = subset or [
        n for n in queries if not (n.startswith("stream_") or n == "pyds_writer_roundtrip")
    ]
    flags: list[tuple[str, int, int, int]] = []
    worst_serial: dict[str, int] = {}
    for name in wanted:
        if name.startswith("stream_"):
            continue  # audited by the streaming section below
        fn = queries[name]
        try:
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            before = _stages(url, appid)
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            after = _stages(url, appid)
        except Exception as exc:  # noqa: BLE001
            print(f"ERROR {name}: {exc}")
            continue
        _attribute(name, before, after, ALLOW, flags, worst_serial)
    # streaming section: full runs always; subsets only when they name
    # stream queries
    stream_flags: list[tuple[str, int, int, int]] = []
    stream_worst: dict[str, int] = {}
    stream_subset = [n for n in subset if n.startswith("stream_")]
    if not subset or stream_subset:
        _audit_streaming(
            spark, url, appid, stream_subset, stream_flags, stream_worst
        )
    # Adjudicate flags (the sweep.py r6 discipline, applied here after
    # r11's full run flagged 10 borderline ~0.7-0.9 s scans that each
    # melted below 0.5 s when re-measured isolated — host drift and the
    # audit's own churn ride the threshold): every flagged query is
    # re-measured isolated (warm + measured, up to 2 attempts); a flag
    # survives only if its isolated minimum stays over the threshold.
    # Adjudicated noise is recorded in the artifact, never dropped
    # silently.
    adjudicated: dict[str, dict] = {}
    if flags:
        surviving: list[tuple[str, int, int, int]] = []
        for name in sorted({f[0] for f in flags}):
            orig_ms = max(ms for (n, _sid, ms, _) in flags if n == name)
            iso_best: int | None = None
            iso_rows: list[tuple[str, int, int, int]] = []
            iso_err: str | None = None
            for _ in range(2):
                fl2: list[tuple[str, int, int, int]] = []
                ws2: dict[str, int] = {}
                try:
                    fn = queries[name]
                    fn(spark, SF_DIR).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    before = _stages(url, appid)
                    fn(spark, SF_DIR).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    after = _stages(url, appid)
                except Exception as exc:  # noqa: BLE001
                    print(f"ERROR adjudicating {name}: {exc}")
                    iso_err = str(exc)
                    break
                _attribute(name, before, after, ALLOW, fl2, ws2)
                run_ms = ws2.get(name, 0)
                iso_best = run_ms if iso_best is None else min(iso_best, run_ms)
                iso_rows = fl2
                if not fl2:
                    break
            if iso_err is not None:
                # An audit that ERRORED is not a pass: keep the original
                # flags (mirrors the streaming path) and record the error
                # so the artifact shows an adjudication failure, not noise.
                surviving.extend(f for f in flags if f[0] == name)
                adjudicated[name] = {
                    "flagged_ms": orig_ms,
                    "isolated_ms": iso_best,
                    "survived": True,
                    "error": iso_err,
                }
                print(
                    f"adjudicated {name}: flagged {orig_ms} ms ->"
                    f" re-measure ERRORED (flag kept)",
                    flush=True,
                )
                continue
            survived = bool(iso_rows) and (iso_best or 0) >= SERIAL_MS
            adjudicated[name] = {
                "flagged_ms": orig_ms,
                "isolated_ms": iso_best,
                "survived": survived,
            }
            if survived:
                surviving.extend(iso_rows)
            else:
                worst_serial[name] = min(
                    worst_serial.get(name, orig_ms), iso_best or orig_ms
                )
            print(
                f"adjudicated {name}: flagged {orig_ms} ms ->"
                f" isolated {iso_best} ms"
                f" ({'SURVIVED' if survived else 'noise'})",
                flush=True,
            )
        flags = surviving
    # same isolated re-measure for streaming flags (one drain each)
    if stream_flags:
        s_surviving: list[tuple[str, int, int, int]] = []
        for name in sorted({f[0] for f in stream_flags}):
            orig_ms = max(ms for (n, _sid, ms, _) in stream_flags if n == name)
            fl2 = []
            ws2 = {}
            try:
                _audit_streaming(spark, url, appid, [name], fl2, ws2)
            except Exception as exc:  # noqa: BLE001
                print(f"ERROR adjudicating {name}: {exc}")
                s_surviving.extend(
                    f for f in stream_flags if f[0] == name
                )
                continue
            iso_ms = ws2.get(name, 0)
            survived = bool(fl2)
            adjudicated[name] = {
                "flagged_ms": orig_ms,
                "isolated_ms": iso_ms,
                "survived": survived,
            }
            if survived:
                s_surviving.extend(fl2)
            else:
                stream_worst[name] = min(
                    stream_worst.get(name, orig_ms), iso_ms or orig_ms
                )
            print(
                f"adjudicated {name}: flagged {orig_ms} ms ->"
                f" isolated {iso_ms} ms"
                f" ({'SURVIVED' if survived else 'noise'})",
                flush=True,
            )
        stream_flags = s_surviving
    all_flags = flags + stream_flags
    print()
    if all_flags:
        print(f"{len(all_flags)} serial-stage flags:")
        for name, sid, ms, _ in sorted(all_flags, key=lambda t: -t[2]):
            print(f"  {name:32s} stage {sid:5d} {ms:6d} ms in 1 task")
    else:
        print("0 serial-stage flags")
    if not subset:  # full run: write the committed artifact
        _write_md(worst_serial, flags, stream_worst, stream_flags, adjudicated)
        print("wrote PARALLEL.md")
    spark.stop()
    return 1 if all_flags else 0


def _write_md(worst_serial: dict[str, int], flags: list,
              stream_worst: dict[str, int], stream_flags: list,
              adjudicated: dict[str, dict] | None = None) -> None:
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
    lines += [
        "",
        "## Streaming (r8 verdict item 3)",
        "",
        "Same attribution over every `stream_*` drain's jobs — the"
        " stateful work and foreachBatch bodies run as batch jobs per"
        " micro-batch, where the one-task failure mode could hide from"
        " both PLANAUDIT (no static plan) and LATENCY (wall only)."
        f" Multi-batch file-source queries drain the ×{STREAM_SCALE_MULT}"
        " 4-chunk corpus (the LATENCY ×4 shape); CDC/poll/single-file"
        " queries drain their usual inputs.",
        "",
        f"Result: **{len(stream_flags)} flags** over"
        f" {len(stream_worst)} streaming queries. Worst one-task stage"
        " per query, top 10:",
        "",
        "| query | worst 1-task stage ms |",
        "|---|---:|",
    ]
    for name, ms in sorted(stream_worst.items(), key=lambda kv: -kv[1])[:10]:
        note = (
            " (allowlisted)" if name in STREAM_ALLOW and ms >= SERIAL_MS
            else ""
        )
        lines.append(f"| {name}{note} | {ms} |")
    if adjudicated:
        lines += [
            "",
            "## Adjudicated flags",
            "",
            "Flags from the full sweep re-measured ISOLATED (warm +"
            " measured, min of up to 2 attempts) — host drift and the"
            " audit's own churn can push a ~0.6 s scan stage over the"
            " threshold; only flags whose isolated minimum stays over"
            f" {SERIAL_MS} ms survive:",
            "",
            "| query | flagged ms | isolated ms | verdict |",
            "|---|---:|---:|---|",
        ]
        for name, rec in sorted(adjudicated.items()):
            lines.append(
                f"| {name} | {rec['flagged_ms']} | {rec['isolated_ms']} |"
                f" {'SURVIVED' if rec['survived'] else 'noise'} |"
            )
    lines.append("")
    with open(
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "PARALLEL.md"),
        "w",
    ) as f:
        f.write("\n".join(lines))


if __name__ == "__main__":
    raise SystemExit(main())
