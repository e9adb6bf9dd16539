"""Full-surface runtime sweep + full per-query bench: execute EVERY
declared query at a chosen scale factor, report failures, and write
``BENCH_full.json`` (per-query wall seconds for the whole surface).

The correctness gate (tools/preflight.py) runs at sf0.01; this sweep
exists to (a) catch scale-sensitive runtime failures — accumulator
overflows, degenerate-bucket blow-ups, state-store pressure — that
only appear on bigger inputs, and (b) make regressions OUTSIDE the
~40-query bench headline visible round-over-round (r5 verdict item 3):
``BENCH_full.json`` carries one single-pass time per declared query
plus a ratio against the previous round's file, so a slowdown in any
of the ~200 non-headline queries shows up in the artifact diff.

Timing discipline: queries materialize through the noop sink (count()
would let Catalyst prune the operator under test); single-pass times
are noisier than bench.py's min-of-3 but cover everything.

Usage::

    python tools/sweep.py                      # sf0.1
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python tools/sweep.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from real_time_big_data_architect_spark.session import get_spark  # noqa: E402

_OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "BENCH_full.json",
)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    prev: dict[str, float] = {}
    try:
        with open(_OUT) as fh:
            rec = json.load(fh)
        # only compare like-for-like: a prev record at a different SF
        # would flag every query as a ~10x "regression" (or hide one)
        if str(rec.get("sf")) == sf:
            prev = rec.get("queries", {})
    except (FileNotFoundError, json.JSONDecodeError):
        pass
    # fixed-work single-thread drift probe (r11 verdict item 3) — see
    # bench.py: the ratio vs the idle-host constant self-reports the
    # uniform-drift episodes that loadavg can't see
    from bench import CALIBRATION_BASELINE_S, _calibration_probe

    speed_probes = [
        round(_calibration_probe() / CALIBRATION_BASELINE_S, 3)
    ]
    spark = get_spark("sweep")
    loadavg0 = round(os.getloadavg()[0], 1)  # contention marker
    # session warm-up (uncounted): one flagship execution pays the
    # JVM/codegen/Python-worker spawn and the 10 parquet footer reads,
    # so the FIRST timed query measures its plan, not session cold
    # start (pre-r7 the registry's first query absorbed ~5 s of it)
    warm_t0 = time.perf_counter()
    try:
        entrymod.entry(spark).write.format("noop").mode(
            "overwrite"
        ).save()  # sf0.001 flagship — cheap
        from real_time_big_data_architect_spark.tables import register_views

        register_views(spark, sf_dir)
    except Exception:  # noqa: BLE001 — warm-up is best-effort
        pass
    # streaming-subsystem bring-up (Python DataSource worker pool,
    # micro-batch engine, RocksDB/TWS runner) — paid once per session
    # in production, so paid HERE rather than by whichever stream_*
    # query happens to run first (r7 verdict item 2); duration is
    # reported in the artifact, not hidden
    from real_time_big_data_architect_spark.streaming.warmup import (
        warm_streaming_subsystems,
    )

    warmup_detail = warm_streaming_subsystems(spark)
    warmup_sec = round(time.perf_counter() - warm_t0, 2)
    fails: list[tuple[str, str]] = []
    timings: dict[str, float] = {}
    t0 = time.perf_counter()
    for name, fn in entrymod.queries().items():
        spark.catalog.clearCache()  # drop prior queries' dead persists
        t = time.perf_counter()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t
            timings[name] = round(dt, 4)
            print(f"ok   {name}: {dt:.1f}s", flush=True)
        except Exception as exc:  # noqa: BLE001
            fails.append((name, str(exc)[:200]))
            print(f"FAIL {name}: {str(exc)[:150]}", flush=True)
    total = time.perf_counter() - t0
    # re-probe after the sweep: an episode that started mid-run shows
    # as start≈1.0 / end≥1.2 — exactly the half-tainted case that cost
    # a hand-forensics day in r11
    speed_probes.append(
        round(_calibration_probe() / CALIBRATION_BASELINE_S, 3)
    )
    vs_prev = {
        n: round(timings[n] / prev[n], 2)
        for n in timings
        if n in prev and prev[n] > 0
    }
    # uniform host-drift estimator (r10 verdict item 7): two rounds in
    # a row attributed BENCH_full sum movement to session-long uniform
    # host drift by hand — the median per-query ratio vs the previous
    # round IS that factor (robust to the few genuine movers), so the
    # artifact carries it and future rounds compare drift-corrected
    # sums instead of re-litigating the same explanation
    drift = None
    if len(vs_prev) >= 20:
        import statistics

        drift = round(statistics.median(vs_prev.values()), 3)
    flagged = {
        n: r for n, r in vs_prev.items()
        # single-pass noise floor: flag only meaningful slowdowns on
        # non-trivial queries (sub-0.3 s times are scheduling jitter)
        if r > 1.5 and timings[n] > 0.3
    }
    # Machine adjudication (r6 verdict item 4: tpch_q4's 1.58x
    # single-pass flag needed a hand re-measure that landed at 0.79s).
    # Every flag is re-measured isolated min-of-3 in-session; only
    # flags that SURVIVE stay regressions, the rest are recorded as
    # adjudicated noise.
    adjudicated: dict[str, dict] = {}
    regressed: dict[str, float] = {}
    qmap = entrymod.queries()
    for name, r in flagged.items():
        spark.catalog.clearCache()
        iso = []
        try:
            for _ in range(3):
                t = time.perf_counter()
                qmap[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                iso.append(time.perf_counter() - t)
        except Exception as exc:  # noqa: BLE001
            fails.append((name, f"adjudication rerun: {str(exc)[:150]}"))
            continue
        best = round(min(iso), 4)
        final = round(min(timings[name], best) / prev[name], 2)
        adjudicated[name] = {
            "flagged_ratio": r,
            "isolated_min3": best,
            "final_ratio": final,
            # the re-run happens inside the sweep session, whose own
            # churn (GC, shuffle cleanup) can inflate it — r10 measured
            # two in-sweep "survivors" melting to 1.1x on a quiet
            # machine. Record the loadavg so a reader can tell.
            "loadavg": round(os.getloadavg()[0], 1),
        }
        timings[name] = min(timings[name], best)
        if final > 1.5:
            regressed[name] = final
        print(
            f"adjudicated {name}: flagged {r}x -> isolated min3 {best}s"
            f" ({final}x, {'REGRESSION' if final > 1.5 else 'noise'})",
            flush=True,
        )
    out = {
        "metric": "full_surface_single_pass",
        "sf": sf,
        "n_queries": len(timings),
        "n_failures": len(fails),
        "total_wall_sec": round(total, 1),
        "timing": "single_pass_noop_per_query",
        "loadavg_at_start": loadavg0,
        "session_warmup_sec": warmup_sec,
        "session_warmup_detail": warmup_detail,
        "queries": timings,
        "host_speed_factor": max(speed_probes),
        "host_speed_per_probe": speed_probes,
        "drift_vs_prev_median": drift,
        "drift_corrected_total_sec": (
            round(total / drift, 1) if drift else None
        ),
        "adjudicated_flags": adjudicated,
        "regressed_over_1.5x_vs_prev": regressed,
        "failures": dict(fails),
    }
    with open(_OUT, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(
        f"\ntotal {total:.0f}s, {len(fails)} failures,"
        f" {len(regressed)} regressions >1.5x vs prev -> {_OUT}"
    )
    for name, msg in fails:
        print(" ", name, msg)
    for name, r in sorted(regressed.items(), key=lambda kv: -kv[1]):
        print(f"  regressed {name}: {r}x ({timings[name]}s)")
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
