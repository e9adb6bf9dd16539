"""Crash-recovery proof for the foreachBatch commit protocols (r9
verdict item 4).

The versioned-pointer swap under ``stream_foreachbatch_mv``,
``stream_cdc_apply`` and ``stream_hll_distinct`` claims exactly-once
view maintenance over an at-least-once sink. These tests kill a drain
at each protocol point — mid-batch before any write (``pre_write``,
i.e. before Spark's offset-log commit for the batch completes its
work), between the delta write and the pointer swap (``pre_commit``,
the window the protocol exists for), and after the swap but before
Spark's commit log records the batch (``post_commit``, the replay
case) — then restart from the SAME checkpoint with a clean body and
prove the drained view equals the batch oracle exactly.

A lost batch, a double-applied batch, or a view reset on restart all
break the row-level equality asserted here.
"""

from __future__ import annotations

import glob
import shutil

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import StreamingQueryException

from real_time_big_data_architect_spark.operators.mutations import (
    _cdc_v1,
    _cdc_v2,
)
from real_time_big_data_architect_spark.operators.sketches import (
    hll_estimate,
    hll_registers,
)
from real_time_big_data_architect_spark.streaming import stateful
from real_time_big_data_architect_spark.tables import load_table

POINTS = ("pre_write", "pre_commit", "post_commit")


def _crash_once(point: str, at_batch: int):
    """Fault hook raising at (point, at_batch) exactly once — the
    restarted process gets a fresh, un-faulted body anyway, so the
    flag only guards against in-run task retries."""
    fired = {"done": False}

    def fault(p: str, bid: int) -> None:
        if p == point and bid == at_batch and not fired["done"]:
            fired["done"] = True
            raise RuntimeError(f"injected crash at {p} batch {bid}")

    return fault


def _drain(spark, stream_df, merge, ckpt: str) -> None:
    with stateful._stream_shuffle_conf(spark):
        q = (
            stream_df.writeStream.foreachBatch(merge)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()


@pytest.fixture(scope="module")
def events_corpus(spark, sf_small, tmp_path_factory) -> str:
    """events fixture split into 3 files → 3 micro-batches
    (maxFilesPerTrigger=1), so a crash at batch 1 leaves committed
    work behind it AND pending work after it."""
    d = str(tmp_path_factory.mktemp("crash_events"))
    ev = load_table(spark, sf_small, "events")
    for i in range(3):
        tmp_out = f"{d}/stage{i}"
        ev.filter(F.pmod("user_id", F.lit(3)) == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp_out)
        shutil.move(
            glob.glob(f"{tmp_out}/part-*.parquet")[0],
            f"{d}/events{i}.parquet",
        )
        shutil.rmtree(tmp_out)
    return d


@pytest.mark.parametrize("point", POINTS)
def test_mv_crash_recovery(spark, events_corpus, tmp_path, point):
    work = str(tmp_path / "mv")
    ckpt = f"{work}/ckpt"
    faulty = stateful.make_mv_merge(work, fault=_crash_once(point, 1))
    with pytest.raises(StreamingQueryException):
        _drain(
            spark, stateful._events_stream(spark, events_corpus),
            faulty, ckpt,
        )
    committed = stateful.mv_committed(work)
    if point == "post_commit":
        assert committed is not None and committed[0] == 1
    else:  # crash before the swap: pointer still names the last good
        assert committed is not None and committed[0] == 0

    _drain(
        spark, stateful._events_stream(spark, events_corpus),
        stateful.make_mv_merge(work), ckpt,
    )
    committed = stateful.mv_committed(work)
    assert committed is not None and committed[0] == 2
    got = sorted(
        spark.read.parquet(committed[1])
        .select(
            "event_type",
            F.col("sum_value").cast("decimal(30,4)").alias("sum_value"),
            "n_events",
        )
        .collect()
    )
    want = sorted(
        spark.read.parquet(f"{events_corpus}/events*.parquet")
        .groupBy("event_type")
        .agg(
            F.sum(F.col("value").cast("decimal(30,4)")).alias("sum_value"),
            F.count("*").alias("n_events"),
        )
        .collect()
    )
    assert got == want


@pytest.mark.parametrize("point", POINTS)
def test_hll_crash_recovery(spark, events_corpus, tmp_path, point):
    work = str(tmp_path / "hll")
    ckpt = f"{work}/ckpt"
    faulty = stateful.make_hll_merge(work, fault=_crash_once(point, 1))
    with pytest.raises(StreamingQueryException):
        _drain(
            spark, stateful._events_stream(spark, events_corpus),
            faulty, ckpt,
        )
    _drain(
        spark, stateful._events_stream(spark, events_corpus),
        stateful.make_hll_merge(work), ckpt,
    )
    committed = stateful.mv_committed(work)
    assert committed is not None and committed[0] == 2
    got = sorted(
        hll_estimate(spark, spark.read.parquet(committed[1])).collect()
    )
    want = sorted(
        hll_estimate(
            spark,
            hll_registers(
                spark.read.parquet(f"{events_corpus}/events*.parquet")
            ),
        ).collect()
    )
    assert got == want


def test_stateful_agg_state_rollback_on_replay(
    spark, events_corpus, tmp_path
):
    """The STATE-STORE half of exactly-once (the foreachBatch tests
    above cover the sink half): kill a stateful streaming aggregation
    AFTER its micro-batch has executed — so the state stores have
    committed version N — but before Spark's commit log records the
    batch. On restart the batch replays; the state stores must load
    version N-1 (not the half-committed N), or the replayed batch
    double-counts every row it re-aggregates.

    update-mode emissions are captured per batch; the final per-key
    value (latest batch wins) must equal the batch-side counts over
    the whole corpus, and the replayed batch must emit counts
    IDENTICAL to the killed attempt's state — both only hold under
    correct state-version rollback."""
    ckpt = str(tmp_path / "ckpt")
    emitted: list[tuple[int, list]] = []

    def sink(crash_at: int | None):
        fired = {"done": False}

        def _sink(batch_df, batch_id: int) -> None:
            rows = batch_df.collect()  # full execution: state commits
            emitted.append((batch_id, rows))
            if (
                crash_at is not None
                and batch_id == crash_at
                and not fired["done"]
            ):
                fired["done"] = True
                raise RuntimeError("injected crash after state commit")

        return _sink

    def drain(crash_at: int | None) -> None:
        counts = (
            stateful._events_stream(spark, events_corpus)
            .groupBy("event_type")
            .count()
        )
        with stateful._stream_shuffle_conf(spark):
            q = (
                counts.writeStream.outputMode("update")
                .foreachBatch(sink(crash_at))
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

    with pytest.raises(StreamingQueryException):
        drain(crash_at=1)
    killed_attempt = {
        r["event_type"]: r["count"] for b, rows in emitted if b == 1
        for r in rows
    }
    drain(crash_at=None)

    replay_attempt = {
        r["event_type"]: r["count"]
        for b, rows in emitted[len(emitted) // 2:] if b == 1
        for r in rows
    }
    # the replay re-aggregated from version 0 state, not from the
    # killed attempt's committed version 1 — identical emissions
    assert replay_attempt == killed_attempt

    final: dict[str, int] = {}
    for _b, rows in emitted[2:]:  # post-restart drain only
        for r in rows:
            final[r["event_type"]] = r["count"]
    # seed with pre-crash batch-0 emissions for keys the restart never
    # re-emitted (their counts did not change after batch 0)
    for _b, rows in emitted[:1]:
        for r in rows:
            final.setdefault(r["event_type"], r["count"])
    want = {
        r["event_type"]: r["count"]
        for r in spark.read.parquet(f"{events_corpus}/events*.parquet")
        .groupBy("event_type")
        .count()
        .collect()
    }
    assert final == want


@pytest.mark.parametrize("point", POINTS)
def test_cdc_crash_recovery(spark, sf_small, tmp_path, point):
    work = str(tmp_path / "cdc")
    tmp_path.joinpath("cdc").mkdir()
    feed_schema, feed_dir, seed_dir = stateful.stage_cdc_feed(
        spark, sf_small, work
    )
    ckpt = f"{work}/ckpt"

    def _stream():
        return (
            spark.readStream.schema(feed_schema)
            .option("maxFilesPerTrigger", "1")
            .option("pathGlobFilter", "feed*.parquet")
            .parquet(feed_dir)
        )

    faulty = stateful.make_cdc_apply(
        work, seed_dir, fault=_crash_once(point, 0)
    )
    with pytest.raises(StreamingQueryException):
        _drain(spark, _stream(), faulty, ckpt)
    committed = stateful.mv_committed(work)
    if point == "post_commit":
        assert committed is not None and committed[0] == 0
    else:  # crash before the swap: pointer still names the v1 seed
        assert committed == (-1, seed_dir)

    _drain(spark, _stream(), stateful.make_cdc_apply(work, seed_dir), ckpt)
    committed = stateful.mv_committed(work)
    assert committed is not None and committed[0] == 1
    got = sorted(
        spark.read.parquet(committed[1])
        .select(
            F.col("o_orderkey").cast("bigint"),
            "o_orderstatus",
            F.col("o_totalprice").cast("double"),
        )
        .collect()
    )
    want = sorted(
        _cdc_v2(_cdc_v1(spark, sf_small))
        .select(
            F.col("o_orderkey").cast("bigint"),
            "o_orderstatus",
            F.col("o_totalprice").cast("double"),
        )
        .collect()
    )
    assert got == want
