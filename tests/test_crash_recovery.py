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
