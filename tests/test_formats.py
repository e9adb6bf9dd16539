"""CSV / JSON-lines round-trips and malformed-input behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_time_big_data_architect_spark.sources import formats
from real_time_big_data_architect_spark.tables import load_table


def _events(spark, sf_small):
    # drop sub-microsecond noise: csv/json serialize at micro precision
    return load_table(spark, sf_small, "events")


@pytest.mark.parametrize("fmt", ["csv", "jsonl", "orc"])
def test_events_roundtrip(spark, sf_small, tmp_path_factory, fmt):
    ev = _events(spark, sf_small)
    path = str(tmp_path_factory.mktemp(f"fmt_{fmt}") / "events")
    if fmt == "csv":
        formats.write_csv(ev, path)
        back = formats.read_csv(spark, path, formats.TABLE_SCHEMAS["events"])
    elif fmt == "orc":
        formats.write_orc(ev, path)
        back = formats.read_orc(spark, path, formats.TABLE_SCHEMAS["events"])
    else:
        formats.write_jsonl(ev, path)
        back = formats.read_jsonl(spark, path, formats.TABLE_SCHEMAS["events"])
    cols = sorted(ev.columns)
    a = sorted(map(tuple, ev.select(*cols).collect()))
    b = sorted(map(tuple, back.select(*cols).collect()))
    assert a == b


def test_csv_failfast_on_malformed(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("bad_csv")
    (d / "part.csv").write_text("event_id,ts\n1,2024-01-01T00:00:00.000000Z\nnot_a_long,x\n")
    df = formats.read_csv(spark, str(d), "event_id long, ts timestamp")
    with pytest.raises(Exception) as ei:
        df.collect()
    assert "Malformed" in str(ei.value) or "FAILFAST" in str(ei.value)


def test_jsonl_failfast_on_malformed(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("bad_jsonl")
    (d / "part.json").write_text('{"doc_id": 1, "text": "ok"}\n{broken json\n')
    df = formats.read_jsonl(spark, str(d), "doc_id long, text string")
    with pytest.raises(Exception):
        df.collect()


def test_csv_schema_prevents_inference_drift(spark, tmp_path_factory):
    """A column of digits stays a string when the schema says so."""
    d = tmp_path_factory.mktemp("strict")
    (d / "p.csv").write_text("price\n0100\n")
    df = formats.read_csv(spark, str(d), "price string")
    assert df.collect()[0].price == "0100"  # leading zero preserved


def test_compact_parquet_reduces_file_count(spark, sf_small, tmp_path_factory):
    from real_time_big_data_architect_spark.sources import lake

    base = tmp_path_factory.mktemp("compact")
    frag, out = str(base / "frag"), str(base / "out")
    ev = _events(spark, sf_small)
    ev.repartition(20).write.parquet(frag)  # simulate streaming small files
    import glob

    assert len(glob.glob(f"{frag}/*.parquet")) == 20
    n = lake.compact_parquet(spark, frag, out)
    assert n == 1  # tiny fixture fits one 128MB-target file
    assert len(glob.glob(f"{out}/*.parquet")) == 1
    assert spark.read.parquet(out).count() == ev.count()


def test_with_ingest_metrics_counts_without_extra_scan(spark, sf_small):
    from real_time_big_data_architect_spark.sources import lake

    ev = _events(spark, sf_small)
    observed, obs = lake.with_ingest_metrics(ev, ["value", "props"])
    observed.write.format("noop").mode("overwrite").save()  # one action
    got = obs.get
    assert got["n_rows"] == ev.count()
    assert got["null_value"] == ev.filter(F.col("value").isNull()).count()
    assert got["null_props"] == ev.filter(F.col("props").isNull()).count()


def test_parquet_schema_evolution_mergeschema(spark, tmp_path_factory):
    """Lake reality: writers add columns over time. mergeSchema reads
    the union schema; rows from old files surface nulls for the new
    column - no rewrite, no failure."""
    tmp = tmp_path_factory.mktemp("evolve")
    spark.createDataFrame(
        [(1, "a")], "id long, name string"
    ).write.parquet(str(tmp / "t"), mode="append")
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, name string, score double"
    ).write.parquet(str(tmp / "t"), mode="append")
    merged = (
        spark.read.option("mergeSchema", "true").parquet(str(tmp / "t"))
    )
    assert set(merged.columns) == {"id", "name", "score"}
    rows = {r.id: r.score for r in merged.collect()}
    assert rows[1] is None and rows[2] == 9.5


def test_jsonl_permissive_quarantines_corrupt_records(spark, tmp_path_factory):
    """PERMISSIVE mode: bad lines land in _corrupt_record instead of
    failing the batch - the quarantine-and-continue ingest posture
    (FAILFAST, tested above, is the strict twin)."""
    tmp = tmp_path_factory.mktemp("permissive")
    p = tmp / "data.jsonl"
    p.write_text('{"id": 1, "v": "ok"}\n{not json at all}\n{"id": 3, "v": "ok"}\n')
    df = (
        spark.read.schema("id long, v string, _corrupt_record string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(str(p))
    )
    # collect once: Spark disallows queries that prune down to ONLY the
    # corrupt-record column (QUERY_ONLY_CORRUPT_RECORD_COLUMN)
    rows = df.collect()
    good = [r for r in rows if r._corrupt_record is None]
    bad = [r for r in rows if r._corrupt_record is not None]
    assert len(good) == 2 and len(bad) == 1
    assert "{not json" in bad[0]._corrupt_record
