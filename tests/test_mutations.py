"""Unit tests: MERGE upsert and SCD2 history on hand-computed fixtures."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from real_time_big_data_architect_spark.operators import mutations


def test_merge_upsert_actions(spark, monkeypatch):
    # keys: 7 -> update, 3 -> insert under 100000003, 5 -> keep
    base = spark.createDataFrame(
        [
            Row(o_orderkey=7, o_custkey=1, o_orderstatus="O", o_totalprice=10.0),
            Row(o_orderkey=3, o_custkey=2, o_orderstatus="O", o_totalprice=20.0),
            Row(o_orderkey=5, o_custkey=3, o_orderstatus="F", o_totalprice=30.0),
        ]
    )
    monkeypatch.setattr(
        "real_time_big_data_architect_spark.operators.mutations.load_table",
        lambda spark, sf_dir, name: base,
    )
    out = {
        r.o_orderkey: (r.o_orderstatus, r.o_totalprice, r.merge_action)
        for r in mutations.merge_upsert(spark, "ignored").collect()
    }
    assert out == {
        7: ("R", 110.0, "update"),
        3: ("O", 20.0, "keep"),  # key 3 itself is untouched...
        100000003: ("N", 20.0, "insert"),  # ...its shifted copy inserts
        5: ("F", 30.0, "keep"),
    }


def test_scd2_versions(spark, monkeypatch):
    t = [dt.datetime(2024, 1, 1, 0, m) for m in range(4)]
    ev = spark.createDataFrame(
        [
            Row(event_id=0, ts=t[0], user_id=1, event_type="view", value=0.0, props="{}"),
            Row(event_id=1, ts=t[1], user_id=1, event_type="view", value=0.0, props="{}"),
            Row(event_id=2, ts=t[2], user_id=1, event_type="click", value=0.0, props="{}"),
            Row(event_id=3, ts=t[3], user_id=1, event_type="view", value=0.0, props="{}"),
        ]
    )
    monkeypatch.setattr(
        "real_time_big_data_architect_spark.operators.mutations.load_table",
        lambda spark, sf_dir, name: ev,
    )
    rows = sorted(
        mutations.scd2_history(spark, "ignored").collect(),
        key=lambda r: r.version,
    )
    assert [(r.event_type, r.valid_from, r.valid_to) for r in rows] == [
        ("view", t[0], t[2]),   # repeated 'view' at t[1] is NOT a new version
        ("click", t[2], t[3]),
        ("view", t[3], None),
    ]
    assert [r.version for r in rows] == [1, 2, 3]


def test_zorder_files_are_locally_compact(spark, sf_small):
    """The point of Z-ordering: each file's min/max span on EITHER
    dimension is a small fraction of the global range, so single-column
    filters prune most files from the skipping stats alone."""
    from real_time_big_data_architect_spark.operators.mutations import (
        zorder_layout,
    )

    rows = zorder_layout(spark, sf_small).collect()
    assert len(rows) > 16  # the interleave fills the file space
    gc = max(r.max_cust for r in rows) - min(r.min_cust for r in rows)
    gd = max(r.max_day for r in rows) - min(r.min_day for r in rows)
    avg_c = sum(r.max_cust - r.min_cust for r in rows) / len(rows)
    avg_d = sum(r.max_day - r.min_day for r in rows) / len(rows)
    assert avg_c <= gc * 0.35, "custkey not locally compact"
    assert avg_d <= gd * 0.35, "order_day not locally compact"


def test_scd2_lookup_exactly_one_version_per_purchase(spark, sf_small):
    """Every purchase matches exactly one SCD2 version — the one whose
    validity range contains its timestamp (python replay)."""
    from real_time_big_data_architect_spark.operators import mutations as MU
    from real_time_big_data_architect_spark.tables import load_table

    dim = MU.scd2_history(spark, sf_small).collect()
    ev = load_table(spark, sf_small, "events").collect()
    purchases = [r for r in ev if r.event_type == "purchase"]
    got = {r.event_id: r for r in MU.scd2_lookup(spark, sf_small).collect()}
    assert set(got) == {p.event_id for p in purchases}
    by_user: dict = {}
    for d in dim:
        by_user.setdefault(d.user_id, []).append(d)
    for p in purchases:
        live = [
            d
            for d in by_user[p.user_id]
            if d.valid_from <= p.ts
            and (d.valid_to is None or p.ts < d.valid_to)
        ]
        assert len(live) == 1
        assert got[p.event_id].version == live[0].version
        assert got[p.event_id].version_type == live[0].event_type


def test_golden_record_survivorship_rules(spark, sf_small):
    """Longest-name / max-balance / source-priority rules hold for
    every entity."""
    from real_time_big_data_architect_spark.operators import mutations as MU
    from real_time_big_data_architect_spark.tables import load_table

    cust = {r.c_custkey: r for r in load_table(spark, sf_small, "customer").collect()}
    got = {r.c_custkey: r for r in MU.golden_record(spark, sf_small).collect()}
    assert set(got) == set(cust)
    for k, r in got.items():
        c = cust[k]
        variants = [c.c_name, c.c_name[:-3], c.c_name.upper()]
        want_name = max(variants, key=lambda s: (len(s), s))
        assert r.golden_name == want_name
        assert abs(r.golden_acctbal - float(c.c_acctbal)) < 1e-9
        assert r.golden_segment == c.c_mktsegment.lower()  # src-0 priority
        assert r.n_sources == 3


def test_snapshot_restore_is_exact_inverse(spark, sf_small):
    """v2 minus forward changes plus backward images == v1 exactly."""
    from real_time_big_data_architect_spark.operators import mutations as MU
    from real_time_big_data_architect_spark.tables import load_table

    got = {
        (r.o_orderkey, r.o_orderstatus, round(r.o_totalprice, 4))
        for r in MU.snapshot_restore(spark, sf_small).collect()
    }
    want = {
        (r.o_orderkey, r.o_orderstatus, round(float(r.o_totalprice), 4))
        for r in load_table(spark, sf_small, "orders").collect()
    }
    assert got == want
    # and the feed really changed something (the restore is not a no-op)
    v1 = MU._cdc_v1(spark, sf_small)
    v2 = MU._cdc_v2(v1)
    assert v2.count() != len(want) or {
        (r.o_orderkey, r.o_orderstatus) for r in v2.collect()
    } != {(k, s) for k, s, _ in want}
