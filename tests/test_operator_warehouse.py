"""Schema-agnostic unit tests for the round-7 parametric warehouse/CDC
operators (operators/warehouse.py).

Deliberately NOT testdata-bound: every test hand-builds frames with
arbitrary column names (account/changed_at/plan, device/seen/fw, ...)
and checks against an independent pure-Python reference — the
extraction contract established in rounds 5–6. The fixture-bound
registry queries (scd2_build, merge_upsert, join_temporal_scd2,
interval_merge, timeseries_gapfill, dim_surrogate_keys_sketch) keep
pinning exact-value semantics against the DuckDB oracles.
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import Row

from dataframe_differ_spark.operators.warehouse import (
    gapfill,
    interval_merge,
    merge_upsert,
    pit_join,
    scd2_build,
    snapshot_at,
    surrogate_keys,
)


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def changes_df(spark):
    """(account, changed_at, seq, plan): two accounts' plan history,
    including a same-instant tie broken by seq."""
    rows = [
        Row(account="acme", changed_at=_ts("2024-01-01T00:00:00"), seq=1, plan="free"),
        Row(account="acme", changed_at=_ts("2024-02-01T00:00:00"), seq=2, plan="pro"),
        Row(account="acme", changed_at=_ts("2024-02-01T00:00:00"), seq=3, plan="team"),
        Row(account="beta", changed_at=_ts("2024-01-15T00:00:00"), seq=4, plan="pro"),
    ]
    return spark.createDataFrame(rows)


def test_scd2_build_intervals_chain(spark, changes_df):
    out = {
        (r.account, r.seq): r
        for r in scd2_build(
            changes_df, ["account"], "changed_at", tiebreak_cols=["seq"]
        ).collect()
    }
    assert len(out) == 4
    # acme chain: seq1 -> seq2 (tied instants ordered by seq) -> seq3 open
    assert out[("acme", 1)].valid_to == _ts("2024-02-01T00:00:00")
    assert not out[("acme", 1)].is_current
    assert out[("acme", 2)].valid_from == _ts("2024-02-01T00:00:00")
    assert out[("acme", 2)].valid_to == _ts("2024-02-01T00:00:00")
    assert out[("acme", 3)].valid_to is None and out[("acme", 3)].is_current
    assert out[("beta", 4)].is_current
    # every interval chains: valid_from of successor == valid_to
    assert out[("acme", 2)].valid_from == out[("acme", 1)].valid_to


def test_snapshot_at_picks_latest_per_key(spark, changes_df):
    snap = {
        r.account: r.plan
        for r in snapshot_at(
            changes_df,
            ["account"],
            "changed_at",
            "2024-01-20 00:00:00",
            tiebreak_cols=["seq"],
        ).collect()
    }
    assert snap == {"acme": "free", "beta": "pro"}
    # at the tied instant the highest tiebreak wins (latest state)
    snap2 = {
        r.account: r.plan
        for r in snapshot_at(
            changes_df,
            ["account"],
            "changed_at",
            "2024-02-01 00:00:00",
            tiebreak_cols=["seq"],
        ).collect()
    }
    assert snap2["acme"] == "team"


def test_merge_upsert_update_delete_insert(spark):
    target = spark.createDataFrame(
        [Row(sku=i, qty=10 * i, site="w1") for i in range(1, 6)]
    )
    # insert rows ('I') carry the full target schema; U/D rows carry the
    # payload named by update_map
    changes = spark.createDataFrame(
        [
            Row(sku=2, op="D", new_qty=None, qty=None, site=None),
            Row(sku=3, op="U", new_qty=999, qty=None, site=None),
            Row(sku=9, op="I", new_qty=None, qty=70, site="w2"),
        ]
    )
    merged = merge_upsert(
        target,
        changes,
        ["sku"],
        update_map={"qty": "new_qty"},
    )
    got = {r.sku: (r.qty, r.site) for r in merged.collect()}
    assert set(got) == {1, 3, 4, 5, 9}  # 2 deleted, 9 inserted
    assert got[3] == (999, "w1")  # updated qty, untouched site
    assert got[1] == (10, "w1")  # passthrough
    assert got[9][0] == 70  # insert carries its own payload


def test_merge_upsert_default_update_map(spark):
    target = spark.createDataFrame([Row(k=1, v=5, w="a"), Row(k=2, v=6, w="b")])
    changes = spark.createDataFrame([Row(k=2, op="U", v=60)])
    got = {r.k: (r.v, r.w) for r in merge_upsert(target, changes.select("k", "op", "v"), ["k"]).collect()}
    assert got == {1: (5, "a"), 2: (60, "b")}


def test_pit_join_attributes_probe_to_state(spark, changes_df):
    probes = spark.createDataFrame(
        [
            Row(account="acme", changed_at=_ts("2024-01-10T00:00:00"), seq=100, click="a"),
            # exactly at the tied change instant: sees the NEW (seq-3) state
            Row(account="acme", changed_at=_ts("2024-02-01T00:00:00"), seq=101, click="b"),
            Row(account="beta", changed_at=_ts("2024-01-01T00:00:00"), seq=102, click="c"),
        ]
    )
    out = {
        r.click: r.plan
        for r in pit_join(
            probes,
            changes_df,
            ["account"],
            "changed_at",
            ["plan"],
            tiebreak_cols=["seq"],
        ).collect()
    }
    assert out == {"a": "free", "b": "team", "c": None}


def test_interval_merge_islands(spark):
    rows = [
        # device d1: [0,10) [5,15) overlap -> one span; [30,40) separate
        Row(device="d1", s=0, e=10, i=1),
        Row(device="d1", s=5, e=15, i=2),
        Row(device="d1", s=30, e=40, i=3),
        # nested interval swallowed
        Row(device="d2", s=0, e=100, i=4),
        Row(device="d2", s=10, e=20, i=5),
    ]
    out = interval_merge(
        spark.createDataFrame(rows), ["device"], "s", "e", tiebreak_cols=["i"]
    ).collect()
    got = {(r.device, r.span_start): (r.span_end, r.n_rows) for r in out}
    assert got == {
        ("d1", 0): (15, 2),
        ("d1", 30): (40, 1),
        ("d2", 0): (100, 2),
    }


def test_gapfill_zero_and_ffill(spark):
    rows = [
        Row(sensor="s1", day=1, n=2, level=10.0),
        Row(sensor="s1", day=4, n=1, level=12.0),
        Row(sensor="s2", day=2, n=5, level=7.0),
    ]
    # integer tick column: use a 1-unit interval via a day offset date
    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows).withColumn(
        "day", F.expr("date_add(DATE '2024-01-01', CAST(day AS INT))")
    )
    out = gapfill(df, ["sensor"], "day", {"n": "zero", "level": "ffill"})
    got = {(r.sensor, str(r.day)): (r.n, r.level) for r in out.collect()}
    # spine is the global [min, max] = Jan 2 .. Jan 5 for BOTH sensors
    assert len(got) == 8
    assert got[("s1", "2024-01-03")] == (0, 10.0)  # zero-filled, carried
    assert got[("s1", "2024-01-05")] == (1, 12.0)  # observed day
    assert got[("s2", "2024-01-02")] == (0, None)  # leading gap stays NULL
    assert got[("s2", "2024-01-04")] == (0, 7.0)  # carried forward


def test_surrogate_keys_dense_and_ordered(spark):
    rows = [Row(lang=lang, region=reg) for lang in "cab" for reg in ("x", "y")]
    df = spark.createDataFrame(rows + rows)  # duplicates collapse
    out = surrogate_keys(df, ["lang", "region"]).collect()
    by_sk = sorted((r.dim_sk, r.lang, r.region) for r in out)
    assert [x[0] for x in by_sk] == [1, 2, 3, 4, 5, 6]  # dense, 1-based
    assert [(x[1], x[2]) for x in by_sk] == sorted(
        {(r.lang, r.region) for r in rows}
    )


def test_surrogate_keys_numeric_leading_col(spark):
    df = spark.createDataFrame([Row(bucket=b) for b in (30, 10, 20, 10)])
    out = sorted((r.dim_sk, r.bucket) for r in surrogate_keys(df, ["bucket"]).collect())
    assert out == [(1, 10), (2, 20), (3, 30)]


def test_pit_join_multiple_state_cols(spark):
    dim = spark.createDataFrame(
        [
            Row(k="x", at=1, plan="free", tier=0),
            Row(k="x", at=5, plan="pro", tier=2),
        ]
    )
    probe = spark.createDataFrame(
        [Row(k="x", at=0, q="a"), Row(k="x", at=3, q="b"), Row(k="x", at=9, q="c")]
    )
    out = {
        r.q: (r.plan, r.tier)
        for r in pit_join(probe, dim, ["k"], "at", ["plan", "tier"]).collect()
    }
    assert out == {"a": (None, None), "b": ("free", 0), "c": ("pro", 2)}


def test_gapfill_timestamp_step(spark):
    from datetime import datetime

    from pyspark.sql import functions as F

    rows = [
        Row(m="cpu", at=datetime(2024, 1, 1, 0), v=1.0),
        Row(m="cpu", at=datetime(2024, 1, 1, 12), v=3.0),
        Row(m="cpu", at=datetime(2024, 1, 2, 0), v=5.0),
    ]
    out = gapfill(
        spark.createDataFrame(rows), ["m"], "at", {"v": "ffill"},
        step="6 hours",
    ).collect()
    got = {r.at.hour + 24 * (r.at.day - 1): r.v for r in out}
    # 5 ticks at 6h cadence; gaps carry the last value forward
    assert got == {0: 1.0, 6: 1.0, 12: 3.0, 18: 3.0, 24: 5.0}


def test_surrogate_keys_date_leading_col(spark):
    from datetime import date

    rows = [Row(d=date(2024, 1, x)) for x in (5, 2, 9, 2)]
    out = sorted(
        (r.dim_sk, str(r.d))
        for r in surrogate_keys(spark.createDataFrame(rows), ["d"]).collect()
    )
    assert out == [(1, "2024-01-02"), (2, "2024-01-05"), (3, "2024-01-09")]


def test_interval_merge_touching_intervals_merge(spark):
    # start == running max end: NOT greater, so touching intervals merge
    rows = [Row(g=1, s=0, e=10, i=1), Row(g=1, s=10, e=20, i=2)]
    out = interval_merge(
        spark.createDataFrame(rows), ["g"], "s", "e", tiebreak_cols=["i"]
    ).collect()
    assert len(out) == 1 and out[0].span_start == 0 and out[0].span_end == 20


# ---------------------------------------------------------------------------
# Round-8 ADVICE guards: loud failures instead of silent divergence
# ---------------------------------------------------------------------------


def test_merge_upsert_raises_on_dropped_inserts(spark):
    # changeset lacks target column 'site' but carries an 'I' row: the
    # old code silently skipped the insert branch (data loss)
    target = spark.createDataFrame([Row(sku=1, qty=10, site="w1")])
    changes = spark.createDataFrame(
        [Row(sku=9, op="I", qty=70), Row(sku=1, op="U", qty=11)]
    )
    with pytest.raises(ValueError, match="'I' rows but lacks target"):
        merge_upsert(target, changes, ["sku"])
    # the same partial changeset WITHOUT inserts is fine
    ud_only = changes.filter("op <> 'I'")
    got = {r.sku: r.qty for r in merge_upsert(target, ud_only, ["sku"]).collect()}
    assert got == {1: 11}


def test_merge_upsert_validate_unique_keys(spark):
    target = spark.createDataFrame([Row(k=1, v=5), Row(k=2, v=6)])
    dup = spark.createDataFrame(
        [Row(k=2, op="U", v=60), Row(k=2, op="U", v=61)]
    )
    with pytest.raises(ValueError, match="multiple U/D rows"):
        merge_upsert(target, dup, ["k"], validate_unique_keys=True)
    ok = spark.createDataFrame([Row(k=2, op="U", v=60), Row(k=1, op="D", v=None)])
    got = {
        r.k: r.v
        for r in merge_upsert(
            target, ok, ["k"], validate_unique_keys=True
        ).collect()
    }
    assert got == {2: 60}


def test_gapfill_validate_rejects_off_grid_rows(spark):
    from datetime import datetime

    aligned = [
        Row(m="cpu", at=datetime(2024, 1, 1, 0), v=1.0),
        Row(m="cpu", at=datetime(2024, 1, 1, 12), v=3.0),
    ]
    out = gapfill(
        spark.createDataFrame(aligned), ["m"], "at", {"v": "ffill"},
        step="6 hours", validate=True,
    ).collect()
    assert len(out) == 3  # 0h, 6h, 12h
    off = aligned + [Row(m="cpu", at=datetime(2024, 1, 1, 7), v=9.0)]
    with pytest.raises(ValueError, match="not on\nthe min|not on the min"):
        gapfill(
            spark.createDataFrame(off), ["m"], "at", {"v": "ffill"},
            step="6 hours", validate=True,
        ).collect()


def test_surrogate_keys_null_key_columns(spark):
    # concat_ws SKIPS nulls: pre-fix, the ('a', NULL, ci) cluster's
    # bucket proxy 'a\x00ci' sorted ABOVE the ('a', '', ci) cluster's
    # 'a\x00\x00ci' while tuple order (nulls first) puts it BELOW —
    # crossing a bucket boundary, that inverted whole rank blocks.
    rows = (
        [Row(c1="a", c2=None, c3=f"c{i}") for i in range(10)]
        + [Row(c1="a", c2="", c3=f"c{i}") for i in range(10)]
        + [Row(c1=None, c2="x", c3="y"), Row(c1="b", c2="z", c3=None)]
    )
    df = spark.createDataFrame(rows)
    out = {
        (r.c1, r.c2, r.c3): r.dim_sk
        for r in surrogate_keys(df, ["c1", "c2", "c3"], n_buckets=4).collect()
    }

    def key(t):
        return tuple((0, "") if v is None else (1, v) for v in t)

    expected = {
        t: i + 1
        for i, t in enumerate(sorted({(r.c1, r.c2, r.c3) for r in rows}, key=key))
    }
    assert out == expected
