from nba_data_pipeline_spark.operators.asof import asof_join, range_join


def test_range_join_interval_membership(spark):
    events = spark.createDataFrame(
        [(1, 5.0), (2, 15.0), (3, 25.0), (4, 100.0)], "event_id long, t double"
    )
    intervals = spark.createDataFrame(
        [("a", 0.0, 10.0), ("b", 10.0, 20.0), ("c", 20.0, 30.0)],
        "name string, lo double, hi double",
    )
    out = range_join(events, intervals, "t", "lo", "hi", broadcast_intervals=True)
    got = {r.event_id: r.name for r in out.collect()}
    assert got == {1: "a", 2: "b", 3: "c"}  # event 4 matches nothing (inner join)

    left = range_join(events, intervals, "t", "lo", "hi", how="left")
    assert left.count() == 4  # event 4 kept with nulls


def test_asof_join_backward(spark):
    left = spark.createDataFrame(
        [(1, 10, "k1"), (2, 20, "k1"), (3, 5, "k2"), (4, 7, "k1")],
        "eid long, t long, k string",
    )
    right = spark.createDataFrame(
        [("k1", 7, 700.0), ("k1", 15, 1500.0), ("k2", 99, 9900.0)],
        "k string, rt long, rv double",
    )
    out = asof_join(left, right, on="k", left_ts="t", right_ts="rt", right_vals=["rv"])
    got = {r.eid: r.rv for r in out.collect()}
    # eid1 t=10 -> rt=7; eid2 t=20 -> rt=15; eid3 t=5 -> nothing; eid4 t=7 -> exact tie matches
    assert got == {1: 700.0, 2: 1500.0, 3: None, 4: 700.0}


def test_asof_join_attaches_matched_row_as_unit(spark):
    """A NULL in one right value column must NOT blend values from an
    older right row — merge_asof attaches the matched row as-is."""
    from nba_data_pipeline_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 3)], "k long, ts long")
    right = spark.createDataFrame(
        [(1, 1, 1.0, 7.0), (1, 2, 5.0, None)],
        "k long, ts long, price double, qty double",
    )
    r = asof_join(left, right, "k", "ts", "ts", ["price", "qty"]).collect()[0]
    assert r.price == 5.0 and r.qty is None  # the ts=2 row, as-is


def test_asof_join_forward(spark):
    left = spark.createDataFrame(
        [(1, 10, "k1"), (2, 20, "k1"), (3, 5, "k2"), (4, 7, "k1")],
        "eid long, t long, k string",
    )
    right = spark.createDataFrame(
        [("k1", 7, 700.0), ("k1", 15, 1500.0), ("k2", 2, 200.0)],
        "k string, rt long, rv double",
    )
    out = asof_join(
        left, right, on="k", left_ts="t", right_ts="rt",
        right_vals=["rv"], direction="forward",
    )
    got = {r.eid: r.rv for r in out.collect()}
    # eid1 t=10 -> rt=15; eid2 t=20 -> nothing ahead; eid3 t=5 -> nothing
    # ahead on k2; eid4 t=7 -> exact tie matches forward too
    assert got == {1: 1500.0, 2: None, 3: None, 4: 700.0}


def test_asof_join_nearest(spark):
    left = spark.createDataFrame(
        [(1, 10, "k1"), (2, 11, "k1"), (3, 30, "k1"), (4, 1, "k1")],
        "eid long, t long, k string",
    )
    right = spark.createDataFrame(
        [("k1", 7, 700.0), ("k1", 13, 1300.0)],
        "k string, rt long, rv double",
    )
    out = asof_join(
        left, right, on="k", left_ts="t", right_ts="rt",
        right_vals=["rv"], direction="nearest",
    )
    got = {r.eid: r.rv for r in out.collect()}
    # eid1 t=10: dist 3 both ways -> tie takes backward (rt=7);
    # eid2 t=11: rt=13 closer; eid3 t=30: only backward exists;
    # eid4 t=1: only forward exists
    assert got == {1: 700.0, 2: 1300.0, 3: 1300.0, 4: 700.0}


def test_asof_join_bad_direction(spark):
    import pytest as _pytest

    left = spark.createDataFrame([(1, 1, "k")], "eid long, t long, k string")
    right = spark.createDataFrame([("k", 1, 1.0)], "k string, rt long, rv double")
    with _pytest.raises(ValueError, match="direction"):
        asof_join(left, right, on="k", left_ts="t", right_ts="rt",
                  right_vals=["rv"], direction="sideways")


def test_asof_join_randomized_vs_pandas(spark):
    """All three directions against pandas merge_asof on a seeded
    random fixture — an independent implementation agreeing on 600
    rows x 3 directions is strong evidence the window-sweep
    reformulation is exactly merge_asof."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    left_pd = pd.DataFrame(
        {
            "eid": np.arange(600),
            "k": rng.integers(0, 5, 600).astype("int64"),
            "t": rng.integers(0, 1000, 600).astype("int64"),
        }
    )
    right_pd = pd.DataFrame(
        {
            "k": rng.integers(0, 5, 300).astype("int64"),
            "rt": rng.integers(0, 1000, 300).astype("int64"),
            "rv": np.round(rng.random(300), 3),
        }
    )
    # merge_asof picks the LAST right row among exact (k, rt) dupes in
    # input order; our sweep picks the greatest value struct. Dedup to
    # one row per (k, rt) so the tie rule can't differ.
    right_pd = right_pd.groupby(["k", "rt"], as_index=False)["rv"].max()

    left = spark.createDataFrame(left_pd)
    right = spark.createDataFrame(right_pd)
    for direction in ("backward", "forward", "nearest"):
        got = {
            r.eid: r.rv
            for r in asof_join(
                left, right, on="k", left_ts="t", right_ts="rt",
                right_vals=["rv"], direction=direction,
            ).collect()
        }
        exp_df = pd.merge_asof(
            left_pd.sort_values("t"),
            right_pd.sort_values("rt"),
            left_on="t", right_on="rt", by="k", direction=direction,
        )
        exp = dict(zip(exp_df["eid"], exp_df["rv"]))
        for eid in exp:
            g, e = got[eid], exp[eid]
            assert (g is None and pd.isna(e)) or g == e, (direction, eid, g, e)


def test_asof_nearest_exact_tie_takes_backward_on_timestamps(spark):
    """Constructed equal-distance ties on timestamp keys: merge_asof
    semantics take the backward match. Exercises the interval-typed
    branch of the nearest comparison (ts - ts yields day-time
    intervals, not numbers)."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    us = dt.timedelta(microseconds=1)
    left = spark.createDataFrame(
        [(0, 1, base), (1, 1, base + 500 * us)], "eid long, k long, t timestamp"
    )
    right = spark.createDataFrame(
        [
            (1, base - 5 * us, 1.0), (1, base + 5 * us, 2.0),      # tie around eid 0
            (1, base + 400 * us, 3.0), (1, base + 600 * us, 4.0),  # 100us tie, eid 1
        ],
        "k long, rt timestamp, rv double",
    )
    got = {
        r.eid: r.rv
        for r in asof_join(
            left, right, on="k", left_ts="t", right_ts="rt",
            right_vals=["rv"], direction="nearest",
        ).collect()
    }
    assert got == {0: 1.0, 1: 3.0}


def test_asof_randomized_vs_pandas_on_timestamps(spark):
    """All three directions vs pandas merge_asof on timestamp-typed
    keys drawn from a coarse 10s grid, so equal-distance ties around
    left points occur constantly — the case the interval-comparison
    branch must get right."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(11)
    base = pd.Timestamp("2024-01-01")
    left_pd = pd.DataFrame(
        {
            "eid": np.arange(400),
            "k": rng.integers(0, 4, 400).astype("int64"),
            "t": base + pd.to_timedelta(rng.integers(0, 50, 400) * 10, unit="s"),
        }
    )
    right_pd = pd.DataFrame(
        {
            "k": rng.integers(0, 4, 200).astype("int64"),
            "rt": base + pd.to_timedelta(rng.integers(0, 50, 200) * 10, unit="s"),
            "rv": np.round(rng.random(200), 3),
        }
    )
    right_pd = right_pd.groupby(["k", "rt"], as_index=False)["rv"].max()
    left = spark.createDataFrame(left_pd)
    right = spark.createDataFrame(right_pd)
    for direction in ("backward", "forward", "nearest"):
        got = {
            r.eid: r.rv
            for r in asof_join(
                left, right, on="k", left_ts="t", right_ts="rt",
                right_vals=["rv"], direction=direction,
            ).collect()
        }
        exp_df = pd.merge_asof(
            left_pd.sort_values("t"),
            right_pd.sort_values("rt"),
            left_on="t", right_on="rt", by="k", direction=direction,
        )
        exp = dict(zip(exp_df["eid"], exp_df["rv"]))
        for eid in exp:
            g, e = got[eid], exp[eid]
            assert (g is None and pd.isna(e)) or g == e, (direction, eid, g, e)


def test_merge_intervals_contained_and_gap(spark):
    from nba_data_pipeline_spark.operators.asof import merge_intervals

    rows = [
        # key a: [0,10] contains [2,3]; [8,12] overlaps; [20,25] separate
        ("a", 0, 10), ("a", 2, 3), ("a", 8, 12), ("a", 20, 25),
        # key b: adjacent [0,5],[5,8] touch (lo == prev hi -> merged,
        # since a new island needs lo > running max)
        ("b", 0, 5), ("b", 5, 8),
    ]
    df = spark.createDataFrame(rows, "k string, lo long, hi long")
    out = sorted(
        ((r.k, r.lo, r.hi, r.n_merged) for r in merge_intervals(df, ["k"], "lo", "hi").collect())
    )
    assert out == [("a", 0, 12, 3), ("a", 20, 25, 1), ("b", 0, 8, 2)]
    # min_gap bridges the [12..20] hole on key a
    out2 = sorted(
        ((r.k, r.lo, r.hi, r.n_merged) for r in merge_intervals(df, ["k"], "lo", "hi", min_gap=8).collect())
    )
    assert out2 == [("a", 0, 25, 4), ("b", 0, 8, 2)]
