"""Table-driven property tests: generate hundreds of random cases in
Python, compute expected values with an independent reference
implementation, and evaluate the engine's Column expressions over all
cases in ONE Spark pass (hypothesis-per-example with a JVM round-trip
each would be prohibitively slow)."""

import random

from pyspark.sql import functions as F

from nba_data_pipeline_spark.functions.gameid import (
    season_from_game_id,
    season_type_from_game_id,
)
from nba_data_pipeline_spark.functions.timeops import clock_to_seconds

RNG = random.Random(42)


def test_clock_to_seconds_matches_reference_formula(spark):
    cases = []
    for i in range(500):
        period = RNG.randint(1, 8)
        length = 720 if period <= 4 else 300
        rem = RNG.randint(0, length)
        clock = f"{rem // 60}:{rem % 60:02d}"
        if period <= 4:
            expected = (period - 1) * 720 + (720 - rem)
        else:
            expected = 2880 + (period - 5) * 300 + (300 - rem)
        cases.append((i, period, clock, expected))
    df = spark.createDataFrame(cases, "i long, period long, clock string, expected long")
    out = df.withColumn("got", clock_to_seconds("period", "clock"))
    bad = out.filter(F.col("got") != F.col("expected")).collect()
    assert not bad, bad[:5]


def test_game_id_codec_matches_reference_decoder(spark):
    def ref_season(gid):  # reference utils/utils.py:66-69
        start = int("20" + gid[3:5])
        return f"{start}-{str(start + 1)[-2:]:>02}"

    ref_type = {"1": "Pre Season", "2": "Regular Season", "4": "Playoffs"}
    cases = []
    for i in range(500):
        digit = RNG.choice("1245")
        yy = RNG.randint(0, 99)
        tail = RNG.randint(0, 99999)
        gid = f"00{digit}{yy:02d}{tail:05d}"
        cases.append((i, gid, ref_season(gid), ref_type.get(digit)))
    df = spark.createDataFrame(cases, "i long, gid string, exp_season string, exp_type string")
    out = df.withColumn("season", season_from_game_id("gid")).withColumn(
        "stype", season_type_from_game_id("gid")
    )
    bad = out.filter(
        (F.col("season") != F.col("exp_season"))
        | ~(
            F.col("stype").eqNullSafe(F.col("exp_type"))
        )
    ).collect()
    assert not bad, bad[:5]


def test_sessionize_matches_python_reference(spark):
    from nba_data_pipeline_spark.operators.windows import sessionize
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows, expected = [], {}
    for user in range(20):
        t = RNG.randint(0, 1000)
        session = 0
        for j in range(30):
            gap = RNG.choice([5, 30, 120, 4000, 8000])
            t += gap
            if j == 0 or gap > 3600:
                session += 1
            eid = user * 1000 + j
            rows.append((eid, user, t0 + dt.timedelta(seconds=t)))
            expected[eid] = session
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    out = sessionize(df, ["user_id"], "ts", 3600, order_by=["ts", "event_id"])
    got = {r.event_id: r.session_id for r in out.collect()}
    assert got == expected


def test_minhash_jaccard_estimate_tracks_true_jaccard(spark):
    """MinHash signature agreement rate approximates true Jaccard
    (the property LSH banding relies on)."""
    from nba_data_pipeline_spark.operators.dedup import minhash_signatures

    words = [f"w{i}" for i in range(60)]
    base = " ".join(words)
    variant = " ".join(words[:40] + [f"x{i}" for i in range(20)])  # ~2/3 shingle overlap
    df = spark.createDataFrame([(1, base), (2, variant)], "doc_id long, text string")
    sigs = minhash_signatures(df, "doc_id", "text", num_perm=64)
    rows = {r.doc_id: [r[f"sig{i}"] for i in range(64)] for r in sigs.collect()}
    agree = sum(a == b for a, b in zip(rows[1], rows[2])) / 64
    # true 3-gram shingle jaccard of the two docs:
    def sh(t):
        toks = t.split()
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
    j = len(sh(base) & sh(variant)) / len(sh(base) | sh(variant))
    assert abs(agree - j) < 0.2  # 64 perms: estimator within ~0.2 w.h.p.
