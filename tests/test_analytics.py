"""Semantic tests for the batch analytics compositions (sessionize,
rolling z-score) beyond the oracle hash check: invariants that hold by
construction, and a pure-Python recompute on one user's timeline."""

from pyspark.sql import functions as F

from aws_datalake_framework_api_spark.operators.analytics import SESSION_GAP_S
from aws_datalake_framework_api_spark.operators.windows import (
    ZSCORE_LOOKBACK,
    ZSCORE_MIN_N,
    ZSCORE_THRESH_SQ,
)
from aws_datalake_framework_api_spark.queries_all import QUERIES
from aws_datalake_framework_api_spark.sources.readers import load_table


def test_sessionize_partitions_every_event_exactly_once(spark, sf_dir):
    """Σ session n_events == |events|, and per-user session_seq is
    dense 1..k (a running sum of starts can't skip)."""
    ev_n = load_table(spark, sf_dir, "events").count()
    sess = QUERIES["b_sessionize"](spark, sf_dir).cache()
    assert sess.agg(F.sum("n_events")).first()[0] == ev_n
    bad = (
        sess.groupBy("user_id")
        .agg(
            F.min("session_seq").alias("lo"),
            F.max("session_seq").alias("hi"),
            F.count("*").alias("k"),
        )
        .filter((F.col("lo") != 1) | (F.col("hi") != F.col("k")))
        .count()
    )
    assert bad == 0
    sess.unpersist()


def test_sessionize_gap_rule_on_one_user(spark, sf_dir):
    """Recompute one user's sessions in Python from the raw timeline
    and compare (session count and per-session sizes)."""
    ev = load_table(spark, sf_dir, "events")
    uid = ev.groupBy("user_id").count().orderBy(F.desc("count")).first()["user_id"]
    times = [
        r["us"]
        for r in ev.filter(F.col("user_id") == uid)
        .select(F.unix_micros(F.col("ts").cast("timestamp")).alias("us"))
        .orderBy("us")
        .collect()
    ]
    sizes, cur = [], 0
    prev = None
    for t in times:
        if prev is None or t - prev > SESSION_GAP_S * 1_000_000:
            if cur:
                sizes.append(cur)
            cur = 0
        cur += 1
        prev = t
    sizes.append(cur)
    got = sorted(
        r["n_events"]
        for r in QUERIES["b_sessionize"](spark, sf_dir)
        .filter(F.col("user_id") == uid)
        .collect()
    )
    assert got == sorted(sizes)


def test_zscore_matches_python_recompute(spark, sf_dir):
    """Exact-integer recompute of the trailing-window flag for one
    user's full timeline."""
    uid = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .count()
        .orderBy(F.desc("count"))
        .first()["user_id"]
    )
    rows = (
        QUERIES["b_win_zscore"](spark, sf_dir)
        .filter(F.col("user_id") == uid)
        .join(
            load_table(spark, sf_dir, "events").select("event_id", "ts"),
            "event_id",
        )
        .orderBy("ts", "event_id")
        .collect()
    )
    xs = [r["x_c"] for r in rows]
    for i, r in enumerate(rows):
        window = xs[max(0, i - ZSCORE_LOOKBACK) : i]
        n, s1 = len(window), sum(window)
        s2 = sum(v * v for v in window)
        want = int(
            n >= ZSCORE_MIN_N
            and (n * xs[i] - s1) ** 2 > ZSCORE_THRESH_SQ * (n * s2 - s1 * s1)
        )
        assert r["anomaly"] == want, f"row {i}: {r}"
        assert r["n_prev"] == n and r["s1"] == s1


def test_regression_matches_numpy_lstsq(spark, sf_dir):
    """Exact-rational slope/intercept vs numpy least squares on the
    same quantized inputs (agreement to the 1e-6 emission grid)."""
    import numpy as np
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round("l_quantity").cast("long").alias("x"),
        F.round("l_extendedprice").cast("long").alias("y"),
    )
    got = {r["l_returnflag"]: r for r in QUERIES["b_agg_regression"](spark, sf_dir).collect()}
    for flag, rows in (
        (f, [(r["x"], r["y"]) for r in li.filter(F.col("l_returnflag") == f).collect()])
        for f in got
    ):
        x = np.array([a for a, _ in rows], dtype=np.float64)
        y = np.array([b for _, b in rows], dtype=np.float64)
        slope, intercept = np.polyfit(x, y, 1)
        assert abs(got[flag]["slope_x1e6"] / 1e6 - slope) < 2e-6 + abs(slope) * 1e-9
        assert abs(got[flag]["intercept_x1e6"] / 1e6 - intercept) < 2e-6 + abs(intercept) * 1e-9


def test_gapfill_grid_is_dense_and_marks_fills(spark, sf_dir):
    """Every (type, day) cell exists exactly once across the full
    [min_day, max_day] span; filled=1 cells carry n=0."""
    import datetime

    from pyspark.sql import functions as F

    out = QUERIES["b_ts_gapfill"](spark, sf_dir).collect()
    days = {r["day"] for r in out}
    types = {r["event_type"] for r in out}
    span = (max(days) - min(days)).days + 1
    assert len(days) == span
    assert len(out) == span * len(types)
    assert len({(r["event_type"], r["day"]) for r in out}) == len(out)
    for r in out:
        if r["filled"] == 1:
            assert r["n"] == 0
        else:
            assert r["n"] > 0


def test_heavyhitters_candidate_guarantee_and_exact_topm(spark, sf_dir):
    """The MG pigeonhole guarantee, asserted directly: every word with
    true count > N/(HH_K+1) appears in the candidate summary union, and
    the final output IS the exact brute-force top-M (sketch in the
    middle notwithstanding).  Also pins the candidate set's size bound
    (≤ partitions × HH_K) — the property that keeps the shuffle O(k)."""
    from aws_datalake_framework_api_spark.operators.aggregates import (
        HH_K,
        HH_M,
        _mg_kernel,
    )

    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(
            F.filter(
                F.split(F.trim(F.lower(F.col("text"))), " "),
                lambda x: F.length(x) > 0,
            )
        ).alias("word")
    )
    n_parts = words.rdd.getNumPartitions()
    cands = {r["word"] for r in words.mapInPandas(_mg_kernel, "word string").collect()}
    assert len(cands) <= n_parts * HH_K

    exact = words.groupBy("word").count().collect()
    n_total = sum(r["count"] for r in exact)
    thresh = n_total / (HH_K + 1)
    missed = [r["word"] for r in exact if r["count"] > thresh and r["word"] not in cands]
    assert missed == [], f"MG guarantee violated for {missed}"

    brute = sorted(exact, key=lambda r: (-r["count"], r["word"]))[:HH_M]
    got = QUERIES["b_agg_heavyhitters"](spark, sf_dir).collect()
    assert [(r["word"], r["cnt"]) for r in got] == [
        (r["word"], r["count"]) for r in brute
    ]
