"""Property-based model test for the shared MERGE clause engine
(sources/merge_clauses.py): random ordered clause lists over random
target/source tables, compared against an independent row-at-a-time
pandas model of delta-spark's first-match-wins semantics.

The Spark side is the production planner (one left join + CASE
chains); the model walks rows in Python.  Any disagreement — clause
ordering, condition scoping (matched sees t+s, insert sees s only,
by-source sees t only), SET resolution, update-all vs set-map — fails
the comparison.  Spark-backed Hypothesis: few examples, no deadline.
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from aws_datalake_framework_api_spark.sources.merge_clauses import (
    check_clauses,
    plan_merge,
)

# conditions as (sql, python) pairs — matched clauses see both sides
MATCHED_CONDS = [
    (None, lambda t, s: True),
    ("t.v > s.v", lambda t, s: t["v"] > s["v"]),
    ("s.v > t.v", lambda t, s: s["v"] > t["v"]),
    ("t.k % 2 = 0", lambda t, s: t["k"] % 2 == 0),
]
INSERT_CONDS = [
    (None, lambda s: True),
    ("s.k % 2 = 1", lambda s: s["k"] % 2 == 1),
    ("s.v > 5", lambda s: s["v"] > 5),
]
BYSRC_CONDS = [
    (None, lambda t: True),
    ("t.k % 2 = 0", lambda t: t["k"] % 2 == 0),
    ("t.v < 4", lambda t: t["v"] < 4),
]
MATCHED_SETS = [
    (None, None),  # update-all: row becomes the source row
    ({"v": "s.v + 100"}, lambda t, s: {**t, "v": s["v"] + 100.0}),
    ({"part": "'upd'"}, lambda t, s: {**t, "part": "upd"}),
]
INSERT_SETS = [
    (None, None),  # insert-all: the source row
    # partial set: unspecified columns insert as NULL (delta-spark
    # whenNotMatchedInsert(values=...) parity — ADVICE r7)
    ({"k": "s.k", "v": "s.v * 2"},
     lambda s: {"k": s["k"], "part": None, "v": s["v"] * 2.0}),
]
BYSRC_SETS = [
    ({"part": "'stale'"}, lambda t: {**t, "part": "stale"}),
    ({"v": "t.v + 1"}, lambda t: {**t, "v": t["v"] + 1.0}),
]


def _clause(kind, ci, si):
    if kind == "mu":
        sql_set, _ = MATCHED_SETS[si % len(MATCHED_SETS)]
        return {"when": "matched", "action": "update", "set": sql_set,
                "condition": MATCHED_CONDS[ci % len(MATCHED_CONDS)][0]}
    if kind == "md":
        return {"when": "matched", "action": "delete",
                "condition": MATCHED_CONDS[ci % len(MATCHED_CONDS)][0]}
    if kind == "ni":
        sql_set, _ = INSERT_SETS[si % len(INSERT_SETS)]
        return {"when": "not_matched", "action": "insert", "set": sql_set,
                "condition": INSERT_CONDS[ci % len(INSERT_CONDS)][0]}
    if kind == "bu":
        sql_set, _ = BYSRC_SETS[si % len(BYSRC_SETS)]
        return {"when": "not_matched_by_source", "action": "update",
                "set": sql_set,
                "condition": BYSRC_CONDS[ci % len(BYSRC_CONDS)][0]}
    return {"when": "not_matched_by_source", "action": "delete",
            "condition": BYSRC_CONDS[ci % len(BYSRC_CONDS)][0]}


def _model(target, source, clauses):
    """Row-at-a-time reference: first matching clause wins per row."""
    src_by_k = {r["k"]: r for r in source}
    out = []
    for t in target:
        s = src_by_k.get(t["k"])
        verdict = None
        for cl in clauses:
            if cl["when"] == "matched" and s is not None:
                _, pred = next(
                    c for c in MATCHED_CONDS if c[0] == cl["condition"]
                )
                if pred(t, s):
                    verdict = cl
                    break
            elif cl["when"] == "not_matched_by_source" and s is None:
                _, pred = next(
                    c for c in BYSRC_CONDS if c[0] == cl["condition"]
                )
                if pred(t):
                    verdict = cl
                    break
        if verdict is None:
            out.append(t)
        elif verdict["action"] == "delete":
            pass
        elif verdict["when"] == "matched":
            if verdict["set"] is None:
                out.append(dict(s))
            else:
                fn = next(
                    m for m in MATCHED_SETS if m[0] == verdict["set"]
                )[1]
                out.append(fn(t, s))
        else:  # by-source update
            fn = next(m for m in BYSRC_SETS if m[0] == verdict["set"])[1]
            out.append(fn(t))
    tkeys = {t["k"] for t in target}
    for s in source:
        if s["k"] in tkeys:
            continue
        for cl in clauses:
            if cl["when"] != "not_matched":
                continue
            _, pred = next(
                c for c in INSERT_CONDS if c[0] == cl["condition"]
            )
            if pred(s):
                if cl["set"] is None:
                    out.append(dict(s))
                else:
                    fn = next(
                        m for m in INSERT_SETS if m[0] == cl["set"]
                    )[1]
                    out.append(fn(s))
                break
    return sorted((r["k"], r["part"], round(r["v"], 6)) for r in out)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
@given(
    tkeys=st.sets(st.integers(0, 7), min_size=1, max_size=6),
    skeys=st.sets(st.integers(0, 9), min_size=1, max_size=6),
    tv=st.integers(0, 9),
    sv=st.integers(0, 9),
    kinds=st.lists(
        st.tuples(
            st.sampled_from(["mu", "md", "ni", "bu", "bd"]),
            st.integers(0, 3),
            st.integers(0, 2),
        ),
        min_size=1,
        max_size=4,
    ),
)
def test_plan_merge_matches_row_model(spark, tkeys, skeys, tv, sv, kinds):
    target = [
        {"k": k, "part": f"p{k % 3}", "v": float((k * 3 + tv) % 10)}
        for k in sorted(tkeys)
    ]
    source = [
        {"k": k, "part": f"s{k % 2}", "v": float((k * 7 + sv) % 10)}
        for k in sorted(skeys)
    ]
    clauses = [_clause(*t) for t in kinds]
    cols = ["k", "part", "v"]
    check_clauses(clauses, cols)
    tdf = spark.createDataFrame(
        [(r["k"], r["part"], r["v"]) for r in target],
        "k int, part string, v double",
    )
    sdf = spark.createDataFrame(
        [(r["k"], r["part"], r["v"]) for r in source],
        "k int, part string, v double",
    )
    types = {f.name: f.dataType for f in tdf.schema.fields}
    new_data, stats = plan_merge(
        tdf, sdf, ["k"], clauses, cols, types, tdf.select("k")
    )
    got = sorted(
        (r["k"], r["part"], round(r["v"], 6)) for r in new_data.collect()
    )
    want = _model(target, source, clauses)
    assert got == want, (clauses, got, want)
    # stats bookkeeping is consistent with the model's row movements
    assert (
        len(got)
        == len(target) - stats["deleted"] + stats["inserted"]
    )


def test_check_clauses_rejects_malformed():
    with pytest.raises(ValueError, match="unknown merge clause"):
        check_clauses([{"when": "nope", "action": "update"}], ["k"])
    with pytest.raises(ValueError, match="supports"):
        check_clauses(
            [{"when": "not_matched", "action": "delete"}], ["k"]
        )
    with pytest.raises(ValueError, match="unknown columns"):
        check_clauses(
            [{"when": "matched", "action": "update", "set": {"zz": "1"}}],
            ["k"],
        )
    with pytest.raises(ValueError, match="meaningless"):
        check_clauses(
            [{"when": "matched", "action": "delete", "set": {"k": "1"}}],
            ["k"],
        )


def test_partial_insert_set_nulls_unspecified_columns(spark):
    """delta-spark whenNotMatchedInsert(values=...) parity (ADVICE r7):
    a PARTIAL insert set map NULLs the columns it does not mention;
    only set=None (INSERT *) carries every source column's value."""
    tdf = spark.createDataFrame([(1, "p", 1.0)], "k int, part string, v double")
    sdf = spark.createDataFrame(
        [(2, "src", 5.0), (3, "src", 7.0)], "k int, part string, v double"
    )
    types = {f.name: f.dataType for f in tdf.schema.fields}
    new_data, stats = plan_merge(
        tdf, sdf, ["k"],
        [
            {"when": "not_matched", "action": "insert",
             "set": {"k": "s.k", "v": "s.v * 10"}, "condition": "s.k = 2"},
            {"when": "not_matched", "action": "insert"},
        ],
        ["k", "part", "v"], types, tdf.select("k"),
    )
    got = sorted(
        (r["k"], r["part"], r["v"]) for r in new_data.collect()
    )
    # k=2 hits the partial-set clause: part inserts as NULL; k=3 falls
    # through to INSERT * and carries the source part.
    assert got == [(1, "p", 1.0), (2, None, 50.0), (3, "src", 7.0)]
    assert stats == {"updated": 0, "deleted": 0, "inserted": 2}


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
@given(
    tkeys=st.sets(st.integers(0, 7), min_size=1, max_size=6),
    skeys=st.sets(st.integers(0, 9), min_size=1, max_size=6),
    tv=st.integers(0, 9),
    sv=st.integers(0, 9),
    kinds=st.lists(
        st.tuples(
            st.sampled_from(["mu", "md", "ni", "bu", "bd"]),
            st.integers(0, 3),
            st.integers(0, 2),
        ),
        min_size=1,
        max_size=4,
    ),
)
def test_plan_merge_mor_equals_cow(spark, tkeys, skeys, tv, sv, kinds):
    """The merge-on-read planner and the copy-on-write planner are the
    same function observed differently: (target − touched) ∪ new_rows
    must equal plan_merge's surviving set for every random clause
    list, and the stats must agree.  A first-match-wins divergence, a
    row touched twice, or an update surviving as both versions all
    fail here."""
    from aws_datalake_framework_api_spark.sources.merge_clauses import (
        plan_merge_mor,
    )

    target = [
        {"k": k, "part": f"p{k % 3}", "v": float((k * 3 + tv) % 10)}
        for k in sorted(tkeys)
    ]
    source = [
        {"k": k, "part": f"s{k % 2}", "v": float((k * 7 + sv) % 10)}
        for k in sorted(skeys)
    ]
    clauses = [_clause(*t) for t in kinds]
    cols = ["k", "part", "v"]
    check_clauses(clauses, cols)
    tdf = spark.createDataFrame(
        [(r["k"], r["part"], r["v"]) for r in target],
        "k int, part string, v double",
    )
    sdf = spark.createDataFrame(
        [(r["k"], r["part"], r["v"]) for r in source],
        "k int, part string, v double",
    )
    types = {f.name: f.dataType for f in tdf.schema.fields}
    cow_data, cow_stats = plan_merge(
        tdf, sdf, ["k"], clauses, cols, types, tdf.select("k")
    )
    # k is unique per target row — it doubles as the position tag
    tagged = tdf.withColumn("_tag", tdf["k"].cast("long"))
    touched, new_rows, mor_stats = plan_merge_mor(
        tagged, sdf, ["k"], clauses, cols, types, tdf.select("k"),
        ["_tag"],
    )
    assert mor_stats == cow_stats
    dead = {int(r["_tag"]) for r in touched.collect()}
    kept = [
        (r["k"], r["part"], round(r["v"], 6))
        for r in target
        if r["k"] not in dead
    ]
    appended = [
        (r["k"], r["part"], round(r["v"], 6)) for r in new_rows.collect()
    ]
    got = sorted(kept + appended)
    want = sorted(
        (r["k"], r["part"], round(r["v"], 6)) for r in cow_data.collect()
    )
    assert got == want, (clauses, got, want)
