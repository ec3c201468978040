"""Laws for the pattern-mining operators (operators/mining.py):
association rules and event transitions. The DuckDB parity of the gate
queries (q132/q133) runs in test_oracle_parity; these pin the algebraic
laws on hand-built data where the right answer is computable by hand.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pytrousse_spark.operators.mining import (
    association_rules,
    event_transitions,
)


@pytest.fixture(scope="module")
def baskets(spark):
    # basket 1: {a,b,c}; 2: {a,b}; 3: {a,c}; 4: {b}; 5: {a,b} (dup rows
    # collapse); b appears with a 3x, with c 1x.
    rows = [
        (1, "a"), (1, "b"), (1, "c"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "c"),
        (4, "b"),
        (5, "a"), (5, "b"), (5, "b"),
    ]
    return spark.createDataFrame(rows, "basket bigint, item string")


def test_rules_counts_and_lift(spark, baskets):
    out = {
        (r["antecedent"], r["consequent"]): r
        for r in association_rules(
            baskets, "basket", "item", min_pair_count=1, top_k=100
        ).collect()
    }
    ab = out[("a", "b")]
    assert ab["pair_count"] == 3
    assert ab["antecedent_count"] == 4
    assert ab["consequent_count"] == 4
    assert ab["n_baskets"] == 5
    assert ab["support"] == pytest.approx(3 / 5, abs=1e-6)
    assert ab["confidence"] == pytest.approx(3 / 4, abs=1e-6)
    assert ab["lift"] == pytest.approx(15 / 16, abs=1e-6)
    # support is symmetric; confidence is directional
    ba = out[("b", "a")]
    assert ba["support"] == ab["support"]
    assert ba["pair_count"] == ab["pair_count"]
    assert ba["lift"] == ab["lift"]


def test_rules_basket_cap_excludes(spark, baskets):
    # cap 2 removes basket 1 (3 items) entirely: (a,c) then co-occurs
    # only in basket 3, (b,c) never.
    out = {
        (r["antecedent"], r["consequent"]): r["pair_count"]
        for r in association_rules(
            baskets, "basket", "item",
            min_pair_count=1, max_basket_size=2, top_k=100,
        ).collect()
    }
    assert out[("a", "c")] == 1
    assert ("b", "c") not in out
    assert ("c", "b") not in out


def test_rules_min_pair_count_filters(spark, baskets):
    out = association_rules(
        baskets, "basket", "item", min_pair_count=2, top_k=100
    )
    pairs = {(r["antecedent"], r["consequent"]) for r in out.collect()}
    assert pairs == {("a", "b"), ("b", "a"), ("a", "c"), ("c", "a")}


def test_transitions_probabilities_sum_to_one(spark):
    rows = [
        (1, 1, 10, "x"), (1, 2, 20, "y"), (1, 3, 30, "x"),
        (2, 4, 10, "x"), (2, 5, 20, "x"),
        (3, 6, 10, "y"),  # single event: no transition
    ]
    df = spark.createDataFrame(
        rows, "user bigint, eid bigint, ts bigint, state string"
    )
    out = event_transitions(df, "user", "ts", "state", "eid")
    sums = (
        out.groupBy("prev_state")
        .agg(F.round(F.sum("probability"), 4).alias("s"))
        .collect()
    )
    assert all(r["s"] == pytest.approx(1.0, abs=1e-3) for r in sums)
    got = {
        (r["prev_state"], r["next_state"]): r["n_transitions"]
        for r in out.collect()
    }
    assert got == {("x", "y"): 1, ("y", "x"): 1, ("x", "x"): 1}


def test_transitions_tiebreak_is_deterministic(spark):
    # two events at the SAME timestamp: order pinned by eid, so the
    # sequence is a(1) -> b(2) -> c(3), never a -> c -> b.
    rows = [(1, 1, 10, "a"), (1, 2, 10, "b"), (1, 3, 10, "c")]
    df = spark.createDataFrame(
        rows, "user bigint, eid bigint, ts bigint, state string"
    )
    got = {
        (r["prev_state"], r["next_state"])
        for r in event_transitions(df, "user", "ts", "state", "eid").collect()
    }
    assert got == {("a", "b"), ("b", "c")}


def test_session_paths_splits_and_orders(spark):
    import datetime as dt

    from pytrousse_spark.operators.mining import session_paths

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def ts(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    rows = [
        # user 1, session 1: a,b,c,d (only first 3 kept)
        (1, 1, ts(0), "a"), (1, 2, ts(1), "b"),
        (1, 3, ts(2), "c"), (1, 4, ts(3), "d"),
        # user 1, session 2 after 40-min gap: a,b
        (1, 5, ts(43), "a"), (1, 6, ts(44), "b"),
        # user 2, one single-event session
        (2, 7, ts(0), "a"),
        # user 2, same-timestamp tie broken by event id: x(8) then y(9)
        (2, 8, ts(60), "x"), (2, 9, ts(60), "y"),
    ]
    df = spark.createDataFrame(
        rows, "user bigint, eid bigint, ts timestamp, state string"
    )
    out = {
        r["path"]: (r["depth_reached"], r["n_sessions"])
        for r in session_paths(
            df, "user", "ts", "state", "eid", gap_minutes=30, depth=3
        ).collect()
    }
    assert out == {
        "a>b>c": (3, 1),
        "a>b": (2, 1),
        "a": (1, 1),
        "x>y": (2, 1),
    }


def test_markov_accuracy_deterministic_chain(spark):
    import datetime as dt

    from pytrousse_spark.operators.mining import (
        markov_next_event_accuracy,
    )

    # a -> b -> a -> b ... : the majority model is perfect
    rows = []
    for u in range(5):
        for i in range(10):
            rows.append(
                (u, dt.datetime(2024, 1, 1) + dt.timedelta(hours=i),
                 i, "a" if i % 2 == 0 else "b")
            )
    df = spark.createDataFrame(
        rows, ["user_id", "ts", "event_id", "event_type"]
    )
    got = {
        r["prev_state"]: r
        for r in markov_next_event_accuracy(
            df, "user_id", "ts", "event_type", "event_id"
        ).collect()
    }
    assert got["a"]["model_next"] == "b" and got["a"]["accuracy"] == 1.0
    assert got["b"]["model_next"] == "a" and got["b"]["accuracy"] == 1.0
    assert got["a"]["overall_accuracy"] == 1.0

    # 2:1 mixture: model picks the majority, accuracy = 2/3; exact
    # ties break lexicographically
    rows = []
    seq = ["x", "p", "x", "p", "x", "q"] * 3  # x->p twice per x->q once
    for i, s in enumerate(seq):
        rows.append(
            (1, dt.datetime(2024, 1, 1) + dt.timedelta(hours=i), i, s)
        )
    df = spark.createDataFrame(
        rows, ["user_id", "ts", "event_id", "event_type"]
    )
    got = {
        r["prev_state"]: r
        for r in markov_next_event_accuracy(
            df, "user_id", "ts", "event_type", "event_id"
        ).collect()
    }
    assert got["x"]["model_next"] == "p"
    # accuracy is round-6
    assert abs(got["x"]["accuracy"] - got["x"]["n_correct"]
               / got["x"]["n_from"]) < 1e-6
    assert got["x"]["n_correct"] * 2 >= got["x"]["n_from"]


def test_sequential_pattern_support_handcrafted(spark):
    """First-occurrence semantics: repeats after the first occurrence
    never flip an ordering; simultaneous firsts break by order col."""
    from datetime import datetime as ts

    from pytrousse_spark.operators.mining import sequential_pattern_support

    rows = [
        # user 1: a@1, b@2, a@3 (repeat ignored) -> supports (a,b) only
        (0, 1, "a", ts(2024, 1, 1)),
        (1, 1, "b", ts(2024, 1, 2)),
        (2, 1, "a", ts(2024, 1, 3)),
        # user 2: b@1, a@2 -> supports (b,a)
        (3, 2, "b", ts(2024, 1, 1)),
        (4, 2, "a", ts(2024, 1, 2)),
        # user 3: a and b at the SAME instant -> event_id 5 < 6 -> (a,b)
        (5, 3, "a", ts(2024, 1, 1)),
        (6, 3, "b", ts(2024, 1, 1)),
    ]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "event_type", "ts"])
    out = {
        (r["item_a"], r["item_b"]): r["n_entities"]
        for r in sequential_pattern_support(
            df, "user_id", "event_type", "ts", "event_id"
        ).collect()
    }
    assert out == {("a", "b"): 2, ("b", "a"): 1}


def test_sequential_pattern_antisymmetry(spark):
    """(a,b) and (b,a) supports sum to the co-occurrence count: every
    entity having both items supports exactly one direction."""
    from pyspark.sql import functions as F

    from pytrousse_spark.io import read_parquet_df
    from pytrousse_spark.operators.mining import sequential_pattern_support
    from tests.conftest import SF_DIR

    ev = read_parquet_df(spark, f"{SF_DIR}/events.parquet")
    sup = sequential_pattern_support(
        ev, "user_id", "event_type", "ts", "event_id"
    )
    both = (
        ev.select("user_id", "event_type").distinct()
        .selectExpr("user_id", "event_type AS a")
        .join(
            ev.select("user_id", "event_type").distinct()
            .selectExpr("user_id", "event_type AS b"),
            "user_id",
        )
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    directed = (
        sup.selectExpr(
            "least(item_a, item_b) AS a",
            "greatest(item_a, item_b) AS b",
            "n_entities",
        )
        .groupBy("a", "b")
        .agg(F.sum("n_entities").alias("n_dir"))
    )
    rows = both.join(directed, ["a", "b"], "full").collect()
    assert rows and all(
        (r["n_both"] or 0) == (r["n_dir"] or 0) for r in rows
    )


def test_triple_sequence_greedy_is_complete(spark):
    """Laws: (1) GREEDY completeness — user history [b, a, b, c]
    supports <a,b,c> (the b BEFORE a must not poison the match: a
    global-first-b rule would miss it); (2) <a,b,a> round-trips are
    counted (a = c allowed); (3) adjacent repeats excluded; (4) an
    entity is counted once however many matches it has."""
    from datetime import datetime, timedelta

    from pytrousse_spark.operators.mining import triple_sequence_support

    t0 = datetime(2024, 1, 1)
    rows = []
    # user 1: b a b c  -> supports <a,b,c> via greedy
    for j, it in enumerate(["b", "a", "b", "c"]):
        rows.append((j, t0 + timedelta(minutes=j), 1, it))
    # user 2: a b a (round trip) and repeated matches of <a,b,a>
    for j, it in enumerate(["a", "b", "a", "b", "a"]):
        rows.append((10 + j, t0 + timedelta(minutes=j), 2, it))
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type"]
    )
    out = {
        (r["item_a"], r["item_b"], r["item_c"]): r["n_entities"]
        for r in triple_sequence_support(
            df, "user_id", "event_type", "ts", "event_id"
        ).collect()
    }
    assert out[("a", "b", "c")] == 1        # greedy completeness
    assert out[("a", "b", "a")] == 1        # counted once, a = c ok
    assert ("a", "a", "b") not in out       # adjacent repeat excluded
    assert ("b", "b", "a") not in out


def test_markov_entropy_rate_cycle_zero_uniform_one_bit(spark):
    """Laws: a deterministic a->b->c->a cycle has entropy rate 0 and
    perplexity 1; an 'aabb'-repeat chain (every 2-state transition
    equally likely from each state) reads ~1 bit; H is bounded by
    log2(n_states)."""
    from datetime import datetime, timedelta

    from pytrousse_spark.operators.mining import markov_entropy_rate

    t0 = datetime(2024, 1, 1)
    rows, eid = [], 0
    for u in range(5):
        for k in range(30):
            rows.append((eid, t0 + timedelta(minutes=k), u, "abc"[k % 3]))
            eid += 1
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type"]
    )
    cyc = markov_entropy_rate(
        df, "user_id", "ts", "event_type", "event_id"
    ).collect()[0]
    assert cyc["entropy_rate_bits"] == 0.0
    assert cyc["perplexity"] == 1.0
    assert cyc["n_states"] == 3

    rows2, eid = [], 0
    for u in range(4):
        for k, ch in enumerate("aabb" * 20):
            rows2.append((eid, t0 + timedelta(minutes=k), u, ch))
            eid += 1
    df2 = spark.createDataFrame(
        rows2, ["event_id", "ts", "user_id", "event_type"]
    )
    uni = markov_entropy_rate(
        df2, "user_id", "ts", "event_type", "event_id"
    ).collect()[0]
    assert 0.95 < uni["entropy_rate_bits"] <= 1.0
