"""CEP-lite funnel semantics on handcrafted sequences: strict
next-match binding, gap enforcement, shared later steps, tie ordering."""

from __future__ import annotations

import datetime as dt

import pytest

from flink_learning_practise_spark.operators.cep import funnel


def ev(eid, minute, user, typ, second=0):
    return (
        eid,
        dt.datetime(2024, 1, 1, 0, minute, second),
        user,
        typ,
    )


SCHEMA = "event_id long, ts timestamp, user_id long, event_type string"


def matches(df):
    cols = [c for c in df.columns if c.endswith("_id") or c == "user_id"]
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_basic_three_step_chain(spark):
    rows = [
        ev(1, 0, 1, "view"),
        ev(2, 1, 1, "click"),
        ev(3, 2, 1, "purchase"),
        ev(4, 0, 2, "view"),  # user 2 never clicks
        ev(5, 2, 2, "purchase"),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = funnel(df, ["view", "click", "purchase"], "10 minutes")
    assert matches(out) == [(1, 1, 2, 3)]


def test_strict_next_match_fails_on_gap(spark):
    """The NEXT click is out of gap; a later in-gap click must NOT be
    considered (skip-till-next-match binds the earliest, then stops)."""
    rows = [
        ev(1, 0, 1, "view"),
        ev(2, 30, 1, "click"),  # next click, outside 10m gap
        ev(3, 5, 1, "purchase"),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    assert matches(funnel(df, ["view", "click", "purchase"], "10 minutes")) == []


def test_views_share_next_click(spark):
    rows = [
        ev(1, 0, 1, "view"),
        ev(2, 1, 1, "view"),
        ev(3, 2, 1, "click"),
        ev(4, 3, 1, "purchase"),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = funnel(df, ["view", "click", "purchase"], "10 minutes")
    assert matches(out) == [(1, 1, 3, 4), (1, 2, 3, 4)]


def test_two_step_and_four_step(spark):
    rows = [
        ev(1, 0, 1, "view"),
        ev(2, 1, 1, "click"),
        ev(3, 2, 1, "view"),
        ev(4, 3, 1, "purchase"),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    assert matches(funnel(df, ["view", "click"], "10 minutes")) == [(1, 1, 2)]
    assert matches(
        funnel(df, ["view", "click", "view", "purchase"], "10 minutes")
    ) == [(1, 1, 2, 3, 4)]


def test_chain_continues_from_matched_row_not_start(spark):
    """Step 3 must be the next purchase after the CLICK, not after the
    view — and the purchase between view and click must not bind."""
    rows = [
        ev(1, 0, 1, "view"),
        ev(2, 1, 1, "purchase"),  # before the click: must not bind
        ev(3, 2, 1, "click"),
        ev(4, 3, 1, "purchase"),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = funnel(df, ["view", "click", "purchase"], "10 minutes")
    assert matches(out) == [(1, 1, 3, 4)]


def test_timestamp_ties_break_by_event_id(spark):
    """Same-timestamp events order by id: click id=5 at the same ts as
    view id=4 is 'later' in sequence order and may bind."""
    rows = [
        ev(4, 0, 1, "view"),
        ev(5, 0, 1, "click"),
        ev(6, 1, 1, "purchase"),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = funnel(df, ["view", "click", "purchase"], "10 minutes")
    assert matches(out) == [(1, 4, 5, 6)]


def test_users_do_not_mix(spark):
    rows = [
        ev(1, 0, 1, "view"),
        ev(2, 1, 2, "click"),  # other user's click must not bind
        ev(3, 2, 1, "purchase"),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    assert matches(funnel(df, ["view", "click", "purchase"], "10 minutes")) == []


def test_rejects_single_step(spark):
    df = spark.createDataFrame([ev(1, 0, 1, "view")], SCHEMA)
    with pytest.raises(ValueError):
        funnel(df, ["view"], "10 minutes")


def evv(eid, minute, user, typ, value):
    return (eid, dt.datetime(2024, 1, 1, 0, minute), user, typ, value)


VSCHEMA = SCHEMA + ", value double"


def test_predicate_steps(spark):
    """Flink CEP where()-clause analog: a step can be an arbitrary
    predicate, and next-match binding applies to the PREDICATE — a
    cheap purchase doesn't satisfy the step, so a later big one may."""
    from pyspark.sql import functions as F

    rows = [
        evv(1, 0, 1, "view", 0.0),
        evv(2, 1, 1, "purchase", 5.0),  # too small: not a step match
        evv(3, 2, 1, "purchase", 50.0),
        evv(4, 0, 2, "view", 0.0),
        evv(5, 1, 2, "purchase", 1.0),  # user 2 never buys big
    ]
    df = spark.createDataFrame(rows, VSCHEMA)
    big_buy = (
        "big_buy",
        (F.col("event_type") == "purchase") & (F.col("value") >= 10),
    )
    out = funnel(df, ["view", big_buy], "10 minutes")
    assert matches(out) == [(1, 1, 3)]


def test_times_quantifier_as_repeated_step(spark):
    """Flink CEP times(n) == the step repeated n times: each repetition
    binds the NEXT event of that type."""
    rows = [
        ev(1, 0, 1, "click"),
        ev(2, 1, 1, "click"),
        ev(3, 2, 1, "click"),
        ev(4, 0, 2, "click"),  # user 2: only one click
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = funnel(df, ["click", "click"], "10 minutes")
    # click1->click2 and click2->click3 (next-match chains), never 1->3
    assert matches(out) == [(1, 1, 2), (1, 2, 3)]


def test_hostile_nulls_do_not_match_or_crash(spark):
    """Null ts / null type / null id events must neither crash the
    matcher nor take part in any match."""
    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 0), 1, "view"),
        (2, None, 1, "click"),  # null ts: unsequenceable
        (3, dt.datetime(2024, 1, 1, 0, 1), 1, None),  # null type
        (4, dt.datetime(2024, 1, 1, 0, 2), 1, "click"),
        (5, dt.datetime(2024, 1, 1, 0, 3), 1, "purchase"),
        (None, dt.datetime(2024, 1, 1, 0, 4), 1, "purchase"),  # null id
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = funnel(df, ["view", "click", "purchase"], "10 minutes")
    assert matches(out) == [(1, 1, 4, 5)]


def test_not_followed_by(spark):
    from flink_learning_practise_spark.operators.cep import not_followed_by

    rows = [
        ev(1, 0, 1, "view"),
        ev(2, 1, 1, "click"),  # view 1 converts
        ev(3, 10, 1, "view"),  # no click after: abandoned
        ev(4, 0, 2, "view"),
        ev(5, 40, 2, "click"),  # out of 10m gap: still abandoned
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = not_followed_by(df, "view", "click", "10 minutes")
    assert sorted((r.user_id, r.step1_id) for r in out.collect()) == [
        (1, 3),
        (2, 4),
    ]


def test_large_event_ids_do_not_collide(spark):
    """Regression: lpad TRUNCATES strings longer than the pad width, so
    a 12-digit id pad collided ids 10^12 and 10^13 (identical keys ->
    join fan-out / wrong binding). The 20-digit pad must keep any
    non-negative int64 id distinct and correctly ordered."""
    rows = [
        ev(1, 0, 1, "view"),
        (10**12, dt.datetime(2024, 1, 1, 0, 1), 1, "click"),
        (10**13, dt.datetime(2024, 1, 1, 0, 2), 1, "click"),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = funnel(df, ["view", "click"], "10 minutes")
    # exactly one match, bound to the EARLIER click (10^12), no fan-out
    assert matches(out) == [(1, 1, 10**12)]


def test_funnel_cache_pinning_is_bounded(spark):
    """A caller-owned FunnelCache keeps at most ``limit`` intermediates
    pinned and unpersists evicted ones, so a long-lived session running
    many funnels can't leak storage memory; release() drops the rest."""
    from pyspark import StorageLevel

    from flink_learning_practise_spark.operators import cep

    from pyspark.sql import functions as F

    pool = cep.FunnelCache(limit=4)
    df = spark.createDataFrame(
        [ev(1, 0, 1, "view"), ev(2, 1, 1, "click")], SCHEMA
    )
    # distinct plans (identical-plan funnels share ONE cache entry by
    # Spark's plan-matching CacheManager, which is the desired sharing)
    outs = [
        funnel(
            df.filter(F.col("event_id") > -m),
            ["view", "click"],
            "10 minutes",
            cache=pool,
        )
        for m in range(1, 8)
    ]
    assert len(pool) == pool.limit
    for cached in pool.pinned():
        assert cached.storageLevel != StorageLevel.NONE
    # evicted entries recompute fine: every funnel still answers
    assert all(matches(o) == [(1, 1, 2)] for o in outs)
    pool.release()
    assert len(pool) == 0


def test_default_pool_is_session_scoped_not_module_global(spark):
    """funnel() without an explicit cache pins into a pool tied to the
    SparkSession (no module-global registry); release_caches(spark)
    empties exactly that pool."""
    from flink_learning_practise_spark.operators import cep

    cep.release_caches(spark)
    df = spark.createDataFrame(
        [ev(1, 0, 1, "view"), ev(2, 1, 1, "click")], SCHEMA
    )
    out = funnel(df, ["view", "click"], "10 minutes")
    assert matches(out) == [(1, 1, 2)]
    assert len(cep._SESSION_POOLS[spark]) == 1
    cep.release_caches(spark)
    assert len(cep._SESSION_POOLS[spark]) == 0


def test_ntz_timestamps_match_timestamp_fixture(spark):
    """Regression (round-2 fix): parquet written without a UTC flag
    loads event times as TIMESTAMP_NTZ; funnel and not_followed_by must
    produce the same matches as with TIMESTAMP input (the sequence key
    and the absence deadline both cast via the session UTC zone)."""
    from pyspark.sql import functions as F

    from flink_learning_practise_spark.operators.cep import not_followed_by

    rows = [
        ev(1, 0, 1, "view"),
        ev(2, 1, 1, "click"),
        ev(3, 10, 1, "view"),  # no click after: abandoned
        ev(4, 0, 2, "view"),
        ev(5, 40, 2, "click"),  # out of 10m gap: abandoned + no funnel
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    ntz = df.withColumn("ts", F.to_timestamp_ntz("ts"))
    assert dict(ntz.dtypes)["ts"] == "timestamp_ntz"

    for frame in (df, ntz):
        assert matches(funnel(frame, ["view", "click"], "10 minutes")) == [
            (1, 1, 2)
        ]
        out = not_followed_by(frame, "view", "click", "10 minutes")
        assert sorted((r.user_id, r.step1_id) for r in out.collect()) == [
            (1, 3),
            (2, 4),
        ]
