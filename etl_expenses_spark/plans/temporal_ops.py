"""Temporal operators over `events`/`orders` (SURVEY.md §2.10 batch analogs).

Tumbling/sliding/session windows and the as-of join — the batch twins of the
Structured Streaming surface in streaming/. Each has an exact DuckDB oracle
(time_bucket / gaps-and-islands / ASOF JOIN).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from etl_expenses_spark.operators.asof import asof_join_backward
from etl_expenses_spark.operators.rangejoin import bucketed_interval_pairs
from etl_expenses_spark.operators.merge import new_rows
from etl_expenses_spark.operators.prefixsum import single_defined_partition
from etl_expenses_spark.plans._util import T, dec, work_dir
from etl_expenses_spark.plans.registry import query


@query(
    "window_tumbling_daily",
    oracle="""
        SELECT CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day_start,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM events
        GROUP BY 1
    """,
    tags=("temporal", "window_agg"),
)
def window_tumbling_daily(spark, sf_dir):
    """Tumbling 1-day windows via F.window — epoch-aligned in UTC, so
    window.start ≡ date_trunc('day'). Partial aggregation makes the shuffle
    carry one row per (day) per task at any scale."""
    e = T(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 day").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("day_start"), "n_events", "total_value")
    )


@query(
    "window_sliding_hourly",
    oracle="""
        WITH assigned AS (
            SELECT time_bucket(INTERVAL '30 minutes', ts) - k.k * INTERVAL '30 minutes'
                       AS win_start,
                   value
            FROM events CROSS JOIN (SELECT 0 AS k UNION ALL SELECT 1) k)
        SELECT CAST(win_start AS TIMESTAMP) AS window_start,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM assigned
        GROUP BY 1
    """,
    tags=("temporal", "window_agg"),
)
def window_sliding_hourly(spark, sf_dir):
    """Sliding windows (1h size, 30m slide): each event lands in exactly 2
    windows. Spark expands then partially aggregates — shuffle volume is
    2×windows, never 2×events."""
    e = T(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
    )


@query(
    "session_windows_30m",
    oracle="""
        WITH flagged AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                             >= INTERVAL '30 minutes'
                        OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                        THEN 1 ELSE 0 END AS new_session
            FROM events),
        numbered AS (
            SELECT user_id, ts,
                   SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS session_no
            FROM flagged)
        SELECT user_id, CAST(MIN(ts) AS TIMESTAMP) AS session_start,
               COUNT(*) AS n_events
        FROM numbered
        GROUP BY user_id, session_no
    """,
    tags=("temporal", "window_agg", "session"),
)
def session_windows_30m(spark, sf_dir):
    """Session windows (30-minute gap) per user. Batch analog of
    F.session_window; expressed gaps-and-islands style so the oracle is
    exact (session start + event count; end-timestamp semantics differ
    between engines' session implementations and are covered by the
    streaming tests instead)."""
    e = T(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
        )
    )


@query(
    "session_bounce_rate_daily",
    oracle="""
        WITH flagged AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                             >= INTERVAL '30 minutes'
                        OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                        THEN 1 ELSE 0 END AS new_session
            FROM events),
        numbered AS (
            SELECT user_id, ts,
                   SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS session_no
            FROM flagged),
        sessions AS (
            SELECT user_id, session_no,
                   CAST(DATE_TRUNC('day', MIN(ts)) AS DATE) AS day,
                   COUNT(*) AS n_events
            FROM numbered GROUP BY user_id, session_no)
        SELECT day,
               COUNT(*) AS n_sessions,
               CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_bounces,
               CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                   / COUNT(*) AS bounce_rate
        FROM sessions
        GROUP BY day
    """,
    tags=("temporal", "session", "behavior"),
)
def session_bounce_rate_daily(spark, sf_dir):
    """Daily bounce rate: fraction of 30-minute sessions containing exactly
    one event, keyed by the session's start day — the engagement headline
    that sits on top of sessionization everywhere. Uses Spark's native
    session_window (the oracle rebuilds identical sessions gaps-and-islands
    style); the day/bounce rollup is one more hash aggregate over the
    session-grain relation, so the whole metric costs the sessionization
    shuffle plus a tiny day-grain combine. Single IEEE division per row."""
    e = T(spark, sf_dir, "events")
    sessions = (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").cast("date").alias("day"),
            "n_events",
        )
    )
    bounce = F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
    return sessions.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        bounce.alias("n_bounces"),
        (bounce.cast("double") / F.count(F.lit(1))).alias("bounce_rate"),
    )


@query(
    "asof_join_events_orders",
    oracle="""
        WITH o AS (
            SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS last_orderkey
            FROM orders GROUP BY 1, 2)
        SELECT e.event_id, e.user_id, e.event_type,
               o.last_orderkey, CAST(o.o_orderdate AS TIMESTAMP) AS last_orderdate
        FROM events e
        ASOF LEFT JOIN o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    """,
    tags=("temporal", "asof"),
)
def asof_join_events_orders(spark, sf_dir):
    """Backward as-of join: each event picks up the user's most recent order
    at-or-before the event time. Implemented union+window (operators/asof.py)
    — one shuffle on the key, no range explosion; oracle = DuckDB ASOF JOIN."""
    e = T(spark, sf_dir, "events").select("event_id", "user_id", "event_type", "ts")
    o = (
        T(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("last_orderkey"))
        .withColumn("last_orderdate", F.col("o_orderdate"))
    )
    return asof_join_backward(
        e,
        o,
        left_key="user_id",
        right_key="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        payload_cols=["last_orderkey", "last_orderdate"],
    ).select("event_id", "user_id", "event_type", "last_orderkey", "last_orderdate")


@query(
    "incremental_merge_new_orders",
    oracle="""
        SELECT b.o_orderkey, b.o_custkey, CAST(b.o_orderdate AS TIMESTAMP) AS o_orderdate
        FROM orders b
        WHERE b.o_orderdate >= TIMESTAMP '2000-06-01'
          AND NOT EXISTS (
              SELECT 1 FROM orders t
              WHERE t.o_orderdate < TIMESTAMP '2000-08-01'
                AND t.o_orderkey = b.o_orderkey)
    """,
    tags=("temporal", "incremental", "anti"),
)
def incremental_merge_new_orders(spark, sf_dir):
    """The incremental-load core (J1-J4 + A1): an overlapping extraction
    batch (≥ 2000-06-01) anti-joined against the already-loaded target
    (< 2000-08-01) — only genuinely new rows survive. operators/merge.py
    packages this as merge_append; on a date-partitioned gold table the
    anti-join prunes to the overlap window."""
    o = T(spark, sf_dir, "orders")
    batch = o.filter(F.col("o_orderdate") >= "2000-06-01")
    target = o.filter(F.col("o_orderdate") < "2000-08-01")
    return new_rows(batch, target, ["o_orderkey"]).select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )


@query(
    "merge_evolved_schema_orders",
    oracle="""
        WITH target AS (
            SELECT o_orderkey, o_custkey FROM orders
            WHERE o_orderdate < TIMESTAMP '2000-08-01'
        ),
        batch AS (
            SELECT o_orderkey, o_custkey,
                   CAST(o_totalprice AS DECIMAL(18,2)) AS total
            FROM orders WHERE o_orderdate >= TIMESTAMP '2000-06-01'
        ),
        fresh AS (
            SELECT b.* FROM batch b WHERE NOT EXISTS (
                SELECT 1 FROM target t WHERE t.o_orderkey = b.o_orderkey)
        )
        SELECT o_orderkey, o_custkey, CAST(NULL AS DOUBLE) AS total
        FROM target
        UNION ALL
        SELECT o_orderkey, o_custkey, CAST(total AS DOUBLE) FROM fresh
    """,
    tags=("temporal", "incremental", "schema-evolution"),
)
def merge_evolved_schema_orders(spark, sf_dir):
    """Schema-EVOLVING incremental merge (K3 + F16 composed): the source
    grew a column (`total`) the loaded target lacks. `evolve_schema`
    aligns the batch to the union schema, the anti-join keeps only new
    keys, and the merged view is `target ⊎ fresh` with historical rows
    reading NULL for the new column — exactly what
    `operators/merge.py:merge_append_evolve` + `read_evolved` produce on
    disk (mergeSchema parquet), expressed purely so DuckDB can predict
    every row. The write-side contract (mixed-footer readability, refusal
    of WIDER batches) is pinned in tests/test_merge.py."""
    from etl_expenses_spark.operators.merge import evolve_schema

    o = T(spark, sf_dir, "orders")
    target = o.filter(F.col("o_orderdate") < "2000-08-01").select(
        "o_orderkey", "o_custkey"
    )
    batch = o.filter(F.col("o_orderdate") >= "2000-06-01").select(
        "o_orderkey",
        "o_custkey",
        F.col("o_totalprice").cast("decimal(18,2)").alias("total"),
    )
    fresh = new_rows(evolve_schema(batch, target), target, ["o_orderkey"])
    return target.withColumn("total", F.lit(None).cast("double")).unionByName(
        fresh.withColumn("total", F.col("total").cast("double"))
    )


@query(
    "latest_event_per_user_asof_style",
    oracle="""
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value FROM (
            SELECT user_id, event_id, ts, value,
                   ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
            FROM events) t
        WHERE rn = 1
    """,
    tags=("temporal", "window"),
)
def latest_event_per_user_asof_style(spark, sf_dir):
    """O1 made deterministic: latest event per user via row_number (replaces
    the reference's 'API returns newest first' assumption)."""
    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    e = T(spark, sf_dir, "events")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "value")
    )


@query(
    "window_range_1h_user_spend",
    oracle="""
        SELECT event_id, user_id,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
                   PARTITION BY user_id ORDER BY epoch(ts)
                   RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS spend_1h
        FROM events
    """,
    tags=("window", "range-frame", "temporal"),
)
def window_range_1h_user_spend(spark, sf_dir):
    """Time-RANGE window frame: per user, the rolling sum of the trailing
    hour at every event — rangeBetween over epoch seconds, the frame spec
    rowsBetween can't express (row counts ≠ time spans). One shuffle on
    user_id, sort within partition; the frame slides without re-scanning.

    Determinism at ties: a RANGE frame includes ALL peer rows (same
    second) in both engines, so ordering by epoch alone gives every row an
    identical frame SET — no tiebreaker needed (and RANGE frames reject
    composite orderings anyway)."""
    # fractional epoch seconds on BOTH sides: DuckDB's epoch() keeps
    # microseconds, Spark's unix_timestamp truncates — a truncated ordering
    # shifts frame boundaries by up to 1s and diverges at density
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").cast("double"))
        .rangeBetween(-3600, W.currentRow)
    )
    return T(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.sum(dec("value")).over(w).cast("double").alias("spend_1h"),
    )


@query(
    "range_join_recent_clicks",
    oracle="""
        WITH e AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
             c AS (SELECT event_id AS c_id, user_id AS c_user, ts AS c_ts
                   FROM events WHERE event_type = 'click')
        SELECT e.event_id, e.user_id, COUNT(c.c_id) AS n_recent_clicks
        FROM e LEFT JOIN c
          ON c.c_user = e.user_id
         AND c.c_ts > e.ts - INTERVAL 5 MINUTE
         AND c.c_ts <= e.ts
        GROUP BY e.event_id, e.user_id
    """,
    tags=("join", "range", "temporal"),
)
def range_join_recent_clicks(spark, sf_dir):
    """Bounded-interval join: for every error event, how many clicks the
    same user made in the preceding 5 minutes.

    DuckDB runs the inequality join directly (IEJoin); Spark would fall
    back to a nested-loop cartesian, so the engine uses the bucketed
    equi-join rewrite (operators/rangejoin.py): quantize to 300 s buckets,
    explode the error side to 2 candidate buckets, hash-join on
    (user, bucket), post-filter the exact interval. Identical result set,
    shuffle cost of a plain equi join — the plan that survives 100 TB.
    Errors with no recent clicks are restored by the left join on the
    pair counts (COUNT of right key over an inner pair set)."""
    ev = T(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    pairs = bucketed_interval_pairs(
        errors, clicks,
        left_key="user_id", right_key="c_user",
        left_ts="ts", right_ts="c_ts",
        window_s=300,
    )
    counts = pairs.groupBy("event_id").agg(F.count("c_id").alias("n_recent_clicks"))
    return (
        errors.join(counts, "event_id", "left")
        .select(
            "event_id",
            "user_id",
            F.coalesce(F.col("n_recent_clicks"), F.lit(0)).alias("n_recent_clicks"),
        )
    )


@query(
    "funnel_view_click_purchase",
    oracle="""
        WITH v AS (SELECT user_id, MIN(ts) AS tv FROM events
                   WHERE event_type = 'view' GROUP BY user_id),
             c AS (SELECT e.user_id, MIN(e.ts) AS tc
                   FROM events e JOIN v ON v.user_id = e.user_id
                   WHERE e.event_type = 'click' AND e.ts > v.tv
                   GROUP BY e.user_id),
             p AS (SELECT e.user_id, MIN(e.ts) AS tp
                   FROM events e JOIN c ON c.user_id = e.user_id
                   WHERE e.event_type = 'purchase' AND e.ts > c.tc
                   GROUP BY e.user_id)
        SELECT (SELECT COUNT(*) FROM v) AS n_viewed,
               (SELECT COUNT(*) FROM c) AS n_clicked_after_view,
               (SELECT COUNT(*) FROM p) AS n_purchased_after_click
    """,
    tags=("temporal", "funnel", "agg"),
)
def funnel_view_click_purchase(spark, sf_dir):
    """Ordered-sequence funnel: users who viewed, then clicked AFTER their
    first view, then purchased AFTER that first qualifying click.

    Each stage is one aggregate + one equi join against the (shrinking)
    previous stage — at 100 TB each stage keys by user_id, so all three
    stages reuse one shuffle partitioning; no per-user event sorting and no
    sessionization state. The ts > prev strict inequality makes the stage
    sets deterministic (micros precision on both engines)."""
    ev = T(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("tv"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("tv"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tc"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("tc"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tp"))
    )
    return (
        v.agg(F.count("*").alias("n_viewed"))
        .crossJoin(c.agg(F.count("*").alias("n_clicked_after_view")))
        .crossJoin(p.agg(F.count("*").alias("n_purchased_after_click")))
    )


@query(
    "attribution_first_purchase_after_click",
    oracle="""
        WITH c AS (SELECT event_id AS click_id, user_id, ts AS click_ts
                   FROM events WHERE event_type = 'click'),
             p AS (SELECT event_id AS purchase_id, user_id AS p_user, ts AS p_ts
                   FROM events WHERE event_type = 'purchase'),
        pairs AS (
            SELECT c.click_id, c.user_id, p.purchase_id, p.p_ts
            FROM c JOIN p
              ON p.p_user = c.user_id
             AND p.p_ts > c.click_ts
             AND p.p_ts <= c.click_ts + INTERVAL 1 DAY
        ),
        ranked AS (
            SELECT click_id, user_id, purchase_id, CAST(p_ts AS TIMESTAMP) AS p_ts,
                   ROW_NUMBER() OVER (PARTITION BY click_id
                                      ORDER BY p_ts, purchase_id) AS rn
            FROM pairs
        )
        SELECT click_id, user_id, purchase_id AS first_purchase_id,
               p_ts AS first_purchase_ts
        FROM ranked WHERE rn = 1
    """,
    tags=("temporal", "asof", "attribution"),
)
def attribution_first_purchase_after_click(spark, sf_dir):
    """Forward attribution: each click picks the user's FIRST purchase
    strictly after it, within 1 day — the forward twin of the backward
    as-of join (which conversion did this click lead to?).

    Same scale rewrite as the backward direction: the inequality join runs
    as the bucketed equi join (operators/rangejoin.py; forward window
    (t, t+W] expressed as the backward window of a probe shifted by +W),
    then one per-click window picks the earliest qualifying purchase with
    a total order (ts, id). DuckDB's ASOF JOIN is backward-only, so the
    oracle uses the explicit window form — which is also exactly what the
    Spark plan computes."""
    ev = T(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    # forward window (t, t+W]  ≡  backward (L-W, L] with probe L = t+W
    shifted = clicks.withColumn(
        "probe_ts", (F.col("click_ts") + F.expr("INTERVAL 1 DAY")).cast("timestamp")
    )
    pairs = bucketed_interval_pairs(
        shifted,
        purchases,
        left_key="user_id",
        right_key="p_user",
        left_ts="probe_ts",
        right_ts="p_ts",
        window_s=86400,
    )
    w = W.partitionBy("click_id").orderBy("p_ts", "purchase_id")
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "click_id",
            "user_id",
            F.col("purchase_id").alias("first_purchase_id"),
            F.col("p_ts").alias("first_purchase_ts"),
        )
    )


@query(
    "sequence_gap_detection",
    oracle="""
        WITH s AS (
            SELECT event_id,
                   LEAD(event_id) OVER (ORDER BY event_id) AS next_id
            FROM events WHERE event_id % 17 <> 0)
        SELECT event_id AS gap_after,
               next_id AS resumes_at,
               CAST(next_id - event_id - 1 AS BIGINT) AS n_missing
        FROM s
        WHERE next_id - event_id > 1
    """,
    tags=("temporal", "window", "gaps"),
)
def sequence_gap_detection(spark, sf_dir):
    """Gap detection over a dense id sequence (islands-and-gaps): after
    dropping every 17th event (simulated loss), report where the sequence
    breaks and how many ids are missing — the completeness check an
    ingestion pipeline runs against monotonic source ids (the reference's
    ticket numbers / report ids).

    Scale shape: a three-level bucket cascade instead of one global-order
    LEAD (which would move the whole fact table to a single partition).
    Level 1 buckets ids by `div 2^20` and runs LEAD *partitioned by
    bucket* — every window partition is bounded by the bucket width. A
    consecutive-id pair spanning two buckets is exactly (hi of bucket k,
    lo of the next non-empty bucket), so level 2 repeats the same trick on
    the one-row-per-bucket bounds relation (super-bucket = `bkt div
    2^20`), and level 3 closes the last seam over the one-row-per-super
    relation — at most id_space/2^40 rows, single defined partition, no
    unpartitioned window anywhere in the plan. Each level only ever sees a
    pair the lower level provably cannot (the in-between bucket would be
    non-empty), so the union is exact and duplicate-free."""
    ev = T(spark, sf_dir, "events").filter(F.col("event_id") % 17 != 0)
    b = ev.select("event_id", F.expr("event_id div 1048576").alias("bkt"))

    def gaps(df, id_col, next_col):
        return df.filter(F.col(next_col) - F.col(id_col) > 1).select(
            F.col(id_col).alias("gap_after"),
            F.col(next_col).alias("resumes_at"),
            (F.col(next_col) - F.col(id_col) - 1).cast("bigint").alias("n_missing"),
        )

    # level 1: gaps whose endpoints share a bucket
    w1 = W.partitionBy("bkt").orderBy("event_id")
    l1 = gaps(
        b.select("event_id", F.lead("event_id").over(w1).alias("next_id")),
        "event_id",
        "next_id",
    )
    # level 2: gaps between adjacent non-empty buckets of the same super
    bounds = b.groupBy("bkt").agg(
        F.min("event_id").alias("lo"), F.max("event_id").alias("hi")
    ).withColumn("super", F.expr("bkt div 1048576"))
    w2 = W.partitionBy("super").orderBy("bkt")
    l2 = gaps(
        bounds.select("hi", F.lead("lo").over(w2).alias("next_lo")), "hi", "next_lo"
    )
    # level 3: gaps between adjacent non-empty supers (rows = #supers,
    # bounded by id_space / 2^40 — a defined single partition, not a
    # fallback global window)
    sup = bounds.groupBy("super").agg(
        F.min("lo").alias("s_lo"), F.max("hi").alias("s_hi")
    )
    w3 = W.partitionBy(single_defined_partition(F.col("super"))).orderBy("super")
    l3 = gaps(
        sup.select("s_hi", F.lead("s_lo").over(w3).alias("next_lo")), "s_hi", "next_lo"
    )
    return l1.unionByName(l2).unionByName(l3)


@query(
    "monthly_spend_mom_delta",
    oracle="""
        WITH m AS (
            SELECT CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
            FROM orders GROUP BY 1)
        SELECT month, spend,
               LAG(spend) OVER (ORDER BY month) AS prev_spend,
               spend - LAG(spend) OVER (ORDER BY month) AS delta,
               spend / LAG(spend) OVER (ORDER BY month) AS mom_ratio
        FROM m
    """,
    tags=("temporal", "window", "agg"),
)
def monthly_spend_mom_delta(spark, sf_dir):
    """Month-over-month spend movement: the time-series LAG shape every
    finance rollup ends in ('cuánto más gasté que el mes pasado' — the
    agent question one step past monthly_spend). Aggregate first
    (decimal-exact), THEN window over the ~months-sized result — the
    window's global order costs nothing because its input is tiny; doing
    it the other way (window over raw orders) would sort the fact table.
    Subtraction/division on identical doubles → identical results."""
    o = T(spark, sf_dir, "orders")
    m = o.groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("month")).agg(
        F.sum(dec("o_totalprice", 2, 18)).cast("double").alias("spend")
    )
    w = W.partitionBy(single_defined_partition(F.col("month").cast("long"))).orderBy(
        "month"
    )  # ~months rows, defined single partition
    prev = F.lag("spend").over(w)
    return m.select(
        "month",
        "spend",
        prev.alias("prev_spend"),
        (F.col("spend") - prev).alias("delta"),
        (F.col("spend") / prev).alias("mom_ratio"),
    )


# --------------------------------------------------------------------------
# Point-in-time (PIT) join: facts against an SCD2 dimension AT fact time —
# the correctness backbone of feature generation (no future leakage). Scale
# shape: plain equi join on the entity key + validity predicate; fan-out is
# bounded by versions-per-key (2 here), so no range bucketing is needed —
# the non-equi part never drives the join strategy.
# --------------------------------------------------------------------------
@query(
    "pit_join_events_user_tier",
    oracle="""
        WITH hist AS (
            SELECT user_id, 'basic' AS tier,
                   TIMESTAMP '2024-01-01 00:00:00' AS valid_from,
                   CASE WHEN user_id % 5 = 0 THEN TIMESTAMP '2024-01-15 00:00:00' END
                     AS valid_to
            FROM (SELECT DISTINCT user_id FROM events)
            UNION ALL
            SELECT user_id, 'premium', TIMESTAMP '2024-01-15 00:00:00', NULL
            FROM (SELECT DISTINCT user_id FROM events) WHERE user_id % 5 = 0
        )
        SELECT e.event_id, e.user_id, e.ts, h.tier
        FROM events e JOIN hist h
          ON h.user_id = e.user_id
         AND e.ts >= h.valid_from
         AND (h.valid_to IS NULL OR e.ts < h.valid_to)
        WHERE e.event_type = 'purchase'
    """,
    tags=("temporal", "pit_join", "scd2"),
)
def pit_join_events_user_tier(spark, sf_dir):
    """As-of-fact-time dimension lookup: every purchase event picks the
    tier version valid AT its timestamp from a two-version SCD2 history
    (every 5th user upgrades to premium on Jan 15).

    The history is derived in-query so the oracle reproduces it exactly;
    in production it is the SCD2 gold table (scd2_customer_segments). The
    join is an EQUI join on user_id — the validity interval is a post-join
    filter, not a join condition — so Catalyst picks a hash join and the
    per-key fan-out (≤ #versions) bounds the intermediate. Joining on the
    interval instead would force a nested loop."""
    ev = T(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    users = T(spark, sf_dir, "events").select("user_id").distinct()
    t0 = F.lit("2024-01-01 00:00:00").cast("timestamp")
    t1 = F.lit("2024-01-15 00:00:00").cast("timestamp")
    basic = users.select(
        "user_id",
        F.lit("basic").alias("tier"),
        t0.alias("valid_from"),
        F.when(F.col("user_id") % 5 == 0, t1).alias("valid_to"),
    )
    premium = users.filter(F.col("user_id") % 5 == 0).select(
        "user_id",
        F.lit("premium").alias("tier"),
        t1.alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    hist = basic.unionByName(premium)
    return (
        ev.join(hist, "user_id")
        .filter(
            (F.col("ts") >= F.col("valid_from"))
            & (F.col("valid_to").isNull() | (F.col("ts") < F.col("valid_to")))
        )
        .select("event_id", "user_id", "ts", "tier")
    )


# --------------------------------------------------------------------------
# Rolling 7-day distinct actives: COUNT(DISTINCT) over a sliding window is
# not directly expressible (neither engine supports DISTINCT in a RANGE
# frame). The scale pattern: reduce to (day, user) pairs first (the big
# dedup), then explode each pair to the ≤7 report days it contributes to —
# bounded 7× replication of the SMALL day-grain relation — and count
# distinct per report day.
# --------------------------------------------------------------------------
@query(
    "rolling_7d_active_users",
    oracle="""
        WITH du AS (
            SELECT DISTINCT CAST(DATE_TRUNC('day', ts) AS DATE) AS day, user_id
            FROM events
        ),
        days AS (SELECT DISTINCT day FROM du),
        contrib AS (
            SELECT d.day AS report_day, u.user_id
            FROM days d JOIN du u
              ON u.day <= d.day AND u.day > d.day - INTERVAL 7 DAY
        )
        SELECT report_day, COUNT(DISTINCT user_id) AS active_7d
        FROM contrib GROUP BY report_day
    """,
    tags=("temporal", "rolling", "distinct"),
)
def rolling_7d_active_users(spark, sf_dir):
    """Trailing-7-day distinct active users per day.

    events → distinct (day, user) collapses the raw volume first (at
    100 TB this is the only pass over the fact table); each day-grain pair
    then explodes to exactly the 7 report days it can serve via
    sequence(), a bounded fan-out that replaces the unbounded
    day×day-range join the oracle writes. One exact distinct aggregate per
    report day closes it out."""
    du = (
        T(spark, sf_dir, "events")
        .select(F.date_trunc("day", F.col("ts")).cast("date").alias("day"), "user_id")
        .distinct()
    )
    days = du.select("day").distinct()
    contrib = du.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 6), F.expr("INTERVAL 1 DAY"))
        ).alias("report_day"),
    ).join(F.broadcast(days.select(F.col("day").alias("report_day"))), "report_day")
    return contrib.groupBy("report_day").agg(
        F.count_distinct("user_id").alias("active_7d")
    )


# --------------------------------------------------------------------------
# Conditional scan (running total with resets): the "balance since last
# deposit" / "spend since signup" shape. Islands come from a cumulative
# count of reset markers; the value scan then runs WITHIN (user, island) —
# two stacked windows over the SAME (user_id, ts) shuffle, zero extra
# exchanges.
# --------------------------------------------------------------------------
@query(
    "running_value_resets_on_signup",
    oracle="""
        WITH marked AS (
            SELECT user_id, ts, event_id, event_type,
                   CAST(value AS DECIMAL(18,2)) AS v,
                   CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                            OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS BIGINT)
                     AS island
            FROM events
        )
        SELECT user_id, event_id, island,
               CAST(SUM(CASE WHEN event_type <> 'signup' THEN v ELSE CAST(0 AS DECIMAL(18,2)) END)
                        OVER (PARTITION BY user_id, island ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS DOUBLE) AS run_since_signup
        FROM marked
    """,
    tags=("temporal", "conditional_scan", "window"),
)
def running_value_resets_on_signup(spark, sf_dir):
    """Running per-user value total that RESETS at each signup event — the
    conditional-scan pattern (balance since last deposit, spend since
    session start, distance since refuel).

    Island id = running count of reset markers; the inner scan partitions
    by (user, island). Both windows sort by the same (ts, event_id) key
    inside the same user_id shuffle, so Catalyst evaluates them in one
    Window operator chain without re-exchanging. Decimal-domain sums keep
    both engines bit-identical."""
    ev = T(spark, sf_dir, "events")
    order = [F.col("ts"), F.col("event_id")]
    w_mark = (
        W.partitionBy("user_id").orderBy(*order).rowsBetween(W.unboundedPreceding, 0)
    )
    marked = ev.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.col("value").cast("decimal(18,2)").alias("v"),
    ).withColumn(
        "island",
        F.sum(F.when(F.col("event_type") == "signup", 1).otherwise(0)).over(w_mark),
    )
    w_run = (
        W.partitionBy("user_id", "island")
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, 0)
    )
    contrib = F.when(
        F.col("event_type") != "signup", F.col("v")
    ).otherwise(F.lit(0).cast("decimal(18,2)"))
    return marked.select(
        "user_id",
        "event_id",
        "island",
        F.sum(contrib).over(w_run).cast("double").alias("run_since_signup"),
    )


# --------------------------------------------------------------------------
# Sequence mining: most common opening journeys (first 3 event types per
# user). One sort_array over per-user collected structs — deterministic by
# (ts, event_id) — then a count by journey string.
# --------------------------------------------------------------------------
@query(
    "top_user_journeys",
    oracle="""
        WITH seq AS (
            SELECT user_id,
                   LIST(event_type ORDER BY ts, event_id) AS types
            FROM events GROUP BY user_id
        ),
        j AS (
            SELECT user_id,
                   ARRAY_TO_STRING(types[1:3], '>') AS journey
            FROM seq
        )
        SELECT journey, COUNT(*) AS n_users
        FROM j GROUP BY journey
        ORDER BY n_users DESC, journey
        LIMIT 10
    """,
    tags=("behavior", "sequence_mining", "agg"),
)
def top_user_journeys(spark, sf_dir):
    """Most common opening journeys: each user's first three event types
    (time order), counted across the population — 'how do people start'.

    collect_list under groupBy is order-nondeterministic, so events are
    collected as (ts, event_id, type) structs and sort_array imposes the
    total order INSIDE the aggregate's result — one shuffle on user_id,
    no window pass. slice(3) + concat, then a tiny count-by-journey
    aggregate with a total-order top-10."""
    ev = T(spark, sf_dir, "events")
    seq = (
        ev.groupBy("user_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ).alias("evs")
        )
        .select(
            "user_id",
            F.array_join(
                F.slice(F.transform("evs", lambda e: e["event_type"]), 1, 3), ">"
            ).alias("journey"),
        )
    )
    return (
        seq.groupBy("journey")
        .agg(F.count("*").alias("n_users"))
        .orderBy(F.col("n_users").desc(), "journey")
        .limit(10)
    )


# --------------------------------------------------------------------------
# Multi-touch attribution (U-shaped): each purchase's preceding clicks get
# position-based credit in exact basis points — 40% first touch, 40% last,
# 20% split over the middles by largest remainder. Candidates come from the
# bucketed range join (same operator as range_join_recent_clicks), so the
# non-equi window never becomes a nested loop.
# --------------------------------------------------------------------------
@query(
    "multitouch_attribution_credits",
    oracle="""
        WITH p AS (SELECT event_id AS p_id, user_id, ts AS p_ts FROM events
                   WHERE event_type = 'purchase'),
             c AS (SELECT event_id AS c_id, user_id AS c_user, ts AS c_ts FROM events
                   WHERE event_type = 'click'),
        pairs AS (
            SELECT p.p_id, c.c_id, c.c_ts
            FROM p JOIN c ON c.c_user = p.user_id
             AND c.c_ts > p.p_ts - INTERVAL 1 DAY AND c.c_ts <= p.p_ts
        ),
        ranked AS (
            SELECT p_id, c_id,
                   ROW_NUMBER() OVER (PARTITION BY p_id ORDER BY c_ts, c_id) AS rn,
                   COUNT(*) OVER (PARTITION BY p_id) AS n
            FROM pairs
        )
        SELECT p_id, c_id,
               CASE WHEN n = 1 THEN 10000
                    WHEN n = 2 THEN 5000
                    WHEN rn = 1 OR rn = n THEN 4000
                    ELSE 2000 // (n - 2)
                         + CASE WHEN rn - 1 <= 2000 % (n - 2) THEN 1 ELSE 0 END
               END AS credit_bp
        FROM ranked
    """,
    tags=("temporal", "attribution", "window"),
)
def multitouch_attribution_credits(spark, sf_dir):
    """U-shaped multi-touch attribution: clicks within 24 h before a
    purchase share its credit — 40% to the first touch, 40% to the last,
    20% across the middles — in EXACT basis points with leftover points
    to the earliest middles, so every purchase's credits sum to 10000 bp
    by construction on any engine.

    Candidate (purchase, click) pairs come from the bucketed interval
    join (operators/rangejoin.py) — a shuffled equi join, never a nested
    loop; one window pass per purchase ranks the touches. Integer-only
    credit arithmetic, no float shares."""
    ev = T(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), F.col("user_id"), F.col("ts")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    pairs = bucketed_interval_pairs(
        purchases, clicks, "user_id", "c_user", "ts", "c_ts", window_s=86400
    ).select("p_id", "c_id", "c_ts")
    w = W.partitionBy("p_id")
    ranked = pairs.withColumn(
        "rn", F.row_number().over(w.orderBy("c_ts", "c_id"))
    ).withColumn("n", F.count("*").over(w))
    mid_base = F.expr("2000 div (n - 2)")
    mid_extra = F.when((F.col("rn") - 1) <= 2000 % (F.col("n") - 2), 1).otherwise(0)
    credit = (
        F.when(F.col("n") == 1, 10000)
        .when(F.col("n") == 2, 5000)
        .when((F.col("rn") == 1) | (F.col("rn") == F.col("n")), 4000)
        .otherwise(mid_base + mid_extra)
    )
    return ranked.select("p_id", "c_id", credit.cast("long").alias("credit_bp"))


# --------------------------------------------------------------------------
# Forecast backtest: seasonal-naive (value a week earlier) scored with
# exact-arithmetic MAE/bias per user. The lag is an equi self-join on the
# shifted day — at scale the same one-shuffle shape as any keyed join; no
# per-user ordering, no state.
# --------------------------------------------------------------------------
@query(
    "seasonal_naive_backtest",
    oracle="""
        WITH daily AS (
            SELECT user_id, CAST(DATE_TRUNC('day', ts) AS DATE) AS day,
                   SUM(CAST(value AS DECIMAL(18,2))) AS v
            FROM events GROUP BY 1, 2
        ),
        scored AS (
            SELECT a.user_id, a.day, a.v AS actual, f.v AS forecast,
                   ABS(a.v - f.v) AS abs_err, a.v - f.v AS err
            FROM daily a JOIN daily f
              ON f.user_id = a.user_id AND f.day = a.day - INTERVAL 7 DAY
        )
        SELECT user_id, COUNT(*) AS n_days,
               CAST(SUM(abs_err) AS DOUBLE) / COUNT(*) AS mae,
               CAST(SUM(err) AS DOUBLE) / COUNT(*) AS bias
        FROM scored GROUP BY user_id
        HAVING COUNT(*) >= 5
    """,
    tags=("temporal", "forecast", "backtest"),
)
def seasonal_naive_backtest(spark, sf_dir):
    """Backtest of the seasonal-naive forecast (predict today = same day
    last week): per-user MAE and signed bias — the baseline every real
    forecasting model must beat, and the exact yardstick to measure it
    with.

    Errors accumulate in the DECIMAL domain (abs/sub are exact); the
    single double division per metric happens identically on both
    engines. The 7-day lag is an equi join on (user, day−7) — one keyed
    shuffle, no window sort, no state; the same plan at 100 TB."""
    daily = (
        T(spark, sf_dir, "events")
        .groupBy(
            "user_id", F.date_trunc("day", F.col("ts")).cast("date").alias("day")
        )
        .agg(F.sum(F.col("value").cast("decimal(18,2)")).alias("v"))
    )
    f = daily.select(
        "user_id",
        F.date_add(F.col("day"), 7).alias("day"),
        F.col("v").alias("fv"),
    )
    scored = daily.join(f, ["user_id", "day"]).select(
        "user_id",
        "day",
        F.abs(F.col("v") - F.col("fv")).alias("abs_err"),
        (F.col("v") - F.col("fv")).alias("err"),
    )
    return (
        scored.groupBy("user_id")
        .agg(
            F.count("*").alias("n_days"),
            (F.sum("abs_err").cast("double") / F.count("*")).alias("mae"),
            (F.sum("err").cast("double") / F.count("*")).alias("bias"),
        )
        .filter(F.col("n_days") >= 5)
    )


# --------------------------------------------------------------------------
# Exponential smoothing + changepoint screening — the two time-series
# monitors a finance pipeline runs over its daily loads (the reference's
# nightly spend reports stop at raw monthly sums; these are the natural
# next step and the classic SPC pair). Both are engineered for the
# cross-engine gate: every accumulation happens in the INTEGER domain and
# the only floating-point op is one final division of identical operands.
# --------------------------------------------------------------------------
@query(
    "ewma_daily_revenue",
    oracle="""
        WITH d AS (
            SELECT o_orderdate AS day,
                   CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                                 AS BIGINT)) AS BIGINT) AS cents
            FROM orders GROUP BY 1),
        r AS (
            SELECT day, cents,
                   ROW_NUMBER() OVER (ORDER BY day) AS rn,
                   LAG(cents, 1, 0) OVER (ORDER BY day) * 64
                 + LAG(cents, 2, 0) OVER (ORDER BY day) * 32
                 + LAG(cents, 3, 0) OVER (ORDER BY day) * 16
                 + LAG(cents, 4, 0) OVER (ORDER BY day) * 8
                 + LAG(cents, 5, 0) OVER (ORDER BY day) * 4
                 + LAG(cents, 6, 0) OVER (ORDER BY day) * 2
                 + LAG(cents, 7, 0) OVER (ORDER BY day) * 1
                 + cents * 128 AS ewts
            FROM d)
        SELECT day, cents, ewts,
               CAST(ewts AS DOUBLE)
                   / CAST(256 - CAST(POWER(2, 8 - LEAST(rn, 8)) AS BIGINT)
                          AS DOUBLE) AS ewma_cents
        FROM r
    """,
    tags=("temporal", "window", "timeseries"),
)
def ewma_daily_revenue(spark, sf_dir):
    """Exponentially-weighted trailing mean of daily revenue (alpha=1/2,
    8-tap kernel): the smoothed series a spend dashboard plots next to the
    raw one. Weights are powers of two so the weighted sum is a plain
    BIGINT — no float accumulation anywhere; the single normalizing
    division (by the partial-kernel weight sum 256 - 2^(8-avail)) is one
    IEEE op on identical operands in both engines. Aggregate-first shape:
    the window orders ~days rows, never the fact table, so the global sort
    is constant-cost at any corpus size."""
    o = T(spark, sf_dir, "orders")
    d = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum((dec("o_totalprice", 2, 18) * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    w = W.partitionBy(
        single_defined_partition(F.col("day").cast("long"))
    ).orderBy("day")
    ewts = (F.col("cents") * 128).cast("bigint")
    for k, wt in ((1, 64), (2, 32), (3, 16), (4, 8), (5, 4), (6, 2), (7, 1)):
        ewts = ewts + F.lag("cents", k, 0).over(w) * wt
    r = d.select(
        "day", "cents", ewts.alias("ewts"), F.row_number().over(w).alias("rn")
    )
    avail = F.least(F.col("rn"), F.lit(8))
    norm = F.lit(256) - F.pow(F.lit(2), F.lit(8) - avail).cast("bigint")
    return r.select(
        "day",
        "cents",
        "ewts",
        (F.col("ewts").cast("double") / norm.cast("double")).alias("ewma_cents"),
    )


@query(
    "cusum_changepoint_screen",
    oracle="""
        WITH d AS (
            SELECT c.c_mktsegment AS segment, o.o_orderdate AS day,
                   CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                                 AS BIGINT)) AS BIGINT) AS cents
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY 1, 2),
        s AS (
            SELECT segment, day, cents,
                   COUNT(*) OVER (PARTITION BY segment) AS n_days,
                   SUM(cents) OVER (PARTITION BY segment) AS tot
            FROM d),
        p AS (
            SELECT segment, day, n_days,
                   SUM(n_days * cents - tot) OVER (
                       PARTITION BY segment ORDER BY day
                       ROWS UNBOUNDED PRECEDING) AS pre
            FROM s),
        c AS (
            SELECT segment, day, n_days,
                   pre - LEAST(0, MIN(pre) OVER (
                       PARTITION BY segment ORDER BY day
                       ROWS UNBOUNDED PRECEDING)) AS cusum
            FROM p),
        k AS (
            SELECT segment, day, n_days, cusum,
                   ROW_NUMBER() OVER (PARTITION BY segment
                                      ORDER BY cusum DESC, day) AS rk
            FROM c)
        SELECT segment, CAST(n_days AS BIGINT) AS n_days, day AS peak_day,
               CAST(cusum AS BIGINT) AS peak_cusum_scaled,
               CAST(cusum AS DOUBLE) / CAST(n_days AS DOUBLE)
                   AS peak_cusum_cents
        FROM k WHERE rk = 1
    """,
    tags=("temporal", "window", "changepoint"),
)
def cusum_changepoint_screen(spark, sf_dir):
    """One-sided CUSUM changepoint screen over each market segment's daily
    revenue: where did spend shift upward relative to the segment's own
    mean? The clamp recurrence S_t = max(0, S_{t-1} + (x_t - mean)) is not
    window-expressible directly, but its closed form is: with prefix sums
    P_t of the deviations, S_t = P_t - min(0, min_{j<=t} P_j) — two
    cumulative windows, no recursion, no UDF. Deviations are scaled by
    n_days (dev = n*x - total) so everything stays in BIGINT; the single
    de-scaling division is the only float op. Windows partition by segment
    over aggregate-sized input (segments x days), never over raw orders;
    the orders->customer join is a plain equi hash join — the same plan at
    100 TB."""
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    d = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.col("o_orderdate").alias("day"),
        )
        .agg(
            F.sum((dec("o_totalprice", 2, 18) * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
    )
    wseg = W.partitionBy("segment")
    wcum = W.partitionBy("segment").orderBy("day").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    s = d.select(
        "segment",
        "day",
        "cents",
        F.count(F.lit(1)).over(wseg).alias("n_days"),
        F.sum("cents").over(wseg).alias("tot"),
    )
    p = s.select(
        "segment",
        "day",
        "n_days",
        F.sum(F.col("n_days") * F.col("cents") - F.col("tot"))
        .over(wcum)
        .alias("pre"),
    )
    cu = p.select(
        "segment",
        "day",
        "n_days",
        (
            F.col("pre")
            - F.least(F.lit(0).cast("long"), F.min("pre").over(wcum))
        ).alias("cusum"),
    )
    wrk = W.partitionBy("segment").orderBy(F.desc("cusum"), F.asc("day"))
    return (
        cu.withColumn("rk", F.row_number().over(wrk))
        .filter(F.col("rk") == 1)
        .select(
            "segment",
            F.col("n_days").cast("bigint").alias("n_days"),
            F.col("day").alias("peak_day"),
            F.col("cusum").cast("bigint").alias("peak_cusum_scaled"),
            (F.col("cusum").cast("double") / F.col("n_days").cast("double")).alias(
                "peak_cusum_cents"
            ),
        )
    )


@query(
    "trend_slope_by_segment",
    oracle="""
        WITH d AS (
            SELECT c.c_mktsegment AS segment, o.o_orderdate AS day,
                   CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                                 AS BIGINT)) AS BIGINT) AS cents
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY 1, 2),
        x AS (
            SELECT segment, cents,
                   ROW_NUMBER() OVER (PARTITION BY segment ORDER BY day) AS rn
            FROM d),
        s AS (
            SELECT segment,
                   CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
                   SUM(CAST(rn AS DECIMAL(38,0))) AS sx,
                   SUM(CAST(cents AS DECIMAL(38,0))) AS sy,
                   SUM(CAST(rn AS DECIMAL(38,0)) * CAST(cents AS DECIMAL(38,0)))
                       AS sxy,
                   SUM(CAST(rn AS DECIMAL(38,0)) * CAST(rn AS DECIMAL(38,0)))
                       AS sxx
            FROM x GROUP BY segment)
        SELECT segment, CAST(n AS BIGINT) AS n_days,
               CAST(n * sxy - sx * sy AS DOUBLE)
                   / CAST(n * sxx - sx * sx AS DOUBLE)
                   AS slope_cents_per_day,
               (CAST(sy AS DOUBLE)
                - CAST(n * sxy - sx * sy AS DOUBLE)
                    / CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(sx AS DOUBLE))
                   / CAST(n AS DOUBLE) AS intercept_cents
        FROM s
    """,
    tags=("temporal", "regression", "trend"),
)
def trend_slope_by_segment(spark, sf_dir):
    """Per-segment revenue trend: closed-form OLS of daily revenue against
    the day index — slope = (nΣxy - ΣxΣy) / (nΣx² - (Σx)²). Every sum
    accumulates in DECIMAL(38,0) (exact, associative — n·Σxy overflows
    BIGINT beyond ~sf0.3, decimal does not), so both engines hold
    identical integers; the slope is then exact-decimal→double casts and
    one division, and the intercept reuses the same expression tree —
    identical IEEE ops on identical operands. One fact-table equi join +
    one hash aggregate per grain; the regression itself runs on the
    segment×day aggregate (constant-size at any corpus)."""
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    d = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.col("o_orderdate").alias("day"),
        )
        .agg(
            F.sum((dec("o_totalprice", 2, 18) * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
    )
    x = d.select(
        "segment",
        "cents",
        F.row_number()
        .over(W.partitionBy("segment").orderBy("day"))
        .alias("rn"),
    )
    d38 = "decimal(38,0)"
    s = x.groupBy("segment").agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum(F.col("rn").cast(d38)).alias("sx"),
        F.sum(F.col("cents").cast(d38)).alias("sy"),
        F.sum(F.col("rn").cast(d38) * F.col("cents").cast(d38)).alias("sxy"),
        F.sum(F.col("rn").cast(d38) * F.col("rn").cast(d38)).alias("sxx"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    slope = num / den
    intercept = (
        F.col("sy").cast("double") - slope * F.col("sx").cast("double")
    ) / F.col("n").cast("double")
    return s.select(
        "segment",
        F.col("n").cast("bigint").alias("n_days"),
        slope.alias("slope_cents_per_day"),
        intercept.alias("intercept_cents"),
    )


@query(
    "dow_seasonality_profile",
    oracle="""
        WITH d AS (
            SELECT CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow,
                   CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                       AS cents
            FROM orders),
        per AS (
            SELECT dow, COUNT(*) AS n_orders,
                   CAST(SUM(cents) AS BIGINT) AS sum_cents
            FROM d GROUP BY dow),
        tot AS (
            SELECT CAST(SUM(sum_cents) AS BIGINT) AS t,
                   CAST(SUM(n_orders) AS BIGINT) AS n
            FROM per)
        SELECT dow, n_orders, sum_cents,
               CAST(sum_cents AS DOUBLE) / n_orders AS avg_cents,
               (CAST(sum_cents AS DOUBLE) / n_orders)
                   / (CAST(t AS DOUBLE) / n) AS seasonality_index
        FROM per, tot
    """,
    tags=("temporal", "seasonality", "agg"),
)
def dow_seasonality_profile(spark, sf_dir):
    """Day-of-week seasonality: average order value per weekday indexed
    against the overall average (index > 1 = that weekday runs hot) — the
    profile that calibrates the seasonal-naive forecast and flags
    weekday-skewed load. Integer cent sums; the two divisions and their
    ratio are the identical IEEE expression tree on identical operands in
    both engines. One hash aggregate to 7 rows + a 1-row broadcast —
    constant cost at any history length. Spark dayofweek == DuckDB
    dayofweek + 1 (Sun=1 vs Sun=0), aligned by using extract semantics:
    both here return 1..7 with Sunday=1 via the chosen functions."""
    o = T(spark, sf_dir, "orders")
    d = o.select(
        F.dayofweek("o_orderdate").cast("bigint").alias("dow"),
        (dec("o_totalprice", 2, 18) * 100).cast("bigint").alias("cents"),
    )
    per = d.groupBy("dow").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("cents").cast("bigint").alias("sum_cents"),
    )
    tot = per.agg(
        F.sum("sum_cents").cast("bigint").alias("t"),
        F.sum("n_orders").cast("bigint").alias("n"),
    )
    avg = F.col("sum_cents").cast("double") / F.col("n_orders")
    overall = F.col("t").cast("double") / F.col("n")
    return per.crossJoin(F.broadcast(tot)).select(
        "dow",
        "n_orders",
        "sum_cents",
        avg.alias("avg_cents"),
        (avg / overall).alias("seasonality_index"),
    )


@query(
    "anomalous_revenue_days",
    oracle="""
        WITH d AS (
            SELECT c.c_mktsegment AS segment, o.o_orderdate AS day,
                   CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                                 AS BIGINT)) AS BIGINT) AS cents
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY 1, 2),
        m AS (
            SELECT segment, median(cents) AS med FROM d GROUP BY segment),
        a AS (
            SELECT d.segment, d.day, d.cents, m.med,
                   ABS(d.cents - m.med) AS adev
            FROM d JOIN m ON d.segment = m.segment),
        s AS (
            SELECT segment, median(adev) AS mad FROM a GROUP BY segment)
        SELECT a.segment, a.day, a.cents, a.med, s.mad,
               (a.cents - a.med) / s.mad AS mad_z
        FROM a JOIN s ON a.segment = s.segment
        WHERE ABS(a.cents - a.med) > 6 * s.mad
    """,
    tags=("temporal", "anomaly", "robust"),
)
def anomalous_revenue_days(spark, sf_dir):
    """Robust daily-revenue anomaly screen: days whose revenue sits more
    than 6 MADs from their segment's median — the outlier detector that,
    with ewma_daily_revenue (smoothing) and cusum_changepoint_screen
    (level shifts), completes the SPC monitor trio. Median/MAD instead of
    mean/stddev so the anomalies themselves cannot drag the threshold.
    Determinism: cents are integers; the exact median of integers is an
    integer or a .5 half-integer — identical doubles in both engines —
    and the 6-MAD gate compares products of identical values. Aggregate
    first; medians run over the tiny segment×day grain."""
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    d = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.col("o_orderdate").alias("day"),
        )
        .agg(
            F.sum((dec("o_totalprice", 2, 18) * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
    )
    m = d.groupBy("segment").agg(F.median("cents").alias("med"))
    a = d.join(m, "segment").withColumn(
        "adev", F.abs(F.col("cents") - F.col("med"))
    )
    s = a.groupBy("segment").agg(F.median("adev").alias("mad"))
    return (
        a.join(s, "segment")
        .filter(F.abs(F.col("cents") - F.col("med")) > 6 * F.col("mad"))
        .select(
            "segment",
            "day",
            "cents",
            "med",
            "mad",
            ((F.col("cents") - F.col("med")) / F.col("mad")).alias("mad_z"),
        )
    )


@query(
    "shipping_delay_profile",
    oracle="""
        WITH d AS (
            SELECT o.o_orderpriority AS priority,
                   datediff('day', o.o_orderdate, l.l_shipdate) AS delay
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
        SELECT priority,
               CASE WHEN delay <= 30 THEN '0-30'
                    WHEN delay <= 60 THEN '31-60'
                    WHEN delay <= 90 THEN '61-90'
                    ELSE '90+' END AS bucket,
               COUNT(*) AS n,
               CAST(MIN(delay) AS BIGINT) AS min_delay,
               CAST(MAX(delay) AS BIGINT) AS max_delay
        FROM d GROUP BY 1, 2
    """,
    tags=("temporal", "sla", "join", "agg"),
)
def shipping_delay_profile(spark, sf_dir):
    """Order-to-ship latency distribution by priority — the SLA profile
    behind every fulfillment dashboard (does 1-URGENT actually ship
    faster?). Integer day arithmetic and fixed buckets: bit-exact. One
    fact-to-fact equi join on the order key (co-partitioned shuffle; at
    100 TB this is the bucketed-join candidate — see
    colocated_join_spend_by_segment for the zero-Exchange layout) and one
    hash aggregate to priority×bucket grain."""
    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    d = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("o_orderpriority").alias("priority"),
        F.datediff("l_shipdate", "o_orderdate").alias("delay"),
    )
    bucket = (
        F.when(F.col("delay") <= 30, "0-30")
        .when(F.col("delay") <= 60, "31-60")
        .when(F.col("delay") <= 90, "61-90")
        .otherwise("90+")
    )
    return d.groupBy("priority", bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("delay").cast("bigint").alias("min_delay"),
        F.max("delay").cast("bigint").alias("max_delay"),
    )


@query(
    "range_left_join_unmatched_clicks",
    oracle="""
        WITH c AS (SELECT event_id AS c_id, user_id AS c_user, ts AS c_ts
                   FROM events WHERE event_type = 'click'),
             p AS (SELECT event_id AS p_id, user_id AS p_user, ts AS p_ts
                   FROM events WHERE event_type = 'purchase')
        SELECT c.c_id, p.p_id
        FROM c LEFT JOIN p
          ON p.p_user = c.c_user
         AND p.p_ts >= c.c_ts
         AND p.p_ts < c.c_ts + INTERVAL 5 MINUTE
    """,
    tags=("join", "range", "temporal", "outer"),
)
def range_left_join_unmatched_clicks(spark, sf_dir):
    """LEFT OUTER bounded-interval join — the abandoned-cart scan: every
    click pairs with the same user's purchases in the NEXT 5 minutes, and
    clicks with none survive as (c_id, NULL). DuckDB runs the inequality
    left join directly (IEJoin); Spark would nested-loop it, so matches
    come from the bucketed equi rewrite (operators/rangejoin.py — forward
    window expressed as the purchase-anchored backward window, the two
    bounds being identical inequalities) and the NULL rows are restored by
    one left_anti against the matched click ids. Same shuffle cost as a
    plain equi join at any scale. Batch twin of
    streaming/pipeline.py:stream_interval_left_outer_clicks (stream ==
    batch incl. NULL rows pinned in tests/test_streaming.py)."""
    ev = T(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    # purchase-anchored backward window (c_ts ∈ (p_ts-300, p_ts]) ⇔ the
    # forward window p_ts ∈ [c_ts, c_ts+300) — one operator serves both
    pairs = bucketed_interval_pairs(
        purch, clicks,
        left_key="p_user", right_key="c_user",
        left_ts="p_ts", right_ts="c_ts",
        window_s=300,
    )
    matched = pairs.select("c_id", "p_id")
    unmatched = clicks.join(
        matched.select("c_id").distinct(), "c_id", "left_anti"
    ).select("c_id", F.lit(None).cast("bigint").alias("p_id"))
    return matched.unionByName(unmatched)


@query(
    "stream_full_outer_interval_join",
    oracle="""
        WITH c AS (SELECT event_id AS c_id, user_id AS c_user, ts AS c_ts
                   FROM events WHERE event_type = 'click'),
             p AS (SELECT event_id AS p_id, user_id AS p_user, ts AS p_ts
                   FROM events WHERE event_type = 'purchase')
        SELECT c.c_id, p.p_id
        FROM c FULL JOIN p
          ON p.p_user = c.c_user
         AND p.p_ts >= c.c_ts
         AND p.p_ts < c.c_ts + INTERVAL 5 MINUTE
    """,
    tags=("streaming", "join", "range", "temporal", "outer"),
)
def stream_full_outer_interval_join(spark, sf_dir):
    """The stream-stream FULL OUTER interval join
    (streaming/pipeline.py:stream_interval_full_outer_clicks), driver-checked
    by replay through REAL micro-batches: the events table lands as a file
    stream, clicks full-outer-join purchases on (same user, purchase within
    the following 5 min), and the result must equal the oracle's batch
    full_outer with the identical predicate — matched pairs, un-attributed
    clicks (NULL purchase), and organic purchases (NULL click) all present.

    Replay mechanics: run 1 processes the corpus (matches emit; each side's
    NULL rows wait on the OTHER side's watermark); appending a far-future
    sentinel pair and re-running on the same checkpoint pushes both
    watermarks past every real row, so append mode provably flushes every
    unmatched row — the same watermark-flushing-restart shape pinned
    stream==batch in tests/test_streaming.py. Sentinel rows (ids ≥ 1e9,
    users < 0) match nothing and are filtered from the result.

    Scale: the same two clocks bound both state stores — full-outer holds
    no more state than left-outer; per micro-batch cost is the interval
    join of the batch's rows against watermark-bounded state."""
    import datetime
    import os

    from etl_expenses_spark.streaming.pipeline import (
        stream_interval_full_outer_clicks,
    )

    ev = T(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type"
    ).filter(F.col("event_type").isin("click", "purchase"))
    work = work_dir("stream_full_outer_interval_join", sf_dir)
    bronze = os.path.join(work, "bronze")
    gold = os.path.join(work, "gold")
    ckpt = os.path.join(work, "ckpt")
    # one time-coherent file: a single-batch run 1 sees every row before the
    # watermark first advances, so nothing is ever late-dropped (multi-file
    # replay ordering is exercised by tests/test_streaming.py)
    ev.coalesce(1).write.mode("append").parquet(bronze)

    def run_once_():
        stream = (
            spark.readStream.schema(
                "event_id long, ts timestamp, user_id long, event_type string"
            ).parquet(bronze)
        )
        j = stream_interval_full_outer_clicks(
            stream.filter(F.col("event_type") == "click"),
            stream.filter(F.col("event_type") == "purchase"),
            window_s=300,
            watermark_s=600,
        )
        (
            j.writeStream.format("parquet")
            .option("path", gold)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )

    run_once_()
    far = ev.agg(F.max("ts")).collect()[0][0] + datetime.timedelta(hours=6)
    spark.createDataFrame(
        [(1_000_000_001, far, -1, "click"),
         (1_000_000_002, far, -2, "purchase")],
        "event_id long, ts timestamp, user_id long, event_type string",
    ).write.mode("append").parquet(bronze)
    run_once_()
    out = spark.read.parquet(gold)
    return out.filter(
        (F.col("c_id").isNull() | (F.col("c_id") < 1_000_000_000))
        & (F.col("p_id").isNull() | (F.col("p_id") < 1_000_000_000))
    ).select("c_id", "p_id")


@query(
    "shipments_in_transit_daily",
    oracle="""
        WITH iv AS (
            SELECT l_shipdate AS s,
                   l_shipdate
                   + CAST(((l_orderkey + l_linenumber) % 14 + 1) AS INT)
                     * INTERVAL 1 DAY AS e
            FROM lineitem),
        deltas AS (
            SELECT s AS day, CAST(COUNT(*) AS BIGINT) AS d FROM iv GROUP BY s
            UNION ALL
            SELECT e + INTERVAL 1 DAY, -CAST(COUNT(*) AS BIGINT)
            FROM iv GROUP BY e),
        byday AS (SELECT CAST(day AS DATE) AS day, SUM(d) AS d
                  FROM deltas GROUP BY 1),
        run AS (
            SELECT day,
                   CAST(SUM(d) OVER (ORDER BY day
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS in_transit
            FROM byday)
        SELECT day, in_transit
        FROM run
        ORDER BY in_transit DESC, day
        LIMIT 10
    """,
    tags=("temporal", "interval", "sweep_line"),
)
def shipments_in_transit_daily(spark, sf_dir):
    """INTERVAL-SWEEP concurrency: the 10 days with the most shipments
    simultaneously in transit, over [l_shipdate, l_shipdate + transit]
    intervals (transit = 1–14 days derived deterministically from the
    line's keys — the testdata carries no receiptdate; inclusive ends, so
    the −1 lands the day AFTER delivery). The classic sweep-line reduced
    to daily grain: every interval contributes +1 at its start day and −1
    past its end day; the running sum over the per-day delta table IS the
    concurrency curve.

    100 TB shape: the only full-data pass is the two per-day delta
    aggregates (map-side partial, keyed by date — ~thousands of groups);
    the running sum then operates on the BOUNDED per-day relation (one row
    per distinct day), where a single-partition window is the right plan
    at any corpus size — same bounded-final-pass argument as the suffix
    array's edge rows and the skyline merge. Never sorts, windows, or
    self-joins the raw intervals."""
    li = T(spark, sf_dir, "lineitem").select(
        F.col("l_shipdate").alias("s"),
        F.date_add(
            "l_shipdate",
            ((F.col("l_orderkey") + F.col("l_linenumber")) % 14 + 1).cast(
                "int"
            ),
        ).alias("e"),
    )
    starts = li.groupBy(F.col("s").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    ends = li.groupBy(F.date_add("e", 1).cast("date").alias("day")).agg(
        (-F.count(F.lit(1))).cast("long").alias("d")
    )
    byday = (
        starts.unionByName(ends)
        .groupBy("day")
        .agg(F.sum("d").alias("d"))
    )
    # global window is bounded BY CONSTRUCTION: byday is day-grain
    # (<= ~2.5k rows over the 7-year order domain, growing with calendar
    # time only, never with shipment volume) — allowlisted per query in
    # tools/explain_audit.py GLOBAL_WINDOW_OK (VERDICT r10 #9)
    run = byday.withColumn(
        "in_transit",
        F.sum("d")
        .over(W.orderBy("day").rowsBetween(W.unboundedPreceding, 0))
        .cast("bigint"),
    )
    return (
        run.select("day", "in_transit")
        .orderBy(F.desc("in_transit"), "day")
        .limit(10)
    )
