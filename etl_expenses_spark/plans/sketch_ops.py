"""Sketch, incremental-state, and graph-metric queries: Count-Min
frequency estimation, aggregate-state merge (the incremental-MV shape),
and triangle counting over a co-occurrence graph.

These are the shapes a 100 TB pipeline leans on when exact recomputation
is the enemy: a CMS answers "how often does key X occur" in O(d·w) memory
per partition with mergeable state; incremental state merge updates a
day's aggregate by scanning ONLY the day's delta; triangle counting is
the canonical "self-join on a big edge list without going cartesian"
discipline. Every query here is exact-arithmetic and oracle-checked —
the CMS uses md5-derived bucket hashing both engines compute identically
(same idiom as ab_experiment_lift).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_expenses_spark.plans._util import T, dec, work_dir
from etl_expenses_spark.plans.registry import query
from etl_expenses_spark.scaleout import fan_out


def _md5_bucket(col, salt: str, w: int):
    """Deterministic cross-engine hash bucket: first 8 md5 hex chars of
    ``value|salt`` as an int, mod w (conv stays within 8 hex chars — the
    >15-char overflow zone is never touched)."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(col.cast("string"), F.lit(f"|{salt}"))), 1, 8),
            16,
            10,
        ).cast("long")
        % w
    )


@query(
    "countmin_user_frequency",
    oracle="""
        WITH rows_ AS (
            SELECT d, user_id,
                   CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR) || '|cm' || d), 1, 8))
                        AS BIGINT) % 64 AS bucket
            FROM events CROSS JOIN (SELECT 0 AS d UNION ALL SELECT 1 UNION ALL SELECT 2) ds),
        cms AS (
            SELECT d, bucket, COUNT(*) AS c FROM rows_ GROUP BY d, bucket),
        exact AS (
            SELECT user_id, COUNT(*) AS exact_n FROM events GROUP BY user_id),
        keys AS (
            SELECT user_id, exact_n,
                   CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR) || '|cm' || d.d), 1, 8))
                        AS BIGINT) % 64 AS bucket, d.d
            FROM exact CROSS JOIN (SELECT 0 AS d UNION ALL SELECT 1 UNION ALL SELECT 2) d),
        est AS (
            SELECT k.user_id, k.exact_n, MIN(c.c) AS cms_estimate
            FROM keys k JOIN cms c ON c.d = k.d AND c.bucket = k.bucket
            GROUP BY k.user_id, k.exact_n)
        SELECT user_id, exact_n, cms_estimate
        FROM est
        ORDER BY exact_n DESC, user_id
        LIMIT 20
    """,
    tags=("sketch", "countmin", "frequency"),
)
def countmin_user_frequency(spark, sf_dir):
    """Count-Min sketch (d=3 rows × w=64 buckets) over event user
    frequencies, reported against exact counts for the top-20 users.

    The sketch state is a d×w count grid built by ONE grouped aggregate
    over (row, bucket) — mergeable across partitions/days by addition, the
    property that makes it the streaming/incremental frequency store. The
    estimate for a key is min over rows of its bucket count (always an
    overestimate; error ≤ N/w with prob 1-2^-d). Bucket hash = md5-derived
    (cross-engine identical); estimates are exact integers, so the oracle
    match is bit-exact. At 100 TB the grid is 192 longs regardless of
    cardinality."""
    ev = T(spark, sf_dir, "events").select("user_id")
    ds = spark.range(3).select(F.col("id").cast("int").alias("d"))
    # the CMS row index d is part of the hash salt, so the bucket expr is
    # built inline rather than via _md5_bucket (whose salt is a literal)
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("user_id").cast("string"), F.lit("|cm"), F.col("d").cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 64
    )
    rows_ = ev.crossJoin(F.broadcast(ds)).select("user_id", "d", bucket.alias("bucket"))
    cms = rows_.groupBy("d", "bucket").agg(F.count(F.lit(1)).alias("c"))
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_n"))
    keys = exact.crossJoin(F.broadcast(ds)).select(
        "user_id", "exact_n", "d", bucket.alias("bucket")
    )
    est = (
        keys.join(F.broadcast(cms), ["d", "bucket"])
        .groupBy("user_id", "exact_n")
        .agg(F.min("c").alias("cms_estimate"))
    )
    return est.orderBy(F.col("exact_n").desc(), "user_id").limit(20)


@query(
    "incremental_agg_state_merge",
    oracle="""
        SELECT o_custkey,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS total_spend
        FROM orders
        GROUP BY o_custkey
    """,
    tags=("incremental", "agg_state", "materialized_view"),
)
def incremental_agg_state_merge(spark, sf_dir):
    """Incremental materialized-view maintenance: yesterday's aggregate
    STATE (per-key count + decimal sum over orders before the cutoff) is
    merged with the delta's partial aggregate (orders at/after the cutoff)
    by re-aggregating the two state relations — count adds, sum adds —
    with the history scanned ZERO times. The oracle recomputes from the
    full table: merge(state, delta) must equal recompute, the invariant
    that lets a 100 TB MV update from a 100 GB delta. Count and decimal
    sum are the mergeable-state pattern; avg derives as sum/count at read
    time (never stored, it does not merge).

    Output types are pinned (bigint / double) on BOTH engine sides: the
    internal merge state stays decimal-exact, but a raw decimal output
    column can never be driver-hash-green — the driver canonicalizes via
    pandas, where DuckDB decimals arrive as float64 while Spark decimals
    arrive as decimal.Decimal objects, so identical values stringify
    differently ('1234.50' vs '1234.5'). That asymmetry is what failed
    this query's r9 hash (CORRECTNESS_r09: rows/schema green, hash red);
    tools/check_oracle.py now reproduces the coercion so the local gate
    fails the same way (tests/test_oracle_gate.py pins it)."""
    o = T(spark, sf_dir, "orders")
    cutoff = "2000-07-01"

    def state(df):
        return df.groupBy("o_custkey").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(dec("o_totalprice", 2, 18)).alias("total_spend"),
        )

    prior = state(o.filter(F.col("o_orderdate") < cutoff))  # persisted MV state
    delta = state(o.filter(F.col("o_orderdate") >= cutoff))  # today's scan
    return (
        prior.unionByName(delta)
        .groupBy("o_custkey")
        .agg(
            F.sum("n_orders").cast("bigint").alias("n_orders"),
            F.sum("total_spend").cast("double").alias("total_spend"),
        )
    )


@query(
    "triangle_count_copurchase",
    oracle="""
        WITH pairs AS (
            SELECT DISTINCT a.l_orderkey, a.l_partkey AS pa, b.l_partkey AS pb
            FROM lineitem a JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        edges AS (
            SELECT pa, pb FROM pairs GROUP BY pa, pb HAVING COUNT(*) >= 2)
        SELECT COUNT(*) AS n_triangles FROM (
            SELECT 1
            FROM edges e1
            JOIN edges e2 ON e2.pa = e1.pb
            JOIN edges e3 ON e3.pa = e1.pa AND e3.pb = e2.pb
        )
    """,
    tags=("graph", "triangles", "join"),
)
def triangle_count_copurchase(spark, sf_dir):
    """Triangle count over the co-purchase graph: parts are linked when
    they appear in >= 2 common orders, triangles found by the ordered
    edge-edge-edge join (a<b<c throughout, so each triangle is counted
    once and the join never mirrors itself).

    Scale shape: per-order part pairs come from collected baskets — one
    shuffle keyed by order, in-basket pairs expanded JVM-side from the
    sorted array (bounded by basket size, never |parts|²; collect_set
    dedups in-basket repeats, replacing a sort-merge self-join + DISTINCT
    — two exchanges cheaper). The triangle join then shuffles the edge
    list on its endpoints — the standard distributed triangle
    enumeration. The >= 2 common-orders threshold is the edge sparsifier
    that keeps the closing join selective."""
    # r13: keyed on the SAME column as the groupBy, so this adds no second
    # exchange (HashPartitioning(l_orderkey) satisfies the aggregation's
    # required distribution) — it only moves the partial collect_set off
    # the single-task one-file scan onto all cores (guide §2.4/§2.5).
    li = fan_out(
        T(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey"),
        "l_orderkey",
    )
    baskets = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("bs")
    )
    pairs = baskets.select(
        F.explode(
            F.expr(
                "flatten(transform(bs, (x, i) -> transform("
                "slice(bs, i + 2, size(bs)), y -> struct(x AS pa, y AS pb))))"
            )
        ).alias("p")
    ).select("p.pa", "p.pb")
    edges = (
        pairs.groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .filter(F.col("n_common") >= 2)
        .select("pa", "pb")
    )
    e1 = edges.alias("e1")
    e2 = edges.alias("e2")
    e3 = edges.alias("e3")
    tri = e1.join(e2, F.col("e2.pa") == F.col("e1.pb")).join(
        e3,
        (F.col("e3.pa") == F.col("e1.pa")) & (F.col("e3.pb") == F.col("e2.pb")),
    )
    return tri.agg(F.count(F.lit(1)).alias("n_triangles"))


@query(
    "theta_retention_daily",
    oracle="""
        WITH du AS (
            SELECT DISTINCT CAST(DATE_TRUNC('day', ts) AS DATE) AS day, user_id
            FROM events
        ),
        cnt AS (SELECT day, COUNT(*) AS c FROM du GROUP BY day),
        pairs AS (
            SELECT a.day AS prev_day, b.day AS day, a.c AS n_prev, b.c AS n_cur
            FROM cnt a JOIN cnt b ON b.day = a.day + INTERVAL 1 DAY
        ),
        ret AS (
            SELECT a.day AS prev_day, b.day AS day, COUNT(*) AS n_ret
            FROM du a JOIN du b
              ON b.user_id = a.user_id AND b.day = a.day + INTERVAL 1 DAY
            GROUP BY a.day, b.day
        )
        SELECT p.day, p.prev_day,
               CAST(p.n_prev AS BIGINT) AS n_prev,
               CAST(p.n_cur AS BIGINT) AS n_cur,
               CAST(COALESCE(r.n_ret, 0) AS BIGINT) AS n_retained,
               CAST(p.n_cur - COALESCE(r.n_ret, 0) AS BIGINT) AS n_new,
               CAST(p.n_prev - COALESCE(r.n_ret, 0) AS BIGINT) AS n_churned
        FROM pairs p
        LEFT JOIN ret r ON r.day = p.day AND r.prev_day = p.prev_day
    """,
    tags=("sketch", "theta", "retention"),
)
def theta_retention_daily(spark, sf_dir):
    """Day-over-day retention via THETA SKETCH set algebra: per-day user
    sets become KB-sized theta sketches; retained = intersection estimate,
    new/churned = difference estimates between consecutive days. This is
    the 100 TB retention computation — the exact form needs a (day, user)
    self-join shuffling every active user twice, the sketch form joins
    |days| KB-sized rows after one aggregate scan.

    Theta sketches are deterministic (fixed seed) and partition-invariant
    (verified: identical estimates under repartition(7)/(13)); at the
    test scale factors every daily set is below the sketch's exact-mode
    threshold (k=4096 > ~1.5k users), so the estimates EQUAL the exact
    counts the SQL oracle computes — the compare is bit-exact, and the
    same plan at 100 TB degrades only to the sketch's ±1.6% error band."""
    du = (
        T(spark, sf_dir, "events")
        .select(
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"), "user_id"
        )
    )
    sk = du.groupBy("day").agg(F.theta_sketch_agg("user_id").alias("sk"))
    prev = sk.select(
        F.col("day").alias("prev_day"), F.col("sk").alias("sk_prev")
    )
    cur = sk.select("day", F.col("sk").alias("sk_cur"))
    j = cur.join(prev, cur.day == F.date_add(prev.prev_day, 1))
    inter = F.theta_sketch_estimate(
        F.theta_intersection("sk_prev", "sk_cur")
    ).cast("bigint")
    return j.select(
        "day",
        "prev_day",
        F.theta_sketch_estimate("sk_prev").cast("bigint").alias("n_prev"),
        F.theta_sketch_estimate("sk_cur").cast("bigint").alias("n_cur"),
        inter.alias("n_retained"),
        (F.theta_sketch_estimate("sk_cur").cast("bigint") - inter).alias("n_new"),
        (F.theta_sketch_estimate("sk_prev").cast("bigint") - inter).alias(
            "n_churned"
        ),
    )


@query(
    "theta_weekly_rollup_from_daily",
    oracle="""
        WITH du AS (
            SELECT DISTINCT CAST(DATE_TRUNC('week', ts) AS DATE) AS week, user_id
            FROM events
        )
        SELECT week, CAST(COUNT(*) AS BIGINT) AS n_users
        FROM du GROUP BY week
    """,
    tags=("sketch", "theta", "rollup"),
)
def theta_weekly_rollup_from_daily(spark, sf_dir):
    """Sketch-enabled re-aggregation: WEEKLY distinct users computed by
    unioning the per-DAY theta sketches — the pattern that lets a
    warehouse keep one day-grain sketch table and answer any coarser
    grain (week/month/quarter, or ad-hoc day ranges) without ever
    rescanning raw events. COUNT(DISTINCT) does not re-aggregate;
    sketches do — that is the whole reason they exist at 100 TB.

    The oracle computes the exact weekly distinct counts; at test scale
    the sketches are in exact mode (verified deterministic and
    partition-invariant), so the rollup matches bit-for-bit."""
    daily = (
        T(spark, sf_dir, "events")
        .select(
            F.date_trunc("week", F.col("ts")).cast("date").alias("week"),
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
            "user_id",
        )
        .groupBy("week", "day")
        .agg(F.theta_sketch_agg("user_id").alias("sk"))
    )
    return (
        daily.groupBy("week")
        .agg(F.theta_union_agg("sk").alias("sk"))
        .select(
            "week", F.theta_sketch_estimate("sk").cast("bigint").alias("n_users")
        )
    )


@query(
    "link_prediction_jaccard",
    oracle="""
        WITH pairs AS (
            SELECT DISTINCT a.l_orderkey, a.l_partkey AS pa, b.l_partkey AS pb
            FROM lineitem a JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        edges AS (
            SELECT pa, pb FROM pairs GROUP BY pa, pb HAVING COUNT(*) >= 2),
        adj AS (
            SELECT pa AS node, pb AS nbr FROM edges
            UNION ALL
            SELECT pb AS node, pa AS nbr FROM edges),
        deg AS (SELECT node, COUNT(*) AS d FROM adj GROUP BY node),
        wedge AS (
            SELECT a.nbr AS u, b.nbr AS v
            FROM adj a JOIN adj b ON a.node = b.node AND a.nbr < b.nbr),
        inter AS (SELECT u, v, COUNT(*) AS ic FROM wedge GROUP BY u, v),
        cand AS (
            SELECT i.u, i.v, i.ic, du.d + dv.d - i.ic AS uc
            FROM inter i
            JOIN deg du ON du.node = i.u
            JOIN deg dv ON dv.node = i.v
            WHERE NOT EXISTS (SELECT 1 FROM edges e
                              WHERE e.pa = i.u AND e.pb = i.v))
        SELECT u AS pa, v AS pb,
               CAST(ic AS BIGINT) AS n_common_neighbors,
               CAST(ic AS DOUBLE) / uc AS jaccard
        FROM cand
        WHERE ic * 5 >= uc
    """,
    tags=("graph", "link_prediction", "join"),
)
def link_prediction_jaccard(spark, sf_dir):
    """Link prediction over the co-purchase graph: for every NON-edge pair
    of parts sharing at least one neighbor, the Jaccard overlap of their
    neighborhoods — the classic 'customers who bought these also bought'
    candidate score. Output: pairs with neighborhood Jaccard >= 0.2,
    thresholded in EXACT integer space (ic*5 >= uc) so both engines select
    the identical row set; the double ratio is a single IEEE division.

    Scale shape: neighbor sets come from one groupBy over the edge list
    (each edge contributes both directions); common-neighbor pairs expand
    JVM-side from each node's sorted neighbor array — the wedge expansion
    Σ deg(w)², same bound as the triangle join, generated WITHOUT a
    self-join shuffle. Degrees ride along by joining the (node, degree)
    relation twice (broadcast at this scale; hash joins on u then v at
    100 TB). Known edges are removed with one left_anti join. No all-pairs
    anything: cost is wedge-bound, and the >= 2 common-orders edge
    sparsifier bounds degrees exactly as it does for triangles."""
    edges = _copurchase_edges(spark, sf_dir)
    from etl_expenses_spark.operators.graph import jaccard_link_prediction

    return jaccard_link_prediction(edges, max_degree=None)


def _copurchase_edges(spark, sf_dir):
    """Sparsified co-purchase edge list: part pairs sharing >= 2 orders.
    Pairs expand JVM-side from each order's sorted part array (no lineitem
    self-join shuffle). The result is persisted — it feeds three consumers
    (both adjacency directions + the left_anti probe)."""
    # r13: keyed on the SAME column as the groupBy, so this adds no second
    # exchange (HashPartitioning(l_orderkey) satisfies the aggregation's
    # required distribution) — it only moves the partial collect_set off
    # the single-task one-file scan onto all cores (guide §2.4/§2.5).
    li = fan_out(
        T(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey"),
        "l_orderkey",
    )
    baskets = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("bs")
    )
    pairs = baskets.select(
        F.explode(
            F.expr(
                "flatten(transform(bs, (x, i) -> transform("
                "slice(bs, i + 2, size(bs)), y -> struct(x AS pa, y AS pb))))"
            )
        ).alias("p")
    ).select("p.pa", "p.pb")
    from etl_expenses_spark.caching import track

    edges = (
        pairs.groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .filter(F.col("n_common") >= 2)
        .select("pa", "pb")
        .persist()
    )
    track(edges)
    return edges


# Hot-node degree cap for the capped tier: every neighbor list is
# hash-sampled down to at most this many entries before wedge expansion,
# bounding any single node's fan-out at cap² wedges. 64 keeps >90% of
# sf0.01 nodes exact (max co-purchase degree there is well under it) while
# making the adversarial-hub tier (one part in 1% of all orders) finite.
_LINKPRED_DEGREE_CAP = 64


@query(
    "link_prediction_jaccard_capped",
    oracle=f"""
        WITH pairs AS (
            SELECT DISTINCT a.l_orderkey, a.l_partkey AS pa, b.l_partkey AS pb
            FROM lineitem a JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        edges AS (
            SELECT pa, pb FROM pairs GROUP BY pa, pb HAVING COUNT(*) >= 2),
        adj AS (
            SELECT pa AS node, pb AS nbr FROM edges
            UNION ALL
            SELECT pb AS node, pa AS nbr FROM edges),
        adjc AS (
            SELECT node, nbr FROM adj
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY node
                ORDER BY (nbr % 1000003) * 2654435761 % 4294967296, nbr
            ) <= {{cap}}),
        deg AS (SELECT nbr AS node, COUNT(*) AS d FROM adjc GROUP BY nbr),
        wedge AS (
            SELECT a.nbr AS u, b.nbr AS v
            FROM adjc a JOIN adjc b ON a.node = b.node AND a.nbr < b.nbr),
        inter AS (SELECT u, v, COUNT(*) AS ic FROM wedge GROUP BY u, v),
        cand AS (
            SELECT i.u, i.v, i.ic, du.d + dv.d - i.ic AS uc
            FROM inter i
            JOIN deg du ON du.node = i.u
            JOIN deg dv ON dv.node = i.v
            WHERE NOT EXISTS (SELECT 1 FROM edges e
                              WHERE e.pa = i.u AND e.pb = i.v))
        SELECT u AS pa, v AS pb,
               CAST(ic AS BIGINT) AS n_common_neighbors,
               CAST(ic AS DOUBLE) / uc AS jaccard
        FROM cand
        WHERE ic * 5 >= uc
    """.replace("{cap}", str(_LINKPRED_DEGREE_CAP)),
    tags=("graph", "link_prediction", "join", "skew"),
)
def link_prediction_jaccard_capped(spark, sf_dir):
    """Degree-capped tier of `link_prediction_jaccard`: identical pipeline,
    but every neighbor list is deterministically hash-sampled down to at
    most _LINKPRED_DEGREE_CAP entries before the wedge expansion (Knuth
    multiplicative hash, engine-portable integer arithmetic — see
    operators/graph.py). This is the tier you run at 100 TB, where one
    adversarially hot part (1% of all orders) would otherwise put ~10^14
    wedges behind a single node; the cap bounds every node at cap² wedges.
    Scores are the exact Jaccard of the reverse-capped neighborhoods and
    equal the uncapped scores wherever degrees are below the cap (pinned by
    tests/test_graph_links.py)."""
    edges = _copurchase_edges(spark, sf_dir)
    from etl_expenses_spark.operators.graph import jaccard_link_prediction

    return jaccard_link_prediction(edges, max_degree=_LINKPRED_DEGREE_CAP)


# Shared prefix of the graph-family computed oracles (r11, VERDICT r10
# #2): the co-purchase edge construction in DuckDB SQL, identical to
# _copurchase_edges + the two adjacency tiers of operators/graph.py.
_EDGES_SQL = """
        prs AS (
            SELECT DISTINCT a.l_orderkey, a.l_partkey AS pa, b.l_partkey AS pb
            FROM lineitem a JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        edges0 AS (
            SELECT pa, pb FROM prs GROUP BY pa, pb HAVING COUNT(*) >= 2),
"""

# h-index BSP replayed as a recursive CTE: the working table carries the
# previous round's estimates; the self-row trick (is_self=1) reads each
# node's own estimate through the same single join that collects its
# neighbors' values; the h-index itself is a list lambda (sort desc,
# count positions where value >= 1-based rank — DuckDB's (x, i) index
# lambda). Core numbers are an order-independent fixpoint and the
# iteration is monotone non-increasing, so running the full round budget
# (50, Spark raises beyond it) reproduces Spark's early-stop exactly.
_KCORE_SQL = """
        adj2 AS (
            SELECT node, nbr, 0 AS is_self FROM sym
            UNION ALL
            SELECT DISTINCT node, node, 1 AS is_self FROM sym),
        est(h, node, c) AS (
            SELECT 0, node, COUNT(*) FILTER (WHERE is_self = 0)
            FROM adj2 GROUP BY node
            UNION ALL
            SELECT h, node,
                   LEAST(old_c, len(list_filter(list_sort(cs, 'DESC'),
                                                (x, i) -> x >= i))) AS c
            FROM (
                SELECT e.h + 1 AS h, a.node AS node,
                       MAX(CASE WHEN a.is_self = 1 THEN e.c END) AS old_c,
                       list(e.c) FILTER (WHERE a.is_self = 0) AS cs
                FROM adj2 a JOIN est e ON a.nbr = e.node
                GROUP BY 1, 2
            )
            WHERE h <= 50
        )
        SELECT CAST(c AS BIGINT) AS core,
               CAST(COUNT(*) AS BIGINT) AS n_nodes,
               CAST(MIN(node) AS BIGINT) AS min_node,
               CAST(MAX(node) AS BIGINT) AS max_node
        FROM est WHERE h = 50
        GROUP BY c ORDER BY core
"""


@query(
    "kcore_copurchase",
    oracle="WITH RECURSIVE " + _EDGES_SQL + """
        sym AS (
            SELECT pa AS node, pb AS nbr FROM edges0
            UNION
            SELECT pb AS node, pa AS nbr FROM edges0),
    """ + _KCORE_SQL,
    tags=("graph", "kcore"),
)
def kcore_copurchase(spark, sf_dir):
    """Core-number histogram of the co-purchase graph: distributed k-core
    decomposition (operators/graph.py kcore_decomposition — Montresor
    h-index BSP, one shuffle per round, exact at convergence), aggregated
    to (core, n_nodes, min_node, max_node) so the output is a stable
    handful of rows. Since r11 the oracle is a COMPUTED DuckDB recursive
    CTE running the identical h-index iteration (core numbers are an
    order-independent fixpoint, so the fixed 50-round budget reproduces
    Spark's early-stop exactly) — the golden pin retired (VERDICT r10
    #2). Semantic correctness vs literal sequential peeling additionally
    pinned in tests/test_graph_links.py."""
    from etl_expenses_spark.operators.graph import kcore_decomposition

    edges = _copurchase_edges(spark, sf_dir)
    cores = kcore_decomposition(edges, "pa", "pb")
    return (
        cores.groupBy("core")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.min("node").alias("min_node"),
            F.max("node").alias("max_node"),
        )
        .orderBy("core")
    )


# Mutual-capped adjacency in DuckDB: per-node hash-lowest cap (the same
# Knuth multiplicative key as operators/graph._hash_rank_col), then an
# edge survives only if BOTH directions kept it.
_CAPPED_SYM_SQL = """
        adjall AS (
            SELECT pa AS node, pb AS nbr FROM edges0
            UNION ALL
            SELECT pb AS node, pa AS nbr FROM edges0),
        adjc AS (
            SELECT node, nbr FROM adjall
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY node
                ORDER BY (nbr % 1000003) * 2654435761 % 4294967296, nbr
            ) <= 64),
        sym AS (
            SELECT a.node, a.nbr FROM adjc a
            JOIN adjc b ON a.node = b.nbr AND a.nbr = b.node),
"""


@query(
    "kcore_copurchase_capped",
    oracle="WITH RECURSIVE " + _EDGES_SQL + _CAPPED_SYM_SQL + _KCORE_SQL,
    tags=("graph", "kcore", "skew"),
)
def kcore_copurchase_capped(spark, sf_dir):
    """Degree-capped tier of `kcore_copurchase` — the shape you run at
    100 TB, where one adversarially hot part would otherwise put an O(deg)
    collect_list behind a single node and let the round count grow with the
    hub's degree (SCALING r6 measured the uncapped loop at 18.3× on 10×
    data). Every neighbor list is hash-sampled to ≤ _LINKPRED_DEGREE_CAP
    entries and the graph mutual-capped (operators/graph.py
    kcore_decomposition(max_degree=...)), bounding per-node state, the
    initial estimates, and the rounds at the cap. Core numbers lower-bound
    the exact ones and equal them when the cap clears the max degree
    (pinned in tests/test_graph_links.py). Since r11 the oracle is the
    same computed h-index recursive CTE as the uncapped query, over the
    DuckDB replica of the mutual-capped adjacency (golden pin retired)."""
    from etl_expenses_spark.operators.graph import kcore_decomposition

    edges = _copurchase_edges(spark, sf_dir)
    cores = kcore_decomposition(
        edges, "pa", "pb", max_degree=_LINKPRED_DEGREE_CAP
    )
    return (
        cores.groupBy("core")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.min("node").alias("min_node"),
            F.max("node").alias("max_node"),
        )
        .orderBy("core")
    )


@query(
    "bitmap_weekly_distinct_rollup",
    oracle="""
        SELECT CAST(DATE_TRUNC('week', ts) AS DATE) AS week,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS distinct_users
        FROM events
        GROUP BY 1
    """,
    tags=("sketch", "bitmap", "agg", "rollup"),
)
def bitmap_weekly_distinct_rollup(spark, sf_dir):
    """EXACT distinct-user weekly rollup from mergeable per-day bitmap
    state — the precise-count sibling of `theta_weekly_rollup_from_daily`
    (sketches trade exactness for fixed size; RLE-free bitmaps stay exact
    at ~1 bit per possible id). Spark 3.5+/4 bitmap surface:

      daily  groupBy(day, bitmap_bucket_number(user_id))
             → bitmap_construct_agg(bitmap_bit_position(user_id))
             — one 4 KB bitmap per (day, 32768-id bucket), the
             incremental state a nightly job maintains;
      weekly groupBy(week, bucket) → bitmap_or_agg — rollup WITHOUT
             touching raw events again (COUNT(DISTINCT) can't do this:
             distinct counts don't add, bitmaps OR);
      count  sum of bitmap_count over buckets = exact weekly distincts.

    The oracle recomputes from raw rows; equality IS the claim that
    bucketed bitmap state composes losslessly. 100 TB shape: state size
    follows the live id range (buckets are sparse — absent id blocks cost
    nothing), re-aggregation cost follows days×buckets, never event
    volume."""
    ev = T(spark, sf_dir, "events").select(
        F.date_trunc("week", F.col("ts")).cast("date").alias("week"),
        F.col("ts").cast("date").alias("day"),
        "user_id",
    )
    daily = ev.groupBy(
        "week",
        "day",
        F.expr("bitmap_bucket_number(user_id)").alias("bucket"),
    ).agg(F.expr("bitmap_construct_agg(bitmap_bit_position(user_id))").alias("bm"))
    weekly = daily.groupBy("week", "bucket").agg(
        F.expr("bitmap_or_agg(bm)").alias("bm")
    )
    return weekly.groupBy("week").agg(
        F.sum(F.expr("bitmap_count(bm)")).cast("bigint").alias("distinct_users")
    )


@query(
    "bitmap_sliding_7d_users",
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
        SELECT report_day,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS active_7d
        FROM contrib GROUP BY report_day
    """,
    tags=("sketch", "bitmap", "window", "rollup"),
)
def bitmap_sliding_7d_users(spark, sf_dir):
    """EXACT trailing-7-day distinct actives from mergeable per-day bitmap
    state — the third implementation of the inexpressible
    COUNT(DISTINCT) OVER RANGE, completing the tier ladder: the sequence
    fan-out (`rolling_7d_active_users`, re-shuffles day-grain rows 7×),
    the HLL union (`hll_sliding_7d_users`, fixed-size state, ±2% error),
    and THIS — bitmaps OR like sketches but count exactly. Events are
    scanned ONCE into (day, bucket, bitmap) state; each report day then
    ORs ≤ 7 days' bucket bitmaps (a days×7 spine join over KB-rows, cost
    independent of event volume) and sums exact bitmap_count over
    buckets. Same mergeable-state algebra a nightly incremental job
    maintains — the window recomputes from state, never from raw
    events."""
    ev = T(spark, sf_dir, "events").select(
        F.col("ts").cast("date").alias("day"), "user_id"
    )
    daily = ev.groupBy(
        "day", F.expr("bitmap_bucket_number(user_id)").alias("bucket")
    ).agg(F.expr("bitmap_construct_agg(bitmap_bit_position(user_id))").alias("bm"))
    days = daily.select("day").distinct().select(F.col("day").alias("report_day"))
    # days×7 offset spine: report_day collects the bitmaps of the ≤7
    # trailing days present in the state
    window = days.join(
        daily,
        (F.col("day") <= F.col("report_day"))
        & (F.col("day") > F.date_sub(F.col("report_day"), 7)),
    )
    return (
        window.groupBy("report_day", "bucket")
        .agg(F.expr("bitmap_or_agg(bm)").alias("bm"))
        .groupBy("report_day")
        .agg(
            F.sum(F.expr("bitmap_count(bm)")).cast("bigint").alias("active_7d")
        )
    )


@query(
    "lpa_communities_copurchase",
    # INDEPENDENT computed oracle (r11, VERDICT r10 #2 — replaces the r10
    # golden pin): the parity-scheduled min-tie-break LPA evolution is a
    # bounded recursion, and DuckDB's recursive-CTE working table IS the
    # half-sweep state carry. One recursive reference suffices: the
    # adjacency is augmented with a self-row per node (is_self=1) so each
    # sweep reads both the neighbor votes AND the node's own old label
    # from a single join against the previous half's labels; the
    # most-frequent-smallest-label argmax is an encoded-key MIN
    # (nlab - cnt*2^40 orders by count desc, then label asc; decoded by
    # integer division). Early-stop parity with Spark is exact because a
    # stable even+odd cycle is a fixed point — running all 2*max_cycles=16
    # half-sweeps yields identical labels to stopping early.
    oracle="""
        WITH RECURSIVE
        prs AS (
            SELECT DISTINCT a.l_orderkey, a.l_partkey AS pa, b.l_partkey AS pb
            FROM lineitem a JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        edges AS (
            SELECT pa, pb FROM prs GROUP BY pa, pb HAVING COUNT(*) >= 2),
        sym AS (
            SELECT pa AS node, pb AS nbr FROM edges
            UNION
            SELECT pb AS node, pa AS nbr FROM edges),
        nds AS (SELECT DISTINCT node FROM sym),
        adj2 AS (
            SELECT node, nbr, 0 AS is_self FROM sym
            UNION ALL
            SELECT node, node, 1 AS is_self FROM nds),
        lab(h, node, lab) AS (
            SELECT 0, node, CAST(node AS BIGINT) FROM nds
            UNION ALL
            SELECT h, node,
                   CASE WHEN (node % 2) = ((h - 1) % 2) AND bk IS NOT NULL
                        THEN bk + ((-bk + 1099511627775) // 1099511627776)
                                  * 1099511627776
                        ELSE old_lab END AS lab
            FROM (
                SELECT h, node,
                       MAX(CASE WHEN has_self = 1 THEN nlab END) AS old_lab,
                       MIN(CASE WHEN cnt > 0
                                THEN nlab - cnt * 1099511627776 END) AS bk
                FROM (
                    SELECT l.h + 1 AS h, a.node AS node, l.lab AS nlab,
                           COUNT(*) FILTER (WHERE a.is_self = 0) AS cnt,
                           MAX(a.is_self) AS has_self
                    FROM adj2 a JOIN lab l ON a.nbr = l.node
                    GROUP BY 1, 2, 3
                ) GROUP BY h, node
            )
            WHERE h <= 16
        )
        SELECT CAST(lab AS BIGINT) AS community,
               CAST(COUNT(*) AS BIGINT) AS n_nodes,
               CAST(MIN(node) AS BIGINT) AS min_node,
               CAST(MAX(node) AS BIGINT) AS max_node
        FROM lab WHERE h = 16
        GROUP BY lab ORDER BY community
    """,
    tags=("graph", "communities", "lpa"),
)
def lpa_communities_copurchase(spark, sf_dir):
    """Communities of the co-purchase graph by label propagation
    (operators/graph.py lpa_communities — parity-scheduled, min-tie-break,
    budget-capped; deterministic across runs/partitionings/engines),
    aggregated to (community, n_nodes, min_node, max_node). Since r11 the
    oracle is a COMPUTED DuckDB recursive CTE replaying the identical
    parity-scheduled evolution (16 half-sweeps; a stable cycle is a fixed
    point, so the fixed sweep budget reproduces Spark's early-stop
    exactly) — the r10 golden pin retired (VERDICT r10 #2). Semantics
    remain additionally pinned by tests/test_graph_links.py (cliques keep
    their own label, bridges don't merge them,
    partitioning-invariance)."""
    from etl_expenses_spark.operators.graph import lpa_communities

    edges = _copurchase_edges(spark, sf_dir)
    labels = lpa_communities(edges, "pa", "pb", max_cycles=8)
    return (
        labels.groupBy("community")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.min("node").alias("min_node"),
            F.max("node").alias("max_node"),
        )
        .orderBy("community")
    )


# 3-truss support peeling replayed as a recursive CTE (r11, VERDICT r10
# #2): state = the surviving edge set; an edge survives a round iff it
# closes >= 1 triangle within the CURRENT set (k=3 => min_support=1, so
# survival is a pure EXISTS — no counting needed). The k-truss is the
# unique maximal fixpoint (peeling order never changes it) and batch
# peeling is monotone, so the fixed 30-round budget (Spark's max_rounds)
# reproduces Spark's early-stop exactly. A NULL sentinel row rides every
# level so the recursion reaches round 30 even if the truss empties.
_KTRUSS_SQL = """
        e(h, lo, hi) AS (
            SELECT 0, lo, hi FROM canon
            UNION ALL
            SELECT 0, NULL, NULL
            UNION ALL
            SELECT * FROM (
                WITH s AS (
                    SELECT h, lo AS a, hi AS b FROM e WHERE lo IS NOT NULL
                    UNION ALL
                    SELECT h, hi AS a, lo AS b FROM e WHERE lo IS NOT NULL)
                SELECT e1.h + 1 AS h, e1.lo, e1.hi
                FROM e e1
                WHERE e1.lo IS NOT NULL AND EXISTS (
                    SELECT 1 FROM s s2 JOIN s s3 ON s3.b = s2.b
                    WHERE s2.a = e1.lo AND s3.a = e1.hi)
                UNION ALL
                SELECT DISTINCT h + 1, NULL, NULL FROM e
            ) WHERE h <= 30
        )
        SELECT CAST(COUNT(*) FILTER (WHERE lo IS NOT NULL) AS BIGINT)
                   AS n_edges,
               CAST(MIN(lo) AS BIGINT) AS min_node,
               CAST(MAX(hi) AS BIGINT) AS max_node,
               (SELECT CAST(COUNT(DISTINCT n) AS BIGINT) FROM (
                    SELECT lo AS n FROM e WHERE h = 30 AND lo IS NOT NULL
                    UNION ALL
                    SELECT hi FROM e WHERE h = 30 AND lo IS NOT NULL))
                   AS n_nodes
        FROM e WHERE h = 30
"""


@query(
    "ktruss_copurchase",
    oracle="WITH RECURSIVE " + _EDGES_SQL + """
        canon AS (SELECT pa AS lo, pb AS hi FROM edges0),
    """ + _KTRUSS_SQL,
    tags=("graph", "ktruss"),
)
def ktruss_copurchase(spark, sf_dir):
    """3-truss of the co-purchase graph (operators/graph.py ktruss_edges —
    support peeling to fixpoint; every surviving edge sits in ≥ 1
    triangle INSIDE the surviving subgraph — k=3 because the sparser
    sf0.01 co-purchase graph has an EMPTY 4-truss, and an empty driver row
    pins nothing), summarized as one row
    (n_edges, n_nodes, min/max node) so the driver row is stable.
    Edge-level cohesion, stricter than k-core: the truss keeps only
    triangle-reinforced ties, the standard community-core primitive.
    Since r11 the oracle is a COMPUTED DuckDB recursive CTE replaying the
    batch support peeling (the truss is the unique order-independent
    fixpoint; k=3 makes survival a pure EXISTS-triangle test) — golden
    pin retired (VERDICT r10 #2); semantic correctness vs literal
    sequential peeling additionally pinned in tests/test_graph_links.py."""
    from etl_expenses_spark.operators.graph import ktruss_edges

    edges = _copurchase_edges(spark, sf_dir)
    t = ktruss_edges(edges, k=3)
    nodes = t.select(F.col("pa").alias("n")).union(
        t.select(F.col("pb").alias("n"))
    )
    return t.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_edges"),
        F.min("pa").alias("min_node"),
        F.max("pb").alias("max_node"),
    ).crossJoin(
        nodes.agg(F.count_distinct("n").cast("bigint").alias("n_nodes"))
    )


@query(
    "ktruss_copurchase_capped",
    oracle="WITH RECURSIVE " + _EDGES_SQL + _CAPPED_SYM_SQL + """
        canon AS (
            SELECT DISTINCT node AS lo, nbr AS hi FROM sym
            WHERE node < nbr),
    """ + _KTRUSS_SQL,
    tags=("graph", "ktruss", "skew"),
)
def ktruss_copurchase_capped(spark, sf_dir):
    """Degree-capped tier of `ktruss_copurchase` — the shape for hub-heavy
    graphs at 100 TB, where one hot node would otherwise put O(deg²)
    wedges behind every peeling round (SCALING measured the uncapped loop
    at 11.7× on ×10 data, the same class as uncapped k-core). The mutual-
    capped adjacency bounds every wedge fan-out at the cap; k-truss is
    monotone under edge removal, so the capped truss LOWER-BOUNDS the
    exact edge set and equals it when the cap clears the max degree
    (pinned in tests/test_graph_links.py). Since r11 the oracle is the
    same computed peeling recursive CTE as the uncapped query, over the
    DuckDB replica of the mutual-capped adjacency (golden pin retired)."""
    from etl_expenses_spark.operators.graph import ktruss_edges

    edges = _copurchase_edges(spark, sf_dir)
    t = ktruss_edges(edges, k=3, max_degree=_LINKPRED_DEGREE_CAP)
    nodes = t.select(F.col("pa").alias("n")).union(
        t.select(F.col("pb").alias("n"))
    )
    return t.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_edges"),
        F.min("pa").alias("min_node"),
        F.max("pb").alias("max_node"),
    ).crossJoin(
        nodes.agg(F.count_distinct("n").cast("bigint").alias("n_nodes"))
    )


_QSK_K = 64


@query(
    "quantile_sketch_weekly_rollup",
    oracle=f"""
        WITH base AS (
            SELECT CAST(DATE_TRUNC('week', o_orderdate) AS DATE) AS week,
                   CAST(DATE_TRUNC('day', o_orderdate) AS DATE) AS day,
                   substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 16) AS rk,
                   CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                       AS cents
            FROM orders),
        daily AS (
            SELECT week, day, rk, cents,
                   ROW_NUMBER() OVER (PARTITION BY week, day ORDER BY rk)
                       AS rn
            FROM base),
        daily_k AS (SELECT week, day, rk, cents FROM daily
                    WHERE rn <= {_QSK_K}),
        weekly AS (
            SELECT week, rk, cents,
                   ROW_NUMBER() OVER (PARTITION BY week ORDER BY rk) AS rn
            FROM daily_k),
        weekly_k AS (SELECT week, rk, cents FROM weekly
                     WHERE rn <= {_QSK_K}),
        ranked AS (
            SELECT week, cents,
                   ROW_NUMBER() OVER (PARTITION BY week ORDER BY cents, rk)
                       AS vr,
                   COUNT(*) OVER (PARTITION BY week) AS n
            FROM weekly_k)
        SELECT week,
               CAST(MAX(n) AS BIGINT) AS n_in_sketch,
               CAST(MAX(CASE WHEN vr = 1 + (n - 1) // 2 THEN cents END)
                    AS BIGINT) AS p50_cents,
               CAST(MAX(CASE WHEN vr = 1 + (9 * (n - 1)) // 10 THEN cents END)
                    AS BIGINT) AS p90_cents
        FROM ranked GROUP BY week
    """,
    tags=("sketch", "quantile", "rollup"),
)
def quantile_sketch_weekly_rollup(spark, sf_dir):
    """Mergeable QUANTILE sketch rollup — the quantile sibling of
    `theta_weekly_rollup_from_daily` (distinct) and
    `bitmap_weekly_distinct_rollup` (exact distinct), completing the
    re-aggregatable sketch suite: keep one day-grain sketch table and
    answer any coarser grain's percentiles without rescanning raw facts
    (percentile_approx does not re-aggregate from stored state; a sketch
    does).

    The sketch is a bottom-k (KMV-style) value sample keyed by a
    DETERMINISTIC per-row hash rank (md5 of the unique order key): the k
    smallest-ranked rows form a simple random sample that is
    order-insensitive, partition-invariant, and mergeable — bottom-k of a
    union is the bottom-k of the per-part bottom-k's, the same closure
    theta sketches rely on. Quantile estimate = the sample's
    nearest-rank element (index 1 + floor(p·(n−1)); rank error is
    O(n/√k)). Every step is pure integer/string ordering, so the DuckDB
    oracle re-derives the sketch EXACTLY — unlike KLL, whose
    stream-order-dependent compactions cannot be pinned cross-engine.

    100 TB shape: the daily sketch is built in TWO bottom-k levels so no
    aggregation buffer ever materializes a whole day's rows — first per
    (week, day, input-partition) local bottom-k (buffer bounded by one
    partition's slice of one day, i.e. by maxPartitionBytes), then the
    per-day merge of those ≤ k-struct partials (buffer ≤ partitions·k
    structs) — the merge-closure property makes the two-level result
    identical to the one-shot collect_list by construction (ADVICE r9
    corrected the earlier single-level plan, whose reduce-side list buffer
    held the entire day before the slice). The weekly merge then flattens
    ≤ 7k structs per group; nothing global, nothing rescanned. Merge
    associativity, partition invariance, and the sampling-error bound are
    pinned in tests/test_sketches.py."""
    o = T(spark, sf_dir, "orders").select(
        F.date_trunc("week", F.col("o_orderdate")).cast("date").alias("week"),
        F.date_trunc("day", F.col("o_orderdate")).cast("date").alias("day"),
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 16).alias("rk"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    local_k = o.withColumn("pid", F.spark_partition_id()).groupBy(
        "week", "day", "pid"
    ).agg(
        F.slice(
            F.array_sort(F.collect_list(F.struct("rk", "cents"))),
            1,
            _QSK_K,
        ).alias("sk")
    )
    daily = local_k.groupBy("week", "day").agg(
        F.slice(
            F.array_sort(F.flatten(F.collect_list("sk"))), 1, _QSK_K
        ).alias("sk")
    )
    weekly = daily.groupBy("week").agg(
        F.slice(
            F.array_sort(F.flatten(F.collect_list("sk"))), 1, _QSK_K
        ).alias("sk")
    )
    vals = F.array_sort(F.transform("sk", lambda s: s["cents"]))
    n = F.size("sk")
    return weekly.select(
        "week",
        n.cast("bigint").alias("n_in_sketch"),
        F.element_at(vals, (F.lit(1) + F.floor((n - 1) / 2)).cast("int"))
        .cast("bigint")
        .alias("p50_cents"),
        F.element_at(vals, (F.lit(1) + F.floor(9 * (n - 1) / 10)).cast("int"))
        .cast("bigint")
        .alias("p90_cents"),
    )


@query(
    "quantile_sketch_stream_fold",
    oracle=f"""
        WITH ranked AS (
            SELECT substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 16) AS rk,
                   CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                       AS v
            FROM orders),
        topk AS (SELECT rk, v FROM ranked ORDER BY rk LIMIT {_QSK_K}),
        vals AS (
            SELECT v, ROW_NUMBER() OVER (ORDER BY v) AS vr,
                   COUNT(*) OVER () AS n
            FROM topk)
        SELECT CAST(MAX(n) AS BIGINT) AS n_in_sketch,
               CAST(MAX(CASE WHEN vr = 1 + (n - 1) // 2 THEN v END)
                    AS BIGINT) AS q50,
               CAST(MAX(CASE WHEN vr = 1 + (9 * (n - 1)) // 10 THEN v END)
                    AS BIGINT) AS q90
        FROM vals
    """,
    tags=("streaming", "sketch", "quantile"),
)
def quantile_sketch_stream_fold(spark, sf_dir):
    """The bottom-k quantile sketch's STREAMING exactly-once row: orders
    replay through streaming/quantilesketch.py's foreachBatch sink as four
    real micro-batches (file stream, maxFilesPerTrigger=1, availableNow),
    each batch's own bottom-k folded into the k-row epoch-ledgered state,
    then the quantiles read off the committed state. Because the bottom-k
    sample is EXACTLY mergeable, the folded state is byte-identical to the
    one-shot batch sketch no matter how the rows were micro-batched — so
    unlike the MG stream fold (golden until recount) this streaming
    operator pins against a fully DECLARATIVE oracle: DuckDB's bottom-k
    over all orders. Wrong epoch handling (skipped or double-merged
    batches) breaks the hash-rank sample exactly.

    Scale shape: per batch one distributed TakeOrdered + a k-row union;
    state is k rows forever; commit protocol identical to the audited MG
    sink (epoch-versioned state, atomic meta swap, replay skip, reset
    fail-fast)."""
    import os

    from etl_expenses_spark.streaming.quantilesketch import (
        bottomk_state_sink,
        quantiles_from_state,
    )

    o = T(spark, sf_dir, "orders").select(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 16).alias("rk"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("v"),
    )
    work = work_dir("qsk_stream_fold", sf_dir)
    bronze = os.path.join(work, "bronze")
    o.repartition(4).write.parquet(bronze)  # 4 files -> 4 micro-batches
    stream = (
        spark.readStream.schema("rk string, v long")
        .option("maxFilesPerTrigger", 1)
        .parquet(bronze)
    )
    bottomk_state_sink(
        stream, os.path.join(work, "state"), os.path.join(work, "ckpt"),
        k=_QSK_K,
    ).awaitTermination()
    return quantiles_from_state(
        spark, os.path.join(work, "state"), ps=(0.5, 0.9)
    )


@query(
    "link_prediction_adamic_adar",
    oracle="""
        WITH pairs AS (
            SELECT DISTINCT a.l_orderkey, a.l_partkey AS pa, b.l_partkey AS pb
            FROM lineitem a JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        edges AS (
            SELECT pa, pb FROM pairs GROUP BY pa, pb HAVING COUNT(*) >= 2),
        adj AS (
            SELECT pa AS node, pb AS nbr FROM edges
            UNION ALL
            SELECT pb AS node, pa AS nbr FROM edges),
        deg AS (SELECT node, COUNT(*) AS d FROM adj GROUP BY node),
        wedge AS (
            SELECT a.node AS w, a.nbr AS u, b.nbr AS v
            FROM adj a JOIN adj b ON a.node = b.node AND a.nbr < b.nbr),
        terms AS (
            SELECT wedge.u, wedge.v,
                   CAST(1.0 / LN(CAST(deg.d AS DOUBLE)) AS DECIMAL(18,9)) AS t
            FROM wedge JOIN deg ON deg.node = wedge.w),
        agg AS (
            SELECT u, v, COUNT(*) AS ic, SUM(t) AS s
            FROM terms GROUP BY u, v),
        cand AS (
            SELECT u, v, ic, s FROM agg
            WHERE NOT EXISTS (SELECT 1 FROM edges e
                              WHERE e.pa = agg.u AND e.pb = agg.v))
        SELECT u AS pa, v AS pb,
               CAST(ic AS BIGINT) AS n_common_neighbors,
               CAST(s AS DOUBLE) AS aa_score
        FROM cand
        WHERE ic >= 2
    """,
    tags=("graph", "link_prediction", "join"),
)
def link_prediction_adamic_adar(spark, sf_dir):
    """Adamic-Adar link prediction over the co-purchase graph — the
    hub-discounting sibling of link_prediction_jaccard: non-edge pairs
    scored Σ 1/ln(deg(w)) over their >= 2 common neighbors, so a shared
    rare part certifies similarity much harder than a shared bestseller.
    Cross-engine determinism comes from quantizing each wedge term to
    DECIMAL(18,9) before the sum (the dsum convention on a derived
    weight); both engines then sum identical decimals exactly and the
    score is one final cast. Same wedge-bound plan silhouette as the
    Jaccard scorer (operators/graph.py adamic_adar_link_prediction) —
    the structural delta is the wedge keeping its CENTER node, which is
    what carries the 1/ln(degree) weight."""
    from etl_expenses_spark.operators.graph import adamic_adar_link_prediction

    edges = _copurchase_edges(spark, sf_dir)
    return adamic_adar_link_prediction(edges, max_degree=None, min_common=2)


@query(
    "harmonic_centrality_3hop",
    oracle="""
        WITH pairs AS (
            SELECT DISTINCT a.l_orderkey, a.l_partkey AS pa, b.l_partkey AS pb
            FROM lineitem a JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        edges AS (
            SELECT pa, pb FROM pairs GROUP BY pa, pb HAVING COUNT(*) >= 2),
        d1 AS (
            SELECT pa AS u, pb AS v FROM edges
            UNION SELECT pb, pa FROM edges),
        d2 AS (
            SELECT DISTINCT a.u, b.v
            FROM d1 a JOIN d1 b ON a.v = b.u
            WHERE a.u <> b.v
              AND NOT EXISTS (SELECT 1 FROM d1
                              WHERE d1.u = a.u AND d1.v = b.v)),
        d3 AS (
            SELECT DISTINCT a.u, b.v
            FROM d2 a JOIN d1 b ON a.v = b.u
            WHERE a.u <> b.v
              AND NOT EXISTS (SELECT 1 FROM d1
                              WHERE d1.u = a.u AND d1.v = b.v)
              AND NOT EXISTS (SELECT 1 FROM d2
                              WHERE d2.u = a.u AND d2.v = b.v)),
        h AS (
            SELECT u,
                   SUM(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS n1,
                   SUM(CASE WHEN d = 2 THEN 1 ELSE 0 END) AS n2,
                   SUM(CASE WHEN d = 3 THEN 1 ELSE 0 END) AS n3
            FROM (SELECT u, 1 AS d FROM d1
                  UNION ALL SELECT u, 2 FROM d2
                  UNION ALL SELECT u, 3 FROM d3)
            GROUP BY u)
        SELECT u AS node,
               CAST(n1 AS BIGINT) AS n_dist1,
               CAST(n2 AS BIGINT) AS n_dist2,
               CAST(n3 AS BIGINT) AS n_dist3,
               CAST(CAST(n1 AS DECIMAL(18,6))
                    + CAST(n2 AS DECIMAL(18,6)) * 0.5
                    + CAST(n3 AS DECIMAL(18,6)) * CAST(0.333333 AS DECIMAL(8,6))
                    AS DOUBLE) AS harmonic
        FROM h
    """,
    tags=("graph", "centrality", "bfs"),
)
def harmonic_centrality_3hop(spark, sf_dir):
    """Bounded-hop HARMONIC CENTRALITY over the co-purchase graph:
    Σ_{v ≠ u, d(u,v) ≤ 3} 1/d(u,v) (Boldi & Vigna's centrality, truncated
    at radius 3 — the form production graph stacks actually compute, full
    closeness being O(n·m)). The per-hop frontier sets come from iterated
    min-plus expansion: dist-2 = neighbors-of-neighbors minus dist-1 minus
    self; dist-3 = one more expansion minus everything closer — each hop
    ONE join + one distinct + anti-joins against the closer tiers, the
    standard BSP BFS round written declaratively, which is what keeps this
    iterative-family query fully ORACLE-CHECKABLE (the closure is bounded,
    so DuckDB expresses the identical three tiers without recursion
    tricks). The 1/d weights are decimal literals (1, 0.5, 0.333333) so
    the sum is exact in both engines — the dsum convention.

    Scale shape: frontier relations shuffle on their endpoints exactly
    like one CC/PageRank round; the >= 2 common-orders sparsifier bounds
    degree fan-out; distinct dedups each tier before it feeds the next
    (the frontier never re-expands known-closer pairs). Radius bounds the
    round count at 3 by construction — no convergence loop, no
    checkpointing machinery needed."""
    edges = _copurchase_edges(spark, sf_dir)
    d1 = (
        edges.select(F.col("pa").alias("u"), F.col("pb").alias("v"))
        .unionAll(edges.select(F.col("pb").alias("u"), F.col("pa").alias("v")))
        .distinct()
    )
    from etl_expenses_spark.caching import tracked_persist

    d1 = tracked_persist(d1)
    a, b = d1.alias("a"), d1.alias("b")
    expand2 = (
        a.join(b, F.col("a.v") == F.col("b.u"))
        .filter(F.col("a.u") != F.col("b.v"))
        .select(F.col("a.u").alias("u"), F.col("b.v").alias("v"))
        .distinct()
    )
    d2 = tracked_persist(expand2.join(d1, ["u", "v"], "left_anti"))
    c = d2.alias("c")
    expand3 = (
        c.join(b, F.col("c.v") == F.col("b.u"))
        .filter(F.col("c.u") != F.col("b.v"))
        .select(F.col("c.u").alias("u"), F.col("b.v").alias("v"))
        .distinct()
    )
    d3 = expand3.join(d1, ["u", "v"], "left_anti").join(
        d2, ["u", "v"], "left_anti"
    )
    tiers = (
        d1.select("u", F.lit(1).alias("d"))
        .unionAll(d2.select("u", F.lit(2).alias("d")))
        .unionAll(d3.select("u", F.lit(3).alias("d")))
    )
    h = tiers.groupBy("u").agg(
        F.sum(F.when(F.col("d") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("d") == 2, 1).otherwise(0)).alias("n2"),
        F.sum(F.when(F.col("d") == 3, 1).otherwise(0)).alias("n3"),
    )
    harmonic = (
        F.col("n1").cast("decimal(18,6)")
        + F.col("n2").cast("decimal(18,6)") * F.lit(0.5).cast("decimal(8,6)")
        + F.col("n3").cast("decimal(18,6)")
        * F.lit(0.333333).cast("decimal(8,6)")
    ).cast("double")
    return h.select(
        F.col("u").alias("node"),
        F.col("n1").cast("bigint").alias("n_dist1"),
        F.col("n2").cast("bigint").alias("n_dist2"),
        F.col("n3").cast("bigint").alias("n_dist3"),
        harmonic.alias("harmonic"),
    )
