"""Incremental view maintenance queries (operators/ivm.py).

The fact-side queries synthesize a deterministic CDC day from the orders
table —
o_orderkey % 10 routes each row: 0 → arrives as an INSERT (excluded from
the stored base), 1 → receives an UPDATE (+25.00 on the total), 2 → is
DELETEd — so the DuckDB oracle can reconstruct the FINAL table state
declaratively and aggregate it, while the Spark side must reach the same
numbers by FOLDING THE DELTAS into the stored view without ever rescanning
the base facts. A green row therefore pins the maintenance algebra itself
(signed counts, delete+insert updates, tombstone elimination), not just
the aggregate arithmetic.

Money stays in DECIMAL(18,2) end to end (exact, associative, engine-
portable) and surfaces as double only in the final projection — the
registry's determinism rule #1.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_expenses_spark.plans._util import T, dec, work_dir
from etl_expenses_spark.plans.registry import query

# CDC routing predicates, shared by both engines
_INS = "o_orderkey % 10 = 0"
_UPD = "o_orderkey % 10 = 1"
_DEL = "o_orderkey % 10 = 2"


def _base_and_cdc(spark, sf_dir):
    """(stored base, CDC feed) split of orders. The base is yesterday's
    table (inserts haven't arrived); the CDC feed carries I/U/D rows with
    before/after images, Debezium-style."""
    o = T(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        dec("o_totalprice").alias("amt"),
    )
    base = o.filter(f"NOT ({_INS})")
    ins = o.filter(_INS).select(
        F.lit("I").alias("op"),
        F.lit(None).cast("long").alias("key_old"),
        F.lit(None).cast("decimal(18,2)").alias("amt_old"),
        F.col("o_custkey").alias("key_new"),
        F.col("amt").alias("amt_new"),
    )
    upd = o.filter(_UPD).select(
        F.lit("U").alias("op"),
        F.col("o_custkey").alias("key_old"),
        F.col("amt").alias("amt_old"),
        F.col("o_custkey").alias("key_new"),
        # re-cast: decimal(18,2)+decimal(18,2) promotes to (19,2), which
        # parquet stores as FLBA and would break the stream twin's
        # fixed (18,2) read schema; the +25 never overflows 18 digits
        (F.col("amt") + F.lit(25).cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .alias("amt_new"),
    )
    dele = o.filter(_DEL).select(
        F.lit("D").alias("op"),
        F.col("o_custkey").alias("key_old"),
        F.col("amt").alias("amt_old"),
        F.lit(None).cast("long").alias("key_new"),
        F.lit(None).cast("decimal(18,2)").alias("amt_new"),
    )
    return base, ins.unionByName(upd).unionByName(dele)


@query(
    "ivm_group_totals_cdc",
    oracle=f"""
        WITH final AS (
            SELECT o_custkey % 97 AS seg,
                   CAST(o_totalprice AS DECIMAL(18,2))
                   + CASE WHEN {_UPD} THEN CAST(25 AS DECIMAL(18,2))
                          ELSE CAST(0 AS DECIMAL(18,2)) END AS amt
            FROM orders
            WHERE NOT ({_DEL}))
        SELECT seg, CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(amt) AS DOUBLE) AS total_spend
        FROM final GROUP BY seg
    """,
    tags=("ivm", "cdc", "agg", "merge"),
)
def ivm_group_totals_cdc(spark, sf_dir):
    """Maintain a per-segment COUNT/SUM view under one CDC day — the
    z-set fold (operators/ivm.py): insert → +1/+amt, delete → −1/−amt,
    update → delete+insert — against the stored view, NEVER rescanning the
    base facts. The oracle recomputes from the reconstructed final table,
    so agreement pins the maintenance algebra (signed counts, two-row
    updates, count-0 tombstone elimination).

    100 TB shape: the maintenance cost is O(|Δ|) — the delta feed
    pre-aggregates map-side to one row per touched segment, and the
    union-agg against the stored view touches only those keys. Recompute
    would rescan the full fact table for a day of changes; this never
    does."""
    from etl_expenses_spark.operators.ivm import (
        maintain_grouped_totals,
        zset_from_cdc,
    )

    base, cdc = _base_and_cdc(spark, sf_dir)
    stored_view = (
        base.groupBy((F.col("o_custkey") % 97).alias("seg"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("amt").alias("total"))
    )
    deltas = zset_from_cdc(
        cdc.select("op", (F.col("key_old") % 97).alias("key_old"),
                   "amt_old", (F.col("key_new") % 97).alias("key_new"),
                   "amt_new"),
        "key_old", "amt_old", "key_new", "amt_new",
    )
    return maintain_grouped_totals(stored_view, deltas, key="seg").select(
        "seg",
        F.col("n").cast("bigint").alias("n_orders"),
        F.col("total").cast("double").alias("total_spend"),
    )


@query(
    "ivm_join_view_cdc",
    oracle=f"""
        WITH final AS (
            SELECT o_custkey,
                   CAST(o_totalprice AS DECIMAL(18,2))
                   + CASE WHEN {_UPD} THEN CAST(25 AS DECIMAL(18,2))
                          ELSE CAST(0 AS DECIMAL(18,2)) END AS amt
            FROM orders
            WHERE NOT ({_DEL}))
        SELECT CAST(c.c_nationkey AS BIGINT) AS nationkey,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(f.amt) AS DOUBLE) AS revenue
        FROM final f JOIN customer c ON f.o_custkey = c.c_custkey
        GROUP BY 1
    """,
    tags=("ivm", "cdc", "join", "agg"),
)
def ivm_join_view_cdc(spark, sf_dir):
    """Maintain a JOIN view (revenue per customer nation) under a CDC day
    on the FACT side: Δ(O ⋈ C) = ΔO ⋈ C when only O changes (the bilinear
    delta-join rule, operators/ivm.py module doc) — so the maintenance
    plan joins the DELTA feed against the dimension and folds signed
    partials into the stored view; the base fact table is never rejoined
    or rescanned. The oracle recomputes the view from the reconstructed
    final join, pinning both the delta-join rewrite and the fold.

    100 TB shape: |ΔO| ⋈ C is a broadcast/bucket join on a day's deltas
    instead of the full fact history; the fold touches only the ≤25
    nation rows the deltas hit. A dimension-side delta would add the
    symmetric A ⋈ ΔB and ΔA ⋈ ΔB terms — same algebra, same plan shape."""
    from etl_expenses_spark.operators.ivm import (
        maintain_grouped_totals,
        zset_from_cdc,
    )

    base, cdc = _base_and_cdc(spark, sf_dir)
    cust = T(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_nationkey").cast("bigint").alias("nationkey")
    )
    stored_view = (
        base.join(cust, base.o_custkey == cust.c_custkey)
        .groupBy("nationkey")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("amt").alias("total"))
    )
    # Δ(O ⋈ C) = ΔO ⋈ C — rekey the signed deltas through the dimension
    deltas = zset_from_cdc(
        cdc, "key_old", "amt_old", "key_new", "amt_new"
    ).join(cust, F.col("key") == cust.c_custkey).select(
        cust.nationkey.alias("key"), "dn", "damt"
    )
    return maintain_grouped_totals(stored_view, deltas, key="nationkey").select(
        "nationkey",
        F.col("n").cast("bigint").alias("n_orders"),
        F.col("total").cast("double").alias("revenue"),
    )


@query(
    "ivm_stream_fold",
    oracle=f"""
        WITH final AS (
            SELECT o_custkey % 97 AS seg,
                   CAST(o_totalprice AS DECIMAL(18,2))
                   + CASE WHEN {_UPD} THEN CAST(25 AS DECIMAL(18,2))
                          ELSE CAST(0 AS DECIMAL(18,2)) END AS amt
            FROM orders
            WHERE NOT ({_DEL}))
        SELECT seg, CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(amt) AS DOUBLE) AS total_spend
        FROM final GROUP BY seg
    """,
    tags=("ivm", "cdc", "streaming", "agg"),
)
def ivm_stream_fold(spark, sf_dir):
    """The streaming IVM machinery's driver-checked row: the CDC day is
    replayed through streaming/ivm_sink.py as four REAL micro-batches
    (file stream, maxFilesPerTrigger=1, availableNow) folding into the
    stored per-segment view under the epoch-ledger commit protocol, and
    the final view must equal the oracle's declarative recompute — AND, by
    construction, `ivm_group_totals_cdc`'s one-shot fold (micro-batching
    must not change a maintained view: the z-set fold is associative,
    pinned in tests/test_ivm.py). Wrong offsets, double-folded replays, or
    a non-atomic commit all break the exact counts/sums.

    Scale shape: per epoch one map-side-combined O(|Δ|) aggregate + a
    bounded-group view rewrite; the base facts are scanned exactly once,
    at seed time."""
    import os

    from etl_expenses_spark.streaming.ivm_sink import (
        init_view_state,
        ivm_state_sink,
        read_view,
    )

    base, cdc = _base_and_cdc(spark, sf_dir)
    work = work_dir("ivm_stream_fold", sf_dir)
    feed = os.path.join(work, "cdc")
    cdc_seg = cdc.select(
        "op",
        (F.col("key_old") % 97).alias("key_old"),
        "amt_old",
        (F.col("key_new") % 97).alias("key_new"),
        "amt_new",
    )
    cdc_seg.repartition(4).write.parquet(feed)  # 4 files -> 4 micro-batches
    init_view_state(
        base.groupBy((F.col("o_custkey") % 97).alias("seg")).agg(
            F.count(F.lit(1)).alias("n"), F.sum("amt").alias("total")
        ),
        os.path.join(work, "state"),
    )
    stream = (
        spark.readStream.schema(
            "op string, key_old bigint, amt_old decimal(18,2), "
            "key_new bigint, amt_new decimal(18,2)"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    ivm_state_sink(
        stream, os.path.join(work, "state"), os.path.join(work, "ckpt"),
        key="seg",
    ).awaitTermination()
    return read_view(spark, os.path.join(work, "state")).select(
        "seg",
        F.col("n").cast("bigint").alias("n_orders"),
        F.col("total").cast("double").alias("total_spend"),
    )


@query(
    "ivm_dim_change_two_level",
    oracle="""
        WITH moved AS (
            SELECT c_custkey,
                   CASE WHEN c_custkey % 11 = 3
                        THEN (c_nationkey + 1) % 25
                        ELSE c_nationkey END AS nationkey
            FROM customer)
        SELECT CAST(m.nationkey AS BIGINT) AS nationkey,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS revenue
        FROM orders o JOIN moved m ON o.o_custkey = m.c_custkey
        GROUP BY 1
    """,
    tags=("ivm", "cdc", "join", "agg", "dimension"),
)
def ivm_dim_change_two_level(spark, sf_dir):
    """DIMENSION-side view maintenance via a stored auxiliary view — the
    higher-order IVM pattern (DBToaster-style): a customer changing nation
    re-attributes ALL their orders, so naive Δ(O ⋈ C) = O ⋈ ΔC would
    rescan the full fact table for a handful of dimension rows. Instead
    the pipeline stores per-customer partials P = γ_custkey(O) alongside
    the nation view V = γ_nation(P ⋈ C); a dimension delta then folds as

        V += Σ P[moved custkey] × (−old nation, +new nation)

    touching only the MOVED keys' partial rows — the fact table is never
    read during maintenance (here it's scanned once to build P, the
    pipeline's stored state). The oracle recomputes the final view from
    the reconstructed dimension, pinning the two-level fold end to end.

    Scale shape: |Δ| dimension rows → semi-join against keyed partials →
    2|Δ| signed partial rows → fold into ≤50 touched view rows. Cost is
    O(|Δ|), independent of |orders|."""
    from etl_expenses_spark.operators.ivm import maintain_grouped_totals

    o = T(spark, sf_dir, "orders").select(
        "o_custkey", dec("o_totalprice").alias("amt")
    )
    cust = T(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_nationkey").cast("bigint").alias("nationkey")
    )
    # stored state: per-customer partials + the current nation view
    partials = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("pn"), F.sum("amt").alias("ptotal")
    )
    stored_view = (
        partials.join(cust, partials.o_custkey == cust.c_custkey)
        .groupBy("nationkey")
        .agg(F.sum("pn").alias("n"), F.sum("ptotal").alias("total"))
    )
    # dimension delta: the moved customers, with old and new nation
    moved = cust.filter(F.col("c_custkey") % 11 == 3).select(
        "c_custkey",
        F.col("nationkey").alias("old_nation"),
        ((F.col("nationkey") + 1) % 25).alias("new_nation"),
    )
    # fold: each moved customer's partial leaves its old nation and joins
    # its new one — 2|Δ| signed rows, never a fact-table scan
    moved_partials = partials.join(
        moved, partials.o_custkey == moved.c_custkey
    )
    deltas = moved_partials.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("old_nation").alias("key"),
                    (-F.col("pn")).alias("dn"),
                    (-F.col("ptotal")).alias("damt"),
                ),
                F.struct(
                    F.col("new_nation").alias("key"),
                    F.col("pn").alias("dn"),
                    F.col("ptotal").alias("damt"),
                ),
            )
        ).alias("d")
    ).select("d.key", "d.dn", "d.damt")
    return maintain_grouped_totals(stored_view, deltas, key="nationkey").select(
        "nationkey",
        F.col("n").cast("bigint").alias("n_orders"),
        F.col("total").cast("double").alias("revenue"),
    )


@query(
    "ivm_lsh_index_cdc",
    # Planted-pair RECALL-PROOF oracle (r12 — replaces the golden
    # literal, the dedup_minhash_lsh shape applied to the CDC pipeline):
    # every CDC transform is string arithmetic BOTH engines replay
    # exactly (delete = filter, update = text || ' rev2 marker', insert
    # twin = text || ' near duplicate copy'), so the oracle rebuilds the
    # post-CDC corpus in SQL, brute-forces the exact string-shingle
    # Jaccard of each planted (source, source+10M) pair over it, and
    # keeps those ≥ 0.5. The output is restricted to planted-pair rows of
    # ≥80-token sources (J = ns/(ns+≈5-9) ≥ 0.89, where the 16-perm/4-band
    # catch probability leaves <0.01 expected misses; shorter docs sit in
    # the J≈0.6 band where the tier's recall is honestly partial — their
    # discovery stays covered by the maintain==recompute pytest
    # invariant, not the driver gate). A green row proves the MAINTAINED
    # index + delta probe found every such pair — including the doubly-
    # touched docs whose UPDATED text must pair with their insert twin,
    # which exercises the update path of the maintenance fold end-to-end.
    oracle=r"""
        WITH survivors AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 37 = 0
                        THEN text || ' rev2 marker' ELSE text END AS text
            FROM documents WHERE doc_id % 41 <> 0),
        planted AS (
            SELECT s.doc_id AS src_id, s.doc_id + 10000000 AS tid,
                   s.text AS stext, d.text || ' near duplicate copy' AS ttext
            FROM survivors s JOIN documents d ON d.doc_id = s.doc_id
            WHERE s.doc_id % 43 = 0
              AND len(list_filter(regexp_split_to_array(trim(d.text), '\s+'),
                                  x -> x <> '')) >= 80),
        sh AS (
            SELECT src_id, tid,
                   (WITH t AS (SELECT list_filter(
                                   regexp_split_to_array(trim(stext), '\s+'),
                                   x -> x <> '') AS tk)
                    SELECT CASE WHEN len(tk) >= 3
                                THEN list_transform(range(1, len(tk) - 1),
                                     i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
                                ELSE [array_to_string(tk, ' ')] END FROM t) AS ssh,
                   (WITH t AS (SELECT list_filter(
                                   regexp_split_to_array(trim(ttext), '\s+'),
                                   x -> x <> '') AS tk)
                    SELECT CASE WHEN len(tk) >= 3
                                THEN list_transform(range(1, len(tk) - 1),
                                     i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
                                ELSE [array_to_string(tk, ' ')] END FROM t) AS tsh
            FROM planted),
        ds AS (SELECT src_id, tid, list_distinct(ssh) AS sa,
                      list_distinct(tsh) AS sb FROM sh)
        SELECT src_id AS id_a, tid AS id_b,
               CAST(CAST(
                   CAST(len(list_intersect(sa, sb)) AS DOUBLE)
                   / GREATEST(CAST(len(sa) + len(sb)
                                   - len(list_intersect(sa, sb)) AS DOUBLE),
                              1.0)
                   AS DECIMAL(18,6)) AS DOUBLE) AS jaccard
        FROM ds
        WHERE CAST(len(list_intersect(sa, sb)) AS DOUBLE)
              / GREATEST(CAST(len(sa) + len(sb)
                              - len(list_intersect(sa, sb)) AS DOUBLE), 1.0)
              >= 0.5
        ORDER BY id_a, id_b
    """,
    tags=("ivm", "cdc", "dedup", "lsh", "recall"),
)
def ivm_lsh_index_cdc(spark, sf_dir):
    """Maintain the MINHASH-LSH NEAR-DUP INDEX under a CDC batch and probe
    only the delta for new pairs — the composition of the IVM discipline
    with similarity dedup: when 0.1% of a 100 TB corpus changes you
    re-signature |Δ| documents and banded-probe them against the
    maintained index; the corpus is never re-tokenized and untouched pairs
    never re-form (operators/dedup.py: maintain_lsh_index +
    lsh_delta_pairs).

    Deterministic CDC day over documents: doc_id % 41 = 0 → DELETE;
    % 37 = 0 (surviving) → UPDATE (text gains a revision marker);
    % 43 = 0 (surviving) → a NEAR-COPY INSERT under doc_id + 10 000 000 —
    planted near-duplicates the delta probe must find. Output (r12): the
    delta-discovered verified planted pairs over ≥80-token sources, which
    the oracle brute-forces from the SQL-replayed post-CDC corpus — see
    the oracle comment for the recall-proof structure; the
    maintained-index == full-recompute and delta-pairs ==
    restricted-full-pairs invariants (covering ALL pairs, not just the
    planted band) are pinned in tests/test_ivm.py."""
    from etl_expenses_spark.operators.dedup import (
        lsh_delta_pairs,
        maintain_lsh_index,
        minhash_band_signatures,
    )

    docs = T(spark, sf_dir, "documents").select("doc_id", "text")
    dels = docs.filter(F.col("doc_id") % 41 == 0).select(
        F.lit("D").alias("op"), "doc_id", F.lit(None).cast("string").alias("text")
    )
    upds = docs.filter(
        (F.col("doc_id") % 37 == 0) & (F.col("doc_id") % 41 != 0)
    ).select(
        F.lit("U").alias("op"),
        "doc_id",
        F.concat("text", F.lit(" rev2 marker")).alias("text"),
    )
    ins = docs.filter(
        (F.col("doc_id") % 43 == 0) & (F.col("doc_id") % 41 != 0)
    ).select(
        F.lit("I").alias("op"),
        (F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"),
        F.concat("text", F.lit(" near duplicate copy")).alias("text"),
    )
    cdc = dels.unionByName(upds).unionByName(ins)
    # the stored view (in production: read back from the index table)
    index = minhash_band_signatures(docs)
    # persisted: the delta probe reads the maintained index four ways
    # (delta filter, banded explode, and both verify sides) — unpersisted,
    # the corpus re-signatures each time (measured 19 s -> ~6 s at sf0.1)
    from etl_expenses_spark.caching import tracked_persist

    new_index = tracked_persist(maintain_lsh_index(index, cdc))
    delta_ids = cdc.filter(F.col("op").isin("I", "U")).select("doc_id")
    # planted-pair restriction (r12, see oracle comment): sources ≥80
    # tokens whose (source, source+10M) twin pair the tier must find
    from etl_expenses_spark.functions.text import tokens

    long_srcs = docs.filter(F.size(tokens("text")) >= 80).select(
        F.col("doc_id").alias("src_id")
    )
    return (
        lsh_delta_pairs(new_index, delta_ids, min_jaccard=0.5)
        .filter(F.col("id_b") == F.col("id_a") + 10_000_000)
        .join(long_srcs, F.col("id_a") == F.col("src_id"), "left_semi")
        .select(
            "id_a",
            "id_b",
            F.col("jaccard").cast("decimal(18,6)").cast("double").alias(
                "jaccard"
            ),
        )
        .orderBy("id_a", "id_b")
    )
