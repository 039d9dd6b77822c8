"""Privacy / governance queries for training-data release: k-anonymity
auditing and stable pseudonymization.

A corpus shipped to a training run carries re-identification risk through
quasi-identifier combinations, and joinable datasets need identity keys
that are stable but meaningless. Both ops are single-scan aggregates /
projections — governance at 100 TB must not cost more than the scan.
PII *redaction* inside text lives in plans/text_ops.py (text_redact_pii);
these operate on the structured side.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_expenses_spark.plans._util import T
from etl_expenses_spark.plans.registry import query


@query(
    "k_anonymity_report",
    oracle="""
        SELECT c_nationkey,
               c_mktsegment,
               COUNT(*) AS group_size,
               COUNT(DISTINCT CASE WHEN c_acctbal < 0 THEN 'neg'
                                   WHEN c_acctbal < 5000 THEN 'low'
                                   ELSE 'high' END) AS l_diversity,
               COUNT(*) < 5 AS below_k
        FROM customer
        GROUP BY 1, 2
    """,
    tags=("privacy", "k_anonymity", "agg"),
)
def k_anonymity_report(spark, sf_dir):
    """k-anonymity audit: quasi-identifier tuple = (nation, segment),
    sensitive attribute = account-balance band. Every QI equivalence class
    reports its size (k-anonymity), the number of distinct sensitive
    values it exposes (l-diversity — a class where everyone shares one
    band leaks the band even at large k), and a below-k flag (k=5) — the
    release gate a privacy review runs before shipping joinable structured
    data. One grouped aggregate, |QI-combinations| output rows;
    suppression or generalization then targets exactly the flagged
    classes."""
    c = T(spark, sf_dir, "customer")
    band = (
        F.when(F.col("c_acctbal") < 0, "neg")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
    )
    return (
        c.groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("group_size"),
            F.count_distinct(band).alias("l_diversity"),
            (F.count(F.lit(1)) < 5).alias("below_k"),
        )
    )


@query(
    "pseudonymize_stable_ids",
    oracle="""
        SELECT c_custkey,
               md5('cust|' || CAST(c_custkey AS VARCHAR)) AS pseudonym,
               c_mktsegment
        FROM customer
        WHERE c_custkey <= 100
    """,
    tags=("privacy", "pseudonymization", "projection"),
)
def pseudonymize_stable_ids(spark, sf_dir):
    """Stable pseudonymization: the identity column is replaced by a salted
    md5 surrogate — deterministic (joins across releases still line up),
    irreversible without the salt, computed scan-side with zero shuffles.
    The direct identifiers (name, address) are simply not projected: column
    pruning IS the suppression mechanism. In production the salt comes
    from a secret store; it is a literal here so the oracle can verify the
    mapping bit-exactly."""
    c = T(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 100)
    return c.select(
        "c_custkey",
        F.md5(F.concat(F.lit("cust|"), F.col("c_custkey").cast("string"))).alias(
            "pseudonym"
        ),
        "c_mktsegment",
    )
