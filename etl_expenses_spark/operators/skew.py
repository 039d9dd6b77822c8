"""Skew mitigation: salted joins for hot keys.

A shuffle join hashes rows to reducers by key; one hot key (the celebrity
user, the null-bucket, the default category) puts its entire row set on ONE
task and the stage runs at the speed of that straggler. AQE's skew-join
splitting (`spark.sql.adaptive.skewJoin`, on in session.py) handles this at
runtime for sort-merge joins; salting is the *plan-level* fix you reach for
when AQE can't see the skew (pre-aggregated inputs, non-SMJ plans,
deliberate partitioning) — and the pattern the reference's scale-up would
need first, since expense categories are classically Zipf-distributed.

Mechanics: the skewed (fact) side gets a uniform random salt in [0, B);
the other (dim) side is replicated B× with every salt value; the join key
becomes (key, salt), so the hot key's rows spread over B reducers. Results
are exactly the rows of the unsalted join — salting changes placement, not
semantics. Cost: B× replication of the dim side — use it for hot keys only
(``skew_keys``) so the replicated slice stays tiny.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    buckets: int = 16,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join ``fact ⋈ dim`` on ``key`` with the fact side salted into
    ``buckets`` sub-keys. Every output row equals the unsalted join's; only
    shuffle placement changes. ``rand(seed)`` is evaluated per-row at scan
    time — retries of a failed task re-draw salts, which is safe because
    salt never reaches the output.

    Only ``inner`` and ``left`` (fact-preserving) joins are supported: the
    dim side is replicated ``buckets``×, so right/full/anti flavors would
    see unmatched dim rows B times and duplicate or misclassify them."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how in ('inner','left'); got {how!r} — "
            "the B×-replicated dim side breaks right/full/anti semantics"
        )
    salted_fact = fact.withColumn("__salt", (F.rand(seed) * buckets).cast("int"))
    salts = F.explode(F.sequence(F.lit(0), F.lit(buckets - 1))).alias("__salt")
    replicated_dim = dim.select("*", salts)
    out = salted_fact.join(replicated_dim, [key, "__salt"], how)
    return out.drop("__salt")


def detect_hot_keys(
    df: DataFrame,
    key: str,
    min_share: float = 0.01,
    sample_fraction: float | None = None,
    seed: int = 42,
) -> list:
    """Keys carrying at least ``min_share`` of the rows — the input
    ``salted_join_hot_keys`` wants when skew isn't known a priori.

    With ``sample_fraction`` the frequencies come from a Bernoulli sample:
    at 100 TB a 0.1% sample bounds the detection scan to ~100 GB, and any
    key hot enough to matter (≥1% of rows) appears tens of thousands of
    times in the sample, so the share estimate's relative error is
    negligible exactly for the keys that qualify. Rare keys are estimated
    badly — and irrelevant, since they can't clear ``min_share``.

    Returns a driver-side list (bounded: at most 1/min_share keys can
    exceed a min_share fraction each)."""
    src = df.sample(fraction=sample_fraction, seed=seed) if sample_fraction else df
    counts = src.groupBy(key).agg(F.count(F.lit(1)).alias("__n"))
    total = src.count()
    if total == 0:
        return []
    hot = counts.filter(F.col("__n") >= total * min_share)
    return [r[0] for r in hot.select(key).collect()]


def salted_join_hot_keys(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    skew_keys: list,
    buckets: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Hybrid plan: salt ONLY the known-hot keys, join the long tail
    normally, union the results. The dim replication cost drops from
    B×|dim| to B×|hot slice|. ``skew_keys`` typically comes from a cheap
    approx-frequency pass (or is known a priori: NULL bucket, default
    category)."""
    hot = F.col(key).isin(skew_keys)
    salted = salted_join(fact.filter(hot), dim.filter(hot), key, buckets, "inner", seed)
    normal = fact.filter(~hot).join(dim.filter(~hot), key, "inner")
    return salted.unionByName(normal)
