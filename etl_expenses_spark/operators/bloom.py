"""Bloom-filter semi-join reduction built from relational primitives.

Spark's runtime bloom-filter join (`spark.sql.optimizer.runtime.bloomFilter`)
injects exactly this shape automatically when statistics justify it, but the
`bloom_filter_agg` / `might_contain` expressions are not registered in the
public function registry (Spark 4.1 still keeps them internal), so this
module builds the same structure out of primitives Catalyst can see through:

- BUILD: each build-side key k sets K = ``n_hashes`` bits of an m-bit array,
  bit index h_i(k) = (xxhash64(k, seed_i) mod m).  The bit array is stored
  RELATIONALLY as (word_idx, bits) rows — m/64 longs via one
  ``bit_or(shiftleft(1, bit % 64))`` hash aggregate.  For m = 2^20 that is
  16,384 rows ≈ 128 KiB: broadcastable no matter how large the build side's
  ROW count is, because the filter size is chosen, not inherited.

- PROBE: the word relation folds into ONE row holding a sparse
  map<word_idx, bits>; a broadcast join attaches it to every probe row and a
  scalar AND-of-K-bit-tests expression keeps the survivors — the probe side
  is never shuffled, never exploded, never re-grouped.

- VERIFY: the survivors (true matches + false positives, fp rate
  (1-e^{-Kn/m})^K) go through the EXACT semi-join.  The bloom stage only
  REDUCES the rows that reach the exact join's shuffle; it never changes the
  answer.  That is the 100 TB story: at fp=1% the probe side's shuffle
  volume drops ~99% for selective builds, the filter broadcast is O(m) bytes
  independent of data volume, and correctness never depends on the filter.

Reference scope: the reference engine has no bloom surface; this implements
the standard semi-join reduction pattern (Bloom'70; runtime filter pushdown
as in Spark SPARK-32268) as a first-class operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bit_exprs(key: Column, n_bits: int, n_hashes: int) -> list[Column]:
    """The K bit positions of `key`: xxhash64 with distinct integer seeds,
    folded into [0, n_bits) via pmod (xxhash64 is signed)."""
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(n_bits)).cast("long")
        for i in range(n_hashes)
    ]


def bloom_build(build: DataFrame, key_col: str, n_bits: int = 1 << 20,
                n_hashes: int = 4) -> DataFrame:
    """(word_idx, bits) bit-array relation: n_bits/64 rows max, one hash
    aggregate with map-side partial bit_or."""
    bits = F.explode(F.array(*_bit_exprs(F.col(key_col), n_bits, n_hashes)))
    return (
        build.select(bits.alias("bit"))
        .select(
            (F.col("bit") / 64).cast("long").alias("word_idx"),
            F.call_function("shiftleft", F.lit(1).cast("long"),
                            (F.col("bit") % 64).cast("int")).alias("m"),
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(m)").alias("bits"))
    )


def bloom_probe(probe: DataFrame, key_col: str, bloom: DataFrame,
                n_bits: int = 1 << 20, n_hashes: int = 4) -> DataFrame:
    """Rows of `probe` whose key passes the bloom filter (all K bits set).

    Shape: each of the K bit tests is one INNER BROADCAST HASH JOIN of the
    probe against the (word_idx, bits) word relation (≤ n_bits/64 rows
    ≈ 128 KiB at m = 2^20 — a size CHOSEN up front, independent of
    build-side row count) followed by a codegen'd AND/compare filter. A
    probe row whose word is absent from the relation has no bits set and
    is dropped by the inner join itself; a present word is one O(1) hash
    probe. The K stages filter PROGRESSIVELY, so each later join probes
    fewer rows. The probe side is never shuffled, never exploded, never
    re-grouped, and nothing big is ever attached to a row.

    Rejected shapes (all measured at sf0.1, 600k probe rows): a 1-row
    map<long,long> costs O(n_words) per lookup (Spark map element_at is a
    linear scan); a 1-row dense-array broadcast join memcpies the whole
    128 KiB array into every joined row; a 16k-element array LITERAL costs
    ~30 s of driver time just to construct through py4j. The join form
    executes in ~0.3 s. Each hash's bit position is materialized ONCE as
    a column so xxhash64 is evaluated K times per row, not 2K."""
    out = probe
    helper = []
    for i, b in enumerate(_bit_exprs(F.col(key_col), n_bits, n_hashes)):
        pos, w, mcol, bcol = f"_bp{i}", f"_bw{i}", f"_bm{i}", f"_bits{i}"
        helper += [pos, w, mcol, bcol]
        out = (
            out.withColumn(pos, b)
            .withColumn(w, (F.col(pos) / 64).cast("long"))
            .withColumn(
                mcol,
                F.call_function("shiftleft", F.lit(1).cast("long"),
                                (F.col(pos) % 64).cast("int")),
            )
            .join(
                F.broadcast(
                    bloom.select(F.col("word_idx").alias(w),
                                 F.col("bits").alias(bcol))
                ),
                w,
            )
            .filter(F.col(bcol).bitwiseAND(F.col(mcol)) == F.col(mcol))
        )
    return out.drop(*helper)


def bloom_semijoin(probe: DataFrame, build: DataFrame, probe_key: str,
                   build_key: str, n_bits: int = 1 << 20,
                   n_hashes: int = 4) -> DataFrame:
    """EXACT left-semi join probe ⋉ build with a bloom pre-reduction: the
    filter eliminates almost all non-matching probe rows before the exact
    semi-join shuffle; the final semi-join removes bloom false positives, so
    the result equals a plain left-semi join bit-for-bit."""
    bloom = bloom_build(build, build_key, n_bits, n_hashes)
    candidates = bloom_probe(probe, probe_key, bloom, n_bits, n_hashes)
    return candidates.join(
        build.select(F.col(build_key).alias(probe_key)).distinct(),
        probe_key,
        "left_semi",
    )
