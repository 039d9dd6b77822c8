"""Perceptual-hash (dHash) near-duplicate detection for images.

dHash ("difference hash") is the standard cheap perceptual fingerprint for
image dedup at corpus scale: downscale to (W+1)×H grayscale, emit one bit
per horizontal neighbor comparison gray[r,c+1] > gray[r,c] — W·H bits that
survive recompression, resizing, and small brightness shifts, so
byte-level dedup misses the pairs dHash catches.

Pipeline shape (the only Python is the per-image Arrow-batched UDF):

1. ``dhash_bands``: mapInPandas over (id, image_bytes) → (id, b0..b3),
   decoding through the REAL image codec stack (``imagecodec.decode_image``
   — PPM/PGM/BMP/baseline-JPEG/PNG/GIF), nearest-resampling to 9×8, and
   packing the 64 comparison bits as four 16-bit band values.  Per-row cost
   is independent of corpus size; undecodable payloads drop out with a
   None-filter (counted by the caller if needed).

2. ``dhash_neardup_pairs``: banded LSH self-join, all JVM-side — posexplode
   the 4 bands, join on (band_idx, band_value), distinct pairs, re-join the
   band vectors, exact hamming = Σ bit_count(b_a XOR b_b).  By pigeonhole,
   any pair within hamming ≤ 3 agrees on at least one of the 4 bands, so
   recall at the default threshold is EXACT, not probabilistic — the LSH
   only prunes pairs that provably cannot qualify.  At 100 TB the band
   buckets are ~uniform 16-bit hashes: Σ|bucket|² stays near-linear, and a
   wider hash (more bands of the same width) keeps the pigeonhole guarantee
   at any chosen threshold without changing the plan.

Reference scope: the reference engine has no image surface at all; this is
part of the training-data-pipeline extension (multimodal dedup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DHASH_W, DHASH_H = 8, 8  # bits per row, rows (decode target is 9x8)
N_BANDS = 4
BAND_BITS = (DHASH_W * DHASH_H) // N_BANDS  # 16


def dhash_of_array(gray) -> list[int]:
    """(H, W+1) uint8/int grayscale → N_BANDS band ints (16 bits each).
    Bit (r, c) = 1 iff gray[r, c+1] > gray[r, c]; bit index = r*8 + c."""
    import numpy as np

    g = np.asarray(gray, dtype=np.int64)
    bits = (g[:, 1:] > g[:, :-1]).astype(np.int64).reshape(-1)  # 64 bits
    weights = 1 << (np.arange(DHASH_W * DHASH_H, dtype=np.int64) % BAND_BITS)
    bands = [
        int((bits[b * BAND_BITS:(b + 1) * BAND_BITS]
             * weights[:BAND_BITS]).sum())
        for b in range(N_BANDS)
    ]
    return bands


def dhash_bands(images: DataFrame, id_col: str = "id",
                bytes_col: str = "img") -> DataFrame:
    """(id, b0, b1, b2, b3) per decodable image — real decode + 9×8
    nearest resample + dHash, Arrow-batched."""

    def run(batches):
        import pandas as pd

        from etl_expenses_spark.operators.imagecodec import (
            decode_image,
            resize_nearest,
        )

        for b in batches:
            out = {"id": [], "b0": [], "b1": [], "b2": [], "b3": []}
            for i, raw in zip(b[id_col], b[bytes_col]):
                arr = decode_image(bytes(raw))
                if arr is None:
                    continue
                small = resize_nearest(arr, DHASH_W + 1, DHASH_H)
                bands = dhash_of_array(small[:, :, 0])
                out["id"].append(i)
                for j in range(N_BANDS):
                    out[f"b{j}"].append(bands[j])
            yield pd.DataFrame(out)

    return images.select(id_col, bytes_col).mapInPandas(
        run, schema="id bigint, b0 long, b1 long, b2 long, b3 long"
    )


def dhash_neardup_pairs(bands: DataFrame, max_hamming: int = 3) -> DataFrame:
    """(id_a, id_b, hamming) for unordered pairs with hamming ≤ max_hamming.
    Exact recall for max_hamming ≤ N_BANDS - 1 (pigeonhole); candidates come
    only from shared-band buckets."""
    assert max_hamming <= N_BANDS - 1, (
        "pigeonhole guarantee needs max_hamming < N_BANDS; "
        "use a wider hash for larger radii"
    )
    keyed = bands.select(
        "id",
        F.posexplode(F.array("b0", "b1", "b2", "b3")).alias("band_idx", "band_val"),
    )
    cand = (
        keyed.alias("x")
        .join(keyed.alias("y"), ["band_idx", "band_val"])
        .filter(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )
    a = bands.select(F.col("id").alias("id_a"), *[
        F.col(f"b{j}").alias(f"a{j}") for j in range(N_BANDS)
    ])
    b = bands.select(F.col("id").alias("id_b"), *[
        F.col(f"b{j}").alias(f"v{j}") for j in range(N_BANDS)
    ])
    ham = sum(
        F.bit_count(F.col(f"a{j}").bitwiseXOR(F.col(f"v{j}")))
        for j in range(N_BANDS)
    )
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("hamming", ham.cast("long"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
