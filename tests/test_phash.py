"""dHash perceptual near-dup: banded join must find planted perturbed
copies through the real codec path, stay silent on unrelated images, and
drop undecodable payloads instead of failing."""

from __future__ import annotations

import numpy as np
from pyspark.sql import Row

from etl_expenses_spark.operators.imagecodec import encode_ppm
from etl_expenses_spark.operators.phash import (
    dhash_bands,
    dhash_neardup_pairs,
    dhash_of_array,
)


def _img(seed: int, perturb: bool = False) -> bytes:
    rng = np.random.RandomState(seed)
    block = rng.randint(0, 256, size=(8, 9)).astype(np.uint8)
    if perturb:
        block[3, 4] = (int(block[3, 4]) + 128) % 256
    gray = np.kron(block, np.ones((4, 4), dtype=np.uint8))
    return encode_ppm(np.stack([gray, gray, gray], axis=-1))


def test_planted_neardups_found_and_strangers_excluded(spark):
    rows = [
        Row(id=1, img=bytearray(_img(7))),
        Row(id=2, img=bytearray(_img(7, perturb=True))),   # <= 2 bits away
        Row(id=3, img=bytearray(_img(7))),                 # exact dup of 1
        Row(id=4, img=bytearray(_img(99))),                # unrelated
        Row(id=5, img=bytearray(b"not an image at all")),  # undecodable
    ]
    df = spark.createDataFrame(rows)
    bands = dhash_bands(df)
    assert bands.count() == 4  # id=5 dropped, not raised
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in dhash_neardup_pairs(bands, max_hamming=3).collect()
    }
    assert pairs.get((1, 3)) == 0
    assert (1, 2) in pairs and pairs[(1, 2)] <= 2
    assert (2, 3) in pairs
    assert not any(4 in p or 5 in p for p in pairs)


def test_dhash_bits_definition():
    gray = np.array([[i * 3 % 7 for i in range(9)] for _ in range(8)])
    bands = dhash_of_array(gray)
    # recompute positionally
    want = [0, 0, 0, 0]
    for r in range(8):
        for c in range(8):
            bit = 1 if gray[r, c + 1] > gray[r, c] else 0
            pos = r * 8 + c
            want[pos // 16] |= bit << (pos % 16)
    assert bands == want


def test_banded_join_equals_bruteforce(spark):
    """Pigeonhole claim checked directly: LSH pair set == full O(n^2)
    hamming pair set at max_hamming = 3."""
    rows = [Row(id=i, img=bytearray(_img(i % 12))) for i in range(36)]
    df = spark.createDataFrame(rows)
    bands = dhash_bands(df).collect()
    by_id = {r.id: (r.b0, r.b1, r.b2, r.b3) for r in bands}
    want = set()
    ids = sorted(by_id)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            ham = sum(
                bin(x ^ y).count("1")
                for x, y in zip(by_id[a], by_id[b])
            )
            if ham <= 3:
                want.add((a, b))
    got = {
        (r.id_a, r.id_b)
        for r in dhash_neardup_pairs(
            spark.createDataFrame(
                [Row(id=i, b0=v[0], b1=v[1], b2=v[2], b3=v[3])
                 for i, v in by_id.items()]
            ),
            max_hamming=3,
        ).collect()
    }
    assert got == want and len(want) >= 30  # 3 copies of each of 12 seeds
