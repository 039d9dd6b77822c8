"""Negative tests for every bound-check oracle predicate (ADVICE r11).

The bound-check oracles (approx_count_distinct_parts, the HLL pair,
agg_percentiles, kmeans_lloyd_refine, embedding_pq_codes) emit constant
TRUE on the oracle side, so the driver can never detect an engine-side
predicate that is accidentally tautological — a tolerance computed far too
loose would stay green forever. These tests prove each production boolean
DISCRIMINATES: the exact same expression/function the registry query uses
returns FALSE on a deliberately perturbed input.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from etl_expenses_spark.functions.bounds import rank_window_contains, rel_err_within
from etl_expenses_spark.operators.similarity import (
    lloyd_cell_stats_fn,
    lloyd_guarantees,
    pq_verify_fn,
)


def _eval_bool(spark, col) -> bool:
    return spark.range(1).select(col.alias("b")).first()["b"]


def test_rel_err_within_flags_perturbed_estimate(spark):
    # the HLL family's 5% band: exact*1.2 must fail, exact*1.04 must pass
    exact = F.lit(1000)
    assert _eval_bool(spark, rel_err_within(F.lit(1040.0), exact, 0.05))
    assert not _eval_bool(spark, rel_err_within(F.lit(1200.0), exact, 0.05))
    assert not _eval_bool(spark, rel_err_within(F.lit(800.0), exact, 0.05))


def test_rank_window_flags_out_of_band_answer(spark):
    # n=10000, accuracy=10000 -> tol = (floor(1)+1) = 2 ranks. A p50
    # answer whose rank span is (5000, 5001] passes; one at (5500, 5501]
    # (a 5.5-percentile-off answer) must fail.
    n = F.lit(10000)
    ok = rank_window_contains(F.lit(5000), F.lit(5001), n, 1, 2, 10000)
    bad = rank_window_contains(F.lit(5500), F.lit(5501), n, 1, 2, 10000)
    assert _eval_bool(spark, ok)
    assert not _eval_bool(spark, bad)
    # p90 twin: rank span around 9000 passes, around 8000 fails
    ok90 = rank_window_contains(F.lit(8999), F.lit(9001), n, 9, 10, 10000)
    bad90 = rank_window_contains(F.lit(7999), F.lit(8001), n, 9, 10, 10000)
    assert _eval_bool(spark, ok90)
    assert not _eval_bool(spark, bad90)


def _two_cell_centroids():
    # two orthogonal unit centroids in R^4
    return np.asarray(
        [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]], dtype=np.float64
    )


def test_lloyd_argmin_flags_misassigned_cell():
    C = _two_cell_centroids()
    fn = lloyd_cell_stats_fn(C)
    vecs = [np.array([0.9, 0.1, 0.0, 0.0]), np.array([0.8, 0.2, 0.0, 0.0])]
    good = fn(pd.DataFrame({"cell": [0, 0], "embedding": vecs}))
    assert bool(good["argmin_ok"].iloc[0])
    # same vectors claimed to belong to cell 1 (whose cosine is lower)
    bad = fn(pd.DataFrame({"cell": [1, 1], "embedding": vecs}))
    assert not bool(bad["argmin_ok"].iloc[0])


def test_lloyd_guarantees_flag_doctored_cells(spark):
    def agg_row(rows):
        pdf = spark.createDataFrame(
            rows, "cell int, n long, argmin_ok boolean, cos_init double, cos_refined double"
        )
        return lloyd_guarantees(pdf, k=2).first()

    clean = agg_row([(0, 3, True, 2.5, 2.6), (1, 2, True, 1.5, 1.5)])
    assert clean["cells_within_k"] and clean["assignments_are_argmin"]
    assert clean["inertia_monotone"] and clean["n_vectors"] == 5
    # refinement that DECREASED the objective must flip inertia_monotone
    worse = agg_row([(0, 3, True, 2.5, 2.3), (1, 2, True, 1.5, 1.5)])
    assert not worse["inertia_monotone"]
    # one mis-assigned cell poisons the global argmin boolean
    mis = agg_row([(0, 3, False, 2.5, 2.6), (1, 2, True, 1.5, 1.5)])
    assert not mis["assignments_are_argmin"]
    # more populated cells than k
    over = agg_row([(c, 1, True, 1.0, 1.0) for c in range(3)])
    assert not over["cells_within_k"]


def _tiny_codebooks():
    # m=2 subspaces of dim 2, k=2 codes each: codes are far apart so the
    # argmin is unambiguous
    return np.asarray(
        [
            [[0.0, 0.0], [10.0, 10.0]],
            [[0.0, 0.0], [10.0, 10.0]],
        ],
        dtype=np.float64,
    )


def _pq_verify(books, vec, codes):
    gen = pq_verify_fn(books)
    batch = pd.DataFrame(
        {"vec_id": [1], "embedding": [np.asarray(vec, dtype=np.float64)],
         "codes": [np.asarray(codes, dtype=np.int64)]}
    )
    out = pd.concat(list(gen(iter([batch]))))
    return bool(out["codes_in_range"].iloc[0]), bool(out["recon_is_argmin"].iloc[0])


def test_pq_verify_flags_out_of_range_and_suboptimal_codes():
    books = _tiny_codebooks()
    vec = [0.1, 0.1, 9.9, 9.9]  # subspace 0 -> code 0, subspace 1 -> code 1
    in_range, argmin = _pq_verify(books, vec, [0, 1])
    assert in_range and argmin
    # valid-but-suboptimal code on subspace 0 must flip recon_is_argmin
    in_range, argmin = _pq_verify(books, vec, [1, 1])
    assert in_range and not argmin
    # out-of-range code must flip codes_in_range (and therefore the argmin)
    in_range, argmin = _pq_verify(books, vec, [0, 5])
    assert not in_range and not argmin
