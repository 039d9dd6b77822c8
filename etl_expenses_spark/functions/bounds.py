"""Bound predicates for sketch/approx operators — the booleans the
bound-check oracles pin TRUE.

Every approximate operator in the inventory (HLL distinct counts,
percentile sketches, the Lloyd/PQ guarantees in operators/similarity.py)
ships its semantic guarantee as an output boolean that the DuckDB oracle
predicts TRUE while independently computing the exact twin column. That
evidence shape has one failure mode (ADVICE r11): a predicate that is
accidentally tautological (a tolerance computed far too loose) would stay
green forever and the driver could never tell. Centralizing the predicates
here makes them directly unit-testable: tests/test_bound_predicates.py
feeds each one a deliberately perturbed estimate (e.g. exact*1.2) and
asserts FALSE — proving the boolean discriminates — while the registry
queries consume the very same expression.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def rel_err_within(est: Column, exact: Column, rel: float) -> Column:
    """|est - exact| <= rel * exact — the relative-error contract of the
    HLL family (approx_count_distinct_parts, sketch_hll_distinct_users,
    hll_sliding_7d_users pin rel=0.05, ~3 sigma at the default lgK=12/1%
    rsd). FALSE whenever the estimate strays beyond the band (negative
    test: est = exact*1.2 fails at rel=0.05)."""
    return F.abs(est.cast("double") - exact.cast("double")) <= F.lit(
        rel
    ) * exact.cast("double")


def rank_window_contains(
    lt: Column, le: Column, n: Column, p_num: int, p_den: int, accuracy: int
) -> Column:
    """percentile_approx rank-error contract: the true rank span of the
    returned element — (lt, le] where lt/le count values strictly-less /
    less-or-equal — must intersect [p*n - tol, p*n + tol] with
    tol = floor(n/accuracy) + 1 (the +1 absorbs the <=-vs-< rank
    convention). Compared in p_den-scaled integers so the check is exact.
    FALSE whenever the sketch's answer sits outside the tolerated rank
    window (negative test: an answer whose rank span misses p*n by more
    than tol fails)."""
    target = n * F.lit(p_num)
    tol = (F.floor(n / F.lit(accuracy)) + 1) * F.lit(p_den)
    return (le * F.lit(p_den) >= target - tol) & (
        lt * F.lit(p_den) <= target + tol
    )
