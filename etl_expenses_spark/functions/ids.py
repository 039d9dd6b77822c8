"""Row-identity hashing (SURVEY.md §2.9 F17).

The reference derives its bank-payment primary key as
``md5("{fecha}_{hora}_{monto}_{comercio}_{nro_tarjeta}_{divisa}")``
(`/root/reference/transform_data_bank_pay/lambda_function.py:53-54`) and
fingerprints PDF payloads with sha256
(`/root/reference/transform_data_pdf/lambda_function.py:9-10`). Both become
JVM-side hash expressions over concat_ws — deterministic, codegen'd, and
usable as shuffle keys for exactly-once merges at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def payment_id(*cols: Column | str, sep: str = "_") -> Column:
    """md5 of '_'-joined column values — the reference's natural-key recipe."""
    normalized = [F.col(c) if isinstance(c, str) else c for c in cols]
    return F.md5(F.concat_ws(sep, *[c.cast("string") for c in normalized]))


def content_fingerprint(col: Column | str) -> Column:
    """sha256 hex digest of a (string or binary) payload column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sha2(c, 256)


def zorder_key(x, y, bits: int = 16):
    """Morton/Z-order interleave of two bucketed non-negative ints — the
    multi-dimensional clustering key for data skipping.

    Sorting a table by ``zorder_key(bucket(a), bucket(b))`` before writing
    makes every parquet file cover a small rectangle in (a, b) space, so
    min/max stats prune files for predicates on EITHER column — a 1-D sort
    only skips on its leading column. Pure shift/mask/OR expression tree
    (codegen'd, oracle-reproducible); ``bits``=16 → a 32-bit key, plenty
    for file-level clustering.
    """
    from pyspark.sql import functions as F

    xc = F.col(x) if isinstance(x, str) else x
    yc = F.col(y) if isinstance(y, str) else y
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(xc, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(yc, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def zorder_key_sql(x: str, y: str, bits: int = 16) -> str:
    """The identical Z-order expression as SQL text (oracle twin)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)
