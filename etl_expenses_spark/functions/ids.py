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
