"""Query inventory. Importing this package registers every query."""

from etl_expenses_spark.plans.registry import REGISTRY, Query, query  # noqa: F401

# Registration side-effects — each module fills REGISTRY.
from etl_expenses_spark.plans import core  # noqa: F401,E402
from etl_expenses_spark.plans import functions_demo  # noqa: F401,E402
from etl_expenses_spark.plans import text_ops  # noqa: F401,E402
from etl_expenses_spark.plans import dedup_ops  # noqa: F401,E402
from etl_expenses_spark.plans import similarity_ops  # noqa: F401,E402
from etl_expenses_spark.plans import temporal_ops  # noqa: F401,E402
from etl_expenses_spark.plans import advanced  # noqa: F401,E402
from etl_expenses_spark.plans import schema_ops  # noqa: F401,E402
from etl_expenses_spark.plans import relational_ext  # noqa: F401,E402
from etl_expenses_spark.plans import tpch_more  # noqa: F401,E402
from etl_expenses_spark.plans import behavior_ops  # noqa: F401,E402
from etl_expenses_spark.plans import lakehouse_ops  # noqa: F401,E402
from etl_expenses_spark.plans import sketch_ops  # noqa: F401,E402
from etl_expenses_spark.plans import privacy_ops  # noqa: F401,E402
from etl_expenses_spark.plans import retrieval_ops  # noqa: F401,E402
from etl_expenses_spark.plans import geo_ops  # noqa: F401,E402
from etl_expenses_spark.plans import ivm_ops  # noqa: F401,E402

# Golden-literal oracles (tools/gen_goldens.py): VALUES-table SQL pinning
# the deterministic output of queries whose semantics DuckDB cannot
# recompute (LSH bucketing, HLL sketches, PQ codes, k-means refinement).
# Each file's header lists the scale factors its branches cover.


def _attach_goldens() -> None:
    import os
    import re

    gdir = os.path.join(os.path.dirname(__file__), "goldens")
    if not os.path.isdir(gdir):
        return
    for fname in sorted(os.listdir(gdir)):
        if not fname.endswith(".sql"):
            continue
        name = fname[:-4]
        if name not in REGISTRY:
            continue
        text = open(os.path.join(gdir, fname)).read()
        m = re.search(r"--\s*golden_sfs:\s*([0-9.,\s]+)", text)
        q = REGISTRY[name]
        q.oracle = text
        q.golden_sfs = tuple(s.strip() for s in m.group(1).split(",")) if m else ("0.01",)


_attach_goldens()
