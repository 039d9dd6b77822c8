"""Reproduce + diagnose the allpairs_cosine_prefix_join bimodality (VERDICT r8 #2).

Runs the query N times in one session at $SPARK_GRAFT_SF_DIR (default sf0.1),
recording per run: wall time, JVM GC time delta, cached-RDD memory state
after the run, and (optionally) per-stage metrics via a SparkListener-free
approach (REST API is off; we use the status tracker).

Usage: python tools/repro_allpairs.py [n_runs]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_expenses_spark.caching import clear_tracked_caches
from etl_expenses_spark.plans import REGISTRY
from etl_expenses_spark.session import get_spark


def gc_ms(spark):
    beans = spark.sparkContext._jvm.java.lang.management.ManagementFactory \
        .getGarbageCollectorMXBeans()
    total = 0
    for i in range(beans.size()):
        total += beans.get(i).getCollectionTime()
    return total


def storage_info(spark):
    infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    rows = []
    for inf in infos:
        rows.append((inf.numCachedPartitions(), inf.numPartitions(),
                     inf.memSize(), inf.diskSize()))
    return rows


def main():
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("repro_allpairs")
    q = REGISTRY["allpairs_cosine_prefix_join"].build
    times = []
    for i in range(n_runs):
        clear_tracked_caches()
        g0 = gc_ms(spark)
        t0 = time.monotonic()
        df = q(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        dt = time.monotonic() - t0
        g1 = gc_ms(spark)
        st = storage_info(spark)
        times.append(dt)
        print(f"run {i}: {dt:7.2f} s  gc_delta={g1 - g0:6d} ms  "
              f"cached={st}", flush=True)
    times.sort()
    print(f"spread: min={times[0]:.2f} max={times[-1]:.2f} "
          f"ratio={times[-1] / times[0]:.2f}")


if __name__ == "__main__":
    main()
