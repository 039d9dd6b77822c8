"""bench.py host-load gate (VERDICT r4 #2): the measurement must not start
under load, and a never-idle host proceeds with a warning rather than
hanging forever."""

from __future__ import annotations

import os

import bench


def test_idle_host_passes_immediately(monkeypatch):
    monkeypatch.setattr(os, "getloadavg", lambda: (0.2, 0.5, 0.5))
    assert bench.wait_for_idle_host(max_load=1.0, max_wait_sec=0.1) == 0.2


def test_loaded_host_waits_then_proceeds_with_flagged_load(monkeypatch):
    calls = {"n": 0}

    def fake_load():
        calls["n"] += 1
        return (5.0, 5.0, 5.0)

    slept = []
    monkeypatch.setattr(os, "getloadavg", fake_load)
    monkeypatch.setattr(bench.time, "sleep", lambda s: slept.append(s))
    load = bench.wait_for_idle_host(max_load=1.0, max_wait_sec=0.0)
    assert load == 5.0  # recorded as-is so bench_compare can flag the run
    assert calls["n"] >= 1 and not slept  # deadline already past: no sleep


def test_load_drop_releases_the_gate(monkeypatch):
    seq = iter([(3.0,) * 3, (2.0,) * 3, (0.4,) * 3])
    monkeypatch.setattr(os, "getloadavg", lambda: next(seq))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    assert bench.wait_for_idle_host(max_load=1.0, max_wait_sec=60.0) == 0.4


class _FakeQuery:
    """Stands in for a registry entry: build().write chain is bypassed by
    monkeypatching bench.run_once below."""

    name = "fake"


def _ambient_external_cores(sample_sec: float = 0.3) -> float:
    """One idle-window sample of co-tenant CPU (tools/cpuprobe): how many
    external user-space cores are burning while WE sleep."""
    import time as _t

    from tools.cpuprobe import ContentionWindow

    win = ContentionWindow()
    t0 = _t.perf_counter()
    _t.sleep(sample_sec)
    return win.external_cores(_t.perf_counter() - t0)


def _require_quiet_host(tries: int = 4, threshold: float = 0.5,
                        sampler=_ambient_external_cores):
    """VERDICT r11 #4: the two cpuprobe self-tests assert the HOST is
    quiet, so a co-tenant CPU burner (e.g. an oracle sweep running
    alongside pytest) fails them spuriously. Sample the ambient load
    BEFORE the assertion window; retry while it is ≥ threshold cores and
    skip-with-reason if it never settles — a skip names the contention,
    a red asserts a real attribution bug."""
    import time as _t

    import pytest

    amb = None
    for attempt in range(tries):
        amb = sampler()
        if amb < threshold:
            return
        if attempt < tries - 1:
            _t.sleep(0.5)
    pytest.skip(
        f"ambient external load {amb:.2f} cores >= {threshold} across "
        f"{tries} samples — the cpuprobe attribution self-test needs a "
        "quiet host (a co-tenant burner would fail it spuriously)"
    )


def test_require_quiet_host_skips_under_fake_contention():
    # pins the guard itself: a persistently-loaded host must SKIP (with
    # the load in the reason), and a transient spike must retry through
    import pytest

    with pytest.raises(pytest.skip.Exception, match="2.00 cores"):
        _require_quiet_host(tries=2, sampler=lambda: 2.0)

    seq = iter([1.7, 0.1])
    _require_quiet_host(tries=3, sampler=lambda: next(seq))  # no skip


def test_cpuprobe_counts_own_subtree_as_self():
    # CPU burned by a process WE spawned (and even reaped) must register as
    # subtree work, not as external contention: an idle host reads ~0
    # external cores no matter how hard the bench itself runs.
    import subprocess
    import time as _t

    from tools.cpuprobe import ContentionWindow

    _require_quiet_host()
    # the quiet-host gate samples BEFORE the window; a co-tenant noise wave
    # can still land INSIDE it (r13: observed 1.26 ext cores mid-window on a
    # steal-heavy host while the same assertion passed standalone). Retry a
    # couple of times — a probe bug reproduces every time, a noise wave
    # doesn't; if the host never quiets down, skip like the gate would.
    import pytest

    for _attempt in range(3):
        win = ContentionWindow()
        t0 = _t.perf_counter()
        subprocess.run(
            ["python", "-c",
             "t=__import__('time');e=t.process_time\nwhile e()<0.5: pass"],
            check=True,
        )
        ext = win.external_cores(_t.perf_counter() - t0)
        # the child burned ~0.5 CPU-sec inside our tree; external must not
        # see it (tolerance for unrelated background daemons on the host)
        if ext < 0.9:
            break
        _t.sleep(2.0)
    else:
        pytest.skip(
            f"host stayed contended across 3 probe windows (last ext "
            f"{ext:.2f} cores) — cannot distinguish probe error from "
            "co-tenant load"
        )
    assert ext < 0.9


def test_cpuprobe_ignores_own_kernel_side_work():
    # VERDICT r6 #3: kernel-side CPU (kworker/softirq/our own stime) must
    # not read as co-tenant load. A syscall-heavy child burns mostly system
    # time; with user-vs-user attribution the window stays clean. (This
    # pins the arithmetic's consistency: if the total side ever counts
    # system jiffies again while the subtree side counts only utime, this
    # child's stime becomes "external" and the assertion fails.)
    import subprocess
    import time as _t

    from tools.cpuprobe import ContentionWindow

    _require_quiet_host()
    win = ContentionWindow()
    t0 = _t.perf_counter()
    subprocess.run(
        ["python", "-c",
         "import os,time\nt0=time.perf_counter()\n"
         "while time.perf_counter()-t0<0.5: os.urandom(1<<16)"],
        check=True,
    )
    ext = win.external_cores(_t.perf_counter() - t0)
    assert ext < 0.9


def test_format_outputs_line_fits_capture_and_detail_is_complete():
    import json as _json

    import bench

    names = bench.HEADLINE  # the real 48-query set is the real guarantee
    timings = {n: 1.2345 + i / 97 for i, n in enumerate(names)}
    ext = {n: 0.11 for n in names}
    line, detail = bench.format_outputs(
        timings, ext, {names[0]: 2}, "0.1", 0.42, 6.3
    )
    names = list(names)
    # stdout line: parses, carries the full query map, fits the driver's
    # ~2000-char tail capture with headroom for trailing shutdown output
    parsed = _json.loads(line)
    assert set(parsed["queries"]) == set(names)
    assert parsed["value"] == round(sum(timings.values()), 4)
    # ext_cores_max (the authoritative contamination signal) must survive
    # every degradation stage; loadavg_start/retries may drop from the
    # LINE at the context-field stage (r11) — they always live in detail.
    # (Their stage-exact presence/drop behavior is pinned by the two
    # dedicated tests below — a .get() default here was vacuous, ADVICE
    # r11.)
    assert parsed["ext_cores_max"] == 0.11
    assert len(line) <= 1900
    assert "ext_cores\":{" not in line  # per-query probe map stays off-line
    # detail: full-precision timings + the per-query ext_cores map
    assert detail["queries"] == timings and detail["ext_cores"] == ext
    assert detail["retried"] == {names[0]: 2}


def test_format_outputs_retries_present_on_short_line():
    """ADVICE r11: when the line is comfortably under budget (small query
    set), retries and loadavg_start MUST be on it — asserted without a
    .get() default so a silently-dropped field fails the test."""
    import json as _json

    import bench

    names = [f"q{i}" for i in range(10)]
    timings = {n: 1.234 for n in names}
    line, _ = bench.format_outputs(
        timings, {n: 0.11 for n in names}, {names[0]: 2}, "0.1", 0.42, 6.3
    )
    parsed = _json.loads(line)
    assert parsed["retries"] == 2
    assert parsed["loadavg_start"] == 0.42


def test_format_outputs_retries_drop_only_at_context_stage():
    """ADVICE r11 sibling: retries/loadavg_start leave the LINE exactly
    when even 1-decimal timings exceed the 1900-char budget (the context-
    field stage) — and ext_cores_max plus the full query map survive it."""
    import json as _json

    import bench

    # sized so the 1-decimal line only fits once the context fields go
    # (the stage window is ~34 chars wide; the 7-char pad name lands in it)
    names = [f"extremely_long_headline_query_name_number_{i:04d}" for i in range(33)]
    names.append("p" * 7)
    timings = {n: 1.234 for n in names}
    line, detail = bench.format_outputs(
        timings, {n: 0.11 for n in names}, {names[0]: 2}, "0.1", 0.42, 6.3
    )
    parsed = _json.loads(line)
    assert len(line) <= 1900
    assert "retries" not in parsed and "loadavg_start" not in parsed
    assert parsed["ext_cores_max"] == 0.11
    assert set(parsed["queries"]) == set(names)  # map intact at this stage
    assert detail["retried"] == {names[0]: 2}  # full record always in detail


def test_format_outputs_degrades_precision_rather_than_overflowing():
    import json as _json

    import bench

    # the REAL headline set is the in-band case: 3-decimal timings push the
    # line past the 1900 budget and precision degradation (2 then 1
    # decimals) brings it back under with the full per-query map intact —
    # the guarantee is the intact map, not a particular decimal stage
    # (which shifts as the headline set grows)
    names = bench.HEADLINE
    timings = {n: 1.2345 for n in names}
    line, _ = bench.format_outputs(timings, {n: 0.0 for n in names}, {}, 0.1,
                                   0.3, 1.0)
    assert len(line) <= 1900
    parsed = _json.loads(line)
    assert parsed["queries"][names[0]] in (1.23, 1.2)  # degraded, not 3-dec
    assert set(parsed["queries"]) == set(names)


def test_bench_compare_reads_detail_file(tmp_path):
    import json as _json
    import sys as _sys

    _sys.path.insert(0, "tools")
    import bench_compare

    detail = {"metric": "headline_queries_total", "value": 3.0,
              "unit": "sec", "queries": {"a": 1.0, "b": 2.0},
              "ext_cores": {"a": 0.0, "b": 0.1}, "ext_cores_max": 0.1,
              "loadavg_start": 0.2, "loadavg_1m": 5.0, "retried": {}}
    p = tmp_path / "BENCH_DETAIL.json"
    p.write_text(_json.dumps(detail, indent=1))
    assert bench_compare.load(str(p))["queries"] == {"a": 1.0, "b": 2.0}


def test_measure_query_retries_under_contention(monkeypatch):
    import bench

    class _Win:
        seq = iter([5.0, 3.0, 0.2])  # contaminated, contaminated, clean

        def __init__(self):
            self._ext = next(self.seq)

        def external_cores(self, wall):
            return self._ext

    fake_mod = type("M", (), {"ContentionWindow": _Win})
    import sys as _sys

    monkeypatch.setitem(_sys.modules, "tools.cpuprobe", fake_mod)
    times = iter([1.0, 1.1, 1.2, 2.0, 2.1, 2.2, 0.5, 0.55, 0.6])
    monkeypatch.setattr(bench, "run_once", lambda q, s, d: next(times))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    med, ext, retries, discarded = bench.measure_query(_FakeQuery(), None, "/x", 1.5)
    assert (med, ext, retries) == (0.55, 0.2, 2)  # cleanest attempt wins
    assert discarded == []  # tight windows: variance guard never tripped


def test_measure_query_keeps_least_contaminated_when_never_clean(monkeypatch):
    import bench

    class _Win:
        seq = iter([5.0, 2.0, 4.0])

        def __init__(self):
            self._ext = next(self.seq)

        def external_cores(self, wall):
            return self._ext

    fake_mod = type("M", (), {"ContentionWindow": _Win})
    import sys as _sys

    monkeypatch.setitem(_sys.modules, "tools.cpuprobe", fake_mod)
    times = iter([3.0, 3.1, 3.2, 1.0, 1.1, 1.2, 2.0, 2.1, 2.2])
    monkeypatch.setattr(bench, "run_once", lambda q, s, d: next(times))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    med, ext, retries, discarded = bench.measure_query(_FakeQuery(), None, "/x", 1.5)
    assert (med, ext) == (1.1, 2.0)  # attempt with the lowest ext wins
    assert retries == 2
    assert discarded == []


def test_measure_query_variance_guard_extends_bimodal_window(monkeypatch):
    """VERDICT r8 #1: a clean-but-bimodal 3-run window (10 s / 24.5 s modes
    on identical code) must not let median-of-3 sample a mode by lottery —
    the guard extends to 5 runs, reports the tight-cluster median, and
    surfaces the discarded slow-mode runs for BENCH_DETAIL.json."""
    import bench

    class _Win:
        def external_cores(self, wall):
            return 0.1  # clean window: contention retry must NOT trigger

    fake_mod = type("M", (), {"ContentionWindow": _Win})
    import sys as _sys

    monkeypatch.setitem(_sys.modules, "tools.cpuprobe", fake_mod)
    # exactly 5 values: guard takes 2 extra runs, then stops (a 6th
    # next() would raise StopIteration and fail the test)
    times = iter([10.0, 24.5, 10.2, 23.9, 10.1])
    monkeypatch.setattr(bench, "run_once", lambda q, s, d: next(times))
    med, ext, retries, discarded = bench.measure_query(_FakeQuery(), None, "/x", 1.5)
    assert med == 10.1  # median of the tight cluster [10.0, 10.1, 10.2]
    assert discarded == [23.9, 24.5]
    assert retries == 0  # clean window: no contention retry consumed


def test_measure_query_tight_window_takes_exactly_three_runs(monkeypatch):
    import bench

    class _Win:
        def external_cores(self, wall):
            return 0.1

    fake_mod = type("M", (), {"ContentionWindow": _Win})
    import sys as _sys

    monkeypatch.setitem(_sys.modules, "tools.cpuprobe", fake_mod)
    times = iter([1.0, 1.3, 1.9])  # spread 1.9x < 2x: no extension
    monkeypatch.setattr(bench, "run_once", lambda q, s, d: next(times))
    med, ext, retries, discarded = bench.measure_query(_FakeQuery(), None, "/x", 1.5)
    assert (med, discarded) == (1.3, [])


def test_format_outputs_records_variance_outliers_in_detail_only():
    import json as _json

    import bench

    names = bench.HEADLINE
    timings = {n: 1.0 for n in names}
    line, detail = bench.format_outputs(
        timings, {n: 0.0 for n in names}, {}, "0.1", 0.3, 1.0,
        variance_outliers={names[0]: [24.53]},
    )
    assert detail["variance_outliers"] == {names[0]: [24.53]}
    assert "variance_outliers" not in _json.loads(line)  # stays off-line


def test_bench_compare_refuses_contaminated_and_rejects_garbage(tmp_path, capsys):
    import json as _json
    import sys as _sys

    _sys.path.insert(0, "tools")
    import bench_compare

    clean = {"metric": "m", "value": 1, "queries": {"a": 1.0, "b": 2.0},
             "loadavg_start": 0.3, "ext_cores_max": 0.1}
    dirty = dict(clean, queries={"a": 2.0, "b": 2.1}, ext_cores_max=4.2)
    p1, p2, p3 = tmp_path / "c.json", tmp_path / "d.json", tmp_path / "g.txt"
    p1.write_text(_json.dumps(clean))
    p2.write_text(_json.dumps(dirty))
    p3.write_text("complete garbage, no json here")

    _sys.argv = ["bench_compare", str(p1), str(p2)]
    assert bench_compare.main() == 2
    out = capsys.readouterr().out
    assert "REFUSED" in out and "4.2" in out
    assert "regressions" not in out  # deltas withheld

    _sys.argv = ["bench_compare", str(p1), str(p1)]
    assert bench_compare.main() == 0

    try:
        bench_compare.load(str(p3))
    except SystemExit as e:
        assert "g.txt" in str(e.code) or "g.txt" in str(e)
    else:
        raise AssertionError("garbage file must SystemExit with a message")


def test_format_outputs_drops_query_map_before_overflowing():
    """Final degradation stage: when even 2-decimal timings overflow the
    stdout-tail budget, the line keeps its parseable core and points at
    BENCH_DETAIL.json instead of shipping a truncated fragment."""
    import json as _json

    import bench

    names = [f"extremely_long_headline_query_name_number_{i:04d}" for i in range(80)]
    timings = {k: 123.456 for k in names}
    ext = {k: 0.0 for k in names}
    line, detail = bench.format_outputs(timings, ext, {}, "0.1", 0.3, 0.5)
    assert len(line) <= 1900
    parsed = _json.loads(line)
    assert parsed["queries"] == "see BENCH_DETAIL.json"
    assert parsed["value"] == round(sum(timings.values()), 4)
    assert detail["queries"] == timings  # full map still in the detail file


def test_bench_compare_day_effect_normalization(tmp_path):
    """VERDICT r10 #1: per-query regression verdicts are judged relative
    to the run-pair's day effect (median ratio over shared queries
    >= 0.75s) with an absolute floor — a uniform 1.3x host-drift run must
    produce ZERO flagged regressions, while a genuine 2x outlier on top
    of the drift is still flagged."""
    import json
    import subprocess
    import sys

    old = {
        "metric": "headline_queries_total", "value": 0, "unit": "sec",
        "queries": {f"q{i}": 1.0 + i * 0.1 for i in range(10)},
        "sf": 0.1, "loadavg_start": 0.5, "ext_cores_max": 0.1,
    }
    # uniform 1.3x drift + one real 2x regression on q3
    newq = {k: round(v * 1.3, 3) for k, v in old["queries"].items()}
    drift = dict(old, queries=newq, value=sum(newq.values()))
    real = dict(newq)
    real["q3"] = round(old["queries"]["q3"] * 2.0 * 1.3, 3)
    regressed = dict(old, queries=real, value=sum(real.values()))

    a, b, c = tmp_path / "a.json", tmp_path / "b.json", tmp_path / "c.json"
    a.write_text(json.dumps(old))
    b.write_text(json.dumps(drift))
    c.write_text(json.dumps(regressed))
    tool = os.path.join(os.path.dirname(bench.__file__), "tools", "bench_compare.py")

    out1 = subprocess.run(
        [sys.executable, tool, str(a), str(b)], capture_output=True, text=True
    ).stdout
    assert "regressions" not in out1, out1  # pure drift: nothing flagged
    assert "1.30x" in out1  # and the day effect is reported

    out2 = subprocess.run(
        [sys.executable, tool, str(a), str(c)], capture_output=True, text=True
    ).stdout
    assert "q3" in out2 and "regressions" in out2, out2
    flagged = [ln for ln in out2.splitlines() if ln.strip().startswith("q")]
    assert len(flagged) == 1, out2  # only the genuine outlier


def test_bench_compare_sentinel_flags_uniform_regression():
    """VERDICT r12 #1 done-bar, half 1: a synthetic UNIFORM 30% regression
    confined to changed-file queries must be flagged while unchanged-code
    sentinels pin the day effect — exactly the shift the legacy all-shared
    median estimator absorbed as drift (r12 measured 1.13x, under its
    ±15% trip wire)."""
    import sys as _sys

    _sys.path.insert(0, "tools")
    import bench_compare

    names = [f"q{i}" for i in range(12)]
    oq = {n: 1.0 + i * 0.1 for i, n in enumerate(names)}
    qfiles = {n: ({"pkg/a.py"} if i < 6 else {"pkg/b.py"})
              for i, n in enumerate(names)}
    changed = {"pkg/b.py"}
    # host drift 1.05x on everything; a genuine 1.3x code regression on
    # top of it for the changed-file half
    nq = {n: round(oq[n] * (1.05 if i < 6 else 1.05 * 1.3), 4)
          for i, n in enumerate(names)}
    r = bench_compare.analyze(oq, nq, qfiles, changed, thr=0.2, floor=0.05)
    assert r["mode"] == "sentinel"
    assert sorted(r["sentinels"]) == sorted(names[:6])
    assert abs(r["day"] - 1.05) < 0.01  # sentinels pin the host drift
    assert r["uniform_regression"], r  # the 1.3x code shift is NOT absorbed
    flagged = {k for k, _, _ in r["worse"]}
    assert flagged == set(names[6:]), flagged  # every changed query flagged

    # control: same drift with NO code regression — nothing flagged, and
    # the changed-file set sits inside the sentinel band
    nq2 = {n: round(oq[n] * 1.05, 4) for n in names}
    r2 = bench_compare.analyze(oq, nq2, qfiles, changed, thr=0.2, floor=0.05)
    assert not r2["uniform_regression"] and not r2["worse"]


def test_bench_compare_sentinel_real_pair_reproduces_drift():
    """VERDICT r12 #1 done-bar, half 2: on the committed r11→r12 BENCH
    pair the new estimator derives the day effect from unchanged-code
    sentinels, attributes the 1.12x whole-run shift to the host (exit 0,
    no uniform-regression alarm), and labels the two judge-adjudicated
    noise queries as unchanged-code candidates."""
    import subprocess
    import sys

    repo = os.path.dirname(bench.__file__)
    tool = os.path.join(repo, "tools", "bench_compare.py")
    proc = subprocess.run(
        [sys.executable, tool,
         os.path.join(repo, "BENCH_r11.json"),
         os.path.join(repo, "BENCH_r12.json")],
        capture_output=True, text=True,
    )
    out = proc.stdout
    assert proc.returncode == 0, out + proc.stderr  # drift, not regression
    assert "SENTINEL" in out, out  # sentinel mode engaged (git + registry)
    assert "UNIFORM REGRESSION" not in out, out
    # the r12 judge's adjudication, now visible in the tool itself
    assert "lm_bigram_rarity" in out and "noise candidate" in out, out


def test_bench_compare_query_files_excludes_shared_plumbing():
    """The query→files map walks the real import closure (plan module +
    operators it imports) but leaves out all-query plumbing (registry,
    readers, caching, __init__ re-exports) — a diff there is a caveat,
    not a sentinel-set wipe."""
    import sys as _sys

    _sys.path.insert(0, "tools")
    import bench_compare

    qf = bench_compare.query_files(["dedup_incremental_apss"])
    files = qf["dedup_incremental_apss"]
    assert "etl_expenses_spark/plans/similarity_ops.py" in files
    assert "etl_expenses_spark/operators/apss.py" in files
    assert "etl_expenses_spark/operators/dedup.py" in files
    assert not any(f.endswith("__init__.py") for f in files)
    assert "etl_expenses_spark/plans/registry.py" not in files
    assert "etl_expenses_spark/sources/readers.py" not in files
