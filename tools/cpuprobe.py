"""External-CPU contention probe for the bench harness.

BENCH_r04 and BENCH_r05 were both recorded under host contention and
overstated every query by 26-37% (VERDICT r5 "What's wrong" #1). The r4
fix gated on `os.getloadavg()` BEFORE warm-up, but contention arriving
mid-run is invisible to a start gate — and in-run loadavg cannot tell our
own local[32] burst (which alone drives the 1-min load past 6) from a
co-tenant's work.

This probe measures the thing that actually contaminates a timing window:
CPU time consumed by processes OUTSIDE our own process tree during the
window. Two counters from /proc, sampled before and after each query:

- total busy jiffies across all CPUs (/proc/stat `cpu` line:
  user+nice+system+irq+softirq+steal — idle/iowait excluded);
- busy jiffies of OUR subtree: every /proc/<pid> whose parent chain leads
  to this process (the Python driver, the Spark JVM it launched, any
  Arrow/Pandas UDF workers), plus our own reaped-children counters.

external_cores = (Δtotal - Δsubtree) / ticks_per_sec / wall_seconds — the
average number of cores other tenants burned during the window. 0.0 on an
idle host regardless of how hard the bench itself runs; a query whose
window shows > ~1.5 external cores was measured under contention and its
timing is not comparable across rounds.
"""

from __future__ import annotations

import os

_TICKS = os.sysconf("SC_CLK_TCK")


def total_busy_jiffies() -> int:
    """System-wide busy jiffies summed over all CPUs (idle+iowait excluded)."""
    with open("/proc/stat") as f:
        parts = f.readline().split()
    # cpu user nice system idle iowait irq softirq steal [guest guest_nice]
    vals = [int(x) for x in parts[1:11]]
    idle = vals[3] + (vals[4] if len(vals) > 4 else 0)
    return sum(vals[:8]) - idle


def _read_stat(pid: str) -> tuple[int, int] | None:
    """(ppid, utime+stime) for a pid, or None if it vanished mid-read.
    comm may contain spaces/parens, so parse from the LAST ')'."""
    try:
        with open(f"/proc/{pid}/stat", "rb") as f:
            raw = f.read()
    except OSError:
        return None
    rp = raw.rfind(b")")
    if rp < 0:
        return None
    rest = raw[rp + 2 :].split()
    if len(rest) < 13:
        return None
    # after comm: state ppid pgrp session tty tpgid flags minflt cminflt
    # majflt cmajflt utime stime  -> indices 1, 11, 12
    return int(rest[1]), int(rest[11]) + int(rest[12])


def subtree_busy_jiffies(root_pid: int | None = None) -> int:
    """Busy jiffies of root_pid's process subtree (default: this process),
    plus the root's reaped-children counters (cutime+cstime) so short-lived
    helpers that already exited still count as OURS, not as contention."""
    root = root_pid if root_pid is not None else os.getpid()
    stats: dict[int, tuple[int, int]] = {}
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        st = _read_stat(pid)
        if st is not None:
            stats[int(pid)] = st
    children: dict[int, list[int]] = {}
    for pid, (ppid, _) in stats.items():
        children.setdefault(ppid, []).append(pid)
    total = 0
    stack = [root]
    seen = set()
    while stack:
        p = stack.pop()
        if p in seen:
            continue
        seen.add(p)
        if p in stats:
            total += stats[p][1]
        stack.extend(children.get(p, ()))
    # reaped children of the root (waited-for subprocesses)
    try:
        with open(f"/proc/{root}/stat", "rb") as f:
            raw = f.read()
        rest = raw[raw.rfind(b")") + 2 :].split()
        total += int(rest[13]) + int(rest[14])  # cutime, cstime
    except (OSError, IndexError, ValueError):
        pass
    return total


class ContentionWindow:
    """Bracket a measurement window; `.external_cores(wall)` afterwards."""

    def __init__(self) -> None:
        self.busy0 = total_busy_jiffies()
        self.sub0 = subtree_busy_jiffies()

    def external_cores(self, wall_sec: float) -> float:
        d_total = total_busy_jiffies() - self.busy0
        d_sub = subtree_busy_jiffies() - self.sub0
        if wall_sec <= 0:
            return 0.0
        return max(0.0, (d_total - d_sub) / _TICKS / wall_sec)
