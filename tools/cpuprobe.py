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

- USER-space jiffies across all CPUs (/proc/stat `cpu` line: user+nice+
  steal — system/irq/softirq/iowait excluded ON PURPOSE, see below);
- user jiffies (utime) of OUR subtree: every /proc/<pid> whose parent
  chain leads to this process (the Python driver, the Spark JVM it
  launched, any Arrow/Pandas UDF workers), plus our own reaped-children
  utime.

external_cores = (Δtotal_user - Δsubtree_user) / ticks / wall_seconds —
the average number of cores other tenants burned during the window.

Why user-space only (VERDICT r6 #3): the first version compared TOTAL busy
jiffies against the subtree's utime+stime. Kernel-side work our own
shuffle/IO generates — kworker writeback, softirq net/block handling — is
charged to kernel threads OUTSIDE our process tree, so Δtotal − Δsubtree
read our own kernel load as co-tenant contention: an idle-host run tripped
the 1.5-core gate on five shuffle-heavy queries and self-flagged at 2.06
"external" cores. The container's cgroup is the v1 root here, so cgroup
cpu.stat cannot attribute either. Comparing user-space to user-space makes
the probe exact for the contamination that matters (a co-tenant's compute
burst is ~all utime) and blind only to co-tenant *kernel* time — the rare
case, and strictly better than misreading ourselves. 0.0 on an idle host
regardless of how hard the bench itself runs; a query whose window shows
> ~1.5 external cores was measured under contention and its timing is not
comparable across rounds.
"""

from __future__ import annotations

import os

_TICKS = os.sysconf("SC_CLK_TCK")


def total_busy_jiffies() -> int:
    """System-wide USER-space jiffies summed over all CPUs (user+nice+steal;
    system/irq/softirq/idle/iowait excluded — kernel time is unattributable
    to a process tree, see module docstring)."""
    with open("/proc/stat") as f:
        parts = f.readline().split()
    # cpu user nice system idle iowait irq softirq steal [guest guest_nice]
    vals = [int(x) for x in parts[1:11]]
    steal = vals[7] if len(vals) > 7 else 0
    return vals[0] + vals[1] + steal


def _read_stat(pid: str) -> tuple[int, int] | None:
    """(ppid, utime) for a pid, or None if it vanished mid-read.
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
    # majflt cmajflt utime stime  -> indices 1, 11 (utime only: the total
    # side counts only user jiffies, so stime must not be subtracted)
    return int(rest[1]), int(rest[11])


def subtree_busy_jiffies(root_pid: int | None = None) -> int:
    """User jiffies of root_pid's process subtree (default: this process),
    plus the root's reaped-children cutime so short-lived helpers that
    already exited still count as OURS, not as contention."""
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
        total += int(rest[13])  # cutime (user only, matching the total side)
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
