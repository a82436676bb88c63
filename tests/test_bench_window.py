"""Pins bench.py's window calibration (r14 VERDICT finding 1): the
/proc/stat snapshot-delta window must SEPARATE our own process tree's CPU
from other tenants' — that separation is what lets a committed bench JSON
prove (or indict) host contention the short pre-run probes can't see."""

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench

_BURN = "import time\nend = time.time() + 3\nwhile time.time() < end: pass"


def test_window_counts_own_tree_as_own():
    """A burner that IS our child (like the Spark JVM) lands in own_cores,
    not other_cores — our own 32-way queries must never read as foreign
    load."""
    p = subprocess.Popen([sys.executable, "-c", _BURN])
    try:
        w = bench._Window()
        time.sleep(2.5)
        r = w.close()
    finally:
        p.wait()
    assert r["own_cores"] > 0.5, r


def test_window_counts_reaped_child_as_own():
    """A short-lived child that burns and EXITS inside the window (like a
    non-reused PySpark worker killed mid-window) still lands in own_cores
    via cutime/cstime (r15 ADVICE): on reap its jiffies vanish from the
    live-descendant walk, and without the children counters they would be
    misattributed to other_cores, falsely indicting a clean run."""
    w = bench._Window()
    p = subprocess.Popen([sys.executable, "-c", _BURN])
    p.wait()  # reaped INSIDE the window -> only cutime/cstime still see it
    time.sleep(0.3)
    r = w.close()
    assert r["own_cores"] > 0.5, r


def test_window_detects_external_load():
    """A burner reparented OUTSIDE our tree (double-fork) lands in
    other_cores — the r14 failure mode (co-tenant load inflating
    wall-clocks while the probe scalar read 'host at reference speed')
    is now measured, not adjudicated."""
    outer = (
        "import subprocess, sys; "
        f"subprocess.Popen([sys.executable, '-c', {_BURN!r}])"
    )
    p = subprocess.Popen([sys.executable, "-c", outer])
    p.wait()  # middle process exits -> burner reparents away from our tree
    w = bench._Window()
    time.sleep(2.5)
    r = w.close()
    assert r["other_cores"] > 0.5, r


def test_prestat_gate_catches_planted_burner():
    """r16 VERDICT task 2: a planted burner core (the r15 trick — CPU load
    the loadavg gate needs a minute to even see) must trip the PRE-RUN
    /proc/stat gate, i.e. read as other_cores >= PRESTAT_MAX_OTHER in the
    sample taken BEFORE timing starts. One full foreign core over a 1.5 s
    sample reads ~1.0 >= 0.75."""
    burn = "import time\nend = time.time() + 2.5\nwhile time.time() < end: pass"
    outer = (
        "import subprocess, sys; "
        f"subprocess.Popen([sys.executable, '-c', {burn!r}])"
    )
    p = subprocess.Popen([sys.executable, "-c", outer])
    p.wait()  # reparented away from our tree -> foreign load
    time.sleep(0.3)  # let the burner spin up past interpreter start
    stat = bench._prestat_sample(sec=1.5)
    assert stat["other_cores"] >= bench.PRESTAT_MAX_OTHER, stat


def test_prestat_gate_passes_clean_box():
    """The converse: with no planted load the sample must come in under
    the gate, or every clean bench run would hang in the wait loop.
    Retried a few times, then SKIPPED rather than failed when the box
    shows real foreign load for the whole window — that is the gate doing
    its job on a genuinely dirty host, not a bug in the gate."""
    import pytest

    last = None
    for _ in range(5):
        last = bench._prestat_sample(sec=1.0)
        if last["other_cores"] < bench.PRESTAT_MAX_OTHER:
            return
    pytest.skip(f"host busy for the whole retry window: {last}")
