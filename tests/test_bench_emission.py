"""bench.py emission contract (VERDICT r4 #1): the driver's perf capture
must be impossible to zero out — a kill at ANY moment after the first
section leaves a parseable one-line JSON record on stdout.

BENCH_r04.json was ``rc=124, parsed: null``: the old bench printed its one
JSON line only at the very end, so a transient tunnel stall erased the
whole round's perf evidence even though the same HEAD benched fine. These
tests kill a tiny-shape bench subprocess mid-run (SIGTERM — the ``timeout``
path — and SIGKILL, which no handler can catch) and assert a parseable
snapshot survived either way.
"""

import json
import os
import select
import signal
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCHEMA_KEYS = {"metric", "value", "unit", "vs_baseline", "extra"}


def _spawn(budget: str):
    env = dict(os.environ)
    env["MULTINN_BENCH_TINY"] = "1"
    env["MULTINN_BENCH_BUDGET_S"] = budget
    env["JAX_PLATFORMS"] = "cpu"          # sec_setup honors this explicitly
    return subprocess.Popen(
        [sys.executable, os.path.join(REPO, "bench.py")],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, cwd=REPO,
        env=env)


def _read_until_lines(proc, n_lines: int, timeout_s: float):
    """Accumulate stdout until >= n_lines complete lines (or timeout);
    non-blocking reads so a silent child can't hang the test."""
    buf = b""
    deadline = time.time() + timeout_s
    fd = proc.stdout.fileno()
    while buf.count(b"\n") < n_lines:
        left = deadline - time.time()
        n_got = buf.count(b"\n")
        assert left > 0, (f"bench child produced only "
                          f"{n_got} lines in {timeout_s}s")
        r, _, _ = select.select([fd], [], [], min(left, 1.0))
        if r:
            chunk = os.read(fd, 65536)
            if not chunk:
                break
            buf += chunk
    return buf


def _drain(proc, timeout_s=30.0):
    buf = b""
    fd = proc.stdout.fileno()
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        r, _, _ = select.select([fd], [], [], 0.5)
        if not r:
            if proc.poll() is not None:
                break
            continue
        chunk = os.read(fd, 65536)
        if not chunk:
            break
        buf += chunk
    return buf


def _last_json_line(raw: bytes) -> dict:
    lines = [ln for ln in raw.decode().splitlines() if ln.strip()]
    assert lines, "no stdout lines survived"
    rec = json.loads(lines[-1])
    assert SCHEMA_KEYS <= set(rec), rec.keys()
    return rec


def test_bench_sigterm_flushes_record():
    """SIGTERM mid-run (what the driver's ``timeout`` sends): the handler
    flushes the aggregate-so-far and exits 0."""
    proc = _spawn(budget="300")
    try:
        # one snapshot line (post-setup) is enough to prove the handler
        # flush contract; the SIGKILL test (slow tier) waits for a
        # driver-axis line
        head = _read_until_lines(proc, 1, timeout_s=240)
        proc.send_signal(signal.SIGTERM)
        rc = proc.wait(timeout=60)
        raw = head + _drain(proc)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait(timeout=30)
    rec = _last_json_line(raw)
    # the child normally dies mid-run ("signal:SIGTERM" via the flush
    # handler); on a very fast box it may complete all tiny sections
    # before the signal lands — either way the kill-proof contract holds:
    # rc 0 and a parseable final record
    status = rec["extra"]["budget"]["status"]
    assert status.startswith("signal:") or status == "complete", rec
    # at least the setup section completed before the kill
    assert rec["extra"]["sections"], rec
    assert rc == 0, rc   # a record was delivered — not a failure exit


@pytest.mark.slow
def test_bench_sigkill_leaves_snapshot():
    """SIGKILL (uncatchable): the per-section incremental emission alone
    must leave a parseable snapshot on stdout."""
    proc = _spawn(budget="300")
    try:
        head = _read_until_lines(proc, 2, timeout_s=240)
        proc.kill()
        proc.wait(timeout=30)
    finally:
        if proc.poll() is None:
            proc.wait(timeout=30)
    raw = head + _drain(proc, timeout_s=5.0)
    # SIGKILL can land mid-print and tear the final line — the contract is
    # that the last COMPLETE line parses; drop any torn tail
    raw = raw[:raw.rfind(b"\n") + 1]
    rec = _last_json_line(raw)
    # the second snapshot carries the first driver axis already
    statuses = {s["status"] for s in rec["extra"]["sections"].values()}
    assert "ok" in statuses, rec["extra"]["sections"]


def test_bench_budget_exhausted_still_reports():
    """A zero budget skips every section but still emits schema-valid
    snapshots and exits 0 — the budget path can't zero out the record
    either. (Near-free: no section body ever runs.)"""
    proc = _spawn(budget="0.5")
    raw = _drain(proc, timeout_s=60.0)
    rc = proc.wait(timeout=30)
    rec = _last_json_line(raw)
    assert rc == 0
    assert rec["extra"]["budget"]["status"] == "budget_exhausted"
    assert all(s["status"] == "skipped_budget"
               for s in rec["extra"]["sections"].values())
