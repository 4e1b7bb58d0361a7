#!/usr/bin/env python
"""Commit throughput of the CAS arbiter under writer contention (round 7).

The round-7 arbiter (operators/table_store.py::LocalCASArbiter) replaces
the POSIX lock with put-if-absent sequence files. The protocol
serializes the commit POINT (one fsync'd conditional PUT per commit, a
loser's PUT wasted per retry), not the writers' WORK — so the numbers to
watch are (a) liveness: every configuration finishes with a dense,
single-valued log and no writer ever parks on a lock, and (b) the
per-commit protocol cost, which is fsync-bound and therefore DROPS in
aggregate as contending writers queue on the directory journal. That is
the same shape as Delta's commit story: table commit rate is the
serial bottleneck by design; data throughput scales in the work BETWEEN
commits (a deployment commit carries seconds of merge behind it, so
tens-of-ms protocol cost is noise — and losers there recompute a merge
before retrying rather than spinning, unlike this worst-case probe).

W writer threads each drive the full CAS loop (read head → claim next
sequence → PUT → on loss, retry immediately) until TOTAL commits land;
reports commits/s and the loser-retry ratio at W = 1, 2, 4, 8.

Threads, not processes: put_if_absent is syscall-bound (write+fsync+link
release the GIL), and the cross-PROCESS correctness race is already
pinned by tests/test_sinks_serving.py's multiprocess suites. Prints one
JSON line.
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import threading
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from realtime_datawarehouse_spark.operators.table_store import (  # noqa: E402
    LocalCASArbiter,
)

TOTAL = 120  # commits per configuration


def run(writers: int) -> dict:
    arb = LocalCASArbiter()
    with tempfile.TemporaryDirectory() as path:
        committed = threading.Semaphore(TOTAL)  # tickets
        attempts = [0] * writers
        done = [0] * writers
        start = threading.Barrier(writers + 1)

        def writer(i: int) -> None:
            start.wait()
            while committed.acquire(blocking=False):
                while True:
                    seq = arb.head(path)[0] + 1
                    attempts[i] += 1
                    if arb.put_if_absent(path, seq, f"w{i}-v{seq}"):
                        done[i] += 1
                        break

        threads = [
            threading.Thread(target=writer, args=(i,))
            for i in range(writers)
        ]
        for t in threads:
            t.start()
        start.wait()
        t0 = time.perf_counter()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        log = arb.committed(path)
        assert sorted(log) == list(range(1, TOTAL + 1)), "log not dense"
        assert sum(done) == TOTAL
        return {
            "writers": writers,
            "commits_per_s": round(TOTAL / wall, 1),
            "retry_ratio": round(sum(attempts) / TOTAL, 3),
        }


def main() -> None:
    out = {"total_commits": TOTAL, "runs": [run(w) for w in (1, 2, 4, 8)]}
    base = out["runs"][0]["commits_per_s"]
    out["throughput_vs_single_writer"] = [
        round(r["commits_per_s"] / base, 2) for r in out["runs"]
    ]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
