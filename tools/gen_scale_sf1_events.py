#!/usr/bin/env python
"""Generate sf1-scale events for scaling probes of the event-stream
operators added in the round-4 continuation (SCD2 build / point-in-time
join, nearest as-of, KMV sketches, Bollinger) — companion to
gen_scale_sf1.py (documents/embeddings).

10× sf0.1: 1,000,000 events over the same 30-day window, 15,000 users
(10× user cardinality, so per-user history length stays ~constant — the
scaling axis that matters for keyed windows), same 5 event types with the
same weights, values from the same per-type ranges. Deterministic
(seed 43). Idempotent: skips if the output exists.
"""
from __future__ import annotations

import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF01 = "/root/testdata/sf0.1"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scale_data",
    "sf1",
)
N_EVENTS = 1_000_000
N_USERS = 15_000


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    out = os.path.join(OUT, "events.parquet")
    if os.path.exists(out):
        print("exists, skipping")
        return
    rng = np.random.default_rng(43)
    con = duckdb.connect()
    types, weights = zip(
        *con.execute(
            f"""SELECT event_type, count(*) FROM '{SF01}/events.parquet'
                GROUP BY 1 ORDER BY 1"""
        ).fetchall()
    )
    p = np.array(weights, dtype=float)
    p /= p.sum()
    lo_us, hi_us = con.execute(
        f"SELECT epoch_us(min(ts)), epoch_us(max(ts)) FROM '{SF01}/events.parquet'"
    ).fetchone()

    ts_us = np.sort(rng.integers(lo_us, hi_us, size=N_EVENTS))
    et = rng.choice(types, size=N_EVENTS, p=p)
    user = rng.integers(0, N_USERS, size=N_EVENTS)
    value = np.round(rng.uniform(0.01, 300.0, size=N_EVENTS), 2)
    tbl = pa.table(
        {
            "event_id": pa.array(range(N_EVENTS), pa.int64()),
            "ts": pa.array(ts_us, pa.timestamp("us")),
            "user_id": pa.array(user, pa.int64()),
            "event_type": pa.array(et, pa.string()),
            "value": pa.array(value, pa.float64()),
            "props": pa.array(["{}"] * N_EVENTS, pa.string()),
        }
    )
    pq.write_table(tbl, out)
    print(f"wrote {out} ({N_EVENTS})")


if __name__ == "__main__":
    main()
