"""Property-based pins for the algebraic identities behind the set-based
operators added in round 4's later waves. These test the MATH at thousands
of random cases (pure Python — no Spark session), complementing the
fixture pins and streaming-parity tests that cover the Spark expressions:

- reflection identity  (olap_clamped_running_balance)
- grid-bin overlap dedup rule  (ext_interval_overlap_pairs)
- cumulative-range FIFO staircase  (olap_fifo_allocation)
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=500, deadline=None)
@given(st.lists(st.integers(min_value=-50, max_value=50), max_size=60))
def test_reflection_identity_matches_clamped_walk(deltas):
    """balance_t = prefix_t − min(0, running-min(prefix)) ≡
    balance_t = max(0, balance_{t−1} + delta_t)."""
    bal, pre, mn = 0, 0, 0
    for d in deltas:
        bal = max(0, bal + d)
        pre += d
        mn = min(mn, pre)
        assert bal == pre - min(0, mn)


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=200),  # start
            st.integers(min_value=1, max_value=30),  # length ≤ bin width
        ),
        min_size=2,
        max_size=40,
    ),
    st.integers(min_value=30, max_value=64),  # bin width ≥ max length
)
def test_grid_bin_rule_counts_each_overlap_once(spans, B):
    """Every truly-overlapping pair is counted in EXACTLY one bin — the
    bin containing max(start_a, start_b) — and non-overlapping pairs in
    none, for any bin width ≥ the interval length cap."""
    iv = [(i, s, s + ln) for i, (s, ln) in enumerate(spans)]
    naive = {
        (a[0], b[0])
        for a in iv
        for b in iv
        if a[0] < b[0] and a[1] < b[2] and b[1] < a[2]
    }
    binned = {}
    for a in iv:
        for b in iv:
            if a[0] >= b[0]:
                continue
            for bin_ in range(a[1] // B, (a[2] - 1) // B + 1):
                if not (b[1] // B <= bin_ <= (b[2] - 1) // B):
                    continue  # not a shared bin
                if not (a[1] < b[2] and b[1] < a[2]):
                    continue  # candidate, not a true overlap
                if bin_ == max(a[1], b[1]) // B:
                    binned[(a[0], b[0])] = binned.get((a[0], b[0]), 0) + 1
    assert set(binned) == naive
    assert all(v == 1 for v in binned.values())


@settings(max_examples=300, deadline=None)
@given(
    st.lists(st.integers(min_value=1, max_value=20), min_size=1, max_size=20),
    st.lists(st.integers(min_value=1, max_value=20), min_size=1, max_size=20),
)
def test_fifo_staircase_equals_pointer_walk(lots, sales):
    """Cumulative-range overlap lengths ≡ the sequential FIFO pointer
    walk, for arbitrary lot/sale quantity sequences."""
    # set-based: cumulative ranges + overlap length
    lo_l, ranges_l = 0, []
    for i, q in enumerate(lots):
        ranges_l.append((i, lo_l, lo_l + q))
        lo_l += q
    lo_s, ranges_s = 0, []
    for j, q in enumerate(sales):
        ranges_s.append((j, lo_s, lo_s + q))
        lo_s += q
    set_based = {
        (j, i): min(se, le) - max(ss, ls)
        for (j, ss, se) in ranges_s
        for (i, ls, le) in ranges_l
        if ss < le and ls < se
    }
    # sequential walk
    walk = {}
    li, left = 0, None
    for j, q in enumerate(sales):
        need = q
        while need > 0 and li < len(lots):
            if left is None:
                left = lots[li]
            take = min(need, left)
            walk[(j, li)] = walk.get((j, li), 0) + take
            need -= take
            left -= take
            if left == 0:
                li, left = li + 1, None
    assert set_based == walk
