"""Funnel / Markov-transition / retention operators vs brute-force
Python oracles on a hand-built event log: strict-order funnel semantics
(an out-of-order step does NOT count), timestamp-tie rules, transition
row-normalization, and cohort-offset bookkeeping."""

from datetime import datetime, timedelta

import pytest

from subgraph_isomorphism_pregel_spark.operators.funnel import (
    funnel,
    markov_transitions,
    retention_cohorts,
)

T0 = datetime(2024, 1, 1)


def ts(minutes):
    return T0 + timedelta(minutes=minutes)


ROWS = [
    # (event_id, user_id, ts, event_type)
    # user 1: clean view -> click -> purchase
    (1, 1, ts(0), "view"),
    (2, 1, ts(5), "click"),
    (3, 1, ts(10), "purchase"),
    # user 2: click BEFORE view — click must not count; later click does
    (4, 2, ts(0), "click"),
    (5, 2, ts(5), "view"),
    (6, 2, ts(9), "click"),
    # user 3: view and click at the SAME timestamp — strict > rejects it
    (7, 3, ts(0), "view"),
    (8, 3, ts(0), "click"),
    (9, 3, ts(1), "purchase"),  # no completed click step -> no purchase step
    # user 4: view only
    (10, 4, ts(2), "view"),
    # user 5: purchase with no funnel prefix
    (11, 5, ts(3), "purchase"),
    # user 1 extra noise after completion
    (12, 1, ts(20), "view"),
]


@pytest.fixture(scope="module")
def events(spark):
    return spark.createDataFrame(
        [(e, u, t, et, 0.0) for e, u, t, et in ROWS],
        "event_id long, user_id long, ts timestamp, event_type string, value double",
    ).cache()


def test_funnel_strict_order(events):
    out = funnel(events, ["view", "click", "purchase"]).collect()
    got = {(r.step_no, r.step): (r.users, r.conv_r) for r in out}
    # step 1: users 1,2,3,4 have a view
    assert got[(1, "view")] == (4, 1.0)
    # step 2: user 1 (click@5 > view@0), user 2 (click@9 > view@5);
    # user 3's click ties its view (strict >) -> excluded
    assert got[(2, "click")] == (2, 0.5)
    # step 3: only user 1 purchases after a completed click
    assert got[(3, "purchase")] == (1, 0.25)


def test_funnel_single_step_and_empty(events):
    one = funnel(events, ["purchase"]).collect()
    assert len(one) == 1 and one[0].users == 3 and one[0].conv_r == 1.0
    none = funnel(events, ["signup", "view"]).collect()
    assert [r.users for r in none] == [0, 0]
    with pytest.raises(ValueError):
        funnel(events, [])


def brute_transitions(rows):
    from collections import Counter, defaultdict

    by_user = defaultdict(list)
    for e, u, t, et in rows:
        by_user[u].append((t, e, et))
    cnt = Counter()
    for seq in by_user.values():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            cnt[(a, b)] += 1
    tot = Counter()
    for (a, _), n in cnt.items():
        tot[a] += n
    return {k: (n, round(n / tot[k[0]], 6)) for k, n in cnt.items()}

def test_markov_transitions_matches_brute(events):
    out = markov_transitions(events).collect()
    got = {(r.prev_type, r.next_type): (r.n, r.prob_r) for r in out}
    assert got == brute_transitions(ROWS)
    # row-normalization: probabilities per prev_type sum to ~1
    from collections import defaultdict

    sums = defaultdict(float)
    for (a, _), (_, p) in got.items():
        sums[a] += p
    assert all(abs(s - 1.0) < 1e-5 for s in sums.values())


def test_markov_tie_breaks_on_event_id(spark):
    ev = spark.createDataFrame(
        [(1, 9, ts(0), "a", 0.0), (2, 9, ts(0), "b", 0.0), (3, 9, ts(1), "c", 0.0)],
        "event_id long, user_id long, ts timestamp, event_type string, value double",
    )
    got = {(r.prev_type, r.next_type) for r in markov_transitions(ev).collect()}
    assert got == {("a", "b"), ("b", "c")}


def test_retention_cohorts(spark):
    day = 24 * 60
    ev = spark.createDataFrame(
        [
            # user 1: first on day 0, active days 0, 1, 3 (two events day 1)
            (1, 1, ts(10), "view", 0.0),
            (2, 1, ts(day + 5), "click", 0.0),
            (3, 1, ts(day + 50), "view", 0.0),
            (4, 1, ts(3 * day + 1), "view", 0.0),
            # user 2: first on day 1, active days 1, 2
            (5, 2, ts(day + 9), "view", 0.0),
            (6, 2, ts(2 * day + 9), "view", 0.0),
            # user 3: only day 0
            (7, 3, ts(30), "view", 0.0),
        ],
        "event_id long, user_id long, ts timestamp, event_type string, value double",
    )
    base = T0.toordinal() - datetime(1970, 1, 1).toordinal()
    got = {
        (r.cohort_day - base, r.offset_day): r.users
        for r in retention_cohorts(ev).collect()
    }
    assert got == {
        (0, 0): 2,  # users 1 and 3 in the day-0 cohort
        (0, 1): 1,
        (0, 3): 1,
        (1, 0): 1,  # user 2 cohort day 1
        (1, 1): 1,
    }
