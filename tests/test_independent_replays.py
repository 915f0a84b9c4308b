"""Independent first-principles replays (round 10).

The round-10 lesson: a query and its DuckDB oracle written by the same
hand share one mental model, so oracle parity proves CONSISTENCY, not
correctness — a semantic mistake mirrored on both sides stays green
forever (the lag-7 ACF row-offset bug survived exactly this way until
an independent replay caught it). This module re-derives a few
analytics queries from their TEXTBOOK definitions in plain Python over
the raw rows — no windows, no SQL, no shared code with the builders —
and checks the Spark results against that.

Replayed here (chosen because each has a canonical external
definition AND a non-obvious distributed formulation that could
plausibly diverge from it):

- two-sample Kolmogorov-Smirnov (`price_ks_drift`): sup over the
  combined support of |F1 - F2| vs the window-cumsum construction;
- CUSUM (`user_value_cusum`): the clipped fold max(0, s + d) vs the
  prefix-sum identity S - min(0, running-min S);
- Holt smoothing (`nation_revenue_holt`): the textbook level/trend
  recurrence vs the struct-accumulator array fold;
- Benford (`orders_benford_deviation`): leading digit from the decimal
  STRING vs the float log10/power construction;
- association rules (`part_association_rules`): exact-Fraction
  support/confidence/lift from basket sets + the top-20 lift cutoff.

Tolerances: integer outputs exact; doubles to 1e-6 (the queries round
to 4-6 dp, the replays don't — semantic agreement, not bit parity,
is the claim under test here; bit parity is the oracle gate's job).
"""

from __future__ import annotations

from collections import defaultdict
from fractions import Fraction

from biodiversity_data_ingestion_spark.plans.queries import QUERIES
from biodiversity_data_ingestion_spark.sources.tables import load_table

from .conftest import SMOKE_DIR


def test_ks_drift_matches_textbook_definition(spark):
    rows = (
        load_table(spark, SMOKE_DIR, "orders")
        .select("o_orderpriority", "o_totalprice", "o_orderdate")
        .collect()
    )
    samples: dict[str, dict[int, list[float]]] = defaultdict(
        lambda: {1995: [], 1996: []}
    )
    for r in rows:
        y = r["o_orderdate"].year
        if y in (1995, 1996):
            samples[r["o_orderpriority"]][y].append(r["o_totalprice"])

    def ks(a: list[float], b: list[float]) -> Fraction:
        best = Fraction(0)
        sa, sb = sorted(a), sorted(b)
        for v in sorted(set(sa) | set(sb)):
            fa = Fraction(sum(1 for x in sa if x <= v), len(sa))
            fb = Fraction(sum(1 for x in sb if x <= v), len(sb))
            best = max(best, abs(fa - fb))
        return best

    got = {
        r["o_orderpriority"]: r["ks"]
        for r in QUERIES["price_ks_drift"]["builder"](spark, SMOKE_DIR).collect()
    }
    assert set(got) == set(samples)
    for prio, s in samples.items():
        want = float(ks(s[1995], s[1996]))
        assert abs(got[prio] - want) <= 1e-6, (prio, got[prio], want)


def test_cusum_matches_clipped_fold_definition(spark):
    rows = (
        load_table(spark, SMOKE_DIR, "events")
        .select("user_id", "ts", "event_id", "value")
        .collect()
    )
    by_user: dict = defaultdict(list)
    for r in rows:
        by_user[r["user_id"]].append((r["ts"], r["event_id"], r["value"]))

    want = {}
    for u, evs in by_user.items():
        evs.sort(key=lambda t: (t[0], t[1]))
        s = 0
        alerts = 0
        for _, _, v in evs:
            d = round(v * 100) - 500  # integer cents minus k=5.00
            s = max(0, s + d)  # the TEXTBOOK clipped CUSUM fold
            if s > 2000:
                alerts += 1
        want[u] = (len(evs), s, alerts)

    for r in QUERIES["user_value_cusum"]["builder"](spark, SMOKE_DIR).collect():
        n, s_cents, alerts = want[r["user_id"]]
        assert r["n_events"] == n
        assert r["n_alerts"] == alerts
        # compare in exact cents (final_cusum is round(s/100, 2))
        assert round(r["final_cusum"] * 100) == s_cents, (
            r["user_id"], r["final_cusum"], s_cents,
        )


def test_holt_matches_textbook_recurrence(spark):
    o = load_table(spark, SMOKE_DIR, "orders").collect()
    c = {
        r["c_custkey"]: r["c_nationkey"]
        for r in load_table(spark, SMOKE_DIR, "customer").collect()
    }
    n = {
        r["n_nationkey"]: r["n_name"]
        for r in load_table(spark, SMOKE_DIR, "nation").collect()
    }
    cents: dict = defaultdict(lambda: defaultdict(int))
    for r in o:
        name = n[c[r["o_custkey"]]]
        month = (r["o_orderdate"].year, r["o_orderdate"].month)
        cents[name][month] += round(r["o_totalprice"] * 100)

    want = {}
    for name, months in cents.items():
        ys = [
            float(Fraction(months[m], 100))
            for m in sorted(months)
        ]
        l, b = ys[0], 0.0
        for y in ys[1:]:  # textbook Holt: alpha=0.5, beta=0.3
            l_new = 0.5 * y + 0.5 * (l + b)
            b = 0.3 * (l_new - l) + 0.7 * b
            l = l_new
        want[name] = (len(ys), l, b)

    for r in QUERIES["nation_revenue_holt"]["builder"](spark, SMOKE_DIR).collect():
        n_months, l, b = want[r["n_name"]]
        assert r["n_months"] == n_months
        assert abs(r["level"] - l) <= 1e-4 + 1e-9
        assert abs(r["trend"] - b) <= 1e-4 + 1e-9
        assert abs(r["forecast_next"] - (l + b)) <= 1e-4 + 1e-9


def test_benford_matches_leading_digit_definition(spark):
    # replay the leading digit from the DECIMAL STRING (the definition)
    # rather than the builder's float log10/power construction — if the
    # float path ever misassigns a digit at a power-of-ten boundary,
    # this catches it
    import math

    rows = (
        load_table(spark, SMOKE_DIR, "orders")
        .select("o_totalprice")
        .collect()
    )
    obs: dict[int, int] = defaultdict(int)
    for r in rows:
        v = r["o_totalprice"]
        if v > 0:
            lead = next(ch for ch in f"{v:.2f}" if ch.isdigit() and ch != "0")
            obs[int(lead)] += 1
    n = sum(obs.values())

    got = {
        r["digit"]: r
        for r in QUERIES["orders_benford_deviation"]["builder"](
            spark, SMOKE_DIR
        ).collect()
    }
    assert set(got) == set(obs)
    for d, cnt in obs.items():
        exp = n * math.log10(1.0 + 1.0 / d)
        assert got[d]["obs"] == cnt, (d, got[d]["obs"], cnt)
        assert abs(got[d]["expected"] - exp) <= 5e-3 + 1e-9
        assert abs(got[d]["chi2_term"] - (cnt - exp) ** 2 / exp) <= 5e-5 + 1e-9


def test_association_rules_match_basket_definitions(spark):
    # support / confidence / lift from first-principles basket sets
    # (exact Fractions), and the returned 20 rules must clear the
    # 20th-highest exact lift among all qualifying rules
    rows = (
        load_table(spark, SMOKE_DIR, "lineitem")
        .select("l_orderkey", "l_partkey")
        .collect()
    )
    baskets: dict = defaultdict(set)
    for r in rows:
        baskets[r["l_orderkey"]].add(r["l_partkey"])
    nb = len(baskets)
    item: dict[int, int] = defaultdict(int)
    pair: dict[tuple, int] = defaultdict(int)
    for parts in baskets.values():
        for p in parts:
            item[p] += 1
        ps = sorted(parts)
        for i, a in enumerate(ps):
            for b in ps[i + 1:]:
                pair[(a, b)] += 1

    def exact(a: int, b: int):
        pc = pair[(min(a, b), max(a, b))]
        return (
            pc,
            Fraction(pc, nb),
            Fraction(pc, item[a]),
            Fraction(pc * nb, item[a] * item[b]),
        )

    lifts = sorted(
        (
            Fraction(pc * nb, item[a] * item[b])
            for (a, b), pc in pair.items()
            if pc >= 3
            for _ in (0, 1)  # both rule directions share the lift
        ),
        reverse=True,
    )
    cutoff = lifts[19] if len(lifts) >= 20 else lifts[-1]

    out = QUERIES["part_association_rules"]["builder"](
        spark, SMOKE_DIR
    ).collect()
    assert 0 < len(out) <= 20
    for r in out:
        pc, sup, conf, lift = exact(r["a"], r["b"])
        assert r["n_co"] == pc and pc >= 3
        assert abs(r["support"] - float(sup)) <= 1e-6
        assert abs(r["confidence"] - float(conf)) <= 1e-6
        assert abs(r["lift"] - float(lift)) <= 1e-6
        assert lift >= cutoff - Fraction(1, 10**6)
