"""Property-based checks (SURVEY §5.4): invariants the reference relies
on implicitly, verified over generated inputs."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from biodiversity_data_ingestion_spark.operators import cleaning, dedup
from biodiversity_data_ingestion_spark.operators.classify import classify

from .conftest import SF_DIR

coord = st.one_of(
    st.floats(min_value=-200, max_value=200, allow_nan=False),
    st.just(0.0),
)
rows = st.lists(
    st.tuples(st.integers(0, 99), coord, coord, st.floats(0, 9000, allow_nan=False)),
    min_size=0,
    max_size=30,
)

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


@given(data=rows)
@settings(**_SETTINGS)
def test_cleaning_filters_idempotent_and_order_free(spark_prop, data):
    df = spark_prop.createDataFrame(
        data or [(0, 1.0, 1.0, 2000.0)],
        "id INT, lat DOUBLE, lon DOUBLE, unc DOUBLE",
    )

    def chain_a(d):
        d = cleaning.drop_zero_coords(d, "lat", "lon")
        d = cleaning.drop_out_of_range(d, "lat", "lon")
        return cleaning.filter_uncertainty(d, "unc")

    def chain_b(d):  # different order
        d = cleaning.filter_uncertainty(d, "unc")
        d = cleaning.drop_out_of_range(d, "lat", "lon")
        return cleaning.drop_zero_coords(d, "lat", "lon")

    once = {tuple(r) for r in chain_a(df).collect()}
    twice = {tuple(r) for r in chain_a(chain_a(df)).collect()}
    reordered = {tuple(r) for r in chain_b(df).collect()}
    assert once == twice == reordered


@given(data=st.lists(st.tuples(st.integers(0, 50), st.sampled_from("abcd")), max_size=30))
@settings(**_SETTINGS)
def test_classify_partitions_input(spark_prop, data):
    df = spark_prop.createDataFrame(data or [(0, "a")], "id INT, kind STRING")
    routed = classify(
        df,
        [(F.col("kind") == "a", "alpha"), (F.col("kind").isin("b", "c"), "bc")],
        default="other",
    )
    # categories are exhaustive & disjoint: branch row counts sum to input
    n = df.count()
    counts = {r["category"]: r["count"] for r in routed.groupBy("category").count().collect()}
    assert sum(counts.values()) == n
    assert routed.where(F.col("category").isNull()).count() == 0


@given(
    data=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 5), st.integers(0, 1000)),
        min_size=1,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_dedup_output_keys_unique_and_minimal(spark_prop, data):
    df = spark_prop.createDataFrame(data, "k INT, unc INT, seq INT")
    out = dedup.keep_min_by(df, ["k"], [F.col("unc").asc(), F.col("seq").asc()])
    rows_ = out.collect()
    keys = [r["k"] for r in rows_]
    assert len(keys) == len(set(keys))  # one row per key
    best = {}
    for k, unc, seq in data:
        if k not in best or (unc, seq) < best[k]:
            best[k] = (unc, seq)
    assert {(r["k"], (r["unc"], r["seq"])) for r in rows_} == set(best.items())


def test_view_layer_registers_and_answers(spark):
    from biodiversity_data_ingestion_spark.plans.views import register_all_views

    names = register_all_views(spark, SF_DIR)
    for v in names:
        assert spark.sql(f"SELECT * FROM {v}").count() > 0
    # views compose: SQL over a view
    n = spark.sql(
        "SELECT count(*) AS n FROM v_table_data WHERE r_name IS NOT NULL"
    ).collect()[0]["n"]
    assert n > 0


@given(
    pts=st.lists(
        st.tuples(st.integers(0, 10_000),
                  st.floats(-89, 89, allow_nan=False),
                  st.floats(-179.9, 179.9, allow_nan=False)),
        min_size=1, max_size=25,
    ),
    cents=st.lists(
        st.tuples(st.floats(-89, 89, allow_nan=False),
                  st.floats(-179.9, 179.9, allow_nan=False)),
        min_size=1, max_size=6,
    ),
    dist=st.sampled_from([5_000.0, 300_000.0, 2_000_000.0]),
)
@settings(**_SETTINGS)
def test_grid_centroid_filter_matches_brute_force(spark_prop, pts, cents, dist):
    from biodiversity_data_ingestion_spark.functions.textfn import haversine_m

    p = spark_prop.createDataFrame(pts, "id LONG, lat DOUBLE, lon DOUBLE")
    c = spark_prop.createDataFrame(cents, "c_lat DOUBLE, c_lon DOUBLE")
    grid = {r["id"] for r in cleaning.centroid_distance_filter(p, c, max_dist_m=dist).collect()}
    brute = {
        r["id"]
        for r in p.join(
            c,
            haversine_m(F.col("lat"), F.col("lon"), F.col("c_lat"), F.col("c_lon")) <= dist,
            "left_anti",
        ).collect()
    }
    assert grid == brute


@given(
    data=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 50), st.integers(0, 3)),
        max_size=40,
    ),
    probe=st.integers(0, 50),
)
@settings(**_SETTINGS)
def test_scd2_point_in_time_equals_naive_replay(spark_prop, data, probe):
    # SCD2 invariant: for any probe time t, the history row whose
    # [valid_from, valid_to) range contains t carries exactly the value
    # of the latest change at or before t under a naive replay
    from biodiversity_data_ingestion_spark.operators.scd import scd2_compress

    df = spark_prop.createDataFrame(
        [(u, t, i, float(v)) for i, (u, t, v) in enumerate(data)]
        or [(0, 0, 0, 0.0)],
        "user_id INT, ts INT, event_id INT, value DOUBLE",
    )
    hist = scd2_compress(df, "user_id", "ts", "value", tiebreak="event_id").collect()

    rows = [(u, t, i, float(v)) for i, (u, t, v) in enumerate(data)] or [
        (0, 0, 0, 0.0)
    ]
    for user in {r[0] for r in rows}:
        seen = sorted((r for r in rows if r[0] == user), key=lambda r: (r[1], r[2]))
        expected = None
        for _, t, _, v in seen:
            if t <= probe:
                expected = v
        got = [
            h.value
            for h in hist
            if h.user_id == user
            and h.valid_from <= probe
            and (h.valid_to is None or probe < h.valid_to)
        ]
        if expected is None:
            assert got == []
        else:
            assert got == [expected]
        # ranges per user must tile without overlap: sorted valid_from,
        # each valid_to equals the next valid_from
        spans = sorted(
            [(h.valid_from, h.valid_to) for h in hist if h.user_id == user]
        )
        for (a_f, a_t), (b_f, _) in zip(spans, spans[1:]):
            assert a_t == b_f


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 14), st.integers(0, 14)),
        min_size=0,
        max_size=40,
    ),
    k=st.integers(2, 4),
)
@settings(**_SETTINGS)
def test_k_core_invariants(spark_prop, edges, k):
    # invariants of the peel: (1) every surviving node has degree >= k
    # WITHIN the surviving subgraph; (2) the result is the MAXIMUM such
    # subgraph — no peeled node could have survived (checked against a
    # brute-force python peel).
    from biodiversity_data_ingestion_spark.operators.corpus import k_core

    simple = sorted({(min(u, v), max(u, v)) for u, v in edges if u != v})
    if not simple:
        return
    df = spark_prop.createDataFrame(simple, "u long, v long")
    got = {r.node: r.degree for r in k_core(df, k=k, max_rounds=20).collect()}

    # brute-force reference peel
    es = set(simple)
    while True:
        deg = {}
        for u, v in es:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        drop = {n for n, d in deg.items() if d < k}
        if not drop:
            break
        es = {(u, v) for u, v in es if u not in drop and v not in drop}
    want = {}
    for u, v in es:
        want[u] = want.get(u, 0) + 1
        want[v] = want.get(v, 0) + 1
    assert got == want


@given(
    texts=st.lists(
        st.text(alphabet="ab cd", min_size=0, max_size=40),
        min_size=1,
        max_size=10,
    )
)
@settings(**_SETTINGS)
def test_shingle_hash_preserves_jaccard(spark_prop, texts):
    # hashing shingles to 64-bit must not change any Jaccard value on
    # realistic inputs (collisions are ~n^2/2^61): pair sets and
    # scores from the hashed inverted index == a python string-set
    # reference.
    from biodiversity_data_ingestion_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark_prop.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(df, "doc_id", "text", n=2, threshold=0.01).collect()
    }

    def sh(t):
        w = [x for x in t.strip().lower().split()]
        return {" ".join(w[i : i + 2]) for i in range(len(w) - 1)} if len(w) >= 2 else set()

    want = {}
    for i, a in rows:
        for j, b in rows:
            if i >= j:
                continue
            sa, sb = sh(a), sh(b)
            inter = len(sa & sb)
            if not sa or not sb or inter == 0:
                continue
            jac = round(inter / (len(sa) + len(sb) - inter), 6)
            if jac >= 0.01:
                want[(i, j)] = jac
    assert got == want


@given(
    st.lists(
        st.tuples(st.integers(0, 500), st.integers(1, 100)),
        min_size=0,
        max_size=40,
    ),
    st.integers(1, 50),
)
@settings(max_examples=200, deadline=None)
def test_merge_session_items_equals_batch_gaps_and_islands(events, gap):
    # The streaming interval merge must equal the batch gaps-and-islands
    # fold over the SORTED event list, for any event multiset and gap —
    # including duplicate timestamps and events arriving as point items
    # in arbitrary order (the within-watermark late-data case).
    from biodiversity_data_ingestion_spark.streaming.stateful import (
        _merge_session_items,
    )

    items = [[ts, ts, 1, float(v)] for ts, v in events]
    got = _merge_session_items(items, gap)

    ref = []
    for ts, v in sorted(events):
        if ref and ts - ref[-1][1] < gap:
            s = ref[-1]
            s[1] = ts if ts > s[1] else s[1]
            s[2] += 1
            s[3] += float(v)
        else:
            ref.append([ts, ts, 1, float(v)])
    # float sums may differ in ADD ORDER between the two folds when
    # timestamps tie; compare sums as sorted multisets per session key
    assert [(s[0], s[1], s[2]) for s in got] == [(s[0], s[1], s[2]) for s in ref]
    assert [round(s[3], 9) for s in got] == [round(s[3], 9) for s in ref]


@given(
    st.lists(
        st.tuples(st.integers(0, 500), st.integers(-100, 100), st.integers(0, 1)),
        min_size=1,
        max_size=40,
    ),
    st.integers(1, 50),
    st.one_of(
        st.none(),
        st.tuples(
            st.integers(0, 500), st.integers(0, 80),
            st.integers(1, 5), st.integers(-300, 300), st.integers(0, 5),
        ),
    ),
)
@settings(max_examples=300, deadline=None)
def test_merge_sessions_vec_matches_python_merge(events, gap, state):
    # r15 kernel vectorization: the numpy cummax/reduceat merge must be
    # item-for-item identical to the Python interval merge for any event
    # multiset, gap, and carried state interval (start <= end; the late-
    # data case where batch points precede the state's start included)
    import numpy as np

    from biodiversity_data_ingestion_spark.streaming.stateful import (
        _merge_session_items,
        _merge_sessions_vec,
    )

    ts = np.array(sorted(e[0] for e in events), dtype="int64")
    order = np.argsort([e[0] for e in events], kind="stable")
    cents = np.array([events[i][1] for i in order], dtype="int64")
    nns = np.array([events[i][2] for i in order], dtype="int64")
    starts, ends = ts, ts
    ns = np.ones(len(ts), dtype="int64")
    items = [
        [int(t), int(t), 1, int(c), int(k)]
        for t, c, k in zip(ts, cents, nns)
    ]
    if state is not None:
        s0 = (state[0], state[0] + state[1], state[2], state[3], state[4])
        pos = int(np.searchsorted(starts, s0[0], side="right"))
        starts = np.insert(starts, pos, s0[0])
        ends = np.insert(ends, pos, s0[1])
        ns = np.insert(ns, pos, s0[2])
        cents = np.insert(cents, pos, s0[3])
        nns = np.insert(nns, pos, s0[4])
        items.insert(pos, list(s0))
    want = _merge_session_items(items, gap)
    got = _merge_sessions_vec(starts, ends, ns, cents, nns, gap)
    assert [list(map(int, t)) for t in zip(*got)] == [list(s) for s in want]


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 14), st.integers(0, 14)),
        min_size=0,
        max_size=40,
    ),
    n_iter=st.integers(1, 3),
)
@settings(**_SETTINGS)
def test_label_propagation_matches_synchronous_reference(
    spark_prop, edges, n_iter
):
    # bit-exact synchronous LPA: for ANY undirected graph and round
    # count, the distributed trajectory must equal a pure-Python
    # synchronous replay with the same (max count, min label) rule —
    # the determinism contract the chained-CTE oracle relies on
    from collections import defaultdict

    from biodiversity_data_ingestion_spark.operators.corpus import (
        label_propagation,
    )

    simple = sorted({(min(u, v), max(u, v)) for u, v in edges if u != v})
    if not simple:
        return
    sym = simple + [(b, a) for a, b in simple]
    df = spark_prop.createDataFrame(sym, "src long, dst long")
    got = {
        r.node: r.community
        for r in label_propagation(df, n_iter=n_iter).collect()
    }

    adj = defaultdict(set)
    for a, b in sym:
        adj[a].add(b)
    labels = {v: v for v in adj}
    for _ in range(n_iter):
        new = {}
        for v in adj:
            cnt = defaultdict(int)
            for u in adj[v]:
                cnt[labels[u]] += 1
            new[v] = min(cnt, key=lambda l: (-cnt[l], l))
        labels = new
    assert got == labels


_VOCAB = ["red", "blue", "fish", "tree", "sky", "run", "dog", "sun"]


@given(
    docs=st.lists(
        st.lists(st.sampled_from(_VOCAB), min_size=0, max_size=8),
        min_size=0,
        max_size=10,
    ),
    num_hashes=st.sampled_from([8, 16, 24, 32]),
    band_size=st.sampled_from([2, 4]),
)
@settings(**_SETTINGS)
def test_minhash_lsh_subset_exact_any_band_count(
    spark_prop, docs, num_hashes, band_size
):
    # r12 generalization of the band-guard fix: at ANY
    # (num_hashes, band_size) the banded-LSH output must be
    # duplicate-free, a SUBSET of the true n-gram Jaccard pairs at the
    # threshold (exact verification holds), and every reported jaccard
    # must equal the true value — the first-matching-band guard and
    # the chunked bucket pairing may change CANDIDATES, never results.
    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark_prop.createDataFrame(rows, "doc_id long, text string")
    got_rows = [
        ((r.doc_a, r.doc_b), r.jaccard)
        for r in dedup.minhash_lsh_pairs(
            df, "doc_id", "text", n=2,
            num_hashes=num_hashes, band_size=band_size, threshold=0.3,
        ).collect()
    ]
    keys = [k for k, _ in got_rows]
    assert len(keys) == len(set(keys))  # duplicate-free at any band count

    def sh(t):
        w = t.strip().lower().split()
        return {" ".join(w[i : i + 2]) for i in range(len(w) - 1)}

    want = {}
    for i, a in rows:
        for j, b in rows:
            if i >= j:
                continue
            sa, sb = sh(a), sh(b)
            inter = len(sa & sb)
            if not sa or not sb or inter == 0:
                continue
            jac = round(inter / (len(sa) + len(sb) - inter), 6)
            if jac >= 0.3:
                want[(i, j)] = jac
    got = dict(got_rows)
    # subset with exact scores (LSH may miss pairs, never invent them)
    for k, v in got.items():
        assert want.get(k) == v, (k, v, want.get(k))


_asof_ts = st.one_of(st.none(), st.integers(0, 20))
_asof_rows = st.lists(
    st.tuples(st.sampled_from(["u1", "u2", None]), _asof_ts),
    min_size=0,
    max_size=16,
)


@given(clicks=_asof_rows, purchases=_asof_rows)
@settings(**_SETTINGS)
def test_asof_join_equals_naive_replay_with_nulls(spark_prop, clicks, purchases):
    # as-of contract vs a naive per-left scan, INCLUDING the NULL
    # quarantine: a NULL-key or NULL-ts right row never matches (SQL
    # inequality semantics), NULL-key/ts left rows survive with a NULL
    # payload, ties break by max event_id
    from biodiversity_data_ingestion_spark.operators.joins import asof_join

    lrows = [(i, u, t) for i, (u, t) in enumerate(clicks)]
    rrows = [(100 + i, u, t) for i, (u, t) in enumerate(purchases)]
    left = spark_prop.createDataFrame(
        lrows or [(0, "u1", 1)], "event_id LONG, user_id STRING, ts LONG"
    )
    right = spark_prop.createDataFrame(
        rrows or [(100, "u1", 1)], "event_id LONG, user_id STRING, ts LONG"
    )
    got = {
        r["event_id"]: r["asof_event_id"]
        for r in asof_join(left, right, "user_id", "ts", "ts",
                           tie_col="event_id").collect()
    }
    want = {}
    for eid, u, t in (lrows or [(0, "u1", 1)]):
        cand = [
            (rt, rid)
            for rid, ru, rt in (rrows or [(100, "u1", 1)])
            if u is not None and ru == u and rt is not None
            and t is not None and rt <= t
        ]
        want[eid] = max(cand)[1] if cand else None
    assert got == want


_rj_ts = st.one_of(st.none(), st.integers(0, 7200))
_rj_rows = st.lists(
    st.tuples(st.sampled_from(["u1", "u2"]), _rj_ts), min_size=0, max_size=12
)


@given(
    lrows=_rj_rows,
    rrows=_rj_rows,
    before=st.integers(0, 3600),
    after=st.integers(0, 600),
    binsec=st.sampled_from([None, 60, 777, 3600]),
)
@settings(**_SETTINGS)
def test_range_join_binned_equals_brute_interval(
    spark_prop, lrows, rrows, before, after, binsec
):
    # the binned fan-out (bucket span arithmetic, negative bins near
    # epoch 0, non-divisor bin widths) must reproduce the brute
    # interval predicate exactly; NULL timestamps never pair (inner
    # semantics — explode of a NULL sequence drops the left row, a
    # NULL right bucket matches nothing)
    from biodiversity_data_ingestion_spark.operators.joins import (
        range_join_binned,
    )

    L = [(i, u, t) for i, (u, t) in enumerate(lrows)]
    R = [(100 + i, u, t) for i, (u, t) in enumerate(rrows)]
    left = spark_prop.createDataFrame(
        [(i, u, t) for i, u, t in L] or [(0, "u1", 0)],
        "event_id LONG, user_id STRING, ts_i LONG",
    ).selectExpr("event_id", "user_id", "to_timestamp(ts_i) AS ts")
    right = spark_prop.createDataFrame(
        [(i, u, t) for i, u, t in R] or [(100, "u1", 0)],
        "event_id LONG, user_id STRING, ts_i LONG",
    ).selectExpr("event_id", "user_id", "to_timestamp(ts_i) AS ts")
    got = {
        (r["event_id"], r["r_event_id"])
        for r in range_join_binned(
            left, right, "user_id", "ts", "ts", before, after,
            bin_seconds=binsec,
        ).collect()
    }
    want = {
        (li, ri)
        for li, lu, lt in (L or [(0, "u1", 0)])
        for ri, ru, rt in (R or [(100, "u1", 0)])
        if lt is not None and rt is not None and lu == ru
        and lt - before <= rt <= lt + after
    }
    assert got == want


@given(
    base=st.dictionaries(st.integers(0, 6), st.integers(0, 99), max_size=6),
    ups=st.dictionaries(st.integers(0, 6), st.integers(0, 99), max_size=6),
    dels=st.sets(st.integers(0, 6), max_size=3),
    n_null_base=st.integers(0, 2),
    n_null_ups=st.integers(0, 2),
)
@settings(**_SETTINGS)
def test_upsert_merge_equals_merge_semantics(
    spark_prop, base, ups, dels, n_null_base, n_null_ups
):
    # SQL MERGE replay: updates win on key collision, unmatched base
    # survives, unmatched updates insert, delete-flagged matched keys
    # vanish; NULL keys never match (each NULL-key row on either side
    # passes through / inserts independently)
    from biodiversity_data_ingestion_spark.operators.joins import upsert_merge

    brows = [(k, v) for k, v in base.items()] + [
        (None, 1000 + i) for i in range(n_null_base)
    ]
    urows = [(k, v, k in dels) for k, v in ups.items()] + [
        (None, 2000 + i, False) for i in range(n_null_ups)
    ]
    bdf = spark_prop.createDataFrame(
        brows or [(0, 0)], "k INT, v INT"
    )
    udf = spark_prop.createDataFrame(
        urows or [(0, 0, False)], "k INT, v INT, del BOOLEAN"
    )
    got = sorted(
        ((r["k"], r["v"]) for r in upsert_merge(bdf, udf, "k", delete_col="del").collect()),
        key=lambda t: (t[0] is None, t),
    )
    eb = dict(brows or [(0, 0)])
    eu = {k: v for k, v, _ in (urows or [(0, 0, False)])}
    edel = {k for k, _, d in (urows or [(0, 0, False)]) if d}
    merged = {**{k: v for k, v in eb.items() if k is not None},
              **{k: v for k, v in eu.items() if k is not None}}
    want = [(k, v) for k, v in merged.items() if k not in edel]
    want += [(None, v) for k, v in (brows or [(0, 0)]) if k is None]
    want += [(None, v) for k, v, d in (urows or [(0, 0, False)]) if k is None and not d]
    want = sorted(want, key=lambda t: (t[0] is None, t))
    assert got == want
