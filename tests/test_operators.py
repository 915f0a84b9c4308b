"""Unit tests per operator-inventory row (SURVEY.md §5.1) — the harness
the reference never had. Tiny in-memory DataFrames, exact expectations."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from biodiversity_data_ingestion_spark.operators import cleaning, dedup, joins, similarity
from biodiversity_data_ingestion_spark.operators.classify import classify

from .conftest import SF_DIR


# ---------------------------------------------------------------------------
# P1 classify — truth table incl. ordered-rule precedence and default


def test_classify_truth_table(spark):
    rows = [
        Row(id=1, checklist="ERC000011", symbiont="N", accession="A1"),
        Row(id=2, checklist="ERC000013", symbiont="N", accession="A2"),
        Row(id=3, checklist="ERC000011", symbiont="Y", accession="A3"),
        Row(id=4, checklist="ERC000011", symbiont="N", accession=None),
        Row(id=5, checklist=None, symbiont="N", accession="A5"),
    ]
    df = spark.createDataFrame(rows)
    out = classify(
        df,
        [
            (F.col("accession").isNull(), "errors"),
            (F.col("symbiont") == "Y", "symbionts"),
            (F.col("checklist").isin("ERC000013", "ERC000024"), "metagenomes"),
        ],
        default="specimens",
    )
    got = {r["id"]: r["category"] for r in out.collect()}
    # first-matching-rule-wins + missing-checklist => default (P1 semantics,
    # reference map_functions.py:20-59)
    assert got == {1: "specimens", 2: "metagenomes", 3: "symbionts", 4: "errors", 5: "specimens"}


# ---------------------------------------------------------------------------
# P7 boundary values — inclusive bounds, null/non-numeric drops


def test_filter_uncertainty_boundaries(spark):
    df = spark.createDataFrame(
        [(1, "1000"), (2, "5000"), (3, "999.999"), (4, "5000.001"), (5, None), (6, "abc")],
        "id INT, unc STRING",
    )
    kept = {r["id"] for r in cleaning.filter_uncertainty(df, "unc").collect()}
    assert kept == {1, 2}  # bounds INCLUSIVE (cleaning_occs.py:75); junk drops


def test_coordinate_filters(spark):
    df = spark.createDataFrame(
        [
            (1, 0.0, 0.0),
            (2, 90.0, 180.0),
            (3, -90.0, -180.0),
            (4, 90.0001, 0.0),
            (5, 0.0, -180.0001),
            (6, None, 10.0),
            (7, 10.0, 0.0),
        ],
        "id INT, lat DOUBLE, lon DOUBLE",
    )
    out = cleaning.drop_out_of_range(cleaning.drop_zero_coords(df, "lat", "lon"), "lat", "lon")
    assert {r["id"] for r in out.collect()} == {2, 3, 7}


# ---------------------------------------------------------------------------
# A5/A6 dedup — deterministic tie-breaks


def test_keep_min_by_ties(spark):
    df = spark.createDataFrame(
        [("k", 1.0, 10), ("k", 1.0, 5), ("k", 2.0, 1), ("j", 9.0, 7)],
        "key STRING, unc DOUBLE, seq INT",
    )
    out = dedup.keep_min_by(df, ["key"], [F.col("unc").asc(), F.col("seq").asc()])
    got = {(r["key"], r["unc"], r["seq"]) for r in out.collect()}
    assert got == {("k", 1.0, 5), ("j", 9.0, 7)}  # min unc, then min seq


# ---------------------------------------------------------------------------
# J2 gate anti-join — set-difference semantics + monotonicity property


def test_gate_anti_join_monotone(spark):
    new = spark.createDataFrame([(1,), (2,), (3,)], "tax_id INT")
    gate = spark.createDataFrame([(2,), (None,)], "tax_id INT")
    first = joins.gate_anti_join(new, gate, "tax_id")
    assert {r["tax_id"] for r in first.collect()} == {1, 3}
    # second run with the emitted keys appended to the gate emits nothing new
    gate2 = gate.unionByName(first.select("tax_id"))
    assert joins.gate_anti_join(new, gate2, "tax_id").count() == 0


# ---------------------------------------------------------------------------
# J1 cogroup — empty sides become empty arrays


def test_cogroup_collect_empty_sides(spark):
    a = spark.createDataFrame([(1, "x"), (1, "y")], "k INT, v STRING")
    b = spark.createDataFrame([(2, "z")], "k INT, v STRING")
    out = joins.cogroup_collect({"a": a, "b": b}, "k", {"a": "v", "b": "v"})
    got = {r["k"]: (r["a_list"], r["b_list"]) for r in out.collect()}
    assert got == {1: (["x", "y"], []), 2: ([], ["z"])}


# ---------------------------------------------------------------------------
# P8 ray-cast kernel vs numpy half-plane reference


def test_ray_cast_vs_half_plane():
    from biodiversity_data_ingestion_spark.operators.geo import _ray_cast

    rng = np.random.default_rng(7)
    poly = np.array([(-10.5, -10.5), (10.5, -10.5), (10.5, 10.5), (-10.5, 10.5)])
    lat = rng.uniform(-20, 20, 500)
    lon = rng.uniform(-20, 20, 500)
    got = _ray_cast(lat, lon, poly)
    want = (lon > -10.5) & (lon < 10.5) & (lat > -10.5) & (lat < 10.5)
    assert (got == want).all()


# ---------------------------------------------------------------------------
# convex hull kernel vs numpy shoelace reference (range estimation parity)


def test_convex_hull_range_vs_numpy(spark):
    from biodiversity_data_ingestion_spark.operators.geo import (
        EARTH_RADIUS_M,
        _convex_hull,
        convex_hull_range_km2,
    )

    rng = np.random.default_rng(11)
    pts = [(int(g), float(la), float(lo))
           for g in range(3)
           for la, lo in zip(rng.uniform(-60, 60, 40), rng.uniform(-150, 150, 40))]
    df = spark.createDataFrame(pts, "grp INT, lat DOUBLE, lon DOUBLE")
    got = {r["grp"]: r["range_km2"] for r in convex_hull_range_km2(df, "grp").collect()}

    import pandas as pd

    pdf = pd.DataFrame(pts, columns=["grp", "lat", "lon"])
    for g, sub in pdf.groupby("grp"):
        x = EARTH_RADIUS_M * np.radians(sub.lon.to_numpy())
        y = EARTH_RADIUS_M * np.sin(np.radians(sub.lat.to_numpy()))
        hull = _convex_hull(np.column_stack([x, y]))
        xs, ys = hull[:, 0], hull[:, 1]
        area = 0.5 * abs(float(np.dot(xs, np.roll(ys, -1)) - np.dot(ys, np.roll(xs, -1))))
        assert got[g] == round(area / 1e6, 2)
    # degenerate groups: <3 distinct points => area 0
    deg = spark.createDataFrame([(9, 1.0, 1.0), (9, 1.0, 1.0), (8, 1.0, 1.0), (8, 2.0, 2.0)],
                                "grp INT, lat DOUBLE, lon DOUBLE")
    got = {r["grp"]: r["range_km2"] for r in convex_hull_range_km2(deg, "grp").collect()}
    assert got == {9: 0.0, 8: 0.0}


# ---------------------------------------------------------------------------
# LSH recall — every true near-dup pair above threshold must be found by
# the banded-LSH path at these parameters on the fixture corpus


def test_minhash_lsh_recall(spark):
    from biodiversity_data_ingestion_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.7).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_lsh_pairs(
            docs, "doc_id", "text", n=3, num_hashes=16, band_size=4, threshold=0.7
        ).collect()
    }
    assert lsh <= exact  # LSH verifies candidates exactly => no false positives
    recall = len(lsh & exact) / max(len(exact), 1)
    assert recall >= 0.9, f"LSH recall {recall} over {len(exact)} true pairs"


def test_minhash_lsh_nondefault_band_count(spark):
    # r11 ADVICE: the first-matching-band guard was hardcoded to 3
    # earlier bands (assuming num_hashes // band_size == 4); with more
    # bands a pair colliding on two bands >= 3 entered the candidate
    # stream twice. The verify groupBy collapsed those to one output
    # row, so the observable contract is: at ANY band count the result
    # is duplicate-free, exactly-verified (subset of true pairs), and
    # at least as complete as the 4-band run (more bands => recall
    # monotonically up, never down).
    from biodiversity_data_ingestion_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5).collect()
    }
    four = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_lsh_pairs(
            docs, "doc_id", "text", num_hashes=16, band_size=4, threshold=0.5
        ).collect()
    }
    rows8 = [
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_lsh_pairs(
            docs, "doc_id", "text", num_hashes=32, band_size=4, threshold=0.5
        ).collect()
    ]
    assert len(rows8) == len(set(rows8))  # no duplicate output rows
    eight = set(rows8)
    assert eight <= exact  # exact verification still holds at 8 bands
    assert four <= eight  # extra bands only ADD candidate coverage


def test_incremental_minhash_gate_matches_full_run_cross_pairs(spark):
    # the incremental gate must find exactly the (new, old) pairs the
    # FULL self-pairing run finds — same banding, same verification —
    # while never pairing the existing corpus against itself
    from biodiversity_data_ingestion_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    existing = docs.where(F.col("doc_id") % 10 != 0)
    new = docs.where(F.col("doc_id") % 10 == 0)
    full = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.minhash_lsh_pairs(
            docs, "doc_id", "text", n=3, num_hashes=16, band_size=4, threshold=0.5
        ).collect()
    }
    cross_full = {
        (a, b) if a % 10 == 0 else (b, a): j
        for (a, b), j in full.items()
        if (a % 10 == 0) != (b % 10 == 0)
    }
    inc = {
        (r["new_id"], r["old_id"]): r["jaccard"]
        for r in dedup.minhash_incremental_pairs(
            existing, new, "doc_id", "text",
            n=3, num_hashes=16, band_size=4, threshold=0.5,
        ).collect()
    }
    assert inc == cross_full
    assert inc  # non-vacuous: the corpus does have cross-split dups


def test_minhash_shingleless_docs_never_pair_or_crash(spark):
    # docs with fewer than n words have NO shingles: every minhash
    # component is NULL and concat_ws would have collapsed their band
    # buckets to the shared md5(str(band)) — ALL short docs colliding in
    # n_bands buckets (quadratic candidates on a real corpus, where short
    # docs are common) and a 0/0 Jaccard in the verify step, which
    # RAISES under this build's ANSI default. The operators drop
    # empty-shingle docs before banding; short docs must neither crash
    # nor pair, and real dups must be unaffected.
    from pyspark.sql import Row

    rows = [
        Row(doc_id=1, text="hi"),                      # 1 word: no shingles
        Row(doc_id=2, text="hi there"),                # 2 words: no shingles
        Row(doc_id=10, text="ok"),                     # short, new batch
        Row(doc_id=3, text="alpha beta gamma delta epsilon zeta eta"),
        Row(doc_id=20, text="alpha beta gamma delta epsilon zeta eta"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    full = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.minhash_lsh_pairs(
            docs, "doc_id", "text", n=3, num_hashes=16, band_size=4, threshold=0.5
        ).collect()
    }
    assert full == {(3, 20): 1.0}
    inc = {
        (r["new_id"], r["old_id"]): r["jaccard"]
        for r in dedup.minhash_incremental_pairs(
            docs.where(F.col("doc_id") < 10),
            docs.where(F.col("doc_id") >= 10),
            "doc_id", "text",
            n=3, num_hashes=16, band_size=4, threshold=0.5,
        ).collect()
    }
    assert inc == {(20, 3): 1.0}


def test_incremental_minhash_gate_empty_new_batch(spark):
    # a day with no new documents must yield an empty pair set, not an
    # error — and never touch the existing corpus quadratically
    from pyspark.sql import Row

    existing = spark.createDataFrame(
        [Row(doc_id=i, text="alpha beta gamma delta epsilon zeta") for i in range(5)],
        "doc_id long, text string",
    )
    empty = spark.createDataFrame([], "doc_id long, text string")
    out = dedup.minhash_incremental_pairs(existing, empty, "doc_id", "text")
    assert out.columns == ["new_id", "old_id", "jaccard"]
    assert out.count() == 0


# ---------------------------------------------------------------------------
# IVF recall vs exact top-k


def test_ivf_recall_vs_exact(spark):
    from biodiversity_data_ingestion_spark.sources.tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    corpus, queries = emb.where(F.col("vec_id") >= 5), emb.where(F.col("vec_id") < 5)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.cosine_topk(corpus, queries, k=10).collect()
    }
    ivf = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.ivf_topk(corpus, queries, k=10, n_probe=3).collect()
    }
    recall = len(ivf & exact) / len(exact)
    assert recall >= 0.5, f"IVF recall {recall}"  # n_probe=3 of 10 buckets


# ---------------------------------------------------------------------------
# zero-norm embeddings (padding vectors) must yield NULL similarity, not
# kill the job — and must do so in EXACT parity with the DuckDB oracle


def _zero_norm_fixture_rows():
    # vec_id 3 (query side) and 7 (corpus side) are planted all-zero
    # padding vectors; the rest are deterministic positive vectors
    return [
        (
            i,
            i % 3,
            [0.0] * 8
            if i in (3, 7)
            else [((i * 7 + d * 13) % 10) / 10.0 + 0.1 for d in range(8)],
        )
        for i in range(12)
    ]


def test_zero_norm_embeddings_null_not_crash(spark):
    # r11 verdict top item: a zero-norm embedding used to make cosine()
    # RAISE [DIVIDE_BY_ZERO] under this build's ANSI default — one
    # padding vector killed an hours-long ANN job. cosine() now yields
    # NULL on a zero denominator (nullif), exactly the DuckDB oracles'
    # x/0.0 -> NULL: threshold filters drop the rows and DESC ranking
    # windows push them last in BOTH engines (nulls-last defaults).
    import duckdb
    import pandas as pd

    from .oracle_harness import compare

    rows = _zero_norm_fixture_rows()
    emb = spark.createDataFrame(rows, "vec_id INT, label INT, embedding ARRAY<DOUBLE>")
    corpus, queries = emb.where(F.col("vec_id") >= 5), emb.where(F.col("vec_id") < 5)

    topk = similarity.cosine_topk(corpus, queries, k=10)
    got = topk.collect()
    # zero query 3: every sim NULL; zero corpus 7: NULL for every query;
    # NULL rows rank AFTER all non-null rows, ranks stay dense
    assert all(r["cos_sim"] is None for r in got if r["query_id"] == 3)
    assert all(r["cos_sim"] is None for r in got if r["neighbor_id"] == 7)
    for q in range(5):
        ranked = sorted((r for r in got if r["query_id"] == q), key=lambda r: r["rank"])
        assert [r["rank"] for r in ranked] == list(range(1, 8))
        tail_nulls = [r["cos_sim"] is None for r in ranked]
        assert tail_nulls == sorted(tail_nulls)  # non-null block, then NULLs

    # bitwise side-by-side with the oracle engine on the same frame
    # (duckdb_con_raw pins pre-1.1 x/0.0 -> NULL semantics — inf would
    # rank FIRST under ORDER BY cos DESC and invert this parity)
    from .oracle_harness import duckdb_con_raw

    con = duckdb_con_raw()
    con.register("emb", pd.DataFrame(rows, columns=["vec_id", "label", "embedding"]))
    res = compare(
        "zero_norm_cosine_topk",
        topk,
        con,
        """
        WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM emb WHERE vec_id < 5),
        c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM emb WHERE vec_id >= 5),
        s AS (
            SELECT query_id, neighbor_id,
                   round(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * cv[i]))
                         / (sqrt(list_sum(list_transform(qv, x -> x * x)))
                            * sqrt(list_sum(list_transform(cv, x -> x * x)))), 6) AS cos_sim
            FROM q, c)
        SELECT query_id, neighbor_id, cos_sim,
               row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rank
        FROM s
        QUALIFY rank <= 10
        """,
    )
    assert res.ok, res.problems

    # threshold-filter family: zero-vector pairs are silently dropped
    # (NULL >= t is NULL), never crash, never pair
    for pairs in (
        similarity.cosine_dup_pairs(emb, threshold=0.4),
        similarity.signlsh_dup_pairs(emb, threshold=0.4),
        similarity.semantic_dedup_pairs(emb, k=2, n_iter=2, threshold=0.9),
    ):
        for r in pairs.collect():
            assert r["id_a"] not in (3, 7) and r["id_b"] not in (3, 7)

    # routing family: a zero query still routes (label tie-break) and a
    # zero corpus vector ranks last — no crash end-to-end
    assert similarity.ivf_topk(corpus, queries, k=5, n_probe=2).count() > 0


# ---------------------------------------------------------------------------
# multimodal decode stub is explicit


def test_decode_media_is_stub(spark):
    # image/video only — audio decode is REAL (see the wav tests below)
    from biodiversity_data_ingestion_spark.operators import multimodal

    with pytest.raises(NotImplementedError):
        multimodal.decode_media(None)


def test_wav_decode_golden_roundtrip(spark):
    # decode_wav_features must recover the EXACT container params and
    # sample statistics of a known hand-built WAV — a golden-value check
    # independent of the synth kernel that generates the oracle-checked
    # query's payloads.
    import io
    import math
    import wave as wavmod

    import numpy as np

    from biodiversity_data_ingestion_spark.operators import multimodal

    samples = np.array([300, -300, 500, -500, 400, -400], dtype="<i2")
    buf = io.BytesIO()
    with wavmod.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(samples.tobytes())
    df = spark.createDataFrame([(1, bytearray(buf.getvalue()))], "id long, payload binary")
    [row] = multimodal.decode_wav_features(df, "id").collect()
    assert (row.n_channels, row.sample_rate, row.n_frames) == (1, 16000, 6)
    assert row.duration_ms == 6 * 1000 // 16000
    assert row.peak == 500
    expect_rms = math.sqrt((2 * 300**2 + 2 * 500**2 + 2 * 400**2) / 6)
    assert abs(row.rms - expect_rms) < 1e-9


def test_bmp_decode_golden_including_topdown(spark):
    # decode_bmp_features must parse bottom-up AND top-down (negative
    # height) containers to the same image statistics, honoring the
    # 4-byte row stride padding of a non-multiple-of-4 row width.
    import struct

    import numpy as np

    from biodiversity_data_ingestion_spark.operators import multimodal

    # logical image (row 0 = top): R channel encodes the row, G the col
    rgb = np.array(
        [[[10, 0, 7], [10, 1, 7]], [[11, 0, 7], [11, 1, 7]]], dtype=np.uint8
    )
    h, w = 2, 2
    stride = (w * 3 + 3) // 4 * 4

    def build(bottom_up: bool) -> bytes:
        body = bytearray()
        rows = range(h - 1, -1, -1) if bottom_up else range(h)
        for r in rows:
            line = rgb[r][:, ::-1].tobytes()  # to BGR
            body += line + b"\x00" * (stride - len(line))
        info = struct.pack(
            "<IiiHHIIiiII", 40, w, h if bottom_up else -h, 1, 24, 0,
            len(body), 2835, 2835, 0, 0,
        )
        head = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
        return bytes(head + info + body)

    df = spark.createDataFrame(
        [(1, bytearray(build(True))), (2, bytearray(build(False)))],
        "id long, payload binary",
    )
    rows_out = {r.id: r for r in multimodal.decode_bmp_features(df, "id").collect()}
    for r in rows_out.values():
        assert (r.width, r.height, r.n_pixels) == (2, 2, 4)
        assert r.mean_r == 10.5  # rows 10,11 -> both orientations agree
        assert r.mean_g == 0.5
        assert r.mean_b == 7.0


def test_decode_on_error_null_quarantines_malformed_payloads(spark):
    # on_error='null' is the media dead-letter channel: malformed
    # payloads yield all-null feature rows instead of failing the task,
    # while valid payloads in the same batch still decode.
    import io
    import wave as wavmod

    import numpy as np
    import pytest as _pytest

    from biodiversity_data_ingestion_spark.operators import multimodal

    buf = io.BytesIO()
    with wavmod.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(np.array([100, -100], dtype="<i2").tobytes())
    good, bad = bytearray(buf.getvalue()), bytearray(b"not a wav at all")
    df = spark.createDataFrame(
        [(1, good), (2, bad)], "id long, payload binary"
    )
    rows = {
        r.id: r
        for r in multimodal.decode_wav_features(df, "id", on_error="null").collect()
    }
    assert rows[1].n_frames == 2 and rows[1].peak == 100
    assert rows[2].n_frames is None and rows[2].rms is None
    # default stays strict: the malformed payload fails the job
    with _pytest.raises(Exception):
        multimodal.decode_wav_features(df, "id").collect()
    # same contract on the image and video decoders
    assert {
        r.id: r.width
        for r in multimodal.decode_bmp_features(df, "id", on_error="null").collect()
    } == {1: None, 2: None}
    assert {
        r.id: r.n_frames
        for r in multimodal.decode_y4m_features(df, "id", on_error="null").collect()
    } == {1: None, 2: None}


def test_png_filter_math_matches_spec_hand_computed():
    # RFC 2083 §6 filter formulas verified against BY-HAND filtered
    # bytes (raw=[10,20,30,13,22,35], prior=[1,2,3,4,5,6], bpp=3) —
    # independent of the encoder/decoder pair, so a symmetric bug in
    # both cannot pass.
    from biodiversity_data_ingestion_spark.operators.multimodal import (
        _png_filter_row,
        _png_unfilter_row,
    )

    raw = bytes([10, 20, 30, 13, 22, 35])
    prior = bytes([1, 2, 3, 4, 5, 6])
    expected = {
        0: [10, 20, 30, 13, 22, 35],
        1: [10, 20, 30, 3, 2, 5],
        2: [9, 18, 27, 9, 17, 29],
        3: [10, 19, 29, 6, 10, 17],
        4: [9, 18, 27, 3, 2, 5],
    }
    for ftype, want in expected.items():
        got = _png_filter_row(ftype, raw, prior)
        assert list(got) == want, (ftype, list(got))
        assert _png_unfilter_row(ftype, got, prior) == raw, ftype


def test_png_decode_golden(spark):
    # hand-built 2x2 truecolor PNG (filter 0 rows, known pixels) must
    # decode through the chunk walk + inflate + defilter to exact means
    import struct
    import zlib

    from biodiversity_data_ingestion_spark.operators import multimodal
    from biodiversity_data_ingestion_spark.operators.multimodal import _png_chunk

    # row 0: (10,100,200) (20,110,210); row 1: (30,120,220) (40,130,230)
    scan = bytes([0, 10, 100, 200, 20, 110, 210, 0, 30, 120, 220, 40, 130, 230])
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
        + _png_chunk(b"IDAT", zlib.compress(scan))
        + _png_chunk(b"IEND", b"")
    )
    df = spark.createDataFrame([(1, bytearray(png))], "id long, payload binary")
    [row] = multimodal.decode_png_features(df, "id").collect()
    assert (row.width, row.height, row.n_pixels) == (2, 2, 4)
    assert (row.mean_r, row.mean_g, row.mean_b) == (25.0, 115.0, 215.0)


def test_y4m_decode_golden(spark):
    # decode_y4m_features must parse a hand-built 2-frame 4x2 C420
    # stream: header tokens (incl. a fractional frame rate), FRAME
    # markers with trailing parameters, and the exact luma mean.
    from biodiversity_data_ingestion_spark.operators import multimodal

    w, h = 4, 2
    chroma = bytes([128]) * ((w // 2) * (h // 2))
    buf = bytearray(b"YUV4MPEG2 W4 H2 F30000:1001 Ip A1:1 C420jpeg\n")
    for f, y_val in enumerate((10, 30)):
        buf += b"FRAME" + (b" Xparam" if f else b"") + b"\n"
        buf += bytes([y_val]) * (w * h) + chroma + chroma
    df = spark.createDataFrame([(1, bytearray(bytes(buf)))], "id long, payload binary")
    [row] = multimodal.decode_y4m_features(df, "id").collect()
    assert (row.width, row.height, row.n_frames) == (4, 2, 2)
    assert abs(row.fps - 30000 / 1001) < 1e-12
    assert row.mean_y == 20.0


def test_wav_synth_decode_inverse(spark):
    # synth -> decode is the identity on the declared feature contract
    # for arbitrary ids (including ones far outside the testdata range)
    from biodiversity_data_ingestion_spark.operators import multimodal

    ids = spark.createDataFrame([(7,), (40,), (41,), (123456789,)], "doc_id long")
    wav = multimodal.synth_wav_payload(ids, "doc_id")
    out = {r.doc_id: r for r in multimodal.decode_wav_features(wav, "doc_id").collect()}
    for did, r in out.items():
        assert r.n_frames == 160 + (did % 41) * 40
        assert r.rms == float(1000 + (did % 100) * 100)
        assert r.peak == 1000 + (did % 100) * 100


# ---------------------------------------------------------------------------
# streaming == batch equivalence on the same bounded input


def test_streaming_equals_batch(spark):
    from biodiversity_data_ingestion_spark.sources.tables import load_table
    from biodiversity_data_ingestion_spark.streaming.windows import (
        run_stream_over_events,
        windowed_event_counts,
    )

    batch = windowed_event_counts(load_table(spark, SF_DIR, "events"))
    stream = run_stream_over_events(spark, SF_DIR, query_name="t_stream_eq")
    b = {tuple(r) for r in batch.collect()}
    s = {tuple(r) for r in stream.collect()}
    assert b == s


# ---------------------------------------------------------------------------
# sign-LSH recall vs exact all-pairs embedding dedup


def test_signlsh_recall_vs_exact(spark):
    from biodiversity_data_ingestion_spark.sources.tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    exact = {
        (r["id_a"], r["id_b"])
        for r in similarity.cosine_dup_pairs(emb, threshold=0.4).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in similarity.signlsh_dup_pairs(emb, threshold=0.4).collect()
    }
    # candidates are verified with the exact cosine => no false positives
    assert lsh <= exact
    # 4 bands x 4 bits at cos 0.4 (bit-match prob ~0.63) predicts ~0.5
    # recall; the floor locks the banding from silently degrading
    recall = len(lsh & exact) / max(len(exact), 1)
    assert recall >= 0.4, f"sign-LSH recall {recall} over {len(exact)} true pairs"


def test_classify_split_derives_categories_without_action(spark):
    from biodiversity_data_ingestion_spark.operators.classify import split

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "zz")], "id INT, kind STRING"
    )
    rules = [(F.col("kind") == "a", "alpha"), (F.col("kind") == "b", "beta")]
    labeled = classify(df, rules, default="other")
    branches = split(labeled, rules, default="other")
    # labels come from the rules statically — including empty branches —
    # and the branches partition the input exactly
    assert set(branches) == {"alpha", "beta", "other"}
    counts = {k: v.count() for k, v in branches.items()}
    assert counts == {"alpha": 1, "beta": 1, "other": 1}


def test_hot_bucket_chunking_preserves_pairs(spark):
    # second-level banding: forcing a tiny chunk size (so every bucket
    # shards into many chunk-pair rows) must emit exactly the same pair
    # set as the unchunked path — correctness is independent of the cap
    from biodiversity_data_ingestion_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents").limit(200)
    base_mh = {
        tuple(r)
        for r in dedup.minhash_lsh_pairs(
            docs, "doc_id", "text", threshold=0.5, bucket_chunk_size=1 << 20
        ).collect()
    }
    chunked_mh = {
        tuple(r)
        for r in dedup.minhash_lsh_pairs(
            docs, "doc_id", "text", threshold=0.5, bucket_chunk_size=3
        ).collect()
    }
    assert base_mh == chunked_mh
    base_sh = {
        tuple(r)
        for r in dedup.simhash_near_pairs(
            docs, "doc_id", "text", bucket_chunk_size=1 << 20
        ).collect()
    }
    chunked_sh = {
        tuple(r)
        for r in dedup.simhash_near_pairs(
            docs, "doc_id", "text", bucket_chunk_size=3
        ).collect()
    }
    assert base_sh == chunked_sh


def test_chunked_bucket_pairs_edge_cases(spark):
    # boundary coverage for the hot-bucket sharding math: member lists of
    # every size 1..7 against chunk sizes 1..4 (incl. size == cap,
    # size == cap+1, cap 1) must enumerate exactly the i<j pairs
    from itertools import combinations

    from biodiversity_data_ingestion_spark.operators.dedup import (
        _chunked_bucket_pairs,
    )

    rows = [(f"b{n}", list(range(n))) for n in range(1, 8)]
    df = spark.createDataFrame(rows, "bucket STRING, members ARRAY<INT>")
    member_lists = df.select(
        "bucket",
        F.transform("members", lambda m: F.struct(m.alias("doc_id"))).alias("docs"),
    )
    expected = {
        (b, a, c) for b, mem in rows for a, c in combinations(mem, 2)
    }
    for chunk in (1, 2, 3, 4):
        got = {
            (r["bucket"], r["p"]["a"]["doc_id"], r["p"]["b"]["doc_id"])
            for r in _chunked_bucket_pairs(
                member_lists, "docs", ["bucket"], chunk
            ).collect()
        }
        assert got == expected, f"chunk_size={chunk}"


def test_text_features_fusion_matches_joins(spark):
    # the one-pass fused projection must be row-identical to joining the
    # standalone language_id and quality_score operators
    from biodiversity_data_ingestion_spark.operators import textops
    from biodiversity_data_ingestion_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents").limit(300)
    fused = {tuple(r) for r in textops.text_features(docs, "doc_id", "text").collect()}
    joined = {
        tuple(r)
        for r in textops.language_id(docs, "doc_id", "text")
        .join(textops.quality_score(docs, "doc_id", "text"), "doc_id")
        .select(
            "doc_id", "score_en", "score_es", "score_fr", "score_de",
            "predicted_lang", "n_words", "stopword_ratio", "punct_ratio",
            "mean_word_len", "quality",
        )
        .collect()
    }
    assert fused == joined


def test_text_features_precomputed_punct_matches_text_path(spark):
    # r14 narrow-cache path: supplying pre-computed tokenize/length/
    # punct columns (so the raw text column is absent from the cached
    # frame) must be row-identical to the text-column path — the
    # corpus_curation_pipeline relies on this to cache two longs
    # instead of the full document
    from pyspark.sql import functions as F

    from biodiversity_data_ingestion_spark.functions.textfn import tokenize
    from biodiversity_data_ingestion_spark.operators import textops
    from biodiversity_data_ingestion_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents").limit(300)
    t = F.col("text")
    narrow = docs.select(
        "doc_id", "source",
        tokenize(F.lower(t)).alias("_words"),
        F.length(t).alias("_n_chars"),
        (F.length(t) - F.length(F.regexp_replace(t, r"[^\w\s]", "")))
        .alias("_n_punct"),
    )
    assert "text" not in narrow.columns
    got = {
        tuple(r)
        for r in textops.text_features(
            narrow, "doc_id", "text", keep=("source",), words_col="_words",
            n_chars_col="_n_chars", n_punct_col="_n_punct",
        ).collect()
    }
    want = {
        tuple(r)
        for r in textops.text_features(
            docs, "doc_id", "text", keep=("source",)
        ).collect()
    }
    assert got == want


def test_text_features_missing_text_without_precomputed_raises(spark):
    # r14 verdict robustness nit: when the raw text column is absent the
    # operator must fail with a CLEAR contract error unless ALL derived
    # inputs (words/n_chars/n_punct) are precomputed — not an opaque
    # TypeError from F.lower(None) deep in plan construction
    import pytest

    from biodiversity_data_ingestion_spark.operators import textops

    narrow = spark.createDataFrame(
        [(1, ["a", "b"])], "doc_id long, _words array<string>"
    )
    with pytest.raises(ValueError, match="text_features.*absent"):
        textops.text_features(narrow, "doc_id", "text", words_col="_words")
    with pytest.raises(ValueError, match="text_features.*absent"):
        textops.text_features(narrow, "doc_id", "text")


def test_st_within_matches_ray_cast_kernel(spark):
    # the unrolled pure-expression ray cast must agree with the numpy
    # kernel on every grid point — including a NON-convex ring, which
    # the half-plane oracle can't express
    import numpy as np

    from biodiversity_data_ingestion_spark.functions.st import st_within
    from biodiversity_data_ingestion_spark.operators.geo import _ray_cast

    polys = [
        [(-100.5, -50.5), (50.5, -60.5), (80.5, 40.5), (-120.5, 55.5)],
        [(100.3, -20.7), (160.3, 10.7), (120.3, 60.7)],
        # non-convex "arrowhead"
        [(0.5, 0.5), (40.5, 0.5), (20.5, 20.5), (40.5, 40.5), (0.5, 40.5)],
    ]
    pts = [(la + 0.15, lo + 0.15) for la in range(-80, 90, 10) for lo in range(-170, 180, 10)]
    df = spark.createDataFrame(pts, "lat double, lon double")
    for poly in polys:
        got = {
            (r["lat"], r["lon"]): r["inside"]
            for r in df.select(
                "lat", "lon", st_within(F.col("lat"), F.col("lon"), poly).alias("inside")
            ).collect()
        }
        lat = np.array([p[0] for p in pts])
        lon = np.array([p[1] for p in pts])
        want = _ray_cast(lat, lon, np.asarray(poly, dtype=np.float64))
        for (la, lo), w in zip(pts, want):
            assert got[(la, lo)] == bool(w), (poly[:2], la, lo)


def test_st_point_roundtrip_and_distance(spark):
    from biodiversity_data_ingestion_spark.functions.st import (
        st_distance_sphere,
        st_dwithin,
        st_point_wkt,
        st_x,
        st_y,
    )

    df = spark.createDataFrame(
        [(48.8566, 2.3522, 51.5074, -0.1278)], "lat1 double, lon1 double, lat2 double, lon2 double"
    )
    row = df.select(
        st_point_wkt(F.col("lon1"), F.col("lat1")).alias("wkt"),
        st_distance_sphere(F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")).alias("d"),
        st_dwithin(F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2"), 400_000).alias("near"),
    ).first()
    assert row["wkt"] == "POINT (2.352200 48.856600)"
    df2 = spark.createDataFrame([(row["wkt"],)], "wkt string")
    r2 = df2.select(st_x(F.col("wkt")).alias("x"), st_y(F.col("wkt")).alias("y")).first()
    assert abs(r2["x"] - 2.3522) < 1e-6 and abs(r2["y"] - 48.8566) < 1e-6
    # Paris-London great-circle ~343-344 km with R=6371 km
    assert 340_000 < row["d"] < 348_000
    assert row["near"]


def test_redact_pii_scrubs_everything(spark):
    from biodiversity_data_ingestion_spark.operators.textops import (
        PII_PATTERNS,
        redact_pii,
    )

    df = spark.createDataFrame(
        [
            (1, "reach me at jane.doe+spam@mail.example.org or 415-555-0199 asap"),
            (2, "server 192.168.001.1 then 10.0.0.255, mail bob@x.io"),
            (3, "no pii here at all"),
        ],
        "id long, t string",
    )
    rows = {r["id"]: r for r in redact_pii(df, "id", "t").collect()}
    assert (rows[1]["n_email"], rows[1]["n_phone"], rows[1]["n_ipv4"]) == (1, 1, 0)
    assert (rows[2]["n_email"], rows[2]["n_phone"], rows[2]["n_ipv4"]) == (1, 0, 2)
    assert (rows[3]["n_email"], rows[3]["n_phone"], rows[3]["n_ipv4"]) == (0, 0, 0)
    assert rows[3]["redacted"] == "no pii here at all"
    # nothing matching any pattern survives in any redacted text
    out = redact_pii(df, "id", "t")
    for pat in PII_PATTERNS.values():
        residual = out.where(F.col("redacted").rlike(pat)).count()
        assert residual == 0, pat


def test_random_projection_preserves_distances(spark):
    # JL property: with d_out=32 deterministic Rademacher signs, all
    # pairwise distance ratios ||P(a)-P(b)|| / ||a-b|| stay in a
    # moderate band (measured on this data: [0.60, 1.42]; numpy
    # true-random signs give the same band — the xor-shift mixer is
    # as good as random). A correlated sign matrix (e.g. a plain LCG)
    # fails this with ratios down to 0.27.
    from itertools import combinations

    from biodiversity_data_ingestion_spark.sources.tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings").limit(60)
    V = {
        r["vec_id"]: np.array(r["embedding"], dtype=float)
        for r in emb.collect()
    }
    proj = similarity.random_projection(emb, "vec_id", "embedding", 64, 32)
    P = {}
    for r in proj.collect():
        P.setdefault(r["vec_id"], {})[r["j"]] = r["comp"]
    Pv = {k: np.array([d[j] for j in sorted(d)]) for k, d in P.items()}
    assert all(len(v) == 32 for v in Pv.values())
    ratios = []
    for a, b in combinations(sorted(V), 2):
        do = np.linalg.norm(V[a] - V[b])
        if do > 1e-9:
            ratios.append(np.linalg.norm(Pv[a] - Pv[b]) / do)
    lo, hi = min(ratios), max(ratios)
    assert 0.45 < lo and hi < 1.75, (lo, hi)
    # sign matrix itself: columns must be near-orthogonal (the failure
    # mode this test exists to catch is inter-column correlation)
    R = np.array(
        [
            [similarity._jl_sign(i, j, 32) for j in range(32)]
            for i in range(64)
        ]
    )
    C = (R.T @ R) / 64 - np.eye(32)
    assert np.abs(C).max() < 0.6, np.abs(C).max()


def test_semantic_dedup_matches_brute_force(spark):
    # SemDeDup blocking is an optimization, not an approximation, when
    # near-duplicates share a cluster: on well-separated blobs the
    # cluster-blocked pair set must EQUAL the unblocked all-pairs set.
    rng = np.random.default_rng(7)
    rows, vid = [], 0
    for blob in range(3):
        center = rng.normal(size=8) * 10 + blob * 100
        for member in range(6):
            # first three are near-duplicates of the center, rest unique
            noise = rng.normal(size=8) * (0.01 if member < 3 else 8.0)
            rows.append((vid, [float(x) for x in center + noise]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    brute = {
        (r["id_a"], r["id_b"])
        for r in similarity.cosine_dup_pairs(
            df, "vec_id", "embedding", threshold=0.999
        ).collect()
    }
    blocked = {
        (r["id_a"], r["id_b"])
        for r in similarity.semantic_dedup_pairs(
            df, "vec_id", "embedding", k=3, n_iter=3, threshold=0.999
        ).collect()
    }
    assert brute, "fixture produced no near-duplicate pairs"
    assert blocked == brute


def test_lzw_roundtrip_crosses_width_boundaries():
    # the codec claim lives or dies on the bitstream: roundtrip data
    # large/random enough to cross the 512/1024/2048 width boundaries
    # AND hit the 12-bit cap (table freeze), plus the KwKwK corner
    import random

    from biodiversity_data_ingestion_spark.operators.multimodal import (
        _lzw_decode,
        _lzw_encode,
    )

    rng = random.Random(11)
    cases = [
        b"",
        b"\x00",
        b"aaaaaaaaaa",          # KwKwK: code == next_code on decode
        b"abcabcabcabc" * 20,
        bytes(range(256)) * 3,
        bytes(rng.randrange(256) for _ in range(20000)),  # past the cap
        (b"the quick brown fox " * 800),
    ]
    for data in cases:
        assert _lzw_decode(_lzw_encode(data, 8), 8) == data
    small = bytes(rng.randrange(4) for _ in range(5000))
    assert _lzw_decode(_lzw_encode(small, 2), 2) == small


def test_gif_decode_golden_and_dead_letter(spark):
    from biodiversity_data_ingestion_spark.operators import multimodal

    df = spark.range(0, 12).withColumnRenamed("id", "doc_id")
    feats = {
        r["doc_id"]: r
        for r in multimodal.decode_gif_features(
            multimodal.synth_gif_payload(df, "doc_id"), "doc_id"
        ).collect()
    }
    for did in range(12):
        w, h = 8 + did % 8, 4 + did % 4
        mi = did % 40 + (h - 1) / 2.0 + (w - 1) / 2.0
        r = feats[did]
        assert (r["width"], r["height"], r["n_pixels"]) == (w, h, w * h)
        assert (r["mean_r"], r["mean_g"], r["mean_b"]) == (mi, 2 * mi, 3 * mi)
    # malformed payload -> all-null feature row under on_error='null'
    bad = spark.createDataFrame(
        [(99, bytearray(b"NOTAGIF"))], "doc_id long, payload binary"
    )
    row = multimodal.decode_gif_features(bad, "doc_id", on_error="null").collect()[0]
    assert row["width"] is None and row["mean_b"] is None


def test_jpeg_decode_general_ac_path(spark):
    # the declared queries only exercise DC+EOB streams (uniform blocks);
    # this hand-crafts a single-block JPEG whose entropy stream carries a
    # real AC coefficient (run/size symbol 0x12 + amplitude bits) and a
    # non-trivial quant table, then checks the decoded mean against an
    # independent numpy dequantize+IDCT reference.
    import struct

    import numpy as np

    from biodiversity_data_ingestion_spark.operators import multimodal as mm

    dc_bits = [0, 0, 0, 12] + [0] * 12
    dc_vals = list(range(12))
    ac_bits = [0, 2] + [0] * 14
    ac_vals = [0x00, 0x12]  # EOB and (run=1, size=2)
    dcc = mm._jpeg_canonical_codes(dc_bits, dc_vals)
    acc = mm._jpeg_canonical_codes(ac_bits, ac_vals)

    wr = mm._JpegBitWriter()
    dc_val, ac_val = -37, 3  # DC=-37; zz[2]=3 after a run of one zero
    t, amp = mm._jpeg_amplitude(dc_val)
    wr.put(*dcc[t]); wr.put(amp, t)
    t2, amp2 = mm._jpeg_amplitude(ac_val)
    assert t2 == 2
    wr.put(*acc[0x12]); wr.put(amp2, t2)
    wr.put(*acc[0x00])
    scan = wr.flush()

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    buf = (
        b"\xff\xd8"
        + seg(0xDB, b"\x00" + bytes([2] * 64))  # qt=2: dequant must apply
        + seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
        + seg(0xC4, b"\x00" + bytes(dc_bits) + bytes(dc_vals))
        + seg(0xC4, b"\x10" + bytes(ac_bits) + bytes(ac_vals))
        + seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + scan
        + b"\xff\xd9"
    )

    zz = np.zeros(64); zz[0] = dc_val; zz[2] = ac_val
    coef = np.zeros(64); coef[mm._JPEG_ZIGZAG] = zz * 2
    k = np.arange(8)
    C = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16) * np.where(
        k[:, None] == 0, np.sqrt(1 / 8), np.sqrt(2 / 8)
    )
    ref = np.clip(np.round(C.T @ coef.reshape(8, 8) @ C + 128), 0, 255)

    df = spark.createDataFrame([(1, bytearray(buf))], "doc_id long, payload binary")
    row = mm.decode_jpeg_features(df, "doc_id").collect()[0]
    assert (row["width"], row["height"], row["n_pixels"]) == (8, 8, 64)
    assert row["mean_gray"] == float(ref.mean())


def test_jpeg_decode_non_block_multiple_dims(spark):
    # the common real-world case the declared synth never hits: w=12,
    # h=10 (not multiples of 8). The scan carries a ceil-padded 2x2 MCU
    # grid; the decoder must crop the padding before the mean, not
    # floor-truncate to a 1x1 grid. Uniform blocks v=100+2*bi+3*bj with
    # q=1 roundtrip exactly, so the cropped mean is closed-form.
    import struct

    import numpy as np

    from biodiversity_data_ingestion_spark.operators import multimodal as mm

    w, h = 12, 10
    dcc = mm._jpeg_canonical_codes(mm._JPEG_DC_BITS, mm._JPEG_DC_VALS)
    acc = mm._jpeg_canonical_codes(mm._JPEG_AC_BITS, mm._JPEG_AC_VALS)
    wr = mm._JpegBitWriter()
    prev_dc = 0
    for bi in range(2):
        for bj in range(2):
            v = 100 + 2 * bi + 3 * bj
            dc = 8 * (v - 128)
            t, amp = mm._jpeg_amplitude(dc - prev_dc)
            wr.put(*dcc[t])
            if t:
                wr.put(amp, t)
            prev_dc = dc
            wr.put(*acc[0x00])
    scan = wr.flush()

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    buf = (
        b"\xff\xd8"
        + seg(0xDB, b"\x00" + bytes([1] * 64))
        + seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
        + seg(0xC4, b"\x00" + bytes(mm._JPEG_DC_BITS) + bytes(mm._JPEG_DC_VALS))
        + seg(0xC4, b"\x10" + bytes(mm._JPEG_AC_BITS) + bytes(mm._JPEG_AC_VALS))
        + seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + scan
        + b"\xff\xd9"
    )
    ref = np.zeros((16, 16))
    for bi in range(2):
        for bj in range(2):
            ref[bi * 8 : bi * 8 + 8, bj * 8 : bj * 8 + 8] = 100 + 2 * bi + 3 * bj
    expected = float(ref[:h, :w].mean())

    df = spark.createDataFrame([(1, bytearray(buf))], "doc_id long, payload binary")
    row = mm.decode_jpeg_features(df, "doc_id").collect()[0]
    assert (row["width"], row["height"], row["n_pixels"]) == (w, h, w * h)
    assert row["mean_gray"] == expected


def test_jpeg444_decode_non_block_multiple_dims(spark):
    # color twin of the crop test: 12x10 4:4:4, per-channel uniform
    # blocks, decoder must ceil-pad the interleaved MCU grid and crop
    # each plane before the channel means.
    import struct

    import numpy as np

    from biodiversity_data_ingestion_spark.operators import multimodal as mm

    w, h = 12, 10
    dcc = mm._jpeg_canonical_codes(mm._JPEG_DC_BITS, mm._JPEG_DC_VALS)
    acc = mm._jpeg_canonical_codes(mm._JPEG_AC_BITS, mm._JPEG_AC_VALS)
    wr = mm._JpegBitWriter()
    prev = [0, 0, 0]
    chan = lambda bi, bj: (90 + 2 * bi + 3 * bj, 60 + bi, 40 + bj)
    for bi in range(2):
        for bj in range(2):
            for ci, v in enumerate(chan(bi, bj)):
                dc = 8 * (v - 128)
                t, amp = mm._jpeg_amplitude(dc - prev[ci])
                wr.put(*dcc[t])
                if t:
                    wr.put(amp, t)
                prev[ci] = dc
                wr.put(*acc[0x00])
    scan = wr.flush()

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    comps = b"".join(bytes([cid, 0x11, 0]) for cid in (1, 2, 3))
    sos_comps = b"".join(bytes([cid, 0x00]) for cid in (1, 2, 3))
    buf = (
        b"\xff\xd8"
        + seg(0xDB, b"\x00" + bytes([1] * 64))
        + seg(0xC0, struct.pack(">BHHB", 8, h, w, 3) + comps)
        + seg(0xC4, b"\x00" + bytes(mm._JPEG_DC_BITS) + bytes(mm._JPEG_DC_VALS))
        + seg(0xC4, b"\x10" + bytes(mm._JPEG_AC_BITS) + bytes(mm._JPEG_AC_VALS))
        + seg(0xDA, bytes([3]) + sos_comps + bytes([0, 63, 0]))
        + scan
        + b"\xff\xd9"
    )
    refs = [np.zeros((16, 16)) for _ in range(3)]
    for bi in range(2):
        for bj in range(2):
            for ci, v in enumerate(chan(bi, bj)):
                refs[ci][bi * 8 : bi * 8 + 8, bj * 8 : bj * 8 + 8] = v
    exp = [float(r[:h, :w].mean()) for r in refs]

    df = spark.createDataFrame([(1, bytearray(buf))], "doc_id long, payload binary")
    row = mm.decode_jpeg444_features(df, "doc_id").collect()[0]
    assert (row["width"], row["height"], row["n_pixels"]) == (w, h, w * h)
    assert (row["mean_y"], row["mean_cb"], row["mean_cr"]) == tuple(exp)


def test_jpeg_decode_golden_roundtrip(spark):
    from biodiversity_data_ingestion_spark.operators import multimodal

    df = spark.range(0, 18).withColumnRenamed("id", "doc_id")
    feats = {
        r["doc_id"]: r
        for r in multimodal.decode_jpeg_features(
            multimodal.synth_jpeg_payload(df, "doc_id"), "doc_id"
        ).collect()
    }
    for did in range(18):
        w, h = 8 * (1 + did % 3), 8 * (1 + did % 2)
        mean = 100 + did % 64 + (h // 8 - 1) + 1.5 * (w // 8 - 1)
        r = feats[did]
        assert (r["width"], r["height"], r["n_pixels"], r["mean_gray"]) == (
            w, h, w * h, mean,
        )
    bad = spark.createDataFrame(
        [(7, bytearray(b"NOTAJPEG"))], "doc_id long, payload binary"
    )
    row = multimodal.decode_jpeg_features(bad, "doc_id", on_error="null").collect()[0]
    assert row["width"] is None and row["mean_gray"] is None


def test_cms_heavy_hitters_bounds_and_recovery(spark):
    # CMS guarantees: estimates never undercount, overcount bounded by
    # the colliding mass, and on skewed data the true heavy hitters are
    # recovered at the top.
    from collections import Counter

    from biodiversity_data_ingestion_spark.operators.aggregates import (
        cms_heavy_hitters,
    )

    vals = (
        ["alpha"] * 500 + ["beta"] * 300 + ["gamma"] * 150
        + [f"tail_{i}" for i in range(200) for _ in (0, 1)]  # 200 x 2
    )
    true = Counter(vals)
    df = spark.createDataFrame([(v,) for v in vals], "term string")
    top = cms_heavy_hitters(df, "term", width=512, depth=4, k=5).collect()
    est = {r["term"]: r["est_count"] for r in top}
    # top-3 recovered in order
    assert [r["term"] for r in top[:3]] == ["alpha", "beta", "gamma"]
    for t, e in est.items():
        assert e >= true[t]  # never undercounts
        assert e <= true[t] + len(vals) * 4 / 512  # eps*N slack


def test_cms_heavy_hitters_external_candidates(spark):
    # A pre-existing vocab replaces the exact distinct() candidate scan
    # (the web-scale shape): estimates for vocab members must be
    # IDENTICAL to the default path (same sketch, same probes), values
    # outside the vocab are not reported, and a vocab entry absent from
    # the data gets only its cells' collision mass.
    from biodiversity_data_ingestion_spark.operators.aggregates import (
        cms_heavy_hitters,
    )

    vals = ["alpha"] * 500 + ["beta"] * 300 + ["gamma"] * 150 + ["noise"] * 10
    df = spark.createDataFrame([(v,) for v in vals], "term string")
    vocab = spark.createDataFrame(
        [("alpha",), ("beta",), ("gamma",), ("unseen",)], "word string"
    )
    full = {
        r["term"]: r["est_count"]
        for r in cms_heavy_hitters(df, "term", width=512, depth=4, k=10).collect()
    }
    gated = cms_heavy_hitters(
        df, "term", width=512, depth=4, k=10, candidates=vocab
    ).collect()
    got = {r["term"]: r["est_count"] for r in gated}
    assert set(got) <= {"alpha", "beta", "gamma", "unseen"}  # no off-vocab rows
    for t in ("alpha", "beta", "gamma"):
        assert got[t] == full[t]  # identical estimates, same sketch
    assert got.get("unseen", 0) <= len(vals) * 4 / 512  # collision mass only


def test_jpeg444_color_golden_and_grayscale_fallback(spark):
    from biodiversity_data_ingestion_spark.operators import multimodal

    df = spark.range(0, 12).withColumnRenamed("id", "doc_id")
    feats = {
        r["doc_id"]: r
        for r in multimodal.decode_jpeg444_features(
            multimodal.synth_jpeg444_payload(df, "doc_id"), "doc_id"
        ).collect()
    }
    for did in range(12):
        w, h = 8 * (1 + did % 3), 8 * (1 + did % 2)
        nbw, nbh = w // 8, h // 8
        r = feats[did]
        assert (r["mean_y"], r["mean_cb"], r["mean_cr"]) == (
            90 + did % 60 + (nbh - 1) + 1.5 * (nbw - 1),
            60 + did % 40 + 0.5 * (nbh - 1),
            40 + did % 30 + 0.5 * (nbw - 1),
        )
    # the color decoder also accepts grayscale files (1 component):
    gray = multimodal.synth_jpeg_payload(df, "doc_id")
    row = {
        r["doc_id"]: r
        for r in multimodal.decode_jpeg444_features(gray, "doc_id").collect()
    }[5]
    w, h = 8 * (1 + 5 % 3), 8 * (1 + 5 % 2)
    assert row["mean_y"] == 100 + 5 % 64 + (h // 8 - 1) + 1.5 * (w // 8 - 1)
    assert row["mean_cb"] is None and row["mean_cr"] is None


def test_pq_adc_recovers_exact_blobs(spark):
    # Corpus = 4 distinct prototype vectors, each repeated: every
    # subspace codebook recovers the prototypes exactly (centroid of
    # identical members == the member), so a query's own blob scores
    # ADC distance 0 and fills the top ranks before any other blob.
    from biodiversity_data_ingestion_spark.operators.similarity import pq_adc_topk

    protos = {
        0: [1.0] * 16 + [0.0] * 48,
        1: [0.0] * 16 + [1.0] * 16 + [0.0] * 32,
        2: [0.0] * 32 + [1.0] * 16 + [0.0] * 16,
        3: [0.0] * 48 + [1.0] * 16,
    }
    # ids interleave blobs (id % 4 = blob) so the k lowest-id seeds are
    # one prototype per blob — the deterministic-seed contract a PQ
    # caller must respect (seeds from one blob collapse the codebook)
    rows = [(i * 4 + b, protos[b]) for b in range(4) for i in range(5)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = corpus.where(F.col("vec_id").isin(0, 1, 2, 3))
    got = pq_adc_topk(
        corpus, queries, n_subspaces=4, codes_per_subspace=4, n_iter=2, k=5
    ).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {0, 1, 2, 3}
    for q, rs in by_q.items():
        blob = q % 4
        assert len(rs) == 5
        for r in rs:
            assert r.vec_id % 4 == blob  # all top-5 from the query's blob
            assert r.adc_dist == 0  # codebook reconstructs the blob exactly


def test_pq_rerank_improves_recall(spark):
    # the production IVF-PQ tail: exact rerank over the ADC shortlist
    # must recover most of what coarse quantization loses. Fixed-point
    # arithmetic makes these recalls deterministic, so the floors are
    # tight (measured 0.36 plain / 0.84 with a 100-candidate rerank on
    # this corpus).
    from biodiversity_data_ingestion_spark.operators.similarity import (
        pq_adc_topk,
        quantize_vec,
    )
    from biodiversity_data_ingestion_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = emb.orderBy("vec_id").limit(10)
    qv = {
        r.vec_id: r.e
        for r in q.select("vec_id", quantize_vec(F.col("embedding")).alias("e")).collect()
    }
    cv = {
        r.vec_id: r.e
        for r in emb.select(
            "vec_id", quantize_vec(F.col("embedding")).alias("e")
        ).collect()
    }

    def l2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    exact = {
        qid: set(sorted(cv, key=lambda v: (l2(qv[qid], cv[v]), v))[:5]) for qid in qv
    }

    def recall(rerank):
        got = {}
        rows = pq_adc_topk(
            emb, q, n_subspaces=4, codes_per_subspace=8, n_iter=3, k=5,
            rerank=rerank,
        ).collect()
        for r in rows:
            got.setdefault(r.query_id, set()).add(r.vec_id)
        return sum(len(got[qid] & exact[qid]) / 5 for qid in exact) / len(exact)

    plain, reranked = recall(None), recall(100)
    assert plain >= 0.3
    assert reranked >= 0.8
    assert reranked > plain


def test_bloom_prefilter_semi_join_equals_plain(spark):
    # the bloom prefilter must be RESULT-invariant (false positives die
    # in the exact join; false negatives impossible), including at a
    # deliberately tiny width where almost every cell collides
    from biodiversity_data_ingestion_spark.operators.joins import (
        bloom_prefilter_semi_join,
    )
    from biodiversity_data_ingestion_spark.sources.tables import load_table

    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    keys = (
        load_table(spark, "/root/testdata/sf0.001", "customer")
        .where(F.col("c_acctbal") > 5000)
        .select(F.col("c_custkey").alias("o_custkey"))
    )
    plain = sorted(
        r.o_orderkey for r in orders.join(keys, "o_custkey", "left_semi").collect()
    )
    for width in (8, 4096):  # width 8: collision-saturated bloom
        got = sorted(
            r.o_orderkey
            for r in bloom_prefilter_semi_join(
                orders, keys, "o_custkey", width=width
            ).collect()
        )
        assert got == plain
    # n_hashes > 4 used to silently return EMPTY (hash j was an 8-hex
    # slice of ONE md5, so j >= 4 sliced past the digest -> NULL cells
    # that never match); seeded per-hash md5 makes any n_hashes valid
    for n_hashes in (1, 6):
        got = sorted(
            r.o_orderkey
            for r in bloom_prefilter_semi_join(
                orders, keys, "o_custkey", n_hashes=n_hashes
            ).collect()
        )
        assert got == plain


def test_jpeg_progressive_spectral_band_decode(spark):
    # The synth twin's AC band is all-zero (one EOBn run), so this test
    # hand-ENCODES a single-block progressive payload whose AC scan
    # exercises every other symbol class — in-band (run, size)
    # coefficients, a ZRL 16-zero run, and the final EOB — and checks
    # the decoded mean against an independent numpy IDCT of the same
    # coefficient vector.
    import struct

    import numpy as np

    from biodiversity_data_ingestion_spark.operators import multimodal as M

    dc_codes = M._jpeg_canonical_codes(M._JPEG_DC_BITS, M._JPEG_DC_VALS)
    ac_codes = M._jpeg_canonical_codes(M._JPEG_PROG_AC_BITS, M._JPEG_PROG_AC_VALS)

    def put_sym(wr, codes, sym, val=None, size=0):
        code, ln = codes[sym]
        wr.put(code, ln)
        if size:
            t, amp = M._jpeg_amplitude(val)
            assert t == size
            wr.put(amp, t)

    # DC scan: one block, dc = -16 (t=5)
    wr = M._JpegBitWriter()
    t, amp = M._jpeg_amplitude(-16)
    code, ln = dc_codes[t]
    wr.put(code, ln)
    wr.put(amp, t)
    dc_scan = wr.flush()

    # AC scan over [1, 63]: zz[1]=1 (0x01), skip 1 -> zz[3]=-1 (0x11),
    # ZRL (k 4..19), skip 2 -> zz[22]=1 (0x21), then EOB0
    wr = M._JpegBitWriter()
    put_sym(wr, ac_codes, 0x01, 1, 1)
    put_sym(wr, ac_codes, 0x11, -1, 1)
    put_sym(wr, ac_codes, 0xF0)
    put_sym(wr, ac_codes, 0x21, 1, 1)
    put_sym(wr, ac_codes, 0x00)
    ac_scan = wr.flush()

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    payload = (
        b"\xff\xd8"
        + seg(0xDB, bytes([0x00]) + bytes([1] * 64))
        + seg(0xC2, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
        + seg(0xC4, bytes([0x00]) + bytes(M._JPEG_DC_BITS) + bytes(M._JPEG_DC_VALS))
        + seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x00]))
        + dc_scan
        + seg(0xC4, bytes([0x10]) + bytes(M._JPEG_PROG_AC_BITS)
              + bytes(M._JPEG_PROG_AC_VALS))
        + seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x00]))
        + ac_scan
        + b"\xff\xd9"
    )

    df = spark.createDataFrame([(0, bytearray(payload))], "doc_id long, payload binary")
    row = M.decode_jpeg_progressive_features(df, "doc_id").first()
    assert (row["width"], row["height"], row["n_scans"]) == (8, 8, 2)

    # independent reference: same zigzag placement, dequantize (q=1),
    # orthonormal IDCT, level shift, clip/round — straight numpy
    zz = np.zeros(64)
    zz[0], zz[1], zz[3], zz[22] = -16, 1, -1, 1
    coef = np.zeros(64)
    coef[M._JPEG_ZIGZAG] = zz
    k = np.arange(8)
    C = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16) * np.where(
        k[:, None] == 0, np.sqrt(1 / 8), np.sqrt(2 / 8)
    )
    block = C.T @ coef.reshape(8, 8) @ C
    want = float(np.clip(np.round(block + 128), 0, 255).mean())
    assert row["mean_gray"] == want


def test_jpeg_progressive_equals_baseline_decode(spark):
    # cross-codec invariant: the baseline and progressive synth twins
    # share the same content formula, so decoding each with its own
    # from-scratch entropy coder must agree bit-for-bit on dims and
    # mean — two independent coding paths, one answer
    from biodiversity_data_ingestion_spark.operators import multimodal as M

    base = spark.range(0, 24).withColumnRenamed("id", "doc_id")
    b = {r["doc_id"]: r for r in M.decode_jpeg_features(
        M.synth_jpeg_payload(base, "doc_id"), "doc_id").collect()}
    p = {r["doc_id"]: r for r in M.decode_jpeg_progressive_features(
        M.synth_jpeg_progressive_payload(base, "doc_id"), "doc_id").collect()}
    for did in range(24):
        assert (b[did]["width"], b[did]["height"], b[did]["mean_gray"]) == (
            p[did]["width"], p[did]["height"], p[did]["mean_gray"]
        )
        assert p[did]["n_scans"] == 2


def test_variant_props_malformed_json_quarantines(spark, tmp_path):
    # the pathological tier, VARIANT edition: a real event stream always
    # carries some garbage props strings. Strict parse_json raises on
    # the FIRST one and kills the job; the builder uses try_parse_json
    # (NULL k), the oracle mirrors it with json_valid(). Parity is
    # checked bitwise on a planted fixture spanning valid / no-$.k /
    # NULL / two malformed shapes.
    import duckdb

    from biodiversity_data_ingestion_spark.plans.queries import QUERIES

    from .oracle_harness import compare

    rows = [
        (1, "2024-01-01 00:00:00", 10, "click", 1.0, '{"k": 7}'),
        (2, "2024-01-01 00:01:00", 10, "click", 1.0, '{"k": 9}'),
        (3, "2024-01-01 00:02:00", 11, "click", 1.0, "{bad json"),
        (4, "2024-01-01 00:03:00", 11, "click", 1.0, None),
        (5, "2024-01-01 00:04:00", 12, "view", 1.0, "not json at all"),
        (6, "2024-01-01 00:05:00", 12, "view", 1.0, '{"j": 1}'),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    df.coalesce(1).write.parquet(str(tmp_path / "events.parquet"))

    spec = QUERIES["variant_props_stats"]
    out = spec["builder"](spark, str(tmp_path))  # must not raise
    got = {r["event_type"]: (r["n"], r["sum_k"], r["max_k"], r["n_distinct_k"])
           for r in out.collect()}
    assert got == {"click": (4, 16, 9, 2), "view": (2, None, None, 0)}

    from .oracle_harness import duckdb_con_raw

    con = duckdb_con_raw()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet/*.parquet'"
    )
    res = compare("variant_props_malformed", out, con, spec["oracle"])
    assert res.ok, res.problems


# ---------------------------------------------------------------------------
# pathological text rows (NULL / empty / whitespace-only / single word /
# unicode) must never crash the text-analysis or dedup families — the
# r12 follow-on to the zero-norm embedding audit: a 100 TB crawl corpus
# always contains such rows, and under the ANSI default any unguarded
# expression raise kills the whole job


def test_pathological_documents_never_crash(spark):
    from biodiversity_data_ingestion_spark.operators import textops

    rows = [
        (1, None),
        (2, ""),
        (3, "   "),
        (4, "word"),
        (5, "ümläut 世界 emoji"),
        (6, "a normal english document with the usual words and the rest"),
        (7, "a normal english document with the usual words and the rest"),
    ]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")

    # text-analysis family: one output row per input, NULL metrics for
    # the NULL document, zero crash anywhere
    for fn in (textops.token_stats, textops.language_id,
               textops.quality_score, textops.fingerprint):
        out = fn(docs, "doc_id", "text").collect()
        assert len(out) == len(rows), fn.__name__
    ts = {r["doc_id"]: r["n_tokens"] for r in textops.token_stats(docs, "doc_id", "text").collect()}
    assert ts[1] is None and ts[4] == 1

    # dedup family: NULL/short docs neither pair nor crash; the planted
    # exact duplicate (6, 7) is still found by every path
    exact = {r["content_hash"]: (r["kept_id"], r["n_copies"])
             for r in dedup.dedup_exact(docs, "text", "doc_id").collect()}
    assert (6, 2) in exact.values()
    for pairs_fn in (
        lambda: dedup.ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5),
        lambda: dedup.minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.5),
        lambda: dedup.simhash_near_pairs(docs, "doc_id", "text"),
    ):
        got = {(r["doc_a"], r["doc_b"]) for r in pairs_fn().collect()}
        assert got == {(6, 7)}, got

    # ANN family with NULL / ragged embeddings: NULL similarity, no raise
    emb = spark.createDataFrame(
        [(1, [0.5, 0.5, 0.5, 0.5]), (2, None), (3, [0.1, 0.9, 0.2, 0.7]),
         (4, [0.3, 0.4])],  # ragged width: zip_with pads with NULL
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )
    topk = similarity.cosine_topk(emb, emb.where(F.col("vec_id") == 1), k=10).collect()
    sims = {r["neighbor_id"]: r["cos_sim"] for r in topk}
    assert sims[2] is None and sims[4] is None and sims[3] is not None

    # NULL embeddings through the clustering path: kmeans assigns the
    # NULL-dist doc DETERMINISTICALLY (struct-min orders the NULL
    # distance first, cluster-id tie-break => cluster 0 — stable
    # across partitionings) and SemDeDup never pairs it (NULL cosine
    # drops at the threshold) — no crash end-to-end
    ass = {r["vec_id"]: r["cluster"]
           for r in similarity.kmeans_lloyd(emb, "vec_id", "embedding", k=2, n_iter=2).collect()}
    assert len(ass) == 4 and ass[2] == 0
    sem = [(r["id_a"], r["id_b"])
           for r in similarity.semantic_dedup_pairs(emb, k=2, n_iter=2, threshold=0.9).collect()]
    assert not any(2 in p for p in sem)


def test_pathological_coordinates_quarantine_geo_kernels(spark):
    # The geo leg of the pathological-input tier (the probe class that
    # found the SimHash, WAV, BMP and JPEG bugs): a 100 TB occurrence
    # corpus always carries NULL/NaN/inf coordinates and garbage radii.
    # Contract per kernel: garbage rows quarantine (NULL output or
    # exclusion from the group metric) — never a raise, never a
    # silently-wrong or self-inconsistent row. Three real bugs fixed
    # when this test was written (geo.py): (1) buffer_wkt passed
    # NaN/inf radius+lon through its validity guard and emitted
    # "POLYGON ((NaN Infinity, ..." WKT; (2) convex_hull_fixed_point
    # cast NaN to INT64_MIN, planting a fake dominant hull vertex whose
    # shoelace products wrapped int64 into plausible-but-wrong exact
    # metrics; (3) convex_hull_range_km2 emitted the self-inconsistent
    # (range_km2=NULL, n_points counting the garbage) row.
    from biodiversity_data_ingestion_spark.functions.st import st_within
    from biodiversity_data_ingestion_spark.operators.geo import (
        buffer_wkt,
        convex_hull_fixed_point,
        convex_hull_range_km2,
        grid_zonal_stats,
        point_in_polygons_filter,
        zone_annotation,
    )

    nan, inf = float("nan"), float("inf")

    # buffer_wkt: every garbage combination -> NULL, valid row -> clean WKT
    buf = spark.createDataFrame(
        [
            (1, 10.0, 20.0, nan),
            (2, 10.0, 20.0, inf),
            (3, 10.0, 20.0, -inf),
            (4, nan, 20.0, 500.0),
            (5, 10.0, nan, 500.0),
            (6, 10.0, inf, 500.0),
            (7, 89.5, 20.0, 500.0),  # outside the +-89 tangent-plane domain
            (8, None, 20.0, 500.0),
            (9, 10.0, 20.0, None),
            (10, 10.0, 20.0, 500.0),
        ],
        "id LONG, lat DOUBLE, lon DOUBLE, radius_m DOUBLE",
    )
    got = {r["id"]: r["uncertainty_geom_wkt"]
           for r in buffer_wkt(buf, "lat", "lon", "radius_m").collect()}
    assert all(got[i] is None for i in range(1, 10)), got
    assert got[10].startswith("POLYGON ((") and "NaN" not in got[10] and "Infinity" not in got[10]

    # hull kernels: garbage rows in a group change NOTHING vs the clean
    # subset; an all-garbage group degrades to the explicit empty metric
    pts = [
        ("sp", 10.0, 10.0), ("sp", 10.0, 11.0), ("sp", 11.0, 10.5),
        ("sp", nan, 10.2), ("sp", 10.2, inf), ("sp", None, 10.3),
        ("sp", 1.0e17, 10.4),  # finite but quantization-overflowing
        ("junk", nan, nan), ("junk", inf, -inf),
    ]
    dirty = spark.createDataFrame(pts, "g STRING, lat DOUBLE, lon DOUBLE")
    clean = spark.createDataFrame(pts[:3], "g STRING, lat DOUBLE, lon DOUBLE")

    fp = {r["g"]: (r["n_pts"], r["hull_vertices"], r["area2_fp"])
          for r in convex_hull_fixed_point(dirty, "g").collect()}
    fp_clean = {r["g"]: (r["n_pts"], r["hull_vertices"], r["area2_fp"])
                for r in convex_hull_fixed_point(clean, "g").collect()}
    assert fp["sp"] == fp_clean["sp"] == (3, 3, 10000)
    assert fp["junk"] == (0, 0, 0)

    # the quarantine bound scales with the quantization: at scale=1e6
    # (micro-degrees) coordinates are admitted only up to |1| deg —
    # quantized magnitude stays <= 1e6 so the int64 shoelace cannot
    # wrap at ANY scale argument (a literal 1e4-degree bound would
    # re-open the silent-wrap hole at this scale). The unit right
    # triangle quantizes exactly: area2 = 1e6 * 1e6.
    tri = spark.createDataFrame(
        [("t", 0.0, 0.0), ("t", 0.0, 1.0), ("t", 1.0, 0.0),
         ("t", 2.0, 0.5), ("t", nan, 0.5)],  # 2 deg > 1e6/scale -> dropped
        "g STRING, lat DOUBLE, lon DOUBLE",
    )
    big = convex_hull_fixed_point(tri, "g", scale=10**6).collect()[0]
    assert (big["n_pts"], big["hull_vertices"], big["area2_fp"]) == (
        3, 3, 10**6 * 10**6)

    km = {r["g"]: (r["range_km2"], r["n_points"])
          for r in convex_hull_range_km2(dirty, "g").collect()}
    km_clean = {r["g"]: (r["range_km2"], r["n_points"])
                for r in convex_hull_range_km2(clean, "g").collect()}
    # the float path quarantines non-finite only (1e17 deg stays, as in
    # the reference's float kernel); self-consistency is the contract:
    # a non-NULL area whenever n_points counts anything
    assert km["sp"][0] is not None and km["sp"][1] == 4.0
    assert km_clean["sp"] == (km_clean["sp"][0], 3.0) and km_clean["sp"][0] is not None
    assert km["junk"] == (0.0, 0.0)

    # point-in-polygon: garbage points are NOT inside (both kernels
    # agree with shapely's within=False on invalid geometry); the numpy
    # kernel and the unrolled ST_ expression stay bitwise-equal on them
    square = [(-1.0, -1.0), (1.0, -1.0), (1.0, 1.0), (-1.0, 1.0)]
    pp = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, nan, 0.0), (3, 0.0, nan), (4, inf, 0.0),
         (5, 0.0, -inf), (6, None, 0.0), (7, 0.5, 0.5)],
        "id LONG, lat DOUBLE, lon DOUBLE",
    )
    inside_ids = {r["id"] for r in
                  point_in_polygons_filter(spark, pp, [square]).collect()}
    assert inside_ids == {1, 7}
    st_ids = {r["id"] for r in
              pp.where(st_within(F.col("lat"), F.col("lon"), square)).collect()}
    assert st_ids == inside_ids

    # zone annotation: garbage points hit no zone (empty array), no raise
    zones = [{"polygon": square, "value": "z1"}]
    za = {r["id"]: r["zone_values"]
          for r in zone_annotation(spark, pp, zones).collect()}
    assert za[1] == ["z1"] and za[2] == [] and za[4] == [] and za[6] == []

    # zonal stats: NaN coordinates propagate to a NULL/NaN mean (NULL-in
    # -> NULL-out, never a partial row), row count preserved, no raise
    zs = grid_zonal_stats(pp, "lat", "lon", "lat", ["bio1"]).collect()
    assert len(zs) == 7
    vals = {r["id"]: r["clim_bio1"] for r in zs}
    assert vals[1] == vals[1]
    assert vals[2] is None or vals[2] != vals[2]  # Arrow lands NaN as NULL

    # centroid anti-join (P9 grid-blocked haversine): only provably-close
    # points drop; garbage coordinates survive for the upstream P7
    # range filters to reject — and the NaN grid-cell cast must not
    # raise under ANSI (floor(NaN) casts to NULL cell, joins nothing)
    cents = spark.createDataFrame([(0.0, 0.0)], "c_lat DOUBLE, c_lon DOUBLE")
    kept = {r["id"] for r in
            cleaning.centroid_distance_filter(pp, cents).collect()}
    assert kept == {2, 3, 4, 5, 6, 7}  # only 1 sits within 5 km of (0,0)


def test_weighted_sample_zero_weight_docs_quarantine(spark, tmp_path):
    # the pathological tier, weighted-sampling edition: an empty doc
    # (n_chars = 0) made the Efraimidis-Spirakis key's 1/w RAISE
    # [DIVIDE_BY_ZERO] under ANSI — one empty document killed the whole
    # sampling job, while the oracle (DuckDB 1.0/0 -> NULL) kept
    # running. Contract: zero/NULL-weight docs get a NULL key and rank
    # last (never sampled while enough weighted docs exist); parity
    # checked bitwise on the planted fixture.
    import duckdb

    from biodiversity_data_ingestion_spark.plans.queries import QUERIES

    from .oracle_harness import compare

    rows = [(i, f"doc {i} text", 10 + i, "en", "src0") for i in range(60)]
    rows += [(100, "", 0, "en", "src0"), (101, None, None, "en", "src0")]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, n_chars long, lang string, source string"
    )
    df.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))

    spec = QUERIES["weighted_doc_sample"]
    out = spec["builder"](spark, str(tmp_path))  # must not raise
    got = {r["doc_id"] for r in out.collect()}
    assert 100 not in got and 101 not in got and len(got) == 50

    from .oracle_harness import duckdb_con_raw

    con = duckdb_con_raw()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet/*.parquet'"
    )
    res = compare("weighted_zero_weight", out, con, spec["oracle"])
    assert res.ok, res.problems


def test_zero_denominator_queries_quarantine(spark, tmp_path):
    # the pathological tier, zero-denominator edition (the class the
    # r12 zero-norm cosine fix opened): data-dependent denominators
    # that are legitimately zero on real streams must NULL out like
    # the SQL oracle, not raise [DIVIDE_BY_ZERO] under ANSI. Two fixed
    # sites: user_time_weighted_value (a user whose events all share
    # one timestamp has sum(dt_us) = 0) and price_ks_drift (a priority
    # with orders in only one of the compared years has a zero column
    # total). Parity checked bitwise on planted fixtures.
    import duckdb

    from biodiversity_data_ingestion_spark.plans.queries import QUERIES

    from .oracle_harness import compare

    ev_rows = [
        # user 10: two events at the SAME instant -> one zero-length
        # interval, sum(dt_us) = 0 -> NULL twa, user dropped
        (1, "2024-01-01 00:00:00", 10, "click", 5.0, None),
        (2, "2024-01-01 00:00:00", 10, "click", 7.0, None),
        # user 11: a normal pair -> twa = first value
        (3, "2024-01-01 00:00:00", 11, "click", 4.0, None),
        (4, "2024-01-01 01:00:00", 11, "click", 9.0, None),
    ]
    spark.createDataFrame(
        ev_rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp")).coalesce(1).write.parquet(
        str(tmp_path / "events.parquet")
    )
    spec = QUERIES["user_time_weighted_value"]
    out = spec["builder"](spark, str(tmp_path))  # must not raise
    got = {r["user_id"]: r["twa_value"] for r in out.collect()}
    assert got == {11: 4.0}

    from .oracle_harness import duckdb_con_raw

    con = duckdb_con_raw()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet/*.parquet'"
    )
    res = compare("twa_zero_duration", out, con, spec["oracle"])
    assert res.ok, res.problems

    # ks drift: priority 'A' has 1995 orders only -> zero 1996 total
    o_rows = [
        (1, "A", 100.0, "1995-03-01"), (2, "A", 200.0, "1995-04-01"),
        (3, "B", 100.0, "1995-03-01"), (4, "B", 150.0, "1996-03-01"),
        (5, "B", 250.0, "1996-04-01"),
    ]
    spark.createDataFrame(
        o_rows, "o_orderkey long, o_orderpriority string, "
        "o_totalprice double, o_orderdate string"
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp")).coalesce(
        1
    ).write.parquet(str(tmp_path / "orders.parquet"))
    spec2 = QUERIES["price_ks_drift"]
    out2 = spec2["builder"](spark, str(tmp_path))  # must not raise
    ks = {r["o_orderpriority"]: r["ks"] for r in out2.collect()}
    assert ks["B"] is not None

    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM '{tmp_path}/orders.parquet/*.parquet'"
    )
    res2 = compare("ks_single_year_priority", out2, con, spec2["oracle"])
    assert res2.ok, res2.problems


def test_pathological_timestamps_quarantine_temporal_operators(spark):
    # The temporal leg of the pathological-input tier: NULL keys and
    # NULL timestamps through the as-of join and SCD2 compression.
    # Contract (matching the SQL formulations of both oracles): a NULL
    # key or NULL right-timestamp can never satisfy the as-of predicate
    # (equality/inequality with NULL is NULL), and an untimed
    # observation never enters a validity timeline. Bugs fixed when this
    # was written: asof_join's NULLS-FIRST window sort let a NULL-ts or
    # NULL-key right row MATCH every left row as the "earliest" state;
    # scd2_compress sorted NULL ts first (DuckDB sorts it last),
    # yielding a different history per engine.
    from biodiversity_data_ingestion_spark.operators.scd import scd2_compress

    left = spark.createDataFrame(
        [(1, "u1", 100), (2, "u1", None), (3, None, 100), (4, "u2", 100)],
        "event_id LONG, user_id STRING, ts LONG",
    )
    right = spark.createDataFrame(
        [(10, "u1", 50, 5.0), (11, "u1", None, 6.0), (12, None, 40, 7.0),
         (13, "u2", None, 8.0)],
        "event_id LONG, user_id STRING, ts LONG, value DOUBLE",
    )
    out = {r["event_id"]: r["asof_event_id"]
           for r in joins.asof_join(left, right, "user_id", "ts", "ts",
                                    tie_col="event_id").collect()}
    # click 1: only the timed u1 purchase (10) matches; the NULL-ts u1
    # row (11) and NULL-key row (12) never do. click 2 (NULL ts), click
    # 3 (NULL key) and click 4 (whose only candidate is untimed) all
    # keep NULL — every left row survives (LEFT-join contract).
    assert out == {1: 10, 2: None, 3: None, 4: None}

    obs = spark.createDataFrame(
        [("u1", 1, 1, "a"), ("u1", None, 2, "b"), ("u1", 5, 3, "c"),
         ("u2", None, 4, "x")],
        "user_id STRING, ts LONG, event_id LONG, value STRING",
    )
    hist = {(r["user_id"], r["valid_from"], r["valid_to"], r["value"])
            for r in scd2_compress(obs, "user_id", "ts", "value",
                                   tiebreak="event_id").collect()}
    # the untimed 'b' observation is quarantined (not a phantom first
    # row); u2's only observation is untimed, so u2 has no history
    assert hist == {("u1", 1, 5, "a"), ("u1", 5, None, "c")}


def test_truncated_payloads_quarantine_across_all_codecs(spark):
    # The realistic 100 TB corruption class: a VALID header with the
    # body cut mid-stream (failed upload, truncated blob). Contract,
    # pinned per decoder: the full payload decodes; under
    # on_error='null' NO truncation ever raises or hangs; gross
    # truncations (header-only, quarter, half, three-quarter cuts)
    # quarantine to all-null rows. Documented tail tolerance (matches
    # real-world decoders): a GIF missing only its 0x3B trailer, a PNG
    # missing one IEND byte, and a Y4M missing its final (unused
    # chroma) byte still decode — the pixel data is complete. WAV
    # explicitly REJECTS short PCM data (a header/data mismatch would
    # otherwise yield a self-inconsistent row).
    from biodiversity_data_ingestion_spark.operators import multimodal as M

    base = spark.range(0, 1).withColumnRenamed("id", "doc_id")
    cases = [
        ("wav", M.synth_wav_payload, M.decode_wav_features, False),
        ("bmp", M.synth_bmp_payload, M.decode_bmp_features, False),
        ("y4m", M.synth_y4m_payload, M.decode_y4m_features, True),
        ("png", M.synth_png_payload, M.decode_png_features, True),
        ("gif", M.synth_gif_payload, M.decode_gif_features, True),
        ("jpeg", M.synth_jpeg_payload, M.decode_jpeg_features, False),
        ("jpeg444", M.synth_jpeg444_payload, M.decode_jpeg444_features, False),
        ("jpeg_prog", M.synth_jpeg_progressive_payload,
         M.decode_jpeg_progressive_features, False),
    ]
    for name, synth, dec, tail_tolerant in cases:
        payload = bytes(synth(base, "doc_id").select("payload").first()[0])
        n = len(payload)
        rows = [(0, bytearray(payload))]
        cuts = [8, n // 4, n // 2, 3 * n // 4, n - 1]
        for i, c in enumerate(cuts):
            rows.append((i + 1, bytearray(payload[: max(1, c)])))
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        out = {r["doc_id"]: r for r in dec(df, "doc_id", on_error="null").collect()}
        feats = [c for c in out[0].__fields__ if c != "doc_id"]
        probe = feats[1]
        assert out[0][probe] is not None, f"{name}: full payload must decode"
        for i in range(1, 5):  # header-only through 3/4 cut: quarantined
            assert out[i][probe] is None, f"{name}: cut {cuts[i-1]}/{n} must be null"
        last = out[5][probe] is not None
        assert last == tail_tolerant, f"{name}: last-byte-cut decoded={last}"


def test_corrupt_headers_quarantine_across_all_codecs(spark):
    # The OTHER 100 TB corruption class (r12 verdict #6): an intact
    # body under a CORRUPT header — bit-flipped magic, mis-declared
    # dimensions, bogus depth/precision fields. Contract, pinned per
    # codec and per field: under on_error='null' every corruption
    # either quarantines to an all-null row or decodes to a defensible
    # row (pinned explicitly below) — never a garbage row, never a
    # raise, and never an allocation bomb (a corrupt JPEG SOF declaring
    # 0xFFFF x 0xFFFF would otherwise allocate a ~4 GiB block grid per
    # row before the bit reader could fail; the entropy-capacity guard
    # in the decoder is what this case proves).
    import struct

    from biodiversity_data_ingestion_spark.operators import multimodal as M

    base = spark.range(0, 1).withColumnRenamed("id", "doc_id")

    def mut(payload, fn):
        m = bytearray(payload)
        fn(m)
        return bytes(m)

    def repl(old, new):
        def fn(m):
            i = bytes(m).index(old)
            m[i : i + len(old)] = new
        return fn

    def pack(fmt, off, *vals):
        def fn(m):
            struct.pack_into(fmt, m, off, *vals)
        return fn

    def sof_pack(payload, dh, dw=None, prec=None):
        # SOF0 body: marker(2) len(2) prec(1) h(2) w(2) ncomp(1)...
        sof = bytes(payload).index(b"\xff\xc0")
        def fn(m):
            if prec is not None:
                m[sof + 4] = prec
            struct.pack_into(">H", m, sof + 5, dh)
            struct.pack_into(">H", m, sof + 7, dh if dw is None else dw)
        return fn

    # (codec, synth, decoder, [(label, mutate_fn_factory, expect)])
    # expect: "null" = quarantined; "same" = decodes bit-identically to
    # the valid payload (tolerated corruption — the field is not
    # authoritative); "decodes" = non-null but legitimately different
    # (header-trusted reinterpretation, self-consistent by contract)
    specs = [
        ("wav", M.synth_wav_payload, M.decode_wav_features, [
            ("bad RIFF magic", lambda p: repl(b"RIFF", b"XIFF"), "null"),
            ("bad WAVE magic", lambda p: repl(b"WAVE", b"XAVE"), "null"),
            ("channels=0", lambda p: pack("<H", 22, 0), "null"),
            # stdlib wave accepts rate=0; the duration division is the
            # guard that routes it to the dead letter
            ("rate=0", lambda p: pack("<I", 24, 0), "null"),
            # declared data size 2x actual: header/data mismatch would
            # yield a self-INCONSISTENT row (header frames, half the
            # samples) — the r12 short-PCM check quarantines it
            ("data size doubled",
             lambda p: pack("<I", 40, 2 * struct.unpack_from("<I", p, 40)[0]),
             "null"),
            # declared data size 1/2 actual: wave trusts the chunk and
            # decodes HALF the frames — self-consistent (n_frames,
            # rms, peak all agree), trailing bytes ignored per spec
            ("data size halved",
             lambda p: pack("<I", 40, struct.unpack_from("<I", p, 40)[0] // 2),
             "decodes"),
        ]),
        ("bmp", M.synth_bmp_payload, M.decode_bmp_features, [
            ("bad BM magic", lambda p: repl(b"BM", b"XM"), "null"),
            # width-1 keeps the SAME 4-byte stride (synth w=8 -> 7,
            # both stride 24): the result is a well-formed w=7 BMP
            # whose padding bytes hold pixel garbage — undetectable by
            # ANY decoder (padding content is unspecified), so it
            # decodes header-trusted. Width-2 SHRINKS the stride
            # (20*h != file size) and the exact-fill check quarantines
            ("width-1 (stride unchanged: valid BMP)",
             lambda p: pack("<i", 18, struct.unpack_from("<i", p, 18)[0] - 1),
             "decodes"),
            ("width-2 (stride shrinks)",
             lambda p: pack("<i", 18, struct.unpack_from("<i", p, 18)[0] - 2),
             "null"),
            ("width+1",
             lambda p: pack("<i", 18, struct.unpack_from("<i", p, 18)[0] + 1),
             "null"),
            ("width=0", lambda p: pack("<i", 18, 0), "null"),
            # NEGATIVE height is legal BMP (top-down rows): decodes,
            # and channel means are order-invariant => bit-identical
            ("height negated (top-down)",
             lambda p: pack("<i", 22, -struct.unpack_from("<i", p, 22)[0]),
             "same"),
            ("bpp=32", lambda p: pack("<H", 28, 32), "null"),
        ]),
        ("y4m", M.synth_y4m_payload, M.decode_y4m_features, [
            ("bad magic", lambda p: repl(b"YUV4MPEG2", b"YUV4MPEG9"), "null"),
            ("width=0", lambda p: repl(b" W8 ", b" W0 "), "null"),
            ("negative width", lambda p: repl(b" W8 ", b" W-8 "), "null"),
            ("chroma 444", lambda p: repl(b"C420jpeg", b"C444    "), "null"),
        ]),
        ("png", M.synth_png_payload, M.decode_png_features, [
            ("bad signature", lambda p: pack("<B", 0, 0x88), "null"),
            ("IHDR width+1",
             lambda p: pack(">I", 16, struct.unpack_from(">I", p, 16)[0] + 1),
             "null"),
            # huge declared width: the scanline-length assert fires
            # BEFORE any per-row work — no allocation, no hang
            ("IHDR width huge", lambda p: pack(">I", 16, 0x40000000), "null"),
            ("IHDR depth=16", lambda p: pack("<B", 24, 16), "null"),
        ]),
        ("gif", M.synth_gif_payload, M.decode_gif_features, [
            ("bad magic", lambda p: repl(b"GIF89a", b"GIF89x"), "null"),
            ("no global color table", lambda p: pack("<B", 10, 0x77), "null"),
            # image-descriptor dims are authoritative: corrupting them
            # breaks the LZW pixel-count cross-check
            ("image width+1",
             lambda p: pack("<H", 786, struct.unpack_from("<H", p, 786)[0] + 1),
             "null"),
            ("LZW min code 8->7", lambda p: pack("<B", 791, 7), "null"),
            # the logical SCREEN descriptor is display metadata, not
            # the decoded image's dims — corruption there is tolerated
            ("screen width+1",
             lambda p: pack("<H", 6, struct.unpack_from("<H", p, 6)[0] + 1),
             "same"),
        ]),
        ("jpeg", M.synth_jpeg_payload, M.decode_jpeg_features, [
            ("bad SOI", lambda p: pack("<B", 1, 0xD7), "null"),
            ("SOF dims=0", lambda p: sof_pack(p, 0), "null"),
            # THE allocation-bomb case: 0xFFFF x 0xFFFF = 67M blocks /
            # ~4 GiB grid; the entropy-capacity guard must quarantine
            # it without allocating
            ("SOF dims huge", lambda p: sof_pack(p, 0xFFFF), "null"),
            ("SOF precision=12", lambda p: sof_pack(
                p, struct.unpack_from(
                    ">H", p, bytes(p).index(b"\xff\xc0") + 5)[0], None, 12),
             "null"),
        ]),
        ("jpeg444", M.synth_jpeg444_payload, M.decode_jpeg444_features, [
            ("bad SOI", lambda p: pack("<B", 1, 0xD7), "null"),
            ("SOF dims huge", lambda p: sof_pack(p, 0xFFFF), "null"),
        ]),
        ("jpeg_prog", M.synth_jpeg_progressive_payload,
         M.decode_jpeg_progressive_features, [
            ("bad SOI", lambda p: pack("<B", 1, 0xD7), "null"),
            # SOF2 body layout matches SOF0 — reuse sof_pack against
            # the 0xFFC2 marker by patching the search target
            ("SOF2 dims=0", lambda p: pack(
                ">HH", bytes(p).index(b"\xff\xc2") + 5, 0, 0), "null"),
            # the allocation-bomb case, progressive edition: the DC
            # scan's entropy capacity must bound the grid BEFORE
            # allocation
            ("SOF2 dims huge", lambda p: pack(
                ">HH", bytes(p).index(b"\xff\xc2") + 5, 0xFFFF, 0xFFFF),
             "null"),
            ("SOF2 precision=12", lambda p: pack(
                "<B", bytes(p).index(b"\xff\xc2") + 4, 12), "null"),
        ]),
    ]

    for name, synth, dec, muts in specs:
        payload = bytes(synth(base, "doc_id").select("payload").first()[0])
        rows = [(0, bytearray(payload))]
        for i, (_, mk, _) in enumerate(muts):
            rows.append((i + 1, bytearray(mut(payload, mk(payload)))))
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        out = {r["doc_id"]: r for r in dec(df, "doc_id", on_error="null").collect()}
        feats = [c for c in out[0].__fields__ if c != "doc_id"]
        probe = feats[1]
        assert out[0][probe] is not None, f"{name}: valid payload must decode"
        for i, (label, _, expect) in enumerate(muts):
            got = out[i + 1]
            if expect == "null":
                for c in feats:
                    assert got[c] is None, (
                        f"{name}/{label}: {c}={got[c]!r}, expected quarantine"
                    )
            elif expect == "same":
                for c in feats:
                    assert got[c] == out[0][c], (
                        f"{name}/{label}: {c} {got[c]!r} != {out[0][c]!r}"
                    )
            else:  # "decodes"
                assert got[probe] is not None, (
                    f"{name}/{label}: expected a self-consistent decode"
                )
