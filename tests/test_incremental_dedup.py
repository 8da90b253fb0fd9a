"""Incremental near-dup against the persisted MinHash band index.

The recurring-ingest shape: the corpus index (band, key, doc_id, sigs)
is a maintained artifact; each new batch near-dup-checks against it
without rescanning corpus text. These tests pin: detection of exact
and near duplicates with the expected signature-agreement counts,
non-detection of distinct text, parquet round-trip of the index (it
must behave identically when read back — that IS the artifact claim),
merge idempotence/associativity, and string-id transparency.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from ocr_spark.functions.dedup import (
    MINHASH_K,
    dedup_against_index,
    merge_band_index,
    minhash_band_index,
)

WORDS = " ".join(f"w{i:02d}" for i in range(40))
# 36 shared words + 4 changed: enough changed shingles that some
# minhash components move (probed: n_match = 11 of 16) while >=1 LSH
# band still collides — a genuine intermediate near-duplicate
NEAR = " ".join([f"w{i:02d}" for i in range(36)] + [f"X{i:02d}" for i in range(4)])
DISTINCT = " ".join(f"z{i:02d}" for i in range(40))
OTHER = " ".join(f"q{i:02d}" for i in range(40))


@pytest.fixture(scope="module")
def corpus(spark):
    df = pd.DataFrame(
        {"doc_id": [10, 11, 12], "text": [WORDS, DISTINCT, OTHER]}
    )
    return spark.createDataFrame(df).persist()


@pytest.fixture(scope="module")
def batch(spark):
    # 20 = exact dup of 10; 21 = near dup of 10; 22 = novel
    df = pd.DataFrame(
        {
            "doc_id": [20, 21, 22],
            "text": [WORDS, NEAR, " ".join(f"y{i:02d}" for i in range(40))],
        }
    )
    return spark.createDataFrame(df).persist()


def test_exact_and_near_dups_found(corpus, batch):
    idx = minhash_band_index(corpus)
    got = {
        (r.new_doc_id, r.corpus_doc_id): r.n_match
        for r in dedup_against_index(batch, idx).collect()
    }
    # the exact duplicate agrees on every signature component
    assert got[(20, 10)] == MINHASH_K
    # the near duplicate collides in >=1 band and agrees on most
    assert (21, 10) in got
    assert MINHASH_K // 2 <= got[(21, 10)] < MINHASH_K
    # the novel doc matches nothing
    assert not any(n == 22 for (n, _c) in got)


def test_index_parquet_round_trip(spark, corpus, batch, tmp_path):
    """The index is a persisted artifact: writing it to parquet and
    reading it back must give the same dedup answer as the in-memory
    plan (no schema/precision loss)."""
    idx = minhash_band_index(corpus)
    path = str(tmp_path / "band_index")
    idx.write.mode("overwrite").parquet(path)
    reread = spark.read.parquet(path)
    live = sorted(map(tuple, dedup_against_index(batch, idx).collect()))
    persisted = sorted(map(tuple, dedup_against_index(batch, reread).collect()))
    assert live == persisted and len(live) > 0


def test_merge_idempotent_and_incremental(spark, corpus, batch):
    """merge(idx, idx) == idx, and index(a) merged with index(b) gives
    the same bucket rows as index(a union b) — the daily-merge path
    never needs a corpus rebuild."""
    idx = minhash_band_index(corpus)
    assert merge_band_index(idx, idx).count() == idx.count()

    half_a = corpus.where(F.col("doc_id") <= 10)
    half_b = corpus.where(F.col("doc_id") > 10)
    merged = merge_band_index(
        minhash_band_index(half_a), minhash_band_index(half_b)
    )
    whole = minhash_band_index(corpus)
    key = lambda df: sorted(
        (r.band, r.key, r.doc_id, tuple(r.sigs)) for r in df.collect()
    )
    assert key(merged) == key(whole)


def test_string_ids_ride_through(spark):
    c = spark.createDataFrame(
        pd.DataFrame({"doc_id": ["sha1:aaa"], "text": [WORDS]})
    )
    b = spark.createDataFrame(
        pd.DataFrame({"doc_id": ["sha1:bbb"], "text": [WORDS]})
    )
    rows = dedup_against_index(b, minhash_band_index(c)).collect()
    assert [(r.new_doc_id, r.corpus_doc_id, r.n_match) for r in rows] == [
        ("sha1:bbb", "sha1:aaa", MINHASH_K)
    ]


def test_threshold_filters(corpus, batch):
    """min_match = k keeps only the exact-signature pair."""
    idx = minhash_band_index(corpus)
    rows = dedup_against_index(batch, idx, min_match=MINHASH_K).collect()
    assert {(r.new_doc_id, r.corpus_doc_id) for r in rows} == {(20, 10)}


def test_decorated_index_columns_tolerated(spark, corpus, batch):
    """A streaming-maintained index carries an ingest_batch partition
    column; both the batch join and the merge must normalize it away
    instead of failing on schema mismatch."""
    decorated = minhash_band_index(corpus).withColumn(
        "ingest_batch", F.lit(0)
    )
    plain = sorted(
        map(tuple, dedup_against_index(batch, minhash_band_index(corpus)).collect())
    )
    via_decorated = sorted(map(tuple, dedup_against_index(batch, decorated).collect()))
    assert via_decorated == plain
    merged = merge_band_index(decorated, minhash_band_index(batch))
    assert merged.columns == ["band", "key", "doc_id", "sigs"]


# ---------------------------------------------------------------------------
# bloom-filter novelty gate
# ---------------------------------------------------------------------------


def test_bloom_no_false_negatives_and_twin(spark):
    import duckdb

    from ocr_spark.functions.dedup import (
        bloom_build,
        bloom_build_sql,
        bloom_novel,
        bloom_novel_sql,
    )

    hist_rows = [(i, f"history doc {i}") for i in range(60)]
    new_rows = hist_rows[:15] + [
        (100 + i, f"brand new {i}") for i in range(45)
    ] + [(999, None)]
    hist = spark.createDataFrame(hist_rows, "doc_id long, text string")
    new = spark.createDataFrame(new_rows, "doc_id long, text string")
    bloom = bloom_build(hist, m_bits=1 << 12, k=4)
    res = {
        r.doc_id: r.maybe_seen
        for r in bloom_novel(new, bloom, m_bits=1 << 12, k=4).collect()
    }
    # one-sided guarantee: every re-ingested text flags maybe_seen
    assert all(res[i] for i, _ in hist_rows[:15])
    # NULL text is never "seen"
    assert res[999] is False
    # sanity: the filter is not degenerate (most novel docs pass)
    fps = sum(res[100 + i] for i in range(45))
    assert fps < 10
    # cross-engine: the bitset table AND every verdict match DuckDB
    import pandas as pd

    con = duckdb.connect()
    con.register("h_df", pd.DataFrame(hist_rows, columns=["doc_id", "text"]))
    con.register("n_df", pd.DataFrame(new_rows, columns=["doc_id", "text"]))
    con.execute("CREATE VIEW h AS SELECT * FROM h_df")
    con.execute("CREATE VIEW n AS SELECT * FROM n_df")
    want = {
        r[0]: r[1]
        for r in con.execute(
            bloom_novel_sql("n", bloom_build_sql("h", 1 << 12, 4), 1 << 12, 4)
        ).fetchall()
    }
    assert res == want
    got_b = sorted(map(tuple, bloom.collect()))
    want_b = sorted(
        map(tuple, con.execute(bloom_build_sql("h", 1 << 12, 4)).fetchall())
    )
    assert got_b == want_b


def test_bloom_merge_equals_joint_build(spark):
    from ocr_spark.functions.dedup import bloom_build, bloom_merge

    a = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(30)], "doc_id long, text string"
    )
    b = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(20, 50)], "doc_id long, text string"
    )
    merged = sorted(
        map(tuple, bloom_merge(bloom_build(a), bloom_build(b)).collect())
    )
    joint = sorted(map(tuple, bloom_build(a.unionByName(b)).collect()))
    assert merged == joint


def test_bloom_gate_plan_is_broadcast_only(spark):
    """The gate side must be k broadcast hash joins — zero shuffle on
    the (big) new-docs side, no sort-merge join, no fan-out."""
    from ocr_spark.functions.dedup import BLOOM_K, bloom_build, bloom_novel
    from ocr_spark.plans import plan_str

    hist = spark.createDataFrame(
        [(i, f"d{i}") for i in range(10)], "doc_id long, text string"
    )
    bloom = bloom_build(hist).localCheckpoint()
    gated = bloom_novel(
        spark.createDataFrame([(1, "d1")], "doc_id long, text string"), bloom
    )
    p = plan_str(gated, "simple")
    assert p.count("BroadcastHashJoin") == BLOOM_K
    assert "SortMergeJoin" not in p
    # row-preserving: unique word_idx keys cannot fan out
    assert gated.count() == 1


def test_bloom_string_ids_ride_through(spark):
    from ocr_spark.functions.dedup import bloom_build, bloom_novel

    hist = spark.createDataFrame(
        [(f"sha1:{i}", f"d{i}") for i in range(10)], "doc_id string, text string"
    )
    out = {
        r.doc_id: r.maybe_seen
        for r in bloom_novel(hist, bloom_build(hist)).collect()
    }
    assert set(out) == {f"sha1:{i}" for i in range(10)}
    assert all(out.values())


def test_bloom_fp_eval_invariants_and_twin(spark):
    import duckdb

    import pandas as pd

    from ocr_spark.functions.dedup import bloom_fp_eval, bloom_fp_eval_sql

    pdf = pd.DataFrame(
        {
            "doc_id": range(40),
            "text": [f"doc number {i}" for i in range(40)],
        }
    )
    df = spark.createDataFrame(pdf)
    hist = df.where("doc_id < 10")
    # deliberately tiny filter -> false positives occur
    ev = bloom_fp_eval(df, hist, m_bits=64, k=2).collect()[0]
    assert ev.n_docs == 40 and ev.n_true_seen == 10
    assert ev.n_false_neg == 0  # the one-sided guarantee
    assert ev.n_maybe_seen == ev.n_true_seen + ev.n_false_pos
    con = duckdb.connect()
    con.register("t_df", pdf)
    con.execute("CREATE VIEW t AS SELECT * FROM t_df")
    want = con.execute(
        bloom_fp_eval_sql("t", "(SELECT * FROM t WHERE doc_id < 10)", 64, 2)
    ).fetchall()[0]
    assert tuple(ev) == tuple(want)
    # properly-sized filter: zero false positives on this corpus
    ev2 = bloom_fp_eval(df, hist, m_bits=1 << 16, k=4).collect()[0]
    assert ev2.n_false_pos == 0 and ev2.fp_ppm == 0


def test_bloom_novel_rejects_colliding_columns(spark):
    import pytest

    from ocr_spark.functions.dedup import bloom_build, bloom_novel

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    bloom = bloom_build(df)
    # a prior verdict column must not be silently overwritten
    with pytest.raises(ValueError, match="maybe_seen"):
        bloom_novel(df.withColumn("maybe_seen", __import__("pyspark").sql.functions.lit(True)), bloom)
    with pytest.raises(ValueError, match="_bp0"):
        bloom_novel(df.withColumn("_bp0", __import__("pyspark").sql.functions.lit(1)), bloom)


def test_novel_docs_canonical_matches_recrawl_variants(spark):
    import duckdb
    import pandas as pd

    from ocr_spark.functions.dedup import novel_docs, novel_docs_sql

    corp = pd.DataFrame({"doc_id": [1, 2], "text": ["Hello, World!", "other doc"]})
    new = pd.DataFrame(
        {"doc_id": [10, 11], "text": ["hello   world", "brand new"]}
    )
    cdf, ndf = spark.createDataFrame(corp), spark.createDataFrame(new)
    # raw gate: both pass (bytes differ); canonical gate: only 11
    assert sorted(r.doc_id for r in novel_docs(ndf, cdf).collect()) == [10, 11]
    assert sorted(
        r.doc_id for r in novel_docs(ndf, cdf, canonical=True).collect()
    ) == [11]
    con = duckdb.connect()
    con.register("c_df", corp)
    con.register("n_df", new)
    con.execute("CREATE VIEW c AS SELECT * FROM c_df")
    con.execute("CREATE VIEW n AS SELECT * FROM n_df")
    want = sorted(
        r[0]
        for r in con.execute(
            "SELECT doc_id FROM ("
            + novel_docs_sql("n", "c", canonical=True)
            + ")"
        ).fetchall()
    )
    assert want == [11]


def test_bloom_canonical_gate(spark):
    from ocr_spark.functions.dedup import bloom_build, bloom_novel

    corp = spark.createDataFrame(
        [(1, "Hello, World!")], "doc_id long, text string"
    )
    probe = spark.createDataFrame(
        [(10, "hello   world"), (11, "brand new")], "doc_id long, text string"
    )
    bl = bloom_build(corp, canonical=True)
    v = {
        r.doc_id: r.maybe_seen
        for r in bloom_novel(probe, bl, canonical=True).collect()
    }
    assert v == {10: True, 11: False}
    # raw filter does NOT match the re-cased re-crawl
    v0 = {
        r.doc_id: r.maybe_seen
        for r in bloom_novel(probe, bloom_build(corp)).collect()
    }
    assert v0 == {10: False, 11: False}
