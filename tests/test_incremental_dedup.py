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
