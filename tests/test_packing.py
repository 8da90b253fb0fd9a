"""Training-sequence packing index: exact concat-then-cut semantics on
a hand corpus, pack-coverage invariants, DuckDB-twin parity on the
real corpus, partition-count invariance, and the one-shuffle plan."""

from __future__ import annotations

import duckdb
import pytest

from ocr_spark.functions.chunking import chunk_documents, chunk_documents_sql
from ocr_spark.functions.packing import (
    pack_index,
    pack_index_sql,
    pack_stats,
    pack_stats_sql,
)
from ocr_spark.plans import plan_str

SF_DIR = "/root/testdata/sf0.001"


def _chunks_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, chunk_id int, n_tokens long")


def test_single_shard_straddle_semantics(spark):
    # one shard: chunks of 5,5,3 tokens, seq_len 4 ->
    # concat stream |0..4|5..9|10..12|, cut at 4: packs 0..3
    rows = [(1, 0, 5), (1, 1, 5), (2, 0, 3)]
    got = sorted(
        (r.pack_id, r.doc_id, r.chunk_id, r.begin_tok, r.end_tok, r.pack_off)
        for r in pack_index(_chunks_df(spark, rows), seq_len=4, n_shards=1).collect()
    )
    assert got == [
        (0, 1, 0, 0, 4, 0),   # chunk (1,0) tokens 0-3 fill pack 0
        (1, 1, 0, 4, 5, 0),   # its last token opens pack 1
        (1, 1, 1, 0, 3, 1),   # chunk (1,1) continues pack 1
        (2, 1, 1, 3, 5, 0),   # and straddles into pack 2
        (2, 2, 0, 0, 2, 2),   # doc 2 continues pack 2
        (3, 2, 0, 2, 3, 0),   # final (short) pack
    ]


def test_chunk_longer_than_seq_spans_many_packs(spark):
    got = sorted(
        (r.pack_id, r.begin_tok, r.end_tok, r.pack_off)
        for r in pack_index(
            _chunks_df(spark, [(1, 0, 10)]), seq_len=3, n_shards=1
        ).collect()
    )
    assert got == [(0, 0, 3, 0), (1, 3, 6, 0), (2, 6, 9, 0), (3, 9, 10, 0)]


def test_coverage_invariants(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    chunks = chunk_documents(docs, max_tokens=64, overlap=16)
    idx = pack_index(chunks, seq_len=128, n_shards=8).collect()
    # every chunk fully covered, contiguously, starting at 0
    per_chunk = {}
    for r in idx:
        per_chunk.setdefault((r.doc_id, r.chunk_id), []).append(r)
    n_tokens = {
        (r.doc_id, r.chunk_id): r.n_tokens
        for r in chunks.select("doc_id", "chunk_id", "n_tokens").collect()
    }
    for key, segs in per_chunk.items():
        segs.sort(key=lambda r: r.begin_tok)
        assert segs[0].begin_tok == 0
        assert segs[-1].end_tok == n_tokens[key]
        for a, b in zip(segs, segs[1:]):
            assert a.end_tok == b.begin_tok
            assert b.pack_id == a.pack_id + 1  # straddles are consecutive packs
    assert set(n_tokens) == set(per_chunk)
    # every pack is exactly seq_len full except the last of its shard,
    # and its segments tile [0, filled) contiguously
    per_pack = {}
    for r in idx:
        per_pack.setdefault((r.shard, r.pack_id), []).append(r)
    last = {}
    for (shard, pack_id), _ in per_pack.items():
        last[shard] = max(last.get(shard, -1), pack_id)
    for (shard, pack_id), segs in per_pack.items():
        segs.sort(key=lambda r: r.pack_off)
        assert segs[0].pack_off == 0
        for a, b in zip(segs, segs[1:]):
            assert a.pack_off + (a.end_tok - a.begin_tok) == b.pack_off
        filled = sum(s.end_tok - s.begin_tok for s in segs)
        if pack_id != last[shard]:
            assert filled == 128, (shard, pack_id, filled)
        else:
            assert 1 <= filled <= 128


def test_partition_count_invariance(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    chunks = chunk_documents(docs, max_tokens=64, overlap=16)
    a = sorted(map(tuple, pack_index(chunks, 128, 8).collect()))
    b = sorted(map(tuple, pack_index(chunks.repartition(17), 128, 8).collect()))
    assert a == b


def test_null_and_empty_rows_dropped(spark):
    rows = [(None, 0, 5), (1, 0, 0), (1, 1, 2)]
    got = pack_index(_chunks_df(spark, rows), seq_len=4, n_shards=2).collect()
    assert [(r.doc_id, r.chunk_id) for r in got] == [(1, 1)]


def test_knob_validation(spark):
    df = _chunks_df(spark, [(1, 0, 1)])
    for kw in ({"seq_len": 0}, {"n_shards": 0}):
        with pytest.raises(ValueError):
            pack_index(df, **kw)
        with pytest.raises(ValueError):
            pack_index_sql("SELECT 1", **kw)


def test_matches_oracle(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    chunks = chunk_documents(docs, max_tokens=64, overlap=16)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    twin = chunk_documents_sql(max_tokens=64, overlap=16)
    got = sorted(map(tuple, pack_index(chunks, 96, 4).collect()))
    want = sorted(map(tuple, con.execute(pack_index_sql(twin, 96, 4)).fetchall()))
    assert got == want and len(got) > 0
    got_s = sorted(map(tuple, pack_stats(chunks, 96, 4).collect()))
    want_s = sorted(map(tuple, con.execute(pack_stats_sql(twin, 96, 4)).fetchall()))
    assert got_s == want_s


def test_plan_one_shuffle_no_join(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    idx = pack_index(chunk_documents(docs), seq_len=128, n_shards=8)
    plan = plan_str(idx, "simple")
    assert "Join" not in plan, plan
    # exactly one exchange: the per-shard window
    assert plan.count("Exchange") == 1, plan


# ---------------------------------------------------------------------------
# pack_interleaved (media-atomic slot packing)
# ---------------------------------------------------------------------------


def _ichunks_df(spark):
    import pandas as pd

    rows = []
    for d in range(10):
        for c in range(3):
            ovf = d in (3, 7) and c == 1
            rows.append((f"doc{d}", c, 900 if ovf else 50 + d + c, ovf))
    rows.append(("docz", 0, 0, False))  # zero tokens: dropped
    rows.append((None, 0, 10, False))   # NULL id: dropped
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "chunk_id", "n_tokens", "overflow"]
    )
    return spark.createDataFrame(pdf), pdf


def test_pack_interleaved_invariants_and_oracle(spark):
    import collections

    from ocr_spark.functions.packing import (
        pack_interleaved,
        pack_interleaved_sql,
        pack_interleaved_stats,
        pack_interleaved_stats_sql,
    )

    df, pdf = _ichunks_df(spark)
    con = duckdb.connect()
    con.register("ch", pdf)
    src = "SELECT doc_id, chunk_id, n_tokens, overflow FROM ch"
    cols = ["shard", "pack_id", "slot", "doc_id", "chunk_id",
            "n_tokens", "overflow"]
    got = sorted(map(tuple, pack_interleaved(df, slots=4, n_shards=3)
                 .select(*cols).collect()))
    odf = con.execute(pack_interleaved_sql(src, slots=4, n_shards=3)).df()
    assert got == sorted(
        map(tuple, odf[cols].itertuples(index=False, name=None))
    )
    scols = ["shard", "pack_id", "n_chunks", "n_docs", "n_tokens",
             "has_overflow"]
    gs = sorted(map(tuple, pack_interleaved_stats(df, slots=4, n_shards=3)
                .select(*scols).collect()))
    osd = con.execute(
        pack_interleaved_stats_sql(src, slots=4, n_shards=3)
    ).df()
    assert gs == sorted(
        map(tuple, osd[scols].itertuples(index=False, name=None))
    )
    # invariants: per-shard pack ids contiguous from 0; overflow packs
    # hold exactly one chunk at slot 0; slot packs hold <= slots
    byshard = collections.defaultdict(list)
    for r in gs:
        byshard[r[0]].append(r)
    for s, packs in byshard.items():
        ids = sorted(p[1] for p in packs)
        assert ids == list(range(len(ids)))
        for p in packs:
            assert (p[2] == 1) if p[5] else (p[2] <= 4)
    # every surviving chunk packed exactly once
    assert len(got) == 30
    # chunks are NEVER split: one row per (doc, chunk)
    assert len({(r[3], r[4]) for r in got}) == 30


def test_pack_interleaved_over_real_chunks(spark):
    """End-to-end with chunk_interleaved: non-overflow packs respect
    seq_len = slots * budget; overflow chunks are isolated."""
    from ocr_spark.functions.interleave import chunk_interleaved
    from ocr_spark.functions.packing import (
        pack_interleaved,
        pack_interleaved_stats,
    )
    from ocr_spark.sources.synth import synthesize_spans

    docs = synthesize_spans(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    )
    budget, slots = 64, 4
    chunks = chunk_interleaved(docs, max_tokens=budget, media_token_cost=32)
    stats = pack_interleaved_stats(chunks, slots=slots).collect()
    assert len(stats) > 0
    for r in stats:
        if not r.has_overflow:
            assert r.n_tokens <= slots * budget
            assert r.n_chunks <= slots
        else:
            assert r.n_chunks == 1
    idx = pack_interleaved(chunks, slots=slots)
    assert idx.count() == chunks.where("n_tokens > 0").count()


def test_pack_interleaved_plan_one_shuffle(spark):
    from ocr_spark.functions.interleave import chunk_interleaved
    from ocr_spark.functions.packing import pack_interleaved
    from ocr_spark.sources.synth import synthesize_spans

    docs = synthesize_spans(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    )
    df = pack_interleaved(chunk_interleaved(docs))
    plan = plan_str(df, "simple")
    # chunking contributes one exchange (doc_id window); packing must
    # add exactly ONE more (the shard window; the overflow-count
    # window reuses its partitioning), no joins
    assert plan.count("Exchange") == 2, plan
    assert "Join" not in plan, plan


def test_pack_interleaved_knob_validation(spark):
    from ocr_spark.functions.packing import (
        pack_interleaved,
        pack_interleaved_sql,
    )

    df, _ = _ichunks_df(spark)
    with pytest.raises(ValueError, match="slots"):
        pack_interleaved(df, slots=0)
    with pytest.raises(ValueError, match="slots"):
        pack_interleaved_sql("SELECT 1", slots=-1)
