"""Arrow kernel vs pandas kernel: bit-identical outputs on every
surface, including the hostile corpus (empty docs, malformed spans,
giant skew-tail docs, unordered offsets)."""

from __future__ import annotations

import pandas as pd
import pytest

from ocr_spark.fixtures import generate_corpus
from ocr_spark.pipeline.extract import (
    classify_spans,
    extract_documents,
    extract_documents_with_metrics,
    extract_main_content,
    extraction_metrics,
)
from ocr_spark.schema import DOC_SCHEMA
from ocr_spark.sources.synth import synthesize_spans


@pytest.fixture(scope="module")
def synth_docs(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return synthesize_spans(docs).cache()

@pytest.fixture(scope="module")
def hostile_docs(spark):
    rows = generate_corpus(n_docs=300, seed=7, giant_frac=0.03)
    return spark.createDataFrame(rows, schema=DOC_SCHEMA).cache()


def _rows(df):
    return sorted(
        tuple(x if not isinstance(x, list) else tuple(map(tuple, x)) for x in r)
        for r in df.collect()
    )


def _nested_rows(df):
    out = []
    for r in df.collect():
        spans = tuple((s.kind, s.text, s.media_ref, s.offset) for s in (r.spans or []))
        out.append((r.doc_id, spans))
    return sorted(out)


@pytest.mark.parametrize("corpus", ["synth_docs", "hostile_docs"])
def test_flat_equivalence(request, corpus):
    df = request.getfixturevalue(corpus)
    a = _rows(extract_main_content(df, engine="arrow"))
    p = _rows(extract_main_content(df, engine="pandas"))
    assert a == p


@pytest.mark.parametrize("corpus", ["synth_docs", "hostile_docs"])
def test_classify_equivalence(request, corpus):
    df = request.getfixturevalue(corpus)
    a = _rows(classify_spans(df, engine="arrow"))
    p = _rows(classify_spans(df, engine="pandas"))
    assert a == p


@pytest.mark.parametrize("corpus", ["synth_docs", "hostile_docs"])
def test_nested_equivalence(request, corpus):
    df = request.getfixturevalue(corpus)
    a = _nested_rows(extract_documents(df, engine="arrow"))
    p = _nested_rows(extract_documents(df, engine="pandas"))
    assert a == p


@pytest.mark.parametrize("corpus", ["synth_docs", "hostile_docs"])
def test_metrics_equivalence(request, corpus):
    df = request.getfixturevalue(corpus)
    a = _rows(extraction_metrics(df, engine="arrow"))
    p = _rows(extraction_metrics(df, engine="pandas"))
    assert a == p


@pytest.mark.parametrize("corpus", ["synth_docs", "hostile_docs"])
def test_nested_metrics_equivalence(request, corpus):
    # the runner's single-pass commit shape: arrow == pandas spec, and
    # it must agree with the two separate kernels it replaces
    df = request.getfixturevalue(corpus)
    a = _rows(extract_documents_with_metrics(df, engine="arrow"))
    p = _rows(extract_documents_with_metrics(df, engine="pandas"))
    assert a == p
    combined = {
        r.doc_id: (r.n_spans_in, r.n_spans_out, r.parse_failed)
        for r in extract_documents_with_metrics(df).collect()
    }
    separate = {
        r.doc_id: (r.n_spans_in, r.n_spans_out, r.parse_failed)
        for r in extraction_metrics(df).collect()
    }
    assert combined == separate


def test_duplicate_doc_id_rows_become_errors(spark):
    """A doc_id on two input rows of one batch violates the
    one-row-per-document contract: BOTH kernels turn every such row
    into an error row (one per input row, spans=[]) instead of the
    silent merge the pandas spec used to do. (The check is necessarily
    batch-local — rows split across partitions extract independently
    in both kernels, which is likewise consistent.)"""
    import pandas as pd

    from ocr_spark.kernel.extract import WARN_MALFORMED, extract_flat

    span = lambda off: {"kind": "text", "text": f"s{off}", "media_ref": "", "offset": off}
    pdf = pd.DataFrame(
        {
            "doc_id": ["dup", "ok", "dup"],
            "spans": [[span(0), span(1)], [span(0)], [span(2), span(3)]],
        }
    )
    df = spark.createDataFrame(pdf, schema=DOC_SCHEMA).coalesce(1)
    for eng in ("arrow", "pandas"):
        rows = extract_documents(df, engine=eng).collect()
        got = [(r.doc_id, len(r.spans)) for r in rows]
        assert sorted(got) == [("dup", 0), ("dup", 0), ("ok", 1)], (eng, got)
        m = {
            (r.doc_id, r.n_spans_in): r.parse_failed
            for r in extract_documents_with_metrics(df, engine=eng).collect()
        }
        assert m == {("dup", 2): 1, ("ok", 1): 0}, (eng, m)
    # the pandas spec's flat view carries one MALFORMED error row per
    # duplicate input row
    flat = extract_flat(pdf)
    errs = flat[flat["kind"] == "__error__"]
    assert list(errs["doc_id"]) == ["dup", "dup"]
    assert set(errs["text"]) == {WARN_MALFORMED}
    # and both kernels agree row-for-row on the combined shape
    a = _rows(extract_documents_with_metrics(df, engine="arrow"))
    p = _rows(extract_documents_with_metrics(df, engine="pandas"))
    assert a == p


def test_null_doc_id_rows_become_errors(spark):
    """A NULL doc_id violates the input contract like a duplicate:
    both kernels error the row (spans dropped, parse_failed) instead
    of the previous split behavior (pandas grouped NaNs as duplicates,
    arrow extracted them normally)."""
    import pandas as pd

    span = lambda off: {"kind": "text", "text": f"s{off}", "media_ref": "", "offset": off}
    pdf = pd.DataFrame(
        {"doc_id": [None, "ok"], "spans": [[span(0), span(1)], [span(0)]]}
    )
    df = spark.createDataFrame(pdf, schema="doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>").coalesce(1)
    for eng in ("arrow", "pandas"):
        m = {r.doc_id: (r.n_spans_out, r.parse_failed) for r in
             extract_documents_with_metrics(df, engine=eng).collect()}
        # the non-nullable output schema renders the NULL id as ''
        assert m[""] == (0, 1), (eng, m)
        assert m["ok"] == (1, 0), (eng, m)


def test_null_spans_row(spark):
    df = spark.createDataFrame(
        [("d1", None), ("d2", [])], schema=DOC_SCHEMA
    )
    rows = _rows(extraction_metrics(df, engine="arrow"))
    assert all(r[3] == 1 for r in rows)  # parse_failed for both
    nested = _nested_rows(extract_documents(df, engine="arrow"))
    assert nested == [("d1", ()), ("d2", ())]


def test_truncation_equivalence(spark):
    # one doc over the 50k budget: 600 spans x ~100 chars
    spans = [
        {"kind": "text" if i % 7 else "section_header_level_1",
         "text": "x" * 95 + f"-{i:03d}", "media_ref": "", "offset": i}
        for i in range(600)
    ]
    df = spark.createDataFrame([("big", spans), ("small", spans[:3])], schema=DOC_SCHEMA)
    a = _rows(extract_main_content(df, engine="arrow"))
    p = _rows(extract_main_content(df, engine="pandas"))
    assert a == p
    assert any(r[1] == "__truncated__" for r in a)


def test_weight_partition_preserves_content(spark, hostile_docs):
    from ocr_spark.pipeline.extract import weight_partition

    wp = weight_partition(hostile_docs, 8)
    assert wp.columns == hostile_docs.columns
    assert _nested_rows(wp) == _nested_rows(hostile_docs)
    # heaviest-first within each partition
    from pyspark.sql import functions as F

    sizes = wp.select(
        F.spark_partition_id().alias("pid"), F.size("spans").alias("n")
    ).collect()
    by_pid: dict = {}
    for r in sizes:
        by_pid.setdefault(r.pid, []).append(r.n)
    for pid, ns in by_pid.items():
        assert ns == sorted(ns, reverse=True), f"partition {pid} not heaviest-first"


def test_weight_partition_bounds_skew(spark):
    """Giant-doc tail (FIXTURES.md: ~1% docs at 2k-20k spans): after
    size-weighted partitioning no partition hoards the span mass, and
    docs run heaviest-first inside each partition (LPT-style — the
    straggler starts at t=0, not last)."""
    from pyspark.sql import functions as F

    from ocr_spark.pipeline.extract import weight_partition

    rows = generate_corpus(n_docs=400, seed=11, giant_frac=0.02)
    df = spark.createDataFrame(rows, schema=DOC_SCHEMA)
    wp = weight_partition(df, 8)
    pairs = wp.select(
        F.spark_partition_id().alias("pid"), F.size("spans").alias("w")
    ).collect()
    loads: dict[int, int] = {}
    last_w: dict[int, int] = {}
    for r in pairs:
        loads[r.pid] = loads.get(r.pid, 0) + r.w
        assert r.w <= last_w.get(r.pid, 1 << 60)  # non-increasing per pid
        last_w[r.pid] = r.w
    mean = sum(loads.values()) / len(loads)
    assert max(loads.values()) <= 3 * mean, loads


def test_subslice_batches_identical_results(spark, hostile_docs):
    """Memory-bounding sub-slices must not change any output — incl.
    sliced-ListArray flatten handling inside the kernel."""
    from unittest.mock import patch

    import ocr_spark.pipeline.extract as px

    full = _nested_rows(extract_documents(hostile_docs, engine="arrow"))
    with patch.object(px, "MAX_SPANS_PER_KERNEL_CALL", 64):
        sliced = _nested_rows(extract_documents(hostile_docs, engine="arrow"))
    assert sliced == full

    flat_full = _rows(classify_spans(hostile_docs, engine="arrow"))
    with patch.object(px, "MAX_SPANS_PER_KERNEL_CALL", 64):
        flat_sliced = _rows(classify_spans(hostile_docs, engine="arrow"))
    assert flat_sliced == flat_full


def test_block_density_filter(spark):
    """min_block_chars drops sparse body blocks whole; headers/media
    survive; pandas and arrow agree."""
    import dataclasses

    import pandas as pd

    from ocr_spark.kernel.extract import DEFAULT_CONFIG

    cfg = dataclasses.replace(DEFAULT_CONFIG, min_block_chars=30)
    spans = [
        {"kind": "section_header_level_1", "text": "Title", "media_ref": "", "offset": 0},
        {"kind": "text", "text": "tiny", "media_ref": "", "offset": 1},  # sparse block
        {"kind": "picture", "text": "", "media_ref": "img-1", "offset": 2},
        {"kind": "text", "text": "this block has plenty of characters in it",
         "media_ref": "", "offset": 3},
        {"kind": "text", "text": "x", "media_ref": "", "offset": 4},  # same dense block
    ]
    df = spark.createDataFrame(
        pd.DataFrame([{"doc_id": "d1", "spans": spans}]), schema=DOC_SCHEMA
    )
    for engine in ("arrow", "pandas"):
        out = {r.offset: r.kind for r in extract_main_content(df, cfg=cfg, engine=engine).collect()}
        assert 0 in out and 2 in out  # header + media exempt
        assert 1 not in out  # sparse body block dropped whole
        assert 3 in out and 4 in out  # dense block survives entirely
