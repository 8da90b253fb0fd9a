"""Interleaved-structure stats/gate + corpus-frequency boilerplate
strip: semantics on hand-built corpora, DuckDB-twin parity, plan
shapes (stats must be scan-stage-only; strip must shuffle hashes, not
text, with no nested-loop join)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from ocr_spark.functions.interleave import (
    interleave_gate,
    interleave_stats,
    interleave_stats_sql,
    strip_frequent_flat,
    strip_frequent_spans,
    strip_frequent_spans_sql,
)
from ocr_spark.plans import plan_str
from ocr_spark.sources.synth import synth_spans_sql, synthesize_spans

SF_DIR = "/root/testdata/sf0.001"

_NESTED_SCHEMA = (
    "doc_id string, spans array<struct<"
    "kind:string,text:string,media_ref:string,offset:int>>"
)


def _doc(doc_id, spans):
    """spans = [(kind, text, media_ref, offset), ...]"""
    return (doc_id, [tuple(s) for s in spans])


@pytest.fixture(scope="module")
def nested(spark):
    return synthesize_spans(spark.read.parquet(f"{SF_DIR}/documents.parquet"))


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'")
    return c


# ---------------------------------------------------------------------------
# interleave_stats
# ---------------------------------------------------------------------------


def test_interleave_stats_semantics(spark):
    t = lambda i: ("text", f"prose number {i}", "", i)
    m = lambda i: ("picture", "", f"img-{i}", i)
    rows = [
        # healthy doc: 4 text, 2 media, runs of 1
        _doc("ok", [t(0), m(1), t(2), m(3), t(4), t(5)]),
        # gallery: 4 consecutive media spans -> dropped by max_media_run
        _doc("gallery", [t(0), m(1), m(2), m(3), m(4), t(5), t(6), t(7), t(8)]),
        # image farm: media_frac 3/4 -> dropped
        _doc("farm", [t(0), m(1), m(2), t(3), m(4), t(5)][:4] + [m(6), m(7)]),
        # no prose: one text span -> dropped by min_text_spans
        _doc("thin", [t(0), m(1)]),
        # text-only doc: n_media = 0 branch must keep it
        _doc("plain", [t(0), t(1), t(2)]),
        # order scramble: run fold must sort by offset (2,3,4 media)
        _doc("scrambled", [m(3), t(0), m(2), t(1), m(4), t(5), t(6)]),
    ]
    df = spark.createDataFrame(rows, _NESTED_SCHEMA)
    out = {r["doc_id"]: r.asDict() for r in interleave_stats(df).collect()}
    assert out["ok"]["keep"] and out["ok"]["max_media_run"] == 1
    assert out["ok"]["n_media"] == 2 and out["ok"]["n_text"] == 4
    assert not out["gallery"]["keep"] and out["gallery"]["max_media_run"] == 4
    assert not out["farm"]["keep"] and out["farm"]["media_frac"] > 0.5
    assert not out["thin"]["keep"] and out["thin"]["n_text"] == 1
    assert out["plain"]["keep"] and out["plain"]["n_media"] == 0
    assert out["scrambled"]["max_media_run"] == 3
    assert out["ok"]["n_text_chars"] == sum(
        len(s[1]) for s in rows[0][1] if s[0] == "text"
    )


def test_interleave_stats_empty_and_null_spans_spark_side(spark):
    """Divergence pinned in the twin's docstring: empty/NULL span
    arrays still yield a Spark row (never silently dropped), with
    keep falsy — the flat-SQL oracle cannot represent these docs."""
    df = spark.createDataFrame(
        [("empty", []), ("nul", None)], _NESTED_SCHEMA
    )
    out = {r["doc_id"]: r.asDict() for r in interleave_stats(df).collect()}
    assert set(out) == {"empty", "nul"}
    assert out["empty"]["n_spans"] == 0 and not out["empty"]["keep"]
    assert not out["nul"]["keep"]


def test_interleave_stats_matches_oracle(nested, con):
    got = sorted(map(tuple, interleave_stats(nested).collect()))
    want = sorted(
        map(tuple, con.execute(interleave_stats_sql(synth_spans_sql())).fetchall())
    )
    assert len(got) == 500
    assert got == want


def test_interleave_stats_is_scan_stage_only(nested):
    plan = plan_str(interleave_stats(nested), "simple")
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan


def test_interleave_gate_matches_stats_keep(nested):
    """The gate's inlined predicate and the stats path's column-derived
    keep are separate code paths — pin their equivalence on the real
    synthetic corpus (plus: the gate preserves the input schema)."""
    want = sorted(
        r["doc_id"]
        for r in interleave_stats(nested).where("keep").select("doc_id").collect()
    )
    gated = interleave_gate(nested)
    assert gated.columns == nested.columns
    got = sorted(r["doc_id"] for r in gated.select("doc_id").collect())
    assert got == want
    assert 0 < len(got) < nested.count()


def test_interleave_gate_is_streaming_compatible(spark, tmp_path, nested):
    """The gate is a stateless scan filter, so it must run unchanged
    under Structured Streaming — streamed output == batch output."""
    inp, outp, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    nested.write.parquet(inp)
    src = spark.readStream.schema(nested.schema).parquet(inp)
    q = (
        interleave_gate(src)
        .select("doc_id")
        .writeStream.format("parquet")
        .option("path", outp)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(r.doc_id for r in spark.read.parquet(outp).collect())
    want = sorted(r.doc_id for r in interleave_gate(nested).select("doc_id").collect())
    assert got == want and len(got) > 0


def test_interleave_gate_is_scan_stage_only(nested):
    plan = plan_str(interleave_gate(nested), "simple")
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan


# ---------------------------------------------------------------------------
# strip_frequent_spans
# ---------------------------------------------------------------------------


def test_strip_semantics(spark):
    boiler = "subscribe to our newsletter"
    rows = [
        _doc("a", [("text", boiler, "", 0), ("text", "unique prose a", "", 1),
                   # repeated INSIDE one doc: per-doc distinct -> df still 3
                   ("text", boiler, "", 2)]),
        _doc("b", [("text", boiler, "", 0), ("text", "unique prose b", "", 1)]),
        _doc("c", [("text", boiler, "", 0), ("picture", "", "img-c", 1),
                   # short span below min_chars: never stripped
                   ("text", "hi", "", 2)]),
        _doc("d", [("text", "unique prose d", "", 0)]),
    ]
    df = spark.createDataFrame(rows, _NESTED_SCHEMA)
    out = strip_frequent_spans(df, min_docs=3).collect()
    texts = sorted((r["doc_id"], r["text"]) for r in out)
    assert (("a", boiler) not in texts) and (("b", boiler) not in texts)
    assert texts == [
        ("a", "unique prose a"),
        ("b", "unique prose b"),
        ("c", ""),  # media span survives untouched
        ("c", "hi"),
        ("d", "unique prose d"),
    ]
    # min_docs=4 would spare it (df is per-DISTINCT-doc: 3, not 4),
    # so all 4 boiler ROWS survive (doc a carries it twice)
    spared = strip_frequent_spans(df, min_docs=4)
    assert spared.where(F.col("text") == boiler).count() == 4
    with pytest.raises(ValueError):
        strip_frequent_spans(df, min_docs=1)


def test_strip_df_counts_distinct_docs_across_nested_rows(spark):
    """A doc_id split over several nested rows (sharded union shape)
    counts ONCE toward document frequency — the per-row array dedup
    alone would over-count and strip prose."""
    boiler = "subscribe to our newsletter"
    rows = [
        _doc("a", [("text", boiler, "", 0)]),
        _doc("a", [("text", boiler, "", 1)]),  # same doc, second shard
        _doc("b", [("text", boiler, "", 0), ("text", "keep me here", "", 1)]),
    ]
    df = spark.createDataFrame(rows, _NESTED_SCHEMA)
    # distinct docs carrying boiler = 2, so min_docs=3 must spare it
    out = strip_frequent_spans(df, min_docs=3)
    assert out.where(F.col("text") == boiler).count() == 3
    # and min_docs=2 strips all three occurrences
    out2 = strip_frequent_spans(df, min_docs=2)
    assert out2.where(F.col("text") == boiler).count() == 0
    assert out2.count() == 1


def test_run_fold_deterministic_under_tied_offsets(spark, con):
    """Duplicate offsets (resume/rewrite artifacts): the (offset,
    is_media) tie-break must give one deterministic max_media_run in
    BOTH engines — including fully-identical duplicate media spans,
    which break a gaps-and-islands formulation."""
    rows = [
        # media+text tied at offset 1: text sorts first -> runs 1,1
        _doc("tie", [("text", "aa", "", 0), ("picture", "", "m1", 1),
                     ("text", "bb", "", 1), ("picture", "", "m2", 2)]),
        # two IDENTICAL media spans tied at one offset -> run 2
        _doc("dup", [("text", "aa", "", 0), ("picture", "", "mm", 1),
                     ("picture", "", "mm", 1), ("text", "bb", "", 2)]),
    ]
    df = spark.createDataFrame(rows, _NESTED_SCHEMA)
    got = {r["doc_id"]: r["max_media_run"] for r in interleave_stats(df).collect()}
    assert got == {"tie": 2, "dup": 2}
    # oracle agreement on the same corpus via a literal flat source
    flat_rows = ", ".join(
        f"('{d}', '{k}', '{t}', '{m}', {o})"
        for d, spans in rows
        for (k, t, m, o) in spans
    )
    src = (
        "SELECT * FROM (VALUES " + flat_rows + ") "
        "AS v(doc_id, kind, text, media_ref, \"offset\")"
    )
    want = {
        r[0]: r[6]
        for r in con.execute(interleave_stats_sql(src)).fetchall()
    }
    assert want == got


def test_strip_matches_oracle(nested, con):
    got = sorted(map(tuple, strip_frequent_spans(nested).collect()))
    want = sorted(
        map(
            tuple,
            con.execute(strip_frequent_spans_sql(synth_spans_sql())).fetchall(),
        )
    )
    assert got == want
    # the corpus genuinely exercises removal
    n_all = nested.selectExpr("sum(size(spans)) AS n").collect()[0]["n"]
    assert 0 < len(got) < n_all


def test_strip_flat_matches_nested(nested, spark):
    """The flat variant over the exploded stream must strip exactly
    the rows the nested variant strips, and pass extra columns
    through untouched."""
    flat = nested.select("doc_id", F.explode("spans").alias("s")).select(
        "doc_id",
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
        F.col("s.offset").alias("offset"),
    )
    want = sorted(map(tuple, strip_frequent_spans(nested).collect()))
    extra = flat.withColumn("extra", F.lit("x"))
    out = strip_frequent_flat(extra)
    assert out.columns == ["doc_id", "kind", "text", "media_ref", "offset", "extra"]
    got = sorted(map(tuple, out.drop("extra").collect()))
    assert got == want
    with pytest.raises(ValueError):
        strip_frequent_flat(flat, min_docs=1)
    with pytest.raises(ValueError):
        strip_frequent_flat(flat.withColumn("_tkey", F.lit(1)))


def test_strip_plan_shuffles_hashes_not_text(nested):
    df = strip_frequent_spans(nested)
    plan = plan_str(df, "simple")
    assert "partial_count" in plan, plan  # two-phase df aggregation
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan
    # the df-count exchange carries only the 60-bit key, never span text
    fmt = plan_str(df, "formatted")
    import re

    for m in re.finditer(r"Exchange hashpartitioning\(([^,]+),", fmt):
        assert "text" not in m.group(1), m.group(0)


# ---------------------------------------------------------------------------
# caption_pairs
# ---------------------------------------------------------------------------


def test_caption_pairs_semantics(spark):
    from ocr_spark.functions.interleave import caption_pairs

    rows = [
        # nearest-by-distance, tie resolves FORWARD (offset 4 is
        # equidistant from caps at 2 and 6 -> 6 wins)
        _doc("tie", [("caption", "before", "", 2),
                     ("picture", "", "img-t", 4),
                     ("caption", "after", "", 6)]),
        # strictly nearer preceding caption wins
        _doc("prev", [("caption", "near", "", 3),
                      ("picture", "", "img-p", 4),
                      ("caption", "far", "", 9)]),
        # no caption in doc -> row kept with NULLs
        _doc("none", [("text", "prose", "", 0),
                      ("picture", "", "img-n", 1)]),
        # caption AT the media offset would violate the distinct-offset
        # precondition; caption adjacent after
        _doc("adj", [("picture", "", "img-a", 0),
                     ("caption", "right after", "", 1)]),
    ]
    df = spark.createDataFrame(rows, _NESTED_SCHEMA)
    got = {r.media_ref: (r.caption_offset, r.caption_text)
           for r in caption_pairs(df).collect()}
    assert got == {
        "img-t": (6, "after"),
        "img-p": (3, "near"),
        "img-n": (None, None),
        "img-a": (1, "right after"),
    }


def test_caption_pairs_matches_oracle(nested, con):
    from ocr_spark.functions.interleave import caption_pairs, caption_pairs_sql

    got = sorted(map(tuple, caption_pairs(nested).collect()))
    want = sorted(
        map(tuple, con.execute(caption_pairs_sql(synth_spans_sql())).fetchall())
    )
    assert got == want and len(got) > 0


def test_caption_pairs_is_scan_stage_only(nested):
    from ocr_spark.functions.interleave import caption_pairs

    assert "Exchange" not in plan_str(caption_pairs(nested), "simple")


# ---------------------------------------------------------------------------
# section_paths
# ---------------------------------------------------------------------------


def test_section_paths_outline_clearing(spark):
    from ocr_spark.functions.interleave import section_paths

    h = lambda lvl, txt, o: (f"section_header_level_{lvl}", txt, "", o)
    t = lambda txt, o: ("text", txt, "", o)
    rows = [
        _doc("d", [
            t("preamble", 0),          # before any heading -> ''
            h(1, "Intro", 1),
            t("a", 2),                 # Intro
            h(2, "Setup", 3),
            t("b", 4),                 # Intro > Setup
            h(3, "Wires", 5),
            t("c", 6),                 # Intro > Setup > Wires
            h(2, "Usage", 7),
            t("d", 8),                 # Intro > Usage (lvl3 cleared)
            h(1, "Outro", 9),
            t("e", 10),                # Outro (lvl2+3 cleared)
        ]),
    ]
    df = spark.createDataFrame(rows, _NESTED_SCHEMA)
    got = {r.offset: r.section_path for r in section_paths(df).collect()}
    assert got == {
        0: "",
        2: "Intro",
        4: "Intro > Setup",
        6: "Intro > Setup > Wires",
        8: "Intro > Usage",
        10: "Outro",
    }


def test_section_paths_matches_oracle(nested, con):
    from ocr_spark.functions.interleave import section_paths, section_paths_sql

    got = sorted(map(tuple, section_paths(nested).collect()))
    want = sorted(
        map(tuple, con.execute(section_paths_sql(synth_spans_sql())).fetchall())
    )
    assert got == want and len(got) > 0


def test_section_paths_oracle_parity_on_multilevel_fixture(spark, con):
    """The synth corpus only has level-1 headings; pin both engines on
    a fixture that exercises the level-clearing rule for real."""
    from ocr_spark.functions.interleave import section_paths, section_paths_sql

    import pandas as pd

    flat = []
    for d in range(6):
        spans = [("section_header_level_1", f"H1-{d}", "", 0)]
        for i in range(1, 12):
            lvl = (d + i) % 4
            if lvl in (2, 3) and i % 3 == 0:
                spans.append((f"section_header_level_{lvl}", f"H{lvl}-{d}-{i}", "", i))
            else:
                spans.append(("text", f"body {d} {i}", "", i))
        flat += [(str(d), k, t, m, o) for (k, t, m, o) in spans]
    pdf = pd.DataFrame(flat, columns=["doc_id", "kind", "text", "media_ref", "offset"])
    nested_rows = [
        (str(d), [tuple(r) for r in pdf[pdf.doc_id == str(d)][
            ["kind", "text", "media_ref", "offset"]].itertuples(index=False)])
        for d in map(str, range(6))
    ]
    df = spark.createDataFrame(nested_rows, _NESTED_SCHEMA)
    con.register("t_secp_df", pdf)
    con.execute("CREATE OR REPLACE VIEW t_secp AS SELECT * FROM t_secp_df")
    got = sorted(map(tuple, section_paths(df).collect()))
    want = sorted(
        map(tuple, con.execute(section_paths_sql("SELECT * FROM t_secp")).fetchall())
    )
    assert got == want
    # sanity: at least one 2-deep path materialized
    assert any(" > " in r[3] for r in got)


def test_section_paths_validation_and_plan(nested):
    from ocr_spark.functions.interleave import section_paths

    with pytest.raises(ValueError):
        section_paths(nested, max_level=0)
    assert "Exchange" not in plan_str(section_paths(nested), "simple")


def test_span_structure_fuzz_across_engines(spark, con):
    """Seeded fuzz for the nested-span structure twins: hostile
    unicode text, NULL text/media_ref/kind, junk heading kinds
    ('section_header_level_', '..._99x'), deep real levels — through
    caption_pairs and section_paths. Offsets stay distinct per doc
    (the documented precondition)."""
    import random

    import pandas as pd

    from ocr_spark.functions.interleave import (
        caption_pairs,
        caption_pairs_sql,
        section_paths,
        section_paths_sql,
    )

    rng = random.Random(777)
    alphabet = "ab 0.'\"<>\t\n\xa0éü漢🎉İıK"
    kinds = [
        "text", "caption", "picture", "list_item", None,
        "section_header_level_1", "section_header_level_2",
        "section_header_level_3", "section_header_level_7",
        "section_header_level_", "section_header_level_99x",
    ]
    rows = []
    for d in range(60):
        n = rng.randint(0, 14)
        for o in range(n):
            kind = rng.choice(kinds)
            text = (
                None
                if rng.random() < 0.15
                else "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 12)))
            )
            media = f"m-{d}-{o}" if kind == "picture" else (
                None if rng.random() < 0.5 else ""
            )
            rows.append((str(d), kind, text, media, o))
    pdf = pd.DataFrame(rows, columns=["doc_id", "kind", "text", "media_ref", "offset"])
    con.register("t_sfuzz_df", pdf)
    con.execute("CREATE OR REPLACE VIEW t_sfuzz AS SELECT * FROM t_sfuzz_df")
    nested_rows = [
        (d, [tuple(r) for r in g[["kind", "text", "media_ref", "offset"]]
             .itertuples(index=False)])
        for d, g in pdf.groupby("doc_id")
    ]
    df = spark.createDataFrame(nested_rows, _NESTED_SCHEMA)
    for build, sql in (
        (caption_pairs, caption_pairs_sql("SELECT * FROM t_sfuzz")),
        (section_paths, section_paths_sql("SELECT * FROM t_sfuzz")),
    ):
        got = sorted(map(tuple, build(df).collect()))
        want = sorted(map(tuple, con.execute(sql).fetchall()))
        assert got == want, (got[:5], want[:5])


# ---------------------------------------------------------------------------
# span_integrity
# ---------------------------------------------------------------------------


def test_span_integrity_semantics(spark):
    from ocr_spark.functions.interleave import span_integrity

    rows = [
        # clean doc
        _doc("clean", [("text", "hello", "", 0), ("picture", "", "img", 1)]),
        # one NULL offset + a duplicate pair among the non-null ones
        _doc(
            "dups",
            [
                ("text", "a", "", None),
                ("text", "b", "", 2),
                ("text", "c", "", 2),
                ("text", "d", "", 3),
            ],
        ),
        # media span carrying prose; text span with empty body;
        # NULL kind
        _doc(
            "bad",
            [
                ("picture", "stray prose", "img", 0),
                ("text", "", "", 1),
                (None, "x", "", 2),
            ],
        ),
        # empty spans array: audits all-zero/ok (Spark-only row; the
        # flat twin cannot see it)
        ("empty", []),
    ]
    df = spark.createDataFrame(rows, _NESTED_SCHEMA)
    got = {r.doc_id: r for r in span_integrity(df).collect()}
    c = got["clean"]
    assert (c.n_spans, c.ok) == (2, True)
    d = got["dups"]
    assert (d.n_null_offset, d.n_dup_offsets, d.ok) == (1, 1, False)
    b = got["bad"]
    assert (b.n_media_with_text, b.n_blank_text, b.n_null_kind, b.ok) == (
        1,
        1,
        1,
        False,
    )
    e = got["empty"]
    assert (e.n_spans, e.ok) == (0, True)


def test_span_integrity_twin_parity(spark, con):
    from ocr_spark.functions.interleave import span_integrity, span_integrity_sql

    nested = synthesize_spans(
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
    )
    got = sorted(tuple(r) for r in span_integrity(nested).collect())
    want = sorted(
        tuple(r)
        for r in con.execute(span_integrity_sql(synth_spans_sql())).fetchall()
    )
    assert got == want and len(got) == 500
    # the synthetic corpus is contract-clean
    assert all(r[-1] for r in got)


def test_span_integrity_is_scan_stage(spark):
    from ocr_spark.functions.interleave import span_integrity
    from ocr_spark.plans import plan_str

    nested = synthesize_spans(spark.read.parquet(f"{SF_DIR}/documents.parquet"))
    plan = plan_str(span_integrity(nested), "simple")
    assert "Exchange" not in plan
    assert "Generate" not in plan


# ---------------------------------------------------------------------------
# interleaved_token_counts / chunk_interleaved
# ---------------------------------------------------------------------------

def test_interleaved_token_counts_semantics(spark):
    from ocr_spark.functions.interleave import interleaved_token_counts

    rows = [
        _doc("d1", [("text", "a b  c", "", 0), ("picture", "", "img-1", 1)]),
        _doc("d2", [("text", None, "", 0), ("text", "", "", 1)]),
        _doc("d3", []),
        ("d4", None),
    ]
    df = spark.createDataFrame(rows, _NESTED_SCHEMA)
    got = {r.doc_id: r for r in
           interleaved_token_counts(df, media_token_cost=100).collect()}
    assert got["d1"].n_text_tokens == 3 and got["d1"].n_media_spans == 1
    assert got["d1"].n_tokens == 103
    assert got["d2"].n_tokens == 0  # NULL/empty text spans cost nothing
    assert got["d3"].n_tokens == 0 and got["d4"].n_tokens == 0


def test_chunk_interleaved_semantics(spark):
    from ocr_spark.functions.interleave import chunk_interleaved

    rows = [
        # 3 tokens | media(3) | 2 tokens, budget 4:
        # chunk 0 = [text3, media3] (starts at 0 and 3; media straddles
        # -> overflow), chunk 1 = [text2] (starts at cum 6 -> 6 div 4)
        _doc("d1", [("text", "a b c", "", 0),
                    ("picture", "", "img-1", 1),
                    ("text", "d e", "", 2)]),
        # single oversize text span: one chunk, overflow
        _doc("d2", [("text", "t1 t2 t3 t4 t5 t6", "", 0)]),
        _doc("d3", []),  # no chunks
    ]
    df = spark.createDataFrame(rows, _NESTED_SCHEMA)
    got = sorted(
        map(tuple, chunk_interleaved(df, max_tokens=4, media_token_cost=3)
            .collect())
    )
    assert got == [
        ("d1", 0, 2, 1, 1, 6, True),
        ("d1", 1, 1, 1, 0, 2, False),
        ("d2", 0, 1, 1, 0, 6, True),
    ]


def test_chunk_interleaved_media_never_splits(spark):
    """Every media span lands whole in exactly one chunk: the total
    media count across chunks equals the corpus media count, and no
    chunk's token count is ever negative/fractional."""
    from ocr_spark.functions.interleave import chunk_interleaved

    nested_df = synthesize_spans(
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
    )
    chunks = chunk_interleaved(nested_df, max_tokens=32, media_token_cost=20)
    n_media_chunks = chunks.agg(F.sum("n_media_spans")).collect()[0][0]
    n_media_spans = nested_df.select(
        F.explode("spans").alias("s")
    ).where("s.media_ref <> ''").count()
    assert n_media_chunks == n_media_spans
    # chunk ids start at 0 (the first span's cum_before is 0) and are
    # at most one per budget window — NOT necessarily dense: a span
    # spanning several budgets makes its successor skip window ids.
    bad = (
        chunks.groupBy("doc_id")
        .agg(F.min("chunk_id").alias("lo"), F.max("chunk_id").alias("hi"),
             F.count("*").alias("n"))
        .where("lo != 0 OR n > hi + 1")
        .count()
    )
    assert bad == 0


def test_chunk_interleaved_sparse_ids_and_null_offset(spark):
    """A span spanning multiple budgets skips window ids for its
    successor (ids are budget indexes, not a dense rank), and a NULL
    offset sorts FIRST identically in both engines."""
    import pandas as pd

    from ocr_spark.functions.interleave import (
        chunk_interleaved,
        chunk_interleaved_sql,
    )

    rows = [
        # 5-token span at budget 2 -> fills windows 0,1,2; successor
        # starts at cum 5 -> chunk 2
        _doc("sparse", [("text", "a b c d e", "", 0), ("text", "f", "", 1)]),
    ]
    df = spark.createDataFrame(rows, _NESTED_SCHEMA)
    got = sorted(map(tuple, chunk_interleaved(df, max_tokens=2).collect()))
    assert got == [
        ("sparse", 0, 1, 1, 0, 5, True),
        ("sparse", 2, 1, 1, 0, 1, False),
    ]

    flat = [
        ("n1", "text", "one two three", "", None),   # NULL offset: first
        ("n1", "picture", "", "img", 0),
    ]
    pdf = pd.DataFrame(
        flat, columns=["doc_id", "kind", "text", "media_ref", "offset"]
    )
    nested_df = (
        spark.createDataFrame(
            pdf.astype({"offset": "Int64"})
        )
        .groupBy("doc_id")
        .agg(F.collect_list(
            F.struct("kind", "text", "media_ref", "offset")).alias("spans"))
    )
    con2 = duckdb.connect()
    con2.register("flat_null_off", pdf)
    sql = chunk_interleaved_sql(
        'SELECT doc_id, kind, text, media_ref, "offset" FROM flat_null_off',
        max_tokens=4,
        media_token_cost=3,
    )
    cols = sorted(["doc_id", "chunk_id", "n_spans", "n_text_spans",
                   "n_media_spans", "n_tokens", "overflow"])
    sdf = chunk_interleaved(nested_df, max_tokens=4, media_token_cost=3)
    got2 = sorted(map(tuple, sdf.select(*cols).collect()))
    odf = con2.execute(sql).df()
    want2 = sorted(map(tuple, odf[cols].itertuples(index=False, name=None)))
    assert got2 == want2
    # NULL-offset text (3 tokens) first -> media starts at cum 3,
    # straddles -> chunk 0 has both spans
    assert got2[0][cols.index("n_spans")] == 2


def test_chunking_cross_engine(spark):
    import pandas as pd

    from ocr_spark.functions.interleave import (
        chunk_interleaved,
        chunk_interleaved_sql,
        interleaved_token_counts,
        interleaved_token_counts_sql,
    )

    # hostile flat corpus: duplicate offsets, NULL text, empty text,
    # unicode, zero-token whitespace-only text, media at tied offset
    flat = [
        ("h1", "text", "alpha beta", "", 0),
        ("h1", "picture", "", "img-a", 0),       # tied offset vs text
        ("h1", "text", "  ", "", 1),              # whitespace-only: 0 tokens
        ("h1", "text", None, "", 2),
        ("h2", "text", "caf\xe9 na\xefve", "", 0),
        ("h2", "picture", "", "img-b", 1),
        ("h2", "text", "x", "", 2),
    ]
    pdf = pd.DataFrame(
        flat, columns=["doc_id", "kind", "text", "media_ref", "offset"]
    )
    nested_df = (
        spark.createDataFrame(pdf)
        .groupBy("doc_id")
        .agg(F.collect_list(
            F.struct("kind", "text", "media_ref", "offset")).alias("spans"))
    )
    con2 = duckdb.connect()
    con2.register("flat_spans", pdf)
    src = 'SELECT doc_id, kind, text, media_ref, "offset" FROM flat_spans'
    for sdf, sql in (
        (chunk_interleaved(nested_df, max_tokens=5, media_token_cost=4),
         chunk_interleaved_sql(src, max_tokens=5, media_token_cost=4)),
        (interleaved_token_counts(nested_df, media_token_cost=4),
         interleaved_token_counts_sql(src, media_token_cost=4)),
    ):
        cols = sorted(sdf.columns)
        got = sorted(map(tuple, sdf.select(*cols).collect()))
        odf = con2.execute(sql).df()
        want = sorted(map(tuple, odf[cols].itertuples(index=False, name=None)))
        assert got == want


def test_chunk_interleaved_single_exchange(spark):
    """The (doc_id, chunk_id) aggregate must reuse the window's
    doc_id hash partitioning (subset rule) — exactly ONE Exchange in
    the plan; token_counts stays scan-stage (zero Exchange)."""
    from ocr_spark.functions.interleave import (
        chunk_interleaved,
        interleaved_token_counts,
    )

    nested_df = synthesize_spans(
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
    )
    p = plan_str(chunk_interleaved(nested_df), "simple")
    assert p.count("Exchange") == 1 and "ArrowEvalPython" not in p
    p2 = plan_str(interleaved_token_counts(nested_df), "simple")
    assert "Exchange" not in p2 and "ArrowEvalPython" not in p2


# ---------------------------------------------------------------------------
# render_interleaved / structure_fingerprint / template_stats
# ---------------------------------------------------------------------------


def test_render_interleaved_semantics(spark):
    from ocr_spark.functions.interleave import render_interleaved

    rows = [
        _doc("a", [("text", "hello world", "", 0), ("picture", "", "img-1", 1),
                   ("caption", "a cat", "", 2),
                   ("text", "", "", 3),        # empty text: dropped
                   ("text", None, "", 4)]),    # NULL text: dropped
        # duplicate offsets resolve by (is_media, text, media_ref);
        # NULL offset sorts first (the chunk_interleaved order)
        _doc("b", [("picture", "", "z", 2), ("picture", "", "y", 2),
                   ("text", "tie", "", 2), ("text", "first", None, None)]),
        _doc("empty", []),
        ("nullspans", None),
    ]
    df = spark.createDataFrame(rows, _NESTED_SCHEMA)
    got = {r.doc_id: r for r in render_interleaved(df).collect()}
    assert got["a"].rendered_text == "hello world\n<|image|>\na cat"
    assert (got["a"].n_rendered, got["a"].n_media) == (3, 1)
    assert got["b"].rendered_text == "first\ntie\n<|image|>\n<|image|>"
    assert got["empty"].rendered_text == "" and got["empty"].n_rendered == 0
    assert got["nullspans"].rendered_text is None
    assert got["nullspans"].n_rendered == 0 and got["nullspans"].n_media == 0
    # custom token + separator (with a quote, exercising SQL escaping)
    alt = {r.doc_id: r.rendered_text for r in render_interleaved(
        df, media_token="<img>", sep="' ").collect()}
    assert alt["a"] == "hello world' <img>' a cat"


def test_render_matches_chunk_order(spark):
    """A document rendered whole equals its chunks rendered in
    chunk_id order — render and chunking share the one total order."""
    from ocr_spark.functions.interleave import (
        chunk_interleaved,
        render_interleaved,
    )

    rows = [_doc("d", [("text", f"w{i} w{i} w{i}", "", i) if i % 3
                       else ("picture", "", f"img-{i}", i)
                       for i in range(12)])]
    df = spark.createDataFrame(rows, _NESTED_SCHEMA)
    whole = render_interleaved(df).collect()[0].rendered_text
    # chunk at a budget that splits the doc, then re-render per chunk
    # by filtering spans to each chunk's members: equality of span
    # MULTISETS is what the shared order guarantees; check counts.
    chunks = chunk_interleaved(df, max_tokens=7, media_token_cost=2)
    n_spans_in_chunks = sum(r.n_spans for r in chunks.collect())
    assert n_spans_in_chunks == 12
    assert whole.count("<|image|>") == 4  # offsets 0,3,6,9


def test_render_and_fingerprint_cross_engine(spark, nested, con):
    from ocr_spark.functions.interleave import (
        render_interleaved,
        render_interleaved_sql,
        structure_fingerprint,
        structure_fingerprint_sql,
        template_stats,
        template_stats_sql,
    )

    for sdf, sql, cols in [
        (render_interleaved(nested), render_interleaved_sql(synth_spans_sql()),
         ["doc_id", "rendered_text", "n_rendered", "n_media"]),
        (structure_fingerprint(nested),
         structure_fingerprint_sql(synth_spans_sql()),
         ["doc_id", "n_spans", "n_media", "fingerprint"]),
        (template_stats(nested, min_docs=2),
         template_stats_sql(synth_spans_sql(), min_docs=2),
         ["fingerprint", "n_docs", "n_spans", "n_media", "is_template"]),
    ]:
        got = sorted(map(tuple, sdf.select(*cols).collect()))
        odf = con.execute(sql).df()
        want = sorted(map(tuple, odf[cols].itertuples(index=False, name=None)))
        assert got == want, (cols, got[:3], want[:3])
    # the synth corpus must actually exercise the operator: some
    # structure repeats across docs at min_docs=2
    ts = template_stats(nested, min_docs=2).where("is_template").count()
    assert ts > 0


def test_structure_fingerprint_content_blind(spark):
    from ocr_spark.functions.interleave import structure_fingerprint

    rows = [
        _doc("x", [("text", "alpha", "", 0), ("picture", "", "i1", 1)]),
        _doc("y", [("text", "totally different", "", 0),
                   ("picture", "", "other-ref", 1)]),
        _doc("z", [("picture", "", "i1", 0), ("text", "alpha", "", 1)]),
    ]
    df = spark.createDataFrame(rows, _NESTED_SCHEMA)
    got = {r.doc_id: r.fingerprint for r in structure_fingerprint(df).collect()}
    assert got["x"] == got["y"]      # same skeleton, different content
    assert got["x"] != got["z"]      # order matters
    # NULL spans -> NULL fingerprint (excluded from template_stats)
    df2 = spark.createDataFrame([("n", None)], _NESTED_SCHEMA)
    assert structure_fingerprint(df2).collect()[0].fingerprint is None


def test_render_fingerprint_plans(spark, nested):
    """render + fingerprint are scan-stage only; template_stats adds
    exactly one exchange (the fingerprint groupBy)."""
    from ocr_spark.functions.interleave import (
        render_interleaved,
        structure_fingerprint,
        template_stats,
    )

    assert "Exchange" not in plan_str(render_interleaved(nested), "simple")
    assert "Exchange" not in plan_str(structure_fingerprint(nested), "simple")
    plan = plan_str(template_stats(nested), "simple")
    assert plan.count("Exchange") == 1, plan
    assert "partial_count" in plan_str(template_stats(nested), "formatted")


def test_render_token_with_backslash_and_quote(spark):
    """media_token/sep go in as F.lit columns, never SQL text: a
    backslash must survive verbatim (Spark SQL literals would
    escape it)."""
    from ocr_spark.functions.interleave import render_interleaved

    rows = [_doc("a", [("text", "x", "", 0), ("picture", "", "i", 1)])]
    df = spark.createDataFrame(rows, _NESTED_SCHEMA)
    got = render_interleaved(
        df, media_token=r"<\img'>", sep=r"\n'"
    ).collect()[0]
    assert got.rendered_text == "x" + r"\n'" + r"<\img'>"


def test_structure_fingerprint_kind_tiebreak(spark):
    """Spans tied on (offset, modality, text, media_ref) but differing
    in kind: the kind tie-break pins the fingerprint regardless of
    array order (and both engines agree)."""
    import pandas as pd

    from ocr_spark.functions.interleave import (
        structure_fingerprint,
        structure_fingerprint_sql,
    )

    spans_ab = [("picture", "", "ref", 0), ("figure", "", "ref", 0)]
    rows = [_doc("fwd", spans_ab), _doc("rev", list(reversed(spans_ab)))]
    df = spark.createDataFrame(rows, _NESTED_SCHEMA)
    got = {r.doc_id: r.fingerprint for r in structure_fingerprint(df).collect()}
    assert got["fwd"] == got["rev"]  # array order untrusted, pinned by kind
    flat = [(d, s[0], s[1], s[2], s[3]) for d, spans in rows for s in spans]
    pdf = pd.DataFrame(
        flat, columns=["doc_id", "kind", "text", "media_ref", "offset"]
    )
    c = duckdb.connect()
    c.register("tie", pdf)
    odf = c.execute(structure_fingerprint_sql(
        'SELECT doc_id, kind, text, media_ref, "offset" FROM tie'
    )).df()
    want = dict(zip(odf.doc_id, odf.fingerprint))
    assert want == got


def test_total_order_null_offset_vs_int32_min(spark):
    """NULL offset sorts STRICTLY before a genuine int32-min offset
    (explicit NULL branch, not a sentinel) — matching
    chunk_interleaved's NULLS FIRST in both engines."""
    from ocr_spark.functions.interleave import render_interleaved

    rows = [_doc("d", [
        ("text", "minval", "", -2147483648),
        ("picture", "", "img", None),  # NULL offset: must come first
    ])]
    df = spark.createDataFrame(rows, _NESTED_SCHEMA)
    got = render_interleaved(df).collect()[0]
    assert got.rendered_text == "<|image|>\nminval"


def test_template_sample_semantics_and_oracle(spark, nested, con):
    from ocr_spark.functions.interleave import (
        template_sample,
        template_sample_sql,
    )

    tmpl = [("text", None, "", 0), ("picture", "", "", 1),
            ("caption", None, "", 2), ("text", None, "", 3)]

    def inst(d, i):
        return _doc(d, [(k, f"t{i}-{j}" if t is None else t,
                         f"img-{i}" if k == "picture" else r, o)
                        for j, (k, t, r, o) in enumerate(tmpl)])

    rows = [inst(f"farm{i:03d}", i) for i in range(10)]        # one template
    rows += [_doc("solo", [("text", "unique", "", 0), ("picture", "", "s", 1),
                           ("text", "tail", "", 2), ("text", "end", "", 3)])]
    rows += [("nullspans", None)]                               # passes through
    df = spark.createDataFrame(rows, _NESTED_SCHEMA)
    out = template_sample(df, max_per_template=4, min_docs=5)
    kept = sorted(r.doc_id for r in out.select("doc_id").collect())
    assert "solo" in kept and "nullspans" in kept
    n_farm = sum(k.startswith("farm") for k in kept)
    assert n_farm == 4                     # capped, deterministically
    assert out.columns == df.columns       # schema-preserving
    # determinism: same draw every run
    kept2 = sorted(r.doc_id for r in template_sample(
        df, max_per_template=4, min_docs=5).select("doc_id").collect())
    assert kept == kept2
    # cross-engine on the synth corpus (min_docs=2: structures repeat)
    g = sorted(r.doc_id for r in template_sample(
        nested, max_per_template=3, min_docs=2)
        .select("doc_id").distinct().collect())
    odf = con.execute(template_sample_sql(
        synth_spans_sql(), max_per_template=3, min_docs=2)).df()
    assert g == sorted(odf.doc_id)
    assert 0 < len(g) < 500                # it genuinely caps something
    with pytest.raises(ValueError, match="max_per_template"):
        template_sample(df, max_per_template=0)


def test_template_sample_plan_no_span_shuffle(spark, nested):
    """The fingerprint window shuffles the tiny id projection; the
    span payload reaches the output via the semi-join only."""
    from ocr_spark.functions.interleave import template_sample

    fmt = plan_str(template_sample(nested), "formatted")
    import re

    # every exchange must partition on fingerprint or doc_id (the
    # semi-join), never carry spans as a shuffle payload column set
    # that includes the window — heuristic: the window exchange's
    # input schema must not mention 'spans'
    for m in re.finditer(r"Exchange hashpartitioning\((\w+)", fmt):
        assert m.group(1) in ("fingerprint", "doc_id"), fmt[:2000]


def test_chunk_integrity_semantics(spark):
    from ocr_spark.functions.interleave import chunk_integrity

    rows = [
        # multi-chunk doc: 3 text spans of 4 tokens + 1 media (cost 8)
        _doc("multi", [("text", "a b c d", "", 0),
                       ("picture", "", "img-0", 1),
                       ("text", "e f g h", "", 2),
                       ("text", "i j k l", "", 3)]),
        # giant span: single text span costing > budget -> overflow,
        # still fully conserved
        _doc("giant", [("text", " ".join(f"w{i}" for i in range(40)),
                        "", 0)]),
        ("empty", []),
        ("nullspans", None),
    ]
    df = spark.createDataFrame(rows, _NESTED_SCHEMA)
    out = {r.doc_id: r for r in chunk_integrity(
        df, max_tokens=8, media_token_cost=8).collect()}
    assert set(out) == {"multi", "giant", "empty", "nullspans"}
    assert all(r.ok for r in out.values()), out
    m = out["multi"]
    assert (m.n_spans_in, m.n_spans_chunked) == (4, 4)
    assert (m.n_media_in, m.n_media_chunked) == (1, 1)
    assert m.n_tokens_in == m.n_tokens_chunked == 20
    assert m.n_chunks >= 2 and m.n_over_budget == 0
    g = out["giant"]
    assert g.n_overflow >= 1 and g.n_tokens_in == 40 and g.ok
    for d in ("empty", "nullspans"):
        r = out[d]
        assert (r.n_spans_in, r.n_chunks, r.n_tokens_in) == (0, 0, 0)
        assert r.ok


def test_chunk_integrity_catches_corruption(spark):
    """The audit is falsifiable: feed it a TAMPERED materialized
    chunk sidecar (the chunks= deployment shape) and each corruption
    class flips exactly the right doc to not-ok."""
    from pyspark.sql import functions as F

    from ocr_spark.functions.interleave import (
        chunk_integrity,
        chunk_interleaved,
    )

    rows = [
        _doc("lost", [("text", "a b c d", "", 0),
                      ("text", "e f g h", "", 1),
                      ("text", "i j k l", "", 2)]),
        _doc("inflated", [("text", "m n o p", "", 0),
                          ("picture", "", "img-0", 1)]),
        _doc("clean", [("text", "q r s t", "", 0)]),
    ]
    df = spark.createDataFrame(rows, _NESTED_SCHEMA)
    good = chunk_interleaved(df, max_tokens=4, media_token_cost=4)
    # drop one of `lost`'s chunks; double-count `inflated`'s tokens
    tampered = good.where(
        ~((F.col("doc_id") == "lost") & (F.col("chunk_id") == 0))
    ).withColumn(
        "n_tokens",
        F.when(F.col("doc_id") == "inflated",
               F.col("n_tokens") * 2).otherwise(F.col("n_tokens")),
    )
    out = {r.doc_id: r.ok for r in chunk_integrity(
        df, max_tokens=4, media_token_cost=4, chunks=tampered).collect()}
    assert out == {"lost": False, "inflated": False, "clean": True}
    # phantom chunks (doc_id absent from the source) must fail too —
    # the full-outer direction of the audit
    phantom = good.unionByName(
        good.limit(1).withColumn("doc_id", F.lit("ghost"))
    )
    out2 = {r.doc_id: r.ok for r in chunk_integrity(
        df, max_tokens=4, media_token_cost=4, chunks=phantom).collect()}
    assert out2["ghost"] is False
    assert {k: v for k, v in out2.items() if k != "ghost"} == {
        "lost": True, "inflated": True, "clean": True}
    # and the untampered sidecar audits clean
    ok = chunk_integrity(df, max_tokens=4, media_token_cost=4,
                         chunks=good)
    assert ok.where("NOT ok").count() == 0


def test_chunk_integrity_oracle(spark, nested, con):
    from ocr_spark.functions.interleave import (
        chunk_integrity,
        chunk_integrity_sql,
    )

    sdf = chunk_integrity(nested, max_tokens=64, media_token_cost=32)
    g = sorted(map(tuple, sdf.collect()))
    odf = con.execute(chunk_integrity_sql(
        synth_spans_sql(), max_tokens=64, media_token_cost=32)).df()
    o = sorted(map(tuple, odf[sdf.columns].itertuples(index=False,
                                                      name=None)))
    o = [tuple(v.item() if hasattr(v, "item") else v for v in r) for r in o]
    assert g == o
    assert len(g) == 500 and all(r[-1] for r in g)  # every doc ok


def test_chunk_integrity_plan(spark, nested):
    """Input side is a scan fold; the chunk side reuses the chunker's
    one doc_id Exchange for both aggregations; the final join adds at
    most one more exchange per side — no nested loops."""
    from ocr_spark.functions.interleave import chunk_integrity

    fmt = plan_str(chunk_integrity(nested), "formatted")
    assert "CartesianProduct" not in fmt and "NestedLoop" not in fmt
    assert fmt.count("Exchange") <= 4, fmt[:3000]


def test_render_chunks_semantics(spark):
    from ocr_spark.functions.interleave import render_chunks

    rows = [
        _doc("d", [("text", "a b c d", "", 0),
                   ("picture", "", "img-0", 1),
                   ("text", "", "", 2),          # dropped from string
                   ("text", "e f g h", "", 3)]),
    ]
    df = spark.createDataFrame(rows, _NESTED_SCHEMA)
    out = {r.chunk_id: r for r in render_chunks(
        df, max_tokens=8, media_token_cost=4).collect()}
    # cumsum: 4 + 4 = 8 -> chunk 0 = [text, media]; chunk 1 = ['',"e f g h"]
    assert out[0].rendered_text == "a b c d\n<|image|>"
    assert out[1].rendered_text == "e f g h"
    # empty-text span counts in n_spans but not in the string
    assert out[1].n_spans == 2 and out[1].n_tokens == 4
    assert out[0].n_spans == 2 and out[0].n_tokens == 8


def test_render_chunks_oracle_and_consistency(spark, nested, con):
    """Cross-engine parity; chunks joined in order reproduce the
    whole-doc rendering; stats agree with chunk_interleaved row for
    row (the shared-skeleton guarantee)."""
    from pyspark.sql import functions as F

    from ocr_spark.functions.interleave import (
        chunk_interleaved,
        render_chunks,
        render_chunks_sql,
        render_interleaved,
    )

    sdf = render_chunks(nested, max_tokens=64, media_token_cost=32)
    g = sorted(map(tuple, sdf.collect()))
    odf = con.execute(render_chunks_sql(
        synth_spans_sql(), max_tokens=64, media_token_cost=32)).df()
    o = [tuple(v.item() if hasattr(v, "item") else v for v in r)
         for r in sorted(map(tuple,
                             odf[sdf.columns].itertuples(index=False,
                                                         name=None)))]
    assert g == o and len(g) > 500
    whole = {r.doc_id: r.rendered_text
             for r in render_interleaved(nested).collect()}
    joined = sdf.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("chunk_id", "rendered_text"))
                ),
                lambda x: x.getField("rendered_text"),
            ),
            "\n",
        ).alias("j")
    ).collect()
    assert all(whole[r.doc_id] == r.j for r in joined)
    ci = sorted(map(tuple, chunk_interleaved(
        nested, max_tokens=64, media_token_cost=32
    ).select("doc_id", "chunk_id", "n_spans", "n_tokens").collect()))
    rc = sorted(map(tuple, sdf.select(
        "doc_id", "chunk_id", "n_spans", "n_tokens").collect()))
    assert ci == rc


def test_render_chunks_plan_single_exchange(spark, nested):
    """The chunker's one doc_id window Exchange serves the aggregate
    too; the in-chunk sort is a scan-stage array_sort."""
    from ocr_spark.functions.interleave import render_chunks

    p = plan_str(render_chunks(nested), "simple")
    assert p.count("Exchange") == 1, p[:3000]


def test_chunk_interleaved_bpe_cost(spark, nested, con):
    """Swapping the chunker's text cost to the trained BPE count
    changes window boundaries deterministically and identically in
    both engines; totals equal the BPE doc counts (conservation under
    a swapped cost)."""
    from ocr_spark.functions.bpe import (
        bpe_token_count_duck,
        bpe_token_count_expr,
    )
    from ocr_spark.functions.bpe_merges import MERGES
    from ocr_spark.functions.interleave import (
        chunk_interleaved,
        chunk_interleaved_sql,
    )

    def cost(col):
        return (f"coalesce({bpe_token_count_expr(MERGES, col)}, "
                "CAST(0 AS BIGINT))")

    dcost = f"coalesce({bpe_token_count_duck(MERGES)}, CAST(0 AS BIGINT))"
    sdf = chunk_interleaved(nested, max_tokens=64, media_token_cost=32,
                            text_cost=cost)
    g = sorted(map(tuple, sdf.collect()))
    odf = con.execute(chunk_interleaved_sql(
        synth_spans_sql(), max_tokens=64, media_token_cost=32,
        text_cost_sql=dcost)).df()
    o = [tuple(v.item() if hasattr(v, "item") else v for v in r)
         for r in sorted(map(tuple,
                             odf[sdf.columns].itertuples(index=False,
                                                         name=None)))]
    assert g == o and len(g) > 0
    # BPE merges compress: fewer symbols than chars, so boundaries
    # genuinely differ from the whitespace costing
    ws = sorted(map(tuple, chunk_interleaved(
        nested, max_tokens=64, media_token_cost=32).collect()))
    assert g != ws


def test_chunk_integrity_bpe_cost(spark, nested, con):
    """The audit under the BPE cost: fresh-run audit all-ok both
    engines; auditing a WS-cut sidecar under the BPE budget fails on
    token conservation (cost mismatch = wrong budget, by design)."""
    from ocr_spark.functions.bpe import (
        bpe_token_count_duck,
        bpe_token_count_expr,
    )
    from ocr_spark.functions.bpe_merges import MERGES
    from ocr_spark.functions.interleave import (
        chunk_integrity,
        chunk_integrity_sql,
        chunk_interleaved,
    )

    def cost(col):
        return (f"coalesce({bpe_token_count_expr(MERGES, col)}, "
                "CAST(0 AS BIGINT))")

    dcost = f"coalesce({bpe_token_count_duck(MERGES)}, CAST(0 AS BIGINT))"
    sdf = chunk_integrity(nested, max_tokens=64, media_token_cost=32,
                          text_cost=cost)
    g = sorted(map(tuple, sdf.collect()))
    odf = con.execute(chunk_integrity_sql(
        synth_spans_sql(), max_tokens=64, media_token_cost=32,
        text_cost_sql=dcost)).df()
    o = [tuple(v.item() if hasattr(v, "item") else v for v in r)
         for r in sorted(map(tuple,
                             odf[sdf.columns].itertuples(index=False,
                                                         name=None)))]
    assert g == o and all(r[-1] for r in g)
    ws_sidecar = chunk_interleaved(nested, max_tokens=64,
                                   media_token_cost=32)
    mismatch = chunk_integrity(nested, max_tokens=64, media_token_cost=32,
                               chunks=ws_sidecar, text_cost=cost)
    assert mismatch.where("NOT ok").count() > 0


def test_chunk_integrity_custom_cost_keeps_per_row_dup_semantics(spark):
    """Duplicate doc_id input rows must keep per-row verdicts under a
    CUSTOM cost too (the re-crawl alarm): a grouped input side would
    sum both occurrences and wave the doubled document through."""
    from ocr_spark.functions.interleave import (
        chunk_integrity,
        chunk_interleaved,
    )

    rows = [_doc("dup", [("text", "a b c d", "", 0)]),
            _doc("dup", [("text", "a b c d", "", 0)])]
    df = spark.createDataFrame(rows, _NESTED_SCHEMA)
    cost = lambda col: f"coalesce(length({col}), CAST(0 AS BIGINT))"  # noqa: E731
    sidecar = chunk_interleaved(df, max_tokens=8, media_token_cost=4,
                                text_cost=cost)
    out = chunk_integrity(df, max_tokens=8, media_token_cost=4,
                          chunks=sidecar, text_cost=cost).collect()
    # two input rows -> two audit rows, each seeing the merged (2-row)
    # chunk side: both not-ok, the doubled doc cannot pass
    assert len(out) == 2 and all(not r.ok for r in out)
