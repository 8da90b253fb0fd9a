"""DocTags parser unit tests against real reference stream shapes
(/root/reference/parsing_results.json)."""

from ocr_spark.kernel.doctags import parse_doctags


def test_basic_stream():
    s = (
        "<doctag><text><loc_47><loc_30><loc_153><loc_38>HELLO</text>\n"
        "<section_header_level_1><loc_205><loc_68><loc_318><loc_83>TITLE</section_header_level_1>\n"
        "</doctag>"
    )
    spans = parse_doctags(s)
    assert [s["kind"] for s in spans] == ["text", "section_header_level_1"]
    assert [s["text"] for s in spans] == ["HELLO", "TITLE"]
    assert [s["offset"] for s in spans] == [0, 1]
    assert all(s["media_ref"] == "" for s in spans)


def test_unordered_list_unwrapped():
    s = (
        "<doctag><unordered_list><list_item><loc_53><loc_84><loc_221><loc_94>item one</list_item>\n"
        "</unordered_list>\n"
        "<unordered_list><list_item><loc_53><loc_98><loc_197><loc_108>item two</list_item>\n"
        "</unordered_list></doctag>"
    )
    spans = parse_doctags(s)
    assert [s["kind"] for s in spans] == ["list_item", "list_item"]
    assert [s["text"] for s in spans] == ["item one", "item two"]


def test_picture_placeholder_media_refs():
    s = (
        "<doctag><picture><loc_8><loc_60><loc_58><loc_115></picture>\n"
        "<text><loc_1><loc_2><loc_3><loc_4>body</text>\n"
        "<picture><loc_9><loc_124><loc_75><loc_140></picture></doctag>"
    )
    spans = parse_doctags(s)
    assert [s["kind"] for s in spans] == ["picture", "text", "picture"]
    assert spans[0]["media_ref"] == "pic-0"
    assert spans[2]["media_ref"] == "pic-1"
    assert spans[0]["text"] == "" and spans[2]["text"] == ""


def test_preview_slice_feeds_parser(spark):
    # P2: the UI preview is doctags[:1000]; a cut mid-tag must still
    # parse (dropping the unclosed tail); Spark and DuckDB slice alike
    import duckdb
    from pyspark.sql import functions as F

    from ocr_spark.functions.text import preview, preview_sql

    head = "<doctag>" + "".join(
        f"<text><loc_1><loc_2><loc_3><loc_4>span number {i:04d}</text>\n"
        for i in range(30)
    )
    cut = spark.range(1).select(preview(F.lit(head)).alias("p")).collect()[0].p
    cut_sql = duckdb.execute(
        f"SELECT {preview_sql('?')} AS p", [head]
    ).fetchone()[0]
    assert cut == cut_sql and len(cut) == 1000
    spans = parse_doctags(cut)
    assert 0 < len(spans) < 30  # truncated tail dropped, head parsed
    assert all(s["kind"] == "text" for s in spans)


def test_truncated_tail_dropped():
    # previews cut streams mid-tag (first_1000_chars slice,
    # /root/reference/pipeline.py:408) — unclosed tail must not crash.
    s = "<doctag><text><loc_1><loc_2><loc_3><loc_4>ok</text>\n<text><loc_382"
    spans = parse_doctags(s)
    assert len(spans) == 1 and spans[0]["text"] == "ok"


def test_empty_stream():
    assert parse_doctags("") == []
    assert parse_doctags(None) == []


# A table-bearing stream in docling's public OTSL serialization (the
# reference pins table_mode="fast" but its golden corpus contains no
# tables, so this fixture exercises the documented grammar).
OTSL_STREAM = (
    "<doctag><section_header_level_1><loc_10><loc_10><loc_100><loc_20>Report</section_header_level_1>\n"
    "<otsl><loc_29><loc_132><loc_468><loc_278>"
    "<ched>Quarter<ched>Revenue<nl>"
    "<rhed>Q1<fcel>1,200<nl>"
    "<rhed>Q2<fcel>1,450<nl>"
    "<rhed>Total<lcel><nl>"
    "<ecel><fcel>2,650<nl>"
    "</otsl>\n"
    "<text><loc_1><loc_2><loc_3><loc_4>after table</text></doctag>"
)


def test_otsl_table_cells_are_first_class_spans():
    spans = parse_doctags(OTSL_STREAM)
    kinds = [s["kind"] for s in spans]
    assert kinds == [
        "section_header_level_1",
        "table_ched", "table_ched", "table_nl",
        "table_rhed", "table_fcel", "table_nl",
        "table_rhed", "table_fcel", "table_nl",
        "table_rhed", "table_lcel", "table_nl",
        "table_ecel", "table_fcel", "table_nl",
        "text",
    ]
    texts = {i: s["text"] for i, s in enumerate(spans)}
    assert texts[1] == "Quarter" and texts[2] == "Revenue"
    assert texts[4] == "Q1" and texts[5] == "1,200"
    assert texts[14] == "2,650"
    assert [s["offset"] for s in spans] == list(range(17))
    # lossless row structure: 5 rows = 5 <nl> markers
    assert kinds.count("table_nl") == 5


def test_otsl_truncated_mid_table_keeps_complete_cells():
    # a preview cut inside an open <otsl> block must salvage the
    # complete cells (dropping only the final, possibly-cut one),
    # mirroring the plain-span unclosed-tail rule
    cut = (
        "<doctag><text><loc_1><loc_2><loc_3><loc_4>before</text>\n"
        "<otsl><loc_1><loc_2><loc_3><loc_4>"
        "<ched>Quarter<ched>Revenue<nl><rhed>Q1<fcel>1,20"
    )
    spans = parse_doctags(cut)
    assert [(s["kind"], s["text"]) for s in spans] == [
        ("text", "before"),
        ("table_ched", "Quarter"),
        ("table_ched", "Revenue"),
        ("table_nl", ""),
        ("table_rhed", "Q1"),
        # final <fcel> dropped: its text may be cut mid-way
    ]


def test_otsl_interleaves_with_pictures():
    s = (
        "<doctag><picture><loc_1><loc_2><loc_3><loc_4></picture>\n"
        "<otsl><fcel>only cell<nl></otsl>\n"
        "<picture><loc_5><loc_6><loc_7><loc_8></picture></doctag>"
    )
    spans = parse_doctags(s)
    assert [s["kind"] for s in spans] == ["picture", "table_fcel", "table_nl", "picture"]
    assert spans[0]["media_ref"] == "pic-0" and spans[3]["media_ref"] == "pic-1"
    assert spans[1]["text"] == "only cell"


def test_otsl_spans_survive_extraction_kernel(spark):
    """Table spans flow through classify/strip as their own block
    category: parity mode round-trips the exact sequence, strip mode
    keeps the table (structure is exempt from the prose density
    floor)."""
    import pandas as pd

    from ocr_spark.pipeline.extract import classify_spans, extract_main_content
    from ocr_spark.schema import DOC_SCHEMA

    spans = parse_doctags(OTSL_STREAM)
    df = spark.createDataFrame(pd.DataFrame({"doc_id": ["t1"], "spans": [spans]}), schema=DOC_SCHEMA)
    parity = classify_spans(df).orderBy("offset").collect()
    assert [(r.kind, r.text, r.media_ref, r.offset) for r in parity] == [
        (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans
    ]
    # all table cells share one block (the tag-transition machine
    # groups the table category), distinct from header and body text
    blocks = {r.kind: r.block_id for r in parity}
    table_block_ids = {r.block_id for r in parity if r.kind.startswith("table_")}
    assert len(table_block_ids) == 1
    assert blocks["section_header_level_1"] not in table_block_ids
    assert blocks["text"] not in table_block_ids
    stripped = extract_main_content(df).orderBy("offset").collect()
    assert [r.kind for r in stripped] == [s["kind"] for s in spans]  # nothing dropped


def test_otsl_roundtrip_property():
    """Random tables serialized to OTSL parse back losslessly: every
    cell token becomes exactly one span carrying its text, rows are
    delimited by table_nl, and surrounding content keeps its order."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    cell_tok = st.sampled_from(["fcel", "ched", "rhed", "srow"])
    empty_tok = st.sampled_from(["ecel", "lcel", "ucel", "xcel"])
    word = st.text(alphabet="abcdefgh XYZ0123,.", min_size=0, max_size=12).map(str.strip)
    cell = st.one_of(
        st.tuples(cell_tok, word),
        st.tuples(empty_tok, st.just("")),
    )
    table = st.lists(st.lists(cell, min_size=1, max_size=5), min_size=1, max_size=4)

    @settings(max_examples=60, deadline=None)
    @given(table=table)
    def check(table):
        body = "".join(
            "".join(f"<{tok}>{txt}" for tok, txt in row) + "<nl>" for row in table
        )
        stream = (
            "<doctag><text><loc_1><loc_2><loc_3><loc_4>before</text>\n"
            f"<otsl><loc_1><loc_2><loc_3><loc_4>{body}</otsl>\n"
            "<text><loc_1><loc_2><loc_3><loc_4>after</text></doctag>"
        )
        spans = parse_doctags(stream)
        expect = [("text", "before")]
        for row in table:
            expect += [(f"table_{tok}", txt) for tok, txt in row]
            expect.append(("table_nl", ""))
        expect.append(("text", "after"))
        assert [(s["kind"], s["text"]) for s in spans] == expect
        assert [s["offset"] for s in spans] == list(range(len(expect)))

    check()


def test_page_header_kind():
    s = "<doctag><page_header><loc_422><loc_13><loc_479><loc_24>Liên số 2</page_header></doctag>"
    spans = parse_doctags(s)
    assert spans[0]["kind"] == "page_header"
    assert spans[0]["text"] == "Liên số 2"
