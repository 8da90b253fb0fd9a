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


def test_truncated_tail_dropped():
    # previews cut streams mid-tag (first_1000_chars slice,
    # /root/reference/pipeline.py:408) — unclosed tail must not crash.
    s = "<doctag><text><loc_1><loc_2><loc_3><loc_4>ok</text>\n<text><loc_382"
    spans = parse_doctags(s)
    assert len(spans) == 1 and spans[0]["text"] == "ok"


def test_empty_stream():
    assert parse_doctags("") == []
    assert parse_doctags(None) == []


def test_page_header_kind():
    s = "<doctag><page_header><loc_422><loc_13><loc_479><loc_24>Liên số 2</page_header></doctag>"
    spans = parse_doctags(s)
    assert spans[0]["kind"] == "page_header"
    assert spans[0]["text"] == "Liên số 2"
