"""Scrub + contamination operators: cross-engine equality, unit
semantics (staged PII counting, first-occurrence line order, Gopher
rule thresholds), and plan shape (scan-stage, no stray shuffles)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ocr_spark.functions import contamination as cnt
from ocr_spark.functions import scrub
from ocr_spark.plans import plan_str
from tests.test_functions import assert_same

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'")
    return c


def _df(spark, texts):
    pdf = pd.DataFrame({"doc_id": list(range(1, len(texts) + 1)), "text": texts})
    return spark.createDataFrame(pdf, schema="doc_id long, text string")


def _register(con, spark_df, name):
    pdf = spark_df.toPandas()
    con.register(f"{name}_pdf", pdf)
    con.execute(f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM {name}_pdf")


# ---------------------------------------------------------------------------
# PII scrub
# ---------------------------------------------------------------------------


def test_pii_scrub_known_strings(spark):
    out = scrub.pii_scrub(
        _df(
            spark,
            [
                "write a.b+c@ex-ample.co.uk now",
                "host 192.168.0.1 and 10.0.0.255.9 tail",
                "call +1 (555) 123-4567 or 555-123-4567 end",
                "no pii here",
                None,
            ],
        )
    )
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[1].clean_text == "write <EMAIL> now"
    assert (rows[1].n_emails, rows[1].n_ipv4, rows[1].n_phones) == (1, 0, 0)
    # leftmost IP claims 10.0.0.255; trailing .9 survives
    assert rows[2].clean_text == "host <IP> and <IP>.9 tail"
    assert rows[2].n_ipv4 == 2
    assert rows[3].clean_text == "call <PHONE> or <PHONE> end"
    assert rows[3].n_phones == 2
    assert rows[4].clean_text == "no pii here"
    assert rows[5].clean_text is None


def test_pii_phone_pattern_spares_numbers_and_dates(spark):
    # an over-broad phone pattern would redact dates/ints/decimals
    # corpus-wide — pin the conservative shape
    keep = [
        "released 2026-08-17",
        "population 12345678",
        "pi = 3.14159265",
        "v1.2.3 build 20260817",
        "ref 08-17",
    ]
    out = scrub.pii_scrub(_df(spark, keep)).collect()
    for r in sorted(out, key=lambda r: r.doc_id):
        assert r.clean_text == keep[r.doc_id - 1] and r.n_phones == 0, r
    hits = scrub.pii_scrub(
        _df(spark, ["+49 30 901820", "(555) 123 4567", "+12345678901"])
    ).collect()
    assert all(r.n_phones >= 1 and "<PHONE>" in r.clean_text for r in hits)


def test_pii_counting_is_staged(spark):
    # the email's digit run must NOT also count as a phone, and an IP
    # must be claimed before the looser phone pattern can eat it
    out = scrub.pii_scrub(_df(spark, ["a12345678@x.co and 10.20.30.40"])).collect()[0]
    assert out.clean_text == "<EMAIL> and <IP>"
    assert (out.n_emails, out.n_ipv4, out.n_phones) == (1, 1, 0)


def test_pii_scrub_cross_engine(spark, docs, con):
    # corpus text carries no PII — inject deterministically, same
    # expression both engines (the contract-query shape)
    inj = " contact: user7@example.com or 10.0.0.1 or +1 (555) 123-4567"
    sdf = scrub.pii_scrub(
        docs.withColumn(
            "text",
            F.when(
                F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(inj))
            ).otherwise(F.col("text")),
        )
    )
    sql = scrub.pii_scrub_sql(
        f"(SELECT * REPLACE (CASE WHEN doc_id % 7 = 0 THEN text || '{inj}'"
        " ELSE text END AS text) FROM documents)"
    )
    assert_same(sdf, con, sql)


# ---------------------------------------------------------------------------
# line dedup
# ---------------------------------------------------------------------------


def test_line_dedup_keeps_first_occurrence_order(spark):
    out = scrub.line_dedup(_df(spark, ["b\na\nb\nc\na", "", "solo"])).collect()
    rows = {r.doc_id: r for r in out}
    assert rows[1].clean_text == "b\na\nc"
    assert (rows[1].n_lines, rows[1].n_unique_lines) == (5, 3)
    assert rows[1].dup_line_ratio == pytest.approx(0.4)
    assert rows[2].clean_text == "" and rows[2].n_lines == 1
    assert rows[3].clean_text == "solo" and rows[3].dup_line_ratio == 0.0


def test_line_dedup_cross_engine(spark, docs, con):
    # corpus is single-line — re-shape words onto lines (identical
    # translate in both engines) so duplicates actually occur
    sdf = scrub.line_dedup(
        docs.withColumn("text", F.translate(F.col("text"), " ", "\n"))
    )
    sql = scrub.line_dedup_sql(
        "(SELECT * REPLACE (translate(text, ' ', chr(10)) AS text) FROM documents)"
    )
    assert_same(sdf, con, sql)
    # duplicates genuinely exist (docs repeat vocabulary words)
    assert sdf.where(F.col("dup_line_ratio") > 0).count() > 0


# ---------------------------------------------------------------------------
# Gopher rules
# ---------------------------------------------------------------------------


def test_gopher_rules_thresholds(spark):
    good = "the quick brown fox and that other fox have fun with all of " * 6
    out = scrub.gopher_rules(
        _df(
            spark,
            [
                good,  # passes everything
                "short text the of and that",  # too few words
                "- a\n- b\n- c",  # bullet-dominated + too few words
                None,
            ],
        )
    ).collect()
    rows = {r.doc_id: r for r in out}
    assert rows[1].keep is True and rows[1].n_stop_hits >= 2
    assert rows[2].keep is False and rows[2].n_words < scrub.MIN_WORDS
    assert rows[3].keep is False and rows[3].bullet_ratio == 1.0
    assert rows[4].keep is False and rows[4].n_words is None


def test_gopher_ascii_lowercase_only(spark):
    # 'The' counts via ASCII translate; 'THE' too; Turkish dotted
    # capital İ must NOT be case-folded (the lower() dialect trap)
    out = scrub.gopher_rules(_df(spark, ["The THE İthe be to of"])).collect()[0]
    # {the(The/THE), be, to, of} hit; 'İthe' stays 'İthe' (not folded)
    assert out.n_stop_hits == 4


def test_gopher_rules_cross_engine(spark, docs, con):
    assert_same(scrub.gopher_rules(docs), con, scrub.gopher_rules_sql())


def test_scrub_operators_are_shuffle_free(docs):
    for op in (scrub.pii_scrub, scrub.line_dedup, scrub.gopher_rules):
        plan = plan_str(op(docs), mode="simple")
        assert "Exchange" not in plan, (op.__name__, plan)


# ---------------------------------------------------------------------------
# contamination
# ---------------------------------------------------------------------------


def test_contamination_flags_overlap(spark):
    docs = _df(
        spark,
        [
            "alpha beta gamma delta epsilon zeta",  # = benchmark doc
            "alpha beta gamma delta other words here",  # partial overlap
            "completely different text with no shared grams",
        ],
    )
    bench = _df(spark, ["alpha beta gamma delta epsilon zeta"])
    out = {
        r.doc_id: (r.n_overlap, r.contaminated)
        for r in cnt.contamination(docs, bench, w=3, min_overlap=2).collect()
    }
    assert out[1] == (4, True)  # all 4 distinct 3-grams shared
    assert out[2] == (2, True)  # 'alpha beta gamma','beta gamma delta'
    assert 3 not in out  # zero-overlap docs are not emitted


def test_contamination_short_benchmark_items(spark):
    # a benchmark item SHORTER than w words can never match a w-gram —
    # it must be caught by exact substring containment instead
    docs = _df(
        spark,
        [
            "prefix words then the short eval question verbatim and a tail",
            "nothing relevant in this one at all honestly",
        ],
    )
    bench = _df(spark, ["the short eval question verbatim"])  # 5 words < w=13
    out = {r.doc_id: r for r in cnt.contamination(docs, bench, w=13).collect()}
    assert out[1].n_contained == 1 and out[1].contaminated is True
    assert out[1].n_overlap == 0
    assert 2 not in out
    # opting out restores pure w-gram semantics: the leak is invisible
    assert (
        cnt.contamination(docs, bench, w=13, short_item_containment=False).count()
        == 0
    )


def test_contamination_cross_engine(spark, docs, con):
    sdf = cnt.contamination(
        docs, docs.where(F.col("doc_id") % 29 == 0), w=8, min_overlap=2
    )
    sql = cnt.contamination_sql(
        "documents", "(SELECT * FROM documents WHERE doc_id % 29 = 0)", w=8, min_overlap=2
    )
    assert_same(sdf, con, sql)
    assert sdf.count() > 0  # corpus has dup docs -> non-trivial result


def test_contamination_plan_broadcasts_benchmark(spark, docs):
    bench = docs.where(F.col("doc_id") % 29 == 0)
    # pure w-gram mode: broadcast shingle join, no nested loop, and
    # only two shuffles (benchmark-side distinct + final per-doc
    # count) — the corpus-side scan itself never shuffles
    plan = plan_str(
        cnt.contamination(docs, bench, short_item_containment=False), mode="simple"
    )
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan and "NestedLoop" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 2, plan
    # with the short-item leg: the ONLY nested loop is the containment
    # check against the tiny broadcast short-item list, and the final
    # full-outer merge reuses both legs' count partitioning (no extra
    # Exchange: 2 above + shorts distinct + containment count = 4)
    plan = plan_str(cnt.contamination(docs, bench), mode="simple")
    assert plan.count("BroadcastNestedLoopJoin") == 1, plan
    assert "BroadcastHashJoin" in plan, plan
    assert plan.count("Exchange hashpartitioning") == 4, plan
    assert "partial_count" in plan_str(
        cnt.contamination(docs, docs.limit(5)), mode="formatted"
    )


# ---------------------------------------------------------------------------
# repetition signals
# ---------------------------------------------------------------------------


def test_repetition_signals_semantics(spark):
    out = scrub.repetition_signals(
        _df(
            spark,
            [
                "a b a b a b",      # 2-grams: ab ba ab ba ab -> 2/5 distinct
                "x y z",            # no repeats
                "w w w w",          # all 2-grams identical
                "one",              # shorter than every n
                None,
            ],
        )
    ).collect()
    rows = {r.doc_id: r for r in out}
    assert rows[1].dup_2gram_frac == pytest.approx(1 - 2 / 5)
    assert rows[2].dup_2gram_frac == 0.0 and rows[2].dup_3gram_frac == 0.0
    assert rows[3].dup_2gram_frac == pytest.approx(1 - 1 / 3)
    assert rows[3].dup_4gram_frac == 0.0  # single 4-gram, no repeat
    assert rows[4].dup_2gram_frac is None
    assert rows[5].dup_2gram_frac is None


def test_repetition_signals_cross_engine(spark, docs, con):
    assert_same(scrub.repetition_signals(docs), con, scrub.repetition_signals_sql())
    plan = plan_str(scrub.repetition_signals(docs), mode="simple")
    assert "Exchange" not in plan, plan


# ---------------------------------------------------------------------------
# repeated_passages
# ---------------------------------------------------------------------------


def test_repeated_passages_finds_shared_boilerplate(spark):
    from ocr_spark.functions.scrub import repeated_passages

    banner = (
        "ACCEPT ALL COOKIES TO CONTINUE READING THIS SITE! "
        "BY CLICKING YOU AGREE TO OUR TERMS OF SERVICE."
    )  # 96 chars -> dozens of candidate anchors inside the banner
    rows = [
        (1, banner + " unique tail one aaaaaaaaaaaaaaaaaaaaaaaaa"),
        (2, banner + " other tail entirely zzzzzzzzzzzzzzzzzzzzz"),
        (3, "no shared content here at all qqqqqqqqqqqqqqqqqqq"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = repeated_passages(df, w_chars=40, gap=10).collect()
    assert len(out) > 0  # the banner windows repeat across docs 1+2
    assert all(r["n_docs"] == 2 for r in out)


def test_repeated_passages_detects_misaligned_copies(spark):
    from ocr_spark.functions.scrub import repeated_passages

    # THE case fixed-stride windowing misses: the shared passage
    # starts at different offsets in each doc (prefixes of different
    # lengths, none congruent mod gap). Content-defined anchors are a
    # property of the passage bytes, so detection must survive any
    # alignment shift.
    banner = (
        "ACCEPT ALL COOKIES TO CONTINUE READING THIS SITE! "
        "BY CLICKING YOU AGREE TO OUR TERMS OF SERVICE."
    )
    rows = [
        (1, banner + " tail aaaaaaaaaaaa"),
        (2, "xyz " + banner + " tail bbbbbbbbbbbb"),  # shifted by 4
        (3, "intro of length seventeen " + banner),  # shifted by 26
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = repeated_passages(df, w_chars=40, gap=10).collect()
    assert len(out) > 0
    assert any(r["n_docs"] == 3 for r in out)  # seen in ALL three docs


def test_repeated_passages_within_doc_repeat_not_counted(spark):
    from ocr_spark.functions.scrub import repeated_passages

    # one doc repeating its own 40-char block many times must NOT
    # reach min_docs=2: per-doc distinct collapses it to one vote
    block = "THIS EXACT BLOCK OF FORTY CHARACTERS!!!!"
    df = spark.createDataFrame(
        [(1, block * 10)], "doc_id long, text string"
    )
    assert repeated_passages(df, w_chars=40, gap=10).count() == 0


def test_repeated_passages_short_docs_yield_no_windows(spark):
    from ocr_spark.functions.scrub import repeated_passages

    df = spark.createDataFrame(
        [(1, "short"), (2, "short")], "doc_id long, text string"
    )
    assert repeated_passages(df, w_chars=40).count() == 0


def test_repeated_passages_matches_duckdb_twin(spark):
    import duckdb

    from ocr_spark.functions.scrub import (
        repeated_passages,
        repeated_passages_sql,
    )

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    got = sorted(map(tuple, repeated_passages(docs).collect()))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    want = sorted(map(tuple, con.execute(repeated_passages_sql()).fetchall()))
    assert got == want and len(got) > 0


BOILER = "SUBSCRIBE TO OUR NEWSLETTER TODAY AND SAVE BIG! "


def _rrp_corpus(spark):
    rows = [
        (1, "alpha doc one body text here. " + BOILER + "unique tail one."),
        (2, "beta doc two different body. " + BOILER + "tail two longer."),
        (3, BOILER + "doc three starts with the banner."),
        (4, "doc four has no banner at all, totally unique content."),
        (5, None),
        (6, "short"),
        (7, "doc seven has it twice: " + BOILER + " mid " + BOILER + " end."),
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    return pdf, spark.createDataFrame(pdf, schema="doc_id long, text string")


RRP_KW = dict(w_chars=16, gap=3, min_docs=2, max_chars=None)


def test_remove_repeated_passages_semantics(spark):
    """The canonical (smallest doc_id, position) occurrence survives;
    every other occurrence — including BOTH copies in a later doc —
    is excised; NULL-text / short / banner-free docs pass through;
    removed_chars is the realized length delta."""
    pdf, df = _rrp_corpus(spark)
    out = {
        r["doc_id"]: r
        for r in scrub.remove_repeated_passages(df, **RRP_KW).collect()
    }
    assert len(out) == len(pdf)  # every doc returned exactly once
    # doc 1 is canonical: untouched
    assert out[1]["text"] == pdf.loc[0, "text"] and out[1]["n_cuts"] == 0
    # docs 2, 3, 7 lose the banner body (content-defined anchors leave
    # < w+gap chars of boundary residue, never the full banner)
    for d in (2, 3, 7):
        assert BOILER not in out[d]["text"]
        assert out[d]["n_cuts"] > 0
        assert out[d]["removed_chars"] == len(pdf.loc[d - 1, "text"]) - len(
            out[d]["text"]
        )
    # doc 7 had two occurrences: strictly more cutting than doc 2
    assert out[7]["removed_chars"] > out[2]["removed_chars"]
    # pass-throughs
    assert out[4]["text"] == pdf.loc[3, "text"] and out[4]["n_cuts"] == 0
    assert out[5]["text"] is None and out[5]["removed_chars"] == 0
    assert out[6]["text"] == "short" and out[6]["n_cuts"] == 0


def test_remove_repeated_passages_cross_engine_tiny(spark):
    pdf, df = _rrp_corpus(spark)
    c = duckdb.connect()
    c.register("rrp_pdf", pdf)
    c.execute("CREATE VIEW rrp AS SELECT * FROM rrp_pdf")
    assert_same(
        scrub.remove_repeated_passages(df, **RRP_KW),
        c,
        scrub.remove_repeated_passages_sql("rrp", **RRP_KW),
    )


def test_remove_repeated_passages_cross_engine_corpus(docs, con):
    assert_same(
        scrub.remove_repeated_passages(docs),
        con,
        scrub.remove_repeated_passages_sql(),
    )


def test_remove_repeated_passages_reduces_repeats(docs, spark):
    """The cut pass actually de-boilerplates: re-mining the cleaned
    corpus finds strictly fewer repeated windows (sf0.001 has organic
    repeats — the existing twin test pins that), and every cut is
    reflected in the length delta."""
    before = scrub.repeated_passages(docs).count()
    cleaned = scrub.remove_repeated_passages(docs)
    stats = cleaned.agg(
        F.sum("n_cuts").alias("cuts"), F.sum("removed_chars").alias("rm")
    ).collect()[0]
    assert stats["cuts"] > 0 and stats["rm"] > 0
    after = scrub.repeated_passages(
        cleaned.select("doc_id", "text")
    ).count()
    assert after < before


def test_remove_repeated_passages_plan_no_nested_loop(docs):
    p = plan_str(scrub.remove_repeated_passages(docs))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoop" not in p


def test_remove_repeated_passages_max_occ_cap(spark):
    """max_occ excludes hyper-frequent windows from cutting (the
    skew escape hatch) — identical rule in the twin."""
    import pandas as pd

    hot = "HOT " * 20  # shared by 5 docs -> many occurrences
    rows = [(i, f"doc {i:02d} body. " + hot + f"tail {i:02d}.")
            for i in range(1, 6)]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    df = spark.createDataFrame(pdf, schema="doc_id long, text string")
    kw = dict(w_chars=16, gap=3, min_docs=2, max_chars=None)
    uncapped = scrub.remove_repeated_passages(df, **kw)
    assert uncapped.agg(F.sum("n_cuts")).collect()[0][0] > 0
    capped = scrub.remove_repeated_passages(df, max_occ=1, **kw)
    rowsc = capped.collect()
    assert all(r["n_cuts"] == 0 for r in rowsc)  # everything excluded
    assert sorted(r["text"] for r in rowsc) == sorted(pdf["text"])
    c = duckdb.connect()
    c.register("rrp_cap_pdf", pdf)
    c.execute("CREATE VIEW rrp_cap AS SELECT * FROM rrp_cap_pdf")
    assert_same(
        scrub.remove_repeated_passages(df, max_occ=25, **kw),
        c,
        scrub.remove_repeated_passages_sql("rrp_cap", max_occ=25, **kw),
    )


# ---------------------------------------------------------------------------
# Luhn-validated card redaction
# ---------------------------------------------------------------------------


def test_pii_card_luhn_validation(spark):
    """Regex proposes, Luhn disposes: valid PANs are redacted in any
    separator style; checksum-failing digit runs and long integers
    survive untouched."""
    texts = [
        "pay 4111 1111 1111 1111 now",       # valid (spaced)
        "card 5500-0000-0000-0004 ok",       # valid (dashed)
        "bare 4111111111111111 end",         # valid (bare)
        "ref 1234 5678 9012 3456 code",      # fails Luhn -> kept
        "int 1234567890124 stays",           # fails Luhn -> kept
        "order id 79927398713",              # valid Luhn but 11 digits: too short
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in scrub.pii_scrub(df).collect()}
    for i in (0, 1, 2):
        assert rows[i].n_cards == 1 and "<CARD>" in rows[i].clean_text, rows[i]
    for i in (3, 4, 5):
        assert rows[i].n_cards == 0 and "<CARD>" not in rows[i].clean_text, rows[i]
    assert rows[3].clean_text == texts[3]  # byte-identical passthrough


def test_pii_card_before_phone_staging(spark):
    """A dashed card must become ONE <CARD>, never partial <PHONE>
    matches; a real phone in the same doc is still caught."""
    df = spark.createDataFrame(
        [(1, "call 555-123-4567 or card 5500-0000-0000-0004")],
        "doc_id long, text string",
    )
    r = scrub.pii_scrub(df).collect()[0]
    assert r.clean_text == "call <PHONE> or card <CARD>"
    assert (r.n_cards, r.n_phones) == (1, 1)


def test_pii_card_cross_engine(spark):
    import duckdb
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "4111 1111 1111 1111 and 1234 5678 9012 3456",
                None,
                "two cards 4111111111111111 4111111111111111",
            ],
        }
    )
    df = spark.createDataFrame(pdf)
    con = duckdb.connect()
    con.register("t_card", pdf)
    got = sorted(map(tuple, scrub.pii_scrub(df).collect()))
    want = sorted(map(tuple, con.execute(scrub.pii_scrub_sql("t_card")).fetchall()))
    assert got == want
    # duplicate card string: counted per occurrence, both redacted
    by_id = {r[0]: r for r in got}
    assert by_id[3][4] == 2 and "<CARD> <CARD>" in by_id[3][1]


# ---------------------------------------------------------------------------
# duplication_profile
# ---------------------------------------------------------------------------


def test_duplication_profile_semantics_and_twin(spark):
    import duckdb
    import pandas as pd

    boiler = "SUBSCRIBE TO OUR NEWSLETTER AND ACCEPT ALL COOKIES NOW " * 4
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                boiler + "unique article one about spark executors",
                boiler + "different piece on duckdb vectorized execution",
                "fully original text with no repeated passages at all here",
                "x",  # too short for any window
            ],
        }
    )
    df = spark.createDataFrame(pdf)
    got = {r.doc_id: r for r in scrub.duplication_profile(df).collect()}
    # boilerplate carriers: substantial shared fraction; same shared
    # window set on both (content-defined anchors align)
    assert got[1].n_shared == got[2].n_shared > 0
    assert got[1].dup_ppm > 300_000 and got[2].dup_ppm > 300_000
    assert got[1].dup_ppm == (got[1].n_shared * 1_000_000) // got[1].n_windows
    # original doc: windows but nothing shared
    assert got[3].n_windows > 0 and (got[3].n_shared, got[3].dup_ppm) == (0, 0)
    # short doc: no windows, -1 sentinel (pandas-safe int), emitted
    assert (got[4].n_windows, got[4].dup_ppm) == (0, -1)
    con = duckdb.connect()
    con.register("t_dupprof", pdf)
    want = sorted(
        map(
            tuple,
            con.execute(scrub.duplication_profile_sql("t_dupprof")).fetchall(),
        )
    )
    assert sorted(map(tuple, scrub.duplication_profile(df).collect())) == want


def test_duplication_profile_consistent_with_repeated_passages(spark):
    """A doc's n_shared counts exactly the windows repeated_passages
    discovers (ONE window skeleton)."""
    import pandas as pd

    boiler = "THE SAME FOOTER TEXT REPEATS IN EVERY SINGLE DOCUMENT " * 3
    pdf = pd.DataFrame(
        {"doc_id": [1, 2], "text": [boiler + " tail a", boiler + " tail b"]}
    )
    df = spark.createDataFrame(pdf)
    n_repeated = scrub.repeated_passages(df).count()
    got = {r.doc_id: r for r in scrub.duplication_profile(df).collect()}
    assert got[1].n_shared == got[2].n_shared == n_repeated > 0


def test_pii_card_redaction_is_position_aware(spark):
    """A Luhn-failing digit run that merely CONTAINS a valid card as a
    substring must pass through byte-identical — a position-blind
    literal replace would mangle it (review-pass repro)."""
    df = spark.createDataFrame(
        [
            (1, "card 4111 1111 1111 1111 ref 94111 1111 1111 11115 end"),
            (2, "a 4111111111111111 b 44111111111111111 c"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in scrub.pii_scrub(df).collect()}
    assert rows[1].clean_text == "card <CARD> ref 94111 1111 1111 11115 end"
    assert rows[2].clean_text == "a <CARD> b 44111111111111111 c"
    assert rows[1].n_cards == rows[2].n_cards == 1


def test_duplication_profile_plan_single_explode(spark):
    """The per-char window enumeration is the dominant cost; the plan
    must contain exactly ONE Generate (explode) — an aggregate-then-
    join-back shape would re-execute it (review-pass regression
    pin)."""
    from ocr_spark.plans import plan_str as _plan

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    p = _plan(scrub.duplication_profile(docs), "simple")
    assert p.count("Generate") == 1


_NESTED_SCHEMA = (
    "doc_id string, spans array<struct<"
    "kind:string,text:string,media_ref:string,offset:int>>"
)


def test_scrub_spans_semantics(spark):
    """Per-span staged redaction: media spans byte-identical (even
    with PII-looking refs), Luhn gate holds per span, structure and
    NULLs untouched, schema preserved."""
    rows = [
        ("a", [("text", "mail bob@x.co or 1.2.3.4 ok", "", 0),
               ("picture", "", "cdn/email@fake.com.png", 1),
               ("text", "card 4111 1111 1111 1111 ref "
                        "1234 5678 9012 3456", "", 2),
               ("text", "call +1 (555) 123-4567 now", "", 3),
               ("text", None, "", 4)]),
        ("b", None),
        ("c", []),
    ]
    df = spark.createDataFrame(rows, _NESTED_SCHEMA)
    out = scrub.scrub_spans(df)
    assert out.schema.simpleString() == df.schema.simpleString()
    got = {r.doc_id: r.spans for r in out.collect()}
    texts = [s.text for s in got["a"]]
    assert texts[0] == "mail <EMAIL> or <IP> ok"
    assert got["a"][1].media_ref == "cdn/email@fake.com.png"  # untouched
    assert texts[2] == "card <CARD> ref 1234 5678 9012 3456"  # Luhn gate
    assert texts[3] == "call <PHONE> now"
    assert texts[4] is None
    assert [s.offset for s in got["a"]] == [0, 1, 2, 3, 4]
    assert got["b"] is None and got["c"] == []


def test_scrub_spans_matches_flat_pii_scrub(spark):
    """One definition of the stage chain: scrubbing a single-span doc
    through scrub_spans equals pii_scrub's clean_text on the same
    string (the shared-stage guarantee)."""
    texts = [
        "a@b.co and 10.0.0.1 and 4111 1111 1111 1111 and "
        "+1 (555) 123-4567",
        "ref 1234 5678 9012 3456 keeps, card 5500 0000 0000 0004 goes",
        "plain prose with no pii at all",
    ]
    flat = _df(spark, texts)
    nested = spark.createDataFrame(
        [(str(i + 1), [("text", t, "", 0)]) for i, t in enumerate(texts)],
        _NESTED_SCHEMA,
    )
    want = {str(r.doc_id): r.clean_text
            for r in scrub.pii_scrub(flat).collect()}
    got = {r.doc_id: r.spans[0].text
           for r in scrub.scrub_spans(nested).collect()}
    assert got == want


def test_scrub_spans_plan_zero_shuffle(spark):
    nested = spark.createDataFrame(
        [("a", [("text", "x", "", 0)])], _NESTED_SCHEMA
    )
    p = plan_str(scrub.scrub_spans(nested), "simple")
    assert "Exchange" not in p and "Generate" not in p, p
