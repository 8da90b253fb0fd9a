"""snapshot_edit_profile: minor/major classification of changed docs
between crawls — crafted edges, DuckDB twin parity, plan shape."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from ocr_spark.functions.dedup import (
    snapshot_edit_profile,
    snapshot_edit_profile_sql,
)
from ocr_spark.plans import plan_str

_SCHEMA = "doc_id long, text string"

_LONG = " ".join(f"word{i}" for i in range(40))


def _profile(spark, old_rows, new_rows, **kw):
    old = spark.createDataFrame(old_rows, schema=_SCHEMA)
    new = spark.createDataFrame(new_rows, schema=_SCHEMA)
    out = snapshot_edit_profile(old, new, **kw)
    return {
        r.doc_id: (r.n_common, r.jaccard_ppm, r.edit_class)
        for r in out.collect()
    }


def test_appended_sentence_is_minor_truncation_is_major(spark):
    old = [(1, _LONG), (2, _LONG), (3, _LONG)]
    new = [
        (1, _LONG + " small appended note"),  # minor
        (2, " ".join(_LONG.split()[:8])),  # major (8 of 40 words)
        (3, _LONG),  # unchanged: not in the output at all
    ]
    got = _profile(spark, old, new)
    assert set(got) == {1, 2}
    assert got[1][2] == "minor" and got[1][1] >= 500_000
    assert got[2][2] == "major" and got[2][1] < 500_000


def test_added_and_removed_ids_are_excluded(spark):
    # the profile covers CHANGED docs only (snapshot_diff reports
    # added/removed); disjoint ids produce an empty profile
    got = _profile(spark, [(1, "a b c")], [(2, "a b c")])
    assert got == {}


def test_null_to_text_change_is_major(spark):
    got = _profile(spark, [(1, None)], [(1, _LONG)])
    assert got[1] == (0, 0, "major")


def test_threshold_validation():
    with pytest.raises(ValueError):
        snapshot_edit_profile_sql("o", "n", minor_tau_ppm=2_000_000)


def test_matches_duckdb_twin(spark, tmp_path):
    """Parity on a corpus of appended/truncated/shuffled/NULL edits,
    including identical and disjoint ids."""
    old_rows, new_rows = [], []
    for i in range(40):
        words = [f"w{i}_{j}" for j in range(3 + (i % 25))]
        t = " ".join(words)
        old_rows.append((i, t))
        if i % 5 == 0:
            new_rows.append((i, t + " appended tail words here"))
        elif i % 5 == 1:
            new_rows.append((i, " ".join(words[: max(1, len(words) // 3)])))
        elif i % 5 == 2:
            new_rows.append((i, t))  # unchanged
        elif i % 5 == 3:
            new_rows.append((i, None))  # text -> NULL
        # i % 5 == 4: removed (absent from new)
    new_rows.append((1000, "brand new doc"))  # added
    po = pd.DataFrame(old_rows, columns=["doc_id", "text"])
    pn = pd.DataFrame(new_rows, columns=["doc_id", "text"])
    p_old = str(tmp_path / "old.parquet")
    p_new = str(tmp_path / "new.parquet")
    po.to_parquet(p_old)
    pn.to_parquet(p_new)

    sdf = snapshot_edit_profile(
        spark.read.parquet(p_old), spark.read.parquet(p_new)
    )
    cols = sorted(sdf.columns)
    got = sorted(tuple(r) for r in sdf.select(*cols).collect())

    con = duckdb.connect()
    con.execute(f"CREATE VIEW snap_old AS SELECT * FROM '{p_old}'")
    con.execute(f"CREATE VIEW snap_new AS SELECT * FROM '{p_new}'")
    odf = con.execute(snapshot_edit_profile_sql("snap_old", "snap_new")).fetchdf()
    want = sorted(
        tuple(v.item() if hasattr(v, "item") else v for v in r)
        for r in odf[cols].itertuples(index=False)
    )
    assert got == want
    kinds = {r[cols.index("edit_class")] for r in got}
    assert kinds == {"minor", "major"}  # non-vacuous both ways


def test_contract_perturbation_agrees_on_null_text(spark):
    """The contract's second-crawl CASE must render identically in
    both dialects for NULL text: '||' propagates NULL everywhere,
    while DuckDB's concat() SKIPS NULL arguments (the divergence this
    pins — a NULL-text doc in the append bucket must stay NULL/
    unchanged on both sides, never become the bare suffix)."""
    import __spark_entry__ as entry

    rows = [(0, None), (5, None), (6, None), (10, "a b")]
    sdf = spark.createDataFrame(rows, schema=_SCHEMA).selectExpr(
        "doc_id", entry._SNAP_EDIT_CASE.format(div="div")
    )
    got = {r.doc_id: r.text for r in sdf.collect()}

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        "(0, NULL), (5, NULL), (6, NULL), (10, 'a b')"
        ") t(doc_id, text)"
    )
    odf = con.execute(
        "SELECT doc_id, "
        + entry._SNAP_EDIT_CASE.format(div="//")
        + " FROM documents"
    ).fetchdf()
    want = {
        int(r.doc_id): (None if pd.isna(r.text) else r.text)
        for r in odf.itertuples(index=False)
    }
    assert got == want
    assert got[0] is None and got[5] is None  # NULL stays NULL


def test_plan_is_candidate_driven(spark):
    """Text/shingles move only behind the changed-id semi-joins; the
    wide join is an equi-join, never a nested loop."""
    old = spark.createDataFrame([(1, "a b c")], schema=_SCHEMA)
    new = spark.createDataFrame([(1, "a b d")], schema=_SCHEMA)
    p = plan_str(snapshot_edit_profile(old, new), "simple")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert p.count("LeftSemi") == 2, p
