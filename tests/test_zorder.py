"""Z-order clustering: Morton-code correctness vs a pure-python
reference, DuckDB-twin parity, and the actual layout effect — a
selective 1-D filter over a z-ordered table touches a small subset of
files while a hash-scattered layout touches all of them."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from ocr_spark.functions.zorder import (
    morton2_py,
    zorder_codes,
    zorder_codes_sql,
    zorder_write,
)
from ocr_spark.plans import plan_str

SF_DIR = "/root/testdata/sf0.001"


def test_morton_matches_python_reference(spark):
    pts = [(x, y) for x in (0, 1, 2, 3, 255, 65535) for y in (0, 1, 3, 7, 1024, 65535)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = {
        (r.x, r.y): r.zvalue for r in zorder_codes(df, "x", "y").collect()
    }
    for x, y in pts:
        assert got[(x, y)] == morton2_py(x, y), (x, y)
    # interleave basics: (1,0) -> 1, (0,1) -> 2, (3,3) -> 15
    assert got[(1, 0)] == 1 and got[(0, 1)] == 2 and got[(3, 3)] == 15


def test_matches_oracle(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "n_chars"
    )
    got = sorted(map(tuple, zorder_codes(docs, "doc_id", "n_chars").collect()))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    want = sorted(
        map(
            tuple,
            con.execute(
                zorder_codes_sql(
                    "SELECT doc_id, n_chars FROM documents", "doc_id", "n_chars"
                )
            ).fetchall(),
        )
    )
    assert got == want
    plan = plan_str(zorder_codes(docs, "doc_id", "n_chars"), "simple")
    assert "Exchange" not in plan and "Join" not in plan, plan
    with pytest.raises(ValueError):
        zorder_codes(zorder_codes(docs, "doc_id", "n_chars"), "doc_id", "n_chars")


def test_zorder_layout_prunes_files(spark, tmp_path):
    """The point of the exercise: after zorder_write, a selective
    filter on ONE dimension finds its rows in a small subset of the
    files; the same filter over a hash-scattered layout touches every
    file."""
    n = 20000
    base = spark.range(n).select(
        (F.col("id") % 140).alias("x"),
        ((F.col("id") * 7919) % 140).alias("y"),
        F.col("id").alias("payload"),
    )
    zdir, rdir = str(tmp_path / "z"), str(tmp_path / "r")
    zorder_write(base, zdir, "x", "y", n_files=16)
    base.repartition(16).write.parquet(rdir)

    def files_touched(path):
        return (
            spark.read.parquet(path)
            .where(F.col("x") < 10)
            .select(F.input_file_name().alias("f"))
            .distinct()
            .count()
        )

    n_z, n_r = files_touched(zdir), files_touched(rdir)
    assert n_r == 16  # scattered: every file holds matching rows
    assert n_z <= 8, n_z  # clustered: the matches live in few files
    # same rows either way
    a = spark.read.parquet(zdir).agg(F.sum("payload")).collect()[0][0]
    b = base.agg(F.sum("payload")).collect()[0][0]
    assert a == b
