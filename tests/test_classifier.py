"""Hashed linear quality classifier: featurizer parity with the
trainer, integer-exact margins, plan shape, DuckDB twin."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from ocr_spark.functions.classifier import (
    quality_classifier,
    quality_classifier_sql,
)
from ocr_spark.functions.classifier_weights import (
    BIAS_SCALED,
    N_BUCKETS,
    WEIGHTS_SCALED,
)
from ocr_spark.plans import plan_str as _plan
from scripts.train_quality_classifier import featurize

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_featurizer_matches_trainer(spark):
    """The pure-Python featurizer the trainer fits on must equal the
    Spark expression the scorer runs — else the baked weights are for
    a different feature space."""
    rows = [
        (1, "the cat sat on the mat"),
        (2, "a b c\td  e"),  # exotic whitespace
        (3, ""),
        (4, None),
        (5, "one"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from ocr_spark.functions.dsir import _feats_expr

    got = {
        r.doc_id: sorted(r.fs)
        for r in df.selectExpr(
            "doc_id", f"{_feats_expr(N_BUCKETS)} AS fs"
        ).collect()
    }
    for doc_id, text in rows:
        assert got[doc_id] == sorted(featurize(text)), doc_id


def test_margin_matches_pure_python(spark):
    """Spark margin == independent Python dot product, including the
    n_feats·bias term and empty docs (margin 0, keep false)."""
    rows = [
        (1, "the fast key order sort table scan merge"),
        (2, "zz yy xx ww"),
        (3, ""),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in quality_classifier(df).collect()}
    for doc_id, text in rows:
        fs = featurize(text)
        margin = sum(WEIGHTS_SCALED[f] for f in fs) + len(fs) * BIAS_SCALED
        r = got[doc_id]
        assert (r.n_feats, r.margin_scaled) == (len(fs), margin)
        assert r.keep == (margin > 0)
    assert got[3].margin_scaled == 0 and not got[3].keep


def test_classifier_separates_training_corpus(docs):
    """The baked demo weights memorize the 500-doc contract corpus
    (label lang == 'en'); anything under 0.95 here means weights and
    featurizer have drifted apart."""
    out = quality_classifier(docs).join(
        docs.select("doc_id", (F.col("lang") == "en").alias("y")), "doc_id"
    )
    acc = out.where(F.col("keep") == F.col("y")).count() / out.count()
    assert acc > 0.95


def test_classifier_explicit_model_and_validation(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    out = quality_classifier(
        df, weights_scaled=[7] * 16, bias_scaled=-3, n_buckets=16
    ).collect()[0]
    assert (out.n_feats, out.margin_scaled, out.keep) == (1, 4, True)
    with pytest.raises(ValueError):
        quality_classifier(df, weights_scaled=[1] * 8, n_buckets=16)


def test_classifier_matches_duckdb_twin(docs):
    got = sorted(map(tuple, quality_classifier(docs).collect()))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    oracle = sorted(
        map(tuple, con.execute(quality_classifier_sql("documents")).fetchall())
    )
    assert got == oracle and len(got) == 500


def test_classifier_plan_broadcast_weights(docs):
    """Weights must join as a broadcast dim (bounded by the hashing
    trick, corpus-size-independent); the only shuffle is the doc_id
    partial aggregate."""
    plan = _plan(quality_classifier(docs), "simple")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "partial_count" in plan or "partial" in plan
    assert "CartesianProduct" not in plan


def test_classifier_partition_invariant(docs):
    a = sorted(map(tuple, quality_classifier(docs).collect()))
    b = sorted(map(tuple, quality_classifier(docs.repartition(11)).collect()))
    assert a == b


def test_classifier_all_zero_model_twin_parses(spark):
    """An all-zero model sparsifies to an empty weight dim — the twin
    must still be valid SQL and agree with the engine (review fix)."""
    df = spark.createDataFrame([(1, "a b c"), (2, "")], "doc_id long, text string")
    got = sorted(
        map(
            tuple,
            quality_classifier(
                df, weights_scaled=[0] * 8, bias_scaled=5, n_buckets=8
            ).collect(),
        )
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
    con.execute("INSERT INTO t VALUES (1, 'a b c'), (2, '')")
    oracle = sorted(
        map(
            tuple,
            con.execute(
                quality_classifier_sql(
                    "t", weights_scaled=[0] * 8, bias_scaled=5, n_buckets=8
                )
            ).fetchall(),
        )
    )
    assert got == oracle
    assert got[0][2] == 2 * 5  # margin = n_feats * bias only
