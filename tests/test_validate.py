"""F1-F9 + A1 validation: Spark SQL exprs vs DuckDB oracle vs
hand-derived reference expectations (/root/reference/pipeline.py:196-351).
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from ocr_spark.pipeline.validate import (
    NA,
    FieldSpec,
    validate_fields,
    validate_sql,
)

SCHEMA = {
    "name": FieldSpec(type="string", required=True),
    "amount": FieldSpec(type="number", required=True),
    "when_at": FieldSpec(type="date", format="iso-date", required=True),
    "code": FieldSpec(type="string", regex=r"^\d{4}$"),
    "status": FieldSpec(type="string", enum=["ok", "bad"]),
    "note": FieldSpec(type="string", nullable=True, required=False),
}

ROWS = [
    # id, name, amount, when_at, code, status, note
    (0, "Alice", "1.234,56", "2023-01-05", "1234", "ok", "x"),
    (1, None, "1,234.56", "05/01/2023", "12", "meh", None),
    (2, "", "20,50", "31-12-2023", None, "N/A", ""),
    (3, "N/A", "1,234", "2023/12/31", "9999", "bad", "N/A"),
    (4, "Bob", "1,234,56", "born 05/01/2023 ok", "abcd", "ok", "n"),
    (5, "Cara", "$ 1.000", "13/2023", "0000", None, None),
    (6, "Dan", "abc", "99/99/9999", "55555", "ok", "z"),
    (7, "Eve", "-5", "2-3-2023", "4321", "bad", "w"),
    (8, "Fay", "12.5%", "2023-1-05", "777", "ok", "v"),
    (9, "Gil", "", "", "", "", None),
    # >= 1e7: Spark's double->string cast would go scientific ('1.0E7')
    # while the reference's str(float) does not — pins the fixed-point
    # formatter in BOTH engines.
    (10, "Hal", "12.345.678,99", "2023-06-01", "1111", "ok", None),
    (11, "Ian", "10000000", "2023-06-02", "2222", "ok", None),
    # < 1e-3: Java Double.toString would emit '5.0E-4'
    (12, "Joy", "0.0005", "2023-06-03", "3333", "ok", None),
]
COLS = ["row_id", "name", "amount", "when_at", "code", "status", "note"]


@pytest.fixture(scope="module")
def pdf() -> pd.DataFrame:
    df = pd.DataFrame(ROWS, columns=COLS)
    for c in COLS[1:]:
        df[c] = df[c].astype("object")
    return df


@pytest.fixture(scope="module")
def spark_out(spark, pdf):
    df = spark.createDataFrame(pdf)
    out = validate_fields(df, SCHEMA, keep=["row_id"])
    return out.orderBy("row_id").toPandas()


def test_spark_matches_duckdb_oracle(spark_out, pdf):
    con = duckdb.connect()
    con.register("t", pdf)
    sql = validate_sql(
        SCHEMA, "t", raw={n: n for n in SCHEMA}, keep=["row_id"]
    )
    oracle = con.execute(sql + " ORDER BY row_id").df()
    spark_flat = spark_out.drop(columns=["warnings"])
    assert list(oracle.columns) == list(spark_flat.columns)
    for c in oracle.columns:
        a, b = spark_flat[c].tolist(), oracle[c].tolist()
        for i, (x, y) in enumerate(zip(a, b)):
            if isinstance(x, float) and isinstance(y, float):
                if pd.isna(x) and pd.isna(y):
                    continue
                assert x == pytest.approx(y, abs=1e-12), (c, i)
            else:
                xx = None if (x is None or (isinstance(x, float) and pd.isna(x))) else x
                yy = None if (y is None or (isinstance(y, float) and pd.isna(y))) else y
                assert xx == yy, (c, i, x, y)


def test_cross_engine_fuzz_number_and_date(spark):
    """Seeded fuzz: 400 adversarial number/date strings through the
    full validator in BOTH engines, compared repr-exact — the same
    comparison the driver gate uses. Catches locale-rule, regex-
    dialect, and float-formatting divergences the hand tables miss."""
    import random

    import duckdb

    rng = random.Random(20260817)
    num_chars = "0123456789.,-$ €%abc٠"
    date_chars = "0123456789-/ ."
    rows = []
    for i in range(400):
        n = "".join(rng.choice(num_chars) for _ in range(rng.randint(0, 14)))
        d = "".join(rng.choice(date_chars) for _ in range(rng.randint(0, 14)))
        if i % 7 == 0:
            d = f"{rng.randint(1000,9999)}-{rng.randint(10,99)}-{rng.randint(10,99)}"
        if i % 11 == 0:
            n = f"{rng.randint(0, 10**rng.randint(1, 12))},{rng.randint(10,99)}"
        rows.append((i, n or None, d or None))
    pdf = pd.DataFrame(rows, columns=["row_id", "amount", "when_at"]).astype(
        {"amount": "object", "when_at": "object"}
    )
    schema = {
        "amount": FieldSpec(type="number", required=True),
        "when_at": FieldSpec(type="date", format="iso-date", required=True),
    }
    got = (
        validate_fields(spark.createDataFrame(pdf), schema, keep=["row_id"])
        .drop("warnings")
        .orderBy("row_id")
        .toPandas()
    )
    con = duckdb.connect()
    con.register("t", pdf)
    want = con.execute(
        validate_sql(schema, "t", raw={n: n for n in schema}, keep=["row_id"])
        + " ORDER BY row_id"
    ).df()
    assert list(got.columns) == list(want.columns)
    for c in got.columns:
        for i, (x, y) in enumerate(zip(got[c].tolist(), want[c].tolist())):
            xn = x is None or (isinstance(x, float) and pd.isna(x))
            yn = y is None or (isinstance(y, float) and pd.isna(y))
            if xn or yn:
                assert xn and yn, (c, i, x, y)
            else:
                assert repr(x) == repr(y), (c, i, x, y, pdf.iloc[i].tolist())


def test_pandas_normalize_oracle_agrees(spark_out, pdf):
    """kernel.normalize is documented as the pytest oracle for the SQL
    exprs — hold it to that: number/date/regex semantics must agree
    with the Spark output on the shared row table (ASCII digit classes
    everywhere; the unicode-\\d deviation from the reference's Python
    is deliberate)."""
    from ocr_spark.kernel import normalize as nz

    num, num_failed = nz.normalize_number(pdf["amount"])
    got = dict(zip(spark_out["row_id"], spark_out["amount_num"]))
    for rid, v in zip(pdf["row_id"], num):
        missing = pdf.loc[pdf["row_id"] == rid, "amount"].iloc[0] in (None, "", "N/A")
        if missing:
            continue  # spark path nulls missing before parsing
        if pd.isna(v):
            assert pd.isna(got[rid]), rid
        else:
            assert got[rid] == v, rid
    date, date_failed = nz.normalize_date(pdf["when_at"])
    got_d = dict(zip(spark_out["row_id"], spark_out["when_at"]))
    for rid, v, f in zip(pdf["row_id"], date, date_failed):
        raw = pdf.loc[pdf["row_id"] == rid, "when_at"].iloc[0]
        if raw in (None, "", "N/A"):
            continue
        assert got_d[rid] == v, (rid, got_d[rid], v)
    # unicode digits are data, not digits (ASCII pin): stripped by the
    # currency cleaner in BOTH the pandas oracle and the engines
    v, f = nz.normalize_number(pd.Series(["٣٤, above 5"]))
    assert v.iloc[0] == 5.0 and not f.iloc[0]
    assert nz.validate_regex(pd.Series(["１２３", "123"]), r"^\d+$").tolist() == [
        True,
        False,
    ]


def test_confidence_bit_exact_at_many_warnings(spark):
    """The driver gate compares repr-exact doubles: the DuckDB penalty
    fold must accumulate DOUBLES left-to-right exactly like Spark's
    aggregate — DECIMAL literals fold exactly and diverge bit-wise at
    e.g. 8 minor warnings (1.0 - 8*0.05 in doubles != 0.6)."""
    import duckdb

    schema = {f"f{i}": FieldSpec(type="string", enum=["ok"]) for i in range(9)}
    # rows with 0..9 enum-violating fields -> 0..9 minor warnings
    rows = []
    for n_bad in range(10):
        rows.append([n_bad] + ["bad" if i < n_bad else "ok" for i in range(9)])
    pdf = pd.DataFrame(rows, columns=["row_id"] + [f"f{i}" for i in range(9)])
    spark_conf = {
        r.row_id: r.confidence
        for r in validate_fields(spark.createDataFrame(pdf), schema, keep=["row_id"]).collect()
    }
    con = duckdb.connect()
    con.register("t", pdf)
    sql = validate_sql(schema, "t", raw={n: n for n in schema}, keep=["row_id"])
    oracle_conf = {int(r[0]): float(r[-1]) for r in con.execute(
        f"SELECT row_id, confidence FROM ({sql})"
    ).fetchall()}
    for k in spark_conf:
        assert repr(spark_conf[k]) == repr(oracle_conf[k]), (
            k, spark_conf[k], oracle_conf[k]
        )


def test_number_normalization(spark_out):
    got = dict(zip(spark_out["row_id"], spark_out["amount_num"]))
    assert got[0] == 1234.56  # 1.234,56 -> rightmost comma is decimal
    assert got[1] == 1234.56  # 1,234.56 -> dot decimal
    assert got[2] == 20.50  # 20,50 -> 2 digits after last comma
    assert got[3] == 1234.0  # 1,234 -> thousands
    assert pd.isna(got[4])  # 1,234,56 -> '1.234.56' -> float() fails
    assert got[5] == 1.0  # '$ 1.000': both seps absent; '.': 1.000
    assert pd.isna(got[6])  # abc -> '' -> fail
    assert got[7] == -5.0
    assert got[8] == 12.5
    assert got[10] == 12345678.99
    assert got[11] == 10000000.0


def test_large_number_string_is_not_scientific(spark_out):
    got = dict(zip(spark_out["row_id"], spark_out["amount"]))
    # str(float) fidelity: no '1.234567899E7' / '1.0E7' / '5.0E-4'
    assert got[10] == "12345678.99"
    assert got[11] == "10000000.0"
    assert got[12] == "0.0005"


def test_number_failure_keeps_raw_and_warns(spark_out):
    r4 = spark_out[spark_out["row_id"] == 4].iloc[0]
    assert r4["amount"] == "1,234,56"
    assert "amount: invalid number format '1,234,56'" in r4["warnings_joined"]


def test_date_normalization(spark_out):
    got = dict(zip(spark_out["row_id"], spark_out["when_at"]))
    assert got[0] == "2023-01-05"
    assert got[1] == "2023-01-05"
    assert got[2] == "2023-12-31"
    assert got[3] == "2023-12-31"
    assert got[4] == "2023-01-05"  # re.search inside longer string
    assert got[5] == "13/2023"  # no pattern -> raw kept + warning
    assert got[6] == "9999-99-99"  # no calendar validation
    assert got[7] == "2-3-2023"  # \d{2} patterns need 2 digits
    assert got[8] == "2023-1-05"  # partial-width miss -> raw kept
    assert got[9] == NA  # empty -> N/A


def test_missing_and_nullable(spark_out):
    by = {r.row_id: r for r in spark_out.itertuples()}
    assert by[1].name == NA  # None + required -> N/A + warning
    assert "name: required field is missing or N/A" in by[1].warnings_joined
    assert by[2].name == NA and by[3].name == NA
    assert by[1].note is None  # nullable + NULL stays NULL
    assert by[2].note == NA  # nullable + "" -> N/A (validate_field path)
    assert by[3].note == NA


def test_regex_and_enum(spark_out):
    by = {r.row_id: r for r in spark_out.itertuples()}
    assert "code: value '12' does not match regex pattern" in by[1].warnings_joined
    assert "status: value 'meh' not in allowed enum ['ok', 'bad']" in by[1].warnings_joined
    assert "code" not in by[0].warnings_joined
    assert "status" not in by[0].warnings_joined
    # N/A exempt from both
    assert "status" not in by[2].warnings_joined
    # number parse failed -> still a string -> regex applies? (code field
    # is separate; amount has no regex) enum on missing status -> N/A exempt
    assert "status" not in by[5].warnings_joined


def test_confidence(spark_out):
    by = {r.row_id: r for r in spark_out.itertuples()}
    # row 0: no warnings
    assert by[0].confidence == 1.0
    # row 9: amount missing (.1) + when_at missing (.1);
    # code/status/note not required -> no warning
    assert by[9].confidence == pytest.approx(0.8)
    # row 1: name missing (.1), code regex (.05), status enum (.05)
    assert by[1].confidence == pytest.approx(0.8)


def test_confidence_clamped(spark):
    schema = {f"f{i}": FieldSpec(type="string", required=True) for i in range(15)}
    df = spark.createDataFrame(
        pd.DataFrame({f"f{i}": [None] for i in range(15)})
    )
    out = validate_fields(df, schema).toPandas()
    assert out["confidence"].iloc[0] == 0.0
