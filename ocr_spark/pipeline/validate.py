"""Field validation & normalization as pure Spark SQL expressions.

Reference-exact reimplementation of ``validate_field`` /
``validate_and_normalize`` (/root/reference/pipeline.py:196-351) as
whole-stage-codegen Column expressions — no Python on the hot path
(north rule: "no per-row Python"). The pandas twin in
ocr_spark.kernel.normalize is the pytest oracle.

Semantics carried over bit-exactly:
- F1  N/A coalesce: None/""/"N/A" -> "N/A"; warn if required & not
      nullable (pipeline.py:216-225). A SQL NULL on a nullable field
      stays NULL (pipeline.py:328-329).
- F2  currency strip: remove all chars except [\\d.,\\-]
      (pipeline.py:235).
- F3  locale number: both separators -> rightmost is decimal; only
      commas -> decimal iff exactly 2 chars follow the LAST comma
      (``len(cleaned.split(',')[-1]) == 2``), in which case ALL commas
      become dots (so "1,234,56" fails float() — reproduced), else all
      commas stripped (pipeline.py:236-248).
- F4  cast failure -> warning "invalid number format", original value
      kept (pipeline.py:249-254).
- F5  date normalize via ordered re.search patterns -> "YYYY-MM-DD"
      string; no calendar validation (pipeline.py:256-281).
- F6  regex: re.match (anchored at start) on the *normalized* value,
      only when it is still a string (a successfully parsed number is
      a float -> regex skipped; pipeline.py:284-288).
- F7  enum: normalized value not in allowed -> warning; "N/A" exempt
      (pipeline.py:291-294).
- F8  warnings joined with '; ' (pipeline.py:542).
- A1  confidence = clamp01(1 - 0.1*major - 0.05*minor) where a warning
      containing 'required field' or 'missing' is major
      (pipeline.py:336-349).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NA = "N/A"

# Ordered date patterns (/root/reference/pipeline.py:261-266).
# (regex, year_first). re.search semantics -> unanchored regexp_extract.
DATE_PATTERNS: list[tuple[str, bool]] = [
    (r"(\d{4})-(\d{2})-(\d{2})", True),
    (r"(\d{2})/(\d{2})/(\d{4})", False),
    (r"(\d{2})-(\d{2})-(\d{4})", False),
    (r"(\d{4})/(\d{2})/(\d{2})", True),
]


@dataclass(frozen=True)
class FieldSpec:
    """One entry of the reference's dynamic extraction schema
    (/root/reference/config.py:1-89 shape)."""

    type: str = "string"  # string | number | date | boolean
    required: bool = False
    nullable: bool = False
    format: str | None = None  # "iso-date" triggers F5
    regex: str | None = None
    enum: list[str] | None = None
    description: str = ""


# The reference's built-in schema, trimmed to the validation-relevant
# keys (/root/reference/config.py:1-89: 15 fields; types/regex/enum as
# defined there).
def bhxh_schema() -> dict[str, FieldSpec]:
    return {
        "so_seri": FieldSpec(type="string", required=True),
        "so_ho_so": FieldSpec(type="string", required=False, nullable=True),
        "ten_co_so_kcb": FieldSpec(type="string", required=True),
        "ho_ten_nguoi_benh": FieldSpec(type="string", required=True),
        "ngay_sinh": FieldSpec(type="date", required=True, format="iso-date"),
        "ma_so_bhxh": FieldSpec(type="string", required=True, regex=r"^\d{10}$"),
        "gioi_tinh": FieldSpec(type="string", required=True, enum=["Nam", "Nữ"]),
        "don_vi_lam_viec": FieldSpec(type="string", required=False, nullable=True),
        "chan_doan": FieldSpec(type="string", required=True),
        "so_ngay_nghi": FieldSpec(type="number", required=True),
        "tu_ngay": FieldSpec(type="date", required=True, format="iso-date"),
        "den_ngay": FieldSpec(type="date", required=True, format="iso-date"),
        "ngay_cap": FieldSpec(type="date", required=False, format="iso-date", nullable=True),
    }


def _enum_repr(allowed: list[str]) -> str:
    """Python list repr, to match the reference's f-string interpolation
    of ``allowed_values`` into the warning message."""
    return "[" + ", ".join(repr(a) for a in allowed) + "]"


# ---------------------------------------------------------------------------
# Spark Column builders
# ---------------------------------------------------------------------------


def _number_cols(c: Column) -> tuple[Column, Column]:
    """(normalized_double, parse_failed) for a string field (F2+F3+F4)."""
    cleaned = F.regexp_replace(c, r"[^\d.,\-]", "")
    has_c = cleaned.contains(",")
    has_d = cleaned.contains(".")
    # rindex(',') > rindex('.') <=> after the last '.' there is a ','
    comma_decimal = has_c & has_d & cleaned.rlike(r"\.[^.]*,[^.]*$")
    dot_decimal = has_c & has_d & ~comma_decimal
    # exactly 2 chars after the LAST comma
    only_c_dec = has_c & ~has_d & cleaned.rlike(r",[^,]{2}$")
    only_c_thou = has_c & ~has_d & ~only_c_dec
    norm = (
        F.when(comma_decimal, F.replace(F.replace(cleaned, F.lit("."), F.lit("")), F.lit(","), F.lit(".")))
        .when(dot_decimal, F.replace(cleaned, F.lit(","), F.lit("")))
        .when(only_c_dec, F.replace(cleaned, F.lit(","), F.lit(".")))
        .when(only_c_thou, F.replace(cleaned, F.lit(","), F.lit("")))
        .otherwise(cleaned)
    )
    value = norm.try_cast("double")
    # |v| >= 1e15 is treated as a parse failure (invalid-number
    # warning, raw kept): beyond that magnitude Java's Double.toString
    # emits non-shortest digits that no string op can reconcile with
    # DuckDB/Python's shortest repr (e.g. ...781600 vs ...782000), and
    # quadrillion+ amounts in an OCR'd monetary field are garbage
    # anyway. Documented deviation from the reference (which would
    # stringify them scientifically).
    value = F.when(F.abs(value) < 1e15, value)
    # Python float('') / float('-') / float('1.2.3') raise; try_cast
    # nulls on the same inputs. float of '' from empty cleaned -> fail.
    failed = value.isNull()
    return value, failed


def _num_to_str(v: Column) -> Column:
    """double -> string matching the reference's ``str(float)``:
    always the SHORTEST round-trip digits, always fixed-point.

    Both engines' double->string casts emit the shortest-repr digits
    but disagree on when to go scientific (Java outside [1e-3, 1e7),
    DuckDB outside [1e-4, 1e15]) — and printf('%.6f') is NOT a fix
    (Java pads the shortest repr with zeros while C prints the exact
    binary expansion: 772947859593.35 -> '...350000' vs '...349976').
    So each engine DE-SCIENTIFICS its own cast string with pure string
    ops: split mantissa/exponent, shift the decimal point, strip
    trailing zeros — identical results because the underlying digits
    are the same shortest repr. Deviation from str(float): values
    outside [1e-4, 1e16) render fixed-point where Python itself would
    go scientific (documented, cross-engine identical)."""
    s = v.cast("string")
    zeros = F.lit("0" * 400)  # > max double exponent (308)
    m = F.substring_index(s, "E", 1)
    e = F.substring_index(s, "E", -1).cast("int")
    digits = F.regexp_replace(m, r"[\-.]", "")
    pos = e + F.lit(1)
    dlen = F.length(digits)
    fixed_int = F.concat(digits, F.substring(zeros, F.lit(1), pos - dlen), F.lit(".0"))
    split = F.concat(
        F.substring(digits, F.lit(1), pos),
        F.lit("."),
        F.substring(digits, pos + F.lit(1), F.lit(400)),
    )
    body = F.when(e < 0, F.concat(F.lit("0."), F.substring(zeros, F.lit(1), -e - 1), digits)).otherwise(
        F.when(dlen <= pos, fixed_int).otherwise(split)
    )
    body = F.regexp_replace(body, "0+$", "")
    body = F.when(body.endswith("."), F.concat(body, F.lit("0"))).otherwise(body)
    desci = F.concat(F.when(s.startswith("-"), F.lit("-")).otherwise(F.lit("")), body)
    return F.when(s.contains("E"), desci).otherwise(s)


def _date_cols(c: Column) -> tuple[Column, Column]:
    """(normalized 'YYYY-MM-DD' string, failed) via ordered patterns (F5).

    Every reference pattern is fixed-width (10 chars, literal
    separators), so one regexp_extract of the WHOLE first match plus
    substring slicing replaces three per-group regex evaluations —
    ~3x fewer regex ops on the hot path, identical results."""
    branches = []
    for pattern, year_first in DATE_PATTERNS:
        m = F.regexp_extract(c, pattern, 0)
        if year_first:  # yyyy?MM?dd
            norm = F.concat_ws(
                "-", F.substring(m, 1, 4), F.substring(m, 6, 2), F.substring(m, 9, 2)
            )
        else:  # dd?MM?yyyy
            norm = F.concat_ws(
                "-", F.substring(m, 7, 4), F.substring(m, 4, 2), F.substring(m, 1, 2)
            )
        branches.append(F.when(m != "", norm).otherwise(F.lit(None)))
    result = F.coalesce(*branches)
    return result, result.isNull()


def field_value_col(spec: FieldSpec, raw: Column) -> Column | None:
    """The EXPENSIVE per-field intermediate (parsed double for number
    fields, ISO date string for date fields), or None for plain string
    fields. Computed in its own projection stage by validate_fields so
    downstream expressions reference it as a plain attribute — see the
    staging note on validate_fields."""
    if spec.type == "number":
        value, _ = _number_cols(raw)
        return value
    if spec.type == "date" and spec.format == "iso-date":
        value, _ = _date_cols(raw)
        return value
    return None


def field_norm_col(spec: FieldSpec, raw: Column, value: Column | None) -> Column:
    """Pre-nullable-override normalized string for one field.

    ``normalized_string`` matches the reference's normalized_value
    stringified: numbers that parse render via double->string cast;
    failures keep the raw string; missing -> "N/A"
    (/root/reference/pipeline.py:196-296)."""
    is_missing = raw.isNull() | (raw == "") | (raw == NA)
    if spec.type == "number":
        assert value is not None
        return (
            F.when(is_missing, F.lit(NA))
            .when(value.isNull(), raw)
            .otherwise(_num_to_str(value))
        )
    if spec.type == "date" and spec.format == "iso-date":
        assert value is not None
        return F.when(is_missing, F.lit(NA)).otherwise(F.coalesce(value, raw))
    return F.when(is_missing, F.lit(NA)).otherwise(raw)


def field_warn_cols(
    name: str, spec: FieldSpec, raw: Column, value: Column | None, norm: Column
) -> Column:
    """warnings array for one field (F4/F6/F7 + required-missing),
    referencing the PRE-override ``norm`` (pipeline.py:196-296)."""
    is_missing = raw.isNull() | (raw == "") | (raw == NA)
    warns: list[Column] = [
        F.when(
            is_missing & F.lit(spec.required and not spec.nullable),
            F.lit(f"{name}: required field is missing or N/A"),
        )
    ]
    still_string: Column = F.lit(True)
    if spec.type == "number":
        assert value is not None
        failed = value.isNull()
        warns.append(
            F.when(
                ~is_missing & failed,
                F.concat(F.lit(f"{name}: invalid number format '"), raw, F.lit("'")),
            )
        )
        still_string = is_missing | failed  # float result -> regex/enum see a non-str
    elif spec.type == "date" and spec.format == "iso-date":
        assert value is not None
        warns.append(
            F.when(
                ~is_missing & value.isNull(),
                F.concat(
                    F.lit(f"{name}: could not normalize date '"),
                    raw,
                    F.lit("' to ISO format"),
                ),
            )
        )
    if spec.regex is not None:
        anchored = spec.regex if spec.regex.startswith("^") else "^" + spec.regex
        warns.append(
            F.when(
                still_string & (norm != NA) & ~norm.rlike(anchored),
                F.concat(
                    F.lit(f"{name}: value '"),
                    norm,
                    F.lit(f"' does not match regex pattern '{spec.regex}'"),
                ),
            )
        )
    if spec.enum is not None:
        # reference compares normalized_value (possibly float) against a
        # list of strings; a parsed float is never in a string enum.
        in_enum = F.when(still_string, norm.isin(*spec.enum)).otherwise(F.lit(False))
        warns.append(
            F.when(
                (norm != NA) & ~in_enum,
                F.concat(
                    F.lit(f"{name}: value '"),
                    norm,
                    F.lit(f"' not in allowed enum {_enum_repr(spec.enum)}"),
                ),
            )
        )
    return F.filter(F.array(*warns), lambda w: w.isNotNull())


def validate_field_cols(
    name: str, spec: FieldSpec, raw: Column
) -> tuple[Column, Column | None, Column]:
    """Single-expression form of (normalized, numeric, warnings) for one
    field — the columnar twin of validate_field
    (/root/reference/pipeline.py:196-296). Prefer validate_fields for
    whole-frame validation: it stages the same components across
    projections so the expensive parse expression evaluates once."""
    is_missing = raw.isNull() | (raw == "") | (raw == NA)
    value = field_value_col(spec, raw)
    norm = field_norm_col(spec, raw, value)
    warns = field_warn_cols(name, spec, raw, value, norm)
    num_value = F.when(~is_missing, value) if spec.type == "number" else None
    if spec.nullable:
        norm = F.when(raw.isNull(), F.lit(None).cast("string")).otherwise(norm)
    return norm, num_value, warns


def validate_fields(
    df: DataFrame,
    schema: dict[str, FieldSpec],
    prefix: str = "",
    keep: list[str] | None = None,
) -> DataFrame:
    """Columnar validate_and_normalize (pipeline.py:298-351).

    Input: one string column per schema field named ``{prefix}{field}``.
    Output: ``keep`` passthrough columns + per-field normalized columns
    (field name), numeric double columns (``{field}_num``) for number
    fields, plus ``warnings`` (array), ``warnings_joined`` (F8 '; '
    join), ``n_warnings``, and ``confidence`` (A1).
    """
    keep_cols = [F.col(c) for c in (keep or [])]
    # STAGED EVALUATION (the whole point of this function vs mapping
    # validate_field_cols over columns): the parsed value feeds the
    # normalized string, the numeric output, and ~10 sub-expressions of
    # the de-scientific formatter — and Spark re-evaluates a CASE-WHEN
    # subtree at EVERY reference (codegen subexpression elimination
    # skips conditional branches). Inlined, the regex-heavy parse ran
    # ~10x per row (measured 6.8 s -> 1.1 s at sf0.1 for the bench
    # schema). Computing value (stage 1) and the pre-override norm
    # (stage 2) as real columns makes every later use an attribute
    # reference; CollapseProject keeps the stages separate precisely
    # because the producer expressions are non-cheap and
    # multi-referenced, and all three projections still fuse into ONE
    # whole-stage-codegen pass (no shuffle, no materialization).
    vals: dict[str, Column | None] = {}
    stage1: list[Column] = [F.col(c) for c in df.columns]
    for name, spec in schema.items():
        v = field_value_col(spec, F.col(prefix + name))
        vals[name] = v
        if v is not None:
            stage1.append(v.alias(f"__v_{name}"))
    s1 = df.select(*stage1)

    stage2 = [F.col(c) for c in s1.columns]
    for name, spec in schema.items():
        raw = F.col(prefix + name)
        v = F.col(f"__v_{name}") if vals[name] is not None else None
        stage2.append(field_norm_col(spec, raw, v).alias(f"__n_{name}"))
    s2 = s1.select(*stage2)

    out_cols: list[Column] = []
    warn_arrays: list[Column] = []
    for name, spec in schema.items():
        raw = F.col(prefix + name)
        v = F.col(f"__v_{name}") if vals[name] is not None else None
        norm = F.col(f"__n_{name}")
        is_missing = raw.isNull() | (raw == "") | (raw == NA)
        warn_arrays.append(field_warn_cols(name, spec, raw, v, norm))
        if spec.nullable:
            norm = F.when(raw.isNull(), F.lit(None).cast("string")).otherwise(norm)
        out_cols.append(norm.alias(name))
        if spec.type == "number":
            out_cols.append(F.when(~is_missing, v).alias(name + "_num"))
    all_warnings = F.flatten(F.array(*warn_arrays))
    df = s2
    # A1: -0.1 for 'required field'/'missing' warnings, else -0.05;
    # clamp [0,1] (pipeline.py:336-349)
    penalty = F.aggregate(
        all_warnings,
        F.lit(0.0),
        lambda acc, w: acc
        + F.when(
            w.contains("required field") | w.contains("missing"), F.lit(0.1)
        ).otherwise(F.lit(0.05)),
    )
    confidence = F.greatest(F.lit(0.0), F.least(F.lit(1.0), F.lit(1.0) - penalty))
    return df.select(
        *keep_cols,
        *out_cols,
        all_warnings.alias("warnings"),
        F.array_join(all_warnings, "; ").alias("warnings_joined"),
        F.size(all_warnings).alias("n_warnings"),
        confidence.alias("confidence"),
    )


def run_summary(validated: DataFrame) -> DataFrame:
    """A2: run-level summary (/root/reference/webapp/results.py:91-101):
    totalFiles, averageConfidence, warningsCount (docs with >=1 warning)."""
    return validated.agg(
        F.count("*").alias("total_files"),
        F.avg("confidence").alias("average_confidence"),
        F.sum(F.when(F.col("n_warnings") > 0, 1).otherwise(0)).alias("warnings_count"),
    )


def confidence_display(c: Column) -> Column:
    """F9: f"{c*100:.1f}%" (/root/reference/webapp/results.py:56)."""
    return F.format_string("%.1f%%", c * 100)


# ---------------------------------------------------------------------------
# DuckDB oracle SQL builders (same semantics, ANSI-ish SQL)
# ---------------------------------------------------------------------------


def _number_sql(raw: str) -> tuple[str, str]:
    """(value_double_sql, failed_bool_sql) mirroring _number_cols."""
    cleaned = f"regexp_replace({raw}, '[^0-9.,\\-]', '', 'g')"
    has_c = f"contains({cleaned}, ',')"
    has_d = f"contains({cleaned}, '.')"
    comma_dec = f"({has_c} AND {has_d} AND regexp_matches({cleaned}, '\\.[^.]*,[^.]*$'))"
    dot_dec = f"({has_c} AND {has_d} AND NOT regexp_matches({cleaned}, '\\.[^.]*,[^.]*$'))"
    only_c_dec = f"({has_c} AND NOT {has_d} AND regexp_matches({cleaned}, ',[^,]{{2}}$'))"
    only_c_thou = f"({has_c} AND NOT {has_d} AND NOT regexp_matches({cleaned}, ',[^,]{{2}}$'))"
    norm = (
        f"CASE WHEN {comma_dec} THEN replace(replace({cleaned}, '.', ''), ',', '.') "
        f"WHEN {dot_dec} THEN replace({cleaned}, ',', '') "
        f"WHEN {only_c_dec} THEN replace({cleaned}, ',', '.') "
        f"WHEN {only_c_thou} THEN replace({cleaned}, ',', '') "
        f"ELSE {cleaned} END"
    )
    value = f"(CASE WHEN abs(try_cast({norm} AS DOUBLE)) < 1e15 THEN try_cast({norm} AS DOUBLE) END)"
    return value, f"({value} IS NULL)"


def _num_to_str_sql(v: str) -> str:
    """DuckDB twin of _num_to_str: de-scientific DuckDB's own cast
    string ('5e-05', '1.5e+16') with the same point-shift + strip —
    the shortest-repr digits agree across engines, so the fixed-point
    renderings are character-identical."""
    s = f"CAST({v} AS VARCHAR)"
    m = f"split_part({s}, 'e', 1)"
    e = f"CAST(split_part({s}, 'e', 2) AS INT)"
    digits = f"regexp_replace({m}, '[-.]', '', 'g')"
    pos = f"({e} + 1)"
    dlen = f"length({digits})"
    body = (
        f"CASE WHEN {e} < 0 THEN '0.' || repeat('0', -{e} - 1) || {digits} "
        f"WHEN {dlen} <= {pos} THEN {digits} || repeat('0', {pos} - {dlen}) || '.0' "
        f"ELSE substr({digits}, 1, {pos}) || '.' || substr({digits}, {pos} + 1) END"
    )
    body = f"regexp_replace({body}, '0+$', '')"
    body = f"CASE WHEN {body} LIKE '%.' THEN {body} || '0' ELSE {body} END"
    desci = f"(CASE WHEN {s} LIKE '-%' THEN '-' ELSE '' END) || {body}"
    return f"CASE WHEN contains({s}, 'e') THEN {desci} ELSE {s} END"


def _date_sql(raw: str) -> tuple[str, str]:
    parts = []
    for pattern, year_first in DATE_PATTERNS:
        p = pattern.replace("\\d", "[0-9]")
        order = [1, 2, 3] if year_first else [3, 2, 1]
        ext = " || '-' || ".join(f"regexp_extract({raw}, '{p}', {g})" for g in order)
        parts.append(f"CASE WHEN regexp_matches({raw}, '{p}') THEN {ext} END")
    value = "coalesce(" + ", ".join(parts) + ")"
    return value, f"({value} IS NULL)"


def field_sql(name: str, spec: FieldSpec, raw: str) -> dict[str, str]:
    """DuckDB SQL snippets for one field: keys 'norm', optional 'num',
    and 'warns' (a list-of-varchar SQL expression, nulls filtered by
    the caller)."""
    is_missing = f"({raw} IS NULL OR {raw} = '' OR {raw} = 'N/A')"
    warns = [
        (
            f"CASE WHEN {is_missing} AND {str(spec.required and not spec.nullable).upper()} "
            f"THEN '{name}: required field is missing or N/A' END"
        )
    ]
    num = None
    if spec.type == "number":
        value, failed = _number_sql(raw)
        num = f"CASE WHEN NOT {is_missing} THEN {value} END"
        warns.append(
            f"CASE WHEN NOT {is_missing} AND {failed} THEN "
            f"'{name}: invalid number format ''' || {raw} || '''' END"
        )
        norm = (
            f"CASE WHEN {is_missing} THEN 'N/A' WHEN {failed} THEN {raw} "
            f"ELSE {_num_to_str_sql(value)} END"
        )
        still_string = f"({is_missing} OR {failed})"
    elif spec.type == "date" and spec.format == "iso-date":
        value, failed = _date_sql(raw)
        warns.append(
            f"CASE WHEN NOT {is_missing} AND {failed} THEN "
            f"'{name}: could not normalize date ''' || {raw} || ''' to ISO format' END"
        )
        norm = f"CASE WHEN {is_missing} THEN 'N/A' ELSE coalesce({value}, {raw}) END"
        still_string = "TRUE"
    else:
        norm = f"CASE WHEN {is_missing} THEN 'N/A' ELSE {raw} END"
        still_string = "TRUE"

    if spec.regex is not None:
        anchored = spec.regex if spec.regex.startswith("^") else "^" + spec.regex
        d_anchored = anchored.replace("\\d", "[0-9]").replace("'", "''")
        msg_regex = spec.regex.replace("'", "''")  # quote-safe in the message literal
        warns.append(
            f"CASE WHEN {still_string} AND ({norm}) <> 'N/A' "
            f"AND NOT regexp_matches(({norm}), '{d_anchored}') THEN "
            f"'{name}: value ''' || ({norm}) || ''' does not match regex pattern "
            f"''{msg_regex}''' END"
        )
    if spec.enum is not None:
        in_list = ", ".join("'" + a.replace("'", "''") + "'" for a in spec.enum)
        enum_msg = _enum_repr(spec.enum).replace("'", "''")
        warns.append(
            f"CASE WHEN ({norm}) <> 'N/A' AND NOT (CASE WHEN {still_string} "
            f"THEN ({norm}) IN ({in_list}) ELSE FALSE END) THEN "
            f"'{name}: value ''' || ({norm}) || ''' not in allowed enum {enum_msg}' END"
        )
    if spec.nullable:
        norm = f"CASE WHEN {raw} IS NULL THEN NULL ELSE {norm} END"
    return {"norm": norm, "num": num, "warns": warns}


def validate_sql(
    schema: dict[str, FieldSpec],
    from_clause: str,
    raw: dict[str, str],
    keep: list[str] | None = None,
) -> str:
    """Full DuckDB SELECT mirroring validate_fields(): same output
    column names (field, field_num, warnings_joined, n_warnings,
    confidence). ``raw[name]`` is the SQL expression for each raw field."""
    cols = list(keep or [])
    warn_exprs: list[str] = []
    for name, spec in schema.items():
        s = field_sql(name, spec, raw[name])
        cols.append(f"{s['norm']} AS {name}")
        if s["num"] is not None:
            cols.append(f"{s['num']} AS {name}_num")
        warn_exprs.extend(s["warns"])
    wlist = "list_filter([" + ", ".join(warn_exprs) + "], w -> w IS NOT NULL)"
    # The penalty must fold DOUBLES sequentially exactly like Spark's
    # F.aggregate: bare 0.1/0.05 literals are DECIMAL in DuckDB and
    # list_sum folds them exactly, which diverges bit-wise from the
    # double fold at e.g. 8 minor warnings (8*0.05: double gives
    # 0.4000000000000001 accumulated) — the repr-exact gate would flag
    # it. CAST literals + list_reduce reproduce the double left fold.
    penalty = (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform({wlist}, w -> CASE WHEN contains(w, 'required field') "
        f"OR contains(w, 'missing') THEN CAST(0.1 AS DOUBLE) "
        f"ELSE CAST(0.05 AS DOUBLE) END)), (acc, x) -> acc + x)"
    )
    # DuckDB's array_to_string yields NULL on an empty list; Spark's
    # array_join yields '' — align on ''.
    cols.append(f"coalesce(array_to_string({wlist}, '; '), '') AS warnings_joined")
    cols.append(f"CAST(len({wlist}) AS INT) AS n_warnings")
    cols.append(
        f"CAST(greatest(0.0, least(1.0, 1.0 - coalesce({penalty}, 0.0))) AS DOUBLE) AS confidence"
    )
    return "SELECT " + ", ".join(cols) + " FROM " + from_clause
