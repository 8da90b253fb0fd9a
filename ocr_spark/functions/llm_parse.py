"""LLM-response parsing (SURVEY.md P4-P6) as columnar expressions —
the reference's parse_llm_response
(/root/reference/pipeline.py:165-194) without per-row Python.

Steps, reference-exact:
1. trim;
2. markdown fence strip (P4): if the trimmed response starts with
   ```````: drop first+last line when >2 lines, then remove any
   remaining ```` ```json ````/```` ``` ```` markers, trim again;
3. direct JSON attempt, else locate the greedy ``{.*}`` body (P5,
   DOTALL) and attempt that;
4. field access via JSON-path extraction (values as strings — the
   downstream validator normalizes types, F1-F7).

P6 (``<think>`` strip, deprecated parser) is included for surface
completeness.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

FENCE = "```"


def strip_fences(c: Column) -> Column:
    """P4: markdown code-block removal, mirroring the reference's
    line-slice + marker replace."""
    t = F.trim(c)
    lines = F.split(t, "\n")
    body = F.when(
        F.size(lines) > 2,
        F.array_join(F.slice(lines, 2, F.size(lines) - 2), "\n"),
    ).otherwise(t)
    unfenced = F.trim(
        F.replace(F.replace(body, F.lit(FENCE + "json"), F.lit("")), F.lit(FENCE), F.lit(""))
    )
    return F.when(t.startswith(FENCE), unfenced).otherwise(t)


def strip_fences_sql(expr: str) -> str:
    t = f"trim({expr})"
    lines = f"string_split({t}, chr(10))"
    body = (
        f"CASE WHEN len({lines}) > 2 "
        f"THEN array_to_string(list_slice({lines}, 2, len({lines}) - 1), chr(10)) "
        f"ELSE {t} END"
    )
    unfenced = f"trim(replace(replace({body}, '{FENCE}json', ''), '{FENCE}', ''))"
    return f"CASE WHEN starts_with({t}, '{FENCE}') THEN {unfenced} ELSE {t} END"


def json_candidate(c: Column) -> Column:
    """P5: the string that will be JSON-parsed — the cleaned response
    if it parses, else the greedy DOTALL {...} substring, else NULL."""
    cleaned = strip_fences(c)
    direct_ok = F.try_parse_json(cleaned).isNotNull()
    located = F.regexp_extract(cleaned, r"(?s)\{.*\}", 0)
    located_ok = (located != "") & F.try_parse_json(located).isNotNull()
    return (
        F.when(direct_ok, cleaned)
        .when(located_ok, located)
        .otherwise(F.lit(None).cast("string"))
    )


def json_candidate_sql(expr: str) -> str:
    cleaned = strip_fences_sql(expr)
    located = f"coalesce(regexp_extract({cleaned}, '(?s)\\{{.*\\}}', 0), '')"
    return (
        f"CASE WHEN try_cast({cleaned} AS JSON) IS NOT NULL THEN {cleaned} "
        f"WHEN {located} <> '' AND try_cast({located} AS JSON) IS NOT NULL THEN {located} "
        f"ELSE NULL END"
    )


def extract_field(json_str: Column, field: str) -> Column:
    """Scalar field access (string-valued), NULL-safe."""
    return F.get_json_object(json_str, f"$.{field}")


def extract_field_sql(expr: str, field: str) -> str:
    return f"json_extract_string({expr}, '$.{field}')"


def strip_think(c: Column) -> Column:
    """P6: remove <think>...</think> blocks then trim newlines/space
    (/root/reference/deprecated/parser_local.py:83-87). SQL trim only
    strips spaces; Python .strip() takes all whitespace -> regex trim."""
    cleaned = F.regexp_replace(c, r"(?s)<think>.*?</think>", "")
    return F.regexp_replace(cleaned, r"^\s+|\s+$", "")
