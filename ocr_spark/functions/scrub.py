"""Corpus scrubbing for training-data pipelines: PII redaction,
within-document repetition removal, and Gopher-style quality rules.

All three operators are narrow per-row column expressions — no
shuffle, no UDF: at 100 TB they run inside the parquet scan stage
under whole-stage codegen, and column pruning keeps the scan at
(doc_id, text). Each has a DuckDB SQL twin for the correctness gate.

Dialect discipline (the repo-wide rules these twins follow):

- regexes use explicit ASCII classes (``[0-9]``, the shared
  ``schema.WS`` whitespace class) — never ``\\s``/``\\d`` shorthand
  whose Java/RE2 definitions could drift;
- ``\\b`` is safe: both Java (default flags) and RE2 define it via the
  ASCII word class ``[A-Za-z0-9_]``;
- case-insensitive word matching lowercases via ``translate`` over the
  26 ASCII letters — Java's full case mapping and DuckDB's simple
  mapping disagree on İ/ı/Kelvin-sign, so ``lower()`` never touches a
  hash-compared value (the tf-idf lesson);
- DuckDB ``regexp_replace`` needs the explicit ``'g'`` flag (it
  replaces only the first match by default; Spark replaces all).

Reference: the reference repo validates/normalizes extracted field
values but has no corpus-hygiene layer (its corpus is a user upload,
`/root/reference/pipeline.py`); these operators are the
training-pipeline additions the north rule asks for beyond it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ocr_spark.schema import WS

# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# Patterns are valid and IDENTICAL in meaning under Java regex and
# RE2: explicit classes, no lookaround (RE2 has none), no shorthand.
EMAIL_RE = "[A-Za-z0-9._%+\\-]+@[A-Za-z0-9.\\-]+\\.[A-Za-z]{2,}"
IPV4_RE = "\\b[0-9]{1,3}(\\.[0-9]{1,3}){3}\\b"
# Phone shapes, deliberately CONSERVATIVE: an over-broad pattern (any
# 8+ run of digits/dots/dashes) would redact ISO dates, large
# integers, and decimals corpus-wide — destroying training text the
# scrubber was meant to protect. Two forms:
#   international: leading '+' then 2-5 separated/parenthesized
#                  digit groups ('+1 (555) 123-4567', '+49301820')
#   local:         3-3-4 separated groups ('555-123-4567',
#                  '(555) 123 4567') — a YYYY-MM-DD date can't match
#                  (its last group has 2 digits, the form needs 4)
# Bare digit runs ('12345678'), dates ('2026-08-17'), versions
# ('1.2.3') and decimals ('3.14159265') do NOT match either form.
PHONE_RE = (
    "\\+[0-9]{1,3}[\\-\\. ]?\\(?[0-9]{1,4}\\)?([\\-\\. ]?\\(?[0-9]{2,4}\\)?){1,4}"
    "|\\(?[0-9]{3}\\)?[\\-\\. ][0-9]{3}[\\-\\. ][0-9]{4}"
)

# Payment-card candidates: 13-19 digits with optional single space/
# dash separators ('.' is excluded — it would eat decimals). A regex
# alone would redact 13-19-digit integers corpus-wide, so candidates
# are VALIDATED with the Luhn checksum before redaction (the standard
# scrubber discipline: Luhn rejects ~90% of random digit runs; the
# residual ~10% false-positive rate on bare long integers is the
# accepted trade for catching real PANs). Runs BEFORE the phone pass
# so a separated card ('4111-1111-1111-1111') is claimed as <CARD>,
# not shredded into partial <PHONE> matches.
CARD_RE = "\\b[0-9]([ \\-]?[0-9]){12,18}\\b"

EMAIL_TOKEN, IP_TOKEN, PHONE_TOKEN = "<EMAIL>", "<IP>", "<PHONE>"
CARD_TOKEN = "<CARD>"


def _luhn_body() -> str:
    """THE Luhn fold body over a reversed-digits string bound as
    ``rd`` — doubling every second digit from the right, subtracting 9
    above 9, sum % 10 == 0. One rendering per dialect below; the CASE
    tree is character-identical so validity can never diverge."""
    d = "CAST(substr(rd, i, 1) AS INT)"
    return (
        f"CASE WHEN i % 2 = 0 THEN "
        f"CASE WHEN 2 * {d} > 9 THEN 2 * {d} - 9 ELSE 2 * {d} END "
        f"ELSE {d} END"
    )


def _luhn_ok_expr() -> str:
    """Spark: Luhn validity of a candidate bound as lambda var ``c``
    (LET-binds the reversed digit string once per candidate)."""
    fold = (
        f"aggregate(sequence(1, length(rd)), 0, "
        f"(acc, i) -> acc + {_luhn_body()}) % 10 = 0"
    )
    return (
        "element_at(transform(array(reverse(regexp_replace(c, '[^0-9]', ''))), "
        f"rd -> {fold}), 1)"
    )


def _luhn_ok_duck() -> str:
    """DuckDB twin of :func:`_luhn_ok_expr`."""
    fold = (
        f"list_sum(list_transform(range(1, length(rd) + 1), "
        f"i -> {_luhn_body()})) % 10 = 0"
    )
    return (
        "list_transform([reverse(regexp_replace(c, '[^0-9]', '', 'g'))], "
        f"rd -> {fold})[1]"
    )


def pii_scrub(docs: DataFrame) -> DataFrame:
    """(doc_id, clean_text, n_emails, n_ipv4, n_cards, n_phones).

    Redaction is STAGED — emails, then IPv4, then Luhn-validated
    payment cards, then phones, each counted on the text as it stands
    at that stage — so an email's digit run can never double-count as
    a phone, an IP (digits with dots) is claimed by the IP pass
    before the looser phone pattern can eat it, and a separated card
    becomes one <CARD>, never partial <PHONE>s. The card stage is
    candidate-based (regex proposes, Luhn disposes): only candidates
    passing the checksum are literally replaced — a conditional
    redaction no single regexp_replace can express. Both engines
    apply the identical sequence, so the outputs are byte-equal.
    """
    s1 = docs.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_replace(F.col("text"), EMAIL_RE, EMAIL_TOKEN).alias("_t1"),
    )
    s2 = s1.select(
        "doc_id",
        "n_emails",
        F.regexp_count(F.col("_t1"), F.lit(IPV4_RE)).alias("n_ipv4"),
        F.regexp_replace(F.col("_t1"), IPV4_RE, IP_TOKEN).alias("_t2"),
    )
    # Spark SQL string literals unescape backslashes (the
    # _strip_pua_expr lesson) — double them for the expr rendering
    card_lit = CARD_RE.replace("\\", "\\\\")
    valid = (
        f"filter(regexp_extract_all(_t2, '{card_lit}', 0), "
        f"c -> {_luhn_ok_expr()})"
    )
    # position-aware redaction: each validated candidate is replaced
    # ONLY at word-boundary-anchored occurrences — the exact positions
    # CARD_RE matched. A bare replace() is position-blind and mangles
    # longer digit runs that merely CONTAIN a valid card as a
    # substring (Luhn-failing reference numbers must pass through
    # byte-identical). Candidates are regex-safe literals by
    # construction ([0-9 -] only).
    card_struct = (
        f"element_at(transform(array({valid}), v -> struct("
        f"CAST(size(v) AS INT) AS n, "
        f"aggregate(v, _t2, (acc, c) -> "
        f"regexp_replace(acc, concat('\\\\b', c, '\\\\b'), '{CARD_TOKEN}')) AS t"
        f")), 1)"
    )
    s3 = s2.select(
        "doc_id",
        "n_emails",
        "n_ipv4",
        F.expr(card_struct).alias("_c"),
    ).select(
        "doc_id",
        "n_emails",
        "n_ipv4",
        F.col("_c.n").alias("n_cards"),
        F.col("_c.t").alias("_t3"),
    )
    s4 = s3.select(
        "doc_id",
        "n_emails",
        "n_ipv4",
        "n_cards",
        F.regexp_count(F.col("_t3"), F.lit(PHONE_RE)).alias("n_phones"),
        F.regexp_replace(F.col("_t3"), PHONE_RE, PHONE_TOKEN).alias("clean_text"),
    )
    return s4.select(
        "doc_id", "clean_text", "n_emails", "n_ipv4", "n_cards", "n_phones"
    )


def pii_scrub_sql(table: str = "documents") -> str:
    valid = (
        f"list_filter(regexp_extract_all(_t2, '{CARD_RE}'), "
        f"c -> {_luhn_ok_duck()})"
    )
    return f"""
      SELECT doc_id,
             regexp_replace(_t3, '{PHONE_RE}', '{PHONE_TOKEN}', 'g') AS clean_text,
             n_emails, n_ipv4, n_cards,
             CAST(len(regexp_extract_all(_t3, '{PHONE_RE}')) AS INT) AS n_phones
      FROM (
        SELECT doc_id, n_emails, n_ipv4,
               CAST(len(v) AS INT) AS n_cards,
               list_reduce(list_prepend(_t2, v),
                 (acc, c) -> regexp_replace(acc, '\\b' || c || '\\b',
                                            '{CARD_TOKEN}', 'g')) AS _t3
        FROM (
          SELECT doc_id, n_emails, n_ipv4, _t2, {valid} AS v
          FROM (
            SELECT doc_id, n_emails,
                   CAST(len(regexp_extract_all(_t1, '{IPV4_RE}')) AS INT) AS n_ipv4,
                   regexp_replace(_t1, '{IPV4_RE}', '{IP_TOKEN}', 'g') AS _t2
            FROM (
              SELECT doc_id,
                     CAST(len(regexp_extract_all(text, '{EMAIL_RE}')) AS INT) AS n_emails,
                     regexp_replace(text, '{EMAIL_RE}', '{EMAIL_TOKEN}', 'g') AS _t1
              FROM {table}
            )
          )
        )
      )
    """


# ---------------------------------------------------------------------------
# within-document repetition removal (C4-style line dedup)
# ---------------------------------------------------------------------------


def line_dedup(docs: DataFrame) -> DataFrame:
    """(doc_id, clean_text, n_lines, n_unique_lines, dup_line_ratio).

    Drops repeated lines within each document, keeping the FIRST
    occurrence in order (Spark ``array_distinct`` is order-stable).
    Boilerplate navigation/footer lines repeated inside a page are the
    classic C4-pipeline removal target. Zero shuffle: pure array exprs
    in the scan stage.
    """
    lines = F.split(F.col("text"), "\n")
    uniq = F.array_distinct(lines)
    nl, nu = F.size(lines), F.size(uniq)
    return docs.select(
        "doc_id",
        F.array_join(uniq, "\n").alias("clean_text"),
        nl.alias("n_lines"),
        nu.alias("n_unique_lines"),
        ((nl - nu).cast("double") / nl).alias("dup_line_ratio"),
    )


def line_dedup_sql(table: str = "documents") -> str:
    # DuckDB's list_distinct does NOT preserve order; emulate the
    # order-stable first-occurrence semantics with an indexed lambda.
    return f"""
      SELECT doc_id,
             array_to_string(us, chr(10)) AS clean_text,
             CAST(len(ls) AS INT) AS n_lines,
             CAST(len(us) AS INT) AS n_unique_lines,
             CAST(len(ls) - len(us) AS DOUBLE) / len(ls) AS dup_line_ratio
      FROM (
        SELECT doc_id, ls, list_filter(ls, (x, i) -> list_position(ls, x) = i) AS us
        FROM (SELECT doc_id, regexp_split_to_array(text, '\\n') AS ls FROM {table})
      )
    """


# ---------------------------------------------------------------------------
# Gopher-style quality rules
# ---------------------------------------------------------------------------

from ocr_spark.schema import ASCII_LOWER as _LC
from ocr_spark.schema import ASCII_UPPER as _UC
# The Gopher paper's "must contain >=2 of" stop set.
GOPHER_STOPS = ["the", "be", "to", "of", "and", "that", "have", "with"]

MIN_WORDS, MAX_WORDS = 50, 100_000
MIN_MEAN_LEN, MAX_MEAN_LEN = 3.0, 10.0
MAX_SYMBOL_RATIO = 0.1
MAX_BULLET_RATIO = 0.9
MAX_ELLIPSIS_RATIO = 0.3
MIN_STOP_HITS = 2

# '#' occurrences plus '...'/'…' ellipses (the Gopher symbol list).
_SYMBOL_RE = "#|\\.\\.\\.|…"


def gopher_rules(docs: DataFrame) -> DataFrame:
    """(doc_id, n_words, mean_word_len, symbol_ratio, bullet_ratio,
    ellipsis_ratio, n_stop_hits, keep) — the Gopher repetition/quality
    rule set (Rae et al. 2021, Table A1 subset) as codegen exprs.

    ``keep`` is the AND of all six rules; NULL inputs (NULL text,
    zero-word docs) fail closed (keep = false).
    """
    words = f"filter(split(text, '{WS}+'), w -> w != '')"
    stage1 = docs.select(
        "doc_id",
        "text",
        F.expr(words).alias("_w"),
        F.expr(f"transform({words}, w -> translate(w, '{_UC}', '{_LC}'))").alias("_wl"),
        F.split(F.col("text"), "\n").alias("_ls"),
    )
    nw = F.size(F.col("_w"))
    nl = F.size(F.col("_ls"))
    sum_len = F.expr("aggregate(_w, 0L, (a, w) -> a + length(w))")
    n_sym = F.regexp_count(F.col("text"), F.lit(_SYMBOL_RE))
    n_bullet = F.expr(
        "size(filter(_ls, l -> substring(l, 1, 1) = '-' "
        "OR substring(l, 1, 1) = '*' OR substring(l, 1, 1) = '•'))"
    )
    n_ellip = F.expr(
        "size(filter(_ls, l -> right(l, 3) = '...' OR right(l, 1) = '…'))"
    )
    stop_hits = None
    for w in GOPHER_STOPS:
        term = F.when(F.array_contains(F.col("_wl"), w), 1).otherwise(0)
        stop_hits = term if stop_hits is None else stop_hits + term
    mean_len = F.when(nw == 0, F.lit(None)).otherwise(sum_len.cast("double") / nw)
    sym_ratio = F.when(nw == 0, F.lit(None)).otherwise(n_sym.cast("double") / nw)
    bullet_ratio = F.when(nl == 0, F.lit(None)).otherwise(n_bullet.cast("double") / nl)
    ellip_ratio = F.when(nl == 0, F.lit(None)).otherwise(n_ellip.cast("double") / nl)
    stage2 = stage1.select(
        "doc_id",
        nw.alias("n_words"),
        mean_len.alias("mean_word_len"),
        sym_ratio.alias("symbol_ratio"),
        bullet_ratio.alias("bullet_ratio"),
        ellip_ratio.alias("ellipsis_ratio"),
        stop_hits.cast("int").alias("n_stop_hits"),
    )
    keep = F.coalesce(
        F.col("n_words").between(MIN_WORDS, MAX_WORDS)
        & F.col("mean_word_len").between(MIN_MEAN_LEN, MAX_MEAN_LEN)
        & (F.col("symbol_ratio") < MAX_SYMBOL_RATIO)
        & (F.col("bullet_ratio") < MAX_BULLET_RATIO)
        & (F.col("ellipsis_ratio") < MAX_ELLIPSIS_RATIO)
        & (F.col("n_stop_hits") >= MIN_STOP_HITS),
        F.lit(False),
    )
    return stage2.withColumn("keep", keep)


def gopher_rules_sql(table: str = "documents") -> str:
    stops = " + ".join(
        f"(CASE WHEN list_contains(_wl, '{w}') THEN 1 ELSE 0 END)"
        for w in GOPHER_STOPS
    )
    return f"""
      SELECT doc_id, n_words, mean_word_len, symbol_ratio, bullet_ratio,
             ellipsis_ratio, n_stop_hits,
             coalesce(n_words BETWEEN {MIN_WORDS} AND {MAX_WORDS}
                      AND mean_word_len BETWEEN {MIN_MEAN_LEN} AND {MAX_MEAN_LEN}
                      AND symbol_ratio < {MAX_SYMBOL_RATIO}
                      AND bullet_ratio < {MAX_BULLET_RATIO}
                      AND ellipsis_ratio < {MAX_ELLIPSIS_RATIO}
                      AND n_stop_hits >= {MIN_STOP_HITS}, false) AS keep
      FROM (
        SELECT doc_id,
               CAST(len(_w) AS INT) AS n_words,
               CASE WHEN len(_w) = 0 THEN NULL
                    ELSE CAST(list_sum([length(w) FOR w IN _w]) AS DOUBLE) / len(_w)
               END AS mean_word_len,
               CASE WHEN len(_w) = 0 THEN NULL
                    ELSE CAST(len(regexp_extract_all(text, '{_SYMBOL_RE}')) AS DOUBLE) / len(_w)
               END AS symbol_ratio,
               CASE WHEN len(_ls) = 0 THEN NULL
                    ELSE CAST(len(list_filter(_ls, l -> substr(l, 1, 1) = '-'
                         OR substr(l, 1, 1) = '*' OR substr(l, 1, 1) = '•')) AS DOUBLE) / len(_ls)
               END AS bullet_ratio,
               CASE WHEN len(_ls) = 0 THEN NULL
                    ELSE CAST(len(list_filter(_ls, l -> right(l, 3) = '...'
                         OR right(l, 1) = '…')) AS DOUBLE) / len(_ls)
               END AS ellipsis_ratio,
               CAST({stops} AS INT) AS n_stop_hits
        FROM (
          SELECT doc_id, text,
                 list_filter(regexp_split_to_array(text, '{WS}+'), w -> w != '') AS _w,
                 [translate(w, '{_UC}', '{_LC}')
                  FOR w IN list_filter(regexp_split_to_array(text, '{WS}+'), w -> w != '')] AS _wl,
                 regexp_split_to_array(text, '\\n') AS _ls
          FROM {table}
        )
      )
    """


# ---------------------------------------------------------------------------
# repetition signals (Gopher duplicate-n-gram fractions)
# ---------------------------------------------------------------------------

REP_NS = (2, 3, 4)


def repetition_signals(docs: DataFrame, ns: tuple[int, ...] = REP_NS) -> DataFrame:
    """(doc_id, dup_{n}gram_frac ...): fraction of n-gram OCCURRENCES
    that are repeats of an earlier n-gram — the Gopher repetition
    signals (Rae et al. 2021 Table A1, "duplicate n-grams").

    ``1 - distinct/total`` per n; NULL when the doc has fewer than n
    words (no n-grams to judge). Distinct/total are O(len) hash work
    per row — unlike the paper's top-n-gram-frequency signal, which
    needs a per-element count (quadratic per doc) and is deliberately
    omitted. Zero shuffle: the words array is bound once in a staged
    projection, each n-gram pass is array slicing in the scan stage.
    """
    words = f"filter(split(text, '{WS}+'), w -> w != '')"
    stage1 = docs.select("doc_id", F.expr(words).alias("_w"))
    cols = [F.col("doc_id")]
    for n in ns:
        grams = (
            f"transform(sequence(0, size(_w) - {n}), "
            f"i -> concat_ws(' ', slice(_w, i + 1, {n})))"
        )
        frac = (
            f"CASE WHEN size(_w) >= {n} THEN "
            f"1.0 - CAST(size(array_distinct({grams})) AS DOUBLE)"
            f" / (size(_w) - {n} + 1) ELSE NULL END"
        )
        cols.append(F.expr(frac).alias(f"dup_{n}gram_frac"))
    return stage1.select(*cols)


def repetition_signals_sql(
    table: str = "documents", ns: tuple[int, ...] = REP_NS
) -> str:
    exprs = []
    for n in ns:
        grams = (
            f"list_transform(range(0, len(_w) - {n} + 1), "
            f"i -> array_to_string(list_slice(_w, i + 1, i + {n}), ' '))"
        )
        exprs.append(
            f"CASE WHEN len(_w) >= {n} THEN "
            f"1.0 - CAST(len(list_distinct({grams})) AS DOUBLE)"
            f" / (len(_w) - {n} + 1) ELSE NULL END AS dup_{n}gram_frac"
        )
    cols = ", ".join(exprs)
    return f"""
      SELECT doc_id, {cols}
      FROM (
        SELECT doc_id,
               list_filter(regexp_split_to_array(text, '{WS}+'), w -> w != '') AS _w
        FROM {table}
      )
    """


# ---------------------------------------------------------------------------
# cross-document repeated-passage mining
# ---------------------------------------------------------------------------

PASSAGE_W = 40  # window width (chars)
PASSAGE_GAP = 10  # expected anchor spacing (chars): 1-in-GAP positions
PASSAGE_ANCHOR_W = 8  # anchor gram width (chars)
PASSAGE_MAX_CHARS = 1_000_000  # per-doc scan cap (memory bound)


def _anchored_wins_expr(
    w_chars: int, gap: int, max_chars: int | None
) -> str:
    """THE Spark rendering of the per-doc DISTINCT anchored-window
    hash list — shared by repeated_passages (corpus discovery) and
    duplication_profile (per-doc ratios) so "window" can never mean
    two different enumerations."""
    from ocr_spark.functions.hashing import md5_long_expr

    t = f"substring(text, 1, {max_chars})" if max_chars else "text"
    a = md5_long_expr(f"substring({t}, p, {PASSAGE_ANCHOR_W})")
    h = md5_long_expr(f"substring({t}, p, {w_chars})")
    return (
        f"CASE WHEN length({t}) >= {w_chars} THEN array_distinct("
        f"transform(filter(sequence(1, length({t}) - {w_chars} + 1),"
        f" p -> {a} % {gap} = 0), p -> {h}))"
        f" ELSE CAST(array() AS ARRAY<BIGINT>) END"
    )


def _anchored_wins_sql(
    w_chars: int, gap: int, max_chars: int | None
) -> str:
    """DuckDB twin of :func:`_anchored_wins_expr` (range() is
    exclusive-stop where Spark sequence() is inclusive — hence the
    +2; both hashes are non-negative so bare % agrees)."""
    from ocr_spark.functions.hashing import md5_long_sql

    t = f"substr(text, 1, {max_chars})" if max_chars else "text"
    a = md5_long_sql(f"substr({t}, p, {PASSAGE_ANCHOR_W})")
    h = md5_long_sql(f"substr({t}, p, {w_chars})")
    return (
        f"list_distinct(CASE WHEN length({t}) >= {w_chars} "
        f"THEN list_transform("
        f"list_filter(range(1, length({t}) - {w_chars} + 2), "
        f"p -> {a} % {gap} = 0), p -> {h}) "
        f"ELSE [] END)"
    )


def repeated_passages(
    docs: DataFrame,
    w_chars: int = PASSAGE_W,
    gap: int = PASSAGE_GAP,
    min_docs: int = 2,
    max_chars: int | None = PASSAGE_MAX_CHARS,
) -> DataFrame:
    """(h, n_docs): hashed ``w_chars``-character windows, anchored at
    CONTENT-DEFINED positions, that appear in >= ``min_docs`` DISTINCT
    documents — the boilerplate/template-passage discovery pass
    (cookie banners, nav chrome, license blurbs) that text-level
    near-dup ops miss because the surrounding document differs.

    Anchoring is content-defined (winnowing-style), NOT fixed-stride:
    a position p is an anchor iff ``hash(text[p : p+ANCHOR_W]) % gap
    == 0`` — a property of the local bytes, so a shared passage
    produces the SAME anchors in every document regardless of where
    the passage starts (a fixed stride only matches passages whose
    offsets agree modulo the stride, i.e. misses ~(gap-1)/gap of real
    shared boilerplate). Expected anchor density is 1 per ``gap``
    chars; a shared passage needs ~w_chars + gap chars of length to
    be detected with high probability.

    Scale shape: anchor selection hashes an ANCHOR_W-gram at every
    position (O(len) short-gram hashes per doc — the honest price of
    alignment-free chunking; ``gap`` controls only the downstream
    window count), full windows are hashed only at anchors, and the
    per-doc hash list is ``array_distinct``ed BEFORE the explode
    (same discipline as contamination.py — a doc can never inflate a
    passage's doc-count, and no corpus-wide distinct shuffle), then
    ONE count shuffle on the 60-bit hash. Output rows are only the
    repeated hashes — recovering the passage text is a candidate-
    driven join-back against this (small) hash set, never a corpus-
    wide carry of window strings through the shuffle.

    Memory bound: the candidate-position array materializes ONE
    element per character before the anchor filter, so an unbounded
    outlier doc would build an outlier-sized array in a single row's
    scan-stage intermediate. ``max_chars`` caps the scanned prefix
    (default 1M chars ≈ 8 MB of positions) — boilerplate repeats in
    the head of a document; mining past the first 1M chars of a
    pathological doc adds nothing. None = unbounded (test corpora).
    """
    if w_chars < 1 or gap < 1:
        raise ValueError("w_chars and gap must be >= 1")
    wins = _anchored_wins_expr(w_chars, gap, max_chars)
    return (
        docs.selectExpr(f"explode({wins}) AS h")
        .groupBy("h")
        .agg(F.count("*").alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
    )


def repeated_passages_sql(
    table: str = "documents",
    w_chars: int = PASSAGE_W,
    gap: int = PASSAGE_GAP,
    min_docs: int = 2,
    max_chars: int | None = PASSAGE_MAX_CHARS,
) -> str:
    """DuckDB twin (range() is exclusive-stop where Spark sequence()
    is inclusive — hence the +2; both hashes are non-negative so bare
    % agrees across engines)."""
    wins = _anchored_wins_sql(w_chars, gap, max_chars)
    return f"""
      SELECT h, count(*) AS n_docs FROM (
        SELECT unnest({wins}) AS h
        FROM {table}
      ) GROUP BY h HAVING count(*) >= {min_docs}
    """

# ---------------------------------------------------------------------------
# cross-document repeated-passage REMOVAL (ExactSubstr-style cut pass)
# ---------------------------------------------------------------------------


def remove_repeated_passages(
    docs: DataFrame,
    w_chars: int = PASSAGE_W,
    gap: int = PASSAGE_GAP,
    min_docs: int = 2,
    max_chars: int | None = PASSAGE_MAX_CHARS,
    max_occ: int | None = None,
) -> DataFrame:
    """(doc_id, text, n_cuts, removed_chars): the cut pass that
    completes :func:`repeated_passages` into ExactSubstr-style dedup
    (Lee et al. 2022, "Deduplicating Training Data Makes Language
    Models Better"): every anchored ``w_chars``-window whose hash is
    shared by >= ``min_docs`` distinct documents is removed from the
    text — except ONE corpus-canonical occurrence PER WINDOW, the
    smallest (doc_id, position).

    Guarantee scope (read before trusting "one occurrence survives"):
    the keep rule is per window hash. When two DIFFERENT repeated
    passages overlap in one document and their canonical copies live
    in different documents, cutting one can excise characters of the
    other's canonical occurrence — overlapping-region text may then
    survive nowhere intact (the same is true of ExactSubstr's
    keep-one-span rule). Disjoint passages — the normal boilerplate
    case — keep exactly one copy.

    Anchoring and window hashing are byte-for-byte those of
    :func:`repeated_passages` (content-defined anchors, 60-bit md5
    windows, per-doc scan cap). The repeated-set rule differs in one
    deliberate way: it counts DISTINCT NON-NULL doc_ids, where the
    discovery op counts input rows (a NULL-id or duplicate-id row
    can raise discovery's count but never drives a cut — a NULL key
    could neither claim a canonical slot nor join its cuts back).
    Scope note: discovery is CROSS-document (>= min_docs distinct
    docs); a window repeated only within one document is never cut.

    Shape at scale: one anchored-occurrence explode (scan stage), one
    shuffle on the 60-bit hash carrying BOTH the repeated-set test
    and the canonical pick, one per-doc shuffle to assemble the
    sorted cut list, one equi-join back to the corpus. The text
    rebuild is a single ``aggregate`` fold over the sorted cut starts
    — kept segments are emitted between cuts with a running
    ``greatest`` cursor, so overlapping cut windows merge for free
    and nothing quadratic ever materializes. Rows with NULL doc_id or
    NULL text pass through unmodified. ``n_cuts`` counts cut WINDOWS
    (pre-merge); ``removed_chars`` is the realized length delta.

    Skew: the h-window puts ALL occurrences of one hash in one task,
    and AQE does not split window partitions — a mega-boilerplate
    window shared by 10^8 docs is a single-task straggler at corpus
    scale. ``max_occ`` (opt-in) excludes hashes with more occurrences
    than the cap from cutting entirely (the safe direction: under-cut,
    never mis-cut; identical rule in the DuckDB twin). The capped path
    localCheckpoints the occurrence table so the pre-count does not
    re-run the explode.
    """
    if w_chars < 1 or gap < 1:
        raise ValueError("w_chars and gap must be >= 1")
    from pyspark.sql import Window

    from ocr_spark.functions.hashing import md5_long_expr

    t = f"substring(text, 1, {max_chars})" if max_chars else "text"
    a = md5_long_expr(f"substring({t}, p, {PASSAGE_ANCHOR_W})")
    h = md5_long_expr(f"substring({t}, p, {w_chars})")
    # explode candidate positions FIRST, then anchor-test with a plain
    # row filter: higher-order-function lambdas are CodegenFallback
    # (interpreted) in Spark, and an interpreted md5-per-character is
    # ~20x slower than the same hash under whole-stage codegen
    # (measured 10.5 s -> 0.55 s on the sf0.1 corpus). The explode
    # emits one narrow row per position inside one codegen stage —
    # nothing shuffles until the h window below.
    occ = (
        docs.where(F.col("doc_id").isNotNull() & F.col("text").isNotNull())
        .selectExpr(
            "doc_id",
            "text",
            f"CASE WHEN length({t}) >= {w_chars} THEN "
            f"sequence(1, length({t}) - {w_chars} + 1)"
            f" ELSE CAST(array() AS ARRAY<INT>) END AS ps",
        )
        .selectExpr("doc_id", "text", "explode(ps) AS p")
        .where(f"{a} % {gap} = 0")
        .selectExpr("doc_id", "p", f"{h} AS h")
    )
    if max_occ is not None:
        # materialize occ ONCE (plan references re-run the explode),
        # then drop hyper-frequent hashes before the skewed window
        occ = occ.localCheckpoint()
        hot = (
            occ.groupBy("h")
            .agg(F.count("*").alias("occ_cnt"))
            .where(F.col("occ_cnt") > max_occ)
            .select("h")
        )
        occ = occ.join(hot, "h", "left_anti")
    # Single pass over occ — the occurrence explode re-hashes every
    # char position, so it must execute ONCE (the plan-reference
    # re-evaluation trap): instead of aggregate-then-join-back, both
    # the repeated-set test and the canonical pick ride one shuffle on
    # h. The distinct-doc count is a lag-marker sum: within the
    # (doc_id, p)-ordered h partition, a row opens a new doc iff the
    # previous row's doc_id differs — summing those markers over the
    # whole partition IS count(DISTINCT doc_id), without a second
    # aggregate or a (h, doc_id)-keyed exchange.
    win = Window.partitionBy("h").orderBy("doc_id", "p")
    whole = Window.partitionBy("h")
    cuts = (
        occ.select(
            "doc_id",
            "p",
            "h",
            F.row_number().over(win).alias("rn"),
            F.when(
                F.lag("doc_id").over(win).isNull()
                | (F.lag("doc_id").over(win) != F.col("doc_id")),
                1,
            )
            .otherwise(0)
            .alias("new_doc"),
        )
        .withColumn("nd", F.sum("new_doc").over(whole))
        .where((F.col("nd") >= min_docs) & (F.col("rn") >= 2))
        .select("doc_id", "p")
    )
    per_doc = cuts.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("p")).alias("starts"),
        F.count("*").alias("n_cuts"),
    )
    # positions are bounded by the scan cap (sequence() emits INT), so
    # the fold cursor stays INT — substring() wants INT arguments
    rebuilt = (
        f"aggregate(starts,"
        f" struct(CAST('' AS STRING) AS acc, 1 AS pos),"
        f" (st, s) -> struct("
        f"concat(st.acc, substring(text, st.pos, greatest(s - st.pos, 0))) AS acc,"
        f" greatest(st.pos, s + {w_chars}) AS pos),"
        f" st -> concat(st.acc, substring(text, st.pos, length(text))))"
    )
    return (
        docs.join(per_doc, "doc_id", "left")
        .selectExpr(
            "doc_id",
            "text AS _orig",
            f"CASE WHEN starts IS NULL THEN text ELSE {rebuilt} END AS text",
            "CAST(coalesce(n_cuts, 0) AS BIGINT) AS n_cuts",
        )
        .selectExpr(
            "doc_id",
            "text",
            "n_cuts",
            "CAST(coalesce(length(_orig) - length(text), 0) AS BIGINT)"
            " AS removed_chars",
        )
    )


def remove_repeated_passages_sql(
    table: str = "documents",
    w_chars: int = PASSAGE_W,
    gap: int = PASSAGE_GAP,
    min_docs: int = 2,
    max_chars: int | None = PASSAGE_MAX_CHARS,
    max_occ: int | None = None,
) -> str:
    """DuckDB twin of :func:`remove_repeated_passages`.

    Independent formulation: where Spark rebuilds via an ``aggregate``
    fold, the twin computes each kept segment's start as a running
    ``max(p + w) OVER (... 1 PRECEDING)`` (overlap merge) and
    reassembles with an ordered ``string_agg`` plus the tail from
    ``max(p) + w``. ``substr`` length is clamped at 0 via the CASE
    (DuckDB rejects negative substring lengths outright).
    """
    from ocr_spark.functions.hashing import md5_long_sql

    t = f"substr(text, 1, {max_chars})" if max_chars else "text"
    a = md5_long_sql(f"substr({t}, p, {PASSAGE_ANCHOR_W})")
    h = md5_long_sql(f"substr({t}, p, {w_chars})")
    # the occurrence-count cap must live in its OWN select — DuckDB
    # rejects window functions in the same select as a lateral unnest
    occ_cap = (
        f"SELECT * FROM occ0"
        f" QUALIFY count(*) OVER (PARTITION BY h) <= {max_occ}"
        if max_occ is not None
        else "SELECT * FROM occ0"
    )
    return f"""
      WITH occ0 AS (
        SELECT doc_id, text,
               unnest(ps) AS p,
               unnest(list_transform(ps, p -> {h})) AS h
        FROM (
          SELECT doc_id, text,
                 CASE WHEN length({t}) >= {w_chars}
                 THEN list_filter(range(1, length({t}) - {w_chars} + 2),
                                  p -> {a} % {gap} = 0)
                 ELSE [] END AS ps
          FROM {table}
          WHERE doc_id IS NOT NULL AND text IS NOT NULL
        )
      ),
      occ AS ({occ_cap}),
      reph AS (
        SELECT h FROM occ GROUP BY h
        HAVING count(DISTINCT doc_id) >= {min_docs}
      ),
      cuts AS (
        SELECT doc_id, p FROM (
          SELECT o.doc_id, o.p,
                 row_number() OVER (PARTITION BY o.h
                                    ORDER BY o.doc_id, o.p) AS rn
          FROM occ o JOIN reph USING (h)
        ) WHERE rn >= 2
      ),
      segs AS (
        SELECT c.doc_id, c.p, d.text,
               coalesce(max(c.p + {w_chars}) OVER (
                   PARTITION BY c.doc_id ORDER BY c.p
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 1)
                 AS seg_start
        FROM cuts c JOIN {table} d USING (doc_id)
      ),
      agg AS (
        SELECT doc_id,
               string_agg(
                 CASE WHEN p > seg_start
                      THEN substr(text, seg_start, p - seg_start)
                      ELSE '' END, '' ORDER BY p) AS head_parts,
               max(p) + {w_chars} AS tail_start,
               count(*) AS n_cuts
        FROM segs GROUP BY doc_id
      )
      SELECT doc_id, text, n_cuts,
             CAST(coalesce(orig_len - length(text), 0) AS BIGINT)
               AS removed_chars
      FROM (
        SELECT d.doc_id,
               CASE WHEN a.doc_id IS NULL THEN d.text
                    ELSE coalesce(a.head_parts, '')
                         || substr(d.text, a.tail_start) END AS text,
               CAST(coalesce(a.n_cuts, 0) AS BIGINT) AS n_cuts,
               length(d.text) AS orig_len
        FROM {table} d LEFT JOIN agg a USING (doc_id)
      )
    """


def duplication_profile(
    docs: DataFrame,
    w_chars: int = PASSAGE_W,
    gap: int = PASSAGE_GAP,
    max_chars: int | None = PASSAGE_MAX_CHARS,
) -> DataFrame:
    """(doc_id, n_windows, n_shared, dup_ppm): per-document fraction
    of anchored character windows that also appear in >= 1 OTHER
    document — the doc-level duplication severity signal the corpus
    reports of large pipelines publish ("X% of docs are >50%
    duplicated content"). repeated_passages answers "which passages
    repeat"; this answers "how much of EACH DOC is repeated", the
    number a curation policy thresholds on (drop docs that are mostly
    boilerplate even when no single near-dup pair exists).

    Window enumeration is the ONE shared skeleton
    (:func:`_anchored_wins_expr` — content-defined anchors, per-doc
    distinct hashes), so a window counted here is exactly a window
    repeated_passages would discover. dup_ppm = (n_shared * 10^6) div
    n_windows; docs too short to carry any window are emitted (never
    dropped) with the -1 sentinel — the span_diff precedent: a NULL
    in an int column turns into NaN through pandas and breaks the
    cross-engine compare, and -1 is unambiguous ("no evidence" vs a
    real 0 = "measured, nothing shared").

    Scale shape: ONE window explode (the per-char anchor hashing is
    the dominant cost — an aggregate-then-join-back would re-execute
    it, the plan-reference re-evaluation trap this module documents),
    one shuffle on the 60-bit hash where a count window marks shared
    rows (per-doc lists are distinct, so the partition row count IS
    the doc count), one per-doc aggregate. ``doc_id`` is
    ID-TYPE-AGNOSTIC throughout.
    """
    from pyspark.sql import Window

    if w_chars < 1 or gap < 1:
        raise ValueError("w_chars and gap must be >= 1")
    wins = _anchored_wins_expr(w_chars, gap, max_chars)
    per_doc = docs.selectExpr("doc_id", f"explode_outer({wins}) AS h")
    shared = (
        F.col("h").isNotNull()
        & (F.count("*").over(Window.partitionBy("h")) >= 2)
    )
    return (
        per_doc.withColumn("_shared", shared)
        .groupBy("doc_id")
        .agg(
            F.count("h").alias("n_windows"),
            F.sum(F.when(F.col("_shared"), 1).otherwise(0)).alias("n_shared"),
        )
        .selectExpr(
            "doc_id",
            "n_windows",
            "CAST(n_shared AS BIGINT) AS n_shared",
            "CASE WHEN n_windows > 0 THEN (n_shared * 1000000) div n_windows"
            " ELSE -1 END AS dup_ppm",
        )
    )


def duplication_profile_sql(
    table: str = "documents",
    w_chars: int = PASSAGE_W,
    gap: int = PASSAGE_GAP,
    max_chars: int | None = PASSAGE_MAX_CHARS,
    id_sql: str = "CAST(doc_id AS BIGINT)",
) -> str:
    """DuckDB twin of :func:`duplication_profile` — same shared
    window skeleton, same integer ppm."""
    wins = _anchored_wins_sql(w_chars, gap, max_chars)
    return f"""
      WITH per_doc AS (
        SELECT doc_id, unnest(CASE WHEN len(w) = 0 THEN [NULL] ELSE w END) AS h
        FROM (SELECT {id_sql} AS doc_id, {wins} AS w FROM {table})
      ),
      flagged AS (
        SELECT doc_id, h,
               (h IS NOT NULL AND
                count(*) OVER (PARTITION BY h) >= 2) AS _shared
        FROM per_doc
      )
      SELECT doc_id,
             CAST(count(h) AS BIGINT) AS n_windows,
             CAST(sum(CASE WHEN _shared THEN 1 ELSE 0 END) AS BIGINT)
               AS n_shared,
             CAST(CASE WHEN count(h) > 0
                  THEN (sum(CASE WHEN _shared THEN 1 ELSE 0 END) * 1000000)
                       // count(h)
                  ELSE -1 END AS BIGINT) AS dup_ppm
      FROM flagged
      GROUP BY doc_id
    """


def _scrub_stage1_expr(src: str) -> str:
    """Spark SQL: email + IPv4 redaction of the string expr ``src``
    (the first half of pii_scrub's staged order). Regex literals are
    backslash-doubled because these strings pass through the SQL
    parser's unescape (the card_lit lesson above)."""
    e1 = EMAIL_RE.replace("\\", "\\\\")
    i1 = IPV4_RE.replace("\\", "\\\\")
    return (
        f"regexp_replace(regexp_replace({src}, '{e1}', '{EMAIL_TOKEN}'), "
        f"'{i1}', '{IP_TOKEN}')"
    )


def _scrub_stage2_expr(src: str) -> str:
    """Spark SQL: Luhn-gated card redaction + phone redaction of
    ``src`` — which MUST be a plain field reference, not a computed
    chain: it is evaluated twice (candidate extraction + fold init),
    so a chained stage-1 here would run its regexes twice per span."""
    c1 = CARD_RE.replace("\\", "\\\\")
    p1 = PHONE_RE.replace("\\", "\\\\")
    valid = (
        f"filter(regexp_extract_all({src}, '{c1}', 0), "
        f"c -> {_luhn_ok_expr()})"
    )
    carded = (
        f"aggregate({valid}, {src}, (acc, c) -> "
        f"regexp_replace(acc, concat('\\\\b', c, '\\\\b'), '{CARD_TOKEN}'))"
    )
    return f"regexp_replace({carded}, '{p1}', '{PHONE_TOKEN}')"


def scrub_spans(docs: DataFrame) -> DataFrame:
    """PII redaction over the NESTED interleaved span table: each
    text span's content goes through the SAME staged sequence as
    :func:`pii_scrub` (emails, IPv4, Luhn-validated cards, phones —
    order-dependent, so the stages share one definition with the flat
    operator); media spans and the structural columns (kind,
    media_ref, offset) pass through untouched, so offsets still line
    up and the output composes with ``interleave_gate`` /
    ``chunk_interleaved`` downstream. Schema-preserving.

    Scale shape: ZERO shuffle — two ``transform`` passes over the
    span array (stage split keeps every regex single-execution per
    span: stage 2 references its input twice, which must be a field,
    not a chain). Higher-order array exprs run interpreted rather
    than codegen'd, but the cost here is the regex work itself,
    identical either way.
    """
    media = "(s.media_ref IS NOT NULL AND s.media_ref <> '')"

    def pass_over(stage_expr: str) -> str:
        return (
            "transform(spans, s -> struct("
            "s.kind AS kind, "
            f"CASE WHEN {media} THEN s.text ELSE {stage_expr} END AS text, "
            "s.media_ref AS media_ref, s.offset AS offset))"
        )

    out = docs.withColumn("spans", F.expr(pass_over(_scrub_stage1_expr("s.text"))))
    return out.withColumn("spans", F.expr(pass_over(_scrub_stage2_expr("s.text"))))


def scrub_spans_sql(spans_sql: str = "SELECT * FROM spans") -> str:
    """DuckDB twin over a FLAT span source — the pii_scrub_sql stage
    chain applied per span row, media rows untouched."""
    media = "(media_ref IS NOT NULL AND media_ref <> '')"
    t2 = (
        f"regexp_replace(regexp_replace(text, '{EMAIL_RE}', "
        f"'{EMAIL_TOKEN}', 'g'), '{IPV4_RE}', '{IP_TOKEN}', 'g')"
    )
    valid = (
        f"list_filter(regexp_extract_all(_t2, '{CARD_RE}'), "
        f"c -> {_luhn_ok_duck()})"
    )
    carded = (
        f"list_reduce(list_prepend(_t2, {valid}), "
        f"(acc, c) -> regexp_replace(acc, '\\b' || c || '\\b', "
        f"'{CARD_TOKEN}', 'g'))"
    )
    return f"""
      WITH src AS ({spans_sql}),
      staged AS (
        SELECT doc_id, kind, media_ref, "offset", text,
               CASE WHEN {media} THEN NULL ELSE {t2} END AS _t2
        FROM src
      )
      SELECT doc_id, kind,
             CASE WHEN {media} THEN text
                  ELSE regexp_replace({carded}, '{PHONE_RE}',
                                      '{PHONE_TOKEN}', 'g') END AS text,
             media_ref, "offset"
      FROM staged
    """
