"""Byte-pair encoding: distributed-corpus training + engine-side
tokenization — the full tokenizer-training loop this repo's
vocab_topk / bpe_pair_counts statistics feed.

Training (:func:`train_bpe`) is the classic Sennrich et al. 2016
procedure run where it belongs at corpus scale: ONE Spark aggregation
produces the (word, count) table (vocabulary-bounded; capped at
``max_vocab`` heavy hitters — the standard trainer cut), and the
merge loop runs driver-side over that bounded table (the
kmeans_centroids / classifier-trainer precedent: corpus-scale
statistics by Spark, operator-scale iteration on the driver).

Encoding (:func:`bpe_token_counts`) runs engine-side WITHOUT Python:
merge i is one ``replace(s, a_i || b_i, placeholder_i)`` over the
word string, placeholders drawn from the Unicode private-use area.
A chained replace applies each merge at every non-overlapping
position left-to-right — exactly how BPE training applied it — so
the chain reproduces symbol-wise BPE encoding precisely (pinned by a
differential test against a pure-Python reference). The chain is
plain string expressions, identical in Spark and DuckDB, so encoding
is oracle-checkable and whole-stage-codegen'd.

Placeholder hygiene: input words containing PUA chars (U+E000..)
could collide with merge placeholders; encoding DELETES those chars
first (the split_sentences sentinel discipline — both twins
identically). PUA chars in real text are vanishingly rare and carry
no training signal.

Determinism: merge selection breaks count ties on the pair's symbol
string ascending, so a retrain on the same corpus is byte-identical.

Reference analog: none (the reference counts characters only);
beyond-reference tokenizer surface (SURVEY.md §2 addenda) alongside
token_counts / vocab_topk / bpe_pair_counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ocr_spark.functions.text import BPE_MAX_WORD_CHARS, words_col
from ocr_spark.schema import WS

PUA_BASE = 0xE000
PUA_END = 0xF8FF  # the BMP private-use area the engine strips
MAX_MERGES = PUA_END - PUA_BASE + 1  # placeholders must stay in-range


def _is_pua(ch: str) -> bool:
    return PUA_BASE <= ord(ch) <= PUA_END


def _placeholder(i: int) -> str:
    return chr(PUA_BASE + i)


def train_bpe_from_counts(
    word_counts: dict[str, int], n_merges: int
) -> list[tuple[str, str]]:
    """Driver-side classic BPE over a (word -> count) table: repeat
    n_merges times {count adjacent symbol pairs weighted by word
    count; merge the most frequent (ties: pair-string ascending)}.
    Merged symbols are PUA placeholders so every symbol stays one
    char and the engine-side replace chain stays exact."""
    if n_merges > MAX_MERGES:
        raise ValueError(
            f"n_merges must be <= {MAX_MERGES}: placeholder code points"
            " past U+F8FF would collide with assigned Unicode outside"
            " the hygiene-stripped PUA range"
        )
    vocab: dict[tuple[str, ...], int] = {}
    for w, c in word_counts.items():
        vocab[tuple(w)] = vocab.get(tuple(w), 0) + c
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        (a, b), _n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        new = _placeholder(len(merges))
        merges.append((a, b))
        nv: dict[tuple[str, ...], int] = {}
        for syms, c in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(new)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            nv[key] = nv.get(key, 0) + c
        vocab = nv
    return merges


def train_bpe(
    docs: DataFrame, n_merges: int = 64, max_vocab: int = 50_000
) -> list[tuple[str, str]]:
    """Corpus-scale BPE training: one token-count aggregation (the
    vocab_topk shape — map-side partials absorb Zipf skew, top
    ``max_vocab`` words via TakeOrderedAndProject) feeds the
    driver-side merge loop. Heavy-hitter capping is the standard
    trainer cut: pair statistics from the top-V words dominate the
    exact statistics (Zipf), and the driver table stays bounded at
    any corpus size. Words containing PUA chars are dropped from
    TRAINING (they would alias merge placeholders)."""
    from ocr_spark.functions.text import vocab_topk

    rows = vocab_topk(docs, k=max_vocab).collect()
    wc: dict[str, int] = {}
    for r in rows:
        # cap hostile whitespace-free mega-words BEFORE the driver
        # loop (the bpe_pair_counts guard), merging truncation twins
        w = r["token"][:BPE_MAX_WORD_CHARS]
        if any(_is_pua(ch) for ch in w):
            continue
        wc[w] = wc.get(w, 0) + r["n"]
    return train_bpe_from_counts(wc, n_merges)


def encode_word_py(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Pure-Python reference encoder (tests + readable tokenization):
    symbols after applying every merge in rank order, each merge
    replacing ALL non-overlapping occurrences left-to-right, then
    placeholders expanded back to their surface strings."""
    s = "".join(ch for ch in word if not _is_pua(ch))
    for i, (a, b) in enumerate(merges):
        s = s.replace(a + b, _placeholder(i))
    surf = surface_forms(merges)
    return [surf.get(ch, ch) for ch in s]


def surface_forms(merges: list[tuple[str, str]]) -> dict[str, str]:
    """placeholder -> the original character string it represents
    (expanded recursively, so it never contains a placeholder)."""
    surf: dict[str, str] = {}
    for i, (a, b) in enumerate(merges):
        ea = surf.get(a, a)
        eb = surf.get(b, b)
        surf[_placeholder(i)] = ea + eb
    return surf


def _strip_pua_expr(col: str) -> str:
    """Spark expr: delete BMP PUA chars [U+E000, U+F8FF] (collision
    hygiene — the same range _is_pua/encode_word_py use). Spark SQL
    string literals unescape backslashes, hence the doubled one."""
    return f"regexp_replace({col}, '[\\\\x{{E000}}-\\\\x{{F8FF}}]', '')"


def _strip_pua_duck(col: str) -> str:
    """DuckDB twin of :func:`_strip_pua_expr` — ONE definition of the
    stripped range per dialect (DuckDB literals keep backslashes)."""
    return f"regexp_replace({col}, '[\\x{{E000}}-\\x{{F8FF}}]', '', 'g')"


def _q_spark(s: str) -> str:
    """Spark SQL single-quoted string literal (backslash escaping)."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _q_duck(s: str) -> str:
    """Standard-SQL single-quoted literal (quote doubling)."""
    return "'" + s.replace("'", "''") + "'"


def _chain(col: str, merges: list[tuple[str, str]], q) -> str:
    e = col
    for i, (a, b) in enumerate(merges):
        e = f"replace({e}, {q(a + b)}, {q(_placeholder(i))})"
    return e


def _surface_case(merges: list[tuple[str, str]], q) -> str:
    surf = surface_forms(merges)
    return (
        "CASE c "
        + " ".join(f"WHEN {q(pl)} THEN {q(s)}" for pl, s in surf.items())
        + " ELSE c END"
    )


def bpe_token_counts(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    k: int = 100,
    max_word_chars: int = BPE_MAX_WORD_CHARS,
) -> DataFrame:
    """(token, n): corpus token frequencies under the trained BPE —
    tokens rendered as their surface strings (single chars for
    unmerged symbols). The encode runs over the aggregated WORD-COUNT
    table (the bpe_pair_counts discipline: the replace chain and the
    symbol explode are vocab-scale, the only corpus-scale cost is the
    one token-count shuffle); ties at rank k break token-ASC."""
    if not merges:
        raise ValueError("merges must be non-empty (train first)")
    wc = (
        docs.select(F.explode(words_col()).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("wn"))
    )
    clean = _strip_pua_expr(f"substring(w, 1, {max_word_chars})")
    enc = _chain(clean, merges, _q_spark)
    case = _surface_case(merges, _q_spark)
    return (
        wc.selectExpr(f"{enc} AS e", "wn")
        .selectExpr(
            "explode(transform(sequence(1, length(e)),"
            " i -> substring(e, i, 1))) AS c",
            "wn",
        )
        .where(F.col("c") != "")
        .selectExpr(f"{case} AS token", "wn")
        .groupBy("token")
        .agg(F.sum("wn").alias("n"))
        .orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(k)
    )


def bpe_token_counts_sql(
    table: str,
    merges: list[tuple[str, str]],
    k: int = 100,
    max_word_chars: int = BPE_MAX_WORD_CHARS,
) -> str:
    """DuckDB twin of :func:`bpe_token_counts` (same replace chain —
    replace() is leftmost-non-overlapping replace-all in both
    engines; sum cast back from HUGEINT)."""
    if not merges:
        raise ValueError("merges must be non-empty (train first)")
    clean = _strip_pua_duck(f"substr(w, 1, {max_word_chars})")
    enc = _chain(clean, merges, _q_duck)
    case = _surface_case(merges, _q_duck)
    return f"""
      SELECT token, n FROM (
        SELECT {case} AS token, CAST(sum(wn) AS BIGINT) AS n FROM (
          SELECT unnest(list_transform(range(1, length(e) + 1),
                        i -> substr(e, i, 1))) AS c,
                 wn
          FROM (
            SELECT {enc} AS e, wn FROM (
              SELECT w, count(*) AS wn FROM (
                SELECT unnest(regexp_split_to_array(text, '{WS}+')) AS w
                FROM {table}
              ) WHERE w <> ''
              GROUP BY w
            )
          )
        ) WHERE c <> ''
        GROUP BY 1
      ) ORDER BY n DESC, token ASC LIMIT {k}
    """


def bpe_doc_token_counts(
    docs: DataFrame, merges: list[tuple[str, str]]
) -> DataFrame:
    """(doc_id, n_bpe_tokens): per-document token counts under the
    trained tokenizer — the budget statistic packing/mixture planning
    actually needs (text.token_counts is the whitespace/regex
    heuristic; this is the real tokenizer's number).

    Whole-text trick: the chained replace runs on the FULL text, not
    per word — valid because no merge symbol contains whitespace, so
    a pair match can never span a word boundary (a space between 'a'
    and 'b' means the substring 'ab' does not occur). After the
    chain, every non-whitespace char is exactly one BPE symbol, so
    the count is length minus whitespace. Scan-stage, zero shuffle,
    whole-stage codegen (the 64-replace chain is ~64 string rewrites
    per doc — bounded, no Python). PUA input chars are deleted first
    (the module's placeholder hygiene); NULL text counts NULL.
    """
    return docs.select(
        "doc_id", bpe_token_count_col(merges).alias("n_bpe_tokens")
    )


def bpe_token_count_col(merges: list[tuple[str, str]]) -> F.Column:
    """The per-row token-count EXPRESSION over a ``text`` column —
    exposed separately so aggregating consumers (jobs/report.py's
    per-source budgets) can compute it inside their own single scan
    instead of joining :func:`bpe_doc_token_counts` back to the
    corpus."""
    return F.expr(bpe_token_count_expr(merges))


def bpe_token_count_expr(
    merges: list[tuple[str, str]], col: str = "text"
) -> str:
    """The Spark SQL token-count expression STRING over the column
    (or any string expression) ``col`` — for consumers that splice it
    into their own expression tree (``interleave.chunk_interleaved``'s
    ``text_cost``: BPE training-budget chunking; the audit's nested
    fold passes ``s.text``). NULL input yields NULL; wrap in coalesce
    where a definite number is required."""
    if not merges:
        raise ValueError("merges must be non-empty (train first)")
    enc = _chain(_strip_pua_expr(col), merges, _q_spark)
    return f"CAST(length(regexp_replace({enc}, '{WS}+', '')) AS BIGINT)"


def bpe_token_count_duck(
    merges: list[tuple[str, str]], col: str = "text"
) -> str:
    """DuckDB dialect twin of :func:`bpe_token_count_expr`."""
    if not merges:
        raise ValueError("merges must be non-empty (train first)")
    enc = _chain(_strip_pua_duck(col), merges, _q_duck)
    return (
        f"CAST(length(regexp_replace({enc}, '{WS}+', '', 'g')) AS BIGINT)"
    )


def bpe_doc_token_counts_sql(
    table: str, merges: list[tuple[str, str]]
) -> str:
    """DuckDB twin of :func:`bpe_doc_token_counts`."""
    return f"""
      SELECT doc_id,
             {bpe_token_count_duck(merges)} AS n_bpe_tokens
      FROM {table}
    """


def bpe_fertility_by_lang(
    docs: DataFrame, merges: list[tuple[str, str]]
) -> DataFrame:
    """(lang_pred, n_docs, n_ws_tokens, n_bpe_tokens, fertility_ppm):
    per-language tokenizer fertility — BPE tokens per whitespace word
    in fixed-point ppm (1,000,000 = 1.0 tokens/word). THE tokenizer-
    equity eval: a tokenizer trained on one language's statistics
    fragments other languages into more tokens per word, silently
    taxing their effective context length and training budget; a
    multilingual corpus owner reads this table before accepting a
    trained merge list.

    fertility_ppm = floor(10^6 * sum n_bpe / sum n_ws) computed as
    ``(b div w) * 10^6 + ((b % w) * 10^6) div w`` — the split form is
    EXACT (floor identity on non-negative ints) and cannot overflow
    int64 at corpus scale, where the naive ``(b * 10^6) div w``
    overflows once a language holds ~9.2e12 tokens (~10 TB of text —
    well under the design point; the kn_bigram_score chained-div
    lesson). NULL when a language has zero whitespace tokens.
    NULL-text docs count 0/0, classify 'und' (lang_pred is never
    NULL), and still appear in n_docs.

    Scale shape: ONE corpus scan computes the language label and both
    counts per row (scan-stage replace-chain + split + argmax CASE —
    the bpe_token_count_col discipline: no join back to the corpus),
    then one |langs|-row map-side-combined aggregate. Zero joins."""
    return fertility_from_counts(
        lang_token_counts(docs, merges)
        .groupBy("lang_pred")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_ws").alias("n_ws_tokens"),
            F.sum("n_bpe").alias("n_bpe_tokens"),
        )
    )


def lang_token_counts(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """(``keep``..., lang_pred, n_ws, n_bpe) per document — THE
    single-scan row projection behind :func:`bpe_fertility_by_lang`,
    exposed so aggregating consumers (jobs/report.py's per-source
    budgets + fertility) can pay the encode chain ONCE and derive
    several groupings from one pass."""
    from ocr_spark.functions.lm import _words_expr
    from ocr_spark.functions.text import lang_pred_expr

    return docs.select(
        *keep,
        F.expr(lang_pred_expr()).alias("lang_pred"),
        F.coalesce(
            F.expr(f"size({_words_expr()})").cast("long"), F.lit(0)
        ).alias("n_ws"),
        F.coalesce(bpe_token_count_col(merges), F.lit(0)).alias("n_bpe"),
    )


def fertility_from_counts(counts: DataFrame) -> DataFrame:
    """THE fertility projection over an aggregated (lang_pred, n_docs,
    n_ws_tokens, n_bpe_tokens) table — the overflow-safe split fixed
    point, one rendering (shared by the operator and the report job so
    the ppm definition cannot fork)."""
    return counts.selectExpr(
        "lang_pred",
        "n_docs",
        "n_ws_tokens",
        "n_bpe_tokens",
        "CASE WHEN n_ws_tokens > 0 THEN"
        " (n_bpe_tokens div n_ws_tokens) * 1000000"
        " + ((n_bpe_tokens % n_ws_tokens) * 1000000) div n_ws_tokens"
        " ELSE NULL END AS fertility_ppm",
    )


def bpe_fertility_by_lang_sql(
    table: str, merges: list[tuple[str, str]]
) -> str:
    """DuckDB twin of :func:`bpe_fertility_by_lang` — same single-scan
    shape (shared lang_pred_sql / _words_sql / encode-chain
    renderings), same overflow-safe split fixed point."""
    from ocr_spark.functions.lm import _words_sql
    from ocr_spark.functions.text import lang_pred_sql

    if not merges:
        raise ValueError("merges must be non-empty (train first)")
    ws = f"coalesce(CAST(len({_words_sql()}) AS BIGINT), 0)"
    enc = _chain(_strip_pua_duck("text"), merges, _q_duck)
    bpe = (
        f"coalesce(CAST(length(regexp_replace({enc}, '{WS}+', '', 'g'))"
        f" AS BIGINT), 0)"
    )
    return f"""
      SELECT lang_pred,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_ws) AS BIGINT) AS n_ws_tokens,
             CAST(sum(n_bpe) AS BIGINT) AS n_bpe_tokens,
             CAST(CASE WHEN sum(n_ws) > 0 THEN
               (sum(n_bpe) // sum(n_ws)) * 1000000
               + ((sum(n_bpe) % sum(n_ws)) * 1000000) // sum(n_ws)
               ELSE NULL END AS BIGINT) AS fertility_ppm
      FROM (
        SELECT {lang_pred_sql()} AS lang_pred, {ws} AS n_ws, {bpe} AS n_bpe
        FROM {table}
      )
      GROUP BY lang_pred
    """
