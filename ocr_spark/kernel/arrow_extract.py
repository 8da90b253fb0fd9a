"""Arrow-native span-extraction kernel (the production hot path).

Same semantics as ocr_spark.kernel.extract (the pandas kernel, which
stays as the executable spec / differential oracle), but operating
directly on pyarrow RecordBatches:

- the ``spans`` list<struct> column is flattened ZERO-COPY into its
  child arrays (kind/text/media_ref/offset) plus a doc index derived
  from the list offsets — no Python dicts are ever materialized;
- string features (lengths, whitespace-run counts, link-token counts)
  run in pyarrow.compute (C++/RE2);
- ordering, truncation, block segmentation and filtering are numpy
  integer array operations.

This matters at scale: the pandas kernel spends its time in
per-element Python regex and dict construction, which also saturates
memory bandwidth and destroys multi-core scaling. The Arrow kernel is
~an order of magnitude faster per core and scales with cores.

Whitespace note: every tokenizing regex uses the shared explicit
class schema.WS — RE2's \\s excludes vertical tab while Java's and
Python's (?a) include it, so \\s itself is never written in paired
regexes. Fixture-parity and differential tests pin equality.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ocr_spark.kernel.extract import (
    _LINK_TOKENS,
    TRUNCATION_NOTE,
    WARN_EMPTY,
    WARN_MALFORMED,
    DEFAULT_CONFIG,
    ExtractConfig,
)
from ocr_spark.schema import (
    WS,
    FURNITURE_KINDS,
    KIND_ERROR,
    KIND_LINK,
    KIND_PICTURE,
    KIND_TRUNCATION_MARKER,
    TABLE_KINDS,
    TRUNCATION_KEEP_KINDS,
)

# kind -> category (see kernel.extract._KIND_CATEGORY); order fixed
_KIND_LIST = [
    "section_header_level_1",
    "page_header",
    "page_footer",
    "list_item",
    "picture",
    "caption",
    *TABLE_KINDS,
]
_CAT_OF_KIND = ["header", "furniture", "furniture", "list", "media", "media"] + [
    "table"
] * len(TABLE_KINDS)
_CATS = ["body", "header", "furniture", "list", "media", "table"]
_CAT_CODE = {c: i for i, c in enumerate(_CATS)}
_KIND_CAT_CODE = np.array(
    [_CAT_CODE[c] for c in _CAT_OF_KIND] + [_CAT_CODE["body"]], dtype=np.int64
)
_HEADER_CODE = _CAT_CODE["header"]


class _Flat:
    """Flat span state: arrow string arrays + numpy int arrays."""

    __slots__ = ("doc_idx", "kind", "text", "media_ref", "offset")

    def __init__(self, doc_idx, kind, text, media_ref, offset):
        self.doc_idx = doc_idx  # np.int64
        self.kind = kind  # pa.StringArray
        self.text = text  # pa.StringArray (nulls filled later)
        self.media_ref = media_ref  # pa.StringArray
        self.offset = offset  # np.int64 (null -> sentinel already handled)

    def take(self, idx: np.ndarray) -> "_Flat":
        pidx = pa.array(idx)
        return _Flat(
            self.doc_idx[idx],
            self.kind.take(pidx),
            self.text.take(pidx),
            self.media_ref.take(pidx),
            self.offset[idx],
        )

    def __len__(self) -> int:
        return len(self.doc_idx)


def _np_int(arr: pa.Array, fill: int) -> np.ndarray:
    """Arrow int array -> int64 numpy with nulls replaced by fill."""
    if arr.null_count:
        arr = pc.fill_null(arr, fill)
    return arr.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)


def _sanitize_and_flatten(batch: pa.RecordBatch):
    """-> (flat sorted by (doc, offset), lens per doc, empty_mask,
    malformed_mask) with malformed docs' spans dropped."""
    n_docs = batch.num_rows
    spans = batch.column("spans")
    if isinstance(spans, pa.ChunkedArray):  # pragma: no cover
        spans = spans.combine_chunks()
    lens = _np_int(pc.list_value_length(spans), 0)
    struct = spans.flatten()
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
    kind = struct.field("kind")
    text = struct.field("text")
    media = struct.field("media_ref")
    off_arr = struct.field("offset")

    bad = pc.is_null(kind).to_numpy(zero_copy_only=False)
    bad |= pc.is_null(off_arr).to_numpy(zero_copy_only=False)
    text_null = pc.is_null(text).to_numpy(zero_copy_only=False)
    not_picture = pc.not_equal(pc.fill_null(kind, ""), KIND_PICTURE).to_numpy(
        zero_copy_only=False
    )
    bad |= text_null & not_picture

    offset = _np_int(off_arr, -(1 << 31))
    empty = lens == 0

    # Fast path (the overwhelmingly common case): no malformed spans
    # and offsets already strictly increasing within each doc ->
    # reuse the flattened child arrays ZERO-COPY, no sort, no take.
    if not bad.any() and len(offset):
        in_order = (offset[1:] > offset[:-1]) | (doc_idx[1:] != doc_idx[:-1])
        if in_order.all():
            malformed = np.zeros(n_docs, dtype=bool)
            if text.null_count:
                text = pc.fill_null(text, "")
            if media.null_count:
                media = pc.fill_null(media, "")
            return _Flat(doc_idx, kind, text, media, offset), lens, empty, malformed

    order = np.lexsort((offset, doc_idx))
    s_doc, s_off = doc_idx[order], offset[order]
    dup = np.zeros(len(order), dtype=bool)
    if len(order) > 1:
        same = (s_doc[1:] == s_doc[:-1]) & (s_off[1:] == s_off[:-1])
        dup[1:] |= same
        dup[:-1] |= same
    bad_sorted = bad[order] | dup

    malformed = np.zeros(n_docs, dtype=bool)
    if bad_sorted.any():
        np.logical_or.at(malformed, s_doc[bad_sorted], True)

    keep = ~malformed[s_doc]
    kept_idx = order[keep]
    flat = _Flat(
        doc_idx[kept_idx],
        kind.take(pa.array(kept_idx)),
        pc.fill_null(text.take(pa.array(kept_idx)), ""),
        pc.fill_null(media.take(pa.array(kept_idx)), ""),
        offset[kept_idx],
    )
    return flat, lens, empty, malformed


def _truncate_doc(
    lens: np.ndarray, is_header: np.ndarray, budget: int, body_cap: float
) -> np.ndarray:
    """Vectorized per-doc truncation decisions (twin of the pandas
    spec's sequential loop, kernel.extract._truncate).

    The running counter cc only ever grows, and body spans contribute
    only while cc < body_cap — so contribution splits into two phases:
    (1) everything contributes until the running total crosses
    body_cap at some span p, (2) after p only headers contribute.
    With two cumulative sums the per-span cc (the value BEFORE each
    span) is closed-form, the kept mask is a comparison, and the hard
    stop (first span with cc + len > budget) is an argmax — no Python
    per-span loop, so a 20k-span giant costs a handful of numpy ops.
    """
    m = len(lens)
    w = lens + 1  # len + joiner, the reference's accounting
    all_prefix = np.concatenate(([0], np.cumsum(w)[:-1]))  # cc before j, phase 1
    # p = first span whose BEFORE-total reaches body_cap
    crossed = all_prefix >= body_cap
    if crossed.any():
        p = int(np.argmax(crossed))
        hdr_prefix = np.concatenate(
            ([0], np.cumsum(np.where(is_header, w, 0))[:-1])
        )
        cc_before = np.where(
            np.arange(m) <= p, all_prefix, all_prefix[p] + hdr_prefix - hdr_prefix[p]
        )
    else:
        cc_before = all_prefix  # cap never reached: phase 1 throughout
    contributes = is_header | (cc_before < body_cap)
    # hard stop: first span (of any kind) with cc_before + len > budget
    over_budget = cc_before + lens > budget
    keep = contributes.copy()
    if over_budget.any():
        stop = int(np.argmax(over_budget))
        keep[stop:] = False
    return keep


def _truncate(flat: _Flat, cfg: ExtractConfig, n_docs: int) -> _Flat:
    """Reference-exact char-budget truncation; only touches the rare
    docs whose serialized length exceeds the budget."""
    tlen = _np_int(pc.utf8_length(flat.text), 0)
    n = len(flat)
    if n == 0:
        return flat
    sum_len = np.bincount(flat.doc_idx, weights=tlen, minlength=n_docs)
    cnt = np.bincount(flat.doc_idx, minlength=n_docs)
    doc_total = sum_len + cnt - 1
    over = doc_total > cfg.max_chars
    if not over.any():
        return flat
    is_header = pc.is_in(
        flat.kind, value_set=pa.array(list(TRUNCATION_KEEP_KINDS))
    ).to_numpy(zero_copy_only=False)
    keep = np.ones(n, dtype=bool)
    body_cap = cfg.max_chars * cfg.body_budget_frac
    markers: list[tuple[int, int]] = []  # (doc, offset)
    for did in np.flatnonzero(over):
        idx = np.flatnonzero(flat.doc_idx == did)
        keep[idx] = _truncate_doc(
            tlen[idx], is_header[idx], cfg.max_chars, body_cap
        )
        markers.append((did, int(flat.offset[idx[-1]]) + 1))
    kept = flat.take(np.flatnonzero(keep))
    m_doc = np.array([m[0] for m in markers], dtype=np.int64)
    m_off = np.array([m[1] for m in markers], dtype=np.int64)
    nm = len(markers)
    out = _Flat(
        np.concatenate([kept.doc_idx, m_doc]),
        pa.concat_arrays([kept.kind.cast(pa.string()), pa.array([KIND_TRUNCATION_MARKER] * nm, pa.string())]),
        pa.concat_arrays([kept.text.cast(pa.string()), pa.array([TRUNCATION_NOTE] * nm, pa.string())]),
        pa.concat_arrays([kept.media_ref.cast(pa.string()), pa.array([""] * nm, pa.string())]),
        np.concatenate([kept.offset, m_off]),
    )
    reorder = np.lexsort((out.offset, out.doc_idx))
    return out.take(reorder)


def _classify(flat: _Flat, cfg: ExtractConfig):
    """-> (kept int32, block_id int32, link_density float64)."""
    n = len(flat)
    n_chars = _np_int(pc.utf8_length(flat.text), 0).astype(np.float64)
    n_words = _np_int(pc.count_substring_regex(flat.text, WS + "+"), 0).astype(
        np.float64
    ) + (n_chars > 0)
    link_hits = np.zeros(n, dtype=np.float64)
    for tok in _LINK_TOKENS:
        link_hits += _np_int(pc.count_substring(flat.text, tok), 0)
    is_link = pc.equal(flat.kind, KIND_LINK).to_numpy(zero_copy_only=False)
    link_density = np.where(
        is_link, 1.0, np.minimum(1.0, link_hits / np.maximum(n_words, 1.0))
    )
    furniture = pc.is_in(
        flat.kind, value_set=pa.array(list(FURNITURE_KINDS))
    ).to_numpy(zero_copy_only=False)
    marker = pc.equal(flat.kind, KIND_TRUNCATION_MARKER).to_numpy(zero_copy_only=False)
    is_text = pc.equal(flat.kind, "text").to_numpy(zero_copy_only=False)
    short_text = is_text & (n_chars < cfg.min_text_chars)
    kept = ~(
        (furniture & cfg.strip_furniture)
        | (link_density > cfg.link_density_threshold)
        | short_text
    ) | marker

    kcode = _np_int(pc.index_in(flat.kind, value_set=pa.array(_KIND_LIST)), len(_KIND_LIST))
    cat = _KIND_CAT_CODE[kcode]
    doc_change = np.empty(n, dtype=bool)
    cat_change = np.empty(n, dtype=bool)
    if n:
        doc_change[0] = True
        doc_change[1:] = flat.doc_idx[1:] != flat.doc_idx[:-1]
        cat_change[0] = True
        cat_change[1:] = cat[1:] != cat[:-1]
    new_block = doc_change | cat_change | (cat == _HEADER_CODE)
    block_id = np.cumsum(new_block)
    # block-density floor (twin of kernel.extract._classify)
    if cfg.min_block_chars > 0 and n:
        body_like = (cat == _CAT_CODE["body"]) | (cat == _CAT_CODE["list"])
        kept_chars = np.where(kept & body_like & ~marker, n_chars, 0.0)
        block_sums = np.bincount(block_id, weights=kept_chars)
        sparse = body_like & (block_sums[block_id] < cfg.min_block_chars)
        kept = (kept & ~sparse) | marker
    first_of_doc = np.zeros(n, dtype=np.int64)
    first_of_doc[doc_change] = block_id[doc_change]
    block_base = np.maximum.accumulate(first_of_doc)
    return kept.astype(np.int32), (block_id - block_base).astype(np.int32), link_density


def _error_docs(lens, empty, malformed):
    """-> (doc positions, warnings) for error rows, in doc order."""
    docs = np.flatnonzero(empty | malformed)
    warns = [WARN_EMPTY if empty[d] else WARN_MALFORMED for d in docs]
    return docs, warns


def _dup_doc_rows(batch: pa.RecordBatch) -> np.ndarray:
    """Bool per row: this row's doc_id violates the input contract —
    NULL, or occurring in more than one row of the batch (one row per
    document). The pandas spec applies the identical rule."""
    enc = batch.column("doc_id").dictionary_encode()
    idx = _np_int(enc.indices, -1)
    counts = np.bincount(idx[idx >= 0], minlength=len(enc.dictionary))
    out = idx < 0  # NULL doc_id
    valid = idx >= 0
    out[valid] |= counts[idx[valid]] > 1
    return out


def _run(batch: pa.RecordBatch, cfg: ExtractConfig):
    flat, lens, empty, malformed = _sanitize_and_flatten(batch)
    # duplicate doc_id rows are malformed (same rule as the pandas
    # spec): their spans are dropped and every such row becomes an
    # error row — never a silent merge of two rows' span lists
    dup = _dup_doc_rows(batch)
    if dup.any():
        malformed = malformed | dup
        keep = ~malformed[flat.doc_idx]
        if not keep.all():
            flat = flat.take(np.flatnonzero(keep))
    if cfg.truncate:
        flat = _truncate(flat, cfg, batch.num_rows)
    kept, block_id, link_density = _classify(flat, cfg)
    if cfg.strip:
        sel = np.flatnonzero(kept == 1)
        flat = flat.take(sel)
        kept, block_id, link_density = kept[sel], block_id[sel], link_density[sel]
    return flat, kept, block_id, link_density, lens, empty, malformed


def extract_flat_batch(
    batch: pa.RecordBatch, cfg: ExtractConfig = DEFAULT_CONFIG
) -> pa.RecordBatch:
    """ANNOTATED_SPAN_SCHEMA output incl. __error__ rows."""
    flat, kept, block_id, link_density, lens, empty, malformed = _run(batch, cfg)
    doc_ids = _doc_ids_array(batch)
    err_docs, err_warns = _error_docs(lens, empty, malformed)
    out_doc = pa.concat_arrays(
        [
            doc_ids.take(pa.array(flat.doc_idx)).cast(pa.string()),
            doc_ids.take(pa.array(err_docs)).cast(pa.string()),
        ]
    )
    ne = len(err_docs)
    cols = [
        out_doc,
        pa.concat_arrays([flat.kind.cast(pa.string()), pa.array([KIND_ERROR] * ne, pa.string())]),
        pa.concat_arrays([flat.text.cast(pa.string()), pa.array(err_warns, pa.string())]),
        pa.concat_arrays([flat.media_ref.cast(pa.string()), pa.array([""] * ne, pa.string())]),
        pa.array(
            np.concatenate([flat.offset, np.full(ne, -1, dtype=np.int64)]), pa.int32()
        ),
        pa.array(np.concatenate([kept, np.zeros(ne, np.int32)]), pa.int32()),
        pa.array(np.concatenate([block_id, np.full(ne, -1, np.int32)]), pa.int32()),
        pa.array(np.concatenate([link_density, np.zeros(ne)]), pa.float64()),
    ]
    names = ["doc_id", "kind", "text", "media_ref", "offset", "kept", "block_id", "link_density"]
    return pa.RecordBatch.from_arrays(cols, names=names)


def _doc_ids_array(batch: pa.RecordBatch) -> pa.Array:
    doc_ids = batch.column("doc_id")
    if isinstance(doc_ids, pa.ChunkedArray):  # pragma: no cover
        doc_ids = doc_ids.combine_chunks()
    # NULL ids violate the contract; their rows are already error rows
    # (_dup_doc_rows) and the non-nullable output schema renders the
    # id as '' in both kernels
    if doc_ids.null_count:
        doc_ids = pc.fill_null(doc_ids.cast(pa.string()), "")
    return doc_ids


def _nested_spans(flat: _Flat, n_docs: int) -> tuple[pa.ListArray, np.ndarray]:
    """Flat (doc-sorted) spans -> (list<struct> spans column with one
    entry per input row, per-row output span counts)."""
    new_lens = np.bincount(flat.doc_idx, minlength=n_docs).astype(np.int64)
    offsets = pa.array(
        np.concatenate([[0], np.cumsum(new_lens)]).astype(np.int32), pa.int32()
    )
    values = pa.StructArray.from_arrays(
        [
            flat.kind.cast(pa.string()),
            flat.text.cast(pa.string()),
            flat.media_ref.cast(pa.string()),
            pa.array(flat.offset, pa.int32()),
        ],
        names=["kind", "text", "media_ref", "offset"],
    )
    return pa.ListArray.from_arrays(offsets, values), new_lens


def extract_nested_batch(
    batch: pa.RecordBatch, cfg: ExtractConfig = DEFAULT_CONFIG
) -> pa.RecordBatch:
    """(doc_id, spans) with extraction applied; error/empty docs come
    back with spans=[] — one output row per input row, same order."""
    flat, *_ = _run(batch, cfg)
    spans_out, _new_lens = _nested_spans(flat, batch.num_rows)
    return pa.RecordBatch.from_arrays(
        [_doc_ids_array(batch).cast(pa.string()), spans_out],
        names=["doc_id", "spans"],
    )


def extract_nested_metrics_batch(
    batch: pa.RecordBatch, cfg: ExtractConfig = DEFAULT_CONFIG
) -> pa.RecordBatch:
    """DOC_WITH_METRICS_SCHEMA: nested extraction output + per-doc
    metrics from ONE kernel execution — the runner's commit shape (the
    round-1 runner ran the kernel twice: once for output, once for
    metrics; at scale that doubles the most expensive stage)."""
    flat, _kept, _bid, _ld, lens, empty, malformed = _run(batch, cfg)
    spans_out, new_lens = _nested_spans(flat, batch.num_rows)
    failed = (empty | malformed).astype(np.int32)  # _run folds dup rows in
    return pa.RecordBatch.from_arrays(
        [
            _doc_ids_array(batch).cast(pa.string()),
            spans_out,
            pa.array(lens, pa.int64()),
            pa.array(new_lens, pa.int64()),
            pa.array(failed, pa.int32()),
        ],
        names=["doc_id", "spans", "n_spans_in", "n_spans_out", "parse_failed"],
    )


def metrics_batch(
    batch: pa.RecordBatch, cfg: ExtractConfig = DEFAULT_CONFIG
) -> pa.RecordBatch:
    """DOC_METRICS_SCHEMA: per-doc spans in/out, failure flags."""
    flat, _kept, _bid, _ld, lens_all, empty_m, malformed_m = _run(batch, cfg)
    kept_counts = np.bincount(flat.doc_idx, minlength=batch.num_rows).astype(np.int64)
    failed = (empty_m | malformed_m).astype(np.int32)
    warn = np.where(empty_m, WARN_EMPTY, np.where(malformed_m, WARN_MALFORMED, ""))
    doc_ids = _doc_ids_array(batch)
    return pa.RecordBatch.from_arrays(
        [
            doc_ids.cast(pa.string()),
            pa.array(lens_all, pa.int64()),
            pa.array(kept_counts, pa.int64()),
            pa.array(failed, pa.int32()),
            pa.array(warn.tolist(), pa.string()),
        ],
        names=["doc_id", "n_spans_in", "n_spans_out", "parse_failed", "warning"],
    )
