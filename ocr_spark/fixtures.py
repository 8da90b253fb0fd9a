"""Deterministic test corpora (FIXTURES.md) + reference golden fixtures.

Two sources of truth:
1. ``generate_corpus`` — seeded synthetic interleaved corpus with the
   exact distribution FIXTURES.md §1 prescribes (log-normal sizes, 1%
   giant skew tail, 10% empty docs, 2% malformed docs, vi+en text).
   No wall clock, no uuid4 (contra /root/reference/webapp/state.py:454).
2. ``reference_fixture_docs`` — the five real DocTags streams checked
   into /root/reference/parsing_results.json (lines 28,54,83,112,140),
   parsed into (kind, text, media_ref, offset) sequences. These are the
   authoritative span-sequence-equality fixtures (north rule).
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from ocr_spark.kernel.doctags import parse_doctags

REFERENCE_RESULTS = Path("/root/reference/parsing_results.json")
FROZEN_DIR = Path(__file__).resolve().parent.parent / "tests" / "fixtures" / "reference_spans"

_VI_WORDS = (
    "giấy chứng nhận nghỉ việc hưởng bảo hiểm xã hội bệnh viện đa khoa "
    "người bệnh ngày sinh mã số thẻ phòng khám điều trị ngoại trú số seri "
    "họ và tên đơn vị làm việc chẩn đoán phương pháp"
).split()
_EN_WORDS = (
    "the patient was admitted for treatment and discharged after review "
    "of records the certificate confirms absence from work under social "
    "insurance regulation form number series issued by clinic"
).split()
_LINK_WORDS = ["http://example.com/a", "https://portal.gov.vn/x", "www.bhxh.vn"]

KIND_CHOICES = [
    ("text", 0.60),
    ("list_item", 0.10),
    ("section_header_level_1", 0.08),
    ("picture", 0.06),
    ("page_header", 0.05),
    ("page_footer", 0.04),
    ("link", 0.04),
    ("caption", 0.03),
]


def _make_text(rng: np.random.Generator, kind: str, vi: bool) -> str:
    if kind == "picture":
        return ""
    if kind == "link":
        n = rng.integers(1, 4)
        return " ".join(rng.choice(_LINK_WORDS, size=n))
    words = _VI_WORDS if vi else _EN_WORDS
    n = int(rng.integers(2, 14))
    return " ".join(rng.choice(words, size=n))


def generate_corpus(
    n_docs: int = 1000,
    seed: int = 42,
    giant_frac: float = 0.01,
    empty_frac: float = 0.10,
    malformed_frac: float = 0.02,
) -> list[dict]:
    """Rows of (doc_id, spans) matching BASELINE.json input_hint."""
    rng = np.random.default_rng(seed)
    kinds = [k for k, _ in KIND_CHOICES]
    probs = np.array([p for _, p in KIND_CHOICES])
    probs = probs / probs.sum()
    docs = []
    for i in range(n_docs):
        doc_id = f"doc-{i:08d}"
        r = rng.random()
        if r < empty_frac:
            docs.append({"doc_id": doc_id, "spans": []})
            continue
        if r < empty_frac + giant_frac:
            n_spans = int(rng.integers(2_000, 20_000))
        else:
            n_spans = max(1, int(rng.lognormal(mean=np.log(40), sigma=0.8)))
        vi = rng.random() < 0.5
        kind_seq = rng.choice(kinds, size=n_spans, p=probs)
        pic = 0
        spans = []
        for off, kind in enumerate(kind_seq):
            media = ""
            if kind == "picture":
                media = f"img-{i:06d}-{pic}"
                pic += 1
            spans.append(
                {
                    "kind": str(kind),
                    "text": _make_text(rng, str(kind), vi),
                    "media_ref": media,
                    "offset": off,
                }
            )
        malformed = rng.random() < malformed_frac
        if malformed and n_spans >= 2:
            j = int(rng.integers(0, n_spans - 1))
            mode = int(rng.integers(0, 2))
            if mode == 0 and spans[j]["kind"] != "picture":
                spans[j]["text"] = None  # null text -> failure row
            else:
                spans[j + 1]["offset"] = spans[j]["offset"]  # dup offset
        docs.append({"doc_id": doc_id, "spans": spans})
    return docs


def corpus_df(spark, **kwargs):
    """Corpus as a Spark DataFrame with the canonical schema."""
    from ocr_spark.schema import DOC_SCHEMA

    rows = generate_corpus(**kwargs)
    return spark.createDataFrame(
        [(d["doc_id"], [tuple(s.values()) for s in d["spans"]]) for d in rows],
        schema=DOC_SCHEMA,
    )


def reference_fixture_docs() -> list[dict]:
    """Parse the 5 golden DocTags streams -> expected span sequences."""
    with open(REFERENCE_RESULTS, encoding="utf-8") as f:
        data = json.load(f)
    out = []
    for doc in data["documents"]:
        stream = doc.get("raw_preview", {}).get("first_1000_chars", "")
        out.append(
            {
                "doc_id": Path(doc["file_path"]).stem.replace(" ", "_"),
                "spans": parse_doctags(stream),
            }
        )
    return out


def freeze_reference_fixtures(target: Path = FROZEN_DIR) -> list[Path]:
    """Write the parsed golden sequences to tests/fixtures/ as JSON
    (FIXTURES.md §2 format) so the suite runs without /root/reference."""
    target.mkdir(parents=True, exist_ok=True)
    paths = []
    for doc in reference_fixture_docs():
        p = target / f"{doc['doc_id']}.json"
        with open(p, "w", encoding="utf-8") as f:
            json.dump(doc, f, ensure_ascii=False, indent=1)
        paths.append(p)
    return paths


def frozen_fixture_docs(target: Path = FROZEN_DIR) -> list[dict]:
    docs = []
    for p in sorted(target.glob("*.json")):
        with open(p, encoding="utf-8") as f:
            docs.append(json.load(f))
    return docs


if __name__ == "__main__":
    for p in freeze_reference_fixtures():
        print("wrote", p)
