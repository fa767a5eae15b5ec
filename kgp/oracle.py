"""Vendored pure-Python oracle of the judged semantics (no Spark).

This module is the *pinned twin* of the pipeline: a row-at-a-time
reimplementation of exactly what the reference computes for one document.
Tests assert the Spark pipeline equals this oracle byte-for-byte
(extracted text) and set-for-set (triples, P/R target 1.0).

Pinned semantics and their reference citations:

* Segmentation (``segment_entries``): port of the windowing algorithm at
  /root/reference/src/ingest/youtube.py:111-164 —
  - ``current_segment_start`` initialises to 0.0 (line 119), so a
    transcript whose first entry starts < 30s produces a FIRST SEGMENT
    WITH A LEADING SPACE (line 120 initialises text to ``""`` and line
    148 appends ``" " + text`` with no strip).
  - A new segment begins when ``entry.start >= current_start + 30.0``
    (line 130); the closed segment's end is the *triggering entry's
    start* (line 136).
  - The final segment's end is ``last.start + last.duration`` (line 153).
  - Entries inside a segment are joined ``current += " " + text`` with
    NO strip (line 148) — whitespace quirks in entry text survive.
  - Segments with empty accumulated text are never emitted (132, 152).

* Full-document text (``full_text``): ``" ".join(seg.text)`` —
  /root/reference/src/ingest/youtube.py:227. This is the
  byte-identical-extracted-text-per-url invariant.

* Entity extraction (``extract_mentions``): the reference contract is
  `extract_entities(text) -> List[str]` keeping spaCy entities with
  labels in {PERSON, ORG, GPE, PRODUCT}
  (/root/reference/src/kg/entity_extraction.py:30) then de-duplicating
  via ``list(set(...))`` (line 31 — hash-order nondeterministic).
  spaCy is not installed in this sandbox (the reference itself degrades
  to ``[]`` then, entity_extraction.py:42-54), so the pluggable
  extractor here is a deterministic gazetteer matcher shared verbatim
  with the Spark side, and the de-dup order is PINNED to
  first-occurrence (deliberate, documented deviation absorbed by the
  P/R ≥ 0.95 tolerance; we target 1.0 extractor-matched).

* Triple construction (``triples_for_doc``): port of
  /root/reference/src/kg/gremlin_client.py:102-135 —
  cap ``entities[:10]`` AFTER the label filter (line 115),
  ``entity_id = f"entity:{entity.lower().replace(' ', '_')}"`` (116),
  ``edge_id = f"edge:{doc_id}:{entity_id}:contains_entity"`` (127),
  predicate constant ``contains_entity`` (126-132).
"""

from __future__ import annotations

from dataclasses import dataclass

from kgp.constants import (
    ENTITY_LABELS,
    MAX_ENTITIES_PER_DOC,
    PRED_CONTAINS_ENTITY,
    SECONDS_PER_TOKEN,
    SEGMENT_WINDOW_SECONDS,
    TOKENS_PER_ENTRY,
)


@dataclass(frozen=True)
class Entry:
    start: float
    duration: float
    text: str


@dataclass(frozen=True)
class Segment:
    seg_idx: int
    start: float
    end: float
    text: str


# --------------------------------------------------------------------------
# page text -> deterministic transcript entries
# --------------------------------------------------------------------------

def page_entries(text: str) -> list[Entry]:
    """Derive deterministic timed entries from page text.

    ``text.split(" ")`` is lossless (empty strings preserve runs of
    spaces), so joining all entry texts with " " reconstructs ``text``
    byte-identically.
    """
    tokens = text.split(" ")
    entries: list[Entry] = []
    t = 0.0
    for i in range(0, len(tokens), TOKENS_PER_ENTRY):
        chunk = tokens[i : i + TOKENS_PER_ENTRY]
        dur = SECONDS_PER_TOKEN * len(chunk)
        entries.append(Entry(start=t, duration=dur, text=" ".join(chunk)))
        t += dur
    return entries


# --------------------------------------------------------------------------
# segmentation — exact reference algorithm
# --------------------------------------------------------------------------

def segment_entries(
    entries: list[Entry], window: float = SEGMENT_WINDOW_SECONDS
) -> list[Segment]:
    """Reference windowing (youtube.py:111-164), including all quirks."""
    segments: list[Segment] = []
    cur_start = 0.0
    cur_text = ""
    for entry in entries:
        if entry.start >= cur_start + window:
            if cur_text:
                segments.append(
                    Segment(len(segments), cur_start, entry.start, cur_text)
                )
            cur_start = entry.start
            cur_text = entry.text
        else:
            cur_text += " " + entry.text
    if cur_text:
        final_end = (
            entries[-1].start + entries[-1].duration
            if entries
            else cur_start + window
        )
        segments.append(Segment(len(segments), cur_start, final_end, cur_text))
    return segments


def full_text(segments: list[Segment]) -> str:
    """Legacy whole-document projection (youtube.py:227)."""
    return " ".join(s.text for s in segments)


def extracted_text_for_page(text: str) -> str:
    """End-to-end: page text -> entries -> segments -> joined text.

    For any page whose first entry starts at 0.0 this equals
    ``" " + text`` (the reference's leading-space quirk).
    """
    return full_text(segment_entries(page_entries(text)))


# --------------------------------------------------------------------------
# gazetteer mention extraction — the pluggable deterministic extractor
# --------------------------------------------------------------------------

def extract_mentions(
    text: str, gazetteer: list[tuple[str, str]]
) -> list[tuple[str, str, int]]:
    """Whole-token gazetteer matches: (surface, label, first_offset).

    A surface matches iff ``" "+surface+" "`` occurs in ``" "+text+" "``
    (texts are space-tokenised). first_offset is the character index of
    the surface in ``text``. Results ordered by (first_offset, surface)
    — the pinned first-occurrence order replacing the reference's
    nondeterministic ``list(set(...))``.
    """
    padded = " " + text + " "
    out = []
    for surface, label in gazetteer:
        pos = padded.find(" " + surface + " ")
        if pos >= 0:
            out.append((surface, label, pos))
    out.sort(key=lambda m: (m[2], m[0]))
    return out


def extract_entities(text: str, gazetteer: list[tuple[str, str]]) -> list[str]:
    """Reference `extract_entities` contract: label-filtered surfaces."""
    return [
        s
        for s, lab, _ in extract_mentions(text, gazetteer)
        if lab in ENTITY_LABELS
    ]


# --------------------------------------------------------------------------
# triple construction
# --------------------------------------------------------------------------

def normalize_entity_id(surface: str) -> str:
    """gremlin_client.py:116 — ``entity:{lower, ALL spaces→underscores}``."""
    return "entity:" + surface.lower().replace(" ", "_")


def triples_for_doc(
    doc_id: str, content: str, gazetteer: list[tuple[str, str]]
) -> list[tuple[str, str, str, str]]:
    """(subj, pred, obj, edge_id) rows — gremlin_client.py:113-132."""
    entities = extract_entities(content, gazetteer)
    rows = []
    for surface in entities[:MAX_ENTITIES_PER_DOC]:
        entity_id = normalize_entity_id(surface)
        edge_id = f"edge:{doc_id}:{entity_id}:{PRED_CONTAINS_ENTITY}"
        rows.append((doc_id, PRED_CONTAINS_ENTITY, entity_id, edge_id))
    return rows


def triples_for_page(
    url: str, text: str, gazetteer: list[tuple[str, str]]
) -> list[tuple[str, str, str, str]]:
    """Pipeline twin: doc_id namespaced ``page:{url}`` and NER runs on the
    *extracted* text (the reference extracts from the stored full text,
    gremlin_client.py:112)."""
    return triples_for_doc(
        "page:" + url, extracted_text_for_page(text), gazetteer
    )
