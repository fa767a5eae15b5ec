"""Pinned gazetteers / alias dictionaries (deterministic, no external data).

Two gazetteers:

* ``PAGES_GAZETTEER`` — used by the synthetic `pages` pipeline. Entity
  surfaces are injected into synthetic page text by kgp.synth, so the
  extractor has real hits. Includes multi-word surfaces, shared-prefix
  overlaps, aliases of one canonical entity (for linking X2), and decoy
  labels that the P3 filter must drop.

* ``DOCS_GAZETTEER`` — defined over the driver `documents` table's
  natural vocabulary (lowercase SQL-ish words), so gazetteer-match NER
  queries run on the provided tables with a DuckDB oracle. Labels are
  arbitrary-but-fixed; semantics exercised are match/offset/order/cap,
  not real-world NER.

Both are embedded as literals so the Spark side and the SQL oracle share
one source of truth (``*_sql_values`` renders the VALUES clause).
"""

from __future__ import annotations

# (surface, label, canonical_id). label EVENT/WORK_OF_ART are decoys the
# P3 filter (entity_extraction.py:30) must drop.
PAGES_GAZETTEER: list[tuple[str, str, str]] = [
    ("Ada Lovelace", "PERSON", "entity:ada_lovelace"),
    ("A. Lovelace", "PERSON", "entity:ada_lovelace"),
    ("Lovelace", "PERSON", "entity:ada_lovelace"),
    ("Alan Turing", "PERSON", "entity:alan_turing"),
    ("Turing", "PERSON", "entity:alan_turing"),
    ("Grace Hopper", "PERSON", "entity:grace_hopper"),
    ("Hopper", "PERSON", "entity:grace_hopper"),
    ("Katherine Johnson", "PERSON", "entity:katherine_johnson"),
    ("Margaret Hamilton", "PERSON", "entity:margaret_hamilton"),
    ("Hamilton", "PERSON", "entity:margaret_hamilton"),
    ("Linus Torvalds", "PERSON", "entity:linus_torvalds"),
    ("Tim Berners-Lee", "PERSON", "entity:tim_berners-lee"),
    ("Berners-Lee", "PERSON", "entity:tim_berners-lee"),
    ("Acme Corp", "ORG", "entity:acme_corp"),
    ("Acme Corporation", "ORG", "entity:acme_corp"),
    ("Initech", "ORG", "entity:initech"),
    ("Globex", "ORG", "entity:globex"),
    ("Globex Inc", "ORG", "entity:globex"),
    ("Umbrella Labs", "ORG", "entity:umbrella_labs"),
    ("Stark Industries", "ORG", "entity:stark_industries"),
    ("Wayne Enterprises", "ORG", "entity:wayne_enterprises"),
    ("Tyrell Corp", "ORG", "entity:tyrell_corp"),
    ("Hooli", "ORG", "entity:hooli"),
    ("Pied Piper", "ORG", "entity:pied_piper"),
    ("Zurich", "GPE", "entity:zurich"),
    ("Nairobi", "GPE", "entity:nairobi"),
    ("Osaka", "GPE", "entity:osaka"),
    ("Lima", "GPE", "entity:lima"),
    ("Montreal", "GPE", "entity:montreal"),
    ("Cape Town", "GPE", "entity:cape_town"),
    ("New Delhi", "GPE", "entity:new_delhi"),
    ("Reykjavik", "GPE", "entity:reykjavik"),
    ("Spark Engine", "PRODUCT", "entity:spark_engine"),
    ("HyperWidget", "PRODUCT", "entity:hyperwidget"),
    ("HyperWidget Pro", "PRODUCT", "entity:hyperwidget_pro"),
    ("Quantum Drive", "PRODUCT", "entity:quantum_drive"),
    ("NimbusDB", "PRODUCT", "entity:nimbusdb"),
    ("FluxCapacitor", "PRODUCT", "entity:fluxcapacitor"),
    # decoys — present in text, dropped by the label filter:
    ("Moon Landing", "EVENT", "entity:moon_landing"),
    ("Mona Lisa", "WORK_OF_ART", "entity:mona_lisa"),
]

# Extractor view: (surface, label) only.
PAGES_SURFACES: list[tuple[str, str]] = [
    (s, lab) for s, lab, _ in PAGES_GAZETTEER
]

# Alias dictionary for entity linking (X2): surface -> canonical_id.
ALIAS_DICT: list[tuple[str, str, str]] = PAGES_GAZETTEER

# Gazetteer over the driver `documents` vocabulary (lowercase words that
# actually occur in /root/testdata/sf*/documents.parquet). Multi-word
# surfaces exercise multi-token matching; EVENT rows are decoys.
DOCS_GAZETTEER: list[tuple[str, str]] = [
    ("spark", "PRODUCT"),
    ("customer", "PERSON"),
    ("merge join", "PRODUCT"),
    ("table scan", "PRODUCT"),
    ("window", "ORG"),
    ("stream", "GPE"),
    ("filter", "ORG"),
    ("hash", "GPE"),
    ("batch", "PERSON"),
    ("agg", "ORG"),
    ("sort", "GPE"),
    ("line", "EVENT"),   # decoy: filtered by P3
    ("query", "EVENT"),  # decoy: filtered by P3
]


# Alias dictionary over the documents gazetteer (X2 linking on the
# driver tables): surface → canonical_id. "window" and "agg" share one
# canonical id so canonicalization (X5) has a real merge to perform.
DOCS_ALIAS: list[tuple[str, str]] = [
    ("spark", "canon:spark"),
    ("merge join", "canon:join_ops"),
    ("table scan", "canon:scan_ops"),
    ("window", "canon:analytics_ops"),
    ("agg", "canon:analytics_ops"),
    ("hash", "canon:hash"),
    ("sort", "canon:sort"),
    ("stream", "canon:stream"),
    ("filter", "canon:filter"),
]


def docs_alias_sql_values() -> str:
    rows = ", ".join(f"('{s}', '{c}')" for s, c in DOCS_ALIAS)
    return f"(VALUES {rows}) AS ad(surface, canonical_id)"


def sql_values(gaz: list[tuple[str, str]]) -> str:
    """Render (surface, label) pairs as a SQL VALUES table literal."""
    rows = ", ".join(f"('{s}', '{lab}')" for s, lab in gaz)
    return f"(VALUES {rows}) AS gaz(surface, label)"


def alias_sql_values() -> str:
    rows = ", ".join(
        f"('{s}', '{lab}', '{c}')" for s, lab, c in PAGES_GAZETTEER
    )
    return f"(VALUES {rows}) AS alias(surface, label, canonical_id)"
