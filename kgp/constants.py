"""Pinned semantics constants.

Every value here is a *semantics* constant of the reference engine
(ZGTR/multimodal-rag-knowledgegraph); changing one changes the judged
output set. Citations are into /root/reference/.
"""

# Temporal segmentation window in seconds.
# Ref: src/ingest/youtube.py:118 (segment_duration = 30.0).
SEGMENT_WINDOW_SECONDS = 30.0

# Entity labels kept by the extraction predicate (P3).
# Ref: src/kg/entity_extraction.py:30.
ENTITY_LABELS = ("PERSON", "ORG", "GPE", "PRODUCT")

# Per-document entity cap applied AFTER the label filter (A1/T4).
# Ref: src/kg/gremlin_client.py:115 (`for entity in entities[:10]`).
MAX_ENTITIES_PER_DOC = 10

# The single predicate the reference emits for doc→entity edges.
# Ref: src/kg/gremlin_client.py:126-132.
PRED_CONTAINS_ENTITY = "contains_entity"

# Content-node text truncation (P4). Ref: src/kg/gremlin_client.py:108.
CONTENT_TRUNCATE_CHARS = 500

# Mock-embedding dimensionality of the reference vector store.
# Ref: src/rag/vector_store.py:18. Tests use 64 to match driver fixtures.
EMBEDDING_DIM = 1536

# --- Page → transcript-entry derivation (this engine's deterministic rule) ---
# The reference segments *transcripts* (list of timed entries). Web pages
# have no timing, so we derive entries deterministically from `text`:
# split on single spaces (lossless: " ".join(parts) == text byte-identically),
# group TOKENS_PER_ENTRY tokens per entry, start_i = sum of previous
# durations, duration = SECONDS_PER_TOKEN * n_tokens. The reference
# windowing algorithm (src/ingest/youtube.py:111-164) then runs unchanged.
TOKENS_PER_ENTRY = 12
SECONDS_PER_TOKEN = 0.5

# Synthetic-data seed (BASELINE.json: "synthesise deterministically").
SYNTH_SEED = 42
