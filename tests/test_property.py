"""Property-based tests (hypothesis): Spark operators vs pure-Python
twins on adversarial inputs — whitespace-laced texts, boundary
timestamps. Each example batches many generated rows into ONE Spark
job (per-example Spark roundtrips are the cost driver, so examples
are few and wide: SURVEY §5.2 item 2)."""

import string

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

# words over a tiny alphabet + explicit empties (double-space generator)
_word = st.text(alphabet=string.ascii_lowercase, min_size=0, max_size=6)
_text = st.lists(_word, min_size=1, max_size=80).map(" ".join)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(st.lists(_text, min_size=1, max_size=40))
def test_segmentation_byte_identity_random_whitespace(spark, texts):
    """extract_docs must reproduce the vendored oracle byte-for-byte on
    arbitrary (incl. empty/multi-space) token streams."""
    from kgp.operators.segment import extract_docs
    from kgp.oracle import extracted_text_for_page

    rows = [(f"u{i}", t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "url string, text string")
    got = {
        r["url"]: r["extracted_text"]
        for r in extract_docs(
            df.withColumn("warc_ts", F.current_timestamp())
            .withColumn("html", F.lit(b""))
            .withColumn("lang", F.lit("en"))
        ).collect()
    }
    for url, text in rows:
        assert got[url] == extracted_text_for_page(text), repr(text)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(st.lists(_text, min_size=2, max_size=30))
def test_jaccard_matches_python_sets(spark, texts):
    from kgp.operators.dedup import near_dup_pairs_bruteforce

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in near_dup_pairs_bruteforce(df, threshold=0.0).collect()
    }

    def shingles(t):
        w = t.split(" ")
        if len(w) < 3:
            return {" ".join(w)}
        return {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}

    for i, ta in rows:
        for j, tb in rows:
            if i < j:
                sa, sb = shingles(ta), shingles(tb)
                want = len(sa & sb) / len(sa | sb)
                assert got[(i, j)] == want, (ta, tb)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 3),                       # key
            st.integers(0, 10_000),                  # seconds offset
        ),
        min_size=1,
        max_size=60,
        unique=True,
    )
)
def test_asof_matches_python(spark, rows):
    """asof_join vs a pure-Python per-key scan."""
    from datetime import datetime, timedelta

    from kgp.operators.asof import asof_join

    base = datetime(2024, 1, 1)
    left = [(i, k, base + timedelta(seconds=s))
            for i, (k, s) in enumerate(rows)]
    right = [(k, base + timedelta(seconds=s * 2), 1000 + i)
             for i, (k, s) in enumerate(rows[: len(rows) // 2])]
    # unique (key, ts) on the right for a well-defined answer
    seen = {}
    for k, ts, v in right:
        seen[(k, ts)] = max(v, seen.get((k, ts), -1))
    right = [(k, ts, v) for (k, ts), v in seen.items()]

    ldf = spark.createDataFrame(
        left, "event_id long, k long, ts timestamp")
    rdf = spark.createDataFrame(right, "k long, ts timestamp, snap long")
    got = {r["event_id"]: r["snap"]
           for r in asof_join(ldf, rdf, key="k").collect()}

    for eid, k, ts in left:
        cands = [(rts, v) for rk, rts, v in right
                 if rk == k and rts <= ts]
        want = max(cands)[1] if cands else None
        assert got[eid] == want, (eid, k, ts)
