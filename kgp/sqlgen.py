"""Shared DuckDB-oracle SQL builders.

One source of truth for SQL fragments that must mirror a Spark
operator exactly on MORE THAN ONE input table — a second hand-written
copy is a silent-divergence risk when the operator's constants (K,
band layout, digest family) change.
"""

from __future__ import annotations


def minhash_pairs_sql(
    source: str, threshold: float, prefix: str = ""
) -> str:
    """Full MinHash-LSH near-dup pair SQL over ``source``, a SELECT
    producing columns (id, text). Mirrors
    kgp.operators.linking.{shingles_col, minhash_signature (oracle
    family), lsh_bands, lsh_candidate_pairs} +
    score_candidates_jaccard; output columns (id_a, id_b, jaccard).

    ``prefix`` lets callers prepend their own CTEs (e.g. the
    materialized-pages CTE); it must end with ',' when non-empty.
    """
    from kgp.operators.linking import LSH_BANDS, LSH_ROWS, MINHASH_K

    sig_cols = ", ".join(
        f"min(substr(d, {i * 8 + 1}, 8)) AS h{i}"
        for i in range(MINHASH_K)
    )

    def band_key(b: int) -> str:
        cols = [f"h{b * LSH_ROWS + r}" for r in range(LSH_ROWS)]
        return "md5(" + " || '|' || ".join(cols) + ")"

    band_selects = "\nUNION ALL ".join(
        f"SELECT id, {b} AS band_idx, {band_key(b)} AS band_key FROM sig"
        for b in range(LSH_BANDS)
    )
    return f"""
WITH {prefix}
wt AS (SELECT id, string_split(text, ' ') AS w FROM ({source})),
sh AS (SELECT id,
         CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
              ELSE list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                  FOR i IN range(1, len(w) - 1)])
         END AS sh
       FROM wt),
ex AS (SELECT id, sha256(unnest(sh)) || md5(unnest(sh)) AS d FROM sh),
sig AS (SELECT id, {sig_cols} FROM ex GROUP BY id),
bands AS ({band_selects}),
cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
         FROM bands a JOIN bands b
           ON a.band_idx = b.band_idx AND a.band_key = b.band_key
          AND a.id < b.id)
SELECT * FROM (
  SELECT c.id_a, c.id_b,
         CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
           / CAST(len(list_distinct(list_concat(sa.sh, sb.sh))) AS DOUBLE)
           AS jaccard
  FROM cand c
  JOIN sh sa ON sa.id = c.id_a
  JOIN sh sb ON sb.id = c.id_b
) WHERE jaccard >= {threshold}
"""
