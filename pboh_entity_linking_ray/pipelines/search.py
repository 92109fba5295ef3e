"""Full-text retrieval over the documents table: inverted keyword search.

q55: multi-term phrase queries against the corpus, scored with the same
integer-exact tf·⌊W/df⌋ weighting as the TF-IDF join (textops.q44) so
the DuckDB twin matches bit-for-bit (no float idf drift), ranked top-k
per query with deterministic (score DESC, doc_id ASC) tie-breaks.

Shape, 100 TB-first:
- The query set is code/config — a handful of terms.  Pass 1 computes
  each term's EXACT document frequency with per-batch partials (a doc
  lives wholly in its row, so a batch's df contribution is exact) and a
  driver-side sum over O(|terms| × blocks) tiny rows — the corpus is
  never collected.
- Pass 2 re-scans, prunes each doc's bigrams to the query-term set
  inside the batch (one vectorized polars pass — the inverted index is
  implicit, built per batch, never materialized), maps terms to the
  queries containing them, sums per (query, doc) in-batch, and feeds
  ``topk_per_group`` — whose combiner forwards at most k rows per query
  per batch, so the only exchange moves O(k × |queries|) rows.

Both passes prune at the scan (doc_id, text only).  The reference has
no retrieval operator; this extends its fuzzy mention lookup family
(index/MentEntsFreqIndexWrapper.scala) to corpus-scale ranked search.
"""

from __future__ import annotations

import pyarrow as pa

SEARCH_W_SCALE = 100_000
SEARCH_TOP_K = 10

# query_id → 2-token phrases (terms may be shared between queries)
SEARCH_QUERIES: dict[str, list[str]] = {
    "scan_ops": ["table scan", "row scan"],
    "join_ops": ["hash join", "sort merge"],
    "stream_ops": ["stream batch", "window agg"],
}
_TERMS = sorted({t for ts in SEARCH_QUERIES.values() for t in ts})


def _docs(sf_dir: str):
    from .relational import _t
    return _t(sf_dir, "documents", ["doc_id", "text"])


def _doc_term_tf(t: pa.Table):
    """polars frame (doc_id, term, tf) pruned to the query-term set."""
    import polars as pl

    df = pl.DataFrame({
        "doc_id": pl.from_arrow(t["doc_id"].combine_chunks()).cast(pl.Int64),
        "tok": pl.from_arrow(t["text"].combine_chunks())
                 .str.to_lowercase().str.extract_all("[a-z0-9]+"),
    }).explode("tok").drop_nulls("tok")
    return (df.with_columns(
                pl.concat_str([pl.col("tok"),
                               pl.col("tok").shift(-1).over("doc_id")],
                              separator=" ").alias("term"))
            .filter(pl.col("term").is_in(_TERMS))
            .group_by("doc_id", "term").agg(pl.len().cast(pl.Int64).alias("tf")))


def _term_dfs(sf_dir: str) -> dict[str, int]:
    """Exact per-term document frequency: per-batch partials (exact,
    docs are row-local) summed on the driver — O(|terms|) state."""
    def part(t: pa.Table) -> pa.Table:
        import polars as pl

        g = _doc_term_tf(t).group_by("term").agg(
            pl.len().cast(pl.Int64).alias("df"))
        return pa.table({"term": g["term"].to_arrow().cast(pa.string()),
                         "df": g["df"].to_arrow()})

    dfs: dict[str, int] = {}
    for b in (_docs(sf_dir)
              .map_batches(part, batch_format="pyarrow", batch_size=1024)
              .iter_batches(batch_format="pyarrow")):
        for term, n in zip(b["term"].to_pylist(), b["df"].to_pylist()):
            dfs[term] = dfs.get(term, 0) + n
    return dfs


def q55_keyword_search(sf_dir: str):
    from ..functions.grouping import topk_per_group

    dfs = _term_dfs(sf_dir)
    w = {t: SEARCH_W_SCALE // dfs[t] for t in dfs}          # ⌊W/df⌋, exact
    term_rows = [(q, t) for q, ts in SEARCH_QUERIES.items() for t in ts]

    def score(t: pa.Table) -> pa.Table:
        import polars as pl

        tf = _doc_term_tf(t)
        qmap = pl.DataFrame({
            "query_id": [q for q, _ in term_rows],
            "term": [t_ for _, t_ in term_rows],
            "w": pl.Series([w.get(t_, 0) for _, t_ in term_rows],
                           dtype=pl.Int64),
        })
        out = (tf.join(qmap, on="term")
               .with_columns((pl.col("tf") * pl.col("w")).alias("part"))
               .group_by("query_id", "doc_id")
               .agg(pl.col("part").sum().alias("score"))
               .sort(["query_id", "doc_id"]))
        return pa.table({
            "query_id": out["query_id"].to_arrow().cast(pa.string()),
            "doc_id": out["doc_id"].to_arrow(),
            "score": out["score"].to_arrow(),
        })

    scored = _docs(sf_dir).map_batches(score, batch_format="pyarrow",
                                       batch_size=1024)
    return topk_per_group(scored, "query_id", "score", SEARCH_TOP_K,
                          tie_cols=["doc_id"], num_buckets=8)


_SQL_QUERY_VALUES = ", ".join(
    f"('{q}', '{t}')" for q, ts in sorted(SEARCH_QUERIES.items())
    for t in ts)

SQL_Q55 = f"""
WITH q(query_id, term) AS (VALUES {_SQL_QUERY_VALUES}),
toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
  FROM documents
),
bg AS (
  SELECT doc_id,
         unnest(list_transform(
             generate_series(1, greatest(len(t) - 1, 0)),
             i -> t[i] || ' ' || t[i + 1])) AS term
  FROM toks
),
tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM bg
  WHERE term IN (SELECT term FROM q)
  GROUP BY doc_id, term
),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT q.query_id, tf.doc_id,
         SUM(tf.tf * ({SEARCH_W_SCALE} // df.df)) AS score
  FROM q JOIN tf USING (term) JOIN df USING (term)
  GROUP BY q.query_id, tf.doc_id
),
r AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id) AS rn
  FROM scored
)
SELECT query_id, doc_id, CAST(score AS BIGINT) AS score
FROM r WHERE rn <= {SEARCH_TOP_K}
"""


QUERIES = {
    "q55_keyword_search": (q55_keyword_search, SQL_Q55),
}
