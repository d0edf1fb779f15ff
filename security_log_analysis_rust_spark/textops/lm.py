"""Bigram language-model scoring for perplexity-style quality filtering.

CCNet (Wenzek et al., LREC 2020) ranks web documents by the perplexity of
a language model trained on a trusted corpus and keeps the low-perplexity
head — the single most load-bearing quality filter in that lineage of
pipelines. This module implements the same shape with an
engine-reproducible bigram model:

* **train**: one pass over the training corpus aggregates bigram counts,
  per-predecessor totals, and the vocabulary size (all partial-agg
  shuffles). The model is a pair of DataFrames — at web scale it stays
  distributed and the scoring join shuffles on the bigram key; an optional
  deterministic top-``max_bigrams`` prune (count desc, then word order)
  bounds the model exactly the way pruned KenLM does.
* **score**: additively-smoothed conditional probability
  ``p(w2|w1) = (c12 + a) / (c1 + a*V)``, backing off to ``1/V`` for unseen
  predecessors; the document score is the mean negative log-probability
  (monotone in perplexity: ppl = exp(score)). Two left joins + one agg —
  no Python, no driver state beyond the O(1) vocabulary size.

Tokenization matches the corpus conventions used across this engine
(lowercased whitespace split), so scores compose with the other quality
signals in ``docs_quality``.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _tokens_col(text_col: str):
    return F.split(F.trim(F.lower(F.col(text_col))), r"\s+")


def doc_bigrams(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """-> (id_col, w1, w2): one row per adjacent token pair (docs with
    fewer than two tokens contribute nothing)."""
    toks = _tokens_col(text_col)
    n1 = F.size(toks) - 1
    pairs = F.zip_with(
        F.slice(toks, 1, n1),
        F.slice(toks, 2, n1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    return (
        docs.filter(F.size(toks) >= 2)
        .select(id_col, F.explode(pairs).alias("p"))
        .select(id_col, "p.w1", "p.w2")
    )


@dataclass
class BigramLM:
    bigrams: DataFrame  # (w1, w2, c12)
    predecessors: DataFrame  # (w1, c1) — bigram occurrences starting w1
    vocab_size: int


def train_bigram_lm(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bigrams: int | None = None,
) -> BigramLM:
    """Count-aggregate the model. ``max_bigrams`` keeps only the most
    frequent pairs (ties broken by word order, so the prune is a pure
    function of the corpus); pruned pairs fall back to smoothing mass at
    score time, exactly like a pruned KenLM."""
    bi = doc_bigrams(docs, id_col, text_col)
    bigrams = bi.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    if max_bigrams is not None:
        # orderBy().limit() executes as TakeOrdered (per-partition heaps,
        # driver merges only max_bigrams rows) — the former unpartitioned
        # Window.orderBy + row_number pulled the ENTIRE distinct-bigram
        # table through one task, the global-sort bottleneck the module's
        # scale notes promise to avoid (r6, ADVICE item). Same rows, same
        # deterministic tiebreak.
        bigrams = bigrams.orderBy(
            F.col("c12").desc(), "w1", "w2"
        ).limit(max_bigrams)
    predecessors = bi.groupBy("w1").agg(F.count("*").alias("c1"))
    vocab_size = (
        docs.select(F.explode(_tokens_col(text_col)).alias("w"))
        .agg(F.countDistinct("w"))
        .collect()[0][0]
    )
    return BigramLM(bigrams, predecessors, vocab_size)


def score_docs(
    docs: DataFrame,
    lm: BigramLM,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 1.0,
) -> DataFrame:
    """-> (id_col, n_bigrams, avg_neg_logp): mean negative log p(w2|w1);
    ``exp(avg_neg_logp)`` is the document perplexity under the model."""
    v = lm.vocab_size
    bi = doc_bigrams(docs, id_col, text_col)
    scored = (
        bi.join(lm.bigrams, on=["w1", "w2"], how="left")
        .join(lm.predecessors, on="w1", how="left")
        .withColumn(
            "_p",
            F.when(F.col("c1").isNull(), F.lit(1.0) / F.lit(v)).otherwise(
                (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(alpha))
                / (F.col("c1") + F.lit(alpha) * F.lit(v))
            ),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"),
        F.round(F.avg(-F.log("_p")), 6).alias("avg_neg_logp"),
    )


def score_docs_oracle_sql(
    train_sql: str,
    score_sql: str,
    id_col: str = "doc_id",
    alpha: float = 1.0,
    max_bigrams: int | None = None,
) -> str:
    """Independent DuckDB twin of train+score (vocabulary size derived
    inside SQL, mirroring the Spark side's independent derivation)."""
    prune = (
        f"""bigrams AS (
  SELECT w1, w2, c12 FROM (
    SELECT w1, w2, c12,
           row_number() OVER (ORDER BY c12 DESC, w1, w2) AS rn
    FROM bigrams_all
  ) WHERE rn <= {max_bigrams}
),"""
        if max_bigrams is not None
        else "bigrams AS (SELECT * FROM bigrams_all),"
    )
    return f"""
WITH train AS ({train_sql}),
score AS ({score_sql}),
train_toks AS (
  SELECT {id_col}, unnest(ls) AS w,
         CAST(generate_subscripts(ls, 1) AS BIGINT) AS pos
  FROM (SELECT {id_col},
               string_split_regex(trim(lower(text)), '\\s+') AS ls
        FROM train)
),
train_bi AS (
  SELECT {id_col}, w1, w2 FROM (
    SELECT {id_col}, w AS w1,
           lead(w) OVER (PARTITION BY {id_col} ORDER BY pos) AS w2
    FROM train_toks
  ) WHERE w2 IS NOT NULL
),
bigrams_all AS (SELECT w1, w2, count(*) AS c12 FROM train_bi GROUP BY 1, 2),
{prune}
preds AS (SELECT w1, count(*) AS c1 FROM train_bi GROUP BY 1),
vocab AS (SELECT count(DISTINCT w) AS v FROM train_toks),
score_toks AS (
  SELECT {id_col}, unnest(ls) AS w,
         CAST(generate_subscripts(ls, 1) AS BIGINT) AS pos
  FROM (SELECT {id_col},
               string_split_regex(trim(lower(text)), '\\s+') AS ls
        FROM score)
),
score_bi AS (
  SELECT {id_col}, w1, w2 FROM (
    SELECT {id_col}, w AS w1,
           lead(w) OVER (PARTITION BY {id_col} ORDER BY pos) AS w2
    FROM score_toks
  ) WHERE w2 IS NOT NULL
)
SELECT {id_col}, CAST(count(*) AS BIGINT) AS n_bigrams,
       round(avg(-ln(CASE WHEN c1 IS NULL THEN 1.0 / v
                          ELSE (coalesce(c12, 0) + {alpha!r})
                               / (c1 + {alpha!r} * v) END)), 6)
       AS avg_neg_logp
FROM score_bi
LEFT JOIN bigrams USING (w1, w2)
LEFT JOIN preds USING (w1)
CROSS JOIN vocab
GROUP BY {id_col}
"""
