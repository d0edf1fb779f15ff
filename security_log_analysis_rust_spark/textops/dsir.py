"""Data Selection via Importance Resampling (DSIR — Xie et al.,
NeurIPS 2023, arXiv:2302.03169).

DSIR selects pretraining data that *looks like* a trusted target corpus:
fit cheap generative models of the target distribution p and the raw-pool
distribution q in a feature space, weight every raw document by
``log p(x) - log q(x)``, and resample via Gumbel top-k — importance
resampling rather than hard thresholding, so the selected set matches the
target distribution instead of merely maximizing a score.

This implementation composes the engine's existing pieces:

* the feature-space models are two :class:`.lm.BigramLM` fits (the paper
  uses hashed-ngram unigram products; a bigram LM is the same estimator
  family and is already oracle-certified) — training is count-aggregation
  shuffles only;
* ``log p(x)`` for a document is ``-(n_bigrams * avg_neg_logp)`` from
  :func:`.lm.score_docs`, so the importance weight is
  ``n_bigrams * (avg_neg_logp_q - avg_neg_logp_p)`` — two scoring passes
  over the raw pool (joins on bigram keys, no Python);
* the Gumbel noise is **engine-reproducible**: the uniform comes from the
  md5-bucket idiom (`(md5(id || ':dsir') first 8 hex) / 16^8`, same move
  as :func:`.domains.mixture_thin`), so ``g = -ln(-ln(u))`` and therefore
  the selected set is a pure function of the corpus — any engine, any
  partitioning, any re-run selects the same documents;
* the top-k is one ``orderBy(priority desc).limit(k)`` — Spark executes
  it as TakeOrdered (per-partition heaps + driver merge of k rows), not a
  global sort.

Documents with fewer than two tokens have no bigrams, hence no score
under either model; they are excluded (stated contract, mirrored by the
oracle). ``k`` must be small enough to sit on the driver (it is the
selected-sample size — millions at most, far below corpus scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .lm import BigramLM, score_docs, score_docs_oracle_sql, train_bigram_lm

#: salt for the reproducible Gumbel uniform (independent of the
#: train/val/test split and mixture-thinning salts)
_DSIR_SALT = ":dsir"
_U_DENOM = float(1 << 32)


def _gumbel(id_col: str):
    """Deterministic Gumbel(0,1) draw per id: u in (0,1) from the first 8
    md5 hex digits (offset by 0.5 to stay strictly inside the interval),
    g = -ln(-ln(u))."""
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col(id_col).cast("string"), F.lit(_DSIR_SALT))),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(_U_DENOM)
    return -F.log(-F.log(u))


def dsir_weights(
    raw_docs: DataFrame,
    target_lm: BigramLM,
    raw_lm: BigramLM,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 1.0,
) -> DataFrame:
    """-> (id_col, n_bigrams, logw): per-document log importance weight
    ``log p_target(x) - log q_raw(x)`` under the two bigram models."""
    p = score_docs(raw_docs, target_lm, id_col, text_col, alpha).select(
        id_col, "n_bigrams", F.col("avg_neg_logp").alias("_p_nlp")
    )
    q = score_docs(raw_docs, raw_lm, id_col, text_col, alpha).select(
        id_col, F.col("avg_neg_logp").alias("_q_nlp")
    )
    return p.join(q, id_col).select(
        id_col,
        "n_bigrams",
        F.round(
            F.col("n_bigrams") * (F.col("_q_nlp") - F.col("_p_nlp")), 6
        ).alias("logw"),
    )


def dsir_select(
    raw_docs: DataFrame,
    target_docs: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 1.0,
    max_bigrams: int | None = None,
) -> DataFrame:
    """-> (id_col, n_bigrams, logw, priority): the ``k`` raw documents
    selected by Gumbel top-k over the importance weights (priority =
    logw + deterministic Gumbel; ties broken by id)."""
    target_lm = train_bigram_lm(target_docs, id_col, text_col, max_bigrams)
    raw_lm = train_bigram_lm(raw_docs, id_col, text_col, max_bigrams)
    weights = dsir_weights(raw_docs, target_lm, raw_lm, id_col, text_col, alpha)
    return (
        weights.withColumn(
            "priority", F.round(F.col("logw") + _gumbel(id_col), 6)
        )
        .orderBy(F.desc("priority"), F.asc(id_col))
        .limit(k)
    )


def dsir_select_oracle_sql(
    raw_sql: str,
    target_sql: str,
    k: int,
    id_col: str = "doc_id",
    alpha: float = 1.0,
    max_bigrams: int | None = None,
) -> str:
    """Independent DuckDB twin of :func:`dsir_select`: two nested
    train+score oracles, the same md5 Gumbel, ORDER BY/LIMIT top-k."""
    p_sql = score_docs_oracle_sql(target_sql, raw_sql, id_col, alpha, max_bigrams)
    q_sql = score_docs_oracle_sql(raw_sql, raw_sql, id_col, alpha, max_bigrams)
    return f"""
WITH p AS ({p_sql}),
q AS ({q_sql}),
w AS (
  SELECT p.{id_col}, p.n_bigrams,
         round(p.n_bigrams * (q.avg_neg_logp - p.avg_neg_logp), 6) AS logw
  FROM p JOIN q USING ({id_col})
),
g AS (
  SELECT *,
         round(logw + (-ln(-ln(
           (CAST(('0x' || substr(md5({id_col}::varchar || '{_DSIR_SALT}'), 1, 8))::BIGINT
                 AS DOUBLE) + 0.5) / {_U_DENOM!r}
         ))), 6) AS priority
  FROM w
)
SELECT {id_col}, n_bigrams, logw, priority
FROM g ORDER BY priority DESC, {id_col} ASC LIMIT {int(k)}
"""
