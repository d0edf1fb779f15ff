"""fastText-style hashed linear quality classifier (Joulin et al. 2017,
arXiv:1607.01759) — the filter family used to select the GPT-3 and LLaMA
pretraining corpora (Brown et al. 2020 App. A; Touvron et al. 2023):
train a linear model over hashed bag-of-token features to recognize a
trusted reference corpus, score every raw document with it, and keep the
high-score head — optionally via GPT-3's stochastic Pareto acceptance
rule instead of a hard threshold.

Spark-first decomposition:

* **featurize** (:func:`doc_features`): tokenize with the engine's corpus
  conventions (lowercased whitespace split), hash each token into ``dim``
  buckets with the md5 idiom every sampling operator here uses
  (``conv(substr(md5(w),1,8),16,10) % dim`` — reproducible in any engine,
  including the DuckDB oracle), emit ``(doc, idx, val)`` with
  ``val = count / n_tokens``. Pure expressions, one shuffle (the count
  groupBy); the feature table NEVER leaves the cluster.
* **train** (:func:`train_classifier`): full-batch logistic-regression
  gradient descent. The feature table is cached hash-partitioned on the
  doc id, so each iteration is ONE partial-agg shuffle (the gradient
  ``groupBy(idx)``; the margins ``groupBy(doc)`` and the residual join
  reuse the cached partitioning) plus one broadcast join against the
  weight vector.
  Only the model itself (<= ``dim`` floats, the SMALL side by
  construction) ever reaches the driver, so the same loop runs unchanged
  over a 100 TB corpus: the wide data stays distributed, the per-iteration
  driver traffic is O(touched features). This is the standard distributed
  full-batch GD (what MLlib's ``LogisticRegression`` does inside
  ``treeAggregate``) re-expressed as certifiable DataFrame ops.
* **score** (:func:`score_docs_classifier`): one broadcast join + one
  groupBy(doc) — ``sigmoid(sum(w[idx]*val) + b)`` rounded to 6 decimals
  (the engine's float-determinism convention, same as ``lm.score_docs``).
  With pinned weights the score is a pure function of the row, so the
  apply step is oracle-paired exactly (:func:`score_oracle_sql` embeds the
  weights as a VALUES table).
* **select** (:func:`pareto_select`): GPT-3's acceptance rule
  ``keep iff score > 1 - lomax(alpha)`` made engine-reproducible — the
  uniform comes from md5(id || ':pareto') (the ``mixture_thin`` /
  ``docs_split`` idiom), and the Lomax draw is its inverse CDF
  ``(1-u)^(-1/alpha) - 1``; re-runs, re-partitionings, and the SQL oracle
  all select the identical set.

Documents whose trimmed text is empty have no tokens, hence no features
and no score; they are excluded up front (stated contract, mirrored by
the oracle).

Training determinism: distributed float sums commute only up to rounding,
so two runs of :func:`train_classifier` may differ in the last ulps (the
weights are rounded to 12 decimals on return to shrink, not eliminate,
that window). The certified contract is therefore: training is verified
against a same-order numpy reference (:func:`train_classifier_reference`,
tested to 1e-9), and SCORING with pinned weights is verified bit-exactly
against the SQL oracle — mirroring how real pipelines version a trained
filter artifact and certify its application.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_DIM = 1 << 18


def _tokens_col(text_col: str):
    return F.split(F.trim(F.lower(F.col(text_col))), r"\s+")


def _hash_idx(col, dim: int):
    """md5-bucket feature hash — engine-reproducible, non-negative."""
    return (
        F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long") % dim
    ).alias("idx")


def doc_features(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = DEFAULT_DIM,
) -> DataFrame:
    """-> (id_col, idx, val): hashed bag-of-tokens, val = count/n_tokens.

    Empty documents (trimmed text = '') are excluded — they have no
    tokens, so a linear bag-of-words model has nothing to say about them.
    """
    toks = _tokens_col(text_col)
    base = (
        docs.filter(F.trim(F.col(text_col)) != "")
        .select(
            id_col,
            F.size(toks).alias("_n"),
            F.explode(toks).alias("_w"),
        )
        .select(id_col, "_n", _hash_idx(F.col("_w"), dim))
    )
    return base.groupBy(id_col, "idx").agg(
        (F.count("*") / F.first("_n")).alias("val")
    )


@dataclass
class LinearClassifier:
    weights: dict  # idx -> weight (touched features only)
    bias: float
    dim: int


def train_classifier(
    docs: DataFrame,
    label_col: str = "label",
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = DEFAULT_DIM,
    lr: float = 1.0,
    iters: int = 50,
    l2: float = 1e-4,
) -> LinearClassifier:
    """Full-batch logistic-regression GD over hashed features.

    ``docs`` carries a 0/1 ``label_col`` (1 = trusted/reference corpus).
    Per iteration: broadcast-join the weight vector, groupBy(doc) for
    margins, groupBy(idx) for the gradient; only the gradient (bounded by
    the number of touched feature buckets <= dim) is collected.
    """
    import pandas as pd

    spark = docs.sparkSession
    labels = (
        docs.filter(F.trim(F.col(text_col)) != "")
        .select(id_col, F.col(label_col).cast("double").alias("_y"))
        .cache()
    )
    n = labels.count()
    if n == 0:
        raise ValueError("no non-empty documents to train on")

    # bias as the constant feature idx=-1 (val=1.0 on every doc): one
    # broadcast join + ONE exchange + ONE collect per iteration. The cache
    # is hash-partitioned on the doc id (r6, guide §2.4): the margins
    # ``groupBy(id)`` and the gradient's ``join(resid, id)`` then reuse the
    # cached partitioning every iteration, so only the ``groupBy(idx)``
    # shuffles — one exchange up front replaces two per iteration
    # (weights verified bit-identical; measured ~20% off the train loop).
    # The label rides the cached feature rows (r6, resumed session): ``_y``
    # is constant per doc, so ``first(_y)`` in the margins aggregate equals
    # the old per-iteration ``join(labels)`` — one broadcast build + join
    # stage fewer per iteration, margins sums in the identical order
    # (the label join happened ABOVE the aggregate, so removing it cannot
    # reassociate them; weights re-verified bit-identical).
    feats = (
        doc_features(docs, id_col, text_col, dim)
        .unionByName(
            labels.select(
                id_col, F.lit(-1).alias("idx"), F.lit(1.0).alias("val")
            )
        )
        .join(F.broadcast(labels), id_col)
        .repartition(F.col(id_col))
        .cache()
    )
    all_idx = sorted(r.idx for r in feats.select("idx").distinct().collect())
    w = {i: 0.0 for i in all_idx}

    for _ in range(iters):
        wdf = spark.createDataFrame(
            pd.DataFrame({"idx": all_idx, "_w": [w[i] for i in all_idx]})
        )
        resid = (
            feats.join(F.broadcast(wdf), "idx")
            .groupBy(id_col)
            .agg(
                F.sum(F.col("val") * F.col("_w")).alias("_m"),
                F.first("_y").alias("_y"),
            )
            .select(
                id_col,
                (
                    F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("_m")))
                    - F.col("_y")
                ).alias("_r"),
            )
        )
        grad_rows = (
            feats.join(resid, id_col)
            .groupBy("idx")
            .agg(F.sum(F.col("val") * F.col("_r")).alias("_g"))
            .collect()
        )
        for row in grad_rows:
            reg = l2 * w[row.idx] if row.idx >= 0 else 0.0  # no L2 on bias
            w[row.idx] -= lr * (row._g / n + reg)

    feats.unpersist()
    labels.unpersist()
    return LinearClassifier(
        weights={i: round(v, 12) for i, v in w.items() if i >= 0},
        bias=round(w[-1], 12),
        dim=dim,
    )


def train_classifier_reference(
    feat_rows, label_rows, dim: int, lr: float = 1.0,
    iters: int = 50, l2: float = 1e-4,
) -> LinearClassifier:
    """Driver-side numpy reference of :func:`train_classifier` — same
    full-batch GD on the same (doc, idx, val) rows, used by the tests to
    certify the distributed loop."""
    import numpy as np

    ids = sorted({r[0] for r in label_rows})
    pos = {d: k for k, d in enumerate(ids)}
    y = np.zeros(len(ids))
    for d, lab in label_rows:
        y[pos[d]] = float(lab)
    w = np.zeros(dim)
    touched = sorted({r[1] for r in feat_rows})
    b = 0.0
    n = len(ids)
    for _ in range(iters):
        m = np.full(len(ids), b)
        for d, i, v in feat_rows:
            m[pos[d]] += v * w[i]
        r = 1.0 / (1.0 + np.exp(-m)) - y
        g = np.zeros(dim)
        for d, i, v in feat_rows:
            g[i] += v * r[pos[d]]
        w[touched] -= lr * (g[touched] / n + l2 * w[touched])
        b -= lr * (r.sum() / n)
    return LinearClassifier(
        weights={i: round(float(w[i]), 12) for i in touched},
        bias=round(b, 12),
        dim=dim,
    )


def score_docs_classifier(
    docs: DataFrame,
    model: LinearClassifier,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> (id_col, score): sigmoid(w.x + b) rounded to 6 decimals."""
    import pandas as pd

    spark = docs.sparkSession
    idxs = sorted(model.weights)
    wdf = spark.createDataFrame(
        pd.DataFrame({"idx": idxs, "_w": [model.weights[i] for i in idxs]})
    )
    feats = doc_features(docs, id_col, text_col, model.dim)
    margins = (
        feats.join(F.broadcast(wdf), "idx", "left")
        .groupBy(id_col)
        .agg(F.sum(F.col("val") * F.coalesce(F.col("_w"), F.lit(0.0))).alias("_m"))
    )
    return margins.select(
        id_col,
        F.round(
            F.lit(1.0)
            / (F.lit(1.0) + F.exp(-(F.col("_m") + F.lit(model.bias)))),
            6,
        ).alias("score"),
    )


def _weights_values_sql(model: LinearClassifier) -> str:
    rows = ", ".join(
        f"({i}, {model.weights[i]!r})" for i in sorted(model.weights)
    )
    # an impossible idx keeps the VALUES list non-empty for an empty model
    return rows or "(-1, 0.0)"


def score_oracle_sql(
    score_sql: str,
    model: LinearClassifier,
    id_col: str = "doc_id",
) -> str:
    """Independent DuckDB twin of :func:`score_docs_classifier` with the
    trained weights embedded as a VALUES table."""
    return f"""
WITH score_docs AS ({score_sql}),
weights (idx, w) AS (VALUES {_weights_values_sql(model)}),
toks AS (
  SELECT {id_col}, unnest(ls) AS tok, len(ls) AS n
  FROM (SELECT {id_col},
               string_split_regex(trim(lower(text)), '\\s+') AS ls
        FROM score_docs WHERE trim(text) <> '')
),
feats AS (
  SELECT {id_col},
         CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) % {model.dim}
           AS idx,
         count(*) * 1.0 / any_value(n) AS val
  FROM toks GROUP BY 1, 2
),
margins AS (
  SELECT f.{id_col},
         sum(f.val * coalesce(w.w, 0.0)) AS m
  FROM feats f LEFT JOIN weights w USING (idx)
  GROUP BY 1
)
SELECT {id_col},
       round(1.0 / (1.0 + exp(-(m + {model.bias!r}))), 6) AS score
FROM margins
"""


def pareto_select(
    scored: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "score",
    alpha: float = 9.0,
    buckets: int = 1 << 32,
) -> DataFrame:
    """GPT-3's stochastic acceptance (Brown et al. 2020 App. A): keep a
    document iff ``score > 1 - x`` with ``x ~ Lomax(alpha)``. The draw is
    engine-reproducible: u = md5-bucket(id || ':pareto') / buckets,
    x = (1-u)^(-1/alpha) - 1 (inverse CDF). High scores always survive;
    low scores survive with heavy-tailed luck — the paper's trick to keep
    some tail mass instead of a hard cutoff."""
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":pareto"))),
                1, 8,
            ),
            16, 10,
        ).cast("double")
        / F.lit(float(buckets))
    )
    x = F.pow(F.lit(1.0) - u, F.lit(-1.0 / alpha)) - F.lit(1.0)
    return scored.filter(F.col(score_col) > F.lit(1.0) - x)


def pareto_select_oracle_sql(
    scored_sql: str,
    id_col: str = "doc_id",
    score_col: str = "score",
    alpha: float = 9.0,
    buckets: int = 1 << 32,
) -> str:
    """Independent DuckDB twin of :func:`pareto_select`."""
    return f"""
WITH scored AS ({scored_sql})
SELECT * FROM scored
WHERE {score_col} > 1.0 - (
  pow(1.0 - (CAST(('0x' || substr(md5({id_col}::varchar || ':pareto'), 1, 8))
             AS BIGINT) / {float(buckets)!r}), {-1.0 / alpha!r}) - 1.0)
"""
