"""Distributed BPE tokenizer training (Sennrich, Haddow & Birch, ACL 2016,
"Neural Machine Translation of Rare Words with Subword Units", §3.2).

The structure production BPE trainers exploit is that merge learning never
needs the corpus — only the *word-count table*:

* ``word_counts`` is the single corpus-sized operation: one map-side-
  combining ``groupBy(word)`` shuffle (at 100 TB this is the same shape as
  the vocabulary-head query; hot words collapse map-side).
* Training then iterates on the unique-word table (bounded by vocabulary,
  millions of rows — not the corpus' billions): each round is one
  partial-agg pair-count shuffle, a 1-row ``orderBy().limit(1)`` argmax
  collect, and a pure-JVM left-to-right merge fold over each word's symbol
  array. Lineage is frozen with ``localCheckpoint`` every few rounds, the
  same move as the connected-components propagation loop
  (:mod:`.cluster`), so the iterative plan stays flat.

Determinism: the argmax tie-break is (count DESC, left ASC, right ASC),
stated in both implementations, so the learned merge sequence is a pure
function of the corpus. The merge fold applies a rule left-to-right
non-overlapping — "aaa" under (a,a) becomes ("aa", "a") — which is
exactly the reference semantics (verified against a from-scratch Python
reference trainer in tests).

Scope note: symbols are UTF-16 code units on the JVM (`split('')`), so
beyond-BMP text (emoji, rare CJK) would need a grapheme pre-split; the
pipeline's log/web corpora are BMP. ``bpe_encode`` (applying a learned
merge table to new text) runs as an Arrow-batched pandas UDF — the
standard rank-priority merge loop is data-dependent per word and is NOT
on the parse hot path; training itself is zero-Python.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: end-of-word marker, as in the reference implementation
EOW = "</w>"


def _words(text: Column) -> Column:
    return F.filter(F.split(text, r"\s+"), lambda t: t != "")


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """-> (word, n): the one corpus-sized pass (single partial-agg
    shuffle). Everything downstream operates on this table."""
    return (
        docs.select(F.explode(_words(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def _merge_fold(symbols: Column, left: str, right: str) -> Column:
    """Apply merge (left, right) -> left+right left-to-right,
    non-overlapping, as one JVM fold."""
    merged = left + right
    return F.aggregate(
        symbols,
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.greatest(F.size(acc) - 1, F.lit(0))),
                F.array(F.lit(merged)),
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def bpe_train(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_pair_count: int = 2,
    checkpoint_every: int = 8,
) -> list[tuple[str, str, int]]:
    """Learn up to ``n_merges`` BPE merges; -> [(left, right, count), ...]
    in learned order. Stops early when no pair reaches
    ``min_pair_count``. Deterministic for a given corpus regardless of
    partitioning (argmax tie-break: count DESC, left ASC, right ASC)."""
    words = word_counts(docs, text_col)
    syms = words.select(
        "n",
        F.concat(
            F.filter(F.split(F.col("word"), ""), lambda c: c != ""),
            F.array(F.lit(EOW)),
        ).alias("symbols"),
    ).localCheckpoint()  # corpus-sized lineage ends here
    merges: list[tuple[str, str, int]] = []
    for r in range(n_merges):
        n = F.size("symbols")
        pairs = F.when(
            n >= 2,
            F.transform(
                F.sequence(F.lit(1), n - 1),
                lambda i: F.struct(
                    F.element_at(F.col("symbols"), i).alias("a"),
                    F.element_at(F.col("symbols"), i + 1).alias("b"),
                ),
            ),
        ).otherwise(F.expr("CAST(array() AS array<struct<a:string,b:string>>)"))
        best = (
            syms.select("n", F.explode(pairs).alias("p"))
            .groupBy("p.a", "p.b")
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["cnt"] < min_pair_count:
            break
        a, b, cnt = best[0]["a"], best[0]["b"], int(best[0]["cnt"])
        merges.append((a, b, cnt))
        syms = syms.withColumn("symbols", _merge_fold(F.col("symbols"), a, b))
        if (r + 1) % checkpoint_every == 0:
            syms = syms.localCheckpoint()
    return merges


def bpe_train_reference(word_count: dict[str, int], n_merges: int,
                        min_pair_count: int = 2) -> list[tuple[str, str, int]]:
    """From-scratch single-machine reference trainer (textbook Sennrich
    §3.2) used as the differential oracle in tests — no shared code with
    the distributed path."""
    vocab = {
        tuple(list(w) + [EOW]): c for w, c in word_count.items()
    }
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for s, c in vocab.items():
            for pair in zip(s, s[1:]):
                counts[pair] = counts.get(pair, 0) + c
        if not counts:
            break
        (a, b), cnt = sorted(
            counts.items(), key=lambda kv: (-kv[1], kv[0])
        )[0]
        if cnt < min_pair_count:
            break
        merges.append((a, b, cnt))
        new_vocab = {}
        for s, c in vocab.items():
            out: list[str] = []
            for sym in s:
                if out and out[-1] == a and sym == b:
                    out[-1] = a + b
                else:
                    out.append(sym)
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> (id_col, tokens array<string>, n_bpe_tokens): encode text with a
    learned merge table by rank priority (at each step merge the
    lowest-rank pair present — the standard BPE encode loop). Arrow-
    batched pandas UDF; per-word results are memoized within each batch."""
    ranks = {(m[0], m[1]): i for i, m in enumerate(merges)}

    def encode_word(word: str, cache: dict) -> list[str]:
        if word in cache:
            return cache[word]
        syms = list(word) + [EOW]
        while len(syms) > 1:
            present = [
                ranks[p] for p in zip(syms, syms[1:]) if p in ranks
            ]
            if not present:
                break
            r = min(present)
            a, b = merges[r][0], merges[r][1]
            out, j = [], 0
            while j < len(syms):
                if j < len(syms) - 1 and syms[j] == a and syms[j + 1] == b:
                    out.append(a + b)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            syms = out
        cache[word] = syms
        return syms

    @F.pandas_udf("array<string>")
    def encode(series: pd.Series) -> pd.Series:
        cache: dict = {}
        return series.map(
            lambda t: [
                tok
                for w in (t or "").split()
                for tok in encode_word(w, cache)
            ]
        )

    return docs.select(
        id_col,
        encode(F.col(text_col)).alias("tokens"),
    ).withColumn("n_bpe_tokens", F.size("tokens").cast("long"))
