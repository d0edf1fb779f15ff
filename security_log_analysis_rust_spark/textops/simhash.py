"""SimHash near-duplicate detection — JVM-side, fully vectorized.

Classic Charikar simhash: each token hashes to 64 bits; bit *i* of the
signature is 1 iff the sum over tokens of ``(2*bit_i - 1)`` is positive.
Implementation keeps everything in whole-stage codegen:

* tokens explode once, hash via ``xxhash64`` (JVM);
* one ``groupBy(doc)`` with 64 generated ``sum(sign-of-bit)`` aggregates;
* signature assembled with shift/or expressions.

No Python touches the data. Near-dup pairs = signatures within a Hamming
radius, found via band-blocking (split the 64 bits into bands; candidates
share a band), the standard scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_BITS = 64


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """-> (id_col, simhash: long)."""
    toks = F.array_distinct(F.split(F.lower(F.trim(F.col(text_col))), r"\W+"))
    t = docs.select(id_col, F.explode(toks).alias("tok")).filter(
        F.length("tok") > 0
    )
    t = t.withColumn("h", F.xxhash64("tok"))
    aggs = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(N_BITS)
    ]
    per_doc = t.groupBy(id_col).agg(*aggs)
    sig = F.lit(0).cast("long")
    for i in range(N_BITS):
        sig = sig.bitwiseOR(
            F.when(F.col(f"b{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
                F.lit(0).cast("long")
            )
        )
    return per_doc.select(id_col, sig.alias("simhash"))


def simhash_near_dups(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    n_bands: int = 8,
) -> DataFrame:
    """Candidate pairs within ``max_hamming`` bits, via band-blocking.

    Pigeonhole guarantee: any pair within Hamming distance ``n_bands - 1``
    shares at least one exact band, so candidates are found with equi-joins,
    never an all-pairs scan; the exact Hamming check prunes false positives.
    Pick ``n_bands > max_hamming`` for a complete result.
    """
    sigs = simhash(docs, id_col, text_col)
    width = N_BITS // n_bands
    bands = sigs.select(
        F.col(id_col),
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("simhash"), b * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "simhash", "bk.band", "bk.key")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("a_id"),
            F.col(f"b.{id_col}").alias("b_id"),
            F.col("a.simhash").alias("sig_a"),
            F.col("b.simhash").alias("sig_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return cand.withColumn("hamming", hamming).filter(
        F.col("hamming") <= max_hamming
    ).select("a_id", "b_id", "hamming")
