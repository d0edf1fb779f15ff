"""SimHash near-duplicate detection — JVM-side, fully vectorized.

Classic Charikar simhash: each token hashes to 64 bits; bit *i* of the
signature is 1 iff the sum over tokens of ``(2*bit_i - 1)`` is positive.
Implementation keeps everything in whole-stage codegen:

* tokens explode once, hash via md5 (JVM) split into two 32-bit halves —
  md5 (not xxhash64) so an independent SQL oracle can reproduce the exact
  bits: DuckDB has md5 + hex casts but no xxhash64;
* one ``groupBy(doc)`` with 64 generated ``sum(sign-of-bit)`` aggregates;
* signature assembled with shift/or expressions (two's-complement wrap on
  bit 63, i.e. an ordinary signed long).

No Python touches the data. Near-dup pairs = signatures within a Hamming
radius, found via band-blocking (split the 64 bits into bands; candidates
share a band), the standard scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_BITS = 64


def _token_hash_halves(tok_col):
    """(hi, lo) 32-bit halves of the 64-bit md5-derived token hash.

    ``conv(hex, 16, 10)`` of 8 hex chars fits a long exactly (< 2^32), so
    neither half ever overflows; the oracle mirrors this with
    ``TRY_CAST('0x' || substr(md5(tok), ...) AS BIGINT)``.
    """
    h = F.md5(tok_col)
    hi = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring(h, 9, 8), 16, 10).cast("long")
    return hi, lo


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """-> (id_col, simhash: long)."""
    par = docs.sparkSession.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < par:
        # small demo inputs arrive as 1-2 splits; spread the tokenize work
        docs = docs.repartition(par)
    toks = F.array_distinct(F.split(F.lower(F.trim(F.col(text_col))), r"\W+"))
    t = docs.select(id_col, F.explode(toks).alias("tok")).filter(
        F.length("tok") > 0
    )
    hi, lo = _token_hash_halves(F.col("tok"))
    t = t.withColumn("hi", hi).withColumn("lo", lo)

    def bit(i):
        src = F.col("lo") if i < 32 else F.col("hi")
        return F.shiftright(src, i % 32).bitwiseAND(F.lit(1))

    aggs = [
        F.sum(F.when(bit(i) == 1, 1).otherwise(-1)).alias(f"b{i}")
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
    # candidate pairs via within-band-bucket combinations — one shuffle on
    # (band, key), no self-join; bucket members are near-dup clusters so the
    # C(n,2) explode per bucket stays small
    members = F.array_sort(
        F.collect_list(F.struct(F.col(id_col).alias("id"), F.col("simhash").alias("sig")))
    )
    pairs = F.flatten(
        F.transform(
            F.col("ms"),
            lambda x, i: F.transform(
                F.slice(F.col("ms"), i + 2, F.size(F.col("ms"))),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    cand = (
        bands.groupBy("band", "key")
        .agg(members.alias("ms"))
        .filter(F.size("ms") >= 2)
        .select(F.explode(pairs).alias("p"))
        .select(
            F.col("p.a.id").alias("a_id"),
            F.col("p.b.id").alias("b_id"),
            F.col("p.a.sig").alias("sig_a"),
            F.col("p.b.sig").alias("sig_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return cand.withColumn("hamming", hamming).filter(
        F.col("hamming") <= max_hamming
    ).select("a_id", "b_id", "hamming")
