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
    from .util import spread_small_input

    # small demo inputs arrive as 1-2 splits; spread the tokenize work
    docs = spread_small_input(docs)
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


#: per-(band, key) bucket cap — buckets larger than this are dropped before
#: pair generation (the JACCARD_DF_CAP pattern). A bucket that big at a sane
#: key width is boilerplate (e.g. empty docs hashing identically), and its
#: C(n,2) explode would be quadratic; the recall contract is that pairs held
#: together ONLY by over-cap buckets are not reported. The exact Hamming
#: filter keeps everything that IS reported correct.
DEFAULT_BUCKET_CAP = 2000


def band_combos(n_bands: int, max_hamming: int) -> list:
    """Block-combination keys (Manku et al., WWW'07 simhash dedup).

    Split the 64-bit signature into ``n_bands`` blocks. A pair within
    Hamming distance ``max_hamming`` differs in at most ``max_hamming``
    blocks, hence AGREES on at least ``r = n_bands - max_hamming`` blocks —
    so keying each doc by every r-subset of blocks finds every such pair
    with equi-matches (complete, never an all-pairs scan). Wider keys
    (``r * width`` bits) mean exponentially more buckets than single-block
    banding: r=2 over 8-bit blocks gives 2^16 buckets/band vs 2^8, so the
    expected bucket is N/65536 instead of N/256 — the difference between a
    bounded explode and a quadratic one at scale.

    ``r`` is capped at 2: completeness only needs ``r <= n_bands -
    max_hamming``, and C(n_bands, 2) keys per doc is the shuffle-volume
    sweet spot (r=5 would emit 56 keys/doc for marginal extra precision).
    """
    import itertools

    r = max(1, min(2, n_bands - max_hamming))
    return list(itertools.combinations(range(n_bands), r))


def simhash_near_dups(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    n_bands: int = 8,
    bucket_cap: int = DEFAULT_BUCKET_CAP,
) -> DataFrame:
    """Candidate pairs within ``max_hamming`` bits, via combination-blocking
    (:func:`band_combos`) with a bucket-size cap. Pick
    ``n_bands > max_hamming`` for a complete result."""
    sigs = simhash(docs, id_col, text_col)
    return near_dups_from_sigs(
        sigs, id_col=id_col, max_hamming=max_hamming, n_bands=n_bands,
        bucket_cap=bucket_cap,
    )


def near_dups_from_sigs(
    sigs: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "simhash",
    max_hamming: int = 3,
    n_bands: int = 8,
    bucket_cap: int = DEFAULT_BUCKET_CAP,
) -> DataFrame:
    """Near-dup pairs from precomputed signatures.

    Physical plan: explode C(n_bands, r) combination keys per doc, drop
    over-cap (band, key) buckets via an anti-join on the hot-key frame — no
    fat ``collect_list`` array is ever materialized — then within-bucket
    C(n,2) combinations bounded by ``bucket_cap``, then the exact Hamming
    filter. The hot-key frame is unhinted on purpose: on a normal corpus it
    is near-empty (AQE broadcasts it at runtime), but on a pathological one
    (everything identical) it can be large, and a hard broadcast hint would
    OOM exactly when the cap matters most. Both aggregations shuffle on the
    same (band, key) columns, so the exchange is reused.
    """
    width = N_BITS // n_bands
    mask = F.lit((1 << width) - 1)

    def block(b):
        return F.shiftrightunsigned(F.col(sig_col), b * width).bitwiseAND(mask)

    entries = []
    for ci, combo in enumerate(band_combos(n_bands, max_hamming)):
        key = block(combo[0]).cast("long")
        for b in combo[1:]:
            key = F.shiftleft(key, width).bitwiseOR(block(b))
        entries.append(F.struct(F.lit(ci).alias("band"), key.alias("key")))
    bands = sigs.select(
        F.col(id_col), F.col(sig_col).alias("simhash"),
        F.explode(F.array(*entries)).alias("bk"),
    ).select(id_col, "simhash", "bk.band", "bk.key")

    if bucket_cap is not None:
        hot = (
            bands.groupBy("band", "key")
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") > bucket_cap)
            .select("band", "key")
        )
        bands = bands.join(hot, ["band", "key"], "left_anti")

    # candidate pairs via within-band-bucket combinations — one shuffle on
    # (band, key), no self-join; bucket size is <= bucket_cap so the C(n,2)
    # explode per bucket is bounded
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
