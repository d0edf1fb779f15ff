"""Tests for simhash, ANN (brute-force + LSH), and multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from conftest import TESTDATA_SF_ORACLE


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{TESTDATA_SF_ORACLE}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{TESTDATA_SF_ORACLE}/embeddings.parquet")


def test_simhash_deterministic_and_discriminative(spark, docs):
    from security_log_analysis_rust_spark.textops.simhash import simhash

    s1 = {r.doc_id: r.simhash for r in simhash(docs).collect()}
    s2 = {r.doc_id: r.simhash for r in simhash(docs).collect()}
    assert s1 == s2  # deterministic
    assert len(s1) == docs.count()
    assert len(set(s1.values())) > len(s1) * 0.5  # not degenerate


def test_simhash_near_dups_find_planted_pair(spark):
    from security_log_analysis_rust_spark.textops.simhash import simhash_near_dups

    base = "the quick brown fox jumps over the lazy dog " * 20
    near = base + "extra token"
    far = "completely different words about spark shuffles and parquet files " * 15
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "doc_id long, text string"
    )
    # n_bands=16 guarantees recovery of any pair within hamming 15
    pairs = {
        (r.a_id, r.b_id)
        for r in simhash_near_dups(df, max_hamming=10, n_bands=16).collect()
    }
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_brute_force_topk_self_consistency(spark, emb):
    from security_log_analysis_rust_spark.textops.ann import brute_force_topk

    res = brute_force_topk(emb, k=3)
    pdf = res.toPandas()
    assert set(pdf["rank"]) == {1, 2, 3}
    assert len(pdf) == emb.count() * 3
    assert (pdf["vec_id"] != pdf["neighbor_id"]).all()
    # rank-1 matches the oracle-checked expression-based top-1 exactly (same
    # JVM sim expression, same rounded tie-break)
    import __spark_entry__ as E

    top1_expr = {
        r.vec_id: r.neighbor_id for r in E.q_emb_top1(spark, TESTDATA_SF_ORACLE).collect()
    }
    top1_bf = {
        r.vec_id: r.neighbor_id for r in res.filter(F.col("rank") == 1).collect()
    }
    assert top1_expr == top1_bf


def test_lsh_topk_recall(spark, emb):
    from security_log_analysis_rust_spark.textops.ann import (
        brute_force_topk,
        lsh_topk,
        recall_at_k,
    )

    exact = brute_force_topk(emb, k=3).cache()
    approx = lsh_topk(emb, k=3, n_bits=4, n_tables=8).cache()
    r = recall_at_k(approx, exact, k=3)
    # random 64-dim embeddings are near-orthogonal (hardest case for
    # hyperplane LSH); OR-amplification across 8 tables must still recover
    # a solid majority of true top-3 neighbors
    assert r > 0.5, f"recall@3 = {r}"
    # and the buckets actually prune work
    from security_log_analysis_rust_spark.textops.ann import with_lsh_buckets

    n_buckets = (
        with_lsh_buckets(emb, n_bits=6).select("bucket").distinct().count()
    )
    assert n_buckets > 10


def test_ivf_topk_recall(spark, emb):
    from security_log_analysis_rust_spark.textops.ann import (
        brute_force_topk,
        ivf_topk,
        recall_at_k,
    )

    exact = brute_force_topk(emb, k=3).cache()
    approx = ivf_topk(emb, k=3, n_centroids=16, n_probe=4).cache()
    r = recall_at_k(approx, exact, k=3)
    # random 64-dim embeddings are the hardest case for a coarse quantizer;
    # probing 4/16 lists must still beat the 25%-coverage baseline clearly
    assert r > 0.35, f"recall@3 = {r}"
    # structure: at most k rows per vector, never self
    import pyspark.sql.functions as SF

    per_vec = approx.groupBy("vec_id").count().agg(SF.max("count")).first()[0]
    assert per_vec <= 3
    assert approx.filter(SF.col("vec_id") == SF.col("neighbor_id")).count() == 0


def test_auto_n_bits_grows_with_corpus():
    from security_log_analysis_rust_spark.textops.ann import auto_n_bits

    assert auto_n_bits(500) == 4  # floor at small scale
    assert auto_n_bits(1 << 20) == 8  # 1M vectors / 4k target
    assert auto_n_bits(1 << 30) == 18  # 1B vectors
    # expected bucket size stays ~target as N grows 1024x
    assert auto_n_bits(1 << 30) - auto_n_bits(1 << 20) == 10


def test_multimodal_decode_contract(spark):
    from security_log_analysis_rust_spark.textops.multimodal import (
        N_FEATURES,
        decode_media,
        sample_frames,
        synthetic_media,
    )

    media = synthetic_media(spark, n=64)
    dec = decode_media(media).toPandas()
    assert len(dec) == 64
    by_status = dec.groupby("ok").size().to_dict()
    assert by_status.get("null", 0) > 0 and by_status.get("corrupt", 0) > 0
    ok = dec[dec["ok"] == "ok"]
    assert (ok["width"] >= 64).all() and (ok["n_channels"] == 3).all()
    assert all(len(f) == N_FEATURES for f in ok["features"])
    # determinism across runs
    dec2 = decode_media(media).toPandas().sort_values("media_id")
    assert list(dec2["width"].fillna(-1)) == list(
        dec.sort_values("media_id")["width"].fillna(-1)
    )

    frames = sample_frames(media).toPandas()
    assert (frames.groupby("media_id").size() <= 5).all()
    assert frames["frame_fingerprint"].str.len().eq(32).all()


def _tiny_png(width: int, height: int, color_type: int = 6) -> bytes:
    """Build a real, spec-valid PNG byte string with stdlib only."""
    import struct
    import zlib

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    n_ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    raw = b"".join(b"\x00" + b"\x7f" * (width * n_ch) for _ in range(height))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_decode_parses_real_png_header(spark):
    from security_log_analysis_rust_spark.textops.multimodal import (
        MEDIA_SCHEMA,
        decode_media,
        parse_png_header,
    )

    png = _tiny_png(7, 5, color_type=6)
    assert parse_png_header(png) == (7, 5, 4)
    media = spark.createDataFrame(
        [(1, "image", bytearray(png), "image/png"),
         (2, "image", bytearray(b"not a png, just bytes"), "image/png")],
        MEDIA_SCHEMA,
    )
    got = {r.media_id: r for r in decode_media(media).collect()}
    assert (got[1].width, got[1].height, got[1].n_channels) == (7, 5, 4)
    assert got[1].ok == "ok"
    assert got[2].ok == "ok" and got[2].n_channels == 3  # fake-decode fallback


def test_parse_wav_header():
    import struct

    from security_log_analysis_rust_spark.textops.multimodal import parse_wav_header

    fmt = struct.pack("<HHIIHH", 1, 2, 44100, 44100 * 2 * 2, 4, 16)
    wav = (
        b"RIFF" + struct.pack("<I", 36) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
    )
    assert parse_wav_header(wav) == (2, 44100, 16)
    assert parse_wav_header(b"RIFFxxxxNOPE") is None
    assert parse_wav_header(b"short") is None


def test_real_decoder_is_explicit_stub():
    from security_log_analysis_rust_spark.textops.multimodal import _decode_image_real

    with pytest.raises(NotImplementedError):
        _decode_image_real(b"\x89PNG fake")
