"""Sequence packing: oracle parity of the distributed prefix sum,
stream-structure invariants, and partition-count invariance."""

from __future__ import annotations

from pyspark.sql import functions as F

from util_compare import compare_frames, duck_connection

TESTDATA = "/root/testdata/sf0.01"
SEQ_LEN = 256


def test_pack_oracle_parity(spark):
    from security_log_analysis_rust_spark.textops.pack import (
        pack_sequences,
        pack_sequences_oracle_sql,
    )

    docs = spark.read.parquet(f"{TESTDATA}/documents.parquet")
    got = pack_sequences(docs, seq_len=SEQ_LEN).toPandas()
    con = duck_connection(TESTDATA)
    try:
        oracle = con.sql(
            pack_sequences_oracle_sql(
                "SELECT doc_id, text FROM documents", SEQ_LEN
            )
        ).df()
    finally:
        con.close()
    problems = compare_frames(got, oracle)
    assert not problems, "; ".join(p[:400] for p in problems)


def test_pack_stream_structure(spark):
    """Spans tile the stream exactly: sorted by start_pos, each doc begins
    one separator after the previous doc's last token, and chunk bounds
    are consistent with positions."""
    from security_log_analysis_rust_spark.textops.pack import pack_sequences

    docs = spark.read.parquet(f"{TESTDATA}/documents.parquet")
    rows = sorted(
        pack_sequences(docs, seq_len=SEQ_LEN).collect(),
        key=lambda r: r.start_pos,
    )
    assert rows[0].start_pos == 0
    pos = 0
    for r in rows:
        assert r.start_pos == pos, "gap or overlap in the packed stream"
        assert r.chunk_first == r.start_pos // SEQ_LEN
        assert r.chunk_last == (r.start_pos + max(r.n_tokens - 1, 0)) // SEQ_LEN
        assert r.chunk_first <= r.chunk_last
        pos = r.start_pos + r.n_tokens + 1  # + separator
    total = pos
    assert total == sum(r.n_tokens + 1 for r in rows)
    # every chunk id in [0, last] is covered by at least one doc span
    covered = set()
    for r in rows:
        covered.update(range(r.chunk_first, r.chunk_last + 1))
    n_chunks = (total - 1) // SEQ_LEN + 1
    missing = set(range(n_chunks)) - covered
    # a chunk can be all-separators only if docs align pathologically;
    # with 500 real docs none should be
    assert not missing, f"uncovered chunks: {sorted(missing)[:5]}"


def test_pack_partition_count_invariance(spark):
    """4 partitions vs 32 partitions vs single partition: byte-identical
    positions — the two-phase prefix sum is a pure function of the data."""
    from security_log_analysis_rust_spark.textops.pack import pack_sequences

    docs = spark.read.parquet(f"{TESTDATA}/documents.parquet")
    outs = []
    for np in (1, 4, 32):
        outs.append(
            sorted(
                (r.doc_id, r.start_pos, r.chunk_first, r.chunk_last)
                for r in pack_sequences(
                    docs, seq_len=SEQ_LEN, num_partitions=np
                ).collect()
            )
        )
    assert outs[0] == outs[1] == outs[2]


def test_pack_empty_and_single(spark):
    from security_log_analysis_rust_spark.textops.pack import pack_sequences

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert pack_sequences(empty, seq_len=8).count() == 0
    one = spark.createDataFrame([(5, "a b c")], ["doc_id", "text"])
    r = pack_sequences(one, seq_len=2).collect()[0]
    assert (r.start_pos, r.n_tokens, r.chunk_first, r.chunk_last) == (0, 3, 0, 1)
