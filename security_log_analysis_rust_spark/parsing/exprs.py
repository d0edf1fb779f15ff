"""Pure-JVM column-expression implementation of ``parse_log_message``.

Third implementation of the reference's extraction
(``/root/reference/src/parse_logs.rs:58-84``), alongside the pure-Python
oracle (:mod:`.core`) and the Arrow pandas kernel (:mod:`.udfs`). This one
is built ONLY from built-in column functions, so the hot parse path runs
entirely inside whole-stage codegen: no Python workers, no Arrow
serialization, and no 2x runnable-thread oversubscription at high core
counts (each task thread previously paired with a Python worker — the
measured ceiling on 8->32 scaling).

Semantics, byte-for-byte with the other two implementations:

* split on literal ``"Invalid user "``; the part between the 1st and 2nd
  occurrence is the user segment (marker absent -> NULL row; ``F.get``
  returns NULL out of range, unlike ANSI ``element_at``);
* user = segment before the first ``" from "`` (may be empty), truncated to
  15 BYTES; host = the rest, cut at the first literal ``"port"``, trimmed,
  truncated to 60 BYTES (byte-truncation via encode -> binary substring ->
  decode, only paid by over-long values);
* truncated host must contain ``'.'`` (F3), else both fields are NULL
  (the reference's Err path as drop).

The split patterns are regex-free literals, so ``F.split`` (regex-based)
is safe verbatim.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def trunc_bytes_expr(col: Column, n: int) -> Column:
    """Byte truncation (parse_logs.rs:66-68,78) as expressions: values at or
    under ``n`` bytes pass through untouched; longer ones slice the UTF-8
    bytes. A slice through a multi-byte character yields replacement chars
    (the reference panics there; data is ASCII by contract)."""
    b = F.encode(col, "UTF-8")
    return F.when(F.length(b) <= n, col).otherwise(
        F.decode(F.substring(b, 1, n), "UTF-8")
    )


def invalid_user_expr(msg: Column) -> Column:
    """message -> struct(host, username), NULL fields when not extractable."""
    user_seg = F.get(F.split(msg, "Invalid user ", -1), 1)
    seg = F.split(user_seg, " from ", -1)
    user = trunc_bytes_expr(F.get(seg, 0), 15)
    host_seg = F.get(seg, 1)  # NULL when no " from " (reference Err path)
    host = trunc_bytes_expr(
        F.trim(F.get(F.split(host_seg, "port", 2), 0)), 60
    )
    valid = host.isNotNull() & host.contains(".")
    return F.struct(
        F.when(valid, host).alias("host"),
        F.when(valid, user).alias("username"),
    )
