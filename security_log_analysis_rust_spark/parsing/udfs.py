"""Vectorized (Arrow-batched) pandas implementations of the parse bank.

Split of work between JVM and Python (SURVEY.md §2.8):

* Cheap guards, tokenization, timestamp parsing, IPv4 checks, and level
  classification stay **JVM-side** as built-in column expressions (whole-stage
  codegen) — see :mod:`..pipeline.parse`.
* The one extraction that cannot be expressed byte-exactly with built-ins —
  ``parse_log_message`` (literal-substring splits + byte truncation,
  ``/root/reference/src/parse_logs.rs:58-84``) — runs as a single pandas UDF
  over Arrow batches. No per-row Python anywhere: everything below is
  pandas vectorized string ops.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType, StructField, StructType


def truncate_bytes_series(s: pd.Series, n: int) -> pd.Series:
    """Vectorized byte-truncation (parse_logs.rs:66-68,78).

    Only rows longer than ``n`` bytes pay the encode/slice/decode cost.
    A slice through a multi-byte character raises, mirroring the reference
    panic; synthetic data is ASCII (SURVEY.md §7.4.1).
    """
    isna = s.isna()
    b = s.fillna("").astype(str).str.encode("utf-8")
    lens = b.str.len()
    over = (lens > n) & ~isna
    if over.any():
        s = s.copy()
        s[over] = b[over].str.slice(0, n).str.decode("utf-8")
    return s


def extract_invalid_user(msg: pd.Series) -> pd.DataFrame:
    """Vectorized ``parse_log_message``: Series[str] -> (host, username).

    Semantics (parse_logs.rs:58-84):
      * split on literal ``"Invalid user "``; part between 1st and 2nd
        occurrence is the user segment (missing -> NULL row);
      * user = segment before the first ``" from "`` (may be empty / contain
        spaces), truncated to 15 bytes;
      * host = segment after the first ``" from "`` (up to the second), cut
        at the first literal ``"port"``, trimmed, truncated to 60 bytes;
      * rows whose truncated host lacks ``'.'`` -> NULL (F3), as are rows
        with no ``" from "`` (the reference's Err path becomes drop+count).
    """
    # Arrow batches where every value is null arrive as float64(NaN);
    # coerce to pandas StringDtype so .str ops are always valid. The SAME
    # collapse happens mid-kernel when NO line in a batch contains a marker
    # (parts.str[1] becomes float64(all-NaN)), so every intermediate series
    # is re-coerced too (found by the hypothesis parity test).
    def _as_str(s: pd.Series) -> pd.Series:
        if s.dtype != object and not isinstance(s.dtype, pd.StringDtype):
            return s.astype("string")
        return s

    msg = _as_str(msg)
    parts = msg.str.split("Invalid user ", regex=False)
    user_seg = _as_str(parts.str[1])  # NaN when the marker is absent
    seg = user_seg.str.split(" from ", regex=False)
    user = _as_str(seg.str[0])
    host_seg = _as_str(seg.str[1])  # NaN when no " from " (reference Err path)
    host = host_seg.str.split("port", n=1, regex=False).str[0].str.strip()
    host = _as_str(host)
    user = truncate_bytes_series(user, 15)
    host = truncate_bytes_series(host, 60)
    valid = (host.notna() & host.str.contains(".", regex=False)).fillna(False)
    valid = valid.astype(bool)
    out = pd.DataFrame({"host": host.where(valid), "username": user.where(valid)})
    return out.astype(object).where(out.notna(), None)


_EXTRACT_SCHEMA = StructType(
    [
        StructField("host", StringType(), True),
        StructField("username", StringType(), True),
    ]
)


@pandas_udf(_EXTRACT_SCHEMA)
def invalid_user_udf(msg: pd.Series) -> pd.DataFrame:
    """Arrow-batched struct UDF: message -> (host, username)."""
    return extract_invalid_user(msg)
