"""Pure-Python pipeline oracle (no Spark).

Applies the byte-exact parse core with the pipeline's routing precedence to
a pages table, producing the expected event/systemd rows. Used by tests to
assert per-url byte-identical extraction (BASELINE.md) and by the DuckDB
correctness harness as an independent second implementation.
"""

from __future__ import annotations

import hashlib
from datetime import timezone
from typing import Iterable, List, Tuple

from .parsing.core import (
    DEFAULT_SYSTEMD_LOG_FILTERS,
    SERVERS,
    parse_journald_line,
    parse_log_line_apache,
    parse_log_line_ssh,
)


def server_for_url(url: str) -> str:
    """Must match ``pipeline.parse.server_col``."""
    return (
        SERVERS[0]
        if hashlib.md5(url.encode()).hexdigest()[31] in "01234567"
        else SERVERS[1]
    )


def extract_page_events(
    url: str, warc_year: int, text: str
) -> Tuple[List[tuple], List[tuple]]:
    """-> (events, systemd) row tuples for one page.

    events:  (url, line_no, service, server, datetime, host, username)
    systemd: (url, line_no, log_level, log_unit, log_message, log_timestamp)
    """
    server = server_for_url(url)
    events, systemd = [], []
    for line_no, line in enumerate((text or "").split("\n")):
        if line.startswith("{") and "__REALTIME_TIMESTAMP" in line:
            r = parse_journald_line(line, DEFAULT_SYSTEMD_LOG_FILTERS)
            if r is None:
                continue
            if r["kind"] == "intrusion":
                events.append(
                    (url, line_no, r["service"], server,
                     r["datetime"].replace(tzinfo=None), r["host"], r["username"])
                )
            else:
                systemd.append(
                    (url, line_no, r["log_level"], r["log_unit"],
                     r["log_message"], r["log_timestamp"].replace(tzinfo=None))
                )
            continue
        if "sshd" in line and "Invalid user" in line:
            try:
                r = parse_log_line_ssh(warc_year, line, tz=timezone.utc)
            except ValueError:
                continue  # reference Err path -> pipeline drop
            if r is not None:
                events.append(
                    (url, line_no, "ssh", server,
                     r.timestamp.replace(tzinfo=None), r.host, r.user)
                )
            continue
        r = parse_log_line_apache(line)
        if r is not None:
            events.append(
                (url, line_no, "apache", server,
                 r.timestamp.replace(tzinfo=None), r.host, None)
            )
    return events, systemd


def extract_events_pandas(pages_df) -> Tuple[list, list]:
    """Run the oracle over a pandas pages frame -> (events, systemd) lists."""
    all_events, all_systemd = [], []
    for url, warc_ts, text in zip(
        pages_df["url"], pages_df["warc_ts"], pages_df["text"]
    ):
        ev, sy = extract_page_events(url, warc_ts.year, text)
        all_events.extend(ev)
        all_systemd.extend(sy)
    return all_events, all_systemd
