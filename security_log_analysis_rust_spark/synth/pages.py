"""Deterministic Common-Crawl-style pages generator.

Produces the input_hint table ``(url, warc_ts, html, text, lang)`` where each
page's ``text`` is a newline-joined mix of:

* ssh auth-log lines (valid 'Invalid user' + realistic noise) — grammar from
  the reference fixture ``tests/data/test_auth.log`` and parser
  ``src/parse_logs.rs:88-116``
* apache/nginx CLF access lines — ``src/parse_logs.rs:208-232``
* journald JSON lines (ssh / nginx / leveled / blacklist-filtered) —
  ``src/parse_logs.rs:261-302,328-379``
* plain noise

Hosts are Zipf-skewed (the reference fixture has one IP in ~900/1000 lines);
edge cases (empty / spaced / >15-byte usernames, >60-byte hosts, dot-less
hosts, strict-IPv4 rejects, same-second duplicate pairs) appear at every
scale. Everything derives from one seeded numpy RNG — no wall-clock, no
external data. Output is a *directory* of parquet part files so Spark and
DuckDB both get free read parallelism.
"""

from __future__ import annotations

import json
import os
import shutil
from datetime import datetime, timedelta

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .pool import USERS, host_pool

_MONTHS = ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
           "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]
_OFFSETS = ["-0400", "+0000", "+0100", "+0530"]
_SYSLOG_HOSTS = ["dilepton-tower", "ip-172-31-78-8", "edge-proxy", "bastion01"]
_PATHS = ["/db/db-admin/index.php?lang=en", "/garmin/fitbit/heartrate_plots",
          "/wp-login.php", "/.env", "/admin/config.php", "/index.html"]
_UAS = ["Mozilla/5.0 (X11; Linux x86_64)", "curl/7.88.1", "python-requests/2.31"]
_YEAR = 2024
_EPOCH_2024_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in µs

# line-type ids
_T_SSH, _T_SSH_NOISE, _T_SSH_BROKEN, _T_APACHE, _T_APACHE_NOISE = 0, 1, 2, 3, 4
_T_JSSH, _T_JNGINX, _T_JNGINX_BAD, _T_JLEVEL, _T_JFILTER, _T_NOISE = 5, 6, 7, 8, 9, 10
_TYPES = np.arange(11)
_TYPE_P = np.array(
    [0.29, 0.23, 0.005, 0.14, 0.05, 0.07, 0.05, 0.01, 0.075, 0.02, 0.06]
)
_TYPE_P = _TYPE_P / _TYPE_P.sum()

_LEVEL_MSGS = [
    "ERROR:Unknown state for interface eth{k}: n/a",
    "WARNING: disk usage at {k} percent on /var",
    "INFO: unit reload completed in {k} ms",
    "debug: probe value={k}",
    "Task {k} finished without incident",  # no level keyword -> dropped
]
_FILTERED_MSGS = [
    "kex_exchange_identification: Connection closed by remote host",
    "error: maximum authentication attempts exceeded for invalid user root",
    "Disconnected from invalid user admin 10.1.2.3 port 22",
    "Failed password for invalid user bob from 10.1.2.3 port 22",
]
_NOISE_LINES = [
    "Lorem ipsum dolor sit amet, consectetur adipiscing elit",
    "fetched {k} resources in {k} ms",
    "<!-- crawl snapshot boundary -->",
    "cache hit ratio {k} percent",
]


def _ts_fields(rng) -> tuple:
    """(mon_idx, day, hh, mm, ss) — days 10-28 keep %d portable everywhere."""
    return (
        int(rng.integers(0, 12)),
        int(rng.integers(10, 29)),
        int(rng.integers(0, 24)),
        int(rng.integers(0, 60)),
        int(rng.integers(0, 60)),
    )


def _make_line(t: int, rng, hosts, hweights, ip_hosts, ipweights, users) -> list:
    """Build one or more raw text lines of type ``t``."""
    mon, day, hh, mm, ss = _ts_fields(rng)
    stamp = f"{_MONTHS[mon]} {day:02d} {hh:02d}:{mm:02d}:{ss:02d}"
    sys_h = _SYSLOG_HOSTS[int(rng.integers(0, len(_SYSLOG_HOSTS)))]
    pid = int(rng.integers(1000, 99999))
    port = int(rng.integers(1024, 65535))
    k = int(rng.integers(1, 1000))

    if t == _T_SSH:
        host = hosts[int(rng.choice(len(hosts), p=hweights))]
        user = users[int(rng.choice(len(users)))]
        line = (
            f"{stamp} {sys_h} sshd[{pid}]: Invalid user {user} from "
            f"{host} port {port}"
        )
        out = [line]
        if rng.random() < 0.08:  # same-second duplicate, new pid/port (dedup)
            out.append(
                f"{stamp} {sys_h} sshd[{pid + 1}]: Invalid user {user} from "
                f"{host} port {port + 1}"
            )
        return out
    if t == _T_SSH_NOISE:
        ip = ip_hosts[int(rng.choice(len(ip_hosts), p=ipweights))]
        tmpl = int(rng.integers(0, 5))
        return [[
            f"{stamp} {sys_h} sshd[{pid}]: Failed password for root from {ip} port {port} ssh2",
            f"{stamp} {sys_h} sshd[{pid}]: pam_unix(sshd:auth): authentication failure; "
            f"logname= uid=0 euid=0 tty=ssh ruser= rhost={ip}  user=root",
            f"{stamp} {sys_h} sshd[{pid}]: Received disconnect from {ip} port {port}:11:  [preauth]",
            f"{stamp} {sys_h} sshd[{pid}]: Disconnected from authenticating user root {ip} port {port} [preauth]",
            f"{stamp} {sys_h} sshd[{pid}]: message repeated 2 times: [ Failed password for root from {ip} port {port} ssh2]",
        ][tmpl]]
    if t == _T_SSH_BROKEN:
        # 'Invalid user' with no ' from ' — the reference Err path; the
        # pipeline drops and counts these (10 tokens, passes the guards)
        return [f"{stamp} {sys_h} sshd[{pid}]: Invalid user intruder port {port}"]
    if t == _T_APACHE:
        host = hosts[int(rng.choice(len(hosts), p=hweights))]
        off = _OFFSETS[int(rng.integers(0, len(_OFFSETS)))]
        path = _PATHS[int(rng.integers(0, len(_PATHS)))]
        ua = _UAS[int(rng.integers(0, len(_UAS)))]
        status = [200, 404, 403, 301][int(rng.integers(0, 4))]
        return [
            f'{host} - - [{day:02d}/{_MONTHS[mon]}/{_YEAR}:{hh:02d}:{mm:02d}:{ss:02d} {off}] '
            f'"GET {path} HTTP/1.1" {status} {k} "-" "{ua}"'
        ]
    if t == _T_APACHE_NOISE:
        # >=5 tokens, token0 has a dot, but tokens 3-4 are not a timestamp
        return [f"config.v{k} loaded module in {k} ms by worker-{pid}"]

    # journald JSON variants
    us = _EPOCH_2024_US + int(rng.integers(0, 364 * 86_400)) * 1_000_000 + int(
        rng.integers(0, 1_000_000)
    )
    cursor = f"s=synth{pid};i={k:x}"
    if t == _T_JSSH:
        host = hosts[int(rng.choice(len(hosts), p=hweights))]
        user = users[int(rng.choice(len(users)))]
        msg = f"Invalid user {user} from {host} port {port}"
        rec = {"__REALTIME_TIMESTAMP": str(us), "__CURSOR": cursor,
               "MESSAGE": msg, "UNIT": "ssh.service"}
        return [json.dumps(rec, separators=(",", ":"))]
    if t == _T_JNGINX:
        ip = ip_hosts[int(rng.choice(len(ip_hosts), p=ipweights))]
        msg = f"GET {_PATHS[int(rng.integers(0, len(_PATHS)))]} {ip} status={k}"
        rec = {"__REALTIME_TIMESTAMP": str(us), "__CURSOR": cursor,
               "MESSAGE": msg, "UNIT": "nginx.service"}
        return [json.dumps(rec, separators=(",", ":"))]
    if t == _T_JNGINX_BAD:
        # token[2] fails strict-IPv4 -> falls through to level classification
        bad = ["10.0.0.01", "300.1.2.3", "not-an-ip"][int(rng.integers(0, 3))]
        suffix = " error timeout" if rng.random() < 0.5 else " done"
        msg = f"GET /probe {bad}{suffix}"
        rec = {"__REALTIME_TIMESTAMP": str(us), "__CURSOR": cursor,
               "MESSAGE": msg, "UNIT": "nginx.service"}
        return [json.dumps(rec, separators=(",", ":"))]
    if t == _T_JLEVEL:
        msg = _LEVEL_MSGS[int(rng.integers(0, len(_LEVEL_MSGS)))].format(k=k)
        rec = {"__REALTIME_TIMESTAMP": str(us), "__CURSOR": cursor,
               "MESSAGE": msg, "UNIT": "myapp.service"}
        return [json.dumps(rec, separators=(",", ":"))]
    if t == _T_JFILTER:
        msg = _FILTERED_MSGS[int(rng.integers(0, len(_FILTERED_MSGS)))]
        rec = {"__REALTIME_TIMESTAMP": str(us), "__CURSOR": cursor,
               "MESSAGE": msg, "UNIT": "ssh.service"}
        return [json.dumps(rec, separators=(",", ":"))]
    return [_NOISE_LINES[int(rng.integers(0, len(_NOISE_LINES)))].format(k=k)]


def write_pages(out_path: str, n_pages: int, seed: int = 42,
                n_parts: int | None = None) -> str:
    """Generate ``n_pages`` pages into a parquet dataset directory."""
    rng = np.random.default_rng(seed)
    pool = host_pool(seed)
    hosts, hweights = pool["hosts"], pool["weights"]
    ip_idx = [i for i, h in enumerate(hosts)
              if h.count(".") == 3 and h.replace(".", "").isdigit()]
    ip_hosts = [hosts[i] for i in ip_idx]
    ipweights = hweights[ip_idx] / hweights[ip_idx].sum()
    users = USERS

    urls, warc_tss, htmls, texts, langs = [], [], [], [], []
    base_ts = datetime(_YEAR, 1, 1)
    for i in range(n_pages):
        n_lines = int(rng.integers(25, 56))
        types = rng.choice(_TYPES, size=n_lines, p=_TYPE_P)
        lines: list[str] = []
        for t in types:
            lines.extend(
                _make_line(int(t), rng, hosts, hweights, ip_hosts, ipweights, users)
            )
        urls.append(f"https://site{i % 97}.example.com/warc/{_YEAR}/page-{i:08d}.html")
        warc_tss.append(base_ts + timedelta(seconds=i * 97 + int(rng.integers(0, 60))))
        htmls.append(f"<html><body>synthetic page {i}</body></html>".encode())
        texts.append("\n".join(lines))
        langs.append(["en", "en", "en", "en", "en", "en", "en", "en", "de", "fr"][i % 10])

    table = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(warc_tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )

    if n_parts is None:
        n_parts = max(8, min(64, n_pages // 400))
    tmp = f"{out_path}.tmp-{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    per = (n_pages + n_parts - 1) // n_parts
    for p in range(n_parts):
        chunk = table.slice(p * per, per)
        if chunk.num_rows == 0:
            break
        pq.write_table(chunk, os.path.join(tmp, f"part-{p:04d}.parquet"))
    shutil.rmtree(out_path, ignore_errors=True)
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    os.rename(tmp, out_path)
    return out_path
