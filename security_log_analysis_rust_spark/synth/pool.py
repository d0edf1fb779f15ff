"""Shared deterministic pools (hosts, users, country codes).

The host pool is Zipf-weighted: the reference's own fixture is extremely
skewed (one IP accounts for ~900/1000 lines of ``test_auth.log``), and the
pipeline's salting/AQE paths are exercised by reproducing that skew
(SURVEY.md §7.4.6).
"""

from __future__ import annotations

import hashlib
from typing import List, Tuple

import numpy as np

#: golden enrichment anchors — reference whois tests
#: ``src/host_country_metadata.rs:251-337``
GOLDEN_HOSTS = {
    "36.110.50.217": "CN",
    "82.73.86.33": "NL",
    "31.162.240.19": "RU",
    "174.61.53.116": "US",
    "217.29.210.13": "EU",
}

#: well-known ISO-3166-ish alpha-2 codes (includes every golden / classifier
#: code: CN NL RU US EU TW KR BR JP); padded to exactly 253 rows to match the
#: reference's asserted table size (``src/models.rs:979``).
_BASE_CODES = [
    "AD", "AE", "AF", "AG", "AL", "AM", "AO", "AR", "AT", "AU", "AZ", "BA",
    "BB", "BD", "BE", "BF", "BG", "BH", "BI", "BJ", "BN", "BO", "BR", "BS",
    "BT", "BW", "BY", "BZ", "CA", "CD", "CF", "CG", "CH", "CI", "CL", "CM",
    "CN", "CO", "CR", "CU", "CV", "CY", "CZ", "DE", "DJ", "DK", "DM", "DO",
    "DZ", "EC", "EE", "EG", "ER", "ES", "ET", "EU", "FI", "FJ", "FM", "FR",
    "GA", "GB", "GD", "GE", "GH", "GM", "GN", "GQ", "GR", "GT", "GW", "GY",
    "HN", "HR", "HT", "HU", "ID", "IE", "IL", "IN", "IQ", "IR", "IS", "IT",
    "JM", "JO", "JP", "KE", "KG", "KH", "KI", "KM", "KN", "KP", "KR", "KW",
    "KZ", "LA", "LB", "LC", "LI", "LK", "LR", "LS", "LT", "LU", "LV", "LY",
    "MA", "MC", "MD", "ME", "MG", "MH", "MK", "ML", "MM", "MN", "MR", "MT",
    "MU", "MV", "MW", "MX", "MY", "MZ", "NA", "NE", "NG", "NI", "NL", "NO",
    "NP", "NR", "NZ", "OM", "PA", "PE", "PG", "PH", "PK", "PL", "PT", "PW",
    "PY", "QA", "RO", "RS", "RU", "RW", "SA", "SB", "SC", "SD", "SE", "SG",
    "SI", "SK", "SL", "SM", "SN", "SO", "SR", "SS", "ST", "SV", "SY", "SZ",
    "TD", "TG", "TH", "TJ", "TL", "TM", "TN", "TO", "TR", "TT", "TV", "TW",
    "TZ", "UA", "UG", "US", "UY", "UZ", "VA", "VC", "VE", "VN", "VU", "WS",
    "YE", "ZA", "ZM", "ZW",
]

N_COUNTRY_CODES = 253


def country_codes() -> List[Tuple[str, str]]:
    """Exactly 253 (code, country) rows, deterministic."""
    codes = list(_BASE_CODES)
    seen = set(codes)
    # pad with synthetic two-letter codes in sorted order
    for a in "ABCDEFGHIJKLMNOPQRSTUVWXYZ":
        for b in "ABCDEFGHIJKLMNOPQRSTUVWXYZ":
            if len(codes) >= N_COUNTRY_CODES:
                break
            c = a + b
            if c not in seen:
                codes.append(c)
                seen.add(c)
        if len(codes) >= N_COUNTRY_CODES:
            break
    assert len(codes) == N_COUNTRY_CODES
    return [(c, f"Country {c}") for c in codes]


def _md5_int(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


def host_pool(seed: int = 42) -> dict:
    """Deterministic host pool with Zipf weights.

    Returns dict with:

    * ``hosts``       — list of attacker hosts (dotted IPs/hostnames first,
      then edge-case hosts)
    * ``weights``     — Zipf-ish sampling probabilities over ``hosts``
    * ``host_country``— mapping host -> code for ~6/7 of dotted hosts
      (the rest stay dangling to exercise the anti-join J2)
    """
    rng = np.random.default_rng(seed)
    hosts = list(GOLDEN_HOSTS)
    # random IPv4s (no leading-zero octets by construction)
    n_ips = 380
    octets = rng.integers(1, 255, size=(n_ips, 4))
    hosts += [".".join(str(x) for x in row) for row in octets]
    # dotted hostnames
    hosts += [f"scanner{i}.botnet{i % 7}.example" for i in range(10)]
    # long hostnames that truncate to 60 bytes (dot inside the first 60)
    hosts += [
        "deep.subdomain." + "x" * 80 + ".example.com",
        "crawler.zone-" + "y" * 90 + ".net",
    ]
    # hosts without '.' -> parser drops them (F3)
    hosts += ["localhost", "gateway", "badhost"]

    n = len(hosts)
    ranks = np.arange(1, n + 1, dtype=np.float64)
    weights = 1.0 / ranks**1.1
    weights /= weights.sum()

    # enrichment coverage: every golden host + ~6/7 of the rest of the
    # dotted pool (keyed on the <=60-byte truncated host, as events store it)
    codes = [c for c, _ in country_codes()]
    mapping = dict(GOLDEN_HOSTS)
    for h in hosts:
        if "." not in h:
            continue
        ht = h.encode()[:60].decode()
        if ht in mapping:
            continue
        if _md5_int(ht) % 7 == 0:
            continue  # dangling host
        mapping[ht] = codes[_md5_int("cc:" + ht) % len(codes)]
    return {"hosts": hosts, "weights": weights, "host_country": mapping}


#: usernames pool: includes empty, spaces, and >15-byte edge cases (P1)
USERS = [
    "admin", "test", "pi", "user", "oracle", "postgres", "git", "ubuntu",
    "deploy", "guest", "ftpuser", "www", "mysql", "jenkins", "minecraft",
    "a b c",                     # username containing spaces
    "",                          # empty username
    "verylongusername_overflow", # 24 bytes -> truncates to 15
    "ark", "dbadmin",
]
