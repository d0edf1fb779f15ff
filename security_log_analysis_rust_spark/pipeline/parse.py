"""Parse stage: pages -> lines -> typed events (all narrow, no shuffle).

Maps the reference's per-source parsers onto one line-routed DataFrame DAG
(SURVEY.md §2.1-§2.4). Routing precedence per line:

1. journald JSON  (starts with ``{`` and mentions ``__REALTIME_TIMESTAMP``)
   -> ssh / nginx / leveled-message routing (``src/parse_logs.rs:261-302,
   328-379``)
2. ssh auth line  (contains ``sshd`` and ``Invalid user``)
   -> ``parse_log_line_ssh`` semantics (``src/parse_logs.rs:88-116``)
3. anything else is an apache-CLF candidate
   -> ``parse_log_line_apache`` semantics (``src/parse_logs.rs:208-232``)

Guards, tokenization, timestamp parsing AND (since round 3) the byte-exact
'Invalid user' extraction are all built-in column expressions — the whole
parse stage runs inside whole-stage codegen with zero Python workers
(``parsing/exprs.py``; the Arrow pandas kernel in ``parsing/udfs.py``
remains as a differential-tested second implementation). Everything uses
``try_*`` variants so the stage is safe under ANSI mode (Spark 4 default) —
unparseable rows drop instead of failing a 100 TB job.

Scale notes: every transform here is narrow (filter/project over the line
explode), so this stage never shuffles; it scales linearly with input splits
and survives skew trivially.
"""

from __future__ import annotations

from functools import reduce
from operator import or_
from typing import Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..parsing.core import DEFAULT_SYSTEMD_LOG_FILTERS, SERVERS
from ..parsing.exprs import invalid_user_expr
from ..schemas import JOURNALD_SCHEMA

#: strict dotted-quad (matches Rust ``Ipv4Addr`` parse: 0-255, no leading 0s)
IPV4_RE = (
    r"^((25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\.){3}"
    r"(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])$"
)

_EVENT_COLS = ["url", "line_no", "service", "server", "datetime", "host", "username"]


def pages_to_lines(pages: DataFrame) -> DataFrame:
    """Explode page ``text`` into one row per log line (S3 analog)."""
    return pages.select(
        "url",
        "warc_ts",
        F.posexplode(F.split(F.coalesce("text", F.lit("")), "\n")).alias(
            "line_no", "line"
        ),
    )


def server_col(url: Column = None) -> Column:
    """Deterministic server attribution (reference: per-host config,
    ``src/lib.rs:96-166``). Hash-partitioned on url so both sides of the
    DuckDB oracle derive the same value."""
    url = F.col("url") if url is None else url
    return F.when(
        F.substring(F.md5(url), 32, 1).isin(*list("01234567")),
        F.lit(SERVERS[0]),
    ).otherwise(F.lit(SERVERS[1]))


def is_journald(line: Column) -> Column:
    return line.startswith("{") & line.contains("__REALTIME_TIMESTAMP")


def is_ssh_auth(line: Column) -> Column:
    # F1 pre-filter (parse_logs.rs:90-92)
    return (
        ~is_journald(line) & line.contains("sshd") & line.contains("Invalid user")
    )


def parse_ssh_lines(lines: DataFrame) -> DataFrame:
    """ssh auth lines -> events (P1+P2; service='ssh').

    Timestamp: ``"{tok0} {tok1} {year} {tok2}"`` with year = year(warc_ts)
    (the reference uses log-file mtime year, parse_logs.rs:156-158; the crawl
    timestamp is the analogous provenance here), pinned to UTC (SURVEY §7.4.2).
    """
    line = F.col("line")
    toks = F.split(F.trim(line), r"\s+")
    df = (
        lines.filter(is_ssh_auth(line))
        .withColumn("toks", toks)
        .filter(F.size("toks") >= 10)  # F2 token guard (parse_logs.rs:93-96)
        .withColumn(
            "datetime",
            F.try_to_timestamp(
                F.concat_ws(
                    " ",
                    F.get("toks", 0),
                    F.get("toks", 1),
                    F.year("warc_ts").cast("string"),
                    F.get("toks", 2),
                ),
                F.lit("MMM d yyyy HH:mm:ss"),
            ),
        )
        .withColumn("ex", invalid_user_expr(line))
    )
    return df.filter(
        F.col("datetime").isNotNull() & F.col("ex.host").isNotNull()
    ).select(
        "url",
        "line_no",
        F.lit("ssh").alias("service"),
        server_col().alias("server"),
        "datetime",
        F.col("ex.host").alias("host"),
        F.col("ex.username").alias("username"),
    )


def parse_apache_lines(lines: DataFrame) -> DataFrame:
    """apache CLF candidates -> events (P3; service='apache', username NULL)."""
    line = F.col("line")
    toks = F.split(F.trim(line), r"\s+")
    df = (
        lines.filter(~is_journald(line) & ~is_ssh_auth(line))
        .withColumn("toks", toks)
        .filter(F.size("toks") >= 5)  # F2 (parse_logs.rs:209-212)
        .withColumn("host", F.substring(F.get("toks", 0), 1, 60))
        .filter(F.col("host").contains("."))  # F3 (parse_logs.rs:215-217)
        .withColumn(
            "datetime",
            F.try_to_timestamp(
                F.regexp_replace(
                    F.concat(F.get("toks", 3), F.get("toks", 4)), r"[\[\]]", ""
                ),
                F.lit("d/MMM/yyyy:HH:mm:ssxx"),
            ),
        )
        .filter(F.col("datetime").isNotNull())
    )
    return df.select(
        "url",
        "line_no",
        F.lit("apache").alias("service"),
        server_col().alias("server"),
        "datetime",
        "host",
        F.lit(None).cast("string").alias("username"),
    )


def parse_journald_lines(
    lines: DataFrame,
    filters: Sequence[str] = DEFAULT_SYSTEMD_LOG_FILTERS,
) -> Tuple[DataFrame, DataFrame]:
    """journald JSON lines -> (intrusion events, systemd messages).

    Mirrors the daemon routing (parse_logs.rs:328-371): blacklist filter
    first (F6), then 'Invalid user ' -> ssh, then 'nginx' with a strict-IPv4
    token[2] -> nginx, else leveled-message classification (P7) over the raw
    line. µs-epoch timestamps via ``timestamp_micros`` (P4).
    """
    line = F.col("line")
    blacklist = reduce(or_, [line.contains(f) for f in filters])
    j = (
        lines.filter(is_journald(line))
        .filter(~blacklist)
        .withColumn("rec", F.from_json(line, JOURNALD_SCHEMA))
        .withColumn(
            "jts",
            F.timestamp_micros(
                F.col("rec.__REALTIME_TIMESTAMP").try_cast("long")
            ),
        )
        .filter(F.col("jts").isNotNull())
    )

    is_invalid_user = line.contains("Invalid user ")
    ssh = (
        j.filter(is_invalid_user)
        .withColumn("ex", invalid_user_expr(F.col("rec.MESSAGE")))
        .filter(F.col("ex.host").isNotNull())
        .select(
            "url",
            "line_no",
            F.lit("ssh").alias("service"),
            server_col().alias("server"),
            F.col("jts").alias("datetime"),
            F.col("ex.host").alias("host"),
            F.col("ex.username").alias("username"),
        )
    )

    mtoks = F.split(F.trim(F.col("rec.MESSAGE")), r"\s+")
    nginx_host = F.substring(F.get(mtoks, 2), 1, 60)
    nginx_ok = (
        ~is_invalid_user
        & line.contains("nginx")
        & (F.size(mtoks) >= 3)
        & nginx_host.rlike(IPV4_RE)
    )
    nginx = j.filter(nginx_ok).select(
        "url",
        "line_no",
        F.lit("nginx").alias("service"),
        server_col().alias("server"),
        F.col("jts").alias("datetime"),
        nginx_host.alias("host"),
        F.lit(None).cast("string").alias("username"),
    )

    # leveled messages: everything not routed above (failed nginx parses
    # fall through, parse_logs.rs:354-363); classifier on the raw line
    level = (
        F.when(line.contains("err") | line.contains("ERR"), "error")
        .when(line.contains("warn") | line.contains("WARN"), "warn")
        .when(line.contains("info") | line.contains("INFO"), "info")
        .when(line.contains("debug") | line.contains("DEBUG"), "debug")
    )
    systemd = (
        j.filter(~is_invalid_user & ~nginx_ok)
        .withColumn("log_level", level)
        .filter(F.col("log_level").isNotNull())
        .select(
            "url",
            "line_no",
            "log_level",
            F.col("rec.UNIT").alias("log_unit"),
            F.col("rec.MESSAGE").alias("log_message"),
            F.col("jts").alias("log_timestamp"),
        )
    )
    return ssh.unionByName(nginx), systemd


def extract_events_union(pages: DataFrame) -> dict:
    """Parse stage as a union of the per-source branch operators.

    Definitional form (each branch mirrors one reference parser 1:1); kept
    for per-branch queries and as the equivalence oracle for the fused
    single-pass plan below.
    """
    lines = pages_to_lines(pages)
    ssh = parse_ssh_lines(lines)
    apache = parse_apache_lines(lines)
    j_intr, systemd = parse_journald_lines(lines)
    events = ssh.unionByName(apache).unionByName(j_intr).select(*_EVENT_COLS)
    return {"events": events, "systemd": systemd, "lines": lines}


def extract_events(
    pages: DataFrame,
    filters: Sequence[str] = DEFAULT_SYSTEMD_LOG_FILTERS,
    persist: bool = False,
) -> dict:
    """Full parse stage, fused single-pass: pages -> {events, systemd, lines}.

    Semantically identical to :func:`extract_events_union` (tested), but the
    whole route is ONE projection over ONE explode of ONE scan, and the
    pandas UDF runs once per line instead of once per branch. At 100 TB the
    input scan dominates, so branch unions (3-4 scans) are the wrong plan;
    this is the plan you'd want: scan -> narrow project/filter, zero
    redundant passes.
    """
    line = F.col("line")
    is_j = is_journald(line)
    is_ssh = is_ssh_auth(line)
    blacklist = reduce(or_, [line.contains(f) for f in filters])

    rec = F.from_json(F.when(is_j, line), JOURNALD_SCHEMA)
    jts = F.timestamp_micros(rec["__REALTIME_TIMESTAMP"].try_cast("long"))
    j_valid = is_j & ~blacklist & jts.isNotNull()
    has_invalid_user = line.contains("Invalid user ")

    toks = F.split(F.trim(line), r"\s+")
    ssh_ts = F.try_to_timestamp(
        F.concat_ws(
            " ",
            F.get("toks", 0),
            F.get("toks", 1),
            F.year("warc_ts").cast("string"),
            F.get("toks", 2),
        ),
        F.lit("MMM d yyyy HH:mm:ss"),
    )
    apache_ts = F.try_to_timestamp(
        F.regexp_replace(F.concat(F.get("toks", 3), F.get("toks", 4)), r"[\[\]]", ""),
        F.lit("d/MMM/yyyy:HH:mm:ssxx"),
    )
    apache_host = F.substring(F.get("toks", 0), 1, 60)

    nginx_host = F.substring(F.get("mtoks", 2), 1, 60)
    nginx_ok = (
        F.col("j_valid")
        & ~F.col("has_iu")
        & line.contains("nginx")
        & (F.size("mtoks") >= 3)
        & F.col("nginx_host").rlike(IPV4_RE)
    )
    level = (
        F.when(line.contains("err") | line.contains("ERR"), "error")
        .when(line.contains("warn") | line.contains("WARN"), "warn")
        .when(line.contains("info") | line.contains("INFO"), "info")
        .when(line.contains("debug") | line.contains("DEBUG"), "debug")
    )

    # Stage 1: every per-line derivation is materialized as a COLUMN and the
    # kind routing references only those attributes; the row drop happens via
    # an explode-barrier instead of a Filter. Rationale (r6, measured): a
    # plain ``.filter(kind.isNotNull())`` is pushed below the projections by
    # PushDownPredicates with the full ``kind`` CASE *inlined*, so the filter
    # re-derived from_json ~8x and split(trim(line)) ~10x per line straight
    # from ``line`` (visible in plans/r06/q1_parse_route_before.txt); the
    # barrier pins one evaluation of each derivation per line. (Historical
    # note: the extraction was an Arrow pandas UDF through round 2, and
    # Catalyst duplicates a UDF referenced across a Filter boundary into two
    # ArrowEvalPython passes; the same barrier idea predates the
    # pure-expression extraction.)
    parsed0 = (
        pages_to_lines(pages)
        .withColumn("j_valid", j_valid)
        .withColumn("has_iu", has_invalid_user)
        .withColumn("msg", rec["MESSAGE"])
        .withColumn("unit", rec["UNIT"])
        .withColumn("jts", jts)
        .withColumn("toks", toks)
        .withColumn("apache_host", apache_host)
        # timestamp parsing is the parse stage's heaviest per-line work
        # (measured ~2x everything else combined), so both banks are
        # materialized GUARDED by their branch predicates — non-candidate
        # lines never touch the DateTimeFormatter, and the guard makes
        # ``isNotNull`` on the column equal to the old unguarded
        # ``guard & ts.isNotNull()`` conjunction everywhere it is read
        .withColumn(
            "ssh_ts", F.when(is_ssh & (F.size("toks") >= 10), ssh_ts)
        )
        .withColumn(
            "apache_ts",
            F.when(
                ~is_j
                & ~is_ssh
                & (F.size("toks") >= 5)
                & F.col("apache_host").contains("."),
                apache_ts,
            ),
        )
        .withColumn("mtoks", F.split(F.trim(F.col("msg")), r"\s+"))
        .withColumn("nginx_host", nginx_host)
        .withColumn("level", level)
        .withColumn(
            "kind",
            F.when(F.col("j_valid") & F.col("has_iu"), "jssh")
            .when(nginx_ok, "jnginx")
            .when(
                F.col("j_valid") & ~F.col("has_iu") & F.col("level").isNotNull(),
                "systemd",
            )
            .when(F.col("ssh_ts").isNotNull(), "ssh")
            .when(F.col("apache_ts").isNotNull(), "apache"),
        )
        .withColumn(
            "__line_keep",
            F.explode(
                F.when(F.col("kind").isNotNull(), F.array(F.lit(1))).otherwise(
                    F.array().cast("array<int>")
                )
            ),
        )
    )

    # Stage 2: ONE extraction expression serves both ssh paths (pure JVM
    # since round 3 — parsing/exprs.py — so the whole parse stage runs in
    # whole-stage codegen with zero Python workers); rows whose extraction
    # fails (no ' from ' / dot-less host) are dropped via an explode-barrier
    # instead of a filter so the struct is computed once.
    is_ssh_kind = F.col("kind").isin("ssh", "jssh")
    parsed = parsed0.withColumn(
        "ex",
        invalid_user_expr(
            F.when(F.col("kind") == "jssh", F.col("msg")).when(
                F.col("kind") == "ssh", line
            )
        ),
    ).withColumn(
        "__keep",
        F.explode(
            F.when(
                ~is_ssh_kind | F.col("ex.host").isNotNull(),
                F.array(F.lit(1)),
            ).otherwise(F.array().cast("array<int>"))
        ),
    )

    if persist:
        # both sinks consume `parsed`; materialize the (filtered, post-UDF)
        # frame once so the fan-out doesn't re-run the scan+explode+UDF per
        # sink. Caller unpersists via result["parsed"].unpersist().
        from pyspark import StorageLevel

        parsed = parsed.persist(StorageLevel.MEMORY_AND_DISK)

    # Unified routed projection: every surviving line is exactly one sink
    # row, so the whole fan-out is ONE narrow select — single-pass writers
    # (route.write_sinks_single_pass) consume this directly and never
    # rescan the input per sink.
    is_intr = F.col("kind").isin("ssh", "apache", "jssh", "jnginx")
    routed = parsed.select(
        "url",
        "line_no",
        F.when(is_intr, "intrusion_log")
        .otherwise("systemd_log_messages")
        .alias("sink"),
        F.when(F.col("kind").isin("ssh", "jssh"), "ssh")
        .when(F.col("kind") == "jnginx", "nginx")
        .when(F.col("kind") == "apache", "apache")
        .alias("service"),
        server_col().alias("server"),
        F.when(F.col("kind").isin("jssh", "jnginx"), F.col("jts"))
        .when(F.col("kind") == "ssh", F.col("ssh_ts"))
        .when(F.col("kind") == "apache", F.col("apache_ts"))
        .alias("datetime"),
        F.when(F.col("kind").isin("ssh", "jssh"), F.col("ex.host"))
        .when(F.col("kind") == "jnginx", F.col("nginx_host"))
        .when(F.col("kind") == "apache", F.col("apache_host"))
        .alias("host"),
        F.when(F.col("kind").isin("ssh", "jssh"), F.col("ex.username")).alias(
            "username"
        ),
        F.when(~is_intr, F.col("level")).alias("log_level"),
        F.when(~is_intr, F.col("unit")).alias("log_unit"),
        F.when(~is_intr, F.col("msg")).alias("log_message"),
        F.when(~is_intr, F.col("jts")).alias("log_timestamp"),
    )

    events = routed.filter(F.col("sink") == "intrusion_log").select(
        "url", "line_no", "service", "server", "datetime", "host", "username"
    )
    systemd = routed.filter(F.col("sink") == "systemd_log_messages").select(
        "url", "line_no", "log_level", "log_unit", "log_message", "log_timestamp"
    )
    return {
        "events": events,
        "systemd": systemd,
        "routed": routed,
        "lines": pages_to_lines(pages),
        "parsed": parsed,
    }
