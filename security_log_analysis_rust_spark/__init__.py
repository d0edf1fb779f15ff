"""PySpark-native security-log analytics engine.

A from-scratch rebuild of the capabilities of
``ddboline/security_log_analysis_rust`` (reference at ``/root/reference``,
read-only) as an idiomatic PySpark DataFrame pipeline:

    pages (Common-Crawl-style: url, warc_ts, html, text, lang)
      -> explode text into lines
      -> vectorized regex/string bank (pandas UDFs, byte-exact semantics)
      -> events (service, server, datetime, host, username)
      -> broadcast-join enrichment (host_country, country_code)
      -> fan-out sinks (intrusion_log, systemd_log_messages)
      -> aggregates (per-host / per-country / per-day counts)
      -> per-partition checkpoint manifests for resumable incremental runs

This is NOT a port: the reference is a single-node tokio/Postgres binary;
this package re-expresses the same query semantics as Catalyst-optimizable
DataFrame plans designed for a multi-executor cluster at very large scale.
"""

__version__ = "0.1.0"
