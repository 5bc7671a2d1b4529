"""Crawl-politeness operators (RFC 9309 robots exclusion) — the
filter every web-corpus pipeline runs between the URL frontier and
the fetch/ingest tier (WARC -> HTML -> text lives in sources/warc.py
and operators/html.py; this decides WHICH urls are even eligible).

Reference analog: none in Hadoop core (north-star scope); semantics
are the public RFC 9309:
 - a rule pattern is a path PREFIX match, with ``*`` matching any
   span and a trailing ``$`` anchoring end-of-path;
 - among the rules of the matched user-agent group, the decision is
   the MOST SPECIFIC match — longest pattern in octets wins, and a
   length tie between allow and disallow resolves to ALLOW;
 - a url matching no rule is allowed.

Everything is declarative: patterns compile to anchored regexes with
ONE nested regexp_replace chain (JVM-side, no Python), the
(url x host-rules) candidate join is an equi-join on host, and the
winner is a row_number window over (pattern length, allow) — no UDF,
no driver loop, co-partitionable by host at 100 TB (robots tables are
per-host and tiny next to frontiers; broadcast when small)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def robots_pattern_regex(pattern: Column | str) -> Column:
    """RFC 9309 pattern -> anchored Java/RE2-safe regex, fully
    JVM-side: regex metacharacters escape, ``*`` becomes ``.*``, and
    a trailing ``$`` (escaped to ``\\$`` by the first step) converts
    back to an end anchor only in the final position."""
    p = F.col(pattern) if isinstance(pattern, str) else pattern
    esc = F.regexp_replace(p, r"([.^$+?(){}|\[\]\\])", r"\\$1")
    wild = F.regexp_replace(esc, r"\*", ".*")
    # a bare '$' in a Java replacement string is an (invalid) group
    # reference — it must itself be escaped
    anchored = F.regexp_replace(wild, r"\\\$$", r"\$")
    return F.concat(F.lit("^"), anchored)


def robots_decide(
    urls: DataFrame,
    rules: DataFrame,
    url_id: str = "url_id",
    url_host: str = "host",
    url_path: str = "path",
    rule_host: str = "host",
    rule_allow: str = "allow",
    rule_pattern: str = "pattern",
) -> DataFrame:
    """Per-url crawl decision: urls (url_id unique, host, path) x
    rules (host, allow boolean, pattern) -> urls + (allowed,
    matched_pattern, matched_len). Most-specific-match wins (pattern
    octet length), allow wins length ties, and a url matching no rule
    (including hosts with no robots at all) defaults to allowed —
    RFC 9309 §2.2.2 verbatim. Shape: host equi-join to the MATCHING
    rules only, per-url top-1 window, then a left join back onto the
    frontier so non-matching urls keep their default."""
    rx = rules.select(
        F.col(rule_host).alias("__rhost"),
        F.col(rule_allow).alias("__rallow"),
        F.col(rule_pattern).alias("__rpat"),
        F.octet_length(rule_pattern).cast("bigint").alias("__rlen"),
        robots_pattern_regex(rule_pattern).alias("__rrx"),
    )
    cand = urls.select(url_id, url_host, url_path).join(
        rx, F.col(url_host) == F.col("__rhost"), "inner"
    ).filter(F.expr(f"{url_path} rlike __rrx"))
    w = Window.partitionBy(url_id).orderBy(
        F.desc("__rlen"), F.desc("__rallow"), F.asc("__rpat")
    )
    best = (
        cand.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(url_id, "__rallow", "__rpat", "__rlen")
    )
    return urls.join(best, url_id, "left").select(
        *urls.columns,
        F.coalesce(F.col("__rallow"), F.lit(True)).alias("allowed"),
        F.coalesce(F.col("__rpat"), F.lit("")).alias("matched_pattern"),
        F.coalesce(F.col("__rlen"), F.lit(0)).cast("bigint").alias("matched_len"),
    )
