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

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# One year in milliseconds — far above any sane Crawl-delay, far below
# int64 overflow; values past this are treated as malformed and skipped.
_MAX_DELAY_MS = 365 * 24 * 3600 * 1000


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


def parse_robots_txt(body: str) -> list[tuple[str, bool, str]]:
    """Parse one robots.txt (RFC 9309 §2.2) into (agent_lowercase,
    allow, pattern) rows: ``User-agent`` lines open a group (several
    consecutive ones share the following rules), ``Allow``/
    ``Disallow`` lines attach to every agent of the current group,
    keys are case-insensitive, ``#`` starts a comment, unknown keys
    and blank lines are ignored (blank lines do NOT close a group —
    only a new User-agent after rules does), and an empty Disallow
    pattern is a no-op per the RFC. Never raises: robots.txt in the
    wild is as broken as HTML, and the RFC says parse what you can."""
    rows: list[tuple[str, bool, str]] = []
    agents: list[str] = []
    group_has_rules = False
    for raw in (body or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if group_has_rules:
                agents, group_has_rules = [], False
            if val:
                agents.append(val.lower())
        elif key in ("allow", "disallow"):
            group_has_rules = True
            if not val:
                continue  # empty Disallow: allow everything = no rule
            for a in agents:
                rows.append((a, key == "allow", val))
    return rows


def select_agent_group(
    rules: list[tuple[str, bool, str]], product_token: str
) -> list[tuple[bool, str]]:
    """RFC 9309 §2.2.1 group selection: the crawler obeys the group
    whose user-agent EXACTLY matches its product token
    (case-insensitive), else the ``*`` group, else nothing (crawl
    allowed). Multiple groups with the same agent merge."""
    tok = product_token.lower()
    exact = [(al, p) for a, al, p in rules if a == tok]
    if exact:
        return exact
    return [(al, p) for a, al, p in rules if a == "*"]


def robots_rules_from_txt(
    robots: DataFrame,
    product_token: str,
    host_col: str = "host",
    body_col: str = "body",
) -> DataFrame:
    """(host, robots.txt body) -> (host, allow, pattern) for the
    crawler's product token, Arrow-batched (robots files are tiny and
    per-host; the parse is pure string work that never leaves the
    batch). Feed the result to :func:`robots_decide`."""
    import pandas as pd
    from collections.abc import Iterator

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            hosts, allows, pats = [], [], []
            for host, body in zip(b[host_col], b[body_col]):
                grp = select_agent_group(
                    parse_robots_txt(body if body is not None else ""),
                    product_token,
                )
                for allow, pattern in grp:
                    hosts.append(host)
                    allows.append(allow)
                    pats.append(pattern)
            yield pd.DataFrame(
                {"host": hosts, "allow": allows, "pattern": pats},
                columns=["host", "allow", "pattern"],
            )

    return robots.select(host_col, body_col).mapInPandas(
        run, "host string, allow boolean, pattern string"
    )


def parse_robots_delays(body: str) -> list[tuple[str, int]]:
    """Group-scoped ``Crawl-delay`` lines from one robots.txt — the
    de-facto extension Bing/Yandex honor (RFC 9309 leaves it out;
    Google ignores it). Returns (agent_lowercase, delay_ms) rows:
    decimal seconds accepted and stored as EXACT integer milliseconds
    (int(round(s*1000)) — engine-portable, no float at rest); the same
    group/line discipline as :func:`parse_robots_txt` (a Crawl-delay
    line closes a group like a rule line does); malformed or negative
    values skip — never raises."""
    rows: list[tuple[str, int]] = []
    agents: list[str] = []
    group_has_rules = False
    for raw in (body or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if group_has_rules:
                agents, group_has_rules = [], False
            if val:
                agents.append(val.lower())
        elif key in ("allow", "disallow"):
            group_has_rules = True
        elif key == "crawl-delay":
            group_has_rules = True
            try:
                s = float(val)
            except (ValueError, OverflowError):
                continue
            if not math.isfinite(s):
                continue  # 'inf'/'nan' parse as floats; round() would raise
            ms = int(round(s * 1000))
            # int64-safe politeness cap: a delay that doesn't fit the
            # scheduler's int64 ms column is adversarial, not a policy.
            if ms < 0 or ms > _MAX_DELAY_MS:
                continue
            for a in agents:
                rows.append((a, ms))
    return rows


def select_crawl_delay(
    rows: list[tuple[str, int]], product_token: str
) -> int | None:
    """Delay selection mirroring §2.2.1 group selection on the delay
    rows: the product token's exact delay if any (first wins), else
    the ``*`` delay, else None (caller applies its default politeness
    interval) — the way crawlers that honor Crawl-delay implement it."""
    tok = product_token.lower()
    for a, ms in rows:
        if a == tok:
            return ms
    for a, ms in rows:
        if a == "*":
            return ms
    return None


def crawl_delays_from_txt(
    robots: DataFrame,
    product_token: str,
    host_col: str = "host",
    body_col: str = "body",
) -> DataFrame:
    """(host, robots.txt body) -> (host, delay_ms) for the crawler's
    product token (hosts whose robots set no applicable delay are
    absent — the scheduler coalesces its default). Arrow-batched like
    :func:`robots_rules_from_txt`."""
    import pandas as pd
    from collections.abc import Iterator

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            hosts, delays = [], []
            for host, body in zip(b[host_col], b[body_col]):
                ms = select_crawl_delay(
                    parse_robots_delays(body if body is not None else ""),
                    product_token,
                )
                if ms is not None:
                    hosts.append(host)
                    delays.append(ms)
            yield pd.DataFrame(
                {"host": hosts, "delay_ms": pd.Series(delays, dtype="int64")},
                columns=["host", "delay_ms"],
            )

    return robots.select(host_col, body_col).mapInPandas(
        run, "host string, delay_ms long"
    )


def fetch_schedule(
    frontier: DataFrame,
    delays: DataFrame,
    default_delay_ms: int = 1000,
    url_col: str = "url",
    host_col: str = "host",
) -> DataFrame:
    """Politeness scheduler — the hop between the (robots-filtered)
    frontier and the fetcher fleet: per host, FIFO fetch offsets at
    that host's Crawl-delay spacing (deterministic url order), so a
    1000-executor crawl never hammers one origin. ONE host-keyed
    window over the frontier; the per-host delay table is
    host-bounded and broadcasts. Output: (url, host, delay_ms,
    fetch_offset_ms)."""
    from pyspark.sql import Window
    from pyspark.sql.functions import broadcast

    w = Window.partitionBy(host_col).orderBy(url_col)
    d = F.coalesce(F.col("delay_ms"), F.lit(int(default_delay_ms)))
    return (
        frontier.join(broadcast(delays), host_col, "left")
        .select(
            F.col(url_col).alias("url"),
            F.col(host_col).alias("host"),
            d.cast("bigint").alias("delay_ms"),
            ((F.row_number().over(w) - 1) * d).cast("bigint").alias("fetch_offset_ms"),
        )
    )


def resolve_redirects(
    frontier: DataFrame,
    redirects: DataFrame,
    url_col: str = "url",
    src_col: str = "src",
    dst_col: str = "dst",
    max_hops: int = 5,
) -> DataFrame:
    """Bounded-depth HTTP 3xx Location-chain resolution — the hop
    between URL discovery (sitemap_url_frontier) and fetch/ingest
    (WARC): every frontier url follows its redirect edges up to
    ``max_hops``, so the frontier can dedup on the FINAL url and a
    moved page is fetched once.

    ``frontier`` keeps all its columns; ``redirects`` is the
    (src, dst) Location edge table (one row per 3xx response). Adds:
    ``final_url`` (the chain's end, = the input url when it never
    redirects), ``n_hops``, and ``resolved`` (false when the chain
    still has an outgoing edge after ``max_hops`` — a redirect LOOP
    of any length or an over-deep chain, exactly the curl
    --max-redirs give-up contract; no per-row visited-set state
    needed, loops simply never run out of edges).

    Scale shape: ``max_hops`` is a small constant (browsers cap ~20),
    so the resolution is max_hops+1 UNROLLED left equi-joins on the
    url key — the entity_clusters pointer-jump discipline applied to
    a bounded depth. Each hop shuffles only (frontier keys x current
    url); broadcast the edge table instead when the redirect set is
    small relative to the frontier (it usually is: 3xx rows only)."""
    cur = frontier.withColumn("__cur", F.col(url_col)).withColumn(
        "__hops", F.lit(0).cast("long")
    )
    keep = frontier.columns
    for k in range(max_hops):
        e = redirects.select(
            F.col(src_col).alias("__cur"), F.col(dst_col).alias(f"__nxt{k}")
        )
        cur = (
            cur.join(e, "__cur", "left")
            .withColumn(
                "__hops",
                F.col("__hops")
                + F.when(F.col(f"__nxt{k}").isNull(), 0).otherwise(1),
            )
            .withColumn("__cur", F.coalesce(F.col(f"__nxt{k}"), F.col("__cur")))
            .drop(f"__nxt{k}")
        )
    probe = redirects.select(
        F.col(src_col).alias("__cur"), F.lit(True).alias("__more")
    ).distinct()
    cur = cur.join(probe, "__cur", "left")
    return cur.select(
        *keep,
        F.col("__cur").alias("final_url"),
        F.col("__hops").alias("n_hops"),
        F.col("__more").isNull().alias("resolved"),
    )
