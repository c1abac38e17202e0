"""robots.txt admission gate — engine-side capability the reference lacks.

The reference performs no robots handling at all (SURVEY.md §2.2 "[engine]"
row); the north_star requires robots rules to gate admission *before
enqueue*. Design: robots.txt bodies are just rows of the ``pages`` corpus
(url = ``scheme://host/robots.txt``); a tiny parsed-rules dimension table is
broadcast-joined onto the frontier and longest-prefix matching runs in a
vectorized UDF (original REP + Google longest-match semantics).
"""

from __future__ import annotations

import re
from urllib.parse import urlparse

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from upton_spark import schemas


def parse_robots(host: str, body: str) -> list[tuple]:
    """Parse one robots.txt into ROBOTS-schema rows
    (host, agent, rule_type, path_prefix, crawl_delay)."""
    rows: list[tuple] = []
    agents: list[str] = []
    saw_rule = True  # so a leading User-agent starts a fresh group
    crawl_delay: dict[str, float] = {}
    for raw in (body or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if saw_rule:
                agents = []
                saw_rule = False
            agents.append(value.lower())
        elif key in ("allow", "disallow"):
            saw_rule = True
            for agent in agents or ["*"]:
                if value == "" and key == "disallow":
                    continue  # empty Disallow = allow all (no rule)
                rows.append((host, agent, key, value, None))
        elif key == "crawl-delay":
            saw_rule = True
            try:
                delay = float(value)
            except ValueError:
                continue
            for agent in agents or ["*"]:
                rows.append((host, agent, "crawl-delay", "", delay))
    return rows


def robots_rules_df(spark: SparkSession, per_host_bodies: list[tuple[str, str]]) -> DataFrame:
    rows: list[tuple] = []
    for host, body in per_host_bodies:
        rows.extend(parse_robots(host, body))
    return spark.createDataFrame(rows, schema=schemas.ROBOTS)


_RULE_RE_CACHE: dict[str, "re.Pattern[str]"] = {}


def _rule_regex(pattern: str) -> "re.Pattern[str]":
    """Compile a REP path rule to a regex. REP's ONLY wildcard is '*' plus a
    trailing '$' end-anchor — every other character is literal ('?', '[',
    '+' appear verbatim in real query-string rules, so fnmatch-style
    translation mis-matches e.g. 'Disallow: /search*?page=')."""
    rx = _RULE_RE_CACHE.get(pattern)
    if rx is None:
        pat = pattern
        anchored = pat.endswith("$")
        if anchored:
            pat = pat[:-1]
        body = ".*".join(re.escape(seg) for seg in pat.split("*"))
        # \Z, not $: '$' also matches before a trailing newline, so a path
        # ending in '\n' would wrongly satisfy an end-anchored Disallow rule
        rx = re.compile(body + (r"\Z" if anchored else ""))
        _RULE_RE_CACHE[pattern] = rx
    return rx


def _match_rule(path: str, pattern: str) -> int:
    """Return match length (-1 = no match). Supports * and trailing $."""
    if not pattern:
        return -1
    if "*" in pattern or pattern.endswith("$"):
        return len(pattern) if _rule_regex(pattern).match(path) else -1
    return len(pattern) if path.startswith(pattern) else -1


def allowed(path: str, rules: list[tuple[str, str]]) -> bool:
    """Longest-match REP decision over [(rule_type, prefix), ...]; ties favor
    allow; no matching rule → allowed."""
    best_len, best_allow = -1, True
    for rule_type, prefix in rules:
        ml = _match_rule(path, prefix)
        if ml > best_len or (ml == best_len and rule_type == "allow" and not best_allow):
            if ml >= 0:
                best_len, best_allow = ml, rule_type == "allow"
    return best_allow


def robots_gate(
    spark: SparkSession, frontier: DataFrame, robots: DataFrame | None, agent: str = "*"
) -> DataFrame:
    """Add boolean ``robots_allowed`` to the frontier.

    The rules table is tiny (one group of prefixes per host) → collected and
    broadcast as a dict; matching is vectorized per batch. Agent resolution:
    exact agent group if present for the host, else ``*`` group."""
    if robots is None:
        return frontier.withColumn("robots_allowed", F.lit(True))
    agent = agent.lower()
    rule_rows = robots.filter(F.col("rule_type").isin("allow", "disallow")).collect()
    table: dict[str, dict[str, list[tuple[str, str]]]] = {}
    for r in rule_rows:
        table.setdefault(r["host"], {}).setdefault(r["agent"], []).append(
            (r["rule_type"], r["path_prefix"])
        )
    bc = spark.sparkContext.broadcast(table)

    @F.pandas_udf(T.BooleanType())
    def robots_allowed(url: pd.Series) -> pd.Series:
        tbl = bc.value
        out = []
        for u in url:
            if u is None:
                out.append(True)
                continue
            parts = urlparse(u)
            host_rules = tbl.get(parts.netloc.lower())
            if not host_rules:
                out.append(True)
                continue
            rules = host_rules.get(agent, host_rules.get("*", []))
            path = parts.path or "/"
            if parts.query:
                path = f"{path}?{parts.query}"
            out.append(allowed(path, rules))
        return pd.Series(out)

    return frontier.withColumn("robots_allowed", robots_allowed(F.col("url")))


def crawl_delays(robots: DataFrame | None, agent: str = "*") -> DataFrame | None:
    """Per-host crawl-delay dimension (host, crawl_delay) for the politeness
    join; None when no robots table."""
    if robots is None:
        return None
    return (
        robots.filter(F.col("rule_type") == "crawl-delay")
        .filter(F.col("agent").isin(agent.lower(), "*"))
        .groupBy("host")
        .agg(F.max("crawl_delay").alias("crawl_delay"))
    )
