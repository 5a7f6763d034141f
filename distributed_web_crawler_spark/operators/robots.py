"""Robots.txt operator F6: per-host rules via broadcast join.

The reference keeps a per-process in-memory ``robotsCache``
(core/WebCrawler.java:34,458-473) and blocks a URL when any user-agent:*
disallow path is a **substring** of the URL (core/WebCrawler.java:530-532
uses ``url.contains(path)`` — deliberately preserved bug-for-bug).

Spark shape: the set of distinct hosts is tiny relative to the frontier
(≤10^7 hosts vs 10^10 URLs), so robots state is a broadcast-joined ``hosts``
table. New hosts each round are fetched once via an Arrow-batched
``mapInPandas`` (S7) and appended to host state — the cross-round analog of
the reference's cache. The disallow check itself is a higher-order
``exists`` over the rules array — JVM-side, no UDF.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ROBOTS_SCHEMA = T.StructType([
    T.StructField("host", T.StringType()),
    T.StructField("robots_disallow", T.ArrayType(T.StringType())),
    # Allow patterns (rfc9309 matching tier; the reference's substring
    # predicate has no Allow concept and ignores the column)
    T.StructField("robots_allow", T.ArrayType(T.StringType())),
    T.StructField("crawl_delay", T.DoubleType()),
    # `Sitemap:` directives found in the host's robots.txt (sitemaps.org
    # discovery; consumed when CrawlConfig.sitemap_discovery is on)
    T.StructField("sitemaps", T.ArrayType(T.StringType())),
])

# persisted host state = fetch result + provenance round (drives the TTL)
ROBOTS_STATE_COLS = [f.name for f in ROBOTS_SCHEMA.fields] \
    + ["fetched_round"]
ROBOTS_COLS = ROBOTS_STATE_COLS


def with_robots_cols(df: DataFrame) -> DataFrame:
    """Project to the robots state schema, backfilling columns an older
    store doesn't have (null crawl_delay ⇒ no override; null
    fetched_round ⇒ unknown age, treated as expired once a TTL is set) —
    same migration posture as the pre-hash-bloom / flat-pages resume
    support."""
    out = df
    if "robots_allow" not in df.columns:
        out = out.withColumn("robots_allow",
                             F.lit(None).cast("array<string>"))
    if "crawl_delay" not in df.columns:
        out = out.withColumn("crawl_delay", F.lit(None).cast("double"))
    if "sitemaps" not in df.columns:
        out = out.withColumn("sitemaps",
                             F.lit(None).cast("array<string>"))
    if "fetched_round" not in df.columns:
        out = out.withColumn("fetched_round", F.lit(None).cast("int"))
    return out.select(*ROBOTS_COLS)


def make_robots_fetcher(synth_cfg, version: int = 0,
                        user_agent: str | None = None):
    """Vectorized robots fetch over a batch of distinct hosts (S7). In
    production this is an async-HTTP batch; in tests it is the pure
    synthetic rule function — ``version`` selects which robots.txt the
    synthetic web is serving (drift, synthweb.robots_version_at_round).
    Fetch failure ⇒ allow-all (reference: core/WebCrawler.java:470-473).

    ``user_agent`` (CrawlConfig.robots_ua_groups) switches to the
    RFC 9309 group-selection path: the host's robots.txt DOCUMENT
    (synthweb.robots_txt_for_host) is parsed with exact-token group
    selection (parse_group_directives_py), so a UA-specific group
    replaces the '*' rules — including its group-scoped Crawl-delay.
    Default None keeps the '*'-only arrays (reference parity)."""
    from ..crawl.synthweb import (
        robots_allow_for_host,
        robots_crawl_delay_for_host,
        robots_disallow_for_host,
        robots_txt_for_host,
        sitemap_urls_for_host,
    )

    def rules_of(h: str) -> tuple[list[str], list[str], float | None,
                                  list[str]]:
        if user_agent is None:
            return (robots_disallow_for_host(h, synth_cfg, version),
                    robots_allow_for_host(h, synth_cfg, version),
                    robots_crawl_delay_for_host(h, synth_cfg),
                    sitemap_urls_for_host(h, synth_cfg))
        rules, delay, sitemaps = parse_group_directives_py(
            robots_txt_for_host(h, synth_cfg, version), user_agent)
        return ([p for ok, p in rules if not ok],
                [p for ok, p in rules if ok], delay, sitemaps)

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fetched = [rules_of(h) for h in pdf["host"]]
            yield pd.DataFrame({
                "host": pdf["host"],
                "robots_disallow": [d for d, _, _, _ in fetched],
                "robots_allow": [a for _, a, _, _ in fetched],
                "crawl_delay": pd.array([dl for _, _, dl, _ in fetched],
                                        dtype="Float64"),
                "sitemaps": [sm for _, _, _, sm in fetched],
            })

    return fetch


def resolve_robots(spark: SparkSession, frontier: DataFrame,
                   known: DataFrame | None, synth_cfg,
                   robots_fetcher=None,
                   cached: list | None = None,
                   round_no: int = 0,
                   ttl_rounds: int = 0,
                   user_agent: str | None = None) -> tuple[DataFrame,
                                                           DataFrame]:
    """Return (full robots table for this round's hosts, newly fetched rows).

    ``known`` is accumulated host state from prior rounds; only hosts not
    yet known are fetched (cache semantics of core/WebCrawler.java:460).
    With ``ttl_rounds=K`` (CrawlConfig.robots_ttl_rounds) a cached row
    expires K rounds after its fetch: expired hosts re-fetch when they
    next appear in the frontier, and the accumulated state resolves
    latest-fetch-wins (one host-grain max_by aggregate over the
    host-table — broadcast-sized, never frontier-sized). This completes
    the reference's crawl_state (last_crawl_time + robots_txt,
    schema.cql:19-24) refresh intent; rows whose age is unknown
    (pre-TTL stores: null fetched_round) count as expired.
    ``robots_fetcher`` overrides the synthetic fetcher (e.g.
    crawl/httpfetch.make_http_robots_fetcher for real HTTP). When the
    caller supplies a ``cached`` list it takes ownership of unpersisting
    the fetched rows — persisted so a non-pure fetcher executes once for
    both the decision path and the persisted host state."""
    from ..crawl.synthweb import robots_version_at_round

    hosts = frontier.select("host").distinct()
    if known is not None:
        known = with_robots_cols(known)
        # latest-fetch-wins across refetch generations (no-op when every
        # host appears once, the TTL-disabled layout)
        known = (known
                 .groupBy("host")
                 .agg(F.max_by(
                     F.struct(*[c for c in ROBOTS_COLS if c != "host"]),
                     F.coalesce(F.col("fetched_round"), F.lit(-1)))
                     .alias("w"))
                 .select("host", *[f"w.{c}" for c in ROBOTS_COLS
                                   if c != "host"]))
        if ttl_rounds > 0:
            fresh = F.coalesce(F.col("fetched_round"), F.lit(-(1 << 30))) \
                > F.lit(round_no - ttl_rounds)
            known = known.where(fresh)
        new_hosts = hosts.join(F.broadcast(known.select("host")), "host",
                               "left_anti")
    else:
        new_hosts = hosts
    if robots_fetcher is None:
        if synth_cfg is None:
            raise ValueError("resolve_robots needs a robots_fetcher when "
                             "no synthetic web is configured")
        robots_fetcher = make_robots_fetcher(
            synth_cfg, robots_version_at_round(synth_cfg, round_no),
            user_agent=user_agent)
    fetched = new_hosts.mapInPandas(robots_fetcher, ROBOTS_SCHEMA) \
        .withColumn("fetched_round", F.lit(round_no).cast("int"))
    if cached is not None:
        fetched = fetched.persist()
        cached.append(fetched)
    full = fetched if known is None else known.unionByName(fetched)
    return full, fetched


def filter_robots(frontier: DataFrame, robots: DataFrame,
                  mode: str = "substring") -> DataFrame:
    """Tag rows REJECT_ROBOTS per the configured matching semantics
    (CrawlConfig.robots_matching). Broadcast left join (hosts ≪
    frontier) either way; the predicate is a higher-order fold riding
    the join — no explode, no extra exchange.

    - "substring": the reference's bug-for-bug predicate — any disallow
      path substring-contained in the FULL URL blocks
      (core/WebCrawler.java:530-532); Allow rules ignored.
    - "rfc9309": patterns match path+query via `_rep_regex` ('*'
      wildcards, '$' end-anchor), longest match wins, Allow wins
      exact-length ties, no match ⇒ allowed — the in-loop application
      of `wildcard_rule_decisions`. Golden mirror: `rep_allowed_py`."""
    cols = ["host", "robots_disallow"]
    if mode == "rfc9309":
        cols.append("robots_allow")
        robots = with_robots_cols(robots).select(*cols)
    joined = frontier.join(
        F.broadcast(robots.select(*cols)), "host", "left")
    if mode == "rfc9309":
        from ..functions.urls import path_of

        empty = F.expr(
            "cast(array() as array<struct<allow:boolean,pattern:string>>)")
        rules = F.concat(
            F.coalesce(F.transform(
                "robots_disallow",
                lambda p: F.struct(F.lit(False).alias("allow"),
                                   p.alias("pattern"))), empty),
            F.coalesce(F.transform(
                "robots_allow",
                lambda p: F.struct(F.lit(True).alias("allow"),
                                   p.alias("pattern"))), empty))
        query = F.coalesce(
            F.try_parse_url(F.col("url"), F.lit("QUERY")), F.lit(""))
        path = F.concat(
            F.coalesce(path_of(F.col("url")), F.lit("")),
            F.when(query != "", F.concat(F.lit("?"), query))
            .otherwise(F.lit("")))
        # empty patterns are no rule (RFC 9309 §2.2.2 — and the golden
        # mirror skips them; '^' alone would otherwise match everything)
        matched = F.filter(rules,
                           lambda r: (F.length(r.pattern) > 0)
                           & F.rlike(path, _rep_regex(r.pattern)))
        best = F.array_max(F.transform(
            matched,
            lambda r: F.struct(F.length(r.pattern).alias("l"),
                               r.allow.alias("allow"))))
        blocked = ((F.col("decision") == "PASS")
                   & ~F.coalesce(best["allow"], F.lit(True)))
        drop = ["robots_disallow", "robots_allow"]
    else:
        blocked = (
            (F.col("decision") == "PASS")  # earlier gate reasons win (R1)
            & F.col("robots_disallow").isNotNull()
            & F.exists("robots_disallow",
                       lambda p: F.col("url").contains(p))
        )
        drop = ["robots_disallow"]
    return (
        joined.withColumn(
            "decision",
            F.when(blocked, F.lit("REJECT_ROBOTS")).otherwise(F.col("decision")),
        ).drop(*drop)
    )


# -- RFC 9309 wildcard matching ---------------------------------------------
# The reference's robots predicate is naive substring containment
# (service/RobotsTxtService.java — kept bug-for-bug in filter_robots
# above); modern REP (RFC 9309 §2.2.2) requires '*' wildcards, '$'
# end-anchors, longest-match precedence, and allow-wins-ties. This is the
# standards-correct tier, selectable per crawl. Pure Catalyst: the rule
# array rides WITH the request row, so matching is a map-only
# filter/transform/array_max fold — no explode, no shuffle, no UDF.

# '$' is in the escape set: RFC 9309 gives '$' meaning ONLY at end-of-
# pattern, and the trailing anchor is stripped before this runs — a
# literal mid-pattern '$' (e.g. '/cart$id=*') must match itself, not
# compile to an unmatchable end-anchor mid-regex.
_REGEX_SPECIALS = r"([.\\+?\[\]()^{}|$])"


def _rep_regex(pattern):
    """robots pattern -> anchored Java/RE2 regex ('' stays prefix-open)."""
    had = F.endswith(pattern, F.lit("$"))
    core = F.when(had, F.substring(pattern, F.lit(1), F.length(pattern) - 1)) \
            .otherwise(pattern)
    esc = F.regexp_replace(core, _REGEX_SPECIALS, r"\\$1")
    return F.concat(F.lit("^"), F.regexp_replace(esc, r"\*", ".*"),
                    F.when(had, F.lit("$")).otherwise(F.lit("")))


def wildcard_rule_decisions(requests: DataFrame, path_col: str = "path",
                            rules_col: str = "rules") -> DataFrame:
    """RFC 9309 decision per request row carrying its host's parsed
    rules as array<struct<allow:boolean, pattern:string>>: the most
    specific (longest-pattern) matching rule wins, allow wins exact
    ties, no match means allowed. Adds (allowed, rule_len)."""
    path = F.col(path_col)
    matched = F.filter(F.col(rules_col),
                       lambda r: F.rlike(path, _rep_regex(r.pattern)))
    # struct max = (longest pattern, then allow>disallow) — RFC order
    best = F.array_max(F.transform(
        matched, lambda r: F.struct(F.length(r.pattern).alias("l"),
                                    r.allow.alias("allow"))))
    return (requests
            .withColumn("allowed", F.coalesce(best["allow"], F.lit(True)))
            .withColumn("rule_len",
                        F.coalesce(best["l"], F.lit(0)).cast("int")))


def robots_group_rules(txt, user_agent: str):
    """RFC 9309 §2.1-2.2 group parser, pure Catalyst: robots.txt TEXT →
    ``array<struct<allow:boolean, pattern:string>>`` — the rules column
    `wildcard_rule_decisions` consumes, derived from the real document
    instead of a pre-parsed table.

    Spec semantics implemented:
    - groups start at ``User-agent:`` lines; consecutive UA lines share
      one group, a UA line after rules starts a NEW group (§2.1);
    - our group = every group whose best-matching UA is the MOST
      specific match for ``user_agent`` (exact product-token match,
      case-insensitive, beats ``*``); multiple matching groups'
      rules are COMBINED (§2.2.1);
    - ``Allow:`` / ``Disallow:`` case-insensitive; an empty pattern is
      no rule (§2.2.2); rules before any UA line are ignored;
    - ``#`` comments stripped; non-group records (Sitemap:) neither
      join nor terminate a group.

    Scale shape: two folds over the split-lines array (one array_max
    for the best specificity, one stateful `aggregate` walk) — map-only
    expressions riding the host-grain robots scan; no explode, no
    shuffle, no UDF."""
    ua = user_agent.lower()
    # split tolerates CRLF (a \r left on the line would poison UA-token
    # equality and rule patterns — trim only strips spaces)
    lines = F.transform(
        F.split(txt, "\r?\n"),
        lambda l: F.trim(F.regexp_replace(l, "#.*$", "")))

    def ua_of(l):
        return F.lower(F.trim(
            F.regexp_extract(l, r"(?i)^user-agent\s*:\s*(.*)$", 1)))

    def is_ua(l):
        return l.rlike(r"(?i)^user-agent\s*:")

    # specificity: exact token match = its length, '*' = 0, no match = -1
    def spec(l):
        v = ua_of(l)
        return (F.when(v == ua, F.length(v))
                .when(v == "*", F.lit(0))
                .otherwise(F.lit(-1)))

    best = F.array_max(F.filter(
        F.transform(lines, lambda l: F.when(is_ua(l), spec(l))),
        lambda s: s.isNotNull()))

    def rule_of(l):
        # struct(allow, pattern) for rule lines, null otherwise
        allow_pat = F.regexp_extract(l, r"(?i)^allow\s*:\s*(\S*)", 1)
        dis_pat = F.regexp_extract(l, r"(?i)^disallow\s*:\s*(\S*)", 1)
        return (F.when(l.rlike(r"(?i)^allow\s*:"),
                       F.struct(F.lit(True).alias("allow"),
                                allow_pat.alias("pattern")))
                .when(l.rlike(r"(?i)^disallow\s*:"),
                      F.struct(F.lit(False).alias("allow"),
                               dis_pat.alias("pattern"))))

    empty_rules = F.expr(
        "cast(array() as array<struct<allow:boolean,pattern:string>>)")
    init = F.struct(F.lit(-1).alias("cur"), F.lit(True).alias("prev_rule"),
                    empty_rules.alias("rules"))

    def step(acc, l):
        s, r = spec(l), rule_of(l)
        new_cur = F.when(
            is_ua(l),
            # UA after rules starts a fresh group; consecutive UA lines
            # extend the current one (best of their specificities)
            F.when(acc.prev_rule, s).otherwise(F.greatest(acc.cur, s))
        ).otherwise(acc.cur)
        took = (r.isNotNull() & (acc.cur == best)
                & (F.length(r.pattern) > 0))
        return F.struct(
            new_cur.alias("cur"),
            F.when(is_ua(l), F.lit(False))
            .when(r.isNotNull(), F.lit(True))
            .otherwise(acc.prev_rule).alias("prev_rule"),
            F.when(took, F.concat(acc.rules, F.array(r)))
            .otherwise(acc.rules).alias("rules"))

    # best < 0 means no group's UA line matched this agent at all (every
    # spec is -1): RFC 9309 §2.2.1 then applies NO rules. Guarding only
    # on null would let cur(-1) == best(-1) admit foreign-agent groups
    # AND pre-group orphan rules via the init state.
    return F.when(best.isNull() | (best < F.lit(0)), empty_rules).otherwise(
        F.aggregate(lines, init, step, lambda acc: acc.rules))


# -- golden-model mirrors of the RFC matcher ---------------------------------

_REP_SPECIALS_PY = r"([.\\+?\[\]()^{}|$])"


def rep_regex_py(pattern: str) -> str:
    """Python twin of `_rep_regex` — same escape set (a literal mid-
    pattern '$' is escaped on both sides — RFC 9309 treats '$' as
    special only at end-of-pattern), '*' → '.*', trailing '$' anchors."""
    import re as _re

    had = pattern.endswith("$")
    core = pattern[:-1] if had else pattern
    esc = _re.sub(_REP_SPECIALS_PY, r"\\\1", core)
    return "^" + esc.replace("*", ".*") + ("$" if had else "")


def rep_allowed_py(path: str, disallows, allows) -> bool:
    """RFC 9309 decision over (path+query): longest matching pattern
    wins, Allow wins exact-length ties, no match ⇒ allowed. Must stay
    bit-equal to the filter_robots rfc9309 branch (struct max over
    (length, allow))."""
    import re as _re

    best = None
    for allow, pats in ((False, disallows or ()), (True, allows or ())):
        for p in pats:
            if p and _re.search(rep_regex_py(p), path):
                key = (len(p), allow)
                if best is None or key > best:
                    best = key
    return True if best is None else best[1]


def parse_group_directives_py(
        text: str,
        user_agent: str) -> tuple[list[tuple[bool, str]], float | None,
                                  list[str]]:
    """Python twin of `robots_group_rules` PLUS the group-scoped
    directives the Catalyst operator does not model: returns
    (rules [(allow, pattern) in document order], crawl_delay, sitemaps).

    Group-selection semantics are kept BIT-EQUAL to the fold in
    robots_group_rules (pinned by tests/test_ua_groups.py): consecutive
    UA lines share a group, a UA line after rules starts a new one,
    comments strip, exact-token match (case-insensitive) beats '*',
    equally-specific matching groups COMBINE, no matching group ⇒ no
    rules, empty patterns are no rule, pre-group rules are ignored.
    Extensions beyond the operator: a group-scoped ``Crawl-delay``
    (selected groups' last positive value wins; a delay line is a
    non-rule record — it neither terminates nor splits a group, like
    Sitemap) and RFC 9309 §2.3 non-group ``Sitemap:`` collection
    (absolute http(s) URLs, first-seen order, the
    parse_robots_directives contract)."""
    import re as _re

    ua = user_agent.lower()
    lines = [_re.sub(r"#.*$", "", ln).strip()
             for ln in _re.split(r"\r?\n", text or "")]

    def ua_of(ln: str) -> str | None:
        m = _re.match(r"(?i)^user-agent\s*:\s*(.*)$", ln)
        return m.group(1).strip().lower() if m is not None else None

    def spec(v: str) -> int:
        return len(v) if v == ua else (0 if v == "*" else -1)

    sitemaps: list[str] = []
    for ln in lines:
        if _re.match(r"(?i)^sitemap\s*:", ln):
            u = ln.split(":", 1)[1].strip()
            if u.startswith(("http://", "https://")) and u not in sitemaps:
                sitemaps.append(u)

    specs = [spec(v) for ln in lines if (v := ua_of(ln)) is not None]
    best = max(specs, default=None)
    if best is None or best < 0:
        return [], None, sitemaps

    rules: list[tuple[bool, str]] = []
    delay: float | None = None
    cur, prev_rule = -1, True
    for ln in lines:
        v = ua_of(ln)
        if v is not None:
            s = spec(v)
            cur = s if prev_rule else max(cur, s)
            prev_rule = False
            continue
        m = _re.match(r"(?i)^(allow|disallow)\s*:\s*(\S*)", ln)
        if m is not None:
            if cur == best and m.group(2):
                rules.append((m.group(1).lower() == "allow", m.group(2)))
            prev_rule = True
            continue
        md = _re.match(r"(?i)^crawl-delay\s*:\s*(\S+)", ln)
        if md is not None and cur == best:
            try:
                d = float(md.group(1))
            except ValueError:
                continue
            if d > 0:
                delay = d
    return rules, delay, sitemaps
