"""Golden sequential crawl model (SURVEY.md §5 step 3).

A ~150-line plain-Python restatement of the reference's per-request
semantics — the ``shouldCrawl`` chain (core/WebCrawler.java:197-278),
content dedup (core/WebCrawler.java:333-336), link extraction + filters
(core/WebCrawler.java:339-397) — run over the same deterministic synthetic
web, under the engine's canonical total order (priority, host, url) that
replaces the reference's nondeterministic Kafka-partition FIFO.

This is the ground truth for the north_rule parity gates: the engine must
reproduce this model's visit sequence and final URL-seen set exactly.

One documented divergence from the reference's *tagging* order: the
reference checks politeness before robots (core/WebCrawler.java:241,260);
we check robots first. A row that is both over-budget and robots-blocked is
rejected now rather than deferred-then-rejected — the visit sequence and
URL-seen set are unaffected (robots-blocked rows never fetch either way),
only the lineage reason differs.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field, replace
from urllib.parse import urlparse, urlsplit

from .config import CrawlConfig, SynthWebConfig
from .crawl.synthweb import (
    content_hash_py,
    page_for_url,
    robots_allow_for_host,
    robots_crawl_delay_for_host,
    robots_txt_for_host,
    robots_disallow_for_host,
    robots_version_at_round,
    feed_entries_py,
    feed_version_at_round,
    sitemap_entries_py,
    sitemap_urls_for_host,
)
from .operators.robots import (parse_group_directives_py,
                               rep_allowed_py)
from .functions.urls import (
    combined_allow_pattern,
    combined_exclude_pattern,
    registered_domain_py,
    resolve_ref_py,
)


@dataclass(frozen=True)
class Req:
    url: str
    host: str
    depth: int
    parent_url: str | None
    priority: int = 1
    retry_count: int = 0
    scheduled_for_ms: int | None = None


@dataclass
class GoldenResult:
    visits: list[tuple[int, str, str]]          # (round, host, url)
    stored_urls: set[str]
    stored_hashes: set[str]
    pages: list[dict] = field(default_factory=list)
    rounds: int = 0
    # per-round lineage counts, mirroring the engine's A3 metrics
    # (polled / rejected / deferred / fetched / fetch_failed / stored /
    # discovered); zero-count metrics are absent, like the engine's groupBy
    lineage: list[dict] = field(default_factory=list)


def golden_crawl(seeds: list[str], cfg: CrawlConfig, synth: SynthWebConfig,
                 max_rounds: int | None = None,
                 injections: dict[int, list[str]] | None = None,
                 frontier_log: list | None = None,
                 ) -> GoldenResult:
    """``injections`` mirrors Crawler.inject: {round: [urls]} enqueued at
    the top of that round (depth 0, priority 1), deduped against the
    URL-seen set exactly like discovered children."""
    max_rounds = max_rounds if max_rounds is not None else cfg.max_rounds
    injections = injections or {}
    allow_re = combined_allow_pattern(cfg.allowed_domains)
    excl_re = combined_exclude_pattern(cfg.exclude_patterns)

    def host_of(url: str) -> str | None:
        try:
            return urlparse(url).hostname
        except ValueError:
            return None

    frontier = [Req(u, host_of(u), 0, None) for u in dict.fromkeys(seeds)]
    seen_urls = {r.url for r in frontier}     # D4: every URL ever enqueued
    persisted = {r.url for r in frontier}     # urls in any written snapshot
    seen_hashes: set[str] = set()
    # host → (disallow rules, allow rules, crawl delay, fetched_round):
    # one cache entry per robots fetch, all fields refreshed TOGETHER —
    # exactly the engine's per-host robots row. cfg.robots_ttl_rounds
    # expires an entry K rounds after fetch; the refetch sees whichever
    # robots.txt the synthetic web serves at that round (drift mirror).
    robots_cache: dict[
        str, tuple[list[str], list[str], float | None, int]] = {}
    # hosts whose robots were (re)fetched in the CURRENT round — the
    # golden analog of the engine's robots_new rows; drives the sitemap
    # discovery tier (cfg.sitemap_discovery). Cleared each round.
    robots_fetched_now: set[str] = set()
    # feed_url → last attempted round (cfg.feed_discovery) — the golden
    # analog of the engine's accumulated `feeds` state (fetch-once
    # semantics, failures remembered; cfg.feed_ttl_rounds expires an
    # attempt K rounds later, the robots-TTL posture)
    feed_seen: dict[str, int] = {}

    def _robots_rules(host: str,
                      rnd: int) -> tuple[list[str], list[str]]:
        ent = robots_cache.get(host)
        ttl = cfg.robots_ttl_rounds
        if ent is not None and (ttl == 0 or ent[3] > rnd - ttl):
            return ent[0], ent[1]
        v = robots_version_at_round(synth, rnd)
        if cfg.robots_ua_groups:
            # UA-group tier: same parse the engine's fetcher runs
            # (exact-token group selection over the served document)
            grules, gdelay, _ = parse_group_directives_py(
                robots_txt_for_host(host, synth, v),
                cfg.robots_user_agent)
            rules = [p for ok, p in grules if not ok]
            allows = [p for ok, p in grules if ok]
            delay = gdelay
        else:
            rules = robots_disallow_for_host(host, synth, v)
            allows = robots_allow_for_host(host, synth, v)
            delay = robots_crawl_delay_for_host(host, synth)
        robots_cache[host] = (rules, allows, delay, rnd)
        robots_fetched_now.add(host)
        return rules, allows
    # AIMD mirror (cfg.adaptive_budget): previous round's per-host
    # (attempts, failures) — the engine derives the same signal from the
    # committed round-(r-1) pages table (driver._adaptive_overrides)
    prev_fetch_stats: dict[str, list[int]] = {}
    out = GoldenResult(visits=[], stored_urls=set(), stored_hashes=seen_hashes)

    for r in range(max_rounds):
        # mid-crawl injection (engine: tables/inject/round=r consumed at
        # the top of round r): URL-dedup then enqueue; counts as polled
        n_injected = 0
        for u in dict.fromkeys(injections.get(r, [])):
            if u not in seen_urls:
                frontier.append(Req(u, host_of(u), 0, None))
                seen_urls.add(u)
                persisted.add(u)   # inject dirs are read as enqueued state
                n_injected += 1
        if not frontier:
            break
        out.rounds = r + 1
        ts = cfg.round_ts_ms(r)
        next_ts = cfg.round_ts_ms(r + 1)

        # --- gates F7, F1-F4 then robots F6 (engine order) ------------------
        counts = {"polled": len(frontier), "rejected": 0, "deferred": 0,
                  "fetched": 0, "fetch_failed": 0, "stored": 0,
                  "discovered": 0, "injected": n_injected,
                  "sitemap_candidates": 0, "redirected": 0,
                  "feed_candidates": 0}
        robots_fetched_now.clear()
        passed: list[Req] = []
        deferred: list[Req] = []
        for q in frontier:
            if q.scheduled_for_ms is not None and q.scheduled_for_ms > ts:
                deferred.append(q)                         # F7 → next round
                counts["deferred"] += 1
                continue
            if q.depth > cfg.max_depth:                    # F1
                counts["rejected"] += 1
                continue
            if q.retry_count > cfg.max_retry_attempts:     # F2
                counts["rejected"] += 1
                continue
            if allow_re and not re.search(allow_re, q.host or ""):   # F3
                counts["rejected"] += 1
                continue
            if excl_re and re.search(excl_re, q.url):      # F4
                counts["rejected"] += 1
                continue
            rules, allows = _robots_rules(q.host, r)
            if cfg.robots_matching == "rfc9309":           # F6 RFC tier
                sp = urlsplit(q.url)
                path = sp.path + (f"?{sp.query}" if sp.query else "")
                if not rep_allowed_py(path, rules, allows):
                    counts["rejected"] += 1
                    continue
            elif any(p in q.url for p in rules):           # F6 substring
                counts["rejected"] += 1
                continue
            passed.append(q)

        # --- politeness F5: per-host budget over (priority, url) ------------
        by_host: dict[str, list[Req]] = {}
        for q in sorted(passed, key=lambda q: (q.priority, q.url)):
            by_host.setdefault(q.host, []).append(q)
        selected: list[Req] = []
        for host, qs in by_host.items():
            # per-host budget override from robots Crawl-delay:
            # min(configured, ceil(round_seconds / delay))
            delay = robots_cache[host][2]  # refreshed with the rules
            budget = cfg.host_budget_per_round
            if delay is not None and delay > 0:
                budget = min(budget,
                             max(1, math.ceil(cfg.round_seconds / delay)))
            if cfg.adaptive_budget:
                n, fails = prev_fetch_stats.get(host, (0, 0))
                if fails * 10 > n:   # >10% failures last round → halve
                    budget = max(1, min(
                        budget, max(1, cfg.host_budget_per_round // 2)))
            selected.extend(qs[:budget])
            over = qs[budget:]
            if cfg.enable_delay_retry:
                counts["deferred"] += len(over)
                deferred.extend(
                    replace(q, retry_count=q.retry_count + 1,
                            scheduled_for_ms=next_ts)      # R2
                    for q in over)
            else:
                counts["rejected"] += len(over)

        # --- second politeness tier: registered-domain (eTLD+1) cap ---------
        # mirrors operators/politeness.apply_domain_cap: the host-selected
        # rows re-rank by (priority, url) within coalesce(eTLD+1, host)
        if cfg.pld_budget_per_round > 0:
            by_dom: dict[str, list[Req]] = {}
            for q in sorted(selected, key=lambda q: (q.priority, q.url)):
                by_dom.setdefault(
                    registered_domain_py(q.host) or q.host, []).append(q)
            selected = []
            for _, qs in by_dom.items():
                selected.extend(qs[:cfg.pld_budget_per_round])
                over = qs[cfg.pld_budget_per_round:]
                if cfg.enable_delay_retry:
                    counts["deferred"] += len(over)
                    deferred.extend(
                        replace(q, retry_count=q.retry_count + 1,
                                scheduled_for_ms=next_ts)
                        for q in over)
                else:
                    counts["rejected"] += len(over)

        # --- fetch + D1/D2 dedup + store, canonical order -------------------
        children_cand: dict[str, tuple[int, str]] = {}
        children_edges: dict[str, int] = {}   # per-round discovered inlinks
        feeds_declared_now: set[str] = set()  # feeds on this round's pages
        round_stats: dict[str, list[int]] = {}
        for q in sorted(selected, key=lambda q: (q.priority, q.host, q.url)):
            stat = round_stats.setdefault(q.host, [0, 0])
            stat[0] += 1                                   # attempts
            page = page_for_url(q.url, synth)
            if page is None:
                counts["fetch_failed"] += 1
                stat[1] += 1                               # failures
                continue                                   # fetch failure
            counts["fetched"] += 1
            if page["final_url"] is not None:
                counts["redirected"] += 1
            # feed declarations come from EVERY fetched page — a D1
            # duplicate below still declares its feeds (engine: raw
            # .where(fetched), before dedup)
            if cfg.feed_discovery:
                feeds_declared_now.update(page["feeds"])
            chash = content_hash_py(page["bytes"], page["caption"])
            if chash in seen_hashes:
                continue                                   # D1 duplicate
            seen_hashes.add(chash)
            out.visits.append((r, q.host, q.url))
            out.stored_urls.add(q.url)
            out.pages.append({"round": r, "url": q.url, "host": q.host,
                              "depth": q.depth, "content_hash": chash,
                              "caption": page["caption"],
                              "phash": page["phash"], "fmt": page["fmt"]})

            # E1/E2/F8: distinct links → resolve X3 → validity/allow/exclude
            # (base = the post-redirect document location when the page
            # was served through one — Jsoup abs:href semantics)
            base = page["final_url"] or q.url
            for href in dict.fromkeys(page["links"]):      # D3
                link = resolve_ref_py(base, href)          # X3
                if not re.match(r"^https?://", link):
                    continue
                lhost = host_of(link)
                if not lhost:
                    continue
                if allow_re and not re.search(allow_re, lhost):
                    continue
                if excl_re and re.search(excl_re, link):
                    continue
                cand = (q.depth + 1, q.url)
                prev = children_cand.get(link)
                if prev is None or cand < prev:
                    children_cand[link] = cand             # min(depth, parent)
                # inlink-priority mirror: one (page, distinct href) edge,
                # exactly the engine's post-filter count(*) grain
                children_edges[link] = children_edges.get(link, 0) + 1

        # --- feed discovery tier (cfg.feed_discovery) -------------------------
        # mirror of operators/feeds.feed_frontier_candidates + the
        # finish_round merge: feeds first declared this round (never
        # attempted before) fetch once; their entries (spec rules inside
        # feed_entries_py: id required, dup ids first-wins) pass http
        # validity + F3/F4 — NO same-host rule — and override link
        # children (depth 0, parent = min(feed_url) listing the URL,
        # priority 1). Applied BEFORE the sitemap tier, whose candidates
        # override these in a same-round collision (the engine's merge
        # order).
        feed_won: set[str] = set()
        if cfg.feed_discovery:
            fv = feed_version_at_round(synth, r)
            ttl = cfg.feed_ttl_rounds
            due = [fu for fu in sorted(feeds_declared_now)
                   if fu not in feed_seen
                   or (ttl > 0 and feed_seen[fu] <= r - ttl)]
            feed_parent: dict[str, str] = {}
            for fu in due:
                feed_seen[fu] = r
                for link, _upd in feed_entries_py(fu, synth, fv):
                    if not re.match(r"^https?://", link):
                        continue
                    lhost = host_of(link)
                    if not lhost:
                        continue
                    if allow_re and not re.search(allow_re, lhost):
                        continue
                    if excl_re and re.search(excl_re, link):
                        continue
                    prev = feed_parent.get(link)
                    if prev is None or fu < prev:
                        feed_parent[link] = fu
            counts["feed_candidates"] = len(feed_parent)
            for link, fu in feed_parent.items():
                children_cand[link] = (0, fu)
                feed_won.add(link)

        # --- sitemap discovery tier (cfg.sitemap_discovery) ------------------
        # mirror of operators/sitemap.sitemap_frontier_candidates + the
        # finish_round merge: each host whose robots were (re)fetched this
        # round contributes its sitemap entries (spec rules inside
        # sitemap_entries_py: loc required, same-host, first-wins), gated
        # by F3/F4 like discovered links; a candidate OVERRIDES any link
        # discovery of the same URL (depth 0, parent=sitemap, priority 1
        # — the engine's anti-join + union, equivalent to a min-struct
        # winner since link children are always depth ≥ 1)
        sitemap_won: set[str] = set()
        if cfg.sitemap_discovery:
            for h in sorted(robots_fetched_now):
                sm_urls = sitemap_urls_for_host(h, synth)
                if not sm_urls:
                    continue
                # parentage = min(sitemap_url) per host, exactly the
                # engine's deterministic pick when a host ships several
                # sitemap files; entries are per (host, url) — counted
                # once however many documents list them (parse_sitemaps'
                # first-wins aggregate)
                parent = min(sm_urls)
                for link in sitemap_entries_py(h, synth):
                    lhost = host_of(link)
                    if not lhost:
                        continue
                    if allow_re and not re.search(allow_re, lhost):
                        continue
                    if excl_re and re.search(excl_re, link):
                        continue
                    counts["sitemap_candidates"] += 1
                    children_cand[link] = (0, parent)
                    sitemap_won.add(link)

        # --- D4 URL-seen + next frontier ------------------------------------
        def child_priority(url: str) -> int:
            # cfg.priority_mode="inlink": Cho/Garcia-Molina/Page backlink
            # ordering — max(1, cap - discovered inlinks this round);
            # "constant" keeps the reference's hard-coded 1
            if url in sitemap_won or url in feed_won:
                return 1   # discovery-tier identity wins (engine: literal 1)
            if cfg.priority_mode == "inlink":
                return max(1, cfg.priority_inlink_cap - children_edges[url])
            return 1

        new_reqs = [
            Req(url, host_of(url), depth, parent,
                priority=child_priority(url))
            for url, (depth, parent) in children_cand.items()
            if url not in seen_urls
        ]
        seen_urls.update(q.url for q in new_reqs)
        counts["stored"] = sum(1 for v in out.visits if v[0] == r)
        counts["discovered"] = len(new_reqs)
        frontier = deferred + new_reqs
        # frontier eviction mirror (cfg.frontier_cap): keep the cap
        # smallest under (priority, host, url). Eviction is
        # backpressure, not a blacklist: an evicted NEW child was never
        # persisted to any frontier snapshot, so the engine's exact
        # URL-seen re-check (which reads persisted enqueue history —
        # frontier + inject dirs) lets a later rediscovery re-enqueue
        # it; its stale bloom bit is a false positive the exact check
        # resolves. An evicted DEFERRED row, by contrast, was already
        # written to an earlier frontier dir and stays seen forever.
        # `persisted` mirrors exactly that on-disk enqueue history.
        if cfg.frontier_cap and len(frontier) > cfg.frontier_cap:
            cap = cfg.frontier_cap
            if cfg.frontier_cap_mode == "hostfair":
                # waterfilled per-host quota (driver._evict_hostfair):
                # each host keeps its first min(size, R*) rows under
                # (priority, url); the remainder fills from boundary
                # rank R*+1 in canonical (priority, host, url) order
                by_host: dict[str, list[Req]] = {}
                for q in sorted(frontier,
                                key=lambda q: (q.priority, q.url)):
                    by_host.setdefault(q.host, []).append(q)
                sizes = [len(qs) for qs in by_host.values()]

                def coverage(r: int) -> int:
                    return sum(min(s, r) for s in sizes)

                lo, hi = 0, max(sizes)
                while lo < hi:
                    mid = (lo + hi + 1) // 2
                    if coverage(mid) <= cap:
                        lo = mid
                    else:
                        hi = mid - 1
                r_star = lo
                kept = [q for qs in by_host.values()
                        for q in qs[:r_star]]
                boundary = sorted(
                    (qs[r_star] for qs in by_host.values()
                     if len(qs) > r_star),
                    key=lambda q: (q.priority, q.host, q.url))
                kept += boundary[:cap - coverage(r_star)]
                kept_ids = {id(q) for q in kept}
                evicted = [q for q in frontier if id(q) not in kept_ids]
                frontier = kept
            else:
                frontier.sort(key=lambda q: (q.priority, q.host, q.url))
                evicted = frontier[cap:]
                frontier = frontier[:cap]
            counts["evicted"] = len(evicted)
            for q in evicted:
                if q.url not in persisted:
                    seen_urls.discard(q.url)
        persisted.update(q.url for q in frontier)
        out.lineage.append({"round": r,
                            **{k: v for k, v in counts.items() if v > 0}})
        if frontier_log is not None:   # debug/test visibility hook
            frontier_log.append(
                (r + 1, sorted((q.priority, q.host, q.url)
                               for q in frontier)))
        prev_fetch_stats = round_stats

    return out
