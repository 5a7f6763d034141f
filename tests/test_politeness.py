"""Unit tests for the two-tier politeness budget (operators/politeness.py).

The host tier mirrors the reference's per-hostname throttle
(core/WebCrawler.java:214-220); the registered-domain (eTLD+1) tier is the
production-crawler extension so a subdomain farm cannot multiply one site's
budget by minting hosts. Both tiers share _enforce_budget; the salted
(salts>1) path must be row-identical to the single-window path."""

from pyspark.sql import functions as F

from distributed_web_crawler_spark.config import CrawlConfig
from distributed_web_crawler_spark.functions.urls import registered_domain_py
from distributed_web_crawler_spark.operators.politeness import (
    apply_domain_cap,
)

SCHEMA = "url string, host string, priority int, decision string"


def _rows():
    rows = []
    # subdomain farm: 4 hosts x 3 urls all under site.com (12 PASS rows)
    for w in range(4):
        for p in range(3):
            rows.append((f"http://w{w}.site.com/p/{p}",
                         f"w{w}.site.com", p, "PASS"))
    # independent domain: 4 PASS rows under other.org
    for p in range(4):
        rows.append((f"http://a.other.org/p/{p}", "a.other.org", p, "PASS"))
    # blogspot.com is a public suffix => each subdomain is its OWN eTLD+1
    for b in range(2):
        for p in range(3):
            rows.append((f"http://b{b}.blogspot.com/p/{p}",
                         f"b{b}.blogspot.com", p, "PASS"))
    # suffix-only host: eTLD+1 is null => caps under coalesce(host)
    for p in range(3):
        rows.append((f"http://com/p/{p}", "com", p, "PASS"))
    # non-PASS rows never consume or receive budget
    rows.append(("http://w0.site.com/x", "w0.site.com", 0, "DEFER_SCHED"))
    rows.append(("http://a.other.org/x", "a.other.org", 0, "REJECT_ROBOTS"))
    return rows


def _expected(rows, cap):
    by_dom = {}
    for url, host, prio, dec in sorted(rows, key=lambda r: (r[2], r[0])):
        if dec != "PASS":
            continue
        by_dom.setdefault(registered_domain_py(host) or host, []).append(url)
    out = {}
    for url, host, prio, dec in rows:
        if dec != "PASS":
            out[url] = dec
            continue
        dom = registered_domain_py(host) or host
        out[url] = ("PASS" if url in by_dom[dom][:cap]
                    else "DEFER_POLITENESS")
    return out


def _run(spark, cap, salts):
    cfg = CrawlConfig(pld_budget_per_round=cap, politeness_salts=salts)
    df = spark.createDataFrame(_rows(), SCHEMA)
    got = apply_domain_cap(df, cfg)
    return {r["url"]: r["decision"] for r in got.collect()}


def test_domain_cap_groups_by_etld1(spark):
    """site.com's 4-host farm caps as ONE domain; blogspot subdomains cap
    individually (public suffix); a suffix-only host caps under itself."""
    got = _run(spark, cap=2, salts=1)
    exp = _expected(_rows(), 2)
    assert got == exp
    # the farm got exactly 2 PASS total across its 4 hosts
    farm_pass = [u for u, d in got.items()
                 if ".site.com" in u and d == "PASS"]
    assert len(farm_pass) == 2
    # each blogspot subdomain kept 2 of its own
    for b in range(2):
        kept = [u for u, d in got.items()
                if u.startswith(f"http://b{b}.blogspot.com") and d == "PASS"]
        assert len(kept) == 2
    # non-PASS rows untouched
    assert got["http://w0.site.com/x"] == "DEFER_SCHED"
    assert got["http://a.other.org/x"] == "REJECT_ROBOTS"


def test_domain_cap_salted_equals_single_window(spark):
    """salts>1 two-stage partial top-K is row-identical to the one-window
    plan for every cap (SURVEY.md §7.2 hard part (c) applied at PLD grain)."""
    for cap in (1, 2, 3, 100):
        assert _run(spark, cap, salts=8) == _run(spark, cap, salts=1) \
            == _expected(_rows(), cap)


def test_domain_cap_zero_is_identity(spark):
    cfg = CrawlConfig(pld_budget_per_round=0)
    df = spark.createDataFrame(_rows(), SCHEMA)
    assert apply_domain_cap(df, cfg) is df


def test_domain_cap_reject_mode(spark):
    """enable_delay_retry=False routes over-budget rows to
    REJECT_POLITENESS, mirroring the host tier's reject mode."""
    cfg = CrawlConfig(pld_budget_per_round=1, politeness_salts=1,
                      enable_delay_retry=False)
    df = spark.createDataFrame(_rows(), SCHEMA)
    got = {r["url"]: r["decision"]
           for r in apply_domain_cap(df, cfg).collect()}
    over = [d for d in got.values() if d == "REJECT_POLITENESS"]
    assert over and "DEFER_POLITENESS" not in got.values()


def test_domain_cap_plan_has_no_global_sort(spark):
    """Scale pin: the salted path must not produce a single-partition
    window over all rows of a mega-domain — the plan partitions by
    (_pld, _salt) first. Presence of two window exchanges (salt then key)
    and zero global Sort nodes outside windows is the proxy."""
    cfg = CrawlConfig(pld_budget_per_round=2, politeness_salts=8)
    df = spark.createDataFrame(_rows(), SCHEMA)
    plan = (apply_domain_cap(df, cfg)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Window" in plan
    # no `Exchange SinglePartition` feeding a Window (global-sort smell)
    assert "SinglePartition" not in plan.split("Window")[0]


def test_budget_override_tightens_never_relaxes(spark):
    """An AIMD override must cap the effective budget at min(tiers),
    floored at 1; hosts without an override keep the configured base;
    an override LARGER than the base must not relax it."""
    from distributed_web_crawler_spark.operators.politeness import (
        apply_politeness)
    rows = []
    for host in ("sick.com", "ok.com", "big.com"):
        for p in range(5):
            rows.append((f"http://{host}/p/{p}", host, p, "PASS"))
    frontier = spark.createDataFrame(rows, SCHEMA)
    overrides = spark.createDataFrame(
        [("sick.com", 2), ("big.com", 99), ("absent.com", 1)],
        "host string, next_budget long")
    cfg = CrawlConfig(host_budget_per_round=3)
    got = apply_politeness(frontier, cfg, overrides=overrides).collect()
    passed = {}
    for r in got:
        if r["decision"] == "PASS":
            passed.setdefault(r["host"], 0)
            passed[r["host"]] += 1
    assert passed == {"sick.com": 2,   # tightened 3 -> 2
                      "ok.com": 3,     # no override -> base
                      "big.com": 3}    # 99 cannot relax the base
