"""Frontier gates F1-F4/F7 + the three-way decision R1.

Mirrors the reference's ``shouldCrawl`` predicate chain
(core/WebCrawler.java:197-278) and the scheduled-time gate
(core/WebCrawler.java:172-177), with the same evaluation order so the
recorded rejection *reason* matches. All predicates are Catalyst
expressions — one ``when`` chain, no UDFs; Catalyst pushes the cheap
comparisons into the scan.

Decision values (core/CrawlDecision.java:8-31): PASS (→ politeness/robots
stages), DEFER_SCHED (scheduled_for in the future → carried to next round
unchanged), REJECT_* (dropped, counted in lineage).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import CrawlConfig
from ..functions.urls import combined_allow_pattern, combined_exclude_pattern

DECISION_COL = "decision"


def decision_column(cfg: CrawlConfig, round_ts_ms: int) -> Column:
    """R1: single when-chain, reference evaluation order
    (scheduled → depth → retry → domain → exclude)."""
    allow_re = combined_allow_pattern(cfg.allowed_domains)
    excl_re = combined_exclude_pattern(cfg.exclude_patterns)

    c = F.when(
        F.col("scheduled_for_ms").isNotNull()
        & (F.col("scheduled_for_ms") > F.lit(round_ts_ms)),
        F.lit("DEFER_SCHED"),
    )
    # F1 (core/WebCrawler.java:205-209)
    c = c.when(F.col("depth") > F.lit(cfg.max_depth), F.lit("REJECT_DEPTH"))
    # F2 (core/WebCrawler.java:212-215)
    c = c.when(F.col("retry_count") > F.lit(cfg.max_retry_attempts),
               F.lit("REJECT_RETRY"))
    # F3 (core/WebCrawler.java:218-229) — host regex allow-list
    if allow_re is not None:
        c = c.when(~F.col("host").rlike(allow_re), F.lit("REJECT_DOMAIN"))
    # F4 (core/WebCrawler.java:232-238) — full-match exclude on the URL
    if excl_re is not None:
        c = c.when(F.col("url").rlike(excl_re), F.lit("REJECT_EXCLUDED"))
    return c.otherwise(F.lit("PASS"))


def apply_gates(frontier: DataFrame, cfg: CrawlConfig,
                round_ts_ms: int) -> DataFrame:
    """Tag every frontier row with its decision. Callers split by filter —
    Catalyst dedups the shared scan across the three branches."""
    return frontier.withColumn(DECISION_COL, decision_column(cfg, round_ts_ms))
