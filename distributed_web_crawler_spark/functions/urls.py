"""URL scalar functions (SURVEY.md §2.6 X1-X8) — all JVM-side built-ins.

The reference extracts hosts with ``new URL(u).getHost()``
(core/WebCrawler.java:199-200) and resolves relative links with Jsoup's
``abs:href`` (core/WebCrawler.java:341). We use ``parse_url`` /
regex built-ins so the hot path stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HTTP_URL_RE = r"^https?://"


def host_of(url: Column) -> Column:
    """X1: URL → host. Null for unparseable URLs (drops them at F8)."""
    return F.parse_url(url, F.lit("HOST"))


def protocol_of(url: Column) -> Column:
    """X2: URL → scheme."""
    return F.parse_url(url, F.lit("PROTOCOL"))


def path_of(url: Column) -> Column:
    return F.parse_url(url, F.lit("PATH"))


def is_http_url(url: Column) -> Column:
    """F8 validity: http(s) scheme + parseable host. (The reference accepts
    any java.net.URL scheme at core/WebCrawler.java:355; we restrict to
    http(s), which the golden model mirrors.)"""
    return url.rlike(HTTP_URL_RE) & host_of(url).isNotNull()


def normalize_scheme(url: Column) -> Column:
    """X8: prepend https:// when no scheme (ui/MainView.java:281-283)."""
    return F.when(url.rlike(HTTP_URL_RE), url).otherwise(
        F.concat(F.lit("https://"), url))


def combined_allow_pattern(patterns: tuple[str, ...]) -> str | None:
    """F3: OR-fold the allow-list into one anchored regex; None = allow all
    (reference: core/WebCrawler.java:218-229 — empty list allows all)."""
    if not patterns:
        return None
    return "^(?:" + "|".join(f"(?:{p})" for p in patterns) + ")$"


def combined_exclude_pattern(patterns: tuple[str, ...]) -> str | None:
    """F4: OR-fold exclude regexes; reference uses full-match semantics
    (Matcher.matches(), core/WebCrawler.java:232-238), hence anchoring."""
    if not patterns:
        return None
    return "^(?:" + "|".join(f"(?:{p})" for p in patterns) + ")$"
