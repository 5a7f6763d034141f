"""HTML head-metadata extraction: title / meta-description / canonical /
og:image / robots-noindex per fetched page.

The reference parses pages with Jsoup and keeps only links + full content
(parser/JsoupLinkExtractor.java, crawler/PageProcessor.java); every real
crawl pipeline additionally needs the head metadata — the canonical URL
feeds the dedup/seen-set key, `noindex` gates storage, title/description
feed the document index, og:image seeds the image-pair table mandated by
the BASELINE input_hint. Implemented as one pure-Catalyst projection:
five `regexp_extract`/`rlike` over the raw HTML in a single scan — no
UDF, no shuffle, trivially 100-TB-safe (map-only, column-pruned).

Patterns deliberately use only RE2-compatible constructs (no lookahead,
no backrefs, explicit ASCII classes) so the DuckDB oracle runs the
byte-identical regex. Missing fields come back NULL via nullif(x, '') —
both engines return '' for a no-match extract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# One pattern per field, shared verbatim with the SQL oracle.
TITLE_RE = r"<title>([^<]*)</title>"
DESCRIPTION_RE = r'<meta name="description" content="([^"]*)"'
CANONICAL_RE = r'<link rel="canonical" href="([^"]*)"'
OG_IMAGE_RE = r'<meta property="og:image" content="([^"]*)"'
NOINDEX_RE = r'<meta name="robots" content="[^"]*noindex'


def _field(html: Column, pattern: str) -> Column:
    return F.nullif(F.regexp_extract(html, pattern, 1), F.lit(""))


def extract_page_metadata(pages: DataFrame, html_col: str = "html",
                          url_col: str = "url") -> DataFrame:
    """(url, html) -> (url, title, description, canonical, og_image,
    noindex). `canonical` falls back to the fetch URL when the page
    declares none (the seen-set key must never be NULL)."""
    html = F.col(html_col)
    return pages.select(
        F.col(url_col).alias("url"),
        _field(html, TITLE_RE).alias("title"),
        _field(html, DESCRIPTION_RE).alias("description"),
        F.coalesce(_field(html, CANONICAL_RE), F.col(url_col))
        .alias("canonical"),
        _field(html, OG_IMAGE_RE).alias("og_image"),
        html.rlike(NOINDEX_RE).alias("noindex"),
    )
