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


# Body-text extraction: the crawl→training-data bridge. The reference
# stores Jsoup's full `content` string untouched (crawler/
# PageProcessor.java); a corpus pipeline needs the rendered TEXT —
# script/style/comments dropped, block boundaries kept as newlines,
# entities decoded. The whole chain is RE2-compatible regexp_replace /
# replace steps shared verbatim with the SQL oracle: map-only, no UDF.

_DROP_BLOCKS_RE = r"(?is)<(script|style)[^>]*>.*?</(script|style)>"
_COMMENT_RE = r"(?s)<!--.*?-->"
_BLOCK_BREAK_RE = (r"(?i)</(p|div|h[1-6]|li|tr|table|ul|ol|"
                   r"blockquote|section|article|header|footer)>|<br[^>]*>")
_ANY_TAG_RE = r"(?s)<[^>]*>"

# fixed entity chain — &amp; LAST so '&amp;lt;' decodes to '&lt;' not '<'
_ENTITIES = (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
             ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&"))


def html_to_text(pages: DataFrame, html_col: str = "html",
                 url_col: str = "url") -> DataFrame:
    """(url, html) -> (url, text): rendered body text.

    Steps, in order (each mirrored byte-identically by the oracle):
    drop <script>/<style> blocks and HTML comments; turn closing
    block-level tags and <br> into newlines; strip every remaining tag;
    decode the six common entities (&amp; last, so double-escaped
    entities decode one level, as a browser shows them); collapse
    horizontal whitespace, trim line edges, collapse blank-line runs,
    trim the ends.

    Scale shape: a single map-only projection riding the pages scan —
    whole-stage codegen, no exchange, no Python; at 100 TB the cost is
    scan bandwidth (and the regexes are RE2-safe linear-time)."""
    t = F.col(html_col)
    t = F.regexp_replace(t, _DROP_BLOCKS_RE, "")
    t = F.regexp_replace(t, _COMMENT_RE, "")
    t = F.regexp_replace(t, _BLOCK_BREAK_RE, "\n")
    t = F.regexp_replace(t, _ANY_TAG_RE, "")
    for ent, ch in _ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(ch))
    t = F.regexp_replace(t, r"[ \t\r]+", " ")        # horizontal runs
    t = F.regexp_replace(t, r" ?\n ?", "\n")         # trim line edges
    t = F.regexp_replace(t, r"\n{2,}", "\n")         # blank-line runs
    t = F.regexp_replace(t, r"^\n|\n$", "")          # outer trim
    return pages.select(F.col(url_col).alias("url"), t.alias("text"))
