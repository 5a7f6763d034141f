"""Text-analysis operators for a training-data pipeline over `documents`.

All four are pure Catalyst expressions (JVM-side, whole-stage codegen) — no
UDFs — so they survive a 100 TB corpus: each is a single scan with the text
column pruned to exactly what's needed, no shuffle except the caller's.

- token_count: whitespace tokenization + a BPE-ish sub-token estimate
- quality_score: length / punctuation / stopword-ratio heuristics
- lang_id: n-gram / stopword-hit heuristic
- fingerprint: rolling normalization + sha256 document fingerprint
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language marker lexicons for the heuristic language-ID
LANG_MARKERS = {
    "en": ["the", "a", "of", "and", "value", "data"],
    "es": ["el", "la", "de", "que"],
    "fr": ["le", "la", "et", "les"],
    "de": ["der", "die", "das", "und"],
}
STOPWORDS = ("the", "a", "of", "and", "to", "in")


def _count_word(text: Column, word: str) -> Column:
    """Occurrences of a whole word — size(split)-1, JVM-side."""
    return F.size(F.split(text, rf"\b{word}\b")) - F.lit(1)


def tokens(text: Column) -> Column:
    """Whitespace tokenization of already-trimmed text."""
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word token estimate: alnum runs + punctuation marks each count
    (a cheap stand-in for a BPE vocabulary; deterministic + SQL-mirrorable)."""
    alnum_runs = F.size(F.split(F.trim(text), r"[^A-Za-z0-9]+"))
    puncts = F.length(F.regexp_replace(text, r"[A-Za-z0-9\s]", ""))
    return alnum_runs + puncts


def quality_score(text: Column) -> Column:
    """0..1 heuristic: longer docs, low punctuation density and a healthy
    stopword ratio score higher. Deterministic closed form."""
    n = F.length(text)
    words = token_count(text).cast("double")
    punct = F.length(F.regexp_replace(text, r"[A-Za-z0-9\s]", "")).cast("double")
    stop_hits = sum((_count_word(F.lower(text), wrd) for wrd in STOPWORDS),
                    F.lit(0)).cast("double")
    len_score = F.least(n.cast("double") / F.lit(500.0), F.lit(1.0))
    punct_penalty = F.least(punct / F.greatest(words, F.lit(1.0)), F.lit(1.0))
    stop_score = F.least(stop_hits / F.greatest(words, F.lit(1.0)) * 5.0,
                         F.lit(1.0))
    return F.round(0.5 * len_score + 0.3 * stop_score
                   + 0.2 * (1.0 - punct_penalty), 6)


def lang_id(text: Column) -> Column:
    """Pick the language with the most marker-word hits; 'und' if none.
    Ties break by fixed language order (en, es, fr, de)."""
    lowered = F.lower(text)
    scores = {lang: sum((_count_word(lowered, wrd) for wrd in words), F.lit(0))
              for lang, words in LANG_MARKERS.items()}
    best = F.greatest(*scores.values())
    expr = F.when(best <= 0, F.lit("und"))
    for lang in ("en", "es", "fr", "de"):
        expr = expr.when(scores[lang] == best, F.lit(lang))
    return expr.otherwise(F.lit("und"))


def fingerprint(text: Column) -> Column:
    """Document fingerprint: sha256 over case/whitespace-normalized text."""
    return F.sha2(F.regexp_replace(F.lower(F.trim(text)), r"\s+", " "), 256)


def analyze(documents: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    return documents.select(
        "doc_id",
        token_count(t).alias("n_tokens"),
        bpe_ish_token_count(t).alias("n_subtokens"),
        quality_score(t).alias("quality"),
        lang_id(t).alias("lang_pred"),
        fingerprint(t).alias("fingerprint"),
    )
