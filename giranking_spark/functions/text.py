"""Text-analysis scalar functions (extension surface, SURVEY.md §7 phase E).

All pure Column expressions (JVM-side). Each has a mirrored DuckDB SQL
formulation in giranking_spark/operators/textops.py so the driver oracle can
replay identical semantics.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small, fixed stopword lists (top function words). Order matters only for
# documentation; membership tests are set-like.
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "of", "and", "to", "in", "is", "that", "it", "was", "for",
           "on", "are", "as", "with", "his", "they", "at", "be", "this", "have"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit",
           "auf", "für", "von", "dem", "den", "des", "im", "zu", "sich", "als", "auch"],
    "fr": ["le", "la", "les", "de", "des", "et", "est", "un", "une", "dans",
           "que", "qui", "pour", "pas", "sur", "au", "avec", "son", "ne", "ce"],
    "es": ["el", "la", "los", "las", "de", "y", "es", "un", "una", "en",
           "que", "por", "con", "para", "su", "se", "del", "al", "como", "más"],
}
LANG_ORDER = ["en", "de", "fr", "es"]  # deterministic tie-break priority


def tokens(text: Column) -> Column:
    """Non-empty whitespace-separated tokens."""
    return F.filter(F.split(F.trim(text), r"\s+"), lambda x: x != "")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def words(text: Column) -> Column:
    """Lower-cased alphanumeric word tokens (punctuation stripped)."""
    cleaned = F.regexp_replace(F.lower(text), r"[^a-z0-9à-ÿ]+", " ")
    return F.filter(F.split(F.trim(cleaned), r"\s+"), lambda x: x != "")


def char_count(text: Column) -> Column:
    return F.length(text)


def punct_count(text: Column) -> Column:
    return F.length(F.regexp_replace(text, r"[^!-/:-@\[-`{-~]", ""))


def stopword_count(text: Column, lang: str = "en") -> Column:
    vocab = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(words(text), lambda w: F.array_contains(vocab, w)))


def lang_scores(text: Column) -> dict[str, Column]:
    return {lang: stopword_count(text, lang) for lang in LANG_ORDER}


def lang_id(text: Column) -> Column:
    """Argmax language by stopword hits; 'und' when no hits. Deterministic
    tie-break by LANG_ORDER priority."""
    s = lang_scores(text)
    expr = F.lit("es")
    # build reverse-priority CASE chain: earlier languages win ties
    for lang in ["fr", "de", "en"]:
        later = LANG_ORDER[LANG_ORDER.index(lang) + 1:]
        cond = s[lang] >= s[later[0]]
        for other in later[1:]:
            cond = cond & (s[lang] >= s[other])
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    total = sum(s[lang] for lang in LANG_ORDER)
    return F.when(total == 0, F.lit("und")).otherwise(expr)


def word_ngrams(text: Column, n: int) -> Column:
    """Word-level n-gram shingles as '_'-joined strings; empty array when the
    document has fewer than n words.

    NOTE: array-valued convenience form. For bulk fan-out pipelines use
    ``operators/dedup.shingle_rows`` instead — this higher-order-function
    expression evaluates ~20× slower per row and serializes under thread
    contention (measured at sf0.1; same output)."""
    w = words(text)
    grams = F.transform(
        F.sequence(F.lit(0), F.size(w) - n),
        lambda i: F.concat_ws("_", F.slice(w, i + 1, n)),
    )
    return F.when(F.size(w) >= n, grams).otherwise(F.array().cast("array<string>"))


def fingerprint(text: Column) -> Column:
    """Canonical content fingerprint: md5 of the normalized word sequence."""
    return F.md5(F.concat_ws(" ", words(text)))
