"""Text-analysis operators for training-data pipelines: tokenization
stats, quality scoring, language-ID heuristic, document fingerprinting.

All hot-path logic is JVM-side `pyspark.sql.functions` (split / filter /
transform / aggregate higher-order functions) — no Python UDFs — so the
operators stay inside whole-stage codegen and scale linearly with the
document scan. Each helper returns Columns, composable into any pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Small marker-word sets per language for the n-gram/stopword heuristic.
# (Real pipelines plug in fastText/CLD3 via mapInPandas — see multimodal.py
# for the binary-column plumbing; this heuristic is the deterministic,
# dependency-free baseline.)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "les", "et", "est"],
    "es": ["el", "la", "los", "y", "es"],
}

STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "it", "for", "on"]


def tokens(text: Column) -> Column:
    """Whitespace tokenization with empty-token removal (split on \\s+ after
    trim; empty strings dropped so '' inputs count 0 tokens)."""
    return F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != "")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token count: words + digit runs + punctuation marks each
    count separately (a BPE-shaped proxy without a vocab file)."""
    pieces = F.filter(
        F.split(text, r"([^\w]+)|(?<=\d)(?=\D)|(?<=\D)(?=\d)"), lambda t: t != ""
    )
    return F.size(pieces)


def stopword_ratio(toks: Column) -> Column:
    sw = F.array(*[F.lit(w) for w in STOPWORDS])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, F.lower(t))))
    return hits.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double")


def punct_ratio(text: Column) -> Column:
    no_punct = F.regexp_replace(text, r"[^\w\s]", "")
    return (F.length(text) - F.length(no_punct)).cast("double") / F.greatest(
        F.length(text), F.lit(1)
    ).cast("double")


def uniq_token_ratio(toks: Column) -> Column:
    return F.size(F.array_distinct(toks)).cast("double") / F.greatest(
        F.size(toks), F.lit(1)
    ).cast("double")


def mean_token_len(toks: Column) -> Column:
    total = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t).cast("long")
    )
    return total.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double")


def quality_score(text: Column) -> Column:
    """Composite quality heuristic in [0,1]: length band + low punctuation +
    lexical diversity + sane mean token length. Deterministic rational
    arithmetic (counts and fixed divisions) — reproducible across engines."""
    toks = tokens(text)
    n = F.size(toks)
    len_ok = (n >= 5) & (n <= 10000)
    diversity = uniq_token_ratio(toks)
    punct = punct_ratio(text)
    mean_len = mean_token_len(toks)
    mean_len_ok = (mean_len >= 2.0) & (mean_len <= 12.0)
    return (
        len_ok.cast("double") * 0.25
        + mean_len_ok.cast("double") * 0.25
        + diversity * 0.25
        + (F.lit(1.0) - F.least(punct * 4, F.lit(1.0))) * 0.25
    )


def lang_scores(toks: Column) -> dict[str, Column]:
    """Marker-word hit counts per language."""
    out = {}
    for lang, words in LANG_MARKERS.items():
        arr = F.array(*[F.lit(w) for w in words])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(arr, F.lower(t))))
    return out


def lang_id(text: Column) -> Column:
    """Pick the language with the most marker hits; ties break by language
    code order; zero hits -> 'und' (undetermined)."""
    toks = tokens(text)
    scores = lang_scores(toks)
    langs = sorted(scores)  # deterministic tie order
    best = F.greatest(*[scores[lg] for lg in langs])
    expr = F.lit("und")
    # build reversed so earlier languages win ties
    for lg in reversed(langs):
        expr = F.when(scores[lg] == best, F.lit(lg)).otherwise(expr)
    return F.when(best == 0, F.lit("und")).otherwise(expr)


def fingerprint(text: Column) -> Column:
    """Normalized document fingerprint: lowercase, collapse whitespace,
    strip punctuation, md5. Robust to case/spacing edits — the rolling-hash
    fingerprint family of the reference's text surface."""
    norm = F.regexp_replace(F.lower(text), r"[^\w\s]", "")
    norm = F.regexp_replace(F.trim(norm), r"\s+", " ")
    return F.md5(norm)
