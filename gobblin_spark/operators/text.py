"""Text-analysis operators for training-data pipelines.

All pure JVM expressions (pyspark.sql.functions) — no Python in the hot
path; each returns a Column so it composes into any projection and stays
inside whole-stage codegen. Where an operator is registered for the driver's
correctness gate, the same formula is replayed in ANSI SQL by DuckDB, so the
formulas stick to portable primitives (regexp, length, md5).
"""

from __future__ import annotations

import pyspark.sql.functions as F

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic (public knowledge; any real pipeline would plug fastText etc.).
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"],
    "de": ["der", "die", "und", "das", "ist", "von", "nicht", "mit", "ein", "zu"],
    "fr": ["le", "la", "et", "les", "des", "est", "pas", "que", "une", "dans"],
    "es": ["el", "la", "de", "que", "los", "una", "por", "con", "para", "es"],
}


def tokens(text_col):
    t = text_col if not isinstance(text_col, str) else F.col(text_col)
    return F.filter(F.split(F.lower(t), r"\s+"), lambda x: x != "")


def token_count_ws(text_col):
    """Whitespace token count."""
    return F.size(tokens(text_col))


def token_count_bpe_ish(text_col):
    """BPE-ish token estimate: extract word/punct pieces like a byte-pair
    pre-tokenizer, long words cost ceil(len/6) subword units. Uses
    regexp_extract_all (RE2-portable — no lookarounds) so the SQL oracle
    replays it exactly."""
    t = text_col if not isinstance(text_col, str) else F.col(text_col)
    pieces = F.regexp_extract_all(t, F.lit(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"), 0)
    return F.aggregate(
        pieces,
        F.lit(0).cast("long"),
        lambda acc, p: acc + F.ceil(F.length(p) / F.lit(6.0)).cast("long"),
    )


def stopword_ratio(text_col, lang: str = "en"):
    toks = tokens(text_col)
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    hits = F.size(F.filter(toks, lambda x: F.array_contains(sw, x)))
    return F.when(F.size(toks) > 0,
                  hits.cast("double") / F.size(toks)).otherwise(0.0)


def lang_id(text_col):
    """Heuristic language ID: argmax over per-language stopword hit ratios;
    'und' (undetermined) when nothing matches."""
    toks = tokens(text_col)
    scores = []
    for lang, words in STOPWORDS.items():
        sw = F.array(*[F.lit(w) for w in words])
        scores.append(
            F.struct(
                F.size(F.filter(toks, lambda x: F.array_contains(sw, x)))
                .cast("double").alias("score"),
                F.lit(lang).alias("lang"),
            )
        )
    best = F.array_max(F.array(*scores))
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def punct_ratio(text_col):
    t = text_col if not isinstance(text_col, str) else F.col(text_col)
    n_punct = F.length(F.regexp_replace(t, r"[^!-/:-@\[-`{-~]", ""))
    return F.when(F.length(t) > 0,
                  n_punct.cast("double") / F.length(t)).otherwise(0.0)


def mean_word_length(text_col):
    toks = tokens(text_col)
    total = F.aggregate(toks, F.lit(0).cast("long"),
                        lambda acc, x: acc + F.length(x))
    return F.when(F.size(toks) > 0,
                  total.cast("double") / F.size(toks)).otherwise(0.0)


def quality_score(text_col):
    """Composite document-quality heuristic in [0,1]: rewards moderate
    length, mid-range mean word length, low punctuation noise, and some
    stopword presence (prose-likeness). Deterministic; portable to SQL."""
    t = text_col if not isinstance(text_col, str) else F.col(text_col)
    n = token_count_ws(t).cast("double")
    len_score = F.least(n / F.lit(64.0), F.lit(1.0))
    mwl = mean_word_length(t)
    word_score = F.when((mwl >= 3.0) & (mwl <= 10.0), 1.0).otherwise(0.5)
    punct_score = F.lit(1.0) - F.least(punct_ratio(t) * 4.0, F.lit(1.0))
    sw_score = F.least(stopword_ratio(t) * 5.0, F.lit(1.0))
    return F.round(
        0.4 * len_score + 0.2 * word_score + 0.2 * punct_score + 0.2 * sw_score, 6
    )


def fingerprint(text_col, n: int = 3):
    """Document fingerprint: md5 over the ordered word n-gram digests'
    minimum (a 1-hash MinHash ≙ robust winnowing-style fingerprint) plus the
    exact md5 of the normalized text. Returns struct(exact, sketch)."""
    from gobblin_spark.operators.dedup import shingles_expr

    t = text_col if not isinstance(text_col, str) else F.col(text_col)
    norm = F.regexp_replace(F.lower(t), r"\s+", " ")
    sh = shingles_expr(t, n)
    sketch = F.array_min(F.transform(sh, lambda s: F.md5(s)))
    return F.struct(F.md5(norm).alias("exact"),
                    F.coalesce(sketch, F.md5(norm)).alias("sketch"))
