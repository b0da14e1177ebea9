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


def token_repetition_stats(df, id_col: str, text_col: str):
    """Gopher-style repetition/boilerplate signals per document:

    - ``top_token_frac``   — occurrences of the most frequent token / total
      tokens (high → degenerate keyword spam)
    - ``top_bigram_frac``  — same for word bigrams (high → boilerplate)
    - ``distinct_token_ratio`` — distinct / total tokens (low → repetitive)

    Scale shape: one explode + two-level aggregate per signal — the
    per-(doc, token) count is a key-partitioned shuffle that grows linearly
    with corpus size (map-side combine applies), never a per-document
    quadratic pass; both signals then fold back with one aggregate on the
    doc key. All JVM expressions, no Python in the path.
    """
    import pyspark.sql.functions as F

    base = df.select(F.col(id_col).alias("__id"),
                     tokens(text_col).alias("__toks"))
    toks = base.select("__id", F.explode("__toks").alias("tok"))
    tok_counts = toks.groupBy("__id", "tok").agg(F.count("*").alias("c"))
    tok_stats = tok_counts.groupBy("__id").agg(
        F.max("c").alias("top_c"),
        F.sum("c").alias("total"),
        F.count("*").alias("distinct_c"),
    )
    bi = base.select(
        "__id",
        F.explode(
            F.zip_with(
                F.slice(F.col("__toks"), 1,
                        F.greatest(F.size("__toks") - 1, F.lit(0))),
                F.slice(F.col("__toks"), 2,
                        F.greatest(F.size("__toks") - 1, F.lit(0))),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        ).alias("bg"),
    )
    bg_counts = bi.groupBy("__id", "bg").agg(F.count("*").alias("c"))
    bg_stats = bg_counts.groupBy("__id").agg(
        F.max("c").alias("bg_top_c"), F.sum("c").alias("bg_total")
    )
    return (
        base.select("__id")
        .join(tok_stats, "__id", "left")
        .join(bg_stats, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.round(
                F.when(F.col("total") > 0,
                       F.col("top_c").cast("double") / F.col("total"))
                .otherwise(0.0), 6).alias("top_token_frac"),
            F.round(
                F.when(F.col("bg_total") > 0,
                       F.col("bg_top_c").cast("double") / F.col("bg_total"))
                .otherwise(0.0), 6).alias("top_bigram_frac"),
            F.round(
                F.when(F.col("total") > 0,
                       F.col("distinct_c").cast("double") / F.col("total"))
                .otherwise(0.0), 6).alias("distinct_token_ratio"),
        )
    )


# PII scrubbing: redact emails / URLs / IPv4s with typed placeholder tokens.
# RE2-portable patterns (no lookarounds) so DuckDB's regexp_replace replays
# them exactly. Order matters: URLs before emails would still be safe here,
# but emails are scrubbed first so 'http://x/a@b' style paths keep the URL
# placeholder semantics; IPv4 last so it never eats a URL host redaction.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("url", r"https?://[^\s]+", "<URL>"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
]


def pii_scrub(text_col):
    """Redacted text: every email / URL / IPv4 replaced by its placeholder.
    Pure JVM regexp_replace chain — stays in whole-stage codegen."""
    import pyspark.sql.functions as F

    t = text_col if not isinstance(text_col, str) else F.col(text_col)
    out = t
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_counts(text_col):
    """struct(n_email, n_url, n_ipv4): how many redactions pii_scrub would
    make — counted on the same progressively-scrubbed text so the counts
    sum to the total number of placeholders in the output."""
    import pyspark.sql.functions as F

    t = text_col if not isinstance(text_col, str) else F.col(text_col)
    fields = []
    cur = t
    for name, pat, repl in PII_PATTERNS:
        fields.append(
            F.size(F.regexp_extract_all(cur, F.lit(pat), 0))
            .cast("long").alias(f"n_{name}")
        )
        cur = F.regexp_replace(cur, pat, repl)
    return F.struct(*fields)


def hash_uniform_expr(id_col):
    """Deterministic uniform [0,1) from a row id: first 8 md5 hex chars as a
    32-bit int over 2^32. md5 (not xxhash64) so any SQL engine replays the
    exact same draw — sampling decisions must be reproducible across reruns
    AND engines for a training corpus to be auditable."""
    import pyspark.sql.functions as F

    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return (
        F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10)
        .cast("double") / F.lit(4294967296.0)
    )


def stratified_sample(df, group_col: str, fracs: dict, id_col: str,
                      default_frac: float = 0.0):
    """Deterministic per-group sampling — the dataset-mixing step of a
    training pipeline (e.g. keep 30% of 'en', all of low-resource langs).

    Each row's keep/drop is a pure function of its id (md5-derived uniform
    draw < its group's fraction): no RNG state, no shuffle, embarrassingly
    parallel, and re-running over re-partitioned / re-ordered data selects
    the IDENTICAL sample. Unknown groups fall back to ``default_frac``.
    """
    import pyspark.sql.functions as F

    u = hash_uniform_expr(id_col)
    frac = F.lit(float(default_frac))
    for k, v in sorted(fracs.items()):
        frac = F.when(F.col(group_col) == k, F.lit(float(v))).otherwise(frac)
    return df.filter(u < frac)


def contamination_flags(docs, probes, id_col: str, text_col: str,
                        probe_id_col: str, probe_text_col: str, n: int = 8):
    """Benchmark decontamination: flag every training document sharing at
    least one word n-gram with an evaluation/probe set (the standard
    n-gram-overlap contamination rule).

    Scale shape: probe n-grams are tiny (eval sets are small) → broadcast;
    training docs explode to (id, gram) and semi-join the broadcast — one
    scan of the corpus, no shuffle of the corpus itself. Returns
    (doc_id, n_hits, first_probe) per CONTAMINATED doc only.
    """
    import pyspark.sql.functions as F

    from gobblin_spark.operators.dedup import shingles_expr

    pg = probes.select(
        F.col(probe_id_col).alias("__pid"),
        F.explode(shingles_expr(probe_text_col, n)).alias("__gram"),
    ).dropDuplicates(["__pid", "__gram"])
    dg = docs.select(
        F.col(id_col).alias("__did"),
        F.explode(shingles_expr(text_col, n)).alias("__gram"),
    )
    hits = dg.join(F.broadcast(pg), "__gram")
    return (
        hits.groupBy("__did")
        .agg(
            F.countDistinct("__gram").cast("long").alias("n_hits"),
            F.min("__pid").alias("first_probe"),
        )
        .select(F.col("__did").alias(id_col), "n_hits", "first_probe")
    )
