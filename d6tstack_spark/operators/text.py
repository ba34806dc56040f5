"""Text-analysis operators for training-data pipelines over the documents
table: token counting, quality scoring, language-ID heuristic, document
fingerprinting. All built-in JVM expressions (no Python UDFs) so the plans
stay inside whole-stage codegen; every formula has an exact ANSI-SQL mirror
for the DuckDB oracle (see __spark_entry__.oracle_sql).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# language marker stopwords for the n-gram/stopword-voting heuristic;
# chosen to be regex-safe literal words
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "que", "de", "los"],
    "fr": ["le", "les", "des", "est", "une"],
    "de": ["der", "die", "und", "das", "ist"],
}

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"]


def _word_pattern(words: list[str]) -> str:
    return r"\b(" + "|".join(words) + r")\b"


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count; empty/blank → 0, null → null."""
    t = F.trim(F.col(text_col))
    n = F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))
    return df.withColumn("n_tokens", n.cast("int"))


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length/punctuation/stopword/alpha ratios + a composite quality score.

    All ratios are double divisions of exact integer counts, so the DuckDB
    oracle reproduces them bit-identically.
    """
    t = F.col(text_col)
    n_chars = F.length(t)
    n_punct = F.regexp_count(t, F.lit(r"[.!?,;:]"))
    n_alpha = F.regexp_count(t, F.lit(r"[A-Za-z]"))
    toks = F.when(F.trim(t) == "", F.lit(0)).otherwise(
        F.size(F.split(F.trim(t), r"\s+"))
    )
    n_stop = F.regexp_count(F.lower(t), F.lit(_word_pattern(STOPWORDS)))
    safe = F.greatest(n_chars, F.lit(1)).cast("double")
    safe_tok = F.greatest(toks, F.lit(1)).cast("double")
    return (
        df.withColumn("n_chars_calc", n_chars.cast("int"))
        .withColumn("n_tokens", toks.cast("int"))
        .withColumn("punct_ratio", n_punct.cast("double") / safe)
        .withColumn("alpha_ratio", n_alpha.cast("double") / safe)
        .withColumn("stopword_ratio", n_stop.cast("double") / safe_tok)
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-voting language ID: count per-language marker words, argmax
    with deterministic tiebreak (count desc, language code asc); 'und' when
    no marker hits."""
    t = F.lower(F.col(text_col))
    scores = [
        (lang, F.regexp_count(t, F.lit(_word_pattern(words))))
        for lang, words in sorted(LANG_MARKERS.items())
    ]
    best = F.greatest(*[s for _, s in scores])
    pred = F.lit("und")
    for lang, s in reversed(scores):  # earlier langs win ties → apply last
        pred = F.when((best > 0) & (s == best), F.lit(lang)).otherwise(pred)
    return df.withColumn("lang_pred", pred)


# BPE-ish pre-tokenizer classes: letter runs, digit runs, single
# non-alnum-non-space marks — explicit ASCII classes so Java (Spark) and
# RE2-style (DuckDB) regex engines agree symbol-for-symbol
BPE_TOKEN_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\r]"


def token_count_bpe(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Subword-style token count: the BPE pre-tokenization split (letter
    runs / digit runs / punctuation marks) — the standard proxy for LLM
    token budgets when no tokenizer model ships with the job. Pure JVM
    regexp (whole-stage codegen); null text → null."""
    n = F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_TOKEN_PATTERN), F.lit(0)))
    return df.withColumn("n_tokens_bpe", n.cast("int"))


def rolling_fingerprint(
    df: DataFrame, text_col: str = "text", base: int = 31, mod: int = 1_000_000_007
) -> DataFrame:
    """Polynomial rolling hash (Rabin-Karp) over the text's code points:
    h = Σ c_i · base^(n-i) mod p, computed as a fold — an order-sensitive
    content fingerprint (md5-based ``fingerprint`` is normalization-keyed;
    this one is exact-sequence-keyed and cheap to maintain incrementally).
    The mod keeps every intermediate inside int64 in BOTH engines (DuckDB
    errors on bigint overflow — never rely on wraparound)."""
    codes = F.transform(F.split(F.col(text_col), ""), lambda x: F.ascii(x))
    h = F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * base + x.cast("long")) % F.lit(mod),
    )
    return df.withColumn("rolling_fp", h)


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Normalized-content fingerprint: lowercase, collapse non-alnum runs to
    single spaces, trim, md5. Identical md5 exists in DuckDB → oracle-exact.
    (The reference has no analog; this is the dedup-key primitive.)"""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9]+", " "))
    return df.withColumn("fp", F.md5(norm))
