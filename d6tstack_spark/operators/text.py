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


def train_bpe_merges(texts: list[str], n_merges: int) -> list[tuple[str, str]]:
    """Classic BPE training (pure python, driver-side — vocab fitting is a
    sample operation, like codec selection): start from characters, repeat
    n_merges times: count adjacent-pair frequencies over the corpus's
    pre-tokens, merge the most frequent pair (ties: lexicographic, for
    determinism). Returns the ordered merges list — rank = list position."""
    import re
    from collections import Counter

    pat = re.compile(BPE_TOKEN_PATTERN)
    words: Counter = Counter()
    for t in texts:
        words.update(pat.findall(t or ""))
    seqs: dict[tuple[str, ...], int] = {
        tuple(w): c for w, c in words.items()
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for seq, c in seqs.items():
            for i in range(len(seq) - 1):
                pairs[(seq[i], seq[i + 1])] += c
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))[0]
        merges.append(best)
        nxt: dict[tuple[str, ...], int] = {}
        for seq, c in seqs.items():
            out = []
            i = 0
            while i < len(seq):
                if (
                    i + 1 < len(seq)
                    and (seq[i], seq[i + 1]) == best
                ):
                    out.append(seq[i] + seq[i + 1])
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            nxt[tuple(out)] = nxt.get(tuple(out), 0) + c
        seqs = nxt
    return merges


def bpe_tokenize(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Tokenize ONE pre-token with a merges table: repeatedly merge the
    LEFTMOST occurrence of the LOWEST-RANK adjacent pair until no pair is in
    the table. One merge per step — a sequential, overlap-unambiguous
    definition that a DuckDB recursive CTE replicates exactly (the oracle
    for token_count_bpe_exact), unlike batch 'merge all occurrences'
    variants whose overlap semantics ('aaa' under (a,a)) are
    implementation-defined."""
    toks = list(word)
    while len(toks) > 1:
        best = None
        for i in range(len(toks) - 1):
            r = ranks.get((toks[i], toks[i + 1]))
            if r is not None and (best is None or r < best[0]):
                best = (r, i)
        if best is None:
            break
        i = best[1]
        toks[i : i + 2] = [toks[i] + toks[i + 1]]
    return toks


# Deterministic built-in merges table: trained at import time on a fixed
# public-domain-style seed paragraph embedded here (no external data, no
# testdata dependency) — callers doing real LLM budgeting pass their model's
# merges instead.
_BPE_SEED_TEXT = (
    "the quick brown fox jumps over the lazy dog while the rain in spain "
    "falls mainly on the plain and the cat sat on the mat with the hat "
    "to be or not to be that is the question whether it is nobler in the "
    "mind to suffer the slings and arrows of outrageous fortune 12345 67890"
)
DEFAULT_BPE_MERGES: list[tuple[str, str]] = train_bpe_merges([_BPE_SEED_TEXT], 48)


def token_count_bpe_exact(
    df: DataFrame,
    text_col: str = "text",
    merges: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """Exact merges-table BPE token count — the real LLM-budget unit (the
    regex token_count_bpe above is only the pre-tokenizer proxy).

    Pipeline: pre-tokenize with BPE_TOKEN_PATTERN (same regex both engines),
    then bpe_tokenize each pre-token and sum the subword counts. Runs as an
    Arrow-batched pandas UDF (Python is unavoidable for the merge loop) with
    a per-batch word cache — real corpora repeat words heavily, so the loop
    runs once per DISTINCT word per batch, not once per occurrence. The
    merges table rides the closure (a few KB). Null text → null."""
    import re

    from pyspark.sql.functions import pandas_udf

    mlist = DEFAULT_BPE_MERGES if merges is None else merges
    ranks = {pair: i for i, pair in enumerate(mlist)}

    @pandas_udf("int")
    def _count(s):
        pat = re.compile(BPE_TOKEN_PATTERN)
        cache: dict[str, int] = {}

        def one(t):
            if t is None:
                return None
            total = 0
            for w in pat.findall(t):
                n = cache.get(w)
                if n is None:
                    n = len(bpe_tokenize(w, ranks))
                    cache[w] = n
                total += n
            return total

        return s.map(one).astype("Int32")

    return df.withColumn("n_tokens_bpe", _count(F.col(text_col)))


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
