"""Text analysis operators for the training-data pipeline (all JVM-side).

Every expression here compiles into whole-stage codegen — no UDFs:
token counting, quality scoring, n-gram-heuristic language ID, rolling
document fingerprints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["token_stats", "quality_score", "language_id", "fingerprint",
           "STOPWORDS"]

STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "et", "les", "des", "est", "dans", "que", "une", "pour"],
    "es": ["el", "la", "de", "que", "los", "en", "una", "por", "con", "para"],
}


def _tokens(text_col: str):
    return F.split(F.lower(F.trim(F.col(text_col))), r"\s+")


# GPT-2-style pre-tokenizer (the public BPE pipeline's first stage):
# contractions, space-prefixed letter runs, space-prefixed digit runs,
# space-prefixed punctuation runs, residual whitespace. Scoped to ASCII
# classes and written without lookahead so the SAME pattern runs
# identically under Java regex (Spark codegen), RE2 (the DuckDB oracle),
# and Python re — all three use leftmost-first alternation. Real BPE
# splits pre-tokens further, so the count is a sound lower bound on BPE
# tokens and a far better estimate than chars/4 for natural text.
PRETOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+" \
              r"| ?[^\sA-Za-z0-9]+|\s+"


def token_stats(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Whitespace tokens + GPT-2-style pre-token count (PRETOKEN_RE) +
    BPE-ish subword estimate (len/4 heuristic) + char counts. All
    codegen, no UDF."""
    toks = _tokens(text_col)
    return docs.select(
        id_col,
        F.length(text_col).alias("n_chars_obs"),
        F.when(F.length(F.trim(F.col(text_col))) == 0, 0)
         .otherwise(F.size(toks)).alias("n_tokens"),
        F.regexp_count(F.col(text_col), F.lit(PRETOKEN_RE))
         .cast("long").alias("n_pretokens"),
        F.ceil(F.length(text_col) / 4.0).cast("long").alias("n_tokens_bpe"),
    )


def quality_score(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality features + a composite score in [0, 1]:
    length band, punctuation ratio, mean word length, alpha ratio."""
    n = F.length(text_col).cast("double")
    punct = (n - F.length(F.regexp_replace(text_col, r"[^\w\s]", ""))) / F.greatest(n, F.lit(1.0))
    alpha = F.length(F.regexp_replace(text_col, r"[^A-Za-z]", "")) / F.greatest(n, F.lit(1.0))
    toks = _tokens(text_col)
    mean_wl = n / F.greatest(F.size(toks).cast("double"), F.lit(1.0))
    len_band = F.when((n >= 20) & (n <= 20000), 1.0).otherwise(0.25)
    score = (len_band * 0.4 + (1.0 - punct) * 0.2 + alpha * 0.2
             + F.when((mean_wl >= 3) & (mean_wl <= 12), 1.0).otherwise(0.0) * 0.2)
    return docs.select(
        id_col,
        punct.alias("punct_ratio"),
        alpha.alias("alpha_ratio"),
        mean_wl.alias("mean_word_len"),
        score.alias("quality"),
    )


def language_id(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Stopword-overlap language heuristic: argmax over per-language
    stopword hit counts; 'und' (undetermined) when nothing matches."""
    toks = F.array_distinct(_tokens(text_col))
    scores = [
        F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in ws])))
        .alias(f"hits_{lang}")
        for lang, ws in STOPWORDS.items()
    ]
    scored = docs.select(id_col, *scores)
    langs = list(STOPWORDS)
    best = F.greatest(*[F.col(f"hits_{l}") for l in langs])
    pred = F.when(best <= 0, F.lit("und"))
    for l in langs:  # first max wins, stable order
        pred = pred.when(F.col(f"hits_{l}") == best, F.lit(l))
    return scored.select(id_col, *[f"hits_{l}" for l in langs],
                         pred.alias("lang_pred"))


def fingerprint(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Order-sensitive rolling document fingerprint:
    fold(tokens, acc -> xxhash64(acc, token)) — hash chaining keeps the
    accumulator in 64-bit without ANSI overflow; deterministic, codegen."""
    fp = F.expr(
        f"aggregate(split(lower(trim({text_col})), '\\\\s+'), "
        "CAST(1469598103934665603 AS BIGINT), "
        "(acc, t) -> xxhash64(acc, t))")
    return docs.select(id_col, fp.alias("fingerprint"))
