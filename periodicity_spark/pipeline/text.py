"""Text analysis operators over document tables: token stats, quality
scores, language-ID heuristic, fingerprinting. All native expressions —
string ops stay JVM-side, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# a small English stopword list for the n-gram/stopword heuristics
EN_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"]


def _tokens(text_col: str = "text") -> Column:
    return F.split(F.col(text_col), " ")


def token_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-doc token/char statistics: → (doc_id, n_chars, n_tokens,
    avg_token_len, ws_ratio)."""
    toks = _tokens(text_col)
    n_tokens = F.size(toks)
    total_tok_chars = F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.length(t)
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.length(text_col).alias("n_chars"),
        n_tokens.alias("n_tokens"),
        (total_tok_chars / n_tokens.cast("double")).alias("avg_token_len"),
        (
            (F.length(text_col) - F.length(F.replace(F.col(text_col), F.lit(" "), F.lit(""))))
            / F.length(text_col).cast("double")
        ).alias("ws_ratio"),
    )


def stopword_ratio(
    docs: DataFrame,
    stopwords: list[str] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Fraction of tokens that are in the stopword list: → (doc_id, sw_ratio).
    Native higher-order filter — no explode, no shuffle."""
    sw = stopwords or EN_STOPWORDS
    toks = _tokens(text_col)
    n_sw = F.size(F.filter(toks, lambda t: t.isin(sw)))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        (n_sw / F.size(toks).cast("double")).alias("sw_ratio"),
    )


def quality_score(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Composite quality heuristic in [0,1]: length score × stopword presence
    × mean-token-length plausibility. → (doc_id, quality).

    Every factor is a per-row expression, so the whole score is ONE
    projection over one scan — no token_stats⋈stopword_ratio self-join
    (which would scan the corpus twice and shuffle for the equi-join)."""
    toks = _tokens(text_col)
    n_tokens = F.size(toks)
    total_tok_chars = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    avg_token_len = total_tok_chars / n_tokens.cast("double")
    sw_ratio = (
        F.size(F.filter(toks, lambda t: t.isin(EN_STOPWORDS)))
        / n_tokens.cast("double")
    )
    len_score = F.least(n_tokens / F.lit(64.0), F.lit(1.0))
    tok_score = F.when((avg_token_len >= 2.5) & (avg_token_len <= 8.0), 1.0).otherwise(0.5)
    sw_score = F.least(sw_ratio * 5.0, F.lit(1.0))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        (len_score * tok_score * sw_score).alias("quality"),
    )


def language_id(
    docs: DataFrame,
    lang_stopwords: dict[str, list[str]] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Stopword-vote language ID: per language, count tokens in that
    language's marker list; predict the argmax (ties → lexicographic).
    → (doc_id, predicted_lang, score)."""
    markers = lang_stopwords or {
        "en": ["the", "and", "of", "to", "a"],
        "de": ["der", "die", "und", "das", "ist"],
        "fr": ["le", "la", "et", "les", "des"],
        "es": ["el", "la", "los", "que", "y"],
        "zh": ["de", "shi", "le", "zai", "he"],
    }
    toks = _tokens(text_col)
    n = F.size(toks).cast("double")
    scores = [
        ((F.size(F.filter(toks, lambda t: t.isin(words))) / n)).alias(f"_s_{lang}")
        for lang, words in markers.items()
    ]
    scored = docs.select(F.col(id_col).alias("doc_id"), *scores)
    langs = sorted(markers)
    best = F.greatest(*[F.col(f"_s_{lang}") for lang in langs])
    pred = F.coalesce(
        *[F.when(F.col(f"_s_{lang}") == best, F.lit(lang)) for lang in langs]
    )
    return scored.select("doc_id", pred.alias("predicted_lang"), best.alias("score"))


# GPT-2-style pre-tokenizer classes: letter runs, digit runs, single
# non-alphanumeric marks. Counts approximate BPE token counts well enough
# for corpus budgeting without a vocabulary.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_counts(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Corpus token budgeting: → (doc_id, ws_tokens, bpe_tokens).
    ``ws_tokens`` = whitespace split count; ``bpe_tokens`` = BPE-ish
    pre-tokenizer match count (BPE_TOKEN_RE). Native regexp — JVM-side,
    one scan, no Python."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(_tokens(text_col)).alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_TOKEN_RE), 0)).alias(
            "bpe_tokens"
        ),
    )


def fingerprint(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Normalized-content fingerprint: md5 of lowercased, whitespace-collapsed
    text. → (doc_id, fingerprint). The canonical key for fuzzy-exact dedup."""
    norm = F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.md5(norm.cast("binary")).alias("fingerprint"),
    )
