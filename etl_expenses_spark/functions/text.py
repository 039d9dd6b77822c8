"""Text-analysis expressions for the LLM-data-pipeline surface.

Beyond the reference's own string functions (SURVEY.md §2.9), these are the
north-star text operators (BASELINE.json): token counting, quality scoring,
n-gram-heuristic language ID, and rolling-hash fingerprinting — all pure
Column expressions so they run JVM-side inside whole-stage codegen across
any number of executors. Every expression here is written to have an exact
ANSI-SQL twin (see plans/) so the DuckDB oracle can verify it bit-for-bit:
integer arithmetic only where accumulation order could matter.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(col: Column | str) -> Column:
    """Whitespace tokens, empties dropped (array<string>)."""
    return F.filter(F.split(F.trim(_c(col)), r"\s+"), lambda t: t != "")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col)).cast("long")


# GPT-2-style pre-tokenizer shape, simplified to the lookahead-free subset
# both Java regex (Spark) and RE2 (DuckDB) evaluate identically:
# contraction suffixes | space?-letters | space?-digits | space?-symbols.
BPE_ISH_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def bpe_ish_token_count(col: Column | str) -> Column:
    """Subword-style token count — the cheap estimator of LLM token cost a
    training pipeline budgets with (vs whitespace words, which undercount
    punctuation-heavy and contraction-heavy text)."""
    return F.regexp_count(_c(col), F.lit(BPE_ISH_RE)).cast("long")


def punct_count(col: Column | str) -> Column:
    """Count of .,;:!?"'()- characters. Explicit class (not [[:punct:]]) so
    Java-regex and RE2-based engines agree."""
    return F.regexp_count(_c(col), F.lit(r"""[.,;:!?"'()\-]""")).cast("long")


def punct_ratio(col: Column | str) -> Column:
    c = _c(col)
    return punct_count(c).cast("double") / F.greatest(F.length(c), F.lit(1)).cast("double")


# Tiny fixed stopword lists — a deterministic n-gram-style heuristic, not a
# model. Word-boundary regex keeps both engines' counts identical.
_EN_STOPWORDS = ("the", "and", "of", "to", "a", "in", "is", "for", "with", "on")
_ES_STOPWORDS = ("el", "la", "de", "que", "y", "en", "un", "por", "con", "para")


def _stopword_regex(words: tuple[str, ...]) -> str:
    return r"\b(" + "|".join(words) + r")\b"


def stopword_hits(col: Column | str, words: tuple[str, ...] = _EN_STOPWORDS) -> Column:
    return F.regexp_count(F.lower(_c(col)), F.lit(_stopword_regex(words))).cast("long")


def quality_score(col: Column | str) -> Column:
    """Heuristic doc-quality score in [0,1]: rewards mid-length docs, real
    word structure (avg token length 3-12), and penalizes punctuation soup.
    Deterministic double arithmetic (no aggregation order involved)."""
    c = _c(col)
    n_tok = token_count(c).cast("double")
    n_chr = F.greatest(F.length(c), F.lit(1)).cast("double")
    avg_tok_len = n_chr / F.greatest(n_tok, F.lit(1).cast("double"))
    len_component = F.least(n_tok / F.lit(64.0), F.lit(1.0))
    shape_component = F.when((avg_tok_len >= 3.0) & (avg_tok_len <= 12.0), F.lit(1.0)).otherwise(
        F.lit(0.5)
    )
    punct_component = F.lit(1.0) - F.least(
        punct_count(c).cast("double") / n_chr * F.lit(4.0), F.lit(1.0)
    )
    return len_component * F.lit(0.4) + shape_component * F.lit(0.3) + punct_component * F.lit(0.3)


def lang_id(col: Column | str) -> Column:
    """'en' vs 'es' vs 'unk' by stopword-hit majority."""
    c = _c(col)
    en = stopword_hits(c, _EN_STOPWORDS)
    es = stopword_hits(c, _ES_STOPWORDS)
    return (
        F.when((en > es) & (en > 0), F.lit("en"))
        .when((es > en) & (es > 0), F.lit("es"))
        .otherwise(F.lit("unk"))
    )


# Rolling-hash fingerprint: polynomial hash h = (h*31 + ascii(ch)) mod p over
# the document's characters, folded left-to-right. Integer arithmetic →
# bit-identical across engines; expressible in DuckDB via list_reduce.
_FP_MOD = 1_000_000_007


def rolling_hash(col: Column | str, mod: int = _FP_MOD) -> Column:
    chars = F.filter(F.split(_c(col), ""), lambda c: c != "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * F.lit(31) + F.ascii(ch)) % F.lit(mod),
    )
