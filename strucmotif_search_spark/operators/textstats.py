"""Text analysis operators: token counting, quality scoring, language ID,
document fingerprinting.  All pure Catalyst expressions (JVM, codegen) so
they run at scan speed and both Spark and an ANSI-SQL oracle can evaluate
identical formulas.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .. import TOKEN_PATTERN

# tiny per-language marker lexicons for the n-gram/stopword heuristic
LANG_MARKERS = {
    "en": ["the", "a", "of", "and", "is"],
    "py": ["def", "self", "import", "None", "elif"],
    "java": ["public", "void", "static", "final", "extends"],
    "js": ["function", "const", "var", "let", "=>"],
    "go": ["func", "package", "defer", "chan", "go"],
    "rs": ["fn", "impl", "mut", "trait", "pub"],
}


def token_count_expr(text: Column) -> Column:
    """Whitespace-free exact token count under the frozen rule."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_PATTERN), 0)).cast("long")


def quality_score_expr(text: Column) -> Column:
    """Deterministic quality score in [0,1]:
      0.4 * length_score   (saturating at 2000 chars)
    + 0.3 * alpha_ratio    (alphanumeric+space chars / all chars)
    + 0.3 * (1 - stop_ratio) (fraction of tokens that are 1-char noise)
    """
    length_score = F.least(F.length(text) / F.lit(2000.0), F.lit(1.0))
    n_alpha = F.length(F.regexp_replace(text, r"[^A-Za-z0-9 ]", ""))
    alpha_ratio = F.when(F.length(text) > 0, n_alpha / F.length(text)).otherwise(
        F.lit(0.0)
    )
    toks = F.regexp_extract_all(text, F.lit(TOKEN_PATTERN), 0)
    n_tok = F.size(toks)
    n_short = F.size(F.filter(toks, lambda t: F.length(t) <= 1))
    short_ratio = F.when(n_tok > 0, n_short / n_tok).otherwise(F.lit(1.0))
    return (
        F.lit(0.4) * length_score
        + F.lit(0.3) * alpha_ratio
        + F.lit(0.3) * (F.lit(1.0) - short_ratio)
    ).cast("double")


def lang_scores_expr(text: Column) -> dict[str, Column]:
    """Marker-hit count per language (exact word matches)."""
    toks = F.regexp_extract_all(text, F.lit(TOKEN_PATTERN), 0)
    out = {}
    for lang, markers in LANG_MARKERS.items():
        hits = F.size(
            F.filter(toks, lambda t: t.isin(markers))
        )
        out[lang] = hits.cast("long")
    return out


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, lang_pred, lang_hits) — argmax of marker-hit counts; ties
    broken by language name ascending (deterministic)."""
    scores = lang_scores_expr(F.col(text_col))
    pairs = F.array(
        *[
            F.struct(
                (-scores[lang]).alias("neg_hits"), F.lit(lang).alias("lang")
            )
            for lang in sorted(LANG_MARKERS)
        ]
    )
    best = F.array_sort(pairs)[0]
    return docs.select(
        "doc_id",
        best["lang"].alias("lang_pred"),
        (-best["neg_hits"]).cast("long").alias("lang_hits"),
    )


def fingerprint_expr(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized token stream
    (case-folded, single-space joined) — robust to whitespace/punct variance."""
    toks = F.regexp_extract_all(F.lower(text), F.lit(TOKEN_PATTERN), 0)
    return F.md5(F.concat_ws(" ", toks))


def text_profile(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass profile: (doc_id, n_tokens, n_chars, quality, fingerprint)."""
    t = F.col(text_col)
    return docs.select(
        "doc_id",
        token_count_expr(t).alias("n_tokens"),
        F.length(t).cast("long").alias("n_chars"),
        quality_score_expr(t).alias("quality"),
        fingerprint_expr(t).alias("fingerprint"),
    )
