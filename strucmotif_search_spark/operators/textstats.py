"""Text analysis operators: token counting, quality scoring, language ID,
document fingerprinting.  All pure Catalyst expressions (JVM, codegen) so
they run at scan speed and both Spark and an ANSI-SQL oracle can evaluate
identical formulas.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .. import TOKEN_PATTERN
from . import spread

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


def repetition_signals(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher/C4-style repetition-quality signals per document:

      dup_line_frac      — fraction of (trimmed, non-empty) lines that are
                           repeats of another line in the same doc;
      dup_line_char_frac — fraction of line characters living in those
                           repeated copies (chars - distinct-line chars);
      top_2gram_frac     — fraction of token characters covered by the most
                           frequent token 2-gram (ties: gram ascending).

    Line signals are pure per-row Catalyst array expressions (scan speed,
    no shuffle).  The 2-gram mode needs a per-(doc, gram) count: explode ->
    two-level hash agg -> max_by, the same distributed shape as the SPIMI
    term count (A1) — at 100 TB this shuffles one narrow row per token,
    never text.  Repetition thresholds are the standard LLM-corpus quality
    gate (Gopher table A1); the reference's analogous scan-time quality
    predicate is its residue pLDDT filter (config/StrucmotifConfig.java:
    75-79).
    """
    docs = spread(docs)
    t = F.col(text_col)
    lines = F.filter(
        F.transform(F.split(t, "\n"), F.trim), lambda x: x != ""
    )
    nd = F.size(F.array_distinct(lines))
    n = F.size(lines)
    chars = F.aggregate(
        lines, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    chars_d = F.aggregate(
        F.array_distinct(lines),
        F.lit(0).cast("long"),
        lambda acc, x: acc + F.length(x),
    )
    line_sig = docs.select(
        "doc_id",
        F.round(
            F.when(n > 0, (n - nd) / n).otherwise(F.lit(0.0)), 6
        ).alias("dup_line_frac"),
        F.round(
            F.when(chars > 0, (chars - chars_d) / chars).otherwise(F.lit(0.0)),
            6,
        ).alias("dup_line_char_frac"),
    )

    toks = F.regexp_extract_all(t, F.lit(TOKEN_PATTERN), 0)
    tok_chars = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    grams = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    gram_rows = docs.select(
        "doc_id", tok_chars.alias("tok_chars"), F.explode(grams).alias("gram")
    )
    gram_counts = gram_rows.groupBy("doc_id", "tok_chars", "gram").agg(
        F.count("*").alias("cnt")
    )
    # most frequent gram per doc; covered chars = cnt * (gram chars minus
    # the separator space).  min_by on (-cnt, gram) = deterministic mode.
    top = gram_counts.groupBy("doc_id").agg(
        F.min_by(
            F.struct(
                F.col("cnt"),
                (F.length("gram") - 1).alias("glen"),
                F.col("tok_chars"),
            ),
            F.struct((-F.col("cnt")).alias("neg"), F.col("gram")),
        ).alias("m")
    ).select(
        "doc_id",
        F.round(
            F.when(
                F.col("m.tok_chars") > 0,
                F.col("m.cnt") * F.col("m.glen") / F.col("m.tok_chars"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("top_2gram_frac"),
    )
    return (
        line_sig.join(top, "doc_id", "left")
        .withColumn(
            "top_2gram_frac", F.coalesce("top_2gram_frac", F.lit(0.0))
        )
    )


def collocations(
    docs: DataFrame,
    min_count: int = 5,
    top: int = 20,
    text_col: str = "text",
    materialize: bool = True,
) -> DataFrame:
    """Corpus-level bigram collocations ranked by pointwise mutual
    information: ``(gram, n_ab, pmi)``, the ``top`` bigrams with at least
    ``min_count`` occurrences, ordered by (pmi desc, gram asc).

    PMI is computed over the joint distribution of ADJACENT PAIRS:
    p(a,b) = n_ab / T, with left/right marginals p_l(a) = sum_b n_ab / T and
    p_r(b) = sum_a n_ab / T, over casefolded tokens of the frozen
    TOKEN_PATTERN rule; pmi = ln(p(a,b) / (p_l(a) * p_r(b))).  The classic
    collocation statistic (Church & Hanks 1990) with self-consistent
    marginals; a building block for tokenizer-vocabulary and boilerplate
    analysis over training corpora.

    Scale notes: exactly ONE pass over the corpus — bigrams explode to
    fixed-width (a, b) rows and aggregate with map-side combine; the
    marginals and the total are aggregations of the RESULTING count table
    (vocabulary-sized), never a second corpus scan, and they join back onto
    the min_count survivors via broadcast.  Final top-k is a
    TakeOrderedAndProject, not a global sort.  pmi ties break gram-ascending
    on the 6dp-rounded value so the ordering is engine-portable.
    """
    t = F.lower(F.col(text_col))
    toks = docs.select(
        F.regexp_extract_all(t, F.lit(TOKEN_PATTERN), 0).alias("toks")
    )
    grams = toks.select(
        F.explode(
            F.when(
                F.size("toks") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("toks") - 1),
                    lambda i: F.struct(
                        F.element_at("toks", i).alias("a"),
                        F.element_at("toks", i + 1).alias("b"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
        ).alias("g")
    ).select("g.a", "g.b")
    # the one corpus aggregation; everything below reads this table only.
    # persist: three downstream aggs (marginals, total, survivors) must not
    # re-run the corpus scan.  materialize=False skips persist+checkpoint
    # and returns the pure lazy plan (plan inspection / caller-managed
    # caching) at the cost of re-scanning per downstream agg.
    bi_all = grams.groupBy("a", "b").agg(F.count("*").alias("n_ab"))
    if materialize:
        bi_all = bi_all.persist()
    try:
        left = bi_all.groupBy("a").agg(F.sum("n_ab").alias("n_a"))
        right = bi_all.groupBy("b").agg(F.sum("n_ab").alias("n_b"))
        total = bi_all.agg(F.sum("n_ab").alias("t_bi"))
        # no broadcast hints on purpose: the min_count survivor table is
        # NOT generically small (bigram types with count >= 5 can vastly
        # outnumber the unigram vocabulary under Zipf), and the marginals
        # are vocab-sized — let AQE pick broadcast vs shuffle join from
        # measured sizes; all joined relations are fixed-width count rows,
        # never text
        surv = bi_all.where(F.col("n_ab") >= min_count)
        s1 = left.join(surv, on="a")
        scored = (
            right.join(s1, on="b")
            .crossJoin(F.broadcast(total))
            .select(
                F.concat_ws(" ", "a", "b").alias("gram"),
                "n_ab",
                F.round(
                    F.log(
                        (F.col("n_ab") / F.col("t_bi"))
                        / (
                            (F.col("n_a") / F.col("t_bi"))
                            * (F.col("n_b") / F.col("t_bi"))
                        )
                    ),
                    6,
                ).alias("pmi"),
            )
        )
        out = scored.orderBy(F.col("pmi").desc(), F.col("gram").asc()).limit(top)
        if not materialize:
            return out
        # materialize before unpersisting the upstream count table
        return out.localCheckpoint()
    finally:
        if materialize:
            bi_all.unpersist()


def lm_score(
    docs: DataFrame, text_col: str = "text", materialize: bool = True
) -> DataFrame:
    """CCNet-style statistical-LM quality score: train a corpus bigram
    language model (casefolded tokens, add-one smoothing) and score every
    document by its mean bigram log-probability.

      P(b | a) = (n_ab + 1) / (n_a + V)
      lm_logprob(doc) = avg over the doc's bigram OCCURRENCES of ln P(b|a)

    with ``n_ab`` the corpus count of adjacent pair (a,b), ``n_a`` its left
    marginal and ``V`` the corpus unigram vocabulary size.  Returns
    ``(doc_id, n_bigrams, lm_logprob)`` — ``lm_logprob`` rounded to 4 dp
    (engine-portable, same policy as the BM25 gates), 0.0 sentinel for docs
    with fewer than two tokens.  Low scores mark statistically anomalous
    text (binary junk, boilerplate soup) — the perplexity-bucket filter of
    CCNet (Wenzek et al. 2020) with the KenLM swapped for a corpus-trained
    bigram model so the whole pipeline stays declarative and
    oracle-replayable.

    Scale shape: pass 1 trains the model — bigram explode to fixed-width
    (a, b) rows, one hash agg with map-side combine; the marginal and V are
    aggregations of the RESULTING count table (vocab-sized, persisted via
    ``materialize``), not second corpus scans.  Pass 2 re-explodes the
    corpus and probes the model — a shuffle hash join on gram keys (the
    model side is Zipf-long-tailed, so no broadcast hint; AQE decides), a
    scalar cross-join for V, then one per-doc agg.  Nothing per-row Python,
    nothing collected to the driver.
    """
    docs = spread(docs)
    toks = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(TOKEN_PATTERN), 0
    )
    tok_df = docs.select("doc_id", toks.alias("toks"))
    grams = tok_df.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("toks") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("toks") - 1),
                    lambda i: F.struct(
                        F.element_at("toks", i).alias("a"),
                        F.element_at("toks", i + 1).alias("b"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
        ).alias("g"),
    ).select("doc_id", "g.a", "g.b")

    counts = grams.groupBy("a", "b").agg(F.count("*").alias("n_ab"))
    if materialize:
        counts = counts.persist()
    try:
        marginal = counts.groupBy("a").agg(F.sum("n_ab").alias("n_a"))
        vocab = tok_df.select(F.explode("toks").alias("t")).agg(
            F.count_distinct("t").alias("v")
        )
        scored = (
            grams.join(counts, on=["a", "b"])
            .join(marginal, on="a")
            .crossJoin(F.broadcast(vocab))
            .groupBy("doc_id")
            .agg(
                F.count("*").alias("n_bigrams"),
                F.round(
                    F.avg(
                        F.log(
                            (F.col("n_ab") + F.lit(1.0))
                            / (F.col("n_a") + F.col("v"))
                        )
                    ),
                    4,
                ).alias("lm_logprob"),
            )
        )
        out = (
            docs.select("doc_id")
            .join(scored, on="doc_id", how="left")
            .select(
                "doc_id",
                F.coalesce("n_bigrams", F.lit(0)).cast("long").alias(
                    "n_bigrams"
                ),
                F.coalesce("lm_logprob", F.lit(0.0)).alias("lm_logprob"),
            )
        )
        if not materialize:
            return out
        return out.localCheckpoint()
    finally:
        if materialize:
            counts.unpersist()
