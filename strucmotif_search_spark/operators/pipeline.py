"""Composed training-data corpus-prep pipeline.

The individual quality / dedup / repetition operators in this package are
each a single decision signal; a real pretraining-data pipeline runs them
as one DAG with a fixed precedence and emits an auditable per-document
decision record (what was kept, what was dropped, and WHY — the reason
breakdown is what you tune the thresholds against).  This module is that
composition, expressed as one Catalyst plan.  The text column is scanned
by each independent signal projection (the scalar signals fuse into one
select; the repetition signals need their own explode-shaped projections —
three text scans total, joined on doc_id).  At the 100 TB design point the
right mitigation is persisting the NARROW signal frames (fixed-width
doc_id + signal columns) or materializing the decision record once and
tuning thresholds against it — the text column itself never shuffles in
any stage, which is the invariant that actually matters at scale.

Reference analogue: the reference chains its scan-time admission filters
the same way — residue pLDDT quality gate, then descriptor admission,
then per-structure dedup of identical assemblies — before anything hits
the index writer (config/StrucmotifConfig.java:75-79,
io/DefaultStructureWriter.java).  Here the stages are the standard LLM
corpus gates (Gopher table A1 / C4):

  1. too_short    — n_tokens < min_tokens
  2. low_quality  — quality score < min_quality
  3. repetition   — dup_line_frac or top_2gram_frac above cap
  4. exact_dup    — same normalized-token fingerprint as a LOWER-id doc
                    that itself survived stages 1-3 (keep-first rule)

Precedence is the list order: a document reports the FIRST reason that
fires, so reason counts are disjoint and sum to the drop total.

Scale shape (100 TB): stages 1-3 are pure per-row Catalyst expressions —
map-only, whole-stage-codegen, no Python.  Stage 4 plus the repetition
2-gram mode are the only shuffles: one narrow-row exchange per token
2-gram (same shape as the SPIMI term count) and one hash aggregation on
the 128-bit fingerprint (uniformly distributed by construction, no skew).
The decision join back to documents is on doc_id, co-partitioned with the
fingerprint agg's output by AQE.  Nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import (
    fingerprint_expr,
    quality_score_expr,
    repetition_signals,
    token_count_expr,
)


def corpus_prep(
    docs: DataFrame,
    *,
    min_tokens: int = 12,
    min_quality: float = 0.63,
    max_dup_line_frac: float = 0.3,
    max_top_2gram_frac: float = 0.5,
    text_col: str = "text",
) -> DataFrame:
    """Per-document corpus-prep decision record.

    Returns one row per input document:
    ``(doc_id, keep, drop_reason, n_tokens, quality)`` with ``drop_reason``
    in {'too_short','low_quality','repetition','exact_dup'} or NULL when
    kept, and ``quality`` rounded to 6 dp for presentation.

    The exact-dup stage canonicalizes by the *normalized token stream*
    fingerprint (:func:`fingerprint_expr` — casefolded, whitespace/punct
    insensitive), computed only over documents that survived the earlier
    gates: a low-quality copy never claims canonical status over a clean
    one.  Near-dup stages (MinHash/SimHash/SemDeDup) chain after this by
    anti-joining their pair output against the survivors — see
    dedup.minhash_lsh_pairs / similarity.semantic_dedup.
    """
    from . import spread

    docs = spread(docs)
    t = F.col(text_col)
    sig = docs.select(
        "doc_id",
        token_count_expr(t).alias("n_tokens"),
        quality_score_expr(t).alias("quality"),
        fingerprint_expr(t).alias("fp"),
    ).join(repetition_signals(docs, text_col=text_col), on="doc_id")

    early: Column = (
        F.when(F.col("n_tokens") < min_tokens, F.lit("too_short"))
        .when(F.col("quality") < min_quality, F.lit("low_quality"))
        .when(
            (F.col("dup_line_frac") > max_dup_line_frac)
            | (F.col("top_2gram_frac") > max_top_2gram_frac),
            F.lit("repetition"),
        )
    )
    staged = sig.withColumn("early_reason", early)

    canon = (
        staged.where(F.col("early_reason").isNull())
        .groupBy("fp")
        .agg(F.min("doc_id").alias("canonical_id"))
    )
    decided = staged.join(canon, on="fp", how="left").select(
        "doc_id",
        F.coalesce(
            F.col("early_reason"),
            F.when(F.col("doc_id") != F.col("canonical_id"), "exact_dup"),
        ).alias("drop_reason"),
        "n_tokens",
        F.round("quality", 6).alias("quality"),
    )
    return decided.select(
        "doc_id",
        F.col("drop_reason").isNull().alias("keep"),
        "drop_reason",
        "n_tokens",
        "quality",
    )


def prep_summary(decisions: DataFrame) -> DataFrame:
    """Aggregate audit of a :func:`corpus_prep` run: one row per outcome
    (kept / each drop reason) with document count and token mass — the
    table a pipeline owner reads before committing thresholds."""
    return (
        decisions.groupBy(
            F.coalesce(F.col("drop_reason"), F.lit("kept")).alias("outcome")
        )
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
        .orderBy("outcome")
    )


def near_dedup(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """Near-duplicate survivor policy: ``(doc_id, cluster_id, keep)``.

    Closes the near-dup PAIR relation (from minhash_lsh_pairs /
    simhash_near_pairs / winnow_overlap_pairs / semantic_dedup) into
    clusters via :func:`dedup.connected_components` and keeps exactly the
    minimum doc_id of each cluster; documents in no pair are their own
    cluster and are kept.  This is the correct keep-one-per-group step —
    dropping the max of each raw pair both over-deletes (A~B, A~C would
    drop B AND C even if B~C are unrelated revisions of A) and
    under-deletes (chains) because pair relations are not transitive.

    Scale shape: the CC runs on the pair graph only (orders of magnitude
    smaller than the corpus); the survivors join back to documents on
    doc_id as one broadcast-or-shuffle hash join of (doc_id, cluster_id)
    rows, never the text.
    """
    from .dedup import connected_components

    cc = connected_components(pairs)
    return docs.select("doc_id").join(cc, on="doc_id", how="left").select(
        "doc_id",
        F.coalesce("cluster_id", "doc_id").alias("cluster_id"),
        (F.coalesce("cluster_id", "doc_id") == F.col("doc_id")).alias("keep"),
    )


def sample_stratified(
    docs: DataFrame,
    rates: dict[str, float],
    strata_col: str,
    key_col: str = "doc_id",
    default_rate: float = 0.0,
    seed: int = 0,
) -> DataFrame:
    """Deterministic per-stratum Bernoulli sample — the data-mixing step of
    a training-pipeline (up/down-weight sources or languages to a recipe).

    A row survives iff ``hash40(seed|key) < floor(rate[stratum] * 2^40)``
    with the portable md5-prefix hash, so the decision is a pure row
    expression: reproducible across engines and runs, stable under
    repartitioning (unlike ``DataFrame.sample``, whose draw depends on the
    partitioning), and independent per key.  Strata absent from ``rates``
    get ``default_rate``.

    Scale shape: map-only — no shuffle, no RNG state; the recipe compiles
    into one CASE expression (recipes are human-sized).  Filter pushes down
    to the scan when ``strata_col`` is a partition column.
    """
    from .dedup import _md5_int

    h = _md5_int(
        F.concat_ws("|", F.lit(str(seed)), F.col(key_col).cast("string")),
        hex_chars=10,
    )
    expr: Column = F.lit(int(default_rate * (1 << 40)))
    for stratum, rate in sorted(rates.items()):
        expr = F.when(
            F.col(strata_col) == stratum, F.lit(int(rate * (1 << 40)))
        ).otherwise(expr)
    return docs.where(h < expr)


def pack_sequences(
    docs: DataFrame,
    budget: int = 2048,
    part_col: str = "lang",
    order_col: str = "doc_id",
    text_col: str = "text",
    bucket: int = 4096,
) -> DataFrame:
    """Training-sequence packing map: concatenate each ``part_col`` group's
    documents in ``order_col`` order into one token stream and chunk it at
    exact ``budget``-token boundaries (the GPT-2/LLaMA concat-then-chunk
    packing recipe).  Emits one row per document:

      (doc_id, <part_col>, n_tokens, start_off, seq_first, seq_last)

    where ``start_off`` is the document's global token offset within its
    group's stream, and ``seq_first``/``seq_last`` are the ids of the fixed-
    size training sequences its first/last token land in (a doc crossing a
    boundary spans ``seq_last - seq_first + 1`` sequences; empty docs carry
    ``seq_first == seq_last`` at their offset).  Token counts use the frozen
    TOKEN_PATTERN rule (textstats.token_count_expr).

    Scale shape — the prefix sum is TWO-LEVEL, never one global window: a
    single window partitioned only by ``part_col`` would funnel each
    language's entire corpus through one task.  Instead documents land in
    contiguous ``order_col`` ranges of width ``bucket``; level 1 windows
    inside (group, bucket) — bounded partitions regardless of corpus size —
    and level 2 prefix-sums the per-bucket TOTALS (corpus_size/bucket rows,
    one narrow row each) and joins the bucket base offsets back.  At 10^12
    docs the bucket-total table is ~10^8 rows; apply the same two-level
    split recursively if even that window ever dominates.  Everything is
    fixed-width (ids + counts) — text never shuffles.

    Cost note: the ``tok`` projection feeds two consumers (the level-1
    window and the bucket totals), so Catalyst evaluates the tokenize scan
    twice unless the exchange is reused.  If the double tokenize ever
    dominates, persist the narrow ``tok`` frame (doc_id/part/n_tokens/_bkt
    — fixed-width) upstream and pass it in via ``text_col``-precomputed
    counts; the packing math itself is unchanged.
    """
    from pyspark.sql import Window

    tok = docs.select(
        F.col(order_col),
        F.col(part_col),
        token_count_expr(F.col(text_col)).alias("n_tokens"),
        F.floor(F.col(order_col) / bucket).alias("_bkt"),
    )
    w_local = (
        Window.partitionBy(part_col, "_bkt")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = tok.withColumn(
        "_local_off", F.coalesce(F.sum("n_tokens").over(w_local), F.lit(0))
    )
    totals = tok.groupBy(part_col, "_bkt").agg(
        F.sum("n_tokens").alias("_bkt_total")
    )
    w_bkt = (
        Window.partitionBy(part_col)
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bases = totals.withColumn(
        "_bkt_base", F.coalesce(F.sum("_bkt_total").over(w_bkt), F.lit(0))
    ).select(part_col, "_bkt", "_bkt_base")
    start = F.col("_bkt_base") + F.col("_local_off")
    # no broadcast hint: bucket-base rows are corpus_size/bucket — tiny for
    # any realistic corpus but NOT provably driver-sized at 10^12 docs; AQE
    # picks broadcast from the measured size (same policy as collocations)
    return (
        local.join(bases, on=[part_col, "_bkt"])
        .select(
            F.col(order_col),
            F.col(part_col),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            start.cast("long").alias("start_off"),
            F.floor(start / budget).cast("long").alias("seq_first"),
            F.floor(
                F.greatest(start, start + F.col("n_tokens") - 1) / budget
            ).cast("long").alias("seq_last"),
        )
    )


def remove_boilerplate_lines(
    docs: DataFrame,
    min_doc_frac: float | None = None,
    min_docs: int | None = 20,
    sep: str = "\n",
    min_line_chars: int = 1,
    content_col: str = "text",
    id_col: str = "doc_id",
    hash_key: bool = False,
) -> DataFrame:
    """C4-style boilerplate line removal: drop every line that occurs in
    too many DISTINCT documents (nav bars, license headers, cookie
    banners — the highest-leverage cleanup after whole-doc dedup in the
    C4/RefinedWeb recipes).  A line is boilerplate when it appears in
    >= ``min_docs`` documents, or >= ``min_doc_frac`` of the corpus when
    that is given instead; lines shorter than ``min_line_chars`` are never
    removed (empty/whitespace separators are structure, not boilerplate).

    Returns one row per input document: (id, clean text with surviving
    lines rejoined by ``sep`` in their original order, lines_removed,
    lines_kept).  Documents whose every line is boilerplate come back
    with empty text, not missing rows.

    Scale shape (100 TB): lines explode into narrow (id, pos, line) rows;
    the document-frequency count is one hash aggregation keyed by the
    line text — or, with ``hash_key=True`` (the production-scale setting),
    by ``xxhash64(line)``: the aggregation state and the broadcast
    anti-join key shrink from arbitrary-length strings to 8 bytes.  A
    64-bit collision would drop a NON-boilerplate line that hash-collides
    with a boilerplate one (P ~ n_boiler x n_lines / 2^64 — negligible,
    and conservative-direction: lines are only ever removed, never
    duplicated).  The boilerplate set is SMALL by construction — only
    lines repeated across >= min_docs documents survive the HAVING — so
    the anti-join broadcasts; the order-restoring reassembly is one
    groupBy(id) with an array_sort, shuffling only surviving narrow rows,
    never whole documents.
    """
    if (min_doc_frac is None) == (min_docs is None):
        raise ValueError("give exactly one of min_doc_frac / min_docs")
    if min_doc_frac is not None:
        n_docs = docs.count()
        min_docs = max(int(min_doc_frac * n_docs), 2)
    import re as _re

    # F.split takes a Java regex: escape so sep is always a literal
    lines = docs.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.col(content_col), _re.escape(sep), -1)
        ).alias("pos", "line"),
    )
    eligible = lines.where(F.length("line") >= min_line_chars)
    if hash_key:
        # 8-byte aggregation/join key for production scale (see docstring)
        boiler = (
            eligible.groupBy(F.xxhash64("line").alias("line_key"))
            .agg(F.count_distinct(id_col).alias("line_docs"))
            .where(F.col("line_docs") >= min_docs)
            .select("line_key")
        )
        kept = (
            lines.withColumn("line_key", F.xxhash64("line"))
            .join(F.broadcast(boiler), on="line_key", how="left_anti")
            .drop("line_key")
        )
    else:
        boiler = (
            eligible.groupBy("line")
            .agg(F.count_distinct(id_col).alias("line_docs"))
            .where(F.col("line_docs") >= min_docs)
            .select("line")
        )
        kept = lines.join(F.broadcast(boiler), on="line", how="left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda x: x["line"],
            ),
            sep,
        ).alias("text_clean"),
        F.count("*").alias("lines_kept"),
    )
    totals = lines.groupBy(id_col).agg(F.count("*").alias("_n_lines"))
    return (
        totals.join(rebuilt, on=id_col, how="left")
        .select(
            F.col(id_col),
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
            (
                F.col("_n_lines") - F.coalesce("lines_kept", F.lit(0))
            ).cast("long").alias("lines_removed"),
            F.coalesce("lines_kept", F.lit(0)).cast("long").alias(
                "lines_kept"
            ),
        )
    )
