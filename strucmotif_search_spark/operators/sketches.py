"""Distributed sketches for corpus statistics at 100-TB scale.

Two families, both following this repo's sketch discipline — the sketch is
the SCALE path (bounded executor memory, bounded shuffle width) and every
gated output is EXACT:

- **HyperLogLog registers** (`hll_registers`): the sketch itself is
  deterministic integer arithmetic on md5 digests, so the full register
  table is bit-for-bit replayable by an ANSI-SQL oracle.  Merging registers
  across partitions is a ``max`` — the canonical commutative-monoid sketch
  merge, which is exactly what Spark's partial aggregation does for free.
- **Misra-Gries heavy hitters** (`heavy_hitters`): a bounded-memory
  candidate sketch per partition, then an exact verification pass over the
  candidates only — the same candidates+verify shape as the dedup family
  (`dedup.minhash_lsh_pairs`), so the OUTPUT is provably exact while no
  stage ever holds the full vocabulary.

Reference analogue: the reference derives global occurrence statistics
(its informativeness table, ResiduePairOccurrence.java:230-463) from index
counts rather than rescanning structures — same spirit: corpus-scale
statistics without corpus-scale state (SURVEY §2 A7).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .. import TOKEN_PATTERN

# remainder width in bits: 10 hex chars of the md5 after the bucket prefix.
# 40 bits keeps every intermediate in exact int64 range in BOTH engines
# (Spark conv() and DuckDB ('0x'||...)::BIGINT are verified bit-equal — see
# __spark_entry__ winnowing replay note) and caps rho at 41, far past the
# ~2^40 distinct-values regime where a 40-bit remainder saturates.
_REM_BITS = 40
_REM_HEX = _REM_BITS // 4


def _rho_expr(rem: Column) -> Column:
    """Position of the leftmost 1-bit in a ``_REM_BITS``-wide integer, 1-based
    from the left; ``_REM_BITS + 1`` for zero.  Exact integer math via the
    binary-string length (``bin`` drops leading zeros in both engines):
    leading_zeros = W - length(bin(x)), rho = leading_zeros + 1."""
    return (
        F.when(rem == 0, F.lit(_REM_BITS + 1))
        .otherwise(F.lit(_REM_BITS + 1) - F.length(F.bin(rem)))
        .cast("int")
    )


def hll_registers(values: DataFrame, col: str, p: int = 8) -> DataFrame:
    """HyperLogLog register table for the distinct count of ``values[col]``:
    one row per register, ``(register, max_rho)``, ``m = 2**p`` rows total
    (absent buckets emitted with ``max_rho = 0``).

    ``p`` must be a multiple of 4 (the bucket is a clean hex prefix of the
    md5, keeping the whole sketch replayable in ANSI SQL: bucket =
    first ``p/4`` hex chars, remainder = next 10 hex chars).

    Scale shape: ONE pass over the values — a Project computing (register,
    rho) per row, then a hash aggregate with map-side partial ``max``; the
    shuffle carries at most ``m`` fixed-width rows PER TASK regardless of
    input size, and the final table is ``m`` rows.  This is the estimator
    to reach for when exact ``count_distinct`` would shuffle the full key
    set (URLs, shingles, user ids at 100 TB).  Registers from disjoint
    corpora merge by element-wise max, so incremental generations can keep
    sketches additive.  Use :func:`hll_estimate` to turn the table into a
    cardinality.
    """
    if p % 4 != 0 or not 4 <= p <= 16:
        raise ValueError("p must be a multiple of 4 in [4, 16]")
    m = 1 << p
    hex_chars = p // 4
    h = F.md5(F.col(col).cast("string"))
    bucket = F.conv(F.substring(h, 1, hex_chars), 16, 10).cast("int")
    rem = F.conv(
        F.substring(h, hex_chars + 1, _REM_HEX), 16, 10
    ).cast("long")
    regs = (
        values.select(bucket.alias("register"), _rho_expr(rem).alias("rho"))
        .groupBy("register")
        .agg(F.max("rho").alias("max_rho"))
    )
    all_regs = (
        values.sparkSession.range(m)
        .select(F.col("id").cast("int").alias("register"))
    )
    return (
        all_regs.join(regs, on="register", how="left")
        .select(
            F.col("register").cast("long").alias("register"),
            F.coalesce("max_rho", F.lit(0)).cast("long").alias("max_rho"),
        )
    )


def hll_estimate(registers: DataFrame) -> float:
    """Cardinality estimate from a :func:`hll_registers` table (the
    Flajolet et al. 2007 estimator with the small-range linear-counting
    correction).  Collects exactly ``m`` rows — sketch-sized, never
    data-sized."""
    import math

    rows = registers.collect()
    m = len(rows)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    s = sum(2.0 ** -int(r["max_rho"]) for r in rows)
    est = alpha * m * m / s
    zeros = sum(1 for r in rows if int(r["max_rho"]) == 0)
    if est <= 2.5 * m and zeros:
        est = m * math.log(m / zeros)
    return float(est)


def token_values(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Explode ``docs[text_col]`` into one row per token occurrence under
    the frozen TOKEN_PATTERN rule (case-sensitive — the index convention):
    column ``t``."""
    return docs.select(
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_PATTERN), 0)
        ).alias("t")
    )


def heavy_hitters(docs: DataFrame, k: int = 50, text_col: str = "text") -> DataFrame:
    """EXACT heavy hitters of the token stream: every term whose total
    occurrence count ``n`` satisfies ``n * (k + 1) > total_tokens``
    (the Misra-Gries frequency threshold), with its exact count —
    ``(term, n)``.

    Two passes, neither of which ever materializes the full vocabulary:

    1. **Candidate sketch** — per input partition, a Misra-Gries summary of
       capacity ``k`` maintained over Arrow batches (each batch is counted
       vectorized via ``value_counts``, merged as weighted increments, then
       trimmed by the standard decrement step: subtract the excess-th
       smallest count from every counter and drop the non-positive).  MG
       guarantees any term with partition count > n_p/(k+1) survives its
       partition's summary; by pigeonhole a term with GLOBAL count
       > n/(k+1) exceeds that threshold in at least one partition — so the
       union of summaries is a SUPERSET of the true heavy set.  Each task
       emits ≤ k candidate rows plus one token-total row: fixed memory,
       fixed output, regardless of corpus size.
    2. **Exact verify** — re-scan the token stream filtered to the
       broadcast candidate set (≤ k·partitions terms), count exactly, keep
       ``n * (k+1) > total``.  The count agg touches only candidate rows;
       the threshold comparison is pure integer math, so the result is
       exact and SQL-replayable.

    The one driver-side value is the scalar token total (same class as the
    DAAT phase collects).  At 100 TB: pass 1 is map-only + a k·P-row
    shuffle; pass 2 is a scan with a broadcast semi-join and a ≤ k·P-key
    aggregate — no full-vocabulary shuffle anywhere (contrast a plain
    ``GROUP BY term``, which shuffles every distinct term).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    toks = token_values(docs, text_col)

    def mg(batches):
        import pandas as pd

        summary: dict[str, int] = {}
        total = 0
        for pdf in batches:
            total += len(pdf)
            for t, c in pdf["t"].value_counts().items():
                summary[t] = summary.get(t, 0) + int(c)
            excess = len(summary) - k
            if excess > 0:
                d = sorted(summary.values())[excess - 1]
                summary = {t: c - d for t, c in summary.items() if c > d}
        out = pd.DataFrame(
            {
                "t": list(summary.keys()) + [""],
                "n": [int(c) for c in summary.values()] + [total],
                "is_total": [False] * len(summary) + [True],
            }
        )
        yield out

    sketch = toks.mapInPandas(
        mg, schema="t string, n long, is_total boolean"
    ).localCheckpoint()  # tiny (<= (k+1) rows per task); scan once, reuse
    total_row = sketch.where("is_total").agg(F.sum("n").alias("s")).first()
    total = int(total_row["s"] or 0)
    cands = sketch.where(~F.col("is_total")).select("t").distinct()
    counts = (
        toks.join(F.broadcast(cands), on="t")
        .groupBy("t")
        .agg(F.count("*").alias("n"))
    )
    return counts.where(F.col("n") * (k + 1) > F.lit(total)).select(
        F.col("t").alias("term"), F.col("n").cast("long").alias("n")
    )


def cms_table(
    values: DataFrame, col: str, depth: int = 4, width_bits: int = 12
) -> DataFrame:
    """Count-min sketch table over a value stream: ``(hash_row, bucket, cnt)``,
    ``depth`` independent hash rows of ``2**width_bits`` buckets each
    (absent buckets are zero and not emitted — counts merge additively, so
    sparse emission is lossless).

    Like :func:`hll_registers`, the sketch is deterministic integer
    arithmetic on md5 digests (hash row ``d`` hashes ``md5(d || '|' || value)``,
    bucket = first 8 hex chars mod width), so the WHOLE table is bit-for-bit
    replayable by an ANSI-SQL oracle — the repo's sketch discipline: sketch
    for scale, exact replay for correctness.

    Scale shape: one pass — per input row an ``explode`` of ``depth``
    precomputed (row, bucket) pairs, then a hash aggregate with map-side
    partial sums; the shuffle carries at most ``depth * 2**width_bits``
    fixed-width rows per task regardless of input size.  Point estimates
    (:func:`cms_estimate`) read ``depth`` rows per query term; sketches of
    disjoint corpora merge by elementwise sum (additive monoid), so
    incremental generations keep sketches additive exactly like HLL's max.
    """
    if not 1 <= depth <= 16:
        raise ValueError("depth must be in [1, 16]")
    if not 4 <= width_bits <= 24:
        raise ValueError("width_bits must be in [4, 24]")
    width = 1 << width_bits
    pairs = F.array(
        *[
            F.struct(
                F.lit(d).alias("hash_row"),
                (
                    F.conv(
                        F.substring(
                            F.md5(
                                F.concat(
                                    F.lit(str(d)),
                                    F.lit("|"),
                                    F.col(col).cast("string"),
                                )
                            ),
                            1,
                            8,
                        ),
                        16,
                        10,
                    ).cast("long")
                    % width
                ).alias("bucket"),
            )
            for d in range(depth)
        ]
    )
    return (
        values.select(F.explode(pairs).alias("p"))
        .select(
            F.col("p.hash_row").alias("hash_row"),
            F.col("p.bucket").alias("bucket"),
        )
        .groupBy("hash_row", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(
    cms: DataFrame, terms: list[str], depth: int = 4, width_bits: int = 12
) -> dict[str, int]:
    """Point-frequency estimates from a :func:`cms_table`: for each term,
    the MIN over its ``depth`` bucket counters — the classic CMS upper
    bound (never under-counts; over-counts only by collision mass).  Reads
    ``depth * len(terms)`` sketch rows via a pushed-down filter; driver
    work is dictionary-sized."""
    import hashlib

    width = 1 << width_bits
    want: dict[tuple[int, int], list[str]] = {}
    for t in terms:
        for d in range(depth):
            h = hashlib.md5(f"{d}|{t}".encode()).hexdigest()
            want.setdefault((d, int(h[:8], 16) % width), []).append(t)
    keys = list(want)
    if not keys:  # no terms -> nothing to probe (where(None) would throw)
        return {}
    cond = None
    for d, b in keys:
        c = (F.col("hash_row") == d) & (F.col("bucket") == b)
        cond = c if cond is None else (cond | c)
    counts = {
        (int(r["hash_row"]), int(r["bucket"])): int(r["cnt"])
        for r in cms.where(cond).collect()
    }
    out: dict[str, int] = {}
    for t in terms:
        mins = []
        for d in range(depth):
            h = hashlib.md5(f"{d}|{t}".encode()).hexdigest()
            mins.append(counts.get((d, int(h[:8], 16) % width), 0))
        out[t] = min(mins)
    return out
