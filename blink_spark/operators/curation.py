"""Corpus-curation operators: within-document repetition statistics
(Gopher-style quality signals) and benchmark decontamination
(n-gram-overlap flagging against an eval set).

Both are expressed as explode -> hash-keyed groupBy aggregations —
one linear shuffle per statistic family, no per-row quadratic work
and no Python in the hot path. Lines/grams shuffle under their md5
key (16-byte hex) rather than the raw string, so the shuffle payload
is bounded regardless of document size; md5 is used (not xxhash64)
because the DuckDB oracle can evaluate the identical key.

At 100 TB: repetition stats shuffle (doc_id, key) pairs — partial
aggregation (map-side combine) collapses within-partition duplicate
lines/grams before the exchange, and the final per-doc rollup hashes
on doc_id alone. Decontamination is an inner equi-join on gram key;
the benchmark side is distinct-reduced first and is typically orders
of magnitude smaller than the corpus, so AQE will broadcast it when
it fits and otherwise shuffle-joins on a well-distributed md5 key.

Reference lineage: the reference curates nothing (it links entities);
these operators extend the engine toward the LLM-training-data
pipeline the brief asks for. Repetition signals follow Rae et al.
2021 (Gopher) §A1.1 (duplicate-line fraction, duplicate-line
character fraction, top-n-gram fraction, duplicate-n-gram fraction);
decontamination follows the n-gram-collision test-set filtering of
Brown et al. 2020 (GPT-3) appendix C.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from blink_spark.functions.rounding import qround
from blink_spark.functions.text import shingles, tokenize

# Non-empty-after-trim physical lines of a document.
def _lines(text_col) -> F.Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.filter(F.split(c, "\n"), lambda l: F.trim(l) != F.lit(""))


def repetition_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_gram: int = 2,
    dup_gram: int = 5,
) -> DataFrame:
    """Per-document repetition signals (all fractions qround(6)):

    - ``n_lines``            non-empty lines
    - ``dup_line_frac``      (occurrences - distinct) / occurrences
    - ``dup_line_char_frac`` chars inside lines that appear >1 time
                             / chars inside all lines
    - ``top_2gram_frac``     occurrences of the modal ``top_gram``-gram
                             / all ``top_gram``-gram occurrences
    - ``dup_5gram_frac``     ``dup_gram``-gram occurrences whose gram
                             repeats / all occurrences

    Documents with no lines / no grams report 0.0 (and n_lines 0).
    Ratios divide exact integer sums once, so the qround quantization
    is bit-stable across engines.
    """
    base = docs.select(id_col)

    line_counts = (
        docs.select(
            F.col(id_col), F.explode(_lines(text_col)).alias("l")
        )
        .select(
            id_col, F.md5("l").alias("lk"), F.length("l").alias("lchars")
        )
        .groupBy(id_col, "lk")
        .agg(F.count("*").alias("cnt"), F.max("lchars").alias("lchars"))
    )
    line_stats = line_counts.groupBy(id_col).agg(
        F.sum("cnt").alias("n_lines"),
        ((F.sum("cnt") - F.count("*")) / F.sum("cnt")).alias("dup_line_frac"),
        (
            F.sum(F.when(F.col("cnt") > 1, F.col("lchars") * F.col("cnt")).otherwise(F.lit(0)))
            / F.sum(F.col("lchars") * F.col("cnt"))
        ).alias("dup_line_char_frac"),
    )

    def gram_counts(k: int) -> DataFrame:
        return (
            docs.select(
                F.col(id_col),
                F.explode(shingles(tokenize(text_col), k)).alias("g"),
            )
            .groupBy(id_col, F.md5("g").alias("gk"))
            .agg(F.count("*").alias("cnt"))
        )

    top_stats = gram_counts(top_gram).groupBy(id_col).agg(
        (F.max("cnt") / F.sum("cnt")).alias("top_2gram_frac")
    )
    dup_stats = gram_counts(dup_gram).groupBy(id_col).agg(
        ((F.sum("cnt") - F.count("*")) / F.sum("cnt")).alias("dup_5gram_frac")
    )

    out = (
        base.join(line_stats, id_col, "left")
        .join(top_stats, id_col, "left")
        .join(dup_stats, id_col, "left")
    )
    return out.select(
        id_col,
        F.coalesce("n_lines", F.lit(0)).cast("long").alias("n_lines"),
        *[
            qround(F.coalesce(c, F.lit(0.0)), 6).alias(c)
            for c in (
                "dup_line_frac",
                "dup_line_char_frac",
                "top_2gram_frac",
                "dup_5gram_frac",
            )
        ],
    )


def doc_ngram_keys(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """(id, gk) — md5 keys of the DISTINCT n-token shingles of each
    document (distinct before explode: overlap counts below are
    set-semantics per document)."""
    return docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(shingles(tokenize(text_col), n))).alias("g"),
    ).select(id_col, F.md5("g").alias("gk"))


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    threshold: int = 1,
) -> DataFrame:
    """Flag training documents sharing >= ``threshold`` distinct
    n-gram keys with an evaluation benchmark.

    Returns (id, n_overlap_grams, contaminated) for EVERY input doc
    (left join back onto the corpus, zero-filled) so the caller can
    anti-filter or audit without a second pass.
    """
    bench_keys = (
        doc_ngram_keys(benchmark, id_col, text_col, n)
        .select("gk")
        .distinct()
    )
    hits = (
        doc_ngram_keys(docs, id_col, text_col, n)
        .join(bench_keys, "gk")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_overlap_grams"))
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_overlap_grams", F.lit(0)).cast("long").alias(
                "n_overlap_grams"
            ),
            (F.coalesce("n_overlap_grams", F.lit(0)) >= threshold).alias(
                "contaminated"
            ),
        )
    )
