"""Corpus-curation operators: within-document repetition statistics
(Gopher-style quality signals) and benchmark decontamination
(n-gram-overlap flagging against an eval set).

Both are expressed as explode -> hash-keyed groupBy aggregations —
repetition stats share ONE linear shuffle across all statistic
families, no per-row quadratic work and no Python in the hot path. Lines/grams shuffle under their md5
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

    All three statistic families ride ONE explode → ONE
    (doc, kind, key) shuffle (previously three separate passes that
    tokenized the content twice and joined three aggregates back on
    doc_id): lines, top-grams, and dup-grams are tagged structs in a
    single concatenated array, and the per-doc rollup separates them
    with conditional aggregates. Identical exact-integer arithmetic,
    one-third the exchanges.
    """
    base = docs.select(id_col)

    toks = tokenize(text_col)

    def _tag(kind: int, arr, chars=None):
        return F.transform(
            arr,
            lambda x: F.struct(
                F.lit(kind).alias("kind"),
                F.md5(x).alias("key"),
                (F.length(x) if chars else F.lit(0)).alias("chars"),
            ),
        )

    items = F.concat(
        _tag(0, _lines(text_col), chars=True),
        _tag(1, shingles(toks, top_gram)),
        _tag(2, shingles(toks, dup_gram)),
    )
    counts = (
        docs.select(F.col(id_col), F.explode(items).alias("it"))
        .groupBy(id_col, F.col("it.kind").alias("kind"), F.col("it.key").alias("key"))
        .agg(F.count("*").alias("cnt"), F.max("it.chars").alias("chars"))
    )

    def _if(kind: int, col) -> F.Column:
        return F.when(F.col("kind") == kind, col)

    stats = counts.groupBy(id_col).agg(
        F.sum(_if(0, F.col("cnt"))).alias("n_lines"),
        (
            (F.sum(_if(0, F.col("cnt"))) - F.count(_if(0, F.lit(1))))
            / F.sum(_if(0, F.col("cnt")))
        ).alias("dup_line_frac"),
        (
            F.sum(_if(0, F.when(F.col("cnt") > 1, F.col("chars") * F.col("cnt")).otherwise(F.lit(0))))
            / F.sum(_if(0, F.col("chars") * F.col("cnt")))
        ).alias("dup_line_char_frac"),
        (F.max(_if(1, F.col("cnt"))) / F.sum(_if(1, F.col("cnt")))).alias(
            "top_2gram_frac"
        ),
        (
            (F.sum(_if(2, F.col("cnt"))) - F.count(_if(2, F.lit(1))))
            / F.sum(_if(2, F.col("cnt")))
        ).alias("dup_5gram_frac"),
    )

    out = base.join(stats, id_col, "left")
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
