"""Text-analysis kernels for training-data curation: language ID,
quality scoring, token counting, document fingerprinting.

These extend the ER engine with the text-curation operators a
large-scale training-data pipeline needs. Each kernel is a JVM-native
Column expression (whole-stage codegen, no Python in the hot path)
paired with a DuckDB SQL twin (``*_sql``) used by the driver's oracle
harness — the pairing makes cross-engine parity testable per kernel.

Reference lineage: the normalization mirrors BLINK's lowercase +
tokenize preprocessing (/root/reference/blink/main_dense.py:196-199,
/root/reference/blink/biencoder/data_process_mult.py:28-71); the
fingerprint is the 1-permutation analog of stage-1 MinHash
(/root/reference/blink/biencoder/data_process_mult.py:225-250).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from blink_spark.functions.text import TOKEN_SPLIT_RE, tokenize

from blink_spark.functions.rounding import qround

# Per-language stopword lists for the n-gram/stopword language-ID
# heuristic. Deterministic and tiny by design (broadcast as literals
# into codegen — no dictionary table needed). ASCII-only tokens on
# purpose: the shared tokenizer splits on non-[a-z0-9_], so accented
# function words never survive tokenization in either engine — using
# them would silently zero those languages' ratios.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "in", "is", "that", "it", "for"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es", "se", "no"),
    "de": ("der", "die", "und", "das", "von", "zu", "mit", "den", "ist", "im"),
    "fr": ("le", "la", "de", "et", "les", "des", "en", "un", "une", "que"),
    "it": ("di", "che", "il", "per", "non", "si", "con", "del", "della", "sono"),
    "pt": ("de", "que", "o", "do", "da", "em", "um", "para", "com", "uma"),
    "nl": ("de", "het", "een", "van", "dat", "op", "te", "niet", "zijn", "voor"),
    "sv": ("och", "att", "det", "som", "av", "den", "till", "med", "har", "inte"),
    "da": ("og", "det", "at", "den", "til", "er", "som", "med", "af", "ikke"),
    "pl": ("nie", "to", "na", "co", "jest", "do", "tak", "jak", "ale", "ma"),
    "tr": ("bir", "ve", "bu", "ne", "ben", "ama", "gibi", "daha", "kadar", "sonra"),
    "id": ("yang", "dan", "di", "itu", "dengan", "untuk", "tidak", "ini", "dari", "akan"),
    "cs": ("je", "se", "na", "to", "ze", "ale", "jako", "byl", "jsem", "tak"),
    "ro": ("la", "cu", "un", "o", "pentru", "este", "nu", "mai", "din", "sunt"),
}
_LANG_ORDER = (
    "en", "es", "de", "fr", "it", "pt", "nl", "sv", "da", "pl", "tr", "id",
    "cs", "ro",
)


# ------------------------------------------------------------------ tokens

def whitespace_tokens(col: Column | str) -> Column:
    """Tokens split on runs of whitespace (no lowercasing)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, r"\s+"), lambda t: t != F.lit(""))


def whitespace_tokens_sql(col: str) -> str:
    return (
        f"list_filter(regexp_split_to_array({col}, '\\s+'), t -> t <> '')"
    )


def tokens_sql(col: str) -> str:
    """DuckDB twin of functions.text.tokenize."""
    return (
        f"list_filter(regexp_split_to_array(lower({col}), "
        f"'{TOKEN_SPLIT_RE}'), t -> t <> '')"
    )


def shingles_sql(tokens_expr: str, k: int) -> str:
    """DuckDB twin of functions.text.shingles (k-token, space-joined,
    whole-doc fallback below k tokens)."""
    kgrams = (
        f"[array_to_string(list_slice({tokens_expr}, i, i + {k - 1}), ' ') "
        f"for i in generate_series(1, len({tokens_expr}) - {k - 1})]"
    )
    return (
        f"CASE WHEN len({tokens_expr}) = 0 THEN []::VARCHAR[] "
        f"WHEN len({tokens_expr}) <= {k} "
        f"THEN [array_to_string({tokens_expr}, ' ')] "
        f"ELSE {kgrams} END"
    )


# ------------------------------------------------------------ token stats

def token_stats(text_col: Column | str) -> dict[str, Column]:
    """Token-counting bundle: whitespace tokens, word tokens, distinct
    word tokens, subword-piece estimate (BPE-ish: ceil(len/4) pieces
    per word token — a deterministic stand-in for a real BPE vocab)."""
    ws = whitespace_tokens(text_col)
    words = tokenize(text_col)
    sub = F.aggregate(
        words, F.lit(0).cast("long"),
        lambda acc, t: acc + F.ceil(F.length(t) / F.lit(4.0)).cast("long"),
    )
    return {
        "n_ws_tokens": F.size(ws).cast("long"),
        "n_word_tokens": F.size(words).cast("long"),
        "n_distinct_tokens": F.size(F.array_distinct(words)).cast("long"),
        "n_subword_est": sub,
    }


def token_stats_sql(col: str) -> dict[str, str]:
    toks = tokens_sql(col)
    return {
        "n_ws_tokens": f"len({whitespace_tokens_sql(col)})::BIGINT",
        "n_word_tokens": f"len({toks})::BIGINT",
        "n_distinct_tokens": f"len(list_distinct({toks}))::BIGINT",
        "n_subword_est": (
            f"coalesce(list_sum(list_transform({toks}, "
            f"t -> ceil(length(t) / 4.0)::BIGINT)), 0)::BIGINT"
        ),
    }


# ------------------------------------------------------------- language ID

def lang_ratios(text_col: Column | str) -> dict[str, Column]:
    """Per-language stopword-occurrence ratio over word tokens."""
    toks = tokenize(text_col)
    n = F.size(toks)
    out = {}
    for lang in _LANG_ORDER:
        stops = F.array(*[F.lit(s) for s in STOPWORDS[lang]])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(stops, t)))
        out[lang] = F.when(n == 0, F.lit(0.0)).otherwise(
            hits.cast("double") / n.cast("double")
        )
    return out


def lang_guess(text_col: Column | str) -> Column:
    """argmax-ratio language guess; 'und' when no stopwords hit.
    Ties resolve in fixed _LANG_ORDER — deterministic everywhere."""
    ratios = lang_ratios(text_col)
    best = F.greatest(*ratios.values())
    expr = F.lit("und")
    for lang in reversed(_LANG_ORDER):
        expr = F.when(ratios[lang] == best, F.lit(lang)).otherwise(expr)
    return F.when(best == 0, F.lit("und")).otherwise(expr)


def _lang_ratio_sql(col: str, lang: str) -> str:
    toks = tokens_sql(col)
    stops = "[" + ", ".join(f"'{s}'" for s in STOPWORDS[lang]) + "]"
    return (
        f"CASE WHEN len({toks}) = 0 THEN 0.0 ELSE "
        f"len(list_filter({toks}, t -> list_contains({stops}, t)))::DOUBLE "
        f"/ len({toks}) END"
    )


def lang_guess_sql(col: str) -> str:
    ratios = {lang: _lang_ratio_sql(col, lang) for lang in _LANG_ORDER}
    best = "greatest(" + ", ".join(ratios.values()) + ")"
    cases = " ".join(
        f"WHEN {ratios[lang]} = {best} THEN '{lang}'" for lang in _LANG_ORDER
    )
    return f"CASE WHEN {best} = 0 THEN 'und' {cases} ELSE 'und' END"


# ------------------------------------------------------------ quality score

def quality_components(text_col: Column | str) -> dict[str, Column]:
    """Deterministic quality features: length, punctuation ratio,
    mean token length, stopword ratio (en)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = tokenize(c)
    n_chars = F.length(c)
    n_toks = F.size(toks)
    punct = F.length(F.regexp_replace(F.lower(c), r"[a-z0-9\s]", ""))
    tok_chars = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t).cast("long")
    )
    stops = F.array(*[F.lit(s) for s in STOPWORDS["en"]])
    stop_hits = F.size(F.filter(toks, lambda t: F.array_contains(stops, t)))
    return {
        "n_chars": n_chars.cast("long"),
        "punct_ratio": F.when(n_chars == 0, F.lit(0.0)).otherwise(
            punct.cast("double") / n_chars.cast("double")
        ),
        "mean_token_len": F.when(n_toks == 0, F.lit(0.0)).otherwise(
            tok_chars.cast("double") / n_toks.cast("double")
        ),
        "stopword_ratio": F.when(n_toks == 0, F.lit(0.0)).otherwise(
            stop_hits.cast("double") / n_toks.cast("double")
        ),
        "n_tokens": n_toks.cast("long"),
    }


def quality_score(text_col: Column | str) -> Column:
    """Blended [0,1] quality score (rounded to 6 dp for cross-engine
    float stability)."""
    q = quality_components(text_col)
    score = (
        F.lit(0.3) * F.least(q["n_tokens"].cast("double") / F.lit(50.0), F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - q["punct_ratio"])
        + F.lit(0.2) * F.least(q["mean_token_len"] / F.lit(8.0), F.lit(1.0))
        + F.lit(0.2) * F.least(q["stopword_ratio"] * F.lit(5.0), F.lit(1.0))
    )
    return qround(score, 6)


def quality_components_sql(col: str) -> dict[str, str]:
    toks = tokens_sql(col)
    stops = "[" + ", ".join(f"'{s}'" for s in STOPWORDS["en"]) + "]"
    return {
        "n_chars": f"length({col})::BIGINT",
        "punct_ratio": (
            f"CASE WHEN length({col}) = 0 THEN 0.0 ELSE "
            f"length(regexp_replace(lower({col}), '[a-z0-9\\s]', '', 'g'))::DOUBLE"
            f" / length({col}) END"
        ),
        "mean_token_len": (
            f"CASE WHEN len({toks}) = 0 THEN 0.0 ELSE "
            f"coalesce(list_sum(list_transform({toks}, t -> length(t)::BIGINT)), 0)"
            f"::DOUBLE / len({toks}) END"
        ),
        "stopword_ratio": (
            f"CASE WHEN len({toks}) = 0 THEN 0.0 ELSE "
            f"len(list_filter({toks}, t -> list_contains({stops}, t)))::DOUBLE"
            f" / len({toks}) END"
        ),
        "n_tokens": f"len({toks})::BIGINT",
    }


def quality_score_sql(col: str) -> str:
    q = quality_components_sql(col)
    return (
        f"(floor((0.3 * least(({q['n_tokens']})::DOUBLE / 50.0, 1.0) "
        f"+ 0.3 * (1.0 - ({q['punct_ratio']})) "
        f"+ 0.2 * least(({q['mean_token_len']}) / 8.0, 1.0) "
        f"+ 0.2 * least(({q['stopword_ratio']}) * 5.0, 1.0)) * 1000000.0 + 0.5) / 1000000.0)"
    )


# ------------------------------------------------------------- fingerprints

def norm_sha256(text_col: Column | str) -> Column:
    """sha256 of whitespace/punct-normalized text — exact-dedup key."""
    return F.sha2(F.concat_ws(" ", tokenize(text_col)), 256)


def norm_sha256_sql(col: str) -> str:
    # DuckDB array_to_string([]) is NULL (Spark concat_ws gives '') — coalesce
    return f"sha256(coalesce(array_to_string({tokens_sql(col)}, ' '), ''))"


def min_shingle_fingerprint(text_col: Column | str, k: int = 5) -> Column:
    """Rolling-hash document fingerprint: lexicographic min of md5 over
    k-token shingles (the 1-permutation MinHash; winnowing-lite).
    Near-identical docs collide with probability ≈ Jaccard."""
    from blink_spark.functions.text import shingles

    sh = shingles(tokenize(text_col), k)
    return F.array_min(F.transform(sh, lambda s: F.md5(s)))


def min_shingle_fingerprint_sql(col: str, k: int = 5) -> str:
    sh = shingles_sql(tokens_sql(col), k)
    return f"list_min(list_transform({sh}, s -> md5(s)))"
