"""Deterministic synthetic source-code corpus (the `files` table of
BASELINE.json input_hint: repo, path, commit, lang, content).

Plays the role of the reference's mention fixtures
(/root/reference/blink/preprocess/medmentions_preprocess.py:56-66):
each "entity" is a clone family — exact duplicates, path renames,
identifier renames, small line edits, license-header variants — with
a gold entity_id per file for the pairwise-F1 gate.

Generated DISTRIBUTED and deterministically: spark.range(n_entities)
-> mapInPandas, each family derived solely from (seed, entity_id), so
the corpus is byte-identical at any parallelism (required by the
local[8]/local[32] scaling-equivalence check). A Zipf-ish family-size
draw plus one forced hot family give the skew the salting path needs.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FILES_SCHEMA = (
    "repo string, path string, commit string, lang string, "
    "content string, entity_id long, variant string"
)

_LANGS = ["py", "java", "js", "go", "c"]
_EXT = {"py": "py", "java": "java", "js": "js", "go": "go", "c": "c"}
_KEYWORDS = {
    "py": ["def", "return", "if", "else", "for", "in", "import", "class", "self", "none"],
    "java": ["public", "static", "void", "class", "return", "new", "int", "final", "import", "null"],
    "js": ["function", "const", "let", "return", "if", "else", "export", "import", "var", "null"],
    "go": ["func", "return", "if", "err", "nil", "package", "import", "var", "range", "defer"],
    "c": ["int", "void", "return", "if", "else", "struct", "static", "char", "include", "null"],
}
# shared across ALL entities -> hot shingles -> hot blocks (skew fixture)
_LICENSE = (
    "copyright 2024 the example authors licensed under the apache license "
    "version 2 0 you may not use this file except in compliance with the license "
    "you may obtain a copy of the license at http www apache org licenses"
)


def _family_rows(entity_id: int, seed: int, hot_family_size: int) -> list[dict]:
    rng = np.random.RandomState((seed * 1_000_003 + entity_id) % (2**31 - 1))
    lang = _LANGS[int(rng.randint(0, len(_LANGS)))]
    kws = _KEYWORDS[lang]

    # entity-private identifier vocabulary keeps inter-family overlap low
    idents = [f"sym{entity_id}_{rng.randint(0, 10**6)}" for _ in range(18)]
    n_lines = int(rng.randint(30, 80))
    lines = []
    for _ in range(n_lines):
        n_tok = int(rng.randint(4, 9))
        toks = [
            kws[int(rng.randint(0, len(kws)))]
            if rng.random() < 0.35
            else idents[int(rng.randint(0, len(idents)))]
            for _ in range(n_tok)
        ]
        lines.append(" ".join(toks))
    base = "\n".join(lines)

    if entity_id == 0 and hot_family_size > 0:
        size = hot_family_size
    else:
        size = min(int(rng.zipf(2.2)), 12)

    repo_base = f"org{int(rng.randint(0, 500))}/repo{entity_id}"
    fname = f"mod_{entity_id}"
    rows = []
    variants = ["base", "exact", "rename", "ident", "edit", "header"]
    for m in range(size):
        variant = variants[m % len(variants)] if m > 0 else "base"
        vrng = np.random.RandomState((seed * 7_000_003 + entity_id * 1009 + m) % (2**31 - 1))
        content = base
        repo = repo_base
        path = f"src/{fname}.{_EXT[lang]}"
        if variant == "exact":
            repo = f"{repo_base}-fork{m}"
        elif variant == "rename":
            path = f"lib/{fname}_v{m}.{_EXT[lang]}"
        elif variant == "ident":
            old = idents[int(vrng.randint(0, len(idents)))]
            content = content.replace(old, f"renamed{entity_id}_{m}")
            path = f"src/{fname}.{_EXT[lang]}"
            repo = f"{repo_base}-ref{m}"
        elif variant == "edit":
            ls = content.split("\n")
            n_edit = max(1, len(ls) // 40)
            for _ in range(n_edit):
                i = int(vrng.randint(0, len(ls)))
                ls[i] = ls[i] + f" edited{m}"
            content = "\n".join(ls)
            repo = f"{repo_base}-dev{m}"
        elif variant == "header":
            content = _LICENSE + "\n" + content
            repo = f"{repo_base}-hdr{m}"
        commit = hashlib.sha1(
            f"{seed}:{entity_id}:{m}:{repo}:{path}".encode()
        ).hexdigest()
        rows.append(
            {
                "repo": repo,
                "path": path,
                "commit": commit,
                "lang": lang,
                "content": content,
                "entity_id": int(entity_id),
                "variant": variant,
            }
        )
    return rows


def generate_files(
    spark: SparkSession,
    n_entities: int = 500,
    seed: int = 42,
    hot_family_size: int = 0,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic corpus; one clone family per entity."""
    ids = spark.range(n_entities)
    if partitions:
        ids = ids.repartition(partitions)

    def gen(batches):
        for pdf in batches:
            rows: list[dict] = []
            for eid in pdf["id"].tolist():
                rows.extend(_family_rows(int(eid), seed, hot_family_size))
            yield pd.DataFrame(
                rows,
                columns=[
                    "repo", "path", "commit", "lang", "content", "entity_id", "variant",
                ],
            )

    return ids.mapInPandas(gen, schema=FILES_SCHEMA)


def synthetic_catalogue(files: DataFrame) -> DataFrame:
    """One canonical catalogue row per entity from a generate_files()
    corpus: the first 'base' variant, re-homed into a 'catalog' repo
    namespace (mirrors the reference's entity dictionary — one
    document per KB entity). Returns the 5-col pipeline shape plus
    entity_id for gold construction."""
    from pyspark.sql import Window as W

    w = W.partitionBy("entity_id").orderBy("commit")
    return (
        files.where(F.col("variant") == "base")
        .withColumn("repo", F.lit("catalog"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("repo", "path", "commit", "lang", "content", "entity_id")
    )
