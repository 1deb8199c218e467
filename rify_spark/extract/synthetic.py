"""Deterministic synthetic source-code corpus (seeded, no external data).

Generates the ``code_files(repo, path, commit, lang, content)`` table from
BASELINE.json's input hint, with known imports / symbol defs / call edges so
the expected extracted triples are computable in closed form (FIXTURES.md §3).

The generator is pure Python (driver-side lists for tests, or a distributed
range-based generator for benchmarks) and content is reproducible from
(repo index, module index) alone — which also gives the per-row sha256
reference for the ingest invariant.
"""

import hashlib
import random

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CODE_FILES_SCHEMA = "repo string, path string, commit string, lang string, content string"


def module_content(repo_i: int, mod_i: int, n_funcs: int = 3, seed: int = 42) -> str:
    """Deterministic python-ish module body.

    Module m imports module m-1 (same repo) and one cross-repo module;
    defines functions ``f_{mod}_{j}``; each function calls one function of
    the previous module and one sibling.
    """
    rng = random.Random(seed * 1_000_003 + repo_i * 10_007 + mod_i)
    lines = [f'"""module mod_{mod_i} of repo_{repo_i}."""']
    if mod_i > 0:
        lines.append(f"import mod_{mod_i - 1}")
    if repo_i > 0 and mod_i == 0:
        lines.append(f"from repo_{repo_i - 1} import mod_0")
    lines.append("import os")
    for j in range(n_funcs):
        lines.append("")
        lines.append(f"def f_{mod_i}_{j}(x):")
        if mod_i > 0:
            callee = rng.randrange(n_funcs)
            lines.append(f"    y = f_{mod_i - 1}_{callee}(x)")
        else:
            lines.append("    y = x + 1")
        if j > 0:
            lines.append(f"    y = f_{mod_i}_{j - 1}(y)")
        lines.append("    return y")
    return "\n".join(lines) + "\n"


def code_files_rows(
    n_repos: int = 2, n_modules: int = 4, n_funcs: int = 3, seed: int = 42
) -> list:
    rows = []
    for r in range(n_repos):
        for m in range(n_modules):
            content = module_content(r, m, n_funcs, seed)
            commit = hashlib.sha256(
                f"{seed}:{r}:{m}".encode()
            ).hexdigest()[:12]
            rows.append(
                (f"repo_{r}", f"src/mod_{m}.py", commit, "python", content)
            )
    return rows


def code_files_df(
    spark: SparkSession,
    n_repos: int = 2,
    n_modules: int = 4,
    n_funcs: int = 3,
    seed: int = 42,
) -> DataFrame:
    return spark.createDataFrame(
        code_files_rows(n_repos, n_modules, n_funcs, seed), CODE_FILES_SCHEMA
    )


def reference_sha256(rows: list) -> dict:
    """(repo, path) -> sha256(content) computed independently of Spark —
    the reference side of the ingest invariant."""
    return {
        (r, p): hashlib.sha256(content.encode()).hexdigest()
        for (r, p, _c, _l, content) in rows
    }


def code_files_df_distributed(
    spark: SparkSession,
    n_repos: int,
    n_modules: int,
    n_funcs: int = 3,
    seed: int = 42,
    partitions: int = None,
) -> DataFrame:
    """Benchmark-scale generator: spark.range + a pandas UDF building content
    on executors, so corpus size is not driver-bound."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def gen_content(repo_i: pd.Series, mod_i: pd.Series) -> pd.Series:
        return pd.Series(
            [
                module_content(int(r), int(m), n_funcs, seed)
                for r, m in zip(repo_i, mod_i)
            ]
        )

    n = n_repos * n_modules
    df = spark.range(0, n, 1, partitions or min(64, max(1, n // 1000) or 1))
    df = df.select(
        (F.col("id") / n_modules).cast("long").alias("repo_i"),
        (F.col("id") % n_modules).alias("mod_i"),
    )
    return df.select(
        F.concat(F.lit("repo_"), F.col("repo_i")).alias("repo"),
        F.concat(F.lit("src/mod_"), F.col("mod_i"), F.lit(".py")).alias("path"),
        F.substring(F.sha2(F.concat_ws(":", F.lit(seed), "repo_i", "mod_i"), 256), 1, 12).alias("commit"),
        F.lit("python").alias("lang"),
        gen_content("repo_i", "mod_i").alias("content"),
    )
