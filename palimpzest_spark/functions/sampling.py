"""Deterministic sampling for training-data pipelines.

A 100 TB corpus pipeline needs samples that are (a) reproducible across
runs/retries (a re-executed task must emit the same rows — Spark's
``df.sample`` is seed-stable only per partition layout, which changes with
AQE/file splits), (b) cheap (no shuffle, no global state), and (c)
auditable cross-engine. All three fall out of HASH sampling: a row is kept
iff a cryptographic hash of its stable key falls under a threshold. The
filter is a pure JVM expression (md5 + substring + string compare — hex is
monotone under lexicographic compare), fully pushdown/codegen-friendly, and
the DuckDB oracle can evaluate the identical predicate, so the driver's
value-hash gate covers these operators end to end.

The reference system has no sampling operators (its sentinel/MAB execution
samples *records for optimization*, ``query/processor/``); these are
target-engine constructions for the training-data tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 8 hex digits = 32 bits of the md5 — plenty of resolution for fractions
# down to ~2e-10, while keeping the threshold a short constant string.
_HEX_DIGITS = 8
_SPACE = 16**_HEX_DIGITS


def hash_threshold(fraction: float) -> str:
    """Lowercase-hex keep-threshold for a Bernoulli fraction, compared with
    strict ``<`` against the 8-hex-digit bucket. ``fraction=1.0`` returns
    ``"g"`` — lexicographically above every hex bucket — so a 100% sample
    really keeps 100%: clamping to ``"ffffffff"`` silently dropped rows
    whose bucket equals the max (P=2^-32 per row, ~230 rows lost per
    trillion at the advertised scale)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    if fraction >= 1.0:
        return "g"
    return format(min(int(fraction * _SPACE), _SPACE - 1), f"0{_HEX_DIGITS}x")


def _bucket(key_col: str, salt: str) -> F.Column:
    """First 8 hex chars of md5(salt || key) — the row's sampling coordinate,
    uniform on [0, 16^8). Salting decorrelates independent samples drawn
    from the same key space."""
    return F.substring(
        F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string"))), 1, _HEX_DIGITS
    )


def bernoulli_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep each row independently with probability ``fraction``, decided by
    its key alone. Narrow (no shuffle), deterministic under retries and
    repartitioning, and composable: a 1% sample of a 10% sample with
    different salts is an unbiased 0.1% sample."""
    return df.filter(_bucket(key_col, salt) < hash_threshold(fraction))


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum Bernoulli rates (e.g. language rebalancing: keep 100% of
    low-resource languages, 5% of English). One narrow filter pass — the
    per-stratum threshold is a CASE expression, no per-stratum jobs, no
    shuffle, same determinism contract as ``bernoulli_sample``."""
    expr = F.lit(hash_threshold(default_fraction))
    for value, frac in sorted(fractions.items()):
        expr = F.when(
            F.col(strata_col) == value, F.lit(hash_threshold(frac))
        ).otherwise(expr)
    return df.filter(_bucket(key_col, salt) < expr)


def deterministic_topk_sample(
    df: DataFrame, key_col: str, k: int, salt: str = ""
) -> DataFrame:
    """Exactly-k uniform sample: the k rows with the smallest hash
    coordinate. The distributed analogue of reservoir sampling with none of
    its order-dependence: TakeOrderedAndProject computes per-partition
    top-k then merges k·p rows on the driver — no full sort, no shuffle of
    the losers, identical output for any partitioning of the input."""
    return df.orderBy(_bucket(key_col, salt).asc(), F.col(key_col).asc()).limit(k)


def weighted_mixture(
    sources: list[tuple[DataFrame, float]],
    key_col: str,
    source_col: str = "mix_source",
    salt: str = "",
) -> DataFrame:
    """Training-mixture composition: union of per-source Bernoulli samples at
    per-source rates, each row tagged with its source index. The idiomatic
    lakehouse mixing step (rates chosen so source sizes × rates hit the
    desired token budget ratio); sampling stays narrow per source and the
    union is metadata-only."""
    parts = []
    for i, (df, frac) in enumerate(sources):
        parts.append(
            bernoulli_sample(df, key_col, frac, salt=f"{salt}s{i}").withColumn(
                source_col, F.lit(i)
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
