"""Declarative data-quality gates for ingest pipelines.

Expectation-style rules (the dbt-test / Great-Expectations family) over
any DataFrame — in a CDC ingest tier these run per microbatch in front of
the merge: violations are counted for metrics, and ``quarantine`` splits
offending rows to a dead-letter sink instead of poisoning the table.

Each rule compiles to a plain Column predicate, so the whole audit is ONE
pass of map-side-combinable aggregates (no shuffle of the data, no UDFs);
``unique`` is the exception — key-cardinality needs one hash-agg on the
key. Rules:

- ``("not_null", col)``
- ``("unique", [cols])``              rows in key groups of size > 1
- ``("accepted_values", col, [vs])``  null passes (compose with not_null)
- ``("range", col, lo, hi)``          inclusive; null passes
- ``("regex", col, pattern)``         full-match; null passes
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

Rule = tuple


def rule_name(rule: Rule) -> str:
    kind = rule[0]
    col = ",".join(rule[1]) if isinstance(rule[1], list) else rule[1]
    return f"{kind}({col})"


def _violation_predicate(rule: Rule) -> Column:
    """True where the row VIOLATES the rule (unique handled separately)."""
    kind = rule[0]
    if kind == "not_null":
        return F.col(rule[1]).isNull()
    if kind == "accepted_values":
        c = F.col(rule[1])
        return c.isNotNull() & ~c.isin(rule[2])
    if kind == "range":
        c = F.col(rule[1])
        return c.isNotNull() & ((c < F.lit(rule[2])) | (c > F.lit(rule[3])))
    if kind == "regex":
        c = F.col(rule[1])
        # rlike is contains-match; anchor for the documented FULL-match
        return c.isNotNull() & ~c.rlike(f"^(?:{rule[2]})$")
    raise ValueError(f"unknown rule kind: {kind}")


def audit_rules(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """(rule, violations) — one aggregate pass for the row-local rules plus
    one key hash-agg per ``unique`` rule."""
    spark = df.sparkSession
    local = [r for r in rules if r[0] != "unique"]
    uniques = [r for r in rules if r[0] == "unique"]

    parts = []
    if local:
        agg = df.agg(
            *[
                F.sum(_violation_predicate(r).cast("long")).alias(str(i))
                for i, r in enumerate(local)
            ]
        ).first()
        parts += [(rule_name(r), int(agg[str(i)] or 0)) for i, r in enumerate(local)]
    for r in uniques:
        keys = r[1]
        dup_rows = (
            df.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("_c"))
            .filter(F.col("_c") > 1)
            .agg(F.coalesce(F.sum("_c"), F.lit(0)).alias("v"))
            .first()["v"]
        )
        parts.append((rule_name(r), int(dup_rows)))
    order = {rule_name(r): i for i, r in enumerate(rules)}
    parts.sort(key=lambda x: order[x[0]])
    return spark.createDataFrame(parts, "rule string, violations long")


def quarantine(
    df: DataFrame, rules: list[Rule]
) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined) split. A row is quarantined if it violates ANY
    rule; quarantined rows carry ``_violated`` = array of rule names.
    ``unique`` quarantines every row of a duplicated key group (the merge
    cannot know which duplicate is right — both go to the dead letter)."""
    out = df
    flags = []
    for i, r in enumerate(rules):
        name = f"_v{i}"
        if r[0] == "unique":
            w = Window.partitionBy(*[F.col(c) for c in r[1]])
            out = out.withColumn(name, F.count(F.lit(1)).over(w) > 1)
        else:
            out = out.withColumn(name, _violation_predicate(r))
        flags.append(name)
    labels = F.array_compact(
        F.array(
            *[
                F.when(F.col(f), F.lit(rule_name(r)))
                for f, r in zip(flags, rules)
            ]
        )
    )
    out = out.withColumn("_violated", labels).drop(*flags)
    clean = out.filter(F.size("_violated") == 0).drop("_violated")
    bad = out.filter(F.size("_violated") > 0)
    return clean, bad
