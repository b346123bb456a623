"""Entity resolution survivorship: matched pairs -> golden records.

Engine-native north-star surface completing the record-linkage
pipeline that already lives here: blocking + scoring
(``operators/text.py`` — Levenshtein / Jaro-Winkler /
Damerau-Levenshtein pairs, sorted neighborhood), transitive clustering
(``operators/dedup.py:connected_components``), and now SURVIVORSHIP —
collapsing each matched cluster to one canonical "golden" record under
explicit, deterministic field rules. This is the step every MDM /
customer-360 pipeline ends with, and the step where ad-hoc
implementations go nondeterministic (SELECT any value per group).

Every rule here is a pure function of the cluster's data:

- ``min`` / ``max`` — field extremum;
- ``longest`` — the longest value, ties to the lexicographically
  smallest (``max_by`` on a ``(length, value)`` struct — total order);
- ``earliest`` — the value carried by the cluster's lowest-id record
  (``min_by`` on id);
- ``most_common`` — the modal value, ties to the smallest (needs one
  extra cell-frame aggregation per field, the Cohen's-kappa shape).

Scale shape: one CC pass over the PAIRS (bounded by the linkage
output, not the table), then one groupBy(cluster) over the records —
aggregation rules all map-side combine except ``most_common``'s
cell frame (cluster x value, still tiny). Records never matched to
anything pass through as their own singleton cluster via the left
join + coalesce, so the output is a complete, deduplicated table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["golden_records"]

_SIMPLE_RULES = ("min", "max", "longest", "earliest")


def golden_records(
    df: DataFrame,
    pairs: DataFrame,
    *,
    id_col: str,
    rules: dict[str, str],
    pair_cols: tuple[str, str] = ("id_a", "id_b"),
    max_cc_iter: int = 20,
) -> DataFrame:
    """Collapse matched clusters to one golden record per entity.

    ``pairs`` carries the match edges (any linkage operator's
    output); ``rules`` maps surviving field -> rule name (see module
    docstring). Returns one row per entity:
    ``(entity_id, n_members, <field>...)`` where ``entity_id`` is the
    cluster's minimum record id — stable across runs and
    partitionings.
    """
    from deltalake_spark.operators.dedup import connected_components

    for field, rule in rules.items():
        if rule not in _SIMPLE_RULES + ("most_common",):
            raise ValueError(f"unknown rule {rule!r} for {field!r}")

    edges = pairs.select(F.col(pair_cols[0]).alias("src"),
                         F.col(pair_cols[1]).alias("dst"))
    labels = connected_components(edges, max_iter=max_cc_iter)
    rec = (
        df.join(labels, df[id_col] == labels["node"], "left")
        .withColumn("__e", F.coalesce("component", F.col(id_col)))
        .drop("node", "component")
        .persist()
    )

    aggs = [F.count(F.lit(1)).alias("n_members")]
    for field, rule in rules.items():
        c = F.col(field)
        if rule == "min":
            aggs.append(F.min(c).alias(field))
        elif rule == "max":
            aggs.append(F.max(c).alias(field))
        elif rule == "longest":
            # min_by on (-length, value): longest wins, length ties
            # fall to the lexicographically SMALLEST value (max_by on
            # (length, value) would tie-break to the largest)
            aggs.append(F.min_by(
                c, F.struct((-F.length(c)).alias("l"), c.alias("v")))
                .alias(field))
        elif rule == "earliest":
            aggs.append(F.min_by(c, F.col(id_col)).alias(field))
    out = rec.groupBy(F.col("__e").alias("entity_id")).agg(*aggs)

    for field, rule in rules.items():
        if rule != "most_common":
            continue
        cells = rec.groupBy("__e", field).agg(
            F.count(F.lit(1)).alias("__c"))
        w = Window.partitionBy("__e").orderBy(F.desc("__c"), field)
        modal = (cells.withColumn("__rn", F.row_number().over(w))
                 .filter(F.col("__rn") == 1)
                 .select(F.col("__e").alias("entity_id"),
                         F.col(field).alias(f"__m_{field}")))
        out = (out.drop(field).join(modal, "entity_id")
               .withColumnRenamed(f"__m_{field}", field))
    return out
