"""Item-item collaborative filtering over basket co-occurrence.

Engine-native north-star surface (the reference has no recommender
ops). "Customers who bought X also bought Y" is the canonical
co-occurrence workload: score item pairs by the cosine of their binary
basket-incidence vectors,

    sim(a, b) = c_ab / sqrt(c_a * c_b)

where ``c_ab`` counts baskets containing both items and ``c_x`` counts
baskets containing x. All inputs are exact integers and the score is
``CAST(c_ab) / sqrt(CAST(c_a * c_b))`` — two correctly-rounded IEEE
ops — so results are bit-identical across engines and partitionings.

Scale shape: the pair self-join is keyed on the basket id (an
equi-join, never a cross product), but a single mega-basket of m items
still emits m² pairs — the classic co-occurrence skew bomb. The
``max_basket`` guard drops baskets above a size cap BEFORE pairing
(standard practice in production co-occurrence pipelines: a basket
with thousands of items carries no preference signal anyway), bounding
the per-basket blow-up at max_basket². Item-frequency joins broadcast
(item vocabularies are KB..MB even for huge catalogs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["cooccurrence_similarity"]


def cooccurrence_similarity(
    df: DataFrame,
    *,
    basket_col: str,
    item_col: str,
    min_pairs: int = 2,
    max_basket: int | None = None,
) -> DataFrame:
    """Cosine item-item similarity over binary basket incidence.

    Returns ``(item_a, item_b, n_both, n_a, n_b, cosine)`` for
    unordered pairs (``item_a < item_b``) co-occurring in at least
    ``min_pairs`` baskets. ``max_basket`` (strongly recommended at
    scale) excludes baskets with more distinct items than the cap
    before the pair join — see module docstring.
    """
    bi = df.select(F.col(basket_col).alias("__b"),
                   F.col(item_col).alias("__i")).distinct()
    if max_basket is not None:
        sizes = bi.groupBy("__b").agg(F.count(F.lit(1)).alias("__bs"))
        # co-partitioned equi-join on the basket key: the size frame
        # shares the pair join's partitioning, so AQE reuses the
        # exchange; no broadcast of a basket-cardinality-sized frame
        bi = (bi.join(sizes, "__b")
              .filter(F.col("__bs") <= int(max_basket)).drop("__bs"))
    bi = bi.persist()  # pair join and item counts both replay it

    cnt = bi.groupBy(F.col("__i").alias("it")).agg(
        F.count(F.lit(1)).alias("c"))
    left = bi.select("__b", F.col("__i").alias("item_a"))
    right = bi.select("__b", F.col("__i").alias("item_b"))
    pairs = (
        left.join(right, "__b")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
        .filter(F.col("n_both") >= int(min_pairs))
    )
    ca = cnt.select(F.col("it").alias("item_a"), F.col("c").alias("n_a"))
    cb = cnt.select(F.col("it").alias("item_b"), F.col("c").alias("n_b"))
    return (
        pairs.join(F.broadcast(ca), "item_a")
        .join(F.broadcast(cb), "item_b")
        .select(
            "item_a", "item_b", "n_both", "n_a", "n_b",
            (F.col("n_both").cast("double")
             / F.sqrt((F.col("n_a") * F.col("n_b")).cast("double")))
            .alias("cosine"),
        )
    )
