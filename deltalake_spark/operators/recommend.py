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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["cooccurrence_similarity", "negative_sample_interactions"]


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


def negative_sample_interactions(
    positives: DataFrame,
    *,
    user_col: str,
    item_col: str,
    n_items: int,
    k: int = 4,
    oversample: int = 2,
    seed: int = 19,
) -> DataFrame:
    """Deterministic NEGATIVE SAMPLING for implicit-feedback training
    data — the standard companion step to every matrix-factorization /
    two-tower recommender (BPR, Rendle et al. 2009; word2vec-style
    negative sampling, Mikolov et al. 2013): for each user, draw ``k``
    items the user did NOT interact with, uniformly over the dense
    item universe ``1..n_items``.

    Deterministic and engine-replayable: draw ``j`` for a user is the
    portable Knuth hash ``((user·J + j + seed)·2654435761) mod 2³²``
    mapped to ``1 + (u mod n_items)`` (J = k·oversample total draws);
    the multiply is 16-bit-decomposed
    (:func:`~deltalake_spark.operators.sketches._knuth32`) and the SQL
    twin routes through HUGEINT, so it never overflows int64 — the
    only contract is that ``user·J + J + seed`` itself fits int64
    (user ids below ~2⁶⁰ at J = 8).
    Draws that collide with a TRUE positive of that user are removed
    by an anti-join; the first ``k`` survivors IN DRAW ORDER are kept,
    so the output is a pure function of (positives, n_items, k, seed).
    Oversampling bounds the miss probability: a user with p positives
    loses a draw with chance p/n_items, so k·oversample draws keep k
    survivors unless the user has interacted with most of the catalog
    (power users may emit fewer than k — visible in ``n_drawn``;
    raise ``oversample`` for dense-interaction domains).

    Plan shape: one distinct-pair pass over positives; the draw
    explode is a map-only sequence (J rows per user, pipelined); one
    anti-join on (user, item) — an equi-join against the positives,
    never a cross; one per-user ranked window over ≤ J rows. Output
    ``(user_col, draw_index, neg_item)``, ``draw_index`` = 0-based
    order among this user's k kept negatives.
    """
    if k < 1 or oversample < 1:
        raise ValueError("k and oversample must be >= 1")
    if n_items < 2:
        raise ValueError("n_items must be >= 2")
    total = k * int(oversample)
    pos = positives.select(
        F.col(user_col).cast("long").alias("__u"),
        F.col(item_col).cast("long").alias("__i"),
    ).distinct()
    users = pos.select("__u").distinct()
    draws = users.select(
        "__u",
        F.explode(F.sequence(F.lit(0), F.lit(total - 1))).alias("__j"),
    )
    from deltalake_spark.operators.sketches import KMV_MULT, _knuth32

    u_hash = _knuth32(
        F.col("__u") * total + F.col("__j"), KMV_MULT, int(seed))
    cand = draws.select(
        "__u", "__j",
        (F.lit(1) + (u_hash % F.lit(int(n_items)))).alias("__i"),
    )
    survivors = cand.join(pos, ["__u", "__i"], "left_anti")
    w = Window.partitionBy("__u").orderBy("__j")
    return (
        survivors.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(
            F.col("__u").alias(user_col),
            (F.col("__rn") - 1).cast("long").alias("draw_index"),
            F.col("__i").alias("neg_item"),
        )
    )
