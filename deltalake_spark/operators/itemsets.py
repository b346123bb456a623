"""Frequent-itemset mining and association rules over baskets.

Engine-native north-star surface (the reference query engine —
``src/query/index.ts`` — has no market-basket operators). The classic
retail / co-click workload: which item combinations recur across
baskets, and which "X → Y" implications they support.

Algorithm: distributed Apriori, levels 1-3. The Apriori property
(every subset of a frequent itemset is frequent) prunes each level
BEFORE the join that generates it:

- L1: one groupBy over the deduped basket-item incidence; items below
  ``min_support`` never enter the pair join.
- L2: basket-keyed self-join of the L1-filtered incidence (equi-join
  on the basket id — never a cross product), counted, filtered.
- L3: candidate triples extend a FREQUENT pair (a,b) with a third
  item c > b from the same basket, and both other 2-subsets (a,c),
  (b,c) must also be frequent — two semi-joins against the L2 frame
  (KB..MB at realistic vocabularies, broadcast) kill the candidate
  before the final count.

``max_basket`` drops mega-baskets before pairing (same m² skew-bomb
guard as ``recommend.cooccurrence_similarity`` — a 10k-item basket
contributes no preference signal but 10⁸ triples). All supports are
exact integers; association-rule confidence and lift are fixed IEEE
chains over those integers (one division each), so the SQL twin
matches bit-for-bit.

Scale shape: every join is keyed on the basket id or on frequent-
itemset components; the incidence frame is persisted once and reused
by all three levels; nothing driver-side except the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["frequent_itemsets", "association_rules",
           "sequential_patterns"]


def _incidence(df: DataFrame, basket_col: str, item_col: str,
               max_basket: int | None) -> DataFrame:
    bi = df.select(F.col(basket_col).alias("__b"),
                   F.col(item_col).alias("__i")).distinct()
    if max_basket is not None:
        sizes = bi.groupBy("__b").agg(F.count(F.lit(1)).alias("__bs"))
        bi = (bi.join(sizes, "__b")
              .filter(F.col("__bs") <= int(max_basket)).drop("__bs"))
    return bi


def frequent_itemsets(
    df: DataFrame,
    *,
    basket_col: str,
    item_col: str,
    min_support: int,
    max_size: int = 3,
    max_basket: int | None = None,
) -> DataFrame:
    """Frequent itemsets of size 1..``max_size`` (≤ 3) with exact
    basket-support counts.

    Returns ``(size, item_a, item_b, item_c, support)`` — unordered
    itemsets canonicalized as ``item_a < item_b < item_c``, unused
    slots NULL, ``support`` = number of distinct baskets containing
    the whole itemset (``>= min_support``).
    """
    if min_support < 1:
        raise ValueError("min_support must be >= 1")
    if not 1 <= max_size <= 3:
        raise ValueError("max_size must be in 1..3")
    bi = _incidence(df, basket_col, item_col, max_basket).persist()

    l1 = (bi.groupBy(F.col("__i").alias("item_a"))
          .agg(F.count(F.lit(1)).alias("support"))
          .filter(F.col("support") >= int(min_support)))
    l1 = l1.persist()  # output + the L2 incidence filter both read it
    out = l1.select(
        F.lit(1).alias("size"), "item_a",
        F.lit(None).cast(bi.schema["__i"].dataType).alias("item_b"),
        F.lit(None).cast(bi.schema["__i"].dataType).alias("item_c"),
        "support")
    if max_size == 1:
        return out

    # restrict the incidence to frequent items before any pairing —
    # the L1 Apriori prune (broadcast: frequent vocabularies are small)
    freq_items = l1.select(F.col("item_a").alias("__i"))
    fbi = bi.join(F.broadcast(freq_items), "__i").persist()

    left = fbi.select("__b", F.col("__i").alias("item_a"))
    right = fbi.select("__b", F.col("__i").alias("item_b"))
    l2 = (left.join(right, "__b")
          .filter(F.col("item_a") < F.col("item_b"))
          .groupBy("item_a", "item_b")
          .agg(F.count(F.lit(1)).alias("support"))
          .filter(F.col("support") >= int(min_support)))
    l2 = l2.persist()  # output, L3 extension, and two subset prunes
    out = out.unionByName(l2.select(
        F.lit(2).alias("size"), "item_a", "item_b",
        F.lit(None).cast(bi.schema["__i"].dataType).alias("item_c"),
        "support"))
    if max_size == 2:
        return out

    # L3 candidates: frequent pair (a,b) + same-basket item c > b,
    # then Apriori-prune on the other two 2-subsets before counting
    pair_baskets = (left.join(right, "__b")
                    .filter(F.col("item_a") < F.col("item_b"))
                    .join(F.broadcast(l2.select("item_a", "item_b")),
                          ["item_a", "item_b"]))
    third = fbi.select("__b", F.col("__i").alias("item_c"))
    tri = (pair_baskets.join(third, "__b")
           .filter(F.col("item_c") > F.col("item_b")))
    sub_ac = l2.select(F.col("item_a").alias("item_a"),
                       F.col("item_b").alias("item_c"))
    sub_bc = l2.select(F.col("item_a").alias("item_b"),
                       F.col("item_b").alias("item_c"))
    l3 = (tri.join(F.broadcast(sub_ac), ["item_a", "item_c"],
                   "left_semi")
          .join(F.broadcast(sub_bc), ["item_b", "item_c"],
                "left_semi")
          .groupBy("item_a", "item_b", "item_c")
          .agg(F.count(F.lit(1)).alias("support"))
          .filter(F.col("support") >= int(min_support)))
    return out.unionByName(l3.select(
        F.lit(3).alias("size"), "item_a", "item_b", "item_c",
        "support"))


def association_rules(
    df: DataFrame,
    *,
    basket_col: str,
    item_col: str,
    min_support: int,
    min_confidence: float = 0.0,
    max_basket: int | None = None,
) -> DataFrame:
    """Size-2 association rules ``antecedent → consequent`` (both
    directions of every frequent pair) with the standard metrics:

        support_frac = supp(a,b) / N
        confidence   = supp(a,b) / supp(a)
        lift         = N·supp(a,b) / (supp(a)·supp(b))

    where ``N`` is the number of qualifying baskets. All counts are
    exact integers; each metric is ONE IEEE division (lift's
    numerator/denominator are exact bigint products), so results are
    bit-identical cross-engine. ``min_confidence`` filters on the
    exact rational ``supp(ab)·den >= num·supp(a)`` when expressible —
    here via the double compare, documented exact for the fixture
    domain since confidence is a ratio of ints < 2^53.
    """
    if min_support < 1:
        raise ValueError("min_support must be >= 1")
    bi = _incidence(df, basket_col, item_col, max_basket).persist()
    n_baskets = bi.select("__b").distinct().count()
    if n_baskets == 0:
        raise ValueError("no baskets")

    cnt = (bi.groupBy(F.col("__i").alias("it"))
           .agg(F.count(F.lit(1)).alias("c"))).persist()
    freq = cnt.filter(F.col("c") >= int(min_support)) \
        .select(F.col("it").alias("__i"))
    fbi = bi.join(F.broadcast(freq), "__i")
    left = fbi.select("__b", F.col("__i").alias("item_a"))
    right = fbi.select("__b", F.col("__i").alias("item_b"))
    pairs = (left.join(right, "__b")
             .filter(F.col("item_a") < F.col("item_b"))
             .groupBy("item_a", "item_b")
             .agg(F.count(F.lit(1)).alias("n_both"))
             .filter(F.col("n_both") >= int(min_support)))
    # both rule directions from each unordered pair
    fwd = pairs.select(F.col("item_a").alias("antecedent"),
                       F.col("item_b").alias("consequent"), "n_both")
    rev = pairs.select(F.col("item_b").alias("antecedent"),
                       F.col("item_a").alias("consequent"), "n_both")
    rules = fwd.unionByName(rev)
    ca = cnt.select(F.col("it").alias("antecedent"),
                    F.col("c").alias("n_ante"))
    cc = cnt.select(F.col("it").alias("consequent"),
                    F.col("c").alias("n_cons"))
    out = (rules.join(F.broadcast(ca), "antecedent")
           .join(F.broadcast(cc), "consequent")
           .select(
               "antecedent", "consequent", "n_both", "n_ante",
               "n_cons",
               (F.col("n_both") / F.lit(float(n_baskets)))
               .alias("support_frac"),
               (F.col("n_both").cast("double") / F.col("n_ante"))
               .alias("confidence"),
               ((F.col("n_both") * F.lit(int(n_baskets)))
                .cast("double")
                / (F.col("n_ante") * F.col("n_cons")))
               .alias("lift"),
           ))
    if min_confidence > 0.0:
        out = out.filter(F.col("confidence") >= float(min_confidence))
    return out


def sequential_patterns(
    df: DataFrame,
    *,
    entity_col: str,
    order_col: str,
    state_col: str,
    min_support: int,
    max_len: int = 3,
) -> DataFrame:
    """Frequent sequential patterns (lengths 1-3) across per-entity
    ordered event streams — the PrefixSpan/GSP workload ("view then
    error then purchase"), with EXISTS-subsequence semantics: an
    entity supports ``a>b>c`` iff its stream contains SOME occurrence
    of a strictly before SOME b strictly before SOME c. Support =
    distinct supporting entities.

    The closed-form trick that keeps this join-shaped instead of
    sequence-scanning: per (entity, state) only ``(t_min, t_max)`` and
    the occurrence list matter —

    - ``a>b`` holds  iff  ``min_t(a) < max_t(b)``   (a != b), or the
      state has >= 2 distinct timestamps (a = b);
    - ``a>b>c`` holds iff SOME b-occurrence lies strictly inside the
      open interval ``(min_t(a), max_t(c))`` — any such b pairs with
      the extreme a and c occurrences.

    Level-wise Apriori pruning BEFORE each generating join: states
    below ``min_support`` never enter the pair join; a triple
    candidate requires (a,b), (b,c) AND (a,c) all frequent (three
    broadcast semi-joins against the KB-scale P2 frame) before any
    event row is touched.

    Scale shape: the raw stream is reduced ONCE to the per-entity
    bounds frame (|entities| x |alphabet| rows) and reused by every
    level; all joins are entity-keyed; pattern frames are
    alphabet-sized and broadcast. The alphabet is assumed bounded
    (event-type vocabularies are); support counts are exact integers.

    Output: ``(pattern, level, support)`` with ``pattern`` like
    ``"a>b>c"``, sorted by the caller.
    """
    if min_support < 1:
        raise ValueError("min_support must be >= 1")
    if not 1 <= max_len <= 3:
        raise ValueError("max_len must be in 1..3")

    ev = df.select(F.col(entity_col).alias("__e"),
                   F.col(order_col).cast("long").alias("__t"),
                   F.col(state_col).alias("__s"))
    bounds = ev.groupBy("__e", "__s").agg(
        F.min("__t").alias("__lo"),
        F.max("__t").alias("__hi")).persist()

    p1 = bounds.groupBy("__s").agg(
        F.count(F.lit(1)).alias("support")).filter(
        F.col("support") >= min_support)
    out = p1.select(F.col("__s").alias("pattern"),
                    F.lit(1).cast("long").alias("level"),
                    F.col("support").cast("long").alias("support"))
    if max_len == 1:
        return out

    # L2: entity-keyed bounds self-join, restricted to frequent states
    f1 = p1.select("__s")
    ba = (bounds.join(F.broadcast(f1), "__s")
          .select("__e", F.col("__s").alias("__a"),
                  F.col("__lo").alias("__loa"),
                  F.col("__hi").alias("__hia")))
    bb = (bounds.join(F.broadcast(f1), "__s")
          .select("__e", F.col("__s").alias("__b"),
                  F.col("__lo").alias("__lob"),
                  F.col("__hi").alias("__hib")))
    holds2 = F.when(F.col("__a") == F.col("__b"),
                    F.col("__loa") < F.col("__hia")) \
        .otherwise(F.col("__loa") < F.col("__hib"))
    pairs = (ba.join(bb, "__e").filter(holds2)
             .groupBy("__a", "__b")
             .agg(F.count(F.lit(1)).alias("support"))
             .filter(F.col("support") >= min_support)
             .persist())
    out = out.unionByName(pairs.select(
        F.concat_ws(">", "__a", "__b").alias("pattern"),
        F.lit(2).cast("long").alias("level"),
        F.col("support").cast("long").alias("support")))
    if max_len == 2:
        return out

    # L3 candidates: (a,b,c) with (a,b), (b,c), (a,c) all frequent
    cand = (pairs.select(F.col("__a"), F.col("__b"))
            .join(pairs.select(F.col("__a").alias("__b"),
                               F.col("__b").alias("__c")), "__b")
            .join(pairs.select(F.col("__a"),
                               F.col("__b").alias("__c")),
                  ["__a", "__c"], "left_semi"))
    # count: a b-occurrence strictly inside (min_a, max_c). Every
    # component is pre-restricted to states the candidate frame uses
    # (single-column broadcast semi-joins), so the entity-keyed triple
    # build never fans out over non-candidate states.
    evb = ev.select("__e", F.col("__s").alias("__b"), "__t").join(
        F.broadcast(cand.select("__b").distinct()), "__b", "left_semi")
    with_a = evb.join(
        bounds.select("__e", F.col("__s").alias("__a"),
                      F.col("__lo").alias("__loa"))
        .join(F.broadcast(cand.select("__a").distinct()), "__a",
              "left_semi"), "__e")
    with_c = with_a.join(
        bounds.select("__e", F.col("__s").alias("__c"),
                      F.col("__hi").alias("__hic"))
        .join(F.broadcast(cand.select("__c").distinct()), "__c",
              "left_semi"), "__e")
    trip = (with_c.join(F.broadcast(cand), ["__a", "__b", "__c"],
                        "left_semi")
            .filter((F.col("__t") > F.col("__loa"))
                    & (F.col("__t") < F.col("__hic")))
            .select("__e", "__a", "__b", "__c").distinct()
            .groupBy("__a", "__b", "__c")
            .agg(F.count(F.lit(1)).alias("support"))
            .filter(F.col("support") >= min_support))
    out = out.unionByName(trip.select(
        F.concat_ws(">", "__a", "__b", "__c").alias("pattern"),
        F.lit(3).cast("long").alias("level"),
        F.col("support").cast("long").alias("support")))
    return out
