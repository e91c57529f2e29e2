package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket pair mining — the L2 candidate pass of A-priori
  * (Agrawal & Srikant 1994): count unordered item pairs that co-occur
  * in the same basket, keep pairs at or above a support threshold, and
  * report each pair's joint support next to both items' individual
  * supports (so confidence / lift are one exact integer division away
  * for the caller — emitting the raw counts keeps the gate
  * float-free).
  *
  * The reference (rnjane/client_data_ingester) stores per-tenant
  * product rows and never relates them; co-occurrence mining over
  * orders is engine-provided analytic capability on the harness star
  * schema.
  *
  * Scale shape: baskets dedupe to DISTINCT (basket, item) first (a
  * map-side-combinable aggregate), then the pair generation is a
  * basket-keyed self-equi-join — cost Σ C(n_b, 2) over basket sizes,
  * which is bounded because `maxBasket` drops the pathological
  * mega-baskets (a wholesale order with 50k line items would emit
  * 1.25B pairs; real A-priori implementations cap or sample exactly
  * here, and the cap is part of the declared semantics so the oracle
  * applies it too). The pair aggregate and both support aggregates are
  * plain hash aggregates with partial combine; nothing is ever
  * collected to the driver. (An array-collect formulation that
  * generates pairs map-side was measured SLOWER here — the per-basket
  * collect_set aggregate costs more than the self-join it saves.)
  */
object MarketBasket {

  /** Frequent co-occurring pairs. Output: item_a < item_b, n_ab (joint
    * support), n_a / n_b (individual supports over the SAME capped
    * basket population), with n_ab >= minSupport.
    */
  def pairCounts(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long = 2L, maxBasket: Int = 64): DataFrame = {
    // distinct is the expensive corpus shuffle; it feeds both the size
    // aggregate and the kept join below — materialize it once
    val items = df.select(col(basketCol).as("o"), col(itemCol).as("p"))
      .distinct()
      .localCheckpoint()
    // basket sizes as a groupBy + o-keyed join (not a window): the join
    // hashes on o exactly like the pair self-join below, so the
    // exchange is shared, and the size table collapses map-side
    val sizes = items.groupBy(col("o")).agg(count(lit(1)).as("_n"))
      .filter(col("_n") <= maxBasket).select(col("o"))
    // capped baskets feed three consumers (support, both self-join
    // sides); materialize once — the distinct and the size filter are
    // the expensive corpus passes and must not replay per consumer
    val kept = items.join(sizes, "o").localCheckpoint()
    // pinned: the two broadcast lookups below project support under
    // DIFFERENT aliases (item_a/item_b), which canonicalize differently
    // — exchange reuse cannot merge them, so an unpinned support would
    // re-run this aggregate over `kept` once per broadcast
    val support = kept.groupBy(col("p")).agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val pairs = kept.as("a")
      .join(kept.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .groupBy(col("a.p").as("item_a"), col("b.p").as("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minSupport)
    // the item dimension is tiny next to the pair table — broadcast it
    // so the two support lookups cost no exchange
    pairs
      .join(broadcast(support.select(col("p").as("item_a"), col("n").as("n_a"))),
        "item_a")
      .join(broadcast(support.select(col("p").as("item_b"), col("n").as("n_b"))),
        "item_b")
      .select(col("item_a"), col("item_b"), col("n_ab"), col("n_a"), col("n_b"))
  }
}
