package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tenant-scoped product listing: search + relevance rank + pagination —
  * reference GET /products/list (web/api/products.py:36-74).
  *
  * The 3-key relevance sort (exact sku match, sku prefix match, sku) is
  * scalar CASE ranking, not a window — Catalyst plans sort+limit as
  * TakeOrderedAndProject, i.e. a distributed top-k without a full sort,
  * which is exactly what a paginated search needs at scale.
  */
object CatalogQueries {

  val DefaultLimit = 5
  val MaxLimit = 50

  def list(
      products: DataFrame,
      clientId: Int,
      query: Option[String] = None,
      offset: Int = 0,
      limit: Int = DefaultLimit): DataFrame = {
    require(limit >= 1 && limit <= MaxLimit, s"limit must be in [1,$MaxLimit]")
    require(offset >= 0, "offset must be >= 0")
    val scoped = products.filter(col("client_id") === clientId)
    // NULLS LAST on the sku key: the reference's ORDER BY runs on
    // Postgres, whose ascending default puts NULLs last — Spark's
    // default is NULLS FIRST, which would LEAD every page with the
    // persisted no-sku insert rows instead of trailing them. (A page
    // actually containing such a row makes the reference's response
    // model blow up — ClientProductOut declares sku non-optional — so
    // trailing them additionally keeps the well-formed pages aligned.)
    val ordered = query.filter(_.nonEmpty) match {
      case Some(q) =>
        val contains = s"%$q%"
        scoped
          .filter(col("title").ilike(contains) ||
            col("remote_id").ilike(contains) ||
            col("sku").ilike(contains))
          .orderBy(
            when(lower(col("sku")) === lower(lit(q)), 0).otherwise(1),
            when(col("sku").ilike(s"$q%"), 0).otherwise(1),
            col("sku").asc_nulls_last)
      case None => scoped.orderBy(col("sku").asc_nulls_last)
    }
    ordered.offset(offset).limit(limit)
  }

  /** Keyset ("seek method") pagination — the scale-correct sibling of
    * [[list]]'s offset/limit: instead of skipping `offset` rows (which
    * a distributed engine must still produce and discard, so page N
    * costs O(N·pageSize) and deep pages melt down), the client passes
    * the last key it saw and the next page is `WHERE key > last ORDER
    * BY key LIMIT n` — a predicate that pushes into the scan, so every
    * page costs the same O(pageSize) regardless of depth. The cursor
    * key must be a TOTAL order, or pages skip/repeat rows that tie on
    *
    * the sort key. Here the cursor is `sku` alone: (client_id, sku) is
    * the reference table's uniqueness contract (the upsert key), so
    * within a tenant the NON-NULL skus form a total order. NULL-sku
    * rows (the reference's always-insert no-sku path persists them, and
    * they are NOT unique) have no place in a key ordering — they are
    * explicitly outside the keyset view and reachable via [[list]];
    * left implicit, the `sku > after` predicate would drop them
    * silently, which is the same result but an accident of three-valued
    * logic rather than a contract.
    *
    * Plan shape: the `sku > after` predicate lands in PushedFilters
    * (min/max row-group pruning skips every chunk wholly before the
    * cursor) and the sort+limit plans as TakeOrderedAndProject — a
    * distributed top-k, never a global sort or an offset scan.
    */
  def listKeyset(
      products: DataFrame,
      clientId: Int,
      afterSku: String,
      limit: Int = DefaultLimit): DataFrame = {
    require(limit >= 1 && limit <= MaxLimit, s"limit must be in [1,$MaxLimit]")
    products
      .filter(col("client_id") === clientId)
      .filter(col("sku").isNotNull && col("sku") > afterSku)
      .orderBy(col("sku"))
      .limit(limit)
  }
}
