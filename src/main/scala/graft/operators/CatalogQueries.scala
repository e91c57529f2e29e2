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
            col("sku"))
      case None => scoped.orderBy(col("sku"))
    }
    ordered.offset(offset).limit(limit)
  }
}
