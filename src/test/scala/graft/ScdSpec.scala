package graft

import graft.operators.Scd
import org.apache.spark.sql.functions._

/** SCD2 history intervals: versioning, interval chaining, tiebreaks. */
class ScdSpec extends SparkSpec {

  private def changes = {
    import spark.implicits._
    Seq(
      (1L, 10L, "2024-01-01", 5.0),
      (1L, 11L, "2024-03-01", 6.0),
      (1L, 12L, "2024-03-01", 7.0), // same date as 11 — tiebreak on key
      (2L, 20L, "2024-02-01", 9.0)
    ).toDF("entity", "change_id", "d", "price")
      .withColumn("d", to_date(col("d")))
  }

  test("versions are 1-based per entity in (ts, tiebreak) order") {
    val h = Scd.scd2(changes, "entity", "d", "change_id")
      .orderBy("entity", "version").collect()
    assert(h.map(r => (r.getAs[Long]("entity"), r.getAs[Int]("version"),
      r.getAs[Long]("change_id"))).toSeq ===
      Seq((1L, 1, 10L), (1L, 2, 11L), (1L, 3, 12L), (2L, 1, 20L)))
  }

  test("valid_to chains to the next change; last version is current") {
    val h = Scd.scd2(changes, "entity", "d", "change_id")
      .orderBy("entity", "version").collect()
    val e1 = h.filter(_.getAs[Long]("entity") == 1L)
    assert(e1(0).getAs[java.sql.Date]("valid_to").toString === "2024-03-01")
    assert(e1(1).getAs[java.sql.Date]("valid_to").toString === "2024-03-01")
    assert(e1(2).getAs[java.sql.Date]("valid_to") === null)
    assert(e1.map(_.getAs[Boolean]("is_current")).toSeq ===
      Seq(false, false, true))
  }

  test("asOf predicate picks exactly the rows valid at a date") {
    val h = Scd.scd2(changes, "entity", "d", "change_id")
    val at = h.filter(Scd.asOf(to_date(lit("2024-02-15")))).collect()
    // Entity 1 is on version 1 (valid 01-01 .. 03-01); entity 2 current.
    assert(at.map(r => (r.getAs[Long]("entity"), r.getAs[Int]("version")))
      .toSet === Set((1L, 1), (2L, 1)))
  }
}
