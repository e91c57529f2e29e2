package graft

import graft.operators.SnapshotDiff

/** Snapshot diff truth table. */
class SnapshotDiffSpec extends SparkSpec {

  test("added / removed / changed / unchanged classification") {
    import spark.implicits._
    val a = Seq(
      (1L, "same text"),
      (2L, "will change"),
      (3L, "will be removed"),
      (4L, "Same   TEXT normalized") // fingerprint ignores case/ws
    ).toDF("doc_id", "text")
    val b = Seq(
      (1L, "same text"),
      (2L, "has changed"),
      (4L, "same text normalized differently"), // different content -> changed
      (5L, "brand new")
    ).toDF("doc_id", "text")
    val got = SnapshotDiff.diff(a, b, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("status")).toMap
    assert(got === Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "changed", 5L -> "added"))
    val delta = SnapshotDiff.delta(a, b, "doc_id", "text").collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(delta === Set(2L, 3L, 4L, 5L))
  }

  test("whitespace/case-only edits are NOT changes (fingerprint semantics)") {
    import spark.implicits._
    val a = Seq((1L, "Hello   World")).toDF("doc_id", "text")
    val b = Seq((1L, "hello world")).toDF("doc_id", "text")
    val got = SnapshotDiff.diff(a, b, "doc_id", "text").collect()
    assert(got.head.getAs[String]("status") === "unchanged")
  }
}
