package graft

import graft.operators.Coreset
import org.apache.spark.sql.functions._

/** k-center greedy selection: planted-geometry sanity, an exact
  * driver-side differential, and the covering-radius invariant that ties
  * [[Coreset.kCenterCoverage]] to the next pick's radius.
  */
class CoresetSpec extends SparkSpec {

  import spark.implicits._

  private def d2(a: Seq[Double], b: Seq[Double]): Double = {
    val raw = a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    // the operator rounds before comparing; mirror it
    BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  /** Exact reference: farthest-first traversal on the driver. */
  private def refGreedy(pts: Map[Long, Seq[Double]], k: Int, seed: Long)
      : Seq[(Long, Long, Option[Double])] = {
    var centers = Vector(seed)
    var out = Vector((1L, seed, Option.empty[Double]))
    while (out.length < k) {
      val (id, r) = pts.toSeq
        .map { case (i, v) => (i, centers.map(c => d2(v, pts(c))).min) }
        .minBy { case (i, r) => (-r, i) }
      if (r <= 0.0) return out
      centers :+= id
      out :+= ((out.length + 1L, id, Some(r)))
    }
    out
  }

  // deterministic pseudo-random points (no Math.random: hash-mixed)
  private def pt(i: Int, dim: Int): Seq[Float] =
    (0 until dim).map { j =>
      val h = ((i * 2654435761L + j * 40503L) & 0xffffL).toFloat
      h / 65536.0f * 4.0f - 2.0f
    }

  test("planted clusters: one pick lands in each, radii non-increasing") {
    // three tight clusters far apart; seed in cluster A
    val mk = (cx: Double, ids: Range) =>
      ids.map(i => (i.toLong, Seq.tabulate(8)(j =>
        (if (j == 0) cx else 0.0).toFloat + i * 0.001f)))
    val docs = (mk(0.0, 0 to 9) ++ mk(100.0, 10 to 19) ++ mk(-100.0, 20 to 29))
      .toDF("vec_id", "embedding")
    val picks = Coreset.kCenterGreedy(docs, "embedding", "vec_id", 3, 0L)
    val clusters = picks.map(p => p.id / 10).toSet
    assert(clusters === Set(0L, 1L, 2L), s"one per cluster, got $picks")
    val radii = picks.flatMap(_.radius)
    assert(radii === radii.sorted.reverse, "greedy radii must not increase")
  }

  test("selection matches the exact driver-side reference") {
    val pts = (0 until 60).map(i => i.toLong -> pt(i, 16)).toMap
    val docs = pts.toSeq.map { case (i, v) => (i, v) }.toDF("vec_id", "embedding")
    val got = Coreset.kCenterSelect(docs, "embedding", "vec_id", 7, 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq
      .sortBy(_._1)
    val want = refGreedy(pts.map { case (k, v) => k -> v.map(_.toDouble) }, 7, 3L)
    assert(got === want)
  }

  test("coverage: counts partition the corpus; covering radius = next pick's radius") {
    val pts = (0 until 80).map(i => i.toLong -> pt(i + 7, 16)).toMap
    val docs = pts.toSeq.toDF("vec_id", "embedding")
    val picks = Coreset.kCenterGreedy(docs, "embedding", "vec_id", 5, 0L)
    val cov = Coreset.kCenterCoverage(docs, "embedding", "vec_id", picks)
      .collect()
    assert(cov.map(_.getAs[Long]("n_assigned")).sum === 80L)
    val coveringRadius = cov.map(_.getAs[Double]("max_d2")).max
    val next = Coreset.kCenterGreedy(docs, "embedding", "vec_id", 6, 0L)
    assert(next.last.radius.contains(coveringRadius),
      "6th pick's electing radius must equal the 5-center covering radius")
  }

  test("coveringRadiusSq: greedy provably beats a clumped selection") {
    val mk = (cx: Double, ids: Range) =>
      ids.map(i => (i.toLong, Seq.tabulate(8)(j =>
        (if (j == 0) cx else 0.0).toFloat + i * 0.001f)))
    val docs = (mk(0.0, 0 to 9) ++ mk(100.0, 10 to 19) ++ mk(-100.0, 20 to 29))
      .toDF("vec_id", "embedding")
    val picks = Coreset.kCenterGreedy(docs, "embedding", "vec_id", 3, 0L)
    val greedy = Coreset.coveringRadiusSq(docs, "embedding",
      picks.map(_.center.toArray), "r").head().getDouble(0)
    // three selections from ONE cluster: the other two clusters sit
    // ~100 away, so the covering radius² is ~10^4 x greedy's
    val clumped = mk(0.0, 0 to 2).map(_._2.map(_.toDouble).toArray)
    val clump = Coreset.coveringRadiusSq(docs, "embedding", clumped, "r")
      .head().getDouble(0)
    assert(greedy * 100 < clump,
      s"greedy r2 $greedy should be orders below clumped $clump")
  }

  test("duplicate-only corpora stop early instead of re-picking a center") {
    val docs = Seq((1L, Seq(1.0f, 2.0f)), (2L, Seq(1.0f, 2.0f)),
      (3L, Seq(5.0f, 5.0f))).toDF("vec_id", "embedding")
    val picks = Coreset.kCenterGreedy(docs, "embedding", "vec_id", 3, 1L)
    assert(picks.map(_.id) === Seq(1L, 3L),
      "the duplicate of a center must never be selected")
  }
}
