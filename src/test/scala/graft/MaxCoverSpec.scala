package graft

import graft.operators.MaxCover
import org.apache.spark.sql.functions._

/** Greedy max-coverage: worked instance, full-coverage early stop,
  * (1 − 1/e) guarantee vs brute-force OPT, tie-break determinism, and
  * the md5 bucket hash replay of featurePairs.
  */
class MaxCoverSpec extends SparkSpec {

  import spark.implicits._

  private def pairsDF(sets: Map[Long, Seq[Long]]) =
    sets.toSeq.flatMap { case (id, bs) => bs.map(b => (id, b)) }
      .toDF("id", "bucket")

  test("worked instance: greedy order, exact gains, early stop at full cover") {
    val sets = Map(
      1L -> Seq(1L, 2L, 3L, 4L),
      2L -> Seq(3L, 4L, 5L),
      3L -> Seq(5L, 6L),
      4L -> Seq(1L, 2L))
    // round 1: doc 1 covers 4; round 2: doc 3 adds {5,6} (doc 2 adds
    // only {5}); everything covered -> early stop despite k=4
    val picks = MaxCover.greedyMaxCover(pairsDF(sets), k = 4)
    assert(picks.map(p => (p.round, p.id, p.gain, p.covered)) ===
      Seq((1L, 1L, 4L, 4L), (2L, 3L, 2L, 6L)))
  }

  test("equal gains break ascending-id; a picked doc never re-picks") {
    val sets = Map(
      7L -> Seq(10L, 11L),
      5L -> Seq(10L, 11L), // same set, lower id: must win round 1
      9L -> Seq(12L))
    val picks = MaxCover.greedyMaxCover(pairsDF(sets), k = 5)
    assert(picks.map(_.id) === Seq(5L, 9L))
    assert(picks.map(_.id).distinct.length === picks.length)
  }

  test("greedy covers >= (1 - 1/e) of brute-force OPT; gains non-increasing") {
    // deterministic scattered sets over a 40-bucket universe
    val sets = (0L until 8L).map { i =>
      i -> (0 until 12).map(j => ((i * 2654435761L + j * 40503L) % 40L + 40L) % 40L)
        .distinct.sorted
    }.toMap
    val k = 3
    val picks = MaxCover.greedyMaxCover(pairsDF(sets.map {
      case (k2, v) => k2 -> v.toSeq
    }), k)
    assert(picks.length === k)
    // brute force over all 8-choose-3 subsets
    val opt = sets.keys.toSeq.combinations(k)
      .map(c => c.flatMap(sets).distinct.length).max
    assert(picks.last.covered >= math.ceil((1.0 - 1.0 / math.E) * opt).toLong,
      s"greedy ${picks.last.covered} below the (1-1/e) bound of OPT $opt")
    // submodularity: marginal gains never increase along the greedy path
    picks.sliding(2).foreach {
      case Seq(a, b) => assert(b.gain <= a.gain, s"gain rose: $a -> $b")
      case _ =>
    }
    // covered is the running sum of gains
    assert(picks.map(_.gain).sum === picks.last.covered)
  }

  test("featurePairs replays the md5 bucket hash, distinct per doc") {
    val docs = Seq((1L, "alpha beta alpha"), (2L, "gamma")).toDF("doc_id", "text")
    val got = MaxCover.featurePairs(docs, "text", "doc_id", buckets = 1024)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def bucket(g: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(g.getBytes("UTF-8")).take(3).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % 1024L
    }
    // doc 1: unigrams {alpha, beta}, bigrams {"alpha beta", "beta alpha"};
    // doc 2: the lone unigram, no bigram. Repeated "alpha" dedups.
    val want = Set("alpha", "beta", "alpha beta", "beta alpha").map(g => (1L, bucket(g))) +
      ((2L, bucket("gamma")))
    assert(got === want)
  }

  private def costedPairsDF(sets: Map[Long, (Long, Seq[Long])]) =
    sets.toSeq.flatMap { case (id, (cost, bs)) =>
      bs.map(b => (id, b, cost))
    }.toDF("id", "bucket", "cost")

  test("budgeted greedy: ratio argmax, affordability skip, early stop") {
    // doc 1: 4 buckets at cost 8 (ratio 0.5M); doc 2: 3 buckets at cost
    // 3 (ratio 1M — wins round 1 despite smaller gain); doc 3: 2 fresh
    // buckets at cost 20 (NEVER affordable after round 2 on budget 12);
    // doc 4: 1 fresh bucket at cost 2.
    val sets = Map(
      1L -> (8L, Seq(1L, 2L, 3L, 4L)),
      2L -> (3L, Seq(3L, 4L, 5L)),
      3L -> (20L, Seq(8L, 9L)),
      4L -> (2L, Seq(6L)))
    val picks = MaxCover.greedyBudgetCover(costedPairsDF(sets),
      budget = 12L, maxRounds = 10)
    // round 1: doc 2 (ratio 1M beats doc 1's 0.5M); round 2: doc 4
    // (fresh gain 1 / cost 2 = 0.5M beats doc 1's remaining {1,2}/8 =
    // 0.25M; doc 3 costs 20 > 9 remaining); round 3: doc 1 (gain 2,
    // cost 8 <= 7 remaining? NO — 8 > 7, unaffordable; doc 3 still
    // 20 > 7) -> stop with budget left but nothing affordable.
    assert(picks.map(p => (p.round, p.id, p.gain, p.cost, p.spent, p.covered)) ===
      Seq((1L, 2L, 3L, 3L, 3L, 3L), (2L, 4L, 1L, 2L, 5L, 4L)))
    assert(picks.last.spent <= 12L)
  }

  test("budgeted greedy: every pick affordable at its turn, spent is a running sum") {
    val sets = (0L until 10L).map { i =>
      i -> ((5L + i, (0 until 8).map(j => (i * 13L + j * 7L) % 50L).distinct.toSeq))
    }.toMap
    val budget = 30L
    val picks = MaxCover.greedyBudgetCover(costedPairsDF(sets), budget, 10)
    assert(picks.nonEmpty)
    var remaining = budget
    picks.foreach { p =>
      assert(p.cost <= remaining, s"pick $p was not affordable at its turn")
      remaining -= p.cost
    }
    assert(picks.map(_.cost).sum === picks.last.spent)
    assert(picks.last.spent <= budget)
    assert(picks.map(_.gain).sum === picks.last.covered)
  }

  test("coverSelect readout preserves pick order and schema") {
    val picks = Seq(MaxCover.CoverPick(1L, 42L, 7L, 7L),
      MaxCover.CoverPick(2L, 13L, 3L, 10L))
    val df = MaxCover.coverSelect(spark, picks, "doc_id").orderBy(col("round"))
    assert(df.columns.toSeq === Seq("round", "doc_id", "gain", "covered"))
    assert(df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))).toSeq === Seq((1L, 42L, 7L, 7L), (2L, 13L, 3L, 10L)))
  }
}
