package graft

import graft.operators.WordPiece
import graft.operators.WordPiece.{WpMerge, WpModel}
import org.apache.spark.sql.functions._

/** WordPiece trainer/encoder: the trainer's DECIMAL-computed likelihood
  * score is differentialed against a driver-side BigInt reference
  * replay (exact integer arithmetic, no overflow possible), and the
  * MaxMatch encoder's counts are checked on a hand-built model.
  */
class WordPieceSpec extends SparkSpec {

  import spark.implicits._

  /** Exact reference trainer: same algorithm, BigInt score arithmetic,
    * driver-side. Independent of every Spark expression the operator
    * uses — if the DECIMAL score path ever floors differently from
    * floor(cnt * 10^9 / (cl * cr)), this diverges.
    */
  private def refTrain(
      texts: Seq[String], numMerges: Int): (Seq[String], Seq[WpMerge]) = {
    val freqs = texts
      .flatMap(_.trim.toLowerCase.split("\\s+").filter(_.nonEmpty))
      .filter(_.matches("^[a-z0-9]+$"))
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq.sortBy(_._1)
    var vocab: Seq[(Vector[String], Long)] = freqs.map { case (w, f) =>
      (w.zipWithIndex.map { case (c, i) =>
        if (i == 0) c.toString else "##" + c }.toVector, f)
    }
    val alphabet = vocab.flatMap(_._1).distinct.sorted
    val merges = Seq.newBuilder[WpMerge]
    var i = 1
    var exhausted = false
    while (i <= numMerges && !exhausted) {
      val symCnt = vocab.flatMap { case (ss, f) => ss.map(_ -> f) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      val pairCnt = vocab.flatMap { case (ss, f) =>
        ss.sliding(2).collect { case Vector(l, r) => (l, r) -> f } }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      if (pairCnt.isEmpty) exhausted = true
      else {
        val scored = pairCnt.map { case ((l, r), cnt) =>
          val score = (BigInt(cnt) * BigInt(WordPiece.Scale) /
            (BigInt(symCnt(l)) * BigInt(symCnt(r)))).toLong
          (l, r, cnt, score)
        }
        val (l, r, cnt, score) =
          scored.minBy { case (l, r, _, sc) => (-sc, l, r) }
        merges += WpMerge(i.toLong, l, r, cnt, score)
        val m = l + r.stripPrefix("##")
        vocab = vocab.map { case (ss, f) =>
          val out = ss.foldLeft(Vector.empty[String]) { (acc, s2) =>
            if (acc.nonEmpty && acc.last == l && s2 == r)
              acc.init :+ m
            else acc :+ s2
          }
          (out, f)
        }
        i += 1
      }
    }
    (alphabet, merges.result())
  }

  test("trainer matches the driver-side BigInt reference replay") {
    val texts = Seq(
      "hugging hugging hugging face face hug",
      "hugged hugged bug bug bug rug rugged",
      "huggable face hug hug bugs 2b2 or not",
      "the rug the bug the hug")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val model = WordPiece.trainWordPiece(docs, "text", "id", numMerges = 8)
    val (refAlpha, refMerges) = refTrain(texts, 8)
    assert(model.alphabet === refAlpha)
    assert(model.merges === refMerges)
    // likelihood ordering, not raw pair count: every recorded score is
    // the exact integer floor, and no score exceeds the Scale bound
    // (pair_count <= min symbol count) the DECIMAL headroom note relies on
    model.merges.foreach { m =>
      assert(m.score_scaled > 0L && m.score_scaled <= WordPiece.Scale) }
  }

  test("MaxMatch encode: '##' continuations, longest-first, UNK billing") {
    val model = WpModel(
      alphabet = Seq("u", "##n", "a", "##a", "##b", "##l", "##e"),
      merges = Seq(WpMerge(1L, "u", "##n", 1L, 1L))) // vocab gains "un"
    val docs = Seq(
      (1L, "unable zz unable"), // 5 tokens + UNK + 5 tokens
      (2L, "a")                 // single word-initial piece
    ).toDF("id", "text")
    val got = WordPiece.wordPieceTokenCounts(docs, "text", "id", model)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // "unable" -> un ##a ##b ##l ##e (greedy longest "un" beats "u")
    assert(got(1L) === ((3L, 11L, 1L)))
    assert(got(2L) === ((1L, 1L, 0L)))
  }
}
