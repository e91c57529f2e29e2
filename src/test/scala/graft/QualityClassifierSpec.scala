package graft

import graft.operators.QualityClassifier
import org.apache.spark.sql.functions._

/** Naive Bayes quality scoring: closed-form hand-checkable MLE,
  * class-separating behavior, shared-vocabulary neutrality.
  */
class QualityClassifierSpec extends SparkSpec {

  test("minimal two-word corpus reproduces the hand-computed LLR") {
    import spark.implicits._
    // pos doc "a", neg doc "b": V=2, t_pos=t_neg=1.
    // P(a|pos)=(1+1)/(1+2)=2/3, P(a|neg)=(0+1)/(1+2)=1/3 ->
    // llr(a)=ln(2)=0.693147181 (9dp); priors ln(1/1)=0.
    val docs = Seq((1L, "a", true), (2L, "b", false))
      .toDF("doc_id", "text", "lbl")
    val got = QualityClassifier.nbScore(docs, "text", "doc_id", col("lbl"))
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score"),
        r.getAs[Boolean]("pred")))
    assert(got.toSeq === Seq((1L, 0.6931, true), (2L, -0.6931, false)))
  }

  test("class-exclusive vocabulary separates; shared words stay neutral") {
    import spark.implicits._
    val docs = Seq(
      (1L, "good great good shared", true),
      (2L, "great good excellent shared", true),
      (3L, "bad awful bad shared", false),
      (4L, "awful bad terrible shared", false),
      (5L, "shared shared shared shared", true))
      .toDF("doc_id", "text", "lbl")
    val byId = QualityClassifier.nbScore(docs, "text", "doc_id", col("lbl"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("score"), r.getAs[Boolean]("pred"))).toMap
    assert(byId(1L)._1 > 0 && byId(1L)._2)
    assert(byId(2L)._1 > 0 && byId(2L)._2)
    assert(byId(3L)._1 < 0 && !byId(3L)._2)
    assert(byId(4L)._1 < 0 && !byId(4L)._2)
    // doc 5 holds only the shared word: its score is driven by the
    // class token-count imbalance + prior, far smaller in magnitude
    // than any class-exclusive doc's score.
    assert(math.abs(byId(5L)._1) < math.abs(byId(1L)._1))
    assert(math.abs(byId(5L)._1) < math.abs(byId(3L)._1))
  }
}
