package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {

  test("token counts: whitespace and BPE-ish") {
    import spark.implicits._
    val r = Seq("Hello, world! 42 tokens-here").toDF("t")
      .select(TextAnalysis.tokenCount(col("t")).as("ws"),
        TextAnalysis.bpeishTokenCount(col("t")).as("bp"))
      .head()
    assert(r.getAs[Int]("ws") === 4)
    // Hello , world ! 42 tokens - here => 8
    assert(r.getAs[Int]("bp") === 8)
  }

  test("langId picks the language with the highest marker hit rate") {
    import spark.implicits._
    val out = Seq(
      ("the cat sat on the mat and it was happy", "en"),
      ("el gato es un animal y la casa es grande", "es"),
      ("le chat est dans la maison et il est content", "fr"),
      ("der hund ist ein tier und die katze ist klein", "de"),
      ("zzz qqq xxx", "und")
    ).toDF("t", "expected")
      .select(TextAnalysis.langId(col("t")).as("got"), col("expected"))
      .collect()
    out.foreach(r => assert(r.getString(0) === r.getString(1),
      s"got ${r.getString(0)} want ${r.getString(1)}"))
  }

  test("quality features and score") {
    import spark.implicits._
    val good = "the quick brown fox jumps over the lazy dog and runs to the river"
    val bad = "@@@@ #### $$$$ %%%%"
    val out = TextAnalysis.withQuality(
      Seq((1, good), (2, bad)).toDF("id", "text"), "text")
      .orderBy("id").collect()
    assert(out(0).getAs[Double]("quality_score") === 1.0)
    assert(out(1).getAs[Double]("quality_score") < 0.5)
    assert(out(0).getAs[Double]("stopword_ratio") > 0.2)
    assert(out(1).getAs[Double]("punct_ratio") > 0.5)
  }

  test("fingerprint is whitespace/case-insensitive, content-sensitive") {
    import spark.implicits._
    val fps = Seq("Hello   World", "  hello world ", "hello worlds")
      .toDF("t").select(TextAnalysis.fingerprint(col("t")).as("fp"))
      .collect().map(_.getString(0))
    assert(fps(0) === fps(1))
    assert(fps(0) !== fps(2))
  }

  test("rolling hash is order-sensitive") {
    import spark.implicits._
    val hs = Seq("a b c", "c b a").toDF("t")
      .select(TextAnalysis.rollingHash(col("t")).as("h"))
      .collect().map(_.getLong(0))
    assert(hs(0) !== hs(1))
  }
}
