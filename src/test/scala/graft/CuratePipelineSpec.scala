package graft

import graft.operators.CuratePipeline

/** The composed curation pipeline on a controlled corpus: each gate must
  * drop exactly the documents it should.
  */
class CuratePipelineSpec extends SparkSpec {

  private val goodEn = "the quick brown fox jumps over the lazy dog and it was " +
    "a good day for running in the sun with friends at the park"

  test("dedup, language, and quality gates compose") {
    import spark.implicits._
    val docs = Seq(
      (1L, goodEn),                               // keeper
      (2L, "  " + goodEn.toUpperCase + "  "),     // near-exact dup of 1 (fingerprint)
      (3L, "el perro corre por la calle y la casa es un lugar con los gatos"), // spanish
      (4L, "x!!! ###" ),                          // junk: too short, punct-heavy
      (5L, "the cat sat on the mat and it was warm there for a while today")   // keeper
    ).toDF("doc_id", "text")
    val out = CuratePipeline.curate(docs, "text", "doc_id",
        minQuality = 0.7, keepLang = "en")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out.keySet === Set(1L, 5L))
    assert(out(1L).getAs[String]("lang_pred") === "en")
    assert(out(1L).getAs[Double]("quality_score") >= 0.7)
    assert(out(1L).getAs[Long]("ws_tokens") === goodEn.split("\\s+").length.toLong)
    assert(out(1L).getAs[String]("fingerprint").length === 32)
  }
}
