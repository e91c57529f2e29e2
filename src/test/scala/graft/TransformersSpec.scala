package graft

import graft.functions.Transformers
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Truth tables for the scalar transformer catalog — semantics pinned to
  * reference ingestion/transformers.py:19-68.
  */
class TransformersSpec extends SparkSpec {

  private def run(tid: String, inputs: Seq[String]): Seq[Any] = {
    import spark.implicits._
    inputs.toDF("v")
      .select(Transformers(tid)(col("v")).as("out"))
      .collect().map(r => if (r.isNullAt(0)) null else r.get(0)).toSeq
  }

  test("text: str(value).strip()") {
    assert(run("text", Seq("  hi  ", "a b", "", null)) ===
      Seq("hi", "a b", "", null))
  }

  test("decimal: strips $ £ , whitespace; exact decimal; garbage -> null") {
    val out = run("decimal", Seq("$1,234.50", "£99.9", " 7 ", "12.345", "garbage", null))
    assert(out.map(v => Option(v).map(_.toString).orNull) ===
      Seq("1234.50", "99.90", "7.00", "12.35", null, null))
  }

  test("integer: truncates toward zero; bad string -> 0") {
    assert(run("integer", Seq("3.7", "-3.7", "42", "nope", "", null)) ===
      Seq(3, -3, 42, 0, 0, 0))
  }

  test("boolean: yes/true/1 -> true, no/false/0 -> false, else null (strict)") {
    assert(run("boolean", Seq("yes", " TRUE ", "1", "No", "false", "0", "maybe", null)) ===
      Seq(true, true, true, false, false, false, null, null))
  }

  test("errorFlag marks present-but-unparseable strict inputs only") {
    import spark.implicits._
    // empty string IS an error (reference raises on bool('')/Decimal(''));
    // only a truly absent value (null) is "not supplied"
    val df = Seq("yes", "maybe", "", null).toDF("v")
      .select(Transformers.errorFlag(col("v"), Transformers.boolean(col("v"))).as("e"))
    assert(df.collect().map(_.getBoolean(0)).toSeq === Seq(false, true, true, false))
  }

  test("decimal keeps internal whitespace unparseable (reference strips only outer)") {
    import spark.implicits._
    val df = Seq("  $1,234.50 ", "1 234.50").toDF("v")
      .select(Transformers.decimal(col("v")).cast("string").as("d"))
    assert(df.collect().map(_.getString(0)).toSeq === Seq("1234.50", null))
  }

  test("unknown transformer id rejected") {
    intercept[IllegalArgumentException] { Transformers("nope") }
  }
}
