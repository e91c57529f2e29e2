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

  test("str.strip() parity: ALL ascii whitespace strips, not just spaces") {
    // Python str.strip() removes tabs/newlines/CR too; SQL TRIM removes
    // only spaces — under TRIM a tab-padded boolean ABORTED a batch the
    // reference accepts (regression for the r16 parity fix)
    assert(run("boolean", Seq("\ttrue\t", "\nno\r", " \t1 \n")) ===
      Seq(true, false, true))
    assert(run("text", Seq("\t hi \n", "a\tb")) === Seq("hi", "a\tb"))
    assert(run("integer", Seq("\t3.7\n")) === Seq(3))
    val dec = run("decimal", Seq("\t$5.25\r\n"))
    assert(dec.map(v => Option(v).map(_.toString).orNull) === Seq("5.25"))
  }

  test("property: transformer catalog == Python-semantics reference on messy strings") {
    val rnd = new scala.util.Random(29)
    val pads = Seq("", " ", "  ", "\t", "\n", " \t")
    val bools = Seq("yes", "No", "TRUE", "false", "0", "1", "Maybe", "2", "")
    val nums = Seq("3.7", "-3.7", "42", "0", "1e3", "-0.5", "junk", "", "12.345",
      "$1,234.50", "£99.9", "1 234.50")
    def messy(core: String): String =
      pads(rnd.nextInt(pads.size)) + core + pads(rnd.nextInt(pads.size))
    // boolean: stripped lowercase membership
    val bIn = (1 to 120).map(_ => messy(bools(rnd.nextInt(bools.size))))
    run("boolean", bIn).zip(bIn).foreach { case (got, in) =>
      val s = in.trim.toLowerCase // ASCII inputs: String.trim == strip
      val want: Any =
        if (Set("yes", "true", "1")(s)) true
        else if (Set("no", "false", "0")(s)) false
        else null
      assert(got === want, s"boolean('$in')")
    }
    // integer: int(float(strip(s))) else 0
    val iIn = (1 to 120).map(_ => messy(nums(rnd.nextInt(nums.size))))
    run("integer", iIn).zip(iIn).foreach { case (got, in) =>
      val want = scala.util.Try(in.trim.toDouble.toInt).getOrElse(0)
      assert(got === want, s"integer('$in')")
    }
    // decimal: strip currency/thousands anywhere, outer whitespace, then
    // exact decimal at scale 2 (HALF_UP) or null
    val dIn = (1 to 120).map(_ => messy(nums(rnd.nextInt(nums.size))))
    run("decimal", dIn).zip(dIn).foreach { case (got, in) =>
      val cleaned = in.replace("$", "").replace("£", "").replace(",", "").trim
      val want = scala.util.Try(BigDecimal(cleaned)).toOption
        // Spark's try_cast to DECIMAL parses scientific notation like
        // BigDecimal does; internal whitespace fails both
        .map(_.setScale(2, BigDecimal.RoundingMode.HALF_UP).toString).orNull
      val gotS = Option(got).map(_.toString).orNull
      assert(gotS === want, s"decimal('$in')")
    }
  }
}
