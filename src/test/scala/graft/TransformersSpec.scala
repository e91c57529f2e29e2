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

  test("integer: truncates toward zero; bad PRESENT string -> 0; absent -> null") {
    // '' is a present cell (int(float('')) raises ValueError -> 0,
    // transformers.py:49-51); NULL is a physically absent cell the
    // reference never transforms — it must stay unsupplied (NULL), not
    // become a 0 that would overwrite a stored value on merge.
    assert(run("integer", Seq("3.7", "-3.7", "42", "nope", "", null)) ===
      Seq(3, -3, 42, 0, 0, null))
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

  test("str.strip() parity: the full UNICODE whitespace set strips (NBSP and friends)") {
    // Python strips every char where str.isspace() is True — NBSP
    // (U+00A0, endemic in spreadsheet-exported CSV), figure space
    // U+2007, narrow NBSP U+202F, ideographic space U+3000, NEL U+0085,
    // line/paragraph separators U+2028/U+2029, and the file separators
    // U+001C-U+001F. An NBSP-padded boolean cell must be ACCEPTED, not
    // abort the batch (reference transformers.py:63 `str(value).strip()`).
    val nbsp = " "
    assert(run("boolean", Seq(s"${nbsp}true$nbsp", " no ",
      " 1 ", "　yes　", "false",
      " 0 ", "true")) ===
      Seq(true, false, true, true, false, false, true))
    assert(run("text", Seq(s"$nbsp hi $nbsp", s"a${nbsp}b", "　x ")) ===
      Seq("hi", s"a${nbsp}b", "x")) // inner NBSP kept, like Python
    assert(run("integer", Seq(s"${nbsp}3.7$nbsp", "　9　")) === Seq(3, 9))
    val dec = run("decimal", Seq(s"$nbsp$$5.25 "))
    assert(dec.map(v => Option(v).map(_.toString).orNull) === Seq("5.25"))
    // pyStrip (the driver-side header twin) agrees char-for-char
    val all = " \t\n\f\r  " +
      "       　"
    assert(Transformers.pyStrip(all + "k" + all) === "k")
    assert(Transformers.pyStrip(all) === "")
  }

  test("integer/decimal: Python numeric-literal parity (underscores, Java suffixes, inf/nan)") {
    // PEP 515: float('1_000') == 1000.0 — single underscores BETWEEN
    // digits only ('_1', '1__0', '5_' all ValueError -> 0). Spark's own
    // double cast instead accepts Java suffixes ('1d', '2.5f') that
    // float() rejects -> the reference returns 0 for those, so the
    // transformer must too.
    assert(run("integer", Seq(
      "1_000", "-2_5.9", "1_0e0_1", "+.5_5",
      "1d", "2.5f", "1D", "3F",
      "_1", "1__0", "5_", "1._5",
      "nan", "NaN", "-nan")) ===
      Seq(1000, -25, 100, 0,
        0, 0, 0, 0,
        0, 0, 0, 0,
        0, 0, 0))
    // Decimal() removes underscores ANYWHERE ("underscores throughout
    // the string are removed", decimal docs) — looser than float():
    // Decimal('_1') == 1 and Decimal('1__0') == 10 are VALID there.
    // '_ 1' stays invalid: Python strips whitespace BEFORE removing
    // underscores, so the exposed inner space still raises there — and
    // must stay a strict error here even though Spark's decimal cast
    // would trim it.
    val dec = run("decimal", Seq("1_000", "_1", "1__0", "$1_000.2_5", "1d", "_ 1"))
    assert(dec.map(v => Option(v).map(_.toString).orNull) ===
      Seq("1000.00", "1.00", "10.00", "1000.25", null, null))
  }

  test("integer range flag: truncation-before-range-check and the inf OverflowError") {
    import spark.implicits._
    // Python runs int() (truncate toward zero) BEFORE the DB sees the
    // value: "2147483647.9" truncates to a fitting 2147483647 and
    // stores fine — it must NOT abort. "2147483648" overflows INTEGER at
    // INSERT -> abort. int(float('inf')) raises OverflowError, which the
    // except-ValueError fallback does NOT catch -> the reference batch
    // dies; the flag reproduces that as out-of-range. int(float('nan'))
    // raises ValueError -> caught -> 0, never an abort.
    val in = Seq("2147483647.9", "2147483648", "-2147483648.5",
      "-2147483649", "inf", "-Infinity", "1e999", "1_0e999", "nan", "junk", "")
    val got = in.toDF("v")
      .select(Transformers.integerRangeErrorFlag(col("v")).as("f"))
      .collect().map(_.getBoolean(0)).toSeq
    assert(got === Seq(false, true, false, true, true, true, true, true,
      false, false, false))
    // and the VALUES for the non-aborting rows truncate like Python
    assert(run("integer", Seq("2147483647.9", "-2147483648.5")) ===
      Seq(2147483647, -2147483648))
  }

  test("property: transformer catalog == Python-semantics reference on messy strings") {
    val rnd = new scala.util.Random(29)
    val pads = Seq("", " ", "  ", "\t", "\n", " \t",
      " ", "  ", "　", "", " ", "")
    val bools = Seq("yes", "No", "TRUE", "false", "0", "1", "Maybe", "2", "")
    val nums = Seq("3.7", "-3.7", "42", "0", "1e3", "-0.5", "junk", "", "12.345",
      "$1,234.50", "£99.9", "1 234.50")
    def messy(core: String): String =
      pads(rnd.nextInt(pads.size)) + core + pads(rnd.nextInt(pads.size))
    // boolean: stripped lowercase membership
    val bIn = (1 to 120).map(_ => messy(bools(rnd.nextInt(bools.size))))
    run("boolean", bIn).zip(bIn).foreach { case (got, in) =>
      val s = Transformers.pyStrip(in).toLowerCase // model: Python strip
      val want: Any =
        if (Set("yes", "true", "1")(s)) true
        else if (Set("no", "false", "0")(s)) false
        else null
      assert(got === want, s"boolean('$in')")
    }
    // integer: int(float(strip(s))) else 0
    val iIn = (1 to 120).map(_ => messy(nums(rnd.nextInt(nums.size))))
    run("integer", iIn).zip(iIn).foreach { case (got, in) =>
      val want = scala.util.Try(Transformers.pyStrip(in).toDouble.toInt).getOrElse(0)
      assert(got === want, s"integer('$in')")
    }
    // decimal: strip currency/thousands anywhere, outer whitespace, then
    // exact decimal at scale 2 (HALF_UP) or null
    val dIn = (1 to 120).map(_ => messy(nums(rnd.nextInt(nums.size))))
    run("decimal", dIn).zip(dIn).foreach { case (got, in) =>
      val cleaned = Transformers.pyStrip(
        in.replace("$", "").replace("£", "").replace(",", ""))
      val want = scala.util.Try(BigDecimal(cleaned)).toOption
        // Spark's try_cast to DECIMAL parses scientific notation like
        // BigDecimal does; internal whitespace fails both
        .map(_.setScale(2, BigDecimal.RoundingMode.HALF_UP).toString).orNull
      val gotS = Option(got).map(_.toString).orNull
      assert(gotS === want, s"decimal('$in')")
    }
  }
}
