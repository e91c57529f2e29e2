package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar transformer catalog.
  *
  * Re-expresses the reference's row-at-a-time Python transformers
  * (reference: ingestion/transformers.py:19-68) as pure Catalyst `Column`
  * expressions — never UDFs — so they stay inside whole-stage codegen and
  * survive predicate pushdown. Registry discovery by string id mirrors
  * reference config.py:131-137.
  *
  * Error-channel note: the reference *raises* on an unparseable boolean or
  * decimal, aborting the whole batch (ingestion/service.py:56-64). A
  * distributed engine must not crash tasks mid-write, so the strict
  * variants yield NULL and [[Transformers.errorFlag]] marks rows whose
  * input was present but unparseable; the ingestion service counts those
  * flags *before* any sink write and aborts the batch with a failure
  * report — same all-or-nothing semantics, scale-safe mechanics.
  */
object Transformers {

  val Money: DecimalType = DecimalType(12, 2)

  /** Python `str.strip()` parity for the whole catalog: the reference
    * strips every char where `str.isspace()` is True, while SQL TRIM
    * removes only ASCII spaces — under TRIM a tab-padded boolean cell
    * ("\ttrue") fails the strict membership test and ABORTS a batch the
    * reference accepts. Python's set is: the ASCII whitespace class
    * (space, tab, newline, CR, FF, VT — Java-regex `\s`), the
    * file/group/record/unit separators U+001C–U+001F, NEL U+0085, and
    * the full Unicode space category `\p{Z}` (NBSP, figure space,
    * ideographic space, line/paragraph separators). NBSP is endemic in
    * spreadsheet-exported CSV, so the class must match exactly — an
    * NBSP-padded boolean cell is ACCEPTED here exactly as the
    * reference accepts it (ingestion/transformers.py:33-38,63).
    */
  private[graft] val PyWhitespaceClass = "[\\s\\u001C-\\u001F\\u0085\\p{Z}]"

  private def strip(c: Column): Column =
    regexp_replace(c, s"^$PyWhitespaceClass+|$PyWhitespaceClass+$$", "")

  /** Driver-side twin of [[strip]] for header names (reference
    * parsers.py:43 `column_name.strip()`) — the same Python
    * `str.isspace()` set, char-for-char.
    */
  private[graft] def pyStrip(s: String): String = {
    def ws(c: Char) = Character.isWhitespace(c) || Character.isSpaceChar(c) ||
      c == '\u0085'
    s.dropWhile(ws).reverse.dropWhile(ws).reverse
  }

  /** `text`: str(value).strip() — reference ingestion/transformers.py:33-38. */
  def text(c: Column): Column = strip(c.cast(StringType))

  /** Python float() string grammar (after strip), used as an acceptance
    * GATE in front of Spark's double cast because the two parsers
    * disagree in both directions:
    *
    *  - Spark's cast accepts Java-style trailing type suffixes ("1d",
    *    "2.5f" parse as doubles) that Python's float() REJECTS — the
    *    reference turns them into the ValueError->0 fallback;
    *  - Python (PEP 515) accepts single underscores BETWEEN digits
    *    ("1_000" == 1000.0, also in fraction and exponent) that Spark's
    *    cast rejects.
    *
    * Grammar: optional sign; digitpart [. [digitpart]] | . digitpart,
    * optional [eE][+-]digitpart exponent, digitpart = \d(_?\d)*; or the
    * inf/infinity/nan words (case-insensitive, no underscores). Known
    * residual: Python's float() also accepts non-ASCII Unicode decimal
    * digits ("１２３"); `\d` here is ASCII, so those fall to the 0
    * fallback — no realistic CSV hits this.
    */
  private[graft] val PyFloatGrammar: String = {
    val dp = "\\d(_?\\d)*"
    s"^[+-]?(($dp(\\.($dp)?)?|\\.$dp)([eE][+-]?$dp)?|(?i:inf(inity)?|nan))$$"
  }

  /** float(s) under Python's grammar: NULL unless the stripped string
    * matches [[PyFloatGrammar]]; underscores removed before the cast.
    */
  private def pyFloat(s: Column): Column =
    when(s.rlike(PyFloatGrammar), translate(s, "_", "").try_cast(DoubleType))

  /** `decimal`: strip currency symbols and thousands separators anywhere,
    * strip leading/trailing whitespace only, parse as exact decimal —
    * reference ingestion/transformers.py:19-30 (`replace('$','')
    * .replace('£','').replace(',','').strip()`; INTERNAL whitespace is
    * kept, so "1 234.50" raises there and yields NULL here). Unparseable
    * input yields NULL (flag via [[errorFlag]]).
    *
    * Underscores are removed ANYWHERE before parsing: Python's Decimal
    * constructor documents that "underscores throughout the string are
    * removed" (so Decimal('1_000') == 1000 AND Decimal('_1') == 1 —
    * looser than float()'s between-digits rule). A lone '_' reduces to
    * '' and aborts, same as the reference's InvalidOperation.
    *
    * Documented deviation: Decimal('nan') is a VALID Python decimal and
    * PostgreSQL's numeric accepts NaN even at declared precision, so the
    * reference STORES NaN for a 'nan' cell; Spark's DecimalType has no
    * NaN representation, so the engine ABORTS the batch (strict flag).
    * 'inf'/'Infinity' parse as Python decimals too but numeric(12,2)
    * REJECTS infinities at INSERT — both engines abort, same outcome.
    */
  def decimal(c: Column): Column = {
    val cleaned =
      translate(strip(regexp_replace(c.cast(StringType), "[$£,]", "")), "_", "")
    // Underscore removal can EXPOSE inner whitespace at the ends
    // ('_ 1' -> ' 1'): Python still rejects it (Decimal('_ 1') raises —
    // the strip happens before underscore removal, not after), while
    // Spark's decimal cast trims outer whitespace and would accept it.
    when(cleaned.rlike(PyWhitespaceClass), lit(null).cast(Money))
      .otherwise(cleaned.try_cast(Money))
  }

  /** `integer`: truncate-toward-zero of the float value ("3.7" -> 3);
    * unparseable PRESENT input -> 0 — reference transformers.py:40-53
    * (`except ValueError: return 0`). Spark's double->int cast truncates
    * toward zero, matching Python int(float(s)).
    *
    * NULL input passes through as NULL, NOT 0: in the reference an
    * absent cell never reaches the transformer at all (parsers.py:42
    * drops value-is-None elements before interpret), so the column is
    * simply not supplied — coalescing the absence to 0 would make a
    * merge OVERWRITE the stored quantity with 0 where the reference
    * leaves it untouched. Only a present-but-unparseable string (which
    * the reference DOES transform, to 0) takes the fallback.
    */
  def integer(c: Column): Column = {
    val s = strip(c.cast(StringType))
    when(c.isNull, lit(null).cast(IntegerType))
      .otherwise(coalesce(pyFloat(s).try_cast(IntegerType), lit(0)))
  }

  /** `boolean`: case-insensitive stripped membership in {yes,true,1} /
    * {no,false,0}; anything else is a strict error (reference
    * transformers.py:55-68 raises TransformerError -> batch abort).
    */
  def boolean(c: Column): Column = {
    val s = lower(strip(c.cast(StringType)))
    when(s.isin("yes", "true", "1"), lit(true))
      .when(s.isin("no", "false", "0"), lit(false))
      .otherwise(lit(null).cast(BooleanType))
  }

  /** Transformer ids whose NULL output on non-NULL input means
    * "unparseable" and must abort the batch (strict reference semantics).
    */
  val strictIds: Set[String] = Set("boolean", "decimal")

  /** True when the raw input was present (non-null) but the strict
    * transform produced NULL — the reportable error channel. An empty or
    * whitespace-only string IS an error (the reference raises on
    * `Decimal('')` / `bool('')`, aborting the batch), and the CSV source
    * preserves a present-but-empty cell as '' (DictReader semantics,
    * sources.Sources) — NULL reaches here only for a cell that was
    * physically absent (short row, or source column missing from the
    * header), which the reference never transforms at all
    * (parsers.py:42 drops value-is-None elements).
    */
  def errorFlag(raw: Column, transformed: Column): Column =
    raw.isNotNull && transformed.isNull

  /** True when an integer-target value PARSES as a number but lies
    * outside INTEGER's range: the reference transforms it fine (Python
    * ints are arbitrary precision) and the batch then dies at the
    * database INSERT into the INTEGER column — the pre-sink validation
    * channel (the VARCHAR-width discipline) reproduces that abort.
    * Without the flag, try_cast Double→Int yields NULL and the
    * coalesce-to-0 in [[integer]] would SILENTLY store 0 for a
    * perfectly parseable out-of-range value; genuine garbage stays 0
    * (the reference's `except ValueError: return 0`).
    */
  def integerRangeErrorFlag(raw: Column): Column = {
    val d = pyFloat(strip(raw.cast(StringType)))
    // Python applies int() — truncation toward zero — BEFORE the range
    // check, so "2147483647.9" truncates to a fitting 2147483647 and
    // stores fine there: the bound must be on the truncated value, i.e.
    // |d| reaching the first double whose truncation overflows (2^31 for
    // the positive side, -(2^31)-1 for the negative). 'inf'/'1e999'
    // parse to ±Infinity and land here as out-of-range, matching the
    // reference's uncaught OverflowError from int(float('inf')) —
    // ValueError is the only exception its fallback catches. NaN is
    // excluded EXPLICITLY: Spark's SQL ordering puts NaN above every
    // double (so NaN >= 2^31 is TRUE here, unlike Java), but Python's
    // int(float('nan')) raises ValueError -> caught -> 0, never an abort.
    d.isNotNull && !isnan(d) &&
      (d >= lit(2147483648.0) || d <= lit(-2147483649.0))
  }

  val registry: Map[String, Column => Column] = Map(
    "text" -> text,
    "decimal" -> decimal,
    "integer" -> integer,
    "boolean" -> boolean
  )

  def apply(id: String): Column => Column =
    registry.getOrElse(id,
      throw new IllegalArgumentException(s"Unknown transformer id: $id"))
}
