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

  /** `decimal`: strip currency symbols and thousands separators anywhere,
    * strip leading/trailing whitespace only, parse as exact decimal —
    * reference ingestion/transformers.py:19-30 (`replace('$','')
    * .replace('£','').replace(',','').strip()`; INTERNAL whitespace is
    * kept, so "1 234.50" raises there and yields NULL here). Unparseable
    * input yields NULL (flag via [[errorFlag]]).
    */
  def decimal(c: Column): Column =
    strip(regexp_replace(c.cast(StringType), "[$£,]", "")).try_cast(Money)

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
      .otherwise(coalesce(s.try_cast(DoubleType).try_cast(IntegerType), lit(0)))
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
    val d = strip(raw.cast(StringType)).try_cast(DoubleType)
    d.isNotNull &&
      (d > lit(Int.MaxValue.toDouble) || d < lit(Int.MinValue.toDouble))
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
