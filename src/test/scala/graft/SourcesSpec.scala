package graft

import graft.sources.IngestSource
import org.apache.spark.sql.functions.col

/** Source-format semantics — reference ingestion/parsers.py:34-48. */
class SourcesSpec extends SparkSpec {

  test("csv: header trim, empty-header drop, all-string, blank-line drop") {
    val dir = tmpDir("csv")
    val p = writeText(dir, "in.csv",
      " sku , title ,,qty\na1,Widget,junk,5\n\na2,Gadget,junk,7\n")
    val df = IngestSource("csv").read(spark, p)
    val cols = df.columns.filterNot(_ == IngestSource.ROW_IDX).toSet
    assert(cols === Set("sku", "title", "qty"))
    assert(df.schema.fields.filter(_.name != IngestSource.ROW_IDX)
      .forall(_.dataType.typeName === "string"))
    val rows = df.orderBy(IngestSource.ROW_IDX)
      .select("sku", "title", "qty").collect()
    assert(rows.length === 2) // blank line dropped (csv.reader yields [])
    assert(rows.map(_.getString(0)).toSeq === Seq("a1", "a2"))
    assert(rows.head.getString(2) === "5") // numbers stay strings
  }

  test("csv: DictReader cell semantics — '' is present, a short row's cell is absent") {
    // Reference parsers.py:41-42: csv.DictReader yields '' for a
    // present-but-empty field (kept: `value is not None`) and restval
    // None for a short row's missing trailing field (dropped element).
    // The all-''-cells row is therefore KEPT (the reference inserts an
    // anonymous ''-sku row for it), unlike a blank line.
    val dir = tmpDir("csvcells")
    val p = writeText(dir, "in.csv",
      "sku,title,qty\n,,\nA1,T1\nA2,\"\",9\n")
    val df = IngestSource("csv").read(spark, p)
    val rows = df.orderBy(IngestSource.ROW_IDX)
      .select("sku", "title", "qty").collect()
    assert(rows.length === 3)
    // row 0: all empty strings, none null
    assert((0 to 2).map(rows(0).getString) === Seq("", "", ""))
    // row 1: short row — qty physically absent -> NULL, not ''
    assert(rows(1).getString(0) === "A1" && rows(1).getString(1) === "T1")
    assert(rows(1).isNullAt(2), "short row's missing cell must be NULL")
    // row 2: quoted empty string is present
    assert(rows(2).getString(1) === "")
    assert(rows(2).getString(2) === "9")
  }

  test("csv: '#'-leading lines are DATA, not comments (Python csv has no comments)") {
    // Python's csv module has no comment concept: a row whose first cell
    // starts with '#' is an ordinary data row, and a '#'-leading header
    // names an ordinary column. Univocity's DEFAULT dialect treats '#'
    // as a line comment — left enabled it silently dropped such rows
    // (an unquoted "#1 Best Seller" title in column 0) and returned a
    // null header probe. The shared dialect disables the comment char.
    val dir = tmpDir("csvhash")
    val p = writeText(dir, "in.csv",
      "sku,title\n#1,Best Seller\nA2,#2 pick\n")
    val df = IngestSource("csv").read(spark, p)
    val rows = df.orderBy(IngestSource.ROW_IDX).select("sku", "title").collect()
    assert(rows.length === 2, "a '#'-leading data row must survive")
    assert(rows(0).getString(0) === "#1" && rows(0).getString(1) === "Best Seller")
    assert(rows(1).getString(1) === "#2 pick")

    val dir2 = tmpDir("csvhashhdr")
    val p2 = writeText(dir2, "in.csv", "#tag,sku\nx,A1\n")
    val df2 = IngestSource("csv").read(spark, p2)
    assert(df2.columns.contains("#tag"), "a '#'-leading header is a real column")
    val r2 = df2.select("#tag", "sku").collect()
    assert(r2.length === 1 && r2(0).getString(0) === "x" && r2(0).getString(1) === "A1")
  }

  test("csv: gzip-compressed files parse end-to-end (codec-aware header probe)") {
    // TextInputFormat decompresses .gz data lines transparently; the
    // driver-side header probe must read through the same codec or it
    // parses DEFLATE bytes as the header. Non-splittable is fine — one
    // task per .gz file, the standard Hadoop contract.
    val dir = tmpDir("csvgz")
    val p = java.nio.file.Paths.get(dir, "in.csv.gz")
    val out = new java.util.zip.GZIPOutputStream(
      java.nio.file.Files.newOutputStream(p))
    out.write("sku,title\nA1,Widget\nA2,\"a,b\"\n".getBytes("UTF-8"))
    out.close()
    val df = IngestSource("csv").read(spark, p.toString)
    assert(df.columns.toSet === Set("sku", "title", IngestSource.ROW_IDX))
    val rows = df.orderBy(IngestSource.ROW_IDX).select("sku", "title").collect()
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSeq ===
      Seq(("A1", "Widget"), ("A2", "a,b")))
  }

  test("csv: multi-split parse — header skipped once, file order preserved, last wins") {
    // The positional parser's 100 TB contract, exercised for real: with
    // the split size forced down, one file parses as MANY input splits.
    // Only the line at FILE offset 0 is the header (a line at offset 0
    // of a later SPLIT is data); partition ids follow split offsets, so
    // the partition-prefixed _row_idx reproduces exact file order; and
    // the within-batch last-wins dedup therefore resolves duplicate
    // skus correctly even when the occurrences land in different splits.
    val dir = tmpDir("csvsplits")
    val n = 20000
    val body = (0 until n).map(i => s"S${i % 97},T$i")
    val p = writeText(dir, "in.csv", ("sku,title" +: body).mkString("\n"))
    val conf = spark.sparkContext.hadoopConfiguration
    val key = "mapreduce.input.fileinputformat.split.maxsize"
    val old = Option(conf.get(key))
    conf.set(key, "32768") // ~240 KB file -> ~8 splits
    try {
      val df = IngestSource("csv").read(spark, p)
      assert(df.rdd.getNumPartitions >= 4,
        s"expected a multi-split read, got ${df.rdd.getNumPartitions} partition(s)")
      val rows = df.orderBy(IngestSource.ROW_IDX)
        .select("sku", "title").collect()
      assert(rows.length === n, "every data line survives; only the real header drops")
      assert(rows.map(_.getString(1)).toSeq === body.map(_.split(",")(1)).toSeq,
        "_row_idx must reproduce exact file order across splits")
      // last-wins across split boundaries: for each sku the surviving
      // title is the one from its LAST occurrence in file order
      val deduped = graft.operators.MergeOps.lastNonNullWins(
        df, Seq("sku"), IngestSource.ROW_IDX, Seq("title"))
      val got = deduped.collect().map(r => r.getString(0) -> r.getString(1)).toMap
      val want = (0 until n).map(i => s"S${i % 97}" -> s"T$i").toMap // later wins
      assert(got === want)
    } finally {
      old match { case Some(v) => conf.set(key, v); case None => conf.unset(key) }
    }
  }

  test("csv: invalid UTF-8 aborts the batch, never silently ingests mojibake") {
    // Reference parsers.py:35 decodes the WHOLE upload up front —
    // client_data.decode('utf-8') raises UnicodeDecodeError on any bad
    // byte (a latin-1 export is the classic case) and the service
    // reports the failed batch. Hadoop's Text.toString would substitute
    // U+FFFD and ingest the mangled rows; the source decodes strictly.
    val dir = tmpDir("csvbadutf8")
    val p = java.nio.file.Paths.get(dir, "in.csv")
    val bytes = "sku,title\nA1,caf".getBytes("UTF-8") ++
      Array(0xE9.toByte) ++ "\n".getBytes("UTF-8") // lone latin-1 é
    java.nio.file.Files.write(p, bytes)
    val ex = intercept[Exception] {
      IngestSource("csv").read(spark, p.toString).collect()
    }
    def causes(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: causes(e.getCause))
    assert(causes(ex).exists(m => m != null && m.contains("utf-8")),
      s"expected a decode abort, got: $ex")

    // a bad byte in the HEADER aborts at read() (the probe is strict too)
    val dir2 = tmpDir("csvbadhdr")
    val p2 = java.nio.file.Paths.get(dir2, "in.csv")
    java.nio.file.Files.write(p2,
      "sk".getBytes("UTF-8") ++ Array(0xFF.toByte) ++ ",title\nA,B\n".getBytes("UTF-8"))
    val ex2 = intercept[IllegalArgumentException] {
      IngestSource("csv").read(spark, p2.toString)
    }
    assert(ex2.getMessage.contains("utf-8"))

    // valid multi-byte UTF-8 still reads exactly
    val dir3 = tmpDir("csvutf8ok")
    val p3 = writeText(dir3, "in.csv", "sku,title\nA1,café 中文 ü\n")
    val rows = IngestSource("csv").read(spark, p3).select("title").collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("café 中文 ü"))
  }

  test("property: csv source == DictReader model on random hostile matrices (seeded)") {
    // Generative differential of the WHOLE csv dialect: random header
    // vectors (duplicates, blanks, padded, '#'-leading) and random data
    // matrices (embedded quotes/commas/hashes, empty cells, short rows,
    // long rows, unicode), serialized with csv.writer's minimal quoting,
    // read through CsvSource, and compared cell-for-cell against a
    // hand-rolled DictReader model (dict(zip)+restval, truthy-raw-name
    // aliveness, stripped-name groups with last-PRESENT-wins).
    val rnd = new scala.util.Random(41)
    val headerPool = Seq("sku", "sku ", " sku", "title", "", " ", "#h", "b", "\"q\"")
    val cellPool = Seq("", "a", "b,c", "\"x\"", "#1 pick", " padded ", "ü±",
      "x\"\"y", "5", "a\"b", ",", "trail,")
    def quoteMin(v: String): String =
      if (v.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
        "\"" + v.replace("\"", "\"\"") + "\""
      else v
    def pyStrip(s: String) = graft.functions.Transformers.pyStrip(s)
    (1 to 25).foreach { trial =>
      val hn = 1 + rnd.nextInt(5)
      val headers = Vector.fill(hn)(headerPool(rnd.nextInt(headerPool.size)))
      val nRows = rnd.nextInt(8)
      val data = Vector.fill(nRows) {
        val len = rnd.nextInt(hn + 2) // 0 = blank line, hn+1 = extra field
        Vector.fill(len)(cellPool(rnd.nextInt(cellPool.size)))
      }
      val headerLine = headers.map(quoteMin).mkString(",")
      val dataLines = data.map(_.map(quoteMin).mkString(","))
      val dir = tmpDir(s"csvprop$trial")
      val p = writeText(dir, "in.csv", (headerLine +: dataLines).mkString("\n"))

      // ---- DictReader model ----
      // A header line that serializes to "" reads back as an EMPTY
      // fieldname list (zero columns), not [""].
      val effHeaders = if (headerLine.isEmpty) Vector.empty[String] else headers
      val distinctRaw = effHeaders.distinct.filter(_.nonEmpty)
      val lastPos = distinctRaw.map(r => r -> effHeaders.lastIndexOf(r)).toMap
      val groups: Seq[(String, Seq[Int])] = {
        val seen = scala.collection.mutable.LinkedHashMap.empty[String, Vector[Int]]
        distinctRaw.foreach { r =>
          val s = pyStrip(r)
          if (s.nonEmpty)
            seen.updateWith(s)(v => Some(v.getOrElse(Vector.empty) :+ lastPos(r)))
        }
        seen.toSeq
      }
      // With NO mappable (nonempty-stripped-name) column at all the
      // source short-circuits to zero rows — the DictReader-level rows
      // it skips carry only ''-named elements, whose record_data comes
      // out empty and is skipped uncounted downstream anyway (the
      // behavior-equivalence the e2e differential pins).
      val expectRows: Seq[Seq[String]] =
        if (groups.isEmpty) Nil
        else data.zip(dataLines).flatMap {
          case (cells, line) =>
            if (line.isEmpty) None // csv.writer of a lone '' emits a blank line
            else if (!distinctRaw.exists(r => lastPos(r) < cells.length)) None
            else Some(groups.map { case (_, ps) =>
              ps.reverse.collectFirst { case i if i < cells.length => cells(i) }.orNull
            })
        }

      val df = IngestSource("csv").read(spark, p)
      val gotCols = df.columns.filterNot(_ == IngestSource.ROW_IDX).toSeq
      assert(gotCols === groups.map(_._1), s"trial $trial: columns ($headers)")
      val got = df.orderBy(IngestSource.ROW_IDX)
        .select(gotCols.map(c => col(s"`$c`")): _*)
        .collect()
        .map(r => gotCols.indices.map(i =>
          if (r.isNullAt(i)) null else r.getString(i)))
      assert(got.length === expectRows.length,
        s"trial $trial: row count ($headers / $data)")
      got.zip(expectRows).zipWithIndex.foreach { case ((g, e), i) =>
        assert(g === e, s"trial $trial surviving-row $i ($headers / $data)")
      }
    }
  }

  test("csv: exact-duplicate header masks earlier value under a short row (zip+restval)") {
    // dict(zip(fieldnames, row)) + the restval loop: for EXACT duplicate
    // names only the LAST position counts — DictReader sets d['sku']=None
    // for the short row even though position 0 held a value.
    val dir = tmpDir("csvzip")
    val p = writeText(dir, "in.csv", "sku,sku\nA,B\nC\n")
    val df = IngestSource("csv").read(spark, p)
    val rows = df.orderBy(IngestSource.ROW_IDX).select("sku").collect()
    // row 'C': d={'sku': None} after the restval loop — its only element
    // is value-None, so the reference DROPS the whole row (parsers.py:44)
    assert(rows.length === 1,
      "short row under an exact-duplicate header has zero elements: dropped")
    assert(rows(0).getString(0) === "B")
  }

  test("csv: strip-duplicate headers — last PRESENT value wins, absence does not erase") {
    // 'sku' and 'sku ' are distinct DictReader keys that strip to the
    // same record_data key: the dict comprehension overwrites in header
    // order, but an ABSENT later cell never lands (value-is-None filter),
    // so the earlier present value survives.
    val dir = tmpDir("csvstripdup")
    val p = writeText(dir, "in.csv", "sku,sku \nA,B\nC\n")
    val df = IngestSource("csv").read(spark, p)
    val rows = df.orderBy(IngestSource.ROW_IDX).select("sku").collect()
    assert(rows(0).getString(0) === "B") // later present value wins
    assert(rows(1).getString(0) === "C") // absent later cell keeps earlier
  }

  test("csv: a client column genuinely named _c0 survives the placeholder drop") {
    // Spark names a BLANK header at position i `_ci`; the source must drop
    // only those placeholders, never a real column that happens to be
    // called _c0 (or sit at a different position than its digit suggests).
    val dir = tmpDir("csvc0")
    val p = writeText(dir, "in.csv",
      "_c0,title,,qty\nv1,Widget,junk,5\nv2,Gadget,junk,7\n")
    val df = IngestSource("csv").read(spark, p)
    val cols = df.columns.filterNot(_ == IngestSource.ROW_IDX).toSet
    assert(cols === Set("_c0", "title", "qty")) // blank header (pos 2) dropped
    assert(df.select("_c0").orderBy(IngestSource.ROW_IDX)
      .collect().map(_.getString(0)).toSeq === Seq("v1", "v2"))
  }

  test("csv: duplicate header keeps the LAST column's values (DictReader overwrite)") {
    // Reference parity: csv.DictReader builds a dict per row, so the
    // later of two same-named columns silently wins. Spark instead
    // renames to name+position (sku0, sku2) — the column mapping's
    // source 'sku' would then match nothing and every row became a
    // silent typed-NULL (a sku-less INSERT where the reference upserts).
    val dir = tmpDir("csvdup")
    val p = writeText(dir, "in.csv",
      "sku,title,sku\nA1,T1,B1\nA2,T2,B2\n")
    val df = IngestSource("csv").read(spark, p)
    val cols = df.columns.filterNot(_ == IngestSource.ROW_IDX).toSet
    assert(cols === Set("sku", "title"))
    assert(df.orderBy(IngestSource.ROW_IDX).select("sku", "title")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq ===
      Seq(("B1", "T1"), ("B2", "T2")),
      "the LAST duplicate column's values must win, under the plain name")
    // trimmed duplicates collide too (' sku ' and 'sku' are one name)
    val p2 = writeText(dir, "in2.csv", " sku ,sku\nx,y\n")
    val df2 = IngestSource("csv").read(spark, p2)
    assert(df2.columns.filterNot(_ == IngestSource.ROW_IDX).toSet === Set("sku"))
    assert(df2.select("sku").head().getString(0) === "y")
  }

  test("json lines: primitives kept as strings") {
    val dir = tmpDir("json")
    val p = writeText(dir, "in.json",
      """{"sku": "a1", "qty": 5, "active": true}
        |{"sku": "a2", "qty": 7, "active": false}
        |""".stripMargin)
    val df = IngestSource("json").read(spark, p)
    assert(df.schema("qty").dataType.typeName === "string")
    assert(df.select("sku", "qty", "active").orderBy("sku")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq ===
      Seq(("a1", "5", "true"), ("a2", "7", "false")))
  }

  test("row index is monotone in file order within a partition") {
    val dir = tmpDir("csvord")
    val p = writeText(dir, "in.csv",
      "sku,title\n" + (1 to 100).map(i => s"a$i,t$i").mkString("\n"))
    val idx = IngestSource("csv").read(spark, p)
      .select(IngestSource.ROW_IDX).collect().map(_.getLong(0))
    assert(idx.toSeq === idx.sorted.toSeq)
  }

  test("unknown parser id rejected") {
    intercept[IllegalArgumentException] { IngestSource("xml") }
  }

  test("native XML datasource roundtrips hostile strings losslessly") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val dir = tmpDir("xmlrt")
    val rows = Seq(
      (1L, "a < b & c > d"), (2L, "\"quoted\" & 'apos'"),
      (3L, "tags <doc></doc> inside"), (4L, "plain"))
    rows.toDF("id", "txt").write.mode("overwrite").format("xml")
      .option("rowTag", "doc").option("rootTag", "docs").save(s"$dir/out")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("txt", StringType)))
    val back = spark.read.format("xml").option("rowTag", "doc")
      .schema(schema).load(s"$dir/out")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(back.toSeq === rows)
  }
}
