package graft

import graft.functions.GraftFunctions.{graftDot, graftMinHash, graftNorm2, graftTopK}
import graft.functions.MinHash
import graft.operators.TopK
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Differential tests for the native Catalyst expressions: each one is
  * checked against an independent Spark formulation of the same semantics
  * on seeded-random data, across partial-aggregation boundaries (multiple
  * partitions force serialize/merge paths — the round-2 TopK aliased
  * buffer bug lived exactly there and only for fixed-width pairs).
  */
class NativeExpressionDifferentialSpec extends SparkSpec {

  private val rnd = new scala.util.Random(2024)

  test("graft_topk(fixed-width pairs) == row_number window, many partitions") {
    import spark.implicits._
    val rows = (1 to 500).map(i => (rnd.nextInt(5), rnd.nextInt(1000), i))
    val df = spark.createDataset(rows).repartition(13).toDF("g", "key", "id")
    val viaAgg = df.groupBy(col("g"))
      .agg(graftTopK(struct(col("key"), col("id")), struct(col("key"), col("id")), 7).as("t"))
      .select(col("g"), explode(col("t")).as("r"))
      .select(col("g"), col("r.key").as("key"), col("r.id").as("id"))
    val w = Window.partitionBy(col("g")).orderBy(col("key"), col("id"))
    val viaWindow = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 7).select("g", "key", "id")
    assert(viaAgg.except(viaWindow).count() === 0)
    assert(viaWindow.except(viaAgg).count() === 0)
    assert(viaAgg.count() === viaWindow.count())
  }

  test("graft_topk long-key/long-value (the exactly-sized row shape)") {
    import spark.implicits._
    val rows = (1L to 300L).map(i => (i % 3, rnd.nextLong() % 10000))
    val df = spark.createDataset(rows).repartition(11).toDF("g", "v")
    val viaAgg = df.groupBy(col("g"))
      .agg(graftTopK(col("v"), col("v"), 5).as("t"))
      .select(col("g"), explode(col("t")).as("v"))
    val w = Window.partitionBy(col("g")).orderBy(col("v"))
    val viaWindow = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5).select("g", "v")
    val a = viaAgg.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val b = viaWindow.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(a === b)
  }

  test("TopK.perGroupAgg == TopK.perGroup window formulation") {
    import spark.implicits._
    val rows = (1 to 400).map(i =>
      (s"g${rnd.nextInt(4)}", rnd.nextDouble() * 100, i.toLong))
    val df = spark.createDataset(rows).repartition(9).toDF("g", "score", "id")
    val viaAgg = TopK.perGroupAgg(df, Seq(col("g")),
      struct(negate(col("score")), col("id")), k = 6)
      .select("rn", "g", "score", "id")
    val viaWin = TopK.perGroup(df, Seq(col("g")),
      Seq(col("score").desc, col("id")), k = 6)
      .select("rn", "g", "score", "id")
    assert(viaAgg.except(viaWin).count() === 0)
    assert(viaWin.except(viaAgg).count() === 0)
  }

  test("graft_minhash == explicit per-permutation min over permuted hashes") {
    import spark.implicits._
    val k = 32
    val (a, b) = MinHash.params(k)
    val shingles = (1 to 60).flatMap { doc =>
      (1 to 20).map(s => (doc.toLong, s"sh-${rnd.nextInt(200)}-$s"))
    }
    val df = spark.createDataset(shingles).repartition(7).toDF("id", "shingle")
      .withColumn("h", pmod(xxhash64(col("shingle")), lit(MinHash.MersennePrime)))
    val native = df.groupBy("id").agg(graftMinHash(col("h"), k).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // independent formulation: k aggregate mins of the affine-permuted hash
    val mins = (0 until k).map(i =>
      min(pmod(lit(a(i)) * col("h") + lit(b(i)), lit(MinHash.MersennePrime))).as(s"m$i"))
    val viaAgg = df.groupBy("id").agg(mins.head, mins.tail: _*)
      .collect().map(r => r.getLong(0) -> (1 to k).map(r.getLong(_)).toSeq).toMap
    assert(native.keySet === viaAgg.keySet)
    native.foreach { case (id, sig) => assert(sig === viaAgg(id), s"doc $id") }
  }

  test("graft_minhash on raw xxhash64 input == on pre-reduced input") {
    import spark.implicits._
    // The public SQL surface lets a caller skip the pmod reduction; the
    // aggregate must reduce internally instead of overflowing a_i * h.
    val shingles = (1 to 30).flatMap { doc =>
      (1 to 15).map(s => (doc.toLong, s"sh-${rnd.nextInt(150)}-$s"))
    }
    val df = spark.createDataset(shingles).toDF("id", "shingle")
    val raw = df.withColumn("h", xxhash64(col("shingle")))
      .groupBy("id").agg(graftMinHash(col("h"), 16).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val reduced = df
      .withColumn("h", pmod(xxhash64(col("shingle")), lit(MinHash.MersennePrime)))
      .groupBy("id").agg(graftMinHash(col("h"), 16).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(raw === reduced)
    raw.values.foreach(sig => assert(sig.forall(v => v >= 0 && v < MinHash.MersennePrime)))
  }

  test("graft_simhash == 64 sign-of-bit-sum aggregate columns") {
    import spark.implicits._
    import graft.functions.GraftFunctions.graftSimHash
    val words = (1 to 40).flatMap { doc =>
      (1 to 25).map(w => (doc.toLong, s"word-${rnd.nextInt(120)}-$w"))
    }
    val df = spark.createDataset(words).repartition(5).toDF("id", "w")
      .withColumn("h", xxhash64(col("w")))
    val native = df.groupBy("id").agg(graftSimHash(col("h")).as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // independent formulation: 64 per-bit sign sums assembled into a long
    val bitSums = (0 until 64).map(i =>
      sum(when(expr(s"(h >> $i) & 1") === 1, 1).otherwise(-1)).as(s"_b$i"))
    val assembled = (0 until 64).map(i =>
      when(col(s"_b$i") > 0, lit(1L << i)).otherwise(lit(0L)))
    val viaCols = df.groupBy("id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("id"), assembled.reduce(_.bitwiseOR(_)).as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native === viaCols)
  }

  test("graft_shingles == array_distinct of the HOF shingle composition") {
    import spark.implicits._
    import graft.functions.GraftFunctions.graftShingles
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a b c a b c a b c",            // repeated shingles -> dedup
      "one two",                       // fewer than n words -> empty
      "",                              // empty -> empty
      "   leading and trailing   ",    // space trim
      "\ttab lead keeps empty word token yes", // leading tab edge
      "x y z"                          // exactly n words -> one shingle
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = texts.toDF("id", "text")
    val hof = {
      val ws = split(trim(col("text")), "\\s+")
      array_distinct(
        when(size(ws) >= 3,
          transform(sequence(lit(0), size(ws) - 3),
            i => concat_ws(" ", slice(ws, i + lit(1), lit(3)))))
          .otherwise(array().cast("array<string>")))
    }
    val out = df.select(col("id"),
        graftShingles(col("text"), 3).as("native"), hof.as("reference"))
      .collect()
    out.foreach { r =>
      assert(r.getSeq[String](1) === r.getSeq[String](2), s"id ${r.getLong(0)}")
    }
  }

  test("graft_wordset_count == size(filter(split, isin)) on randomized text") {
    import spark.implicits._
    import graft.functions.GraftFunctions.graftWordSetCount
    val stop = Seq("the", "a", "of", "und", "naïve")
    val alphabet = Vector("the", "a", "of", "und", "naïve", "fox", "42",
      " ", "  ", "\t", "\n", "THE")
    val texts = (0 until 300).map { i =>
      val len = rnd.nextInt(25)
      (i.toLong, (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.size))).mkString(" "))
    }
    val df = texts.toDF("id", "text")
    val hof = size(filter(
      filter(split(trim(lower(col("text"))), "\\s+"), w => length(w) > 0),
      w => w.isin(stop.map(lit): _*)))
    val out = df.select(col("id"),
        graftWordSetCount(lower(col("text")), stop).as("native"), hof.as("reference"))
      .collect()
    out.foreach(r => assert(r.getInt(1) === r.getInt(2), s"id ${r.getLong(0)}"))
  }

  test("graft_shingles == HOF composition on randomized messy text") {
    import spark.implicits._
    import graft.functions.GraftFunctions.graftShingles
    // Random texts over an alphabet that stresses the edge cases every
    // dedup oracle depends on: repeated words (dedup), runs of spaces,
    // tabs/newlines (\s+ but not SQL-trim), unicode, empty strings.
    val alphabet = Vector("fox", "dog", "the", "42", "naïve", "日本", "a-b.",
      " ", "  ", "\t", "\n")
    val texts = (0 until 300).map { i =>
      val len = rnd.nextInt(30)
      (i.toLong, (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.size))).mkString)
    }
    val df = texts.toDF("id", "text")
    val hof = {
      val ws = split(trim(col("text")), "\\s+")
      array_distinct(
        when(size(ws) >= 3,
          transform(sequence(lit(0), size(ws) - 3),
            i => concat_ws(" ", slice(ws, i + lit(1), lit(3)))))
          .otherwise(array().cast("array<string>")))
    }
    val out = df.select(col("id"), col("text"),
        graftShingles(col("text"), 3).as("native"), hof.as("reference"))
      .collect()
    out.foreach { r =>
      assert(r.getSeq[String](2) === r.getSeq[String](3),
        s"id ${r.getLong(0)} text='${r.getString(1)}'")
    }
  }

  test("graft_dot == aggregate(zip_with(...)) on float and double arrays") {
    import spark.implicits._
    val vecs = (1 to 50).map { i =>
      (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat),
        Array.fill(16)(rnd.nextGaussian()))
    }
    val df = spark.createDataset(vecs).toDF("id", "f", "d")
    val ref = expr(
      "aggregate(zip_with(f, d, (x, y) -> CAST(x AS DOUBLE) * y), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")
    val out = df.select(
        graftDot(col("f"), col("d")).as("native"), ref.as("reference"))
      .collect()
    out.foreach(r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
    // norm2 consistency + mismatched lengths take min-length prefix
    val n = df.select(graftNorm2(col("f")).as("n2"),
        graftDot(col("f"), col("f")).as("dd")).head()
    assert(n.getDouble(0) === n.getDouble(1))
    val short = df.select(graftDot(col("f"), slice(col("d"), 1, 8)).as("x"),
        expr("aggregate(zip_with(slice(f, 1, 8), slice(d, 1, 8), (x, y) -> CAST(x AS DOUBLE) * y), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)").as("y"))
      .head()
    assert(math.abs(short.getDouble(0) - short.getDouble(1)) < 1e-12)
  }

  test("graft_simhash_bands == per-combo shift/OR struct composition") {
    import spark.implicits._
    val sigs = (1 to 200).map(_ => rnd.nextLong())
    val df = spark.createDataset(sigs).toDF("simhash").repartition(7)
    for ((pieces, maxH) <- Seq((8, 6), (4, 3), (8, 2))) {
      val width = 64 / pieces
      val shared = pieces - maxH
      val mask = (1L << width) - 1
      val combos = (0 until pieces).combinations(shared).map(_.toSeq).toSeq
      def chunk(p: Int) =
        shiftright(col("simhash"), p * width).bitwiseAND(lit(mask))
      val keyed = combos.zipWithIndex.map { case (c, ci) =>
        c.zipWithIndex
          .map { case (p, i) => shiftleft(chunk(p), i * width) }
          .reduce(_.bitwiseOR(_))
          .bitwiseOR(lit(ci.toLong << 48))
      }
      val out = df.select(col("simhash"),
          graft.functions.GraftFunctions
            .graftSimHashBands(col("simhash"), pieces, maxH).as("native"),
          array(keyed: _*).as("reference"))
        .collect()
      out.foreach { r =>
        assert(r.getSeq[Long](1) === r.getSeq[Long](2),
          s"pieces=$pieces maxH=$maxH simhash=${r.getLong(0)}")
      }
    }
  }

  test("graft_bigram_stats == explode/groupBy composition on messy text") {
    import spark.implicits._
    val vocab = Seq("a", "b", "ab", "The", "THE", "x\ty", "", " ", "\t",
      "word", "word.", "9", "ümlaut")
    val texts = (1 to 300).map { i =>
      (i.toLong, (0 until rnd.nextInt(30))
        .map(_ => vocab(rnd.nextInt(vocab.length)))
        .mkString(if (i % 3 == 0) "  " else " ") +
        (if (i % 5 == 0) "\t" else ""))
    }
    val df = spark.createDataset(texts).toDF("id", "text").repartition(5)
    // Reference: the original relational formulation.
    val ws = split(lower(trim(col("text"))), "\\s+")
    val base = df.select(col("id"), ws.as("_ws"))
      .withColumn("_total", greatest(size(col("_ws")) - 1, lit(0)).cast("long"))
    val grams = base.filter(col("_total") > 0)
      .withColumn("_l", slice(col("_ws"), lit(1), size(col("_ws")) - 1))
      .withColumn("_r", slice(col("_ws"), lit(2), size(col("_ws")) - 1))
      .select(col("id"), explode(arrays_zip(col("_l"), col("_r"))).as("_z"))
      .select(col("id"), concat(col("_z._l"), lit(" "), col("_z._r")).as("_g"))
    val per = grams.groupBy(col("id"), col("_g")).agg(count(lit(1)).as("_c"))
      .groupBy(col("id")).agg(max(col("_c")).as("maxc"),
        sum(col("_c")).as("sumc"), count(lit(1)).as("nd"))
    val ref = base.join(per, Seq("id"), "left")
      .select(col("id"), col("_total"),
        coalesce(col("nd"), lit(0L)).as("nd"),
        coalesce(col("maxc"), lit(0L)).as("maxc"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val native = df.select(col("id"),
        graft.functions.GraftFunctions.graftBigramStats(col("text")).as("s"))
      .select(col("id"), col("s.total_bigrams"), col("s.distinct_bigrams"),
        col("s.max_count"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(native === ref)
  }

  test("graft_minhash_bands / graft_sig_overlap invariants on random signatures") {
    import spark.implicits._
    val sigs = (1 to 150).map(i =>
      (i.toLong, Array.fill(64)(rnd.nextLong())))
    val df = spark.createDataset(sigs).toDF("id", "sig").repartition(6)
    // Band keys: 32 per signature, band id in the high bits, equal
    // slices -> equal keys, differing slices -> (whp) different keys.
    val keys = df.select(col("id"),
        graft.functions.GraftFunctions.graftMinHashBands(col("sig"), 32).as("ks"))
      .collect().map(r => r.getAs[Long]("id") -> r.getSeq[Long](1)).toMap
    assert(keys.values.forall(_.length == 32))
    assert(keys.values.forall(ks =>
      ks.zipWithIndex.forall { case (k, b) => (k >>> 48) == b.toLong }))
    // Same signature -> same keys (determinism across rows/partitions).
    val dup = spark.createDataset(Seq((1L, sigs.head._2), (2L, sigs.head._2)))
      .toDF("id", "sig")
      .select(graft.functions.GraftFunctions.graftMinHashBands(col("sig"), 32).as("ks"))
      .collect().map(_.getSeq[Long](0))
    assert(dup(0) === dup(1))
    // Overlap == the HOF formulation it replaces.
    val pairs = df.as("a").join(df.as("b"), col("a.id") < col("b.id"))
      .limit(200)
      .select(
        graft.functions.GraftFunctions
          .graftSigOverlap(col("a.sig"), col("b.sig")).as("native"),
        expr("aggregate(zip_with(a.sig, b.sig, (p, q) -> if(p = q, 1, 0)), 0, (acc, v) -> acc + v)")
          .as("reference"))
      .collect()
    pairs.foreach(r => assert(r.getInt(0) === r.getInt(1)))
    // Identical signatures overlap fully.
    val self = df.select(graft.functions.GraftFunctions
      .graftSigOverlap(col("sig"), col("sig")).as("o")).collect()
    assert(self.forall(_.getInt(0) == 64))
  }

  test("graft_dot null-element and null-array semantics") {
    import spark.implicits._
    val df = Seq(
      (Array[java.lang.Double](1.0, null, 3.0), Array[java.lang.Double](2.0, 5.0, 4.0)),
      (null, Array[java.lang.Double](1.0, 1.0, 1.0))
    ).toDF("a", "b")
    val out = df.select(graftDot(col("a"), col("b")).as("d")).collect()
    assert(out(0).getDouble(0) === 14.0) // null element contributes 0
    assert(out(1).isNullAt(0))           // null array -> null
  }

  test("graft_normalize_text: composed == decomposed, case/ws folded") {
    import spark.implicits._
    val composed = "Caf\u00e9  R\u00c9SUM\u00c9"
    val decomposed = "Cafe\u0301  R\u00c9SUME\u0301"
    val df = Seq(
      (1L, composed + "\t x"),
      (2L, decomposed + "\n x"),
      (3L, "  plain   ascii  "),
      (4L, "ZÜrich señor naïve"),
      (5L, "한국어 Ж")  // Hangul + Cyrillic pass-through
    ).toDF("id", "t")
    val got = df.select(col("id"),
        graft.functions.GraftFunctions.graftNormalizeText(col("t")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) === "cafe resume x")
    assert(got(2L) === got(1L)) // NFC folds the decomposed spelling
    assert(got(3L) === "plain ascii")
    assert(got(4L) === "zurich senor naive")
    assert(got(5L) === "한국어 ж") // marks kept, case folded
    // null propagates, and the SQL registration path works too
    val viaSql = spark.sql(
      "SELECT graft_normalize_text('À  b') AS n").head().getString(0)
    assert(viaSql === "a b")
  }

  test("graft_edit_within1 == levenshtein(a, b, 1) on randomized pairs") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    def word() =
      (1 to (1 + rnd.nextInt(8))).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    // random pairs over a 3-letter alphabet (collision-rich) plus
    // directed hand cases for every branch
    val pairs = (1 to 400).map(_ => (word(), word())) ++ Seq(
      ("abc", "abc"), ("abc", "abd"), ("abc", "ab"), ("ab", "abc"),
      ("abc", "bc"), ("abc", "acb"), ("", ""), ("", "a"), ("", "ab"),
      ("aa", "a"), ("aba", "ab"), ("ab", "ba"))
    val df = pairs.toDF("a", "b")
    val diff = df.select(
        graft.functions.GraftFunctions.graftEditWithin1(col("a"), col("b")).as("ours"),
        levenshtein(col("a"), col("b"), 1).as("builtin"))
      .filter(col("ours") =!= col("builtin")).count()
    assert(diff === 0)
    // SQL registration path
    val viaSql2 = spark.sql(
      "SELECT graft_edit_within1('kitten', 'sitten') AS d").head().getInt(0)
    assert(viaSql2 === 1)
  }

  test("graft_word_hash == the SQL fold it replaced, incl. astral code points") {
    import graft.functions.GraftFunctions.graftWordHash
    import spark.implicits._
    // the replaced formulation: aggregate over an empty-regex split —
    // Java regex keeps a surrogate pair as ONE element, ascii() returns
    // its code point, so the fold steps per code point
    val words = Seq("alpha", "x", "", "café", "ab𝄞c").toDF("w")
    val got = words.select(col("w"), graftWordHash(col("w")).as("native"),
        aggregate(
          filter(split(col("w"), ""), s => length(s) > 0),
          lit(0L),
          (acc, ch) => pmod(acc * 131L + ascii(ch), lit(1000003L))).as("sql"))
      .collect()
    got.foreach(r => assert(r.getLong(1) === r.getLong(2), s"word ${r.getString(0)}"))
    // hand value for the astral case: cps 97, 98, 119070, 99
    val exp = Seq(97L, 98L, 119070L, 99L)
      .foldLeft(0L)((a, c) => (a * 131L + c) % 1000003L)
    assert(got.find(_.getString(0) == "ab𝄞c").get.getLong(1) === exp)
  }

  test("graft_char_grams windows by code points, not UTF-16 units") {
    import graft.functions.GraftFunctions.graftCharGrams
    import spark.implicits._
    val g = Seq("a𝄞b c").toDF("t")
      .select(graftCharGrams(col("t"), 3, 0).as("g")).head().getSeq[String](0)
    // canonical "a𝄞b c" = 5 code points -> 3 trigrams, the astral char
    // counted as ONE character in every window
    assert(g === Seq("a𝄞b", "𝄞b ", "b c"))
    // truncation cuts on a code-point boundary, never mid-surrogate
    val t = Seq("𝄞𝄞𝄞𝄞").toDF("t")
      .select(graftCharGrams(col("t"), 3, 3).as("g")).head().getSeq[String](0)
    assert(t === Seq("𝄞𝄞𝄞"))
  }
}
