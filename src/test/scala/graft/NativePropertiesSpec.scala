package graft

import graft.functions.GraftFunctions._
import org.apache.spark.sql.functions._

/** Differential PROPERTY tests for the native expressions: hundreds of
  * deterministically generated inputs per property, each evaluated
  * through the real codegen path (one DataFrame per property — the
  * generated cases ride a single job) and compared against an
  * independent slow reference implementation written straight from the
  * documented contract. Complements the example-based specs and the
  * oracle gates: generated inputs reach the edge interactions
  * (whitespace runs, tie collisions, length-off-by-one alignments,
  * astral code points) that hand-picked examples miss.
  *
  * Generation is seeded `scala.util.Random`, NOT randomized per run — a
  * property that fails must fail on every run with the same input, or
  * CI flakes train people to re-run instead of fix.
  */
class NativePropertiesSpec extends SparkSpec {

  // -------------------------------------------------------------------
  // EditWithin1 vs full Levenshtein DP (the documented levenshtein(a,b,1)
  // contract, UTF-16-unit distances)
  // -------------------------------------------------------------------
  private def levenshtein(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("property: graftEditWithin1 == sign of bounded Levenshtein on generated pairs") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // tiny alphabet so one-edit pairs collide with equal pairs often
    def word(n: Int): String = Seq.fill(n)("abµ".charAt(rnd.nextInt(3))).mkString
    def mutate(s: String): String = {
      if (s.isEmpty) return "a"
      rnd.nextInt(3) match {
        case 0 => // substitute
          val i = rnd.nextInt(s.length)
          s.substring(0, i) + "abµc".charAt(rnd.nextInt(4)) + s.substring(i + 1)
        case 1 => // insert
          val i = rnd.nextInt(s.length + 1)
          s.substring(0, i) + "abµc".charAt(rnd.nextInt(4)) + s.substring(i)
        case 2 => // delete
          val i = rnd.nextInt(s.length)
          s.substring(0, i) + s.substring(i + 1)
      }
    }
    val pairs = (1 to 400).map { _ =>
      val a = word(rnd.nextInt(8))
      val b = rnd.nextInt(4) match {
        case 0 => a
        case 1 => mutate(a)
        case 2 => mutate(mutate(a))
        case 3 => word(rnd.nextInt(8))
      }
      (a, b)
    } :+ (("", "")) :+ (("", "a")) :+ (("ab", ""))
    val got = pairs.toDF("a", "b")
      .withColumn("d", graftEditWithin1(col("a"), col("b")))
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    got.foreach { case (a, b, d) =>
      val lev = levenshtein(a, b)
      val want = if (lev == 0) 0 else if (lev == 1) 1 else -1
      assert(d === want, s"editWithin1('$a','$b') = $d, Levenshtein $lev")
    }
  }

  // -------------------------------------------------------------------
  // WordShingles vs the documented SQL composition (ASCII-space trim,
  // \s+ split with trailing empties kept, first-occurrence dedup)
  // -------------------------------------------------------------------
  private def refShingles(text: String, n: Int): Seq[String] = {
    val s = text.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
    if (s.isEmpty) return Seq.empty
    val words = s.split("\\s+", -1)
    if (words.length < n) return Seq.empty
    words.sliding(n).map(_.mkString(" ")).toSeq.distinct
  }

  test("property: graftShingles == trim/split/slide/distinct reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(12)
    val ws = Seq(" ", "  ", "\t", "\n", " \t ")
    val vocab = Seq("a", "b", "ab", "µx")
    val texts = (1 to 300).map { _ =>
      val n = rnd.nextInt(8)
      val body = Seq.fill(n)(vocab(rnd.nextInt(vocab.size)))
        .mkString(ws(rnd.nextInt(ws.size)))
      // leading/trailing whitespace of both kinds exercises the
      // ASCII-space-only trim vs regex-split interaction
      (if (rnd.nextBoolean()) " " else "\t") + body +
        (if (rnd.nextBoolean()) " " else "\n")
    } :+ "" :+ "   " :+ "\t\t" :+ "one"
    for (n <- Seq(1, 2, 3)) {
      val got = texts.toDF("t")
        .withColumn("sh", graftShingles(col("t"), n))
        .collect().map(r => (r.getString(0), r.getSeq[String](1)))
      got.foreach { case (t, sh) =>
        assert(sh === refShingles(t, n),
          s"shingles(${t.replace("\t", "\\t").replace("\n", "\\n")}, $n)")
      }
    }
  }

  // -------------------------------------------------------------------
  // KarpRabinHash vs a code-point fold (astral chars step ONE code
  // point, not two UTF-16 units — the documented contract)
  // -------------------------------------------------------------------
  test("property: graftWordHash == base-131 code-point fold") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val astral = new String(Character.toChars(0x1F600))
    val chars = Seq("a", "z", "0", "µ", "齐", astral)
    val words = (1 to 200).map(_ =>
      Seq.fill(rnd.nextInt(10))(chars(rnd.nextInt(chars.size))).mkString) :+ ""
    val got = words.toDF("w")
      .withColumn("h", graftWordHash(col("w")))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    got.foreach { case (w, h) =>
      var acc = 0L
      w.codePoints().forEach(cp => acc = (acc * 131L + cp) % 1000003L)
      assert(h === acc, s"wordHash('$w')")
    }
  }

  // -------------------------------------------------------------------
  // DotProduct vs left-to-right sequential sum; min-length truncation
  // is the documented semantics (callers validate dims)
  // -------------------------------------------------------------------
  test("property: graftDot == sequential zip sum, exactly, at any length pair") {
    import spark.implicits._
    val rnd = new scala.util.Random(14)
    val rows = (1 to 200).map { _ =>
      val la = rnd.nextInt(6)
      val lb = rnd.nextInt(6)
      (Array.fill(la)(rnd.nextGaussian()), Array.fill(lb)(rnd.nextGaussian()))
    }
    val got = rows.toDF("a", "b")
      .withColumn("d", graftDot(col("a"), col("b")))
      .collect().map(r =>
        (r.getSeq[Double](0), r.getSeq[Double](1), r.getDouble(2)))
    got.foreach { case (a, b, d) =>
      var s = 0.0
      a.zip(b).foreach { case (x, y) => s += x * y }
      assert(d === s, s"dot over ${a.length}x${b.length}")
    }
  }

  // -------------------------------------------------------------------
  // SignatureOverlap vs zip-equality count
  // -------------------------------------------------------------------
  test("property: graftSigOverlap == equal-position count") {
    import spark.implicits._
    val rnd = new scala.util.Random(15)
    val rows = (1 to 200).map { _ =>
      val n = rnd.nextInt(8) + 1
      val a = Array.fill(n)(rnd.nextInt(3).toLong)
      // half the pairs share a prefix so agreements cluster
      val b = a.zipWithIndex.map { case (v, i) =>
        if (rnd.nextBoolean()) v else rnd.nextInt(3).toLong
      }
      (a, b)
    }
    val got = rows.toDF("a", "b")
      .withColumn("o", graftSigOverlap(col("a"), col("b")))
      .collect().map(r => (r.getSeq[Long](0), r.getSeq[Long](1), r.getInt(2)))
    got.foreach { case (a, b, o) =>
      assert(o === a.zip(b).count { case (x, y) => x == y })
    }
  }

  // -------------------------------------------------------------------
  // TopKRows vs sortBy.take(k) — unique keys (equal-key survivorship is
  // deliberately unspecified; gate callers use struct keys for total
  // orders)
  // -------------------------------------------------------------------
  test("property: graftTopK == sort-take on unique keys") {
    import spark.implicits._
    val rnd = new scala.util.Random(16)
    for (trial <- 1 to 5) {
      val keys = rnd.shuffle((1L to 40L).toList).take(20 + rnd.nextInt(20))
      val rows = keys.map(k => (k, s"v$k"))
      val got = rows.toDF("k", "v")
        .agg(graftTopK(col("k"), col("v"), 5).as("top"))
        .head().getSeq[String](0)
      val want = rows.sortBy(_._1).take(5).map(_._2)
      assert(got === want, s"trial $trial")
    }
  }

  // -------------------------------------------------------------------
  // HeavyHitters: the Misra-Gries guarantees, not a point answer —
  // every item with true count > spilled is present, and
  // est <= true <= est + spilled for every reported item
  // -------------------------------------------------------------------
  test("property: graftHeavyHitters satisfies the Misra-Gries guarantees") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    for (trial <- 1 to 3) {
      // Zipf-ish: item i appears ~ 600 / (i + 1) times
      val stream = rnd.shuffle((0 until 30).flatMap(i =>
        Seq.fill(600 / (i + 1))(s"item$i")).toList)
      val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val row = stream.toDF("item")
        .agg(graftHeavyHitters(col("item"), 8).as("hh"))
        .select(col("hh.spilled"), col("hh.items")).head()
      val spilled = row.getLong(0)
      val items = row.getSeq[org.apache.spark.sql.Row](1)
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      truth.foreach { case (item, n) =>
        if (n > spilled)
          assert(items.contains(item),
            s"trial $trial: '$item' (true $n > spilled $spilled) missing")
      }
      items.foreach { case (item, est) =>
        val n = truth(item)
        assert(est <= n && n <= est + spilled,
          s"trial $trial: '$item' est $est outside [${n - spilled}, $n]")
      }
    }
  }

  // -------------------------------------------------------------------
  // SimHash combination banding: for configs whose packed keys carry
  // comboId and chunk bits without overlap (shared*width <= 48), two
  // fingerprints share a band key IFF their differing bits span at most
  // maxHamming chunks — the exact pigeonhole guarantee the sub-quadratic
  // Hamming join rests on, in both directions
  // -------------------------------------------------------------------
  test("property: graftSimHashBands share a key iff flipped chunks <= maxHamming") {
    import spark.implicits._
    val rnd = new scala.util.Random(19)
    for ((pieces, maxH) <- Seq((8, 2), (4, 2))) {
      val width = 64 / pieces
      val rows = (1 to 150).map { _ =>
        val f1 = rnd.nextLong()
        val nFlips = rnd.nextInt(2 * maxH + 1)
        val bits = rnd.shuffle((0 until 64).toList).take(nFlips)
        val f2 = bits.foldLeft(f1)((f, b) => f ^ (1L << b))
        val flippedChunks = bits.map(_ / width).distinct.size
        (f1, f2, flippedChunks <= maxH)
      }
      val got = rows.toDF("f1", "f2", "want")
        .withColumn("share", arrays_overlap(
          graftSimHashBands(col("f1"), pieces, maxH),
          graftSimHashBands(col("f2"), pieces, maxH)))
        .collect()
      got.foreach { r =>
        assert(r.getBoolean(3) === r.getBoolean(2),
          s"pieces=$pieces h=$maxH f1=${r.getLong(0)} f2=${r.getLong(1)}: " +
            s"share=${r.getBoolean(3)} expected=${r.getBoolean(2)}")
      }
    }
  }

  // -------------------------------------------------------------------
  // MinHash banding: equal band rows => equal band key (completeness —
  // what candidate recall rests on); with this seeded generator, bands
  // differing in some row never collide (64-bit mixed keys)
  // -------------------------------------------------------------------
  test("property: graftMinHashBands agree per band iff the band's rows agree") {
    import spark.implicits._
    val rnd = new scala.util.Random(20)
    val bands = 4
    val r = 4
    val rows = (1 to 150).map { _ =>
      val a = Array.fill(bands * r)(rnd.nextInt(50).toLong)
      val b = a.clone()
      // corrupt a random subset of bands by one row each
      val dirty = (0 until bands).filter(_ => rnd.nextBoolean())
      dirty.foreach(j => b(j * r + rnd.nextInt(r)) += 1000L)
      (a, b, (0 until bands).map(j => !dirty.contains(j)))
    }
    val got = rows.toDF("a", "b", "want")
      .select(graftMinHashBands(col("a"), bands).as("ka"),
        graftMinHashBands(col("b"), bands).as("kb"), col("want"))
      .collect()
    got.foreach { row =>
      val ka = row.getSeq[Long](0); val kb = row.getSeq[Long](1)
      val want = row.getSeq[Boolean](2)
      (0 until bands).foreach(j =>
        assert((ka(j) == kb(j)) === want(j), s"band $j"))
    }
  }

  // -------------------------------------------------------------------
  // MinHash signatures: a function of the hash MULTISET's distinct
  // values — invariant under input order and duplication (min is
  // commutative and idempotent), which is what makes per-batch index
  // increments equal a from-scratch build
  // -------------------------------------------------------------------
  test("property: graftMinHash is order- and duplication-invariant") {
    import spark.implicits._
    val rnd = new scala.util.Random(21)
    for (trial <- 1 to 5) {
      val hashes = Seq.fill(30)(rnd.nextLong())
      val shuffled = rnd.shuffle(hashes)
      val duplicated = rnd.shuffle(hashes ++ hashes.take(10))
      def sig(hs: Seq[Long]): Seq[Long] =
        hs.toDF("h").agg(graftMinHash(col("h"), 16).as("s"))
          .head().getSeq[Long](0)
      val base = sig(hashes)
      assert(sig(shuffled) === base, s"trial $trial: order changed the signature")
      assert(sig(duplicated) === base, s"trial $trial: duplicates changed the signature")
    }
  }

  // -------------------------------------------------------------------
  // Two independent sign-LSH bucket implementations (the literal-plane
  // codegen fold used as a join key vs the native array expression used
  // as a probe filter) must agree — they share one hyperplane source
  // and drifting apart would silently split every bucketed join
  // -------------------------------------------------------------------
  test("property: hyperplaneBucket == graftLshBuckets table 0") {
    import spark.implicits._
    val rnd = new scala.util.Random(22)
    val dim = 16
    val planes = 8
    val rows = (1 to 100).map(_ => Tuple1(Array.fill(dim)(rnd.nextGaussian())))
    val got = rows.toDF("v")
      .withColumn("scalar",
        graft.operators.Similarity.hyperplaneBucket(col("v"), planes, dim))
      .withColumn("native",
        element_at(graftLshBuckets(col("v"), planes, 1, dim), 1))
      .collect()
    got.foreach(r => assert(r.getLong(1) === r.getLong(2)))
  }

  // -------------------------------------------------------------------
  // GopherNgramStats vs a brute-force reference: topN as a max over a
  // multiset, dupN as a SET-of-covered-character-indexes union — an
  // independent formulation of the production code's running-max sweep
  // -------------------------------------------------------------------
  private def refNgramStats(text: String): Seq[Long] = {
    val words = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
    if (words.isEmpty) return Seq.fill(10)(0L)
    val cs = words.mkString(" ")
    val starts = words.scanLeft(0)((p, w) => p + w.length + 1).init
    val ends = starts.zip(words).map { case (s, w) => s + w.length }
    val out = scala.collection.mutable.ArrayBuffer[Long](cs.length.toLong)
    for (n <- 2 to 4) {
      val grams = (0 to words.length - n)
        .map(i => cs.substring(starts(i), ends(i + n - 1)))
      out += (if (grams.isEmpty) 0L
        else grams.groupBy(identity)
          .map { case (g, occ) => occ.size.toLong * g.length }.max)
    }
    for (n <- 5 to 10) {
      val idx = (0 to words.length - n)
      val counts = idx.groupBy(i => cs.substring(starts(i), ends(i + n - 1)))
        .map { case (g, is) => g -> is.size }
      val covered = scala.collection.mutable.Set.empty[Int]
      idx.foreach { i =>
        if (counts(cs.substring(starts(i), ends(i + n - 1))) > 1)
          (starts(i) until ends(i + n - 1)).foreach(covered += _)
      }
      out += covered.size.toLong
    }
    out.toSeq
  }

  test("property: graftNgramRepStats == brute-force character-mass reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val vocab = Seq("aa", "B", "ccc", "dd")
    val texts = (1 to 150).map { _ =>
      val n = rnd.nextInt(25)
      val base = Seq.fill(n)(vocab(rnd.nextInt(vocab.size)))
      // repetition-heavy tail: append a repeated block so dup5..10 fire
      val block = Seq.fill(rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size)))
      val all = base ++ block ++ block
      all.mkString(Seq(" ", "  ", "\t")(rnd.nextInt(3)))
    } :+ "" :+ "one" :+ "a a a a a a a a a a a a"
    val fields = NgramRepUtil_fields
    val got = texts.toDF("t")
      .select(col("t"), graftNgramRepStats(col("t")).as("st"))
      .select(col("t") +: fields.map(f => col(s"st.$f")): _*)
      .collect()
    got.foreach { r =>
      val want = refNgramStats(r.getString(0))
      val have = fields.indices.map(i => r.getLong(i + 1))
      assert(have === want,
        s"ngram stats diverged on '${r.getString(0).take(60)}'")
    }
  }

  private def NgramRepUtil_fields: Seq[String] =
    graft.functions.NgramRepUtil.schema.fieldNames.toSeq

  // -------------------------------------------------------------------
  // BigramStats vs a direct multiset reference (empty words KEPT — the
  // documented explode-form parity)
  // -------------------------------------------------------------------
  test("property: graftBigramStats == multiset reference with empty words kept") {
    import spark.implicits._
    val rnd = new scala.util.Random(24)
    val vocab = Seq("x", "YY", "z")
    val texts = (1 to 150).map { _ =>
      val body = Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
        .mkString(Seq(" ", "\t", "  ")(rnd.nextInt(3)))
      (if (rnd.nextBoolean()) "\t" else "") + body +
        (if (rnd.nextBoolean()) "\n" else "")
    } :+ "" :+ " " :+ "solo"
    val got = texts.toDF("t")
      .select(col("t"), graftBigramStats(col("t")).as("st"))
      .select(col("t"), col("st.total_bigrams"), col("st.distinct_bigrams"),
        col("st.max_count"))
      .collect()
    got.foreach { r =>
      val s = r.getString(0).dropWhile(_ == ' ').reverse.dropWhile(_ == ' ')
        .reverse.toLowerCase
      val ws = s.split("\\s+", -1) // empties kept
      val (tot, dis, mx) =
        if (ws.length < 2) (0L, 0L, 0L)
        else {
          val grams = ws.sliding(2).map(_.mkString(" ")).toSeq
          (grams.size.toLong,
            grams.distinct.size.toLong,
            grams.groupBy(identity).values.map(_.size).max.toLong)
        }
      assert((r.getLong(1), r.getLong(2), r.getLong(3)) === ((tot, dis, mx)),
        s"bigram stats diverged on '${r.getString(0).replace("\t", "\\t")
          .replace("\n", "\\n")}'")
    }
  }

  // -------------------------------------------------------------------
  // WordPiece MaxMatch vs an independently written greedy reference,
  // over generated vocabularies and words (two-letter alphabet so
  // prefix collisions are dense)
  // -------------------------------------------------------------------
  test("property: WordPieceSegmentUtil == independent greedy reference") {
    import graft.functions.WordPieceSegmentUtil
    val rnd = new scala.util.Random(25)
    def refSegment(word: String, vocab: Set[String], maxLen: Int): Seq[String] = {
      def go(pos: Int, acc: List[String]): Seq[String] =
        if (pos >= word.length) acc.reverse
        else {
          val cands = (math.min(maxLen, word.length - pos) to 1 by -1).iterator
            .map { l =>
              val raw = word.substring(pos, pos + l)
              if (pos == 0) raw else "##" + raw
            }.find(vocab.contains)
          cands match {
            case None => Seq(WordPieceSegmentUtil.Unk)
            case Some(p) =>
              go(pos + p.length - (if (pos == 0) 0 else 2), p :: acc)
          }
        }
      if (word.isEmpty) Seq.empty else go(0, Nil)
    }
    for (trial <- 1 to 100) {
      val pieces = Seq("a", "b", "ab", "ba", "aab", "abb")
      val vocabSet = (pieces.filter(_ => rnd.nextBoolean()) ++
        pieces.map("##" + _).filter(_ => rnd.nextBoolean())).toSet
      if (vocabSet.nonEmpty) {
        val hs = new java.util.HashSet[String]()
        vocabSet.foreach(hs.add)
        val maxLen = 1 + rnd.nextInt(3)
        val word = Seq.fill(rnd.nextInt(10))("ab".charAt(rnd.nextInt(2))).mkString
        val got = WordPieceSegmentUtil.segment(word, hs, maxLen).toSeq
        val want = refSegment(word, vocabSet, maxLen)
        assert(got === want, s"trial $trial word='$word' vocab=$vocabSet maxLen=$maxLen")
        // invariants on the success path: membership + reassembly
        if (got != Seq(WordPieceSegmentUtil.Unk)) {
          assert(got.forall(vocabSet.contains))
          assert(got.zipWithIndex.map { case (p, i) =>
            if (i == 0) p else p.stripPrefix("##")
          }.mkString === word)
        }
      }
    }
  }

  // -------------------------------------------------------------------
  // Unigram-LM segmentation: always reassembles; on the DP path every
  // piece is in the table and NO randomly generated valid segmentation
  // scores higher (optimality spot-check without duplicating the DP);
  // unknown characters take the per-character fallback
  // -------------------------------------------------------------------
  test("property: UnigramSegmentUtil reassembles, is table-valid, and beats random splits") {
    import graft.functions.UnigramSegmentUtil
    val rnd = new scala.util.Random(26)
    for (trial <- 1 to 60) {
      val pieces = Seq("a", "b", "ab", "ba", "aa", "bb", "aba").distinct
      val lp = new java.util.HashMap[String, java.lang.Long]()
      val score = scala.collection.mutable.Map.empty[String, Long]
      pieces.foreach { p =>
        val s = -(1L + rnd.nextInt(2000000)) // 10^6-scaled negative log prob
        lp.put(p, s); score(p) = s
      }
      val maxLen = 3
      val word = Seq.fill(1 + rnd.nextInt(9))("ab".charAt(rnd.nextInt(2))).mkString
      val got = UnigramSegmentUtil.segment(word, lp, maxLen).toSeq
      assert(got.mkString === word, s"trial $trial: no reassembly for '$word'")
      assert(got.forall(score.contains), s"trial $trial: piece outside the table")
      val gotScore = got.map(score).sum
      // random valid segmentations must never beat the DP result
      def randomSplit(w: String): Option[Seq[String]] = {
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var pos = 0
        while (pos < w.length) {
          val ls = (1 to math.min(maxLen, w.length - pos))
            .filter(l => score.contains(w.substring(pos, pos + l)))
          if (ls.isEmpty) return None
          val l = ls(rnd.nextInt(ls.size))
          out += w.substring(pos, pos + l)
          pos += l
        }
        Some(out.toSeq)
      }
      (1 to 30).foreach { _ =>
        randomSplit(word).foreach { alt =>
          assert(alt.map(score).sum <= gotScore,
            s"trial $trial: $alt (${alt.map(score).sum}) beats DP $got ($gotScore)")
        }
      }
      // unknown character: per-character fallback, still reassembling
      val fb = UnigramSegmentUtil.segment(word + "z", lp, maxLen).toSeq
      assert(fb.mkString === word + "z" && fb.forall(_.length == 1),
        s"trial $trial: fallback shape")
    }
  }

  // -------------------------------------------------------------------
  // Coreset's distributed d2 and its driver-side scalar mirror must
  // agree BIT-FOR-BIT (CoresetStream re-checks distributed survivors on
  // the driver — any divergence would flap admission decisions)
  // -------------------------------------------------------------------
  test("property: Coreset.d2 (codegen) == d2Scalar (driver) bit-for-bit") {
    import spark.implicits._
    import graft.operators.Coreset
    val rnd = new scala.util.Random(30)
    val dim = 16
    val center = Array.fill(dim)(rnd.nextGaussian())
    val rows = (1 to 150).map { i =>
      // include near-center points where cancellation is worst
      val v = if (i % 3 == 0) center.map(_ + rnd.nextGaussian() * 1e-8)
        else Array.fill(dim)(rnd.nextGaussian())
      (i.toLong, v)
    }
    val got = rows.toDF("id", "v")
      .withColumn("d2", Coreset.d2(col("v"), typedLit(center.toSeq)))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    rows.foreach { case (id, v) =>
      val want = Coreset.d2Scalar(v, center)
      assert(java.lang.Double.doubleToLongBits(got(id)) ===
        java.lang.Double.doubleToLongBits(want),
        s"id $id: distributed ${got(id)} != driver $want")
    }
  }

  // -------------------------------------------------------------------
  // NormalizeText: idempotence — a canonicalizer that moves on a second
  // application is not canonical
  // -------------------------------------------------------------------
  test("property: graftNormalizeText is idempotent on generated unicode text") {
    import spark.implicits._
    val rnd = new scala.util.Random(18)
    val pieces = Seq("Héllo", "WORLD", "über", "naïve", "  ", "\t", "a\u0301",
      "ＡＢ", "ﬁsh", "x", "齐大", "\u00A0", "ŒUF")
    val texts = (1 to 200).map(_ =>
      Seq.fill(rnd.nextInt(6))(pieces(rnd.nextInt(pieces.size))).mkString) :+ ""
    val rows = texts.toDF("t")
      .withColumn("n1", graftNormalizeText(col("t")))
      .withColumn("n2", graftNormalizeText(graftNormalizeText(col("t"))))
      .collect()
    rows.foreach { r =>
      assert(r.getString(1) === r.getString(2),
        s"normalize not idempotent on '${r.getString(0)}'")
    }
  }
}
