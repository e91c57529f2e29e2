package graft

import graft.functions.Transformers
import graft.operators._
import graft.sources.AvroIO
import graft.streaming.EventStreams
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared oracle-SQL builders (stoplists, BPE replay CTEs, ingest e2e replay).
  *
  * One slice of the SparkEntry driver contract, split from the former
  * 11 kLoC single file purely for review ergonomics — ZERO behavior
  * change: every member keeps its definition verbatim (visibility
  * widened to private[graft] so the sibling slices still see it), and
  * the self-type pins the mix-in to the SparkEntry object itself.
  */
private[graft] trait SparkEntryOracleHelpers { this: SparkEntry.type =>

  private[graft] val stopSql = stopList.map(w => s"'$w'").mkString(", ")

  private[graft] def inList(ws: Seq[String]): String = ws.map(w => s"'$w'").mkString(", ")

  /** DuckDB REPLAY of [[operators.TermIndex.trainBpe]] — the shared CTE
    * chain for the trained-BPE oracles: `v0` is the character-bracketed
    * vocabulary (each word's symbols as `[s][y][m]`, legal because the
    * trainer's word filter keeps brackets out of the alphabet), then per
    * iteration k: `p{k}` counts adjacent symbol pairs freq-weighted,
    * `m{k}` takes the (count DESC, left, right) argmax, and `v{k}`
    * applies the merge with a plain left-to-right `replace` — the same
    * greedy non-overlapping rule as the Spark-side fold, because
    * non-overlapping string replace on the bracket encoding IS that
    * rule.
    *
    * Every vocabulary/merge CTE is `AS MATERIALIZED`: each `v{k}` is
    * referenced twice (pair counts AND the next vocabulary), so plain
    * inlining would re-evaluate the whole chain 2^n times — the hint
    * keeps the replay linear in the merge budget.
    */
  private[graft] def bpeReplayCtes(n: Int): String = {
    val sb = new StringBuilder
    sb.append(
      """WITH occ AS (SELECT unnest(list_filter(
        |      string_split_regex(trim(lower(text)), '\s+'),
        |      x -> len(x) > 0)) AS word FROM documents),
        |filt AS (SELECT word FROM occ
        |  WHERE regexp_matches(word, '^[a-z0-9]+$')),
        |v0 AS MATERIALIZED (SELECT word,
        |    regexp_replace(word, '(.)', '[\1]', 'g') AS seq,
        |    count(*) AS freq FROM filt GROUP BY 1, 2)""".stripMargin)
    for (k <- 1 to n) {
      sb.append(s""",
        |p$k AS MATERIALIZED (SELECT s.syms[t.i] AS l, s.syms[t.i + 1] AS r,
        |    sum(s.freq) AS cnt
        |  FROM (SELECT string_split(trim(seq, '[]'), '][') AS syms, freq
        |        FROM v${k - 1}) s, unnest(range(1, len(s.syms))) AS t(i)
        |  GROUP BY 1, 2),
        |m$k AS MATERIALIZED (SELECT l, r, cnt FROM p$k
        |  ORDER BY cnt DESC, l, r LIMIT 1),
        |v$k AS MATERIALIZED (SELECT v.word, replace(v.seq,
        |    '[' || m.l || '][' || m.r || ']',
        |    '[' || m.l || m.r || ']') AS seq, v.freq
        |  FROM v${k - 1} v, m$k m)""".stripMargin)
    }
    sb.toString
  }

  /** WordPiece training replay in DuckDB — [[bpeReplayCtes]] plus the
    * likelihood scoring rule: word symbol sequences travel as
    * `[sym][sym]` bracket strings with '##' continuation prefixes
    * (symbols are ^[a-z0-9]+$ by the trainer's word filter, so neither
    * brackets nor the '#' prefix can collide with symbol text); each
    * round k recounts symbols (wsc) AND adjacent pairs (wp) from the
    * current vocabulary, scores (cnt * 10^9) // (cl * cr) — DuckDB `//`
    * floors exactly like Spark `div` on non-negative integers — takes
    * the (score DESC, l, r) argmax (wm), and applies the merge with the
    * WordPiece join rule merged = l ++ r-without-'##' (wv).
    */
  private[graft] def wpReplayCtes(n: Int): String = {
    val sb = new StringBuilder
    sb.append(
      """WITH wocc AS (SELECT unnest(list_filter(
        |      string_split_regex(trim(lower(text)), '\s+'),
        |      x -> len(x) > 0)) AS word FROM documents),
        |wfilt AS (SELECT word FROM wocc
        |  WHERE regexp_matches(word, '^[a-z0-9]+$')),
        |wv0 AS MATERIALIZED (SELECT word,
        |    '[' || substr(word, 1, 1) || ']' ||
        |      regexp_replace(substr(word, 2), '(.)', '[##\1]', 'g') AS seq,
        |    count(*) AS freq FROM wfilt GROUP BY 1, 2)""".stripMargin)
    for (k <- 1 to n) {
      sb.append(s""",
        |wsc$k AS MATERIALIZED (SELECT t.s AS s, sum(x.freq) AS cnt
        |  FROM (SELECT string_split(trim(seq, '[]'), '][') AS syms, freq
        |        FROM wv${k - 1}) x, unnest(x.syms) AS t(s)
        |  GROUP BY 1),
        |wp$k AS MATERIALIZED (SELECT s.syms[t.i] AS l, s.syms[t.i + 1] AS r,
        |    sum(s.freq) AS cnt
        |  FROM (SELECT string_split(trim(seq, '[]'), '][') AS syms, freq
        |        FROM wv${k - 1}) s, unnest(range(1, len(s.syms))) AS t(i)
        |  GROUP BY 1, 2),
        |wm$k AS MATERIALIZED (SELECT p.l, p.r, p.cnt,
        |    CAST((CAST(p.cnt AS HUGEINT) * 1000000000) //
        |      (CAST(cl.cnt AS HUGEINT) * CAST(cr.cnt AS HUGEINT)) AS BIGINT) AS score
        |  FROM wp$k p JOIN wsc$k cl ON cl.s = p.l
        |  JOIN wsc$k cr ON cr.s = p.r
        |  ORDER BY score DESC, p.l, p.r LIMIT 1),
        |wv$k AS MATERIALIZED (SELECT v.word, replace(v.seq,
        |    '[' || m.l || '][' || m.r || ']',
        |    '[' || m.l || (CASE WHEN m.r LIKE '##%' THEN substr(m.r, 3)
        |      ELSE m.r END) || ']') AS seq, v.freq
        |  FROM wv${k - 1} v, wm$k m)""".stripMargin)
    }
    sb.toString
  }

  private[graft] def wpTrainOracle: String =
    wpReplayCtes(wpMergeBudget) + "\n" +
      (1 to wpMergeBudget).map(k =>
        s"""SELECT CAST($k AS BIGINT) AS rank, l AS "left", r AS "right",
           |  CAST(cnt AS BIGINT) AS pair_count,
           |  CAST(score AS BIGINT) AS score_scaled FROM wm$k""".stripMargin)
        .mkString("\nUNION ALL\n") +
      "\nORDER BY rank"

  /** Replay oracle for q_wordpiece_encode: replay training to the
    * vocabulary (alphabet = every wv0 symbol; merged pieces
    * l ++ r-without-'##' per round), then run MaxMatch itself — one
    * step CTE per word position (a ≤[[wpMaxWordLen]]-char word takes at
    * most that many greedy steps), candidates = vocabulary pieces
    * matching at the cursor ('##'-prefixed when not word-initial),
    * longest candidate wins via QUALIFY, a cursor with no candidate
    * marks the word [UNK] (1 token, 1 unk) — then the per-doc sums.
    */
  private[graft] def wpEncodeOracle: String = {
    val n = wpMergeBudget
    val W = wpMaxWordLen
    val mergedPieces = (1 to n).map(k =>
      s"UNION ALL SELECT l || (CASE WHEN r LIKE '##%' THEN substr(r, 3) " +
        s"ELSE r END) AS piece FROM wm$k").mkString("\n  ")
    val sb = new StringBuilder
    sb.append(wpReplayCtes(n))
    sb.append(s""",
      |wpalpha AS (SELECT DISTINCT t.s AS piece
      |  FROM (SELECT string_split(trim(seq, '[]'), '][') AS syms
      |        FROM wv0) x, unnest(x.syms) AS t(s)),
      |wpvocab AS MATERIALIZED (SELECT DISTINCT piece FROM (
      |  SELECT piece FROM wpalpha
      |  $mergedPieces)),
      |wdocw AS (SELECT doc_id, unnest(list_filter(
      |    string_split_regex(trim(lower(text)), '\\s+'),
      |    x -> len(x) > 0)) AS word
      |  FROM documents WHERE doc_id < 100),
      |wdfilt AS (SELECT doc_id, word FROM wdocw
      |  WHERE regexp_matches(word, '^[a-z0-9]+${"$"}') AND len(word) <= $W),
      |wpwords AS (SELECT DISTINCT word FROM wdfilt),
      |mm0 AS (SELECT word, CAST(0 AS BIGINT) AS pos,
      |    CAST(0 AS BIGINT) AS ntok, FALSE AS unk FROM wpwords)""".stripMargin)
    for (k <- 1 to W) {
      sb.append(s""",
        |wcand$k AS (SELECT c.word, c.pos, c.ntok, c.l FROM (
        |    SELECT m.word, m.pos, m.ntok, t.i AS l,
        |      CASE WHEN m.pos = 0 THEN substr(m.word, 1, t.i)
        |        ELSE '##' || substr(m.word, m.pos + 1, t.i)
        |      END AS piece
        |    FROM mm${k - 1} m, unnest(range(1, ${W + 1})) AS t(i)
        |    WHERE NOT m.unk AND m.pos < len(m.word)
        |      AND m.pos + t.i <= len(m.word)) c
        |  JOIN wpvocab USING (piece)),
        |wbest$k AS (SELECT word, pos, ntok, l FROM wcand$k
        |  QUALIFY row_number() OVER (PARTITION BY word ORDER BY l DESC) = 1),
        |mm$k AS MATERIALIZED (
        |  SELECT word, pos, ntok, unk FROM mm${k - 1}
        |  WHERE unk OR pos >= len(word)
        |  UNION ALL
        |  SELECT word, pos + l AS pos, ntok + 1 AS ntok, FALSE AS unk
        |  FROM wbest$k
        |  UNION ALL
        |  SELECT m.word, m.pos, m.ntok, TRUE AS unk
        |  FROM mm${k - 1} m LEFT JOIN wbest$k b ON b.word = m.word
        |  WHERE NOT m.unk AND m.pos < len(m.word) AND b.word IS NULL)""".stripMargin)
    }
    sb.append(s""",
      |wwid AS (SELECT word,
      |    CASE WHEN unk THEN 1 ELSE ntok END AS n_tok,
      |    CASE WHEN unk THEN 1 ELSE 0 END AS n_unk FROM mm$W),
      |wtf AS (SELECT doc_id, word, count(*) AS c FROM wdfilt GROUP BY 1, 2)
      |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
      |  CAST(sum(c * n_tok) AS BIGINT) AS n_tokens,
      |  CAST(sum(c * n_unk) AS BIGINT) AS n_unk
      |FROM wtf JOIN wwid USING (word)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin)
    sb.toString
  }

  /** Full-training replay of [[unigramTokenizerQ]] in DuckDB: seeding,
    * `unigramEmRounds` Viterbi-EM rounds — forward DP unrolled as one
    * CTE per word position (candidates = pieces of length 1..P ending
    * there, joined against the previous round's log-prob table; argmax
    * by (score, piece length) via QUALIFY row_number, the engine DP's
    * exact tie rule), backtrace unrolled the same way, frequency-
    * weighted counts, add-one M-step — then the final prune and
    * renormalize. All scores are 10^6-scaled floor-rounded BIGINTs, so
    * every comparison the replay makes is integer-exact.
    */
  /** Forward-DP + backtrace CTE block over `wordsTable` (one `word`
    * per row) under log-prob table `lpTable`: emits dp{tag}_0..W,
    * dpall{tag}, bt{tag}_0..W-1, btall{tag} — shared by the training
    * E-step replay (one block per EM round) and the encode replay.
    */
  private[graft] def unigramDpCtes(tag: String, wordsTable: String,
      lpTable: String): String = {
    val W = unigramMaxWordLen
    val P = unigramMaxPieceLen
    val sb = new StringBuilder
    sb.append(s""",
      |dp${tag}_0 AS (SELECT word, CAST(0 AS BIGINT) AS score, 0 AS plen
      |  FROM $wordsTable)""".stripMargin)
    for (p <- 1 to W) {
      val arms = (1 to math.min(P, p)).map { l =>
        s"""SELECT d.word, d.score + lp.lp AS score, $l AS plen
           |    FROM dp${tag}_${p - l} d JOIN $lpTable lp
           |      ON lp.piece = substr(d.word, ${p - l + 1}, $l)
           |    WHERE len(d.word) >= $p""".stripMargin
      }.mkString("\n    UNION ALL\n    ")
      sb.append(s""",
        |dp${tag}_$p AS MATERIALIZED (SELECT word, score, plen FROM (
        |    $arms)
        |  QUALIFY row_number() OVER (PARTITION BY word
        |    ORDER BY score DESC, plen DESC) = 1)""".stripMargin)
    }
    sb.append(s""",
      |dpall$tag AS (${(1 to W).map(p =>
        s"SELECT word, $p AS pos, plen FROM dp${tag}_$p").mkString("\n  UNION ALL ")}),
      |bt${tag}_0 AS (SELECT word, CAST(len(word) AS BIGINT) AS pos FROM $wordsTable)""".stripMargin)
    for (k <- 1 to W - 1) {
      sb.append(s""",
        |bt${tag}_$k AS MATERIALIZED (SELECT b.word, b.pos - d.plen AS pos
        |  FROM bt${tag}_${k - 1} b JOIN dpall$tag d
        |    ON d.word = b.word AND d.pos = b.pos
        |  WHERE b.pos > 0)""".stripMargin)
    }
    sb.append(s""",
      |btall$tag AS (${(0 until W).map(k =>
        s"SELECT word, pos FROM bt${tag}_$k").mkString("\n  UNION ALL ")})""".stripMargin)
    sb.toString
  }

  private[graft] def unigramTrainOracle: String = {
    val R = unigramEmRounds
    val sb = new StringBuilder
    sb.append(unigramSeedCtes)
    for (r <- 1 to R) {
      val prev = if (r == 1) "lp0" else s"lp${r - 1}"
      sb.append(unigramDpCtes(r.toString, "w0", prev))
      sb.append(s""",
        |cnt${r}_raw AS (SELECT
        |    substr(b.word, CAST(b.pos - d.plen + 1 AS INT), d.plen) AS piece,
        |    sum(w.freq) AS cnt
        |  FROM btall$r b
        |  JOIN dpall$r d ON d.word = b.word AND d.pos = b.pos
        |  JOIN w0 w ON w.word = b.word
        |  WHERE b.pos > 0 GROUP BY 1),
        |cnt$r AS MATERIALIZED (SELECT s.piece, coalesce(c.cnt, 0) AS cnt
        |  FROM seed s LEFT JOIN cnt${r}_raw c USING (piece)),
        |lp$r AS MATERIALIZED (SELECT piece,
        |    CAST(floor(ln((cnt + 1.0) /
        |      ((SELECT CAST(sum(cnt) AS DOUBLE) FROM cnt$r) +
        |       (SELECT count(*) FROM seed))) * 1e6) AS BIGINT) AS lp
        |  FROM cnt$r)""".stripMargin)
    }
    sb.append(s""",
      |keep AS MATERIALIZED (SELECT piece, cnt FROM cnt$R WHERE len(piece) = 1
      |  UNION ALL
      |  SELECT piece, cnt FROM
      |    (SELECT piece, cnt FROM cnt$R WHERE len(piece) >= 2
      |     ORDER BY cnt DESC, piece LIMIT $unigramKeepMulti))""".stripMargin)
    sb.toString
  }

  /** Shared replay prefix: corpus word-freq collapse, substring seed,
    * initial log-prob table — everything before the EM rounds.
    */
  private[graft] def unigramSeedCtes: String = {
    val W = unigramMaxWordLen
    val P = unigramMaxPieceLen
    s"""WITH occ AS (SELECT unnest(list_filter(
       |      string_split_regex(trim(lower(text)), '\\s+'),
       |      x -> len(x) > 0)) AS word FROM documents),
       |w0 AS MATERIALIZED (SELECT word, count(*) AS freq FROM occ
       |  WHERE regexp_matches(word, '^[a-z0-9]+$$') AND len(word) <= $W
       |  GROUP BY 1),
       |sub AS (SELECT substr(w.word, CAST(t.i AS INT), CAST(l.l AS INT)) AS piece,
       |    sum(w.freq) AS cnt
       |  FROM w0 w, (SELECT unnest(range(1, $P + 1)) AS l) l,
       |    LATERAL (SELECT unnest(range(1, len(w.word) - l.l + 2)) AS i) t
       |  GROUP BY 1),
       |seed AS MATERIALIZED (
       |  SELECT piece, cnt FROM sub WHERE len(piece) = 1
       |  UNION ALL
       |  SELECT piece, cnt FROM
       |    (SELECT piece, cnt FROM sub WHERE len(piece) >= 2
       |     ORDER BY cnt DESC, piece LIMIT $unigramSeedMulti)),
       |lp0 AS MATERIALIZED (SELECT piece,
       |    CAST(floor(ln(CAST(cnt AS DOUBLE) /
       |      (SELECT CAST(sum(cnt) AS DOUBLE) FROM seed)) * 1e6) AS BIGINT) AS lp
       |  FROM seed)""".stripMargin
  }

  /** Replay oracle for q_unigram_encode: training replayed to the
    * pruned vocabulary, the final log-prob table re-derived over it,
    * then the SAME integer Viterbi DP (same (score, piece-length) tie
    * rule) over the encode slice's distinct words; a word's token
    * count is its backtrace step count. A word longer than
    * `unigramMaxWordLen` would fall out of the unrolled DP and red the
    * gate on row counts — visible, never silent (the corpus tops out
    * at 8 characters).
    */
  private[graft] def unigramEncodeOracle: String = {
    val sb = new StringBuilder
    sb.append(unigramTrainOracle)
    sb.append(s""",
      |keeplp AS MATERIALIZED (SELECT piece,
      |    CAST(floor(ln((cnt + 1.0) /
      |      ((SELECT CAST(sum(cnt) AS DOUBLE) FROM keep) +
      |       (SELECT count(*) FROM keep))) * 1e6) AS BIGINT) AS lp
      |  FROM keep),
      |tfde AS MATERIALIZED (SELECT doc_id, word, count(*) AS c FROM
      |    (SELECT doc_id, unnest(list_filter(
      |        string_split_regex(trim(lower(text)), '\\s+'),
      |        x -> len(x) > 0)) AS word
      |     FROM documents WHERE doc_id < 100)
      |  WHERE regexp_matches(word, '^[a-z0-9]+$$') GROUP BY 1, 2),
      |we AS MATERIALIZED (SELECT DISTINCT word FROM tfde)""".stripMargin)
    sb.append(unigramDpCtes("e", "we", "keeplp"))
    sb.append(s""",
      |ntok AS (SELECT word, count(*) AS n_tok FROM btalle
      |  WHERE pos > 0 GROUP BY 1)
      |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
      |  CAST(sum(c * n_tok) AS BIGINT) AS n_tokens
      |FROM tfde JOIN ntok USING (word)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin)
    sb.toString
  }

  /** Final pruned-vocabulary SELECT of the trainer gate. */
  private[graft] def unigramTrainFinalSelect: String =
    s"""SELECT piece, CAST(len(piece) AS INT) AS n_chars, CAST(cnt AS BIGINT) AS cnt,
       |  CAST(floor(ln((cnt + 1.0) /
       |    ((SELECT CAST(sum(cnt) AS DOUBLE) FROM keep) +
       |     (SELECT count(*) FROM keep))) * 1e6) AS BIGINT) AS logp_scaled
       |FROM keep ORDER BY cnt DESC, piece""".stripMargin

  private[graft] def bpeTrainOracle: String =
    bpeReplayCtes(bpeMergeBudget) + "\n" +
      (1 to bpeMergeBudget).map(k =>
        s"""SELECT CAST($k AS BIGINT) AS rank, l AS "left", r AS "right",
           |  CAST(cnt AS BIGINT) AS pair_count FROM m$k""".stripMargin)
        .mkString("\nUNION ALL\n") +
      "\nORDER BY rank"

  /** Replay oracle for q_bpe_encode: base alphabet from the encode
    * slice's own words (row_number over the sorted distinct chars),
    * merged-token ids B + rank - 1 with min() resolving string
    * collisions exactly as the engine's first-rank-wins rule, word
    * symbol sequences off the replayed v{n} vocabulary, per-word and
    * per-doc assembly via ORDER BY'd string_agg.
    */
  private[graft] def bpeEncodeOracle: String = {
    val n = bpeMergeBudget
    val mergeRows = (1 to n)
      .map(k => s"SELECT l, r, $k AS k FROM m$k")
      .mkString("\n    UNION ALL ")
    bpeReplayCtes(n) + s""",
      |docw AS (SELECT doc_id, t.i AS pos, ws[t.i] AS word FROM
      |    (SELECT doc_id, list_filter(
      |       string_split_regex(trim(lower(text)), '\\s+'),
      |       x -> len(x) > 0) AS ws
      |     FROM documents WHERE doc_id < 100) d,
      |    unnest(range(1, len(ws) + 1)) AS t(i)),
      |dfilt AS (SELECT doc_id, pos, word FROM docw
      |  WHERE regexp_matches(word, '^[a-z0-9]+${"$"}')),
      |chars AS (SELECT DISTINCT unnest(string_split(
      |    trim(regexp_replace(word, '(.)', '[\\1]', 'g'), '[]'), '][')) AS ch
      |  FROM (SELECT DISTINCT word FROM dfilt)),
      |basemap AS (SELECT ch AS tok,
      |    row_number() OVER (ORDER BY ch) - 1 AS tid FROM chars),
      |nb AS (SELECT count(*) AS b FROM basemap),
      |mergetoks AS (SELECT l || r AS tok, (SELECT b FROM nb) + k - 1 AS tid
      |  FROM ($mergeRows)),
      |tokmap AS (SELECT tok, min(tid) AS tid FROM
      |  (SELECT * FROM basemap UNION ALL SELECT * FROM mergetoks)
      |  GROUP BY tok),
      |wsyms AS (SELECT word, t.i AS spos, syms[t.i] AS sym FROM
      |    (SELECT word, string_split(trim(seq, '[]'), '][') AS syms
      |     FROM v$n WHERE word IN (SELECT word FROM dfilt)) v,
      |    unnest(range(1, len(syms) + 1)) AS t(i)),
      |wtok AS (SELECT word,
      |    string_agg(CAST(tid AS VARCHAR), ' ' ORDER BY spos) AS ids_str,
      |    count(*) AS n_tok
      |  FROM wsyms JOIN tokmap ON sym = tok GROUP BY word)
      |SELECT doc_id,
      |  string_agg(ids_str, ' ' ORDER BY pos) AS token_ids,
      |  CAST(sum(n_tok) AS BIGINT) AS n_tokens
      |FROM dfilt JOIN wtok USING (word)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  private[graft] def tokenizeBpeOracle: String =
    bpeReplayCtes(bpeMergeBudget) + s""",
      |docw AS (SELECT doc_id, unnest(list_filter(
      |    string_split_regex(trim(lower(text)), '\\s+'),
      |    x -> len(x) > 0)) AS word FROM documents),
      |dfilt AS (SELECT doc_id, word FROM docw
      |  WHERE regexp_matches(word, '^[a-z0-9]+${"$"}')),
      |tok AS (SELECT word, len(string_split(trim(seq, '[]'), '][')) AS n_tok
      |  FROM v$bpeMergeBudget)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
      |  CAST(sum(n_tok) AS BIGINT) AS n_tokens
      |FROM dfilt JOIN tok USING (word)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Oracle for q_embed_ann_lsh: the sign-random-projection hyperplanes
    * are deterministic constants, so they are INLINED into the SQL — DuckDB
    * recomputes the exact same bucket ids, probe set, and rounded cosines,
    * making the approximate query exactly checkable.
    */
  private[graft] def sparseKnnOracleSql(where: String = ""): String =
      s"""WITH n AS (SELECT count(*) AS n_docs FROM documents$where),
        |w AS (SELECT doc_id,
        |    unnest(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
        |                       x -> len(x) > 0)) AS word
        |  FROM documents$where),
        |tf AS (SELECT doc_id, word, count(*) AS tf FROM w GROUP BY 1, 2),
        |df AS (SELECT word, count(DISTINCT doc_id) AS df FROM w GROUP BY 1),
        |wt AS (SELECT tf.doc_id, tf.word,
        |    CAST(round(tf.tf * ln(CAST(n.n_docs + 1 AS DOUBLE) / (df.df + 1))
        |      * 10000) AS BIGINT) AS w
        |  FROM tf JOIN df USING (word), n),
        |norms AS (SELECT doc_id, sum(w * w) AS n2 FROM wt GROUP BY 1),
        |q AS (SELECT doc_id FROM documents$where
        |  ${if (where.isEmpty) "WHERE" else "AND"} doc_id % 100 = 0),
        |dots AS (SELECT a.doc_id AS qid, b.doc_id AS id,
        |    sum(a.w * b.w) AS dot
        |  FROM wt a JOIN q ON q.doc_id = a.doc_id
        |  JOIN wt b ON b.word = a.word AND b.doc_id <> a.doc_id
        |  GROUP BY 1, 2),
        |sim AS (SELECT qid, id,
        |    round(CAST(dot AS DOUBLE) /
        |      sqrt(CAST(nq.n2 AS DOUBLE) * CAST(nc.n2 AS DOUBLE)), 6) AS sim
        |  FROM dots JOIN norms nq ON nq.doc_id = qid
        |  JOIN norms nc ON nc.doc_id = id),
        |r AS (SELECT qid, id, sim,
        |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, id)
        |      AS sim_rank
        |  FROM sim)
        |SELECT qid, id, sim, sim_rank FROM r WHERE sim_rank <= 5
        |ORDER BY qid, sim_rank""".stripMargin

  private[graft] def annLshOracle: String = annLshOracleFor(8, 4, 1)

  /** `excludeQuery`: true for RECALL oracles (true-neighbor recall —
    * the query vector is not a retrievable target on either side);
    * false for product top-k listings, where the corpus legitimately
    * contains the query.
    */
  private[graft] def annLshOracleFor(planes: Int, tables: Int,
      maxHamming: Int, excludeQuery: Boolean = false): String = {
    val hps = Similarity.tableHyperplanes(planes, tables, 64)
    def arr(a: Array[Double]) = a.map(_.toString).mkString("[", ", ", "]")
    def bucketExpr(vec: String, hp: Array[Array[Double]]) = hp.indices.map { i =>
      s"(CASE WHEN list_dot_product($vec, ${arr(hp(i))}) >= 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString(" + ")
    val bucketCols = hps.indices
      .map(t => s"${bucketExpr("e", hps(t))} AS b$t").mkString(",\n       ")
    // "bucket within maxHamming sign flips of the query bucket" — the
    // same multi-probe predicate as Similarity.lshTopK.
    val hit = hps.indices
      .map(t => s"bit_count(xor(b$t, (SELECT b$t FROM q))) <= $maxHamming")
      .mkString(" OR ")
    val excl = if (excludeQuery) " AND vec_id != 0" else ""
    s"""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |b AS (SELECT vec_id, e,
       |       $bucketCols
       |      FROM emb),
       |q AS (SELECT * FROM b WHERE vec_id = 0),
       |scored AS (
       |  SELECT vec_id,
       |    round(list_dot_product(e, (SELECT e FROM q)) /
       |      (sqrt(list_dot_product(e, e)) * (SELECT sqrt(list_dot_product(e, e)) FROM q)), 4) AS cosine
       |  FROM b WHERE ($hit)$excl)
       |SELECT vec_id, cosine FROM scored ORDER BY cosine DESC, vec_id LIMIT 10""".stripMargin
  }

  /** Oracle for q_ann_recall_hi: the panel-mean recall of the 8x8
    * Hamming<=2 multi-probe config, recomputed from source with the
    * same inlined hyperplane constants — WITHOUT the >= 0.8 filter the
    * engine side applies. The asymmetry is deliberate: if the config's
    * recall drops below the bar, the engine emits zero rows while this
    * SQL still emits the (sub-bar) recall row, and the row-count
    * mismatch fails the gate.
    */
  private[graft] def annRecallHiOracle: String = {
    val planes = 8
    val tables = 8
    val maxHamming = 2
    val hps = Similarity.tableHyperplanes(planes, tables, 64)
    def arr(a: Array[Double]) = a.map(_.toString).mkString("[", ", ", "]")
    def bucketExpr(vec: String, hp: Array[Array[Double]]) = hp.indices.map { i =>
      s"(CASE WHEN list_dot_product($vec, ${arr(hp(i))}) >= 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString(" + ")
    val bucketCols = hps.indices
      .map(t => s"${bucketExpr("e", hps(t))} AS b$t").mkString(",\n       ")
    val arms = annPanelIds.zipWithIndex.map { case (qid, i) =>
      val hit = hps.indices
        .map(t => s"bit_count(xor(b.b$t, (SELECT b$t FROM q$i))) <= $maxHamming")
        .mkString(" OR ")
      s"""q$i AS (SELECT * FROM b WHERE vec_id = $qid),
         |x$i AS (SELECT vec_id,
         |    round(list_dot_product(e, (SELECT e FROM q$i)) /
         |      (sqrt(list_dot_product(e, e)) * (SELECT sqrt(list_dot_product(e, e)) FROM q$i)), 4) AS cosine
         |  FROM b WHERE vec_id != $qid ORDER BY cosine DESC, vec_id LIMIT 10),
         |a$i AS (SELECT vec_id FROM b WHERE ($hit) AND vec_id != $qid),
         |h$i AS (SELECT count(*) AS c FROM x$i SEMI JOIN a$i USING (vec_id))""".stripMargin
    }.mkString(",\n")
    val totalHits = annPanelIds.indices
      .map(i => s"(SELECT c FROM h$i)").mkString(" + ")
    s"""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |b AS (SELECT vec_id, e,
       |       $bucketCols
       |      FROM emb),
       |$arms
       |SELECT CAST(${annPanelIds.size} AS INTEGER) AS n_queries,
       |  CAST(10 AS INTEGER) AS k,
       |  CAST($totalHits AS BIGINT) AS n_hits,
       |  round(CAST($totalHits AS DOUBLE) / ${annPanelIds.size * 10}.0, 6) AS recall""".stripMargin
  }

  /** Oracle for q_matryoshka_recall: full-dim truth and every prefix
    * dim's direct + shortlist-reranked top-10 replayed from source with
    * the same rounded-4 cosines and (score DESC, vec_id) tie rule;
    * per-dim blocks are generated from [[matryoshkaDims]] so engine and
    * oracle can never disagree on the dims measured.
    */
  private[graft] def matryoshkaOracleSql: String = {
    val nQ = annPanelIds.size
    val k = 10
    val m = 50
    def cosSql(a: String, b: String) =
      s"round(list_dot_product($a, $b) / " +
        s"(sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b))), 4)"
    val dimBlocks = matryoshkaDims.map { dm =>
      s"""p$dm AS (SELECT qid, vec_id, fs,
         |    ${cosSql(s"cv[1:$dm]", s"qv[1:$dm]")} AS ps
         |  FROM scored),
         |r$dm AS (SELECT qid, vec_id, fs,
         |    row_number() OVER (PARTITION BY qid ORDER BY ps DESC, vec_id) AS prn
         |  FROM p$dm),
         |d$dm AS (SELECT qid, vec_id FROM r$dm WHERE prn <= $k),
         |rr$dm AS (SELECT qid, vec_id FROM (
         |    SELECT qid, vec_id,
         |      row_number() OVER (PARTITION BY qid ORDER BY fs DESC, vec_id) AS rrn
         |    FROM r$dm WHERE prn <= $m) WHERE rrn <= $k),
         |res$dm AS (SELECT CAST($dm AS INTEGER) AS dim,
         |    (SELECT count(*) FROM truth SEMI JOIN d$dm USING (qid, vec_id)) AS direct_hits,
         |    (SELECT count(*) FROM truth SEMI JOIN rr$dm USING (qid, vec_id)) AS rerank_hits)"""
        .stripMargin
    }.mkString(",\n")
    val unionRes = matryoshkaDims.map(dm => s"SELECT * FROM res$dm")
      .mkString(" UNION ALL ")
    s"""WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
       |    FROM embeddings WHERE vec_id % 50 = 0 AND vec_id <= ${annPanelIds.max}),
       |c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
       |scored AS (SELECT qid, c.vec_id, qv, cv,
       |    ${cosSql("cv", "qv")} AS fs
       |  FROM c JOIN q ON c.vec_id <> q.qid),
       |truth AS (SELECT qid, vec_id FROM (
       |    SELECT qid, vec_id,
       |      row_number() OVER (PARTITION BY qid ORDER BY fs DESC, vec_id) AS rn
       |    FROM scored) WHERE rn <= $k),
       |$dimBlocks
       |SELECT dim, CAST($nQ AS INTEGER) AS n_queries, CAST($k AS INTEGER) AS k,
       |  CAST(direct_hits AS BIGINT) AS direct_hits,
       |  round(CAST(direct_hits AS DOUBLE) / ${nQ * k}.0, 6) AS direct_recall,
       |  CAST(rerank_hits AS BIGINT) AS rerank_hits,
       |  round(CAST(rerank_hits AS DOUBLE) / ${nQ * k}.0, 6) AS rerank_recall
       |FROM ($unionRes) ORDER BY dim""".stripMargin
  }

  /** Oracle for q_mmr_rerank: the greedy selection UNROLLED as chained
    * CTEs (the k-center/pagerank discipline — no engine state in the
    * check). Every step scores the unpicked candidates
    * `0.7*rel - (1-0.7)*max(sim to picked)` in IEEE doubles from the
    * SAME rounded-4 rel/sim inputs the engine collected, and picks the
    * arg-max with the vec_id tie-break; `1 - CAST(0.7 AS DOUBLE)` is
    * written as the same subtraction the Scala side performs so both
    * produce the identical 0.30000000000000004 multiplier.
    */
  private[graft] def mmrOracleSql: String = {
    val k = 10
    val m = 50
    // MATERIALIZED is load-bearing: pick_{i-1} is referenced three
    // times per step, so default CTE inlining expands the chain
    // 3^k-fold — each leaf re-opening the parquet file (observed as an
    // fd-exhaustion failure, not just slowness).
    val steps = (2 to k).map { i =>
      s"""step$i AS MATERIALIZED (SELECT c.vec_id, c.rel,
         |    CAST(0.7 AS DOUBLE) * c.rel - (1 - CAST(0.7 AS DOUBLE)) *
         |      (SELECT max(s.s) FROM sim s
         |       JOIN pick${i - 1} p ON s.ia = p.vec_id
         |       WHERE s.ib = c.vec_id) AS mmr
         |  FROM cand c
         |  WHERE c.vec_id NOT IN (SELECT vec_id FROM pick${i - 1})),
         |sel$i AS MATERIALIZED (SELECT CAST($i AS INTEGER) AS mmr_rank,
         |    vec_id, rel, mmr
         |  FROM step$i ORDER BY mmr DESC, vec_id LIMIT 1),
         |pick$i AS MATERIALIZED (SELECT vec_id FROM pick${i - 1}
         |  UNION ALL SELECT vec_id FROM sel$i)""".stripMargin
    }.mkString(",\n")
    val unionSel = (1 to k).map(i => s"SELECT * FROM sel$i").mkString(" UNION ALL ")
    s"""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
       |    FROM embeddings WHERE vec_id = 0),
       |scoredAll AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv,
       |    round(list_dot_product(CAST(embedding AS DOUBLE[]), (SELECT qv FROM q)) /
       |      (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
       |                             CAST(embedding AS DOUBLE[]))) *
       |       sqrt((SELECT list_dot_product(qv, qv) FROM q))), 4) AS rel
       |  FROM embeddings WHERE vec_id <> 0),
       |cand AS MATERIALIZED (SELECT vec_id, cv, rel FROM scoredAll
       |  ORDER BY rel DESC, vec_id LIMIT $m),
       |sim AS MATERIALIZED (SELECT a.vec_id AS ia, b.vec_id AS ib,
       |    round(list_dot_product(a.cv, b.cv) /
       |      (sqrt(list_dot_product(a.cv, a.cv)) *
       |       sqrt(list_dot_product(b.cv, b.cv))), 4) AS s
       |  FROM cand a JOIN cand b ON a.vec_id <> b.vec_id),
       |sel1 AS MATERIALIZED (SELECT CAST(1 AS INTEGER) AS mmr_rank,
       |    vec_id, rel, rel AS mmr
       |  FROM cand ORDER BY rel DESC, vec_id LIMIT 1),
       |pick1 AS MATERIALIZED (SELECT vec_id FROM sel1),
       |$steps
       |SELECT mmr_rank, vec_id, rel, round(mmr, 4) AS mmr_score
       |FROM ($unionSel) ORDER BY mmr_rank""".stripMargin
  }

  /** Oracle for q_domain_authority: the 10 PageRank iterations UNROLLED
    * as chained CTEs (standard SQL forbids aggregation in a recursive
    * term), every constant written with the same IEEE double operations
    * the Spark plan performs — (1.0-0.85)/n as a subtraction THEN a
    * division, 0.85 cast to double before the multiply — so fixed-
    * iteration ranks agree to the rounding digit.
    */
  private[graft] def pageRankOracleSql: String = {
    val iters = 10
    val base =
      """WITH hosts AS (SELECT DISTINCT doc_id % 97 AS src FROM documents),
        |edges AS (SELECT src, (src * 3 + 1) % 97 AS dst FROM hosts
        |          UNION ALL SELECT src, (src * 7 + 2) % 97 FROM hosts),
        |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
        |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
        |outdeg AS (SELECT src, CAST(count(*) AS DOUBLE) AS deg
        |           FROM edges GROUP BY src),
        |p0 AS (SELECT node, CAST(1.0 AS DOUBLE) / (SELECT n FROM nn) AS rank
        |       FROM nodes)""".stripMargin
    val steps = (1 to iters).map { i =>
      s"""p$i AS (SELECT e.dst AS node,
         |  (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / (SELECT n FROM nn)
         |    + CAST(0.85 AS DOUBLE) * sum(p.rank / o.deg) AS rank
         |  FROM edges e JOIN p${i - 1} p ON p.node = e.src
         |  JOIN outdeg o ON o.src = e.src GROUP BY e.dst)""".stripMargin
    }
    (Seq(base) ++ steps).mkString(",\n") +
      s"\nSELECT node, round(rank, 6) AS rank FROM p$iters ORDER BY node"
  }

  /** Oracle for q_textrank: the [[pageRankOracleSql]] unrolled-iteration
    * technique applied to the corpus-derived co-occurrence word graph —
    * the q_pmi_cooccur pair CTEs (support >= 5, self-loops dropped,
    * symmetrized + deduplicated), then 5 PageRank steps with the same
    * IEEE constants, then the rounded-rank top-20. Every node of the
    * symmetric graph has inbound edges, so the plain join-aggregate
    * step needs no missing-node coalesce (the Spark side's left join
    * receives a contribution for every node too).
    */
  private[graft] def textrankOracleSql: String = {
    val iters = 5
    val base =
      """WITH ws AS (SELECT doc_id,
        |    string_split_regex(trim(text), '\s+') AS ws FROM documents),
        |toks AS (SELECT doc_id, i AS pos, ws[i] AS w
        |  FROM ws, UNNEST(range(1, len(ws) + 1)) AS t(i)
        |  WHERE len(ws[i]) > 0),
        |leads AS (SELECT doc_id, w AS w1,
        |    lead(w, 1) OVER wd AS x1, lead(w, 2) OVER wd AS x2
        |  FROM toks WINDOW wd AS (PARTITION BY doc_id ORDER BY pos)),
        |pairs AS (SELECT w1, x1 AS w2 FROM leads WHERE x1 IS NOT NULL
        |  UNION ALL SELECT w1, x2 FROM leads WHERE x2 IS NOT NULL),
        |pc AS (SELECT w1, w2 FROM pairs GROUP BY w1, w2
        |       HAVING count(*) >= 5 AND w1 <> w2),
        |edges AS (SELECT DISTINCT src, dst FROM (
        |  SELECT w1 AS src, w2 AS dst FROM pc
        |  UNION ALL SELECT w2, w1 FROM pc)),
        |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
        |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
        |outdeg AS (SELECT src, CAST(count(*) AS DOUBLE) AS deg
        |           FROM edges GROUP BY src),
        |p0 AS (SELECT node, CAST(1.0 AS DOUBLE) / (SELECT n FROM nn) AS rank
        |       FROM nodes)""".stripMargin
    val steps = (1 to iters).map { i =>
      s"""p$i AS (SELECT e.dst AS node,
         |  (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / (SELECT n FROM nn)
         |    + CAST(0.85 AS DOUBLE) * sum(p.rank / o.deg) AS rank
         |  FROM edges e JOIN p${i - 1} p ON p.node = e.src
         |  JOIN outdeg o ON o.src = e.src GROUP BY e.dst)""".stripMargin
    }
    (Seq(base) ++ steps).mkString(",\n") +
      s"""|,
          |ranked AS (SELECT node AS keyword, round(rank, 6) AS rank
          |  FROM p$iters ORDER BY round(rank, 6) DESC, node LIMIT 20)
          |SELECT keyword, rank,
          |  row_number() OVER (ORDER BY rank DESC, keyword) AS kw_rank
          |FROM ranked ORDER BY rank DESC, keyword""".stripMargin
  }

  /** Oracle for q_acf: the same n²-cleared rational-mean identity as
    * [[operators.TimeSeries.acf]] — every sufficient statistic an
    * exact HUGEINT (DuckDB's 128-bit integer, the twin of the Spark
    * side's DECIMAL(38,0)), one double division per lag, same
    * rounding. Lags are unrolled as SELECT arms over one lead-window
    * CTE, exactly the columns the Spark plan carries.
    */
  private[graft] def acfOracleSql: String = {
    val maxLag = 7
    val leadCols = (1 to maxLag)
      .map(j => s"lead(n, $j) OVER (ORDER BY day) AS l$j").mkString(",\n|    ")
    val sumCols = (1 to maxLag).map(j =>
      s"""CAST(sum(x * l$j) AS HUGEINT) AS s$j,
         |    CAST(sum(CASE WHEN l$j IS NOT NULL THEN x END) AS HUGEINT) AS h$j,
         |    CAST(sum(l$j) AS HUGEINT) AS t$j""".stripMargin).mkString(",\n|    ")
    val arms = (1 to maxLag).map { j =>
      s"""SELECT $j AS lag_k, CAST(n - $j AS BIGINT) AS n_terms,
         |  round(CAST(n*n*s$j - n*sx*(h$j + t$j) + (n - $j)*sx*sx AS DOUBLE) /
         |        CAST(n*n*sxx - n*sx*sx AS DOUBLE), 6) AS acf FROM s""".stripMargin
    }.mkString("\n|UNION ALL\n|")
    s"""WITH daily AS (SELECT date_trunc('day', ts) AS day,
       |    CAST(count(*) AS HUGEINT) AS n FROM events GROUP BY 1),
       |l AS (SELECT n AS x,
       |    $leadCols
       |  FROM daily),
       |s AS (SELECT CAST(count(*) AS HUGEINT) AS n,
       |    CAST(sum(x) AS HUGEINT) AS sx,
       |    CAST(sum(x * x) AS HUGEINT) AS sxx,
       |    $sumCols
       |  FROM l)
       |SELECT CAST(lag_k AS INTEGER) AS lag, n_terms, acf FROM (
       |$arms)
       |ORDER BY lag""".stripMargin
  }

  /** Oracle for q_xcorr: the [[acfOracleSql]] technique over the
    * click/purchase daily join — HUGEINT-exact sufficient statistics,
    * unrolled lag arms, one sqrt+division per lag with the same
    * operation order as the Spark expression.
    */
  private[graft] def xcorrOracleSql: String = {
    val maxLag = 3
    val leadCols = (0 to maxLag)
      .map(j => s"lead(y, $j) OVER (ORDER BY day) AS l$j").mkString(",\n|    ")
    val sumCols = (0 to maxLag).map(j =>
      s"""CAST(sum(x * l$j) AS HUGEINT) AS s$j,
         |    CAST(sum(CASE WHEN l$j IS NOT NULL THEN x END) AS HUGEINT) AS h$j,
         |    CAST(sum(l$j) AS HUGEINT) AS t$j""".stripMargin).mkString(",\n|    ")
    val arms = (0 to maxLag).map { j =>
      s"""SELECT $j AS lag_k, CAST(n - $j AS BIGINT) AS n_terms,
         |  round(CAST(n*n*s$j - n*sx*t$j - n*sy*h$j + (n - $j)*sx*sy AS DOUBLE) /
         |        (CAST(n AS DOUBLE) *
         |         sqrt(CAST(n*sxx - sx*sx AS DOUBLE) *
         |              CAST(n*syy - sy*sy AS DOUBLE))), 6) AS xcorr FROM s""".stripMargin
    }.mkString("\n|UNION ALL\n|")
    s"""WITH cx AS (SELECT date_trunc('day', ts) AS day,
       |    CAST(count(*) AS HUGEINT) AS x FROM events
       |  WHERE event_type = 'click' GROUP BY 1),
       |cy AS (SELECT date_trunc('day', ts) AS day,
       |    CAST(count(*) AS HUGEINT) AS y FROM events
       |  WHERE event_type = 'purchase' GROUP BY 1),
       |j AS (SELECT day, COALESCE(x, CAST(0 AS HUGEINT)) AS x,
       |    COALESCE(y, CAST(0 AS HUGEINT)) AS y
       |  FROM cx FULL OUTER JOIN cy USING (day)),
       |l AS (SELECT x, y,
       |    $leadCols
       |  FROM j),
       |s AS (SELECT CAST(count(*) AS HUGEINT) AS n,
       |    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
       |    CAST(sum(x * x) AS HUGEINT) AS sxx,
       |    CAST(sum(y * y) AS HUGEINT) AS syy,
       |    $sumCols
       |  FROM l)
       |SELECT CAST(lag_k AS INTEGER) AS lag, n_terms, xcorr FROM (
       |$arms)
       |ORDER BY lag""".stripMargin
  }

  /** Oracle for q_ewma: the same cleared-denominator integer weights
    * as [[operators.TimeSeries.ewma]] (w_k = 3·7^k·10^(7−k) for
    * α=0.3, W=8), generated from the same formula, HUGEINT dot
    * products, one rounded division per row.
    */
  private[graft] def ewmaOracleSql: String = {
    val (p, q, win) = (3, 10, 8)
    val coeffs = (0 until win).map { k =>
      (BigInt(p) * BigInt(q - p).pow(k) * BigInt(q).pow(win - 1 - k)).toString
    }
    val lagCols = (1 until win)
      .map(k => s"lag(v, $k) OVER (ORDER BY day) AS l$k").mkString(",\n|    ")
    def arm(k: Int, expr: String) =
      s"CASE WHEN l$k IS NOT NULL THEN $expr ELSE CAST(0 AS HUGEINT) END"
    val num = (0 until win).map(k =>
      arm(k, s"CAST(l$k AS HUGEINT) * ${coeffs(k)}")).mkString(" +\n|    ")
    val den = (0 until win).map(k =>
      arm(k, s"CAST(${coeffs(k)} AS HUGEINT)")).mkString(" +\n|    ")
    s"""WITH daily AS (SELECT date_trunc('day', ts) AS day,
       |    CAST(count(*) AS BIGINT) AS v FROM events GROUP BY 1),
       |l AS (SELECT day, v AS l0,
       |    $lagCols
       |  FROM daily)
       |SELECT day, l0 AS v,
       |  round(CAST(($num) AS DOUBLE) /
       |        CAST(($den) AS DOUBLE), 6) AS ewma
       |FROM l
       |ORDER BY day""".stripMargin
  }

  /** DuckDB ASOF JOIN oracle shared by `q_asof_join` (window
    * formulation) and `q_asof_join_native` (whole-operator path) —
    * the two engines' formulations and DuckDB must all agree.
    */
  private[graft] def asofOracleSql: String =
    """WITH clicks AS (
      |  SELECT user_id, event_id, make_timestamp(epoch_us(ts)) AS ts, value
      |  FROM events WHERE event_type = 'click'),
      |p AS (
      |  SELECT user_id, make_timestamp(epoch_us(ts)) AS ts,
      |    max(event_id) AS purchase_id,
      |    arg_max(value, event_id) AS purchase_value
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
      |SELECT c.user_id, c.event_id, c.ts, c.value,
      |  p.purchase_id AS asof_purchase_id,
      |  p.purchase_value AS asof_purchase_value
      |FROM clicks c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts
      |ORDER BY c.user_id, c.event_id""".stripMargin

  /** Verify-only directed-containment oracle over a dumped pair table
    * (shared by q_dedup_containment_full and q_quote_mining): recompute
    * the exact containment for only the emitted pairs and keep a row
    * only when it clears the threshold AND equals the stored value.
    *
    * `plantedRows` (round-9 ADVICE fix) are asserted UNCONDITIONALLY —
    * the planted sentinel docs (negative ids, synthesized in the query,
    * see [[dedupContainmentFull]]) must appear in the dump with exactly
    * the constructed containment, so an empty or silently-broken
    * candidate path turns this gate red instead of passing vacuously.
    * Negative ids are excluded from the recompute (their text is not in
    * the parquet corpus; their containment is pinned by construction).
    */
  private[graft] def containmentVerifyOracle(dir: String, plantedRows: String): String =
    s"""WITH all_pairs AS (SELECT * FROM read_parquet('$dir/pairs.parquet/*.parquet')),
       |pairs AS (SELECT * FROM all_pairs WHERE contained_id >= 0 AND container_id >= 0),
       |ids AS (SELECT contained_id AS id FROM pairs UNION SELECT container_id FROM pairs),
       |docs AS (SELECT doc_id, text FROM documents WHERE doc_id IN (SELECT id FROM ids)),
       |words AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws FROM docs),
       |sh AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
       |       FROM words, UNNEST(range(1, len(ws) - 1)) AS t(i)
       |       WHERE len(ws) >= 3),
       |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
       |inter AS (SELECT p.contained_id, p.container_id, count(*) AS n_inter
       |          FROM (SELECT DISTINCT contained_id, container_id FROM pairs) p
       |          JOIN sh a ON a.doc_id = p.contained_id
       |          JOIN sh b ON b.doc_id = p.container_id AND b.shingle = a.shingle
       |          GROUP BY 1, 2),
       |checked AS (SELECT p.contained_id, p.container_id, p.containment,
       |          round(CAST(i.n_inter AS DOUBLE) / sa.n_sh, 4) AS recomputed
       |          FROM pairs p
       |          JOIN inter i ON i.contained_id = p.contained_id
       |                      AND i.container_id = p.container_id
       |          JOIN sizes sa ON sa.doc_id = p.contained_id)
       |SELECT contained_id, container_id, containment FROM checked
       |WHERE recomputed >= 0.5 AND recomputed = containment
       |UNION ALL
       |$plantedRows
       |ORDER BY contained_id, container_id""".stripMargin

  /** Complete incremental-dedup oracle shared by q_dedup_incremental
    * and q_dedup_index_incr (the standing index is an implementation
    * detail — classification semantics are identical, so the same full
    * recomputation gates both): exact via the fingerprint join, near
    * via ALL inc x ex shingle-set Jaccards restricted to cross-corpus
    * pairs; status precedence and min-match-id mirrored.
    */
  private[graft] def incrementalOracleSql: String =
    """WITH docs AS (SELECT doc_id, text,
      |        md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
      |      FROM documents WHERE doc_id < 1500),
      |inc AS (SELECT * FROM docs WHERE doc_id % 5 = 0),
      |ex AS (SELECT * FROM docs WHERE doc_id % 5 <> 0),
      |exact AS (SELECT i.doc_id, min(e.doc_id) AS m
      |          FROM inc i JOIN ex e ON e.fp = i.fp GROUP BY 1),
      |words AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws FROM docs),
      |sh AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
      |       FROM words, UNNEST(range(1, len(ws) - 1)) AS t(i)
      |       WHERE len(ws) >= 3),
      |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
      |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
      |          FROM sh a JOIN sh b ON a.shingle = b.shingle
      |          WHERE a.doc_id % 5 = 0 AND b.doc_id % 5 <> 0
      |          GROUP BY 1, 2),
      |near AS (SELECT id_a AS doc_id, min(id_b) AS m
      |         FROM inter
      |         JOIN sizes sa ON sa.doc_id = id_a
      |         JOIN sizes sb ON sb.doc_id = id_b
      |         WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.8
      |         GROUP BY 1)
      |SELECT i.doc_id,
      |  CASE WHEN x.m IS NOT NULL THEN 'exact'
      |       WHEN n.m IS NOT NULL THEN 'near' ELSE 'unique' END AS status,
      |  coalesce(x.m, n.m) AS match_id
      |FROM inc i
      |LEFT JOIN exact x ON x.doc_id = i.doc_id
      |LEFT JOIN near n ON n.doc_id = i.doc_id
      |ORDER BY i.doc_id""".stripMargin

  /** The gaps-and-islands sessionization as DuckDB CTEs, shared by the
    * q_events_session oracle and the q_range_join oracle (which joins
    * points into the session intervals with a plain BETWEEN).
    */
  private[graft] def sessionOracleCtes: String =
    """seq AS (
      |  SELECT user_id, ts, event_id, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS new_s
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sess AS (
      |  SELECT user_id, ts, value,
      |    CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
      |  FROM seq),
      |sessions AS (
      |  SELECT user_id, session_seq, min(ts) AS session_start, max(ts) AS session_end,
      |    count(*) AS n_events,
      |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
      |  FROM sess GROUP BY user_id, session_seq)""".stripMargin

  /** The complete near-dup cluster computation as DuckDB CTEs: the full
    * shingle-Jaccard >= 0.8 pair graph over `pred`-sliced documents and
    * its transitive closure via a recursive walk — `lab` holds
    * (id, component) with component = min reachable id, the exact
    * semantics of [[operators.Dedup.connectedComponents]]. Shared by the
    * q_dedup_cluster and q_curate_neardup oracles; must follow a
    * `WITH RECURSIVE` keyword at the call site.
    */
  private[graft] def clusterOracleCtes(pred: String): String =
    s"""docs AS (SELECT doc_id, text FROM documents WHERE $pred),
       |words AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws FROM docs),
       |sh AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
       |       FROM words, UNNEST(range(1, len(ws) - 1)) AS t(i)
       |       WHERE len(ws) >= 3),
       |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
       |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
       |          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2),
       |pairs AS (SELECT id_a, id_b FROM inter
       |          JOIN sizes sa ON sa.doc_id = id_a
       |          JOIN sizes sb ON sb.doc_id = id_b
       |          WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.8),
       |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
       |          UNION ALL SELECT id_b, id_a FROM pairs),
       |nodes AS (SELECT DISTINCT a AS id FROM edges),
       |walk(id, comp) AS (
       |  SELECT id, id FROM nodes
       |  UNION
       |  SELECT e.b, w.comp FROM walk w JOIN edges e ON e.a = w.id),
       |lab AS (SELECT id, min(comp) AS component FROM walk GROUP BY id)""".stripMargin

  /** The curation pipeline as DuckDB CTEs (mirrors CuratePipeline.curate
    * stage by stage), shared by the q_curate_docs oracle and the
    * q_corpus_shards oracle (which composes it with the split
    * arithmetic). `q` holds the curated rows BEFORE the quality cut.
    */
  private[graft] def curateOracleCtes(from: String = "documents"): String =
    s"""base AS (SELECT doc_id, text,
       |        md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint
       |      FROM $from),
       |dedup AS (SELECT * FROM base
       |      QUALIFY row_number() OVER (PARTITION BY fingerprint ORDER BY doc_id) = 1),
       |feats AS (SELECT doc_id, fingerprint, text,
       |        list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> len(x) > 0) AS wsl,
       |        list_filter(string_split_regex(trim(text), '\\s+'), x -> len(x) > 0) AS ws,
       |        length(text) AS n_chars
       |      FROM dedup),
       |sc AS (SELECT *,
       |        len(list_filter(wsl, x -> x IN (${inList(TextAnalysis.enStop)}))) AS s_en,
       |        len(list_filter(wsl, x -> x IN (${inList(TextAnalysis.esStop)}))) AS s_es,
       |        len(list_filter(wsl, x -> x IN (${inList(TextAnalysis.frStop)}))) AS s_fr,
       |        len(list_filter(wsl, x -> x IN (${inList(TextAnalysis.deStop)}))) AS s_de
       |      FROM feats),
       |lang AS (SELECT *,
       |        CASE WHEN greatest(s_en, s_es, s_fr, s_de) = 0 THEN 'und'
       |             WHEN s_de = greatest(s_en, s_es, s_fr, s_de) THEN 'de'
       |             WHEN s_fr = greatest(s_en, s_es, s_fr, s_de) THEN 'fr'
       |             WHEN s_es = greatest(s_en, s_es, s_fr, s_de) THEN 'es'
       |             ELSE 'en' END AS lang_pred
       |      FROM sc),
       |q AS (SELECT doc_id, fingerprint, lang_pred,
       |        round(CAST(
       |          0.4 * (CASE WHEN n_chars BETWEEN 20 AND 100000 THEN 1.0 ELSE 0.0 END)
       |        + 0.3 * (CASE WHEN CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE)
       |                           / greatest(CAST(n_chars AS DOUBLE), 1.0) < 0.2 THEN 1.0 ELSE 0.0 END)
       |        + 0.3 * (CASE WHEN CAST(s_en AS DOUBLE)
       |                           / greatest(CAST(len(ws) AS DOUBLE), 1.0) > 0.01 THEN 1.0 ELSE 0.0 END)
       |        AS DOUBLE), 2) AS quality_score,
       |        CAST(len(ws) AS BIGINT) AS ws_tokens,
       |        CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS bpeish_tokens
       |      FROM lang WHERE lang_pred = 'en')""".stripMargin

  /** Oracle for q_embed_neardup: inlines the same deterministic
    * hyperplanes as the Spark plan, recomputes unit vectors, the sign-LSH
    * bucket PER UNIT VECTOR (mirroring the operator exactly), the bucket
    * equi-join, and the unit-cosine threshold — all bit-reproducible.
    */
  private[graft] def embedNearDupOracle: String = {
    val hp = Similarity.hyperplanes(8, 64)
    def arr(a: Array[Double]) = a.map(_.toString).mkString("[", ", ", "]")
    val bucketExpr = hp.indices.map { i =>
      s"(CASE WHEN list_dot_product(unit, ${arr(hp(i))}) >= 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString(" + ")
    s"""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |u AS (SELECT vec_id,
       |        list_transform(e, x -> x / sqrt(list_dot_product(e, e))) AS unit
       |      FROM emb),
       |b AS (SELECT vec_id, unit, $bucketExpr AS bucket FROM u)
       |SELECT a.vec_id AS id_a, x.vec_id AS id_b,
       |       list_dot_product(a.unit, x.unit) AS cosine
       |FROM b a JOIN b x ON a.bucket = x.bucket AND a.vec_id < x.vec_id
       |WHERE list_dot_product(a.unit, x.unit) >= 0.3
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** Oracle for q_ingest_e2e: replays the fixture batches through the
    * same mapping/merge/deactivation algebra in DuckDB (read_csv on the
    * files the query wrote; transformer SQL mirrors Transformers exactly).
    * Batch 2's duplicate SKU goes through a last-non-null-wins window
    * (file order = read_csv order, DuckDB preserves insertion order);
    * batch 5's rows are scanned with the same strict boolean CASE to
    * recompute the abort report — and contribute NOTHING to the table
    * state, proving the no-commit semantics externally.
    */
  private[graft] def ingestE2eOracle: String = ingestE2eOracleIn(e2eDir)

  private[graft] def ingestE2eOracleIn(e2eDir: String): String = {
    val bool =
      """CASE WHEN lower(trim(active)) IN ('yes','true','1') THEN true
        |       WHEN lower(trim(active)) IN ('no','false','0') THEN false
        |       ELSE NULL END""".stripMargin
    s"""WITH b1 AS (SELECT * FROM read_csv('$e2eDir/batch1.csv', header=true, all_varchar=true)),
       |b2 AS (SELECT *, row_number() OVER () AS ridx
       |       FROM read_csv('$e2eDir/batch2.csv', header=true, all_varchar=true,
       |                     null_padding=true)),
       |b3 AS (SELECT * FROM read_csv('$e2eDir/batch3.csv', header=true, all_varchar=true)),
       |b4 AS (SELECT * FROM read_json('$e2eDir/batch4.json', format='newline_delimited',
       |         columns={sku: 'VARCHAR', title: 'VARCHAR', active: 'VARCHAR'})),
       |b5 AS (SELECT *, row_number() OVER () - 1 AS ridx
       |       FROM read_csv('$e2eDir/batch5.csv', header=true, all_varchar=true)),
       |-- sku canonicalizes to '' like the reference (DictReader yields
       |-- '' for empty cells; the DDL is NOT NULL): empty skus always
       |-- INSERT (the falsy route) but sit INSIDE full-update's
       |-- deactivation scope
       |m1 AS (SELECT coalesce(trim(sku), '') AS sku, trim(title) AS title, $bool AS active,
       |         TRY_CAST(trim(regexp_replace(price, '[$$£,]', '', 'g')) AS DECIMAL(12,2)) AS max_price
       |       FROM b1),
       |m2r AS (SELECT coalesce(trim(sku), '') AS sku, trim(title) AS title, $bool AS active, ridx
       |        FROM b2 WHERE NOT (sku IS NULL AND title IS NULL AND active IS NULL)),
       |m2 AS (SELECT sku, title, active FROM (
       |         SELECT sku,
       |           last_value(title IGNORE NULLS) OVER w AS title,
       |           last_value(active IGNORE NULLS) OVER w AS active,
       |           row_number() OVER (PARTITION BY sku ORDER BY ridx DESC) AS rn
       |         FROM m2r
       |         WINDOW w AS (PARTITION BY sku ORDER BY ridx
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
       |       WHERE rn = 1),
       |m3 AS (SELECT coalesce(trim(sku), '') AS sku, trim(title) AS title FROM b3),
       |m4 AS (SELECT coalesce(trim(sku), '') AS sku, trim(title) AS title, $bool AS active FROM b4),
       |rep AS (SELECT CAST(NULL AS INTEGER) AS client_id, CAST(NULL AS VARCHAR) AS sku,
       |         CAST(NULL AS VARCHAR) AS title, CAST(NULL AS BOOLEAN) AS active,
       |         CAST(NULL AS DOUBLE) AS max_price, CAST(NULL AS TIMESTAMP) AS last_changed_on,
       |         'row ' || ridx || ': column ''active'' could not interpret value ''' || active || '''' AS report
       |       FROM b5 WHERE active IS NOT NULL AND ($bool) IS NULL
       |       UNION ALL
       |       SELECT CAST(NULL AS INTEGER), CAST(NULL AS VARCHAR),
       |         CAST(NULL AS VARCHAR), CAST(NULL AS BOOLEAN),
       |         CAST(NULL AS DOUBLE), CAST(NULL AS TIMESTAMP),
       |         'row ' || ridx || ': column ''title'' value exceeds VARCHAR(255): ''' || title || ''''
       |       FROM b5 WHERE len(trim(title)) > 255),
       |s1 AS (SELECT sku, title, coalesce(active, true) AS active, max_price,
       |         TIMESTAMP '2024-01-01 00:00:00' AS lco FROM m1),
       |-- every merge joins ONLY non-empty staged skus (the reference's
       |-- `if sku:` falsy route: '' rows always INSERT, never update),
       |-- and the full-update key set EXCLUDES '' (falsy-skipped by
       |-- _extract_skus_from_items), so stored '' rows DO deactivate
       |s2 AS (SELECT coalesce(t.sku, s.sku) AS sku,
       |         coalesce(s.title, t.title) AS title,
       |         coalesce(s.active, t.active, true) AS active,
       |         t.max_price AS max_price,
       |         CASE WHEN s.sku IS NOT NULL THEN TIMESTAMP '2024-01-02 00:00:00'
       |              ELSE t.lco END AS lco
       |       FROM s1 t FULL JOIN m2 s ON t.sku = s.sku AND s.sku <> ''),
       |deact AS (SELECT sku, title,
       |         CASE WHEN sku IS NOT NULL
       |                   AND sku NOT IN (SELECT sku FROM m3 WHERE sku <> '')
       |              THEN false ELSE active END AS active,
       |         max_price,
       |         CASE WHEN sku IS NOT NULL
       |                   AND sku NOT IN (SELECT sku FROM m3 WHERE sku <> '')
       |              THEN TIMESTAMP '2024-01-03 00:00:00' ELSE lco END AS lco
       |       FROM s2),
       |s3 AS (SELECT coalesce(t.sku, s.sku) AS sku,
       |         coalesce(s.title, t.title) AS title,
       |         coalesce(t.active, true) AS active,
       |         t.max_price AS max_price,
       |         CASE WHEN s.sku IS NOT NULL THEN TIMESTAMP '2024-01-03 00:00:00'
       |              ELSE t.lco END AS lco
       |       FROM deact t FULL JOIN m3 s ON t.sku = s.sku AND s.sku <> ''),
       |s4 AS (SELECT CAST(1 AS INTEGER) AS client_id,
       |       coalesce(t.sku, s.sku) AS sku,
       |       coalesce(s.title, t.title) AS title,
       |       coalesce(s.active, t.active, true) AS active,
       |       CAST(t.max_price AS DOUBLE) AS max_price,
       |       CASE WHEN s.sku IS NOT NULL THEN TIMESTAMP '2024-01-04 00:00:00'
       |            ELSE t.lco END AS last_changed_on,
       |       CAST(NULL AS VARCHAR) AS report
       |FROM s3 t FULL JOIN m4 s ON t.sku = s.sku AND s.sku <> '')
       |SELECT * FROM s4
       |UNION ALL SELECT * FROM rep
       |ORDER BY sku NULLS FIRST, report NULLS FIRST""".stripMargin
  }

}
