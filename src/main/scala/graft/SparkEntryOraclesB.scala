package graft

import graft.functions.Transformers
import graft.operators._
import graft.sources.AvroIO
import graft.streaming.EventStreams
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Oracle SQL map, part B (split at an entry boundary from the
  * former single literal — zero behavior change; SparkEntry.oracleSql
  * is the concatenation).
  */
private[graft] trait SparkEntryOraclesB { this: SparkEntry.type =>

  private[graft] def oracleSqlB: Map[String, String] = Map(
    "q_chunk_cdc" ->
      """WITH w AS (SELECT doc_id,
        |    list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |      x -> len(x) > 0) AS ws FROM documents),
        |v AS (SELECT doc_id, t.i AS pos,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(ws[t.i], ''),
        |        c -> CAST(ascii(c) AS BIGINT))),
        |      (a, b) -> (a * 131 + b) % 1000003) AS v
        |  FROM w, unnest(range(1, len(ws) + 1)) AS t(i)),
        |r AS (SELECT doc_id, pos, v,
        |    CASE WHEN pos >= 4 AND
        |      (7 * lag(v, 3) OVER dw + 11 * lag(v, 2) OVER dw +
        |       13 * lag(v, 1) OVER dw + 17 * v) % 16 = 0
        |    THEN 1 ELSE 0 END AS bnd
        |  FROM v WINDOW dw AS (PARTITION BY doc_id ORDER BY pos)),
        |c AS (SELECT doc_id, pos, v, coalesce(sum(bnd) OVER
        |    (PARTITION BY doc_id ORDER BY pos
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS chunk_id FROM r),
        |l AS (SELECT doc_id, chunk_id, pos, v,
        |    pos - min(pos) OVER (PARTITION BY doc_id, chunk_id) + 1 AS lpos
        |  FROM c)
        |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
        |  CAST(min(pos) AS BIGINT) AS start_pos, count(*) AS n_words,
        |  CAST(sum(lpos * v) % 1000003 AS BIGINT) AS fingerprint
        |FROM l GROUP BY 1, 2 ORDER BY doc_id, chunk_id""".stripMargin,
    // Cross-document chunk dedup: the q_chunk_cdc replay over the
    // corpus + two planted 200-word twins, aggregated by
    // (fingerprint, n_words); keep rule = min (doc, chunk).
    "q_dedup_chunks" ->
      """WITH base AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT CAST(900001 AS BIGINT), 'pfxa ' ||
        |    (SELECT string_agg('s' || i, ' ' ORDER BY i)
        |     FROM range(1, 201) t(i))
        |  UNION ALL SELECT CAST(900002 AS BIGINT), 'pfxb pfxc ' ||
        |    (SELECT string_agg('s' || i, ' ' ORDER BY i)
        |     FROM range(1, 201) t(i))),
        |w AS (SELECT doc_id,
        |    list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |      x -> len(x) > 0) AS ws FROM base),
        |v AS (SELECT doc_id, t.i AS pos,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(ws[t.i], ''),
        |        c -> CAST(ascii(c) AS BIGINT))),
        |      (a, b) -> (a * 131 + b) % 1000003) AS v
        |  FROM w, unnest(range(1, len(ws) + 1)) AS t(i)),
        |r AS (SELECT doc_id, pos, v,
        |    CASE WHEN pos >= 4 AND
        |      (7 * lag(v, 3) OVER dw + 11 * lag(v, 2) OVER dw +
        |       13 * lag(v, 1) OVER dw + 17 * v) % 16 = 0
        |    THEN 1 ELSE 0 END AS bnd
        |  FROM v WINDOW dw AS (PARTITION BY doc_id ORDER BY pos)),
        |c AS (SELECT doc_id, pos, v, coalesce(sum(bnd) OVER
        |    (PARTITION BY doc_id ORDER BY pos
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS chunk_id FROM r),
        |l AS (SELECT doc_id, chunk_id, pos, v,
        |    pos - min(pos) OVER (PARTITION BY doc_id, chunk_id) + 1 AS lpos
        |  FROM c),
        |ch AS (SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
        |    count(*) AS n_words,
        |    CAST(sum(lpos * v) % 1000003 AS BIGINT) AS fingerprint
        |  FROM l GROUP BY 1, 2)
        |SELECT fingerprint, n_words, count(*) AS n_copies,
        |  CAST(min(doc_id * 100000 + chunk_id) // 100000 AS BIGINT)
        |    AS keep_doc,
        |  CAST(min(doc_id * 100000 + chunk_id) % 100000 AS BIGINT)
        |    AS keep_chunk
        |FROM ch GROUP BY fingerprint, n_words
        |HAVING count(*) > 1
        |ORDER BY fingerprint, n_words""".stripMargin,
    "q_text_fingerprint" ->
      """SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin,
    // Per-domain absolute cap: same (priorityHash, id) selection rule,
    // expressed as a row_number window (independent of the Spark side's
    // bounded top-k aggregate).
    "q_cap_per_domain" ->
      """WITH h AS (SELECT doc_id, source,
        |    ((doc_id % 2147483647) * 2654435761) % 2147483647 AS y
        |  FROM documents),
        |p AS (SELECT doc_id, source, (y * y) % 2147483647 AS pri FROM h),
        |r AS (SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source ORDER BY pri, doc_id) AS rn
        |  FROM p)
        |SELECT doc_id, source FROM r WHERE rn <= 15
        |ORDER BY doc_id""".stripMargin,
    // Unicode normalization: the SAME stage order (NFC -> accent strip
    // -> lower -> whitespace collapse) through DuckDB's own utf8proc
    // primitives — an independent implementation of the same Unicode
    // algorithms, so a bug in either side's tables or stage order turns
    // the gate red. Literals are built with chr() so composed (233=
    // U+00E9) vs decomposed (769=U+0301 combining acute) intent is
    // pinned byte-exactly, mirroring the Spark side's escapes.
    "q_text_normalize" ->
      """WITH dirty AS (SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0
        |      THEN 'Caf' || chr(233) || '  R' || chr(201) || 'SUM' ||
        |           chr(201) || chr(9) || text
        |    WHEN doc_id % 3 = 1
        |      THEN 'na' || chr(239) || 've Z' || chr(220) || 'RICH' ||
        |           chr(10) || text || ' se' || chr(241) || 'or'
        |    ELSE 'cafe' || chr(769) || ' decomposed ' || text || '  '
        |    END AS d
        |  FROM documents)
        |SELECT doc_id,
        |  trim(regexp_replace(
        |    lower(strip_accents(nfc_normalize(d))), '\s+', ' ', 'g'))
        |    AS norm_text
        |FROM dirty ORDER BY doc_id""".stripMargin,
    "q_text_scrub" ->
      """WITH dirty AS (SELECT doc_id,
        |    text || ' contact user' || doc_id || '@example.com or +1 (555) 010-'
        |      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |      || ' see https://example.com/doc/' || doc_id || ' end' AS d
        |  FROM documents)
        |SELECT doc_id,
        |  regexp_replace(
        |    regexp_replace(
        |      regexp_replace(d, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      'https?://[^\s]+', '<URL>', 'g'),
        |    '\+?[0-9][0-9() .-]{6,}[0-9]', '<PHONE>', 'g') AS scrubbed
        |FROM dirty ORDER BY doc_id""".stripMargin,
    "q_url_canon" ->
      """WITH dirty AS (SELECT doc_id,
        |    CASE WHEN doc_id % 4 = 0 THEN 'HTTPS://Example.COM:443/Data/' || doc_id
        |           || '?utm_source=feed&page=' || doc_id || '#sec'
        |         WHEN doc_id % 4 = 1 THEN 'http://EXAMPLE.com:80/data/' || doc_id
        |           || '?page=' || doc_id || '&utm_campaign=x&ref=ok'
        |         WHEN doc_id % 4 = 2 THEN 'https://example.com/data/' || doc_id || '/'
        |         ELSE 'http://sub.Example.Com/p' || doc_id || '?fbclid=abc' || doc_id
        |    END AS url
        |  FROM documents),
        |c1 AS (SELECT doc_id, url,
        |    regexp_replace(regexp_replace(
        |      lower(regexp_extract(url, '^((?i:https?)://[^/?#]+)', 1)),
        |      '^(https://[^:]+):443$', '\1'),
        |      '^(http://[^:]+):80$', '\1') AS host,
        |    regexp_extract(url, '^(?i:https?)://[^/?#]+(.*)$', 1) AS rest
        |  FROM dirty),
        |c2 AS (SELECT doc_id, url, host,
        |    regexp_replace(regexp_replace(rest, '#.*$', ''),
        |      '[?&](utm_[a-z]+|fbclid)=[^&#]*', '', 'g') AS r
        |  FROM c1),
        |c3 AS (SELECT doc_id, url, host,
        |    regexp_replace(regexp_replace(r, '^([^?]*)&', '\1?'), '[?&]$', '') AS r
        |  FROM c2)
        |SELECT doc_id, url, host || regexp_replace(r, '/$', '') AS url_canon
        |FROM c3 ORDER BY doc_id""".stripMargin,
    // Line-df boilerplate removal: the same multi-line synthesis, the
    // same >= 100-distinct-doc threshold, reassembly ordered by the
    // original line position. The final LEFT JOIN back to the full id
    // set mirrors the operator's id-preserving contract: all-boilerplate
    // docs (doc_id % 250 == 0 in the synthesis) emit empty clean_text.
    "q_boilerplate" ->
      """WITH multi AS (SELECT doc_id,
        |    CASE WHEN doc_id % 250 = 0
        |      THEN 'nav home about contact login' || chr(10) || 'copyright example corp'
        |      ELSE 'nav home about contact login' || chr(10) || text || chr(10) ||
        |        CASE WHEN doc_id % 3 = 0 THEN 'subscribe to our newsletter'
        |             ELSE 'copyright example corp' END ||
        |        chr(10) || 'ref footer variant ' || CAST(doc_id % 7 AS VARCHAR)
        |    END AS d
        |  FROM documents),
        |ls AS (SELECT doc_id, string_split(d, chr(10)) AS arr FROM multi),
        |lines AS (SELECT doc_id, i AS pos, trim(arr[i]) AS line
        |  FROM ls, UNNEST(range(1, len(arr) + 1)) AS t(i)
        |  WHERE length(trim(arr[i])) > 0),
        |boiler AS (SELECT line FROM lines GROUP BY line
        |  HAVING count(DISTINCT doc_id) >= 100),
        |kept AS (SELECT l.doc_id, l.pos, l.line FROM lines l
        |  ANTI JOIN boiler b ON l.line = b.line),
        |asm AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean_text
        |  FROM kept GROUP BY doc_id)
        |SELECT m.doc_id, coalesce(a.clean_text, '') AS clean_text
        |FROM multi m LEFT JOIN asm a ON a.doc_id = m.doc_id
        |ORDER BY m.doc_id""".stripMargin,
    // HTML extraction: identical regexp chain (RE2 and Java regex agree
    // on these patterns), entities decoded once with &amp; last.
    "q_html_extract" ->
      """WITH h AS (SELECT doc_id,
        |    '<html><head><title>Doc ' || doc_id ||
        |    '</title><style>p { color: red; }</style></head><body><h1>Title &amp; ' ||
        |    doc_id || '</h1><p>' || text ||
        |    '</p><script>var x = 1; if (x &lt; 2) { x = 2; }</script>' ||
        |    '<!-- crawler comment --><p>tail &quot;quoted&#39;s&quot;&nbsp;' ||
        |    'fish &amp;amp; chips</p></body></html>' AS html
        |  FROM documents),
        |s1 AS (SELECT doc_id,
        |    regexp_replace(regexp_replace(regexp_replace(html,
        |      '(?s)<script[^>]*>.*?</script>', ' ', 'g'),
        |      '(?s)<style[^>]*>.*?</style>', ' ', 'g'),
        |      '(?s)<!--.*?-->', ' ', 'g') AS x
        |  FROM h),
        |s2 AS (SELECT doc_id, regexp_replace(x, '<[^>]+>', ' ', 'g') AS x FROM s1),
        |s3 AS (SELECT doc_id,
        |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |    regexp_replace(regexp_replace(x,
        |      '&lt;', '<', 'g'), '&gt;', '>', 'g'), '&quot;', '"', 'g'),
        |      '&#39;', CHR(39), 'g'), '&nbsp;', ' ', 'g'), '&amp;', '&', 'g') AS x
        |  FROM s2)
        |SELECT doc_id, trim(regexp_replace(x, '\s+', ' ', 'g')) AS clean_text
        |FROM s3 ORDER BY doc_id""".stripMargin,
    // Zipf head with cumulative coverage; ties break on the token so
    // both engines rank identically.
    "q_vocab_coverage" ->
      """WITH occ AS (SELECT unnest(list_filter(
        |    string_split_regex(trim(lower(text)), '\s+'), w -> len(w) > 0)) AS word
        |  FROM documents),
        |counts AS (SELECT word, count(*) AS n_occ FROM occ GROUP BY word),
        |total AS (SELECT count(*) AS t FROM occ),
        |top AS (SELECT word, n_occ FROM counts ORDER BY n_occ DESC, word LIMIT 40)
        |SELECT word, n_occ,
        |  row_number() OVER (ORDER BY n_occ DESC, word) AS token_rank,
        |  round(CAST(sum(n_occ) OVER (ORDER BY n_occ DESC, word
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / t, 6)
        |    AS cum_share
        |FROM top, total ORDER BY token_rank""".stripMargin,
    // Zipf slope: each ln rounded to 6 and quantized to DECIMAL(18,6)
    // BEFORE any sum, exact decimal sufficient statistics, the same
    // fixed IEEE formulas.
    "q_zipf_slope" ->
      """WITH occ AS (SELECT unnest(list_filter(
        |    string_split_regex(trim(lower(text)), '\s+'), w -> len(w) > 0)) AS word
        |  FROM documents),
        |counts AS (SELECT word, count(*) AS n_occ FROM occ GROUP BY word),
        |top AS (SELECT word, n_occ FROM counts ORDER BY n_occ DESC, word LIMIT 30),
        |r AS (SELECT row_number() OVER (ORDER BY n_occ DESC, word) AS rk,
        |    n_occ FROM top),
        |xy AS (SELECT
        |    CAST(round(ln(CAST(rk AS DOUBLE)), 6) AS DECIMAL(8,6)) AS x,
        |    CAST(round(ln(CAST(n_occ AS DOUBLE)), 6) AS DECIMAL(8,6)) AS y
        |  FROM r),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    sum(x) AS sx, sum(y) AS sy, sum(x * x) AS sxx,
        |    sum(y * y) AS syy, sum(x * y) AS sxy FROM xy)
        |SELECT n AS n_terms,
        |  round(CAST(n * sxy - sx * sy AS DOUBLE) /
        |        CAST(n * sxx - sx * sx AS DOUBLE), 6) AS zipf_slope,
        |  round(CAST(sy AS DOUBLE) / n -
        |        (CAST(n * sxy - sx * sy AS DOUBLE) /
        |         CAST(n * sxx - sx * sx AS DOUBLE)) *
        |        (CAST(sx AS DOUBLE) / n), 6) AS intercept,
        |  round((CAST(n * sxy - sx * sy AS DOUBLE) *
        |         CAST(n * sxy - sx * sy AS DOUBLE)) /
        |        (CAST(n * sxx - sx * sx AS DOUBLE) *
        |         CAST(n * syy - sy * sy AS DOUBLE)), 6) AS r2
        |FROM s""".stripMargin,
    // Unigram LM: same top-2048 vocabulary (ties on the token), same
    // unsmoothed MLE probabilities, OOV pooled into the leftover mass
    // with a one-count floor; natural log in both engines.
    // Perplexity buckets: the identical self-trained model, the same
    // (rounded score, doc_id) ntile order, the same four aggregates.
    "q_perplexity_buckets" ->
      """WITH occ AS (SELECT doc_id, unnest(list_filter(
        |    string_split_regex(trim(lower(text)), '\s+'), w -> len(w) > 0)) AS word
        |  FROM documents),
        |counts AS (SELECT word, count(*) AS n FROM occ GROUP BY word),
        |vocab AS (SELECT word, n FROM counts ORDER BY n DESC, word LIMIT 2048),
        |tot AS (SELECT count(*) AS t FROM occ),
        |oov AS (SELECT t, greatest(t - (SELECT CAST(sum(n) AS BIGINT) FROM vocab),
        |    1) AS oov_mass FROM tot),
        |scored AS (SELECT o.doc_id,
        |    coalesce(ln(CAST(v.n AS DOUBLE) / x.t),
        |             ln(CAST(x.oov_mass AS DOUBLE) / x.t)) AS lp
        |  FROM occ o LEFT JOIN vocab v USING (word) CROSS JOIN oov x),
        |docs AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |    round(-avg(lp), 6) AS avg_nll
        |  FROM scored GROUP BY doc_id),
        |b AS (SELECT *, CAST(ntile(3) OVER (ORDER BY avg_nll, doc_id) AS BIGINT)
        |    AS bucket FROM docs)
        |SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        |  min(avg_nll) AS min_nll, max(avg_nll) AS max_nll
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q_unigram_lm" ->
      """WITH occ AS (SELECT doc_id, unnest(list_filter(
        |    string_split_regex(trim(lower(text)), '\s+'), w -> len(w) > 0)) AS word
        |  FROM documents),
        |counts AS (SELECT word, count(*) AS n FROM occ GROUP BY word),
        |vocab AS (SELECT word, n FROM counts ORDER BY n DESC, word LIMIT 2048),
        |tot AS (SELECT count(*) AS t FROM occ),
        |oov AS (SELECT t, greatest(t - (SELECT CAST(sum(n) AS BIGINT) FROM vocab),
        |    1) AS oov_mass FROM tot),
        |scored AS (SELECT o.doc_id,
        |    coalesce(ln(CAST(v.n AS DOUBLE) / x.t),
        |             ln(CAST(x.oov_mass AS DOUBLE) / x.t)) AS lp
        |  FROM occ o LEFT JOIN vocab v USING (word) CROSS JOIN oov x)
        |SELECT doc_id, count(*) AS n_tokens, round(-avg(lp), 6) AS avg_nll
        |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // Interpolated bigram LM: the oracle retrains identical bigram /
    // unigram / continuation counts; per-bigram term rounds to 9
    // decimals, sums as DECIMAL weighted by DECIMAL(9,0) counts, and
    // the total rounds on the decimal before the double cast.
    "q_bigram_lm" ->
      """WITH w AS (SELECT doc_id, list_filter(
        |    string_split_regex(trim(lower(text)), '\s+'),
        |    x -> len(x) > 0) AS ws FROM documents),
        |pairs AS (SELECT doc_id, ws[t.i - 1] AS prev, ws[t.i] AS cur
        |  FROM w, unnest(range(2, len(ws) + 1)) AS t(i)
        |  WHERE len(ws) >= 2),
        |occ AS (SELECT doc_id, unnest(ws) AS word FROM w),
        |tf AS (SELECT doc_id, prev, cur, count(*) AS c
        |  FROM pairs GROUP BY 1, 2, 3),
        |cb AS (SELECT prev, cur, count(*) AS cb FROM pairs GROUP BY 1, 2),
        |cp AS (SELECT prev, sum(cb) AS cp FROM cb GROUP BY 1),
        |cu AS (SELECT word, count(*) AS cu FROM occ GROUP BY 1),
        |tot AS (SELECT count(*) AS t FROM occ),
        |model AS (SELECT b.prev, b.cur, CAST(round(-ln(
        |      0.7 * (b.cb * 1.0) / p.cp +
        |      (1.0 - 0.7) * (u.cu * 1.0) / x.t), 9) AS DECIMAL(28,9)) AS nll
        |  FROM cb b JOIN cp p USING (prev)
        |  JOIN cu u ON u.word = b.cur CROSS JOIN tot x)
        |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
        |  CAST(round(sum(CAST(c AS DECIMAL(9,0)) * nll), 4) AS DOUBLE)
        |    AS total_nll
        |FROM tf JOIN model USING (prev, cur)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // URL dedup: same dirty synthesis and canonical chain as
    // q_url_canon (page collisions via doc_id%97), then the
    // row_number-per-key argmax with the same total ordering.
    "q_dedup_url" ->
      """WITH dirty AS (SELECT doc_id, n_chars,
        |    CASE WHEN doc_id % 4 = 0 THEN 'HTTPS://Example.COM:443/page/'
        |           || (doc_id % 97) || '?utm_source=crawl#frag'
        |         WHEN doc_id % 4 = 1 THEN 'https://example.com/page/'
        |           || (doc_id % 97) || '/'
        |         WHEN doc_id % 4 = 2 THEN 'https://example.com:443/page/'
        |           || (doc_id % 97) || '?fbclid=x' || doc_id
        |         ELSE 'https://Example.com/page/' || (doc_id % 97)
        |    END AS url
        |  FROM documents),
        |c1 AS (SELECT doc_id, n_chars,
        |    regexp_replace(regexp_replace(
        |      lower(regexp_extract(url, '^((?i:https?)://[^/?#]+)', 1)),
        |      '^(https://[^:]+):443$', '\1'),
        |      '^(http://[^:]+):80$', '\1') AS host,
        |    regexp_extract(url, '^(?i:https?)://[^/?#]+(.*)$', 1) AS rest
        |  FROM dirty),
        |c2 AS (SELECT doc_id, n_chars, host,
        |    regexp_replace(regexp_replace(rest, '#.*$', ''),
        |      '[?&](utm_[a-z]+|fbclid)=[^&#]*', '', 'g') AS r
        |  FROM c1),
        |c3 AS (SELECT doc_id, n_chars, host,
        |    regexp_replace(regexp_replace(r, '^([^?]*)&', '\1?'), '[?&]$', '') AS r
        |  FROM c2),
        |canon AS (SELECT doc_id, n_chars,
        |    host || regexp_replace(r, '/$', '') AS url_canon FROM c3)
        |SELECT url_canon, doc_id, n_chars FROM (
        |  SELECT url_canon, doc_id, n_chars,
        |    row_number() OVER (PARTITION BY url_canon
        |      ORDER BY n_chars DESC, doc_id) AS rk
        |  FROM canon) WHERE rk = 1 ORDER BY url_canon""".stripMargin,
    "q_domain_authority" -> pageRankOracleSql,
    // Readability: same three regex counts (Java vs RE2 on character
    // classes both engines read identically), same rounded formula.
    "q_readability" ->
      """SELECT doc_id,
        |  greatest(1, len(string_split_regex(trim(text), '\s+')))
        |    AS n_words,
        |  greatest(1, len(regexp_extract_all(text, '[.!?]+')))
        |    AS n_sentences,
        |  greatest(1, len(regexp_extract_all(lower(text), '[aeiouy]+')))
        |    AS n_syllables,
        |  round(206.835
        |    - 1.015 * (CAST(greatest(1,
        |        len(string_split_regex(trim(text), '\s+'))) AS DOUBLE)
        |      / greatest(1, len(regexp_extract_all(text, '[.!?]+'))))
        |    - 84.6 * (CAST(greatest(1,
        |        len(regexp_extract_all(lower(text), '[aeiouy]+'))) AS DOUBLE)
        |      / greatest(1, len(string_split_regex(trim(text), '\s+')))),
        |    4) AS flesch
        |FROM documents ORDER BY doc_id""".stripMargin,
    // Shard manifest: written-shard stats must equal source-derived
    // stats under the same div arithmetic.
    "q_shard_manifest" ->
      """SELECT CAST(l_orderkey AS BIGINT) // 4096 AS shard_id,
        |  count(*) AS n_rows,
        |  min(l_orderkey) AS min_l_orderkey,
        |  max(l_orderkey) AS max_l_orderkey,
        |  min(l_shipdate) AS min_l_shipdate,
        |  max(l_shipdate) AS max_l_shipdate
        |FROM lineitem GROUP BY 1 ORDER BY shard_id""".stripMargin,
    // PPMI: same lead-based pair stream, same one-expression double.
    // TextRank: q_pmi_cooccur's pair CTEs -> symmetrized graph -> the
    // pageRankOracleSql unrolled-iteration technique -> rounded top-20.
    "q_textrank" -> textrankOracleSql,
    // Phrase search: the oracle counts phrase-equal SHINGLES — an
    // independent formulation of the position-chain join.
    "q_phrase_search" ->
      """WITH ws AS (SELECT doc_id,
        |    string_split_regex(trim(text), '\s+') AS w FROM documents),
        |sh AS (SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
        |  FROM ws, UNNEST(range(1, len(w) - 1)) AS t(i)
        |  WHERE len(w) >= 3)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits
        |FROM sh WHERE s = 'big order scan'
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // KS: the D argmax decided in exact integer arithmetic over the
    // value domain; one rounded double division at the end.
    "q_ks_test" ->
      """WITH pv AS (SELECT n_chars AS v,
        |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |    CAST(sum(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS BIGINT) AS cb
        |  FROM documents GROUP BY 1),
        |t AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
        |    CAST(sum(cb) AS BIGINT) AS nb FROM pv),
        |c AS (SELECT v,
        |    CAST(sum(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cuma,
        |    CAST(sum(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumb
        |  FROM pv)
        |SELECT na AS n_a, nb AS n_b,
        |  CAST(max(abs(cuma * nb - cumb * na)) AS BIGINT) AS d_num,
        |  round(CAST(max(abs(cuma * nb - cumb * na)) AS DOUBLE) /
        |        (CAST(na AS DOUBLE) * nb), 6) AS ks_d
        |FROM c CROSS JOIN t GROUP BY na, nb""".stripMargin,
    // Benford: first digit from the DECIMAL(18,2) string rendering
    // (both engines print decimals identically), expected shares as
    // 6-decimal literals, chi-square terms from exact counts.
    "q_benford" ->
      """WITH d AS (SELECT CAST(substr(CAST(CAST(o_totalprice AS DECIMAL(38,2))
        |      AS VARCHAR), 1, 1) AS INTEGER) AS digit
        |  FROM orders WHERE o_totalprice >= 1),
        |c AS (SELECT digit, count(*) AS n_obs FROM d GROUP BY 1),
        |tt AS (SELECT CAST(sum(n_obs) AS BIGINT) AS t FROM c),
        |e AS (SELECT * FROM (VALUES
        |  (1, CAST(0.301030 AS DOUBLE)), (2, CAST(0.176091 AS DOUBLE)),
        |  (3, CAST(0.124939 AS DOUBLE)), (4, CAST(0.096910 AS DOUBLE)),
        |  (5, CAST(0.079181 AS DOUBLE)), (6, CAST(0.066947 AS DOUBLE)),
        |  (7, CAST(0.057992 AS DOUBLE)), (8, CAST(0.051153 AS DOUBLE)),
        |  (9, CAST(0.045757 AS DOUBLE))) AS v(digit, exp_share))
        |SELECT c.digit, c.n_obs,
        |  round(CAST(c.n_obs AS DOUBLE) / t, 6) AS obs_share,
        |  e.exp_share,
        |  round((CAST(c.n_obs AS DOUBLE) - t * e.exp_share) *
        |        (CAST(c.n_obs AS DOUBLE) - t * e.exp_share) /
        |        (t * e.exp_share), 6) AS chi2_term
        |FROM c JOIN e USING (digit) CROSS JOIN tt
        |ORDER BY digit""".stripMargin,
    // k-anonymity: one keyed count, integer flag.
    "q_k_anonymity" ->
      """SELECT c_nationkey, c_mktsegment,
        |  count(*) AS class_size,
        |  CAST(count(*) < 10 AS INTEGER) AS at_risk
        |FROM customer GROUP BY 1, 2
        |ORDER BY c_nationkey, c_mktsegment""".stripMargin,
    // k-hop BFS: recursive path walk bounded at 4 hops, min(dist) per
    // node — an independent formulation of the level-synchronous
    // frontier expansion.
    "q_khop" ->
      """WITH RECURSIVE hosts AS (
        |  SELECT DISTINCT doc_id % 97 AS src FROM documents),
        |edges AS (SELECT src, (src * 3 + 1) % 97 AS dst FROM hosts
        |          UNION ALL SELECT src, (src * 7 + 2) % 97 FROM hosts),
        |walk(node, dist) AS (
        |  SELECT CAST(0 AS BIGINT), 0
        |  UNION ALL
        |  SELECT e.dst, w.dist + 1
        |  FROM walk w JOIN edges e ON e.src = w.node
        |  WHERE w.dist < 4)
        |SELECT node, CAST(min(dist) AS BIGINT) AS dist
        |FROM walk GROUP BY 1 ORDER BY node""".stripMargin,
    // ACF: unrolled lag arms over one lead-window CTE, HUGEINT-exact
    // sufficient statistics, one rounded division per lag.
    "q_acf" -> acfOracleSql,
    // Cross-correlation: unrolled lag arms over the click/purchase
    // daily join, HUGEINT-exact statistics.
    "q_xcorr" -> xcorrOracleSql,
    // CUSUM: integer-exact peak argmax (n·S_t − t·Sx), earliest-day
    // tie break, one rounded division for the reported magnitude.
    "q_cusum" ->
      """WITH daily AS (SELECT date_trunc('day', ts) AS day,
        |    CAST(count(*) AS HUGEINT) AS x FROM events GROUP BY 1),
        |t AS (SELECT CAST(count(*) AS HUGEINT) AS n,
        |    CAST(sum(x) AS HUGEINT) AS sx FROM daily),
        |s AS (SELECT day,
        |    CAST(count(*) OVER w AS HUGEINT) AS tt,
        |    CAST(sum(x) OVER w AS HUGEINT) AS st
        |  FROM daily WINDOW w AS (ORDER BY day ROWS UNBOUNDED PRECEDING)),
        |d AS (SELECT day, n * st - tt * sx AS dev, n FROM s, t)
        |SELECT day AS change_bucket,
        |  round(CAST(dev AS DOUBLE) / CAST(n AS DOUBLE), 6) AS cusum,
        |  CAST(n AS BIGINT) AS n_buckets
        |FROM d ORDER BY abs(dev) DESC, day LIMIT 1""".stripMargin,
    // EWMA: same integer-literal weight dot products, generated from
    // the same alpha/window formula.
    "q_ewma" -> ewmaOracleSql,
    // Rolling z-score: same 7-row frame sums, same fixed IEEE formula
    // and guards.
    "q_rolling_zscore" ->
      """WITH daily AS (SELECT date_trunc('day', ts) AS day,
        |    CAST(count(*) AS BIGINT) AS v FROM events GROUP BY 1),
        |f AS (SELECT day, v,
        |    CAST(count(*) OVER w AS BIGINT) AS n,
        |    CAST(sum(v) OVER w AS BIGINT) AS sx,
        |    CAST(sum(v * v) OVER w AS BIGINT) AS sxx
        |  FROM daily
        |  WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
        |SELECT day, v,
        |  CASE WHEN n >= 2 AND (n * sxx - sx * sx) > 0
        |    THEN round((CAST(v AS DOUBLE) -
        |          CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) /
        |         sqrt(CAST(n * sxx - sx * sx AS DOUBLE) /
        |          (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))), 6)
        |    ELSE 0.0 END AS z
        |FROM f ORDER BY day""".stripMargin,
    // Mergeable quantiles: the oracle computes percentile_disc on the
    // RAW table — merged shard histograms must reproduce it exactly.
    "q_quantile_shards" ->
      """SELECT
        |  CAST(percentile_disc(0.5) WITHIN GROUP
        |    (ORDER BY CAST(l_quantity AS BIGINT)) AS BIGINT) AS p50,
        |  CAST(percentile_disc(0.9) WITHIN GROUP
        |    (ORDER BY CAST(l_quantity AS BIGINT)) AS BIGINT) AS p90,
        |  CAST(percentile_disc(0.99) WITHIN GROUP
        |    (ORDER BY CAST(l_quantity AS BIGINT)) AS BIGINT) AS p99
        |FROM lineitem""".stripMargin,
    // Key skew: same sorted-rank Gini identity, HUGEINT-exact until
    // the two rounded divisions.
    "q_key_skew" ->
      """WITH c AS (SELECT user_id, CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1),
        |r AS (SELECT c, row_number() OVER (ORDER BY c, user_id) AS i FROM c),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
        |    CAST(sum(c) AS BIGINT) AS total_rows,
        |    CAST(max(c) AS BIGINT) AS cmax,
        |    sum(CAST(i AS HUGEINT) * c) AS s1 FROM r)
        |SELECT n_keys, total_rows,
        |  round(CAST(cmax AS DOUBLE) / total_rows, 6) AS max_key_share,
        |  round(CAST(2 * s1 - CAST(n_keys + 1 AS HUGEINT) * total_rows
        |          AS DOUBLE) /
        |        CAST(CAST(n_keys AS HUGEINT) * total_rows AS DOUBLE), 6)
        |    AS gini
        |FROM a""".stripMargin,
    // Keyset pagination: the cursor tuple predicate + top-5.
    "q_paginate_keyset" ->
      """SELECT p_partkey, p_name FROM part
        |WHERE p_name > 'blue bolt'
        |   OR (p_name = 'blue bolt' AND p_partkey > 1140)
        |ORDER BY p_name, p_partkey LIMIT 5""".stripMargin,
    "q_pmi_cooccur" ->
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
        |pc AS (SELECT w1, w2, count(*) AS n_pair FROM pairs GROUP BY 1, 2),
        |uni AS (SELECT w, count(*) AS n_w FROM toks GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_w) AS BIGINT) AS t_tokens FROM uni),
        |tp AS (SELECT CAST(sum(n_pair) AS BIGINT) AS t_pairs FROM pc)
        |SELECT pc.w1, pc.w2, pc.n_pair, u1.n_w AS n_w1, u2.n_w AS n_w2,
        |  round(ln((CAST(pc.n_pair AS DOUBLE) * t_tokens * t_tokens) /
        |           (CAST(t_pairs AS DOUBLE) * u1.n_w * u2.n_w)), 6) AS pmi
        |FROM pc
        |JOIN uni u1 ON u1.w = pc.w1
        |JOIN uni u2 ON u2.w = pc.w2
        |CROSS JOIN tot CROSS JOIN tp
        |WHERE pc.n_pair >= 5
        |ORDER BY pc.w1, pc.w2""".stripMargin,
    // Sparse k-NN: same 10^4-scaled BIGINT weights, exact integer
    // dots and norms, one sqrt+division on identical doubles, same
    // (rounded sim, id) ranking. The SAME from-scratch full-corpus SQL
    // also judges q_sparse_knn_incr: the merged standing+batch index
    // must answer exactly like a fresh rebuild.
    "q_sparse_knn" -> sparseKnnOracleSql(),
    "q_sparse_knn_incr" -> sparseKnnOracleSql(" WHERE doc_id < 2500"),
    // Semantic decontamination: same benchmark slice, same planted
    // copies derived from source, every cosine replayed with
    // sequential-sum list_dot_product and the same 4-decimal round.
    "q_decontaminate_semantic" ->
      """WITH bench AS (SELECT vec_id AS bench_id, CAST(embedding AS DOUBLE[]) AS be
        |  FROM embeddings WHERE vec_id % 50 = 0),
        |planted AS (SELECT bench_id + 1000000 AS vec_id, be AS e FROM bench),
        |corpus AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        |           UNION ALL SELECT * FROM planted),
        |scored AS (SELECT c.vec_id, b.bench_id,
        |    round(list_dot_product(c.e, b.be) /
        |      (sqrt(list_dot_product(c.e, c.e)) * sqrt(list_dot_product(b.be, b.be))), 4) AS cosine
        |  FROM corpus c, bench b WHERE c.vec_id <> b.bench_id)
        |SELECT vec_id, bench_id, cosine FROM scored
        |WHERE cosine >= 0.99 ORDER BY vec_id, bench_id""".stripMargin,
    
    // Persisted-index content gate: the oracle re-derives df and the
    // 10^4-scaled weights from SOURCE while the engine reads them off
    // the standing parquet artifact — any staleness or mis-weighting
    // in the artifact q_sparse_knn serves from turns this red.
    "q_sparse_index_build" ->
      """WITH n AS (SELECT count(*) AS n_docs FROM documents),
        |w AS (SELECT doc_id,
        |    unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |                       x -> len(x) > 0)) AS word
        |  FROM documents),
        |tf AS (SELECT doc_id, word, count(*) AS tf FROM w GROUP BY 1, 2),
        |df AS (SELECT word, count(DISTINCT doc_id) AS df FROM w GROUP BY 1),
        |wt AS (SELECT tf.doc_id, tf.word,
        |    CAST(round(tf.tf * ln(CAST(n.n_docs + 1 AS DOUBLE) / (df.df + 1))
        |      * 10000) AS BIGINT) AS w
        |  FROM tf JOIN df USING (word), n)
        |SELECT word, CAST(count(*) AS BIGINT) AS df,
        |  CAST(sum(w) AS BIGINT) AS total_w
        |FROM wt GROUP BY word ORDER BY word LIMIT 50""".stripMargin,
    // CDC apply: same synthesized op log, same latest-seq-wins window,
    // same terminal-delete drop.
    "q_cdc_apply" ->
      """WITH log AS (SELECT o_orderkey % 500 AS key, o_orderkey AS seq,
        |    CASE WHEN o_orderkey % 11 = 0 THEN 'D'
        |         WHEN o_orderkey % 3 = 0 THEN 'I' ELSE 'U' END AS op,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS val
        |  FROM orders),
        |r AS (SELECT key, seq, op, val,
        |    row_number() OVER (PARTITION BY key ORDER BY seq DESC) AS rn
        |  FROM log)
        |SELECT key, seq AS last_seq, op AS last_op,
        |  CAST(val AS DOUBLE) AS val
        |FROM r WHERE rn = 1 AND op <> 'D'
        |ORDER BY key""".stripMargin,
    // Incremental aggregate: the oracle recomputes the maintained state
    // from scratch over the WHOLE table — distributivity is the claim
    // under test, so the from-scratch aggregate is the right referee.
    "q_incr_agg" ->
      """SELECT o_custkey, count(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS revenue
        |FROM orders GROUP BY 1 ORDER BY o_custkey""".stripMargin,
    // Star join: the plain five-table SQL join, decimal-exact revenue.
    "q_star_join" ->
      """SELECT r_name, n_name, count(*) AS n_lines,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS revenue
        |FROM lineitem
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |JOIN nation ON n_nationkey = c_nationkey
        |JOIN region ON r_regionkey = n_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    // Entity resolution: brute-force pairs (legal: delete-1 blocking is
    // lossless at distance 1) + recursive-CTE min-label components.
    "q_entity_resolution" ->
      """WITH RECURSIVE pn AS (SELECT DISTINCT p_name AS name FROM part),
        |typos AS (SELECT substr(name, 1, len(name) // 2)
        |    || substr(name, len(name) // 2 + 2) AS name
        |  FROM pn WHERE len(name) >= 8),
        |cn AS (SELECT DISTINCT c_name AS name FROM customer
        |  WHERE c_custkey < 300),
        |ents AS (SELECT DISTINCT name FROM (
        |  SELECT name FROM pn UNION ALL SELECT name FROM typos
        |  UNION ALL SELECT name FROM cn)),
        |ids AS (SELECT name,
        |    CAST(concat('0x', substr(md5(name), 1, 15)) AS BIGINT) AS id
        |  FROM ents),
        |p2 AS (SELECT a.name AS na, b.name AS nb
        |  FROM ents a JOIN ents b ON a.name < b.name
        |    AND abs(len(a.name) - len(b.name)) <= 1
        |  WHERE levenshtein(a.name, b.name) <= 1),
        |edges AS (SELECT ia.id AS a, ib.id AS b FROM p2
        |    JOIN ids ia ON ia.name = na JOIN ids ib ON ib.name = nb
        |  UNION ALL
        |  SELECT ib.id, ia.id FROM p2
        |    JOIN ids ia ON ia.name = na JOIN ids ib ON ib.name = nb),
        |nodes AS (SELECT DISTINCT a AS id FROM edges),
        |walk(id, comp) AS (
        |  SELECT id, id FROM nodes
        |  UNION
        |  SELECT e.b, w.comp FROM walk w JOIN edges e ON e.a = w.id),
        |lab AS (SELECT id, min(comp) AS component FROM walk GROUP BY id),
        |sz AS (SELECT component, count(*) AS cluster_size
        |  FROM lab GROUP BY 1)
        |SELECT i.name, coalesce(lab.component, i.id) AS component,
        |  coalesce(sz.cluster_size, 1) AS cluster_size
        |FROM ids i LEFT JOIN lab ON lab.id = i.id
        |LEFT JOIN sz ON sz.component = lab.component
        |ORDER BY i.name""".stripMargin,
    // Skyline: textbook all-pairs NOT EXISTS dominance — an
    // independent formulation vs the Spark side's sort-sweep.
    // Set-similarity join: the textbook shared-shingle formulation with
    // NO prefix filter — an independent all-candidate derivation over
    // the same half-corpus slice; the Jaccard double is the same
    // integer ratio on both engines.
    // Capped set-sim: same shingle replay, with the df <= 8 stop-token
    // filter applied to the universe BEFORE sizes/intersections (both
    // sides see the reduced sets — the true-Jaccard-over-retained
    // trade), sentinel text shared verbatim.
    "q_setsim_capped" -> {
      val sentVals = setsimCapSentinels
        .map { case (id, t) => s"(CAST($id AS BIGINT), ${sqlStringLit(t)})" }
        .mkString(",\n         |    ")
      s"""WITH sent(doc_id, text) AS (VALUES
         |    $sentVals),
         |docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 2500
         |         UNION ALL SELECT * FROM sent),
         |words AS (SELECT doc_id,
         |    string_split_regex(trim(text), '\\s+') AS ws FROM docs),
         |sh0 AS (SELECT DISTINCT doc_id AS id,
         |    ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS w
         |  FROM words, UNNEST(range(1, len(ws) - 1)) AS t(i)
         |  WHERE len(ws) >= 3),
         |kept AS (SELECT w FROM (SELECT w, count(*) AS df FROM sh0 GROUP BY 1)
         |         WHERE df <= 8),
         |sh AS (SELECT sh0.* FROM sh0 JOIN kept USING (w)),
         |sizes AS (SELECT id, count(*) AS n FROM sh GROUP BY 1),
         |inter AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_inter
         |  FROM sh a JOIN sh b ON a.w = b.w AND a.id < b.id
         |  GROUP BY 1, 2)
         |SELECT id_a, id_b, CAST(n_inter AS BIGINT) AS n_inter,
         |  CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) AS jaccard
         |FROM inter
         |JOIN sizes sa ON sa.id = id_a
         |JOIN sizes sb ON sb.id = id_b
         |WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= 0.5
         |ORDER BY id_a, id_b""".stripMargin
    },
    "q_setsim_join" ->
      """WITH words AS (SELECT doc_id,
        |    string_split_regex(trim(text), '\s+') AS ws FROM documents
        |  WHERE doc_id % 2 = 0 AND doc_id < 5000),
        |sh AS (SELECT DISTINCT doc_id AS id,
        |    ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS w
        |  FROM words, UNNEST(range(1, len(ws) - 1)) AS t(i)
        |  WHERE len(ws) >= 3),
        |sizes AS (SELECT id, count(*) AS n FROM sh GROUP BY 1),
        |inter AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_inter
        |  FROM sh a JOIN sh b ON a.w = b.w AND a.id < b.id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b, n_inter,
        |  CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) AS jaccard
        |FROM inter
        |JOIN sizes sa ON sa.id = id_a
        |JOIN sizes sb ON sb.id = id_b
        |WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= 0.5
        |ORDER BY id_a, id_b""".stripMargin,
    "q_skyline" ->
      """SELECT p_partkey, p_name, p_retailprice, p_size
        |FROM part a WHERE NOT EXISTS (
        |  SELECT 1 FROM part b
        |  WHERE b.p_retailprice <= a.p_retailprice
        |    AND b.p_size >= a.p_size
        |    AND (b.p_retailprice < a.p_retailprice
        |         OR b.p_size > a.p_size))
        |ORDER BY p_partkey""".stripMargin,
    // Retention: same integer month index, same two aggregates.
    "q_retention_cohorts" ->
      """WITH o AS (SELECT o_custkey,
        |    year(o_orderdate) * 12 + month(o_orderdate) AS m
        |  FROM orders),
        |f AS (SELECT o_custkey, min(m) AS cohort FROM o GROUP BY 1)
        |SELECT cohort, m - cohort AS age,
        |  count(DISTINCT o.o_custkey) AS n_active
        |FROM o JOIN f USING (o_custkey)
        |GROUP BY 1, 2 ORDER BY cohort, age""".stripMargin,
    // Winsorize: disc percentiles derived from cume_dist (the
    // q_percentile_disc technique), same clamp arithmetic.
    "q_winsorize" ->
      """WITH cd AS (SELECT source, n_chars AS v,
        |    cume_dist() OVER (PARTITION BY source ORDER BY n_chars) AS cd
        |  FROM documents),
        |b AS (SELECT source,
        |    CAST(min(CASE WHEN cd >= 0.1 THEN v END) AS BIGINT) AS lo,
        |    CAST(min(CASE WHEN cd >= 0.9 THEN v END) AS BIGINT) AS hi
        |  FROM cd GROUP BY source)
        |SELECT doc_id, d.source, n_chars,
        |  greatest(b.lo, least(b.hi, n_chars)) AS n_chars_w
        |FROM documents d JOIN b ON b.source = d.source
        |ORDER BY doc_id""".stripMargin,
    // MAD outliers: both medians via the cume_dist technique; the flag
    // is an all-integer comparison, so no float tolerance is needed.
    "q_anomaly_mad" ->
      """WITH v AS (SELECT doc_id, source,
        |    CAST(n_chars + CASE WHEN doc_id % 97 = 0 THEN 5000 ELSE 0
        |         END AS BIGINT) AS v
        |  FROM documents),
        |cd1 AS (SELECT *, cume_dist()
        |    OVER (PARTITION BY source ORDER BY v) AS cd FROM v),
        |med AS (SELECT source,
        |    CAST(min(CASE WHEN cd >= 0.5 THEN v END) AS BIGINT) AS med
        |  FROM cd1 GROUP BY source),
        |dv AS (SELECT doc_id, v.source, v.v, med, abs(v.v - med) AS dev
        |  FROM v JOIN med ON v.source = med.source),
        |cd2 AS (SELECT *, cume_dist()
        |    OVER (PARTITION BY source ORDER BY dev) AS cd FROM dv),
        |mad AS (SELECT source,
        |    CAST(min(CASE WHEN cd >= 0.5 THEN dev END) AS BIGINT) AS mad
        |  FROM cd2 GROUP BY source)
        |SELECT dv.doc_id, dv.source, dv.v, dv.med, mad.mad,
        |  CAST(dv.dev > 5 * mad.mad AS INTEGER) AS is_outlier
        |FROM dv JOIN mad ON dv.source = mad.source
        |ORDER BY dv.doc_id""".stripMargin,
    // Equi-depth: same (value, count) collapse, same exclusive
    // cumulative bucket index (cum * 10) // N.
    "q_histogram_equidepth" ->
      """WITH vals AS (SELECT n_chars AS v, count(*) AS c
        |  FROM documents GROUP BY 1),
        |t AS (SELECT sum(c) AS n FROM vals),
        |cum AS (SELECT v, c,
        |    coalesce(sum(c) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
        |  FROM vals)
        |SELECT CAST((cum * 10) // n AS BIGINT) AS bucket,
        |  CAST(sum(c) AS BIGINT) AS n_rows,
        |  min(v) AS lo, max(v) AS hi
        |FROM cum, t GROUP BY 1 ORDER BY 1""".stripMargin,
    // Transitions: same (ts, event_id)-ordered lag per user.
    "q_event_transitions" ->
      """WITH lagged AS (SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev_type
        |  FROM events)
        |SELECT prev_type, event_type AS next_type,
        |  count(*) AS n_transitions
        |FROM lagged WHERE prev_type IS NOT NULL
        |GROUP BY 1, 2 ORDER BY prev_type, next_type""".stripMargin,
    // Script detect: RE2 \p{Script} classes — an independent Unicode
    // property implementation vs Java's \p{IsScript}.
    "q_script_detect" ->
      """WITH t AS (SELECT doc_id, substr(text, 1, 40) ||
        |    CASE WHEN doc_id % 4 = 1 THEN ' привет мир добро'
        |         WHEN doc_id % 4 = 2 THEN ' 你好世界数据'
        |         WHEN doc_id % 4 = 3 THEN ' γεια σου κόσμε'
        |         ELSE '' END AS txt
        |  FROM documents WHERE doc_id < 200),
        |c AS (SELECT doc_id,
        |    CAST(len(regexp_extract_all(txt, '\p{Latin}')) AS BIGINT) AS n_latin,
        |    CAST(len(regexp_extract_all(txt, '\p{Cyrillic}')) AS BIGINT) AS n_cyrillic,
        |    CAST(len(regexp_extract_all(txt, '\p{Han}')) AS BIGINT) AS n_han,
        |    CAST(len(regexp_extract_all(txt, '\p{Greek}')) AS BIGINT) AS n_greek
        |  FROM t)
        |SELECT doc_id, n_latin, n_cyrillic, n_han, n_greek,
        |  CASE WHEN n_cyrillic > 0 THEN 'cyrillic'
        |       WHEN n_han > 0 THEN 'han'
        |       WHEN n_greek > 0 THEN 'greek'
        |       ELSE 'latin' END AS script
        |FROM c ORDER BY doc_id""".stripMargin,
    // Co-purchase: same capped-basket population (quarter-corpus order
    // slice), same pair join, all integer counts.
    "q_copurchase" ->
      """WITH items AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |  FROM lineitem WHERE l_orderkey % 4 = 0),
        |kept AS (SELECT o, p FROM (SELECT o, p,
        |    count(*) OVER (PARTITION BY o) AS n FROM items) WHERE n <= 64),
        |support AS (SELECT p, count(*) AS n FROM kept GROUP BY p),
        |pairs AS (SELECT a.p AS item_a, b.p AS item_b, count(*) AS n_ab
        |  FROM kept a JOIN kept b ON a.o = b.o AND a.p < b.p
        |  GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT item_a, item_b, n_ab, sa.n AS n_a, sb.n AS n_b
        |FROM pairs JOIN support sa ON sa.p = item_a
        |JOIN support sb ON sb.p = item_b
        |ORDER BY item_a, item_b""".stripMargin,
    // Item-item CF: same pair counts (support >= 3), symmetrized, same
    // rounded cosine and (sim DESC, other) rank.
    "q_item_cf" ->
      """WITH items AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |  FROM lineitem WHERE l_orderkey % 2 = 0),
        |kept AS (SELECT o, p FROM (SELECT o, p,
        |    count(*) OVER (PARTITION BY o) AS n FROM items) WHERE n <= 64),
        |support AS (SELECT p, count(*) AS n FROM kept GROUP BY p),
        |pairs AS (SELECT a.p AS item_a, b.p AS item_b, count(*) AS n_ab
        |  FROM kept a JOIN kept b ON a.o = b.o AND a.p < b.p
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |fp AS (SELECT item_a, item_b, n_ab, sa.n AS n_i, sb.n AS n_o
        |    FROM pairs JOIN support sa ON sa.p = item_a
        |    JOIN support sb ON sb.p = item_b),
        |sym AS (SELECT item_a AS item, item_b AS other, n_ab, n_i, n_o
        |    FROM fp
        |  UNION ALL SELECT item_b, item_a, n_ab, n_o, n_i FROM fp),
        |scored AS (SELECT item, other, n_ab,
        |    round(CAST(n_ab AS DOUBLE) /
        |      sqrt(CAST(n_i * n_o AS DOUBLE)), 6) AS sim
        |  FROM sym),
        |ranked AS (SELECT item, other, n_ab, sim,
        |    row_number() OVER (PARTITION BY item
        |      ORDER BY sim DESC, other) AS nbr_rank
        |  FROM scored)
        |SELECT item, other, n_ab, sim, nbr_rank FROM ranked
        |WHERE nbr_rank <= 3 ORDER BY item, nbr_rank""".stripMargin,
    // New vs returning: same day-distinct collapse + first-day join.
    "q_new_vs_returning" ->
      """WITH days AS (SELECT DISTINCT date_trunc('day', ts) AS day, user_id
        |  FROM events),
        |f AS (SELECT user_id, min(day) AS fd FROM days GROUP BY 1)
        |SELECT d.day,
        |  CAST(count(*) AS BIGINT) AS n_active,
        |  CAST(sum(CASE WHEN d.day = f.fd THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_new,
        |  CAST(count(*) - sum(CASE WHEN d.day = f.fd THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_returning
        |FROM days d JOIN f USING (user_id)
        |GROUP BY d.day ORDER BY d.day""".stripMargin,
    // Conversion latency: exact microsecond spans, integer seconds,
    // exact percentile_disc summary.
    "q_conversion_latency" ->
      """WITH c AS (SELECT user_id, min(epoch_us(ts)) AS c0 FROM events
        |  WHERE event_type = 'click' GROUP BY 1),
        |p AS (SELECT user_id, epoch_us(ts) AS pt FROM events
        |  WHERE event_type = 'purchase'),
        |l AS (SELECT c.user_id, (min(pt) - c0) // 1000000 AS latency_s
        |  FROM c JOIN p ON p.user_id = c.user_id AND p.pt >= c.c0
        |  GROUP BY c.user_id, c.c0)
        |SELECT CAST(count(*) AS BIGINT) AS n_converted,
        |  CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY latency_s)
        |    AS BIGINT) AS p50_s,
        |  CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY latency_s)
        |    AS BIGINT) AS p90_s
        |FROM l""".stripMargin,
    // Triangles: independent a<b<c 3-way-join formulation (not the
    // Spark side's degree-ordered wedge algorithm) — same set.
    "q_triangle_count" ->
      """WITH hosts AS (SELECT DISTINCT doc_id % 97 AS u FROM documents),
        |raw AS (SELECT u AS src, (u * 3 + 1) % 97 AS dst FROM hosts
        |  UNION ALL SELECT u, (u * 7 + 2) % 97 FROM hosts
        |  UNION ALL SELECT u, (u * u + 1) % 97 FROM hosts),
        |und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |  FROM raw WHERE src <> dst),
        |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |  FROM und e1 JOIN und e2 ON e2.a = e1.b
        |  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
        |nodes AS (SELECT unnest([x, y, z]) AS node FROM tri)
        |SELECT node, count(*) AS n_triangles FROM nodes
        |GROUP BY node ORDER BY node""".stripMargin,
    // Sketch-union distinct counts: DuckDB recomputes the EXACT distinct
    // count per scope and emits a dumped estimate only when it lands
    // inside 3x the lgK=12 relative standard error (~5%). An estimate
    // outside the envelope drops the row -> row-count mismatch -> red.
    "q_distinct_shards" ->
      s"""WITH dumped AS (SELECT * FROM
         |    read_parquet('$hllShardsDir/result.parquet/*.parquet')),
         |exact AS (SELECT CAST(l_returnflag AS VARCHAR) AS scope,
         |        count(DISTINCT l_orderkey) AS n
         |      FROM lineitem GROUP BY 1
         |      UNION ALL
         |      SELECT 'ALL', count(DISTINCT l_orderkey) FROM lineitem)
         |SELECT d.scope, d.estimate
         |FROM dumped d JOIN exact e ON e.scope = d.scope
         |WHERE abs(CAST(d.estimate AS DOUBLE) - n) <= 0.05 * n
         |ORDER BY d.scope""".stripMargin,
    // Count-Min: full sketch replay — same fixed hash rows, same sparse
    // cell aggregate, same min-over-depth with absent cells as 0. The
    // key reduces mod P first (the engine's overflow-safe cellOf);
    // identical for the non-negative in-range keys here.
    "q_countmin" ->
      """WITH ab(j, a, b) AS (VALUES (0, 1299709, 7), (1, 15485863, 101),
        |    (2, 32452843, 1009), (3, 49979687, 10007)),
        |cells AS (SELECT j,
        |    ((a * ((l_partkey % 2147483647 + 2147483647) % 2147483647) + b)
        |      % 2147483647) % 1024 AS c,
        |    count(*) AS n
        |  FROM lineitem CROSS JOIN ab GROUP BY 1, 2),
        |probes AS (SELECT DISTINCT l_partkey AS k FROM lineitem
        |  WHERE l_partkey < 30),
        |est AS (SELECT k, min(coalesce(cells.n, 0)) AS est
        |  FROM probes CROSS JOIN ab LEFT JOIN cells
        |    ON cells.j = ab.j
        |    AND cells.c = ((ab.a * ((k % 2147483647 + 2147483647)
        |      % 2147483647) + ab.b) % 2147483647) % 1024
        |  GROUP BY k),
        |exact AS (SELECT l_partkey AS k, count(*) AS exact_n
        |  FROM lineitem WHERE l_partkey < 30 GROUP BY 1)
        |SELECT e.k, e.est, x.exact_n
        |FROM est e JOIN exact x USING (k) ORDER BY k""".stripMargin,
    // Z-score: same exact-decimal power sums, same double formula
    // operation-for-operation, same n<2 / zero-variance guard.
    "q_zscore_norm" ->
      """WITH sums AS (SELECT source, count(*) AS n_rows,
        |        sum(CAST(n_chars AS DECIMAL(18,2))) AS sx,
        |        sum(CAST(n_chars AS DECIMAL(18,2)) * CAST(n_chars AS DECIMAL(18,2))) AS sxx
        |      FROM documents GROUP BY source),
        |st AS (SELECT source,
        |        CAST(sx AS DOUBLE) / CAST(n_rows AS DOUBLE) AS m,
        |        sqrt((CAST(n_rows AS DOUBLE) * CAST(sxx AS DOUBLE)
        |              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |             / (CAST(n_rows AS DOUBLE) * (CAST(n_rows AS DOUBLE) - 1.0))) AS sd
        |      FROM sums)
        |SELECT doc_id, d.source, n_chars,
        |  CASE WHEN sd > 0 THEN round((CAST(n_chars AS DOUBLE) - m) / sd, 6)
        |       ELSE 0.0 END AS zscore
        |FROM documents d JOIN st ON st.source = d.source
        |ORDER BY doc_id""".stripMargin,
    // Weighted sampling: same all-long keep test, same 100k-granularity
    // hash — h * sum(w) < B * w * 100000.
    "q_weighted_sample" ->
      """WITH t AS (SELECT sum(n_chars) AS wt FROM documents),
        |h AS (SELECT doc_id, n_chars,
        |    ((doc_id % 2147483647) * 2654435761) % 2147483647 AS y
        |  FROM documents)
        |SELECT doc_id, n_chars FROM h, t
        |WHERE ((y * y) % 2147483647 % 100000) * wt < 200 * n_chars * 100000
        |ORDER BY doc_id""".stripMargin,
    // PSI drift: same fixed-width integer bucketing, same epsilon
    // clamp, same per-bucket (p-q)ln(p/q) terms.
    "q_drift_psi" ->
      """WITH b AS (SELECT n_chars // 200 AS bucket, count(*) AS n_base
        |  FROM documents WHERE doc_id % 2 = 0 GROUP BY 1),
        |c AS (SELECT n_chars // 200 AS bucket, count(*) AS n_cur
        |  FROM documents WHERE doc_id % 2 = 1 GROUP BY 1),
        |t AS (SELECT
        |    (SELECT count(*) FROM documents WHERE doc_id % 2 = 0) AS tb,
        |    (SELECT count(*) FROM documents WHERE doc_id % 2 = 1) AS tc),
        |j AS (SELECT coalesce(b.bucket, c.bucket) AS bucket,
        |    coalesce(n_base, 0) AS n_base, coalesce(n_cur, 0) AS n_cur
        |  FROM b FULL JOIN c ON b.bucket = c.bucket)
        |SELECT bucket, n_base, n_cur,
        |  round((greatest(CAST(n_base AS DOUBLE) / tb, 1e-6)
        |       - greatest(CAST(n_cur AS DOUBLE) / tc, 1e-6)) *
        |    ln(greatest(CAST(n_base AS DOUBLE) / tb, 1e-6)
        |     / greatest(CAST(n_cur AS DOUBLE) / tc, 1e-6)), 6) AS psi_term
        |FROM j, t ORDER BY bucket""".stripMargin,
    // Temperature resampling: same tau=0.5 / 60%-budget arithmetic on
    // the tiny domain table (floored to integer percent — the only
    // doubles live there), same splitBucket hash per row. The rate is
    // floor(round(x, 9)) in BOTH engines so a 1-ULP pow/summation
    // difference at an integer boundary cannot flip a domain's rate
    // (see TextAnalysis.temperatureResample).
    "q_temperature_sample" ->
      """WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
        |t AS (SELECT count(*) AS nt FROM documents),
        |w AS (SELECT source, n, pow(CAST(n AS DOUBLE) / nt, 0.5) AS wt FROM c, t),
        |s AS (SELECT sum(wt) AS wsum FROM w),
        |r AS (SELECT source,
        |    least(CAST(100 AS BIGINT), CAST(floor(round(
        |      100.0 * ((nt * 60) // 100) * (wt / wsum) / n, 9)) AS BIGINT)) AS rate_pct
        |  FROM w, s, t),
        |h AS (SELECT doc_id, source,
        |    ((doc_id % 2147483647) * 2654435761) % 2147483647 AS y
        |  FROM documents)
        |SELECT h.doc_id, h.source FROM h JOIN r USING (source)
        |WHERE (h.y * h.y) % 2147483647 % 100 < r.rate_pct
        |ORDER BY h.doc_id""".stripMargin,
    // Paragraph dedup: same synthesis, md5-keyed first-occurrence
    // window with the same (doc_id, pos) total order, order-restoring
    // reassembly.
    "q_para_dedup" ->
      """WITH multi AS (SELECT doc_id,
        |    'shared intro ' || (doc_id % 41) || chr(10) || chr(10) || text ||
        |    chr(10) || chr(10) || 'unique tail ' || doc_id AS d
        |  FROM documents),
        |ls AS (SELECT doc_id, string_split(d, chr(10) || chr(10)) AS arr FROM multi),
        |paras AS (SELECT doc_id, i AS pos, trim(arr[i]) AS para
        |  FROM ls, UNNEST(range(1, len(arr) + 1)) AS t(i)
        |  WHERE length(trim(arr[i])) > 0),
        |firsts AS (SELECT doc_id, pos, para,
        |    row_number() OVER (PARTITION BY md5(para)
        |      ORDER BY doc_id, pos) AS rk
        |  FROM paras)
        |SELECT doc_id, string_agg(para, chr(10) || chr(10) ORDER BY pos) AS clean_text
        |FROM firsts WHERE rk = 1 GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // Epoch reshuffle: epoch-keyed md5, hex-prefix shard, per-shard
    // position window — the group-split hash idiom plus row_number.
    "q_epoch_shuffle" ->
      """WITH e AS (SELECT doc_id, unnest([0, 1]) AS epoch FROM documents),
        |h AS (SELECT epoch, doc_id,
        |    md5(concat(epoch, ':', doc_id)) AS hk
        |  FROM e),
        |b AS (SELECT epoch, doc_id, hk,
        |    CAST(CAST(concat('0x', substr(hk, 1, 6)) AS BIGINT) % 8 AS INT) AS shard
        |  FROM h)
        |SELECT epoch, doc_id, shard,
        |  CAST(row_number() OVER (PARTITION BY epoch, shard ORDER BY hk, doc_id) AS INT) AS pos
        |FROM b ORDER BY epoch, shard, pos""".stripMargin,
    "q_sample_split" ->
      """WITH h AS (SELECT doc_id,
        |    ((doc_id % 2147483647) * 2654435761) % 2147483647 AS y
        |  FROM documents),
        |b AS (SELECT doc_id, (y * y) % 2147483647 % 100 AS split_bucket FROM h)
        |SELECT doc_id, split_bucket,
        |  CASE WHEN split_bucket < 80 THEN 'train'
        |       WHEN split_bucket < 90 THEN 'valid'
        |       ELSE 'test' END AS split
        |FROM b ORDER BY doc_id""".stripMargin,
    // Group split: same md5-prefix bucket on the GROUP key replayed in
    // DuckDB's own md5 — group purity is structural (hash of source).
    "q_group_split" ->
      """WITH b AS (SELECT doc_id, source,
        |    CAST(concat('0x', substr(md5(source), 1, 6)) AS BIGINT) % 100
        |      AS split_bucket
        |  FROM documents)
        |SELECT doc_id, source, split_bucket,
        |  CASE WHEN split_bucket < 60 THEN 'train'
        |       WHEN split_bucket < 80 THEN 'valid'
        |       ELSE 'test' END AS split
        |FROM b ORDER BY doc_id""".stripMargin,
    "q_sample_stratified" ->
      """WITH h AS (SELECT doc_id, lang,
        |    ((doc_id % 2147483647) * 2654435761) % 2147483647 AS y
        |  FROM documents),
        |b AS (SELECT doc_id, lang, (y * y) % 2147483647 % 100 AS bkt FROM h)
        |SELECT doc_id, lang FROM b
        |WHERE bkt < CASE WHEN lang = 'en' THEN 10 ELSE 50 END
        |ORDER BY doc_id""".stripMargin,
    "q_compact" ->
      """SELECT doc_id, lang, n_chars FROM documents ORDER BY doc_id""",
    "q_pack_sequences" ->
      """WITH h AS (SELECT doc_id,
        |    ((doc_id % 2147483647) * 2654435761) % 2147483647 AS y
        |  FROM documents),
        |sp AS (SELECT doc_id,
        |    CASE WHEN (y * y) % 2147483647 % 100 < 80 THEN 'train'
        |         WHEN (y * y) % 2147483647 % 100 < 90 THEN 'valid'
        |         ELSE 'test' END AS split
        |  FROM h),
        |toks AS (SELECT d.doc_id, sp.split,
        |    len(list_filter(string_split_regex(trim(d.text), '\s+'), x -> len(x) > 0)) AS n
        |  FROM documents d JOIN sp ON sp.doc_id = d.doc_id),
        |cum AS (SELECT doc_id, split, n,
        |    CAST(sum(n) OVER (PARTITION BY split ORDER BY doc_id) AS BIGINT) AS e
        |  FROM toks WHERE n > 0),
        |seg AS (SELECT doc_id, split, e - n AS s, e FROM cum),
        |bins AS (SELECT doc_id, split, s, e,
        |    unnest(range(s // 512, (e - 1) // 512 + 1)) AS chunk_id FROM seg)
        |SELECT split, chunk_id, doc_id,
        |  greatest(s, chunk_id * 512) - chunk_id * 512 AS off_in_chunk,
        |  least(e, (chunk_id + 1) * 512) - greatest(s, chunk_id * 512) AS n_toks
        |FROM bins ORDER BY split, chunk_id, doc_id""".stripMargin,
    "q_curate_docs" ->
      s"""WITH ${curateOracleCtes("(SELECT * FROM documents WHERE doc_id < 2500) documents")}
         |SELECT doc_id, fingerprint, lang_pred, quality_score, ws_tokens, bpeish_tokens
         |FROM q WHERE quality_score >= 0.7 ORDER BY doc_id""".stripMargin,
    // C4 rules: same line split, same retained-line predicate, same
    // containment tests and conjunction, sentinel text shared verbatim.
    "q_c4_rules" -> {
      val sentVals = c4Sentinels
        .map { case (id, t) => s"(CAST($id AS BIGINT), ${sqlStringLit(t)})" }
        .mkString(",\n         |    ")
      s"""WITH sent(doc_id, text) AS (VALUES
         |    $sentVals),
         |all0 AS (SELECT doc_id, text FROM documents
         |         UNION ALL SELECT * FROM sent),
         |l AS (SELECT doc_id, text, string_split(text, chr(10)) AS lines
         |  FROM all0),
         |k AS (SELECT doc_id, text, lines,
         |    list_filter(lines, x -> regexp_matches(rtrim(x), '[.!?"]$$')
         |      AND len(list_filter(string_split_regex(trim(x), '\\s+'),
         |            w -> len(w) > 0)) >= 5) AS kept
         |  FROM l)
         |SELECT doc_id,
         |  CAST(len(lines) AS BIGINT) AS n_lines,
         |  CAST(len(kept) AS BIGINT) AS n_kept_lines,
         |  CAST(coalesce(list_sum(list_transform(kept,
         |    x -> len(list_filter(string_split_regex(trim(x), '\\s+'),
         |           w -> len(w) > 0)))), 0) AS BIGINT) AS kept_ws_tokens,
         |  CAST(len(regexp_extract_all(text, '[.!?]')) AS BIGINT) AS n_sentences,
         |  NOT contains(text, '{') AS ok_braces,
         |  NOT contains(lower(text), 'lorem ipsum') AS ok_lorem,
         |  len(regexp_extract_all(text, '[.!?]')) >= 3 AS ok_min_sentences,
         |  (NOT contains(text, '{')) AND (NOT contains(lower(text), 'lorem ipsum'))
         |    AND len(regexp_extract_all(text, '[.!?]')) >= 3
         |    AND len(kept) > 0 AS pass
         |FROM k ORDER BY doc_id""".stripMargin
    },
    // Gopher rules: every count and every cleared-denominator integer
    // comparison recomputed in SQL over the same corpus + sentinels
    // (sentinel text shared verbatim from gopherSentinels).
    "q_gopher_rules" -> {
      val sentVals = gopherSentinels
        .map { case (id, t) => s"(CAST($id AS BIGINT), ${sqlStringLit(t)})" }
        .mkString(",\n         |    ")
      s"""WITH sent(doc_id, text) AS (VALUES
         |    $sentVals),
         |all0 AS (SELECT doc_id, text FROM documents
         |         UNION ALL SELECT * FROM sent),
         |w AS (SELECT doc_id, text,
         |    list_filter(string_split_regex(trim(text), '\\s+'), x -> len(x) > 0) AS ws,
         |    string_split(text, chr(10)) AS lines
         |  FROM all0),
         |m AS (SELECT doc_id,
         |    CAST(len(ws) AS BIGINT) AS n_words,
         |    CAST(coalesce(list_sum(list_transform(ws, x -> len(x))), 0) AS BIGINT) AS sum_word_chars,
         |    CAST(len(text) - len(regexp_replace(text, '#', '', 'g')) AS BIGINT) AS n_hash,
         |    CAST((len(text) - len(regexp_replace(text, '\\.\\.\\.', '', 'g'))) // 3 AS BIGINT) AS n_ell,
         |    CAST(len(lines) AS BIGINT) AS n_lines,
         |    CAST(len(list_filter(lines, l -> substr(ltrim(l), 1, 1) IN ('-', '*', '•'))) AS BIGINT) AS n_bullet,
         |    CAST(len(list_filter(lines, l -> regexp_matches(rtrim(l), '\\.\\.\\.$$'))) AS BIGINT) AS n_ell_lines,
         |    CAST(len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS n_alpha,
         |    CAST(len(list_intersect(list_distinct(list_transform(ws, x -> lower(x))),
         |         ['the', 'be', 'to', 'of', 'and', 'that', 'have', 'with'])) AS BIGINT) AS n_req
         |  FROM w),
         |f AS (SELECT doc_id, n_words, sum_word_chars, n_lines,
         |    (n_words >= 50 AND n_words <= 100000) AS ok_word_count,
         |    (sum_word_chars >= n_words * 3 AND sum_word_chars <= n_words * 10) AS ok_mean_word_len,
         |    ((n_hash + n_ell) * 10 <= n_words) AS ok_symbol_ratio,
         |    (n_bullet * 10 < n_lines * 9) AS ok_bullets,
         |    (n_ell_lines * 10 < n_lines * 3) AS ok_ellipsis_lines,
         |    (n_alpha * 5 >= n_words * 4) AS ok_alpha_words,
         |    (n_req >= 2) AS ok_required_words
         |  FROM m)
         |SELECT doc_id, n_words, sum_word_chars, n_lines,
         |  ok_word_count, ok_mean_word_len, ok_symbol_ratio, ok_bullets,
         |  ok_ellipsis_lines, ok_alpha_words, ok_required_words,
         |  (ok_word_count AND ok_mean_word_len AND ok_symbol_ratio
         |   AND ok_bullets AND ok_ellipsis_lines AND ok_alpha_words
         |   AND ok_required_words) AS pass
         |FROM f ORDER BY doc_id""".stripMargin
    },
    // Rejection audit: every per-row signal computed for ALL docs (the
    // stage filters only gate the VERDICT precedence, and each signal
    // is a per-row pure function), then the same first-failure CASE.
    // Gopher line-repetition rules: same line split, same distinct
    // collapse and char sums, same integer comparisons; sentinel text
    // shared verbatim.
    "q_gopher_repetition" -> {
      val sentVals = gopherRepSentinels
        .map { case (id, t) => s"(CAST($id AS BIGINT), ${sqlStringLit(t)})" }
        .mkString(",\n         |    ")
      s"""WITH sent(doc_id, text) AS (VALUES
         |    $sentVals),
         |all0 AS (SELECT doc_id, text FROM documents
         |         UNION ALL SELECT * FROM sent),
         |m AS (SELECT doc_id,
         |    CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_lines,
         |    CAST(len(list_distinct(string_split(text, chr(10)))) AS BIGINT) AS n_distinct,
         |    CAST(coalesce(list_sum(list_transform(string_split(text, chr(10)), x -> len(x))), 0) AS BIGINT) AS line_chars,
         |    CAST(coalesce(list_sum(list_transform(list_distinct(string_split(text, chr(10))), x -> len(x))), 0) AS BIGINT) AS distinct_chars
         |  FROM all0)
         |SELECT doc_id, n_lines,
         |  n_lines - n_distinct AS n_dup_lines,
         |  line_chars,
         |  line_chars - distinct_chars AS dup_line_chars,
         |  (n_lines - n_distinct) * 10 < n_lines * 3 AS ok_dup_lines,
         |  (line_chars = 0 OR
         |   (line_chars - distinct_chars) * 10 < line_chars * 2) AS ok_dup_line_chars,
         |  ((n_lines - n_distinct) * 10 < n_lines * 3) AND (line_chars = 0 OR
         |   (line_chars - distinct_chars) * 10 < line_chars * 2) AS pass
         |FROM m ORDER BY doc_id""".stripMargin
    },
    // N-gram repetition rules: the oracle rebuilds the canonical
    // rendering (trim+lower, \s+ split, single-space join), explodes
    // every word with its cumulative start offset, forms each n-gram's
    // (start, end, text) via a positional self-join + substr of the
    // canonical string, then replays occurrences x length (top rules)
    // and the running-max span-union sweep (dup rules) with window
    // functions; sentinel text shared verbatim.
    "q_gopher_ngram" -> {
      val sentVals = gopherNgramSentinels
        .map { case (id, t) => s"(CAST($id AS BIGINT), ${sqlStringLit(t)})" }
        .mkString(",\n         |    ")
      val topT = Seq(2 -> 20, 3 -> 18, 4 -> 16)
      val dupT = Seq(5 -> 15, 6 -> 14, 7 -> 13, 8 -> 12, 9 -> 11, 10 -> 10)
      val statCols =
        (topT.map { case (n, _) =>
          s"CAST(coalesce(t.top${n}_chars, 0) AS BIGINT) AS top${n}_chars" } ++
          dupT.map { case (n, _) =>
            s"CAST(coalesce(du.dup${n}_chars, 0) AS BIGINT) AS dup${n}_chars" })
          .mkString(",\n         |  ")
      val okCols =
        (topT.map { case (n, t) =>
          s"top${n}_chars * 100 <= total_chars * $t AS ok_top$n" } ++
          dupT.map { case (n, t) =>
            s"dup${n}_chars * 100 <= total_chars * $t AS ok_dup$n" })
          .mkString(",\n         |  ")
      val passExpr =
        (topT.map { case (n, t) => s"top${n}_chars * 100 <= total_chars * $t" } ++
          dupT.map { case (n, t) => s"dup${n}_chars * 100 <= total_chars * $t" })
          .mkString("\n         |   AND ")
      val topPivot = topT.map { case (n, _) =>
        s"CAST(coalesce(max(CASE WHEN n = $n THEN mass END), 0) AS BIGINT) AS top${n}_chars" }
        .mkString(",\n         |    ")
      val dupPivot = dupT.map { case (n, _) =>
        s"CAST(coalesce(max(CASE WHEN n = $n THEN chars END), 0) AS BIGINT) AS dup${n}_chars" }
        .mkString(",\n         |    ")
      s"""WITH sent(doc_id, text) AS (VALUES
         |    $sentVals),
         |all0 AS (SELECT doc_id, text FROM documents
         |         UNION ALL SELECT * FROM sent),
         |w AS (SELECT doc_id,
         |    list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> len(x) > 0) AS ws
         |  FROM all0),
         |base AS (SELECT doc_id, ws, len(ws) AS nw,
         |    array_to_string(ws, ' ') AS cs,
         |    CAST(CASE WHEN len(ws) = 0 THEN 0
         |         ELSE len(array_to_string(ws, ' ')) END AS BIGINT) AS total_chars
         |  FROM w),
         |wrow AS (SELECT doc_id, CAST(t.i AS BIGINT) AS i, ws[CAST(t.i AS INT)] AS word
         |  FROM base, LATERAL (SELECT unnest(range(1, nw + 1)) AS i) t),
         |wp AS (SELECT doc_id, i, word,
         |    CAST(coalesce(sum(len(word) + 1) OVER (PARTITION BY doc_id ORDER BY i
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS wstart
         |  FROM wrow),
         |grams AS (SELECT a.doc_id, n.n, a.wstart AS gstart,
         |    b.wstart + len(b.word) AS gend
         |  FROM wp a
         |  CROSS JOIN (SELECT unnest([2, 3, 4, 5, 6, 7, 8, 9, 10]) AS n) n
         |  JOIN wp b ON b.doc_id = a.doc_id AND b.i = a.i + n.n - 1),
         |g2 AS (SELECT g.doc_id, g.n, g.gstart, g.gend,
         |    substr(b.cs, CAST(g.gstart + 1 AS INT), CAST(g.gend - g.gstart AS INT)) AS gram
         |  FROM grams g JOIN base b USING (doc_id)),
         |gc AS (SELECT doc_id, n, gram, count(*) AS cnt FROM g2 GROUP BY 1, 2, 3),
         |tops AS (SELECT doc_id, n, max(cnt * len(gram)) AS mass
         |  FROM gc WHERE n <= 4 GROUP BY 1, 2),
         |tops_p AS (SELECT doc_id,
         |    $topPivot
         |  FROM tops GROUP BY doc_id),
         |dups0 AS (SELECT g.doc_id, g.n, g.gstart, g.gend
         |  FROM g2 g JOIN gc c ON c.doc_id = g.doc_id AND c.n = g.n AND c.gram = g.gram
         |  WHERE g.n >= 5 AND c.cnt > 1),
         |sweep AS (SELECT doc_id, n, gstart, gend,
         |    CAST(coalesce(max(gend) OVER (PARTITION BY doc_id, n ORDER BY gstart
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS pmax
         |  FROM dups0),
         |dupsum AS (SELECT doc_id, n,
         |    sum(greatest(gend - greatest(gstart, pmax), 0)) AS chars
         |  FROM sweep GROUP BY 1, 2),
         |dups_p AS (SELECT doc_id,
         |    $dupPivot
         |  FROM dupsum GROUP BY doc_id),
         |fin AS (SELECT b.doc_id, b.total_chars,
         |  $statCols
         |  FROM base b
         |  LEFT JOIN tops_p t ON t.doc_id = b.doc_id
         |  LEFT JOIN dups_p du ON du.doc_id = b.doc_id)
         |SELECT doc_id, total_chars,
         |  ${topT.map { case (n, _) => s"top${n}_chars" }.mkString(", ")},
         |  ${dupT.map { case (n, _) => s"dup${n}_chars" }.mkString(", ")},
         |  $okCols,
         |  ($passExpr) AS pass
         |FROM fin ORDER BY doc_id""".stripMargin
    },
    // Trained language ID: the oracle retrains the whole char-trigram
    // NB model from the shared training VALUES (gram counts, add-one
    // smoothing, 9-decimal DECIMAL log-probs, unseen-gram fallback)
    // and rescores every document with the same exact-decimal sums,
    // 4-decimal rounding, and alphabetical-first argmax.
    "q_langid_nb" -> {
      val trainVals = TextAnalysis.langIdTrainSet
        .map { case (l, tx) => s"('$l', ${sqlStringLit(tx)})" }
        .mkString(",\n         |    ")
      val sentVals = langIdSentinels
        .map { case (id, tx, _) => s"(CAST($id AS BIGINT), ${sqlStringLit(tx)})" }
        .mkString(",\n         |    ")
      val langs = TextAnalysis.langIdLangs
      val pivCols = langs.map(l =>
        s"max(CASE WHEN lang = '$l' THEN s4 END) AS s_$l")
        .mkString(",\n         |    ")
      val predCase = langs.map(l =>
        s"WHEN s_$l = greatest(${langs.map(x => s"s_$x").mkString(", ")}) THEN '$l'")
        .mkString("\n         |       ")
      s"""WITH train(lang, t) AS (VALUES
         |    $trainVals),
         |sent(doc_id, text) AS (VALUES
         |    $sentVals),
         |all0 AS (SELECT doc_id, text FROM documents
         |         UNION ALL SELECT * FROM sent),
         |tcs AS (SELECT lang,
         |    substr(regexp_replace(trim(lower(t)), '\\s+', ' ', 'g'),
         |      1, ${TextAnalysis.langIdMaxChars}) AS cs
         |  FROM train),
         |ttf AS (SELECT lang, g, count(*) AS c FROM
         |    (SELECT lang, substr(cs, CAST(i AS INT), 3) AS g
         |     FROM tcs, UNNEST(range(1, len(cs) - 1)) AS u1(i)
         |     WHERE len(cs) >= 3)
         |  GROUP BY 1, 2),
         |tot AS (SELECT lang, sum(c) AS t FROM ttf GROUP BY 1),
         |v AS (SELECT count(DISTINCT g) AS v FROM ttf),
         |lp AS (SELECT lang, g,
         |    CAST(floor(ln((c + 1.0) / (t + v)) * 1e6) AS BIGINT) AS lp
         |  FROM ttf JOIN tot USING (lang), v),
         |u AS (SELECT lang, CAST(floor(ln(1.0 / (t + v)) * 1e6) AS BIGINT) AS u
         |  FROM tot, v),
         |dcs AS (SELECT doc_id,
         |    substr(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'),
         |      1, ${TextAnalysis.langIdMaxChars}) AS cs
         |  FROM all0),
         |dtf AS (SELECT doc_id, g, count(*) AS tf FROM
         |    (SELECT doc_id, substr(cs, CAST(i AS INT), 3) AS g
         |     FROM dcs, UNNEST(range(1, len(cs) - 1)) AS u2(i)
         |     WHERE len(cs) >= 3)
         |  GROUP BY 1, 2),
         |langs AS (SELECT unnest([${langs.map(l => s"'$l'").mkString(", ")}]) AS lang),
         |contrib AS (SELECT d.doc_id, l.lang,
         |    sum(d.tf * coalesce(lp.lp, u.u)) AS s
         |  FROM dtf d CROSS JOIN langs l
         |  JOIN u ON u.lang = l.lang
         |  LEFT JOIN lp ON lp.lang = l.lang AND lp.g = d.g
         |  GROUP BY 1, 2),
         |piv0 AS (SELECT doc_id, lang,
         |    CAST(sign(s) * ((abs(s) + 50) // 100) AS DOUBLE) / 1e4 AS s4
         |  FROM contrib),
         |piv AS (SELECT doc_id,
         |    $pivCols
         |  FROM piv0 GROUP BY doc_id),
         |fin AS (SELECT a.doc_id, ${langs.map(l => s"p.s_$l").mkString(", ")}
         |  FROM (SELECT doc_id FROM all0) a LEFT JOIN piv p USING (doc_id))
         |SELECT doc_id, ${langs.map(l => s"s_$l").mkString(", ")},
         |  CASE WHEN s_de IS NULL THEN 'und'
         |       $predCase
         |       ELSE 'und' END AS lang_pred
         |FROM fin ORDER BY doc_id""".stripMargin
    },
    // Per-source quality stratification: same per-doc signals, one
    // source-keyed aggregate, all-integer output.
    "q_source_quality" ->
      s"""WITH feats AS (SELECT doc_id, source, text,
         |        list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> len(x) > 0) AS wsl,
         |        list_filter(string_split_regex(trim(text), '\\s+'), x -> len(x) > 0) AS ws,
         |        length(text) AS n_chars
         |      FROM documents),
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
         |q2 AS (SELECT doc_id, source, lang_pred,
         |        round(CAST(
         |          0.4 * (CASE WHEN n_chars BETWEEN 20 AND 100000 THEN 1.0 ELSE 0.0 END)
         |        + 0.3 * (CASE WHEN CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE)
         |                           / greatest(CAST(n_chars AS DOUBLE), 1.0) < 0.2 THEN 1.0 ELSE 0.0 END)
         |        + 0.3 * (CASE WHEN CAST(s_en AS DOUBLE)
         |                           / greatest(CAST(len(ws) AS DOUBLE), 1.0) > 0.01 THEN 1.0 ELSE 0.0 END)
         |        AS DOUBLE), 2) AS quality_score
         |      FROM lang)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN lang_pred = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
         |  CAST(sum(CASE WHEN quality_score >= 0.7 THEN 1 ELSE 0 END) AS BIGINT) AS n_quality_ok,
         |  CAST(sum(CAST(round(quality_score * 100) AS BIGINT)) AS BIGINT) AS sum_q100
         |FROM q2 GROUP BY source ORDER BY source""".stripMargin,
    // Vocabulary drift: same tokenization, same cleared-denominator
    // integer ranking, same rounded share delta.
    "q_vocab_drift" ->
      """WITH wa AS (SELECT unnest(list_filter(
        |      string_split_regex(trim(lower(text)), '\s+'), x -> len(x) > 0)) AS word
        |    FROM documents WHERE doc_id % 2 = 0),
        |ca AS (SELECT word, count(*) AS n_a FROM wa GROUP BY 1),
        |wb AS (SELECT unnest(list_filter(
        |      string_split_regex(trim(lower(text)), '\s+'), x -> len(x) > 0)) AS word
        |    FROM documents WHERE doc_id % 2 = 1),
        |cb AS (SELECT word, count(*) AS n_b FROM wb GROUP BY 1),
        |j AS (SELECT word, coalesce(n_a, 0) AS n_a, coalesce(n_b, 0) AS n_b
        |    FROM ca FULL OUTER JOIN cb USING (word)),
        |t AS (SELECT sum(n_a) AS ta, sum(n_b) AS tb FROM j),
        |top AS (SELECT word, n_a, n_b FROM j, t
        |    ORDER BY abs(n_a * tb - n_b * ta) DESC, word LIMIT 20)
        |SELECT word, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
        |  round(CAST(n_a AS DOUBLE) / ta - CAST(n_b AS DOUBLE) / tb, 6)
        |    AS delta_share
        |FROM top, t ORDER BY word""".stripMargin,
    // Report card: same per-doc signals for every document, then the
    // seven integer aggregates.
    "q_corpus_report" ->
      s"""WITH base AS (SELECT doc_id, text,
         |        md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
         |      FROM documents),
         |feats AS (SELECT doc_id, fp, text,
         |        list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> len(x) > 0) AS wsl,
         |        list_filter(string_split_regex(trim(text), '\\s+'), x -> len(x) > 0) AS ws,
         |        length(text) AS n_chars
         |      FROM base),
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
         |q2 AS (SELECT doc_id, fp, lang_pred,
         |        round(CAST(
         |          0.4 * (CASE WHEN n_chars BETWEEN 20 AND 100000 THEN 1.0 ELSE 0.0 END)
         |        + 0.3 * (CASE WHEN CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE)
         |                           / greatest(CAST(n_chars AS DOUBLE), 1.0) < 0.2 THEN 1.0 ELSE 0.0 END)
         |        + 0.3 * (CASE WHEN CAST(s_en AS DOUBLE)
         |                           / greatest(CAST(len(ws) AS DOUBLE), 1.0) > 0.01 THEN 1.0 ELSE 0.0 END)
         |        AS DOUBLE), 2) AS quality_score,
         |        CAST(len(ws) AS BIGINT) AS ws_tokens,
         |        CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS bpeish_tokens
         |      FROM lang)
         |SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(count(DISTINCT fp) AS BIGINT) AS n_unique_fp,
         |  CAST(count(*) - count(DISTINCT fp) AS BIGINT) AS n_exact_dups,
         |  CAST(sum(CASE WHEN lang_pred = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_kept_lang,
         |  CAST(sum(CASE WHEN quality_score >= 0.7 THEN 1 ELSE 0 END) AS BIGINT) AS n_quality_ok,
         |  CAST(sum(ws_tokens) AS BIGINT) AS total_ws_tokens,
         |  CAST(sum(bpeish_tokens) AS BIGINT) AS total_bpeish_tokens
         |FROM q2""".stripMargin,
    "q_curate_audit" ->
      s"""WITH base0 AS (SELECT doc_id, text FROM documents WHERE doc_id < 2500),
         |sent AS (SELECT CAST(990001 AS BIGINT) AS doc_id, text FROM base0
         |           WHERE doc_id = (SELECT min(doc_id) FROM base0)
         |         UNION ALL
         |         SELECT CAST(990002 AS BIGINT), 'the !!!!!!!'),
         |all0 AS (SELECT * FROM base0 UNION ALL SELECT * FROM sent),
         |base AS (SELECT doc_id, text,
         |        md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint
         |      FROM all0),
         |rn AS (SELECT *, row_number() OVER (PARTITION BY fingerprint
         |        ORDER BY doc_id) AS dup_rank FROM base),
         |feats AS (SELECT doc_id, dup_rank, text,
         |        list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> len(x) > 0) AS wsl,
         |        list_filter(string_split_regex(trim(text), '\\s+'), x -> len(x) > 0) AS ws,
         |        length(text) AS n_chars
         |      FROM rn),
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
         |q2 AS (SELECT doc_id, dup_rank, lang_pred,
         |        round(CAST(
         |          0.4 * (CASE WHEN n_chars BETWEEN 20 AND 100000 THEN 1.0 ELSE 0.0 END)
         |        + 0.3 * (CASE WHEN CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE)
         |                           / greatest(CAST(n_chars AS DOUBLE), 1.0) < 0.2 THEN 1.0 ELSE 0.0 END)
         |        + 0.3 * (CASE WHEN CAST(s_en AS DOUBLE)
         |                           / greatest(CAST(len(ws) AS DOUBLE), 1.0) > 0.01 THEN 1.0 ELSE 0.0 END)
         |        AS DOUBLE), 2) AS quality_score
         |      FROM lang)
         |SELECT doc_id,
         |  CASE WHEN dup_rank > 1 THEN 'dup'
         |       WHEN lang_pred <> 'en' THEN 'lang'
         |       WHEN quality_score < 0.7 THEN 'quality'
         |       ELSE 'kept' END AS verdict
         |FROM q2 ORDER BY doc_id""".stripMargin,
    "q_curate_neardup" ->
      s"""WITH RECURSIVE
         |${clusterOracleCtes("doc_id < 300")},
         |kept AS (SELECT d.doc_id, d.text FROM docs d
         |         WHERE d.doc_id NOT IN (SELECT id FROM lab WHERE id <> component)),
         |${curateOracleCtes("kept")}
         |SELECT doc_id, fingerprint, lang_pred, quality_score, ws_tokens, bpeish_tokens
         |FROM q WHERE quality_score >= 0.7 ORDER BY doc_id""".stripMargin,
    // Outlier scoring: re-assign and re-score from the DUMPED raw+unit
    // centroids (bit-identical constants on both sides), same rounded
    // cosine, same (cos, id) tiebreak, same k.
    "q_embed_outlier" ->
      s"""WITH cents AS (SELECT cell, CAST(centroid AS DOUBLE[]) AS c,
         |        CAST(unit_centroid AS DOUBLE[]) AS cu
         |      FROM read_parquet('$outlierDir/centroids.parquet/*.parquet')),
         |emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |u AS (SELECT vec_id, e,
         |        list_transform(e, x -> x / sqrt(list_dot_product(e, e))) AS unit
         |      FROM emb),
         |assign AS (SELECT vec_id, unit,
         |      (SELECT cell FROM cents
         |       ORDER BY 2 * list_dot_product(cents.c, u.e) - list_dot_product(cents.c, cents.c) DESC, cell
         |       LIMIT 1) AS cell
         |      FROM u),
         |scored AS (SELECT a.vec_id, a.cell,
         |        round(list_dot_product(a.unit, ct.cu), 4) AS centroid_cos
         |      FROM assign a JOIN cents ct ON ct.cell = a.cell),
         |topk AS (SELECT * FROM scored ORDER BY centroid_cos, vec_id LIMIT 32)
         |SELECT vec_id, cell, centroid_cos,
         |  row_number() OVER (ORDER BY centroid_cos, vec_id) AS outlier_rank
         |FROM topk ORDER BY outlier_rank""".stripMargin,
    "q_dedup_semantic" ->
      s"""WITH cents AS (SELECT cell, CAST(centroid AS DOUBLE[]) AS c
         |      FROM read_parquet('$semanticDir/centroids.parquet/*.parquet')),
         |emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |u AS (SELECT vec_id, e,
         |        list_transform(e, x -> x / sqrt(list_dot_product(e, e))) AS unit
         |      FROM emb),
         |assign AS (SELECT vec_id, unit,
         |      (SELECT cell FROM cents
         |       ORDER BY 2 * list_dot_product(cents.c, u.e) - list_dot_product(cents.c, cents.c) DESC, cell
         |       LIMIT 1) AS cell
         |      FROM u)
         |SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.cell,
         |       round(list_dot_product(a.unit, b.unit), 4) AS cosine
         |FROM assign a JOIN assign b ON a.cell = b.cell AND a.vec_id < b.vec_id
         |WHERE round(list_dot_product(a.unit, b.unit), 4) >= 0.3
         |ORDER BY id_a, id_b""".stripMargin,
    // nlist=64 sibling: assignment + exact pair combinatorics + the
    // thresholded join, all from the dumped 64-cell centroids.
    "q_dedup_semantic_scaled" ->
      s"""WITH cents AS (SELECT cell, CAST(centroid AS DOUBLE[]) AS c
         |      FROM read_parquet('$semantic64Dir/centroids.parquet/*.parquet')),
         |emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |u AS (SELECT vec_id, e,
         |        list_transform(e, x -> x / sqrt(list_dot_product(e, e))) AS unit
         |      FROM emb),
         |assign AS (SELECT vec_id, unit,
         |      (SELECT cell FROM cents
         |       ORDER BY 2 * list_dot_product(cents.c, u.e) - list_dot_product(cents.c, cents.c) DESC, cell
         |       LIMIT 1) AS cell
         |      FROM u),
         |sizes AS (SELECT cell, count(*) AS n FROM assign GROUP BY 1),
         |vol AS (SELECT CAST(count(*) AS BIGINT) AS n_cells,
         |        CAST(sum(n * (n - 1) // 2) AS BIGINT) AS n_candidate_pairs
         |      FROM sizes),
         |d AS (SELECT CAST(count(*) AS BIGINT) AS n_dups
         |      FROM assign a JOIN assign b
         |        ON a.cell = b.cell AND a.vec_id < b.vec_id
         |      WHERE round(list_dot_product(a.unit, b.unit), 4) >= 0.3)
         |SELECT n_cells, n_candidate_pairs, n_dups FROM vol, d""".stripMargin,
    "q_corpus_shards" ->
      s"""WITH ${curateOracleCtes()},
         |cur AS (SELECT doc_id, ws_tokens, bpeish_tokens FROM q WHERE quality_score >= 0.7),
         |h AS (SELECT *, ((doc_id % 2147483647) * 2654435761) % 2147483647 AS y FROM cur),
         |sp AS (SELECT *, (y * y) % 2147483647 % 100 AS b FROM h)
         |SELECT CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'valid' ELSE 'test' END AS split,
         |  count(*) AS n_docs,
         |  CAST(sum(ws_tokens) AS BIGINT) AS total_ws_tokens,
         |  CAST(sum(bpeish_tokens) AS BIGINT) AS total_bpeish_tokens
         |FROM sp GROUP BY 1 ORDER BY split""".stripMargin,
    "q_multimodal_bytes" ->
      """SELECT doc_id AS media_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio'
        |       ELSE 'video' END AS kind,
        |  CAST((doc_id % 64) * 16 + 16 AS INTEGER) AS width,
        |  CAST((doc_id % 48) * 16 + 16 AS INTEGER) AS height,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  md5(text) AS payload_md5
        |FROM documents ORDER BY media_id""".stripMargin,
    "q_multimodal_resize" ->
      """SELECT doc_id AS media_id,
        |  CAST((doc_id % 64) * 16 + 16 AS INTEGER) AS width,
        |  CAST((doc_id % 48) * 16 + 16 AS INTEGER) AS height,
        |  CAST(round(((doc_id % 64) * 16 + 16) *
        |    least(1.0, 256.0 / greatest((doc_id % 64) * 16 + 16, (doc_id % 48) * 16 + 16))) AS INTEGER) AS resized_w,
        |  CAST(round(((doc_id % 48) * 16 + 16) *
        |    least(1.0, 256.0 / greatest((doc_id % 64) * 16 + 16, (doc_id % 48) * 16 + 16))) AS INTEGER) AS resized_h
        |FROM documents ORDER BY media_id""".stripMargin,
    "q_media_dims" ->
      """SELECT doc_id AS media_id,
        |  CAST((doc_id % 64) * 16 + 16 AS INTEGER) AS parsed_w,
        |  CAST((doc_id % 48) * 16 + 16 AS INTEGER) AS parsed_h,
        |  '89504E470D0A1A0A' || '0000000D' || '49484452' ||
        |    lpad(upper(to_hex((doc_id % 64) * 16 + 16)), 8, '0') ||
        |    lpad(upper(to_hex((doc_id % 48) * 16 + 16)), 8, '0') AS header_hex
        |FROM documents WHERE doc_id % 3 = 0 ORDER BY media_id""".stripMargin,
    // The decoded-pixel sums recomputed ANALYTICALLY: pixels follow a
    // deterministic integer formula, so a lateral range expansion over
    // (x, y) reproduces exactly what the real PNG encode->decode
    // roundtrip must yield.
    "q_png_decode" ->
      """WITH imgs AS (
        |  SELECT doc_id AS media_id,
        |    CAST(doc_id % 16 + 4 AS INTEGER) AS width,
        |    CAST(doc_id % 12 + 4 AS INTEGER) AS height
        |  FROM documents WHERE doc_id % 3 = 0 AND doc_id < 1500),
        |px AS (
        |  SELECT i.media_id, i.width, i.height, x.x AS x, y.y AS y
        |  FROM imgs i, LATERAL (SELECT unnest(range(0, i.width)) AS x) x,
        |               LATERAL (SELECT unnest(range(0, i.height)) AS y) y)
        |SELECT media_id, width, height,
        |  CAST(sum((media_id + 7*x + 13*y) % 256) AS BIGINT) AS sum_r,
        |  CAST(sum((3*media_id + 5*x + 11*y) % 256) AS BIGINT) AS sum_g,
        |  CAST(sum((5*media_id + 3*x + 17*y) % 256) AS BIGINT) AS sum_b
        |FROM px GROUP BY 1, 2, 3 ORDER BY media_id""".stripMargin,
    // dHash: analytic replay of the decoded-pixel difference hash —
    // same 8x8 plane formula, same adjacent-compare bits, same 56-bit
    // packing (sum cast back to BIGINT before grouping).
    "q_image_phash" ->
      """WITH imgs AS (SELECT doc_id AS media_id FROM documents
        |  WHERE doc_id < 500),
        |px AS (SELECT media_id, x.x AS x, y.y AS y,
        |    ((media_id % 250) * (2 * y.y + 3) + (7 + 29 * y.y) * x.x) % 252
        |      + ((media_id // 250) * (x.x + y.y)) % 4 AS g
        |  FROM imgs, LATERAL (SELECT unnest(range(0, 8)) AS x) x,
        |             LATERAL (SELECT unnest(range(0, 8)) AS y) y),
        |bits AS (SELECT a.media_id, a.x, a.y
        |  FROM px a JOIN px b ON b.media_id = a.media_id
        |    AND b.y = a.y AND b.x = a.x + 1 AND b.g > a.g
        |  WHERE a.x < 7),
        |hashes AS (SELECT i.media_id,
        |    CAST(coalesce(sum(CAST(1 AS BIGINT) << (b.y * 7 + b.x)), 0)
        |      AS BIGINT) AS phash
        |  FROM imgs i LEFT JOIN bits b ON b.media_id = i.media_id
        |  GROUP BY i.media_id)
        |SELECT phash, count(*) AS n_imgs,
        |  min(media_id) AS min_id, max(media_id) AS max_id
        |FROM hashes GROUP BY phash ORDER BY phash""".stripMargin,
    // Image near-dup: same analytical hash derivation, then the
    // textbook ALL-PAIRS Hamming enumeration — complete, so banding
    // losslessness is re-proved on every run.
    "q_image_neardup" ->
      """WITH imgs AS (SELECT doc_id AS media_id FROM documents
        |  WHERE doc_id < 500),
        |px AS (SELECT media_id, x.x AS x, y.y AS y,
        |    ((media_id % 250) * (2 * y.y + 3) + (7 + 29 * y.y) * x.x) % 252
        |      + ((media_id // 250) * (x.x + y.y)) % 4 AS g
        |  FROM imgs, LATERAL (SELECT unnest(range(0, 8)) AS x) x,
        |             LATERAL (SELECT unnest(range(0, 8)) AS y) y),
        |bits AS (SELECT a.media_id, a.x, a.y
        |  FROM px a JOIN px b ON b.media_id = a.media_id
        |    AND b.y = a.y AND b.x = a.x + 1 AND b.g > a.g
        |  WHERE a.x < 7),
        |hashes AS (SELECT i.media_id,
        |    CAST(coalesce(sum(CAST(1 AS BIGINT) << (b.y * 7 + b.x)), 0)
        |      AS BIGINT) AS phash
        |  FROM imgs i LEFT JOIN bits b ON b.media_id = i.media_id
        |  GROUP BY i.media_id)
        |SELECT a.media_id AS id_a, b.media_id AS id_b,
        |  CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
        |FROM hashes a JOIN hashes b ON a.media_id < b.media_id
        |WHERE bit_count(xor(a.phash, b.phash)) <= 2
        |ORDER BY id_a, id_b""".stripMargin,
    // JPEG pixel gate: constant-gray planes at quality 1.0 are
    // bit-exact through the lossy codec (DC-only DCT), so the decoded
    // sum is pure arithmetic — w * h * gray.
    "q_jpeg_decode" ->
      """SELECT doc_id AS media_id,
        |  CAST(doc_id % 21 + 5 AS INTEGER) AS width,
        |  CAST(doc_id % 17 + 5 AS INTEGER) AS height,
        |  CAST((doc_id % 21 + 5) * (doc_id % 17 + 5) *
        |    ((doc_id * 37 + 11) % 256) AS BIGINT) AS sum_gray
        |FROM documents WHERE doc_id % 3 = 1 AND doc_id < 1500
        |ORDER BY media_id""".stripMargin,
    // Video decode gate: per-frame analytic replay — constant-gray MJPEG
    // frames decode bit-exactly, so each frame's pixel sum is
    // w * h * ((id*31 + 29*f) % 256) and its timestamp is the stream
    // header's integer timing f*1000/fps.
    "q_video_decode" ->
      """WITH specs AS (
        |  SELECT doc_id AS media_id,
        |    CAST(doc_id % 14 + 4 AS INTEGER) AS width,
        |    CAST(doc_id % 10 + 4 AS INTEGER) AS height,
        |    CAST(doc_id % 6 + 2 AS INTEGER) AS n_frames,
        |    CAST((doc_id % 4 + 1) * 5 AS INTEGER) AS fps
        |  FROM documents WHERE doc_id % 3 = 2 AND doc_id < 1500)
        |SELECT media_id, CAST(f.f AS INTEGER) AS frame_idx,
        |  CAST(f.f * 1000 // fps AS BIGINT) AS frame_ts_ms,
        |  width, height,
        |  CAST(width * height * ((media_id * 31 + 29 * f.f) % 256)
        |    AS BIGINT) AS sum_gray
        |FROM specs, LATERAL (SELECT unnest(range(0, n_frames)) AS f) f
        |ORDER BY media_id, frame_idx""".stripMargin,
    // Sampled-decode gate: sample instants every 120ms map to frame
    // indexes through the header timing (ts*fps/1000), DISTINCT because
    // low fps lands several instants on one frame.
    "q_video_sampled" ->
      """WITH specs AS (
        |  SELECT doc_id AS media_id,
        |    CAST(doc_id % 14 + 4 AS INTEGER) AS width,
        |    CAST(doc_id % 10 + 4 AS INTEGER) AS height,
        |    CAST(doc_id % 6 + 2 AS INTEGER) AS n_frames,
        |    CAST((doc_id % 4 + 1) * 5 AS INTEGER) AS fps
        |  FROM documents WHERE doc_id % 3 = 2 AND doc_id < 1500),
        |tss AS (
        |  SELECT media_id, width, height, fps,
        |    unnest(list_slice(range(0, n_frames * 1000 // fps, 120), 1, 4)) AS ts
        |  FROM specs),
        |frames AS (
        |  SELECT DISTINCT media_id, width, height, fps,
        |    CAST(ts * fps // 1000 AS INTEGER) AS frame_idx
        |  FROM tss)
        |SELECT media_id, frame_idx,
        |  CAST(frame_idx * 1000 // fps AS BIGINT) AS frame_ts_ms,
        |  width, height,
        |  CAST(width * height * ((media_id * 31 + 29 * frame_idx) % 256)
        |    AS BIGINT) AS sum_gray
        |FROM frames ORDER BY media_id, frame_idx""".stripMargin,
    "q_frame_sample" ->
      """SELECT media_id, frame_ts_ms FROM (
        |  SELECT doc_id AS media_id,
        |    UNNEST(list_slice(range(0, greatest(n_chars * 10 - 1, 0) + 1, 5000), 1, 32)) AS frame_ts_ms
        |  FROM documents WHERE doc_id % 3 = 2)
        |ORDER BY media_id, frame_ts_ms""".stripMargin,
    // WAV decode gate: analytic replay of the PCM sample formula over a
    // lateral range expansion — count/sum/min/max of real decoded
    // samples must equal pure arithmetic.
    "q_audio_decode" ->
      """WITH specs AS (
        |  SELECT doc_id AS media_id,
        |    CAST(doc_id % 700 + 100 AS INTEGER) AS n,
        |    CAST(doc_id % 2 * 8000 + 8000 AS INTEGER) AS sample_rate
        |  FROM documents WHERE doc_id % 3 = 2 AND doc_id < 1500),
        |samples AS (
        |  SELECT media_id, sample_rate,
        |    (media_id * 31 + 17 * i.i) % 65536 - 32768 AS v
        |  FROM specs, LATERAL (SELECT unnest(range(0, n)) AS i) i)
        |SELECT media_id, sample_rate,
        |  CAST(1 AS INTEGER) AS n_channels, CAST(16 AS INTEGER) AS bits,
        |  CAST(count(*) AS BIGINT) AS n_samples,
        |  CAST(sum(v) AS BIGINT) AS sum_samples,
        |  CAST(min(v) AS INTEGER) AS min_sample,
        |  CAST(max(v) AS INTEGER) AS max_sample
        |FROM samples GROUP BY 1, 2 ORDER BY media_id""".stripMargin,
    // VAD features: every 256-sample window's energy and strict
    // sign-change count replayed from the sample formula in pure
    // integer arithmetic (start_ms via integer division, like the
    // engine's long truncation).
    "q_audio_vad" ->
      """WITH specs AS (
        |  SELECT doc_id AS media_id,
        |    CAST(doc_id % 700 + 100 AS INTEGER) AS n_samples,
        |    CAST(doc_id % 2 * 8000 + 8000 AS INTEGER) AS rate
        |  FROM documents WHERE doc_id % 3 = 2 AND doc_id < 1500),
        |chunks AS (
        |  SELECT media_id, rate, n_samples, CAST(c AS INTEGER) AS chunk_idx,
        |    CAST(c * 256 AS BIGINT) AS fromv,
        |    CAST(least(CAST(n_samples AS BIGINT), c * 256 + 256) AS BIGINT) AS untilv
        |  FROM specs, UNNEST(range(0, (n_samples + 255) // 256)) AS t(c)),
        |feat AS (
        |  SELECT media_id, chunk_idx, fromv, untilv, rate,
        |    CAST(sum(sv * sv) AS BIGINT) AS energy_sum,
        |    CAST(sum(CASE WHEN i < untilv - 1 AND sv * snext < 0
        |             THEN 1 ELSE 0 END) AS INTEGER) AS zero_crossings
        |  FROM (
        |    SELECT media_id, chunk_idx, fromv, untilv, rate, u.i,
        |      (media_id * 31 + 17 * u.i) % 65536 - 32768 AS sv,
        |      (media_id * 31 + 17 * (u.i + 1)) % 65536 - 32768 AS snext
        |    FROM chunks, LATERAL (SELECT unnest(range(fromv, untilv)) AS i) u)
        |  GROUP BY 1, 2, 3, 4, 5)
        |SELECT media_id, chunk_idx, (fromv * 1000) // rate AS start_ms,
        |  CAST(untilv - fromv AS INTEGER) AS n, energy_sum, zero_crossings
        |FROM feat ORDER BY media_id, chunk_idx""".stripMargin,
    "q_audio_chunks" ->
      """WITH st AS (
        |  SELECT doc_id AS media_id, n_chars * 10 AS dur,
        |    UNNEST(list_slice(range(0, greatest(n_chars * 10 - 1, 0) + 1, 5000), 1, 64)) AS start_ms
        |  FROM documents WHERE doc_id % 3 = 1)
        |SELECT media_id, start_ms,
        |  least(start_ms + 10000, dur) AS end_ms,
        |  ((least(start_ms + 10000, dur) - start_ms) * 16000) // 1000 AS n_samples
        |FROM st ORDER BY media_id, start_ms""".stripMargin,
    // Oracle computes straight from the parquet table — the ORC write +
    // read-back on the Spark side must be value-lossless to match.
    // JSONL roundtrip: the aggregate over the slice that was written
    // out and read back must equal the same aggregate straight off the
    // parquet source.
    "q_jsonl_roundtrip" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM documents WHERE doc_id % 3 = 0
        |GROUP BY lang ORDER BY lang""".stripMargin,
    // Avro roundtrip: same oracle discipline — straight off parquet,
    // the Avro container write + read-back must be lossless to match.
    "q_avro_roundtrip" ->
      """SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM documents WHERE doc_id % 4 = 1
        |GROUP BY source ORDER BY source""".stripMargin,
    "q_xml_roundtrip" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM documents WHERE doc_id % 5 = 2
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "q_orc_roundtrip" ->
      """SELECT o_orderstatus,
        |  count(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
        |  min(o_orderdate) AS first_date,
        |  max(o_orderkey) AS max_key
        |FROM orders WHERE o_orderkey % 7 = 0
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // Plain parquet join — the bucketed zero-exchange plan must produce
    // identical aggregates.
    "q_bucketed_join" ->
      """SELECT l_orderkey % 10 AS key_bucket,
        |  count(*) AS n_rows,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        |GROUP BY 1 ORDER BY key_bucket""".stripMargin
  )
}
