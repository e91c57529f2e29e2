package graft

import graft.functions.Transformers
import graft.operators._
import graft.sources.AvroIO
import graft.streaming.EventStreams
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Oracle SQL map, part A (split at an entry boundary from the
  * former single literal — zero behavior change; SparkEntry.oracleSql
  * is the concatenation).
  */
private[graft] trait SparkEntryOraclesA { this: SparkEntry.type =>

  private[graft] def oracleSqlA: Map[String, String] = Map(
    "q_filter_tenant" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem WHERE l_suppkey = 3
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_search_ilike_or" ->
      """SELECT p_partkey, p_name, p_brand, p_type FROM part
        |WHERE p_name ILIKE '%widget%' OR p_brand ILIKE '%and#1%' OR p_type ILIKE 'econ%'
        |ORDER BY p_partkey""".stripMargin,
    "q_point_lookup" ->
      "SELECT p_partkey, p_name, p_retailprice FROM part WHERE p_partkey = 42",
    // Auth-layer filters over the derived users projection: the two
    // *_inactive probes exercise valid credentials on inactive rows and
    // MUST contribute zero rows — a union that still hash-matches proves
    // the `active` conjunct is live, not decorative.
    "q_filter_active_user" ->
      """WITH users AS (SELECT CAST(c_custkey AS BIGINT) AS user_id,
        |    'user' || c_custkey || '@example.com' AS email,
        |    c_name AS full_name,
        |    c_custkey % 5 <> 0 AS active,
        |    CASE WHEN c_custkey % 3 <> 0 THEN md5('tok' || c_custkey) END AS session_token
        |  FROM customer)
        |SELECT * FROM (
        |  SELECT 'session_ok' AS lookup, user_id, email, full_name, active
        |    FROM users WHERE session_token = md5('tok7') AND active
        |  UNION ALL
        |  SELECT 'session_inactive', user_id, email, full_name, active
        |    FROM users WHERE session_token = md5('tok10') AND active
        |  UNION ALL
        |  SELECT 'login_ok', user_id, email, full_name, active
        |    FROM users WHERE email = trim('  user2@example.com  ') AND active
        |  UNION ALL
        |  SELECT 'login_inactive', user_id, email, full_name, active
        |    FROM users WHERE email = 'user15@example.com' AND active)
        |ORDER BY lookup, user_id""".stripMargin,
    "q_rank_paginate" ->
      """SELECT p_partkey, p_name,
        |  CASE WHEN lower(p_name) = lower('small widget') THEN 0 ELSE 1 END AS rank_exact,
        |  CASE WHEN p_name ILIKE 'small widget%' THEN 0 ELSE 1 END AS rank_prefix
        |FROM part WHERE p_name ILIKE '%small widget%'
        |ORDER BY rank_exact, rank_prefix, p_name, p_partkey
        |LIMIT 10 OFFSET 5""".stripMargin,
    "q_paginate_default" ->
      "SELECT p_partkey, p_name FROM part ORDER BY p_name, p_partkey LIMIT 5 OFFSET 10",
    // decimal->float REST boundary: ORDER BY sku matches the list's
    // tenant-scoped sku ordering; the DOUBLE casts are the lossy view
    "q_list_float_view" ->
      """WITH products AS (
        |  SELECT CASE WHEN p_partkey % 3 = 0 THEN 1 ELSE 2 END AS client_id,
        |         'SKU' || lpad(CAST(p_partkey AS VARCHAR), 7, '0') AS sku,
        |         p_name AS title,
        |         CAST(p_retailprice AS DECIMAL(12,2)) AS max_price
        |  FROM part)
        |SELECT client_id, sku, title,
        |       CAST(max_price AS DOUBLE) AS max_price,
        |       CAST(max_price - CAST(100.25 AS DECIMAL(12,2)) AS DOUBLE) AS min_price
        |FROM products WHERE client_id = 1
        |ORDER BY sku LIMIT 50 OFFSET 7""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin,
    "q_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q_bloom_semi" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity FROM lineitem
        |WHERE EXISTS (SELECT 1 FROM part
        |              WHERE p_partkey = l_partkey AND p_partkey % 97 = 0)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_merge_upsert" ->
      """WITH target AS (
        |  SELECT p_partkey AS key, p_name AS title, p_retailprice AS price FROM part),
        |staged AS (
        |  SELECT p_partkey AS key, upper(p_name) AS title, CAST(NULL AS DOUBLE) AS price
        |  FROM part WHERE p_partkey % 7 = 0
        |  UNION ALL
        |  SELECT p_partkey + 1000000 AS key, 'new ' || p_name AS title, p_retailprice AS price
        |  FROM part WHERE p_partkey % 97 = 0)
        |SELECT coalesce(t.key, s.key) AS key,
        |       coalesce(s.title, t.title) AS title,
        |       coalesce(s.price, t.price) AS price
        |FROM target t FULL OUTER JOIN staged s ON t.key = s.key
        |ORDER BY key""".stripMargin,
    "q_full_update_deactivate" ->
      """SELECT p_partkey AS key, p_name AS title, (p_partkey % 3 = 0) AS active
        |FROM part ORDER BY key""".stripMargin,
    "q_skew_salted_join" ->
      """SELECT l_suppkey AS k, s_name, count(*) AS n_rows,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem LEFT JOIN supplier ON l_suppkey = s_suppkey
        |WHERE l_orderkey % 3 = 0
        |GROUP BY 1, 2 ORDER BY k""".stripMargin,
    "q_join_fk" ->
      """SELECT c_custkey, c_name, n_name, r_name
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |ORDER BY c_custkey""".stripMargin,
    "q_distinct_flags" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_ingest_stats" ->
      """SELECT count(*) AS processed_count, count(DISTINCT l_partkey) AS distinct_keys
        |FROM lineitem WHERE l_quantity > 25""".stripMargin,
    "q_group_percentile" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
        |  round(quantile_cont(floor(l_extendedprice / 10) * 10, 0.9), 4) AS p90_price_bin10,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_group_percentile_approx" ->
      s"""WITH est AS (SELECT * FROM read_parquet('$approxPctDir/result.parquet/*.parquet')),
         |b AS (SELECT l_returnflag,
         |        quantile_disc(l_quantity, 0.498) AS qlo,
         |        quantile_disc(l_quantity, 0.502) AS qhi,
         |        quantile_disc(l_extendedprice, 0.898) AS plo,
         |        quantile_disc(l_extendedprice, 0.902) AS phi,
         |        count(*) AS n
         |      FROM lineitem GROUP BY 1)
         |SELECT e.l_returnflag, e.approx_median_qty, e.approx_p90_price, e.n_rows
         |FROM est e JOIN b ON e.l_returnflag = b.l_returnflag
         |WHERE e.approx_median_qty BETWEEN b.qlo AND b.qhi
         |  AND e.approx_p90_price BETWEEN b.plo AND b.phi
         |  AND e.n_rows = b.n
         |ORDER BY e.l_returnflag""".stripMargin,
    // PERCENTILE_DISC per the standard definition (smallest value whose
    // cume_dist reaches p) rather than DuckDB's quantile_disc, whose
    // floor((n-1)p) index disagrees with the standard when frac(np) < p.
    // The CONT median interpolates between the two middle values with an
    // exact 0/0.5 fraction, so the arithmetic is engine-exact.
    "q_percentile_disc" ->
      """WITH cd AS (SELECT l_returnflag, l_quantity,
        |        cume_dist() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS cd,
        |        row_number() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) - 1 AS rn,
        |        count(*) OVER (PARTITION BY l_returnflag) AS n
        |      FROM lineitem),
        |disc AS (SELECT l_returnflag,
        |        CAST(min(CASE WHEN cd >= 0.25 THEN l_quantity END) AS DOUBLE) AS p25_qty,
        |        CAST(min(CASE WHEN cd >= 0.5 THEN l_quantity END) AS DOUBLE) AS median_disc_qty,
        |        CAST(min(CASE WHEN cd >= 0.9 THEN l_quantity END) AS DOUBLE) AS p90_qty,
        |        count(*) AS n_rows
        |      FROM cd GROUP BY l_returnflag),
        |cont AS (SELECT l_returnflag,
        |        CAST(min(CASE WHEN rn = CAST(floor((n - 1) * 0.5) AS BIGINT) THEN l_quantity END) AS DOUBLE) AS lo,
        |        CAST(min(CASE WHEN rn = CAST(ceil((n - 1) * 0.5) AS BIGINT) THEN l_quantity END) AS DOUBLE) AS hi,
        |        (CAST(max(n) - 1 AS DOUBLE) * 0.5) - floor(CAST(max(n) - 1 AS DOUBLE) * 0.5) AS frac
        |      FROM cd GROUP BY l_returnflag)
        |SELECT d.l_returnflag, d.p25_qty, d.median_disc_qty, d.p90_qty,
        |  c.lo + c.frac * (c.hi - c.lo) AS median_cont_qty, d.n_rows
        |FROM disc d JOIN cont c ON d.l_returnflag = c.l_returnflag
        |ORDER BY d.l_returnflag""".stripMargin,
    // Mirrors StatMoments operation-for-operation: exact decimal power
    // sums, then one fixed double formula — IEEE ops are deterministic,
    // so identical sums + identical expression trees = identical bits.
    "q_stats_moments" ->
      """WITH sums AS (SELECT l_returnflag,
        |        count(*) AS n_rows,
        |        sum(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
        |        sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
        |        sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS sxx,
        |        sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS syy,
        |        sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS sxy
        |      FROM lineitem WHERE l_orderkey % 2 = 0 GROUP BY l_returnflag),
        |d AS (SELECT l_returnflag, n_rows,
        |        CAST(n_rows AS DOUBLE) AS n,
        |        CAST(sx AS DOUBLE) AS sx, CAST(sy AS DOUBLE) AS sy,
        |        CAST(sxx AS DOUBLE) AS sxx, CAST(syy AS DOUBLE) AS syy,
        |        CAST(sxy AS DOUBLE) AS sxy
        |      FROM sums)
        |SELECT l_returnflag, n_rows,
        |  sx / n AS mean_x,
        |  (n * sxx - sx * sx) / (n * (n - 1.0)) AS var_samp_x,
        |  sqrt((n * sxx - sx * sx) / (n * (n - 1.0))) AS stddev_samp_x,
        |  (n * sxy - sx * sy) / (n * (n - 1.0)) AS covar_samp_xy,
        |  (n * sxy - sx * sy) / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) AS corr_xy,
        |  (n * sxy - sx * sy) / (n * sxx - sx * sx) AS regr_slope,
        |  sy / n - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * (sx / n) AS regr_intercept
        |FROM d ORDER BY l_returnflag""".stripMargin,
    "q_approx_distinct" ->
      s"""WITH est AS (SELECT * FROM read_parquet('$approxDistinctDir/result.parquet/*.parquet')),
         |ex AS (SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts,
         |         count(*) AS n FROM lineitem GROUP BY 1)
         |SELECT e.l_returnflag, e.approx_parts, e.n_rows
         |FROM est e JOIN ex ON e.l_returnflag = ex.l_returnflag
         |WHERE abs(e.approx_parts - ex.exact_parts) <= 0.06 * ex.exact_parts
         |  AND e.n_rows = ex.n
         |ORDER BY e.l_returnflag""".stripMargin,
    "q_heavy_hitters" ->
      s"""WITH dump AS (SELECT * FROM read_parquet('$heavyDir/result.parquet/*.parquet')),
         |words AS (SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
         |          FROM documents),
         |exact AS (SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM words GROUP BY w),
         |ok AS (SELECT d.item, d.est, d.spilled
         |       FROM dump d JOIN exact e ON e.w = d.item
         |       WHERE d.est <= e.cnt AND e.cnt <= d.est + d.spilled),
         |missing AS (SELECT e.w AS item, CAST(-1 AS BIGINT) AS est,
         |                   CAST(-1 AS BIGINT) AS spilled
         |            FROM exact e
         |            WHERE e.cnt > (SELECT max(spilled) FROM dump)
         |              AND e.w NOT IN (SELECT item FROM dump))
         |SELECT item, est, spilled FROM ok
         |UNION ALL SELECT item, est, spilled FROM missing
         |ORDER BY item""".stripMargin,
    "q_group_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_transform_text" ->
      """SELECT p_partkey, trim(concat('  ', p_name, ' ')) AS cleaned
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_transform_decimal" ->
      """SELECT p_partkey,
        |  CAST(CAST(trim(regexp_replace(concat('$', CAST(p_retailprice AS VARCHAR)), '[$£,]', '', 'g')) AS DECIMAL(12,2)) AS DOUBLE) AS price_dec,
        |  CAST(CAST(trim(regexp_replace('£1,234.50', '[$£,]', '', 'g')) AS DECIMAL(12,2)) AS DOUBLE) AS gbp_dec
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_transform_integer" ->
      """SELECT p_partkey,
        |  coalesce(CAST(trunc(TRY_CAST(trim(CASE WHEN p_partkey % 5 = 0 THEN 'garbage'
        |    ELSE concat(CAST(p_size AS VARCHAR), '.7') END) AS DOUBLE)) AS INTEGER), 0) AS int_val
        |FROM part ORDER BY p_partkey""".stripMargin,
    // Python float()/Decimal() literal grammar: regex acceptance gate +
    // underscore removal in front of TRY_CAST — '1d'/'2.5f' fail the
    // grammar (float() ValueError -> 0) even though both engines' bare
    // casts would parse them; trunc-before-int matches Python's int()
    "q_transform_pyfloat" ->
      """WITH v AS (
        |  SELECT p_partkey,
        |    CASE CAST(p_partkey % 8 AS INTEGER)
        |      WHEN 0 THEN '1_000' WHEN 1 THEN '1d' WHEN 2 THEN '2.5f'
        |      WHEN 3 THEN '1_0e0_1' WHEN 4 THEN 'nan' WHEN 5 THEN '_1'
        |      WHEN 6 THEN '2147483647.9' ELSE 'junk' END AS s,
        |    CASE CAST(p_partkey % 8 AS INTEGER)
        |      WHEN 0 THEN '1_000.2_5' WHEN 1 THEN '_1' WHEN 2 THEN '$1,234.5_0'
        |      WHEN 3 THEN '7' WHEN 4 THEN '1__0' WHEN 5 THEN '£9_9.9'
        |      WHEN 6 THEN '12.345' ELSE '-0.5' END AS ds
        |  FROM part)
        |SELECT p_partkey,
        |  coalesce(TRY_CAST(trunc(TRY_CAST(
        |    CASE WHEN regexp_matches(s,
        |      '^[+-]?((\d(_?\d)*(\.(\d(_?\d)*)?)?|\.\d(_?\d)*)([eE][+-]?\d(_?\d)*)?|(?i:inf(inity)?|nan))$')
        |      THEN replace(s, '_', '') ELSE NULL END AS DOUBLE)) AS INTEGER), 0) AS int_val,
        |  CAST(TRY_CAST(replace(trim(regexp_replace(ds, '[$£,]', '', 'g')), '_', '')
        |    AS DECIMAL(12,2)) AS DOUBLE) AS dec_val
        |FROM v ORDER BY p_partkey""".stripMargin,
    // Python str.strip() Unicode set: pad per row with NBSP / figure
    // space / ideographic space / NEL / tab / space, rebuild the padded
    // strings and trim with the explicit char list
    "q_transform_strip_unicode" ->
      """WITH p AS (
        |  SELECT p_partkey, p_name,
        |    CASE CAST(p_partkey % 6 AS INTEGER)
        |      WHEN 0 THEN chr(160) WHEN 1 THEN chr(8199) WHEN 2 THEN chr(12288)
        |      WHEN 3 THEN chr(133) WHEN 4 THEN chr(9) ELSE ' ' END AS pad,
        |    ' ' || chr(9) || chr(133) || chr(160) || chr(8199) || chr(12288) AS cs
        |  FROM part)
        |SELECT p_partkey,
        |  CASE WHEN lower(trim(pad || (CASE WHEN p_partkey % 2 = 0 THEN 'true'
        |                                    ELSE 'No' END) || pad, cs))
        |         IN ('yes','true','1') THEN true ELSE false END AS bool_val,
        |  trim(pad || p_name || pad, cs) AS cleaned
        |FROM p ORDER BY p_partkey""".stripMargin,
    "q_transform_boolean" ->
      """SELECT p_partkey,
        |  CASE WHEN lower(trim(s)) IN ('yes','true','1') THEN true
        |       WHEN lower(trim(s)) IN ('no','false','0') THEN false
        |       ELSE NULL END AS bool_val
        |FROM (SELECT p_partkey,
        |  CASE WHEN p_partkey % 6 = 0 THEN 'yes' WHEN p_partkey % 6 = 1 THEN ' No '
        |       WHEN p_partkey % 6 = 2 THEN 'TRUE' WHEN p_partkey % 6 = 3 THEN '0'
        |       WHEN p_partkey % 6 = 4 THEN '1' ELSE 'false' END AS s FROM part)
        |ORDER BY p_partkey""".stripMargin,
    "q_except" ->
      """SELECT l_partkey AS key FROM lineitem
        |EXCEPT
        |SELECT p_partkey AS key FROM part WHERE p_partkey % 2 = 0
        |ORDER BY key""".stripMargin,
    "q_intersect" ->
      """SELECT l_partkey AS key FROM lineitem
        |INTERSECT
        |SELECT p_partkey AS key FROM part WHERE p_partkey % 3 = 0
        |ORDER BY key""".stripMargin,
    "q_union_tagged" ->
      """SELECT p_partkey AS key, 'a' AS src FROM part WHERE p_partkey % 5 = 0
        |UNION ALL
        |SELECT p_partkey AS key, 'b' AS src FROM part WHERE p_partkey % 7 = 0
        |ORDER BY key, src""".stripMargin,
    "q_window_topk" ->
      """SELECT l_returnflag, rn, l_orderkey, l_linenumber, l_extendedprice FROM (
        |  SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
        |  FROM lineitem) WHERE rn <= 3
        |ORDER BY l_returnflag, rn""".stripMargin,
    "q_window_firstlast" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
        |  first_value(l_orderkey) OVER w AS top_order,
        |  last_value(l_orderkey) OVER w AS bottom_order,
        |  nth_value(l_orderkey, 3) OVER w AS third_order
        |FROM lineitem WHERE l_suppkey <= 2
        |WINDOW w AS (PARTITION BY l_suppkey
        |  ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY l_suppkey, l_extendedprice DESC, l_orderkey, l_linenumber""".stripMargin,
    "q_monthly_revenue" ->
      """SELECT date_trunc('month', o_orderdate) AS month,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n_orders
        |FROM orders GROUP BY 1 ORDER BY month""".stripMargin,
    "q_events_funnel" ->
      """WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
        |           WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.ts) AS t_click
        |      FROM events e JOIN v ON v.user_id = e.user_id
        |      WHERE e.event_type = 'click' AND e.ts > v.t_view GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ts) AS t_purchase
        |      FROM events e JOIN c ON c.user_id = e.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts > c.t_click GROUP BY 1)
        |SELECT v.user_id,
        |  CASE WHEN p.t_purchase IS NOT NULL THEN 3
        |       WHEN c.t_click IS NOT NULL THEN 2 ELSE 1 END AS reached,
        |  v.t_view, c.t_click, p.t_purchase
        |FROM v
        |LEFT JOIN c ON c.user_id = v.user_id
        |LEFT JOIN p ON p.user_id = v.user_id
        |ORDER BY v.user_id""".stripMargin,
    "q_events_props" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k, value
        |FROM events
        |WHERE event_id < 25000
        |  AND CAST(json_extract_string(props, '$.k') AS INTEGER) > 50
        |ORDER BY event_id""".stripMargin,
    "q_window_running" ->
      """SELECT l_suppkey, l_shipdate, l_orderkey, l_linenumber,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber
        |    ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_qty
        |FROM lineitem WHERE l_suppkey <= 2
        |ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber""".stripMargin,
    "q_window_lag" ->
      """SELECT l_suppkey, l_shipdate, l_orderkey, l_linenumber, l_quantity,
        |  lag(l_quantity, 1) OVER w AS prev_qty,
        |  lead(l_quantity, 1) OVER w AS next_qty
        |FROM lineitem WHERE l_suppkey <= 2
        |WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber)
        |ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber""".stripMargin,
    "q_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS flag,
        |  coalesce(l_linestatus, 'ALL') AS status,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  count(*) AS n_rows
        |FROM lineitem WHERE l_orderkey % 2 = 0
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY flag, status""".stripMargin,
    "q_cube" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS flag,
        |  coalesce(l_linestatus, 'ALL') AS status,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  count(*) AS n_rows
        |FROM lineitem WHERE l_orderkey % 2 = 0
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY flag, status""".stripMargin,
    "q_grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS flag,
        |  coalesce(l_linestatus, 'ALL') AS status,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  count(*) AS n_rows
        |FROM lineitem WHERE l_orderkey % 2 = 0
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        |ORDER BY flag, status""".stripMargin,
    "q_pivot" ->
      """SELECT l_returnflag,
        |  CAST(coalesce(SUM(CASE WHEN l_linestatus = 'F'
        |    THEN CAST(l_quantity AS DECIMAL(18,2)) END), 0) AS DOUBLE) AS F,
        |  CAST(coalesce(SUM(CASE WHEN l_linestatus = 'O'
        |    THEN CAST(l_quantity AS DECIMAL(18,2)) END), 0) AS DOUBLE) AS O
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_pivot_dynamic" ->
      """SELECT o_orderpriority,
        |  count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS F,
        |  count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS O,
        |  count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS P
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_window_ntile" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
        |  ntile(4) OVER w AS quartile,
        |  round(percent_rank() OVER w, 6) AS pct_rank
        |FROM lineitem WHERE l_suppkey <= 2
        |WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_quantity, l_orderkey, l_linenumber)
        |ORDER BY l_suppkey, l_quantity, l_orderkey, l_linenumber""".stripMargin,
    "q_unpivot" ->
      """SELECT p_partkey, attr, val FROM (
        |  SELECT p_partkey, 'size' AS attr, CAST(p_size AS DOUBLE) AS val FROM part
        |  UNION ALL
        |  SELECT p_partkey, 'retailprice' AS attr, CAST(p_retailprice AS DOUBLE) AS val FROM part)
        |ORDER BY p_partkey, attr""".stripMargin,
    "q_json_scan" ->
      """SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin,
    "q_events_tumbling" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        |  count(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,
    "q_events_sliding" ->
      """WITH w AS (SELECT event_type,
        |    make_timestamp(CAST(floor(epoch_us(ts) / 900000000) AS BIGINT) * 900000000
        |      - CAST(t.k AS BIGINT) * 900000000) AS window_start
        |  FROM events, UNNEST([0, 1, 2, 3]) AS t(k))
        |SELECT window_start, event_type, count(*) AS n_events
        |FROM w GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,
    // Z-order: the oracle replays the identical 16-bit interleave via
    // the shared portable formula text — exact integer arithmetic.
    "q_zorder" ->
      s"""WITH z AS (SELECT l_partkey, l_suppkey,
         |    ${ZOrder.zkeySql("l_partkey", "l_suppkey", 16)} AS zkey
         |  FROM lineitem)
         |SELECT zkey // 65536 AS zbucket, count(*) AS n_rows,
         |  min(l_partkey) AS min_pk, max(l_partkey) AS max_pk,
         |  min(l_suppkey) AS min_sk, max(l_suppkey) AS max_sk
         |FROM z GROUP BY 1 ORDER BY 1""".stripMargin,
    // Fuzzy match: brute-force levenshtein over the same dictionary —
    // a valid oracle because delete-1 blocking is lossless at dist 1.
    // The len-diff pre-filter is implied by dist<=1, kept for speed.
    "q_fuzzy_match" ->
      """WITH pn AS (SELECT DISTINCT p_name AS name FROM part
        |  WHERE p_partkey % 2 = 0),
        |typos AS (SELECT substr(name, 1, len(name) // 2)
        |    || substr(name, len(name) // 2 + 2) AS name
        |  FROM pn WHERE len(name) >= 8),
        |cn AS (SELECT DISTINCT c_name AS name FROM customer
        |  WHERE c_custkey % 2 = 0),
        |ents AS (SELECT DISTINCT name FROM (
        |  SELECT name FROM pn UNION ALL SELECT name FROM typos
        |  UNION ALL SELECT name FROM cn)),
        |pairs AS (SELECT a.name AS name_a, b.name AS name_b,
        |    levenshtein(a.name, b.name) AS dist
        |  FROM ents a JOIN ents b ON a.name < b.name
        |    AND abs(len(a.name) - len(b.name)) <= 1)
        |SELECT name_a, name_b, dist FROM pairs WHERE dist <= 1
        |ORDER BY name_a, name_b""".stripMargin,
    // Gap fill: same 6-hour integer bucketing (epoch_us // 21.6e9 ==
    // unix_timestamp div 21600 for post-epoch data), same per-key
    // generate_series spine, same IGNORE NULLS running carry.
    "q_gap_fill" ->
      """WITH b AS (SELECT user_id,
        |    epoch_us(ts) // 21600000000 AS bucket,
        |    sum(CAST(value AS DECIMAL(18,2))) AS v_sum
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT user_id, min(bucket) AS b0, max(bucket) AS b1
        |  FROM b GROUP BY 1),
        |spine AS (SELECT user_id, unnest(generate_series(b0, b1)) AS bucket
        |  FROM r),
        |j AS (SELECT s.user_id, s.bucket, b.v_sum
        |  FROM spine s LEFT JOIN b ON b.user_id = s.user_id
        |    AND b.bucket = s.bucket)
        |SELECT user_id, bucket,
        |  CAST(last_value(v_sum IGNORE NULLS) OVER (
        |    PARTITION BY user_id ORDER BY bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS v_fill,
        |  v_sum IS NULL AS was_gap
        |FROM j ORDER BY user_id, bucket""".stripMargin,
    "q_events_session" ->
      s"""WITH $sessionOracleCtes
         |SELECT user_id, session_seq, session_start, session_end,
         |  n_events, session_value
         |FROM sessions ORDER BY user_id, session_seq""".stripMargin,
    // RFM: same value-atomic ceil(cume_dist*5) quintiles, same anchor
    // and date arithmetic, same segment CASE.
    "q_rfm_segments" ->
      """WITH o AS (SELECT o_custkey, o_orderdate,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS p FROM orders),
        |a AS (SELECT max(o_orderdate) AS anchor FROM o),
        |c AS (SELECT o_custkey, max(o_orderdate) AS last_o,
        |    count(*) AS frequency, sum(p) AS m FROM o GROUP BY 1),
        |r AS (SELECT o_custkey,
        |    CAST(date_diff('day', CAST(last_o AS DATE),
        |      CAST(anchor AS DATE)) AS BIGINT) AS recency_days,
        |    frequency, m FROM c CROSS JOIN a),
        |sc AS (SELECT o_custkey, recency_days, frequency, m,
        |    CAST(ceil(cume_dist() OVER (ORDER BY recency_days DESC) * 5)
        |      AS BIGINT) AS r_score,
        |    CAST(ceil(cume_dist() OVER (ORDER BY frequency) * 5)
        |      AS BIGINT) AS f_score,
        |    CAST(ceil(cume_dist() OVER (ORDER BY m) * 5)
        |      AS BIGINT) AS m_score
        |  FROM r)
        |SELECT o_custkey, recency_days, frequency,
        |  CAST(m AS DOUBLE) AS monetary, r_score, f_score, m_score,
        |  CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4
        |         THEN 'champion'
        |       WHEN r_score <= 2 AND f_score >= 4 THEN 'at_risk'
        |       WHEN r_score <= 2 AND f_score <= 2 THEN 'hibernating'
        |       ELSE 'regular' END AS segment
        |FROM sc ORDER BY o_custkey""".stripMargin,
    // Q3 shape: same decimal revenue, same (rev DESC, date, key)
    // ranking — the ORDER BY runs on the exact DECIMAL, so the top-10
    // cut is deterministic on both engines.
    "q_top_unshipped" ->
      """SELECT l_orderkey, o_orderdate,
        |  CAST(rev AS DOUBLE) AS revenue
        |FROM (
        |  SELECT l_orderkey, o_orderdate,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |        (1 - CAST(l_discount AS DECIMAL(18,2)))) AS rev
        |  FROM lineitem
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN customer ON c_custkey = o_custkey
        |  WHERE c_mktsegment = 'BUILDING'
        |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |    AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        |  GROUP BY l_orderkey, o_orderdate
        |  ORDER BY rev DESC, o_orderdate, l_orderkey
        |  LIMIT 10)""".stripMargin,
    // Concurrency peak: same session CTEs, same inclusive-interval
    // sweep (running starts through t minus running ends before t).
    "q_concurrency_peak" ->
      s"""WITH $sessionOracleCtes,
         |b AS (SELECT session_start AS ts, 1 AS s, 0 AS e FROM sessions
         |  UNION ALL SELECT session_end, 0, 1 FROM sessions
         |  UNION ALL SELECT unnest(generate_series(
         |      date_trunc('day', session_start) + INTERVAL 1 DAY,
         |      date_trunc('day', session_end), INTERVAL 1 DAY)), 0, 0
         |    FROM sessions
         |    WHERE date_trunc('day', session_end)
         |      > date_trunc('day', session_start)),
         |g AS (SELECT ts, CAST(sum(s) AS BIGINT) AS ns,
         |    CAST(sum(e) AS BIGINT) AS ne FROM b GROUP BY 1),
         |r AS (SELECT ts,
         |    sum(ns) OVER (ORDER BY ts ROWS UNBOUNDED PRECEDING) AS rs,
         |    coalesce(sum(ne) OVER (ORDER BY ts
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS re
         |  FROM g)
         |SELECT date_trunc('day', ts) AS day,
         |  CAST(max(rs - re) AS BIGINT) AS peak
         |FROM r GROUP BY 1 ORDER BY day""".stripMargin,
    // A/B chi-square: exact BIGINT contingency products, one double
    // division, same rounding.
    "q_ab_test" ->
      """WITH conv AS (SELECT user_id,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
        |             END) >= 14 AS INTEGER) AS converted
        |  FROM events GROUP BY 1),
        |v AS (SELECT user_id % 2 AS variant, converted FROM conv),
        |ct AS (SELECT
        |    CAST(sum(CASE WHEN variant = 0 AND converted = 1 THEN 1
        |             ELSE 0 END) AS BIGINT) AS a,
        |    CAST(sum(CASE WHEN variant = 0 AND converted = 0 THEN 1
        |             ELSE 0 END) AS BIGINT) AS b,
        |    CAST(sum(CASE WHEN variant = 1 AND converted = 1 THEN 1
        |             ELSE 0 END) AS BIGINT) AS c,
        |    CAST(sum(CASE WHEN variant = 1 AND converted = 0 THEN 1
        |             ELSE 0 END) AS BIGINT) AS d
        |  FROM v)
        |SELECT a AS conv_a, b AS non_a, c AS conv_b, d AS non_b,
        |  round((CAST(a + b + c + d AS DOUBLE) *
        |         ((a * d - b * c) * (a * d - b * c))) /
        |        (CAST(a + b AS DOUBLE) * (c + d) * (a + c) * (b + d)),
        |        6) AS chi2
        |FROM ct""".stripMargin,
    // Session paths: same session construction, two lags inside the
    // (user, session) partition, integer path counts.
    "q_event_paths" ->
      """WITH seq AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS session_seq
        |  FROM seq),
        |tri AS (
        |  SELECT lag(event_type, 2) OVER w2 AS p1,
        |    lag(event_type, 1) OVER w2 AS p2, event_type AS p3
        |  FROM sess WINDOW w2 AS (PARTITION BY user_id, session_seq
        |    ORDER BY ts, event_id))
        |SELECT p1, p2, p3, count(*) AS n_paths
        |FROM tri WHERE p1 IS NOT NULL
        |GROUP BY 1, 2, 3 ORDER BY p1, p2, p3""".stripMargin,
    "q_range_join" ->
      s"""WITH $sessionOracleCtes,
         |pts AS (SELECT event_id, user_id, ts FROM events)
         |SELECT p.event_id, p.user_id, p.ts, s.session_seq
         |FROM pts p JOIN sessions s
         |  ON p.user_id = s.user_id
         | AND p.ts BETWEEN s.session_start AND s.session_end
         |ORDER BY p.event_id""".stripMargin,
    "q_asof_join" -> asofOracleSql,
    // The native operator must agree with the window formulation AND the
    // DuckDB ASOF JOIN — same oracle, bit for bit.
    "q_asof_join_native" -> asofOracleSql,
    "q_dedup_containment" ->
      """WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 300),
        |words AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws FROM docs),
        |sh0 AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
        |       FROM words, UNNEST(range(1, len(ws) - 1)) AS t(i)
        |       WHERE len(ws) >= 3),
        |rare AS (SELECT shingle FROM (SELECT shingle, count(*) AS df FROM sh0 GROUP BY 1)
        |         WHERE df <= 1000),
        |sh AS (SELECT sh0.* FROM sh0 JOIN rare USING (shingle)),
        |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
        |          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2),
        |base AS (SELECT id_a, id_b, n_inter, sa.n_sh AS n_a, sb.n_sh AS n_b
        |         FROM inter
        |         JOIN sizes sa ON sa.doc_id = id_a
        |         JOIN sizes sb ON sb.doc_id = id_b),
        |directed AS (
        |  SELECT id_a AS contained_id, id_b AS container_id,
        |         round(CAST(n_inter AS DOUBLE) / n_a, 4) AS containment FROM base
        |  UNION ALL
        |  SELECT id_b AS contained_id, id_a AS container_id,
        |         round(CAST(n_inter AS DOUBLE) / n_b, 4) AS containment FROM base)
        |SELECT contained_id, container_id, containment
        |FROM directed WHERE containment >= 0.5
        |ORDER BY contained_id, container_id""".stripMargin,
    // Verify-only oracles (same technique as q_dedup_lsh_full):
    // recompute the exact directed containment in DuckDB for ONLY the
    // dumped pairs — O(pairs), no all-pairs cost — and emit a row only
    // when the recomputed metric clears the threshold AND equals the
    // stored value bit-for-bit.
    "q_dedup_containment_full" -> containmentVerifyOracle(containFullDir,
      """SELECT CAST(-2 AS BIGINT) AS contained_id,
        |  CAST(-1 AS BIGINT) AS container_id, 1.0 AS containment
        |UNION ALL
        |SELECT CAST(-1 AS BIGINT), CAST(-2 AS BIGINT), 0.7273""".stripMargin),
    "q_quote_mining" -> containmentVerifyOracle(quoteDir,
      """SELECT CAST(-2 AS BIGINT) AS contained_id,
        |  CAST(-1 AS BIGINT) AS container_id, 1.0 AS containment""".stripMargin),
    "q_token_budget" ->
      s"""WITH d AS (SELECT doc_id,
         |    len(list_filter(string_split_regex(trim(text), '\\s+'), x -> len(x) > 0)) AS ws_tokens,
         |    round(CAST(
         |      0.4 * (CASE WHEN length(text) BETWEEN 20 AND 100000 THEN 1.0 ELSE 0.0 END)
         |    + 0.3 * (CASE WHEN CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE)
         |                 / greatest(CAST(length(text) AS DOUBLE), 1.0) < 0.2 THEN 1.0 ELSE 0.0 END)
         |    + 0.3 * (CASE WHEN CAST(len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
         |                   w -> len(w) > 0 AND w IN ($stopSql))) AS DOUBLE)
         |                 / greatest(CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
         |                   w -> len(w) > 0)) AS DOUBLE), 1.0) > 0.01 THEN 1.0 ELSE 0.0 END)
         |    AS DOUBLE), 2) AS quality_score
         |  FROM documents),
         |o AS (SELECT doc_id, ws_tokens, quality_score,
         |    sum(ws_tokens) OVER (ORDER BY quality_score DESC, doc_id
         |      ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM d)
         |SELECT doc_id, CAST(ws_tokens AS BIGINT) AS ws_tokens, quality_score
         |FROM o WHERE cum <= 20000 ORDER BY doc_id""".stripMargin,
    "q_corpus_diff" ->
      """WITH a AS (SELECT doc_id,
        |        md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp_a
        |      FROM documents),
        |ed AS (SELECT doc_id,
        |        CASE WHEN doc_id % 10 = 0 THEN text || ' v2 edit' ELSE text END AS text
        |      FROM documents WHERE doc_id % 17 <> 3),
        |ad AS (SELECT doc_id + 100000 AS doc_id, 'new doc ' || text AS text
        |      FROM documents WHERE doc_id % 13 = 0),
        |b AS (SELECT doc_id,
        |        md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp_b
        |      FROM (SELECT * FROM ed UNION ALL SELECT * FROM ad)),
        |j AS (SELECT coalesce(a.doc_id, b.doc_id) AS doc_id, fp_a, fp_b
        |      FROM a FULL JOIN b ON a.doc_id = b.doc_id)
        |SELECT doc_id,
        |  CASE WHEN fp_a IS NULL THEN 'added'
        |       WHEN fp_b IS NULL THEN 'removed'
        |       WHEN fp_a <> fp_b THEN 'changed'
        |       ELSE 'unchanged' END AS status
        |FROM j
        |WHERE fp_a IS NULL OR fp_b IS NULL OR fp_a <> fp_b
        |ORDER BY doc_id""".stripMargin,
    "q_hybrid_search" ->
      """WITH tw AS (SELECT doc_id,
        |        len(list_intersect(
        |          list_distinct(list_filter(
        |            string_split_regex(trim(lower(text)), '\s+'), x -> len(x) > 0)),
        |          ['spark', 'join', 'window', 'vector'])) AS t_score
        |      FROM documents),
        |tc0 AS (SELECT doc_id, t_score FROM tw WHERE t_score > 0
        |        ORDER BY t_score DESC, doc_id LIMIT 50),
        |tc AS (SELECT doc_id,
        |        CAST(row_number() OVER (ORDER BY t_score DESC, doc_id) AS BIGINT) AS t_rank
        |      FROM tc0),
        |q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0),
        |scored AS (SELECT vec_id,
        |        round(list_dot_product(CAST(embedding AS DOUBLE[]), (SELECT qe FROM q)) /
        |          (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) *
        |           (SELECT sqrt(list_dot_product(qe, qe)) FROM q)), 4) AS cosine
        |      FROM embeddings),
        |vc0 AS (SELECT vec_id, cosine FROM scored
        |        ORDER BY cosine DESC, vec_id LIMIT 50),
        |vc AS (SELECT vec_id AS doc_id,
        |        CAST(row_number() OVER (ORDER BY cosine DESC, vec_id) AS BIGINT) AS v_rank
        |      FROM vc0),
        |f AS (SELECT coalesce(tc.doc_id, vc.doc_id) AS doc_id,
        |        coalesce(t_rank, 0) AS t_rank, coalesce(v_rank, 0) AS v_rank
        |      FROM tc FULL JOIN vc ON tc.doc_id = vc.doc_id)
        |SELECT doc_id, t_rank, v_rank,
        |  round((CASE WHEN t_rank > 0 THEN 1.0 / (60 + t_rank) ELSE 0.0 END) +
        |        (CASE WHEN v_rank > 0 THEN 1.0 / (60 + v_rank) ELSE 0.0 END), 6) AS rrf_score
        |FROM f ORDER BY rrf_score DESC, doc_id LIMIT 10""".stripMargin,
    "q_global_index" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(row_number() OVER (ORDER BY o_orderkey) - 1 AS BIGINT) AS global_idx
        |FROM orders WHERE o_orderkey % 2 = 0 ORDER BY o_orderkey""".stripMargin,
    "q_schema_evolution" ->
      """WITH merged AS (
        |  SELECT 1 AS v, p_partkey, CAST(NULL AS DOUBLE) AS p_retailprice
        |  FROM part WHERE p_partkey % 2 = 0
        |  UNION ALL
        |  SELECT 2 AS v, p_partkey, p_retailprice
        |  FROM part WHERE p_partkey % 2 = 1)
        |SELECT v, count(*) AS n_rows,
        |  count(p_retailprice) AS n_price_present,
        |  round(coalesce(sum(p_retailprice), 0.0), 2) AS sum_price
        |FROM merged GROUP BY v ORDER BY v""".stripMargin,
    "q_click_attribution" ->
      """WITH c AS (SELECT event_id AS click_id, user_id,
        |        make_timestamp(epoch_us(ts)) AS click_ts
        |      FROM events WHERE event_type = 'click'),
        |v AS (SELECT event_id AS view_id, user_id,
        |        make_timestamp(epoch_us(ts)) AS view_ts
        |      FROM events WHERE event_type = 'view')
        |SELECT click_id, view_id, c.user_id, click_ts, view_ts
        |FROM c JOIN v ON c.user_id = v.user_id
        |  AND click_ts >= view_ts AND click_ts <= view_ts + INTERVAL 6 HOUR
        |ORDER BY click_id, view_id""".stripMargin,
    "q_dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n_copies, text
        |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin,
    "q_dedup_jaccard" ->
      """WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
        |words AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws FROM docs),
        |sh0 AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
        |       FROM words, UNNEST(range(1, len(ws) - 1)) AS t(i)
        |       WHERE len(ws) >= 3),
        |rare AS (SELECT shingle FROM (SELECT shingle, count(*) AS df FROM sh0 GROUP BY 1)
        |         WHERE df <= 100),
        |sh AS (SELECT sh0.* FROM sh0 JOIN rare USING (shingle)),
        |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
        |          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2)
        |SELECT id_a, id_b, CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) AS jaccard
        |FROM inter
        |JOIN sizes sa ON sa.doc_id = id_a
        |JOIN sizes sb ON sb.doc_id = id_b
        |WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.6
        |ORDER BY id_a, id_b""".stripMargin,
    "q_dedup_minhash" ->
      """WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 300),
        |words AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws FROM docs),
        |sh AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
        |       FROM words, UNNEST(range(1, len(ws) - 1)) AS t(i)
        |       WHERE len(ws) >= 3),
        |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
        |          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2)
        |SELECT id_a, id_b, CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) AS jaccard
        |FROM inter
        |JOIN sizes sa ON sa.doc_id = id_a
        |JOIN sizes sb ON sb.doc_id = id_b
        |WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.8
        |ORDER BY id_a, id_b""".stripMargin,
    // Complete oracle: exact via the fingerprint join, near via ALL
    // inc x ex shingle-set Jaccards (shingle equi-join — the same
    // technique as the q_dedup_minhash complete oracle, restricted to
    // cross-corpus pairs). Status precedence and min-match-id mirrored.
    // SHARED with q_dedup_index_incr: the standing index is an
    // implementation detail — classification semantics are identical,
    // so the same complete recomputation gates both paths.
    "q_dedup_incremental" -> incrementalOracleSql,
    "q_dedup_index_incr" -> incrementalOracleSql,
    // COMPLETE clustering oracle: all >= 0.8 Jaccard pairs on the slice
    // recomputed from scratch, then closed with a recursive CTE — min
    // reachable id is the component (edges are symmetric, every node
    // seeds its own id, so min over reachable labels = min of component).
    "q_dedup_cluster" ->
      s"""WITH RECURSIVE
         |${clusterOracleCtes("doc_id < 300")},
         |sz AS (SELECT component, count(*) AS cluster_size FROM lab GROUP BY component)
         |SELECT lab.id AS doc_id, lab.component, sz.cluster_size
         |FROM lab JOIN sz USING (component)
         |ORDER BY doc_id""".stripMargin,
    "q_decontaminate" ->
      """WITH words AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
        |               FROM documents),
        |sh AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
        |       FROM words, UNNEST(range(1, len(ws) - 1)) AS t(i)
        |       WHERE len(ws) >= 3)
        |SELECT t.doc_id,
        |  count(DISTINCT t.shingle) AS n_shared_shingles,
        |  count(DISTINCT b.doc_id) AS n_benchmark_docs
        |FROM sh t JOIN sh b ON b.shingle = t.shingle
        |WHERE t.doc_id % 50 <> 0 AND b.doc_id % 50 = 0
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // Eval-side contamination audit: per benchmark doc, exact integer
    // shingle totals/hits/witnesses — zero-hit docs kept via left join.
    "q_contamination_audit" ->
      """WITH words AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
        |               FROM documents),
        |sh AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
        |       FROM words, UNNEST(range(1, len(ws) - 1)) AS t(i)
        |       WHERE len(ws) >= 3),
        |bsh AS (SELECT doc_id AS bench_id, shingle FROM sh WHERE doc_id % 50 = 0),
        |tsh AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 50 <> 0),
        |per AS (SELECT bench_id, count(*) AS n_shingles FROM bsh GROUP BY 1),
        |hits AS (SELECT b.bench_id,
        |    count(DISTINCT t.shingle) AS n_hit,
        |    count(DISTINCT t.doc_id) AS n_train_docs
        |  FROM bsh b JOIN tsh t USING (shingle) GROUP BY 1)
        |SELECT p.bench_id AS doc_id, p.n_shingles,
        |  coalesce(h.n_hit, 0) AS n_hit,
        |  coalesce(h.n_train_docs, 0) AS n_train_docs
        |FROM per p LEFT JOIN hits h USING (bench_id)
        |ORDER BY doc_id""".stripMargin,
    "q_scd2" ->
      """SELECT o_custkey,
        |  row_number() OVER w AS version,
        |  o_orderdate AS valid_from,
        |  lead(o_orderdate) OVER w AS valid_to,
        |  (lead(o_orderdate) OVER w IS NULL) AS is_current,
        |  o_totalprice
        |FROM orders WHERE o_custkey < 100
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, version""".stripMargin,
    // SCD2 as-of: same window construction, the half-open interval
    // predicate at the same probe instant.
    "q_scd2_asof" ->
      """WITH h AS (SELECT o_custkey,
        |    row_number() OVER w AS version,
        |    o_orderdate AS valid_from,
        |    lead(o_orderdate) OVER w AS valid_to,
        |    o_totalprice
        |  FROM orders WHERE o_custkey < 100
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))
        |SELECT o_custkey, version, valid_from, valid_to, o_totalprice
        |FROM h
        |WHERE valid_from <= TIMESTAMP '1997-06-01 00:00:00'
        |  AND (valid_to IS NULL OR TIMESTAMP '1997-06-01 00:00:00' < valid_to)
        |ORDER BY o_custkey""".stripMargin,
    // FK integrity: same planted orphans, anti-join per relationship.
    "q_fk_integrity" ->
      """WITH p AS (SELECT CAST(k AS BIGINT) AS k
        |  FROM (VALUES (-1), (-1), (-2)) v(k)),
        |a1 AS (SELECT 'customer.c_nationkey->nation' AS relationship,
        |    CAST(count(*) AS BIGINT) AS n_orphan_rows,
        |    CAST(count(DISTINCT k) AS BIGINT) AS n_orphan_keys
        |  FROM (SELECT CAST(c_nationkey AS BIGINT) AS k FROM customer
        |        UNION ALL SELECT k FROM p) c
        |  ANTI JOIN nation n ON CAST(n.n_nationkey AS BIGINT) = c.k),
        |a2 AS (SELECT 'lineitem.l_orderkey->orders',
        |    CAST(count(*) AS BIGINT), CAST(count(DISTINCT k) AS BIGINT)
        |  FROM (SELECT l_orderkey AS k FROM lineitem
        |        UNION ALL SELECT k FROM p) c
        |  ANTI JOIN orders o ON o.o_orderkey = c.k),
        |a3 AS (SELECT 'lineitem.l_partkey->part',
        |    CAST(count(*) AS BIGINT), CAST(count(DISTINCT k) AS BIGINT)
        |  FROM (SELECT l_partkey AS k FROM lineitem
        |        UNION ALL SELECT k FROM p) c
        |  ANTI JOIN part t ON t.p_partkey = c.k),
        |a4 AS (SELECT 'orders.o_custkey->customer',
        |    CAST(count(*) AS BIGINT), CAST(count(DISTINCT k) AS BIGINT)
        |  FROM (SELECT o_custkey AS k FROM orders
        |        UNION ALL SELECT k FROM p) c
        |  ANTI JOIN customer u ON u.c_custkey = c.k)
        |SELECT * FROM a1 UNION ALL SELECT * FROM a2
        |UNION ALL SELECT * FROM a3 UNION ALL SELECT * FROM a4
        |ORDER BY relationship""".stripMargin,
    // BM25: identical arithmetic shape (idf * tf * (k1+1) / length-norm,
    // per-term contribution round(…, 9) summed as DECIMAL per the
    // float-parity header rule, total rounded to 4), Lucene-default
    // k1=1.2 b=0.75, rank ties on doc_id.
    "q_bm25" ->
      """WITH base AS (SELECT doc_id,
        |    list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |                x -> len(x) > 0) AS ws FROM documents),
        |docs AS (SELECT doc_id, len(ws) AS dl,
        |    list_filter(ws, w -> w IN ('spark', 'merge', 'window')) AS hits
        |  FROM base),
        |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM docs),
        |tf AS (SELECT doc_id, dl, unnest(hits) AS word FROM docs),
        |tfc AS (SELECT doc_id, dl, word, count(*) AS tf FROM tf GROUP BY 1, 2, 3),
        |dfc AS (SELECT word, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
        |contrib AS (SELECT doc_id,
        |    CAST(round(
        |      ln(1.0 + (s.n_docs - dfc.df + 0.5) / (dfc.df + 0.5)) *
        |        tfc.tf * 2.2 /
        |        (tfc.tf + 1.2 * (1.0 - 0.75 + 0.75 * tfc.dl / s.avgdl)),
        |      9) AS DECIMAL(28, 9)) AS c
        |  FROM tfc JOIN dfc USING (word), stats s),
        |scored AS (SELECT doc_id,
        |    round(CAST(sum(c) AS DOUBLE), 4) AS score
        |  FROM contrib GROUP BY doc_id),
        |ranked AS (SELECT doc_id, score,
        |    row_number() OVER (ORDER BY score DESC, doc_id) AS rank
        |  FROM scored)
        |SELECT doc_id, score, rank FROM ranked
        |WHERE rank <= 20 ORDER BY rank""".stripMargin,
    // BPE merge statistics: vocabulary-collapse first, then character
    // pairs weighted by word frequency — pure integer counts, ties on
    // (left, right). DuckDB's range(1, n) is exclusive like Spark's
    // sequence(1, n-1) is inclusive: both yield positions 1..len-1.
    "q_bpe_merges" ->
      """WITH occ AS (SELECT unnest(list_filter(
        |      string_split_regex(trim(lower(text)), '\s+'),
        |      x -> len(x) > 0)) AS word FROM documents),
        |vocab AS (SELECT word, count(*) AS freq FROM occ GROUP BY 1),
        |pairs AS (SELECT substring(word, CAST(i AS INT), 1) AS lft,
        |    substring(word, CAST(i AS INT) + 1, 1) AS rgt, freq
        |  FROM vocab, unnest(range(1, len(word))) AS t(i)
        |  WHERE len(word) >= 2),
        |counted AS (SELECT lft, rgt, sum(freq) AS pair_count
        |  FROM pairs GROUP BY 1, 2),
        |ranked AS (SELECT lft AS "left", rgt AS "right", pair_count,
        |    row_number() OVER (ORDER BY pair_count DESC, lft, rgt) AS rank
        |  FROM counted)
        |SELECT "left", "right", CAST(pair_count AS BIGINT) AS pair_count,
        |  rank FROM ranked
        |WHERE rank <= 30 ORDER BY rank""".stripMargin,
    // Trained BPE: full independent training replay (bracket-string
    // symbol sequences, replace-based merges) — see bpeReplayCtes.
    "q_bpe_train" -> bpeTrainOracle,
    "q_unigram_tokenizer" ->
      (unigramTrainOracle + "\n" + unigramTrainFinalSelect),
    // Unigram ENCODE: the oracle replays training to the pruned
    // vocabulary, re-derives the final log-prob table over it, runs
    // the same integer Viterbi DP (same tie rule) over the encode
    // slice's distinct words, and counts backtrace steps per word —
    // then the per-doc (n_words, n_tokens) sums.
    "q_unigram_encode" -> unigramEncodeOracle,
    // WordPiece: full independent training replay with the likelihood
    // score rule, plus an unrolled MaxMatch for encode — see
    // wpReplayCtes / wpEncodeOracle.
    "q_wordpiece_train" -> wpTrainOracle,
    "q_wordpiece_encode" -> wpEncodeOracle,
    "q_tokenize_bpe" -> tokenizeBpeOracle,
    "q_bpe_encode" -> bpeEncodeOracle,
    // Fertility: the three encode replays re-aggregated — full trainer
    // re-derivation runs inside each subquery arm.
    "q_tokenizer_fertility" -> tokenizerFertilityOracle,
    // DSIR: the oracle refits both hashed-n-gram bucket multinomials
    // (uni+bigram, md5-prefix buckets mod 4096, add-one smoothing over
    // total+B), replays the 9-decimal log-ratio terms, the DECIMAL
    // weighted per-doc sums rounded to 4, and the top-25% selection as
    // a literal row_number over (score desc, doc_id) — the formulation
    // the engine's boundary-bucket construction must be bit-identical
    // to.
    "q_dsir_sample" ->
      """WITH w AS (SELECT doc_id,
        |    source IN ('src0','src1','src2','src3') AS tgt,
        |    list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |      x -> len(x) > 0) AS ws
        |  FROM documents),
        |uni AS (SELECT doc_id, tgt, unnest(ws) AS g FROM w),
        |bi AS (SELECT doc_id, tgt, ws[t.i - 1] || ' ' || ws[t.i] AS g
        |  FROM w, unnest(range(2, len(ws) + 1)) AS t(i)
        |  WHERE len(ws) >= 2),
        |occ AS (SELECT doc_id, tgt,
        |    CAST(concat('0x', substr(md5(g), 1, 6)) AS BIGINT) % 4096
        |      AS bucket
        |  FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)),
        |ct AS (SELECT bucket, count(*) AS n FROM occ WHERE tgt GROUP BY 1),
        |cr AS (SELECT bucket, count(*) AS n FROM occ WHERE NOT tgt
        |  GROUP BY 1),
        |tt AS (SELECT count(*) AS t FROM occ WHERE tgt),
        |rt AS (SELECT count(*) AS r FROM occ WHERE NOT tgt),
        |terms AS (SELECT coalesce(ct.bucket, cr.bucket) AS bucket,
        |    CAST(round(ln((coalesce(ct.n, 0) + 1.0) / (t + 4096)) -
        |               ln((coalesce(cr.n, 0) + 1.0) / (r + 4096)), 9)
        |      AS DECIMAL(28,9)) AS term
        |  FROM ct FULL OUTER JOIN cr ON ct.bucket = cr.bucket
        |  CROSS JOIN tt CROSS JOIN rt),
        |db AS (SELECT doc_id, bucket, count(*) AS c FROM occ
        |  WHERE NOT tgt GROUP BY 1, 2),
        |sc AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_feats,
        |    CAST(round(sum(CAST(c AS DECIMAL(9,0)) * term), 4) AS DOUBLE)
        |      AS score
        |  FROM db JOIN terms USING (bucket) GROUP BY doc_id),
        |rk AS (SELECT *, row_number() OVER (ORDER BY score DESC, doc_id)
        |    AS rn, count(*) OVER () AS n FROM sc)
        |SELECT doc_id, n_feats, score, rn <= ceil(n * 0.25) AS selected
        |FROM rk ORDER BY doc_id""".stripMargin,
    // Naive Bayes quality classifier: the oracle RETRAINS the model —
    // same add-one smoothing, same 9-decimal LLR rounding, DECIMAL
    // sum, 4-decimal score; pred derives from the rounded score.
    "q_quality_classifier" ->
      """WITH base AS (SELECT doc_id,
        |    source IN ('src0','src1','src2','src3','src4') AS pos,
        |    list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |      x -> len(x) > 0) AS ws
        |  FROM documents),
        |tfc AS (SELECT doc_id, pos, word, count(*) AS c FROM
        |    (SELECT doc_id, pos, unnest(ws) AS word FROM base)
        |  GROUP BY 1, 2, 3),
        |wc AS (SELECT word,
        |    coalesce(sum(CASE WHEN pos THEN c END), 0) AS n_pos,
        |    coalesce(sum(CASE WHEN NOT pos THEN c END), 0) AS n_neg
        |  FROM tfc GROUP BY 1),
        |tot AS (SELECT sum(n_pos) AS t_pos, sum(n_neg) AS t_neg,
        |    count(*) AS v FROM wc),
        |pri AS (SELECT sum(CASE WHEN pos THEN 1 ELSE 0 END) AS d_pos,
        |    sum(CASE WHEN NOT pos THEN 1 ELSE 0 END) AS d_neg FROM base),
        |llr AS (SELECT word, CAST(round(
        |      ln((n_pos + 1.0) / (t_pos + v)) -
        |      ln((n_neg + 1.0) / (t_neg + v)), 9) AS DECIMAL(28,9)) AS w_llr
        |  FROM wc, tot),
        |plr AS (SELECT CAST(round(ln(d_pos * 1.0) - ln(d_neg * 1.0), 9)
        |    AS DECIMAL(28,9)) AS pl FROM pri),
        |scored AS (SELECT doc_id,
        |    CAST(round(s + pl, 4) AS DOUBLE) AS score FROM
        |    (SELECT doc_id, sum(CAST(c AS DECIMAL(9,0)) * w_llr) AS s
        |     FROM tfc JOIN llr USING (word) GROUP BY 1), plr)
        |SELECT doc_id, score, score > 0 AS pred
        |FROM scored ORDER BY doc_id""".stripMargin,
    // Span-level exact substring duplication: the oracle rebuilds the
    // 8-word windows, the corpus-wide duplicate filter, and the
    // interval merge (adjacent/overlapping spans coalesce) from first
    // principles, including the two planted sentinel documents.
    "q_dedup_substring" ->
      """WITH base AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0
        |  UNION ALL SELECT * FROM (VALUES
        |    (CAST(900001 AS BIGINT),
        |     'alpha beta gamma delta epsilon zeta eta theta iota unique1 tail1'),
        |    (CAST(900002 AS BIGINT),
        |     'prefix2 alpha beta gamma delta epsilon zeta eta theta iota unique2'))
        |    AS p(doc_id, text)),
        |w AS (SELECT doc_id,
        |    list_filter(string_split_regex(trim(text), '\s+'),
        |      x -> len(x) > 0) AS ws FROM base),
        |pos AS (SELECT doc_id, t.i AS pos,
        |    array_to_string(list_slice(ws, t.i, t.i + 7), ' ') AS sh
        |  FROM w, unnest(range(1, len(ws) - 6)) AS t(i)
        |  WHERE len(ws) >= 8),
        |dup AS (SELECT sh FROM pos GROUP BY sh HAVING count(*) > 1),
        |hits AS (SELECT doc_id, pos FROM pos JOIN dup USING (sh)),
        |m AS (SELECT doc_id, pos, max(pos + 8) OVER (PARTITION BY doc_id
        |    ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |    AS prev_end FROM hits),
        |sf AS (SELECT doc_id, pos, CASE WHEN prev_end IS NULL
        |    OR pos > prev_end THEN 1 ELSE 0 END AS nw FROM m),
        |g AS (SELECT doc_id, pos, sum(nw) OVER (PARTITION BY doc_id
        |    ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS span_id FROM sf),
        |spans AS (SELECT doc_id, span_id, min(pos) AS s, max(pos) + 8 AS e
        |  FROM g GROUP BY 1, 2)
        |SELECT doc_id, count(*) AS n_dup_spans,
        |  CAST(sum(e - s) AS BIGINT) AS dup_words
        |FROM spans GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // Domain blocklist: INDEPENDENT implementation of the same
    // semantics — host extracted with the same regex, but the suffix
    // rule expressed as equality-or-dot-suffix LIKE instead of the
    // suffix-explode equi-join, so a bug in either path turns the gate
    // red instead of reproducing on both sides.
    "q_url_blocklist" ->
      """WITH pages AS (SELECT doc_id,
        |    CASE WHEN doc_id % 5 = 0 THEN 'https://ads.tracker.com/x' || doc_id
        |         WHEN doc_id % 5 = 1 THEN 'http://sub.ads.tracker.com/y' || doc_id
        |         WHEN doc_id % 5 = 2 THEN 'https://cdn.example.com/z' || doc_id
        |         WHEN doc_id % 5 = 3 THEN 'https://example.org/p' || doc_id
        |         ELSE 'http://spam.net/q' || doc_id END AS url
        |  FROM documents),
        |hosts AS (SELECT doc_id, url,
        |    rtrim(lower(regexp_extract(url, '^(?i)https?://([^/:?#]+)', 1)), '.')
        |      AS host FROM pages),
        |blocked AS (SELECT * FROM (VALUES ('tracker.com'), ('spam.net'),
        |    ('acker.com'), ('unused.example')) AS b(domain))
        |SELECT doc_id, url FROM hosts h
        |WHERE len(host) = 0 OR NOT EXISTS (
        |  SELECT 1 FROM blocked b
        |  WHERE h.host = b.domain OR h.host LIKE '%.' || b.domain)
        |ORDER BY doc_id""".stripMargin,
    "q_tfidf" ->
      """WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
        |n AS (SELECT count(*) AS n_docs FROM docs),
        |w AS (SELECT doc_id,
        |        unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |                           x -> len(x) > 0)) AS word
        |      FROM docs),
        |tf AS (SELECT doc_id, word, count(*) AS tf FROM w GROUP BY 1, 2),
        |df AS (SELECT word, count(DISTINCT doc_id) AS df FROM w GROUP BY 1),
        |scored AS (SELECT tf.doc_id, tf.word,
        |    round(tf.tf * ln(CAST(n.n_docs + 1 AS DOUBLE) / (df.df + 1)), 4) AS tfidf
        |  FROM tf JOIN df USING (word), n),
        |ranked AS (SELECT doc_id, word, tfidf,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, word) AS term_rank
        |  FROM scored)
        |SELECT doc_id, word, tfidf, term_rank FROM ranked
        |WHERE term_rank <= 3 ORDER BY doc_id, term_rank""".stripMargin,
    "q_inverted_index" ->
      """WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
        |occ AS (SELECT doc_id,
        |        unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |                           x -> len(x) > 0)) AS word
        |      FROM docs),
        |w AS (SELECT DISTINCT doc_id, word FROM occ)
        |SELECT word, count(DISTINCT doc_id) AS df,
        |  string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
        |FROM w GROUP BY word
        |HAVING count(DISTINCT doc_id) BETWEEN 100 AND 160
        |ORDER BY word""".stripMargin,
    "q_mix_domains" ->
      """WITH counts AS (SELECT lang, count(*) AS n_dom FROM documents GROUP BY lang),
        |tot AS (SELECT count(*) AS n_total FROM documents),
        |rates AS (SELECT lang,
        |    least(100, ((n_total * 20) // 100) * 100 // n_dom) AS rate
        |  FROM counts, tot),
        |h AS (SELECT doc_id, lang,
        |    ((doc_id % 2147483647) * 2654435761) % 2147483647 AS y
        |  FROM documents),
        |b AS (SELECT doc_id, lang, (y * y) % 2147483647 % 100 AS bkt FROM h)
        |SELECT b.doc_id, b.lang FROM b JOIN rates r ON r.lang = b.lang
        |WHERE b.bkt < r.rate ORDER BY b.doc_id""".stripMargin,
    "q_profile" ->
      """WITH p AS (
        |  SELECT 'o_custkey' AS col_name, count(*) AS n_rows,
        |    count(CASE WHEN o_custkey IS NULL THEN 1 END) AS n_nulls,
        |    count(DISTINCT o_custkey) AS n_distinct,
        |    CAST(min(o_custkey) AS VARCHAR) AS min_val,
        |    CAST(max(o_custkey) AS VARCHAR) AS max_val
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_orderstatus', count(*),
        |    count(CASE WHEN o_orderstatus IS NULL THEN 1 END),
        |    count(DISTINCT o_orderstatus),
        |    CAST(min(o_orderstatus) AS VARCHAR), CAST(max(o_orderstatus) AS VARCHAR)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_totalprice', count(*),
        |    count(CASE WHEN o_totalprice IS NULL THEN 1 END),
        |    count(DISTINCT o_totalprice),
        |    CAST(min(o_totalprice) AS VARCHAR), CAST(max(o_totalprice) AS VARCHAR)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_orderdate', count(*),
        |    count(CASE WHEN o_orderdate IS NULL THEN 1 END),
        |    count(DISTINCT o_orderdate),
        |    CAST(min(o_orderdate) AS VARCHAR), CAST(max(o_orderdate) AS VARCHAR)
        |  FROM orders)
        |SELECT col_name, n_rows, n_nulls, n_distinct, min_val, max_val
        |FROM p ORDER BY col_name""".stripMargin,
    "q_histogram" ->
      """WITH b AS (SELECT CAST(min(l_extendedprice) AS DOUBLE) AS lo,
        |                  CAST(max(l_extendedprice) AS DOUBLE) AS hi
        |           FROM lineitem),
        |assigned AS (SELECT
        |    CASE WHEN hi - lo = 0 THEN 0
        |         ELSE least(11, CAST(floor((CAST(l_extendedprice AS DOUBLE) - lo) * 12 / (hi - lo)) AS BIGINT))
        |    END AS bucket_id, lo, hi
        |  FROM lineitem, b)
        |SELECT bucket_id,
        |  lo + bucket_id * (hi - lo) / 12 AS bucket_lo,
        |  lo + (bucket_id + 1) * (hi - lo) / 12 AS bucket_hi,
        |  count(*) AS n
        |FROM assigned GROUP BY bucket_id, lo, hi
        |ORDER BY bucket_id""".stripMargin,
    "q_window_range" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey
        |    ORDER BY date_diff('day', DATE '1992-01-01', o_orderdate)
        |    RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rolling_30d
        |FROM orders WHERE o_custkey < 50
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_dedup_lsh_full" ->
      s"""WITH pairs AS (SELECT * FROM read_parquet('$lshFullDir/pairs.parquet/*.parquet')),
         |ids AS (SELECT id_a AS id FROM pairs UNION SELECT id_b FROM pairs),
         |docs AS (SELECT doc_id, text FROM documents WHERE doc_id IN (SELECT id FROM ids)),
         |words AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws FROM docs),
         |sh AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
         |       FROM words, UNNEST(range(1, len(ws) - 1)) AS t(i)
         |       WHERE len(ws) >= 3),
         |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
         |inter AS (SELECT p.id_a, p.id_b, count(*) AS n_inter
         |          FROM pairs p
         |          JOIN sh a ON a.doc_id = p.id_a
         |          JOIN sh b ON b.doc_id = p.id_b AND b.shingle = a.shingle
         |          GROUP BY 1, 2),
         |checked AS (SELECT p.id_a, p.id_b, p.jaccard,
         |          CAST(i.n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - i.n_inter) AS recomputed
         |          FROM pairs p
         |          JOIN inter i ON i.id_a = p.id_a AND i.id_b = p.id_b
         |          JOIN sizes sa ON sa.doc_id = p.id_a
         |          JOIN sizes sb ON sb.doc_id = p.id_b)
         |SELECT id_a, id_b, jaccard FROM checked
         |WHERE recomputed >= 0.8 AND recomputed = jaccard
         |ORDER BY id_a, id_b""".stripMargin,
    // Banding-recall gate: the oracle replays the planted twins from
    // source (index-aware word replacement, the exact engine schedule),
    // computes the COMPLETE (corpus, planted) Jaccard target with the
    // standard shingle replay, counts the dumped engine pairs that
    // genuinely belong to the target (soundness), and emits its summary
    // row UNFILTERED — the engine's >= 0.95 filter is the assertion.
    // SimHash recall readout: planted-twin replay (shared mutation
    // schedule), COMPLETE bag-Jaccard target via the word-count
    // min-sum formulation, dumped-pair soundness via the target join,
    // unfiltered summary row.
    "q_simhash_recall" -> {
      val muts = dedupRecallMuts.mkString("[", ", ", "]")
      s"""WITH docs AS (SELECT doc_id, text FROM documents),
         |mut AS (SELECT doc_id,
         |    ($muts)[CAST((doc_id // 10) % 10 + 1 AS INT)] AS m,
         |    string_split_regex(trim(text), '\\s+') AS ws
         |  FROM docs WHERE doc_id < 500 AND doc_id % 10 = 0),
         |planted AS (SELECT doc_id + 980000 AS doc_id,
         |    array_to_string(list_transform(ws,
         |      (w, i) -> CASE WHEN i % m = 0 THEN 'xmutx' ELSE w END), ' ') AS text
         |  FROM mut),
         |all0 AS (SELECT doc_id, text FROM docs UNION ALL SELECT * FROM planted),
         |wrds AS (SELECT doc_id,
         |    unnest(list_filter(string_split_regex(trim(text), '\\s+'),
         |      x -> len(x) > 0)) AS word
         |  FROM all0),
         |cnt AS (SELECT doc_id, word, count(*) AS c FROM wrds GROUP BY 1, 2),
         |tot AS (SELECT doc_id, sum(c) AS n FROM cnt GROUP BY 1),
         |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |    sum(least(a.c, b.c)) AS ni
         |  FROM cnt a JOIN cnt b ON a.word = b.word
         |  WHERE a.doc_id < 980000 AND b.doc_id >= 980000
         |  GROUP BY 1, 2),
         |target AS (SELECT id_a, id_b
         |  FROM inter
         |  JOIN tot ta ON ta.doc_id = id_a
         |  JOIN tot tb ON tb.doc_id = id_b
         |  WHERE CAST(ni AS DOUBLE) / (ta.n + tb.n - ni) >= 0.8),
         |pairs AS (SELECT id_a, id_b
         |  FROM read_parquet('$dedupRecallDir/simfound.parquet/*.parquet')),
         |sound AS (SELECT p.id_a FROM pairs p
         |  JOIN target t ON t.id_a = p.id_a AND t.id_b = p.id_b)
         |SELECT CAST((SELECT count(*) FROM target) AS BIGINT) AS n_target,
         |  CAST((SELECT count(*) FROM sound) AS BIGINT) AS n_found,
         |  round(CAST((SELECT count(*) FROM sound) AS DOUBLE) /
         |        greatest((SELECT count(*) FROM target), 1), 6) AS recall""".stripMargin
    },
    // Containment recall readout: planted verbatim-slice replay (shared
    // length/offset schedule), COMPLETE directed-containment target
    // over distinct 3-shingles, dumped-pair soundness via the target
    // join, unfiltered summary row.
    "q_containment_recall" -> {
      val lens = quoteRecallLens.mkString("[", ", ", "]")
      s"""WITH docs AS (SELECT doc_id, text FROM documents),
         |sl AS (SELECT doc_id,
         |    ($lens)[CAST((doc_id // 10) % 10 + 1 AS INT)] AS l,
         |    ((doc_id // 10) % 2) * 4 AS o,
         |    string_split_regex(trim(text), '\\s+') AS ws
         |  FROM docs WHERE doc_id < 500 AND doc_id % 10 = 5),
         |planted AS (SELECT doc_id + 990000 AS doc_id,
         |    array_to_string(list_slice(ws, o + 1, o + l), ' ') AS text
         |  FROM sl),
         |all0 AS (SELECT doc_id, text FROM docs UNION ALL SELECT * FROM planted),
         |words AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws FROM all0),
         |sh AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
         |       FROM words, UNNEST(range(1, len(ws) - 1)) AS t(i)
         |       WHERE len(ws) >= 3),
         |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
         |          FROM sh a JOIN sh b ON a.shingle = b.shingle
         |          WHERE a.doc_id < 980000 AND b.doc_id >= 990000
         |          GROUP BY 1, 2),
         |target AS (SELECT id_a AS container_id, id_b AS contained_id
         |           FROM inter
         |           JOIN sizes sb ON sb.doc_id = id_b
         |           WHERE CAST(n_inter AS DOUBLE) / sb.n_sh >= 0.5),
         |pairs AS (SELECT contained_id, container_id
         |          FROM read_parquet('$dedupRecallDir/qfound.parquet/*.parquet')),
         |sound AS (SELECT p.contained_id FROM pairs p
         |          JOIN target t ON t.contained_id = p.contained_id
         |                       AND t.container_id = p.container_id)
         |SELECT CAST((SELECT count(*) FROM target) AS BIGINT) AS n_target,
         |  CAST((SELECT count(*) FROM sound) AS BIGINT) AS n_found,
         |  round(CAST((SELECT count(*) FROM sound) AS DOUBLE) /
         |        greatest((SELECT count(*) FROM target), 1), 6) AS recall""".stripMargin
    },
    "q_dedup_recall" -> {
      val muts = dedupRecallMuts.mkString("[", ", ", "]")
      s"""WITH docs AS (SELECT doc_id, text FROM documents),
         |mut AS (SELECT doc_id,
         |    ($muts)[CAST((doc_id // 10) % 10 + 1 AS INT)] AS m,
         |    string_split_regex(trim(text), '\\s+') AS ws
         |  FROM docs WHERE doc_id < 500 AND doc_id % 10 = 0),
         |planted AS (SELECT doc_id + 980000 AS doc_id,
         |    array_to_string(list_transform(ws,
         |      (w, i) -> CASE WHEN i % m = 0 THEN 'xmutx' ELSE w END), ' ') AS text
         |  FROM mut),
         |all0 AS (SELECT doc_id, text FROM docs UNION ALL SELECT * FROM planted),
         |words AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws FROM all0),
         |sh AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
         |       FROM words, UNNEST(range(1, len(ws) - 1)) AS t(i)
         |       WHERE len(ws) >= 3),
         |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
         |          FROM sh a JOIN sh b ON a.shingle = b.shingle
         |          WHERE a.doc_id < 980000 AND b.doc_id >= 980000
         |          GROUP BY 1, 2),
         |target AS (SELECT id_a, id_b
         |           FROM inter
         |           JOIN sizes sa ON sa.doc_id = id_a
         |           JOIN sizes sb ON sb.doc_id = id_b
         |           WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.8),
         |pairs AS (SELECT id_a, id_b
         |          FROM read_parquet('$dedupRecallDir/found.parquet/*.parquet')),
         |sound AS (SELECT p.id_a FROM pairs p
         |          JOIN target t ON t.id_a = p.id_a AND t.id_b = p.id_b)
         |SELECT CAST((SELECT count(*) FROM target) AS BIGINT) AS n_target,
         |  CAST((SELECT count(*) FROM sound) AS BIGINT) AS n_found,
         |  round(CAST((SELECT count(*) FROM sound) AS DOUBLE) /
         |        greatest((SELECT count(*) FROM target), 1), 6) AS recall""".stripMargin
    },
    "q_dedup_simhash" ->
      """WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 300),
        |w AS (SELECT doc_id,
        |        unnest(list_filter(string_split_regex(trim(text), '\s+'), x -> len(x) > 0)) AS word
        |      FROM docs),
        |cnt AS (SELECT doc_id, word, count(*) AS c FROM w GROUP BY 1, 2),
        |tot AS (SELECT doc_id, sum(c) AS n FROM cnt GROUP BY 1),
        |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, sum(least(a.c, b.c)) AS ni
        |          FROM cnt a JOIN cnt b ON a.word = b.word AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2)
        |SELECT id_a, id_b, CAST(ni AS DOUBLE) / (ta.n + tb.n - ni) AS bag_jaccard
        |FROM inter
        |JOIN tot ta ON ta.doc_id = id_a
        |JOIN tot tb ON tb.doc_id = id_b
        |WHERE CAST(ni AS DOUBLE) / (ta.n + tb.n - ni) >= 0.8
        |ORDER BY id_a, id_b""".stripMargin,
    "q_dedup_simhash_full" ->
      s"""WITH pairs AS (SELECT * FROM read_parquet('$simhashFullDir/pairs.parquet/*.parquet')),
         |ids AS (SELECT id_a AS id FROM pairs UNION SELECT id_b FROM pairs),
         |docs AS (SELECT doc_id, text FROM documents WHERE doc_id IN (SELECT id FROM ids)),
         |w AS (SELECT doc_id,
         |        unnest(list_filter(string_split_regex(trim(text), '\\s+'), x -> len(x) > 0)) AS word
         |      FROM docs),
         |cnt AS (SELECT doc_id, word, count(*) AS c FROM w GROUP BY 1, 2),
         |tot AS (SELECT doc_id, sum(c) AS n FROM cnt GROUP BY 1),
         |inter AS (SELECT p.id_a, p.id_b, sum(least(a.c, b.c)) AS ni
         |          FROM pairs p
         |          JOIN cnt a ON a.doc_id = p.id_a
         |          JOIN cnt b ON b.doc_id = p.id_b AND b.word = a.word
         |          GROUP BY 1, 2),
         |checked AS (SELECT p.id_a, p.id_b, p.bag_jaccard,
         |          CAST(i.ni AS DOUBLE) / (ta.n + tb.n - i.ni) AS recomputed
         |          FROM pairs p
         |          JOIN inter i ON i.id_a = p.id_a AND i.id_b = p.id_b
         |          JOIN tot ta ON ta.doc_id = p.id_a
         |          JOIN tot tb ON tb.doc_id = p.id_b)
         |SELECT id_a, id_b, bag_jaccard FROM checked
         |WHERE recomputed >= 0.8 AND recomputed = bag_jaccard
         |ORDER BY id_a, id_b""".stripMargin,
    "q_embed_ann_lsh" -> annLshOracle,
    // ANN recall@10: both sides' oracle SQL composed verbatim as
    // nested CTEs; the intersection count and one rounded division.
    "q_ann_recall_hi" -> annRecallHiOracle,
    "q_ann_recall" ->
      s"""WITH approx AS (${annLshOracleFor(8, 4, 1, excludeQuery = true)}),
         |exact AS (
         |WITH q AS (SELECT embedding AS e FROM embeddings WHERE vec_id = 0),
         |scored AS (
         |  SELECT vec_id,
         |    round(list_dot_product(CAST(embedding AS DOUBLE[]), (SELECT CAST(e AS DOUBLE[]) FROM q)) /
         |      (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) *
         |       sqrt((SELECT list_dot_product(CAST(e AS DOUBLE[]), CAST(e AS DOUBLE[])) FROM q))), 4) AS cosine
         |  FROM embeddings WHERE vec_id != 0)
         |SELECT vec_id, cosine FROM scored ORDER BY cosine DESC, vec_id LIMIT 10)
         |SELECT CAST(10 AS INTEGER) AS k,
         |  CAST(count(*) AS BIGINT) AS n_hits,
         |  round(CAST(count(*) AS DOUBLE) / 10.0, 6) AS recall
         |FROM exact SEMI JOIN approx USING (vec_id)""".stripMargin,
    // Matryoshka prefix-dim recall + MMR greedy diversity re-rank: both
    // replayed from source (per-dim blocks / unrolled greedy CTEs).
    "q_matryoshka_recall" -> matryoshkaOracleSql,
    "q_mmr_rerank" -> mmrOracleSql,
    "q_embed_neardup" -> embedNearDupOracle,
    // Embedding-cell drift: assignment replayed from the dumped frozen
    // centroids (the q_embed_ivf technique), then the q_drift_psi
    // arithmetic over the two cell histograms.
    "q_embed_drift" ->
      s"""WITH cents AS (SELECT cell, CAST(centroid AS DOUBLE[]) AS c
         |      FROM read_parquet('$embedDriftDir/centroids.parquet/*.parquet')),
         |emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |assign AS (SELECT vec_id,
         |      (SELECT cell FROM cents
         |       ORDER BY 2 * list_dot_product(cents.c, emb.e) - list_dot_product(cents.c, cents.c) DESC, cell
         |       LIMIT 1) AS cell
         |      FROM emb),
         |b AS (SELECT cell, count(*) AS n_base FROM assign
         |      WHERE vec_id % 2 = 0 GROUP BY cell),
         |cc AS (SELECT cell, count(*) AS n_cur FROM assign
         |      WHERE vec_id % 2 = 1 GROUP BY cell),
         |tot AS (SELECT (SELECT CAST(sum(n_base) AS DOUBLE) FROM b) AS tb,
         |               (SELECT CAST(sum(n_cur) AS DOUBLE) FROM cc) AS tc),
         |j AS (SELECT coalesce(b.cell, cc.cell) AS cell,
         |        coalesce(n_base, 0) AS n_base, coalesce(n_cur, 0) AS n_cur
         |      FROM b FULL OUTER JOIN cc ON b.cell = cc.cell)
         |SELECT cell, n_base, n_cur,
         |  round((greatest(CAST(n_base AS DOUBLE) / (SELECT tb FROM tot), 1e-6)
         |       - greatest(CAST(n_cur AS DOUBLE) / (SELECT tc FROM tot), 1e-6))
         |    * ln(greatest(CAST(n_base AS DOUBLE) / (SELECT tb FROM tot), 1e-6)
         |       / greatest(CAST(n_cur AS DOUBLE) / (SELECT tc FROM tot), 1e-6)),
         |    6) AS psi_term
         |FROM j ORDER BY cell""".stripMargin,
    "q_embed_ivf" ->
      s"""WITH cents AS (SELECT cell, CAST(centroid AS DOUBLE[]) AS c
         |      FROM read_parquet('$ivfDir/centroids.parquet/*.parquet')),
         |emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |q AS (SELECT e AS qe FROM emb WHERE vec_id = 0),
         |probe AS (SELECT cell FROM cents
         |      ORDER BY 2 * list_dot_product(c, (SELECT qe FROM q)) - list_dot_product(c, c) DESC, cell
         |      LIMIT 4),
         |assign AS (SELECT vec_id, e,
         |      (SELECT cell FROM cents
         |       ORDER BY 2 * list_dot_product(cents.c, emb.e) - list_dot_product(cents.c, cents.c) DESC, cell
         |       LIMIT 1) AS cell
         |      FROM emb),
         |scored AS (SELECT vec_id,
         |      round(list_dot_product(e, (SELECT qe FROM q)) /
         |        (sqrt(list_dot_product(e, e)) * (SELECT sqrt(list_dot_product(qe, qe)) FROM q)), 4) AS cosine
         |      FROM assign WHERE cell IN (SELECT cell FROM probe))
         |SELECT vec_id, cosine FROM scored ORDER BY cosine DESC, vec_id LIMIT 10""".stripMargin,
    // Incremental IVF store: replay assignment / probe / ranking for the
    // 3-query panel from the dumped (standing-80%-trained) centroids.
    // The oracle sees only data + centroids — the engine's incremental
    // merge must land on exactly this from-scratch answer.
    "q_ivf_incr" ->
      s"""WITH cents AS (SELECT cell, CAST(centroid AS DOUBLE[]) AS c
         |      FROM read_parquet('$ivfIncrDir/centroids.parquet/*.parquet')),
         |emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |qs AS (SELECT vec_id AS qid, e AS qe FROM emb WHERE vec_id IN (0, 17, 42)),
         |probe AS (SELECT qid, cell FROM (
         |      SELECT q.qid, cents.cell,
         |        row_number() OVER (PARTITION BY q.qid
         |          ORDER BY 2 * list_dot_product(cents.c, q.qe) - list_dot_product(cents.c, cents.c) DESC, cents.cell) AS pr
         |      FROM qs q, cents) WHERE pr <= 4),
         |assign AS (SELECT vec_id, e,
         |      (SELECT cell FROM cents
         |       ORDER BY 2 * list_dot_product(cents.c, emb.e) - list_dot_product(cents.c, cents.c) DESC, cell
         |       LIMIT 1) AS cell
         |      FROM emb),
         |scored AS (SELECT q.qid, a.vec_id,
         |      round(list_dot_product(a.e, q.qe) /
         |        (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(q.qe, q.qe))), 4) AS cosine
         |      FROM qs q
         |      JOIN probe p ON p.qid = q.qid
         |      JOIN assign a ON a.cell = p.cell),
         |ranked AS (SELECT qid, vec_id, cosine,
         |      row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rk
         |      FROM scored)
         |SELECT qid, vec_id, cosine FROM ranked WHERE rk <= 10
         |ORDER BY qid, cosine DESC, vec_id""".stripMargin,
    // IVF recall readout: both rankings replayed from the dumped
    // centroids — approx probes the top-4 cells, exact scores every
    // vector (equivalently: probes all 8 cells) — then the per-query
    // intersection count.
    "q_ivf_recall" ->
      s"""WITH cents AS (SELECT cell, CAST(centroid AS DOUBLE[]) AS c
         |      FROM read_parquet('$ivfIncrDir/centroids.parquet/*.parquet')),
         |emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |qs AS (SELECT vec_id AS qid, e AS qe FROM emb WHERE vec_id IN (0, 17, 42, 123, 256)),
         |probe AS (SELECT qid, cell FROM (
         |      SELECT q.qid, cents.cell,
         |        row_number() OVER (PARTITION BY q.qid
         |          ORDER BY 2 * list_dot_product(cents.c, q.qe) - list_dot_product(cents.c, cents.c) DESC, cents.cell) AS pr
         |      FROM qs q, cents) WHERE pr <= 4),
         |assign AS (SELECT vec_id, e,
         |      (SELECT cell FROM cents
         |       ORDER BY 2 * list_dot_product(cents.c, emb.e) - list_dot_product(cents.c, cents.c) DESC, cell
         |       LIMIT 1) AS cell
         |      FROM emb),
         |scored AS (SELECT q.qid, a.vec_id, a.cell,
         |      round(list_dot_product(a.e, q.qe) /
         |        (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(q.qe, q.qe))), 4) AS cosine
         |      FROM qs q CROSS JOIN assign a
         |      WHERE a.vec_id != q.qid),
         |approx AS (SELECT qid, vec_id FROM (
         |      SELECT s.qid, s.vec_id,
         |        row_number() OVER (PARTITION BY s.qid ORDER BY s.cosine DESC, s.vec_id) AS rk
         |      FROM scored s JOIN probe p ON p.qid = s.qid AND p.cell = s.cell)
         |      WHERE rk <= 10),
         |exact AS (SELECT qid, vec_id FROM (
         |      SELECT qid, vec_id,
         |        row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rk
         |      FROM scored) WHERE rk <= 10),
         |hit AS (SELECT a.qid, count(*) AS n_hit
         |      FROM approx a JOIN exact e ON e.qid = a.qid AND e.vec_id = a.vec_id
         |      GROUP BY a.qid)
         |SELECT q.qid, CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
         |  round(coalesce(h.n_hit, 0) / 10.0, 6) AS recall
         |FROM qs q LEFT JOIN hit h ON h.qid = q.qid
         |ORDER BY q.qid""".stripMargin,
    "q_pq_recall" -> pqRecallOracleSql,
    "q_pq_rerank" -> pqRerankOracleSql,
    "q_embed_pq" -> pqOracleSql,
    "q_embed_ivfpq" -> ivfPqOracleSql,
    "q_ingest_e2e" -> ingestE2eOracle,
    "q_ingest_bucketed" -> ingestE2eOracleIn(e2eBucketedDir),
    // Recomputes the expected post-swap Derby state from parquet alone;
    // the Spark side must deliver exactly this through the JDBC scan.
    "q_jdbc_roundtrip" ->
      """WITH batch AS (SELECT p_name AS title, (p_partkey % 3 = 0) AS active,
        |         CAST(p_retailprice AS DECIMAL(12,2)) AS max_price
        |       FROM part WHERE p_partkey % 10 = 0),
        |allr AS (SELECT 1 AS client_id, upper(title) AS title, active, max_price FROM batch
        |         UNION ALL
        |         SELECT 2 AS client_id, title, active, max_price FROM batch)
        |SELECT client_id, count(*) AS n_rows,
        |  CAST(sum(CASE WHEN active THEN 1 ELSE 0 END) AS BIGINT) AS n_active,
        |  CAST(sum(max_price) AS DOUBLE) AS sum_price,
        |  CAST(sum(CASE WHEN title = upper(title) THEN 1 ELSE 0 END) AS BIGINT) AS n_upper_titles
        |FROM allr GROUP BY client_id ORDER BY client_id""".stripMargin,
    "q_text_langid" ->
      s"""WITH w AS (SELECT doc_id, lang,
         |        list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> len(x) > 0) AS ws
         |      FROM documents),
         |sc AS (SELECT doc_id, lang,
         |        len(list_filter(ws, x -> x IN (${inList(TextAnalysis.enStop)}))) AS s_en,
         |        len(list_filter(ws, x -> x IN (${inList(TextAnalysis.esStop)}))) AS s_es,
         |        len(list_filter(ws, x -> x IN (${inList(TextAnalysis.frStop)}))) AS s_fr,
         |        len(list_filter(ws, x -> x IN (${inList(TextAnalysis.deStop)}))) AS s_de
         |      FROM w)
         |SELECT doc_id, lang,
         |  CASE WHEN greatest(s_en, s_es, s_fr, s_de) = 0 THEN 'und'
         |       WHEN s_de = greatest(s_en, s_es, s_fr, s_de) THEN 'de'
         |       WHEN s_fr = greatest(s_en, s_es, s_fr, s_de) THEN 'fr'
         |       WHEN s_es = greatest(s_en, s_es, s_fr, s_de) THEN 'es'
         |       ELSE 'en' END AS lang_pred
         |FROM sc ORDER BY doc_id""".stripMargin,
    "q_embed_filtered" ->
      """WITH q AS (SELECT embedding AS e FROM embeddings WHERE vec_id = 0),
        |scored AS (
        |  SELECT vec_id,
        |    round(list_dot_product(CAST(embedding AS DOUBLE[]), (SELECT CAST(e AS DOUBLE[]) FROM q)) /
        |      (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) *
        |       sqrt((SELECT list_dot_product(CAST(e AS DOUBLE[]), CAST(e AS DOUBLE[])) FROM q))), 4) AS cosine
        |  FROM embeddings WHERE label IN (3, 7) AND vec_id <> 0)
        |SELECT vec_id, cosine FROM scored ORDER BY cosine DESC, vec_id LIMIT 10""".stripMargin,
    "q_embed_quantized" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |sc AS (SELECT vec_id, v,
        |        greatest(list_max(list_transform(v, x -> abs(x))) / 127.0, 1e-30) AS s
        |      FROM e),
        |qc AS (SELECT vec_id,
        |        list_transform(v, x -> greatest(least(floor(x / s + 0.5), 127.0), -127.0)) AS qv
        |      FROM sc),
        |q0 AS (SELECT qv AS quv FROM qc WHERE vec_id = 0),
        |scored AS (SELECT vec_id,
        |    round(list_dot_product(qv, (SELECT quv FROM q0)) /
        |      (sqrt(list_dot_product(qv, qv)) *
        |       (SELECT sqrt(list_dot_product(quv, quv)) FROM q0)), 4) AS q_cosine
        |  FROM qc)
        |SELECT vec_id, q_cosine FROM scored ORDER BY q_cosine DESC, vec_id LIMIT 10""".stripMargin,
    "q_expectations" ->
      """WITH m AS (SELECT
        |    CAST(count(*) AS DOUBLE) AS n,
        |    CAST(count(DISTINCT doc_id) AS DOUBLE) / count(*) AS uq,
        |    CAST(sum(CASE WHEN doc_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS c_id,
        |    CAST(sum(CASE WHEN text IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS c_text,
        |    CAST(sum(CASE WHEN n_chars BETWEEN 1 AND 100000 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS rng,
        |    CAST(sum(CASE WHEN n_chars BETWEEN 1 AND 2000 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS rng2,
        |    CAST(sum(CASE WHEN lang IN ('en','de','es','fr','zh') THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS st,
        |    CAST(sum(CASE WHEN regexp_matches(source, '^src[0-9]+$') THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS pat,
        |    CAST(sum(CASE WHEN n_chars = length(text) THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS cons
        |  FROM documents)
        |-- verdicts on the UNROUNDED ratio (rounding must never flip a
        |-- minRatio=1.0 gate); only the reported metric is rounded
        |SELECT * FROM (
        |  SELECT 'row_count' AS constraint_name, '*' AS col_name, round(n, 6) AS metric, n >= 100 AS passed FROM m
        |  UNION ALL SELECT 'unique(doc_id)', 'doc_id', round(uq, 6), uq >= 1.0 FROM m
        |  UNION ALL SELECT 'complete(doc_id)', 'doc_id', round(c_id, 6), c_id >= 1.0 FROM m
        |  UNION ALL SELECT 'complete(text)', 'text', round(c_text, 6), c_text >= 1.0 FROM m
        |  UNION ALL SELECT 'in_range(n_chars,1,100000)', 'n_chars', round(rng, 6), rng >= 1.0 FROM m
        |  UNION ALL SELECT 'in_range(n_chars,1,2000)', 'n_chars', round(rng2, 6), rng2 >= 0.5 FROM m
        |  UNION ALL SELECT 'in_set(lang)', 'lang', round(st, 6), st >= 1.0 FROM m
        |  UNION ALL SELECT 'matches(source)', 'source', round(pat, 6), pat >= 1.0 FROM m
        |  UNION ALL SELECT 'consistent(n_chars)', 'n_chars', round(cons, 6), cons >= 1.0 FROM m
        |) ORDER BY constraint_name""".stripMargin,
    "q_chunk_overlap" ->
      """WITH w AS (SELECT doc_id,
        |        list_filter(string_split_regex(trim(text), '\s+'), x -> len(x) > 0) AS ws
        |      FROM documents),
        |s AS (SELECT doc_id, ws,
        |        unnest(range(0, greatest(len(ws), 1), 40)) AS start
        |      FROM w),
        |c AS (SELECT doc_id, CAST(start // 40 AS BIGINT) AS chunk_id,
        |        ws[start + 1 : start + 50] AS chunk
        |      FROM s)
        |SELECT doc_id, chunk_id, CAST(len(chunk) AS BIGINT) AS n_chunk_tokens,
        |       array_to_string(chunk, ' ') AS chunk_text
        |FROM c WHERE len(chunk) > 0
        |ORDER BY doc_id, chunk_id""".stripMargin,
    // Chunk retrieval: the q_chunk_overlap chunk CTEs feeding the
    // q_bm25 scoring CTEs, packed chunk ids unpacked at the end.
    "q_chunk_retrieval" ->
      """WITH w AS (SELECT doc_id,
        |        list_filter(string_split_regex(trim(text), '\s+'), x -> len(x) > 0) AS ws
        |      FROM documents),
        |st AS (SELECT doc_id, ws,
        |        unnest(range(0, greatest(len(ws), 1), 40)) AS start
        |      FROM w),
        |c AS (SELECT doc_id, CAST(start // 40 AS BIGINT) AS chunk_id,
        |        ws[start + 1 : start + 50] AS chunk
        |      FROM st),
        |ch AS (SELECT doc_id * 1000000 + chunk_id AS cid,
        |        array_to_string(chunk, ' ') AS text
        |      FROM c WHERE len(chunk) > 0),
        |base AS (SELECT cid,
        |    list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |                x -> len(x) > 0) AS ws FROM ch),
        |docs AS (SELECT cid, len(ws) AS dl,
        |    list_filter(ws, x -> x IN ('spark', 'merge', 'window')) AS hits
        |  FROM base),
        |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM docs),
        |tf AS (SELECT cid, dl, unnest(hits) AS word FROM docs),
        |tfc AS (SELECT cid, dl, word, count(*) AS tf FROM tf GROUP BY 1, 2, 3),
        |dfc AS (SELECT word, count(DISTINCT cid) AS df FROM tf GROUP BY 1),
        |contrib AS (SELECT cid,
        |    CAST(round(
        |      ln(1.0 + (s.n_docs - dfc.df + 0.5) / (dfc.df + 0.5)) *
        |        tfc.tf * 2.2 /
        |        (tfc.tf + 1.2 * (1.0 - 0.75 + 0.75 * tfc.dl / s.avgdl)),
        |      9) AS DECIMAL(28, 9)) AS cn
        |  FROM tfc JOIN dfc USING (word), stats s),
        |scored AS (SELECT cid,
        |    round(CAST(sum(cn) AS DOUBLE), 4) AS score
        |  FROM contrib GROUP BY cid),
        |ranked AS (SELECT cid, score,
        |    row_number() OVER (ORDER BY score DESC, cid) AS rank
        |  FROM scored)
        |SELECT cid // 1000000 AS doc_id, cid % 1000000 AS chunk_id, score, rank
        |FROM ranked WHERE rank <= 10 ORDER BY rank""".stripMargin,
    "q_embed_topk" ->
      """WITH q AS (SELECT embedding AS e FROM embeddings WHERE vec_id = 0),
        |scored AS (
        |  SELECT vec_id,
        |    round(list_dot_product(CAST(embedding AS DOUBLE[]), (SELECT CAST(e AS DOUBLE[]) FROM q)) /
        |      (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) *
        |       sqrt((SELECT list_dot_product(CAST(e AS DOUBLE[]), CAST(e AS DOUBLE[])) FROM q))), 4) AS cosine
        |  FROM embeddings)
        |SELECT vec_id, cosine FROM scored ORDER BY cosine DESC, vec_id LIMIT 10""".stripMargin,
    // k-center greedy: both oracles replay the full 6-round farthest-first
    // selection as unrolled CTEs (see kcenterCtes) — no artifact, no
    // engine state leaks into the check.
    "q_kcenter_select" -> kcenterSelectOracle(6),
    "q_kcenter_coverage" -> kcenterCoverageOracle(6),
    "q_kcenter_vs_random" -> kcenterVsRandomOracle(6),
    "q_maxcover_select" -> maxcoverOracle(5, 1024),
    "q_maxcover_budget" -> maxcoverBudgetOracle(60L, 6, 1024),
    "q_ann_batch" ->
      """WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv
        |      FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv
        |      FROM embeddings WHERE vec_id >= 10),
        |scored AS (SELECT q.q_id, c.vec_id,
        |    round(list_dot_product(cv, qv) /
        |      (sqrt(list_dot_product(cv, cv)) * sqrt(list_dot_product(qv, qv))), 4) AS cosine
        |  FROM c CROSS JOIN q),
        |ranked AS (SELECT *, row_number() OVER (PARTITION BY q_id
        |    ORDER BY cosine DESC, vec_id) AS rn FROM scored)
        |SELECT q_id, rn, vec_id, cosine FROM ranked WHERE rn <= 5
        |ORDER BY q_id, rn""".stripMargin,
    // Hard-negative mining: brute-force re-rank + label-disagreement
    // flag — the engine's broadcast panel + bounded top-k heap must
    // reproduce the literal window formulation row for row.
    "q_hard_negatives" ->
      """WITH q AS (SELECT vec_id AS q_id, label AS q_label,
        |      CAST(embedding AS DOUBLE[]) AS qv
        |    FROM embeddings WHERE vec_id < 8),
        |c AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS cv
        |    FROM embeddings WHERE vec_id >= 8),
        |scored AS (SELECT q_id, q_label, vec_id, label,
        |    round(list_dot_product(cv, qv) /
        |      (sqrt(list_dot_product(cv, cv)) * sqrt(list_dot_product(qv, qv))), 4)
        |      AS cosine
        |  FROM c CROSS JOIN q),
        |ranked AS (SELECT *, row_number() OVER (PARTITION BY q_id
        |    ORDER BY cosine DESC, vec_id) AS rn FROM scored)
        |SELECT q_id, rn, vec_id, cosine, label <> q_label AS is_hard_negative
        |FROM ranked WHERE rn <= 10 ORDER BY q_id, rn""".stripMargin,
    // Character entropy: q_langid_nb's canonical code-point window at
    // n=1, per-char counts, exact-DECIMAL weighted ln sum, fixed final
    // IEEE formula.
    "q_char_entropy" ->
      s"""WITH dcs AS (SELECT doc_id,
         |    substr(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'),
         |      1, ${TextAnalysis.langIdMaxChars}) AS cs
         |  FROM documents),
         |ch AS (SELECT doc_id, substr(cs, CAST(i AS INT), 1) AS ch
         |  FROM dcs, UNNEST(range(1, len(cs) + 1)) AS u(i)
         |  WHERE len(cs) >= 1),
         |cnt AS (SELECT doc_id, ch, count(*) AS c FROM ch GROUP BY 1, 2),
         |agg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
         |    CAST(count(*) AS BIGINT) AS n_distinct,
         |    sum(CAST(round(ln(c), 9) AS DECIMAL(20,9)) * c) AS s
         |  FROM cnt GROUP BY 1)
         |SELECT doc_id, n, n_distinct,
         |  round(ln(n) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 4) AS entropy_nats
         |FROM agg ORDER BY doc_id""".stripMargin,
    "q_text_stats" ->
      s"""SELECT doc_id,
         |  len(string_split_regex(trim(text), '\\s+')) AS n_words,
         |  round(CAST(length(regexp_replace(trim(text), '\\s+', '', 'g')) AS DOUBLE) /
         |    len(string_split_regex(trim(text), '\\s+')), 4) AS mean_word_len,
         |  round(CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE) / length(text), 4) AS punct_ratio,
         |  round(CAST(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
         |    w -> w IN ($stopSql))) AS DOUBLE) /
         |    len(string_split_regex(trim(text), '\\s+')), 4) AS stopword_ratio
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q_text_quality" ->
      s"""SELECT doc_id,
         |  round(CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE) /
         |    greatest(CAST(length(text) AS DOUBLE), 1.0), 4) AS digit_ratio,
         |  round(CAST(
         |    0.4 * (CASE WHEN length(text) BETWEEN 20 AND 100000 THEN 1.0 ELSE 0.0 END)
         |  + 0.3 * (CASE WHEN CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE)
         |               / greatest(CAST(length(text) AS DOUBLE), 1.0) < 0.2 THEN 1.0 ELSE 0.0 END)
         |  + 0.3 * (CASE WHEN CAST(len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
         |                 w -> len(w) > 0 AND w IN ($stopSql))) AS DOUBLE)
         |               / greatest(CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
         |                 w -> len(w) > 0)) AS DOUBLE), 1.0) > 0.01 THEN 1.0 ELSE 0.0 END)
         |  AS DOUBLE), 2) AS quality_score
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q_text_repetition" ->
      """WITH w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws
        |           FROM documents),
        |g AS (SELECT doc_id,
        |        unnest([ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))]) AS gram
        |      FROM w),
        |c AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY doc_id, gram),
        |p AS (SELECT doc_id AS p_id, max(c) AS maxc, CAST(sum(c) AS BIGINT) AS sumc,
        |             count(*) AS nd
        |      FROM c GROUP BY doc_id)
        |SELECT w.doc_id,
        |  CAST(greatest(len(ws) - 1, 0) AS BIGINT) AS total_bigrams,
        |  round(coalesce((sumc - nd) * 1.0 / sumc, 0.0), 4) AS dup_bigram_ratio,
        |  round(coalesce(maxc * 1.0 / sumc, 0.0), 4) AS top_bigram_share
        |FROM w LEFT JOIN p ON p.p_id = w.doc_id
        |ORDER BY doc_id""".stripMargin,
    "q_token_count" ->
      """SELECT doc_id,
        |  len(list_filter(string_split_regex(trim(text), '\s+'), x -> len(x) > 0)) AS ws_tokens,
        |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS bpeish_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    // Sentence segmentation: identical split pattern (Java/RE2 common
    // subset), trim, empty-drop, 1-based ids, md5 fingerprints.
    "q_sentences" ->
      """WITH base AS (SELECT doc_id, text FROM documents
        |  UNION ALL SELECT CAST(900001 AS BIGINT),
        |    'First planted. Second one!? Third has  no terminator'
        |  UNION ALL SELECT CAST(900002 AS BIGINT), 'Solo ends clean! '),
        |s AS (SELECT doc_id, list_filter(
        |    list_transform(string_split_regex(text, '[.!?]+\s+'),
        |      x -> trim(x)), x -> len(x) > 0) AS sents FROM base)
        |SELECT doc_id, t.i AS sent_id,
        |  CAST(len(list_filter(string_split_regex(trim(sents[t.i]), '\s+'),
        |    x -> len(x) > 0)) AS BIGINT) AS n_words,
        |  md5(sents[t.i]) AS fingerprint
        |FROM s, unnest(range(1, len(sents) + 1)) AS t(i)
        |ORDER BY doc_id, sent_id""".stripMargin,
    // Content-defined chunking: full first-principles replay — word
    // values, the (7,11,13,17) boundary mix, prefix-count chunk ids,
    // local-position fingerprints.
  )
}
