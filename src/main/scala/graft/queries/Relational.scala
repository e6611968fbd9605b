package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{Q, Tables}

/** Relational surface over the TPC-H-ish testdata (SURVEY.md §2.4 J6, §2.5,
  * §2.6, §2.7 E7, §2.8 D1): FK joins with broadcast dimensions, hash
  * aggregation, rollup, window functions, set ops, anti joins, sessionize.
  *
  * Scale notes (100 TB design):
  *  - every dimension (region/nation/customer-at-small-SF, supplier, part)
  *    joins via `broadcast()` — no shuffle of the fact table for dims;
  *  - fact-fact joins (orders⋈lineitem) shuffle on the join key once and
  *    reuse it for the groupBy where keys align;
  *  - all filters sit directly on the scan so Catalyst pushes them into
  *    the parquet reader (verified via explain: PushedFilters).
  */
object Relational {
  private def ts(s: String) = lit(java.sql.Timestamp.valueOf(s + " 00:00:00"))

  /** Q1-style pricing summary: filter → partial/final hash agg → sort
    * (A1/A2/A5 analogues at TPC shape). */
  val q01 = Q("q01_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_base_price,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      |  round(avg(l_quantity), 4) AS avg_qty,
      |  round(avg(l_discount), 4) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= ts("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Q3-style top unshipped orders: 3-way join, revenue top-10. */
  val q02 = Q("q02_top_orders",
    """SELECT o_orderkey,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      |  strftime(o_orderdate, '%Y-%m-%d') AS orderdate
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |  JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
      |GROUP BY o_orderkey, o_orderdate
      |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin) { (s, dir) =>
    val cust = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
    val ord  = Tables.orders(s, dir).filter(col("o_orderdate") < ts("1998-03-15"))
    val li   = Tables.lineitem(s, dir).filter(col("l_shipdate") > ts("1998-03-15"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .select(col("o_orderkey"), col("revenue"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  /** Q5-style local-supplier revenue: 6-table star join, broadcast dims. */
  val q03 = Q("q03_region_revenue",
    """SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin) { (s, dir) =>
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= ts("1996-01-01") && col("o_orderdate") < ts("1998-01-01"))
    val asiaNations = Tables.nation(s, dir)
      .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
    Tables.lineitem(s, dir)
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(s, dir)),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(asiaNations), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** ROLLUP over (mktsegment, nation) — grouping-sets surface (§2.5 ext). */
  val q04 = Q("q04_rollup_revenue",
    """SELECT coalesce(c_mktsegment, 'ALL') AS seg, coalesce(n_name, 'ALL') AS nat,
      |  round(sum(o_totalprice), 2) AS rev, count(*) AS n
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY ROLLUP(c_mktsegment, n_name)
      |ORDER BY seg, nat""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .rollup(col("c_mktsegment"), col("n_name"))
      .agg(round(sum("o_totalprice"), 2).as("rev"), count(lit(1)).as("n"))
      .select(coalesce(col("c_mktsegment"), lit("ALL")).as("seg"),
        coalesce(col("n_name"), lit("ALL")).as("nat"), col("rev"), col("n"))
      .orderBy(col("seg"), col("nat"))
  }

  /** Window top-k: 3 priciest parts per brand (O2/O5 via row_number). */
  val q05 = Q("q05_window_topk",
    """SELECT p_brand, rn, p_partkey, round(p_retailprice, 2) AS price
      |FROM (SELECT p_brand, p_partkey, p_retailprice,
      |        row_number() OVER (PARTITION BY p_brand
      |          ORDER BY p_retailprice DESC, p_partkey) AS rn
      |      FROM part)
      |WHERE rn <= 3
      |ORDER BY p_brand, rn""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
    Tables.part(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("p_brand"), col("rn"), col("p_partkey"),
        round(col("p_retailprice"), 2).as("price"))
      .orderBy(col("p_brand"), col("rn"))
  }

  /** E7 INTERSECT: nations having both customers and suppliers. */
  val q06 = Q("q06_set_intersect",
    """SELECT n_name FROM nation
      |WHERE n_nationkey IN (
      |  SELECT c_nationkey FROM customer
      |  INTERSECT
      |  SELECT s_nationkey FROM supplier)
      |ORDER BY n_name""".stripMargin) { (s, dir) =>
    val keys = Tables.customer(s, dir).select(col("c_nationkey").as("k"))
      .intersect(Tables.supplier(s, dir).select(col("s_nationkey").as("k")))
    Tables.nation(s, dir).join(broadcast(keys), col("n_nationkey") === col("k"))
      .select(col("n_name")).orderBy(col("n_name"))
  }

  /** E7 EXCEPT: nations with customers but no suppliers. */
  val q07 = Q("q07_set_except",
    """SELECT n_name FROM nation
      |WHERE n_nationkey IN (
      |  SELECT c_nationkey FROM customer
      |  EXCEPT
      |  SELECT s_nationkey FROM supplier)
      |ORDER BY n_name""".stripMargin) { (s, dir) =>
    val keys = Tables.customer(s, dir).select(col("c_nationkey").as("k"))
      .except(Tables.supplier(s, dir).select(col("s_nationkey").as("k")))
    Tables.nation(s, dir).join(broadcast(keys), col("n_nationkey") === col("k"))
      .select(col("n_name")).orderBy(col("n_name"))
  }

  /** D1: hourly tumbling aggregation over the events stream table —
    * the batch shape of the Structured Streaming pipeline in
    * graft.streaming (same plan, readStream-able). */
  val q08 = Q("q08_events_hourly",
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
      |  event_type, count(*) AS n, round(sum(value), 2) AS sum_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .orderBy(col("hour"), col("event_type"))
  }

  /** Sessionization (gap > 30 min) via lag + running sum — the batch
    * analogue of flatMapGroupsWithState sessionization (§2.10). */
  val q09 = Q("q09_sessionize",
    """WITH x AS (
      |  SELECT user_id, ts, event_id,
      |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts
      |  FROM events),
      |b AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN pts IS NULL OR epoch_us(ts) - epoch_us(pts) > 1800000000
      |         THEN 1 ELSE 0 END AS brk
      |  FROM x),
      |sess AS (
      |  SELECT user_id, ts,
      |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS UNBOUNDED PRECEDING) AS session_id
      |  FROM b),
      |per AS (
      |  SELECT user_id, session_id,
      |    (epoch_us(max(ts)) - epoch_us(min(ts))) / 1000000 AS dur_s,
      |    count(*) AS n_ev
      |  FROM sess GROUP BY user_id, session_id)
      |SELECT user_id, count(*) AS n_sessions, CAST(sum(n_ev) AS BIGINT) AS n_events,
      |  round(avg(dur_s), 2) AS avg_session_s
      |FROM per GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("pts", lag(col("ts"), 1).over(byUser))
      .withColumn("brk",
        when(col("pts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("pts")) > 1800000000L, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("brk")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(((unix_micros(max(col("ts"))) - unix_micros(min(col("ts")))) / 1000000L).as("dur_s"),
        count(lit(1)).as("n_ev"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"), sum("n_ev").as("n_events"),
        round(avg("dur_s"), 2).as("avg_session_s"))
      .orderBy(col("user_id"))
  }

  /** J5 last-write-wins upsert: base rows + prioritized updates, keep the
    * highest-priority version per key (`merge_all_to_metadata.py:142-151`
    * pattern as window dedup — distributed, no dict). */
  val q10 = Q("q10_upsert_lastwin",
    """WITH src AS (
      |  SELECT o_orderkey, o_orderstatus, o_totalprice, 1 AS priority FROM orders
      |  UNION ALL
      |  SELECT o_orderkey, 'X' AS o_orderstatus, o_totalprice * 1.1, 2 AS priority
      |  FROM orders WHERE o_orderkey % 3 = 0),
      |keep AS (
      |  SELECT *, row_number() OVER (PARTITION BY o_orderkey
      |    ORDER BY priority DESC) AS rn FROM src)
      |SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total
      |FROM keep WHERE rn = 1
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
    val ord = Tables.orders(s, dir)
    val base = ord.select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
      lit(1).as("priority"))
    val upd = ord.filter(col("o_orderkey") % 3 === 0)
      .select(col("o_orderkey"), lit("X").as("o_orderstatus"),
        (col("o_totalprice") * 1.1).as("o_totalprice"), lit(2).as("priority"))
    val w = Window.partitionBy(col("o_orderkey")).orderBy(col("priority").desc)
    base.unionByName(upd)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
      .orderBy(col("o_orderstatus"))
  }

  /** F2/A6: anti-join error counting — customers with no orders, per
    * nation (`run.py:83-91` missing-key skip + error total). */
  val q11 = Q("q11_anti_join",
    """SELECT n_name, count(*) AS n_customers_no_orders
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
      |GROUP BY n_name ORDER BY n_name""".stripMargin) { (s, dir) =>
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_customers_no_orders"))
      .orderBy(col("n_name"))
  }

  /** A3 coverage report: conditional-sum field coverage per language
    * (`merge_all_to_metadata.py:111-129` Counter → one hash agg). */
  val q12 = Q("q12_coverage",
    """SELECT lang, count(*) AS n_docs,
      |  CAST(sum(CASE WHEN NOT contains(text, 'spark') THEN 1 ELSE 0 END) AS BIGINT) AS missing_spark,
      |  CAST(sum(CASE WHEN NOT contains(text, 'the') THEN 1 ELSE 0 END) AS BIGINT) AS missing_the,
      |  round(avg(n_chars), 2) AS avg_chars
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
    Tables.documents(s, dir)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(!contains(col("text"), lit("spark")), 1L).otherwise(0L)).as("missing_spark"),
        sum(when(!contains(col("text"), lit("the")), 1L).otherwise(0L)).as("missing_the"),
        round(avg("n_chars"), 2).as("avg_chars"))
      .orderBy(col("lang"))
  }

  /** A4: exact distinct counts per group (DuckDB-checkable; the
    * approximate-sketch variant is q66's KMV estimator). */
  val q13 = Q("q13_distinct_count",
    """SELECT l_returnflag,
      |  count(DISTINCT l_partkey) AS n_parts,
      |  count(DISTINCT l_suppkey) AS n_supps,
      |  count(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))
  }

  /** q08's plan as a real Structured Streaming query: readStream parquet →
    * tumbling window agg → memory sink, drained with Trigger.AvailableNow.
    * Checked against the SAME oracle as q08 — stream/batch agreement. */
  val q55 = Q("q55_stream_hourly",
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
      |  event_type, count(*) AS n, round(sum(value), 2) AS sum_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    graft.streaming.EventStream.hourlyAvailableNow(s, dir)
  }

  /** Append mode + watermark eviction — the production shape of q55 at
    * 100 TB, where Complete mode's unbounded re-emission is impossible.
    * [[graft.streaming.EventStream.hourlyLateDrain]] stages a planted late
    * cohort into a second micro-batch so the drain exercises BOTH
    * watermark effects: late-row drop and window finalization. The oracle
    * is the closed form of those semantics: the hourly agg over the
    * on-time rows, restricted to windows the final watermark passed. */
  val q140 = Q("q140_stream_late",
    """WITH m AS (SELECT max(ts) AS mx FROM events),
      |ontime AS (
      |  SELECT e.* FROM events e, m
      |  WHERE NOT (e.user_id % 50 = 0 AND e.ts <= m.mx - INTERVAL 2 HOUR))
      |SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
      |  event_type, count(*) AS n, round(sum(value), 2) AS sum_value
      |FROM ontime, m
      |WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR <= m.mx - INTERVAL 10 MINUTE
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    graft.streaming.EventStream.hourlyLateDrain(s, dir)
  }

  /** Streaming exact dedup: watermarked dropDuplicatesWithinWatermark over
    * the events stream — one bounded state entry per live key, the
    * streaming shape of the q40 exact-dedup operator. Deterministic
    * because only the KEYS are emitted (which row survives is racy; its
    * key is not), so the oracle is the batch DISTINCT. */
  val q75 = Q("q75_stream_dedup",
    """SELECT DISTINCT user_id, event_type FROM events
      |ORDER BY user_id, event_type""".stripMargin) { (s, dir) =>
    graft.streaming.EventStream.dedupKeysAvailableNow(s, dir, Seq("user_id", "event_type"))
  }

  /** Native session windows: Spark's `session_window` (gap-merged event
    * windows, window end = last event + gap) instead of q09's manual
    * lag/running-sum spelling — the same operator works unchanged in a
    * streaming aggregation (watermark + session_window is the streaming
    * sessionization shape, complementing the fMGWS custom-state variant
    * in [[graft.streaming.EventStream.sessionCounts]]). The oracle spells
    * the merge as the standard gaps-and-islands SQL. */
  val q81 = Q("q81_session_window",
    """WITH x AS (
      |  SELECT user_id, ts, event_id,
      |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts
      |  FROM events),
      |b AS (
      |  SELECT user_id, ts,
      |    CASE WHEN pts IS NULL OR epoch_us(ts) - epoch_us(pts) > 1800000000
      |         THEN 1 ELSE 0 END AS brk
      |  FROM x),
      |sess AS (
      |  SELECT user_id, ts,
      |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts
      |      ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM b)
      |SELECT user_id,
      |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
      |  strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
      |  count(*) AS n_events
      |FROM sess GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(col("w.end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        col("n_events"))
      .orderBy(col("user_id"), col("session_start"))
  }

  /** Skew-proof aggregation via salting: event_type has only 5 hot keys, so
    * a direct groupBy funnels 100k+ rows/key through 5 reducers at scale.
    * Phase 1 pre-aggregates on (key, salt=event_id%16) — 80 evenly-loaded
    * groups — phase 2 folds the 16 partials per key. Same result as the
    * plain GROUP BY the oracle runs. */
  val q62 = Q("q62_salted_agg",
    """SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_value
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy(col("event_type"), (col("event_id") % 16).as("salt"))
      .agg(count(lit(1)).as("pn"), sum("value").as("ps"))
      .groupBy(col("event_type"))
      .agg(sum("pn").as("n"), round(sum("ps"), 2).as("sum_value"))
      .orderBy(col("event_type"))
  }

  /** As-of join (operator Spark lacks natively — composed per the brief's
    * preference order (a): union + last-ignore-nulls window, ONE shuffle on
    * user_id): for every click, the most recent purchase value at-or-before
    * it for the same user. Refs sort before needles at equal ts. The oracle
    * spells the identical window logic (portable ties, unlike engine ASOF
    * keywords). */
  val q63 = Q("q63_asof_join",
    """WITH tagged AS (
      |  SELECT user_id, event_id, ts, value,
      |    (event_type = 'purchase') AS is_ref, (event_type = 'click') AS is_needle
      |  FROM events WHERE event_type IN ('purchase', 'click')),
      |w AS (
      |  SELECT *, last_value(CASE WHEN is_ref THEN value END IGNORE NULLS)
      |    OVER (PARTITION BY user_id
      |          ORDER BY ts, is_ref DESC, event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_value
      |  FROM tagged)
      |SELECT user_id, event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
      |  round(asof_value, 2) AS last_purchase_value
      |FROM w WHERE is_needle ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
    val tagged = Tables.events(s, dir)
      .filter(col("event_type").isin("purchase", "click"))
      .select(col("user_id"), col("event_id"), col("ts"), col("value"),
        (col("event_type") === "purchase").as("is_ref"),
        (col("event_type") === "click").as("is_needle"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("is_ref").desc, col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("asof_value",
        last(when(col("is_ref"), col("value")), ignoreNulls = true).over(w))
      .filter(col("is_needle"))
      .select(col("user_id"), col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"),
        round(col("asof_value"), 2).as("last_purchase_value"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** q05's rank-limit through the CUSTOM whole-operator path
    * ([[graft.plans.TopKPerGroup]]: LogicalPlan + Strategy + heap-based
    * SparkPlan, O(n log k) instead of the window sort) — checked against
    * the same window-spelled oracle. */
  val q64 = Q("q64_topk_custom_operator",
    """SELECT p_brand, p_partkey, round(p_retailprice, 2) AS price
      |FROM (SELECT p_brand, p_partkey, p_retailprice,
      |        row_number() OVER (PARTITION BY p_brand
      |          ORDER BY p_retailprice DESC, p_partkey) AS rn
      |      FROM part)
      |WHERE rn <= 3
      |ORDER BY p_brand, p_retailprice DESC, p_partkey""".stripMargin) { (s, dir) =>
    graft.plans.TopK.perGroup(
        Tables.part(s, dir).select(col("p_brand"), col("p_partkey"), col("p_retailprice")),
        Seq("p_brand"), Seq(("p_retailprice", false), ("p_partkey", true)), 3)
      .orderBy(col("p_brand"), col("p_retailprice").desc, col("p_partkey"))
      .select(col("p_brand"), col("p_partkey"), round(col("p_retailprice"), 2).as("price"))
  }

  /** CUBE grouping sets (§2.5 extension alongside q04's ROLLUP). */
  val q65 = Q("q65_cube_qty",
    """SELECT coalesce(l_returnflag, 'ALL') AS flag,
      |  coalesce(l_linestatus, 'ALL') AS status,
      |  count(*) AS n, round(sum(l_quantity), 2) AS qty
      |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
      |ORDER BY flag, status""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("qty"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("status"), col("n"), col("qty"))
      .orderBy(col("flag"), col("status"))
  }

  /** Approximate-distinct sketch surface, ORACLE-PORTABLE spelling: a KMV
    * (k-minimum-values) estimator over [[graft.ops.Hashing.hash31]] instead
    * of approx_count_distinct — Spark's HLL++ and DuckDB's HLL sketches can
    * never hash-match across engines, but KMV over the shared portable hash
    * is bit-identical: both engines keep the k smallest distinct hash
    * values and estimate D ≈ (k-1)·P31 div kth_min (integer division, so
    * no float drift). distinct < k falls back to the exact stored count —
    * the standard KMV small-cardinality exact regime.
    *
    * Scale shape: the sketch is one narrow distinct on (group, hash) —
    * partial-aggregated map-side — then the k-smallest per group go
    * through the two-phase [[graft.plans.TopKPerGroup]] heap operator
    * (≤ k·groups rows past the exchange), NOT a per-group sort. The exact
    * count_distinct column rides along for the error comparison. */
  val q66 = {
    val K = 64
    val P = graft.ops.Hashing.P31
    Q("q66_approx_distinct",
      s"""WITH h AS (SELECT DISTINCT l_returnflag,
        |    ${graft.ops.Hashing.hash31Sql("CAST(l_partkey AS VARCHAR)")} AS h
        |  FROM lineitem),
        |r AS (SELECT l_returnflag, h,
        |    row_number() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn FROM h),
        |s AS (SELECT l_returnflag, count(*) AS n_h, max(h) AS kth
        |      FROM r WHERE rn <= $K GROUP BY l_returnflag),
        |e AS (SELECT l_returnflag,
        |        CASE WHEN n_h < $K THEN n_h
        |             ELSE (${K - 1}::BIGINT * ${P}::BIGINT) // kth END AS kmv_parts
        |      FROM s),
        |x AS (SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts
        |      FROM lineitem GROUP BY l_returnflag)
        |SELECT e.l_returnflag, CAST(kmv_parts AS BIGINT) AS kmv_parts, exact_parts
        |FROM e JOIN x USING (l_returnflag)
        |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      val dh = Tables.lineitem(s, dir)
        .select(col("l_returnflag"),
          graft.ops.Hashing.hash31(col("l_partkey").cast("string")).as("h"))
        .distinct()
      val sketch = graft.plans.TopK
        .perGroup(dh, Seq("l_returnflag"), Seq(("h", true)), K)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_h"), max(col("h")).as("kth"))
        .select(col("l_returnflag"),
          when(col("n_h") < K, col("n_h"))
            .otherwise(expr(s"(${K - 1}L * ${P}L) div kth")).cast("long")
            .as("kmv_parts"))
      val exact = Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("exact_parts"))
      sketch.join(exact, Seq("l_returnflag"))
        .orderBy(col("l_returnflag"))
    }
  }

  /** Range join (operator Spark plans as a nested-loop theta join): event
    * pairs per user within a 5-minute window, spelled scalably as a BINNED
    * equi-join — left side exploded to its two candidate 5-minute bins, so
    * the join key is (user, bin) and the exact range predicate filters
    * only in-bin candidates. One shuffle, no cartesian. The oracle runs
    * the naive inequality join — same result. */
  val q67 = Q("q67_range_join",
    """SELECT a.user_id, count(*) AS n_pairs,
      |  round(avg(epoch_us(b.ts) - epoch_us(a.ts)), 2) AS avg_gap_us
      |FROM events a JOIN events b
      |  ON a.user_id = b.user_id
      |  AND epoch_us(b.ts) - epoch_us(a.ts) BETWEEN 0 AND 300000000
      |  AND (a.ts < b.ts OR (a.ts = b.ts AND a.event_id < b.event_id))
      |GROUP BY a.user_id ORDER BY a.user_id""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
    val binSize = 300000000L
    val a = ev.select(col("user_id"), col("event_id").as("a_id"), col("us").as("a_us"),
      explode(array((col("us") / binSize).cast("long"),
        (col("us") / binSize).cast("long") + 1)).as("bin"))
    val b = ev.select(col("user_id"), col("event_id").as("b_id"), col("us").as("b_us"),
      (col("us") / binSize).cast("long").as("bin"))
    a.join(b, Seq("user_id", "bin"))
      .filter(col("b_us") - col("a_us") >= 0 && col("b_us") - col("a_us") <= binSize &&
        (col("a_us") < col("b_us") ||
          (col("a_us") === col("b_us") && col("a_id") < col("b_id"))))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_pairs"),
        round(avg(col("b_us") - col("a_us")), 2).as("avg_gap_us"))
      .orderBy(col("user_id"))
  }

  /** SQL-text API surface: the same engine through `spark.sql(...)` over
    * temp views, with a correlated EXISTS Catalyst decorrelates into a
    * left-semi join (SURVEY §4: subquery decorrelation exercised here). */
  val q68 = Q("q68_sql_exists",
    """SELECT o_orderpriority, count(*) AS n
      |FROM orders o
      |WHERE EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_orderkey = o.o_orderkey
      |                AND l.l_shipdate > o.o_orderdate)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
    // Registry fns must be side-effect-free (VERDICT r3 "What's wrong" #4):
    // unique per-call view names, dropped right after `spark.sql` — whose
    // analysis is EAGER, so the returned plan no longer needs the views.
    val tag = java.util.UUID.randomUUID().toString.replace("-", "")
    val ov = s"graft_q68_orders_$tag"
    val lv = s"graft_q68_lineitem_$tag"
    Tables.orders(s, dir).createOrReplaceTempView(ov)
    Tables.lineitem(s, dir).createOrReplaceTempView(lv)
    try s.sql(s"""SELECT o_orderpriority, count(*) AS n
                 |FROM $ov o
                 |WHERE EXISTS (SELECT 1 FROM $lv l
                 |              WHERE l.l_orderkey = o.o_orderkey
                 |                AND l.l_shipdate > o.o_orderdate)
                 |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
    finally { s.catalog.dropTempView(ov); s.catalog.dropTempView(lv) }
  }

  /** Sliding event-time windows (1h window, 30min slide — each event lands
    * in exactly two windows). Spark's `window()` is epoch-aligned, so the
    * oracle unnests the two candidate starts floor30(ts) and
    * floor30(ts)−30min. Same plan readStream-able (streaming slide). */
  val q69 = Q("q69_sliding_window",
    """WITH x AS (SELECT ts, event_type, value,
      |    to_timestamp(CAST(floor(epoch(ts) / 1800) * 1800 AS BIGINT)) AS f
      |  FROM events),
      |w AS (SELECT event_type, value,
      |    unnest([f, f - INTERVAL 30 MINUTE]) AS win_start
      |  FROM x)
      |SELECT strftime(win_start, '%Y-%m-%d %H:%M:%S') AS win,
      |  event_type, count(*) AS n, round(sum(value), 2) AS sum_value
      |FROM w GROUP BY win_start, event_type
      |ORDER BY win, event_type""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("win"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy(col("win"), col("event_type"))
  }

  /** E7 multiset variants: INTERSECT ALL / EXCEPT ALL over the suppkey
    * multiset of two lineitem slices, then counted per key. */
  val q70 = Q("q70_set_ops_all",
    """WITH a AS (SELECT l_suppkey % 100 AS k FROM lineitem WHERE l_returnflag = 'A'),
      |b AS (SELECT l_suppkey % 100 AS k FROM lineitem WHERE l_returnflag = 'R'),
      |i AS (SELECT 'intersect' AS op, k FROM (SELECT k FROM a INTERSECT ALL SELECT k FROM b)),
      |e AS (SELECT 'except' AS op, k FROM (SELECT k FROM a EXCEPT ALL SELECT k FROM b))
      |SELECT op, k, count(*) AS n
      |FROM (SELECT * FROM i UNION ALL SELECT * FROM e)
      |GROUP BY op, k ORDER BY op, k""".stripMargin) { (s, dir) =>
    val li = Tables.lineitem(s, dir)
    val a = li.filter(col("l_returnflag") === "A").select((col("l_suppkey") % 100).as("k"))
    val b = li.filter(col("l_returnflag") === "R").select((col("l_suppkey") % 100).as("k"))
    a.intersectAll(b).select(lit("intersect").as("op"), col("k"))
      .unionByName(a.exceptAll(b).select(lit("except").as("op"), col("k")))
      .groupBy(col("op"), col("k"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("op"), col("k"))
  }

  /** Exact interpolated quantiles + an explicitly-spelled sample stddev
    * (the same arithmetic expression on both engines — engine-native
    * stddev implementations differ in low bits). */
  val q71 = Q("q71_quantiles",
    """SELECT l_returnflag,
      |  round(percentile_cont(0.5) WITHIN GROUP (ORDER BY l_extendedprice), 4) AS median_price,
      |  round(percentile_cont(0.9) WITHIN GROUP (ORDER BY l_extendedprice), 4) AS p90_price,
      |  round(sqrt((sum(l_extendedprice * l_extendedprice)
      |    - sum(l_extendedprice) * sum(l_extendedprice) / count(*)) / (count(*) - 1)), 4)
      |    AS stddev_price
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        round(expr("percentile(l_extendedprice, 0.5)"), 4).as("median_price"),
        round(expr("percentile(l_extendedprice, 0.9)"), 4).as("p90_price"),
        round(sqrt((sum(col("l_extendedprice") * col("l_extendedprice"))
          - sum(col("l_extendedprice")) * sum(col("l_extendedprice")) / count(lit(1)))
          / (count(lit(1)) - 1)), 4).as("stddev_price"))
      .orderBy(col("l_returnflag"))
  }

  /** SCD2 dimension history ([[graft.ops.Scd2.intervalize]]): the events
    * stream as per-user state changes — consecutive same-type events
    * collapse into one validity interval, `valid_to` = next change
    * (exclusive), NULL marks the current state. Complements q10 (LWW keeps
    * latest) and q63 (as-of joins CONSUME exactly these intervals). One
    * shuffle: both windows share the user_id partitioning. */
  val q99 = Q("q99_scd2_intervals",
    """WITH x AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pstate
      |  FROM events),
      |s AS (
      |  SELECT user_id, event_type, event_id, ts AS valid_from FROM x
      |  WHERE event_type IS DISTINCT FROM pstate),
      |iv AS (
      |  SELECT user_id, event_type, event_id, valid_from,
      |    lead(valid_from) OVER (PARTITION BY user_id
      |      ORDER BY valid_from, event_id) AS valid_to
      |  FROM s)
      |SELECT user_id, event_type, event_id, valid_from, valid_to,
      |  (valid_to IS NULL) AS is_current
      |FROM iv ORDER BY user_id, valid_from, event_id""".stripMargin) { (s, dir) =>
    graft.ops.Scd2.intervalize(Tables.events(s, dir),
        keyCols = Seq("user_id"), ordCol = "ts", tieCol = "event_id",
        stateCols = Seq("event_type"))
      .select(col("user_id"), col("event_type"), col("event_id"),
        col("valid_from"), col("valid_to"), col("is_current"))
      .orderBy(col("user_id"), col("valid_from"), col("event_id"))
  }

  /** CDC changelog compaction with DELETE tombstones
    * ([[graft.ops.Cdc.compact]]): `events` read as a change log keyed by
    * (user, page k), ordered by (ts, event_id), where an `error` event
    * tombstones the key — the warehouse-mirror ingest shape q10's
    * last-write-wins upsert cannot express. The Spark side is ONE
    * map-side-combinable `max(struct)` aggregation (no window sort); the
    * oracle spells the same latest-wins semantics as a rank window. */
  val q131 = Q("q131_cdc_compact",
    """WITH log AS (
      |  SELECT user_id,
      |    CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT) AS k,
      |    ts, event_id, event_type = 'error' AS del, value
      |  FROM events),
      |keep AS (
      |  SELECT *, row_number() OVER (PARTITION BY user_id, k
      |    ORDER BY ts DESC, event_id DESC) AS rn FROM log)
      |SELECT user_id, k, epoch_us(ts) AS last_ts_us,
      |  round(value, 2) AS last_value
      |FROM keep WHERE rn = 1 AND NOT del
      |ORDER BY user_id, k""".stripMargin) { (s, dir) =>
    val log = Tables.events(s, dir).withColumn("k",
      regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1).cast("long"))
    graft.ops.Cdc.compact(log, Seq("user_id", "k"),
        Seq(col("ts"), col("event_id")),
        col("event_type") === "error", Seq("value" -> col("value")))
      .select(col("user_id"), col("k"),
        unix_micros(col("seq0")).as("last_ts_us"),
        round(col("value"), 2).as("last_value"))
      .orderBy(col("user_id"), col("k"))
  }

  /** Watermarked stream-stream inner join, drained end-to-end: each click
    * joined to the same user's purchases within the following 10 minutes
    * ([[graft.streaming.EventStream.clickPurchaseJoin]] — both sides carry
    * a 1-hour watermark, so join state is dropped as event time advances;
    * bounded state at any input rate). Inner-join matches emit eagerly, so
    * an AvailableNow drain of a finite input produces exactly the batch
    * join — which is the oracle. StreamingSpec asserts the batch/stream
    * agreement on fixtures; this row makes the drained operator
    * oracle-verified on the driver testdata too (previously spec-only). */
  val q141 = Q("q141_stream_join",
    """SELECT c.user_id AS user_id, c.event_id AS click_id,
      |  p.event_id AS purchase_id,
      |  strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts_s,
      |  strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts_s
      |FROM events c JOIN events p
      |  ON p.user_id = c.user_id
      | AND c.event_type = 'click' AND p.event_type = 'purchase'
      | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 10 MINUTE
      |ORDER BY user_id, click_id, purchase_id""".stripMargin) { (s, dir) =>
    graft.streaming.EventStream.clickPurchaseJoinAvailableNow(s, dir)
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        date_format(col("click_ts"), "yyyy-MM-dd HH:mm:ss").as("click_ts_s"),
        date_format(col("purchase_ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts_s"))
      .orderBy(col("user_id"), col("click_id"), col("purchase_id"))
  }

  /** Watermarked stream-stream LEFT OUTER join, drained end-to-end — the
    * hardest streaming-join semantics: an unmatched click's NULL row is
    * only emitted when the watermark PROVES no in-window purchase can
    * still arrive (state eviction, one batch behind the watermark
    * advance). [[graft.streaming.EventStream.clickPurchaseLeftJoinDrain]]
    * stages sentinel + bridge micro-batches so every real click's fate
    * is decided inside the drain, making the result exactly the batch
    * left join — the oracle. NULLS FIRST matches Spark's ascending
    * default for the nullable purchase columns. */
  val q150 = Q("q150_stream_left_join",
    """SELECT c.user_id AS user_id, c.event_id AS click_id,
      |  p.event_id AS purchase_id,
      |  strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts_s,
      |  strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts_s
      |FROM (SELECT * FROM events WHERE event_type = 'click') c
      |LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      |  ON p.user_id = c.user_id
      | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 10 MINUTE
      |ORDER BY user_id, click_id, purchase_id NULLS FIRST""".stripMargin) { (s, dir) =>
    graft.streaming.EventStream.clickPurchaseLeftJoinDrain(s, dir)
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        date_format(col("click_ts"), "yyyy-MM-dd HH:mm:ss").as("click_ts_s"),
        date_format(col("purchase_ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts_s"))
      .orderBy(col("user_id"), col("click_id"), col("purchase_id"))
  }

  /** Stateful streaming sessionization, drained end-to-end: the
    * `flatMapGroupsWithState` session counter
    * ([[graft.streaming.EventStream.sessionCounts]] — one small state
    * record per active user, >30-minute gaps split sessions) run with
    * AvailableNow into an Update-mode sink, final per-user state
    * extracted as the per-user max (both totals are monotone across
    * micro-batches). Oracle = the q09 batch gaps-and-islands
    * sessionization reduced to the same (user, sessions, events) shape —
    * stream/batch agreement as a driver-checked row, not just the
    * StreamingSpec fixture assertion. */
  val q145 = Q("q145_stream_sessions",
    """WITH x AS (
      |  SELECT user_id, ts, event_id,
      |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts
      |  FROM events),
      |b AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN pts IS NULL OR epoch_us(ts) - epoch_us(pts) > 1800000000
      |         THEN 1 ELSE 0 END AS brk
      |  FROM x),
      |sess AS (
      |  SELECT user_id,
      |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS UNBOUNDED PRECEDING) AS session_id
      |  FROM b),
      |per AS (
      |  SELECT user_id, session_id, count(*) AS n_ev
      |  FROM sess GROUP BY user_id, session_id)
      |SELECT user_id, count(*) AS n_sessions,
      |  CAST(sum(n_ev) AS BIGINT) AS n_events
      |FROM per GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
    graft.streaming.EventStream.sessionCountsAvailableNow(s, dir)
  }

  /** J5's streaming upsert landed on the TRANSACTIONAL table: the
    * foreachBatch generation-swap sink (q10's streaming analogue)
    * re-targeted at [[graft.sources.SnapshotTable]] — each micro-batch
    * is one atomic create/upsert commit, crash safety comes from the
    * manifest protocol, and pre-batch states stay time-travel readable
    * ([[graft.streaming.EventStream.upsertSnapshotAvailableNow]]). The
    * drain stages two batches by event_id parity, so the oracle is
    * last-write-wins by (batch, ts, event_id) priority — upsert makes
    * the LATER batch win per user even when the earlier one holds the
    * later timestamp. */
  val q159 = Q("q159_snapshot_stream_upsert",
    """WITH keep AS (SELECT user_id, event_id, ts, value,
      |  row_number() OVER (PARTITION BY user_id
      |    ORDER BY event_id % 2 DESC, ts DESC, event_id DESC) AS rn
      |  FROM events)
      |SELECT user_id, event_id,
      |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
      |  round(value, 2) AS value
      |FROM keep WHERE rn = 1 ORDER BY user_id""".stripMargin) { (s, dir) =>
    val path = new java.io.File(
      new java.io.File(sys.props("java.io.tmpdir"),
        s"graft-rel-${ProcessHandle.current().pid()}"),
      s"snapstream_${new java.io.File(dir).getName}").getAbsolutePath
    // create-once table contract + Bench's multi-pass re-runs → clean root
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rm)
      f.delete(); ()
    }
    rm(new java.io.File(path))
    graft.streaming.EventStream.upsertSnapshotAvailableNow(s, dir, path)
      .select(col("user_id"), col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"),
        round(col("value"), 2).as("value"))
      .orderBy(col("user_id"))
  }

  val all: Seq[Q] =
    Seq(q01, q02, q03, q04, q05, q06, q07, q08, q09, q10, q11, q12, q13,
      q55, q62, q63, q64, q65, q66, q67, q68, q69, q70, q71, q75, q81, q99,
      q131, q140, q141, q145, q150, q159)
}
