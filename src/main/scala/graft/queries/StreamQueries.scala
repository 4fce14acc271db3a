package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.streaming.StreamOps

/** Event-time windowing / temporal-join queries over `events`.
  * Window boundaries are compared as epoch seconds (BIGINT) so the
  * oracle never round-trips timestamps through a session timezone.
  */
object StreamQueries {

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Sliding windows (1h every 15min): each event lands in 4 windows.
    "st1_sliding" -> ((s, d) => {
      StreamOps.sliding(events(s, d), "ts", "1 hour", "15 minutes",
        Seq("event_type"),
        Seq(count(lit(1)).as("n"), sum(dec(col("value"))).cast("double").as("sum_value")))
        .select(col("window.start").cast("long").as("w_start"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("w_start", "event_type")
    }),

    // Session windows per user (5-minute gap).
    "st2_sessions" -> ((s, d) => {
      StreamOps.sessions(events(s, d), "ts", "5 minutes",
        Seq("user_id"),
        Seq(count(lit(1)).as("n_events"),
          min(unix_micros(col("ts"))).as("first_us"),
          max(unix_micros(col("ts"))).as("last_us")))
        .select(col("user_id"), col("session_window.start").cast("long").as("sess_start"),
          col("n_events"), (col("last_us") - col("first_us")).as("dur_us"))
        .orderBy("user_id", "sess_start")
    }),

    // Range join: all (purchase, click) pairs of a user within the
    // hour before the purchase — banded equi-join, not a cross product.
    "st4_range_join" -> ((s, d) => {
      val ev = events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("p_ts"), col("event_id").as("purchase_id"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("c_ts"), col("event_id").as("click_id"))
      graft.operators.RangeJoin.byBucket(purchases, clicks, Seq("user_id"),
        "p_ts", "c_ts", beforeSec = 3600L, afterSec = 0L, binWidthSec = 900L)
        .select(col("purchase_id"), col("click_id"), col("user_id"),
          (unix_micros(col("p_ts")) - unix_micros(col("c_ts"))).as("gap_us"))
        .orderBy("purchase_id", "click_id")
    }),

    // RANGE-frame window: trailing 1-hour sum/count per user at every
    // event — the time-based frame (peers by value range, not row
    // count); decimal sums keep the varying frame order-invariant.
    "st6_trailing_range" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts_sec"))
        .rangeBetween(-3600L, 0L)
      events(s, d).filter(col("user_id") < 50)
        .withColumn("ts_sec", expr("unix_micros(ts) div 1000000"))
        .select(col("event_id"), col("user_id"), col("ts_sec"),
          sum(dec(col("value"))).over(w).cast("double").as("trailing_sum"),
          count(lit(1)).over(w).as("n_in_window"))
        .orderBy("event_id")
    }),

    // Time-series resample + forward fill: per-user values on a
    // regular 15-minute grid, gaps carrying the latest prior value.
    "st5_resample" -> ((s, d) => {
      StreamOps.resampleForwardFill(
        events(s, d).filter(col("user_id") < 10), "ts", "user_id", "value",
        stepSec = 900L)
        .orderBy("user_id", "bts")
    }),

    // As-of join: each purchase matched to the user's latest
    // at-or-before click (union + running last — no range explosion).
    "st3_asof" -> ((s, d) => {
      val ev = events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("click_id"),
          unix_micros(col("ts")).as("click_us"))
      StreamOps.asofJoin(purchases, clicks, Seq("user_id"), "ts",
        Seq("click_id", "click_us"))
        .select(col("purchase_id"), col("user_id"),
          unix_micros(col("ts")).as("purchase_us"),
          col("click_id"), (unix_micros(col("ts")) - col("click_us")).as("gap_us"))
        .orderBy("purchase_id")
    }),

    // Event-time windowed distinct counts via the KMV sketch — the
    // "distinct users per hour per event type" report without a
    // distinct-expand shuffle inside every window group; the same
    // expression runs under readStream (sketch state is
    // watermark-bounded like any windowed agg). k=4096 keeps every
    // window group exact at tested SFs, so the count(DISTINCT) oracle
    // matches.
    "st7_windowed_distinct" -> ((s, d) => {
      import graft.expressions.SketchExpressions._
      events(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(kmv_estimate(kmv_sketch(col("user_id"), 4096)).as("n_users"))
        .select(col("window.start").cast("long").as("w_start"),
          col("event_type"), col("n_users"))
        .orderBy("w_start", "event_type")
    }),

    // Event-time windowed HEAVY HITTERS via the Misra-Gries sketch —
    // the "top users per hour per event type" report with bounded
    // per-window state (capacity entries, never the user population);
    // the same expression runs under readStream (st7/st8 precedent).
    // Capacity 4096 >> distinct users per window at tested SFs, so
    // counts are exact and the oracle's count-desc/item-string-asc
    // ranking replays the sketch's own tie order bit-for-bit.
    "st11_windowed_frequent" -> ((s, d) => {
      import graft.expressions.FreqSketchExpressions._
      events(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(mg_sketch(col("user_id").cast("string"), 4096).as("sk"))
        .select(col("window.start").cast("long").as("w_start"),
          col("event_type"), explode(mg_topk(col("sk"), 5)).as("e"))
        .select(col("w_start"), col("event_type"),
          col("e.item").as("user_id"), col("e.count").as("n"))
        .orderBy("w_start", "event_type", "user_id")
    }),

    // Event-time windowed VALUE QUANTILES via the KLL sketch — the
    // "p50/p95 latency per hour per event type" report with bounded
    // per-window state instead of percentile's per-group value
    // buffer; the same expression runs under readStream. Window
    // groups stay far below the 4096 capacity at tested SFs (max 51
    // rows), so the sketch is exact and the quantile_cont oracle
    // matches bit-for-bit.
    "st8_windowed_quantiles" -> ((s, d) => {
      import graft.expressions.QuantileSketchExpressions._
      events(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(kll_sketch(col("value"), 4096).as("sk"))
        .select(col("window.start").cast("long").as("w_start"),
          col("event_type"),
          round(kll_quantile(col("sk"), 0.5), 6).as("p50"),
          round(kll_quantile(col("sk"), 0.95), 6).as("p95"),
          kll_n(col("sk")).as("n"))
        .orderBy("w_start", "event_type")
    })
  )

  def oracles: Map[String, String] = Map(
    "st1_sliding" ->
      """WITH w AS (
        |  SELECT ((epoch_us(ts) // 1000000) // 900) * 900 - k.g * 900 AS w_start, event_type, value
        |  FROM events, generate_series(0, 3) k(g))
        |SELECT w_start, event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM w GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin,
    "st2_sessions" ->
      """WITH o AS (
        |  SELECT user_id, ts, epoch_us(ts) AS us,
        |    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts)
        |              >= 300000000 OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events),
        | s AS (
        |  SELECT user_id, us,
        |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
        |  FROM o)
        |SELECT user_id, MIN(us) // 1000000 AS sess_start, COUNT(*) AS n_events,
        |  MAX(us) - MIN(us) AS dur_us
        |FROM s GROUP BY user_id, sess_id ORDER BY user_id, sess_start""".stripMargin,
    "st4_range_join" ->
      """SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id,
        |  epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
        |FROM events p JOIN events c
        |  ON p.user_id = c.user_id
        | AND p.event_type = 'purchase' AND c.event_type = 'click'
        | AND epoch_us(c.ts) >= epoch_us(p.ts) - 3600000000
        | AND epoch_us(c.ts) <= epoch_us(p.ts)
        |ORDER BY purchase_id, click_id""".stripMargin,
    "st6_trailing_range" ->
      """SELECT event_id, user_id, epoch_us(ts) // 1000000 AS ts_sec,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS trailing_sum,
        |  COUNT(*) OVER w AS n_in_window
        |FROM events WHERE user_id < 50
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts) // 1000000
        |  RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "st5_resample" ->
      """WITH b AS (
        |  SELECT user_id, (epoch_us(ts) // 1000000) // 900 * 900 AS bts, MAX(value) AS v
        |  FROM events WHERE user_id < 10 GROUP BY 1, 2),
        | r AS (SELECT user_id, MIN(bts) AS lo, MAX(bts) AS hi FROM b GROUP BY 1),
        | g AS (SELECT user_id, unnest(list_transform(generate_series(0, CAST((hi - lo) // 900 AS INT)),
        |        i -> lo + i * 900)) AS bts FROM r),
        | j AS (SELECT g.user_id, g.bts, b.v
        |       FROM g LEFT JOIN b ON g.user_id = b.user_id AND g.bts = b.bts)
        |SELECT user_id, bts,
        |  last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY bts
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
        |  CAST(CASE WHEN v IS NULL THEN 1 ELSE 0 END AS INT) AS was_gap
        |FROM j ORDER BY user_id, bts""".stripMargin,
    "st3_asof" ->
      """WITH cd AS (
        |  SELECT user_id, ts, MAX(event_id) AS event_id
        |  FROM events WHERE event_type = 'click' GROUP BY user_id, ts),
        | u AS (
        |  SELECT user_id, ts, event_id, 1 AS isl
        |  FROM events WHERE event_type = 'purchase'
        |  UNION ALL
        |  SELECT user_id, ts, event_id, 0 AS isl FROM cd),
        | w AS (
        |  SELECT *, MAX(CASE WHEN isl = 0 THEN epoch_us(ts) END) OVER (
        |    PARTITION BY user_id ORDER BY ts, isl
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_us
        |  FROM u)
        |SELECT w.event_id AS purchase_id, w.user_id,
        |  epoch_us(w.ts) AS purchase_us, c.event_id AS click_id,
        |  epoch_us(w.ts) - w.click_us AS gap_us
        |FROM w LEFT JOIN cd c
        |  ON c.user_id = w.user_id AND epoch_us(c.ts) = w.click_us
        |WHERE w.isl = 1
        |ORDER BY purchase_id""".stripMargin,
    "st7_windowed_distinct" ->
      """SELECT ((epoch_us(ts) // 1000000) // 3600) * 3600 AS w_start,
        |  event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM events GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin,
    // st11: exact per-window user counts ranked by the sketch's own
    // order — count DESC, item STRING asc — top 5 per (window, type)
    "st11_windowed_frequent" ->
      """WITH c AS (
        |  SELECT ((epoch_us(ts) // 1000000) // 3600) * 3600 AS w_start,
        |    event_type, CAST(user_id AS VARCHAR) AS user_id,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2, 3),
        | r AS (SELECT w_start, event_type, user_id, n,
        |   ROW_NUMBER() OVER (PARTITION BY w_start, event_type
        |     ORDER BY n DESC, user_id ASC) AS rk FROM c)
        |SELECT w_start, event_type, user_id, n FROM r WHERE rk <= 5
        |ORDER BY w_start, event_type, user_id""".stripMargin,
    "st8_windowed_quantiles" ->
      """SELECT ((epoch_us(ts) // 1000000) // 3600) * 3600 AS w_start,
        |  event_type,
        |  round(quantile_cont(value, 0.5), 6) AS p50,
        |  round(quantile_cont(value, 0.95), 6) AS p95,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM events GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin
  )
}
