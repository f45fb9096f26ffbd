package graft

import graft.ingest.Rates
import graft.model.{DsDef, Dst}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every query here is paired with a DuckDB oracle in [[SparkEntry.oracleSql]].
  * Cross-engine determinism rules used throughout (so results hash-match
  * bit-for-bit, no tolerance):
  *
  *   - Sums/averages route through DECIMAL(28,10): the testdata values have
  *     ≤2 decimal digits, so the cast is exact, the decimal sum is exact and
  *     order-independent, and the final cast to double is the same nearest
  *     double in both engines (`dsum`).
  *   - Per-row arithmetic stays in double: single IEEE-754 ops are bit-exact
  *     across engines when written identically on both sides.
  *   - Time is integer epoch microseconds (`Tables.events`): DuckDB reads
  *     the parquet ns timestamps truncated to µs; `ts div`-based bucketing
  *     never routes an epoch through a double.
  *   - Every query (and its oracle) ends in a total ORDER BY.
  */
object SparkEntry {

  /** Exact order-independent sum — see class doc. */
  private def dsum(c: Column): Column =
    sum(c.cast(DecimalType(28, 10))).cast("double")
  /** NaN-skipping mean with exact numerator (RRD AVERAGE semantics). */
  private def davg(c: Column): Column = dsum(c) / count(c)

  /** End-labeled bucket of `ts_sec` (the PDP/CDP convention: the slot
    * stamped t covers (t-step, t]). */
  private def bucketEnd(stepSec: Long): Column =
    (expr(s"ts_sec div $stepSec") * stepSec + stepSec)

  // Shared test window on events: Jan 2024 (data spans the month).
  private val T0 = 1704067200L // 2024-01-01T00:00:00Z
  private val T1 = 1706659200L // 2024-01-31T00:00:00Z

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q02_cf_consolidate")(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // §2.3 / TPC-H-style baseline: grouped CF aggregation over a fact table.
    "q01_tpch_q1" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val disc = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(disc).as("sum_disc_price"),
          dsum(disc * (lit(1.0) + col("l_tax"))).as("sum_charge"),
          count(lit(1)).as("count_order"))
        .withColumn("avg_qty", col("sum_qty") / col("count_order"))
        .withColumn("avg_price", col("sum_base_price") / col("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // §2.2 consolidation: CF = AVERAGE/MIN/MAX/LAST per (series, step)
    // (/root/reference/src/rrd_update.c:2006-2141).
    "q02_cf_consolidate" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val wl = Window.partitionBy(col("event_type"), bucketEnd(3600).as("b"))
        .orderBy(col("ts_us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      ev.withColumn("lv", last(col("value")).over(wl))
        .groupBy(col("event_type"), bucketEnd(3600).as("bucket_ts"))
        .agg(
          davg(col("value")).as("avg_v"),
          min(col("value")).as("min_v"),
          max(col("value")).as("max_v"),
          max(col("lv")).as("last_v"),
          count(col("value")).as("n"))
        .orderBy("event_type", "bucket_ts")
    }),

    // §2.3 fetch: grid align + left join + null fill outside coverage
    // (/root/reference/src/rrd_fetch.c:445-569).
    "q03_fetch_gapfill" -> ((s, dir) => {
      val ev = Tables.events(s, dir).where(col("event_type") === "click")
      val roll = ev.groupBy(bucketEnd(3600).as("bts"))
        .agg(davg(col("value")).as("v"))
      query.Fetch.fetch(s, roll, "bts", Seq("v"), T0, T1, 3600L)
        .orderBy("ts")
    }),

    // §2.2 DST rate conversion: COUNTER with 32/64-bit wrap correction
    // (/root/reference/src/rrd_update.c:1487-1499).
    "q04_rate_counter" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      Rates.withRate(ev, Seq("user_id"), "ts_us", "event_id", "value",
          DsDef("v", Dst.Counter, heartbeatSec = 2592000L))
        .select(col("user_id"), col("event_id"), col("ts_us"), col("rate"))
        .orderBy("user_id", "ts_us", "event_id")
    }),

    // §2.2 DST matrix: GAUGE/ABSOLUTE/DERIVE(+clamp)/DCOUNTER(+reset) with
    // the heartbeat gate (/root/reference/src/rrd_update.c:1433-1597).
    "q05_rate_dst_matrix" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val hb = 7200L
      val g = Rates.withRate(ev, Seq("user_id"), "ts_us", "event_id",
        "value", DsDef("v", Dst.Gauge, hb)).withColumnRenamed("rate", "gauge_r")
      val a = Rates.withRate(g, Seq("user_id"), "ts_us", "event_id",
        "value", DsDef("v", Dst.Absolute, hb)).withColumnRenamed("rate", "abs_r")
      val d = Rates.withRate(a, Seq("user_id"), "ts_us", "event_id",
        "value", DsDef("v", Dst.Derive, hb, min = Some(-0.01), max = Some(0.01)))
        .withColumnRenamed("rate", "derive_r")
      val dc = Rates.withRate(d, Seq("user_id"), "ts_us", "event_id",
        "value", DsDef("v", Dst.DCounter, hb)).withColumnRenamed("rate", "dcounter_r")
      dc.select(col("user_id"), col("event_id"), col("gauge_r"), col("abs_r"),
          col("derive_r"), col("dcounter_r"))
        .orderBy("user_id", "ts_us", "event_id")
    }),

    // §2.5 VDEF MAXIMUM/MINIMUM/FIRST/LAST: extreme + its timestamp; ties
    // resolved to the first occurrence (strictly-greater update loop,
    // /root/reference/src/rrd_graph.c:5940-6064).
    "q06_vdef_extremes" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val wp = Window.partitionBy(col("event_type"))
      val wo = wp.orderBy(col("ts_us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      ev.withColumn("mx", max(col("value")).over(wp))
        .withColumn("mn", min(col("value")).over(wp))
        .withColumn("fv", first(col("value")).over(wo))
        .withColumn("lv", last(col("value")).over(wo))
        .groupBy(col("event_type"))
        .agg(
          max(col("value")).as("max_v"),
          min(when(col("value") === col("mx"), col("ts_sec"))).as("max_ts"),
          min(col("value")).as("min_v"),
          min(when(col("value") === col("mn"), col("ts_sec"))).as("min_ts"),
          max(col("fv")).as("first_v"),
          min(col("ts_sec")).as("first_ts"),
          max(col("lv")).as("last_v"),
          max(col("ts_sec")).as("last_ts"))
        .orderBy("event_type")
    })
  )

  /** DuckDB-side exact sum. The VARCHAR round-trip matters: DuckDB's
    * direct DECIMAL→DOUBLE cast is not correctly rounded for values with
    * >15 significant digits (observed 1-ulp drift vs Spark's
    * BigDecimal.doubleValue); its string→double parse IS correctly
    * rounded, matching Spark bit-for-bit. */
  private def sqlDsum(e: String): String =
    s"CAST(CAST(SUM(CAST($e AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE)"

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q01_tpch_q1" ->
      s"""SELECT l_returnflag, l_linestatus,
        | ${sqlDsum("l_quantity")} AS sum_qty,
        | ${sqlDsum("l_extendedprice")} AS sum_base_price,
        | ${sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
        | ${sqlDsum("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS sum_charge,
        | COUNT(*) AS count_order,
        | ${sqlDsum("l_quantity")} / COUNT(*) AS avg_qty,
        | ${sqlDsum("l_extendedprice")} / COUNT(*) AS avg_price
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q02_cf_consolidate" ->
      """WITH b AS (
        | SELECT event_type, epoch_us(ts)//1000000//3600*3600 + 3600 AS bucket_ts,
        |        value, epoch_us(ts) AS ts_us, event_id,
        |        last_value(value) OVER (
        |          PARTITION BY event_type, epoch_us(ts)//1000000//3600*3600 + 3600
        |          ORDER BY epoch_us(ts), event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS lv
        | FROM events)
        |SELECT event_type, bucket_ts,
        | CAST(CAST(SUM(CAST(value AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) / COUNT(value) AS avg_v,
        | MIN(value) AS min_v, MAX(value) AS max_v, MAX(lv) AS last_v,
        | COUNT(value) AS n
        |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q03_fetch_gapfill" ->
      """SELECT g.ts AS ts, b.v AS v
        |FROM generate_series(1704070800, 1706659200, 3600) AS g(ts)
        |LEFT JOIN (
        | SELECT epoch_us(ts)//1000000//3600*3600 + 3600 AS bts,
        |        CAST(CAST(SUM(CAST(value AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) / COUNT(value) AS v
        | FROM events WHERE event_type = 'click' GROUP BY 1) b
        |ON b.bts = g.ts ORDER BY 1""".stripMargin,

    "q04_rate_counter" ->
      """WITH r AS (
        | SELECT user_id, event_id, epoch_us(ts) AS ts_us, value,
        |        lag(value) OVER w AS pv, lag(epoch_us(ts)) OVER w AS pt
        | FROM events
        | WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id))
        |SELECT user_id, event_id, ts_us,
        | CASE WHEN CAST(ts_us - pt AS DOUBLE) / 1000000.0 > 2592000.0 THEN NULL ELSE
        |  (CASE WHEN (CASE WHEN value - pv < 0 THEN value - pv + 4294967295.0 ELSE value - pv END) < 0
        |        THEN (CASE WHEN value - pv < 0 THEN value - pv + 4294967295.0 ELSE value - pv END) + 18446744069414584320.0
        |        ELSE (CASE WHEN value - pv < 0 THEN value - pv + 4294967295.0 ELSE value - pv END) END)
        |  / (CAST(ts_us - pt AS DOUBLE) / 1000000.0)
        | END AS rate
        |FROM r ORDER BY user_id, ts_us, event_id""".stripMargin,

    "q05_rate_dst_matrix" ->
      """WITH r AS (
        | SELECT user_id, event_id, epoch_us(ts) AS ts_us, value,
        |        lag(value) OVER w AS pv, lag(epoch_us(ts)) OVER w AS pt
        | FROM events
        | WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
        |s AS (
        | SELECT user_id, event_id, ts_us, value, pv,
        |        CAST(ts_us - pt AS DOUBLE) / 1000000.0 AS iv
        | FROM r)
        |SELECT user_id, event_id,
        | CASE WHEN iv > 7200.0 THEN NULL ELSE value END AS gauge_r,
        | CASE WHEN iv > 7200.0 THEN NULL ELSE value / iv END AS abs_r,
        | CASE WHEN (CASE WHEN iv > 7200.0 THEN NULL ELSE (value - pv) / iv END) < -0.01
        |        OR (CASE WHEN iv > 7200.0 THEN NULL ELSE (value - pv) / iv END) > 0.01
        |      THEN NULL ELSE (CASE WHEN iv > 7200.0 THEN NULL ELSE (value - pv) / iv END) END AS derive_r,
        | CASE WHEN iv > 7200.0 THEN NULL ELSE
        |   CASE WHEN (value > 0 AND pv > value) OR (value < 0 AND value > pv)
        |        THEN NULL ELSE (value - pv) / iv END
        | END AS dcounter_r
        |FROM s ORDER BY user_id, ts_us, event_id""".stripMargin,

    "q06_vdef_extremes" ->
      """WITH b AS (
        | SELECT event_type, value, epoch_us(ts)//1000000 AS ts_sec,
        |        max(value) OVER (PARTITION BY event_type) AS mx,
        |        min(value) OVER (PARTITION BY event_type) AS mn,
        |        first_value(value) OVER (
        |          PARTITION BY event_type ORDER BY epoch_us(ts), event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS fv,
        |        last_value(value) OVER (
        |          PARTITION BY event_type ORDER BY epoch_us(ts), event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS lv
        | FROM events)
        |SELECT event_type,
        | MAX(value) AS max_v, MIN(CASE WHEN value = mx THEN ts_sec END) AS max_ts,
        | MIN(value) AS min_v, MIN(CASE WHEN value = mn THEN ts_sec END) AS min_ts,
        | MAX(fv) AS first_v, MIN(ts_sec) AS first_ts,
        | MAX(lv) AS last_v, MAX(ts_sec) AS last_ts
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
