package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.IntervalJoin
import graft.streaming.EventStream

/** Event-time queries over the `events` table (SURVEY.md §2.11 items
  * 5 and 15 + the streaming north star §2.10).
  *
  * All event time is epoch-micros longs (`Tables.events`), which makes
  * every window boundary integer-exact and identical to DuckDB's
  * `epoch_us` — no timestamp/timezone semantics in the comparison at
  * all.
  */
object EventQueries {

  private val FiveMinUs = 300000000L // 5 min in micros
  private val WindowUs = 900000000L // 15 min tumbling window

  val queries: Map[String, Q] = Map(
    // ---- 5a. non-equi range join: same-user event pairs ≤5 min apart
    "q06_time_pair_join" -> Q(
      impl = (s, d) => {
        val e = Tables.events(s, d).select("user_id", "event_id", "us")
        val a = e.toDF("user_id", "a_id", "a_us")
        val b = e.toDF("user_id", "b_id", "b_us")
        a.join(b, Seq("user_id"))
          .filter(col("a_id") < col("b_id")
            && abs(col("a_us") - col("b_us")) <= FiveMinUs)
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_pairs"))
          .orderBy("user_id")
      },
      oracle = Some(s"""
        WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events)
        SELECT a.user_id, CAST(count(*) AS BIGINT) AS n_pairs
        FROM e a JOIN e b ON a.user_id = b.user_id
          AND a.event_id < b.event_id
          AND abs(a.us - b.us) <= $FiveMinUs
        GROUP BY a.user_id
        ORDER BY a.user_id"""),
      bench = true),

    // ---- 5b. binned interval overlap join (the 100 TB strategy) ----
    // Intervals: [ts, ts + value seconds]; overlapping same-type pairs.
    // Implementation is the bin-exploded equi-join; the oracle is the
    // plain non-equi join — results must be identical.
    "q07_interval_join_binned" -> Q(
      impl = (s, d) => {
        val iv = Tables.events(s, d).select(
          col("event_type"),
          col("event_id"),
          col("us").as("s_us"),
          (col("us") + round(col("value") * 1000000, 0).cast("long")).as("e_us"))
        val left = iv.toDF("event_type", "a_id", "a_s", "a_e")
        val right = iv.toDF("event_type", "b_id", "b_s", "b_e")
        IntervalJoin.binned(left, right, keys = Seq("event_type"),
            lStart = "a_s", lEnd = "a_e", rStart = "b_s", rEnd = "b_e",
            binWidth = 60000000L,
            extraCondition = col("a_id") < col("b_id"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_overlaps"))
          .orderBy("event_type")
      },
      oracle = Some("""
        WITH iv AS (
          SELECT event_type, event_id, epoch_us(ts) AS s_us,
                 epoch_us(ts) + CAST(round(value * 1000000) AS BIGINT) AS e_us
          FROM events)
        SELECT a.event_type, CAST(count(*) AS BIGINT) AS n_overlaps
        FROM iv a JOIN iv b ON a.event_type = b.event_type
          AND a.event_id < b.event_id
          AND a.s_us <= b.e_us AND b.s_us <= a.e_us
        GROUP BY a.event_type
        ORDER BY a.event_type"""),
      bench = true),

    // ---- pure overlap join via the optimizer rule ------------------
    // No equi key at all: Catalyst alone would plan a nested-loop
    // product; graft.plans.BinnedIntervalJoinRule rewrites it into the
    // binned equi-join automatically. The DataFrame code is the naive
    // declarative join — the rule supplies the scale path.
    "q59_interval_rule" -> Q(
      impl = (s, d) => {
        if (!s.experimental.extraOptimizations
            .contains(graft.plans.BinnedIntervalJoinRule)) {
          s.experimental.extraOptimizations =
            s.experimental.extraOptimizations :+ graft.plans.BinnedIntervalJoinRule
        }
        s.conf.set("spark.graft.intervalJoin.binWidth", "300000000")
        val iv = Tables.events(s, d).select(
          col("event_id"),
          col("us").as("s_us"),
          (col("us") + round(col("value") * 1000000, 0).cast("long")).as("e_us"))
        val a = iv.toDF("a_id", "a_s", "a_e")
        val b = iv.toDF("b_id", "b_s", "b_e")
        a.join(b, col("a_id") < col("b_id")
            && col("a_s") <= col("b_e") && col("b_s") <= col("a_e"))
          .groupBy(expr("a_s div 86400000000").as("day"))
          .agg(count(lit(1)).as("n_overlaps"))
          .orderBy("day")
      },
      oracle = Some("""
        WITH iv AS (
          SELECT event_id, epoch_us(ts) AS s,
                 epoch_us(ts) + CAST(round(value * 1000000) AS BIGINT) AS e
          FROM events)
        SELECT (a.s // 86400000000) AS day, CAST(count(*) AS BIGINT) AS n_overlaps
        FROM iv a JOIN iv b
          ON a.event_id < b.event_id AND a.s <= b.e AND b.s <= a.e
        GROUP BY 1 ORDER BY day"""),
      bench = true),

    // ---- 15. tumbling-window aggregation (batch) -------------------
    "q19_window_tumbling" -> Q(
      impl = (s, d) =>
        Tables.events(s, d)
          .withColumn("w_start_us", expr(s"(us div $WindowUs) * $WindowUs"))
          .groupBy("w_start_us", "event_type")
          .agg(count(lit(1)).as("n"), round(sum("value"), 3).as("v"))
          .orderBy("w_start_us", "event_type"),
      oracle = Some(s"""
        SELECT (epoch_us(ts) // $WindowUs) * $WindowUs AS w_start_us, event_type,
               CAST(count(*) AS BIGINT) AS n, round(sum(value), 3) AS v
        FROM events
        GROUP BY 1, 2
        ORDER BY w_start_us, event_type"""),
      bench = true),

    // ---- streaming parity: same aggregation via Structured Streaming
    "q20_stream_tumbling" -> Q(
      impl = (s, d) => EventStream.tumblingCounts(s, d, WindowUs),
      oracle = Some(s"""
        SELECT (epoch_us(ts) // $WindowUs) * $WindowUs AS w_start_us, event_type,
               CAST(count(*) AS BIGINT) AS n, round(sum(value), 3) AS v
        FROM events
        GROUP BY 1, 2
        ORDER BY w_start_us, event_type""")),

    // ---- streaming parity for the sliding window (q55) -------------
    "q74_stream_sliding" -> Q(
      impl = (s, d) => EventStream.slidingCounts(s, d,
        widthUs = 1800000000L, slideUs = 900000000L),
      oracle = Some {
        val S = 900000000L
        s"""
        WITH e AS (SELECT epoch_us(ts) AS us, event_type, value FROM events),
        w2 AS (
          SELECT (us // $S) * $S AS w_start_us, event_type, value FROM e
          UNION ALL
          SELECT ((us // $S) - 1) * $S AS w_start_us, event_type, value FROM e)
        SELECT w_start_us, event_type, CAST(count(*) AS BIGINT) AS n,
               round(sum(value), 3) AS v
        FROM w2 GROUP BY 1, 2 ORDER BY w_start_us, event_type"""
      }),

    // ---- append-mode watermarked windows: only windows finalized by
    // the watermark (max event time − 1 h, at Spark's millisecond
    // watermark granularity) are emitted — late-data semantics as a
    // deterministic, oracle-checkable function of the data -----------
    "q82_stream_watermark" -> Q(
      impl = (s, d) => EventStream.tumblingAppendWatermarked(s, d,
        windowUs = WindowUs, delayUs = 3600000000L),
      oracle = Some(s"""
        WITH e AS (SELECT epoch_us(ts) AS us, event_type FROM events),
        w AS (SELECT (us // $WindowUs) * $WindowUs AS w_start_us, event_type,
                     CAST(count(*) AS BIGINT) AS n
              FROM e GROUP BY 1, 2),
        wm AS (SELECT ((max(us) // 1000) - 3600000) * 1000 AS wm_us FROM e)
        SELECT w_start_us, event_type, n
        FROM w, wm WHERE w_start_us + $WindowUs <= wm_us
        ORDER BY w_start_us, event_type"""),
      bench = true),

    // ---- sessionization: 30-min-gap sessions per user --------------
    "q33_sessionize" -> Q(
      impl = (s, d) => EventStream.sessionCountsBatch(Tables.events(s, d)),
      oracle = Some("""
        WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
        m AS (
          SELECT user_id,
                 CASE WHEN lag(us) OVER w IS NULL
                        OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_s
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id))
        SELECT user_id, CAST(sum(new_s) AS BIGINT) AS n_sessions
        FROM m GROUP BY user_id ORDER BY user_id"""))
  )
}
