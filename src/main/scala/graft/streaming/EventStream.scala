package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming over the `events` table (SURVEY.md §2.10
  * streaming row). Batch parquet drives a real `readStream` →
  * aggregate → memory-sink query via `Trigger.AvailableNow`, so the
  * streaming operator graph (stateful tumbling-window aggregation) is
  * exercised end-to-end and must produce byte-identical results to the
  * batch oracle.
  *
  * Event time is epoch-micros longs throughout (see `graft.Tables`);
  * window assignment is integer arithmetic, so streaming vs batch vs
  * DuckDB all agree exactly.
  */
object EventStream {

  /** Tumbling count/sum per (window, event_type), via streaming. */
  def tumblingCounts(spark: SparkSession, dir: String, windowUs: Long): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$dir/events.parquet"
    val schema = spark.read.parquet(path).schema
    // FileStreamSource needs a glob (a bare file path trips its
    // basePath directory check), so match the single file by pattern.
    val stream = spark.readStream.schema(schema)
      .option("basePath", dir).parquet(s"$dir/events.parque*")
      .withColumn("us", expr("ts div 1000"))
      .withColumn("w_start_us", expr(s"(us div $windowUs) * $windowUs"))
      .groupBy("w_start_us", "event_type")
      .agg(count(lit(1)).as("n"), round(sum("value"), 3).as("v"))
    val name = s"graft_tumbling_${System.nanoTime()}"
    val q = stream.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name).orderBy("w_start_us", "event_type")
  }

  /** Gap-based sessionization (30-min inactivity gap) as a batch
    * window computation: a session starts where the lag gap exceeds
    * the threshold. One shuffle on user_id; in-partition sort.
    */
  def sessionCountsBatch(events: DataFrame, gapUs: Long = 1800000000L): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    events
      .select("user_id", "event_id", "us")
      .withColumn("prev_us", lag("us", 1).over(w))
      .withColumn("new_s",
        when(col("prev_us").isNull || col("us") - col("prev_us") > gapUs, 1)
          .otherwise(0))
      .groupBy("user_id")
      .agg(sum("new_s").cast("long").as("n_sessions"))
      .orderBy("user_id")
  }
}
