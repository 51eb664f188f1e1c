package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

/** Streaming/batch parity: the Structured Streaming operators must
  * produce exactly the batch formulations' results when driven to
  * completion with Trigger.AvailableNow.
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("streaming tumbling aggregation equals batch grouping") {
    import org.apache.spark.sql.functions._
    val windowUs = 900000000L
    val streaming = EventStream.tumblingCounts(spark, dir, windowUs)
      .collect().toSet
    val batch = Tables.events(spark, dir)
      .withColumn("w_start_us", expr(s"(us div $windowUs) * $windowUs"))
      .groupBy("w_start_us", "event_type")
      .agg(count(lit(1)).as("n"), round(sum("value"), 3).as("v"))
      .collect().toSet
    assert(streaming === batch)
  }

  test("native session_window sessionization equals batch window-lag") {
    val viaWindow = EventStream.sessionCountsViaSessionWindow(
        Tables.events(spark, dir))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = EventStream.sessionCountsBatch(Tables.events(spark, dir))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaWindow === batch)
  }

  test("streaming exact dedup removes duplicates across a unioned stream") {
    import org.apache.spark.sql.streaming.Trigger
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    def src = spark.readStream.schema(schema)
      .option("basePath", dir).parquet(s"$dir/events.parque*")
    val deduped = src.union(src).dropDuplicates("event_id")
    val name = s"graft_dedup_${System.nanoTime()}"
    val q = deduped.writeStream.outputMode("append").format("memory")
      .queryName(name).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val n = spark.table(name).count()
    val exact = spark.read.parquet(s"$dir/events.parquet").count()
    assert(n === exact) // 2x input rows deduped back to the originals
  }

  test("stateful flatMapGroupsWithState sessionization equals batch window-lag") {
    val stateful = EventStream.sessionCountsStateful(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = EventStream.sessionCountsBatch(Tables.events(spark, dir))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(stateful === batch)
  }

  test("RocksDB state store produces identical results to the default provider") {
    // the production state-store backend at 100 TB state volumes:
    // spill-to-disk per partition instead of JVM-heap HDFSBackedStateStore
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    val default = EventStream.tumblingCounts(spark, dir, 900000000L)
      .collect().toSet
    try {
      spark.conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val viaRocks = EventStream.tumblingCounts(spark, dir, 900000000L)
        .collect().toSet
      assert(viaRocks === default && viaRocks.nonEmpty)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("transformWithState spend monitor accumulates across micro-batches and latches the alert") {
    import org.apache.spark.sql.functions._
    // Four separate single-row part files under events.parquet/ +
    // maxFilesPerTrigger=1 → AvailableNow processes multiple
    // micro-batches, so the ValueState must carry totals across batch
    // boundaries. u1 crosses the threshold only with its second
    // file's spend; u2 never crosses. (Sums and the latch are
    // order-independent, so file processing order can't matter.)
    val tmp = graft.TestSpark.scratchPath("statev2").toFile
    val dir2 = tmp.getAbsolutePath
    def write(eventId: Long, user: Long, value: Double): Unit =
      spark.range(1).select(
        lit(eventId).as("event_id"),
        lit(new java.sql.Timestamp(1700000000000L + eventId)).as("ts"),
        lit(user).as("user_id"), lit("purchase").as("event_type"),
        lit(value).as("value"), lit("{}").as("props"))
        .write.mode("append").parquet(s"$dir2/events.parquet")
    write(1L, 1L, 300.0); write(2L, 2L, 100.0)
    write(3L, 1L, 250.0); write(4L, 2L, 50.0)
    val out = StateV2.spendTotals(spark, dir2,
      alertMicro = 500L * 1000000L,
      sourceOptions = Map("maxFilesPerTrigger" -> "1"))
      .collect().map(r =>
        (r.getLong(0), (r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out(1L) === ((2L, 550000000L, true)), out)
    assert(out(2L) === ((2L, 150000000L, false)), out)
  }
}
