package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{
  OutputMode, StatefulProcessor, TimeMode, TimerValues, Trigger, TTLConfig, ValueState}

/** Per-user spend event in integer micro-units (value · 10^6). */
final case class SpendEvent(user_id: Long, value_micro: Long)

/** Running totals emitted once per (user, micro-batch). `alerted`
  * latches true the first batch the cumulative spend crosses the
  * threshold and stays true (the "notify once, remember forever"
  * monitor contract).
  */
final case class SpendTotal(
    user_id: Long, n_events: Long, spend_micro: Long, alerted: Boolean)

/** Arbitrary-stateful streaming on the v2 API (`transformWithState`,
  * Spark 4): a per-user cumulative spend monitor with ValueState.
  * Unlike `flatMapGroupsWithState` the v2 processor owns typed state
  * handles (Value/List/Map with optional TTL), supports timers, and
  * runs on the RocksDB state store — state size is bounded by disk,
  * not executor heap, which is the 100 TB-keyspace requirement.
  *
  * All arithmetic is long micro-units so cross-batch accumulation is
  * order-exact: the final emission per user equals the batch
  * groupBy sum regardless of how the input was micro-batched.
  */
class SpendMonitor(alertMicro: Long)
    extends StatefulProcessor[Long, SpendEvent, SpendTotal] {

  @transient private var totals: ValueState[(Long, Long, Boolean)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    totals = getHandle.getValueState[(Long, Long, Boolean)](
      "totals", Encoders.product[(Long, Long, Boolean)], TTLConfig.NONE)

  override def handleInputRows(
      key: Long,
      rows: Iterator[SpendEvent],
      timerValues: TimerValues): Iterator[SpendTotal] = {
    var (n, v, a) = if (totals.exists()) totals.get() else (0L, 0L, false)
    rows.foreach { e => n += 1; v += e.value_micro }
    a = a || v >= alertMicro
    totals.update((n, v, a))
    Iterator.single(SpendTotal(key, n, v, a))
  }
}

object StateV2 {

  /** Stream the events table through the spend monitor and return the
    * final per-user totals. transformWithState requires the RocksDB
    * state store provider; it is set for the query and restored after
    * (the default HDFS-backed store stays in place for the rest of the
    * session's queries).
    */
  def spendTotals(
      spark: SparkSession, dir: String,
      alertMicro: Long = 500L * 1000000L,
      sourceOptions: Map[String, String] = Map.empty): DataFrame = {
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(providerKey)
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    val schema = EventStream.eventsSchema(spark, dir)
    val stream = spark.readStream.schema(schema)
      .option("basePath", dir).options(sourceOptions)
      .parquet(s"$dir/events.parque*")
      .selectExpr("user_id",
        "CAST(round(value * 1000000) AS BIGINT) AS value_micro")
      .as[SpendEvent]
    val monitored = stream.groupByKey(_.user_id)
      .transformWithState(
        new SpendMonitor(alertMicro), TimeMode.None(), OutputMode.Update(),
        Encoders.product[SpendTotal])
      .toDF()
    val name = s"graft_spend_${System.nanoTime()}"
    try {
      spark.conf.set(providerKey,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      val q = monitored.writeStream
        .outputMode("update")
        .format("memory")
        .queryName(name)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set(providerKey, p)
        case None => spark.conf.unset(providerKey)
      }
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    }
    // one emission per (user, batch): the final state per user is the
    // row with the highest event count
    import org.apache.spark.sql.functions._
    spark.table(name)
      .groupBy("user_id")
      .agg(max(struct(col("n_events"), col("spend_micro"), col("alerted"))).as("m"))
      .select(col("user_id"), col("m.n_events").as("n_events"),
        col("m.spend_micro").as("spend_micro"), col("m.alerted").as("alerted"))
      .orderBy("user_id")
  }
}
