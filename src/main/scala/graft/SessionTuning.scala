package graft

import org.apache.spark.sql.SparkSession

/** Scale-adaptive session knobs shared by the graft entry points
  * (Bench, Verify, tools). Everything here is sized by DATA VOLUME,
  * not by the local core count, so the same settings hold from sf0.001
  * to a 100 TB cluster; each knob is env-overridable for A/B runs.
  */
object SessionTuning {

  /** Post-shuffle partition coalescing by advisory BYTES instead of
    * "keep parallelism up to the core count" (guide §2.2):
    *
    * With the default `parallelismFirst=true`, AQE refuses to coalesce
    * below `defaultParallelism` — every reduce stage of a kilobyte
    * shuffle still launches one task per core, and each task pays the
    * fixed task-binary deserialization + scheduling cost. Thread-dump
    * sampling over the sf0.1 bench measured exactly that: the dominant
    * executor-side frames were `ShuffleMapTask` JavaSerializer task
    * deserialization, 32× per trivial stage (60+ seconds of summed
    * deser time on a single q176 run). `parallelismFirst=false` sizes
    * reduce partitions by `advisoryPartitionSizeInBytes` — one task at
    * toy scale, ~64 MB tasks at any scale — which is also the setting
    * that keeps shuffle block counts quadratic-safe as M and R grow
    * together on a real cluster.
    *
    * `spark.sql.shuffle.partitions` stays the entry point's core-count
    * ceiling (AQE only coalesces DOWN from it); a 100 TB deployment
    * raises that ceiling, not these knobs.
    */
  def scaleAdaptive(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("SPARK_GRAFT_PARALLELISM_FIRST", "true"))
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("SPARK_GRAFT_ADVISORY_PART", "64m"))

  /** Session-default verdict (round 21, paired in-JVM A/B over 10
    * representative queries, 13 alternating runs each, first sample
    * per arm dropped): `parallelismFirst=false` GLOBALLY is a wash-to-
    * regression — it halves the BPE training loop (5.77 → 2.34 s
    * median) but doubles the compute-dense exact audits (q28 1.26 →
    * 2.09, q135 0.96 → 2.22), whose per-byte compute (posting-list
    * self-joins, all-pairs verify) is exactly the case bytes-based
    * sizing cannot see. The default therefore stays parallelism-first;
    * operators whose reduce stages are genuinely bytes-bound opt in
    * with [[withBytesSizedReduce]] around their driver-side loops.
    */
  private val PfKey = "spark.sql.adaptive.coalescePartitions.parallelismFirst"

  /** Run `body` with post-shuffle partitions sized by ADVISORY BYTES
    * instead of parallelism-first (guide §2.2 "fewer, larger reduce
    * partitions"). For operator-internal driver loops over
    * corpus-BOUNDED intermediates (e.g. the BPE vocabulary: tiny at
    * calibration scale, ~O(√corpus) at 100 TB) whose per-round jobs
    * are task-count-bound at any scale where the table is small and
    * correctly byte-split where it is large. Execution that happens
    * inside `body` (collects, counts) sees the setting; the previous
    * value is restored on exit.
    */
  def withBytesSizedReduce[T](spark: SparkSession)(body: => T): T = {
    val prev = spark.conf.getOption(PfKey)
    spark.conf.set(PfKey, "false")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(PfKey, v)
      case None => spark.conf.unset(PfKey)
    }
  }
}
