package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off probe: does AQE coalesce tiny post-shuffle partitions when
  * parallelismFirst is off?
  */
object CoalesceProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("parallelismFirst=" +
      spark.conf.get("spark.sql.adaptive.coalescePartitions.parallelismFirst"))
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val df = spark.read.parquet(s"$dir/documents.parquet")
      .groupBy("source").count()
    df.collect(): Unit
    println("post-shuffle partitions: " + df.rdd.getNumPartitions)
    val df2 = spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy("l_orderkey").count()
    df2.collect(): Unit
    println("lineitem post-shuffle partitions: " + df2.rdd.getNumPartitions)
    spark.stop()
  }
}
