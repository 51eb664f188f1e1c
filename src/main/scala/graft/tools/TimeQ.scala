package graft.tools
import org.apache.spark.sql.SparkSession
import graft.queries.Registry
object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.read.parquet(s"$dir/lineitem.parquet").groupBy("l_returnflag").count().count()
    for (name <- args; i <- 1 to 2) {
      // same untimed declared-contract prep as Bench (q183 apply-only)
      Registry.timingPrep.get(name).foreach(_(spark, dir))
      val t0 = System.nanoTime()
      val n = Registry.all(name).impl(spark, dir).count()
      println(f"$name run$i: ${(System.nanoTime()-t0)/1e9}%.2f s rows=$n")
    }
    spark.stop()
  }
}
