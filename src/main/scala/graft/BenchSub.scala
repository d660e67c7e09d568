package graft
import org.apache.spark.sql.SparkSession
object BenchSub {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = args(0).split(",")
    names.foreach { n =>
      def once(): Double = {
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      // same adaptive min-of-n as graft.Bench: confirm the min with a
      // second sample within 1.5x, else keep sampling (bounded)
      var runs = List(once(), once())
      while (runs.size < 5 && runs.sorted.tail.head > runs.min * 1.5)
        runs ::= once()
      println(f"SUB $n ${runs.min}%.2f")
    }
    spark.stop()
  }
}
