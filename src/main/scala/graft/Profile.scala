package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiling main (not part of the driver contract): times
  * named SparkEntry queries end-to-end through the noop sink, twice
  * each (cold + warm). */
object Profile {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("s14_vector_index", "s15_filtered_search",
        "s16_index_append", "s17_index_delete", "c21_cdc_vector_sync")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // job-level timing: who eats the wall-clock inside one query
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val jobLog = scala.collection.mutable.ArrayBuffer[(Double, String)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val desc = Option(js.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .orElse(Option(js.properties)
              .flatMap(p => Option(p.getProperty("callSite.short"))))
            .getOrElse("?")
          jobs.put(js.jobId, (js.time, desc)); ()
        }
        override def onJobEnd(
            je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          Option(jobs.remove(je.jobId)).foreach { case (t0, desc) =>
            jobLog.synchronized {
              jobLog += (((je.time - t0) / 1e3, desc)) }
          }
        }
      })
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    // listener events are delivered asynchronously: settle the bus
    // before reading/clearing jobLog or late events skew the counts
    def settle(): Unit = Thread.sleep(500)
    for (n <- names; r <- 1 to 2) {
      settle(); jobLog.synchronized(jobLog.clear())
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, d)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"QUERY $n%-28s r$r $wall%.2f s")
      settle()
      if (r == 2) {
        val snap = jobLog.synchronized(jobLog.toList)
        println(f"  jobs=${snap.size} jobSec=${snap.map(_._1).sum}%.2f")
        snap.sortBy(-_._1).take(12).foreach { case (s, desc) =>
          println(f"  JOB $s%6.2f s  ${desc.take(100)}") }
      }
    }
    spark.stop()
  }
}
