package graft

import org.apache.spark.sql.SparkSession

/** Plan-dump main (not part of the driver contract): writes
  * `explain("formatted")` for every SparkEntry query (or the names
  * given as args) to `plans/r15/<query>_<suffix>.txt`. The suffix is
  * `$SPARK_GRAFT_PLAN_SUFFIX` (default "before"). Building a query's
  * DataFrame runs any imperative work inside it (streaming gates,
  * staging), so a full dump costs roughly one bench pass — run it in
  * tmux. Queries whose construction fails still get a file (with the
  * error) so the sweep is auditable.
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "before")
    val outDir = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "plans/r15"))
    java.nio.file.Files.createDirectories(outDir)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // unknown names still get an auditable file (the docstring's
    // contract), and only non-fatal failures are swallowed — an OOM
    // must kill the dump, not masquerade as one query's parse error
    val selected: Seq[(String, Option[(SparkSession, String) =>
        org.apache.spark.sql.DataFrame])] =
      if (args.nonEmpty) args.toSeq.map(n => n -> SparkEntry.queries.get(n))
      else SparkEntry.queries.toSeq.sortBy(_._1)
        .map { case (n, f) => n -> Some(f) }
    for ((name, fnOpt) <- selected) {
      spark.sparkContext.setJobDescription(s"plan: $name")
      val txt = fnOpt match {
        case None =>
          s"UNKNOWN QUERY: $name (valid names are SparkEntry.queries keys)"
        case Some(fn) =>
          try {
            val df = fn(spark, d)
            // queryExecution.explainString gives the formatted plan
            // without executing the (already-constructed) DataFrame
            df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
          } catch {
            case scala.util.control.NonFatal(e) =>
              s"PLAN DUMP FAILED: ${e.getClass.getName}: ${e.getMessage}"
          }
      }
      java.nio.file.Files.write(
        outDir.resolve(s"${name}_$suffix.txt"), txt.getBytes)
      System.err.println(s"[plans] $name -> ${name}_$suffix.txt")
      spark.sharedState.cacheManager.clearCache()
      spark.streams.active.foreach(_.stop())
    }
    org.apache.spark.sql.execution.streaming.state.StateStore.stop()
    spark.stop()
  }
}
