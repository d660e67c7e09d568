package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing: pre-shuffled storage makes repeated joins/aggregations
  * on the bucket key shuffle-free — the co-location strategy for the
  * biggest recurring joins at 100 TB (lineitem ⋈ orders every day →
  * bucket both by orderkey once, join forever without Exchange). */
class BucketingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("join of two tables bucketed on the key runs without Exchange") {
    import spark.implicits._
    // runtime conf: builder configs are ignored on a shared session
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
    // drop leftovers from any earlier aborted run (metastore may have
    // lost the table while its warehouse dir survived)
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    val wh = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:"))
    Seq("li_bucketed", "ord_bucketed").foreach { t =>
      val dirFile = new java.io.File(wh, t)
      if (dirFile.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(dirFile)
      }
    }
    val sf = "/root/testdata/sf0.001"
    graft.util.Tables.load(spark, sf, "lineitem")
      .write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_bucketed")
    graft.util.Tables.load(spark, sf, "orders")
      .write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("ord_bucketed")

    val joined = spark.table("li_bucketed")
      .join(spark.table("ord_bucketed"),
        $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority").count()

    val plan = joined.queryExecution.executedPlan.toString
    // the join itself must not shuffle either side
    val joinPart = plan.split("HashAggregate").last
    assert(!joinPart.contains("Exchange hashpartitioning(l_orderkey"), plan)
    assert(!joinPart.contains("Exchange hashpartitioning(o_orderkey"), plan)
    // and the result matches the unbucketed computation
    val expected = graft.util.Tables.load(spark, sf, "lineitem")
      .join(graft.util.Tables.load(spark, sf, "orders"),
        $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}
