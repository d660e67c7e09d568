package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Export

/** Sharded-export invariants: rows preserved, shard key ranges
  * disjoint and sorted, manifest complete, and the export reproducible
  * run-to-run (same shard count and row distribution). */
class ExportSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp() = Files.createTempDirectory(
    Paths.get("target"), "export").toString

  test("byteBudgetShards: shards respect the budget unless a single " +
      "item exceeds it, order is preserved, strata are independent") {
    import spark.implicits._
    // stratum A: sizes forcing a mid-shard close; stratum B: one
    // oversize item that must land in its OWN shard, not vanish
    val rows = Seq(
      ("A", 1L, 300L), ("A", 2L, 300L), ("A", 3L, 500L), // 300+300 fit, 500 spills
      ("A", 4L, 900L),                                   // shard of its own
      ("B", 1L, 5000L),                                  // oversize > budget
      ("B", 2L, 100L), ("B", 3L, 100L)
    ).toDF("source", "doc_id", "n")
    val out = Export.byteBudgetShards(rows, "doc_id", col("n"),
        budget = 1000L, strataCols = Seq("source"))
      .select($"source", $"doc_id", $"n", $"shard_id")
      .as[(String, Long, Long, Long)].collect()
      .sortBy(t => (t._1, t._2))
    assert(out.map(t => (t._1, t._2, t._4)).toSeq == Seq(
      ("A", 1L, 0L), ("A", 2L, 0L), ("A", 3L, 0L), // 1100 overflows only AFTER item 3 opened in shard 0
      ("A", 4L, 1L),
      ("B", 1L, 0L), ("B", 2L, 5L), ("B", 3L, 5L)))
    // invariant: a shard's bytes exceed the budget only via its LAST
    // item (the open-shard overflow) or a single oversize item
    out.groupBy(t => (t._1, t._4)).foreach { case (_, items) =>
      val sorted = items.sortBy(_._2)
      val beforeLast = sorted.init.map(_._3).sum
      assert(beforeLast <= 1000L,
        s"closed items alone exceed the budget: ${sorted.mkString(",")}")
    }
    // determinism: identical re-run, shuffled input order
    val again = Export.byteBudgetShards(
        rows.orderBy(rand(seed = 7)), "doc_id", col("n"),
        budget = 1000L, strataCols = Seq("source"))
      .select($"source", $"doc_id", $"shard_id")
      .as[(String, Long, Long)].collect().sortBy(t => (t._1, t._2))
    assert(again.toSeq == out.map(t => (t._1, t._2, t._4)).toSeq)
  }

  test("shards preserve rows, cover disjoint sorted ranges, manifest matches") {
    import spark.implicits._
    val df = graft.util.Tables.load(spark, "/root/testdata/sf0.01", "documents")
    val total = df.count()
    val dir = tmp()
    val (files, rows) = Export.shardedWrite(df, dir, "doc_id", numShards = 8)
    assert(rows == total)
    assert(files.size >= 4 && files.size <= 8) // range split may merge tails
    // manifest lines = files, counts sum to total, ranges disjoint
    val manifest = new String(Files.readAllBytes(
      Paths.get(dir, "_manifest.jsonl"))).split("\n").filter(_.nonEmpty)
    assert(manifest.length == files.size)
    val ranges = manifest.map { l =>
      val mn = "\"min\": \"(\\d+)\"".r.findFirstMatchIn(l).get.group(1).toLong
      val mx = "\"max\": \"(\\d+)\"".r.findFirstMatchIn(l).get.group(1).toLong
      (mn, mx)
    }.sortBy(_._1)
    ranges.foreach { case (mn, mx) => assert(mn <= mx) }
    ranges.sliding(2).foreach {
      case Array((_, mx1), (mn2, _)) => assert(mx1 < mn2, "overlapping shards")
      case _ => ()
    }
    // round-trip: reading the shards back equals the input
    val back = spark.read.parquet(dir)
    assert(back.count() == total)
    assert(back.select("doc_id").except(df.select("doc_id")).count() == 0)
    // reproducible: a second export yields the same distribution
    val dir2 = tmp()
    val (files2, rows2) = Export.shardedWrite(df, dir2, "doc_id", numShards = 8)
    assert(rows2 == total && files2.size == files.size)
  }
}
