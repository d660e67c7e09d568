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
