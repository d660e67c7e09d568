package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** d17_strip_boilerplate semantics on a hand-built corpus where the
  * covered spans are known by construction (the oracle gate checks
  * engine-vs-DuckDB parity; this pins the intended behavior). */
class BoilerplateStripSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val footer = "subscribe to our newsletter for more great content today"

  test("shared 8-gram spans are stripped; unique text and short docs survive") {
    import spark.implicits._
    val docs = Seq(
      (1L, s"alpha beta gamma $footer"),            // footer after 3 unique tokens
      (2L, s"$footer delta epsilon"),               // footer then 2 unique tokens
      (3L, "one two three four five six"),          // < 8 tokens: untouched
      (4L, "seven eight nine ten eleven twelve thirteen fourteen fifteen")
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-d17").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val out = SparkEntry.queries("d17_strip_boilerplate")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap

    // every 8-gram of the 9-token footer occurrence is shared between
    // docs 1 and 2, so all 9 footer tokens are covered in both
    assert(out(1L) == (("alpha beta gamma", 3L, 9L)))
    assert(out(2L) == (("delta epsilon", 2L, 9L)))
    // doc 3 is under the gram width: passes through byte-identical
    assert(out(3L) == (("one two three four five six", 6L, 0L)))
    // doc 4 is long enough to shingle but shares nothing
    assert(out(4L)._3 == 0L && out(4L)._1.startsWith("seven"))
  }

  test("a fully-boilerplate doc strips to the empty string") {
    import spark.implicits._
    val eight = "a1 a2 a3 a4 a5 a6 a7 a8"
    val docs = Seq(
      (1L, eight), (2L, eight), (3L, s"unique prefix words here $eight"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-d17b").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("d17_strip_boilerplate")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == (("", 0L, 8L)))
    assert(out(2L) == (("", 0L, 8L)))
    assert(out(3L) == (("unique prefix words here", 4L, 8L)))
  }
}
