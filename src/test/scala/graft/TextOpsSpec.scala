package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Sampling, TextAnalysis}

/** The two corpus-gating ops behind t16/d14: term-blocklist filtering
  * and token-budget sampling. */
class TextOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("blocklist: the inline expression path and the broadcast " +
      "semi-join path flag exactly the same documents") {
    import spark.implicits._
    // the two paths exist for different blocklist sizes (literal array
    // vs relation); a user switching as the list grows must see the
    // identical kept set
    val docs = graft.util.Tables.load(spark, "/root/testdata/sf0.001",
      "documents")
    val terms = Seq("dup", "deadlock") // 'deadlock' is corpus-absent
    val viaExpr = docs
      .filter(TextAnalysis.blocked($"text", terms))
      .select($"doc_id").as[Long].collect().toSet
    val viaJoin = TextAnalysis
      .blockedDocs(docs, "doc_id", "text", terms.toDF("t"))
      .as[Long].collect().toSet
    assert(viaExpr.nonEmpty, "fixture must contain blocklisted docs")
    assert(viaExpr == viaJoin)
  }

  test("tokenBudgetKeep: keeps in order until the budget, drops the " +
      "doc that crosses it, strata are independent") {
    import spark.implicits._
    val docs = Seq(
      ("a", 1L, "t t t"),        // 3 tokens, cum 3
      ("a", 2L, "t t t t"),      // 4 tokens, cum 7
      ("a", 3L, "t t"),          // 2 tokens, cum 9 > 8 → dropped
      ("a", 4L, "t"),            // later doc: cum 10 → dropped too
      ("b", 1L, "t t t t t t t t"), // 8 tokens, cum 8 = budget → kept
      ("b", 2L, "t")             // cum 9 → dropped
    ).toDF("source", "doc_id", "text")
    val kept = Sampling.tokenBudgetKeep(docs, "source", "doc_id",
        TextAnalysis.tokenCount($"text"), budget = 8L)
      .filter($"keep")
      .select($"source", $"doc_id").as[(String, Long)].collect().toSet
    assert(kept == Set(("a", 1L), ("a", 2L), ("b", 1L)))
  }
}
