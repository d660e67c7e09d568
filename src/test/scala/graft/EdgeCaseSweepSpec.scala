package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Adversarial-input sweep: the generated corpus is clean (no nulls,
  * no empty strings, ASCII only, uniform vector lengths), so the
  * oracle gates can never exercise the inputs a real 100 TB corpus is
  * full of. This sweep feeds deliberately hostile documents and
  * embeddings — null/empty/whitespace/single-token/huge/multi-byte
  * text, null metadata, null/empty/zero/wrong-length vectors —
  * through every documents/embeddings-family query and requires each
  * to COMPLETE (no analysis error, no runtime exception, no hang-
  * inducing skew). Output values are the oracles' business; survival
  * is this spec's.
  */
class EdgeCaseSweepSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val dir: String = {
    val d = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), "edge")
      .toString
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val huge = Seq.tabulate(5000)(i => s"w$i").mkString(" ")
    val docs = Seq(
      Row(0L, null, "en", "src0", 0L),                       // null text
      Row(1L, "", "en", "src0", 0L),                         // empty
      Row(2L, "   ", "en", "src0", 3L),                      // whitespace only
      Row(3L, "solo", "en", "src0", 4L),                     // single token
      Row(4L, "two tokens", null, null, 10L),                // null metadata
      Row(5L, huge, "en", "src1", huge.length.toLong),       // huge doc
      Row(6L, "héllo wörld 你好 世界 héllo wörld", "zh", "src1", 31L), // multi-byte
      Row(7L, "the the the the the the the the", "en", "src1", 31L), // degenerate repeat
      Row(8L, "a b c d e f g h i j k l", "en", "src2", 23L),
      Row(9L, "a b c d e f g h i j k m", "en", "src2", 23L)  // near-dup of 8
    )
    spark.createDataFrame(
        new java.util.ArrayList[Row](scala.jdk.CollectionConverters
          .SeqHasAsJava(docs).asJava), docSchema)
      .write.parquet(s"$d/documents.parquet")
    val embSchema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    def vec(f: Int => Float): Seq[Float] = Seq.tabulate(64)(f)
    val embs = Seq(
      Row(0L, null, 1),                                      // null vector
      Row(1L, Seq.empty[Float], 1),                          // empty vector
      Row(2L, vec(_ => 0f), 2),                              // zero vector
      Row(3L, Seq(1f, 2f, 3f), 2),                           // wrong length
      Row(4L, vec(i => i.toFloat), 3),
      Row(5L, vec(i => (i % 7).toFloat - 3f), 3),
      Row(6L, vec(i => (63 - i).toFloat), 4),
      Row(7L, vec(i => i.toFloat), 4),                       // duplicate of 4
      Row(8L, vec(i => math.sin(i.toDouble).toFloat), 5),
      Row(9L, vec(i => math.cos(i.toDouble).toFloat), 5))
    spark.createDataFrame(
        new java.util.ArrayList[Row](scala.jdk.CollectionConverters
          .SeqHasAsJava(embs).asJava), embSchema)
      .write.parquet(s"$d/embeddings.parquet")
    d
  }

  // documents/embeddings-only families; streaming queries excluded
  // (they glob the same files but pay a per-query floor this sweep's
  // 40+ queries would multiply; their robustness rides on the same
  // batch expressions exercised here)
  private def sweepNames: Seq[String] = SparkEntry.queries.keys.toSeq.sorted
    .filter(n => n.startsWith("t") || n.startsWith("d") ||
      n.startsWith("s") || n.startsWith("m") || n.startsWith("p"))
    .filterNot(_.contains("stream"))
    .filterNot(_ == "d16_semantic_dedup_scaled") // sqrt(N) trainer needs >k vectors
    .filterNot(_ == "s12_knn_graph")             // ditto (nlist=16 > 6 usable)
    .filterNot(_ == "s18_knn_graph_approx")      // ditto (PQ ksub=32 > 6 usable)
    .filterNot(_ == "s06_centroids")             // kmeans k exceeds usable corpus
    .filterNot(_ == "s07_quantize")
    .filterNot(_ == "s04_ann_ivf")
    .filterNot(_ == "s13_ivf_pq")
    .filterNot(_ == "s14_vector_index")
    .filterNot(_ == "s15_filtered_search")
    .filterNot(_ == "s16_index_append")
    .filterNot(_ == "s17_index_delete")
    .filterNot(_ == "s08_pq_adc")
    .filterNot(_ == "s19_index_drift")           // pqTrain ksub=32 > 6 usable

  test("every documents/embeddings query survives hostile inputs") {
    val failures = sweepNames.flatMap { name =>
      try { SparkEntry.queries(name)(spark, dir).collect(); None }
      catch { case e: Throwable =>
        Some(s"$name: ${e.getClass.getSimpleName} ${String.valueOf(e.getMessage).take(200)}")
      }
    }
    assert(failures.isEmpty,
      s"queries failing on edge-case corpus:\n${failures.mkString("\n")}")
  }

  test("events-family queries survive hostile events (null ts/keys/" +
      "values, duplicate ids, constant-key skew)") {
    val d3 = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), "edge3")
      .toString
    val evSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    def t(min: Int) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    val evs: Seq[Row] = Seq(
      Row(0L, null, 10L, "click", 1.0, "{}"),            // null ts
      Row(1L, t(1), null, "click", 2.0, "{}"),           // null user
      Row(2L, t(2), 10L, null, 3.0, "{}"),               // null type
      Row(3L, t(3), 10L, "purchase", null, "{}"),        // null value
      Row(4L, t(4), 10L, "purchase", 4.0, null),         // null props
      Row(5L, t(5), 10L, "click", 5.0, "not json"),      // junk props
      Row(5L, t(5), 10L, "click", 5.0, "not json"),      // exact duplicate row
      Row(6L, t(500), 20L, "view", 6.0, "{}"),           // far-future gap
      Row(7L, t(6), 20L, "purchase", 7.0, "{}")
    ) ++ (100 until 160).map(i =>                        // constant-key skew
      Row(i.toLong, t(10 + i % 7), 30L, "click", i.toDouble, "{}"))
    spark.createDataFrame(
        new java.util.ArrayList[Row](scala.jdk.CollectionConverters
          .SeqHasAsJava(evs).asJava), evSchema)
      .write.parquet(s"$d3/events.parquet")
    // tiny customer dim for q63/c06-style joins
    spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      .limit(50).write.parquet(s"$d3/customer.parquet")

    val eventsFamily = SparkEntry.queries.keys.toSeq.sorted.filter(n =>
      n.matches("q(1[789]|2[09]|4[1356]|5[1568]|6[123]).*") ||
        n == "c05_event_collapse" || n == "c20_scd2_history")
    val failures = eventsFamily.flatMap { name =>
      try { SparkEntry.queries(name)(spark, d3).collect(); None }
      catch { case e: Throwable =>
        Some(s"$name: ${e.getClass.getSimpleName} ${String.valueOf(e.getMessage).take(200)}")
      }
    }
    assert(failures.isEmpty,
      s"events queries failing on edge-case events:\n${failures.mkString("\n")}")
  }

  test("empty tables: every documents/embeddings/events query either " +
      "completes or fails LOUDLY (require/IllegalArgument), never with " +
      "an undocumented crash class") {
    val d4 = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), "edge4")
      .toString
    // 0-row tables with the production schemas
    Seq("documents", "embeddings", "events", "customer").foreach { t =>
      spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet")
        .limit(0).write.parquet(s"$d4/$t.parquet")
    }
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => n.startsWith("t") || n.startsWith("d") ||
        n.startsWith("s") || n.startsWith("m") || n.startsWith("p") ||
        n.matches("q(1[789]|2[09]|4[1356]|5[1568]|6[123]).*") ||
        n == "c05_event_collapse" || n == "c20_scd2_history")
      .filterNot(_.contains("stream")) // streams on empty dirs never fire a batch
    val undocumented = names.flatMap { name =>
      try { SparkEntry.queries(name)(spark, d4).collect(); None }
      catch {
        // the documented loud-failure contract: a require/guard with a
        // message (trainers need data; budgets estimate over data)
        case e: IllegalArgumentException
          if String.valueOf(e.getMessage).nonEmpty => None
        case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName} ${String.valueOf(e.getMessage).take(160)}")
      }
    }
    assert(undocumented.isEmpty,
      s"undocumented crash class on empty tables:\n${undocumented.mkString("\n")}")
  }

  test("quantizer-family ops survive hostile vectors once the corpus " +
      "is large enough to train on") {
    // pad the usable corpus (6 valid vectors) with enough well-formed
    // vectors for the kmeans/PQ trainers, keeping the hostile rows in
    import spark.implicits._
    val pad = (100L until 200L).map(i =>
      (i, Seq.tabulate(64)(j => ((i * 31 + j * 7) % 13).toFloat - 6f), 9))
      .toDF("vec_id", "embedding", "label")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"),
        $"label".cast("int").as("label"))
    val d2 = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), "edge2")
      .toString
    spark.read.parquet(s"$dir/embeddings.parquet").unionByName(pad)
      .write.parquet(s"$d2/embeddings.parquet")
    spark.read.parquet(s"$dir/documents.parquet")
      .write.parquet(s"$d2/documents.parquet")
    val quantizerFamily = Seq("s04_ann_ivf", "s06_centroids",
      "s07_quantize", "s08_pq_adc", "s13_ivf_pq", "s14_vector_index",
      "s15_filtered_search", "s16_index_append", "s17_index_delete",
      "s19_index_drift", "s20_sq8")
    val failures = quantizerFamily.flatMap { name =>
      try { SparkEntry.queries(name)(spark, d2).collect(); None }
      catch { case e: Throwable =>
        Some(s"$name: ${e.getClass.getSimpleName} ${String.valueOf(e.getMessage).take(200)}")
      }
    }
    assert(failures.isEmpty,
      s"quantizer queries failing on padded edge corpus:\n${failures.mkString("\n")}")
  }
}
