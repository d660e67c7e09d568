package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.util.Tables

/** Corpus-schema drift guard.
  *
  * The driver regenerates /root/testdata between rounds and has already
  * changed `events.ts`'s physical encoding once (TIMESTAMP(NANOS) →
  * TIMESTAMP(MICROS)), silently breaking every events consumer that
  * assumed one encoding. This spec pins the two seams that protect us:
  *
  *  1. `Tables.tsMicros` must yield the SAME epoch-µs longs for the
  *     same instants under every encoding the corpus has shipped
  *     (long nanos, TimestampType micros, TimestampNTZType micros) —
  *     exercised on purpose-written fixtures of each type, so the next
  *     regeneration cannot break the family without failing here.
  *  2. Every table in every generated SF must load with the logical
  *     column types the query surface assumes (a loud assert instead
  *     of a silent legacy-conf no-op).
  */
class CorpusSchemaSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDirs =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
      .filter(d => new java.io.File(d).exists())

  /** Epoch micros used by all three encodings: distinct instants with
    * sub-second parts, spanning a day boundary. */
  private val micros = Seq(
    1704067199999999L, // 2023-12-31T23:59:59.999999
    1704067200000000L, // 2024-01-01T00:00:00
    1704070800123456L, // 2024-01-01T01:00:00.123456
    1704100000000001L)

  private def tsUsOf(df: DataFrame): Seq[Long] = {
    import spark.implicits._
    df.withColumn("ts_us", Tables.tsMicros(df.schema))
      .select($"ts_us").as[Long].collect().toSeq.sorted
  }

  test("tsMicros: long-nanos, timestamp, and timestamp_ntz encodings all yield the same epoch micros") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-ts-enc").toString

    // encoding A: long nanos (what TIMESTAMP(NANOS) + nanosAsLong=true
    // arrives as — the loader never sees the parquet annotation, only
    // the resulting LongType column)
    micros.map(_ * 1000L).toDF("ts")
      .write.mode("overwrite").parquet(s"$dir/nanos")

    // encoding B: TIMESTAMP(MICROS) adjusted-to-UTC → TimestampType
    micros.toDF("us").select(timestamp_micros($"us").as("ts"))
      .write.mode("overwrite").parquet(s"$dir/micros_tz")

    // encoding C: TIMESTAMP(MICROS) not-adjusted → TimestampNTZType
    // (the current corpus encoding; cast under the UTC session tz is
    // an identity on the underlying micros)
    micros.toDF("us")
      .select(timestamp_micros($"us").cast(TimestampNTZType).as("ts"))
      .write.mode("overwrite").parquet(s"$dir/micros_ntz")

    val expected = micros.sorted
    for (enc <- Seq("nanos", "micros_tz", "micros_ntz")) {
      val df = spark.read.parquet(s"$dir/$enc")
      assert(tsUsOf(df) == expected, s"encoding $enc")
    }
    // and the loaded Spark types really are the three distinct cases
    assert(spark.read.parquet(s"$dir/nanos").schema("ts").dataType == LongType)
    assert(spark.read.parquet(s"$dir/micros_tz").schema("ts").dataType == TimestampType)
    assert(spark.read.parquet(s"$dir/micros_ntz").schema("ts").dataType == TimestampNTZType)
  }

  test("tsMicros fails loudly on an encoding it does not understand") {
    import spark.implicits._
    val df = Seq("2024-01-01").toDF("ts")
    val e = intercept[IllegalStateException](Tables.tsMicros(df.schema))
    assert(e.getMessage.contains("unexpected type"))
  }

  test("every generated SF loads with the logical types the query surface assumes") {
    assume(sfDirs.nonEmpty, "no generated corpus present")
    for (d <- sfDirs) {
      val ev = Tables.loadEvents(spark, d)
      assert(ev.schema("ts_us").dataType == LongType, s"$d events.ts_us")
      val evTypes = ev.schema.fields.map(f => f.name -> f.dataType).toMap
      assert(evTypes("event_id") == LongType, s"$d events.event_id")
      assert(evTypes("user_id") == LongType, s"$d events.user_id")
      assert(evTypes("event_type") == StringType, s"$d events.event_type")
      assert(evTypes("value") == DoubleType, s"$d events.value")
      assert(evTypes("props") == StringType, s"$d events.props") // JSON string (q34)

      // date-valued columns have shipped as timestamp[us]; the query
      // surface only applies date functions, which accept any of these
      val dateLike: Set[DataType] =
        Set(DateType, TimestampType, TimestampNTZType)
      val li = Tables.load(spark, d, "lineitem").schema
      assert(li("l_orderkey").dataType == LongType, s"$d l_orderkey")
      assert(li("l_quantity").dataType == DoubleType, s"$d l_quantity")
      assert(li("l_extendedprice").dataType == DoubleType, s"$d l_extendedprice")
      assert(dateLike.contains(li("l_shipdate").dataType), s"$d l_shipdate")
      assert(li("l_returnflag").dataType == StringType, s"$d l_returnflag")

      val o = Tables.load(spark, d, "orders").schema
      assert(o("o_orderkey").dataType == LongType, s"$d o_orderkey")
      assert(o("o_totalprice").dataType == DoubleType, s"$d o_totalprice")
      assert(dateLike.contains(o("o_orderdate").dataType), s"$d o_orderdate")

      val doc = Tables.load(spark, d, "documents").schema
      assert(doc("doc_id").dataType == LongType, s"$d doc_id")
      assert(doc("text").dataType == StringType, s"$d text")

      val emb = Tables.load(spark, d, "embeddings").schema
      assert(emb("vec_id").dataType == LongType, s"$d emb.vec_id")
      assert(emb("embedding").dataType == ArrayType(FloatType), s"$d emb.embedding")

      val c = Tables.load(spark, d, "customer").schema
      assert(c("c_custkey").dataType == LongType, s"$d c_custkey")
      assert(c("c_acctbal").dataType == DoubleType, s"$d c_acctbal")
    }
  }
}
