package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Test => SCTest, Prop}
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.Apply

/** Property-based check of the merge core: for ANY set of change
  * events and ANY way of splitting them into ordered micro-batches,
  * the final state is identical — the sort-key guard makes apply
  * associative-enough that batching is invisible. This is the
  * at-least-once / out-of-order delivery guarantee (SURVEY §7.4
  * hard-part 1) as an algebraic law rather than a fixture test. */
class MergePropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  case class Ev(pk: Long, ts: Long, scn: Long, op: String, v: Double)

  private def toDf(events: Seq[Ev]): DataFrame = {
    import spark.implicits._
    // tuples, not the inner case class (inner-class encoders capture
    // the suite instance)
    events.map(e => (e.pk, e.ts, e.scn, e.op, e.v))
      .toDF("pk", "ts", "scn", "op", "v")
      .select(
        struct($"pk", $"v").as("row"),
        $"op",
        struct($"ts".as("ts_ms"), $"scn", lit("").as("rs_id"),
          lit(0L).as("ssn")).as("sort_key"))
  }

  private def finalState(batches: Seq[Seq[Ev]]): Seq[String] = {
    val st = batches.zipWithIndex.foldLeft(Option.empty[DataFrame]) {
      case (acc, (batch, i)) =>
        if (batch.isEmpty) acc
        else Some(Apply.merge(acc, toDf(batch), Seq("pk"), i.toLong))
    }
    st.map(_.select("pk", "v", "_is_deleted", "_sort_key")
        .orderBy("pk").collect().map(_.toString).toSeq)
      .getOrElse(Nil)
  }

  test("final state is invariant under batch splitting (scalacheck)") {
    val genEv = for {
      pk <- Gen.choose(1L, 4L)
      ts <- Gen.choose(1L, 5L)
      scn <- Gen.choose(1L, 3L)
      op <- Gen.oneOf("INSERT", "UPDATE", "DELETE")
      v <- Gen.choose(0, 99).map(_.toDouble)
    } yield Ev(pk, ts, scn, op, v)

    // events with unique sort keys per PK (real sort keys are unique:
    // scn/ssn increase per statement)
    val genEvents = Gen.listOfN(8, genEv).map(
      _.groupBy(e => (e.pk, e.ts, e.scn)).values.map(_.head).toList)
    val genSplit = Gen.choose(1, 4)

    val prop = Prop.forAll(genEvents, genSplit) { (events, nSplits) =>
      val single = finalState(Seq(events))
      val batches = events.grouped(
        math.max(1, events.size / nSplits)).toSeq
      val split = finalState(batches)
      val shuffled = finalState(batches.reverse) // batches out of order
      single == split && single == shuffled
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(result.passed, result.status.toString)
  }

  test("scd2 equals an independent in-memory reference on random " +
      "change streams, regardless of delivery order (scalacheck)") {
    val genEv = for {
      pk <- Gen.choose(1L, 4L)
      ts <- Gen.choose(1L, 5L)
      scn <- Gen.choose(1L, 3L)
      op <- Gen.oneOf("UPDATE", "UPDATE", "DELETE") // updates dominate
      v <- Gen.choose(0, 99).map(_.toDouble)
    } yield Ev(pk, ts, scn, op, v)
    // unique sort key per PK (scd2's dedup contract is on
    // (pk, sort_key, op); colliding keys with different payloads are
    // not a real stream)
    val genEvents = Gen.listOfN(10, genEv).map(
      _.groupBy(e => (e.pk, e.ts, e.scn)).values.map(_.head).toList)

    def reference(events: Seq[Ev]): Seq[(Long, Int, Double,
        Long, Option[Long], Boolean)] =
      events.groupBy(_.pk).toSeq.flatMap { case (pk, evs) =>
        val ordered = evs.distinct.sortBy(e =>
          (e.ts, e.scn, if (e.op == "DELETE") 1 else 0))
        val closes = ordered.map(_.ts).drop(1).map(Some(_)) :+ None
        ordered.zip(closes).filter(_._1.op != "DELETE")
          .zipWithIndex.map { case ((e, to), i) =>
            (pk, i + 1, e.v, e.ts, to, to.isEmpty)
          }
      }.sortBy(t => (t._1, t._2))

    val prop = Prop.forAll(genEvents) { events =>
      import spark.implicits._
      def run(evs: Seq[Ev]) =
        Apply.scd2(toDf(evs), Seq("pk"), Seq("v"))
          .orderBy($"pk", $"version").collect()
          .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2),
            r.getLong(3), Option(r.get(4)).map(_.asInstanceOf[Long]),
            r.getBoolean(5))).toSeq
      events.isEmpty ||
        (run(events) == reference(events) &&
         run(scala.util.Random.shuffle(events)) == reference(events))
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(result.passed, result.status.toString)
  }
}
