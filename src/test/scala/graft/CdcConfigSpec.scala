package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.CdcConfig

class CdcConfigSpec extends AnyFunSuite {

  private val ok = CdcConfig(
    sourceGlob = "/data/changes/*.avro",
    tablePath = "/lake/t",
    checkpoint = "/lake/_ckpt/t",
    primaryKeys = Seq("ID"))

  test("valid config passes and derives trigger/decode options") {
    assert(ok.validate().isEmpty)
    assert(ok.validated() eq ok)
    assert(ok.trigger.toString.contains("30"))
    assert(ok.copy(dmlBlacklist = Set("DELETE"))
      .decodeOptions.dmlBlacklist == Set("DELETE"))
  }

  test("every problem is reported at once") {
    val bad = ok.copy(sourceGlob = " ", primaryKeys = Nil,
      triggerSeconds = 0, dmlBlacklist = Set("UPSERT"), numBuckets = -1)
    val problems = bad.validate()
    assert(problems.size == 5, problems.mkString("; "))
    val e = intercept[IllegalArgumentException](bad.validated())
    assert(e.getMessage.contains("UPSERT"))
  }

  test("cross-field rules: checkpoint clash, full blacklist, pk projection") {
    assert(ok.copy(checkpoint = "/lake/t").validate()
      .exists(_.contains("differ")))
    assert(ok.copy(dmlBlacklist = Set("INSERT", "UPDATE", "DELETE"))
      .validate().exists(_.contains("every operation")))
    assert(ok.copy(columns = Seq("A", "B")).validate()
      .exists(_.contains("retain every primary key")))
    assert(ok.copy(columns = Seq("ID", "A")).validate().isEmpty)
  }
}
