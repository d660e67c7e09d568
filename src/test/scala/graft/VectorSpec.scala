package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Vectors
import graft.ops.Similarity

class VectorSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def df = {
    import spark.implicits._
    Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)),
      (2L, Seq(0.0f, 1.0f, 0.0f)),
      (3L, Seq(1.0f, 1.0f, 0.0f)),
      (4L, Seq(2.0f, 0.0f, 0.0f))
    ).toDF("id", "vec")
  }

  test("cosine expression: exact values, nulls, mismatched lengths") {
    import spark.implicits._
    val pairs = df.as("a").crossJoin(df.as("b"))
      .select($"a.id".as("i"), $"b.id".as("j"),
        Vectors.cosine($"a.vec", $"b.vec").as("cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) Double.NaN else r.getDouble(2))).toMap
    assert(pairs((1L, 2L)) == 0.0)
    assert(pairs((1L, 4L)) == 1.0)
    assert(math.abs(pairs((1L, 3L)) - 1.0 / math.sqrt(2)) < 1e-12)

    val mismatch = Seq((Seq(1.0f), Seq(1.0f, 2.0f))).toDF("a", "b")
      .select(Vectors.cosine($"a", $"b")).collect().head
    assert(mismatch.isNullAt(0))
    val zero = Seq((Seq(0.0f, 0.0f), Seq(1.0f, 1.0f))).toDF("a", "b")
      .select(Vectors.cosine($"a", $"b")).collect().head
    assert(zero.isNullAt(0))
  }

  test("cosine expression participates in whole-stage codegen") {
    import spark.implicits._
    // parquet-backed scan (LocalTableScan would bypass codegen)
    val emb = graft.util.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val plan = emb.select(Vectors.cosine($"embedding", $"embedding"))
      .queryExecution.executedPlan.toString
    // "*(n)" marks a WholeStageCodegen stage in the plan string
    assert(plan.contains("*(1) Project [cosinesimilarity"))
  }

  test("MIPS top-k ranks by raw dot product, not cosine") {
    import spark.implicits._
    // id 4 = (2,0,0) beats id 3 = (1,1,0) on dot product against
    // (1,0,0), while cosine ties them differently — MIPS must rank by
    // magnitude-weighted score
    val qs = Seq((1L, Seq(1.0f, 0.0f, 0.0f))).toDF("qid", "qvec")
    val corpus = df.select($"id", $"vec")
    val got = Similarity.mipsTopK(qs, corpus, 3)
      .orderBy($"rank").collect()
      .map(r => (r.getLong(1), r.getDouble(2))).toSeq
    assert(got == Seq((4L, 2.0), (3L, 1.0), (2L, 0.0)))
  }

  test("ANN recall against brute force on real embeddings") {
    import spark.implicits._
    val emb = graft.util.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val qs = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val corpus = emb.select($"vec_id".as("id"), $"embedding".as("vec"))
    val exact = Similarity.bruteForceTopK(qs, corpus, 10)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.annTopK(qs, corpus, 10)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & ann).size.toDouble / exact.size
    info(s"sign-LSH recall@10 = $recall (hamming<=1 probes of 8 bits)")
    assert(recall > 0.2) // multi-probe over 256 buckets on 500 vecs
    assert(ann.nonEmpty)

    val ivf = Similarity.ivfTopK(qs, corpus, 10)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfRecall = (exact & ivf).size.toDouble / exact.size
    info(s"IVF recall@10 = $ivfRecall (nprobe=4 of 16 learned cells)")
    // learned spherical-k-means cells must not regress below the
    // lowest-id-centroid baseline this replaced (0.88)
    assert(ivfRecall >= 0.88)

    val pq = Similarity.pqTopK(qs, corpus, 10)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pqRecall = (exact & pq).size.toDouble / exact.size
    info(s"PQ-ADC recall@10 = $pqRecall (m=16 ksub=32, shortlist=50, re-ranked)")
    // the ADC shortlist (50 of 500) + exact re-rank must recover the
    // exact top-10 almost completely on this corpus
    assert(pqRecall >= 0.85)

    val ivfpq = Similarity.ivfPqTopK(qs, corpus, 10)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfpqRecall = (exact & ivfpq).size.toDouble / exact.size
    info(s"IVF+PQ recall@10 = $ivfpqRecall (nlist=16 nprobe=4, m=16 ksub=32)")
    // combined recall is bounded by the IVF probe (0.88 floor above);
    // the ADC+re-rank inside probed cells should cost little extra
    assert(ivfpqRecall >= 0.8)
  }

  test("persisted vector index serves ivfPqTopK-identical results and " +
      "prunes unprobed cell partitions at the scan") {
    import spark.implicits._
    import graft.ops.VectorIndex
    val emb = graft.util.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val qs = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val corpus = emb.select($"vec_id".as("id"), $"embedding".as("vec"))
    val dir = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), "vindex")
      .toString
    VectorIndex.build(corpus, dir)
    val served = VectorIndex.search(spark, dir, qs, 10)
      .orderBy($"qid", $"rank").collect().map(_.toSeq).toSeq
    val memory = Similarity.ivfPqTopK(qs, corpus, 10)
      .orderBy($"qid", $"rank").collect().map(_.toSeq).toSeq
    assert(served == memory, "served result diverges from in-memory IVF+PQ")

    // partition pruning is IN THE PLAN: one query probing 2 of 16
    // cells must scan the cells relation with a cid PartitionFilter
    val one = qs.filter($"qid" === 0)
    val df = VectorIndex.search(spark, dir, one, 5, nprobe = 2)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val cellScans = p.linesIterator
      .filter(l => l.contains("Scan parquet") && l.contains("/cells"))
      .toSeq
    assert(cellScans.nonEmpty, s"no cells scan found:\n$p")
    assert(cellScans.forall(l =>
      l.contains("PartitionFilters: [") && !l.contains("PartitionFilters: []")),
      s"cells scan not partition-pruned:\n${cellScans.mkString("\n")}")
  }

  test("index append under frozen quantizers: append+serve equals " +
      "reindex+serve, sidecars never move, stats sees the increment") {
    import spark.implicits._
    import graft.ops.VectorIndex
    val emb = graft.util.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val qs = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val corpus = emb.select($"vec_id".as("id"), $"embedding".as("vec"))
    val baseCorpus = corpus.filter($"id" % 10 =!= 0)
    val increment = corpus.filter($"id" % 10 === 0)
    def tmp() = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), "vappend")
      .toString

    // dirA: build on the base, then APPEND the increment
    val dirA = tmp()
    VectorIndex.build(baseCorpus, dirA)
    val baseCells = VectorIndex.stats(spark, dirA)
      .agg(sum($"n_vectors")).as[Long].head()
    val sidecarsBefore = Seq("centroids", "codebook").map { s =>
      java.nio.file.Files.list(java.nio.file.Paths.get(dirA, s))
        .toArray.map(_.toString).sorted.toSeq
    }
    VectorIndex.append(increment, dirA)
    // quantizer sidecars are FROZEN: append must not rewrite them
    val sidecarsAfter = Seq("centroids", "codebook").map { s =>
      java.nio.file.Files.list(java.nio.file.Paths.get(dirA, s))
        .toArray.map(_.toString).sorted.toSeq
    }
    assert(sidecarsBefore == sidecarsAfter, "append rewrote a quantizer sidecar")

    // dirB: same training data (so identical quantizers via the same
    // deterministic trainer), cells REWRITTEN for the union in one pass
    val dirB = tmp()
    VectorIndex.build(baseCorpus, dirB)
    VectorIndex.reindex(baseCorpus.union(increment), dirB)

    val servedA = VectorIndex.search(spark, dirA, qs, 10)
      .orderBy($"qid", $"rank").collect().map(_.toSeq).toSeq
    val servedB = VectorIndex.search(spark, dirB, qs, 10)
      .orderBy($"qid", $"rank").collect().map(_.toSeq).toSeq
    assert(servedA == servedB,
      "appended index diverges from reindex under the same quantizers")

    // the increment is visible in the balance report
    val total = VectorIndex.stats(spark, dirA)
      .agg(sum($"n_vectors")).as[Long].head()
    val incN = increment.count()
    assert(total == baseCells + incN,
      s"stats: expected $baseCells+$incN vectors, saw $total")
  }

  test("index delete: tombstones hide ids immediately, compact folds " +
      "them into the cells and clears the sidecar, results unchanged") {
    import spark.implicits._
    import graft.ops.VectorIndex
    val emb = graft.util.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val qs = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val corpus = emb.select($"vec_id".as("id"), $"embedding".as("vec"))
    val dir = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), "vdelete")
      .toString
    VectorIndex.build(corpus, dir)
    val deleted = corpus.filter($"id" % 7 === 0).select($"id")
    val delSet = deleted.as[Long].collect().toSet
    VectorIndex.delete(spark, dir, deleted)
    // delete is O(batch): a tombstone sidecar exists, cells untouched
    assert(new java.io.File(s"$dir/tombstones").exists())
    val served = VectorIndex.search(spark, dir, qs, 10)
      .orderBy($"qid", $"rank").collect()
    assert(served.nonEmpty)
    assert(!served.exists(r => delSet(r.getLong(1))),
      "a tombstoned id was served")
    // compact: same results, tombstones gone, stats reflect the drop
    VectorIndex.compact(spark, dir)
    assert(!new java.io.File(s"$dir/tombstones").exists(),
      "compact left the tombstone sidecar")
    val compacted = VectorIndex.search(spark, dir, qs, 10)
      .orderBy($"qid", $"rank").collect().map(_.toSeq).toSeq
    assert(compacted == served.map(_.toSeq).toSeq,
      "compaction changed the serve result")
    val total = VectorIndex.stats(spark, dir)
      .agg(sum($"n_vectors")).as[Long].head()
    assert(total == corpus.count() - delSet.size,
      s"stats after compact: $total")
    // compact with no tombstones is a no-op
    VectorIndex.compact(spark, dir)
    assert(VectorIndex.search(spark, dir, qs, 10)
      .orderBy($"qid", $"rank").collect().map(_.toSeq).toSeq == compacted)
  }

  test("tombstones are generation-scoped: a re-appended id serves " +
      "immediately without compaction, and an update (delete + " +
      "re-append) never hides the new row") {
    import spark.implicits._
    import graft.ops.VectorIndex
    val emb = graft.util.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val qs = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val corpus = emb.select($"vec_id".as("id"), $"embedding".as("vec"))
    val dir = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), "vresurrect")
      .toString
    VectorIndex.build(corpus, dir)
    val victims = corpus.filter($"id" % 7 === 0)
    val vicSet = victims.select($"id").as[Long].collect().toSet

    // delete, then RE-INSERT the same ids (a later CDC commit
    // resurrecting them, or an update's re-embed) — NO compaction
    VectorIndex.delete(spark, dir, victims.select($"id"))
    VectorIndex.append(victims, dir)
    val served = VectorIndex.search(spark, dir, qs, 10)
      .orderBy($"qid", $"rank").collect().map(_.toSeq).toSeq
    // the index now holds the same live rows as a fresh build of the
    // full corpus: an id-keyed tombstone would hide every victim and
    // diverge; the generation-scoped form must serve identically
    val dirRef = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), "vresurrectR")
      .toString
    VectorIndex.build(corpus, dirRef)
    val ref = VectorIndex.search(spark, dirRef, qs, 10)
      .orderBy($"qid", $"rank").collect().map(_.toSeq).toSeq
    assert(served == ref,
      "resurrected ids diverge from a fresh index of the same corpus")
    assert(served.exists(r => vicSet(r.asInstanceOf[Seq[Any]](1)
      .asInstanceOf[Long])) || !ref.exists(r =>
      vicSet(r.asInstanceOf[Seq[Any]](1).asInstanceOf[Long])),
      "no resurrected id was served though the reference serves some")

    // a SECOND delete after the re-append must hide them again (the
    // new tombstone records the later generation)
    VectorIndex.delete(spark, dir, victims.select($"id"))
    val afterRedelete = VectorIndex.search(spark, dir, qs, 10)
      .orderBy($"qid", $"rank").collect()
    assert(!afterRedelete.exists(r => vicSet(r.getLong(1))),
      "a re-deleted id was served")
    // and compaction folds both generations away with no result change
    VectorIndex.compact(spark, dir)
    assert(VectorIndex.search(spark, dir, qs, 10)
      .orderBy($"qid", $"rank").collect().map(_.toSeq).toSeq ==
      afterRedelete.map(_.toSeq).toSeq,
      "compaction changed the re-deleted serve result")
  }

  test("filtered vector search: the predicate pushes into the probed-cell " +
      "scan and recall vs filtered brute force holds") {
    import spark.implicits._
    import graft.ops.VectorIndex
    val emb = graft.util.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val qs = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val corpus = emb.select($"vec_id".as("id"), $"embedding".as("vec"), $"label")
    val dir = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), "vindexf")
      .toString
    VectorIndex.build(corpus, dir, metaCols = Seq("label"))
    val df = VectorIndex.search(spark, dir, qs, 10, nprobe = 10,
      where = Some($"label" === 1))
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1)))

    // every hit satisfies the predicate
    val labelOf = corpus.select($"id", $"label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got.forall { case (_, id) => labelOf(id) == 1 },
      "filtered search returned a non-matching vector")
    // k survivors per query (the filter thins cells, never starves the
    // shortlist at this selectivity)
    assert(got.groupBy(_._1).forall(_._2.length == 10), "fewer than k hits")

    val exact = graft.ops.Similarity.bruteForceTopK(qs,
        corpus.filter($"label" === 1).select($"id", $"vec"), 10)
      .select("qid", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & got.toSet).size.toDouble / exact.size
    info(s"filtered recall@10 = $recall (label=1, nlist=16 nprobe=10)")
    assert(recall >= 0.7)

    // the predicate is IN THE SCAN: probed-cell read carries a label
    // PushedFilter (row-group pruning), on top of the cid partition
    // pruning the unfiltered test pins
    val p = df.queryExecution.executedPlan.toString
    val cellScans = p.linesIterator
      .filter(l => l.contains("Scan parquet") && l.contains("/cells"))
      .toSeq
    assert(cellScans.nonEmpty, s"no cells scan found:\n$p")
    assert(cellScans.exists(l => l.contains("PushedFilters: [") &&
      l.replaceAll(".*PushedFilters: \\[([^\\]]*)\\].*", "$1").contains("label")),
      s"label predicate not pushed into the cells scan:\n${cellScans.mkString("\n")}")
  }

  test("approximate kNN graph (VectorIndex.knnGraph): deterministic " +
      "across runs, excludes tombstoned rows from both endpoints, and " +
      "k edges per live vector") {
    import spark.implicits._
    import graft.ops.VectorIndex
    val emb = graft.util.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val corpus = emb.select($"vec_id".as("id"), $"embedding".as("vec"))
    val dir = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), "vgraph")
      .toString
    VectorIndex.build(corpus, dir)
    val g1 = VectorIndex.knnGraph(spark, dir, k = 5, nprobe = 8)
      .orderBy($"qid", $"rank").collect().map(_.toSeq).toSeq
    val n = corpus.count()
    assert(g1.map(_.head).distinct.size == n, "not every vector has edges")
    assert(g1.size == n * 5, "not k edges per vector")
    val g2 = VectorIndex.knnGraph(spark, dir, k = 5, nprobe = 8)
      .orderBy($"qid", $"rank").collect().map(_.toSeq).toSeq
    assert(g1 == g2, "approx graph is not deterministic")

    // tombstoned ids vanish from BOTH graph endpoints without compaction
    val victims = corpus.filter($"id" % 5 === 0).select($"id")
    val vicSet = victims.as[Long].collect().toSet
    VectorIndex.delete(spark, dir, victims)
    val g3 = VectorIndex.knnGraph(spark, dir, k = 5, nprobe = 8).collect()
    assert(g3.nonEmpty)
    assert(!g3.exists(r => vicSet(r.getLong(0)) || vicSet(r.getLong(1))),
      "a tombstoned id appears in the graph")
  }

  test("TopKBuckets.partialTopK == TopKByScore aggregator under high " +
      "key cardinality, with the flush valve exercised") {
    import spark.implicits._
    // 500 keys × 40 candidates, scores engineered with ties; flush
    // every 7 keys so level-1 emits many partial fragments per key
    val cand = spark.range(500 * 40).as[Long].map { i =>
      (i % 500, i, ((i * 2654435761L) % 97).toDouble)  // heavy ties
    }
    val viaHeaps = graft.functions.TopKBuckets
      .partialTopK(cand, k = 5, flushEvery = 7)
      .collect().map(t => (t._1, t._2)).toSet
    val viaAgg = cand.groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(graft.functions.TopKByScore(5).toColumn.name("ids"))
      .flatMap { case (k, ids) => ids.map(i => (k, i)) }
      .collect().toSet
    assert(viaHeaps == viaAgg)
    assert(viaHeaps.size == 500 * 5)
  }

  test("knnGraph SHUFFLE_HASH branch (broadcastRows=0) matches the " +
      "broadcast branch") {
    import spark.implicits._
    import graft.ops.VectorIndex
    val emb = graft.util.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val corpus = emb.select($"vec_id".as("id"), $"embedding".as("vec"))
    val dir = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), "vgraphsh")
      .toString
    VectorIndex.build(corpus, dir)
    val bc = VectorIndex.knnGraph(spark, dir, k = 5, nprobe = 8)
      .orderBy($"qid", $"rank").collect().map(_.toSeq).toSeq
    val sh = VectorIndex.knnGraph(spark, dir, k = 5, nprobe = 8,
        broadcastRows = 0L)
      .orderBy($"qid", $"rank").collect().map(_.toSeq).toSeq
    assert(bc == sh, "join strategy changed the graph")
  }

  test("empty-index lifecycle: delete-everything + compact keeps the " +
      "index servable, append revives it, and a crashed compaction " +
      "promote is restored on the next read") {
    import spark.implicits._
    import graft.ops.VectorIndex
    val emb = graft.util.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val qs = emb.filter($"vec_id" < 3)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val corpus = emb.select($"vec_id".as("id"), $"embedding".as("vec"))
    val dir = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), "vempty")
      .toString
    VectorIndex.build(corpus, dir)
    // tombstone EVERY row, then compact: the partitioned rewrite of an
    // empty relation leaves no data files — the index must stay
    // servable (schema sidecar fallback), not die on schema inference
    VectorIndex.delete(spark, dir, corpus.select($"id"))
    VectorIndex.compact(spark, dir)
    assert(VectorIndex.search(spark, dir, qs, 5).collect().isEmpty,
      "emptied index served rows")
    assert(VectorIndex.stats(spark, dir).collect().isEmpty)
    // delete/compact on the already-empty index (currentGen guard)
    VectorIndex.delete(spark, dir, corpus.limit(1).select($"id"))
    VectorIndex.compact(spark, dir)
    // append revives it — the frozen quantizer sidecars are intact
    val part = corpus.filter($"id" % 3 === 0)
    VectorIndex.append(part, dir)
    val revived = VectorIndex.search(spark, dir, qs, 5)
      .orderBy($"qid", $"rank").collect().map(_.toSeq).toSeq
    assert(revived.nonEmpty, "append after full compaction did not serve")

    // crash simulation: a compaction that died between its two promote
    // renames leaves cells_old (authoritative) and no cells — the next
    // read must restore it and serve the pre-crash results
    java.nio.file.Files.move(
      java.nio.file.Paths.get(s"$dir/cells"),
      java.nio.file.Paths.get(s"$dir/cells_old"))
    new java.io.File(s"$dir/cells_compacting").mkdirs()
    val afterCrash = VectorIndex.search(spark, dir, qs, 5)
      .orderBy($"qid", $"rank").collect().map(_.toSeq).toSeq
    assert(afterCrash == revived,
      "crashed-compaction restore diverged from the pre-crash serve")
    assert(new java.io.File(s"$dir/cells").exists() &&
      !new java.io.File(s"$dir/cells_old").exists(),
      "restore did not promote cells_old back")
  }

  test("PQ kernels: codegen path equals a hand-rolled reference; " +
      "length mismatch yields null") {
    import spark.implicits._
    import graft.functions.ProductQuantizer
    // 2 subspaces × 2 codes × 2 dims
    val cb: IndexedSeq[IndexedSeq[Seq[Float]]] = IndexedSeq(
      IndexedSeq(Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)),
      IndexedSeq(Seq(-1.0f, 0.0f), Seq(0.5f, 0.5f)))
    val df = Seq(
      (1L, Seq(0.9f, 0.1f, 0.4f, 0.6f)), // sub0 → code0, sub1 → code1
      (2L, Seq(0.0f, 2.0f, -1.0f, 0.0f)), // sub0 → code1, sub1 → code0
      (3L, Seq(1.0f, 0.0f))               // wrong length → null
    ).toDF("id", "vec")
    val got = df.select($"id", ProductQuantizer.codes($"vec", cb).as("c"),
        ProductQuantizer.lut($"vec", cb).as("l"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getSeq[Int](1),
        if (r.isNullAt(2)) null else r.getSeq[Double](2))).toSeq
    assert(got(0)._2 == Seq(0, 1))
    assert(got(1)._2 == Seq(1, 0))
    assert(got(2)._2 == null && got(2)._3 == null)
    // LUT of row 1 (the kernel unit-normalizes the input first):
    // [q̂0·c00, q̂0·c01, q̂1·c10, q̂1·c11]
    val n = math.sqrt(0.9 * 0.9 + 0.1 * 0.1 + 0.4 * 0.4 + 0.6 * 0.6)
    val l0 = got(0)._3
    assert(math.abs(l0(0) - 0.9 / n) < 1e-6 && math.abs(l0(1) - 0.1 / n) < 1e-6)
    assert(math.abs(l0(2) - (-0.4 / n)) < 1e-6 &&
      math.abs(l0(3) - (0.4 / n + 0.6 / n) / 2) < 1e-6)
  }

  test("PQ kernel property: codes/lut equal an independent reference on " +
      "random vectors and codebooks") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import graft.functions.PqKernel
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val m = 4; val ksub = 3; val ds = 2; val dim = m * ds
    val fGen = Gen.chooseNum(-5.0, 5.0).map(_.toFloat)
    val vecGen = Gen.listOfN(dim, fGen).map(_.toArray)
    val cbGen = Gen.listOfN(m * ksub * ds, fGen).map(_.toArray)
    val prop = Prop.forAll(vecGen, cbGen) { (vec, cb) =>
      val nrm = math.sqrt(vec.map(x => x.toDouble * x).sum)
      if (nrm == 0.0) {
        PqKernel.codes(new GenericArrayData(vec), cb, m, ksub) == null
      } else {
        val got = PqKernel.codes(new GenericArrayData(vec), cb, m, ksub)
        val gotLut = PqKernel.lut(new GenericArrayData(vec), cb, m, ksub)
        (0 until m).forall { s =>
          val dists = (0 until ksub).map { c =>
            (0 until ds).map { i =>
              val d = vec(s * ds + i) / nrm - cb((s * ksub + c) * ds + i)
              d * d
            }.sum
          }
          val dots = (0 until ksub).map { c =>
            (0 until ds).map(i =>
              vec(s * ds + i) / nrm * cb((s * ksub + c) * ds + i)).sum
          }
          got.getInt(s) == dists.indexOf(dists.min) &&
            (0 until ksub).forall(c =>
              math.abs(gotLut.getDouble(s * ksub + c) - dots(c)) < 1e-9)
        }
      }
    }
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
    // wrong-length input is null, never an exception
    assert(PqKernel.codes(new GenericArrayData(Array(1.0f)),
      new Array[Float](m * ksub * ds), m, ksub) == null)
  }

  test("PQ encode/score is deterministic and ranks self-similar vectors first") {
    import spark.implicits._
    val emb = graft.util.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val qs = emb.filter($"vec_id" < 3)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val corpus = emb.select($"vec_id".as("id"), $"embedding".as("vec"))
    val a = Similarity.pqTopK(qs, corpus, 5).collect().map(_.toString).sorted.toSeq
    val b = Similarity.pqTopK(qs, corpus, 5).collect().map(_.toString).sorted.toSeq
    assert(a == b, "pqTopK must replay identically (no RNG anywhere)")
    // ranks are contiguous 1..5 per query
    val ranks = Similarity.pqTopK(qs, corpus, 5)
      .groupBy($"qid").agg(collect_list($"rank").as("rs")).collect()
    ranks.foreach(r =>
      assert(r.getSeq[Int](1).sorted == Seq(1, 2, 3, 4, 5), r.toString))
  }

  test("knnGraph is EXACT: equals brute-force self top-k on real embeddings") {
    import spark.implicits._
    val emb = graft.util.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    // brute-force reference: every vector as its own query
    val all = emb.select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val corpus = emb.select($"vec_id".as("id"), $"embedding".as("vec"))
    val exact = Similarity.bruteForceTopK(all, corpus, 5)
      .select("qid", "id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val graph = Similarity.knnGraph(emb, "vec_id", "embedding", k = 5,
        nlist = 16)
      .select("qid", "id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(graph == exact,
      s"diff: missing=${(exact -- graph).take(5)} extra=${(graph -- exact).take(5)}")
  }

  test("knnGraph big-quantizer branch (nc > 64, broadcast-table assignment) stays exact") {
    import spark.implicits._
    val emb = graft.util.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val all = emb.select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val corpus = emb.select($"vec_id".as("id"), $"embedding".as("vec"))
    val exact = Similarity.bruteForceTopK(all, corpus, 5)
      .select("qid", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val graph = Similarity.knnGraph(emb, "vec_id", "embedding", k = 5,
        nlist = 100)
      .select("qid", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(graph == exact)
  }

  test("knnGraph work-budget guard fails fast with guidance on over-budget corpora") {
    import spark.implicits._
    val emb = graft.util.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val e = intercept[graft.util.Retry.FatalPipelineException] {
      Similarity.knnGraph(emb, "vec_id", "embedding", k = 5,
        nlist = 16, maxComparisons = 1000L).count()
    }
    assert(e.getMessage.contains("work budget"), e.getMessage)
    assert(e.getMessage.contains("VectorIndex.knnGraph"), e.getMessage)
  }

  test("knnGraph exactness survives a degenerate quantizer (nlist=1 and nlist=3)") {
    import spark.implicits._
    val emb = graft.util.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .filter($"vec_id" < 60)
    val all = emb.select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val corpus = emb.select($"vec_id".as("id"), $"embedding".as("vec"))
    val exact = Similarity.bruteForceTopK(all, corpus, 3)
      .select("qid", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    for (nl <- Seq(1, 3)) {
      val graph = Similarity.knnGraph(emb, "vec_id", "embedding", k = 3,
          nlist = nl)
        .select("qid", "id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(graph == exact, s"nlist=$nl")
    }
  }

  test("driftSignal: proportional growth never flags; a hot-cell append " +
      "flags; losing every gen-0 row reads as full drift") {
    import spark.implicits._
    import graft.ops.VectorIndex
    val emb = graft.util.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val corpus = emb.select($"vec_id".as("id"), $"embedding".as("vec"))
    val n = corpus.count()
    def tmp(tag: String) = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), tag)
      .toString
    def sig(dir: String) =
      VectorIndex.driftSignal(spark, dir).collect().head

    // fresh build: live == baseline exactly
    val dir = tmp("vdrift")
    VectorIndex.build(corpus, dir)
    val s0 = sig(dir)
    assert(s0.getAs[Double]("tv_drift") == 0.0, s0)
    assert(!s0.getAs[Boolean]("needs_retrain"), s0)
    assert(s0.getAs[Long]("n_live") == n && s0.getAs[Long]("n_base") == n)

    // proportional growth (same corpus re-appended under new ids):
    // every cell doubles, the DISTRIBUTION is unchanged — size alone
    // must never trigger a retrain
    VectorIndex.append(
      corpus.select(($"id" + 1000000L).as("id"), $"vec"), dir)
    val s1 = sig(dir)
    assert(s1.getAs[Double]("tv_drift") == 0.0, s1)
    assert(!s1.getAs[Boolean]("needs_retrain"), s1)
    assert(s1.getAs[Long]("n_live") == 2 * n)

    // hot-cell drift: 2N copies of ONE vector all land in one cell
    val hot = corpus.filter($"id" === corpus.agg(min($"id")).head.getLong(0))
      .select($"vec").limit(1)
    VectorIndex.append(
      spark.range(2000000L, 2000000L + 2 * n).toDF("id").crossJoin(hot), dir)
    val s2 = sig(dir)
    assert(s2.getAs[Double]("tv_drift") > 0.25, s2)
    assert(s2.getAs[Double]("max_share") > 0.4, s2)
    assert(s2.getAs[Boolean]("needs_retrain"), s2)

    // deleting every original row: baseline gone, tv reads 1
    val dir2 = tmp("vdriftb")
    VectorIndex.build(corpus, dir2)
    VectorIndex.append(
      corpus.select(($"id" + 1000000L).as("id"), $"vec"), dir2)
    VectorIndex.delete(spark, dir2, corpus.select($"id"))
    val s3 = sig(dir2)
    assert(s3.getAs[Double]("tv_drift") == 1.0, s3)
    assert(s3.getAs[Long]("n_base") == 0L && s3.getAs[Long]("n_live") == n)
    assert(s3.getAs[Boolean]("needs_retrain"), s3)

    // emptied index: zeros, no retrain recommendation
    VectorIndex.delete(spark, dir2,
      corpus.select(($"id" + 1000000L).as("id")))
    val s4 = sig(dir2)
    assert(s4.getAs[Long]("n_live") == 0L, s4)
    assert(s4.getAs[Double]("tv_drift") == 0.0 &&
      !s4.getAs[Boolean]("needs_retrain"), s4)

    // generation-0 is RESERVED for build/reindex: an append after a
    // compact-to-empty must land at gen ≥ 1 (currentGen floors at 0),
    // so a fully-replaced corpus reads tv=1, never a fake-0 baseline
    val dir3 = tmp("vdriftc")
    VectorIndex.build(corpus, dir3)
    VectorIndex.delete(spark, dir3, corpus.select($"id"))
    VectorIndex.compact(spark, dir3)
    VectorIndex.append(
      corpus.select(($"id" + 3000000L).as("id"), $"vec"), dir3)
    val s5 = sig(dir3)
    assert(s5.getAs[Long]("n_base") == 0L && s5.getAs[Long]("n_live") == n, s5)
    assert(s5.getAs[Double]("tv_drift") == 1.0 &&
      s5.getAs[Boolean]("needs_retrain"), s5)
  }

  test("SQ8 kernels: saturating encode, constant-dim zero step, " +
      "dequantized cosine matches a hand-rolled reference, " +
      "length mismatch yields null") {
    import spark.implicits._
    import graft.functions.ScalarQuantizer
    // dim 2: dim0 grid [0, 2.55] (step 0.01), dim1 CONSTANT at -1
    // (step 0 — every value codes to 0 and dequantizes to the min)
    val params = Array(0.0f, -1.0f, 0.01f, 0.0f)
    val df = Seq(
      (1L, Seq(1.0f, 5.0f)),
      (2L, Seq(-3.0f, 0.0f)), // below min → clamps to 0
      (3L, Seq(9.0f, 0.0f)),  // above max → saturates to 255
      (4L, Seq(1.0f))         // length ≠ params/2 → null
    ).toDF("id", "vec")
    val enc = df.select($"id",
        ScalarQuantizer.encode($"vec", typedlit(params)).as("c"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1))).toMap
    assert(enc(4L) == null)
    assert(enc(1L).length == 2)
    assert((enc(1L)(0) & 0xff) == 100 && (enc(1L)(1) & 0xff) == 0)
    assert((enc(2L)(0) & 0xff) == 0)
    assert((enc(3L)(0) & 0xff) == 255)

    // cosine against the DEQUANTIZED grid point, replicated by hand
    val q = Seq((Seq(1.0f, 0.0f), enc(1L))).toDF("qvec", "codes")
    val got = q.select(ScalarQuantizer.cosine(
      $"qvec", $"codes", typedlit(params))).collect().head.getDouble(0)
    val v0 = 0.0 + 100.0 * params(2).toDouble
    val v1 = -1.0 + 0.0 * params(3).toDouble
    val exp = (1.0 * v0 + 0.0 * v1) / (math.sqrt(1.0) *
      math.sqrt(v0 * v0 + v1 * v1))
    assert(math.abs(got - exp) < 1e-12, s"got $got, want $exp")

    val mm = Seq((Seq(1.0f), enc(1L))).toDF("qvec", "codes")
      .select(ScalarQuantizer.cosine($"qvec", $"codes", typedlit(params)))
      .collect().head
    assert(mm.isNullAt(0))
  }

  test("SQ8 recall against brute force on real embeddings, " +
      "deterministic across runs") {
    import spark.implicits._
    val emb = graft.util.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val qs = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val corpus = emb.select($"vec_id".as("id"), $"embedding".as("vec"))
    val exact = Similarity.bruteForceTopK(qs, corpus, 10)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def run() = Similarity.sqTopK(qs, corpus, 10)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val sq = run()
    val recall = (exact & sq.toSet).size.toDouble / exact.size
    info(s"SQ8 recall@10 = $recall (1 byte/dim, shortlist=50, re-ranked)")
    // 8 bits per dimension is near-lossless at this scale: the ADC
    // shortlist (50 of 500) + exact re-rank must recover the exact
    // top-10 almost completely
    assert(recall >= 0.9)
    assert(run().toSeq == sq.toSeq) // no RNG anywhere → replays identically
  }

  test("JL projection: deterministic sparse matrix replays " +
      "identically; identical vectors project identically; recall " +
      "against brute force on real embeddings") {
    import spark.implicits._
    // the map must BE a fixed linear matrix: duplicates project
    // identically, and p(x + y) = p(x) + p(y) per output dim
    val vecs = Seq(
      (1L, Seq(1.0f, 2.0f, 3.0f)),
      (2L, Seq(1.0f, 2.0f, 3.0f)),            // duplicate of 1
      (3L, Seq(-1.0f, 0.5f, 0.0f)),
      (4L, Seq(0.0f, 2.5f, 3.0f))               // = vec1 + vec3
    ).toDF("id", "vec")
    val got = Similarity.jlProject(vecs, "id", "vec", 4)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(got.values.forall(_.length == 4))
    assert(got(1L) == got(2L))
    got(4L).zip(got(1L).zip(got(3L))).foreach { case (s, (a, b)) =>
      assert(math.abs(s - (a + b)) < 1e-4, s"$s vs ${a + b}")
    }
    // ...and not a degenerate one: some output dim differs across
    // the two distinct inputs
    assert(got(1L) != got(3L))

    val emb = graft.util.Tables.load(spark, "/root/testdata/sf0.001",
      "embeddings")
    val qs = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val corpus = emb.select($"vec_id".as("id"), $"embedding".as("vec"))
    val exact = Similarity.bruteForceTopK(qs, corpus, 10)
      .select("qid", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def run() = Similarity.jlTopK(qs, corpus, 10)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val jl = run()
    val recall = (exact & jl.toSet).size.toDouble / exact.size
    info(s"JL recall@10 = $recall (64 -> 32 dims, shortlist=100, re-ranked)")
    // near-random corpus = JL's measured worst case (see jlTopK's
    // recall-boundary note); the gate bound is 0.3. Measured: 0.78 on
    // sf0.01's 500-row corpus, 0.66 on THIS sf0.001 500-row corpus
    // (different rows, same size), 0.46 on sf0.1's 2,000 rows.
    assert(recall >= 0.5)
    assert(run().toSeq == jl.toSeq) // no RNG anywhere → replays identically
  }

  test("JL recall on a CLUSTERED manifold: the operator's pitch — " +
      "real embedding corpora (cluster structure, not isotropic " +
      "noise) pay far less than the near-random worst case — gated " +
      "at recall@10 >= 0.8 with the same dOut/shortlist defaults") {
    import spark.implicits._
    // deterministic clustered corpus: 16 unit-ish centers in 64 dims,
    // 2,000 points = center + small noise (the sf0.1 size where the
    // near-random corpus measured 0.46 — same scale, favorable
    // geometry). Seeded RNG: replays identically.
    val rnd = new scala.util.Random(42)
    val dims = 64
    val centers = Array.fill(16)(Array.fill(dims)(rnd.nextGaussian().toFloat))
    val pts = (0 until 2000).map { i =>
      val c = centers(i % 16)
      (i.toLong, c.zipWithIndex.map { case (x, _) =>
        x + 0.15f * rnd.nextGaussian().toFloat }.toSeq)
    }
    val corpus = pts.toDF("id", "vec")
    val qs = pts.take(5).map { case (i, v) => (i, v) }.toDF("qid", "qvec")
    val exact = Similarity.bruteForceTopK(qs, corpus, 10)
      .select("qid", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val jl = Similarity.jlTopK(qs, corpus, 10)
      .select("qid", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & jl).size.toDouble / exact.size
    info(s"JL clustered-manifold recall@10 = $recall " +
      "(64 -> 32 dims, shortlist=100, 2000 rows, 16 clusters)")
    assert(recall >= 0.8,
      s"clustered-manifold recall $recall under the 0.8 bar — the " +
        "favorable-geometry claim is part of the operator's contract")
  }

  test("centroidOutliers: flags the row most anti-aligned with the " +
      "corpus mean, rank ascending with id tie-break") {
    import spark.implicits._
    // mean = (0.6, 0.2, 0); ascending cosine order is 5 (−0.894,
    // anti-aligned), 2 (0.316), 3 (0.894), then the colinear 1/4 tie
    // at 0.949 (broken by id)
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)),
      (2L, Seq(0.0f, 1.0f, 0.0f)),
      (3L, Seq(1.0f, 1.0f, 0.0f)),
      (4L, Seq(2.0f, 0.0f, 0.0f)),
      (5L, Seq(-1.0f, -1.0f, 0.0f))
    ).toDF("id", "vec")
    val got = Similarity.centroidOutliers(corpus, k = 3)
      .collect().map(r => (r.getInt(1 - 1), r.getLong(1), r.getDouble(2)))
    assert(got.map(_._2).toSeq == Seq(5L, 2L, 3L))
    assert(got.head._3 < 0, s"anti-aligned row must score negative: " +
      got.toSeq)
    // ranks are 1..k and ascending in cos
    assert(got.map(_._1).toSeq == Seq(1, 2, 3))
    assert(got.map(_._3).toSeq == got.map(_._3).sorted.toSeq)
    // ids 1 and 4 are colinear → equal rounded cosine → id order
    val all = Similarity.centroidOutliers(corpus, k = 5)
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    val c1 = all.find(_._1 == 1L).get._2
    val c4 = all.find(_._1 == 4L).get._2
    assert(c1 == c4)
    assert(all.map(_._1).indexOf(1L) < all.map(_._1).indexOf(4L))
  }
}
