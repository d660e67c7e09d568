package graft.ops

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Last-mile training-data export: deterministic, size-bounded shards
  * plus a manifest the downstream loader can trust.
  *
  * Shards are range partitions of `sortCol` (each shard a contiguous,
  * disjoint key range, rows sorted within), so the export is
  * reproducible run-to-run on the same input — no round-robin or
  * hash-order nondeterminism — and a loader can range-address shards
  * without opening them. The manifest (one JSON line per shard:
  * file, rows, min/max of `sortCol`) is written from one post-scan of
  * the shard files, the same stats pass the versioned table uses for
  * pruning. At 100 TB, `numShards` scales freely: range partitioning
  * shuffles once and writes in parallel; no driver bottleneck beyond
  * the manifest's one line per shard.
  */
object Export {

  /** Returns (files written, total rows). Manifest at `dir/_manifest.jsonl`. */
  def shardedWrite(df: DataFrame, dir: String, sortCol: String,
      numShards: Int): (Seq[String], Long) = {
    df.repartitionByRange(numShards, col(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode(SaveMode.Overwrite).parquet(dir)
    val stats = df.sparkSession.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(count(lit(1)).as("rows"),
        min(col(sortCol)).as("mn"), max(col(sortCol)).as("mx"))
      .collect()
      .map { r =>
        val file = r.getString(0).split("/").last
        (file, r.getLong(1), r.get(2), r.get(3))
      }
      .sortBy(_._1)
    val lines = stats.map { case (f, n, mn, mx) =>
      s"""{"file": "$f", "rows": $n, "min": "$mn", "max": "$mx"}"""
    }
    Files.write(Paths.get(dir, "_manifest.jsonl"),
      lines.mkString("", "\n", "\n").getBytes)
    (stats.map(_._1).toSeq, stats.map(_._2).sum)
  }

  /** Byte-budget shard assignment for VARIABLE-SIZE payloads — the
    * WebDataset-style layout a multimodal corpus exports to, where
    * shards must bound BYTES (loader memory / object-store part
    * size), not row counts: within each stratum, items are taken in
    * deterministic `orderCol` order and a shard closes when its byte
    * budget would overflow — `shard_id = (cum − n_bytes) div budget`,
    * the same prefix-sum discipline as sequence packing (p01) and
    * token-budget sampling (d14), so an item's shard depends only on
    * its predecessors and re-runs reproduce the layout exactly.
    *
    * An item larger than the whole budget still gets its own shard
    * (cum jumps past a boundary) — oversize media must not be
    * silently dropped; the loader sees one oversized shard.
    *
    * Scale: ONE shuffle on the stratum key; the cumulative sum is the
    * inherently sequential part and runs per stratum in parallel
    * (strata are the unit of parallelism — a corpus with one giant
    * stratum should pre-split it, the d14 contract). */
  def byteBudgetShards(df: DataFrame, orderCol: String,
      bytesCol: org.apache.spark.sql.Column, budget: Long,
      strataCols: Seq[String]): DataFrame = {
    require(strataCols.nonEmpty,
      "stratify the export: a global cumulative sum cannot parallelize")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCols.map(col): _*).orderBy(col(orderCol))
    df.withColumn("__bytes", bytesCol.cast("long"))
      .withColumn("__cum", sum(col("__bytes")).over(w))
      .withColumn("shard_id",
        expr(s"(__cum - __bytes) div ${budget}L"))
  }
}
