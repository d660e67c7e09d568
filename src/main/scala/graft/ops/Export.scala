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
}
