package graft.streaming

import java.nio.ByteBuffer
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Crash-safe consumer state for [[CdfFollow]]: the mart and the
  * commit-log version it reflects, persisted as ONE file replaced by
  * stage + atomic rename — the repo's CAS discipline at consumer
  * scale. `CdfFollow`'s delivered-watermark survives restarts, so a
  * consumer whose fold state lives only in memory resumes from an
  * empty mart while the marker suppresses every already-delivered
  * version: it silently under-counts forever. Binding (state, version)
  * into one atomic commit closes that window — after any crash the
  * mart is some prefix of the version chain, and [[commit]]'s
  * version guard makes redelivered prefixes no-ops.
  *
  * Scope: small IVM marts (aggregates, counters, per-table rollups) —
  * the state is one driver-side file. A mart that is itself a big
  * table follows the same discipline with a manifest publish
  * (graft.cdc.CdcTable IS that shape: stage segments, CAS the
  * manifest); this class is the scalar end of the spectrum.
  */
class DurableMart[S](dir: String, empty: S,
    encode: S => Array[Byte], decode: Array[Byte] => S) {

  private val file = Paths.get(dir, "mart")

  private def load(): (Long, S) =
    if (!Files.exists(file)) (-1L, empty)
    else {
      val bytes = Files.readAllBytes(file)
      val bb = ByteBuffer.wrap(bytes)
      val v = bb.getLong
      val payload = new Array[Byte](bytes.length - 8)
      bb.get(payload)
      (v, decode(payload))
    }

  @volatile private var cached: (Long, S) = load()

  /** Newest version folded into the durable state; -1 before the
    * first commit. */
  def version: Long = cached._1

  /** The durable state (the in-process cache of the committed file —
    * single-writer discipline, same as the follower's one
    * foreachBatch thread). */
  def state: S = cached._2

  /** Fold version `v` into the mart and persist (state, v) atomically.
    * Returns false — state untouched, nothing written — when `v` is
    * not NEWER than [[version]]: a redelivered version (foreachBatch
    * retry, post-crash replay) is a no-op, which is what makes the
    * whole consumer exactly-once per version. `f` runs at most once
    * per accepted version; a crash inside or after `f` but before the
    * rename leaves the previous file intact (tmp files are
    * invisible — [[load]] reads only `mart`). */
  def commit(v: Long)(f: S => S): Boolean =
    if (v <= cached._1) false
    else {
      val s1 = f(cached._2)
      val payload = encode(s1)
      val bb = ByteBuffer.allocate(8 + payload.length)
      bb.putLong(v)
      bb.put(payload)
      Files.createDirectories(file.getParent)
      val tmp = Paths.get(dir, ".mart.tmp")
      Files.write(tmp, bb.array())
      Files.move(tmp, file, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
      cached = (v, s1)
      true
    }
}

object DurableMart {
  /** The common aggregate-mart codec: state as a UTF-8 string (the
    * caller formats/parses its own fields — decimals should travel as
    * exact strings, not doubles). */
  def stringState(dir: String, empty: String)
      : DurableMart[String] =
    new DurableMart[String](dir, empty,
      _.getBytes("UTF-8"), new String(_, "UTF-8"))
}
