package graft.streaming

import java.nio.ByteBuffer
import java.nio.channels.{FileChannel, OverlappingFileLockException}
import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}

/** Crash-safe consumer state for [[CdfFollow]]: the mart, the
  * commit-log version it reflects, and the versions it had to SKIP,
  * persisted as ONE file replaced by stage + atomic rename — the
  * repo's CAS discipline at consumer scale. `CdfFollow`'s
  * delivered-watermark survives restarts, so a consumer whose fold
  * state lives only in memory resumes from an empty mart while the
  * marker suppresses every already-delivered version: it silently
  * under-counts forever. Binding (state, version, skipped) into one
  * atomic commit closes that window — after a process crash the mart
  * is some prefix of the version chain, and [[commit]]'s version
  * guard makes redelivered prefixes no-ops.
  *
  * Durability scope: the default stage+rename is atomic against
  * PROCESS failure (a kill at any instruction leaves either the old
  * or the new committed file — tmp names are invisible to [[load]]).
  * It is NOT hardened against OS crash or power loss, where the
  * kernel may persist the rename before the file's data; pass
  * `sync = true` to fsync the staged bytes and the parent directory
  * around the rename for that class of failure, at one fsync pair
  * per commit.
  *
  * Single-writer enforcement: the mart directory is exclusively
  * locked (`.lock`, an OS file lock) for the life of the instance —
  * two writers interleaving `cached` updates would commit a mart
  * reflecting neither fold sequence, so a second open on a live dir
  * fails loudly instead. The OS releases the lock when the holding
  * process dies, so crash-restart needs no manual cleanup; in-process
  * hand-off requires [[close]] first.
  *
  * Skipped versions: a consumer may find a version's change feed
  * vacuumed (it lagged past the store's retention horizon). Folding
  * the surviving subset would silently commit a PARTIAL version, and
  * folding nothing while the follower's watermark advances would trip
  * the lost-mart refusal on the next start — so the consumer records
  * the version via [[commitSkipped]]: state untouched, version
  * advanced, the gap durable and queryable via [[skipped]]. A
  * non-empty skip list means the mart is exact over the FOLDED
  * versions only; a consumer that needs exactness over the full chain
  * must rebuild from the store's current state. The list grows only
  * when the consumer outlages retention — an operational incident,
  * not steady state.
  *
  * Scope: small IVM marts (aggregates, counters, per-table rollups) —
  * the state is one driver-side file. A mart that is itself a big
  * table follows the same discipline with a manifest publish
  * (graft.cdc.CdcTable IS that shape: stage segments, CAS the
  * manifest); this class is the scalar end of the spectrum.
  */
class DurableMart[S](dir: String, empty: S,
    encode: S => Array[Byte], decode: Array[Byte] => S,
    sync: Boolean = false) extends AutoCloseable {

  private val file = Paths.get(dir, "mart")

  // exclusive writer lock, held for the instance's life. tryLock
  // covers both failure shapes: null when another PROCESS holds it,
  // OverlappingFileLockException when this JVM already does.
  private val lockChannel: FileChannel = {
    Files.createDirectories(Paths.get(dir))
    val ch = FileChannel.open(Paths.get(dir, ".lock"),
      StandardOpenOption.CREATE, StandardOpenOption.WRITE)
    val acquired =
      try ch.tryLock()
      catch { case _: OverlappingFileLockException => ch.close(); null }
    if (acquired == null) {
      if (ch.isOpen) ch.close()
      throw new IllegalStateException(
        s"another DurableMart instance holds '$dir' — two writers " +
          "would interleave commits into a mart reflecting neither " +
          "fold sequence; close() the live instance (a crashed " +
          "process's lock is released by the OS)")
    }
    ch
  }

  // file layout: [version: long][nSkipped: int][skipped: long*][payload]
  private def load(): (Long, Vector[Long], S) =
    if (!Files.exists(file)) (-1L, Vector.empty, empty)
    else {
      val bytes = Files.readAllBytes(file)
      val bb = ByteBuffer.wrap(bytes)
      val v = bb.getLong
      val sk = Vector.fill(bb.getInt)(bb.getLong)
      val payload = new Array[Byte](bb.remaining())
      bb.get(payload)
      (v, sk, decode(payload))
    }

  @volatile private var cached: (Long, Vector[Long], S) = load()

  /** Newest version folded OR skipped into the durable state; -1
    * before the first commit. */
  def version: Long = cached._1

  /** The durable state (the in-process cache of the committed file —
    * single-writer, enforced by the dir lock). */
  def state: S = cached._3

  /** Versions recorded as skipped (vacuumed feeds) — ascending. Empty
    * means [[state]] reflects every version up to [[version]]. */
  def skipped: Seq[Long] = cached._2

  private def persist(v: Long, sk: Vector[Long], s1: S): Unit = {
    require(lockChannel.isOpen,
      s"DurableMart '$dir' is closed — committing after close() would " +
        "write without the writer lock another instance may now hold")
    val payload = encode(s1)
    val bb = ByteBuffer.allocate(12 + 8 * sk.size + payload.length)
    bb.putLong(v)
    bb.putInt(sk.size)
    sk.foreach(bb.putLong)
    bb.put(payload)
    val tmp = Paths.get(dir, ".mart.tmp")
    Files.write(tmp, bb.array())
    if (sync) force(tmp)
    Files.move(tmp, file, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    if (sync) force(file.getParent)
    cached = (v, sk, s1)
  }

  /** fsync a file's bytes, or a directory's entry table (the half the
    * default rename commit skips — see the class doc). */
  private def force(p: Path): Unit = {
    val ch = FileChannel.open(p, StandardOpenOption.READ)
    try ch.force(true) finally ch.close()
  }

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
    else { persist(v, cached._2, f(cached._3)); true }

  /** Record `v` as SKIPPED — state untouched, version advanced, the
    * gap durable (see the class doc). Same redelivery guard as
    * [[commit]]. */
  def commitSkipped(v: Long): Boolean =
    if (v <= cached._1) false
    else { persist(v, cached._2 :+ v, cached._3); true }

  /** Release the writer lock. Idempotent; the instance must not
    * commit after close. */
  def close(): Unit = if (lockChannel.isOpen) lockChannel.close()
}

object DurableMart {
  /** The common aggregate-mart codec: state as a UTF-8 string (the
    * caller formats/parses its own fields — decimals should travel as
    * exact strings, not doubles). */
  def stringState(dir: String, empty: String, sync: Boolean = false)
      : DurableMart[String] =
    new DurableMart[String](dir, empty,
      _.getBytes("UTF-8"), new String(_, "UTF-8"), sync)
}
