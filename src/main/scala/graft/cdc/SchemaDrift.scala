package graft.cdc

import org.apache.spark.sql.types.{StructField, StructType}

/** Schema-drift detection between the stored table schema and an
  * incoming file/batch schema — the reference's schema_key re-describe
  * path (DatastreamEventReader.java:652-674), minus the remote
  * catalog round-trip: the incoming file embeds its writer schema, so
  * the diff is computed directly.
  *
  * Policy (widen-only, like the reference's CDAP equality check +
  * ALTER emission): new nullable columns are added; removed columns
  * stay (filled with nulls by the merge); an incompatible type change
  * is surfaced as an error entry rather than applied silently.
  */
object SchemaDrift {

  sealed trait Change
  case class AddColumn(field: StructField) extends Change
  case class TypeChange(current: StructField, incoming: StructField) extends Change

  /** None = no drift (the cheap equality short-circuit the reference
    * performs before emitting any DDL, ":661-663"). */
  def diff(current: StructType, incoming: StructType): Option[Seq[Change]] = {
    if (current == incoming) return None
    val curByName = current.fields.map(f => f.name -> f).toMap
    val changes = incoming.fields.toSeq.flatMap { f =>
      curByName.get(f.name) match {
        case None => Some(AddColumn(f))
        case Some(c) if c.dataType != f.dataType => Some(TypeChange(c, f))
        case _ => None
      }
    }
    if (changes.isEmpty) None else Some(changes)
  }

  /** Apply widen-only changes to produce the new table schema; type
    * changes raise (the reference fails the pipeline on incompatible
    * drift too — permanent, not recoverable). */
  def widen(current: StructType, changes: Seq[Change]): StructType =
    changes.foldLeft(current) {
      case (acc, AddColumn(f)) => StructType(acc.fields :+ f.copy(nullable = true))
      case (_, TypeChange(c, i)) => throw new IllegalArgumentException(
        s"incompatible type drift on ${c.name}: ${c.dataType} -> ${i.dataType}")
    }
}
