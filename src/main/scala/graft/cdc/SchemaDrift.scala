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
  *
  * The diff RECURSES into struct columns (the reference's Avro
  * conversion is recursive — DatastreamEventConsumer.java:97-180 — so
  * drift can land at any depth): a field added inside a struct is an
  * [[AddColumn]] carrying its enclosing `path`, applied in place by
  * [[widen]]; a field dropped inside a struct stays (parquet
  * mergeSchema + the merge's nested null-fill give old rows nulls); a
  * nested rename is drop+add, like at the top level. A type change at
  * any depth — including struct-vs-non-struct — is incompatible.
  */
object SchemaDrift {

  sealed trait Change
  /** `path` = enclosing struct column path, outermost first; empty for
    * a top-level column. */
  case class AddColumn(field: StructField, path: Seq[String] = Nil)
    extends Change
  case class TypeChange(current: StructField, incoming: StructField,
    path: Seq[String] = Nil) extends Change

  private def diffFields(cur: StructType, inc: StructType,
      path: Seq[String]): Seq[Change] = {
    val curByName = cur.fields.map(f => f.name -> f).toMap
    inc.fields.toSeq.flatMap { f =>
      curByName.get(f.name) match {
        case None => Seq(AddColumn(f, path))
        case Some(c) => (c.dataType, f.dataType) match {
          case (cs: StructType, is: StructType) =>
            diffFields(cs, is, path :+ f.name)
          case _ if c.dataType != f.dataType => Seq(TypeChange(c, f, path))
          case _ => Nil
        }
      }
    }
  }

  /** None = no drift (the cheap equality short-circuit the reference
    * performs before emitting any DDL, ":661-663"). Dropped columns —
    * at any depth — are deliberately NOT drift: they stay in the table
    * schema and the merge null-fills them. */
  def diff(current: StructType, incoming: StructType): Option[Seq[Change]] = {
    if (current == incoming) return None
    val changes = diffFields(current, incoming, Nil)
    if (changes.isEmpty) None else Some(changes)
  }

  private def addAt(st: StructType, path: Seq[String],
      f: StructField): StructType =
    if (path.isEmpty) StructType(st.fields :+ f)
    else StructType(st.fields.map { fld =>
      if (fld.name == path.head)
        fld.copy(dataType =
          addAt(fld.dataType.asInstanceOf[StructType], path.tail, f))
      else fld
    })

  /** Apply widen-only changes to produce the new table schema; type
    * changes raise (the reference fails the pipeline on incompatible
    * drift too — permanent, not recoverable). Nested adds land inside
    * their enclosing struct, as nullable. */
  def widen(current: StructType, changes: Seq[Change]): StructType =
    changes.foldLeft(current) {
      case (acc, AddColumn(f, path)) =>
        addAt(acc, path, f.copy(nullable = true))
      case (_, TypeChange(c, i, path)) =>
        throw new IllegalArgumentException(
          s"incompatible type drift on ${(path :+ c.name).mkString(".")}: " +
            s"${c.dataType} -> ${i.dataType}")
    }

  /** Fully-qualified name of an added column ("props.plan" for a
    * nested add) — what the ALTER_TABLE event records. */
  def qualifiedName(a: AddColumn): String =
    (a.path :+ a.field.name).mkString(".")
}
