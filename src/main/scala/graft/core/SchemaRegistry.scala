package graft.core

import scala.io.Source

import org.apache.spark.sql.types.StructType

/** One table's declared contract: schema, primary key, change cursor. */
final case class TableSpec(
    name: String,
    schema: StructType,
    pk: Seq[String],
    cursor: Option[String]) {
  def cursorOrFail: String = cursor.getOrElse(
    throw new IllegalArgumentException(s"table '$name' declares no cursor column"))
}

/** Config-driven table registry — the engine analog of the reference's
  * per-table YAML schema loader and per-object pk/cursor dispatch
  * (ref: config/bigquery/bigquery.py:41-63 `get_table_schema`,
  * bigquery.py:72-90): a user adds a table or changes its key columns by
  * editing `graft-tables.conf`, not Scala. Schemas are Spark SQL DDL
  * (`StructType.fromDDL`), so `NOT NULL` marks REQUIRED fields exactly as
  * the reference's YAML `mode: REQUIRED` does, and the parsed StructType
  * feeds `Sinks.appendWithSchema` unchanged.
  *
  * The format is deliberately dependency-free (INI-style sections) —
  * this container resolves no external parser libraries, and the
  * reference's YAML carries no nesting the format can't express.
  */
object SchemaRegistry {

  /** Bundled registry covering the engine's tables. */
  lazy val default: Map[String, TableSpec] = fromResource("/graft-tables.conf")

  def fromResource(resource: String): Map[String, TableSpec] = {
    val in = getClass.getResourceAsStream(resource)
    require(in != null, s"registry resource not found: $resource")
    val src = Source.fromInputStream(in, "UTF-8")
    try parse(src.getLines()) finally src.close()
  }

  def fromFile(path: String): Map[String, TableSpec] = {
    val src = Source.fromFile(path, "UTF-8")
    try parse(src.getLines()) finally src.close()
  }

  private val Section = """\[([A-Za-z0-9_]+)\]""".r
  private val KeyValue = """([A-Za-z0-9_]+)\s*=\s*(.+)""".r

  def parse(lines: Iterator[String]): Map[String, TableSpec] = {
    // fold lines into (currentTable, accumulated props per table)
    val (_, props) = lines
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .foldLeft((Option.empty[String], Map.empty[String, Map[String, String]])) {
        case ((_, acc), Section(name)) =>
          // duplicate sections are a hard error — silently merging a
          // copy-pasted [table] block would let a stale key (e.g. cursor)
          // survive under the newer block's schema
          if (acc.contains(name))
            throw new IllegalArgumentException(s"duplicate registry section: [$name]")
          (Some(name), acc.updated(name, Map.empty[String, String]))
        case ((Some(table), acc), KeyValue(k, v)) =>
          (Some(table), acc.updated(table, acc(table).updated(k, v.trim)))
        case ((None, _), line) =>
          throw new IllegalArgumentException(s"registry line outside a [table] section: $line")
        case ((_, _), line) =>
          throw new IllegalArgumentException(s"unparseable registry line: $line")
      }
    props.map { case (name, kv) =>
      val schema = StructType.fromDDL(kv.getOrElse("schema",
        throw new IllegalArgumentException(s"table '$name' declares no schema")))
      val pk = kv.get("pk").map(_.split(",").map(_.trim).toSeq).getOrElse(Seq.empty)
      name -> TableSpec(name, schema, pk, kv.get("cursor"))
    }
  }
}
