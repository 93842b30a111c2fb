package graft.schema

import scala.collection.mutable

import org.apache.spark.sql.types._

/** Felis-style YAML schema loader: parses the subset of YAML the
  * reference's schema files use (nested block maps/sequences of scalars —
  * see python/lsst/dax/ppdb/resources/config/schemas/test_apdb_schema.yaml)
  * into table definitions with Spark StructTypes, reproducing the
  * felis→engine type mapping (P/bigquery/schema/felis_converter.py:50-64,
  * P/_arrow.py:31-41).
  *
  * No YAML library exists in this environment, so the parser handles
  * exactly the structural subset Felis emits: `key: value` scalars,
  * nested block maps, `- ` block sequences, quoted keys/values, and
  * multi-line folded scalars (continuation lines are absorbed into the
  * previous value — only `description` uses them).
  */
object FelisSchema {

  final case class ColumnDef(name: String, datatype: String,
      nullable: Boolean, description: String)
  final case class TableDef(name: String, columns: Seq[ColumnDef],
      primaryKey: Seq[String], indexes: Seq[Seq[String]]) {
    def structType: StructType = StructType(columns.map(c =>
      StructField(c.name, felisToSpark(c.datatype), c.nullable)))
  }
  final case class SchemaDef(name: String, version: String,
      tables: Seq[TableDef]) {
    def table(name: String): TableDef = tables.find(_.name == name)
      .getOrElse(throw new IllegalArgumentException(s"no table $name"))
  }

  /** Legacy validity-timestamp detection (the reference's DM-52215
    * handling, P/sql/_ppdb_sql.py:86-90,456-471): older schema lines name
    * DiaObject's validity columns `validityStart`/`validityEnd` with
    * timestamp type; the modern form is `validityStartMjdTai`/
    * `validityEndMjdTai` double MJD TAI. Detected once at schema load.
    */
  def usesMjdTai(schema: SchemaDef): Boolean =
    schema.tables.find(_.name == "DiaObject")
      .forall(_.columns.exists(_.name == "validityStartMjdTai"))

  /** The (start, end) validity column names for this schema variant
    * (P/sql/_ppdb_sql.py:190-195).
    */
  def validityColumns(schema: SchemaDef): (String, String) =
    if (usesMjdTai(schema)) ("validityStartMjdTai", "validityEndMjdTai")
    else ("validityStart", "validityEnd")

  /** Felis → Spark type map (union of the reference's three maps). */
  def felisToSpark(t: String): DataType = t match {
    case "boolean" => BooleanType
    case "byte" => ByteType
    case "short" => ShortType
    case "int" => IntegerType
    case "long" => LongType
    case "float" => FloatType
    case "double" => DoubleType
    case "char" | "string" | "unicode" | "text" => StringType
    case "binary" => BinaryType
    case "timestamp" => TimestampType
    case other => throw new IllegalArgumentException(s"felis type '$other'")
  }

  // ------------------------------------------------------- minimal parser

  private sealed trait Node
  private final case class MapNode(entries: mutable.LinkedHashMap[String, Node])
      extends Node
  private final case class SeqNode(items: mutable.ArrayBuffer[Node]) extends Node
  private final case class ScalarNode(value: String) extends Node

  private def unquote(s0: String): String = {
    val s = s0.trim
    if (s.length >= 2 &&
        ((s.head == '"' && s.last == '"') || (s.head == '\'' && s.last == '\'')))
      s.substring(1, s.length - 1)
    else s
  }

  /** Parse the YAML subset into a node tree. Lines are pre-split into
    * (indent, content); `- ` sequence markers add 2 to effective indent
    * for their inline content.
    */
  def parse(yaml: String): SchemaDef = {
    val lines = yaml.linesIterator
      .map(_.replaceAll("\\s+$", ""))
      .filter(l => l.trim.nonEmpty && !l.trim.startsWith("#") && l.trim != "---")
      .toVector
    val (root, _) = parseBlock(lines, 0, 0)
    toSchema(root)
  }

  /** Parse a block at `indent` starting from line `i`; returns (node, next
    * line index).
    */
  private def parseBlock(lines: Vector[String], i0: Int, indent: Int): (Node, Int) = {
    var i = i0
    def indentOf(l: String) = l.takeWhile(_ == ' ').length
    if (i >= lines.length) return (ScalarNode(""), i)

    if (lines(i).trim.startsWith("- ") || lines(i).trim == "-") {
      // sequence
      val items = mutable.ArrayBuffer.empty[Node]
      while (i < lines.length && indentOf(lines(i)) == indent &&
          (lines(i).trim.startsWith("- ") || lines(i).trim == "-")) {
        val inline = lines(i).trim.stripPrefix("-").trim
        if (inline.isEmpty) {
          val (n, ni) = parseBlock(lines, i + 1, indent + 2)
          items += n; i = ni
        } else if (findKeyColon(inline) < 0) {
          // bare scalar item (e.g. a quoted "#Table.column" reference)
          items += ScalarNode(unquote(inline)); i += 1
        } else {
          // splice the inline content as the first entry of a nested map
          val spliced = (" " * (indent + 2)) + inline
          val rest = lines.patch(i, Seq(spliced), 1)
          val (n, ni) = parseBlock(rest, i, indent + 2)
          items += n; i = ni
        }
      }
      (SeqNode(items), i)
    } else {
      // map
      val entries = mutable.LinkedHashMap.empty[String, Node]
      var lastKey: String = null
      while (i < lines.length && indentOf(lines(i)) == indent &&
          !lines(i).trim.startsWith("- ")) {
        val line = lines(i).trim
        val colon = findKeyColon(line)
        if (colon < 0) {
          // folded continuation of the previous scalar value
          if (lastKey != null) entries(lastKey) match {
            case ScalarNode(v) => entries(lastKey) = ScalarNode(v + " " + line)
            case _ => ()
          }
          i += 1
        } else {
          val key = unquote(line.substring(0, colon))
          val value = line.substring(colon + 1).trim
          lastKey = key
          if (value.nonEmpty) {
            var v = unquote(value)
            i += 1
            // folded scalar continuations: deeper-indented, not a
            // sequence item, no key of their own
            while (i < lines.length && indentOf(lines(i)) > indent &&
                !lines(i).trim.startsWith("- ") &&
                findKeyColon(lines(i).trim) < 0) {
              v = v + " " + lines(i).trim
              i += 1
            }
            entries(key) = ScalarNode(v)
          }
          else if (i + 1 < lines.length && indentOf(lines(i + 1)) > indent) {
            val (n, ni) = parseBlock(lines, i + 1, indentOf(lines(i + 1)))
            entries(key) = n; i = ni
          } else if (i + 1 < lines.length &&
              indentOf(lines(i + 1)) == indent && lines(i + 1).trim.startsWith("- ")) {
            val (n, ni) = parseBlock(lines, i + 1, indent)
            entries(key) = n; i = ni
          } else { entries(key) = ScalarNode(""); i += 1 }
        }
      }
      (MapNode(entries), i)
    }
  }

  /** Key colon = first ':' not inside quotes, followed by space or EOL. */
  private def findKeyColon(line: String): Int = {
    var inQ = false; var q = ' '
    var i = 0
    while (i < line.length) {
      val c = line(i)
      if (inQ) { if (c == q) inQ = false }
      else if (c == '"' || c == '\'') { inQ = true; q = c }
      else if (c == ':' && (i + 1 == line.length || line(i + 1) == ' '))
        return i
      i += 1
    }
    -1
  }

  private def toSchema(root: Node): SchemaDef = {
    val m = root.asInstanceOf[MapNode].entries
    def scalar(n: Node): String = n.asInstanceOf[ScalarNode].value
    val tables = m.get("tables").map(_.asInstanceOf[SeqNode].items.toSeq)
      .getOrElse(Nil).map { tn =>
        val tm = tn.asInstanceOf[MapNode].entries
        val cols = tm.get("columns").map(_.asInstanceOf[SeqNode].items.toSeq)
          .getOrElse(Nil).map { cn =>
            val cm = cn.asInstanceOf[MapNode].entries
            ColumnDef(
              scalar(cm("name")),
              scalar(cm("datatype")),
              cm.get("nullable").forall(n => scalar(n) != "false"),
              cm.get("description").map(scalar).getOrElse(""))
          }
        val pk = tm.get("primaryKey") match {
          case Some(ScalarNode(v)) => Seq(refToColumn(v))
          case Some(SeqNode(items)) =>
            items.toSeq.map(n => refToColumn(scalar(n)))
          case _ => Nil
        }
        val idx = tm.get("indexes").map(_.asInstanceOf[SeqNode].items.toSeq)
          .getOrElse(Nil).map { in =>
            val im = in.asInstanceOf[MapNode].entries
            im.get("columns").map(_.asInstanceOf[SeqNode].items.toSeq)
              .getOrElse(Nil).map(n => refToColumn(scalar(n)))
          }
        TableDef(scalar(tm("name")), cols, pk, idx)
      }
    SchemaDef(
      m.get("name").map(scalar).getOrElse(""),
      m.get("version").map(scalar).getOrElse("0.0.0"),
      tables)
  }

  /** "#Table.column" → "column" (Felis `@id` references). */
  private def refToColumn(ref: String): String =
    ref.stripPrefix("#").split('.').last
}
