package graft.config

/** YAML table-config loader: parses the reference's `tables/<name>.yaml`
  * shape (reference: tables/test.yaml, readme.md:115-142, loaded by
  * replication/schema/helper.py:13-38) into a [[TableConfig]], so a user
  * can declare a replicated table without recompiling — the reference's
  * central operating model.
  *
  * Recognized keys, mirroring the reference loader:
  *  - `table_name` -> [[TableConfig.name]]
  *  - `schema.properties.<Col>.{type, ref, default, required, ch_type}`
  *    -> one [[ColumnSpec]] each (in declaration order); `type` may be a
  *    scalar or an inline list (the ordered cast-fallback chain)
  *  - `schema.primary_key` (scalar or list) -> `primaryKey` flags
  *  - `table` (DDL text), `buffer`, `topic_config`: parsed and retained in
  *    the raw tree but not used — DDL/buffering/topics are ClickHouse/Kafka
  *    deployment concerns the Spark engine replaces (buffer tables are
  *    subsumed by micro-batch triggers, topics by checkpoints)
  *  - properties named `_ver`/`_deleted` are dropped: the engine
  *    synthesizes them in the envelope step ([[graft.operators.Envelope]]);
  *    declaring them as transform columns would double-emit
  *
  * The parser is a deliberately minimal YAML subset (block maps, scalars,
  * inline `[..]` lists, `|` literal blocks, comments) — exactly the shape
  * the reference's configs use — hand-rolled because the environment pins
  * the dependency set (no snakeyaml).
  */
object ConfigYaml {

  /** Ordered key-value tree: values are String | Long | Double | Boolean |
    * Vector[Any] | Node | null.
    */
  final case class Node(fields: Vector[(String, Any)]) {
    def get(key: String): Option[Any] = fields.collectFirst { case (`key`, v) => v }
    def obj(key: String): Node = get(key) match {
      case Some(n: Node) => n
      case other => throw new IllegalArgumentException(s"expected mapping at '$key', got $other")
    }
  }

  def parse(text: String): Node = {
    val lines = text.split("\n", -1).toVector.map(stripComment)
    val (node, next) = parseBlock(lines, skipBlank(lines, 0), indentAt(lines, 0))
    val rest = skipBlank(lines, next)
    require(rest >= lines.length, s"trailing content at line ${rest + 1}: ${lines(rest).trim}")
    node
  }

  /** Parse one `tables/<name>.yaml` document into a TableConfig. */
  def tableConfig(
      yaml: String,
      versionColumn: String = "_ver",
      deletedColumn: String = "_deleted"): TableConfig = {
    val root = parse(yaml)
    val name = root.get("table_name") match {
      case Some(s: String) => s
      case other => throw new IllegalArgumentException(s"table_name missing or not a string: $other")
    }
    val schema = root.obj("schema")
    val pks: Set[String] = schema.get("primary_key") match {
      case Some(xs: Vector[_]) => xs.map(_.toString).toSet
      case Some(null) | None   => Set.empty
      // any scalar (a numeric column name parses as Long) is a key name
      case Some(other)         => Set(other.toString)
    }
    // validate NOW, against the declared properties: a typo'd key name
    // would otherwise mark no column primaryKey at all — silently
    // disabling key enforcement (SchemaTransform stops dead-lettering
    // key-less rows) with the failure surfacing, if ever, far away in
    // table DDL
    val declared = schema.obj("properties").fields.map(_._1).toSet
    val unknownPks = pks.diff(declared)
    require(unknownPks.isEmpty,
      s"schema.primary_key names ${unknownPks.mkString(", ")} are not " +
        s"declared properties (declared: ${declared.toSeq.sorted.mkString(", ")})")
    val columns = schema.obj("properties").fields
      .filterNot { case (n, _) => n == versionColumn || n == deletedColumn }
      .map {
        case (colName, spec: Node) =>
          val types = spec.get("type") match {
            case Some(s: String)     => Seq(s)
            case Some(xs: Vector[_]) => xs.map(_.toString)
            case _                   => Seq("str")
          }
          ColumnSpec(
            name = colName,
            types = types,
            ref = spec.get("ref").map(_.toString),
            default = spec.get("default").map(defaultValue),
            required = spec.get("required").contains(true),
            primaryKey = pks(colName),
            chType = spec.get("ch_type").map(_.toString))
        case (colName, other) =>
          throw new IllegalArgumentException(s"property '$colName' is not a mapping: $other")
      }
    TableConfig(name, columns, versionColumn, deletedColumn)
  }

  /** YAML default -> the literal SchemaTransform feeds to `lit`. Lists
    * become arrays (Spark literals don't take Scala collections of unknown
    * element type; the reference's only list default is `[ ]`).
    */
  private def defaultValue(v: Any): Any = v match {
    case xs: Vector[_] => xs.map(_.toString).toArray
    case other         => other
  }

  // ---- minimal YAML subset machinery ----

  /** Cut `# comment` (only when preceded by start-of-line or whitespace,
    * outside quotes — `ref: _key # arango column name` keeps `_key`).
    */
  private def stripComment(l: String): String = {
    var inS = false; var inD = false; var i = 0
    while (i < l.length) {
      val c = l.charAt(i)
      if (c == '\'' && !inD) {
        // YAML: a single-quoted string only STARTS where a token starts
        // (after whitespace/:/,/[/{) — an apostrophe INSIDE an unquoted
        // scalar (`default: user's_team # owner`, `team: ops-'til # x`)
        // is literal; toggling on it would swallow the trailing comment
        // into the value. '{' covers flow-mapping keys (`{'a #b': 1}`).
        // A '-' immediately before the quote counts ONLY in flow-sequence
        // context (previous non-space char '[' or ','): a block list dash
        // is followed by a space in standard YAML, and the broader
        // "dash at any token start" rule opened quote state for plain
        // scalars like `note: rock -'n roll # genre`, swallowing the
        // trailing comment into the value.
        def tokenStart(j: Int): Boolean = j == 0 || {
          val p = l.charAt(j - 1)
          p.isWhitespace || p == ':' || p == '[' || p == ',' || p == '{'
        }
        def flowDash(j: Int): Boolean = j > 0 && l.charAt(j - 1) == '-' && {
          var k = j - 2
          while (k >= 0 && l.charAt(k) == ' ') k -= 1
          k >= 0 && (l.charAt(k) == '[' || l.charAt(k) == ',')
        }
        if (inS) inS = false
        else if (tokenStart(i) || flowDash(i)) inS = true
      }
      else if (c == '"' && !inS) inD = !inD
      else if (c == '#' && !inS && !inD && (i == 0 || l.charAt(i - 1).isWhitespace))
        return l.substring(0, i)
      i += 1
    }
    l
  }

  private def isBlank(l: String): Boolean = {
    val t = l.trim
    t.isEmpty || t == "---"
  }

  private def skipBlank(lines: Vector[String], i: Int): Int = {
    var j = i
    while (j < lines.length && isBlank(lines(j))) j += 1
    j
  }

  private def indentOf(l: String): Int = l.takeWhile(_ == ' ').length

  private def indentAt(lines: Vector[String], i: Int): Int = {
    val j = skipBlank(lines, i)
    if (j < lines.length) indentOf(lines(j)) else 0
  }

  /** Parse consecutive `key: ...` entries at exactly `indent`; returns the
    * mapping and the index of the first line past it.
    */
  private def parseBlock(lines: Vector[String], start: Int, indent: Int): (Node, Int) = {
    val out = Vector.newBuilder[(String, Any)]
    var i = start
    var done = false
    while (!done) {
      i = skipBlank(lines, i)
      if (i >= lines.length || indentOf(lines(i)) < indent) done = true
      else {
        val line = lines(i)
        require(indentOf(line) == indent, s"inconsistent indent at: '$line'")
        val t = line.trim
        val ci = t.indexOf(':')
        require(ci > 0, s"expected 'key: value', got: '$t'")
        val key = scalar(t.substring(0, ci)).toString
        val rest = t.substring(ci + 1).trim
        if (rest == "|" || rest == "|-") {
          // literal block: every following line indented past the key
          var j = i + 1
          val buf = Vector.newBuilder[String]
          while (j < lines.length &&
            (lines(j).trim.isEmpty || indentOf(lines(j)) > indent)) {
            buf += lines(j); j += 1
          }
          val body = buf.result()
          val base = body.filter(_.trim.nonEmpty).map(indentOf).minOption.getOrElse(0)
          val textVal = body
            .map(l => if (l.length >= base) l.substring(base) else l.trim)
            .mkString("\n")
          out += key -> (if (rest == "|-") textVal.reverse.dropWhile(_ == '\n').reverse
                         else textVal.reverse.dropWhile(_ == '\n').reverse + "\n")
          i = j
        } else if (rest.isEmpty) {
          val j = skipBlank(lines, i + 1)
          if (j < lines.length && indentOf(lines(j)) > indent) {
            val (child, next) = parseBlock(lines, j, indentOf(lines(j)))
            out += key -> child
            i = next
          } else {
            out += key -> null
            i += 1
          }
        } else {
          out += key -> scalar(rest)
          i += 1
        }
      }
    }
    (Node(out.result()), i)
  }

  private def scalar(s: String): Any = {
    val t = s.trim
    if (t.startsWith("[")) {
      require(t.endsWith("]"), s"unterminated inline list: $t")
      val inner = t.substring(1, t.length - 1).trim
      if (inner.isEmpty) Vector.empty[Any]
      else splitInline(inner, t).map(x => scalar(x))
    } else if (t == "true") true
    else if (t == "false") false
    else if (t == "null" || t == "~") null
    else if (t.length >= 2 && t.head == '\'' && t.last == '\'') t.substring(1, t.length - 1)
    else if (t.length >= 2 && t.head == '"' && t.last == '"') t.substring(1, t.length - 1)
    else t.toLongOption.getOrElse(t.toDoubleOption.getOrElse(t))
  }

  /** Split an inline list body on TOP-LEVEL commas only: a comma inside a
    * quoted scalar (`['a, b', c]`) is content, not a separator — splitting
    * on every comma would silently corrupt the value, the one malformed-
    * input shape worse than failing loudly. Unterminated quotes do fail
    * loudly like every other parse error here.
    */
  private def splitInline(inner: String, whole: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    var quote: Char = 0
    inner.foreach { ch =>
      if (quote != 0) { cur.append(ch); if (ch == quote) quote = 0 }
      else if (ch == '\'' || ch == '"') { cur.append(ch); quote = ch }
      else if (ch == ',') { out += cur.toString; cur.clear() }
      else cur.append(ch)
    }
    require(quote == 0, s"unterminated quote in inline list: $whole")
    out += cur.toString
    out.result()
  }
}
