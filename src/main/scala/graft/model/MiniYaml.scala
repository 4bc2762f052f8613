package graft.model

/** Minimal YAML-subset parser for the dbt-style authoring surface
  * (`dbt_project.yml`, `schema.yml`) — exactly the constructs the
  * reference's files use (reference: dbt_modeling/dbt_project.yml:1-42,
  * dbt_modeling/models/serving_layer/schema.yml:1-46):
  *
  *  - nested block maps (`key:` + deeper-indented children)
  *  - scalar entries (`key: value`, quotes optional)
  *  - block lists (`- item`), including list items that open an inline
  *    map (`- name: fact_session` followed by deeper-indented keys)
  *  - `#` comments and blank lines
  *
  * No anchors, no flow collections, no multi-line scalars — those never
  * appear in dbt project/schema files of this shape, and a loud failure
  * beats a quiet misparse. Driver-side only: these files are a few KB
  * of metadata; no row data ever passes through here.
  */
sealed trait YNode {
  /** Map lookup; None on missing key or non-map node. */
  def get(key: String): Option[YNode] = this match {
    case YMap(entries) => entries.collectFirst { case (k, v) if k == key => v }
    case _ => None
  }
  def items: Vector[YNode] = this match {
    case YList(xs) => xs
    case _ => Vector.empty
  }
  def str: String = this match {
    case YScalar(v) => v
    case other => throw new IllegalArgumentException(
      s"expected scalar, found ${other.getClass.getSimpleName}")
  }
  def mapEntries: Vector[(String, YNode)] = this match {
    case YMap(entries) => entries
    case _ => Vector.empty
  }
}
final case class YMap(entries: Vector[(String, YNode)]) extends YNode
final case class YList(xs: Vector[YNode]) extends YNode
final case class YScalar(value: String) extends YNode

object MiniYaml {

  /** Parse a YAML-subset document into a node tree. Malformed input
    * (tab indentation aside, which is normalized) fails loudly. */
  def parse(text: String): YNode = {
    val lines = text.linesIterator.toVector
      .map(stripComment)
      .filter(_.trim.nonEmpty)
      .map { l =>
        val norm = l.replace("\t", "  ")
        (norm.takeWhile(_ == ' ').length, norm.trim)
      }
    if (lines.isEmpty) YMap(Vector.empty)
    else parseBlock(lines, 0, lines.head._1)._1
  }

  /** Strip a trailing `#` comment unless it sits inside quotes. */
  private def stripComment(line: String): String = {
    var inS = false; var inD = false
    val i = line.indices.find { idx =>
      line(idx) match {
        case '\'' if !inD => inS = !inS; false
        case '"' if !inS => inD = !inD; false
        case '#' if !inS && !inD =>
          idx == 0 || line(idx - 1).isWhitespace
        case _ => false
      }
    }
    i.fold(line)(line.substring(0, _))
  }

  private def unquote(s: String): String = {
    val t = s.trim
    if (t.length >= 2 &&
        ((t.head == '"' && t.last == '"') ||
          (t.head == '\'' && t.last == '\'')))
      t.substring(1, t.length - 1)
    else t
  }

  /** Parse one block whose entries sit at exactly `indent`; returns the
    * node and the index of the first unconsumed line. */
  private def parseBlock(lines: Vector[(Int, String)], start: Int,
      indent: Int): (YNode, Int) = {
    require(start < lines.length, "parseBlock past end of input")
    if (lines(start)._2 == "-" || lines(start)._2.startsWith("- "))
      parseList(lines, start, indent)
    else parseMap(lines, start, indent)
  }

  private def parseMap(lines: Vector[(Int, String)], start: Int,
      indent: Int): (YNode, Int) = {
    val entries = Vector.newBuilder[(String, YNode)]
    var i = start
    while (i < lines.length && lines(i)._1 == indent &&
        !lines(i)._2.startsWith("- ") && lines(i)._2 != "-") {
      val (_, content) = lines(i)
      val colon = content.indexOf(':')
      require(colon > 0, s"expected 'key: value', found '$content'")
      val key = unquote(content.substring(0, colon))
      val rest = content.substring(colon + 1).trim
      if (rest.nonEmpty) {
        entries += key -> YScalar(unquote(rest))
        i += 1
      } else if (i + 1 < lines.length && lines(i + 1)._1 > indent) {
        val (child, next) = parseBlock(lines, i + 1, lines(i + 1)._1)
        entries += key -> child
        i = next
      } else {
        entries += key -> YScalar("")
        i += 1
      }
    }
    require(i >= lines.length || lines(i)._1 <= indent,
      s"bad indentation at '${lines(i)._2}'")
    (YMap(entries.result()), i)
  }

  private def parseList(lines: Vector[(Int, String)], start: Int,
      indent: Int): (YNode, Int) = {
    val xs = Vector.newBuilder[YNode]
    var i = start
    while (i < lines.length && lines(i)._1 == indent &&
        (lines(i)._2 == "-" || lines(i)._2.startsWith("- "))) {
      val content = lines(i)._2.drop(1).trim
      // collect the item's continuation lines (anything deeper-indented)
      var j = i + 1
      while (j < lines.length && lines(j)._1 > indent) j += 1
      if (content.isEmpty) {
        require(j > i + 1, s"empty list item at line ${i + 1}")
        xs += parseBlock(lines, i + 1, lines(i + 1)._1)._1
      } else if (content.contains(":") &&
          !(content.startsWith("\"") || content.startsWith("'"))) {
        // `- key: ...` opens an inline map; re-home the first entry at
        // the continuation lines' indent so it parses as their sibling
        val childIndent =
          if (j > i + 1) lines(i + 1)._1 else indent + 2
        val virtual = (childIndent, content) +: lines.slice(i + 1, j)
        xs += parseBlock(virtual, 0, childIndent)._1
      } else {
        require(j == i + 1, s"scalar list item '$content' has children")
        xs += YScalar(unquote(content))
      }
      i = j
    }
    (YList(xs.result()), i)
  }
}
