package graft.dq

import org.apache.spark.sql.Column

/** Parser for the DQDL ruleset strings the reference stores verbatim in
  * its terraform (terraform/modules/data_quality/glue.tf:1-26), e.g.
  *
  * {{{
  * Rules = [ IsComplete "song_id", ColumnLength "song_id" = 18,
  *           Uniqueness "user_id" > 0.95, ColumnValues "price" <= 2 ]
  * }}}
  *
  * Covers the rule kinds the reference uses (IsComplete, ColumnLength,
  * Uniqueness, ColumnValues with a comparison) plus the common DQDL
  * volume/statistics rules (RowCount, Completeness, Mean between) —
  * each parsed into the [[DqRule]] ADT, so a parsed ruleset compiles to
  * the same single aggregation pass as a hand-built one.
  */
object DqdlParser {

  private val RulesRe = """(?s)\s*Rules\s*=\s*\[(.*)\]\s*""".r
  private val IsCompleteRe = """IsComplete\s+"([^"]+)"""".r
  private val ColumnLengthRe = """ColumnLength\s+"([^"]+)"\s*=\s*(\d+)""".r
  private val UniquenessRe = """Uniqueness\s+"([^"]+)"\s*>\s*([\d.]+)""".r
  private val ColumnValuesRe =
    """ColumnValues\s+"([^"]+)"\s*(<=|>=|!=|<|>|=)\s*(-?[\d.]+)""".r
  private val RowCountRe = """RowCount\s*(<=|>=|<|>|=)\s*(\d+)""".r
  private val ColumnValuesInRe =
    """ColumnValues\s+"([^"]+)"\s+in\s+\[([^\]]*)\]""".r
  private val ColumnValuesBetweenRe =
    """ColumnValues\s+"([^"]+)"\s+between\s+(-?[\d.]+)\s+and\s+(-?[\d.]+)""".r
  private val CompletenessRe = """Completeness\s+"([^"]+)"\s*>\s*([\d.]+)""".r
  private val MeanRe =
    """Mean\s+"([^"]+)"\s+between\s+(-?[\d.]+)\s+and\s+(-?[\d.]+)""".r
  private val ColumnExistsRe = """ColumnExists\s+"([^"]+)"""".r
  private val IsUniqueRe = """IsUnique\s+"([^"]+)"""".r
  private val StdDevRe =
    """StandardDeviation\s+"([^"]+)"\s+between\s+(-?[\d.]+)\s+and\s+(-?[\d.]+)""".r
  private val SumRe =
    """Sum\s+"([^"]+)"\s*(<=|>=|!=|<|>|=)\s*(-?[\d.]+)""".r
  private val DistinctCountRe =
    """DistinctValuesCount\s+"([^"]+)"\s*(<=|>=|!=|<|>|=)\s*(\d+)""".r
  private val CustomSqlRe =
    """CustomSql\s+"([^"]+)"\s*(<=|>=|!=|<|>|=)\s*(-?[\d.]+)""".r
  private val RefIntegrityRe =
    """ReferentialIntegrity\s+"([^"]+)"\s+"([^".]+)\.([^"]+)"\s*(<=|>=|!=|<|>|=)\s*([\d.]+)""".r
  private val RowCountMatchRe =
    """RowCountMatch\s+"([^"]+)"\s*(<=|>=|!=|<|>|=)\s*([\d.]+)""".r
  private val SchemaMatchRe =
    """SchemaMatch\s+"([^"]+)"\s*(<=|>=|!=|<|>|=)\s*([\d.]+)""".r
  private val DatasetMatchRe =
    """DatasetMatch\s+"([^"]+)"\s+"([^"]+)"\s*(<=|>=|!=|<|>|=)\s*([\d.]+)""".r
  private val DataFreshnessRe =
    """DataFreshness\s+"([^"]+)"\s*<=\s*(\d+)\s*(days?|hours?|minutes?|seconds?)""".r
  private val KAnonymityRe =
    """KAnonymity\s+"([^"]+)"\s*>=\s*(\d+)""".r

  /** Parse a ruleset. `asOf` is the explicit reference instant any
    * `DataFreshness` rule in the text evaluates against — rule
    * evaluation stays a pure function of (data, ruleset, asOf), so
    * reruns and backfills reproduce the same verdict; parsing a
    * freshness rule without supplying it fails loudly. */
  def parse(name: String, dqdl: String,
      asOf: Option[java.sql.Timestamp] = None): Ruleset = {
    val body = dqdl match {
      case RulesRe(inner) => inner
      case other => throw new IllegalArgumentException(
        s"not a DQDL ruleset (expected Rules = [...]): ${other.take(80)}")
    }
    val rules = splitTopLevel(body).filter(_.nonEmpty)
      .map(r => parseRule(r, asOf))
    Ruleset(name, rules)
  }

  private def unitSeconds(unit: String): Long = unit.stripSuffix("s") match {
    case "day" => 86400L
    case "hour" => 3600L
    case "minute" => 60L
    case "second" => 1L
  }

  private def parseRule(s: String,
      asOf: Option[java.sql.Timestamp]): DqRule = s.trim match {
    case DataFreshnessRe(c, n, unit) =>
      DataFreshness(c, n.toLong * unitSeconds(unit), asOf.getOrElse(
        throw new IllegalArgumentException(
          s"""DataFreshness "$c" needs an explicit asOf instant — """ +
            "pass parse(name, dqdl, asOf = Some(windowEnd))")))
    case other => parseRule(other)
  }

  private def parseRule(s: String): DqRule = s.trim match {
    case IsCompleteRe(c) => IsComplete(c)
    case ColumnLengthRe(c, n) => ColumnLength(c, n.toInt)
    case UniquenessRe(c, th) => Uniqueness(c, th.toDouble)
    case ColumnValuesInRe(c, items) =>
      // quote-aware item split: a quoted value may itself contain commas
      val values = splitTopLevel(items)
        .map(_.trim.stripPrefix("\"").stripSuffix("\""))
        .filter(_.nonEmpty)
      require(values.nonEmpty, s"""empty in-set for ColumnValues "$c"""")
      ColumnValues(c, _.isin(values: _*))
    case RowCountRe(op, n) => RowCount(op, n.toLong)
    case CompletenessRe(c, th) => Completeness(c, th.toDouble)
    case MeanRe(c, lo, hi) => MeanInRange(c, lo.toDouble, hi.toDouble)
    case ColumnExistsRe(c) => ColumnExists(c)
    case IsUniqueRe(c) => UniqueKey(c) // DQDL IsUnique = dbt unique
    case StdDevRe(c, lo, hi) => StdDevInRange(c, lo.toDouble, hi.toDouble)
    case SumRe(c, op, v) => SumCmp(c, op, v.toDouble)
    case DistinctCountRe(c, op, n) => DistinctCount(c, op, n.toLong)
    case CustomSqlRe(sql, op, v) => CustomSql(sql, op, v.toDouble)
    case RefIntegrityRe(c, ref, refCol, op, v) =>
      ReferentialIntegrity(c, ref, refCol, op, v.toDouble)
    case RowCountMatchRe(ref, op, v) => RowCountMatch(ref, op, v.toDouble)
    case SchemaMatchRe(ref, op, v) => SchemaMatch(ref, op, v.toDouble)
    case DatasetMatchRe(ref, keys, op, v) => DatasetMatch(ref,
      keys.split(",").map(_.trim).filter(_.nonEmpty).toSeq, op, v.toDouble)
    case KAnonymityRe(cols, k) => KAnonymity(
      cols.split(",").map(_.trim).filter(_.nonEmpty).toSeq, k.toLong)
    case ColumnValuesBetweenRe(c, lo, hi) =>
      ColumnValues(c, _.between(lo.toDouble, hi.toDouble))
    case ColumnValuesRe(c, op, v) =>
      val lit = v.toDouble
      val pred: Column => Column = op match {
        case "<=" => _ <= lit
        case ">=" => _ >= lit
        case "<"  => _ < lit
        case ">"  => _ > lit
        case "="  => _ === lit
        case "!=" => _ =!= lit
      }
      ColumnValues(c, pred)
    case other => throw new IllegalArgumentException(
      s"unsupported DQDL rule: $other")
  }

  /** Split on commas that are not inside quotes or brackets (in-set
    * literals like `in ["A", "B"]` carry commas of their own). */
  private def splitTopLevel(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inQuote = false
    var depth = 0
    s.foreach {
      case '"' => inQuote = !inQuote; cur += '"'
      case '[' if !inQuote => depth += 1; cur += '['
      case ']' if !inQuote => depth -= 1; cur += ']'
      case ',' if !inQuote && depth == 0 =>
        out += cur.result().trim; cur.clear()
      case c => cur += c
    }
    out += cur.result().trim
    out.result()
  }
}
