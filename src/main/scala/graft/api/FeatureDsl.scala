package graft.api

import graft.operators.{ConstFill, Feature, Fill, NoFill, PreviousFill}

/** The `_read` feature-expression parser — Spark restatement of
  * `parse_expression` (/root/reference/loudml/misc.py:334-342, used by
  * POST /buckets/<n>/_read, /root/reference/loudml/server.py:1181-1207):
  * `metric(field)` or `metric(measurement.field)`, semicolon-separated
  * lists. Feature name defaults to `metric_field` as the server does.
  */
object FeatureDsl {

  final case class ParsedFeature(
      metric: String, measurement: Option[String], field: String) {
    def name: String = s"${metric}_$field"
    def toFeature(fill: Fill = NoFill): Feature =
      Feature(name, metric, field, fill = fill)
  }

  private val ExprRe = """^\s*(\w+)\(\s*(?:([\w-]+)\.)?([\w-]+)\s*\)\s*$""".r

  /** Parse one `metric(measurement.field)` expression. */
  def parse(expr: String): ParsedFeature = expr match {
    case ExprRe(metric, measurement, field) =>
      graft.functions.Metrics.validate(metric)
      ParsedFeature(metric, Option(measurement), field)
    case _ =>
      throw new IllegalArgumentException(s"invalid feature expression: $expr")
  }

  /** Parse a semicolon-separated feature list (server `features=` param). */
  def parseList(exprs: String): Seq[ParsedFeature] =
    exprs.split(";").toSeq.filter(_.trim.nonEmpty).map(parse)
}

/** Config-coercion utilities — the reference's `misc.parse_addr` /
  * `misc.make_bool` (/root/reference/loudml/misc.py:255-283), used by
  * every connector config (`elastic.py:215`, `influx.py:378`) and by
  * boolean-ish settings fields. Semantics golden-matched to
  * `tests/test_misc.py:90-105`. */
object ConfigCoerce {

  /** "host[:port]" → (host, port). Empty host → "localhost"; missing
    * port → `defaultPort` (the reference returns None there when no
    * default is given — represented as Option). */
  def parseAddr(addr: String, defaultPort: Option[Int] = None): (String, Option[Int]) = {
    val parts = addr.split(":", -1)
    val host = if (parts(0).isEmpty) "localhost" else parts(0)
    val port = if (parts.length == 1) defaultPort else Some(parts(1).toInt)
    (host, port)
  }

  /** Loose boolean coercion: null→false, bool→itself, numeric→(≠ 0),
    * ""/"false"/"no"→false, "true"/"yes"→true (case-insensitive),
    * anything else → IllegalArgumentException (the reference raises
    * ValueError). */
  def makeBool(mixed: Any): Boolean = mixed match {
    case null => false
    case b: Boolean => b
    case i: Int => i != 0
    case l: Long => l != 0L
    case d: Double => d.toInt != 0
    case s: String =>
      val t = s.toLowerCase
      scala.util.Try(t.toInt).toOption match {
        case Some(i) => i != 0
        case None =>
          if (t.isEmpty || t == "false" || t == "no") false
          else if (t == "true" || t == "yes") true
          else throw new IllegalArgumentException(s"not a bool: $mixed")
      }
    case other => throw new IllegalArgumentException(s"not a bool: $other")
  }
}

/** Date-math parsing — /root/reference/loudml/misc.py:66-190 and
  * docs/reference/api-conventions.asciidoc:28-83: inputs are epoch seconds
  * (int/float), ISO-8601, or relative `now±<delta>`; timedeltas accept bare
  * seconds or `<n><unit>` with units s/m/h/d/w, M=30d, y=365d.
  */
object DateMath {

  private val unitSeconds: Map[String, Long] = Map(
    "s" -> 1L, "m" -> 60L, "h" -> 3600L, "d" -> 86400L,
    "w" -> 7L * 86400L, "M" -> 30L * 86400L, "y" -> 365L * 86400L)

  private val DeltaRe = """^([+-]?\d+(?:\.\d+)?)([smhdwMy]?)$""".r

  /** Parse a timedelta ("5m", "1h", bare seconds, "-30s") to seconds. */
  def parseDelta(s: String): Double = s.trim match {
    case DeltaRe(num, "")   => num.toDouble
    case DeltaRe(num, unit) => num.toDouble * unitSeconds(unit)
    case other =>
      throw new IllegalArgumentException(s"invalid timedelta: $other")
  }

  private val RelRe = """^now(?:([+-])(.+))?$""".r

  /** Parse a timestamp expression to epoch seconds.
    * `nowEpoch` is injected for determinism (tests / scheduled jobs). */
  def parseTs(s: String, nowEpoch: Long = System.currentTimeMillis() / 1000): Double =
    s.trim match {
      case RelRe(null, null)  => nowEpoch.toDouble
      case RelRe("+", d)      => nowEpoch + parseDelta(d)
      case RelRe("-", d)      => nowEpoch - parseDelta(d)
      case num if num.nonEmpty && num.forall(c => c.isDigit || c == '.' || c == '-') =>
        num.toDouble
      case iso =>
        java.time.Instant.parse(
          if (iso.endsWith("Z") || iso.contains("+")) iso else iso + "Z")
          .toEpochMilli / 1000.0
    }

  /** UTC ISO formatting `%Y-%m-%dT%H:%M:%S.%03dZ`
    * (/root/reference/loudml/misc.py:193-198). */
  def formatTs(epoch: Double): String = {
    val inst = java.time.Instant.ofEpochMilli(math.round(epoch * 1000))
    java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
      .withZone(java.time.ZoneOffset.UTC)
      .format(inst)
  }
}

/** REST list sort + pagination — the service-layer shape shared by every
  * list endpoint (/root/reference/loudml/server.py:604-638,706-723,
  * 1241-1257): `sort=<field>:<1|-1>`, `page` (0-based, ≥ 0), `per_page`
  * (≤ 100). Validation mirrors the reference's `Invalid` errors.
  */
object Listing {
  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.functions.col

  def sortPage(df: DataFrame, sort: String = "name:1",
      page: Int = 0, perPage: Int = 50): DataFrame = {
    if (perPage > 100 || perPage <= 0)
      throw new IllegalArgumentException("invalid value for parameter 'per_page'")
    if (page < 0)
      throw new IllegalArgumentException("invalid value for parameter 'page'")
    val (field, order) = sort.split(":") match {
      case Array(f, o) if o == "1" || o == "-1" => (f, o.toInt)
      case Array(f)                             => (f, 1)
      case _ =>
        throw new IllegalArgumentException("invalid value for parameter 'sort'")
    }
    val ordered = df.orderBy(if (order == -1) col(field).desc else col(field).asc)
    ordered.offset(page * perPage).limit(perPage)
  }
}

/** `{{var}}` model templates with undeclared-variable discovery —
  * /root/reference/loudml/model.py:149-204 (Jinja2 in the reference; the
  * capability is plain substitution + listing unbound variables).
  */
object Templates {
  private val VarRe = """\{\{\s*([A-Za-z_]\w*)\s*\}\}""".r

  def variables(template: String): Set[String] =
    VarRe.findAllMatchIn(template).map(_.group(1)).toSet

  def render(template: String, vars: Map[String, String]): String = {
    val missing = variables(template) -- vars.keySet
    require(missing.isEmpty, s"unbound template variables: ${missing.mkString(", ")}")
    VarRe.replaceAllIn(template, m =>
      scala.util.matching.Regex.quoteReplacement(vars(m.group(1))))
  }
}
