package graft.harness

import graft.config.Uuid5

/** C1–C3 + C5 — grid-search combination generation with the reference's
  * exact semantics (reference: src/load_test_generator.py:13-57,
  * src/test_executor.py:28-33).
  *
  * Control-plane code: the grid is tiny (tens of variants), so this is plain
  * Scala — the dataflow analog (crossJoin + window sampling) exists as
  * oracle-checked query q10_grid_even_sample.
  */
object GridGenerator {

  /** One parameter axis: either an inclusive numeric range or an explicit
    * value list (reference: ParameterRange / ParameterValues,
    * src/models.py:4-12).
    */
  sealed trait ParamSpec
  final case class ParamRange(min: BigDecimal, max: BigDecimal,
                              step: BigDecimal) extends ParamSpec
  final case class ParamValues(values: Seq[Any]) extends ParamSpec

  /** Inclusive range expansion with the reference's float-precision guard:
    * after each step the cursor is rounded to 3 decimals
    * (reference: src/load_test_generator.py:21-28). Integral axes stay Long.
    */
  def rangeValues(spec: ParamSpec): Seq[Any] = spec match {
    case ParamValues(vs) => vs
    case ParamRange(min, max, step) =>
      val integral = min.isWhole && max.isWhole && step.isWhole
      val out = Seq.newBuilder[Any]
      var cur = min
      while (cur <= max) {
        out += (if (integral) cur.toLong else cur.toDouble)
        cur = (cur + step).setScale(3, BigDecimal.RoundingMode.HALF_EVEN)
      }
      out.result()
  }

  /** Cartesian product over axes in declared order
    * (reference: itertools.product, src/load_test_generator.py:40).
    */
  def combinations(axes: Seq[(String, ParamSpec)]): Seq[Map[String, Any]] = {
    val expanded = axes.map { case (name, spec) => name -> rangeValues(spec) }
    expanded.foldLeft(Seq(Vector.empty[(String, Any)])) {
      case (acc, (name, values)) =>
        acc.flatMap(combo => values.map(v => combo :+ (name -> v)))
    }.map(_.toMap)
  }

  /** Even sampling cap: indices int(i * len/k) — deterministic, NOT random
    * (reference: src/load_test_generator.py:49-55).
    */
  def evenSample[T](all: Seq[T], maxCombinations: Int): Seq[T] =
    if (maxCombinations < 0 || all.size <= maxCombinations) all
    else {
      val step = all.size.toDouble / maxCombinations
      (0 until maxCombinations).map(i => all((i * step).toInt))
    }

  /** Canonical JSON matching Python's `json.dumps(config, sort_keys=True)`:
    * keys sorted, `", "` / `": "` separators — so variant ids are
    * reproducible across implementations
    * (reference: src/test_executor.py:28-33).
    */
  def canonicalJson(config: Map[String, Any]): String =
    config.toSeq.sortBy(_._1).map { case (k, v) =>
      s""""$k": ${renderValue(v)}"""
    }.mkString("{", ", ", "}")

  private def renderValue(v: Any): String = v match {
    case s: String => "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    case d: Double => if (d.isWhole && math.abs(d) < 1e16) s"${d.toLong}.0" else d.toString
    case other => other.toString
  }

  /** "load_" + first 8 hex of uuid5(NAMESPACE_DNS, canonical json). */
  def variantId(config: Map[String, Any]): String =
    Uuid5.variantId(canonicalJson(config))
}
