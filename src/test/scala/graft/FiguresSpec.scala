package graft

import org.scalatest.funsuite.AnyFunSuite

/** README figures drift check — the r10 verdict's lead finding, three
  * rounds running: nothing mechanical failed when the committed README's
  * FIGURES block disagreed with `bench_out.json` or the query registry.
  * This suite makes that disagreement a test failure:
  *
  *   - the block's query count and total seconds must equal what
  *     `bench_out.json` actually measures,
  *   - its "slowest five" must be the artifact's top five,
  *   - its correctness "M/M" must equal the registered-query count
  *     (a bench or README left behind by a new registration fails here),
  *   - and every registered query must have a measurement in the
  *     committed bench artifact (a stale artifact at a grown registry —
  *     the exact r9→r10 recurrence — fails here).
  *
  * The `sbt test` count is the one figure a test cannot observe from
  * inside the run (a suite cannot see its siblings' totals), so it stays
  * an explicit `gen_figures.py --tests` argument; everything else in the
  * block is now a pure function of artifacts that this suite re-derives.
  */
class FiguresSpec extends AnyFunSuite {

  private lazy val readme =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("README.md")), "UTF-8")

  private lazy val figures: String = {
    val begin = readme.indexOf("<!-- FIGURES:BEGIN")
    val end = readme.indexOf("<!-- FIGURES:END -->")
    assert(begin >= 0 && end > begin, "README.md has no FIGURES block")
    readme.substring(begin, end)
  }

  /** bench_out.json's per-query seconds (negative = failed, excluded the
    * same way gen_figures.py excludes them).
    */
  private lazy val benchQueries: Map[String, Double] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val json = JsonMethods.parse(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("bench_out.json")), "UTF-8"))
    (json \ "queries") match {
      case JObject(fields) => fields.collect {
        case (k, JDouble(v)) => k -> v
        case (k, JInt(v)) => k -> v.toDouble
        case (k, JDecimal(v)) => k -> v.toDouble
      }.toMap
      case other => fail(s"bench_out.json has no queries object: $other")
    }
  }

  test("FIGURES query count and total match bench_out.json") {
    val ok = benchQueries.filter(_._2 >= 0)
    val m = """\*\*(\d+) queries, ([\d.]+) s total\*\*""".r
      .findFirstMatchIn(figures)
      .getOrElse(fail("no 'N queries, T s total' line in FIGURES block"))
    assert(m.group(1).toInt == ok.size,
      s"README says ${m.group(1)} queries; bench_out.json measures ${ok.size}")
    val total = ok.values.sum
    assert(math.abs(m.group(2).toDouble - total) < 0.051,
      f"README says ${m.group(2)} s; bench_out.json sums to $total%.1f s")
  }

  test("FIGURES slowest-five is bench_out.json's top five") {
    val expected = benchQueries.filter(_._2 >= 0).toSeq
      .sortBy(-_._2).take(5).map(_._1)
    val listed = """`([a-z0-9_]+)` [\d.]+ s""".r
      .findAllMatchIn(figures.linesIterator
        .find(_.startsWith("- slowest five"))
        .getOrElse(fail("no slowest-five line")))
      .map(_.group(1)).toSeq
    assert(listed == expected,
      s"README slowest-five $listed != artifact top five $expected")
  }

  test("FIGURES correctness M/M equals the query registry") {
    val m = """\*\*(\d+)/(\d+) queries\*\*""".r.findFirstMatchIn(figures)
      .getOrElse(fail("no 'M/M queries' correctness line in FIGURES block"))
    val registered = SparkEntry.queries.size
    assert(m.group(1) == m.group(2), "correctness figure is not M/M")
    assert(m.group(1).toInt == registered,
      s"README claims ${m.group(1)}/${m.group(2)} correct; " +
        s"the registry holds $registered queries — regenerate the block " +
        "(tools/gen_figures.py) after re-running the gate")
  }

  test("every registered query has a measurement in bench_out.json") {
    val missing = SparkEntry.queries.keySet -- benchQueries.keySet
    assert(missing.isEmpty,
      s"bench_out.json is stale at the current registry — unmeasured: " +
        missing.toSeq.sorted.mkString(", "))
    val unknown = benchQueries.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty,
      s"bench_out.json measures unregistered queries: " +
        unknown.toSeq.sorted.mkString(", "))
  }
}
