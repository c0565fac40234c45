package graft

import org.scalatest.funsuite.AnyFunSuite

/** README figures drift check — the r10 verdict's lead finding, three
  * rounds running: nothing mechanical failed when the committed README's
  * FIGURES block disagreed with `bench_out.json` or the query registry.
  * This suite makes that disagreement a test failure.
  *
  * Calibration (r11 verdict "what's wrong" #1): the STRUCTURAL figures —
  * query count, registry membership, correctness M/M — are exact, because
  * they only change when a registration or a bench run is left behind.
  * The WALL figures — total seconds, slowest-five ranks — are box
  * weather: the driver's routine post-commit rerun moved a ~145 s suite
  * by 3.3 s and re-shuffled sub-second ranks, and an exact assertion
  * turned that noise into a red working tree. So total seconds gets a
  * [[FiguresSpec.TotalTolerance]] (10%) band and the slowest-five check
  * is set-containment (the five listed must sit inside the artifact's
  * top eight), which still fails on structural drift (a new expensive
  * query missing from the list, a removed query still listed) but not on
  * adjacent ranks swapping under load.
  *
  * The `sbt test` count is the one figure a test cannot observe from
  * inside the run (a suite cannot see its siblings' totals), so it stays
  * an explicit `gen_figures.py --tests` argument; everything else in the
  * block is a pure function of artifacts that this suite re-derives —
  * and each check is a named function so the negative cases below can
  * prove the failure modes still fire.
  */
class FiguresSpec extends AnyFunSuite {
  import FiguresSpec._

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

  test("FIGURES query count is exact and total is within the noise band") {
    checkCountAndTotal(figures, benchQueries).foreach(fail(_))
  }

  test("FIGURES slowest-five sits inside the artifact's top eight") {
    checkSlowestFive(figures, benchQueries).foreach(fail(_))
  }

  test("FIGURES correctness M/M equals the query registry") {
    checkCorrectness(figures, SparkEntry.queries.size).foreach(fail(_))
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

  // ---- negative cases: the checks must still FAIL on structural drift
  // (this is what distinguishes the loosened bands from a rubber stamp)

  private val fakeBench = Map("qa" -> 10.0, "qb" -> 8.0, "qc" -> 6.0,
    "qd" -> 4.0, "qe" -> 2.0, "qf" -> 1.0, "qg" -> 0.5, "qh" -> 0.4,
    "qi" -> 0.3)
  private def fakeFigures(n: Int, total: Double, slow: Seq[String],
                          correct: String = "9/9"): String =
    s"""<!-- FIGURES:BEGIN
       |**$n queries, $total s total**
       |- slowest five: ${slow.map(q => s"`$q` 1.0 s").mkString(", ")}
       |**$correct queries**
       |""".stripMargin

  test("a wrong query count still fails") {
    assert(checkCountAndTotal(
      fakeFigures(8, 32.2, Seq("qa", "qb", "qc", "qd", "qe")),
      fakeBench).nonEmpty)
  }

  test("a total outside the 10% band still fails, inside it passes") {
    assert(checkCountAndTotal(
      fakeFigures(9, 40.0, Seq("qa", "qb", "qc", "qd", "qe")),
      fakeBench).nonEmpty, "a 24% total drift must fail")
    assert(checkCountAndTotal(
      fakeFigures(9, 34.0, Seq("qa", "qb", "qc", "qd", "qe")),
      fakeBench).isEmpty, "a 5% total drift is box weather")
  }

  test("a slowest-five entry outside the artifact top eight still fails") {
    assert(checkSlowestFive(
      fakeFigures(9, 32.2, Seq("qa", "qb", "qc", "qd", "qi")),
      fakeBench).nonEmpty, "qi ranks 9th — listing it is structural drift")
    assert(checkSlowestFive(
      fakeFigures(9, 32.2, Seq("qa", "qb", "qc", "qe", "qf")),
      fakeBench).isEmpty, "top-8 members swapping ranks is box weather")
  }

  test("an artifact top-three query missing from the listed five still fails") {
    // qa regressed to slowest; the stale README lists the OLD five
    // (ranks 2-6) — containment alone would pass, the top-three check
    // catches it
    assert(checkSlowestFive(
      fakeFigures(9, 32.2, Seq("qb", "qc", "qd", "qe", "qf")),
      fakeBench).nonEmpty, "omitting the artifact's slowest is structural drift")
  }

  test("a correctness figure at a stale registry still fails") {
    assert(checkCorrectness(
      fakeFigures(9, 32.2, Seq("qa", "qb", "qc", "qd", "qe"), "8/8"),
      9).nonEmpty)
    assert(checkCorrectness(
      fakeFigures(9, 32.2, Seq("qa", "qb", "qc", "qd", "qe"), "8/9"),
      9).nonEmpty, "a non-M/M figure must fail")
  }
}

object FiguresSpec {
  /** Relative band on the FIGURES total-seconds claim — wide enough for
    * the documented 10-15% box-window drift, narrow enough that a bench
    * artifact from a different registry (±queries) or a structural
    * slowdown still fails (the count check catches the former exactly).
    */
  val TotalTolerance = 0.10

  /** None = pass; Some(message) = the check failed with that reason. */
  def checkCountAndTotal(figures: String,
                         bench: Map[String, Double]): Option[String] = {
    val ok = bench.filter(_._2 >= 0)
    val m = """\*\*(\d+) queries, ([\d.]+) s total\*\*""".r
      .findFirstMatchIn(figures)
      .getOrElse(return Some("no 'N queries, T s total' line in FIGURES block"))
    if (m.group(1).toInt != ok.size)
      return Some(s"README says ${m.group(1)} queries; " +
        s"bench_out.json measures ${ok.size}")
    val total = ok.values.sum
    val drift = math.abs(m.group(2).toDouble - total)
    if (drift > TotalTolerance * total)
      Some(f"README says ${m.group(2)} s; bench_out.json sums to " +
        f"$total%.1f s — ${100 * drift / total}%.0f%% apart (band " +
        f"${100 * TotalTolerance}%.0f%%)")
    else None
  }

  def checkSlowestFive(figures: String,
                       bench: Map[String, Double]): Option[String] = {
    val ranked = bench.filter(_._2 >= 0).toSeq.sortBy(-_._2).map(_._1)
    val top8 = ranked.take(8).toSet
    val top3 = ranked.take(3)
    val line = figures.linesIterator.find(_.contains("slowest five"))
      .getOrElse(return Some("no slowest-five line"))
    val listed = """`([a-z0-9_]+)` [\d.]+ s""".r
      .findAllMatchIn(line).map(_.group(1)).toSeq
    if (listed.size != 5)
      return Some(s"slowest-five line lists ${listed.size} queries")
    val strays = listed.filterNot(top8.contains)
    if (strays.nonEmpty)
      return Some(s"README slowest-five lists $strays outside the " +
        s"artifact's top eight ${top8.toSeq.sorted} — regenerate the block")
    // both directions are structural: a listed query outside the top
    // eight (above), AND an artifact top-three query the list omits — a
    // newly-slowest query pushing the old five down to ranks 2-6 would
    // otherwise pass containment while the README misses the one row
    // that matters most
    val missed = top3.filterNot(listed.contains)
    if (missed.nonEmpty)
      Some(s"artifact top-three $missed missing from README slowest-five " +
        s"$listed — regenerate the block")
    else None
  }

  def checkCorrectness(figures: String, registered: Int): Option[String] = {
    val m = """\*\*(\d+)/(\d+) queries\*\*""".r.findFirstMatchIn(figures)
      .getOrElse(return Some("no 'M/M queries' correctness line"))
    if (m.group(1) != m.group(2))
      Some("correctness figure is not M/M")
    else if (m.group(1).toInt != registered)
      Some(s"README claims ${m.group(1)}/${m.group(2)} correct; the " +
        s"registry holds $registered queries — regenerate the block " +
        "(tools/gen_figures.py) after re-running the gate")
    else None
  }
}
