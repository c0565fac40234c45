package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  /** The exec node, reaching through AQE wrappers to the plan that
    * actually ran (whose metric accumulators are populated). Query stages
    * are LEAF nodes, so plain collect stops at them — recurse into their
    * wrapped plans explicitly.
    */
  private def findAsOfExec(p: org.apache.spark.sql.execution.SparkPlan)
      : Option[graft.plans.AsOfJoinExec] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val all: Seq[graft.plans.AsOfJoinExec] = p.collect {
      case e: graft.plans.AsOfJoinExec => Seq(e)
      case a: AdaptiveSparkPlanExec => findAsOfExec(a.executedPlan).toSeq
      case q: QueryStageExec => findAsOfExec(q.plan).toSeq
    }.flatten
    all.headOption
  }

  test("asof: latest at-or-before match, exact ties, and no-match nulls") {
    val left = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00")),  // between r1 and r2 → r1
      (2L, 1L, ts("2024-01-01 12:00:00")),  // exactly r2's time → r2 (<=)
      (3L, 1L, ts("2024-01-01 09:00:00")),  // matches r1 exactly
      (4L, 2L, ts("2024-01-01 10:00:00")),  // key 2: only later right → null
      (5L, 3L, ts("2024-01-01 10:00:00"))   // key 3: no right at all → null
    ).toDF("id", "k", "t")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), "r1"),
      (1L, ts("2024-01-01 12:00:00"), "r2"),
      (2L, ts("2024-01-01 23:00:00"), "r3")
    ).toDF("rk", "rt", "tag")

    val out = AsOfJoin.asof(spark, left, right,
        col("k"), col("rk"), col("t"), col("rt"))
      .select(col("id"), col("tag"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap

    assert(out == Map(
      1L -> Some("r1"), 2L -> Some("r2"), 3L -> Some("r1"),
      4L -> None, 5L -> None))
  }

  test("asof within: matches outside the tolerance become unmatched, inside are unchanged") {
    val left = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00")),  // r1 is 60 min old → at the bound, kept
      (2L, 1L, ts("2024-01-01 10:00:01")),  // r1 is 60 min 1 s old → dropped
      (3L, 1L, ts("2024-01-01 12:30:00")),  // r2 is 30 min old → kept
      (4L, 2L, ts("2024-01-01 10:00:00"))   // no right at all → null either way
    ).toDF("id", "k", "t")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), "r1"),
      (1L, ts("2024-01-01 12:00:00"), "r2")
    ).toDF("rk", "rt", "tag")

    val hour = 3600L * 1000000L // timestamp on-keys: micros
    val out = AsOfJoin.asof(spark, left, right,
        col("k"), col("rk"), col("t"), col("rt"), within = Some(hour))
      .select(col("id"), col("tag"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap

    assert(out == Map(
      1L -> Some("r1"), 2L -> None, 3L -> Some("r2"), 4L -> None))
  }

  test("asof within: q45 equals q20 with out-of-tolerance matches masked") {
    val sf = TestSpark.sf
    val bounded = graft.streaming.Events.asofSignupWithin(spark, sf)
      .select(col("event_id"), col("secs_since_signup"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    // mask on the exact MICROSECOND gap, not the truncated seconds the
    // query reports — an event 3600.5 s after its signup reports
    // secs = 3600 but must be unmatched under the 1 h tolerance. The
    // mask is computed on q20's OWN output (it exposes ts + signup_ts),
    // so this really is the q45 ≡ masked-q20 contract, not a private
    // reconstruction of q20.
    val unbounded = graft.streaming.Events.asofSignup(spark, sf)
      .select(col("event_id"),
        expr("timestampdiff(MICROSECOND, signup_ts, ts)").cast("long").as("du"),
        col("secs_since_signup").as("secs"))
      .collect()
      .map(r => r.getLong(0) -> (Option(r.get(1)), Option(r.get(2)))).toMap
    val masked = unbounded.view.mapValues { case (du, secs) =>
      secs.filter(_ => du.exists(_.asInstanceOf[Long] <= 3600000000L))
    }.toMap
    assert(bounded == masked)
    // the tolerance must actually bite on this data
    assert(bounded.values.count(_.isEmpty) >
      unbounded.values.count(_._1.isEmpty),
      "no match fell outside the 1h window — tolerance untested")
  }

  test("asof: null on-values match nothing and null right rows are skipped, not a crash") {
    val left = Seq(
      (1L, 1L, Some(ts("2024-01-01 10:00:00"))), // normal match
      (2L, 1L, None),                            // null on-value → unmatched
      (3L, 2L, Some(ts("2024-01-01 10:00:00")))  // key whose rights include a null
    ).toDF("id", "k", "t")
    val right = Seq(
      (1L, Some(ts("2024-01-01 09:00:00")), "r1"),
      (2L, None, "rnull"),                       // null right on-value → never a candidate
      (2L, Some(ts("2024-01-01 08:00:00")), "r2")
    ).toDF("rk", "rt", "tag")
    val out = AsOfJoin.asof(spark, left, right,
        col("k"), col("rk"), col("t"), col("rt"))
      .select(col("id"), col("tag"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out == Map(1L -> Some("r1"), 2L -> None, 3L -> Some("r2")))
  }

  test("asof: unsupported on-key type is rejected at build time") {
    val l = Seq((1L, "a")).toDF("k", "s")
    val r = Seq((1L, "b")).toDF("rk", "rs")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asof(spark, l, r, col("k"), col("rk"), col("s"), col("rs"))
    }
    assert(e.getMessage.contains("unsupported"))
  }

  test("asof agrees with the compositional window formulation on real data") {
    val dir = TestSpark.sf
    val viaCustom = graft.streaming.Events.asofSignup(spark, dir)
      .select("event_id", "signup_ts").collect()
      .map(r => r.getLong(0) -> Option(r.getTimestamp(1))).toMap

    // compositional fallback: range join + per-event max (row explosion —
    // the plan the custom operator exists to avoid)
    val ev = graft.sources.Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts"))
    val su = graft.sources.Tables.events(spark, dir)
      .filter(col("event_type") === "signup")
      .select(col("user_id").as("su"), col("ts").as("sts"))
    val viaWindow = ev
      .join(su, col("user_id") === col("su") && col("sts") <= col("ts"), "left")
      .groupBy(col("event_id"))
      .agg(max(col("sts")).as("signup_ts"))
      .collect().map(r => r.getLong(0) -> Option(r.getTimestamp(1))).toMap

    assert(viaCustom == viaWindow)
  }

  test("asof metrics: matched + unmatched partitions the left side, null keys counted") {
    val left = Seq(
      (1L, 1L, Some(ts("2024-01-01 10:00:00"))), // matched
      (2L, 1L, None),                            // null on-value → unmatched + null-key
      (3L, 9L, Some(ts("2024-01-01 10:00:00")))  // no right for key → unmatched
    ).toDF("id", "k", "t")
    val right = Seq((1L, ts("2024-01-01 09:00:00"), "r1")).toDF("rk", "rt", "tag")
    val df = AsOfJoin.asof(spark, left, right,
      col("k"), col("rk"), col("t"), col("rt"))
    df.collect()
    val exec = findAsOfExec(df.queryExecution.executedPlan)
    assert(exec.isDefined, "AsOfJoinExec missing from the executed plan")
    val m = exec.get.metrics
    assert(m("numOutputRows").value == 3)
    assert(m("numMatchedRows").value == 1)
    assert(m("numUnmatchedRows").value == 2)
    assert(m("numNullKeyRows").value == 1)
    // the metric surface is declared on the node (visible in the UI and in
    // any plan rendering that prints node metrics)
    assert(Set("numOutputRows", "numMatchedRows", "numUnmatchedRows",
      "numNullKeyRows").subsetOf(m.keySet))
  }

  test("asof plan stability: exec node, its distribution, and ordering are unchanged by metrics") {
    val dir = TestSpark.sf
    val df = graft.streaming.Events.asofSignup(spark, dir)
    val exec = findAsOfExec(df.queryExecution.executedPlan)
    assert(exec.isDefined)
    // exactly one hash exchange per side, sorted (by, on) — the co-
    // partitioned merge shape the operator exists for
    assert(exec.get.requiredChildDistribution.size == 2)
    assert(exec.get.requiredChildOrdering.forall(_.size == 2))
    val formatted = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(formatted)) { df.explain("formatted") }
    assert(formatted.toString.contains("AsOfJoin"),
      "custom exec absent from explain(formatted)")
  }

  test("asof under AQE with a hot by-key: one key carries 50% of rows, output and metrics exact") {
    // The operator's distribution is hash(by) — a hot key lands on ONE
    // partition and is processed by that partition's sort + linear merge.
    // This pins that the shape completes and stays exact under AQE with
    // 50% of the left on a single key (the r4 verdict's skew case); the
    // escape hatch for a key too hot for one partition's sort budget is
    // the q18 salting recipe (split the hot key into k sub-keys on BOTH
    // sides, replicating right rows per sub-key, then asof per sub-key —
    // documented here, deliberately not wired into the operator).
    val n = 100000
    val left = spark.range(n).select(
      col("id"),
      when(col("id") % 2 === 0, 0L).otherwise(col("id") % 50 + 1).as("k"),
      (col("id") * 37 % 6000).as("t"))
    val right = spark.range(5100).select(
      (col("id") % 51).as("rk"),
      col("id").as("rt"), // globally distinct → the matched rt is unambiguous
      concat(lit("r"), col("id")).as("tag"))

    val df = AsOfJoin.asof(spark, left, right,
        col("k"), col("rk"), col("t"), col("rt"))
      .select(col("id"), col("rt")) // metrics read from THIS executed plan
    val got = df
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap

    // local oracle: per key, the sorted right times; per row, the last <= t
    val rightsByKey = (0L until 5100L).groupBy(_ % 51).view.mapValues(_.sorted.toArray).toMap
    val expected = (0L until n.toLong).map { id =>
      val k = if (id % 2 == 0) 0L else id % 50 + 1
      val t = id * 37 % 6000
      id -> rightsByKey(k).takeWhile(_ <= t).lastOption
    }.toMap
    assert(got.size == n)
    assert(got == expected,
      s"mismatches: ${got.collect { case (id, v) if expected(id) != v => (id, v, expected(id)) }.take(3)}")

    val exec = findAsOfExec(df.queryExecution.executedPlan)
    assert(exec.isDefined, "AsOfJoinExec missing under AQE")
    val m = exec.get.metrics
    val matched = expected.values.count(_.isDefined)
    assert(m("numOutputRows").value == n)
    assert(m("numMatchedRows").value == matched)
    assert(m("numUnmatchedRows").value == n - matched)
    assert(m("numNullKeyRows").value == 0)
    assert(matched > n / 2, "skewed hot key should mostly match — data bug otherwise")
  }

  test("asof plan: one exchange per side, no broadcast, merge exec present") {
    val dir = TestSpark.sf
    val df = graft.streaming.Events.asofSignup(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), s"custom exec missing:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), "fell back to NL join")
  }
}
