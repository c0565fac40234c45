package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Extended, Similarity, TextAnalysis}

/** Semantic contracts for the round-3 extension operators (beyond the
  * oracle hash checks the driver runs).
  */
class Round3Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("d10 dup-ngram fraction: bounded, and planted near-dups score high") {
    val d = Dedup.dupNgramFraction(spark, sf)
      .select("doc_id", "n_ngrams", "n_dup", "dup_frac").cache()
    val bad = d.filter(col("dup_frac") < 0 || col("dup_frac") > 1 ||
      col("n_dup") > col("n_ngrams")).count()
    assert(bad == 0)
    // the corpus plants near-duplicate documents (d2 finds pairs); a doc
    // whose twin shares almost all its 8-grams must score near 1
    val nearDupDocs = Dedup.ngramJaccardPairs(spark, sf)
      .select(col("id_a").as("doc_id")).distinct()
    val minPlanted = d.join(nearDupDocs, "doc_id")
      .agg(min(col("dup_frac"))).collect()(0).getDouble(0)
    assert(minPlanted > 0.5, s"planted near-dup scored only $minPlanted")
    d.unpersist()
  }

  test("t14 mixture sample: minority languages keep everything, majority downsamples") {
    val m = TextAnalysis.mixtureSample(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(m.nonEmpty)
    m.foreach { case (lang, nDocs, nSampled, rate) =>
      assert(nSampled <= nDocs && rate <= 1.000001, s"$lang: $nSampled/$nDocs @ $rate")
      if (rate >= 0.9999995) assert(nSampled == nDocs, s"$lang: rate 1 must keep all")
      else {
        // hash sampling concentrates near rate*n (generous 3σ-ish slack)
        val expect = rate * nDocs
        assert(math.abs(nSampled - expect) <= 4 * math.sqrt(expect) + 2,
          s"$lang: sampled $nSampled, expected ≈$expect")
      }
    }
    // the rebalance must actually fire: at least one language downsampled
    assert(m.exists(_._4 < 0.9999995), "no language was downsampled")
  }

  test("s4 int8 quantization: reconstruction error bounded by half a grid step") {
    val dimStep = graft.sources.Tables.embeddings(spark, sf)
      .select(posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy(col("pos"))
      .agg(((max(col("x").cast("double")) - min(col("x").cast("double"))) / 255.0)
        .as("step"))
      .agg(max(col("step"))).collect()(0).getDouble(0)
    val worst = Similarity.quantizeInt8(spark, sf)
      .agg(max(col("max_abs_err")), max(col("mean_abs_err")))
      .collect()(0)
    val (mx, mn) = (worst.getDouble(0), worst.getDouble(1))
    assert(mx <= dimStep / 2 + 1e-6, s"max err $mx exceeds half-step ${dimStep / 2}")
    assert(mn <= mx)
  }

  test("d11 incremental dedup: exactly the cross-parity slice of the full pair set") {
    val full = Dedup.ngramJaccardPairs(spark, sf)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the full set's batch×corpus pairs, normalized to (batch, corpus)
    val expected = full.collect {
      case (a, b) if a % 2 != 0 && b % 2 == 0 => (a, b)
      case (a, b) if a % 2 == 0 && b % 2 != 0 => (b, a)
    }
    val inc = Dedup.incrementalDedup(spark, sf)
      .select("batch_id", "corpus_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(inc == expected, s"inc=${inc.size} expected=${expected.size}")
    assert(inc.nonEmpty, "planted near-dups should cross the parity split")
    // no corpus×corpus or batch×batch pair may appear
    assert(inc.forall { case (b, c) => b % 2 != 0 && c % 2 == 0 })
  }

  test("q47 transition matrix: counts account for every non-final event; shares sum to 100") {
    val ev = graft.sources.Tables.events(spark, sf)
    val totalEvents = ev.count()
    val nUsers = ev.select("user_id").distinct().count()
    val m = graft.streaming.Events.eventTransitionMatrix(spark, sf).cache()
    val totalTransitions = m.agg(sum(col("n_transitions"))).collect()(0).getLong(0)
    assert(totalTransitions == totalEvents - nUsers,
      "each user contributes (events - 1) transitions")
    val offSums = m.groupBy(col("event_type"))
      .agg(sum(col("pct_of_type")).as("p"))
      .filter(abs(col("p") - 100.0) > 0.01).count()
    assert(offSums == 0, "per-source shares must sum to 100")
    m.unpersist()
  }

  test("q46 grouping sets: slices are consistent with the CUBE totals") {
    val gs = Extended.groupingSetsRevenue(spark, sf).cache()
    val cube = Extended.cubeQtyRevenue(spark, sf).cache()
    def grand(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("g_flag") === 1 && col("g_status") === 1)
        .select("revenue").collect()(0).getDouble(0)
    assert(grand(gs) == grand(cube))
    // the (flag, status) slice matches the cube's detailed cells
    val fine = gs.filter(col("g_flag") === 0 && col("g_status") === 0).count()
    val cubeFine = cube.filter(col("g_flag") === 0 && col("g_status") === 0).count()
    assert(fine == cubeFine && fine > 0)
    // grouping sets adds exactly the four declared slices, nothing more
    val slices = gs.select("g_flag", "g_status").distinct().count()
    assert(slices == 4)
    gs.unpersist(); cube.unpersist()
  }
}
