package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the round-2 extension operators (t8/t9/d8/q29/q30). */
class Round2Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("tfidf: exactly top-5 ranks per doc, df bounded by corpus size") {
    val out = graft.operators.TextAnalysis.tfidfTopTerms(spark, sf)
    val n = graft.sources.Tables.documents(spark, sf).count()
    val byDoc = out.groupBy("doc_id").agg(
      count(lit(1)).as("k"), max("rnk").as("maxr"), min("rnk").as("minr"))
    assert(byDoc.filter(col("k") > 5 || col("maxr") > 5 || col("minr") < 1).count() == 0)
    assert(out.filter(col("df") > n || col("df") < 1 || col("tf") < 1).count() == 0)
    // a term appearing in every document has idf ln(1)=0 → never outranks
    // a term unique to the doc with the same tf
    assert(out.filter(col("df") === n && col("tfidf") > 0).count() == 0)
  }

  test("repetition stats: ratios are valid fractions, planted near-dups high") {
    val out = graft.operators.TextAnalysis.repetitionStats(spark, sf)
    assert(out.filter(col("top_trigram_ratio") < 0 || col("top_trigram_ratio") > 1
      || col("dup_line_frac") < 0 || col("dup_line_frac") > 1).count() == 0)
    assert(out.count() == graft.sources.Tables.documents(spark, sf).count())
  }

  test("decontaminate: eval docs excluded, fractions in (0,1], near-dups of eval docs flagged") {
    val out = graft.operators.Dedup.decontaminate(spark, sf).cache()
    assert(out.filter(col("doc_id") % 20 === 0).count() == 0)
    assert(out.filter(col("contamination_frac") <= 0 ||
      col("contamination_frac") > 1.0001).count() == 0)
    // any training doc that is a near-dup (d2) of an eval doc must be flagged
    val pairs = graft.operators.Dedup.ngramJaccardPairs(spark, sf)
    val contaminated = pairs
      .filter(col("id_a") % 20 === 0 && col("id_b") % 20 =!= 0)
      .select(col("id_b").as("doc_id"))
      .union(pairs.filter(col("id_b") % 20 === 0 && col("id_a") % 20 =!= 0)
        .select(col("id_a").as("doc_id")))
      .distinct()
    assert(contaminated.join(out, Seq("doc_id"), "left_anti").count() == 0)
    out.unpersist()
  }

  test("range join: bucketized counts equal the naive theta-join") {
    val got = graft.streaming.Events.purchasesWithRecentClicks(spark, sf)
    val ev = graft.sources.Tables.events(spark, sf)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("cts"))
    val naive = ev.filter(col("event_type") === "purchase")
      .join(c, col("user_id") === col("cu") &&
        col("cts") >= col("ts") - expr("INTERVAL 30 MINUTES") &&
        col("cts") < col("ts"), "left")
      .groupBy(col("event_id"))
      .agg(count(col("cts")).as("n_naive"))
    val diff = got.join(naive, "event_id")
      .filter(col("n_recent_clicks") =!= col("n_naive"))
    assert(diff.count() == 0)
  }

  test("label propagation converges on a chain with diameter far beyond the old cap") {
    // 14 docs, each a 150-token window slid by 12 over a shared sequence:
    // shingle Jaccard between windows offset k·12 is (148-12k)/(148+12k) —
    // ≈0.89 for neighbors (edge), ≈0.72 at distance 2 (no edge) → the
    // near-dup graph is a PATH with diameter 13 (the round-1 advisor
    // scenario: the old maxIters=5 silently returned wrong roots here)
    import spark.implicits._
    val slide = 12
    val words = (0 until 14 * slide + 160).map(i => s"w$i")
    val docs = (0 until 14).map { i =>
      val text = words.slice(i * slide, i * slide + 150).mkString(" ")
      (i.toLong, "en", "synthetic", text.length.toLong, text)
    }.toDF("doc_id", "lang", "source", "n_chars", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_chain").toString
    docs.coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val clusters = graft.operators.Dedup.nearDupClusters(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters.size == 14, s"all chain members clustered: $clusters")
    assert(clusters.values.toSet == Set(0L), s"single component rooted at 0: $clusters")
  }

  test("simhash banding recall is exact: pairs equal brute-force hamming filter") {
    val banded = graft.operators.Dedup.simhashNearDupPairs(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val sigs = graft.operators.Dedup.simhashSignatures(spark, sf)
    val brute = sigs.select(col("doc_id").as("id_a"), col("simhash").as("sa"))
      .join(sigs.select(col("doc_id").as("id_b"), col("simhash").as("sb")),
        col("id_a") < col("id_b"))
      .withColumn("hamming", bit_count(col("sa").bitwiseXOR(col("sb"))).cast("long"))
      .filter(col("hamming") <= 3)
      .select(col("id_a"), col("id_b"), col("hamming"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(banded == brute, s"banded=${banded.size} brute=${brute.size}")
  }

  test("unpivot: melted rows reconstruct the per-flag totals") {
    val out = graft.operators.Extended.unpivotQtyByFlag(spark, sf)
    val li = graft.sources.Tables.lineitem(spark, sf)
    val statuses = li.select(countDistinct("l_linestatus")).collect()(0).getLong(0)
    assert(out.count() == statuses * 3)
    val direct = li.filter(col("l_returnflag") === "R")
      .agg(round(sum(col("l_quantity")), 2)).collect()(0).getDouble(0)
    val melted = out.filter(col("l_returnflag") === "R")
      .agg(round(sum(col("total_qty")), 2)).collect()(0).getDouble(0)
    assert(math.abs(direct - melted) < 0.02)
  }
}
