package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-7 registrations: s1 became multi-index candidate-driven (the
  * r6 verdict's last corpus×queries plan left the graded registry — the
  * brute-force scan survives only as the unregistered exact-recall
  * baseline, the same demotion s5/s6's full scans got in r6), and s9's
  * radius filter moved onto the 4dp-rounded cosine so the boundary is
  * pinned across engines.
  */
class Round7Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("s1 multi-index: candidate-bounded, exact scores, recall dominates both indexes") {
    import graft.operators.Similarity
    graft.expressions.VectorExpressions.register(spark)
    val raw = graft.sources.Tables.embeddings(spark, sf)
    val lsh = Similarity.lshCandidates(raw).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfCandidates(raw, autoCells = true).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val s1 = Similarity.annMultiIndexTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val bf = Similarity.annBruteForceTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(s1.nonEmpty)
    // every returned neighbor came from one of the two generators — the
    // exact rerank never saw a non-candidate row
    val union = lsh ++ ivf
    val escaped = s1.filterNot(g => union((g._1, g._2)))
    assert(escaped.isEmpty, s"non-candidate results: ${escaped.take(3)}")
    // ranks contiguous from 1, scores non-increasing per query
    s1.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq, s"query $q ranks")
      val byRank = rows.sortBy(_._3).map(_._4)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b }, s"query $q order")
    }
    // scoring is EXACT: any (query, neighbor) the brute force also ranked
    // carries the identical 4dp cosine
    val exact = bf.map(r => (r._1, r._2) -> r._4).toMap
    s1.foreach { case (q, n, _, c) =>
      exact.get((q, n)).foreach(e => assert(math.abs(e - c) < 1e-9, s"($q,$n) cos"))
    }
    // the union's recall vs the exact baseline dominates EACH index
    // alone — the point of multi-index retrieval. s2 = exact top-k over
    // the LSH candidates, so comparing candidate-set coverage of the true
    // top-k pairs compares the indexes directly.
    val truth = bf.map(r => (r._1, r._2)).toSet
    val lshRecall = truth.count(lsh).toDouble / truth.size
    val ivfRecall = truth.count(ivf).toDouble / truth.size
    val s1Recall = truth.count { p => s1.exists(g => (g._1, g._2) == p) }
      .toDouble / truth.size
    assert(s1Recall >= lshRecall - 1e-12 && s1Recall >= ivfRecall - 1e-12,
      s"union recall $s1Recall must dominate lsh=$lshRecall ivf=$ivfRecall")
    // gate-scale absolute floor: 500 vectors spread 256 LSH buckets thin
    // and probe 3 of 10 IVF label cells — the per-index profile measures
    // ~0.46 here (the registered s3's documented recall); the union can't
    // be worse, and at soak scales the derivations widen both indexes
    assert(s1Recall >= 0.4, s"multi-index recall unexpectedly low: $s1Recall")
  }

  test("s1 multi-index: a neighbor found by both indexes scores once (the distinct)") {
    import graft.operators.Similarity
    val s1 = Similarity.annMultiIndexTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(s1.distinct.length == s1.length,
      "duplicate (query, neighbor) rows — the candidate union must dedupe")
  }

  test("d20: aggressive key merges at least as much as d1, splits nothing") {
    import graft.operators.Dedup
    val d1 = Dedup.exactDedupGroups(spark, sf).collect()
    val d20 = Dedup.normalizedDedupGroups(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(d20.nonEmpty)
    // group membership is total on both keys
    assert(d20.map(_._2).sum == d1.map(_.getLong(1)).sum)
    // the aggressive key is a coarsening: never more groups than d1
    assert(d20.length <= d1.length)
    d20.foreach { case (_, copies, variants) =>
      assert(variants >= 1 && variants <= copies)
    }
  }

  test("t27: FK grade recomputes from the emitted integer counts") {
    val rows = graft.operators.TextAnalysis.readability(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w, s9, syl) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(w >= 1 && s9 >= 1 && syl >= 0)
      val want = BigDecimal(0.39 * (w.toDouble / s9.toDouble) +
        11.8 * (syl.toDouble / math.max(w, 1L).toDouble) - 15.59 + 1e-9)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(4) - want) < 5e-4, s"doc ${r.getLong(0)}")
    }
  }

  test("t28: class ratios partition the text; verdict binds on the rounded values") {
    val rows = graft.operators.TextAnalysis.charClassProfile(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val rs = (2 to 5).map(r.getDouble)
      rs.foreach(x => assert(x >= 0.0 && x <= 1.0))
      assert(math.abs(rs.sum - 1.0) < 5e-4, s"doc ${r.getLong(0)}: ratios ${rs.sum}")
      val want = if (rs(0) >= 0.6 && rs(3) <= 0.1) "clean" else "suspect"
      assert(r.getString(6) == want, s"doc ${r.getLong(0)} verdict")
    }
  }

  test("t29: KL is non-negative, token mass is total, one row per source") {
    val rows = graft.operators.TextAnalysis.sourceKlDivergence(spark, sf).collect()
    val sources = graft.sources.Tables.documents(spark, sf)
      .select("source").distinct().count()
    assert(rows.length == sources)
    val corpusTokens = graft.operators.TextAnalysis.textStats(spark, sf)
      .agg(sum(col("n_tokens"))).collect()(0).getLong(0)
    assert(rows.map(_.getLong(1)).sum == corpusTokens)
    rows.foreach(r => assert(r.getDouble(3) >= -1e-4,
      s"source ${r.getString(0)}: KL ${r.getDouble(3)}"))
  }

  test("s10: every hit satisfies the tenant predicate and is the filtered top-k") {
    import graft.operators.Similarity
    val labels = graft.sources.Tables.embeddings(spark, sf)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val got = Similarity.annFilteredTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3), r.getDouble(4)))
    assert(got.nonEmpty)
    got.foreach { case (q, n, lbl, _, _) =>
      assert(labels(n) == labels(q), s"($q,$n) crosses tenants")
      assert(lbl == labels(n))
    }
    // filtered results are a (ranked) subset of the UNfiltered candidate
    // scoring: dropping a tenant-mismatched candidate must never admit a
    // worse-scoring one above a better same-tenant one
    got.groupBy(_._1).foreach { case (q, rows) =>
      val byRank = rows.sortBy(_._4)
      assert(byRank.map(_._4).toSeq == (1L to rows.length).toSeq, s"query $q ranks")
      val cs = byRank.map(_._5)
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b }, s"query $q order")
    }
  }

  test("s11: one Lloyd step — total membership, self-assigned seeds, shift sanity") {
    import graft.operators.Similarity
    val res = Similarity.kmeansStep(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val n = graft.sources.Tables.embeddings(spark, sf).count()
    // every seed is its own nearest centroid (d²=0), so all K clusters live
    assert(res.length == Similarity.KmeansK)
    assert(res.map(_._2).sum == n, "every vector assigned exactly once")
    res.foreach { case (c, m, inertia, shift) =>
      assert(m >= 1, s"cluster $c empty")
      assert(inertia >= 0.0 && shift >= 0.0)
    }
    // the K seeds are the K lowest vec_ids
    val expectSeeds = graft.sources.Tables.embeddings(spark, sf)
      .orderBy(col("vec_id")).limit(Similarity.KmeansK)
      .collect().map(_.getLong(0)).toSet
    assert(res.map(_._1).toSet == expectSeeds)
  }

  test("m7: frame energies match the direct byte computation") {
    import graft.expressions.PcmFrameEnergies
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").orderBy("doc_id").limit(20).collect()
    val got = graft.multimodal.Multimodal.audioEnergyProfile(spark, sf)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.get(3), r.get(4))).toMap
    docs.foreach { d =>
      val en = PcmFrameEnergies.energies(
        d.getString(1).getBytes("UTF-8"), PcmFrameEnergies.FrameLen)
      val (nf, tot, peakF, peakE) = got(d.getLong(0))
      assert(nf == en.length, s"doc ${d.getLong(0)} frames")
      assert(tot == en.sum, s"doc ${d.getLong(0)} total")
      if (en.nonEmpty) {
        val m = en.max
        assert(peakE == m && peakF == en.indexOf(m).toLong, s"doc ${d.getLong(0)} peak")
      } else assert(peakF == null && peakE == null)
    }
  }

  test("q51: the bounded-domain plan equals the quadratic dominance definition") {
    val parts = graft.sources.Tables.part(spark, sf)
      .select(col("p_partkey"), col("p_size"),
        col("p_retailprice").cast("double")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val expect = parts.filter { case (_, s1, p1) =>
      !parts.exists { case (_, s2, p2) =>
        p2 <= p1 && s2 >= s1 && (p2 < p1 || s2 > s1)
      }
    }.map(t => (t._1, t._2, t._3)).toSet
    val got = graft.operators.Extended.partSkyline(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    assert(got == expect, s"skyline mismatch: extra=${(got -- expect).take(3)} " +
      s"missing=${(expect -- got).take(3)}")
    assert(got.nonEmpty)
  }

  test("s9 radius filter binds on the ROUNDED cosine (the cross-engine boundary pin)") {
    import graft.operators.Similarity
    val got = Similarity.annRadiusSearch(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.nonEmpty)
    got.foreach { case (q, n, c) =>
      assert(c >= Similarity.RadiusDefault, s"($q,$n) cos $c below radius")
      // 4dp-rounded: scaled value is integral (what makes >= radius a
      // deterministic comparison on both engines)
      assert(math.abs(c * 10000 - math.rint(c * 10000)) < 1e-6,
        s"($q,$n) cos $c not 4dp-rounded")
    }
  }

  test("d21: a planted 12-token shared run spans 5 windows at either offset") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_d21").toString
    val run = (1 to 12).map(i => s"run$i").mkString(" ")
    val a = s"ax1 ax2 ax3 $run ay1 ay2 ay3 ay4 ay5"
    val b = s"bx1 bx2 bx3 bx4 bx5 bx6 bx7 $run by1 by2"
    val c = (1 to 30).map(i => s"cz$i").mkString(" ")
    spark.createDataFrame(Seq(
      (1L, a, "en", "web", a.length.toLong),
      (2L, b, "en", "web", b.length.toLong),
      (3L, c, "en", "web", c.length.toLong)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.operators.Dedup.longestSharedSpan(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // a 12-token run holds 12-8+1 = 5 consecutive 8-token windows; every
    // window crossing the run boundary mixes in doc-unique tokens
    assert(out(1L) == (13L, 5L, 5L, 12L), s"doc1: ${out(1L)}")
    assert(out(2L) == (14L, 5L, 5L, 12L), s"doc2: ${out(2L)}")
    assert(out(3L)._2 == 0L && out(3L)._3 == 0L && out(3L)._4 == 0L,
      s"doc3: ${out(3L)}")
  }

  test("d21 corpus invariants: runs bounded by shared windows; span = run + 7") {
    val rows = graft.operators.Dedup.longestSharedSpan(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nw, ns, mr, span) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(ns <= nw && mr <= ns, s"doc ${r.getLong(0)}: ns=$ns nw=$nw mr=$mr")
      assert(if (mr == 0) span == 0 else span == mr + 7,
        s"doc ${r.getLong(0)}: mr=$mr span=$span")
    }
    assert(rows.exists(_.getLong(3) > 0),
      "planted near-dups must surface contiguous shared spans")
  }

  test("st6: dedup accounting is exact and first_ts is the key's event-time min") {
    import org.apache.spark.sql.functions._
    val out = graft.streaming.Events.eventDedup(spark, sf).collect()
    val ev = graft.sources.Tables.events(spark, sf)
    assert(out.map(_.getLong(4)).sum + out.length == ev.count(),
      "every event is either a key's first or counted in its n_dups")
    val mins = ev.groupBy(col("user_id"), col("event_type"))
      .agg(min(col("ts")).as("mn")).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getTimestamp(2)).toMap
    out.foreach { r =>
      assert(r.getTimestamp(2) == mins((r.getLong(0), r.getString(1))),
        s"key (${r.getLong(0)}, ${r.getString(1)}) first_ts not the min")
    }
  }

  test("q52: a purchase exactly one half-life old carries weight 1/2") {
    val dir = java.nio.file.Files.createTempDirectory("graft_q52").toString
    val t0 = java.sql.Timestamp.valueOf("2024-01-08 00:00:00")
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00") // 7 d older
    spark.createDataFrame(Seq(
      (0L, t1, 1L, "purchase", 10.0, "{}"),
      (1L, t0, 1L, "purchase", 40.0, "{}"),
      (2L, t0, 1L, "view", 99.0, "{}"))) // excluded
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = graft.operators.Extended.ewmaSpend(spark, dir).collect()
    assert(r.length == 1)
    assert(r(0).getLong(1) == 2L && r(0).getDouble(2) == 50.0)
    // (40·1 + 10·½) / (1 + ½) = 30 — the view's 99 must not appear
    assert(math.abs(r(0).getDouble(3) - 30.0) < 1e-4, s"ewma=${r(0).getDouble(3)}")
  }

  test("t30: burstiness separates a clumped token from a uniform one") {
    val dir = java.nio.file.Files.createTempDirectory("graft_t30").toString
    val docs = Seq(
      (1L, "aa aa aa aa bb", "en", "web", 14L),
      (2L, "bb f21 f22", "en", "web", 10L),
      (3L, "bb f31 f32", "en", "web", 10L),
      (4L, "bb f41 f42", "en", "web", 10L))
    spark.createDataFrame(docs).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val b = graft.operators.TextAnalysis.tokenBurstiness(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    // "aa": counts (4,0,0,0) over N=4 → mean 1, E[x²] 4, var 3 → b = 3
    // "bb": once everywhere → var 0 → b = 0
    assert(b("aa") == 3.0, s"aa: ${b("aa")}")
    assert(b("bb") == 0.0, s"bb: ${b("bb")}")
  }

  test("d22: cohesion separates a planted clique from a planted chain") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_d22").toString
    // docs 1,2,3: identical → a triangle with all-1.0 edges, density 1.
    // docs 4,5,6: sliding 90-token windows of a 100-token stream — 4 and
    // 6 each share 88 of 98 shingles with 5 (j = 0.8980 ≥ τ) but only 78
    // of 98 with each other (j = 0.7959 < τ) → a 2-edge CHAIN, density
    // 2/3: exactly the glued-through-an-intermediate cluster this audit
    // exists to flag.
    val clique = (1 to 40).map(i => s"a$i").mkString(" ")
    def win(from: Int, to: Int) = (from to to).map(i => s"b$i").mkString(" ")
    val rows = Seq(
      (1L, clique, "en", "web", clique.length.toLong),
      (2L, clique, "en", "web", clique.length.toLong),
      (3L, clique, "en", "web", clique.length.toLong),
      (4L, win(1, 90), "en", "book", 0L),
      (5L, win(1, 100), "en", "book", 0L),
      (6L, win(11, 100), "en", "book", 0L))
    spark.createDataFrame(rows).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.operators.Dedup.clusterCohesion(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))).toMap
    assert(out(1L) == (3L, 3L, 1.0, 1.0, 1.0), s"clique: ${out(1L)}")
    // 88/98 rounds to 0.8980; two such edges over C(3,2) slots
    assert(out(4L) == (3L, 2L, 0.898, 0.898, 0.6667), s"chain: ${out(4L)}")
  }

  test("q53: a planted 10x spike hour is flagged with the right sign") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_q53").toString
    // 24 hours of 5 events each, then hour 25 with 50: z >> 2 at the spike
    val rows = (0 until 24).flatMap { h =>
      (0 until 5).map(i => ((h * 5 + i).toLong,
        java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:10:00"), 1L, "view",
        1.0, "{}"))
    } ++ (0 until 50).map(i => ((200 + i).toLong,
      java.sql.Timestamp.valueOf("2024-01-02 03:10:00"), 1L, "view", 1.0, "{}"))
    spark.createDataFrame(rows)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.streaming.Events.hourlyAnomaly(spark, dir).collect()
    assert(out.length == 1, s"only the spike hour: ${out.toSeq}")
    assert(out(0).getLong(2) == 50L && out(0).getDouble(4) > 2.0)
  }

  test("m9: silence trim recomputed byte-for-byte; all-quiet payload keeps NULLs") {
    val dir = java.nio.file.Files.createTempDirectory("graft_m9").toString
    // doc 1: quiet 'a' frame, loud space frame, quiet 'a' frame, loud '0'
    // tail → first_loud 1, last_loud 3. doc 2: all 'a' → all quiet.
    val t1 = "a" * 256 + " " * 256 + "a" * 256 + "0" * 100
    val t2 = "a" * 600
    spark.createDataFrame(Seq(
      (1L, t1, "en", "web", t1.length.toLong),
      (2L, t2, "en", "web", t2.length.toLong)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.multimodal.Multimodal.silenceTrim(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(1) == 4 && out(1L).getLong(2) == 2 &&
      out(1L).getLong(3) == 1 && out(1L).getLong(4) == 3, s"doc1: ${out(1L)}")
    assert(out(2L).getLong(2) == 0 && out(2L).isNullAt(3) && out(2L).isNullAt(4),
      s"doc2: ${out(2L)}")
  }

  test("t31: temperature weights sum to 1, flatten the head, and price epochs") {
    val out = graft.operators.TextAnalysis.temperatureMixture(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(3), r.getDouble(4),
        r.getDouble(5)))
    assert(out.nonEmpty)
    assert(math.abs(out.map(_._3).sum - 1.0) < 1e-3, "raw shares sum to 1")
    assert(math.abs(out.map(_._4).sum - 1.0) < 1e-3, "temp weights sum to 1")
    // α < 1 flattens: the largest source is DOWN-weighted, the smallest
    // UP-weighted, relative to proportional sampling
    val byTokens = out.sortBy(_._2)
    assert(byTokens.last._4 <= byTokens.last._3 + 1e-9,
      s"largest source must not gain weight: ${byTokens.last}")
    assert(byTokens.head._4 >= byTokens.head._3 - 1e-9,
      s"smallest source must not lose weight: ${byTokens.head}")
    // effective epochs = budget · w / c, recomputed per row
    out.foreach { case (s, c, _, w, ep) =>
      val expect = graft.operators.TextAnalysis.MixtureBudgetTokens * w / c
      assert(math.abs(ep - expect) < 1e-3, s"$s epochs $ep vs $expect")
    }
  }

  test("t32: coverage curve monotone, k=10 point recomputed from raw counts") {
    import org.apache.spark.sql.functions._
    val out = graft.operators.TextAnalysis.coverageCurve(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(out.map(_._1).toSeq ==
      graft.operators.TextAnalysis.CoverageKs.map(_.toLong))
    // monotone in k, bounded by 1, top_types = min(k, vocab)
    out.sliding(2).foreach { case Array(a, b) =>
      assert(b._5 >= a._5 - 1e-12 && b._4 >= a._4, s"non-monotone: $a -> $b")
    }
    out.foreach { case (k, vocab, types, _, cov) =>
      assert(types == math.min(k, vocab) && cov <= 1.0 + 1e-9)
    }
    // independent recomputation of the k=10 checkpoint
    val tf = graft.sources.Tables.documents(spark, sf)
      .select(explode(split(regexp_replace(lower(trim(col("text"))),
        "\\s+", " "), " ")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val top10 = tf.sortBy { case (t, f) => (-f, t) }.take(10).map(_._2).sum
    assert(out.head._4 == top10, s"k=10 covered ${out.head._4} vs $top10")
  }

  test("s12: planted separated clusters score high; single label scores 0") {
    val dir = java.nio.file.Files.createTempDirectory("graft_s12").toString
    def vec(axis: Int, eps: Float): Array[Float] = {
      val v = Array.fill(8)(0.0f); v(axis) = 1.0f; v((axis + 4) % 8) = eps; v
    }
    // two tight clusters on orthogonal axes → b ≈ 1, a ≈ 0, s ≈ 1
    val rows = (0 until 6).map(i =>
      (i.toLong, vec(0, 0.01f * (i + 1)), 0)) ++
      (6 until 12).map(i => (i.toLong, vec(2, 0.01f * (i - 5)), 1))
    spark.createDataFrame(rows).toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = graft.operators.Similarity.labelSilhouette(spark, dir).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out.keySet == Set(0, 1) && out.values.forall(_._1 == 6L))
    out.foreach { case (l, (_, s)) => assert(s > 0.9, s"label $l silhouette $s") }

    // degenerate: one label only → b falls back to a, silhouette exactly 0
    val dir1 = java.nio.file.Files.createTempDirectory("graft_s12b").toString
    spark.createDataFrame(rows.take(6)).toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir1/embeddings.parquet")
    val solo = graft.operators.Similarity.labelSilhouette(spark, dir1).collect()
    assert(solo.length == 1 && solo(0).getDouble(2) == 0.0, s"${solo.toSeq}")
  }

  test("q54: deciles partition the customers into an increasing Lorenz curve") {
    val out = graft.operators.Extended.spendDeciles(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    val nCust = graft.sources.Tables.orders(spark, sf)
      .select("o_custkey").distinct().count()
    assert(out.map(_._2).sum == nCust, "buckets partition the customers")
    assert(out.map(_._1).toSeq == out.map(_._1).toSeq.sorted)
    // deciles are by ascending spend → per-bucket share non-decreasing
    // (bucket populations are equal up to boundary ties)
    out.sliding(2).foreach { case Array(a, b) =>
      assert(b._4 >= a._4 - 1e-6, s"Lorenz share dipped: $a -> $b")
    }
    assert(math.abs(out.last._5 - 1.0) < 1e-3,
      s"cumulative share must reach 1: ${out.last}")
    // cum_share is the running sum of the rounded shares, recomputed
    val cums = out.scanLeft(0.0)(_ + _._4).tail
    out.zip(cums).foreach { case (row, c) =>
      assert(math.abs(row._5 - c) < 1e-5, s"cum drift at ${row._1}") }
  }

  test("q55: sweep-line peak equals a brute-force recount on one group") {
    import org.apache.spark.sql.functions._
    // integer-µs comparison end-to-end: event timestamps carry µs, and the
    // JVM-local Timestamp accessors would truncate/shift them
    val out = graft.operators.Extended.maxConcurrency(spark, sf)
      .select(col("event_type"), col("day").cast("string"),
        col("max_concurrent"), unix_micros(col("peak_ts")), col("n_events"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out.nonEmpty)
    val ((typ, day), (mx, peakUs, nEv)) = out.head
    val evs = graft.sources.Tables.events(spark, sf)
      .filter(col("event_type") === typ &&
        to_date(col("ts")).cast("string") === day)
      .select(unix_micros(col("ts"))).collect().map(_.getLong(0)).sorted
    assert(nEv == evs.length, "n_events is the group's event count")
    val horizon = graft.operators.Extended.ConcurrencySessionSeconds * 1000000L
    val dayEndUs = java.time.LocalDate.parse(day).plusDays(1)
      .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli * 1000L
    // brute force: concurrency at each instant (releases before acquires)
    val deltas = evs.map(t => (t, 1)) ++
      evs.map(t => (math.min(t + horizon, dayEndUs), -1))
    var cur = 0; var best = 0; var bestT = 0L
    deltas.sortBy { case (t, d) => (t, d) }.foreach { case (t, d) =>
      cur += d; if (cur > best) { best = cur; bestT = t }
    }
    assert(mx == best, s"peak $mx vs brute-force $best")
    assert(peakUs == bestT, s"peak instant $peakUs vs $bestT")
  }

  test("m10: clipping counts spaces on text payloads; planted verdict split") {
    val dir = java.nio.file.Files.createTempDirectory("graft_m10").toString
    val t1 = "aa aa aa aa aa"   // 4 spaces of 14 → 0.286 > 0.16: clipped
    val t2 = "aaaaaaaaaaaa a"   // 1 space of 14 → 0.071: clean
    spark.createDataFrame(Seq(
      (1L, t1, "en", "web", t1.length.toLong),
      (2L, t2, "en", "web", t2.length.toLong)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.multimodal.Multimodal.audioClipping(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(4))).toMap
    assert(out(1L) == ((14L, 4L, true)), s"doc1: ${out(1L)}")
    assert(out(2L) == ((14L, 1L, false)), s"doc2: ${out(2L)}")
    // expression agrees with its own entry point on real corpus bytes
    val sample = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").limit(5).collect()
    val got = graft.multimodal.Multimodal.audioClipping(spark, sf)
      .filter(col("doc_id").isin(sample.map(_.getLong(0)): _*))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    sample.foreach { r =>
      val expect = graft.expressions.PcmClipCount.clipped(
        r.getString(1).getBytes("UTF-8"),
        graft.expressions.PcmClipCount.ClipThreshold)
      assert(got(r.getLong(0)) == expect, s"doc ${r.getLong(0)}")
    }
  }

  test("s13: index-quality rows recompute exactly from the s1/s2 outputs") {
    import graft.operators.Similarity
    val truth = Similarity.annMultiIndexTopK(spark, sf).collect()
      .filter(_.getLong(2) == 1L).map(r => r.getLong(0) -> r.getLong(1)).toMap
    val served = Similarity.annLshTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val got = Similarity.indexQualityReport(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2)),
          r.getDouble(3)))
      .toMap
    assert(got.keySet == truth.keySet, "one row per truth query")
    got.foreach { case (q, (nn, rank, rr)) =>
      assert(nn == truth(q), s"query $q truth drifted")
      val expect = served.get((q, nn))
      assert(rank == expect, s"query $q found_rank $rank vs $expect")
      val expectRr = expect.map(r => math.rint((1.0 / r + 1e-9) * 1e4) / 1e4)
        .getOrElse(0.0)
      assert(math.abs(rr - expectRr) < 1e-9, s"query $q rr $rr vs $expectRr")
    }
    // ranks, when present, live in [1, k] (at sf0.001 the LSH index may
    // legitimately miss EVERY truth neighbor — 500 vectors over 256
    // buckets is the documented weak-recall profile — so hit existence
    // is not asserted, only consistency)
    got.values.flatMap(_._2).foreach(r =>
      assert(r >= 1 && r <= graft.operators.Similarity.TopK))
  }

  test("d23: effective-token report recomputes from d7 survivors and raw counts") {
    import org.apache.spark.sql.functions._
    val out = graft.operators.Dedup.effectiveTokens(spark, sf).collect()(0)
    val docs = graft.sources.Tables.documents(spark, sf)
    assert(out.getLong(0) == docs.count(), "n_docs is the corpus size")
    assert(out.getLong(1) ==
      graft.operators.Dedup.dedupedCorpus(spark, sf).count(),
      "n_docs_kept equals d7's survivor count")
    val totalToks = docs.select(sum(size(split(
      regexp_replace(lower(trim(col("text"))), "\\s+", " "), " "))))
      .collect()(0).getLong(0)
    assert(out.getLong(2) == totalToks, "n_tokens recounts the corpus")
    assert(out.getLong(3) <= out.getLong(2) && out.getLong(1) <= out.getLong(0))
    assert(out.getDouble(4) <= 1.0 + 1e-9 && out.getDouble(5) <= 1.0 + 1e-9)
  }

  test("q56: bounce rate recomputes from the sessionizer output") {
    val sessions = graft.streaming.Events.sessionize(spark, sf).collect()
      .map(r => (r.getTimestamp(2).toInstant
        .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString,
        r.getLong(4), r.getLong(6), r.getDouble(5)))
    val expect = sessions.groupBy(_._1).map { case (day, ss) =>
      day -> (ss.length.toLong, ss.count(_._2 == 1L).toLong,
        math.rint((ss.map(_._3).sum.toDouble / ss.length + 1e-9) * 1e4) / 1e4)
    }
    val got = graft.streaming.Events.bounceRate(spark, sf).collect()
      .map(r => r.getDate(0).toString ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got.keySet == expect.keySet)
    expect.foreach { case (day, (n, b, avg)) =>
      val (gn, gb, gavg) = got(day)
      assert(gn == n && gb == b, s"$day sessions/bounces")
      assert(math.abs(gavg - avg) < 1e-9, s"$day avg duration $gavg vs $avg")
    }
  }

  test("m11: entropy is 0 for constant bytes, exactly 3 bits at the boundary") {
    val dir = java.nio.file.Files.createTempDirectory("graft_m11").toString
    val t1 = "a" * 64                 // one symbol → 0 bits → low_entropy
    val t2 = "abcdefgh" * 8           // 8 equiprobable symbols → exactly 3.0
    spark.createDataFrame(Seq(
      (1L, t1, "en", "web", t1.length.toLong),
      (2L, t2, "en", "web", t2.length.toLong)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.multimodal.Multimodal.byteEntropyProfile(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getBoolean(3))).toMap
    assert(out(1L) == ((64L, 0.0, true)), s"constant: ${out(1L)}")
    // the 3.0-bit value sits ON the threshold: NOT below it → false
    assert(out(2L) == ((64L, 3.0, false)), s"boundary: ${out(2L)}")
    // expression agrees with its own entry point on real corpus bytes
    val sample = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").limit(5).collect()
    val got = graft.multimodal.Multimodal.byteEntropyProfile(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    sample.foreach { r =>
      val expect = math.rint((graft.expressions.ByteEntropy.entropy(
        r.getString(1).getBytes("UTF-8")) / math.log(2.0) + 1e-9) * 1e6) / 1e6
      assert(math.abs(got(r.getLong(0)) - expect) < 1e-9, s"doc ${r.getLong(0)}")
    }
  }

  test("m8: keyframes are the top-3 frame deltas, recomputed byte-for-byte") {
    val dir = java.nio.file.Files.createTempDirectory("graft_m8").toString
    // five 256-byte frames with distinct energies → distinct deltas
    val text = "a" * 256 + "~" * 256 + "0" * 256 + "a" * 256 + "~" * 100
    spark.createDataFrame(Seq((1L, text, "en", "web", text.length.toLong)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val en = graft.expressions.PcmFrameEnergies.energies(
      text.getBytes("UTF-8"), graft.expressions.PcmFrameEnergies.FrameLen)
    val expect = en.zipWithIndex.map { case (e, i) =>
      (i.toLong, e, math.abs(e - (if (i == 0) 0L else en(i - 1))))
    }.sortBy { case (fi, _, d) => (-d, fi) }.take(3).zipWithIndex
      .map { case ((fi, e, d), r) => (1L, fi, e, d, r + 1L) }.toSet
    val got = graft.multimodal.Multimodal.keyframes(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expect, s"got=$got expect=$expect")
  }
}
