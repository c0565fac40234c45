package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** Round-5 operator invariants. */
class Round5Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("t17 source cap: contiguous ranks per source, cap honored, cut ordered by quality") {
    val rows = TextAnalysis.sourceCap(spark, sf, cap = 10).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3), r.getBoolean(4)))
    val bySource = rows.groupBy(_._2)
    assert(bySource.size > 1, "cap must be exercised across several sources")
    bySource.foreach { case (src, docs) =>
      val n = docs.length.toLong
      assert(docs.map(_._4).sorted.toSeq == (1L to n).toSeq,
        s"$src: ranks are not a permutation of 1..$n")
      docs.foreach { case (_, _, _, rk, kept) =>
        assert(kept == (rk <= 10), s"$src: kept flag disagrees with rank $rk")
      }
      // the rank order IS (quality desc, doc_id asc) — the deterministic cut
      val ordered = docs.sortBy { case (id, _, q, _, _) => (-q, id) }
      assert(ordered.map(_._4).toSeq == (1L to n).toSeq,
        s"$src: rank order is not (quality desc, doc_id)")
      // no dropped document outranks a kept one on quality
      val keptMin = docs.filter(_._5).map(_._3).min
      val dropMax = docs.filterNot(_._5).map(_._3).maxOption.getOrElse(Double.MinValue)
      assert(dropMax <= keptMin, s"$src: kept/dropped quality inversion")
      assert(docs.count(_._5) == math.min(10L, n), s"$src: kept count")
    }
  }

  test("d13 incremental embedding dedup equals the cross-parity slice of d5's pairs") {
    import graft.operators.Dedup
    val d13 = Dedup.incrementalEmbeddingDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // d5 with the same oracle-pinned banding; its (id_a < id_b) pairs with
    // opposite parity, re-keyed as (odd batch, even corpus)
    val d5cross = Dedup.embeddingNearDupPairs(spark, sf,
        bands = Dedup.EmbBands, bandBits = Dedup.EmbBandBits).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter { case (a, b, _) => a % 2 != b % 2 }
      .map { case (a, b, c) => (if (a % 2 != 0) (a, b) else (b, a)) -> c }
      .toMap
    assert(d13 == d5cross,
      s"d13=${d13.size} d5cross=${d5cross.size} " +
        s"onlyD13=${(d13.keySet -- d5cross.keySet).take(3)} " +
        s"onlyD5=${(d5cross.keySet -- d13.keySet).take(3)}")
    assert(d13.nonEmpty, "planted embedding near-dups should cross the parity split")
  }

  test("t18 token entropy matches a per-doc Scala reference") {
    import graft.functions.TextFunctions
    import org.apache.spark.sql.functions.col
    val got = TextAnalysis.tokenEntropy(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.keySet == docs.keySet)
    docs.foreach { case (id, text) =>
      val toks = text.trim.toLowerCase.replaceAll("\\s+", " ").split(" ", -1)
      val counts = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
      val n = toks.length.toDouble
      val log2 = (x: Double) => math.log(x) / math.log(2.0)
      // same distributive decomposition as the operator: term order cannot
      // matter beyond ~1e-12, far inside the 4dp rounding
      val h = log2(n) - counts.values.toSeq.sorted.map(c => c * log2(c.toDouble)).sum / n
      val ev = if (counts.size > 1) h / log2(counts.size.toDouble) else 1.0
      val (gn, gd, ge, gev) = got(id)
      assert(gn == toks.length.toLong && gd == counts.size.toLong, s"doc $id counts")
      assert(math.abs(ge - h) < 5e-4, s"doc $id entropy $ge vs $h")
      assert(math.abs(gev - ev) < 5e-4, s"doc $id evenness $gev vs $ev")
      assert(ge >= -1e-9 && gev >= -1e-9 && gev <= 1.0 + 1e-9, s"doc $id bounds")
    }
  }

  test("t19 passage dedup equals the keep-first rollup of t15's chunks at stride=size") {
    val chunks = TextAnalysis.chunkDocuments(spark, sf, chunkSize = 32, stride = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val owner = chunks.groupBy(_._4).view.mapValues(_.map(_._1).min).toMap
    val expected = chunks.groupBy(_._1).map { case (doc, cs) =>
      val dup = cs.filter(c => owner(c._4) < doc)
      doc -> (cs.length.toLong, dup.length.toLong,
        cs.filter(c => owner(c._4) >= doc).map(_._3).sum)
    }
    val got = TextAnalysis.passageDedup(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (doc, (nc, nd, kept)) =>
      val (gnc, gnd, gkept, gfrac) = got(doc)
      assert((gnc, gnd, gkept) == ((nc, nd, kept)), s"doc $doc")
      assert(math.abs(gfrac - nd.toDouble / nc) < 5e-4, s"doc $doc dup_frac")
    }
    assert(got.values.exists(_._2 > 0),
      "planted duplicate documents should surface cross-doc passages")
  }

  test("s5 full-scan baseline: exact scores, high recall vs the s1 baseline") {
    import graft.operators.Similarity
    val s5 = Similarity.annTwoStageFullScanTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val s1 = Similarity.annBruteForceTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val queries = s1.map(_._1).distinct
    assert(s5.map(_._1).distinct.sorted.toSeq == queries.sorted.toSeq)
    // per query: ranks are 1..k and cos_sim is non-increasing
    s5.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq, s"query $q ranks")
      val byRank = rows.sortBy(_._3).map(_._4)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b }, s"query $q order")
    }
    // rerank scores are EXACT: any (query, neighbor) that s1 also ranked
    // must carry the identical 4dp cosine
    val exact = s1.map(r => (r._1, r._2) -> r._4).toMap
    s5.foreach { case (q, n, _, c) =>
      exact.get((q, n)).foreach(e => assert(math.abs(e - c) < 1e-9, s"($q,$n) cos"))
    }
    // int8 reconstruction is tight at 255 steps: the coarse shortlist of 20
    // should recover nearly every true top-5 neighbor
    val hits = s1.count(r => s5.exists(g => g._1 == r._1 && g._2 == r._2))
    assert(hits.toDouble / s1.length >= 0.8, s"recall ${hits}/${s1.length}")
  }

  test("s6 PQ: codes match a Scala PQ reference; rerank exact; recall vs s1") {
    import graft.operators.Similarity
    import org.apache.spark.sql.functions.col
    val vecs = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    // reference PQ: sign-bucket seeding, 6dp means, argmin-L2 assignment
    val m = 8; val ds = 8
    def subv(v: Array[Float], i: Int): Array[Double] =
      v.slice(i * ds, i * ds + ds).map(_.toDouble)
    def bkt(s: Array[Double]): Int =
      (0 until 4).map(j => if (s(j) > 0) 1 << j else 0).sum
    val codebook: Map[(Int, Int), Array[Double]] =
      (for (i <- 0 until m) yield {
        vecs.values.map(subv(_, i)).groupBy(bkt).map { case (b, svs) =>
          (i, b) -> (0 until ds).map(p =>
            BigDecimal(svs.map(_(p)).sum / svs.size)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble).toArray
        }
      }).flatten.toMap
    def reconOf(v: Array[Float]): Array[Double] =
      (0 until m).flatMap { i =>
        val s = subv(v, i)
        val (_, best) = codebook.toSeq.filter(_._1._1 == i)
          .map { case ((_, b), cv) =>
            val d2 = s.zip(cv).map { case (x, c) => (x - c) * (x - c) }.sum
            ((BigDecimal(d2).setScale(6, BigDecimal.RoundingMode.HALF_UP)
              .toDouble, b), cv)
          }.minBy(_._1)
        best
      }.toArray
    def cosD(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val s6 = Similarity.annPqFullScanTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val s1 = Similarity.annBruteForceTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(s6.map(_._1).distinct.sorted.toSeq == s1.map(_._1).distinct.sorted.toSeq)
    // reference top-5 via PQ coarse shortlist-20 + exact rerank must agree
    val recons = vecs.view.mapValues(reconOf).toMap
    s6.groupBy(_._1).foreach { case (q, got) =>
      val qr = recons(q)
      val short = recons.toSeq.filter(_._1 != q)
        .map { case (id, rv) =>
          (BigDecimal(cosD(qr, rv)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
            .toDouble, id)
        }
        .sortBy { case (c, id) => (-c, id) }.take(20).map(_._2)
      val expTop = short
        .map(id => (cosD(vecs(q).map(_.toDouble), vecs(id).map(_.toDouble)), id))
        .sortBy { case (c, id) => (-c, id) }.take(5).map(_._2)
      assert(got.sortBy(_._3).map(_._2).toSeq == expTop,
        s"query $q shortlist/rerank disagreement")
    }
    // rerank scores are exact: shared (query, neighbor) pairs carry s1's cosine
    val exact = s1.map(r => (r._1, r._2) -> r._4).toMap
    s6.foreach { case (q, n, _, c) =>
      exact.get((q, n)).foreach(e => assert(math.abs(e - c) < 1e-9, s"($q,$n) cos"))
    }
    // recall is a property of the ALGORITHM at this scale, not the
    // implementation (the reference-agreement assertions above pin that):
    // at sf0.001 the 16-entry codebooks train on ~3 vectors per bucket, so
    // 8-byte codes are genuinely lossy — 0.3 is the honest tiny-scale bar
    // (measured 0.36; sf0.01 measures higher as buckets fill out)
    val hits = s1.count(r => s6.exists(g => g._1 == r._1 && g._2 == r._2))
    assert(hits.toDouble / s1.length >= 0.3, s"recall ${hits}/${s1.length}")
  }

  test("s7 LSH+rerank: exact scores, recall tracks s2, ranks contiguous") {
    import graft.operators.Similarity
    val s7 = Similarity.annLshRerankTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val s2 = Similarity.annLshTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val s1 = Similarity.annBruteForceTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(s7.map(_._1).distinct.sorted.toSeq == s1.map(_._1).distinct.sorted.toSeq)
    s7.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq, s"query $q ranks")
    }
    // rerank scores are exact: any pair s1 also ranked carries its cosine
    val exact = s1.map(r => (r._1, r._2) -> r._4).toMap
    s7.foreach { case (q, n, _, c) =>
      exact.get((q, n)).foreach(e => assert(math.abs(e - c) < 1e-9, s"($q,$n) cos"))
    }
    // the composition cannot beat its candidate generator, and the int8
    // coarse stage over a 20-wide shortlist should lose almost nothing of
    // what s2's exact ranking keeps
    val s2set = s2.map(r => (r._1, r._2)).toSet
    val hits = s2set.count { case (q, n) => s7.exists(g => g._1 == q && g._2 == n) }
    assert(hits.toDouble / s2set.size >= 0.9,
      s"s7 recalls ${hits}/${s2set.size} of s2's top-5")
  }

  test("d14 semantic dedup matches the naive within-cell keep-first reference") {
    import graft.operators.{Dedup, Similarity}
    import org.apache.spark.sql.functions.col
    val raw = graft.sources.Tables.embeddings(spark, sf)
    val (assigned, _) = Similarity.coarseQuantizer(raw, subBits = 0)
    val rows = assigned.select(col("vec_id"), col("embedding"), col("cent_id"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val expected = rows.groupBy(_._3).toSeq.flatMap { case (cell, vs) =>
      val sorted = vs.sortBy(_._1)
      sorted.flatMap { case (v, ev, _) =>
        val keepers = sorted.filter(_._1 < v)
          .map { case (u, eu, _) => (u, cos(eu, ev)) }
          .filter(_._2 >= 0.45)
        keepers.minByOption(_._1).map { case (u, c) =>
          v -> ((cell, u, BigDecimal(c).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
        }
      }
    }.toMap
    val got = Dedup.semanticDedup(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got.keySet == expected.keySet,
      s"only-got=${(got.keySet -- expected.keySet).take(3)} " +
        s"only-exp=${(expected.keySet -- got.keySet).take(3)}")
    expected.foreach { case (v, (cell, u, c)) =>
      val (gc, gu, gcos) = got(v)
      assert(gc == cell && gu == u, s"vec $v keeper/cell")
      assert(math.abs(gcos - c) < 1e-3, s"vec $v cos $gcos vs $c")
    }
    assert(got.nonEmpty, "planted near-dup embeddings should be pruned")
  }

  // ---- shared Scala reference helpers for the text-shingle operators ----

  private def refTokens(text: String): Array[String] =
    text.trim.toLowerCase.replaceAll("\\s+", " ").split(" ", -1)

  private def refShingles(toks: Array[String], n: Int = 8): Set[String] =
    if (toks.length < n) Set.empty
    else toks.sliding(n).map(_.mkString(" ")).toSet

  private def refHash52(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val hex = d.map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 13), 16)
  }

  private def round4(x: Double): Double =
    BigDecimal(x + 1e-9).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def collectDocs(): Seq[(Long, String, String)] = {
    import org.apache.spark.sql.functions.col
    graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
  }

  test("d15 source overlap matrix matches the brute-force shingle-set reference") {
    import graft.operators.Dedup
    val docs = collectDocs()
    val bySource = docs.groupBy(_._2).view
      .mapValues(_.map(d => refShingles(refTokens(d._3))).reduce(_ union _))
      .toMap
    val expected = (for {
      (sa, sha) <- bySource; (sb, shb) <- bySource if sa < sb
      shared = (sha intersect shb).size if shared > 0
    } yield (sa, sb) -> ((shared.toLong,
      round4(shared.toDouble / (sha.size + shb.size - shared))))).toMap
    val got = Dedup.sourceOverlapMatrix(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got.keySet == expected.keySet,
      s"only-got=${(got.keySet -- expected.keySet).take(3)} " +
        s"only-exp=${(expected.keySet -- got.keySet).take(3)}")
    expected.foreach { case (k, (n, j)) =>
      assert(got(k)._1 == n, s"$k shared count ${got(k)._1} vs $n")
      assert(math.abs(got(k)._2 - j) < 1e-3, s"$k jaccard")
    }
    assert(got.nonEmpty, "corpus sources share 8-grams at test scale")
  }

  test("d16 split leakage: deterministic split, exact shared-shingle counts, kept semantics") {
    import graft.operators.Dedup
    val docs = collectDocs()
    val split = docs.map { case (id, _, _) =>
      id -> (if (refHash52(s"split:$id") % 10 == 0) "test" else "train")
    }.toMap
    val testShingles = docs.filter(d => split(d._1) == "test")
      .map(d => refShingles(refTokens(d._3)))
      .foldLeft(Set.empty[String])(_ union _)
    val expected = docs.map { case (id, _, text) =>
      val n =
        if (split(id) == "test") 0L
        else (refShingles(refTokens(text)) intersect testShingles).size.toLong
      id -> ((split(id), n, split(id) == "test" || n == 0))
    }.toMap
    val got = Dedup.trainTestSplitLeakage(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(got == expected,
      s"diff=${(got.toSet diff expected.toSet).take(3)} " +
        s"missing=${(expected.toSet diff got.toSet).take(3)}")
    val nTest = got.values.count(_._1 == "test")
    assert(nTest > 0 && nTest < docs.size, "both splits populated")
    assert(got.values.exists(v => v._1 == "train" && !v._3),
      "near-dup replicas should leak across the split at test scale")
  }

  test("t21 Zipf fit matches a Scala reference OLS over the rank-frequency curve") {
    val docs = collectDocs()
    val freqs = docs.flatMap(d => refTokens(d._3))
      .groupBy(identity).map { case (t, o) => (t, o.size.toLong) }
    val ranked = freqs.toSeq.sortBy { case (t, f) => (-f, t) }.zipWithIndex
      .map { case ((_, f), i) => (math.log(i + 1.0), math.log(f.toDouble), f) }
    val n = ranked.size
    val (mx, my) = (ranked.map(_._1).sum / n, ranked.map(_._2).sum / n)
    val sxy = ranked.map(r => (r._1 - mx) * (r._2 - my)).sum / n
    val sxx = ranked.map(r => (r._1 - mx) * (r._1 - mx)).sum / n
    val syy = ranked.map(r => (r._2 - my) * (r._2 - my)).sum / n
    val row = graft.operators.TextAnalysis.zipfFit(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong, "vocab size")
    assert(row.getLong(1) == ranked.map(_._3).sum, "token total")
    assert(math.abs(row.getDouble(2) - sxy / sxx) < 1e-3, s"slope ${row.getDouble(2)}")
    assert(math.abs(row.getDouble(3) - (my - sxy / sxx * mx)) < 1e-3, "intercept")
    assert(math.abs(row.getDouble(4) - sxy * sxy / (sxx * syy)) < 1e-3, "r2")
    // the fixture corpus is synthetic with a near-uniform vocabulary, so
    // the slope is shallow (~-0.18) — exactly the non-natural-language
    // signal the diagnostic exists to flag; assert only the fit's math:
    // frequencies decrease in rank and the fit is a real correlation
    assert(row.getDouble(2) < 0.0, "rank-frequency slope must be negative")
    assert(row.getDouble(4) > 0.0 && row.getDouble(4) <= 1.0, "r2 in (0,1]")
  }

  test("t22 vocab growth matches a Scala first-decile reference and is monotone") {
    val docs = collectDocs()
    val ids = docs.map(_._1).distinct.sorted
    // t11's boundary convention: boundary i = element at rank ceil(i/10 * n)
    val bounds = (1 to 9).map(i =>
      ids(math.ceil(i / 10.0 * ids.length).toInt - 1))
    def decile(id: Long): Int = bounds.count(id > _)
    val firstBucket = docs
      .flatMap { case (id, _, text) => refTokens(text).distinct.map(_ -> decile(id)) }
      .groupBy(_._1).map { case (t, o) => (t, o.map(_._2).min) }
    val expected = (0 until 10).map { d =>
      (d.toLong,
        firstBucket.count(_._2 == d).toLong,
        firstBucket.count(_._2 <= d).toLong)
    }
    val got = graft.operators.TextAnalysis.vocabGrowth(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected, s"got=$got\nexp=$expected")
    // curve properties: cumulative is monotone and ends at the vocabulary
    assert(got.map(_._3) == got.map(_._3).sorted, "vocab_size must be monotone")
    assert(got.last._3 == firstBucket.size.toLong, "final decile = full vocabulary")
  }

  test("t20 bigram-LM perplexity matches a Scala reference model") {
    val docs = collectDocs()
    val docBigrams = docs.map { case (id, _, text) =>
      val t = refTokens(text)
      id -> (if (t.length < 2) Seq.empty[(String, String)]
             else t.sliding(2).map(a => (a(0), a(1))).toSeq)
    }
    val cb = docBigrams.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cw = cb.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val v = docs.flatMap(d => refTokens(d._3)).distinct.size.toDouble
    val expected = docBigrams.filter(_._2.nonEmpty).map { case (id, bgs) =>
      val nlls = bgs.map { bg =>
        -math.log((cb(bg) + 0.5) / (cw(bg._1) + 0.5 * v)) / math.log(2.0)
      }
      val avg = nlls.sum / nlls.size
      id -> ((bgs.size.toLong, round4(avg),
        BigDecimal(math.pow(2.0, avg) + 1e-9)
          .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }.toMap
    val got = graft.operators.TextAnalysis.ngramLmPerplexity(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(got.keySet == expected.keySet, "per-doc coverage")
    expected.foreach { case (id, (n, nll, ppl)) =>
      assert(got(id)._1 == n, s"doc $id bigram count")
      assert(math.abs(got(id)._2 - nll) < 1e-3, s"doc $id nll ${got(id)._2} vs $nll")
      assert(math.abs(got(id)._3 - ppl) < 0.05, s"doc $id ppl ${got(id)._3} vs $ppl")
    }
    // the quality signal separates documents: perplexities are not constant
    val ppls = got.values.map(_._3).toSeq
    assert(ppls.max > ppls.min, "perplexity distribution is non-degenerate")
  }
}
