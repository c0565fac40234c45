package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions

/** Property tests (SURVEY.md §5.3): invariants over generated inputs, run
  * through the real engine on small in-memory DataFrames.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Deterministic sampling in place of the scalatestplus forAll bridge
    * (not in the offline dependency cache): fixed seeds, n samples.
    */
  private def forAll[T](g: Gen[T], n: Int = 12)(body: T => Unit): Unit = {
    val params = Gen.Parameters.default
    (1 to n).foreach { i =>
      g.apply(params, Seed(i.toLong)).foreach(body)
    }
  }

  private val wordGen = Gen.oneOf(
    "the", "fast", "key", "order", "sort", "table", "scan", "merge", "a",
    "join", "row", "data", "filter", "group", "hash", "query", "value")
  private val docGen: Gen[String] =
    Gen.chooseNum(0, 40).flatMap(n => Gen.listOfN(n, wordGen)).map(_.mkString(" "))

  test("shingle count is max(0, tokens-2) distinct-bounded for any document") {
    forAll(Gen.listOfN(8, docGen)) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
        .select(col("doc_id"), size(col("toks")).as("n"),
          size(TextFunctions.shinglesOfTokens(col("toks"))).as("nsh"))
      df.collect().foreach { r =>
        val n = r.getInt(1); val nsh = r.getInt(2)
        assert(nsh <= math.max(n - 2, 0), s"n=$n nsh=$nsh")
        assert(nsh >= (if (n >= 3) 1 else 0))
      }
    }
  }

  test("watermark append never duplicates keys for any batch sequence") {
    forAll(Gen.listOfN(3, Gen.listOfN(6, Gen.chooseNum(1, 20)))) { batches =>
      val work = java.nio.file.Files.createTempDirectory("graft_prop").toString
      val staging = s"$work/stage"
      batches.foreach { keys =>
        val df = keys.distinct.map(k => (k, s"v$k")).toDF("order_id", "payload")
        graft.pipeline.Pipeline.watermarkAppend(spark, df, "order_id", staging)
      }
      if (new java.io.File(staging).exists()) {
        val staged = spark.read.parquet(staging)
        // watermark semantics: strictly-increasing keys only, never dupes
        assert(staged.count() ==
          staged.select(countDistinct("order_id")).collect()(0).getLong(0))
      }
    }
  }

  test("quality score stays in [0,1] and is monotone in stopword pollution") {
    forAll(Gen.chooseNum(1, 30)) { n =>
      val clean = List.fill(n)("data").mkString(" ")
      val polluted = (List.fill(n)("data") ++ List.fill(n)("the")).mkString(" ")
      val df = List((1L, clean), (2L, polluted)).toDF("doc_id", "text")
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      df.createOrReplaceTempView("prop_docs")
      val scores = df
        .select(col("doc_id"), TextFunctions.qualityScore(col("text")).as("q"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(scores.values.forall(q => q >= 0.0 && q <= 1.0))
    }
  }

  test("rolling hash: h(a++b) == h(a)*B^|b| + h(b) mod P for any strings") {
    import graft.expressions.RollingHash
    val strGen = Gen.listOf(Gen.alphaNumChar).map(_.mkString)
    forAll(Gen.zip(strGen, strGen), n = 40) { case (a, b) =>
      val ha = RollingHash.hashBytes(a.getBytes("UTF-8"))
      val hb = RollingHash.hashBytes(b.getBytes("UTF-8"))
      val hab = RollingHash.hashBytes((a + b).getBytes("UTF-8"))
      val expected = RollingHash.addmod(
        RollingHash.mulmod(ha, RollingHash.powmod(b.getBytes("UTF-8").length.toLong)), hb)
      assert(hab == expected, s"a=$a b=$b")
    }
  }

  test("rolling hash expression matches the Scala reference through codegen") {
    import graft.expressions.RollingHash
    RollingHash.register(spark)
    val texts = Seq("", "a", "hello world", "the quick brown fox", "ü§π")
    val got = texts.zipWithIndex.map { case (t, i) => (i, t) }.toDF("id", "t")
      .selectExpr("id", "rolling_hash(t) AS h")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i) == RollingHash.hashBytes(t.getBytes("UTF-8")), s"text=$t")
    }
  }

  test("salted aggregation equals direct groupBy for any value distribution") {
    import graft.operators.Skew
    forAll(Gen.listOfN(60, Gen.zip(Gen.chooseNum(1, 5), Gen.chooseNum(-100.0, 100.0))), n = 6) { rows =>
      val df = rows.toDF("k", "v")
      val direct = df.groupBy($"k").agg(sum($"v").as("s"), count(lit(1)).as("c"))
        .collect().map(r => r.getInt(0) -> ((math.rint(r.getDouble(1) * 100) / 100), r.getLong(2))).toMap
      val salted = Skew.saltedSumCount(df, Seq("k"), "v", nSalts = 4)
        .collect().map(r => r.getInt(0) -> ((math.rint(r.getDouble(1) * 100) / 100), r.getLong(2))).toMap
      assert(salted == direct)
    }
  }

  test("bottom-k aggregate equals the window-function formulation") {
    import org.apache.spark.sql.expressions.Window
    val dir = TestSpark.sf
    val o = graft.sources.Tables.orders(spark, dir)
    val w = Window.partitionBy($"o_orderpriority").orderBy($"h")
    val expected = o
      .withColumn("h", graft.functions.TextFunctions.hash52($"o_orderkey".cast("string")))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 5)
      .select($"o_orderpriority", $"rn".cast("long").as("rnk"),
        $"o_orderkey".cast("long").as("sample_key"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val got = graft.operators.Extended.bottomKSamples(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
  }

  test("native ArrayCosine equals the higher-order-function cosine") {
    import graft.functions.VectorFunctions
    graft.expressions.VectorExpressions.register(spark)
    val vecGen = Gen.listOfN(16, Gen.chooseNum(-10.0, 10.0).map(_.toFloat))
    forAll(Gen.zip(vecGen, vecGen), n = 20) { case (a, b) =>
      val df = Seq((a, b)).toDF("va", "vb")
      val row = df.select(
        expr("array_cosine(va, vb)").as("native"),
        VectorFunctions.cosine(col("va"), col("vb")).as("hof")).collect()(0)
      assert(math.abs(row.getDouble(0) - row.getDouble(1)) < 1e-12)
    }
  }

  test("d2 prefix+positional filter equals naive all-pairs at every threshold") {
    // the r6 float bug and the r9 positional filter both live exactly at
    // the threshold boundary; random small-vocabulary corpora (12-word
    // vocab forces heavy shingle overlap, the adversarial regime for the
    // filters) must agree with the naive join at several τ, including
    // the registered 0.8 and the d24 grid floor 0.7
    val overlapDocGen: Gen[String] =
      Gen.chooseNum(3, 20).flatMap(n => Gen.listOfN(n, wordGen)).map(_.mkString(" "))
    forAll(Gen.listOfN(10, overlapDocGen), n = 6) { texts =>
      val dir = java.nio.file.Files.createTempDirectory("graft_prop_d2").toString
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("src"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      Seq(0.5, 0.7, 0.8).foreach { t =>
        val fast = graft.operators.Dedup.ngramJaccardPairs(spark, dir, t)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
        val naive = graft.operators.Dedup.ngramJaccardPairsNaive(spark, dir, t)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
        assert(fast == naive,
          s"τ=$t: fast-only=${(fast diff naive).take(3)} naive-only=${(naive diff fast).take(3)}")
      }
    }
  }

  test("sessionizer: events within the gap never split a session") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    forAll(Gen.listOfN(10, Gen.chooseNum(1L, 1700L))) { gaps =>
      // consecutive gaps all < 1800s → exactly one session per user
      val times = gaps.scanLeft(0L)(_ + _)
      val rows = times.zipWithIndex.map { case (s, i) =>
        (i.toLong, new java.sql.Timestamp(base.getTime + s * 1000), 1L, "e", 1.0)
      }
      val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      df.createOrReplaceTempView("prop_events")
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val sessions = df
        .withColumn("prev", lag($"ts", 1).over(w))
        .withColumn("ns", when($"prev".isNull ||
          unix_timestamp($"ts") - unix_timestamp($"prev") > 1800L, 1L).otherwise(0L))
        .agg(sum($"ns")).collect()(0).getLong(0)
      assert(sessions == 1L, s"gaps=$gaps produced $sessions sessions")
    }
  }

  test("PQ codec invariants hold over random corpora: codes round-trip " +
    "and stored codes lose exactly the argmin distortion") {
    import graft.operators.Similarity
    val vecGen = Gen.listOfN(64,
      Gen.chooseNum(-1000, 1000).map(_.toFloat / 173.0f)).map(_.toArray)
    forAll(Gen.listOfN(48, vecGen), n = 3) { vecs =>
      val df = vecs.zipWithIndex
        .map { case (v, i) => (i.toLong, v) }.toDF("vec_id", "embedding")
      val cb = Similarity.pqCodebook(df, 8, 4)
      def rvMap(d: org.apache.spark.sql.DataFrame) =
        d.select($"vec_id", $"rv").collect()
          .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
      val coded = Similarity.pqEncodeCodes(
        df.select($"vec_id", $"embedding"), cb, 8)
      // the stored code names exactly the argmin entry the direct
      // encode reconstructs through — for ANY corpus, not just testdata
      assert(rvMap(Similarity.pqReconFromCodes(
        coded.select($"vec_id", $"codes"), cb, 8)) ==
        rvMap(Similarity.pqEncode(df, cb, 8)))
      // decode-what-you-stored prices exactly what the argmin loses —
      // the identity the live drift audit's frozen side rests on
      val stored = Similarity.pqStoredDistortionU6(coded, cb, 8)
        .collect()(0).getLong(0)
      val argmin = Similarity.pqDistortionU6(
        df.select($"embedding"), cb, 8).collect()(0).getLong(0)
      assert(stored == argmin,
        s"stored-code distortion $stored != argmin distortion $argmin")
    }
  }
}
