package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal

/** A second, structurally different fake codec (fixed-width "thumbnails",
  * frame count from payload length) — top-level so the Spark closure
  * serializer ships it without dragging the test class along.
  */
class FixedFakeCodec extends Multimodal.MediaCodec {
  def open(): Array[Byte] => (Int, Int, Int, String) = {
    // per-partition "decoder handle" init — the amortized-init shape a
    // real codec uses (contexts/tables allocated here, once per partition)
    val baseDim = 320
    p => (baseDim, baseDim / 2, 1 + (p.length % 8),
      if (p.length % 2 == 0) "img" else "vid")
  }
}

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("binary features cover every document with stable hashes") {
    val feats = Multimodal.binaryFeatures(spark, sf).collect()
    val nDocs = graft.sources.Tables.documents(spark, sf).count()
    assert(feats.length == nDocs)
    feats.foreach { r =>
      assert(r.getLong(1) > 0)
      assert(r.getString(2).matches("[0-9a-f]{64}"))
    }
  }

  test("resize stub shrinks dimensions below the cap; frame sampler strides") {
    val decoded = Multimodal.decodeAll(spark, sf).collect().map(d => d.doc_id -> d).toMap
    val resized = Multimodal.resizeAll(spark, sf, maxDim = 256).collect()
    assert(resized.length == decoded.size)
    resized.foreach { r =>
      val d = decoded(r.doc_id)
      assert(r.width <= d.width && r.height <= d.height && r.payload_len <= d.byte_len)
      // integer scale factor: scaled-down max dim lands within [maxDim, 2*maxDim)
      assert(math.max(r.width, r.height) < 2 * 256 || math.max(d.width, d.height) < 256)
    }
    val frames = Multimodal.sampleFrames(spark, sf, stride = 4).collect()
      .groupBy(_.doc_id)
    frames.foreach { case (id, fs) =>
      val expected = (0 until decoded(id).n_frames by 4).toSet
      assert(fs.map(_.frame_idx).toSet == expected)
    }
  }

  test("codec seam: stub and a second fake codec pass the same plumbing contract") {
    // the contract is about the SPARK side — schema, row-per-payload,
    // stride fan-out, resize cap — not about any particular codec's
    // output, so both implementations must satisfy it unchanged
    val nDocs = graft.sources.Tables.documents(spark, sf).count()
    for (codec <- Seq[Multimodal.MediaCodec](Multimodal.StubCodec, new FixedFakeCodec)) {
      val decoded = Multimodal.decodeAll(spark, sf, codec).collect()
      assert(decoded.length == nDocs, "one typed row per payload")
      decoded.foreach { d =>
        assert(d.width > 0 && d.height > 0 && d.n_frames >= 1 && d.byte_len > 0)
        assert(d.format == "img" || d.format == "vid")
      }
      val dmap = decoded.map(d => d.doc_id -> d).toMap
      val resized = Multimodal.resizeAll(spark, sf, maxDim = 256, codec = codec).collect()
      assert(resized.length == nDocs)
      resized.foreach { r =>
        val d = dmap(r.doc_id)
        assert(r.width <= d.width && r.height <= d.height && r.payload_len <= d.byte_len)
      }
      val frames = Multimodal.sampleFrames(spark, sf, stride = 4, codec = codec)
        .collect().groupBy(_.doc_id)
      frames.foreach { case (id, fs) =>
        assert(fs.map(_.frame_idx).toSet == (0 until dmap(id).n_frames by 4).toSet)
      }
    }
  }

  test("ImageIOCodec really decodes JDK-format fixtures through the same plumbing") {
    import spark.implicits._
    def encodeImage(w: Int, h: Int, fmt: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, (x * 31 + y) & 0xffffff)
      val baos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, baos), s"no $fmt writer")
      baos.toByteArray
    }
    def animatedGif(frames: Int, w: Int, h: Int): Array[Byte] = {
      val baos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      (0 until frames).foreach { _ =>
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence(); writer.dispose(); ios.close()
      baos.toByteArray
    }
    // (doc_id, payload, expected width/height/frames/format)
    val fixtures = Seq(
      (1L, encodeImage(640, 480, "png"), 640, 480, 1, "png"),
      (2L, encodeImage(33, 47, "bmp"), 33, 47, 1, "bmp"),
      (3L, encodeImage(300, 200, "jpg"), 300, 200, 1, "jpeg"),
      (4L, animatedGif(9, 64, 32), 64, 32, 9, "gif"))
    val media = fixtures.map { case (id, p, _, _, _, _) => Multimodal.MediaRecord(id, p) }
      .toDS().repartition(2) // >1 partition: open() really runs per partition
    val decoded = Multimodal.decodeRecords(media, new Multimodal.ImageIOCodec)
    val byId = decoded.collect().map(d => d.doc_id -> d).toMap
    assert(byId.size == fixtures.size, "one typed row per payload")
    fixtures.foreach { case (id, p, w, h, frames, fmt) =>
      val d = byId(id)
      assert((d.width, d.height, d.n_frames, d.format) == ((w, h, frames, fmt)),
        s"doc $id: got $d")
      assert(d.byte_len == p.length)
    }
    // downstream plumbing is codec-agnostic: resize cap + stride fan-out
    // hold on REAL decoded dimensions exactly as on the stub's
    val resized = Multimodal.resizeDecoded(decoded, maxDim = 256).collect()
    resized.foreach { r =>
      val d = byId(r.doc_id)
      assert(r.width <= d.width && r.height <= d.height)
      assert(math.max(r.width, r.height) < 2 * 256)
    }
    val framesOut = Multimodal.sampleFramesDecoded(decoded, stride = 4)
      .collect().groupBy(_.doc_id)
    framesOut.foreach { case (id, fs) =>
      assert(fs.map(_.frame_idx).toSet == (0 until byId(id).n_frames by 4).toSet)
    }
    assert(framesOut(4L).size == 3) // 9 frames, stride 4 -> indices 0,4,8
  }

  test("m3 over real frames: strided ImageIO decode of an animated GIF matches per-frame pixel math") {
    import spark.implicits._
    val W = 104; val H = 26 // 2704 pixels: 52 blocks of 52 bytes, 2 per row
    // frame i: top split(i) ROWS gray 40, rest gray 200 — both exact GIF
    // palette entries, and BT.601 on gray (v,v,v) returns v exactly, so
    // the decoded luminance plane is computable in closed form. The split
    // moves along the ROW axis because the 1-D block hash is row-major
    // (two 52-byte blocks per row): a row split changes which blocks are
    // dark, so distinct frames land distinct hashes — a COLUMN split
    // gives every block the same dark/bright mix and hashes identically
    // at any split (verified: that is the aHash's intended invariance,
    // not a decode bug)
    def split(i: Int) = (i + 1) * H / 10
    def frameImage(i: Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(
        W, H, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until W; y <- 0 until H) {
        val v = if (y < split(i)) 40 else 200
        img.setRGB(x, y, v << 16 | v << 8 | v)
      }
      img
    }
    def animatedGif(nFrames: Int): Array[Byte] = {
      val baos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      (0 until nFrames).foreach { i =>
        writer.writeToSequence(new javax.imageio.IIOImage(frameImage(i), null, null), null)
      }
      writer.endWriteSequence(); writer.dispose(); ios.close()
      baos.toByteArray
    }
    def pngOf(i: Int): Array[Byte] = {
      val baos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(frameImage(i), "png", baos), "no png writer")
      baos.toByteArray
    }
    def expectedLum(i: Int): Array[Byte] = {
      val lum = new Array[Byte](W * H)
      for (y <- 0 until H; x <- 0 until W)
        lum(y * W + x) = (if (y < split(i)) 40 else 200).toByte
      lum
    }
    val media = Seq(
      Multimodal.MediaRecord(1L, animatedGif(8)),
      Multimodal.MediaRecord(2L, pngOf(3)))
      .toDS().repartition(2) // per-partition decoder init really runs twice
    val out = Multimodal.pixelFrameSamples(media, stride = 3)
      .collect().groupBy(_.doc_id)

    // stride fan-out: 8 GIF frames at stride 3 -> indices 0,3,6; the
    // single-frame PNG rides the same operator as one row at index 0
    assert(out(1L).map(_.frame_idx).toSet == Set(0, 3, 6))
    assert(out(2L).map(_.frame_idx).toSet == Set(0))

    (out(1L) ++ out(2L)).foreach { f =>
      val lum = expectedLum(if (f.doc_id == 1L) f.frame_idx else 3)
      assert((f.width, f.height) == ((W, H)), s"$f")
      val s = split(if (f.doc_id == 1L) f.frame_idx else 3)
      val wantMean = (s * 40.0 + (H - s) * 200.0) / H
      assert(math.abs(f.mean_lum - wantMean) < 1e-9,
        s"doc ${f.doc_id} frame ${f.frame_idx}: mean ${f.mean_lum} != $wantMean")
      // the frame hash IS the m5 hash of the frame's luminance plane —
      // the per-frame signal mediaNearDupPairs bands on
      assert(f.frame_phash ==
        graft.expressions.BlockMeanHash.hashBytes(lum),
        s"doc ${f.doc_id} frame ${f.frame_idx}: phash mismatch")
    }
    // distinct patterns fingerprint apart; GIF frame 3 and its PNG
    // re-encode carry IDENTICAL pixels, so they collide exactly
    assert(out(1L).map(_.frame_phash).distinct.size == out(1L).size)
    assert(out(1L).find(_.frame_idx == 3).get.frame_phash ==
      out(2L).head.frame_phash)
  }

  test("GraftExtensions registers functions and strategy without error") {
    val e = new org.apache.spark.sql.SparkSessionExtensions
    new graft.GraftExtensions().apply(e) // builder-time injection contract
  }

  test("m4 typed Welford Aggregator equals the untyped avg/var aggregate") {
    import org.apache.spark.sql.functions._
    val typed = Multimodal.typedFormatMoments(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val untyped = Multimodal.decodeAll(spark, sf)
      .groupBy(col("format"))
      .agg(count(lit(1)).cast("long").as("n"),
        round(avg(col("byte_len")) + lit(1e-9), 4).as("m"),
        round(var_samp(col("byte_len")) + lit(1e-9), 4).as("v"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(typed == untyped,
      s"typed=$typed\nuntyped=$untyped")
  }

  test("m5: phash matches an independent reference; banded pairs = brute force at hamming <= 3") {
    import org.apache.spark.sql.functions.{col, expr}
    // independent reference (BigInt fold, slice sums) — no shared code with
    // the expression's while-loop
    def refHash(bytes: Array[Byte]): Long = {
      val L = bytes.length
      if (L == 0) 0L
      else {
        val vals = bytes.map(b => (b & 0xff).toLong)
        val total = vals.sum
        (0 until 52).foldLeft(0L) { (h, j) =>
          val lo = j * L / 52; val hi = (j + 1) * L / 52
          val s = vals.slice(lo, hi).sum
          if (s * L > total * (hi - lo)) h | (1L << j) else h
        }
      }
    }
    val got = Multimodal.perceptualHashes(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.keySet == docs.map(_._1).toSet)
    docs.foreach { case (id, text) =>
      val bytes = text.getBytes("UTF-8")
      assert(got(id) == ((bytes.length.toLong, refHash(bytes))), s"doc $id phash")
    }
    // planted media set: exact re-encode (same bytes), a one-byte edit
    // (adjacent ascii, so block/total sums shift by 1 — the locality
    // claim), and unrelated content
    val base = docs.map(_._2).maxBy(_.length)
    val edited = {
      val cs = base.toCharArray
      cs(cs.length / 2) = (cs(cs.length / 2) + 1).toChar
      new String(cs)
    }
    val planted = Seq((1L, base), (2L, base), (3L, edited), (4L, base.reverse))
    graft.expressions.BlockMeanHash.register(spark)
    import spark.implicits._
    val hashes = planted.toDF("doc_id", "text")
      .select(col("doc_id"),
        expr("block_mean_hash(encode(text, 'UTF-8'))").as("phash"))
    val pairs = Multimodal.mediaNearDupPairs(hashes).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val ref = planted.map { case (id, t) => id -> refHash(t.getBytes("UTF-8")) }
    val brute = (for {
      (a, ha) <- ref; (b, hb) <- ref if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (a, b, d.toLong)).toSet
    assert(pairs == brute, s"banded=$pairs brute=$brute")
    assert(pairs.contains((1L, 2L, 0L)), "identical payloads must collide at hamming 0")
    assert(pairs.exists(p => p._1 == 1L && p._2 == 3L),
      "a one-byte edit must stay within the hamming-3 near-dup radius")
  }

  test("m5 over real decoded pixels: ImageIO-decoded fixtures through BlockMeanHash, banded pairs") {
    import spark.implicits._
    // High-contrast two-band pattern: block means sit FAR from the global
    // mean, so only deliberately edited blocks can flip hash bits. Gray
    // values ride TYPE_INT_RGB (r=g=b, so the BT.601 luminance recovers
    // the exact value and PNG/BMP lossless round-trips are bit-identical).
    val W = 64; val H = 64
    def grayImage(valueAt: (Int, Int) => Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(
        W, H, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until H; x <- 0 until W) {
        val v = valueAt(x, y) & 0xFF
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      img
    }
    def enc(img: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
      val baos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, baos), s"no $fmt writer")
      baos.toByteArray
    }
    val base = grayImage((_, y) => if (y < H / 2) 40 else 200)
    // near-dup: the top two rows brightened — flips the first ~2 of the
    // 52 byte-blocks, leaves every other block far from the mean
    val edited = grayImage((_, y) => if (y < 2) 200 else if (y < H / 2) 40 else 200)
    // inverted bands: every block lands on the other side of the mean
    val inverted = grayImage((_, y) => if (y < H / 2) 200 else 40)
    val media = Seq(
      Multimodal.MediaRecord(1L, enc(base, "png")),
      Multimodal.MediaRecord(2L, enc(base, "bmp")), // lossless re-encode
      Multimodal.MediaRecord(3L, enc(edited, "png")),
      Multimodal.MediaRecord(4L, enc(inverted, "png"))
    ).toDS().repartition(2)
    val hashes = Multimodal.pixelPerceptualHashes(media)
    val rows = hashes.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.keySet == Set(1L, 2L, 3L, 4L))
    assert(rows.values.forall(_._1 == (W * H).toLong), "luminance plane is W*H bytes")
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val Seq(h1, h2, h3, h4) = Seq(1L, 2L, 3L, 4L).map(rows(_)._2)
    assert(h1 == h2, "PNG and BMP of the same pixels must hash identically")
    val editDist = hamming(h1, h3)
    assert(editDist >= 1 && editDist <= 3,
      s"two-row edit should move 1-3 blocks, got $editDist")
    assert(hamming(h1, h4) > 3, "inverted bands must not be a near-dup")
    // the banded retrieval finds exactly the true pairs at hamming <= 3
    val pairs = Multimodal.mediaNearDupPairs(hashes.select($"doc_id", $"phash"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.keySet == Set((1L, 2L), (1L, 3L), (2L, 3L)),
      s"banded pairs drifted: ${pairs.keySet}")
    assert(pairs((1L, 2L)) == 0L && pairs((1L, 3L)) == editDist.toLong)
  }

  test("partition-wise decode is deterministic and composes with aggregation") {
    val d1 = Multimodal.decodeAll(spark, sf).collect().map(d => d.doc_id -> d).toMap
    val d2 = Multimodal.decodeAll(spark, sf).collect().map(d => d.doc_id -> d).toMap
    assert(d1 == d2) // stub decode is deterministic
    d1.values.foreach { d =>
      assert(d.width >= 64 && d.height >= 64 && d.n_frames >= 1)
      assert(d.format == "img" || d.format == "vid")
    }
    val stats = Multimodal.formatStats(spark, sf).collect()
    assert(stats.map(_.getString(0)).toSet.subsetOf(Set("img", "vid")))
    assert(stats.map(_.getLong(1)).sum == d1.size)
  }

  test("m6: radius-7 banded retrieval is exact vs brute force on the fixture") {
    import org.apache.spark.sql.functions.col
    val hashes = Multimodal.perceptualHashes(spark, sf)
    val hs = hashes.select(col("doc_id"), col("phash")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (a, ha) <- hs; (b, hb) <- hs if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 7
    } yield (a, b, d.toLong)).toSet
    val banded = Multimodal.mediaNearDupPairs(hashes, maxHamming = 7).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(banded == brute,
      s"banded=${banded.size} brute=${brute.size} (multi-index pigeonhole must be exact)")
  }

  test("m6 clusters: transitive chains close into one component (A~B~C, A-C beyond radius)") {
    // planted chain: progressively heavier edits of one payload, so
    // adjacent docs collide within radius 7 while the endpoints sit
    // beyond it — the case pair-listing (m5) under-reports and m6 exists
    // for. The reference clustering is an independent driver-side BFS
    // over the brute-force pair graph.
    val spark2 = spark
    import spark2.implicits._
    import org.apache.spark.sql.functions.{col, length, lit}
    val base = ("the quick brown fox jumps over the lazy dog " * 40).trim
    def edit(s: String, n: Int): String = {
      val cs = s.toCharArray
      (0 until n).foreach { k =>
        val pos = (k * 97 + 13) % cs.length
        cs(pos) = if (cs(pos) == 'z') 'a' else (cs(pos) + 1).toChar
      }
      new String(cs)
    }
    val docs = (0 to 6).map(i => (i.toLong + 1, edit(base, i * 12)))
    val dir = java.nio.file.Files.createTempDirectory("graft_m6_chain").toString
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("src"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val hs = Multimodal.perceptualHashes(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    val edges = (for {
      (a, ha) <- hs.toSeq; (b, hb) <- hs.toSeq
      if a < b && java.lang.Long.bitCount(ha ^ hb) <= 7
    } yield (a, b))
    assert(edges.nonEmpty, "chain fixture must produce at least one within-radius pair")
    // independent reference: BFS components over the brute edge list
    val adj = edges.flatMap(e => Seq(e, e.swap)).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).toSet }
    def component(seed: Long): Set[Long] = {
      var seen = Set(seed); var frontier = Set(seed)
      while (frontier.nonEmpty) {
        frontier = frontier.flatMap(adj.getOrElse(_, Set.empty)) -- seen
        seen ++= frontier
      }
      seen
    }
    val expected = adj.keySet.map(n => n -> component(n).min).toMap
    val got = Multimodal.mediaDedupClusters(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == expected, s"got=$got expected=$expected")
  }
}
