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
}
