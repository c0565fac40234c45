package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** t34: the end-to-end corpus-curation funnel — the composition a
  * training-data pipeline actually runs, expressed as ONE query so the
  * stage interactions (a duplicate whose twin died at the quality gate
  * now survives exact dedup; survivor election happens on the gated set,
  * not the raw corpus) are the library's contract, not the caller's
  * glue code. Seven sequential stages over `documents`, each consuming
  * the previous stage's survivors:
  *
  *  1. `1_holdout`      — hold out the eval split (`doc_id % 20 = 0`,
  *                        d8's eval-set convention).
  *  2. `2_lang_id`      — keep docs whose predicted language (t2's
  *                        marker-argmax) agrees with the declared label.
  *  3. `3_quality`      — t13's rule battery verbatim: token count in
  *                        [10, 100000], quality score ≥ 0.3, top-trigram
  *                        share ≤ 0.2 (both on the 4dp-rounded values t1
  *                        and t9 publish, the cross-engine-stable form).
  *  4. `4_exact_dedup`  — min-doc_id survivor per t1 content fingerprint
  *                        (d1's rule), elected WITHIN the gated set.
  *  5. `5_near_dup`     — exact 3-gram-Jaccard pairs at τ = 0.8 over the
  *                        stage-4 survivors via d2's prefix-filtered
  *                        PPJoin (exact, so no LSH miss-probability
  *                        caveat enters the composition), connected
  *                        components, min-id survivor per cluster (d6/d7).
  *  6. `6_decontaminated` — drop any survivor sharing ≥ 1 distinct word
  *                        8-gram with the eval split (d8's shingle
  *                        machinery; the STRICT form of its
  *                        contamination fraction — one shared 8-gram is
  *                        an eval leak, so the gate is exact-integer,
  *                        no float threshold).
  *  7. `7_source_cap`   — t17's per-source cap: top `capPerSource` by
  *                        (rounded quality score DESC, doc_id ASC).
  *
  * Output is the funnel report: one row per stage (plus `0_base`),
  * `(stage, n_docs, n_tokens)` with token counts from t1 — the
  * doc-vs-token shrinkage per stage is the number a training budget
  * reads (d23's insight, per stage).
  *
  * Scale shape: the sequential-filter spelling would scan the corpus
  * once per stage; instead every stage is a BOOLEAN FLAG on one per-doc
  * frame (in_k = in_{k-1} ∧ gate_k) and the whole report is a single
  * conditional aggregate + `stack` unpivot — one corpus pass for all
  * eight rows. The set-dependent stages stay set-dependent without
  * extra scans: stage 4's election is a min-over-fingerprint window
  * restricted to the stage-3 flag; stage 7's cap is a BOUNDED top-`cap`
  * election per source ([[TopCapAgg]] — map-side-combined aggregation
  * whose state never exceeds `cap` rows per source per partition,
  * broadcast back as a ≤ cap·n_sources marker set: no per-source sort,
  * so one source owning half a 100 TB corpus costs a partial-agg scan,
  * not a single-partition sort of half the data — the r13 skew finding;
  * the r13 window form survives as Round14Spec's dominant-source
  * equality oracle, and t17 keeps the full window because its CONTRACT
  * emits every doc's rank, not just the kept set); stages 5/6 are
  * marker joins against two tiny materialized id sets (near-dup losers
  * from the d2 candidate machinery — the engine's 100 TB-viable exact
  * similarity join, run over the strictly smaller stage-4 subset — and
  * d8's df-join contamination set, no pair enumeration). The pair set
  * is localCheckpointed BEFORE connected components so the iterative
  * label propagation replays a 44-row edge list, not the PPJoin plan.
  *
  * Reference basis: the stage batteries are the library's own t2/t13/d1/
  * d2+d6/d8/t17 operators (each oracle-gated on its own); this query
  * pins their COMPOSITION against a single composed DuckDB replay (the
  * oracle states the plain sequential-CTE form, so the flag-battery
  * rewrite is itself oracle-checked against the naive spelling).
  *
  * Fixture honesty note: the driver's synthetic corpus contains NO exact
  * duplicates and token counts span [10, 99] with quality scores above
  * the 0.3 bar — so stages 3 and 4 pass everything there BY THE DATA
  * (measured at sf0.01 and sf0.1), while stages 1/2/5/6/7 all cut. The
  * oracle still replays their set-dependent semantics, and Round13Spec
  * proves every gate fires on a planted fixture (a too-short doc, a
  * repetitive doc, an exact duplicate, an eval-8-gram leak).
  */
object Curation {

  /** Stage-5 near-dup threshold — d2's registered τ. Interpolated into
    * the t34 oracle SQL so the twin cannot desync.
    */
  val NearDupThreshold = 0.8

  /** Stage-7 per-source cap — t17's registered cap. Interpolated into
    * the t34 oracle SQL so the twin cannot desync.
    */
  val CapPerSource = 10

  /** Stage-7 marker-join strategy bound: broadcast the elected kept set
    * only when it is verifiably at most this many rows. The set is ≤
    * cap·n_sources, and n_sources is CORPUS-SHAPED — at the 100 TB
    * web-crawl scale the docs cite, domains run O(10⁷), making
    * cap·n_sources ~10⁸ rows: past Spark's broadcast limits and a
    * driver-OOM risk the stage-5/6 marker sets (loser/contaminated ids,
    * bounded by actual dup/contamination mass) never approach. Below
    * the bound a broadcast skips the corpus-side shuffle; above it the
    * join falls back to a plain shuffle join on `doc_id` — the elected
    * set is already materialized, so the decision costs one count over
    * cached rows. 10M rows ≈ 170 MB of (id, flag) pairs, inside the
    * 8 GB broadcast hard limit with an order of magnitude of headroom.
    */
  val MaxBroadcastKeptRows = 10000000L

  /** One stage-7 candidate: the rounded t1 quality and the doc id — the
    * (quality DESC, doc_id ASC) rank key, a total order so the cut is
    * deterministic across retries and merge trees.
    */
  case class QDoc(q: Double, id: Long)

  /** Bounded top-`cap` per group — the rank-free skew answer for the
    * per-source cap (r13 verdict "what's wrong" #3): the r13 form ran
    * `row_number`-style running counts under
    * `Window.partitionBy(source)`, a FULL per-source sort — on a skewed
    * corpus (one source owning half the docs, the realistic web-crawl
    * shape) that is a single-partition sort of half the corpus to keep
    * `cap` rows. This Aggregator's state is ≤ `cap` rows per group per
    * partition: map-side partial aggregation folds each partition's
    * candidates down to its local top-`cap` before the shuffle, the
    * merge unions two ≤-`cap` buffers and re-takes `cap` (associative
    * and commutative over the (q DESC, id ASC) total order, so any
    * merge tree elects the same global top-`cap`), and the shuffle
    * moves at most `cap · partitions` rows per source instead of the
    * source's whole extent. Dominant-source equality with the window
    * form is pinned in Round14Spec.
    */
  class TopCapAgg(cap: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        QDoc, Seq[QDoc], Seq[Long]] {
    private def ord = Ordering.by[QDoc, (Double, Long)](x => (-x.q, x.id))
    def zero: Seq[QDoc] = Nil
    def reduce(b: Seq[QDoc], a: QDoc): Seq[QDoc] = merge(b, a :: Nil)
    def merge(b1: Seq[QDoc], b2: Seq[QDoc]): Seq[QDoc] =
      (b1 ++ b2).sorted(ord).take(cap)
    def finish(r: Seq[QDoc]): Seq[Long] = r.map(_.id)
    def bufferEncoder: org.apache.spark.sql.Encoder[Seq[QDoc]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[QDoc]]()
    def outputEncoder: org.apache.spark.sql.Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** The ≤ `cap·n_sources`-row kept set stage 7 elects: top-`cap`
    * `candFlag` rows per source under (quality DESC, doc_id ASC), via
    * [[TopCapAgg]] — bounded aggregation state, no per-source sort.
    */
  private[graft] def keptPerSource(pre: DataFrame, candFlag: String,
                                   cap: Int): DataFrame = {
    val topcap = udaf(new TopCapAgg(cap),
      org.apache.spark.sql.Encoders.product[QDoc])
    pre.filter(col(candFlag))
      .groupBy(col("source"))
      .agg(topcap(col("quality_score"), col("doc_id")).as("ids"))
      .select(explode(col("ids")).as("doc_id"), lit(true).as("in7_kept"))
  }

  def curationFunnel(spark: SparkSession, dir: String,
                     threshold: Double = NearDupThreshold,
                     capPerSource: Int = CapPerSource,
                     maxBroadcastKept: Long = MaxBroadcastKeptRows)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documentsParallel(spark, dir)

    // per-doc gate inputs: ONE fused projection over ONE corpus scan
    // (r15, guide §2.4 — was a 3-way join of the t1/t9/t2 per-doc reports
    // plus a fourth scan for (doc_id, source): three corpus Exchanges
    // aligning columns that are pure per-row functions of the same row);
    // gates 1-4 become flags on this one frame (stage 4 via the
    // fingerprint window — min gated doc_id per content group)
    val wFp = Window.partitionBy(col("fingerprint"))
    val flagged = TextAnalysis.curationGateInputs(spark, dir)
      .withColumn("in1", col("doc_id") % 20 =!= 0)
      .withColumn("in2", col("in1") && col("lang_ok"))
      .withColumn("in3", col("in2") &&
        col("n_tokens") >= 10 && col("n_tokens") <= 100000 &&
        col("quality_score") >= 0.3 && col("top_trigram_ratio") <= 0.2)
      .withColumn("in4", col("in3") &&
        min(when(col("in3"), col("doc_id"))).over(wFp) === col("doc_id"))
      .cache()

    // one tokenization for stages 5 AND 6 (r16, guide §2.4): both stages
    // tokenize with the same normalize+split, over overlapping doc sets
    // (stage 5: the stage-4 survivors; stage 6: survivors + the eval
    // holdout, disjoint by construction). The r15 form tokenized twice
    // and semi-joined the corpus against the survivor set twice; this
    // caches (doc_id, is_holdout, toks) once — survivors ∪ holdout, one
    // semi-join — and derives the 3-gram (stage 5) and 8-gram (stage 6)
    // shingle frames from the cached token arrays.
    val toks0 = docs.select(col("doc_id"), col("text"))
      .join(flagged.filter(col("in4")).select("doc_id"),
        Seq("doc_id"), "left_semi")
      .withColumn("is_holdout", lit(false))
      .unionAll(docs.filter(col("doc_id") % 20 === 0)
        .select(col("doc_id"), col("text"))
        .withColumn("is_holdout", lit(true)))
      .select(col("doc_id"), col("is_holdout"),
        graft.functions.TextFunctions.tokens(col("text")).as("toks"))
      .cache()
    def shingled(df: DataFrame, n: Int): DataFrame = df
      .select(col("doc_id"),
        graft.functions.TextFunctions.shinglesOfTokens(col("toks"), n).as("sh_str"))
      .select(col("doc_id"), transform(col("sh_str"), s => xxhash64(s)).as("sh"))

    // stage 5: exact near-dup pairs over the stage-4 set (d2's PPJoin),
    // materialized before the iterative components so label propagation
    // never replays the similarity join
    val sh4 = shingled(toks0.filter(!col("is_holdout")), 3).cache()
    val (_, prefix4, cand4) = Dedup.ngramCandidatesOf(sh4, threshold)
    val pairs = Dedup.materializeAndRelease(cand4
      .join(sh4.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh4.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("shared", size(array_intersect(col("sh_a"), col("sh_b"))))
      .filter(col("shared").cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - col("shared")).cast("double")
        >= threshold)
      .select(col("id_a"), col("id_b")), sh4, prefix4)
    val nearDupLosers = Dedup.connectedComponents(pairs)
      .filter(col("node") =!= col("root"))
      .select(col("node").as("doc_id"), lit(true).as("is_nd_loser"))

    // stage 6: strict 8-gram decontamination against the eval split
    // (d8's hashed-shingle machinery; the eval side is the FULL holdout
    // — it never shrinks). The contaminated id set is tiny and
    // materialized, like the loser set. Only the docs this stage can
    // ever read are shingled: the eval split plus the stage-4 survivors
    // (disjoint by construction — in1 excludes the holdout) — unlike
    // d8, whose probe side genuinely is every non-eval doc, the probe
    // side here is the gated subset, so shingling the rest of the
    // corpus would be pure waste (~60% of the corpus at soak scale).
    val sh8 = shingled(toks0, 8).cache()
    val evalNgrams = sh8.filter(col("doc_id") % 20 === 0)
      .select(explode(col("sh")).as("s")).distinct()
    val contaminated = Dedup.materializeAndRelease(
      sh8.join(flagged.filter(col("in4")).select("doc_id"), Seq("doc_id"), "left_semi")
        .select(col("doc_id"), explode(col("sh")).as("s"))
        .join(broadcast(evalNgrams), Seq("s"), "left_semi")
        .select("doc_id").distinct()
        .withColumn("is_contam", lit(true)), sh8, toks0)

    // stages 5-7 as flags: marker joins, then t17's per-source cap as a
    // BOUNDED top-(cap) election ([[TopCapAgg]]) — the r13 running-count
    // window sorted every source partition in full, a single-partition
    // sort of half the corpus when one source dominates (the realistic
    // web-crawl shape); the bounded form's kept set is ≤ cap·n_sources
    // rows, broadcast back as a marker join like stages 5/6
    val flagged56 = flagged
      .join(broadcast(nearDupLosers), Seq("doc_id"), "left")
      .join(broadcast(contaminated), Seq("doc_id"), "left")
      .withColumn("in5", col("in4") && col("is_nd_loser").isNull)
      .withColumn("in6", col("in5") && col("is_contam").isNull)
    // the kept set is ≤ cap·n_sources rows — broadcast only when its
    // MEASURED size clears [[MaxBroadcastKeptRows]] (n_sources is
    // corpus-shaped; see the constant's scaladoc), else shuffle-join
    val kept = keptPerSource(flagged56, "in6", capPerSource).cache()
    val keptJoin =
      if (kept.count() <= maxBroadcastKept) broadcast(kept) else kept
    val withCap = flagged56
      .join(keptJoin, Seq("doc_id"), "left")
      .withColumn("in7", col("in6") && col("in7_kept").isNotNull)

    // the whole report in one conditional aggregate + stack unpivot
    def d(flag: String) = sum(when(col(flag), 1L).otherwise(0L))
    def t(flag: String) = sum(when(col(flag), col("n_tokens")).otherwise(0L))
    val agg = withCap.agg(
      count(lit(1)).cast("long").as("d0"),
      coalesce(sum(col("n_tokens")), lit(0L)).cast("long").as("t0"),
      coalesce(d("in1"), lit(0L)).as("d1"), coalesce(t("in1"), lit(0L)).as("t1"),
      coalesce(d("in2"), lit(0L)).as("d2"), coalesce(t("in2"), lit(0L)).as("t2"),
      coalesce(d("in3"), lit(0L)).as("d3"), coalesce(t("in3"), lit(0L)).as("t3"),
      coalesce(d("in4"), lit(0L)).as("d4"), coalesce(t("in4"), lit(0L)).as("t4"),
      coalesce(d("in5"), lit(0L)).as("d5"), coalesce(t("in5"), lit(0L)).as("t5"),
      coalesce(d("in6"), lit(0L)).as("d6"), coalesce(t("in6"), lit(0L)).as("t6"),
      coalesce(d("in7"), lit(0L)).as("d7"), coalesce(t("in7"), lit(0L)).as("t7"))
    val funnel = agg.select(expr(
      """stack(8,
        | '0_base', d0, t0, '1_holdout', d1, t1,
        | '2_lang_id', d2, t2, '3_quality', d3, t3,
        | '4_exact_dedup', d4, t4, '5_near_dup', d5, t5,
        | '6_decontaminated', d6, t6, '7_source_cap', d7, t7
        |) AS (stage, n_docs, n_tokens)""".stripMargin))
      .orderBy(col("stage"))
    Dedup.materializeAndRelease(funnel, flagged, kept)
  }
}
