package graft.operators

import org.apache.spark.sql.SparkSession

/** The live-index pointer shared by every persisted-index family
  * (containment d28/d31, IVF s16/s17): one file in the session warehouse
  * whose CONTENT is the prefix probes should read. A pointer file, not a
  * view or a 1-row table, because a cutover must swap ALL of an index's
  * tables at once: per-table `CREATE OR REPLACE VIEW` swaps are
  * sequential and reopen the mixed-state window (for the containment
  * index that is the two-table order-consistency failure —
  * [[Dedup.rebuildContainmentIndexTo]]; for IVF it is assignments read
  * against the wrong centroid set), and a table overwrite is
  * drop-then-recreate, a window where the pointer doesn't exist at all.
  * A single-file rename is atomic on POSIX and HDFS, so readers see
  * exactly the old prefix or the new one, never a mix and never an
  * absence. On S3-class object stores rename is copy+delete — NOT atomic
  * — so the publish primitive is a [[PointerStore]] seam dispatched on
  * the pointer's filesystem scheme: POSIX/HDFS get the rename store;
  * object-store schemes REFUSE loudly until a conditional-put store
  * (same one-pointer contract, different primitive) is registered for
  * them, turning what was a scaladoc caveat into a runtime guarantee
  * (r13 verdict: a silent copy+delete flip would void the atomicity the
  * whole blue/green argument rests on).
  *
  * The flip is single-writer by contract (fixed temp name) — the same
  * one-owner discipline the index append paths already impose; each
  * lifecycle has one driver.
  */
private[graft] object LiveIndexPointer {

  /** The atomic-publish primitive a pointer flip rides on. Implementors
    * must guarantee readers see the old content or the new, never a mix
    * and never an absence.
    */
  trait PointerStore {
    def publish(conf: org.apache.hadoop.conf.Configuration,
                ptr: org.apache.hadoop.fs.Path, content: String): Unit
  }

  /** temp-write + atomic single-file rename — correct on POSIX local
    * filesystems and HDFS (both document rename atomicity).
    */
  object RenameStore extends PointerStore {
    def publish(conf: org.apache.hadoop.conf.Configuration,
                ptr: org.apache.hadoop.fs.Path, content: String): Unit = {
      val tmp = ptr.suffix(".tmp")
      val fs = ptr.getFileSystem(conf)
      val out = fs.create(tmp, true)
      try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      org.apache.hadoop.fs.FileContext.getFileContext(ptr.toUri, conf)
        .rename(tmp, ptr, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    }
  }

  /** Schemes whose `rename` is a non-atomic copy+delete (or a metadata
    * emulation with no overwrite atomicity) — a flip here must use a
    * conditional-put (S3 If-Match / GCS generation-match / ABFS ETag)
    * registered via [[registerStore]]; absent one, the flip refuses.
    */
  private val ObjectStoreSchemes = Set(
    "s3", "s3a", "s3n", "gs", "oss", "cos", "wasb", "wasbs", "abfs", "abfss")

  private val customStores =
    new java.util.concurrent.ConcurrentHashMap[String, PointerStore]()

  /** Plug a publish primitive for a filesystem scheme (e.g.
    * [[ConditionalPutStore]] for `s3a`, or a fake scheme in tests).
    */
  def registerStore(scheme: String, store: PointerStore): Unit =
    customStores.put(scheme.toLowerCase, store)

  /** Remove a scheme's registered store — object-store schemes fall
    * back to the loud refusal (decommissioning symmetry for
    * [[registerStore]]).
    */
  def unregisterStore(scheme: String): Unit = {
    customStores.remove(scheme.toLowerCase)
    ()
  }

  /** The store `ptr`'s scheme resolves to: a registered custom store
    * wins; object-store schemes with no registration refuse loudly;
    * everything else (file, hdfs, viewfs, scheme-less local paths) gets
    * the rename store.
    */
  private[graft] def storeFor(ptr: org.apache.hadoop.fs.Path,
                              conf: org.apache.hadoop.conf.Configuration)
      : PointerStore = {
    val scheme = Option(ptr.toUri.getScheme)
      .getOrElse(ptr.getFileSystem(conf).getUri.getScheme).toLowerCase
    Option(customStores.get(scheme)).getOrElse {
      if (ObjectStoreSchemes.contains(scheme))
        throw new UnsupportedOperationException(
          s"pointer flip on '$scheme' requires a conditional-put " +
            "PointerStore: rename is copy+delete there, which silently " +
            "loses the atomicity the blue/green cutover rests on — " +
            "register one via LiveIndexPointer.registerStore " +
            s"(\"$scheme\", store), e.g. new ConditionalPutStore(" +
            "new S3CasObjectClient()) for s3a")
      RenameStore
    }
  }

  private def path(spark: SparkSession, alias: String) =
    new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), s"${alias.toLowerCase}.ptr")

  /** Atomically point `alias` at `toPrefix` via the scheme's
    * [[PointerStore]].
    */
  def flip(spark: SparkSession, toPrefix: String, alias: String): Unit = {
    val ptr = path(spark, alias)
    val conf = spark.sparkContext.hadoopConfiguration
    storeFor(ptr, conf).publish(conf, ptr, toPrefix)
  }

  /** The prefix `alias` points at; `None` before the first flip. */
  def current(spark: SparkSession, alias: String): Option[String] = {
    val ptr = path(spark, alias)
    val fs = ptr.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(ptr)) None
    else {
      val buf = new Array[Byte](fs.getFileStatus(ptr).getLen.toInt)
      val in = fs.open(ptr)
      try in.readFully(0L, buf) finally in.close()
      Some(new String(buf, java.nio.charset.StandardCharsets.UTF_8).trim)
    }
  }

  /** Delete `alias`'s pointer file — decommissioning teardown (the
    * pointer is a plain warehouse file, so unlike in-memory catalog
    * entries it would otherwise outlive the session and point the next
    * deployment at tables that no longer exist).
    */
  def unlink(spark: SparkSession, alias: String): Unit = {
    val ptr = path(spark, alias)
    val fs = ptr.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(ptr, false)
    fs.delete(ptr.suffix(".tmp"), false)
    ()
  }
}

/** THE blue/green rotate verb, shared by all four persisted-index
  * families (containment d30, IVF s17, PQ s19, media m19). One skeleton,
  * four plugs: until r14 each family re-spelled the same six steps, which
  * is four places any future crash-window fix must land identically — the
  * exact failure class the r13 partitioned-rename bug (one family's
  * rename path, found late) demonstrated.
  *
  * The step order makes every crash half-state heal forward:
  *
  *  - during rebuild → pointer untouched, half-built idle color; the next
  *    acting rotate's rebuild starts by dropping the target.
  *  - between rebuild and flip → pointer untouched, a complete but
  *    unreferenced idle color; healed by the unconditional idle-color
  *    drop at the START of every rotate (the append path's
  *    heal-on-every-call convention — residue must not wait for a retry
  *    that may never come).
  *  - between flip and retire → pointer committed, old color orphaned;
  *    the next rotate's start-heal targets exactly that color.
  *
  * The pointer rename is therefore the lifecycle's single commit point.
  * Retirement is immediate, which is sound for the library's
  * single-driver lifecycle (a probe and a rotate never overlap); a
  * deployment with concurrent probe sessions flips, lets in-flight probes
  * drain against the old — still-correct, merely stale — index, then
  * drops it (each family exposes its drop for exactly that).
  */
private[graft] object IndexRotation {

  /** Rotate `alias`'s index: heal idle-color residue, audit the live
    * color, and iff `auditRatio(live)` clears `rebuildRatio`: rebuild
    * into the idle color, flip the pointer, retire the old color.
    * Returns whether a rotation happened (false = idle color left
    * dropped, live index untouched).
    *
    * @param drop       drop + physically delete ALL of a prefix's tables
    *                   (both the start-heal and the retire — they are the
    *                   same verb in every family)
    * @param auditRatio the family's live drift audit folded to its
    *                   `drift_ratio` scalar
    * @param rebuild    blue/green rebuild `(fromPrefix, toPrefix)` —
    *                   self-contained from the live index's own stored
    *                   rows, `fromPrefix` never mutated
    */
  def rotate(spark: SparkSession, alias: String, rebuildRatio: Double,
             drop: String => Unit,
             auditRatio: String => Double,
             rebuild: (String, String) => Unit): Boolean = {
    val from = LiveIndexPointer.current(spark, alias).getOrElse(
      throw new IllegalStateException(
        s"cannot rotate: pointer '$alias' has never been flipped"))
    val blue = s"${alias}_blue"
    val to = if (from == blue) s"${alias}_green" else blue
    drop(to) // heal idle-color residue from any crash
    val act = auditRatio(from) >= rebuildRatio
    if (act) {
      rebuild(from, to)
      LiveIndexPointer.flip(spark, to, alias)
      drop(from)
    }
    act
  }
}
