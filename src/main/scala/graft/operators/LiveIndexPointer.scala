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
  * absence. (On S3-class object stores rename is copy+delete; a
  * deployment there flips via a conditional-put of the pointer object —
  * same one-pointer contract, different primitive.)
  *
  * The flip is single-writer by contract (fixed temp name) — the same
  * one-owner discipline the index append paths already impose; each
  * lifecycle has one driver.
  */
private[graft] object LiveIndexPointer {

  private def path(spark: SparkSession, alias: String) =
    new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), s"${alias.toLowerCase}.ptr")

  /** Atomically point `alias` at `toPrefix` (write temp, rename over). */
  def flip(spark: SparkSession, toPrefix: String, alias: String): Unit = {
    val ptr = path(spark, alias)
    val conf = spark.sparkContext.hadoopConfiguration
    val tmp = ptr.suffix(".tmp")
    val fs = ptr.getFileSystem(conf)
    val out = fs.create(tmp, true)
    try out.write(toPrefix.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    org.apache.hadoop.fs.FileContext.getFileContext(ptr.toUri, conf)
      .rename(tmp, ptr, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
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
