package graft.operators

/** The once-per-session build memo every `*Indexed` registered query
  * rides (d12, d28, s16, s18, s22, m18, m20): build the persisted index
  * the first time a (application, query tag, data dir) triple probes,
  * then serve every later probe from the recorded warehouse prefix.
  *
  * Two guarantees, both learned the hard way (r13/r14 ADVICE):
  *
  *  - '''Distinct dirs can NEVER share tables.''' Earlier rounds derived
  *    the prefix from `dir.hashCode` (later + length + a sanitized
  *    tail), but any content-derived name has residual collisions — two
  *    dirs colliding on every retained feature would make the second
  *    build clobber the first's tables and the first dir silently serve
  *    pairs from the wrong corpus. The prefix is now a session-unique
  *    counter drawn INSIDE the `computeIfAbsent` mapping (which the map
  *    serializes to at most one call per key), so uniqueness is
  *    structural, not probabilistic; the sanitized dir tail rides along
  *    for warehouse readability only.
  *  - '''A failed build poisons nothing.''' `computeIfAbsent` records
  *    the mapping only when the build RETURNS: a build that throws
  *    leaves no entry (the next call rebuilds instead of probing a
  *    partial table), and a concurrent first probe blocks on the same
  *    bin instead of racing the build.
  */
private[graft] object IndexMemo {

  private val built =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val seq = new java.util.concurrent.atomic.AtomicInteger(0)

  /** The memoized warehouse prefix for (`appId`, `tag`, `dir`), building
    * via `build(prefix)` on first call. Keyed on the FULL dir string;
    * the returned prefix embeds a session-unique counter.
    */
  def ensure(appId: String, tag: String, dir: String)
            (build: String => Unit): String =
    built.computeIfAbsent(s"$appId $tag $dir", _ => {
      val tail = dir.takeRight(12).map(c =>
        if (c.isLetterOrDigit) c.toLower else '_')
      val prefix = s"graft_${tag}_idx_${seq.getAndIncrement()}_$tail"
      build(prefix)
      prefix
    })
}
