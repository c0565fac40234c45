package graft

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CasObject, CasObjectClient, ConditionalPutStore,
  LiveIndexPointer}

/** The conditional-put pointer store (r14 verdict "what's missing" #2):
  * the CAS protocol property-tested against an in-memory client that
  * ENFORCES the object-store preconditions — create-only fails on an
  * existing object, replace fails on a stale version tag — plus the
  * racing-writer retry path and the registerStore("s3a", …) wiring that
  * turns the r13 refusal into a working flip. The live S3 binding
  * ([[graft.operators.S3CasObjectClient]]) maps these calls 1:1 onto
  * the SDK's If-Match/If-None-Match API and stays env-gated (this
  * container ships no SDK jar and has no egress).
  */
class ConditionalPutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** In-memory CAS object store. The precondition checks mirror S3:
    * If-None-Match:* (expect None) fails iff the object exists;
    * If-Match (expect Some) fails iff the object is gone or its tag
    * moved. Etags are a monotone counter, never reused.
    */
  private class MemCasClient extends CasObjectClient {
    val store = new java.util.concurrent.ConcurrentHashMap[String, CasObject]()
    private val ver = new java.util.concurrent.atomic.AtomicLong(0L)
    /** Race-injection hook: runs after every get (between the read and
      * the CAS), where a concurrent writer would sneak in.
      */
    @volatile var afterGet: () => Unit = () => ()
    var puts = 0

    def get(ptr: Path): Option[CasObject] = {
      val r = Option(store.get(ptr.toString))
      afterGet()
      r
    }

    def putIf(ptr: Path, content: String,
              expectEtag: Option[String]): Boolean = synchronized {
      puts += 1
      val cur = Option(store.get(ptr.toString))
      val ok = (cur, expectEtag) match {
        case (None, None) => true
        case (Some(c), Some(e)) => c.etag == e
        case _ => false
      }
      if (ok) store.put(ptr.toString,
        CasObject(content, s"e${ver.incrementAndGet()}"))
      ok
    }

    /** An unconditional racing write (a second publisher landing). */
    def sneak(ptr: Path, content: String): Unit =
      store.put(ptr.toString,
        CasObject(content, s"e${ver.incrementAndGet()}"))
  }

  private val ptr = new Path("s3a://bucket/indexes/live.ptr")
  private val conf = new org.apache.hadoop.conf.Configuration()

  test("fake client enforces the S3 preconditions the protocol rides") {
    val c = new MemCasClient
    assert(c.putIf(ptr, "v1", Some("e9")) == false,
      "If-Match against a missing object must fail")
    assert(c.putIf(ptr, "v1", None))
    assert(c.putIf(ptr, "v2", None) == false,
      "If-None-Match:* against an existing object must fail")
    val etag = c.get(ptr).get.etag
    assert(c.putIf(ptr, "v2", Some("stale")) == false,
      "If-Match with a stale tag must fail")
    assert(c.putIf(ptr, "v2", Some(etag)))
    assert(c.get(ptr).get.content == "v2")
  }

  test("publish creates via If-None-Match, replaces via If-Match, and " +
    "every landed write is a complete value") {
    val c = new MemCasClient
    val store = new ConditionalPutStore(c)
    store.publish(conf, ptr, "idx_blue")
    assert(c.get(ptr).get.content == "idx_blue")
    store.publish(conf, ptr, "idx_green")
    assert(c.get(ptr).get.content == "idx_green")
    assert(c.puts == 2, "no retries were needed on an uncontended store")
  }

  test("a racing writer between the read and the CAS forces a retry; " +
    "the flip still lands and last-committed content is the flip's") {
    val c = new MemCasClient
    val store = new ConditionalPutStore(c)
    store.publish(conf, ptr, "idx_blue")
    var raced = false
    c.afterGet = () => if (!raced) { raced = true; c.sneak(ptr, "zombie") }
    store.publish(conf, ptr, "idx_green")
    assert(c.get(ptr).get.content == "idx_green",
      "the retried CAS must re-read the moved tag and land")
    assert(c.puts == 3, "exactly one lost race, one successful retry")
  }

  test("a persistently racing store exhausts maxAttempts and fails " +
    "LOUDLY — a flip must never half-land or silently vanish") {
    val c = new MemCasClient
    val store = new ConditionalPutStore(c, maxAttempts = 3)
    store.publish(conf, ptr, "idx_blue")
    c.afterGet = () => c.sneak(ptr, "zombie")
    val ex = intercept[java.io.IOException] {
      store.publish(conf, ptr, "idx_green")
    }
    assert(ex.getMessage.contains("CAS races"))
    assert(c.puts == 1 + 3, "one create + exactly maxAttempts CAS tries")
  }

  test("registerStore('s3a', conditional-put) replaces the r13 refusal: " +
    "the scheme dispatch now serves the CAS store") {
    val c = new MemCasClient
    val store = new ConditionalPutStore(c)
    LiveIndexPointer.registerStore("s3a", store)
    try {
      val served = LiveIndexPointer.storeFor(ptr, conf)
      assert(served eq store)
      served.publish(conf, ptr, "graft_ivfpq_live_green")
      assert(c.get(ptr).get.content == "graft_ivfpq_live_green")
    } finally {
      // restore the refusal for other suites (Round14Spec pins it)
      LiveIndexPointer.unregisterStore("s3a")
    }
  }

  test("live S3 binding is env-gated (GRAFT_LIVE_S3_PTR): absent the " +
    "SDK and credentials it refuses with a clear error, not a flip") {
    assume(sys.env.get("GRAFT_LIVE_S3_PTR").isEmpty,
      "live gate set — this spec's negative branch doesn't apply")
    intercept[ClassNotFoundException] {
      new graft.operators.S3CasObjectClient()
    }
  }
}
