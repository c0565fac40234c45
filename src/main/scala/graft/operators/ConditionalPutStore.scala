package graft.operators

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** The conditional-put publish primitive for object stores — the
  * [[LiveIndexPointer.PointerStore]] a deployment registers for `s3a`
  * (or `gs`/`abfs`) so a pointer flip stops refusing there. Where
  * POSIX/HDFS flips ride an atomic rename, object stores give two
  * primitives that together carry the same contract:
  *
  *  - a single-object PUT is '''read-atomic''': a GET concurrent with
  *    the PUT returns the complete old object or the complete new one,
  *    never a mix and (for an overwrite) never an absence — exactly the
  *    reader-side guarantee the pointer needs; and
  *  - a '''conditional''' PUT (S3 `If-Match`/`If-None-Match`, GCS
  *    generation preconditions, ABFS ETags) makes the write a
  *    compare-and-swap: it lands only if the object's version is still
  *    the one the writer read, so two publishers can never silently
  *    lose one of their writes — the writer-side guarantee a plain PUT
  *    (last-writer-wins, no ordering) cannot give. The lifecycle is
  *    single-writer by contract, but the flip is the one step whose
  *    failure is silent corruption, so it gets the belt AND the
  *    contract.
  *
  * [[publish]] runs the standard CAS loop: read the current version
  * tag, PUT conditioned on exactly that tag (`If-None-Match: *` when
  * the pointer doesn't exist yet, `If-Match: <etag>` when it does),
  * retry on a lost race, give up loudly after `maxAttempts` (a flip
  * that cannot land must fail the rotate, never half-land). The
  * store/protocol split ([[CasObjectClient]]) keeps the CAS semantics
  * testable without a live bucket: Round15Spec drives this class
  * against an in-memory client that ENFORCES the preconditions —
  * create-only fails on an existing object, replace fails on a stale
  * tag, and a racing writer between the read and the PUT forces the
  * retry path.
  */
final class ConditionalPutStore(client: CasObjectClient,
                                maxAttempts: Int = 5)
    extends LiveIndexPointer.PointerStore {

  def publish(conf: Configuration, ptr: Path, content: String): Unit = {
    var attempt = 0
    var done = false
    while (!done) {
      attempt += 1
      val expect = client.get(ptr).map(_.etag)
      done = client.putIf(ptr, content, expect)
      if (!done && attempt >= maxAttempts)
        throw new java.io.IOException(
          s"pointer flip to '$content' lost $maxAttempts CAS races at " +
            s"$ptr — another writer is live; the single-writer contract " +
            "is violated, refusing rather than risking a lost flip")
    }
  }
}

/** One versioned object read: its full content and the version tag
  * (ETag / generation) a conditional replace must name.
  */
final case class CasObject(content: String, etag: String)

/** The two object-store calls the CAS protocol needs — the seam between
  * [[ConditionalPutStore]] (the protocol, property-tested in-memory)
  * and a concrete store binding ([[S3CasObjectClient]] for live S3).
  */
trait CasObjectClient {

  /** The object at `ptr`, or None if it doesn't exist. */
  def get(ptr: Path): Option[CasObject]

  /** Conditionally write `content` at `ptr`: with `expectEtag` None the
    * write must land ONLY if no object exists (`If-None-Match: *`);
    * with Some(etag) only if the current version is exactly `etag`
    * (`If-Match`). Returns false on a precondition failure (the CAS
    * lost), true when the write landed. Anything else throws.
    */
  def putIf(ptr: Path, content: String, expectEtag: Option[String]): Boolean
}

/** [[CasObjectClient]] over the AWS SDK v2's S3 conditional-write API
  * (`PutObjectRequest.ifMatch`/`ifNoneMatch` — the public S3 feature,
  * GA since 2024). Bound REFLECTIVELY: this container ships no AWS SDK
  * jar (zero egress), so a compile-time dependency cannot exist here —
  * the adapter resolves `software.amazon.awssdk.services.s3.S3Client`
  * and friends by name at construction, throwing a clear error when the
  * SDK is absent, and a deployment that has `hadoop-aws` + the SDK on
  * its classpath gets the live binding with no rebuild:
  *
  * {{{
  * LiveIndexPointer.registerStore("s3a",
  *   new ConditionalPutStore(new S3CasObjectClient()))
  * }}}
  *
  * Env-gated like LivePostgresSpec: the live smoke path needs
  * GRAFT_LIVE_S3_PTR=1 plus real credentials; absent those, only the
  * in-memory protocol tests run. Every call maps 1:1 onto the SDK:
  * get → `getObjectAsBytes` (None on `NoSuchKeyException`/404), putIf →
  * `putObject` with the precondition header (false on HTTP 412).
  */
final class S3CasObjectClient extends CasObjectClient {

  private def cls(n: String) = Class.forName(n)
  private val s3 = cls("software.amazon.awssdk.services.s3.S3Client")
    .getMethod("create").invoke(null)

  private def builderOf(reqClass: String): AnyRef =
    cls(reqClass).getMethod("builder").invoke(null)

  /** Invoke `method` on `target` by name + arity. SDK runtime classes
    * are often package-private implementations of public interfaces, so
    * the Method object must come from a PUBLIC declaring type (walk
    * supertypes until one is found) or reflection throws
    * IllegalAccessException even for a public method.
    */
  private def call(target: AnyRef, method: String, args: AnyRef*): AnyRef = {
    val candidates = target.getClass.getMethods.filter(m =>
      m.getName == method && m.getParameterCount == args.length)
    val m = candidates
      .find(m => java.lang.reflect.Modifier.isPublic(
        m.getDeclaringClass.getModifiers))
      .orElse(candidates.headOption)
      .getOrElse(throw new NoSuchMethodException(
        s"${target.getClass.getName}.$method/${args.length}"))
    try m.invoke(target, args: _*)
    catch {
      case _: IllegalAccessException =>
        m.setAccessible(true); m.invoke(target, args: _*)
    }
  }

  /** (bucket, key) of an s3a/s3 URI. */
  private def split(ptr: Path): (String, String) = {
    val u = ptr.toUri
    (u.getHost, u.getPath.stripPrefix("/"))
  }

  private def statusCodeOf(e: Throwable): Int = e match {
    case null => -1
    case t =>
      try t.getClass.getMethod("statusCode").invoke(t)
        .asInstanceOf[Integer].intValue()
      catch { case _: NoSuchMethodException => statusCodeOf(t.getCause) }
  }

  def get(ptr: Path): Option[CasObject] = {
    val (b, k) = split(ptr)
    val req = {
      var rb = builderOf("software.amazon.awssdk.services.s3.model.GetObjectRequest")
      rb = call(rb, "bucket", b)
      rb = call(rb, "key", k)
      call(rb, "build")
    }
    try {
      val bytes = s3.getClass.getMethods
        .find(m => m.getName == "getObjectAsBytes" &&
          m.getParameterCount == 1 &&
          m.getParameterTypes()(0).getSimpleName == "GetObjectRequest")
        .getOrElse(throw new NoSuchMethodException("getObjectAsBytes"))
        .invoke(s3, req)
      val content = call(bytes, "asUtf8String").asInstanceOf[String]
      val etag = call(call(bytes, "response"), "eTag").asInstanceOf[String]
      Some(CasObject(content, etag))
    } catch {
      case e: java.lang.reflect.InvocationTargetException
          if e.getCause != null &&
            (e.getCause.getClass.getSimpleName == "NoSuchKeyException" ||
              statusCodeOf(e.getCause) == 404) => None
    }
  }

  def putIf(ptr: Path, content: String,
            expectEtag: Option[String]): Boolean = {
    val (b, k) = split(ptr)
    val req = {
      var rb = builderOf("software.amazon.awssdk.services.s3.model.PutObjectRequest")
      rb = call(rb, "bucket", b)
      rb = call(rb, "key", k)
      rb = expectEtag match {
        case Some(etag) => call(rb, "ifMatch", etag)
        case None => call(rb, "ifNoneMatch", "*")
      }
      call(rb, "build")
    }
    val body = cls("software.amazon.awssdk.core.sync.RequestBody")
      .getMethod("fromString", classOf[String]).invoke(null, content)
    try {
      s3.getClass.getMethods.find(m => m.getName == "putObject" &&
        m.getParameterCount == 2 &&
        m.getParameterTypes()(1).getSimpleName == "RequestBody")
        .getOrElse(throw new NoSuchMethodException("putObject"))
        .invoke(s3, req, body)
      true
    } catch {
      case e: java.lang.reflect.InvocationTargetException
          if statusCodeOf(e.getCause) == 412 => false
    }
  }
}
