package graft.ext

import graft.SparkFunSuite
import org.apache.hadoop.fs.{FileSystem, Path, RawLocalFileSystem}

/** r17 verdict ask #1: the atomic-create requirement is ENFORCED per
  * filesystem scheme, not documented. `createExclusive` trusts
  * `fs.create(p, overwrite = false)` on non-`file` schemes, but on
  * object stores that call is exists-then-put — the SAME check-then-act
  * double-writer race r17 proved is real on the local scheme. So
  * `withLock` must refuse, loudly and at the FIRST acquire, any scheme
  * outside the allowlist (`file` via O_EXCL, HDFS family via the
  * namenode CAS) unless the operator explicitly opted in.
  *
  * The simulated store here is the honest shape of the hazard: a
  * RawLocalFileSystem re-registered under a foreign scheme — Hadoop's
  * local `create(overwrite=false)` IS exists-then-open (the r17 find),
  * so this wrapper is literally a non-atomic-create filesystem, not a
  * mock of one.
  */
class LockSchemeGateSpec extends SparkFunSuite {

  private def conf = spark.sparkContext.hadoopConfiguration

  private def registerScheme(scheme: String, impl: Class[_]): Unit = {
    conf.setClass(s"fs.$scheme.impl", impl, classOf[FileSystem])
    // the per-JVM FileSystem cache may hold a stale instance from an
    // earlier suite run — not in practice for these unique schemes,
    // but make the spec self-contained
    conf.setBoolean(s"fs.$scheme.impl.disable.cache", true)
  }

  test("withLock refuses a scheme without atomic create-if-absent at " +
    "the first acquire — loudly, before any sentinel is created") {
    registerScheme("mocknonatomic", classOf[NonAtomicStoreFs])
    val dir = tempDir("lsg-refuse")
    val uri = s"mocknonatomic://host$dir/index"
    val ex = intercept[WriterLock.UnsafeLockSchemeException](
      WriterLock.withLock(spark, uri, "appendProbe") {
        fail("the body must never run on an untrusted non-atomic scheme")
      })
    assert(ex.getMessage.contains("mocknonatomic"))
    assert(ex.getMessage.contains("trustSchemeAtomicCreate"))
    // refused BEFORE the first create: no sentinel residue at all
    val fs = new Path(uri).getFileSystem(conf)
    assert(!fs.exists(WriterLock.lockPath(new Path(uri))))
  }

  test("the explicit operator override lets the same scheme proceed, " +
    "and the full hold/release cycle works through the generic branch") {
    registerScheme("mocktrusted", classOf[TrustedStoreFs])
    val dir = tempDir("lsg-trust")
    val uri = s"mocktrusted://host$dir/index"
    // without the override: refused (per-scheme, not global)
    intercept[WriterLock.UnsafeLockSchemeException](
      WriterLock.withLock(spark, uri, "pre") { () })
    WriterLock.trustSchemeAtomicCreate("mocktrusted")
    val got = WriterLock.withLock(spark, uri, "post") {
      assert(WriterLock.isLocked(spark, uri))
      42
    }
    assert(got == 42)
    assert(!WriterLock.isLocked(spark, uri))
    // and a second writer still loses loudly while a lock is held
    WriterLock.withLock(spark, uri, "holder") {
      val loser = new Thread(() =>
        try WriterLock.withLock(spark, uri, "loser") { fail("won") }
        catch { case _: WriterLock.ConcurrentWriterException => () })
      loser.start(); loser.join(30000)
      assert(!loser.isAlive)
    }
  }

  test("a filesystem whose getScheme THROWS (the FileSystem base " +
    "implementation) resolves through the URI instead of crashing — " +
    "the refusal stays loud and typed, never an " +
    "UnsupportedOperationException escaping acquire") {
    registerScheme("mockthrowing", classOf[SchemeThrowingFs])
    val dir = tempDir("lsg-throw")
    val uri = s"mockthrowing://host$dir/index"
    val fs = new Path(uri).getFileSystem(conf)
    // the probe itself is total
    assert(WriterLock.schemeOf(fs).contains("mockthrowing"))
    val ex = intercept[WriterLock.UnsafeLockSchemeException](
      WriterLock.withLock(spark, uri, "schemeProbe") { () })
    assert(ex.getMessage.contains("mockthrowing"))
  }

  test("per-store trust (r18 verdict ask #1): trusting authority A does " +
    "not admit authority B on the same scheme") {
    registerScheme("mockauthed", classOf[AuthedStoreFs])
    val dir = tempDir("lsg-authed")
    val a = s"mockauthed://bucket-a$dir/index-a"
    val b = s"mockauthed://bucket-b$dir/index-b"
    // untrusted: both stores refused
    intercept[WriterLock.UnsafeLockSchemeException](
      WriterLock.withLock(spark, a, "preA") { fail("ran untrusted") })
    WriterLock.trustStoreAtomicCreate("mockauthed://bucket-a")
    // the trusted store proceeds through the full hold/release cycle
    val got = WriterLock.withLock(spark, a, "postA") {
      assert(WriterLock.isLocked(spark, a))
      7
    }
    assert(got == 7)
    assert(!WriterLock.isLocked(spark, a))
    // authority B on the SAME scheme stays refused — the opt-in is
    // scoped to the store, not JVM-global per scheme (the exact
    // cross-tenant re-admission shape the r18 verdict flagged)
    val ex = intercept[WriterLock.UnsafeLockSchemeException](
      WriterLock.withLock(spark, b, "postB") {
        fail("authority A's opt-in admitted authority B")
      })
    assert(ex.getMessage.contains("mockauthed://bucket-b"))
    assert(ex.getMessage.contains("trustStoreAtomicCreate"))
    // refused before any sentinel was created on B
    val fsB = new Path(b).getFileSystem(conf)
    assert(!fsB.exists(WriterLock.lockPath(new Path(b))))
  }

  test("per-job Configuration trust: a graft.lock.trustedStores entry " +
    "admits exactly that store through the Configuration-based " +
    "withLock, without leaking into the JVM-global registry") {
    registerScheme("mockconfed", classOf[ConfedStoreFs])
    val dir = tempDir("lsg-conf")
    val uriC = s"mockconfed://bucket-c$dir/index-c"
    val uriD = s"mockconfed://bucket-d$dir/index-d"
    // session conf carries no trust: refused
    intercept[WriterLock.UnsafeLockSchemeException](
      WriterLock.withLock(spark, uriC, "pre") { fail("ran untrusted") })
    // a per-job conf carrying the key admits exactly that store
    val jobConf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    jobConf.set(WriterLock.TrustedStoresKey,
      " mockconfed://bucket-c , otherscheme://x ")
    var ran = false
    WriterLock.withLock(jobConf, uriC, "confTrusted", null) { ran = true }
    assert(ran)
    assert(!WriterLock.isLocked(spark, uriC))
    // a different authority under the SAME job conf stays refused
    intercept[WriterLock.UnsafeLockSchemeException](
      WriterLock.withLock(jobConf, uriD, "otherAuth", null) {
        fail("conf trust for bucket-c admitted bucket-d")
      })
    // and the conf-scoped trust did not leak JVM-globally: the same
    // store through a trustless conf is refused again
    intercept[WriterLock.UnsafeLockSchemeException](
      WriterLock.withLock(spark, uriC, "post") { fail("trust leaked") })
  }

  test("the local and HDFS-family schemes are allowlisted; unknown " +
    "spellings are refused case-insensitively") {
    // local: every other suite exercises this daily — pin it anyway
    val dir = tempDir("lsg-local")
    WriterLock.withLock(spark, dir, "localOk") { () }
    assert(!WriterLock.isLocked(spark, dir))
    // trust registration is case-insensitive
    registerScheme("mockcased", classOf[CasedStoreFs])
    val uri = s"mockcased://host$dir/index2"
    intercept[WriterLock.UnsafeLockSchemeException](
      WriterLock.withLock(spark, uri, "cased") { () })
    WriterLock.trustSchemeAtomicCreate("MOCKCASED")
    WriterLock.withLock(spark, uri, "casedOk") { () }
    assert(!WriterLock.isLocked(spark, uri))
  }
}

/** A real filesystem whose `create(overwrite=false)` is exists-then-open
  * — RawLocalFileSystem verbatim, under a scheme the allowlist doesn't
  * know. (`getUri` must carry the foreign scheme or path qualification
  * would rewrite the paths back to `file:`.)
  */
class NonAtomicStoreFs extends RawLocalFileSystem {
  override def getScheme: String = "mocknonatomic"
  override def getUri: java.net.URI = java.net.URI.create("mocknonatomic://host/")
}

class TrustedStoreFs extends RawLocalFileSystem {
  override def getScheme: String = "mocktrusted"
  override def getUri: java.net.URI = java.net.URI.create("mocktrusted://host/")
}

class CasedStoreFs extends RawLocalFileSystem {
  override def getScheme: String = "mockcased"
  override def getUri: java.net.URI = java.net.URI.create("mockcased://host/")
}

/** Like the other mocks but the AUTHORITY follows the initialized URI
  * instead of being hardcoded — so two paths `scheme://bucket-a/...`
  * and `scheme://bucket-b/...` resolve (cache disabled) to two
  * instances reporting different stores on one scheme, the shape the
  * per-store trust scoping is about.
  */
abstract class AuthorityCapturingFs(scheme: String) extends RawLocalFileSystem {
  private var myUri: java.net.URI = null
  override def initialize(uri: java.net.URI,
                          conf: org.apache.hadoop.conf.Configuration): Unit = {
    super.initialize(uri, conf)
    myUri = java.net.URI.create(
      s"$scheme://${Option(uri.getAuthority).getOrElse("")}/")
  }
  override def getScheme: String = scheme
  // null-safe on BOTH fields: the RawLocalFileSystem constructor calls
  // getUri (via getInitialWorkingDirectory) before this subclass's
  // constructor params/fields are assigned
  override def getUri: java.net.URI =
    if (myUri != null) myUri
    else java.net.URI.create(
      s"${if (scheme != null) scheme else "file"}:///")
}
class AuthedStoreFs extends AuthorityCapturingFs("mockauthed")
class ConfedStoreFs extends AuthorityCapturingFs("mockconfed")

/** The r17 advisor's crash shape: a filesystem that does NOT override
  * `getScheme` (the FileSystem base implementation throws
  * UnsupportedOperationException) — the scheme must resolve through
  * `getUri` instead.
  */
class SchemeThrowingFs extends RawLocalFileSystem {
  override def getScheme: String =
    throw new UnsupportedOperationException("not implemented, like the " +
      "FileSystem base class")
  override def getUri: java.net.URI = java.net.URI.create("mockthrowing://host/")
}
