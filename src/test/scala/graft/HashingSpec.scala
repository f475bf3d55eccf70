package graft

import graft.functions.Hashing
import org.apache.spark.sql.functions._

class HashingSpec extends SparkFunSuite {

  test("sha/md5 digests match JDK reference values, hex lowercase") {
    val s = spark; import s.implicits._
    val data = "graft chunk".getBytes("UTF-8")
    val df = Seq(Tuple1(data)).toDF("chunk")
    def jdk(alg: String): String =
      java.security.MessageDigest.getInstance(alg).digest(data)
        .map("%02x".format(_)).mkString
    val sha = df.select(Hashing.Sha.digest(col("chunk"))).head().getString(0)
    val md5h = df.select(Hashing.Md5.digest(col("chunk"))).head().getString(0)
    assert(sha == jdk("SHA-1") && sha.length == Hashing.Sha.hexLength)
    assert(md5h == jdk("MD5") && md5h.length == Hashing.Md5.hexLength)
  }

  test("resolve: known names, sha1 alias, silent fallback for unknown (hash.ex:26-27)") {
    assert(Hashing.resolve("md5") == Hashing.Md5)
    assert(Hashing.resolve("sha") == Hashing.Sha)
    assert(Hashing.resolve("sha1") == Hashing.Sha)
    assert(Hashing.resolve("blake3-not-real") == Hashing.default)
    assert(Hashing.default == Hashing.Sha) // hash.ex:15
  }
}
