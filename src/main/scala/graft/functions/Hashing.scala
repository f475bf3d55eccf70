package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Chunk-hash projection (SURVEY §2.2 P1).
  *
  * The reference whitelists two digest algorithms — `md5` and `sha`
  * (= SHA-1) — with `sha` as the default and *silent fallback to the
  * default* for any unrecognized algorithm name
  * (reference: lib/deduplicator/hash.ex:12-27).
  *
  * We keep digests as lowercase hex strings end-to-end (Spark's `md5`/
  * `sha1` built-ins return hex); the reference stores raw digest bytes
  * (hash.ex:18-20), but hex-vs-raw is an internal representation choice —
  * the encoded file format never contains hashes (deduplicator.ex:186-190),
  * so parity is unaffected. Built-in expressions keep the hash inside
  * whole-stage codegen; no UDF.
  */
object Hashing {

  sealed abstract class Algorithm(val name: String) {
    /** Hex-digest column for a BinaryType or StringType input column. */
    def digest(c: Column): Column
    /** Digest length in hex chars (reference tracks byte size, hash.ex:22-24). */
    def hexLength: Int
  }

  case object Sha extends Algorithm("sha") {
    override def digest(c: Column): Column = sha1(c)
    override def hexLength: Int = 40
  }

  case object Md5 extends Algorithm("md5") {
    override def digest(c: Column): Column = md5(c)
    override def hexLength: Int = 32
  }

  val default: Algorithm = Sha // hash.ex:15 (@default_algorithm :sha)

  /** Resolve an algorithm name; unknown names fall back to the default,
    * mirroring hash.ex:26-27 (`if algorithm in @availiable_algorithms`).
    */
  def resolve(name: String): Algorithm = name match {
    case "md5"         => Md5
    case "sha" | "sha1" => Sha
    case _             => default
  }
}
