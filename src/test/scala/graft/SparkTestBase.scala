package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local SparkSession for the whole test JVM. */
object SparkTestBase {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.functions.VecExpressions.register(s)
    s
  }
}

abstract class SparkFunSuite extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestBase.spark

  def tempDir(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix)
    d.toFile.deleteOnExit()
    d.toString
  }
}

/** Deterministic stand-ins for the reference's test resources
  * (FIXTURES.md §A: natural text / aligned-duplicate text / structured
  * binary / high-entropy binary).
  */
object Fixtures {
  private val words = Vector("spark", "chunk", "dedup", "hash", "catalog",
    "stream", "байт", "данные", "file", "pointer", "merge", "window")

  def naturalText(seed: Long = 1, approxBytes: Int = 6400): Array[Byte] = {
    val rnd = new scala.util.Random(seed)
    val sb = new StringBuilder
    while (sb.length < approxBytes) sb.append(words(rnd.nextInt(words.size))).append(' ')
    sb.toString.getBytes("UTF-8")
  }

  /** k-byte-aligned repeated blocks — guaranteed dedup hits
    * (≙ text_64_byte_duplicated.txt).
    */
  def alignedDuplicated(k: Int = 64, blocks: Int = 4096, distinct: Int = 37,
                        seed: Long = 2): Array[Byte] = {
    val rnd = new scala.util.Random(seed)
    val pool = Array.fill(distinct) {
      val b = new Array[Byte](k); rnd.nextBytes(b)
      // keep it text-ish: printable ASCII
      b.map(x => (33 + (x & 0x3f)).toByte)
    }
    val out = new java.io.ByteArrayOutputStream()
    (0 until blocks).foreach(_ => out.write(pool(rnd.nextInt(distinct))))
    out.toByteArray
  }

  def structuredBinary(approxBytes: Int = 200000, seed: Long = 3): Array[Byte] = {
    val rnd = new scala.util.Random(seed)
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (out.size < approxBytes) {
      out.write(Array.tabulate(16)(j => ((i + j) % 251).toByte)) // headers repeat
      val payload = new Array[Byte](48); rnd.nextBytes(payload); out.write(payload)
      i += 1
    }
    out.toByteArray
  }

  def highEntropy(bytes: Int = 500000, seed: Long = 4): Array[Byte] = {
    val rnd = new scala.util.Random(seed)
    val b = new Array[Byte](bytes); rnd.nextBytes(b); b
  }

  def writeTemp(dir: String, name: String, bytes: Array[Byte]): String = {
    val p = java.nio.file.Paths.get(dir, name)
    java.nio.file.Files.write(p, bytes)
    p.toString
  }
}
