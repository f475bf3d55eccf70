package graft.ext

/** Scratch probe: Hamming distance between the pHash (and aHash/dHash)
  * of an original synthetic PNG and its tweakMod-perturbed partner —
  * feasibility check for the q148 planted-pair recall design.
  * Run: sbt "Test/runMain graft.ext.PHashTweakProbe"
  */
object PHashTweakProbe {
  def main(args: Array[String]): Unit = {
    
    var within = 0
    for (tm <- Seq(3, 5, 7, 11); id <- 0 until 60) {
      val w = 30 + (id % 5) * 7
      val h = 26 + (id % 3) * 9
      val a = graft.ext.Multimodal.imageHashesBytes(
        graft.ext.Multimodal.syntheticGrayPng(w, h, id.toLong))
      val b = graft.ext.Multimodal.imageHashesBytes(
        graft.ext.Multimodal.syntheticGrayPng(w, h, id.toLong, tweakMod = tm))
      (a, b) match {
        case (Right((_, _, ah1, dh1, ph1)), Right((_, _, ah2, dh2, ph2))) =>
          val dp = java.lang.Long.bitCount(ph1 ^ ph2)
          val da = java.lang.Long.bitCount(ah1 ^ ah2)
          val dd = java.lang.Long.bitCount(dh1 ^ dh2)
          if (dp <= 3) within += 1
          if (dp > 0) println(s"tm=$tm id=$id phash=$dp ahash=$da dhash=$dd")
        case other => println(s"id=$id decode failure: $other")
      }
    }
    println(s"within-3 pHash pairs: $within / 60")
  }
}
