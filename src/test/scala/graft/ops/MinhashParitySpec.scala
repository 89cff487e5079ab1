package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Bit-parity of the portable (sha256-hex) minhash signature against a plain
  * Scala reimplementation — guards the nested-HOF expression structure.
  */
class MinhashParitySpec extends SparkSuite {
  import spark.implicits._

  private def shaHex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString
  }

  /** h_i(s) = 8-hex window i of sha256(s) ‖ sha256(s + "#") ‖ … — must track
    * DedupOps.minhashSignature(portable = true) exactly.
    */
  private def windowHash(s: String, i: Int): String = {
    val digest = shaHex(if (i / 8 == 0) s else s + ("#" * (i / 8)))
    digest.substring((i % 8) * 8, (i % 8) * 8 + 8)
  }

  private def expectedSig(text: String, k: Int, n: Int): Seq[String] = {
    val ws = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
    val nWin = math.max(ws.size - (k - 1), 1)
    val sh = (0 until nWin).map(i => ws.slice(i, i + k).mkString(" ")).distinct
    (0 until n).map(i => sh.map(s => windowHash(s, i)).min)
  }

  test("single-shingle portable signature components (separator is a real space)") {
    val df = Seq(Tuple1("alpha beta gamma")).toDF("text") // exactly one shingle
    val sh = df.select(TextOps.shingles(col("text"), 3).as("s")).as[Seq[String]].head()
    assert(sh === Seq("alpha beta gamma"),
      sh.map(s => s.getBytes("UTF-8").map("%02x".format(_)).mkString).toString)
    val sig = df.select(DedupOps.minhashSignature(col("text"), 3, 4, portable = true).as("g"))
      .as[Seq[String]].head()
    val want = (0 until 4).map(i => windowHash("alpha beta gamma", i))
    assert(sig === want, s"got $sig want $want")
  }

  test("portable fingerprint (hash-once-per-window) matches a plain-Scala oracle; Df variant agrees") {
    val k = 4
    def expected(text: String): Option[String] = {
      val ws = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
      if (ws.size < k) None
      else {
        val hs = ws.map(w => shaHex(w).take(16))
        Some((0 to ws.size - k).map(i => shaHex(hs.slice(i, i + k).mkString("")).take(16)).min)
      }
    }
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog and runs far away home",
      "alpha beta gamma delta",
      "too few tokens") // < k → null
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val colApi = df.select(col("doc_id"),
      TextOps.fingerprintPortable(col("text"), k).as("fp"))
      .as[(Long, Option[String])].collect().toMap
    val dfApi = TextOps.fingerprintDf(df, "text", "fp", k, portable = true)
      .select("doc_id", "fp").as[(Long, Option[String])].collect().toMap
    for ((t, i) <- texts.zipWithIndex) {
      assert(colApi(i.toLong) === expected(t), s"doc $i column API")
      assert(dfApi(i.toLong) === expected(t), s"doc $i DataFrame API")
    }
  }

  test("portable minhash signature matches a plain-Scala oracle") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog and runs far away home",
      "spark engines shuffle data between executors for wide dependencies and joins",
      "a b c d e f g h i j k l m n o p q r s t u v w x y z")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
      DedupOps.minhashSignature(col("text"), 3, 32, portable = true).as("sig"))
      .as[(Long, Seq[String])].collect().toMap
    for ((t, i) <- texts.zipWithIndex) {
      val want = expectedSig(t, 3, 32)
      assert(got(i.toLong) === want, s"doc $i signature mismatch")
    }
  }
}
