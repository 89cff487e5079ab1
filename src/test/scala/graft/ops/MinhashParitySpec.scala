package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Bit-parity of the portable (sha256-hex) minhash signature against a plain
  * Scala reimplementation — guards the nested-HOF expression structure.
  */
class MinhashParitySpec extends SparkSuite {
  import spark.implicits._

  private def sha16(s: String): String = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString.take(16)
  }

  private def expectedSig(text: String, k: Int, n: Int): Seq[String] = {
    val ws = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
    val nWin = math.max(ws.size - (k - 1), 1)
    val sh = (0 until nWin).map(i => ws.slice(i, i + k).mkString(" ")).distinct
    val base = sh.map(sha16)
    (0 until n).map(i => base.map(b => sha16(s"$i:$b")).min)
  }

  test("single-shingle portable signature components (separator is a real space)") {
    val df = Seq(Tuple1("alpha beta gamma")).toDF("text") // exactly one shingle
    val sh = df.select(TextOps.shingles(col("text"), 3).as("s")).as[Seq[String]].head()
    assert(sh === Seq("alpha beta gamma"),
      sh.map(s => s.getBytes("UTF-8").map("%02x".format(_)).mkString).toString)
    val base = sha16("alpha beta gamma")
    val sig = df.select(DedupOps.minhashSignature(col("text"), 3, 4, portable = true).as("g"))
      .as[Seq[String]].head()
    val want = (0 until 4).map(i => sha16(s"$i:$base"))
    assert(sig === want, s"got $sig want $want base=$base")
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
