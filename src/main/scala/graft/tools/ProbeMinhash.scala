package graft.tools

import graft.functions.{HashFunctions, TextFunctions}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: why does LSH miss the (d1,d2) 0.83-jaccard pair? */
object ProbeMinhash {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = Seq(
      "d1" -> "the quick brown fox jumps over the lazy dog near the river bank",
      "d2" -> "the quick brown fox jumps over the lazy dog near the river shore"
    ).toDF("id", "content")

    val sigs = docs.select($"id",
        TextFunctions.shingles(TextFunctions.tokens($"content"), 3).as("sh"))
      .withColumn("sig", HashFunctions.minHashSignature($"sh", 128))
    val rows = sigs.select("id", "sig").collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val s1 = rows("d1"); val s2 = rows("d2")
    val agree = s1.zip(s2).count { case (a, b) => a == b }
    println(s"PROBE sig agree = $agree / 128 (expect ~106 for j=0.83)")
    println(s"PROBE sig head d1 = ${s1.take(5)}")
    println(s"PROBE sig head d2 = ${s2.take(5)}")

    val hashed = docs.select($"id",
        transform(TextFunctions.shingles(TextFunctions.tokens($"content"), 3),
          s => xxhash64(s)).as("hs"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSet).toMap
    val common = hashed("d1").intersect(hashed("d2"))
    println(s"PROBE shingle hashes: |d1|=${hashed("d1").size} |d2|=${hashed("d2").size} common=${common.size} (expect 11/11/10)")
    // scala-side re-simulation of the perm/min logic on the collected hashes
    val P = (1L << 31) - 1
    val rnd = new java.util.Random(42L)
    val coeffs = Array.fill(128) {
      val a = 1L + math.floorMod(rnd.nextLong(), P - 1)
      val b = math.floorMod(rnd.nextLong(), P)
      (a, b)
    }
    def sig(hs: Set[Long]) = coeffs.map { case (a, b) =>
      hs.map(x => (a * ((x & 0x7FFFFFFFFFFFFFFFL) % P) + b) % P).min }
    val simAgree = sig(hashed("d1")).zip(sig(hashed("d2"))).count { case (a, b) => a == b }
    println(s"PROBE scala-side sim agree = $simAgree / 128")

    // band hashes
    val bandHashes = transform(
      sequence(lit(0), lit(31)),
      j => xxhash64(concat_ws(",", slice(col("sig"), j * 4 + 1, lit(4))), j))
    val banded = sigs.select($"id", posexplode(bandHashes).as(Seq("band", "bh")))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val b1 = banded.filter(_._1 == "d1").map(x => (x._2, x._3)).toMap
    val b2 = banded.filter(_._1 == "d2").map(x => (x._2, x._3)).toMap
    val bandAgree = (0 until 32).count(i => b1(i) == b2(i))
    println(s"PROBE band agree = $bandAgree / 32 (expect ~15)")
    spark.stop()
  }
}
