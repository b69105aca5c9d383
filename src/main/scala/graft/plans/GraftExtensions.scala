package graft.plans

import graft.ext.LshBuckets
import graft.functions._
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL surface for the engine's native expressions, registered through the
  * standard `SparkSessionExtensions` hook:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.plans.GraftExtensions …
  *   // or: SparkSession.builder().withExtensions(new GraftExtensions) …
  *   SELECT graft_cosine(a.embedding, b.embedding) FROM …
  * }}}
  *
  * For a session that already exists (notebooks, the driver harness),
  * [[GraftFunctions.register]] installs the same functions through the
  * session's function registry.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // cosine-top-k → ANN candidate rewrite (armed per-path via AnnCatalog)
    ext.injectOptimizerRule(session => AnnTopKRewrite(session))
  }
}

object GraftFunctions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(s"$what must be an INT literal, got $other")
  }
  private def longArg(e: Expression, what: String): Long = e match {
    case Literal(v: Long, _) => v
    case Literal(v: Int, _)  => v.toLong
    case other => throw new IllegalArgumentException(s"$what must be a BIGINT literal, got $other")
  }
  private def doubleArg(e: Expression, what: String): Double = e match {
    case Literal(v: Double, _) => v
    case other => throw new IllegalArgumentException(s"$what must be a DOUBLE literal, got $other")
  }

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "4.1.2", "", "scala_udf")

  /** (name, info, builder) for every SQL-exposed engine function. */
  val all: Seq[(String, ExpressionInfo, FunctionBuilder)] = Seq(
    ("graft_cosine",
      info("graft_cosine", "graft_cosine(a ARRAY<FLOAT>, b ARRAY<FLOAT>) - codegen'd cosine similarity"),
      (args: Seq[Expression]) => CosineSimilarity(args(0), args(1))),
    ("graft_dot",
      info("graft_dot", "graft_dot(a ARRAY<FLOAT>, b ARRAY<FLOAT>) - codegen'd dot product"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))),
    ("graft_simhash64",
      info("graft_simhash64", "graft_simhash64(tokens ARRAY<STRING>) - MD5-derived 64-bit SimHash"),
      (args: Seq[Expression]) => SimHash64(args(0))),
    ("graft_minhash",
      info("graft_minhash", "graft_minhash(hashes ARRAY<BIGINT>, numHashes INT[, seed BIGINT]) - MinHash signature"),
      (args: Seq[Expression]) => MinHashSignature(args(0), intArg(args(1), "numHashes"),
        if (args.size > 2) longArg(args(2), "seed") else 42L)),
    ("graft_shingles",
      info("graft_shingles", "graft_shingles(tokens ARRAY<STRING>, n INT) - distinct word n-gram shingles"),
      (args: Seq[Expression]) => ShingleArray(args(0), intArg(args(1), "n"))),
    ("graft_hash_prefix",
      info("graft_hash_prefix", "graft_hash_prefix(shingles ARRAY<STRING>, t DOUBLE) - prefix-filter probe set"),
      (args: Seq[Expression]) => HashPrefix(args(0), doubleArg(args(1), "t"))),
    ("graft_jaccard",
      info("graft_jaccard", "graft_jaccard(a ARRAY<STRING>, b ARRAY<STRING>) - set Jaccard similarity"),
      (args: Seq[Expression]) => JaccardSimilarity(args(0), args(1))),
    ("graft_lsh_buckets",
      info("graft_lsh_buckets", "graft_lsh_buckets(emb ARRAY<FLOAT>, tables INT, planes INT, dim INT[, seed BIGINT]) - hyperplane LSH buckets"),
      (args: Seq[Expression]) => LshBuckets(args(0), intArg(args(1), "tables"),
        intArg(args(2), "planes"), intArg(args(3), "dim"),
        if (args.size > 4) longArg(args(4), "seed") else 42L))
  )

  /** Install the functions into an EXISTING session (temp-function scope). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    all.foreach { case (name, _, builder) =>
      org.apache.spark.sql.graftbridge.Bridge.registerFunction(spark, name, builder)
    }
}
