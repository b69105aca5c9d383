package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed storage layout: pay one shuffle at WRITE time, then run every
  * subsequent join / aggregation on the bucket key with ZERO exchange.
  *
  * At pipeline scale the same key joins recur for the life of a corpus —
  * docs⋈embeddings, docs⋈scores, docs⋈dedup-verdicts — and a sort-merge
  * join between two unbucketed 100 TB tables shuffles BOTH sides every
  * time. Writing each table `bucketBy(n, key).sortBy(key)` makes the
  * layout itself carry the partitioning: Spark records the bucket spec in
  * the catalog, the scan reports `outputPartitioning = HashPartitioning(
  * key, n)` / `outputOrdering = key`, and `EnsureRequirements` inserts no
  * Exchange and no Sort for any join or hash-aggregate keyed on `key`
  * (when both sides share the bucket count). One shuffle amortized over
  * every future read — the classic write-once/join-forever trade.
  *
  * This is the storage analog of [[graft.ext.Pipeline.zorderBy]] (which
  * optimizes SKIPPING; this optimizes JOIN LOCALITY) — the two compose:
  * bucket by join key, z-order within buckets via `sortBy`.
  */
object Layout {

  private val TableName = "^[A-Za-z_][A-Za-z0-9_]*$".r

  /** Write `df` as a bucketed+sorted parquet table at `path`, registered
    * in the session catalog as `table` (external, so the data outlives
    * the catalog entry and the path is explicit for downstream readers).
    * `keyCols.head` is the bucket key; all `keyCols` sort each bucket
    * file, so merge joins read presorted runs straight off parquet.
    */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    keyCols: Seq[String], buckets: Int): Unit = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    require(keyCols.nonEmpty, "at least one key column required")
    require(TableName.matches(table), s"invalid table name '$table'")
    // repartition on the bucket key first: task hash == bucket hash
    // (both Murmur3 mod n), so each task holds exactly one bucket and
    // each bucket lands in ONE file — no small-file explosion (an
    // unaligned writer emits up to tasks×buckets files).
    df.repartition(buckets, df.col(keyCols.head))
      .write.mode("overwrite").option("path", path)
      .bucketBy(buckets, keyCols.head, keyCols.tail: _*)
      .sortBy(keyCols.head, keyCols.tail: _*)
      .format("parquet").saveAsTable(table)
  }

  /** Join two co-bucketed tables on `on` with no shuffle. The `merge`
    * hint pins sort-merge (a broadcast would also be shuffle-free but
    * wouldn't exercise the layout — and at 100 TB neither side
    * broadcasts); the bucket spec supplies the partitioning, so the plan
    * is scan→scan→SortMergeJoin with ZERO Exchange (pinned by spec).
    * Spark 4 no longer propagates `sortBy` ordering out of bucketed
    * scans, so a per-partition Sort node remains — but it sorts already-
    * sorted single-bucket runs in place, with no shuffle; the `sortBy`
    * still buys min/max row-group skipping and run-length-friendly
    * compression. Callers who prefer broadcast for a genuinely small
    * side should just `join` — this entry point is for the big⋈big case
    * the layout exists to serve.
    */
  def coLocatedJoin(spark: SparkSession, left: String, right: String,
                    on: Seq[String], joinType: String = "inner"): DataFrame =
    spark.table(left).hint("merge")
      .join(spark.table(right).hint("merge"), on, joinType)

  /** Hash aggregate over the bucket key with no exchange: the scan's
    * HashPartitioning already satisfies the aggregate's distribution, so
    * partial and final merge in one stage. `exprs` are SQL aggregate
    * expressions evaluated per group (trusted caller strings, same
    * contract as `DataFrame.selectExpr`).
    */
  def coLocatedAgg(spark: SparkSession, table: String, keyCols: Seq[String],
                   exprs: Seq[String]): DataFrame = {
    val df = spark.table(table)
    df.groupBy(keyCols.map(df.col): _*)
      .agg(org.apache.spark.sql.functions.expr(exprs.head),
        exprs.tail.map(org.apache.spark.sql.functions.expr): _*)
  }
}
