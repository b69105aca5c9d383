package graft.api

import graft.exec._
import graft.index.{PostingsIndex, Stores}
import graft.model._
import graft.parse.QueryParser
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Batch embedding callback — the reference's single UDF surface
  * (src/sifts/core.py:90: `embedding_function: list[str] -> list[vector]`,
  * invoked batch-wise at core.py:211, 518, 644). Runs executor-side via
  * `mapPartitions`, one call per partition batch — preserving the batching
  * contract that real embedding models need.
  */
trait Embedder extends Serializable {
  def embed(texts: Seq[String]): Seq[Array[Float]]
}

private[graft] case class AddRow(id: String, content: String,
                                 metadata: Map[String, String], pos: Long)
private[graft] case class DocRow(id: String, content: String,
                                 metadata: Map[String, String], embedding: Array[Float])

/** A named logical namespace of documents over Parquet stores — the
  * Spark-native `Collection` (reference src/sifts/core.py:70-400).
  *
  * Physical layout: all collections of one `root` share the same three stores
  * (docs / postings / collstats), discriminated by a `collection=` partition
  * directory — partition pruning replaces the reference's btree on `name`
  * (core.py:112). Mutations rewrite one partition (write-temp + swap).
  */
final class Collection private (
    val spark: SparkSession,
    val root: String,
    val name: String,
    val embedder: Option[Embedder],
    val useFts: Boolean) {

  import spark.implicits._

  private val docsDir = Stores.docsDir(root)
  private val postingsDir = Stores.postingsDir(root)
  private val statsDir = Stores.collStatsDir(root)

  /** This collection's documents (partition-pruned read). */
  def docs(): DataFrame = Stores.readPartition(spark, docsDir, name, Stores.docsSchema)

  private def postings(): DataFrame =
    Stores.readPartition(spark, postingsDir, name, Stores.postingsSchema)

  private def collStats(): DataFrame = {
    val df = Stores.readPartition(spark, statsDir, name, Stores.collStatsSchema)
    if (df.isEmpty) spark.sql("SELECT CAST(0 AS LONG) n_docs, CAST(0.0 AS DOUBLE) avg_dl")
    else df
  }

  /** Scalar doc count of this collection (reference core.py:125-138). */
  def count(): Long = docs().count()

  // -------------------------------------------------------------------------
  // Write path (reference S3-S6: core.py:140-188, 484-525, 634-691)
  // -------------------------------------------------------------------------

  /** Batch upsert. Missing ids get UUIDv4 (core.py:147-150); within one batch
    * and against the base, the LAST write wins (ON CONFLICT(id) DO UPDATE,
    * core.py:496-499) — replicated with a row_number window keyed on id
    * ordered by batch position desc. Returns the ids.
    */
  def add(contents: Seq[String], ids: Option[Seq[String]] = None,
          metadatas: Option[Seq[Map[String, String]]] = None): Seq[String] = {
    require(ids.forall(_.size == contents.size), "ids must match contents length")
    require(metadatas.forall(_.size == contents.size), "metadatas must match contents length")
    val allIds = ids.getOrElse(contents.map(_ => java.util.UUID.randomUUID().toString))
    val metas = metadatas.getOrElse(contents.map(_ => null: Map[String, String]))

    val rows = allIds.lazyZip(contents).lazyZip(metas).lazyZip(allIds.indices).map {
      case (id, c, m, i) => AddRow(id, c, m, i.toLong)
    }.toSeq
    val batchRaw = spark.createDataset(rows)

    // Embed executor-side, one Embedder.embed call per partition batch.
    val batchDocs: DataFrame = embedder match {
      case Some(emb) =>
        batchRaw.mapPartitions { it =>
          val part = it.toVector
          val vecs = if (part.isEmpty) Vector.empty else emb.embed(part.map(_.content))
          part.lazyZip(vecs).map((r, v) => (DocRow(r.id, r.content, r.metadata, v), r.pos)).iterator
        }.toDF("doc", "pos").select($"doc.*", $"pos")
      case None =>
        batchRaw.select($"id", $"content", $"metadata",
          lit(null).cast("array<float>").as("embedding"), $"pos")
    }

    // Intra-batch last-wins dedup.
    val w = Window.partitionBy($"id").orderBy($"pos".desc)
    val deduped = batchDocs
      .withColumn("__rn", row_number().over(w)).filter($"__rn" === 1)
      .select($"id", $"content", $"metadata", $"embedding".cast("array<float>"))

    // Upsert against base: keep base rows whose id is not in the batch.
    val batchIds = deduped.select("id")
    val merged = docs().join(broadcast(batchIds), Seq("id"), "left_anti")
      .unionByName(deduped)
    Stores.overwritePartition(spark, docsDir, name, merged)

    refreshIndexes(touchedIds = Some(allIds.distinct))
    allIds
  }

  /** Bulk DataFrame ingestion (new-scope S8 — the reference has no file
    * connectors). `df` must have columns id, content, metadata[, embedding].
    */
  def addDf(df: DataFrame): Unit = {
    var d = df
    if (!d.columns.contains("metadata"))
      d = d.withColumn("metadata", lit(null).cast("map<string,string>"))
    if (!d.columns.contains("embedding")) {
      d = embedder match {
        case Some(emb) =>
          d.select($"id", $"content", $"metadata").as[(String, String, Map[String, String])]
            .mapPartitions { it =>
              val part = it.toVector
              val vecs = if (part.isEmpty) Vector.empty else emb.embed(part.map(_._2))
              part.lazyZip(vecs).map((r, v) => DocRow(r._1, r._2, r._3, v)).iterator
            }.toDF()
        case None => d.withColumn("embedding", lit(null).cast("array<float>"))
      }
    }
    d = d.select($"id".cast("string"), $"content".cast("string"),
      $"metadata".cast("map<string,string>"), $"embedding".cast("array<float>"))
    val merged = docs().join(d.select("id"), Seq("id"), "left_anti").unionByName(d)
    Stores.overwritePartition(spark, docsDir, name, merged)
    refreshIndexes(touchedIds = None)
  }

  /** `update` = `add` with mandatory ids (reference core.py:173-182). */
  def update(ids: Seq[String], contents: Seq[String],
             metadatas: Option[Seq[Map[String, String]]] = None): Seq[String] = {
    require(ids.nonEmpty && !ids.contains(null), "update requires non-null ids")
    add(contents, Some(ids), metadatas)
  }

  /** Delete by id — deliberately CROSS-collection, matching the reference's
    * un-scoped `DELETE … WHERE id IN (…)` (core.py:184-188, SURVEY §2 S5).
    */
  def delete(ids: Seq[String]): Unit = {
    val idSeq = ids.filter(_ != null)
    if (idSeq.isEmpty) return
    Stores.collections(spark, docsDir).foreach { coll =>
      val base = Stores.readPartition(spark, docsDir, coll, Stores.docsSchema)
      val remaining = base.filter(!$"id".isin(idSeq: _*))
      Stores.overwritePartition(spark, docsDir, coll, remaining)
      val self = new Collection(spark, root, coll, None, useFts)
      self.refreshIndexes(touchedIds = Some(idSeq))
    }
  }

  /** Drop every doc of THIS collection (reference core.py:386-400) — a
    * partition drop, no data rewrite.
    */
  def deleteAll(): Unit = {
    Stores.dropPartition(spark, docsDir, name)
    Stores.dropPartition(spark, postingsDir, name)
    Stores.dropPartition(spark, statsDir, name)
  }

  /** Rebuild this collection's postings + stats. Delta when `touchedIds` is
    * given: untouched docs keep their postings rows (anti-join), only the
    * touched ids re-tokenize — the Spark analogue of the reference's
    * delete-stale-then-insert FTS maintenance (core.py:505-514).
    */
  private def refreshIndexes(touchedIds: Option[Seq[String]]): Unit = {
    if (useFts) {
      val current = docs()
      val fresh = touchedIds match {
        case Some(idSeq) if idSeq.nonEmpty =>
          val old = postings().filter(!$"id".isin(idSeq: _*))
          old.unionByName(PostingsIndex.build(current.filter($"id".isin(idSeq: _*))))
        case _ => PostingsIndex.build(current)
      }
      Stores.overwritePartition(spark, postingsDir, name, fresh, sortBy = Seq("term"))
    }
    Stores.overwritePartition(spark, statsDir, name, PostingsIndex.buildCollStats(docs()))
  }

  // -------------------------------------------------------------------------
  // Read path (reference core.py:190-384)
  // -------------------------------------------------------------------------

  /** Full query pipeline. Empty `query` = scan (`get`, core.py:370-384).
    * `limit=0` means unlimited (core.py:327-333). `total` is always the true
    * pre-limit match count (SURVEY §7.4 decision — the SQLite-vector
    * behavior; the PG offset-past-end `total=0` quirk is not replicated).
    */
  def query(query: String = "", limit: Int = 0, offset: Int = 0,
            where: Map[String, Any] = Map.empty, orderBy: Seq[String] = Nil,
            vectorSearch: Boolean = false): QueryResult = {
    if (vectorSearch && orderBy.nonEmpty)
      throw new IllegalArgumentException("Cannot use order_by with vector search.")
    if (vectorSearch && embedder.isEmpty)
      throw new IllegalArgumentException("Vector search requires an embedding function.")
    val ast = QueryParser.parse(query)
    if (ast.nonEmpty && !vectorSearch && !useFts)
      throw new IllegalArgumentException("This collection does not support full-text search.")

    val filtered = applyWhere(docs(), where)

    if (vectorSearch) {
      val qvec = embedder.get.embed(Seq(query)).head.toSeq
      val scored = VectorSearch.scored(filtered, "embedding", qvec)
      val total = scored.count()
      val page = Paginator(scored.orderBy($"rank".desc, $"id".asc), limit, offset)
      QueryResult(total, collectHits(page, withRank = true))
    } else ast match {
      case Some(q) =>
        val ids = FtsEval.matchingIds(postings(), q)
        val matched = filtered.join(broadcast(ids), Seq("id"))
        val ranked = matched
          .join(Bm25.scores(postings(), collStats(), q), Seq("id"), "left")
          .withColumn("rank", coalesce($"rank", lit(0.0)))
        val total = ranked.count()
        val ordered =
          if (orderBy.nonEmpty) Sorter(ranked, $"metadata", orderBy.map(SortKey.parse), Seq($"id".asc))
          else ranked.orderBy($"rank".desc, $"id".asc) // deterministic; reference leaves it storage-ordered (SURVEY §7.4)
        QueryResult(total, collectHits(Paginator(ordered, limit, offset), withRank = true))
      case None =>
        val total = filtered.count()
        val ordered =
          if (orderBy.nonEmpty) Sorter(filtered, $"metadata", orderBy.map(SortKey.parse), Seq($"id".asc))
          else filtered.orderBy($"id".asc)
        QueryResult(total, collectHits(Paginator(ordered, limit, offset), withRank = false))
    }
  }

  /** Scan without search (reference `get`, core.py:370-384). */
  def get(limit: Int = 0, offset: Int = 0, where: Map[String, Any] = Map.empty,
          orderBy: Seq[String] = Nil): QueryResult =
    query("", limit, offset, where, orderBy)

  private def applyWhere(df: DataFrame, where: Map[String, Any]): DataFrame = {
    val ops: Seq[(String, WhereOp)] = where.toSeq.flatMap {
      case (k, m: Map[_, _]) =>
        WhereOp.fromMap(m.asInstanceOf[Map[String, Any]]).map(k -> _)
      case (k, v) => Seq(k -> WhereOp.Eq(WhereVal(v)))
    }
    MetaFilter.combined($"metadata", ops).map(df.filter).getOrElse(df)
  }

  private def collectHits(df: DataFrame, withRank: Boolean): Seq[SearchHit] =
    df.select($"id", $"content", $"metadata",
        (if (withRank) $"rank" else lit(null).cast("double")).as("rank"))
      .collect().toSeq.map { r: Row =>
        SearchHit(r.getString(0), r.getString(1),
          Option(r.getMap[String, String](2)).map(_.toMap).orNull,
          if (withRank && !r.isNullAt(3)) Some(r.getDouble(3)) else None)
      }
}

object Collection {
  /** Valid collection names, same charset as the reference (core.py:94-97). */
  private val NamePattern = "[-a-zA-Z0-9_\\+~#=/]+".r

  /** Open (or lazily create) a collection under `root` — the analogue of the
    * `Collection()` factory + `create_tables` (core.py:714-737, 108-115).
    */
  def apply(spark: SparkSession, root: String, name: String,
            embedder: Option[Embedder] = None, useFts: Boolean = true): Collection = {
    require(name != null && NamePattern.matches(name),
      s"Invalid collection name: '$name'. Only letters, numbers, and -_+~#=/ are allowed.")
    new Collection(spark, root, name, embedder, useFts)
  }
}
