package graft.ext

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Temporal joins Spark's DataFrame API lacks as primitives: the as-of join
  * (each left row picks the single most recent right row at or before its
  * timestamp) and the bounded range join (each left row pairs with every
  * right row inside a trailing time window). Both are staples of event-log
  * feature engineering ("state as of the click", "clicks in the 30 minutes
  * before the purchase") and both have naive formulations — a θ-join on an
  * inequality — that Spark can only execute as a broadcast-nested-loop or a
  * cartesian product, which is a non-starter at 100 TB.
  *
  * The implementations here are shuffle-shaped instead:
  *
  *  - [[asofJoin]] is the union-and-carry-forward construction: tag both
  *    sides, union them, and run ONE running `last(..., ignoreNulls)` window
  *    per key ordered by time. One hash shuffle on the key, a streaming
  *    (incrementally-evaluated) window frame, no pair blow-up ever — the
  *    match is carried, not searched. This is the same plan a dedicated
  *    as-of operator (Flink temporal join, kdb aj) lowers to.
  *  - [[rangeJoin]] is the bucketed equi-join lowering: quantize time into
  *    `window`-sized buckets, join on (key, bucket) with the left side
  *    duplicated into the two buckets its trailing window can touch, then
  *    filter the exact range predicate. The inequality becomes an equality
  *    the hash-join machinery (and AQE) can plan; cost is 2× left-side
  *    shuffle mass instead of |left|×|right|.
  */
object Joins {

  /** As-of join: for every left row, the latest right row with
    * `right.ts <= left.ts` (strictly `<` when `strict = true`) within the
    * same `keys` group — LEFT OUTER semantics, unmatched left rows keep
    * NULL right columns. `direction = "forward"` flips the search: the
    * EARLIEST right row with `right.ts >= left.ts` ("next event after").
    * Right-side payload columns are emitted with the `rightPrefix` prefix;
    * the right event time is always emitted as `<rightPrefix><tsCol>`.
    *
    * Among right rows tied on the same (keys, ts) instant the LAST by
    * `tieCols` order wins (ascending; default: the payload columns in the
    * order given; forward direction keeps the same winner) — a pinned,
    * deterministic choice where a search-based as-of would be
    * storage-order-dependent.
    *
    * Scale: one shuffle of |left| + |right| skinny rows on `keys`, one
    * per-key sort, and a running `last` frame the window operator evaluates
    * incrementally — never a per-row backward scan. Key skew surfaces as
    * window-partition skew; mitigate upstream by salting only if one key
    * dominates (an as-of join is per-entity state tracking, so keys are
    * normally high-cardinality users/instruments).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               tsCol: String = "ts", rightPayload: Seq[String] = Seq.empty,
               rightPrefix: String = "r_", strict: Boolean = false,
               tieCols: Seq[String] = Seq.empty,
               direction: String = "backward"): DataFrame = {
    require(keys.nonEmpty, "keys must be non-empty")
    require(direction == "backward" || direction == "forward",
      s"direction must be 'backward' or 'forward': $direction")
    val payload =
      if (rightPayload.nonEmpty) rightPayload
      else right.columns.filterNot(c => keys.contains(c) || c == tsCol).toSeq
    require(payload.nonEmpty, "right side must carry at least one payload column")
    val ties = if (tieCols.nonEmpty) tieCols else payload

    // Left rows ride whole; right rows contribute (keys, ts, payload struct).
    // side orders right BEFORE left at an equal instant for the inclusive
    // join (<=) and AFTER it for the strict one (<), so the running last()
    // sees exactly the admissible prefix.
    val leftSide = if (strict) 0 else 1
    val l = left.select(
      keys.map(col) ++ Seq(
        col(tsCol).as("__ts"), lit(leftSide).as("__side"), lit(null).cast("string").as("__tie"),
        struct(left.columns.map(col): _*).as("__l"),
        lit(null).cast(structType(right, payload :+ tsCol)).as("__r")): _*)
    val r = right.select(
      keys.map(col) ++ Seq(
        col(tsCol).as("__ts"), lit(1 - leftSide).as("__side"),
        concat_ws("\u0000", ties.map(c => col(c).cast("string")): _*).as("__tie"),
        lit(null).cast(structType(left, left.columns.toSeq)).as("__l"),
        struct((payload :+ tsCol).map(col): _*).as("__r")): _*)

    // forward = the same running-carry construction scanned from the
    // future backwards: ts DESC makes "last right seen so far" = the
    // earliest right at-or-after the left row
    val tsOrd = if (direction == "backward") col("__ts").asc else col("__ts").desc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(tsOrd, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === leftSide && col("__l").isNotNull)

    val leftCols = left.columns.map(c => col("__l").getField(c).as(c))
    val rightCols = (payload :+ tsCol).map(c =>
      col("__match").getField(c).as(s"$rightPrefix$c"))
    carried.select(leftCols ++ rightCols: _*)
  }

  /** NEAREST as-of join: for every left row, the right row in the same
    * `keys` group whose event time is CLOSEST in either direction (kdb
    * `aj`-style nearest lookup — "the sensor reading nearest this event").
    * Equal distance breaks toward the PAST (backward wins — pinned);
    * among right rows tied on the same instant the last by `tieCols`
    * ascending wins, exactly like [[asofJoin]]. LEFT OUTER semantics;
    * `r_dir` reports 'backward'/'forward' (null when unmatched).
    *
    * Scale: the SAME union-and-carry construction as [[asofJoin]], with
    * BOTH carries computed over one hash shuffle — the ascending scan
    * carries the latest right at-or-before, the descending scan the
    * earliest at-or-after (two sorts, one exchange; Spark chains the two
    * window operators on the shared partitioning). No pair blow-up, no
    * nearest-neighbor search: the match is carried, then the closer of
    * two candidates is a per-row comparison.
    */
  def asofNearest(left: DataFrame, right: DataFrame, keys: Seq[String],
                  tsCol: String = "ts", rightPayload: Seq[String] = Seq.empty,
                  rightPrefix: String = "r_",
                  tieCols: Seq[String] = Seq.empty): DataFrame = {
    require(keys.nonEmpty, "keys must be non-empty")
    val payload =
      if (rightPayload.nonEmpty) rightPayload
      else right.columns.filterNot(c => keys.contains(c) || c == tsCol).toSeq
    require(payload.nonEmpty, "right side must carry at least one payload column")
    val ties = if (tieCols.nonEmpty) tieCols else payload
    // event time normalized to an exactly-representable micros LONG for
    // the distance compare (timestamp -> double drops sub-second precision)
    def tsNorm(c: Column, df: DataFrame): Column = df.schema(tsCol).dataType match {
      case _: org.apache.spark.sql.types.TimestampType => unix_micros(c)
      case org.apache.spark.sql.types.TimestampNTZType => unix_micros(c.cast("timestamp"))
      case _ => c.cast("long")
    }
    val rStructCols = (payload :+ tsCol).map(col) :+ tsNorm(col(tsCol), right).as("__tsn")
    val l = left.select(
      keys.map(col) ++ Seq(
        col(tsCol).as("__ts"), tsNorm(col(tsCol), left).as("__tsn"),
        lit(1).as("__side"), lit(null).cast("string").as("__tie"),
        struct(left.columns.map(col): _*).as("__l"),
        lit(null).cast(structType(right, payload :+ tsCol, withTsn = true)).as("__r")): _*)
    val r = right.select(
      keys.map(col) ++ Seq(
        col(tsCol).as("__ts"), tsNorm(col(tsCol), right).as("__tsn"),
        lit(0).as("__side"),
        concat_ws(" ", ties.map(c => col(c).cast("string")): _*).as("__tie"),
        lit(null).cast(structType(left, left.columns.toSeq)).as("__l"),
        struct(rStructCols: _*).as("__r")): _*)
    // right sorts BEFORE left at an equal instant in both scans (side 0 <
    // side 1 under __side.asc), so the same-instant right is admissible to
    // both carries — distance 0, backward wins the tie
    val wB = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").desc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .withColumn("__mb", last(col("__r"), ignoreNulls = true).over(wB))
      .withColumn("__mf", last(col("__r"), ignoreNulls = true).over(wF))
      .filter(col("__side") === 1 && col("__l").isNotNull)
    val dB = col("__tsn") - col("__mb").getField("__tsn")
    val dF = col("__mf").getField("__tsn") - col("__tsn")
    val useB = col("__mf").isNull || (col("__mb").isNotNull && dB <= dF)
    val chosen = when(useB, col("__mb")).otherwise(col("__mf"))
    val dir = when(col("__mb").isNull && col("__mf").isNull, lit(null).cast("string"))
      .otherwise(when(useB, lit("backward")).otherwise(lit("forward")))
    val leftCols = left.columns.map(c => col("__l").getField(c).as(c))
    val rightCols = (payload :+ tsCol).map(c =>
      chosen.getField(c).as(s"$rightPrefix$c"))
    carried.select(leftCols ++ rightCols :+ dir.as(s"${rightPrefix}dir"): _*)
  }

  /** Trailing-window range join: every (left, right) pair in the same
    * `keys` group with `left.ts - window <= right.ts <= left.ts` (strictly
    * `right.ts < left.ts` when `strict = true` — "events BEFORE the
    * outcome"). INNER semantics: left rows with an empty window emit
    * nothing. Right payload columns arrive `rightPrefix`-prefixed, plus
    * `<rightPrefix><tsCol>`.
    *
    * Scale: the inequality is lowered to an equi-join on (keys, bucket)
    * with bucket = floor(ts / window): a right row at bucket b can only
    * satisfy left rows in buckets b and b+1, so the LEFT side explodes
    * into exactly those two bucket keys (2× the skinny left mass — never
    * data-dependent) and the exact predicate filters inside the hash join.
    * Output size is the true pair count — inherent to the operator, not an
    * artifact of the plan.
    */
  def rangeJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                window: String, tsCol: String = "ts",
                rightPayload: Seq[String] = Seq.empty,
                rightPrefix: String = "r_", strict: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "keys must be non-empty")
    val winUs = windowMicros(window)
    require(winUs > 0, s"window must be a positive duration: $window")
    val payload =
      if (rightPayload.nonEmpty) rightPayload
      else right.columns.filterNot(c => keys.contains(c) || c == tsCol).toSeq

    val lb = WorkingColumns.fresh(left, "__bucket")
    val l = left
      .withColumn(lb, explode(array(
        floor(unix_micros(col(tsCol)) / winUs),
        floor(unix_micros(col(tsCol)) / winUs) - 1)))
    val r = right.select(
      keys.map(col) ++ Seq(floor(unix_micros(col(tsCol)) / winUs).as(lb),
        struct((payload :+ tsCol).map(col): _*).as("__r")): _*)

    val rTs = unix_micros(col("__r").getField(tsCol))
    val upper: Column =
      if (strict) rTs < unix_micros(col(tsCol)) else rTs <= unix_micros(col(tsCol))
    val joined = l.join(r, keys :+ lb)
      .filter(upper && rTs >= unix_micros(col(tsCol)) - winUs)

    val leftCols = left.columns.map(col)
    val rightCols = (payload :+ tsCol).map(c =>
      col("__r").getField(c).as(s"$rightPrefix$c"))
    joined.select(leftCols ++ rightCols: _*)
  }

  /** Struct type of `cols` as they exist on `df` (for a typed NULL side). */
  /** Skew-beating salted equi-join (INNER): when the LEFT side piles onto a
    * few hot key values (language, domain, label — cardinality far below
    * the cluster's parallelism), a plain hash join sends each hot key to
    * ONE reducer. Salting splits every key into `salt` sub-keys: the left
    * row picks a deterministic sub-key from its own content hash, the
    * right side replicates `salt`× — parallelism becomes keys × salt at
    * the cost of `salt`× the (small) right side. Result set is EXACTLY the
    * plain join's (spec-pinned); use when the right side is too big to
    * broadcast but far smaller than the left, and AQE's skew handling
    * (sort-merge only) doesn't reach the plan.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 salt: Int): DataFrame = {
    require(keys.nonEmpty, "keys must be non-empty")
    require(salt >= 1, "salt >= 1")
    val sCol = graft.ext.WorkingColumns.fresh(left, "__salt")
    // salt from the left row's own bytes: any distribution works (the join
    // result is salt-invariant), it only needs to spread a hot key's rows.
    // MAP columns are unhashable in Spark (hash codes are not canonical) —
    // draw the salt from the hashable columns only
    val hashable = left.schema.fields.filterNot(
      _.dataType.isInstanceOf[org.apache.spark.sql.types.MapType]).map(_.name)
    require(hashable.nonEmpty,
      "saltedJoin needs at least one non-MAP left column to derive the salt from")
    val l = left.withColumn(sCol,
      pmod(xxhash64(struct(hashable.map(col): _*)), lit(salt.toLong)).cast("int"))
    val r = right.withColumn(sCol, explode(sequence(lit(0), lit(salt - 1))))
    l.join(r, keys :+ sCol).drop(sCol)
  }

  /** Corpus snapshot diff: full-outer compare of two corpora by id with a
    * content-hash equality check — the audit step between two crawl/clean
    * iterations. One row per id in either snapshot with `status` ∈
    * {'added', 'removed', 'changed', 'unchanged'} (NULL contents compare
    * via the hash of the empty string — a doc whose content becomes NULL
    * reads as changed, not unchanged).
    *
    * Scale: one hash shuffle on the id; only (id, 32-byte hash) pairs
    * cross the wire — content never shuffles.
    */
  def diffCorpora(a: DataFrame, b: DataFrame, idCol: String = "id",
                  contentCol: String = "content"): DataFrame = {
    def h(df: DataFrame) = df.select(col(idCol).as("id"),
      sha2(coalesce(col(contentCol), lit("")), 256).as("__h"))
    val ha = h(a).withColumnRenamed("__h", "__ha")
    val hb = h(b).withColumnRenamed("__h", "__hb")
    ha.join(hb, Seq("id"), "full_outer")
      .select(col("id"), when(col("__ha").isNull, lit("added"))
        .when(col("__hb").isNull, lit("removed"))
        .when(col("__ha") === col("__hb"), lit("unchanged"))
        .otherwise(lit("changed")).as("status"))
  }

  private def structType(df: DataFrame, cols: Seq[String],
                         withTsn: Boolean = false) = {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val base = cols.map(c => df.schema(c))
    StructType(if (withTsn) base :+ StructField("__tsn", LongType) else base)
  }

  /** Edit-distance fuzzy join (record linkage / entity resolution): every
    * (left, right) pair whose string keys are within Levenshtein distance
    * `maxDist` — exact and recall-complete, never an all-pairs join.
    *
    * Candidates come from the q-gram prefix filter (Chaudhuri et al. 2006,
    * the character-level analogue of [[Dedup]]'s PPJoin shingle join): keys
    * are padded with q−1 sentinels each end; over the DISTINCT padded gram
    * sets, one edit removes at most q gram types, hence
    * dist ≤ d ⟹ |G(s)∩G(t)| ≥ max(|G(s)|,|G(t)|) − q·d. Each side keeps
    * only its q·d+1 GLOBALLY-RAREST grams (frequency asc, gram asc — a
    * shared total order): when the bound is positive, a qualifying pair's
    * kept sets must intersect, and rare grams have small buckets, so the
    * candidate join is skinny by construction. Pairs where BOTH gram sets
    * are too small for the bound (|G| ≤ q·d — short or highly repetitive
    * keys, rare in real key spaces) go through a bounded all-pairs arm
    * over just those keys. A length-difference > d pre-filter and the
    * codegen'd `levenshtein` verify finish the job.
    *
    * Output: (id_l, id_r, key_l, key_r, dist). NULL keys never match.
    *
    * Scale: one (gram, freq) agg over the skinny key space, one window per
    * side over ≤ len+q−1 gram rows per key, one hash join on rare grams,
    * then per-candidate O(len²) verify. Nothing corpus-sized beyond the
    * keys themselves crosses the wire. CAVEAT: the filter's selectivity
    * comes from rare grams, so it degenerates on uniform SMALL-ALPHABET
    * keys (random hex/digits: every q-gram is common, buckets approach
    * |keys|/alphabet^q). For such key spaces raise `q` until the gram
    * space dwarfs the key count, or pass `blockCols` — the standard
    * record-linkage blocking step: candidates must ALSO agree on the
    * given (leftCol, rightCol) pairs (an exact prefix, a phonetic code, a
    * zip code), which divides every gram bucket by the block cardinality
    * at the cost of missing cross-block matches (a recall trade the
    * caller makes explicitly). Natural keys (names, titles, paths) have
    * Zipfian gram distributions where almost every key carries a rare
    * gram and need neither.
    */
  def fuzzyJoin(left: DataFrame, right: DataFrame, maxDist: Int = 2, q: Int = 2,
                leftIdCol: String = "id", leftKeyCol: String = "key",
                rightIdCol: String = "id", rightKeyCol: String = "key",
                blockCols: Seq[(String, String)] = Nil): DataFrame = {
    require(maxDist >= 0, "maxDist >= 0")
    require(q >= 2, "q >= 2")
    // blocking (the record-linkage remedy for low-entropy key spaces):
    // candidates must also agree on every (leftCol, rightCol) block pair,
    // which divides every gram bucket by the block cardinality. NULL blocks
    // never match (standard equi-join semantics).
    val blockNames = blockCols.indices.map(i => s"__blk$i")
    // sentinel char outside any real key alphabet: positions near the key
    // ends get full q-gram coverage, which the |G| = len+q-1 bound assumes
    val pad = "\u0001" * (q - 1)
    def prep(df: DataFrame, idC: String, keyC: String, side: String,
             blocks: Seq[String]) = {
      val key = col(keyC).cast("string")
      val p = concat(lit(pad), key, lit(pad))
      val blockSel = blocks.zip(blockNames).map { case (c, n) => col(c).as(n) }
      df.select(Seq(col(idC).cast("string").as(s"id_$side"), key.as(s"key_$side"),
          array_distinct(transform(
            sequence(lit(1), length(p) - (q - 1)),
            i => substring(p, i, lit(q)))).as(s"gs_$side")) ++ blockSel: _*)
        .filter(col(s"key_$side").isNotNull)
    }
    // persisted (r19 opt): each side's prepped (id, key, gram-set) frame
    // feeds THREE structurally different consumers — the rarity aggregate,
    // the prefix join, and the short-key all-pairs branch — so exchange
    // reuse can never unify them and the key tokenize + q-gram build ran
    // up to 3× per side (4 independent scan jobs measured on the entry).
    // The frames are O(keys × key-length) — the same mass the candidate
    // join shuffles anyway — and spill-safe; Spark's ContextCleaner
    // reclaims the blocks once the returned frame is unreachable.
    val l = prep(left, leftIdCol, leftKeyCol, "l", blockCols.map(_._1)).persist()
    val r = prep(right, rightIdCol, rightKeyCol, "r", blockCols.map(_._2)).persist()
    def grams(df: DataFrame, side: String) =
      df.select(Seq(col(s"id_$side"), col(s"key_$side"),
        explode(col(s"gs_$side")).as("g")) ++ blockNames.map(col): _*)
    val lg = grams(l, "l")
    val rg = grams(r, "r")
    // shared global rarity order over BOTH sides' grams — persisted too:
    // it is consumed once per side's prefix join
    val freq = lg.select(col("g")).unionByName(rg.select(col("g")))
      .groupBy(col("g")).agg(count(lit(1)).as("__f")).persist()
    val keep = q * maxDist + 1
    def prefix(gdf: DataFrame, side: String) =
      gdf.join(freq, Seq("g"))
        .withColumn("__rn", row_number().over(
          Window.partitionBy(col(s"id_$side"))
            .orderBy(col("__f").asc, col("g").asc)))
        .filter(col("__rn") <= keep)
        .select(Seq(col(s"id_$side"), col(s"key_$side"), col("g")) ++
          blockNames.map(col): _*)
    val cand = prefix(lg, "l").join(prefix(rg, "r"), "g" +: blockNames)
      .select(col("id_l"), col("key_l"), col("id_r"), col("key_r")).distinct()
    // pairs where BOTH gram sets are <= q*d can share zero grams even at
    // dist <= maxDist (the bound is vacuous): all-pairs over just those
    // short/repetitive keys — a bounded, tiny space in any real key domain
    val shortPairs = {
      val sl = l.filter(size(col("gs_l")) <= q * maxDist)
      val sr = r.filter(size(col("gs_r")) <= q * maxDist)
      val joined = if (blockNames.isEmpty) sl.crossJoin(sr)
                   else sl.join(sr, blockNames.toSeq)
      if (maxDist == 0) cand.limit(0)
      else joined.select(col("id_l"), col("key_l"), col("id_r"), col("key_r"))
    }
    cand.unionByName(shortPairs).distinct()
      .filter(abs(length(col("key_l")) - length(col("key_r"))) <= maxDist)
      .withColumn("dist", levenshtein(col("key_l"), col("key_r")))
      .filter(col("dist") <= maxDist)
      .select(col("id_l"), col("id_r"), col("key_l"), col("key_r"), col("dist"))
  }

  /** "30 minutes" / "2 hours" / "90 seconds" / "500 milliseconds" → µs. */
  private[graft] def windowMicros(s: String): Long = {
    val m = "^\\s*(\\d+)\\s*(millisecond|second|minute|hour|day)s?\\s*$".r
    s.toLowerCase match {
      case m(n, unit) =>
        val mult = unit match {
          case "millisecond" => 1000L
          case "second" => 1000000L
          case "minute" => 60L * 1000000L
          case "hour" => 3600L * 1000000L
          case "day" => 86400L * 1000000L
        }
        n.toLong * mult
      case _ => throw new IllegalArgumentException(
        s"cannot parse duration '$s' (expected e.g. '30 minutes')")
    }
  }

  /** STATIC-interval point lookup — "which [lo, hi) range does this value
    * fall in" against a bounded dimension table of NON-OVERLAPPING ranges
    * (IP→geo, value→tier, ts→release window). The relational formulation
    * is a θ-join (`v >= lo AND v < hi`) that Spark can only plan as a
    * broadcast-nested-loop — O(|df|·|ranges|) comparisons; this instead
    * collects the ranges ONCE driver-side, sorts them, and ships a
    * binary-search [[RangeLookup]] expression: a ZERO-shuffle, zero-join
    * codegen'd scan at O(log |ranges|) per row. Adds `outCol` (the
    * matched range's label, NULL when the value is null or falls in a
    * gap). Ranges must not overlap — validated at build time, because an
    * overlap would make the answer storage-order-dependent.
    */
  def rangeLookup(df: DataFrame, ranges: DataFrame, valueCol: String,
                  loCol: String = "lo", hiCol: String = "hi",
                  labelCol: String = "label", outCol: String = "r_label",
                  maxRanges: Int = 1 << 20): DataFrame = {
    val rows = ranges
      .select(col(loCol).cast("double"), col(hiCol).cast("double"),
        col(labelCol).cast("string"))
      .limit(maxRanges + 1).collect()
    require(rows.length <= maxRanges,
      s"ranges table above $maxRanges rows — too large to ride the plan; " +
        "use rangeJoin for a genuinely large interval side")
    require(rows.forall(r => !r.isNullAt(0) && !r.isNullAt(1)),
      "null lo/hi bound in ranges")
    val sorted = rows.map(r => (r.getDouble(0), r.getDouble(1), r.getString(2)))
      .sortBy(_._1)
    sorted.foreach { case (lo, hi, _) => require(lo < hi, s"empty range [$lo, $hi)") }
    sorted.sliding(2).foreach {
      case Array((lo1, hi1, _), (lo2, _, _)) =>
        require(hi1 <= lo2, s"overlapping ranges: [$lo1, $hi1) and lo=$lo2")
      case _ => ()
    }
    val expr = RangeLookup(
      org.apache.spark.sql.graftbridge.Bridge.expression(col(valueCol).cast("double")),
      sorted.map(_._1), sorted.map(_._2), sorted.map(_._3))
    df.withColumn(outCol, org.apache.spark.sql.graftbridge.Bridge.column(expr))
  }
}

/** Binary search of a value in a SORTED, non-overlapping [lo, hi) range set
  * that rides the expression as reference arrays (KBs–MBs driver-built,
  * see [[Joins.rangeLookup]]): greatest lo <= v, label if v < its hi, else
  * NULL. Codegen'd — the whole lookup inlines into the scan stage.
  */
case class RangeLookup(child: org.apache.spark.sql.catalyst.expressions.Expression,
                       los: Array[Double], his: Array[Double], labels: Array[String])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.sql.types._

  require(los.length == his.length && los.length == labels.length, "parallel arrays")

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "range_lookup"

  // UTF8String upfront: eval returns internal-format strings
  @transient private lazy val utf8Labels =
    labels.map(l => if (l == null) null else org.apache.spark.unsafe.types.UTF8String.fromString(l))

  /** Index of the greatest lo <= v, or -1. Shared by eval and the codegen
    * static call so both paths are one definition.
    */
  def lookupIdx(v: Double): Int = {
    var left = 0
    var right = los.length - 1
    var ans = -1
    while (left <= right) {
      val mid = (left + right) >>> 1
      if (los(mid) <= v) { ans = mid; left = mid + 1 } else right = mid - 1
    }
    if (ans >= 0 && v < his(ans)) ans else -1
  }

  override def nullSafeEval(input: Any): Any = {
    val i = lookupIdx(input.asInstanceOf[Double])
    if (i < 0) null else utf8Labels(i)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("rangeLookup", this, classOf[RangeLookup].getName)
    val labelsRef = ctx.addReferenceObj("labels", utf8Labels,
      "org.apache.spark.unsafe.types.UTF8String[]")
    val idx = ctx.freshName("idx")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
      int $idx = $self.lookupIdx($c);
      if ($idx < 0 || $labelsRef[$idx] == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = $labelsRef[$idx];
      }
      """
    })
  }

  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression) = copy(child = c)
}
