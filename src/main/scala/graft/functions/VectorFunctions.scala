package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Cosine similarity over ARRAY<FLOAT> as a native Catalyst expression with
  * whole-stage codegen — the hot inner loop of exact vector search
  * (reference semantics: src/sifts/core.py:527-542 in-memory numpy cosine;
  * pgvector `<=>` with rank = 1 - distance, core.py:558-564).
  *
  * Accumulates in double (float32 inputs widen exactly), left-to-right — the
  * same order numpy/pgvector use, keeping scores deterministic.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv; nx += xv * xv; ny += yv * yv; i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0 else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = (double) $a.getFloat($i);
         |  double $yv = (double) $b.getFloat($i);
         |  $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
         |}
         |${ev.value} = ($nx == 0.0 || $ny == 0.0)
         |  ? 0.0 : $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Dot product over ARRAY<FLOAT>, double accumulation. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var i = 0
    while (i < n) { dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Signed (±1) random projection of an ARRAY<FLOAT> embedding to `outDim`
  * dimensions: out_j = (Σ_i sign(j,i)·x_i) / √outDim — the database-friendly
  * Johnson–Lindenstrauss transform (Achlioptas 2003: Rademacher entries
  * preserve pairwise distances like Gaussian ones). The sign matrix rides
  * the expression as a reference object (outDim·inDim bytes — KBs), so the
  * projection is a ZERO-shuffle, whole-stage-codegen scan: no broadcast
  * join, no matrix shuffle, and downstream shuffles/ANN scans carry
  * outDim/inDim of the bytes. Elements beyond `inDim` are ignored; short
  * or null-element arrays contribute zeros (deterministic padding).
  * Left-to-right double accumulation — eval and codegen emit bit-identical
  * values.
  */
case class SignedProjection(child: Expression, signs: Array[Byte],
                            outDim: Int, inDim: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(signs.length == outDim * inDim, "signs must be outDim x inDim")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "signed_projection"

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = math.min(xs.numElements(), inDim)
    val out = new Array[Double](outDim)
    val scale = 1.0 / math.sqrt(outDim.toDouble)
    var j = 0
    while (j < outDim) {
      var s = 0.0
      val base = j * inDim
      var i = 0
      while (i < n) {
        if (!xs.isNullAt(i)) s += signs(base + i) * xs.getFloat(i).toDouble
        i += 1
      }
      out(j) = s * scale
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val signsRef = ctx.addReferenceObj("signs", signs, "byte[]")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
      int n = Math.min($c.numElements(), $inDim);
      double[] out = new double[$outDim];
      double scale = 1.0 / Math.sqrt((double) $outDim);
      for (int j = 0; j < $outDim; j++) {
        double s = 0.0;
        int base = j * $inDim;
        for (int i = 0; i < n; i++) {
          if (!$c.isNullAt(i)) s += $signsRef[base + i] * (double) $c.getFloat(i);
        }
        out[j] = s * scale;
      }
      ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(out);
      """
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** WHOLE-BUCKET embedding near-duplicate verification as a generator — the
  * cosine analogue of [[graft.functions.BucketJaccardPairs]]: the input is
  * one collected LSH bucket — ARRAY<STRUCT<id STRING, emb ARRAY<FLOAT>>>,
  * id-sorted — and the output rows are exactly the member pairs with cosine
  * ≥ `threshold`: (id_a, id_b, cos), a < b.
  *
  * Replaces candidate-pair materialization + per-side embedding re-joins:
  * each embedding crosses the wire ONCE per set membership (bounded by the
  * bucket cap), and the O(m²) candidate pairs exist only inside this loop,
  * which emits only survivors. Per-member squared norms are precomputed once
  * (full-length), so each pair costs one dot-product pass when dimensions
  * match; mismatched-length pairs fall back to the exact
  * [[CosineSimilarity]] loop. Both paths accumulate in double, left to
  * right — emitted values are bit-identical to `CosineSimilarity`.
  */
case class BucketCosinePairs(child: Expression, threshold: Double)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.Generator
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(threshold >= -1.0 && threshold <= 1.0, "threshold in [-1, 1]")

  override def elementSchema: StructType = StructType(Seq(
    StructField("id_a", StringType, nullable = false),
    StructField("id_b", StringType, nullable = false),
    StructField("cos", DoubleType, nullable = false)))
  override def prettyName: String = "bucket_cosine_pairs"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null) return Iterator.empty
    val m = arr.numElements()
    val ids = new Array[org.apache.spark.unsafe.types.UTF8String](m)
    val vecs = new Array[Array[Float]](m)
    val sq = new Array[Double](m)
    var i = 0
    while (i < m) {
      val st = arr.getStruct(i, 2)
      // clone: generator output outlives this input row's unsafe buffer
      ids(i) = st.getUTF8String(0).clone()
      val v = st.getArray(1).toFloatArray()
      vecs(i) = v
      var s = 0.0
      var d = 0
      while (d < v.length) { val x = v(d).toDouble; s += x * x; d += 1 }
      sq(i) = s
      i += 1
    }
    // LAZY pair enumeration: a duplicate-heavy cap-sized bucket can emit
    // C(m, 2) survivors — materializing them before Generate consumes any
    // would buffer the whole quadratic set in one task's heap. The iterator
    // keeps the enumeration streaming; only the O(m) member arrays above
    // are resident.
    Iterator.range(0, m).flatMap { a =>
      Iterator.range(a + 1, m).flatMap { b =>
        val va = vecs(a)
        val vb = vecs(b)
        val cos =
          if (va.length == vb.length) {
            if (sq(a) == 0.0 || sq(b) == 0.0) 0.0
            else VectorFunctions.dotMin(va, vb) / (math.sqrt(sq(a)) * math.sqrt(sq(b)))
          } else VectorFunctions.cosineMin(va, vb)
        if (cos >= threshold)
          // ids are pre-sorted ascending by the caller (sort_array), so
          // (a, b) is already (id_a < id_b)
          Iterator.single(new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            Array[Any](ids(a), ids(b), cos)): InternalRow)
        else Iterator.empty
      }
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object VectorFunctions {

  private val FloatArray = ArrayType(FloatType)

  /** THE min-length float dot product (double accumulation, left to right)
    * — the one definition behind every interpreted hot loop
    * ([[BucketCosinePairs]], IVF assignment and Lloyd sums), so the
    * bit-identical-scores / assignment-parity guarantees are enforced by
    * shared code, not by prose. The codegen'd expressions above emit the
    * same loop in Java.
    */
  private[graft] def dotMin(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0
    var i = 0
    while (i < n) { dot += a(i).toDouble * b(i).toDouble; i += 1 }
    dot
  }

  /** THE min-length truncated cosine over float arrays — [[CosineSimilarity]]
    * semantics (dot AND norms over the first min(|a|, |b|) elements,
    * left-to-right double accumulation, zero-norm → 0.0) as one shared
    * definition for every interpreted caller, so emitted values stay
    * bit-identical to the expression without hand-synced copies.
    * ([[CosineSimilarity]]'s own eval/codegen pair operates on ArrayData —
    * the representation-specific twins, pinned by the HOF cross-check spec.)
    */
  private[graft] def cosineMin(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      val xv = a(i).toDouble
      val yv = b(i).toDouble
      dot += xv * yv; nx += xv * xv; ny += yv * yv; i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0 else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  /** Codegen'd cosine similarity Column over two ARRAY<FLOAT> columns.
    * Inputs are cast to ARRAY<FLOAT> (the expressions assume it).
    */
  def cosine(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarity(
      Bridge.expression(a.cast(FloatArray)), Bridge.expression(b.cast(FloatArray))))

  def dot(a: Column, b: Column): Column =
    Bridge.column(DotProduct(
      Bridge.expression(a.cast(FloatArray)), Bridge.expression(b.cast(FloatArray))))

  /** Whole-bucket qualifying-pairs generator over a collected bucket column
    * (ARRAY<STRUCT<id, emb>>, id-sorted): emits (id_a, id_b, cos) rows.
    */
  def bucketCosinePairs(docs: Column, threshold: Double): Column =
    Bridge.column(BucketCosinePairs(Bridge.expression(docs), threshold))

  /** A query vector as an ARRAY<FLOAT> literal column. */
  def vecLit(v: Seq[Float]): Column =
    array(v.map(x => lit(x)): _*).cast(ArrayType(FloatType))

  /** Signed random projection to `outDim` dims (see [[SignedProjection]]);
    * `signs` is the flattened outDim×inDim ±1 matrix.
    */
  def signProject(emb: Column, signs: Array[Byte], outDim: Int, inDim: Int): Column =
    Bridge.column(SignedProjection(
      Bridge.expression(emb.cast(FloatArray)), signs, outDim, inDim))

  /** HOF (builtin-functions) cosine — reference implementation used to
    * cross-check the codegen Expression in tests; double accumulation,
    * left-to-right like the Expression.
    */
  def cosineHof(a: Column, b: Column): Column = {
    // slice BOTH sides to the common length first: zip_with null-pads the
    // shorter array, and one null product nulls the whole aggregate — the
    // Expression instead truncates to min length, which this must mirror
    // to serve as its cross-check
    val n = least(size(a), size(b))
    val as = slice(a, lit(1), n)
    val bs = slice(b, lit(1), n)
    def dotAgg(x: Column, y: Column): Column =
      aggregate(
        zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0),
        (acc, v) => acc + v
      )
    val d = dotAgg(as, bs)
    val na = sqrt(dotAgg(as, as))
    val nb = sqrt(dotAgg(bs, bs))
    when(na === 0.0 || nb === 0.0, lit(0.0)).otherwise(d / (na * nb))
  }
}
