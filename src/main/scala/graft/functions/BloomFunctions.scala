package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd membership probe against a driver-built Bloom filter sketch.
  *
  * The sketch rides to executors inside the expression (the plan's reference
  * objects ship broadcast-style with the serialized tasks), so the probe is a
  * ZERO-shuffle scan predicate: at 100 TB this is how a corpus is screened
  * against a reference set without the corpus ever crossing the wire — only
  * the (true matches + fpp·corpus) bloom-positive sliver pays any join. No
  * false negatives by construction, so bloom-negative rows are definitively
  * clean.
  *
  * The built-in alternative (`BloomFilterMightContain`) is an internal
  * runtime-filter expression tied to `BloomFilterAggregate`'s binary layout
  * and injected-subquery plumbing; this standalone form takes the public
  * `util.sketch.BloomFilter` that `DataFrameStatFunctions.bloomFilter`
  * produces, probing on an already-computed 64-bit key.
  */
case class BloomMightContainLong(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(input: Any): Any =
    bloom.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.mightContainLong($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object BloomFunctions {

  /** `true` iff the 64-bit `key` column might be in `bloom` (no false
    * negatives; false positives at the filter's configured fpp).
    */
  def mightContainLong(key: Column, bloom: BloomFilter): Column =
    Bridge.column(BloomMightContainLong(Bridge.expression(key), bloom))
}
