package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType}

/** Catalyst expression: Z-order (Morton) key of three 21-bit-normalized
  * Long inputs. Codegen-friendly — `doGenCode` emits a static call into
  * [[ZOrder]], so the expression stays inside whole-stage codegen spans.
  *
  * The engine's clustering key is
  * `ZOrderKey(norm(phash), norm(w*h), norm(xxhash64(image_id)))`
  * per the north rule; normalization helpers live in [[zfunctions]].
  */
case class ZOrderKey(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ExpectsInputTypes {

  override def dataType: DataType = LongType
  override def inputTypes: Seq[DataType] = Seq(LongType, LongType, LongType)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "zorder_key"

  override def nullSafeEval(a: Any, b: Any, c: Any): Any =
    ZOrder.interleave3(a.asInstanceOf[Long], b.asInstanceOf[Long], c.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c) => s"graft.expr.ZOrder.interleave3($a, $b, $c)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): ZOrderKey =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Hilbert-curve variant of [[ZOrderKey]]: better locality, same API. */
case class HilbertKey(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ExpectsInputTypes {

  override def dataType: DataType = LongType
  override def inputTypes: Seq[DataType] = Seq(LongType, LongType, LongType)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hilbert_key"

  override def nullSafeEval(a: Any, b: Any, c: Any): Any =
    ZOrder.hilbert3_21(a.asInstanceOf[Long], b.asInstanceOf[Long], c.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c) => s"graft.expr.ZOrder.hilbert3_21($a, $b, $c)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): HilbertKey =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Column-level API for the clustering expressions. */
object zfunctions {

  private def expr(c: Column): Expression = GraftBridge.expression(c)

  def zorder_key(a: Column, b: Column, c: Column): Column =
    GraftBridge.column(ZOrderKey(expr(a), expr(b), expr(c)))

  def hilbert_key(a: Column, b: Column, c: Column): Column =
    GraftBridge.column(HilbertKey(expr(a), expr(b), expr(c)))

  /** Normalize a uniform 64-bit hash (phash, xxhash64) to the 21-bit key
    * domain, preserving unsigned order. */
  def norm_hash21(c: Column): Column =
    shiftrightunsigned(c.bitwiseXOR(lit(Long.MinValue)), 64 - ZOrder.Bits)

  /** Range-scale a bounded numeric column into [0, 2^21). */
  def norm_range21(c: Column, lo: Long, hi: Long): Column = {
    if (hi <= lo) lit(0L)
    else {
      val clamped = greatest(lit(lo), least(lit(hi), c.cast(LongType)))
      ((clamped - lit(lo)).cast("double") * lit(ZOrder.Max21.toDouble) /
        lit((hi - lo).toDouble)).cast(LongType)
    }
  }

  /** Order-preserving numeric image of a string: its first 7 bytes
    * big-endian (codepoints clamped to 255, absent positions 0). 56 bits
    * keeps the value positive, so Long comparisons match lexicographic
    * order exactly on ASCII (approximately beyond). Range-normalizes
    * string sort columns for clustering; the driver-side mirror over
    * manifest stat strings is [[ZOrder.strPrefixLong]]. */
  def str_prefix_long(c: Column): Column =
    (0 until 7).map(i => shiftleft(
      least(coalesce(ascii(substring(c, i + 1, 1)), lit(0)), lit(255))
        .cast(LongType),
      8 * (6 - i))).reduce(_ + _)

  /** Range-scale a bounded DOUBLE column into [0, 2^21). */
  def norm_double21(c: Column, lo: Double, hi: Double): Column =
    if (hi <= lo) lit(0L)
    else ((least(lit(hi), greatest(lit(lo), c.cast("double"))) - lit(lo)) *
      lit(ZOrder.Max21.toDouble / (hi - lo))).cast(LongType)

  /** The engine's standard image-row clustering key (north rule):
    * interleave(norm(phash), norm(w*h), norm(xxhash64(image_id))). */
  def imageZKey(phash: Column, w: Column, h: Column, imageId: Column,
      hilbert: Boolean = false): Column = {
    val a = norm_hash21(phash)
    // w*h of synthetic images is bounded; 2^21 > 4096*4096/8 — scale by a
    // generous fixed pixel-count range [0, 2^24) using hash-free scaling.
    val b = norm_range21(w.cast(LongType) * h.cast(LongType), 0L, 1L << 24)
    val c = norm_hash21(xxhash64(imageId))
    if (hilbert) hilbert_key(a, b, c) else zorder_key(a, b, c)
  }

  /** Register zorder_key/hilbert_key for SQL use. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "zorder_key", exprs => ZOrderKey(exprs(0), exprs(1), exprs(2)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hilbert_key", exprs => HilbertKey(exprs(0), exprs(1), exprs(2)), "scala_udf")
  }
}
