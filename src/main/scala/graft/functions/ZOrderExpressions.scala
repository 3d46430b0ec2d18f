package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Z-order (Morton) clustering key for multi-column data clustering.
  *
  * Why: chunk zone maps prune on ONE physical order. Ingest/compaction sort by
  * (timestamp_ns, metric_name), so a query filtering on a non-leading label
  * (`host = 'h3'`) reads every chunk of the time window — each chunk's host
  * min/max spans the full range. Z-ordering the cold (compacted) levels
  * interleaves the bits of several columns' monotone codes, so sorting by the
  * single z-key co-locates rows close in EVERY clustered dimension: range-
  * splitting the output then yields chunks whose zone maps are tight
  * rectangles in all clustered columns at once, and within a chunk the parquet
  * row-group stats tighten the same way. Same idea as Delta Lake's
  * OPTIMIZE ZORDER BY / the classic Morton-curve clustering literature; only
  * clustering QUALITY depends on the code choice — query correctness never
  * does (zone maps always store true min/max of the raw columns).
  *
  * Per-column 32-bit monotone codes (monotone w.r.t. the column's sort order,
  * which is what makes the min/max rectangles tight):
  *  - string: 4 bytes big-endian AFTER skipping `skipPrefix` bytes (the common
  *    prefix of the column's observed min/max — "metric_0042" vs "metric_0911"
  *    differ only after byte 7, so coding from byte 0 would collapse every
  *    value to one code). Prefix-truncation is order-preserving on the
  *    observed range.
  *  - long with (min,max) range: scaled rank ((v-min)/(max-min) of 2^32-1),
  *    computed in Double — monotone non-decreasing end to end.
  *  - long without range: sign-flipped top 32 bits (full-domain fallback).
  *  - double with range: same scaled rank; NaN → max code (Spark sorts NaN
  *    last). Without range: IEEE-754 sortable-bits top 32.
  *  - null → 0 (clusters first, like NULLS FIRST).
  *
  * Interleave: with k children each contributes floor(64/k) high bits (≤32),
  * MSB-first round-robin — out bit 63 is child 0's code bit 31, bit 62 is
  * child 1's, … so equal-weight locality across dimensions.
  */
object ZOrderExpressions {

  /** Per-column normalization for the monotone code. [[Default]] needs no
    * statistics; the ranged forms come from catalog zone maps (min/max the
    * compactor already holds) and tighten the code to the observed range.
    */
  sealed trait ColumnNorm
  case object Default extends ColumnNorm
  /** Skip the common min/max prefix, then scale the 4-byte code to the
    * observed [minCode, maxCode] range — without the scaling, values sharing
    * high BYTES after the prefix (hosts `h0`..`h9` → 0x30…–0x39…) would never
    * reach the top interleave bits and the dimension would drop out of the
    * coarse z-buckets.
    */
  final case class StringPrefix(skipBytes: Int,
                                minCode: Long = 0L,
                                maxCode: Long = 0xFFFFFFFFL) extends ColumnNorm
  final case class LongRange(min: Long, max: Long) extends ColumnNorm
  final case class DoubleRange(min: Double, max: Double) extends ColumnNorm

  /** Length of the common byte prefix of the observed min/max — the prefix
    * every in-range value shares, safe to skip before coding.
    */
  def commonPrefixBytes(min: String, max: String): Int = {
    val a = min.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val b = max.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < a.length && i < b.length && a(i) == b(i)) i += 1
    i
  }

  private val MaxCode = 0xFFFFFFFFL

  private def scaled(frac: Double): Long = {
    if (frac <= 0.0) 0L
    else if (frac >= 1.0) MaxCode
    else (frac * MaxCode.toDouble).toLong
  }

  /** 32-bit big-endian code of the 4 bytes after `skip` (0-padded) — the raw
    * string code before range scaling. Shared with the compactor, which feeds
    * the observed min/max strings through it to build the scaling range.
    */
  def stringCode(bytes: Array[Byte], skip: Int): Long = {
    var c = 0L
    var b = 0
    while (b < 4) {
      val byte = if (skip + b < bytes.length) bytes(skip + b) & 0xFFL else 0L
      c = (c << 8) | byte
      b += 1
    }
    c
  }

  def stringCode(s: String, skip: Int): Long =
    stringCode(s.getBytes(java.nio.charset.StandardCharsets.UTF_8), skip)

  /** 64-bit Morton key of up to 8 columns. Null-intolerant of arity only:
    * null INPUTS code to 0 rather than nulling the key, so clustering sorts
    * stay total.
    */
  case class ZOrder64(children: Seq[Expression], norms: Seq[ColumnNorm])
      extends Expression {
    require(children.nonEmpty && children.size <= 8,
      s"zorder64 takes 1..8 columns, got ${children.size}")
    require(norms.size == children.size, "one norm per child")

    // children may be unresolved at construction (SQL registry path), so type
    // validation waits for analysis
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      children.zip(norms).map {
        case (c, n) => (c.dataType, n) match {
          case (StringType, Default | _: StringPrefix) => TypeCheckResult.TypeCheckSuccess
          case (LongType | IntegerType, Default | _: LongRange) => TypeCheckResult.TypeCheckSuccess
          case (DoubleType, Default | _: DoubleRange) => TypeCheckResult.TypeCheckSuccess
          case (dt, norm) => TypeCheckResult.TypeCheckFailure(
            s"zorder64: unsupported column type $dt with norm $norm")
        }
      }.collectFirst { case f: TypeCheckResult.TypeCheckFailure => f }
        .getOrElse(TypeCheckResult.TypeCheckSuccess)
    }

    override def dataType: DataType = LongType
    override def nullable: Boolean = false
    override def foldable: Boolean = children.forall(_.foldable)

    private val bitsPer = math.min(32, 64 / children.size)

    private def code(i: Int, v: Any): Long = {
      if (v == null) return 0L
      (children(i).dataType, norms(i)) match {
        case (StringType, norm) =>
          val (skip, mnc, mxc) = norm match {
            case StringPrefix(s, mn, mx) => (s, mn, mx)
            case _ => (0, 0L, MaxCode)
          }
          val raw = stringCode(v.asInstanceOf[UTF8String].getBytes, skip)
          if (mxc <= mnc) 0L
          else if (mnc == 0L && mxc == MaxCode) raw
          else scaled((raw.toDouble - mnc.toDouble) / (mxc.toDouble - mnc.toDouble))
        case (LongType | IntegerType, LongRange(mn, mx)) =>
          val x = v match { case l: Long => l; case n: Int => n.toLong }
          if (mx <= mn) 0L
          else scaled((x.toDouble - mn.toDouble) / (mx.toDouble - mn.toDouble))
        case (LongType, _) => ((v.asInstanceOf[Long]) ^ Long.MinValue) >>> 32
        case (IntegerType, _) => (v.asInstanceOf[Int] ^ Int.MinValue).toLong & MaxCode
        case (DoubleType, DoubleRange(mn, mx)) =>
          val x = v.asInstanceOf[Double]
          if (x.isNaN) MaxCode
          else if (mx <= mn) 0L
          else scaled((x - mn) / (mx - mn))
        case (DoubleType, _) =>
          val x = v.asInstanceOf[Double]
          var bits = java.lang.Double.doubleToLongBits(if (x.isNaN) Double.NaN else x)
          bits = if (bits < 0L) ~bits else bits ^ Long.MinValue
          bits >>> 32
        case _ => 0L
      }
    }

    // type-specialized code entry points for the generated Java (no boxing;
    // the boxing of `Any` happens once here in compiled Scala, not per call
    // site in Janino, which does not autobox)
    def codeString(i: Int, v: UTF8String): Long = code(i, v) & MaxCode
    def codeLong(i: Int, v: Long): Long = code(i, v) & MaxCode
    def codeInt(i: Int, v: Int): Long = code(i, v) & MaxCode
    def codeDouble(i: Int, v: Double): Long = code(i, v) & MaxCode

    /** MSB-first round-robin interleave of the 32-bit codes, left-aligned (so
      * top-bits bucketing is child-count independent), then SIGN-BIT FLIPPED:
      * the raw interleave is an unsigned quantity, but Spark sorts LongType
      * signed — without the flip, keys with child 0's top code bit set would
      * sort BEFORE the low half and the curve order would tear in the middle.
      * With it, signed ORDER BY == z order. Shared by eval and codegen.
      */
    def interleave(codes: Array[Long]): Long = {
      val k = codes.length
      var out = 0L
      var b = 0
      while (b < bitsPer) {
        var j = 0
        while (j < k) {
          out = (out << 1) | ((codes(j) >>> (31 - b)) & 1L)
          j += 1
        }
        b += 1
      }
      (out << (64 - bitsPer * k)) ^ Long.MinValue
    }

    override def eval(input: InternalRow): Any = {
      val k = children.size
      val codes = new Array[Long](k)
      var i = 0
      while (i < k) {
        codes(i) = code(i, children(i).eval(input)) & MaxCode
        i += 1
      }
      interleave(codes)
    }

    /** Real codegen (not CodegenFallback): children stay inside whole-stage
      * codegen; per child one static-shaped call into this expression object
      * (added as a reference object) computes the 32-bit code, then one call
      * interleaves. Matters because the z-key is evaluated once per ROW of
      * every clustered compaction merge (tens of millions of rows per sweep).
      */
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("zorder", this, classOf[ZOrder64].getName)
      val evals = children.map(_.genCode(ctx))
      val codes = ctx.freshName("zcodes")
      val assigns = children.zip(evals).zipWithIndex.map { case ((c, e), i) =>
        val m = c.dataType match {
          case StringType => "codeString"
          case LongType => "codeLong"
          case IntegerType => "codeInt"
          case DoubleType => "codeDouble"
          case dt => throw new IllegalStateException(s"zorder64 codegen: $dt")
        }
        code"""
          ${e.code}
          $codes[$i] = ${e.isNull} ? 0L : $ref.$m($i, ${e.value});"""
      }.reduce(_ + _)
      ev.copy(
        code = code"""
          long[] $codes = new long[${children.size}];
          $assigns
          final long ${ev.value} = $ref.interleave($codes);""",
        isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
    }

    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): ZOrder64 = copy(children = newChildren)
  }
}
