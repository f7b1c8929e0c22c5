package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/**
 * Codegen'd vector kernels. The similarity surface computes millions of
 * dot products per query (brute-force kNN at n=2000 is 4M pairs; the
 * reference's tight primitive loop is Intersections.cosineSquare,
 * core/.../utils/Intersections.java:153-170). Spark's built-in route —
 * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` — materializes an
 * intermediate array per pair and evaluates the lambdas INTERPRETED
 * (higher-order functions never enter whole-stage codegen), measured at
 * ~6 µs/pair = 26 s per brute-force query. This expression compiles to a
 * primitive loop inside the generated code (~0.5 µs/pair), the
 * SURVEY §7.4 "custom Expression over UDF" escalation path.
 *
 * Null semantics match the HOF formulation exactly: null input → null;
 * length mismatch or any null element → null (zip_with pads the short
 * side with null, and `acc + null` poisons the whole fold).
 */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dot_product expects two array<double> arguments, got " +
            s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (n != ys.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i) || ys.isNullAt(i)) return null
      acc += xs.getDouble(i) * ys.getDouble(i)
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/**
 * Merge-intersection of two SORTED array<long> columns (ascending, no
 * nulls, no duplicates — the shape `sort_array(collect_set(...))` and
 * sorted hashed-shingle sets produce). Spark's generic `array_intersect`
 * builds a per-row hash set of one side (allocation + hashing per
 * element); on the triangle wedge-close hot path — millions of edges ×
 * ~√m-element adjacency arrays, the reference's tight sorted-CSR loop is
 * GraphIntersect.java:60-130 — a two-pointer merge inside whole-stage
 * codegen does the same work with zero hashing. Callers OWN the
 * sortedness precondition; unsorted input silently under-counts, exactly
 * like the reference's CSR intersect on unsorted adjacency.
 */
case class SortedIntersect(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sorted_intersect expects two array<bigint> arguments, got " +
            s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData].toLongArray()
    val ys = b.asInstanceOf[ArrayData].toLongArray()
    val buf = new Array[Long](math.min(xs.length, ys.length))
    var i = 0; var j = 0; var k = 0
    while (i < xs.length && j < ys.length) {
      if (xs(i) < ys(j)) i += 1
      else if (xs(i) > ys(j)) j += 1
      else { buf(k) = xs(i); k += 1; i += 1; j += 1 }
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(java.util.Arrays.copyOf(buf, k))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val xs = ctx.freshName("xs"); val ys = ctx.freshName("ys")
      val buf = ctx.freshName("buf")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      s"""
         |long[] $xs = $a.toLongArray();
         |long[] $ys = $b.toLongArray();
         |long[] $buf = new long[Math.min($xs.length, $ys.length)];
         |int $i = 0, $j = 0, $k = 0;
         |while ($i < $xs.length && $j < $ys.length) {
         |  if ($xs[$i] < $ys[$j]) $i++;
         |  else if ($xs[$i] > $ys[$j]) $j++;
         |  else { $buf[$k++] = $xs[$i]; $i++; $j++; }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray(java.util.Arrays.copyOf($buf, $k));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersect =
    copy(left = newLeft, right = newRight)
}

/** |A ∩ B| of two sorted array<long> columns without materializing the
 *  intersection — the dedup verify step only needs the count. Same
 *  sortedness contract as [[SortedIntersect]]. */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sorted_intersect_size expects two array<bigint> arguments, got " +
            s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData].toLongArray()
    val ys = b.asInstanceOf[ArrayData].toLongArray()
    var i = 0; var j = 0; var k = 0
    while (i < xs.length && j < ys.length) {
      if (xs(i) < ys(j)) i += 1
      else if (xs(i) > ys(j)) j += 1
      else { k += 1; i += 1; j += 1 }
    }
    k
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val xs = ctx.freshName("xs"); val ys = ctx.freshName("ys")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      s"""
         |long[] $xs = $a.toLongArray();
         |long[] $ys = $b.toLongArray();
         |int $i = 0, $j = 0, $k = 0;
         |while ($i < $xs.length && $j < $ys.length) {
         |  if ($xs[$i] < $ys[$j]) $i++;
         |  else if ($xs[$i] > $ys[$j]) $j++;
         |  else { $k++; $i++; $j++; }
         |}
         |${ev.value} = $k;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Column-facing codegen'd dot product over two array<double> columns. */
  def dotProduct(a: Column, b: Column): Column =
    GraftShims.column(DotProduct(GraftShims.expression(a), GraftShims.expression(b)))

  /** Merge-intersection of two SORTED ascending array<bigint> columns. */
  def sortedIntersect(a: Column, b: Column): Column =
    GraftShims.column(SortedIntersect(GraftShims.expression(a), GraftShims.expression(b)))

  /** Intersection size of two SORTED ascending array<bigint> columns. */
  def sortedIntersectSize(a: Column, b: Column): Column =
    GraftShims.column(SortedIntersectSize(GraftShims.expression(a), GraftShims.expression(b)))
}
