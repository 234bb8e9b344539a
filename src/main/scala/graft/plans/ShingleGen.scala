package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{CollectionGenerator, Expression, ExpressionInfo, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst Generator (the UDTF extension tier): one text row →
  * N word-shingle rows, usable from SQL as
  * `LATERAL VIEW shingles_gen(text, 3) t AS pos, shingle`.
  *
  * Where it sits in the extension taxonomy: scalar Expression
  * (dot_long), Aggregator UDAF (top-k, KMV), whole operator
  * (AsOfJoin), optimizer Rule (as-of pushdown), DSv2 source
  * (boatrace) — and this Generator covers the 1→N row-producing
  * shape natively, so Catalyst sees a single Generate node instead of
  * the array-materializing split+explode composition (no intermediate
  * array allocation per row; shingles stream out of the generator).
  * Generators evaluate inside the Generate operator, which is outside
  * whole-stage codegen for non-builtin generators — the win here is
  * allocation shape, not codegen (CodegenFallback like most custom
  * generators).
  */
case class ShingleGen(child: Expression, nExpr: Expression)
    extends CollectionGenerator with CodegenFallback {

  override def children: Seq[Expression] = Seq(child, nExpr)
  override def position: Boolean = false
  override def inline: Boolean = false
  override def collectionType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.ArrayType(elementSchema, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && nExpr.dataType == IntegerType &&
      nExpr.foldable) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "shingles_gen expects (string, int literal)")

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("shingle", StringType, nullable = false)))

  private lazy val n: Int = nExpr.eval().asInstanceOf[Int]

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input)
    if (t == null) Iterator.empty
    else {
      val words = t.asInstanceOf[UTF8String].toString.trim
        .split("\\s+").filter(_.nonEmpty)
      if (words.length < n) Iterator.empty
      else (0 to words.length - n).iterator.map { i =>
        val row = new GenericInternalRow(2)
        row.setInt(0, i)
        row.update(1,
          UTF8String.fromString(words.slice(i, i + n).mkString(" ")))
        row: InternalRow
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ShingleGen =
    copy(child = newChildren(0), nExpr = newChildren(1))
}

object ShingleGen {
  private val descriptor = (
    FunctionIdentifier("shingles_gen"),
    new ExpressionInfo(classOf[ShingleGen].getName, "shingles_gen"),
    (children: Seq[Expression]) =>
      ShingleGen(children(0), children(1)): Expression)

  /** Idempotent per-session registration. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(descriptor._1))
      registry.registerFunction(descriptor._1, descriptor._2, descriptor._3)
  }
}
