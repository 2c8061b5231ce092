package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Codegen broadcast-bloom membership probe — the native replacement
  * for `udf((h: Long) => bloomBc.value.mightContainLong(h))` on the
  * dedup hot paths (r14 verdict #2: the two remaining per-row Scala
  * UDFs, Dedup.contaminationBloom and Dedup.exactSubstrSpans, broke
  * whole-stage codegen in exactly the stages the r13/r14 restructures
  * made cheap enough for the udf dispatch to be visible).
  *
  * A Scala UDF here costs, per row: a codegen boundary (the Project
  * splits around a non-codegen expression), boxing the long to
  * java.lang.Long, a generic function dispatch, and a null-check
  * wrapper — all to reach a probe that is itself a few XORs and two
  * bitset word loads (`BloomFilterImpl.mightContainLong`). This
  * expression keeps the probe inside the generated Java: the
  * broadcast handle is attached as a codegen reference object and
  * resolved ONCE per task into a plan-lifetime mutable slot, so the
  * per-row code is a direct monomorphic `filter.mightContainLong(h)`
  * on an unboxed long.
  *
  * The expression holds the `Broadcast` handle, not the filter —
  * task serialization ships only the handle (the filter's bytes move
  * once per executor via the broadcast mechanism, which is the whole
  * point of broadcasting a ~MB-scale filter to a 1000-executor
  * cluster). Deterministic, null-propagating like any unary
  * expression; no false negatives is the bloom contract, so callers
  * can (and do) follow with an exact semi-join for exactness. */
case class BloomMightContain(child: Expression,
    bloomBc: Broadcast[BloomFilter]) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain expects bigint, got ${other.simpleString}")
  }

  override def dataType: DataType = BooleanType

  override def prettyName: String = "bloom_might_contain"

  override protected def nullSafeEval(input: Any): Any =
    bloomBc.value.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bloomBc", bloomBc,
      classOf[Broadcast[_]].getName)
    // resolve the broadcast once per generated-class instance (i.e.
    // once per task), not once per row: Broadcast.value() is a lazy
    // block-manager lookup — cheap after the first call but still a
    // virtual dispatch and a null check the row loop doesn't need
    val filterVar = ctx.addMutableState(classOf[BloomFilter].getName,
      "graftBloomFilter",
      v => s"$v = (${classOf[BloomFilter].getName}) $bcRef.value();")
    defineCodeGen(ctx, ev, c => s"$filterVar.mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomMightContain {
  import org.apache.spark.sql.{Column, GraftSqlBridge}

  /** Column-level face: `mightContain(bloomBc, $"h")`. */
  def apply(bloomBc: Broadcast[BloomFilter], h: Column): Column =
    GraftSqlBridge.column(
      BloomMightContain(GraftSqlBridge.expression(h), bloomBc))
}
