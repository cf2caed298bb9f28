package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.GraftColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expressions for the text-fingerprint hot path.
  *
  * The composable spellings — `aggregate(tokens, seed, xxhash64(acc, t))`
  * for the rolling hash, and a nested `aggregate` per bit for SimHash —
  * are higher-order function chains, which Spark evaluates interpreted
  * (CodegenFallback). The SimHash spelling is the worst case: 64
  * interpreted passes over the token array per row. Honest bench
  * measurement (round 2's no-op-sink materialization) put
  * `q_ext_fingerprint` at 12 s for a projection — all interpretation
  * overhead. These expressions do one tight loop per row inside
  * whole-stage codegen and produce BIT-IDENTICAL results to the
  * higher-order forms (pinned by `TextHashExpressionsSpec`), since both
  * bottom out in the same `XXH64` primitives with the same seed
  * chaining.
  */
object TextHashExpressions {

  private final val Seed = 42L

  /** Order-aware rolling fingerprint over a string array:
    * `acc_0 = initial`, `acc_{i+1} = xxh64(token_i, xxh64_long(acc_i))` —
    * exactly the recurrence `aggregate(arr, initial, xxhash64(acc, t))`
    * evaluates, with the loop codegen'd instead of interpreted.
    * Null elements hash like the built-in: only the accumulator mixes.
    */
  case class RollingXxHash64(child: Expression, initial: Long)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "rolling_xxhash64"

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      var acc = initial
      var i = 0
      val n = arr.numElements()
      while (i < n) {
        val mixed = XXH64.hashLong(acc, Seed)
        acc =
          if (arr.isNullAt(i)) mixed
          else XXH64.hashUTF8String(arr.getUTF8String(i), mixed)
        i += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val xxh = classOf[XXH64].getName
      // fresh names: with a non-nullable child, nullSafeCodeGen inlines
      // this block unbraced into the shared method scope — fixed local
      // names would collide with a second instance of the expression
      val acc = ctx.freshName("acc")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val mixed = ctx.freshName("mixed")
      nullSafeCodeGen(ctx, ev, a =>
        s"""
           |long $acc = ${initial}L;
           |int $n = $a.numElements();
           |for (int $i = 0; $i < $n; $i++) {
           |  long $mixed = $xxh.hashLong($acc, ${Seed}L);
           |  $acc = $a.isNullAt($i) ? $mixed
           |      : $xxh.hashUTF8String($a.getUTF8String($i), $mixed);
           |}
           |${ev.value} = $acc;
         """.stripMargin)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** 64-bit SimHash over a string array: per-bit majority vote of the
    * tokens' xxhash64 values (`ones*2 > n`, ties → 0), identical to the
    * nested-aggregate spelling in [[graft.ext.Dedup.simHash64]] but one
    * codegen'd pass (hash each token once, vote all 64 bits from it)
    * instead of 64 interpreted passes. Null elements vote like the
    * built-in `xxhash64(null)` = the bare seed.
    */
  case class SimHash64Expr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "simhash64"

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val votes = new Array[Int](64)
      val n = arr.numElements()
      var i = 0
      while (i < n) {
        val h =
          if (arr.isNullAt(i)) Seed
          else XXH64.hashUTF8String(arr.getUTF8String(i), Seed)
        var b = 0
        while (b < 64) { votes(b) += ((h >>> b) & 1L).toInt; b += 1 }
        i += 1
      }
      var fp = 0L
      var b = 0
      while (b < 64) { if (votes(b) * 2 > n) fp |= 1L << b; b += 1 }
      fp
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val xxh = classOf[XXH64].getName
      // fresh names for the same unbraced-inline reason as above
      val n = ctx.freshName("n")
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val fp = ctx.freshName("fp")
      val b = ctx.freshName("b")
      nullSafeCodeGen(ctx, ev, a =>
        s"""
           |int $n = $a.numElements();
           |int[] $votes = new int[64];
           |for (int $i = 0; $i < $n; $i++) {
           |  long $h = $a.isNullAt($i) ? ${Seed}L
           |      : $xxh.hashUTF8String($a.getUTF8String($i), ${Seed}L);
           |  for (int $b = 0; $b < 64; $b++) $votes[$b] += (int) (($h >>> $b) & 1L);
           |}
           |long $fp = 0L;
           |for (int $b = 0; $b < 64; $b++) if ($votes[$b] * 2 > $n) $fp |= 1L << $b;
           |${ev.value} = $fp;
         """.stripMargin)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Column wrappers via the classic Expression↔Column bridge — no
    * session registry needed, so `TextStats`' pure-Column API keeps
    * working on any session.
    */
  def rollingXxHash64(arr: Column, initial: Long): Column =
    GraftColumnBridge.column(RollingXxHash64(GraftColumnBridge.expression(arr), initial))

  def simHash64(arr: Column): Column =
    GraftColumnBridge.column(SimHash64Expr(GraftColumnBridge.expression(arr)))
}
