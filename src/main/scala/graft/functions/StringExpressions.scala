package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the portable rolling fingerprint — the
  * single hottest scalar in the library: every salted draw (q63/q64/q69/
  * q94/q110/q116), content split (q55/q61), shingle/token hash (q30/q66/
  * q111/q112) and the q37 fingerprint itself fold `acc·31 + c (mod 2^57)`
  * over a string's chars.
  *
  * The composed form — `aggregate(split(text, ""), ...)` — materializes a
  * one-char-string array per row and runs an interpreted lambda per
  * element: two allocations and a non-codegen HOF in the middle of
  * otherwise whole-stage-codegen'd scans. This expression generates a
  * primitive loop instead (ASCII fast path reads UTF8String bytes in
  * place with zero allocation; non-ASCII falls back to one toString and
  * folds code points — exactly what `split` into one-char pieces +
  * `ascii()` computes piece-by-piece, astral chars included), per the
  * custom-operator preference order: compose built-ins → custom
  * `Expression` with `doGenCode` → full plan nodes.
  *
  * Value-identical to the HOF form for every input (FingerprintSpec pins
  * corpus-wide and edge-case equality), so every oracle hash is
  * unchanged: `acc < 2^57` keeps `acc·31 + c < 2^62` exact in a signed
  * long, and `Math.floorMod` equals `pmod` for a positive modulus.
  */
case class StringRollingFp(child: Expression, mod: Long)
  extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes()
  : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"rolling_fp expects string, got $t")
    }

  override def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    var acc = 0L
    val nb = u.numBytes()
    if (nb == u.numChars()) { // pure ASCII: fold the bytes in place
      var i = 0
      while (i < nb) {
        acc = java.lang.Math.floorMod(acc * 31L + (u.getByte(i) & 0xff), mod)
        i += 1
      }
    } else { // general: fold code points — split() is code-point aware and
      // ascii() returns the piece's code point, so the HOF folds one code
      // point per character (astral chars included)
      val s = u.toString
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        acc = java.lang.Math.floorMod(acc * 31L + cp.toLong, mod)
        i += Character.charCount(cp)
      }
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val nb = ctx.freshName("nb")
      val s = ctx.freshName("s")
      s"""
         |long $acc = 0L;
         |int $nb = $c.numBytes();
         |if ($nb == $c.numChars()) {
         |  for (int $i = 0; $i < $nb; $i++) {
         |    $acc = java.lang.Math.floorMod(
         |      $acc * 31L + (long) ($c.getByte($i) & 0xff), ${mod}L);
         |  }
         |} else {
         |  java.lang.String $s = $c.toString();
         |  int $i = 0;
         |  while ($i < $s.length()) {
         |    int ${i}_cp = $s.codePointAt($i);
         |    $acc = java.lang.Math.floorMod(
         |      $acc * 31L + (long) ${i}_cp, ${mod}L);
         |    $i += java.lang.Character.charCount(${i}_cp);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): StringRollingFp = copy(child = newChild)
}

/** Native Catalyst expression for the 57-bit finalizer avalanche
  * (`graft.ops.Sketch.mix57`): three xor-shifts interleaved with two
  * modular multiplications in the 2^57 ring. WHY native: any Column-DSL
  * formulation of `x·k mod 2^57` must reference its input more than once
  * (limb splitting needs 4 references, xor-shift needs 2), so the
  * composed tree grows EXPONENTIALLY through the five stages — ~128
  * copies of the child subtree — and consumers like the HLL rank chain
  * then duplicate THAT 52-fold: measured 6-15× query-level blowups from
  * planning/codegen alone (q139 1.1→12.7 s, q177 2→18.8 s). One opaque
  * node restores linear trees everywhere. The arithmetic is exact: in
  * JVM long arithmetic the wrapping product keeps the low 64 bits, and
  * `(x*k) & (2^57−1)` equals `x·k mod 2^57` because 57 ≤ 64 — the same
  * value the oracle's HUGEINT `%` computes (OperatorSpec pins the
  * expression against a BigInteger reference across the domain).
  */
case class Avalanche57(child: Expression, k1: Long, k2: Long)
  extends UnaryExpression {

  private val Mask = (1L << 57) - 1

  override def dataType: DataType = LongType
  override def checkInputDataTypes()
  : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"avalanche57 expects bigint, got $t")
    }

  override def nullSafeEval(input: Any): Any = {
    var h = input.asInstanceOf[Long]
    h ^= (h >>> 29)
    h = (h * k1) & Mask
    h ^= (h >>> 29)
    h = (h * k2) & Mask
    h ^= (h >>> 29)
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val h = ctx.freshName("h")
      s"""
         |long $h = $c;
         |$h ^= ($h >>> 29);
         |$h = ($h * ${k1}L) & ${Mask}L;
         |$h ^= ($h >>> 29);
         |$h = ($h * ${k2}L) & ${Mask}L;
         |$h ^= ($h >>> 29);
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): Avalanche57 = copy(child = newChild)
}

object StringFunctions {
  /** Column API for [[StringRollingFp]]. */
  def rolling_fp(text: Column, mod: Long): Column =
    GraftExpressionBridge.column(
      StringRollingFp(GraftExpressionBridge.expression(text), mod))

  /** Column API for [[Avalanche57]]. */
  def avalanche57(x: Column, k1: Long, k2: Long): Column =
    GraftExpressionBridge.column(
      Avalanche57(GraftExpressionBridge.expression(x), k1, k2))
}
