package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the 32-bit SimHash kernel — the
  * preference-ladder top rung (SURVEY §7.4): participates in whole-stage
  * codegen via a static call, no closure serialization, null handled by the
  * framework.
  *
  * Semantics identical to the SQL-oracle formulation: over the distinct
  * whitespace tokens of the lower-cased, whitespace-collapsed text, bit b is
  * set iff sum(2*bit_b(md5(token)) - 1) > 0, where bit_b(h) = bit (3 - b%4)
  * of hex digit b/4 of the md5 hex string.
  */
case class SimHash32(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    SimHash32.compute(v.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash32.compute($c.toString())")
  override protected def withNewChildInternal(c: Expression): SimHash32 = copy(c)
  override def prettyName: String = "simhash32"
}

object SimHash32 {
  /** Static kernel referenced from generated code. */
  def compute(text: String): Long = {
    val toks = text.replaceAll("\\s+", " ").trim
      .toLowerCase(java.util.Locale.ROOT).split(' ').filter(_.nonEmpty).distinct
    val counts = new Array[Int](32)
    toks.foreach { t =>
      val d = java.security.MessageDigest.getInstance("MD5").digest(t.getBytes("UTF-8"))
      var b = 0
      while (b < 32) {
        val nibble = if (b % 8 < 4) (d(b / 8) >> 4) & 0xf else d(b / 8) & 0xf
        counts(b) += 2 * ((nibble >> (3 - b % 4)) & 1) - 1
        b += 1
      }
    }
    var sh = 0L
    var b = 0
    while (b < 32) { if (counts(b) > 0) sh |= 1L << b; b += 1 }
    sh
  }

  /** Column-API entry point (GraftBridge adapts Expression -> Column). */
  def apply(c: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      SimHash32(org.apache.spark.sql.GraftBridge.expression(c)))
}
