package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the 64-bit SimHash kernel — the
  * preference-ladder top rung (SURVEY §7.4): participates in whole-stage
  * codegen via a static call, no closure serialization, null handled by the
  * framework.
  *
  * 64 bits (not 32) because a corpus-scale fingerprint must survive the
  * birthday bound: a 32-bit hash saturates with collisions near ~10^5
  * distinct documents, and its 8-bit pigeonhole blocks give only 256 join
  * keys per block (candidate pairs grow O(N^2/256)). 64-bit fingerprints
  * with 16-bit blocks give 65,536 keys per block — the blocked candidate
  * join stays linear-ish far beyond 10^9 documents.
  *
  * Semantics identical to the SQL-oracle formulation: over the distinct
  * whitespace tokens of the lower-cased, whitespace-collapsed text, bit b is
  * set iff sum over tokens of (2*bit_b(md5(token)) - 1) > 0, where
  * bit_b(h) = bit (3 - b%4) of hex digit b/4 of the md5 hex string.
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    SimHash64.compute(v.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.compute($c.toString())")
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(c)
  override def prettyName: String = "simhash64"
}

object SimHash64 {
  /** Static kernel referenced from generated code. */
  def compute(text: String): Long = {
    val toks = text.replaceAll("\\s+", " ").trim
      .toLowerCase(java.util.Locale.ROOT).split(' ').filter(_.nonEmpty).distinct
    val counts = new Array[Int](64)
    toks.foreach { t =>
      val d = java.security.MessageDigest.getInstance("MD5").digest(t.getBytes("UTF-8"))
      var b = 0
      while (b < 64) {
        val nibble = if (b % 8 < 4) (d(b / 8) >> 4) & 0xf else d(b / 8) & 0xf
        counts(b) += 2 * ((nibble >> (3 - b % 4)) & 1) - 1
        b += 1
      }
    }
    var sh = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) sh |= 1L << b; b += 1 }
    sh
  }

  /** Column-API entry point (GraftBridge adapts Expression -> Column). */
  def apply(c: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      SimHash64(org.apache.spark.sql.GraftBridge.expression(c)))
}
