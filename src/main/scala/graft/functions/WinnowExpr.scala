package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Fused winnowing fingerprints (Schleimer–Wilkerson–Aiken 2003): the
  * entire gram-hash → sliding-window-min → distinct kernel of
  * [[graft.operators.DedupOps.winnowFingerprintsHof]] as ONE native
  * expression over the token array.
  *
  * Why: the higher-order-function chain it replaces evaluates its lambda
  * bodies INTERPRETED — per gram it builds the joined shingle String
  * (UTF8String concat), md5s it, renders the 32-char hex String,
  * substrings it, and base-16-parses it through `conv`; per window it
  * allocates a slice. At the sf0.1 gate that kernel alone was 7.6 s
  * (the slowest of 135 queries). This expression feeds the MD5 digest
  * incrementally from the raw UTF8String bytes (no shingle string, no
  * hex string, no slices), reuses one thread-local MessageDigest, runs
  * an O(n) monotonic-deque sliding minimum, and inlines into the
  * WholeStageCodegen span via [[doGenCode]].
  *
  * Bit-parity contract (WinnowExprSpec pins it array-for-array against
  * the HOF chain): gram hash = first 8 hex chars of md5("t_i … t_{i+k-1}"
  * joined by a single 0x20, null tokens skipped exactly like concat_ws)
  * parsed as an unsigned base-16 long; fingerprints = per-window minima
  * of w consecutive gram hashes, deduplicated in FIRST-OCCURRENCE order
  * (array_distinct's order). Docs with fewer than k + w − 1 tokens yield
  * an empty array (the caller filters them, mirroring the HOF path).
  */
case class WinnowMd5Expr(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k >= 1 && w >= 1, s"winnow_md5 needs k >= 1 and w >= 1, got k=$k w=$w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"winnow_md5 expects array<string> (tokens), got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    WinnowMd5Expr.compute(input.asInstanceOf[ArrayData], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WinnowMd5Expr.compute($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowMd5Expr {

  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private val SPACE = Array[Byte](0x20)

  /** Shared by interpreted eval and generated code. */
  def compute(tokens: ArrayData, k: Int, w: Int): ArrayData = {
    val n = tokens.numElements()
    val nGrams = n - (k - 1)
    if (nGrams < w) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)

    val md = digest.get()
    val grams = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      md.reset()
      // concat_ws semantics: null tokens contribute nothing, separators
      // only between EMITTED tokens (so [a, null, b] joins to "a b")
      var emitted = false
      var j = i
      while (j < i + k) {
        if (!tokens.isNullAt(j)) {
          if (emitted) md.update(SPACE)
          val s = tokens.getUTF8String(j)
          md.update(s.getBytes) // raw UTF-8 — exactly what Catalyst md5 hashes
          emitted = true
        }
        j += 1
      }
      val d = md.digest()
      // first 8 hex chars of the digest = first 4 bytes, as an unsigned
      // 32-bit value — identical to conv(substring(hex, 1, 8), 16, 10)
      grams(i) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      i += 1
    }

    // O(n) sliding minimum via a monotonic index deque, then distinct in
    // first-occurrence order (array_distinct's contract). Window count is
    // nGrams - w + 1 >= 1 here.
    val nWin = nGrams - w + 1
    val deque = new Array[Int](nGrams)
    var head = 0
    var tail = 0 // exclusive
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new Array[Long](nWin)
    var nOut = 0
    i = 0
    while (i < nGrams) {
      while (tail > head && grams(deque(tail - 1)) >= grams(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) {
        val m = grams(deque(head))
        if (seen.add(m)) { out(nOut) = m; nOut += 1 }
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(out, nOut))
  }

  def apply(tokens: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowMd5Expr(ColumnBridge.expression(tokens), k, w))
}
