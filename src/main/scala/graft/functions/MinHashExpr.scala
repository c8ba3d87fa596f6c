package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expressions for the production MinHash kernel family
  * ([[HashKernels.minhashFast]] / [[HashKernels.bandKeysFast]]).
  *
  * Why not the UDF they replace: a ScalaUDF sits outside whole-stage
  * codegen and pays CatalystTypeConverters both ways — every shingle
  * array is materialized as a boxed Seq[String] (one java.lang.String
  * DECODE per shingle) before the hash loop even starts, and the result
  * is converted back. These expressions read the UTF8String bytes in
  * place (no decode, no copy — FNV-1a consumes UTF-8 bytes, which is
  * exactly UTF8String's storage), return an UnsafeArrayData, and inline
  * into the WholeStageCodegen span via [[doGenCode]]. Signatures are
  * bit-identical to the UDF kernel (same FNV-1a base, same splitmix64
  * per-seed finalizers — FastMinHashSpec pins equality), so q84 and the
  * soak's production path are unchanged semantically.
  */
case class MinHashFastExpr(child: Expression, nSeeds: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_fast expects array<string>, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    MinHashFastExpr.compute(input.asInstanceOf[ArrayData], nSeeds)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashFastExpr.compute($c, $nSeeds);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashFastExpr {
  /** Shared by interpreted eval and generated code. */
  def compute(arr: ArrayData, nSeeds: Int): ArrayData = {
    val out = new Array[Long](nSeeds)
    java.util.Arrays.fill(out, Long.MaxValue)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      // a null shingle (containsNull=true upstream) contributes nothing —
      // mirrors the UDF kernel, whose Seq[String] inputs never carry nulls
      if (!arr.isNullAt(j)) {
        val s = arr.getUTF8String(j)
        var base = 0xcbf29ce484222325L // FNV-1a 64 over the raw UTF-8 bytes
        val len = s.numBytes()
        var i = 0
        while (i < len) {
          base = (base ^ (s.getByte(i) & 0xffL)) * 0x100000001b3L
          i += 1
        }
        var seed = 0
        while (seed < nSeeds) {
          var z = base ^ (seed * 0x9e3779b97f4a7c15L) // golden-ratio gamma
          z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L // splitmix64 finalizer
          z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
          z ^= z >>> 31
          if (z < out(seed)) out(seed) = z
          seed += 1
        }
      }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  def apply(shingles: Column, nSeeds: Int): Column =
    ColumnBridge.column(MinHashFastExpr(ColumnBridge.expression(shingles), nSeeds))
}

/** Fused MinHash-over-3-grams: computes exactly
  * `MinHashFastExpr(shingles3(tokens), nSeeds)` directly from the TOKEN
  * array, materializing nothing. Two observations make the fusion exact:
  * FNV-1a over the concatenated shingle string "t0 t1 t2" is FNV-1a over
  * t0's bytes, a 0x20 byte, t1's bytes, 0x20, t2's bytes — so the shingle
  * string never needs to exist; and a MIN is invariant under duplicates —
  * so the shingle dedup (a LinkedHashSet of Strings per doc in the UDF
  * kernel) can be skipped entirely. Replaces the dominant allocation cost
  * of the production signature path: zero Strings, zero sets, zero
  * intermediate arrays per document.
  */
case class MinHashTokensExpr(child: Expression, nSeeds: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_tokens expects array<string> (tokens), got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    MinHashTokensExpr.compute(input.asInstanceOf[ArrayData], nSeeds)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashTokensExpr.compute($c, $nSeeds);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashTokensExpr {
  def compute(arr: ArrayData, nSeeds: Int): ArrayData = {
    val out = new Array[Long](nSeeds)
    java.util.Arrays.fill(out, Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i + 2 < n) {
      // a window touching a null token (containsNull=true upstream) is
      // skipped whole — no partial shingles, mirroring the UDF kernel
      if (!arr.isNullAt(i) && !arr.isNullAt(i + 1) && !arr.isNullAt(i + 2)) {
        var base = 0xcbf29ce484222325L // FNV-1a 64 over "t[i] t[i+1] t[i+2]"
        var k = i
        while (k <= i + 2) {
          val s = arr.getUTF8String(k)
          val len = s.numBytes()
          var b = 0
          while (b < len) {
            base = (base ^ (s.getByte(b) & 0xffL)) * 0x100000001b3L
            b += 1
          }
          if (k < i + 2) base = (base ^ 0x20L) * 0x100000001b3L // ' '
          k += 1
        }
        var seed = 0
        while (seed < nSeeds) {
          var z = base ^ (seed * 0x9e3779b97f4a7c15L)
          z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
          z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
          z ^= z >>> 31
          if (z < out(seed)) out(seed) = z
          seed += 1
        }
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  def apply(tokens: Column, nSeeds: Int): Column =
    ColumnBridge.column(MinHashTokensExpr(ColumnBridge.expression(tokens), nSeeds))
}

/** Band keys over a long MinHash signature: band b = order-dependent
  * splitmix64 chain of its rowsPerBand entries. Bit-identical to the UDF
  * variant it replaces. */
case class BandKeysFastExpr(child: Expression, nBands: Int, rowsPerBand: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"band_keys_fast expects array<bigint>, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    BandKeysFastExpr.compute(input.asInstanceOf[ArrayData], nBands, rowsPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BandKeysFastExpr.compute($c, $nBands, $rowsPerBand);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BandKeysFastExpr {
  def compute(mh: ArrayData, nBands: Int, rowsPerBand: Int): ArrayData = {
    // fail fast with a diagnosable message: a short signature would
    // otherwise read out of bounds (or, worse, silently hash garbage),
    // and a null entry (containsNull=true upstream) has no defined place
    // in the order-dependent chain
    require(mh.numElements() >= nBands * rowsPerBand,
      s"band_keys_fast: signature has ${mh.numElements()} entries, " +
        s"need nBands*rowsPerBand = ${nBands * rowsPerBand}")
    val out = new Array[Long](nBands)
    var b = 0
    while (b < nBands) {
      var acc = 0x9e3779b97f4a7c15L * (b + 1)
      var r = 0
      while (r < rowsPerBand) {
        val idx = b * rowsPerBand + r
        require(!mh.isNullAt(idx),
          s"band_keys_fast: null signature entry at $idx — minhash " +
            "signatures are non-null by construction")
        var z = acc ^ mh.getLong(idx)
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        acc = z ^ (z >>> 31)
        r += 1
      }
      out(b) = acc
      b += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  def apply(signature: Column, nBands: Int, rowsPerBand: Int): Column =
    ColumnBridge.column(
      BandKeysFastExpr(ColumnBridge.expression(signature), nBands, rowsPerBand))
}
