package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit hashes of a string's FastSS deletion neighborhood — the string
  * itself plus every variant reachable by deleting up to `k` code points
  * — as one fused native loop. Replaces the interpreted
  * transform(sequence(...)) → substr/concat → xxhash64 pipeline in the
  * fuzzy join's hot path: no per-variant string materialization (each
  * variant hashes by one pass over the retained code points — O(n) per
  * variant, sized for the short keys/names this blocking targets), no
  * nested higher-order lambdas, and the dedup is an in-place sort of a
  * small long[] instead of `array_distinct` over strings. The hash need
  * not match any SQL builtin: blocking keys only require that equal
  * variants hash equal (FNV-1a 64 over code points); a collision adds a
  * candidate the caller's exact verify then rejects.
  *
  * Deletions are CODE-POINT level, matching the character semantics of
  * `levenshtein` on both engines, so the neighborhood stays a lossless
  * candidate generator for non-ASCII text too.
  */
case class DeletionVariants(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1 && k <= 2, s"deletion_variants supports k in [1,2], got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "deletion_variants"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${t.sql}")
  }

  override protected def nullSafeEval(input: Any): Any =
    DeletionVariants.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      s"${ev.value} = graft.functions.DeletionVariants.compute($s, $k);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): DeletionVariants = copy(child = newChild)
}

object DeletionVariants {

  /** k=2 length bound: the two-deletion neighborhood is ~n²/2 variants,
    * which is already the wrong tool well before this limit (use
    * MinHash/n-gram blocking for long text); past it the variant-count
    * arithmetic itself would overflow Int.
    */
  private val MaxLenK2 = 10000

  /** k=1 length bound: the neighborhood is only n+1 variants, but each
    * hashes by an O(n) pass, so a long string (e.g. a document body
    * accidentally bound to a FUZZY_JOIN key descriptor) is O(n²) per
    * row — a silent stall rather than a loud failure. Larger than the
    * k=2 cap (the fan-out is linear, not quadratic) but still bounded.
    */
  private val MaxLenK1 = 20000

  /** Called from both interpreted eval and generated code. */
  def compute(s: UTF8String, k: Int): ArrayData = {
    val cps = s.toString.codePoints().toArray
    val n = cps.length
    if (k >= 2 && n > MaxLenK2)
      throw new IllegalArgumentException(
        s"deletion_variants k=2 on a $n-code-point string would emit " +
          s"~${n.toLong * (n - 1) / 2} variants (limit $MaxLenK2 code " +
          "points); block long text with MinHash/n-grams instead")
    if (n > MaxLenK1)
      throw new IllegalArgumentException(
        s"deletion_variants k=$k on a $n-code-point string costs O(n²) " +
          s"per row (limit $MaxLenK1 code points); block long text with " +
          "MinHash/n-grams instead")
    val cap = 1 + n + (if (k >= 2) n * (n - 1) / 2 else 0)
    val out = new Array[Long](cap)
    var m = 0
    // FNV-1a 64 over the retained code points, skipping up to two
    // deleted positions (skip = -1 means no deletion at that slot)
    def fnv(skipA: Int, skipB: Int): Long = {
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < n) {
        if (i != skipA && i != skipB) {
          h = (h ^ cps(i)) * 0x100000001b3L
        }
        i += 1
      }
      h
    }
    out(m) = fnv(-1, -1); m += 1
    var i = 0
    while (i < n) {
      out(m) = fnv(i, -1); m += 1
      if (k >= 2) {
        var j = i + 1
        while (j < n) { out(m) = fnv(i, j); m += 1; j += 1 }
      }
      i += 1
    }
    // dedup in place (adjacent equal code points yield equal variants)
    java.util.Arrays.sort(out, 0, m)
    var w = 0
    var r = 0
    while (r < m) {
      if (r == 0 || out(r) != out(r - 1)) { out(w) = out(r); w += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, w))
  }
}
