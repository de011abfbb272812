package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd text primitives replacing interpreted higher-order
  * lambdas (`transform`/`aggregate`/`filter`) in the hot per-row paths of
  * the text-analysis and dedup packs. HOF lambdas run outside whole-stage
  * codegen; on corpus-wide scans the fused loop is the difference between
  * a codegen'd pipeline and an interpreted one (same finding that
  * motivated [[LongDotProduct]] and [[SimHash60]]).
  */

/** All word n-grams of an array of tokens, space-joined — the fused
  * equivalent of `transform(sequence(1, size(w)-(n-1)), i =>
  * concat_ws(" ", w[i], …, w[i+n-1]))`. Fewer than n tokens yields an
  * empty array. Null tokens are skipped by the join (concat_ws
  * semantics), matching the lambda formulation element for element.
  */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"n-gram size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case ArrayType(org.apache.spark.sql.types.NullType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING>, got ${t.sql}")
  }

  private val Sep = UTF8String.fromString(" ")

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = math.max(0, arr.numElements() - (n - 1))
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) {
        if (!arr.isNullAt(i + j)) parts(j) = arr.getUTF8String(i + j)
        j += 1
      }
      out(i) = UTF8String.concatWs(Sep, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val utf8 = classOf[UTF8String].getName
      val sep = ctx.addReferenceObj("sep", Sep, utf8)
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      val parts = (0 until n)
        .map(j => s"$a.isNullAt($i + $j) ? null : $a.getUTF8String($i + $j)")
        .mkString(", ")
      s"""
         |int $m = $a.numElements() - ${n - 1};
         |if ($m < 0) $m = 0;
         |$utf8[] $out = new $utf8[$m];
         |for (int $i = 0; $i < $m; $i++) {
         |  $out[$i] = $utf8.concatWs($sep, new $utf8[] { $parts });
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

/** Count of array elements contained in a fixed string set — the fused
  * equivalent of `size(filter(arr, x => array_contains(set, x)))`. Null
  * elements never match (array_contains(set, null) is null, which the
  * lambda filter drops). The set is a constructor constant probed as a
  * hash set per element, so membership is O(1) inside the codegen loop.
  */
case class CountInSet(child: Expression, setWords: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "count_in"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case ArrayType(org.apache.spark.sql.types.NullType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING>, got ${t.sql}")
  }

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    setWords.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    var cnt = 0
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) cnt += 1
      i += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val setRef = ctx.addReferenceObj("set", set, "java.util.HashSet")
      val cnt = ctx.freshName("cnt")
      val i = ctx.freshName("i")
      s"""
         |int $cnt = 0;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  if (!$a.isNullAt($i) && $setRef.contains($a.getUTF8String($i))) $cnt++;
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CountInSet =
    copy(child = newChild)
}

/** Order-sensitive polynomial rolling fingerprint of a token array:
  * fold((acc * 31 + md5_60(token) % 10^6) mod (10^9+7)) — the fused
  * equivalent of `aggregate(transform(w, x => conv(substring(md5(x), 1,
  * 15), 16, 10) % 10^6), 0L, (acc, x) => (acc*31+x) % (10^9+7))`. The
  * 60-bit md5 prefix is decoded straight from digest bytes (identical to
  * the hex-string decode: bytes 0-6 in full plus the high nibble of byte
  * 7). A null token nulls the fingerprint, matching the lambda fold where
  * a null code poisons the accumulator.
  */
case class TextFingerprint(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "text_fingerprint"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case ArrayType(org.apache.spark.sql.types.NullType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING>, got ${t.sql}")
  }

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val md = java.security.MessageDigest.getInstance("MD5")
    var acc = 0L
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val d = md.digest(arr.getUTF8String(i).getBytes)
      val v = ((d(0) & 0xffL) << 52) | ((d(1) & 0xffL) << 44) |
        ((d(2) & 0xffL) << 36) | ((d(3) & 0xffL) << 28) |
        ((d(4) & 0xffL) << 20) | ((d(5) & 0xffL) << 12) |
        ((d(6) & 0xffL) << 4) | ((d(7) & 0xf0L) >>> 4)
      acc = (acc * 31L + v % 1000000L) % 1000000007L
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      // one digest instance per operator instance, reset by digest() —
      // not static: codegen'd operators are single-threaded per instance
      val md = ctx.addMutableState("java.security.MessageDigest", "graftMd5",
        v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
                |catch (java.security.NoSuchAlgorithmException e) {
                |  throw new RuntimeException(e);
                |}""".stripMargin)
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  byte[] $d = $md.digest($a.getUTF8String($i).getBytes());
         |  long $v = (($d[0] & 0xffL) << 52) | (($d[1] & 0xffL) << 44) |
         |    (($d[2] & 0xffL) << 36) | (($d[3] & 0xffL) << 28) |
         |    (($d[4] & 0xffL) << 20) | (($d[5] & 0xffL) << 12) |
         |    (($d[6] & 0xffL) << 4) | (($d[7] & 0xf0L) >>> 4);
         |  $acc = ($acc * 31L + $v % 1000000L) % 1000000007L;
         |}
         |if (!${ev.isNull}) ${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TextFingerprint =
    copy(child = newChild)
}
