package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared vector primitives for the dedup / similarity packs.
  *
  * Embeddings are float columns; every similarity computation goes through
  * integer quantization (floor(x*1e6+0.5), exact in IEEE doubles) so that
  * dot products are exact BIGINT sums and the final cosine double is a
  * pure function of identical integers in Spark and the DuckDB oracle.
  */
private[queries] object Vec {
  /** Quantize a float array column to exact BIGINTs, via the fused
    * native expression (graft.functions.QuantizeVec) — identical values
    * to the `transform(..., floor(x*1e6+0.5))` lambda it replaces, but
    * inside whole-stage codegen. Callers must have called
    * [[ensureRegistered]] on the session first (every similarity call
    * site already does, for [[dotQ]]).
    */
  def quant(c: Column): Column =
    graft.functions.GraftFunctions.quantVec(c)

  /** Exact integer dot product of two quantized array columns, via the
    * codegen'd native expression (graft.functions.LongDotProduct). Callers
    * must have called [[ensureRegistered]] on the session first.
    */
  def dotQ(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.longDot(a, b)

  /** Register graft native functions in this session (idempotent). */
  def ensureRegistered(s: org.apache.spark.sql.SparkSession): Unit =
    graft.functions.GraftFunctions.register(s)

  /** Cosine from quantized vectors + precomputed integer square norms.
    * Zero-norm vectors yield NULL (nullif guard) — Spark 4 runs ANSI mode
    * by default, where a bare /0.0 throws while the DuckDB oracle
    * returns NULL.
    */
  def cosineQ(a: Column, b: Column, na: Column, nb: Column): Column =
    dotQ(a, b).cast("double") /
      nullif(sqrt(na.cast("double")) * sqrt(nb.cast("double")), lit(0.0))

  /** Deterministic pseudo-random hyperplane component in [-1000, 1000]:
    * first 15 hex chars of md5("j_d") decoded to a 60-bit int, mod 2001,
    * shifted. Both engines derive the same value from the same md5.
    */
  def planeComp(j: Int, d: Int): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${j}_$d".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16) % 2001L - 1000L
  }

  /** Nearest-centroid cell assignment with ZERO shuffle: the centroid
    * slice (vec_id ∈ [centLo, centLo+centN), control-plane sized) is
    * collected once and folded into a single codegen'd argmin projection
    * over (−cosine, cid) structs — highest cosine wins, ties to the
    * lowest cid, matching the oracle's ROW_NUMBER(ORDER BY ccos DESC,
    * cid). `base` must carry (vec_id, qe, nrm). Shared by the SemDeDup
    * blocking step and the k-means Lloyd step.
    */
  def argminCellAssign(base: org.apache.spark.sql.DataFrame,
      centLo: Long, centN: Long): org.apache.spark.sql.DataFrame = {
    val cents = base
      .filter(col("vec_id") >= centLo && col("vec_id") < centLo + centN)
      .select((col("vec_id") - centLo).as("cid"), col("qe"), col("nrm"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(2)))
      .sortBy(_._1)
    argminAssignWith(base, cents)
  }

  /** [[argminCellAssign]] with an explicit centroid array — the building
    * block the iterative k-means fit rebuilds each round (a FRESH plan
    * per iteration: loop state lives in the collected centroids, so
    * lineage never grows). Adds `cell` and the winning `ccos`.
    */
  def argminAssignWith(base: org.apache.spark.sql.DataFrame,
      cents: Seq[(Long, Seq[Long], Long)]): org.apache.spark.sql.DataFrame = {
    // ONE fused expression node (graft.functions.ArgminCosine) instead of
    // the k-struct array_min spelling: same semantics and bit-identical
    // cosines (NULL never wins, ties to the lowest cid, all-NULL → lowest
    // cid with NULL ccos), but the plan carries a flat reference array
    // rather than a ~k·d-node tree — the tree form sent constraint
    // propagation into minutes of driver time once a Filter sat above an
    // alias of it (q_embed_outliers: 113 s → <2 s), and re-planned per
    // AQE stage.
    ensureRegistered(base.sparkSession)
    val sorted = cents.sortBy(_._1)
    val am = graft.functions.GraftFunctions.argminCos(
      col("qe"), col("nrm"),
      sorted.map(_._1).toArray,
      sorted.flatMap(_._2).toArray,
      sorted.map(_._3).toArray)
    base
      .withColumn("g_am", am)
      .withColumn("cell", col("g_am").getField("cell"))
      .withColumn("ccos", col("g_am").getField("ccos"))
      .drop("g_am")
  }

  /** DuckDB CTE chain mirroring [[argminCellAssign]]: defines q, n, cent,
    * scored, and assign(vec_id, qe, nrm, cell). Use as `WITH $frag ...`.
    */
  def oArgminAssign(centLo: Long, centN: Long,
      keepCcos: Boolean = false): String =
    s"""q AS (SELECT vec_id, $oQuant AS qe FROM embeddings),
       |n AS (SELECT vec_id, qe, list_sum([x*x for x in qe]) AS nrm FROM q),
       |cent AS (SELECT vec_id - $centLo AS cid, qe AS ce, nrm AS cnrm
       |  FROM n WHERE vec_id >= $centLo AND vec_id < ${centLo + centN}),
       |scored AS (
       |  SELECT n.vec_id, n.qe, n.nrm, c.cid,
       |    ${oCosineQ("n.qe", "c.ce", "n.nrm", "c.cnrm")} AS ccos
       |  FROM n CROSS JOIN cent c),
       |assign AS (
       |  SELECT vec_id, qe, nrm, cid AS cell${if (keepCcos) ", ccos" else ""} FROM (
       |    SELECT *, ROW_NUMBER() OVER (
       |      PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rn
       |    FROM scored) WHERE rn = 1)""".stripMargin

  /** DuckDB CTE chain mirroring [[Similarity.fitCentroids]]: over base
    * relation `$base` (vec_id, qe, nrm), emits `fc_*` intermediates
    * and the final `$cent`(cid, ce, cnrm) — stride seed sample, argmin
    * assignment to seeds, one floor-of-mean Lloyd round, empty cells
    * keeping their seed. Use as `WITH ..., ${oFittedCent(k, "n")} ...`.
    */
  def oFittedCent(cells: Int, base: String,
      cent: String = "cent"): String =
    s"""fc_cnt AS (SELECT COUNT(*) AS n_corpus FROM $base),
       |fc_seeds AS (
       |  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid,
       |    qe AS ce, nrm AS cnrm
       |  FROM $base, fc_cnt
       |  WHERE vec_id % greatest(1, n_corpus // $cells) = 0
       |  ORDER BY vec_id LIMIT $cells),
       |fc_scored0 AS (SELECT b.vec_id, b.qe, s.cid,
       |    ${oCosineQ("b.qe", "s.ce", "b.nrm", "s.cnrm")} AS ccos
       |  FROM $base b CROSS JOIN fc_seeds s),
       |fc_assign0 AS (SELECT vec_id, qe, cid AS cell FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
       |      ORDER BY ccos DESC, cid) AS rn
       |    FROM fc_scored0) WHERE rn = 1),
       |fc_x AS (SELECT cell, unnest(
       |    [{dim: i, comp: qe[i]} for i in generate_series(1, len(qe))],
       |    recursive := true) FROM fc_assign0),
       |fc_mean0 AS (SELECT cell, dim,
       |    CAST(floor(CAST(sum(comp) AS DOUBLE) / count(*)) AS BIGINT) AS m
       |  FROM fc_x GROUP BY cell, dim),
       |fc_fit0 AS (SELECT cell AS cid, list(m ORDER BY dim) AS ce
       |  FROM fc_mean0 GROUP BY cell),
       |$cent AS (SELECT s.cid, COALESCE(f.ce, s.ce) AS ce,
       |    list_sum([x*x for x in COALESCE(f.ce, s.ce)]) AS cnrm
       |  FROM fc_seeds s LEFT JOIN fc_fit0 f ON s.cid = f.cid)"""
      .stripMargin

  /** DuckDB fragments mirroring the above. */
  val oQuant: String =
    "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)*1000000.0+0.5) AS BIGINT))"
  def oDotQ(a: String, b: String): String =
    s"list_sum([$a[i]*$b[i] for i in generate_series(1, len($a))])"
  def oCosineQ(a: String, b: String, na: String, nb: String): String =
    s"CAST(${oDotQ(a, b)} AS DOUBLE) / nullif(sqrt(CAST($na AS DOUBLE)) * sqrt(CAST($nb AS DOUBLE)), 0.0)"
  val oPlaneComp: String = // comp(j, d) with j,d in scope
    "(list_sum([(CAST(strpos('0123456789abcdef', substr(md5(CAST(j AS VARCHAR)||'_'||CAST(d AS VARCHAR)), i, 1)) AS BIGINT)-1) << (4*(15-i)) for i in generate_series(1,15)]) % 2001) - 1000"
}
