package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale mechanics as reusable operators: skew-salted joins and
  * co-location helpers. These are the knobs SCALE.md prescribes when AQE
  * alone can't save a 100 TB job (pathological hot keys, repeated
  * co-partitioned joins).
  */
object ScaleOps {

  /** Salted equi-join for skewed keys: the big (probe) side gets a random
    * salt in [0, salts); the small (build) side is replicated once per
    * salt value, so a hot key's rows spread across `salts` reducers
    * instead of one straggler. Result is identical to
    * `big.join(small, keys)` — the salt only changes partitioning.
    *
    * Use when one side is too large to broadcast AND key skew is too
    * extreme for AQE's skew-join splitting (which only splits the
    * oversized partition, not the single hot KEY).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val salted = big.withColumn("__salt",
      (rand(seed = 42) * salts).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }

  /** Top hot keys by frequency — the diagnostic for choosing between
    * broadcast, salting, and AQE (run on a sample at scale).
    */
  def hotKeys(df: DataFrame, keys: Seq[String], topN: Int): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc)
      .limit(topN)

  /** Range-bucket a double column into equal-width buckets — the cheap
    * deterministic partitioner for band-style co-location.
    */
  def bucketize(c: Column, lo: Double, hi: Double, buckets: Int): Column =
    least(greatest(floor((c - lo) / ((hi - lo) / buckets)), lit(0)),
      lit(buckets - 1)).cast("int")
}
