package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins (SURVEY §4 / build brief "salting
  * for skew"). A single hot key — one customer with half the orders, one
  * document near-dup cluster — turns a hash-partitioned join into one
  * straggler reducer. Salting spreads it: the probe (large, skewed) side
  * scatters each row across `buckets` sub-keys via a deterministic salt,
  * and the build side replicates every row once per salt value, so the
  * hot key's rows land on `buckets` reducers instead of one.
  *
  * AQE's skew-join split (spark.sql.adaptive.skewJoin) handles most skew
  * at runtime by splitting oversized partitions; explicit salting is the
  * tool when one KEY (not just one partition) exceeds what splitting can
  * balance, or when AQE is unavailable (e.g. inside a cached stage).
  * Cost model: build side grows `buckets`×, so use it for
  * moderate-cardinality build sides and keep `buckets` near the
  * straggler ratio, not higher.
  */
object Skew {

  /** Inner/left equi-join of `probe` ⋈ `build` on `keys`, salted across
    * `buckets` reducers.
    *
    * @param saltSource deterministic per-row expression on the probe side
    *   that varies WITHIN a key (a line number, an event id) — the salt
    *   is `pmod(hash(saltSource), buckets)`. A constant would defeat the
    *   scatter; a random would break retry determinism.
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, keys: Seq[String],
                 buckets: Int, saltSource: Column,
                 joinType: String = "inner"): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    require(joinType == "inner" || joinType == "left",
      s"salted join supports inner/left (build side is replicated), got $joinType")
    val salted = probe.withColumn("__salt", pmod(hash(saltSource), lit(buckets)))
    val replicated = build.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, (keys :+ "__salt").toIndexedSeq, joinType).drop("__salt")
  }
}
