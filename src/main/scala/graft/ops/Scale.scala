package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-handling utilities — the hand-rolled counterpart to AQE's
  * skew-join splitting, for when a join key is pathologically hot
  * (AQE handles sort-merge skew automatically in production; salting
  * is the explicit tool when the skewed side must hash-join or the
  * planner can't see the skew).
  */
object Scale {

  /** Salted equi-join: the big (skewed) side gets a deterministic salt
    * in [0, salts) derived from its whole row; the small side is
    * replicated once per salt value. The join key becomes (key, salt),
    * splitting each hot key's rows across `salts` reducers. Semantics
    * are identical to `big.join(small, key)` for any salt assignment —
    * determinism of the salt only matters for reproducible task sizing.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int): DataFrame = {
    val salted = big.withColumn("__salt",
      pmod(hash(struct(big.columns.toIndexedSeq.map(col): _*)), lit(salts)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
