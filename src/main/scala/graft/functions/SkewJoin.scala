package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manual skew mitigation for shuffle joins: salt the skewed (big) side
  * into `salts` sub-keys and replicate the small side across all salts,
  * so one hot key spreads over `salts` reducers instead of one straggler
  * task. AQE's skew-join handles most cases at runtime; this helper is
  * for the planned-ahead case (known hot keys, deterministic layout) and
  * as the building block when the small side is too big to broadcast but
  * small enough to replicate `salts` times.
  *
  * The salt is derived from a hash of the big side's whole row, so it is
  * deterministic under retries (no rand()-based nondeterminism inside a
  * shuffle, which can duplicate/lose rows on task retry).
  */
object SkewJoin {

  def saltedEquiJoin(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, salts: Int): DataFrame = {
    require(salts > 0)
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.toIndexedSeq.map(col): _*)), lit(salts)))
    val saltedSmall = small
      .withColumn("__salt", explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    saltedBig.join(saltedSmall,
      saltedBig(bigKey) === saltedSmall(smallKey) &&
        saltedBig("__salt") === saltedSmall("__salt"))
      .drop("__salt")
  }
}
