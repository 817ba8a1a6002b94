package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted join for skewed keys — the manual countermeasure when
  * AQE's skew-join splitting isn't available or the skew is extreme
  * (one key holding a double-digit percentage of a 100 TB fact
  * table).
  *
  * Mechanics: the skewed (big) side gets a deterministic salt in
  * [0, salt) derived by hashing the whole row's spread column, so
  * one hot key fans out over `salt` reducers; the small side is
  * replicated `salt`× via explode(sequence(...)). Join key becomes
  * (key, salt). Row multiplicity is preserved exactly — each big row
  * joins the single replica with its salt value.
  *
  * Cost model: replicating the small side `salt`× is cheap when
  * |small| ≪ |big| (the usual skew shape); the win is the hot key's
  * reducer shrinking by `salt`×.
  */
object SkewJoin {

  /** Inner equi-join `big ⋈ small` on `key`, with the big side's hot
    * keys spread over `salt` partitions. `spreadCol` must be a big-
    * side column with per-row variety (an id/line number), used only
    * to derive the salt deterministically. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      spreadCol: String, salt: Int = 8): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(hash(col(spreadCol)), lit(salt)))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedBig.join(replicatedSmall, Seq(key, "__salt"))
      .drop("__salt")
  }
}
