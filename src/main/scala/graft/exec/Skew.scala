package graft.exec

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution AQE can't fix (e.g. the
  * skewed side is the OUTPUT of an exchange AQE already coalesced, or the
  * join is bucketed so AQE skew-splitting is bypassed).
  *
  * `saltedJoin` explodes the small side `saltFactor`× and spreads the big
  * side's hot keys across `saltFactor` shuffle partitions: join key becomes
  * (key, salt) with salt = crc32(whole row) % saltFactor on the big side and
  * explode(0..saltFactor-1) on the small side. For the supported join types
  * (inner / left / left_semi / left_anti / cross — where unmatched
  * small-side rows never surface) results are identical to the plain join;
  * the shuffle is `saltFactor`-way wider on hot keys.
  */
object Skew {

  private val SAFE_TYPES =
    Set("inner", "left", "leftouter", "leftsemi", "leftanti", "cross",
      "semi", "anti") // Spark accepts the short aliases too

  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      joinType: String = "inner", saltFactor: Int = 8): DataFrame = {
    require(saltFactor > 0)
    // right/full outer would emit each UNMATCHED small-side row saltFactor
    // times (one per exploded salt copy) — only types where unmatched
    // small-side rows never surface are allowed.
    require(SAFE_TYPES.contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports inner/left/left_semi/left_anti/cross, not $joinType")
    // per-row counter salt, NOT a row-content hash: a hot key whose rows
    // are exact duplicates (replayed logs, placeholder rows - the classic
    // skew shape) hashes every copy to ONE salt and nothing spreads. The
    // counter assigns consecutive rows round-robin salts regardless of
    // content; any assignment is correct, so its nondeterminism across
    // retries is harmless.
    val bigS = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(saltFactor.toLong)).cast("int"))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    bigS.join(smallS, keys :+ "__salt", joinType).drop("__salt")
  }
}
