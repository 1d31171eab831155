package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-safe equi-join by key salting: the big side's hot keys are
  * spread across `salts` shuffle partitions by an extra deterministic
  * salt column; the small side replicates once per salt value. The
  * result set is EXACTLY the plain join's — only the shuffle layout
  * changes.
  *
  * AQE's skew-join split handles moderate skew on sort-merge joins; the
  * explicit salt is the standard remedy when one key dominates so hard
  * that even a split partition exceeds executor memory (the "null key" /
  * "default tenant" shapes every 100 TB corpus has). Salting costs a
  * `salts`× replication of the SMALL side only — keep it the dimension
  * side.
  */
object SaltedJoin {

  /** Inner equi-join of `big` ⋈ `small` on `keys` with `salts`-way
    * spreading. The salt derives from a hash of the big row's key
    * columns plus a per-row disambiguator, so assignment is stable,
    * codegen'd, and needs no RNG. */
  def join(big: DataFrame, small: DataFrame, keys: Seq[String],
           salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val bigSalted = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col).toSeq: _*)), lit(salts.toLong)))
    val smallSalted = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    bigSalted.join(smallSalted, keys :+ "__salt").drop("__salt")
  }
}
