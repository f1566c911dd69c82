package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys.
  *
  * At 100 TB a hash join on a key with heavy hitters puts entire hot keys
  * on single reducers. Salting scatters each probe-side row into one of
  * `nSalts` sub-keys and replicates the build side `nSalts`×, so a hot key
  * spreads over `nSalts` reducers at the cost of a `nSalts`× build-side
  * blow-up — use for moderate-size build sides when AQE's skew-join split
  * (which handles the sort-merge case automatically) doesn't apply.
  *
  * The salt is a deterministic hash of the probe row's full content, so
  * task retries produce identical assignments (no `rand()` — retry-safe
  * determinism matters for exactly-once sinks).
  */
object SkewJoin {

  /** Inner equi-join `probe ⋈ build` on `key`, salted `nSalts` ways. */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String, nSalts: Int): DataFrame = {
    require(nSalts > 0, "nSalts must be positive")
    val saltedProbe = probe.withColumn("__salt",
      pmod(xxhash64(probe.columns.map(col).toIndexedSeq: _*), lit(nSalts)).cast("int"))
    val saltedBuild = build.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    saltedProbe.join(saltedBuild,
        saltedProbe(key) === saltedBuild(key) && saltedProbe("__salt") === saltedBuild("__salt"))
      .drop(saltedBuild(key)).drop("__salt")
  }
}
