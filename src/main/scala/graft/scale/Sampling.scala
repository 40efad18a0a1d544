package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-independent sampling/splitting for training-data
  * pipelines. Seeded RNG samplers (`df.sample`) are engine- and
  * partitioning-dependent; hashing the ID instead makes membership a pure
  * function of the row — reproducible across engines, runs, cluster sizes,
  * and incremental re-runs (a new data drop never reshuffles old rows'
  * split assignment). Map-only: no shuffle, no state.
  */
object Sampling {

  /** Uniform bucket in [0, 100) from the id's md5 (16 bits → mod 100). */
  def hashBucket(id: Column): Column =
    (conv(substring(md5(id.cast("string")), 1, 4), 16, 10).cast("int") % 100)

  /** Named split assignment by cumulative percentage: e.g.
    * `Seq("train" -> 80, "val" -> 10, "test" -> 10)`.
    */
  def deterministicSplit(df: DataFrame, idCol: String,
                         splits: Seq[(String, Int)]): DataFrame = {
    require(splits.map(_._2).sum == 100, "split percentages must sum to 100")
    val b = hashBucket(col(idCol))
    val cum = splits.scanLeft(0)(_ + _._2).tail
    val expr = splits.zip(cum).foldRight(lit(splits.last._1): Column) {
      case (((name, _), hi), acc) => when(b < hi, lit(name)).otherwise(acc)
    }
    df.withColumn("split", expr)
  }

  /** Deterministic p% sample (hash-gated filter — pushdown-friendly). */
  def deterministicSample(df: DataFrame, idCol: String, pct: Int): DataFrame =
    df.where(hashBucket(col(idCol)) < pct)

  /** Stratified split with EXACT per-stratum proportions: rows rank within
    * their stratum by md5(id) (deterministic, engine-independent) and band on
    * the rank's percentage position `ceil(rank*100/n)`, so every stratum
    * lands within one row of its target fraction — `deterministicSplit`'s
    * hash gate only hits fractions in expectation, which skews small or
    * imbalanced strata. (NOT `ntile(100)`: a stratum smaller than 100 rows
    * fills tiles 1..n one row each, dumping the whole stratum in the first
    * band.)
    *
    * Scale shape: `row_number() over (partition by stratum)` would put each
    * ENTIRE stratum through one window task — strata are few and huge
    * (source, language), so that's a single task sorting billions of rows at
    * 100 TB. `Scan.keyedRank` instead range-partitions on (stratum, hash) so
    * a big stratum spans many parallel tasks, and stitches ranks with a
    * summary-sized offset join. No per-key single-task stage anywhere.
    */
  def stratifiedSplit(df: DataFrame, idCol: String, strataCol: String,
                      splits: Seq[(String, Int)]): DataFrame = {
    require(splits.map(_._2).sum == 100, "split percentages must sum to 100")
    val ranked = graft.core.Scan.keyedRank(
      df.withColumn("__h", md5(col(idCol).cast("string"))),
      strataCol, "__h", "__rk", "__n")
    val tile = ceil(col("__rk") * lit(100.0) / col("__n"))
    val cum = splits.scanLeft(0)(_ + _._2).tail
    val expr = splits.zip(cum).foldRight(lit(splits.last._1): Column) {
      case (((name, _), hi), acc) => when(tile <= hi, lit(name)).otherwise(acc)
    }
    ranked.withColumn("split", expr).drop("__h", "__rk", "__n")
  }
}
