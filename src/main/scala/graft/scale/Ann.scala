package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Row shape for a k-means codebook entry (top-level for the encoder). */
case class KmeansCell(cell: Long, vec: Seq[Double])

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Baseline: brute-force cosine top-k (one codegen'd pass, no shuffle until
  * the tiny top-k sort). Scale path: random-hyperplane LSH bucketing — the
  * bucket id is computed relationally (posexplode × broadcast weight table →
  * partial-aggregated sign sums), so bucketing 10^9 vectors is one
  * map-side-combined aggregation; candidate generation then joins on the
  * bucket key only.
  */
object Ann {

  /** Cosine similarity between two double arrays via the native codegen'd
    * `ArrayDot` expression (one fused loop per product inside whole-stage
    * codegen — the HOF zip_with/aggregate formulation allocates a zipped
    * array and evaluates lambdas outside codegen; bit-identical results,
    * see ArrayDotSpec).
    */
  def cosine(a: Column, b: Column): Column = {
    val dot = graft.expr.GraftFunctions.arrayDot(a, b)
    val na = sqrt(graft.expr.GraftFunctions.arrayDot(a, a))
    val nb = sqrt(graft.expr.GraftFunctions.arrayDot(b, b))
    // zero vectors → null, not an ANSI division-by-zero error (Spark 4
    // default ANSI mode makes x/0 throw)
    val denom = na * nb
    when(denom =!= 0.0, dot / denom)
  }

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Brute-force cosine top-k of `df`'s `embCol` against the single query
    * row `queryDf` (one row, column `embCol`). The query side is broadcast;
    * the scan is a single pass; ordering is (rounded sim desc, id) for
    * determinism.
    */
  def cosineTopK(df: DataFrame, idCol: String, embCol: String,
                 queryDf: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queryDf.select(asDouble(col(embCol)).as("__q")))
    df.crossJoin(q)
      .select(col(idCol),
        round(cosine(asDouble(col(embCol)), col("__q")), 6).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** Plane count for a corpus of `n` vectors targeting ~`targetBucket`
    * vectors per bucket: planes ≈ log2(n / targetBucket). With a FIXED plane
    * count the within-bucket candidate set grows linearly with the corpus
    * (quadratic pair work); growing planes with n keeps buckets constant-size
    * so the bucketed join's cost stays linear at any scale.
    */
  def autoPlanes(n: Long, targetBucket: Long = 64L): Int = {
    require(n > 0 && targetBucket > 0)
    math.max(1, math.ceil(math.log(n.toDouble / targetBucket) / math.log(2)).toInt)
  }

  /** Deterministic ±1 hyperplane weight for (plane p, dim d): parity of the
    * first hex digit of md5("p_d") — computed at PLAN BUILD time (the md5 of
    * a constant string), yielding the exact same values as the DuckDB-side
    * `md5(p || '_' || d)` used by the oracle.
    */
  def planeWeight(p: Int, d: Int): Double = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${p}_$d".getBytes("UTF-8"))
    if (((h(0) >> 4) & 0xf) % 2 == 1) 1.0 else -1.0
  }

  /** Random-hyperplane LSH bucket id per vector: `planes` sign bits packed
    * into a BIGINT. The weight matrix is a plan-time literal (planes×dims
    * doubles), so bucketing is a single map-only codegen'd projection —
    * no explode, no join, no shuffle; bucketing 10^9 vectors is
    * embarrassingly parallel.
    */
  def lshBuckets(df: DataFrame, idCol: String, embCol: String,
                 planes: Int, dims: Int): DataFrame = {
    val emb = asDouble(col(embCol))
    val bucket = (0 until planes).map { p =>
      val wArr = array((0 until dims).map(d => lit(planeWeight(p, d))): _*)
      val dot = graft.expr.GraftFunctions.arrayDot(emb, wArr)
      when(dot >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
    df.select(col(idCol), bucket.as("bucket"))
  }

  /** The probe set of a bucket id at Hamming radius 0 or 1: the bucket
    * itself plus (for radius 1) every single-bit flip — `planes + 1` ids,
    * generated as plan-literal XORs (no UDF, no blowup beyond the tiny
    * probe list).
    */
  def probeBuckets(bucket: Column, planes: Int, hamming: Int): Column = {
    require(hamming == 0 || hamming == 1, "probe radius must be 0 or 1")
    if (hamming == 0) array(bucket)
    else array(bucket +: (0 until planes).map(p =>
      bucket.bitwiseXOR(lit(1L << p))): _*)
  }

  /** LSH-accelerated top-k: candidates = vectors in the query's bucket,
    * ranked by exact cosine. `probeHamming = 1` enables multi-probe — the
    * query also probes every bucket one sign-bit away (planes + 1 buckets),
    * recovering most of the recall a near-boundary vector loses to a single
    * flipped hyperplane sign while still scanning only probed buckets.
    */
  def lshTopK(df: DataFrame, idCol: String, embCol: String,
              queryDf: DataFrame, k: Int, planes: Int, dims: Int,
              probeHamming: Int = 0): DataFrame = {
    val buckets = lshBuckets(df, idCol, embCol, planes, dims)
    val qb = lshBuckets(queryDf.withColumn("__qid", lit(0L)), "__qid", embCol, planes, dims)
      .select(explode(probeBuckets(col("bucket"), planes, probeHamming)).as("bucket"))
      .distinct()
    val cands = df.join(buckets, Seq(idCol)).join(broadcast(qb), Seq("bucket"))
    cosineTopK(cands, idCol, embCol, queryDf, k)
  }

  /** Coarse-quantizer cells as (cell id, centroid vector) — centroids
    * collected per label into dimension-ordered arrays. The cell table is
    * tiny (n_cells rows) and meant to be broadcast.
    */
  def cells(df: DataFrame, labelCol: String, embCol: String): DataFrame =
    centroids(df, labelCol, embCol)
      .groupBy(labelCol)
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("centroid")))),
        p => p.getField("centroid")).as("__cell_vec"))

  /** IVF-style ANN: assign every vector to its nearest coarse cell (here:
    * per-label centroids standing in for a k-means codebook — the cell table
    * is pluggable), then answer a query by probing only the `nProbe` cells
    * nearest to it and ranking those cells' vectors by exact cosine.
    *
    * Scale shape: the cell table broadcasts (n_cells rows), assignment is one
    * codegen'd pass over the vectors (no shuffle), and the probe prunes the
    * candidate scan to nProbe/n_cells of the data — the inverted-file
    * structure, relationally.
    */
  def ivfTopK(df: DataFrame, idCol: String, embCol: String, labelCol: String,
              queryDf: DataFrame, k: Int, nProbe: Int,
              codebook: Option[DataFrame] = None): DataFrame = {
    // codebook: any (__cell, __cell_vec) table — e.g. kmeansCells; defaults
    // to per-label centroids
    // Zero-norm vectors have undefined cosine (cosine() yields null) — the
    // engine excludes them from cells/assignment/candidates outright rather
    // than leaving their fate to null-ordering rules that differ per engine.
    val dfNz = df.where(
      graft.expr.GraftFunctions.arrayDot(asDouble(col(embCol)),
        asDouble(col(embCol))) =!= 0.0)
    val cellsB = broadcast(codebook.getOrElse(cells(dfNz, labelCol, embCol)
      .select(col(labelCol).as("__cell"), col("__cell_vec"))))
    // Assignment/probe sims are rounded to 12 dp BEFORE the argmax/rank
    // tie-break: engine and oracle compute cosine with different kernels, so
    // a last-ulp near-tie between two cells could otherwise flip an
    // assignment; at a shared 12-dp grid both sides land on the same value
    // and the deterministic lower-cell tie-break takes over.
    def cellSims(vecs: DataFrame): DataFrame =
      vecs.crossJoin(cellsB)
        .select(col(idCol), col("__cell"),
          round(cosine(asDouble(col(embCol)), col("__cell_vec")), 12).as("__sim"))
    // assignment is a map-side partial aggregate (max_by) — the shuffle
    // carries one row per vector, not one per (vector, cell); ties break to
    // the lower cell id so the probed candidate set is run-deterministic
    val assigned = cellSims(dfNz).groupBy(idCol)
      .agg(max_by(col("__cell"), struct(col("__sim"), -col("__cell"))).as("__cell"))
    val probed = cellSims(queryDf)
      .withColumn("__rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(idCol).orderBy(col("__sim").desc, col("__cell"))))
      .where(col("__rk") <= nProbe)
      .select(col("__cell"))
    val cands = df.join(assigned, Seq(idCol))
      .join(broadcast(probed), Seq("__cell"))
    cosineTopK(cands, idCol, embCol, queryDf, k)
  }

  /** Per-label centroids: average of every dimension, relationally
    * (posexplode + groupBy(label, dim)) — partial aggregation makes this a
    * single cheap shuffle of (labels × dims) partial sums at any scale.
    */
  def centroids(df: DataFrame, labelCol: String, embCol: String): DataFrame =
    df.select(col(labelCol), posexplode(asDouble(col(embCol))).as(Seq("dim", "__x")))
      .groupBy(labelCol, "dim")
      .agg(avg(col("__x")).as("centroid"), count(lit(1)).as("n"))

  /** Distributed Lloyd's k-means over the embedding column, returning a
    * cells table `(__cell BIGINT, __cell_vec array<double>)` usable as the
    * IVF codebook.
    *
    * Scale shape (fit-broadcast-transform): the MODEL (k × dims doubles)
    * lives on the driver between iterations — like any trained-parameter
    * broadcast — while every data pass is distributed: assignment is one
    * codegen'd pass against the broadcast centroid literals (ArrayDot
    * cosine, max_by partial aggregate), and the update is one partial-
    * aggregated groupBy of (cell, dim) sums. Collecting per iteration keeps
    * the plan shallow (k plans of depth 2, not one of depth 2k).
    * Deterministic: seeds are the k smallest md5(id)s; ties in assignment
    * break toward the lower cell id; empty cells keep their previous
    * centroid.
    */
  def kmeansCells(df: DataFrame, idCol: String, embCol: String,
                  k: Int, iters: Int = 5): DataFrame = {
    val spark = df.sparkSession
    // the vectors feed the seed pass plus one assignment pass per iteration
    // — materialize the scan+cast once (lazy localCheckpoint, dropped on GC)
    // instead of re-reading the source every round
    // zero-norm vectors (undefined cosine) are excluded from the fit — same
    // rule as ivfTopK, mirrored in the oracle's base CTE
    val vecs = graft.core.Pinned.checkpoint(
      df.select(col(idCol), asDouble(col(embCol)).as("__e"))
        .where(graft.expr.GraftFunctions.arrayDot(col("__e"), col("__e")) =!= 0.0))
    var model: Array[(Long, Seq[Double])] = vecs
      .withColumn("__h", md5(col(idCol).cast("string")))
      .orderBy("__h").limit(k)
      .collect().zipWithIndex
      .map { case (r, i) => (i.toLong, r.getSeq[Double](1)) }

    def cellsOf(m: Array[(Long, Seq[Double])]): DataFrame =
      spark.createDataFrame(m.map { case (c, v) => KmeansCell(c, v) }.toSeq)
        .select(col("cell").as("__cell"), col("vec").as("__cell_vec"))

    for (_ <- 1 to iters) {
      val cellsB = broadcast(cellsOf(model))
      // 12-dp rounding before the argmax — see ivfTopK.cellSims
      val assigned = vecs.crossJoin(cellsB)
        .select(col(idCol), col("__cell"), col("__e"),
          round(cosine(col("__e"), col("__cell_vec")), 12).as("__sim"))
        .groupBy(idCol)
        .agg(max_by(struct(col("__cell"), col("__e")),
          struct(col("__sim"), -col("__cell"))).as("__a"))
        .select(col("__a.__cell").as("__cell"), col("__a.__e").as("__e"))
      val updated = assigned
        .select(col("__cell"), posexplode(col("__e")).as(Seq("__dim", "__x")))
        .groupBy("__cell", "__dim").agg(avg(col("__x")).as("__c"))
        .groupBy("__cell")
        .agg(transform(array_sort(collect_list(struct(col("__dim"), col("__c")))),
          p => p.getField("__c")).as("__vec"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toMap
      model = model.map { case (c, v) => (c, updated.getOrElse(c, v)) }
    }
    cellsOf(model)
  }
}
