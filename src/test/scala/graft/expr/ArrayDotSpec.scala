package graft.expr

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** ArrayDot must be bit-identical to the HOF formulation
  * `aggregate(zip_with(a,b,(x,y)=>x*y), 0.0, (s,x)=>s+x)` on every input
  * shape, and must survive codegen-only expression compilation.
  */
class ArrayDotSpec extends SparkSpec {
  import GraftFunctions.arrayDot

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (s, x) => s + x)

  private def randomArrays = {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    (1 to 500).map { i =>
      val n = 1 + rnd.nextInt(8)
      def arr = Seq.fill(n)(rnd.nextDouble() * 100 - 50)
      val a = if (i % 37 == 0) null else arr
      val b = if (i % 41 == 0) null
              else if (i % 13 == 0) arr.drop(1) // length mismatch
              else arr.map(v => v + 1)
      (i, a, b)
    }.toDF("i", "a", "b")
  }

  test("bit-identical to the zip_with/aggregate fold on random data") {
    val d = randomArrays
    val out = d.select(col("i"), arrayDot(col("a"), col("b")).as("nat"),
      hofDot(col("a"), col("b")).as("hof")).collect()
    out.foreach { r =>
      val nat = Option(r.get(1)); val hof = Option(r.get(2))
      assert(nat == hof, s"row ${r.getInt(0)}: $nat vs $hof")
    }
    // nulls and mismatches actually occurred
    assert(out.exists(_.isNullAt(1)) && out.exists(!_.isNullAt(1)))
  }

  test("null element propagates to null (matches HOF)") {
    import spark.implicits._
    val d = Seq((Seq[java.lang.Double](1.0, null, 3.0), Seq[java.lang.Double](1.0, 2.0, 3.0)))
      .toDF("a", "b")
    val r = d.select(arrayDot(col("a"), col("b")), hofDot(col("a"), col("b"))).head
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("codegen path compiles and runs (CODEGEN_ONLY factory mode)") {
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val d = randomArrays.where(col("a").isNotNull && col("b").isNotNull)
      val s = d.select(sum(arrayDot(col("a"), col("b")))).head.getDouble(0)
      val e = d.select(sum(hofDot(col("a"), col("b")))).head.getDouble(0)
      assert(s == e)
    } finally spark.conf.unset("spark.sql.codegen.factoryMode")
  }

  test("codegen with NON-NULLABLE inputs (regression: undeclared isNull)") {
    // aggregate-produced arrays are non-nullable; the non-nullable
    // nullSafeCodeGen path must still compile (ArrayDot declares itself
    // nullable — length mismatch / null element yield null regardless)
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val d = spark.range(100).select(
        transform(sequence(lit(1), lit(4)), x => x.cast("double") + col("id")).as("a"))
      val r = d.select(sum(arrayDot(col("a"), col("a")))).head.getDouble(0)
      val e = d.select(sum(hofDot(col("a"), col("a")))).head.getDouble(0)
      assert(r == e)
    } finally spark.conf.unset("spark.sql.codegen.factoryMode")
  }

  test("SQL registration: array_dot callable via call_function and SQL") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val d = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b")
    assert(d.select(call_function("array_dot", col("a"), col("b"))).head.getDouble(0) == 11.0)
    d.createOrReplaceTempView("__ad")
    assert(spark.sql("select array_dot(a, b) from __ad").head.getDouble(0) == 11.0)
  }

  test("SQL registration: every native expression resolves in SQL") {
    GraftFunctions.register(spark)
    import spark.implicits._
    Seq(("a b c d", 1L)).toDF("t", "one").createOrReplaceTempView("__gf")
    val r = spark.sql(
      """select word_shingles(t, 2), word_ngrams(t, 2), simhash32(t),
        |  minhash_slices(word_shingles(t, 2), 4),
        |  wall_instant_micros(timestamp_ntz'2024-01-15 12:00:00',
        |                      'Europe/Brussels')
        |from __gf""".stripMargin).head()
    assert(r.getSeq[String](0) == Seq("a b", "b c", "c d"))
    assert(r.getSeq[String](1) == Seq("a b", "b c", "c d"))
    assert(r.getSeq[String](3).length == 4)
    assert(r.getLong(4) == 1705316400000000L) // 11:00 UTC
  }

  test("SQL registration: windowed feature kernels resolve and agree with the Column API") {
    GraftFunctions.register(spark)
    import spark.implicits._
    // 64 samples of a deterministic pseudo-series, values in time order
    val vals = (0 until 64).map(i => math.sin(i * 0.7) + 0.3 * ((i * 37 % 11) - 5))
    Seq(Tuple1(vals)).toDF("v").createOrReplaceTempView("__fk")
    val r = spark.sql(
      """select catch22(v), catch22(v, true), svd_entropy(v, 3, 1),
        |  lziv_complexity(v), multiscale_perm_entropy(v, 3, 2),
        |  multiscale_entropy(v, 2, 0.5, 2), mfcc(v, 4.0, 6),
        |  spectral_entropy(v, true), welch_density_rel(v, 5),
        |  spectral_shape(v, 4.0), ricker_cwt(v, 1, 2, 3),
        |  spectral_band(v, 4.0, 0.2, 1.0),
        |  entropy_kde(v), entropy_gauss(v)
        |from __fk""".stripMargin).head()
    assert(r.getStruct(0).length == 22)
    assert(r.getStruct(1).length == 24)
    // catch24 = catch22 ++ (mean, sample std): its mean slot must equal
    // the plain arithmetic mean of the inputs
    assert(math.abs(r.getStruct(1).getDouble(22) - vals.sum / vals.length) < 1e-9)
    assert(!r.isNullAt(2) && !r.isNullAt(3))
    val ent = r.getDouble(7)
    assert(ent >= 0.0 && ent <= 1.0) // normalized spectral entropy
    assert(r.getStruct(6).length == 6) // 6 MFCC coefficients
    // probability entropies are normalized to [0, 1]
    assert(r.getDouble(12) >= 0.0 && r.getDouble(12) <= 1.0)
    assert(r.getDouble(13) >= 0.0 && r.getDouble(13) <= 1.0)
    // arity validation: too-few and too-many args raise a clear signature
    // error (not IndexOutOfBounds / a silently dropped argument)
    for (bad <- Seq("mfcc(v)", "entropy_kde(v, 5)", "spectral_band(v, 4.0)")) {
      val e = intercept[Exception](spark.sql(s"select $bad from __fk").head())
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("arguments")), s"$bad: got $e")
    }
    // literal-typing tolerance: 0.5 parses as DECIMAL in ANSI SQL — the
    // dblLit adapter must accept it (covered by multiscale_entropy above)
  }
}
