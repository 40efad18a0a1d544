package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api._
import graft.chunk.Chunker
import graft.core._
import graft.proc.{SeriesPipeline, SeriesProcessor}
import graft.scale.{Ann, Dedup, Multimodal, TextStats}

/** Driver contract — one `queries` entry (+ DuckDB `oracleSql` twin) per
  * implemented operator from SURVEY.md §2. Every query projects its result
  * into oracle-robust form: timestamp anchors as epoch-micros BIGINT
  * (`unix_micros` ↔ DuckDB `epoch_us`), doubles rounded to 6 decimals on
  * BOTH sides, explicit ORDER BY.
  */
object SparkEntry {
  import FeatureFuncs._

  private val DAY = 86400000000L
  private val HOUR = 3600000000L

  /** Load `events`, tolerating parquet TIMESTAMP(NANOS) (which Spark 4 only
    * reads as Long via the legacy flag). Nanos are floor-truncated to micros
    * with integer division — exactly what DuckDB's read does — keeping the
    * oracle bit-identical.
    */
  private def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = s.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw
    }
  }
  private def valueSeries(s: SparkSession, dir: String): Series =
    Series("value", events(s, dir), "ts", "value")

  private def r6(c: String): org.apache.spark.sql.Column = round(col(c), 6).as(c)

  /** DuckDB CTE producing segments (ws, we) over `src` rows with the W1
    * formula; mirrors Segmenter.regular + nbSegments exactly.
    */
  private def segCte(W: Long, S: Long, includeFinal: Boolean = false,
                     where: String = "", src: String = "events"): String = {
    val flt = if (where.isEmpty) "" else s" WHERE $where"
    val nb0 = s"GREATEST((e - s - $W) // $S + 1, 0)"
    val nb = if (includeFinal)
      s"$nb0 + CASE WHEN s + $S * ($nb0) <= e THEN 1 ELSE 0 END"
    else nb0
    s"""b AS (SELECT epoch_us(min(ts)) AS s, epoch_us(max(ts)) AS e FROM $src$flt),
       |bn AS (SELECT s, e, CAST($nb AS BIGINT) AS nb FROM b),
       |seg AS (SELECT s + k*$S AS ws, s + k*$S + $W AS we
       |        FROM bn, unnest(generate_series(0, nb - 1)) AS t(k))""".stripMargin
  }

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_roll_mean")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- smoke: plain scan + hash agg (S1) -------------------------------
    "q00_tpch_q1" -> ((s, dir) => {
      s.read.parquet(s"$dir/lineitem.parquet")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(expr("round(sum(l_quantity), 6)").as("sum_qty"),
          expr("round(sum(l_extendedprice * (1 - l_discount)), 6)").as("revenue"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // ---- W1/W3/W5/W6/W7/W10: flagship rolling mean, 1D window / 6h stride
    "q01_roll_mean" -> ((s, dir) => {
      val fc = FeatureCollection(FeatureDescriptor(mean, "value",
        Some(Win.time("1D")), Some(Seq(Win.time("6h")))))
      fc.calculate(Seq(valueSeries(s, dir)))
        .select(unix_micros(col("ts")).as("ts_anchor"), r6("value__mean__w=1D"))
        .orderBy("ts_anchor")
    }),

    // ---- A6: fused multi-aggregate bucket (one groupBy for 7 features) ---
    "q02_roll_multi" -> ((s, dir) => {
      val fns = Seq(min, max, sum, len, std, variance, median)
      val fc = FeatureCollection.of(fns.map(f => FeatureDescriptor(f, "value",
        Some(Win.time("1D")), Some(Seq(Win.time("6h"))))))
      val out = fc.calculate(Seq(valueSeries(s, dir)))
      val feats = Seq("min", "max", "sum", "len", "std", "var", "median")
        .map(n => s"value__${n}__w=1D")
      out.select(unix_micros(col("ts")).as("ts_anchor") +:
        feats.map(n => if (n.contains("len")) col(n) else r6(n)): _*)
        .orderBy("ts_anchor")
    }),

    // ---- S4: two windows merged by full-outer anchor join, sorted cols ---
    "q03_two_windows" -> ((s, dir) => {
      val fc = FeatureCollection(
        FeatureDescriptor(mean, "value", Some(Win.time("1D")), Some(Seq(Win.time("6h")))),
        FeatureDescriptor(mean, "value", Some(Win.time("1h")), Some(Seq(Win.time("15m")))))
      fc.calculate(Seq(valueSeries(s, dir)))
        .select(unix_micros(col("ts")).as("ts_anchor"),
          r6("value__mean__w=1D"), r6("value__mean__w=1h"))
        .orderBy("ts_anchor")
    }),

    // ---- W2: multi-stride start-set union ---------------------------------
    "q04_multi_stride" -> ((s, dir) => {
      val fc = FeatureCollection(FeatureDescriptor(sum, "value",
        Some(Win.time("1D")), Some(Seq(Win.time("7h"), Win.time("11h")))))
      fc.calculate(Seq(valueSeries(s, dir)))
        .select(unix_micros(col("ts")).as("ts_anchor"), r6("value__sum__w=1D"))
        .orderBy("ts_anchor")
    }),

    // ---- W1 include_final_window ----------------------------------------
    "q05_final_window" -> ((s, dir) => {
      val fc = FeatureCollection(FeatureDescriptor(len, "value",
        Some(Win.time("1D")), Some(Seq(Win.time("7h")))))
      fc.calculate(Seq(valueSeries(s, dir)), includeFinalWindow = true)
        .select(unix_micros(col("ts")).as("ts_anchor"), col("value__len__w=1D"))
        .orderBy("ts_anchor")
    }),

    // ---- W6: begin anchor -------------------------------------------------
    "q06_anchor_begin" -> ((s, dir) => {
      val fc = FeatureCollection(FeatureDescriptor(max, "value",
        Some(Win.time("1D")), Some(Seq(Win.time("6h")))))
      fc.calculate(Seq(valueSeries(s, dir)), windowIdx = "begin")
        .select(unix_micros(col("ts")).as("ts_anchor"), r6("value__max__w=1D"))
        .orderBy("ts_anchor")
    }),

    // ---- W4: manual variable segments (both sides given → w=manual) ------
    "q07_manual_segments" -> ((s, dir) => {
      val jan1 = java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli * 1000L
      val starts = (4 to 10).map(d => (jan1 + d.toLong * DAY).toDouble)
      val ends = starts.map(_ + DAY.toDouble)
      val fc = FeatureCollection(
        FeatureDescriptor(mean, "value", None, None),
        FeatureDescriptor(len, "value", None, None))
      fc.calculate(Seq(valueSeries(s, dir)),
        segmentStartIdxs = Some(starts), segmentEndIdxs = Some(ends))
        .select(unix_micros(col("ts")).as("ts_anchor"),
          col("value__len__w=manual"), r6("value__mean__w=manual"))
        .orderBy("ts_anchor")
    }),

    // ---- W9: sample-count windows over a time index ----------------------
    "q08_sample_windows" -> ((s, dir) => {
      val fc = FeatureCollection(FeatureDescriptor(mean, "value",
        Some(SampleWin(500)), Some(Seq(SampleWin(250)))))
      fc.calculate(Seq(valueSeries(s, dir)), windowIdx = "begin")
        .select(unix_micros(col("ts")).as("ts_anchor"), r6("value__mean__w=500"))
        .orderBy("ts_anchor")
    }),

    // ---- A5: robust wrapper (min_nb_samples + error_val) -----------------
    "q09_robust" -> ((s, dir) => {
      val fc = FeatureCollection(FeatureDescriptor(mean.robust(40, -1.0), "value",
        Some(Win.time("2h")), Some(Seq(Win.time("2h")))))
      fc.calculate(Seq(valueSeries(s, dir)))
        .select(unix_micros(col("ts")).as("ts_anchor"), r6("value__mean__w=2h"))
        .orderBy("ts_anchor")
    }),

    // ---- A7: categorical window counts over a string series --------------
    "q10_cat_counts" -> ((s, dir) => {
      val etype = Series("etype", events(s, dir), "ts", "event_type")
      val fc = FeatureCollection(
        FeatureDescriptor(countEq("purchase"), "etype", Some(Win.time("1D")), Some(Seq(Win.time("1D")))),
        FeatureDescriptor(countEq("click"), "etype", Some(Win.time("1D")), Some(Seq(Win.time("1D")))))
      fc.calculate(Seq(etype))
        .select(unix_micros(col("ts")).as("ts_anchor"),
          col("etype__count_click__w=1D"), col("etype__count_purchase__w=1D"))
        .orderBy("ts_anchor")
    }),

    // ---- G1: group_by_all -------------------------------------------------
    "q11_group_by_all" -> ((s, dir) => {
      val fc = FeatureCollection(
        FeatureDescriptor(mean, "value", None, None),
        FeatureDescriptor(sum, "value", None, None),
        FeatureDescriptor(len, "value", None, None))
      val grp = Series("etype", events(s, dir), "ts", "event_type")
      fc.calculateGroupByAll(Seq(valueSeries(s, dir)), grp)
        .select(col("etype"), col("value__len__w=manual"),
          r6("value__mean__w=manual"), r6("value__sum__w=manual"))
        .orderBy("etype")
    }),

    // ---- G3: group_by_consecutive (gaps-and-islands) ---------------------
    "q12_group_by_consecutive" -> ((s, dir) => {
      val grp = Series("uid", events(s, dir), "ts", "user_id")
      val fc = FeatureCollection(
        FeatureDescriptor(mean, "value", None, None),
        FeatureDescriptor(len, "value", None, None))
      fc.calculateGroupByConsecutive(Seq(valueSeries(s, dir)), grp)
        .select(col("uid"), col("value__len__w=manual"), r6("value__mean__w=manual"),
          unix_micros(col("__start")).as("__start"),
          unix_micros(col("__end")).as("__end"))
        .orderBy("__start")
    }),

    // ---- P2/P3: inner bounds over two independently-indexed series -------
    "q13_two_series_bounds" -> ((s, dir) => {
      val ev = events(s, dir)
      val click = Series("click", ev.where(col("event_type") === "click"), "ts", "value")
      val purch = Series("purchase", ev.where(col("event_type") === "purchase"), "ts", "value")
      val fc = FeatureCollection(
        FeatureDescriptor(mean, "click", Some(Win.time("1D")), Some(Seq(Win.time("12h")))),
        FeatureDescriptor(mean, "purchase", Some(Win.time("1D")), Some(Seq(Win.time("12h")))))
      fc.calculate(Seq(click, purch), boundMethod = "inner")
        .select(unix_micros(col("ts")).as("ts_anchor"),
          r6("click__mean__w=1D"), r6("purchase__mean__w=1D"))
        .orderBy("ts_anchor")
    }),

    // ---- C1/C2: gap chunking with duration filter ------------------------
    "q14_chunks" -> ((s, dir) => {
      Chunker.chunkSpans(valueSeries(s, dir), fs = Some(1.0 / 600.0),
        minDur = Some(3600e6))
        .select(col("__chunk").as("chunk_id"),
          col("__start").cast("long").as("chunk_start"),
          col("__end").cast("long").as("chunk_end"), col("__n").as("n"))
        .orderBy("chunk_start")
    }),

    // ---- S3: series-dict → wide full-outer index join --------------------
    "q15_wide_join" -> ((s, dir) => {
      val ev = events(s, dir)
      val click = Series("click", ev.where(col("event_type") === "click"), "ts", "value")
      val purch = Series("purchase", ev.where(col("event_type") === "purchase"), "ts", "value")
      Series.toWide(Seq(click, purch))
        .select(unix_micros(col("ts")).as("ts_anchor"), r6("click"), r6("purchase"))
        .orderBy("ts_anchor")
    }),

    // ---- T1/T3: processing pipeline (clip then derive log series) --------
    "q16_pipeline" -> ((s, dir) => {
      val pipe = new SeriesPipeline(Seq(
        SeriesProcessor.mapSeries("clip", Seq("value"))(v =>
          least(greatest(v, lit(10.0)), lit(300.0))),
        SeriesProcessor.mapSeriesAs("log", Seq("value"), _ => "vlog")(v => log(v))))
      pipe.processToDf(Seq(valueSeries(s, dir)))
        .select(unix_micros(col("ts")).as("ts_anchor"), r6("value"), r6("vlog"))
        .orderBy("ts_anchor")
    }),

    // ---- dedup: exact after bag-of-words normalization -------------------
    "q20_dedup_exact" -> ((s, dir) => {
      Dedup.exactNormalized(docs(s, dir), "doc_id", "text")
        .select(col("rep_id"), col("n"),
          concat_ws(",", transform(col("members"), _.cast("string"))).as("members"))
        .orderBy("rep_id")
    }),

    // ---- dedup: exact n-gram Jaccard via inverted shingle index ----------
    "q21_dedup_jaccard" -> ((s, dir) => {
      Dedup.jaccardPairs(docs(s, dir), "doc_id", "text", 3, 0.6)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("id_a", "id_b")
    }),

    // ---- dedup: MinHash + LSH banding, exact-verified ---------------------
    "q22_minhash_lsh" -> ((s, dir) => {
      Dedup.minhashLsh(docs(s, dir), "doc_id", "text", 3, 16, 8, 0.6)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("id_a", "id_b")
    }),

    // ---- dedup: 32-bit SimHash fingerprints -------------------------------
    "q23_simhash" -> ((s, dir) => {
      Dedup.simhash32(docs(s, dir), "doc_id", "text").orderBy("doc_id")
    }),

    // ---- similarity search: brute-force cosine top-k ----------------------
    "q24_ann_cosine" -> ((s, dir) => {
      val e = s.read.parquet(s"$dir/embeddings.parquet")
      Ann.cosineTopK(e.where(col("vec_id") =!= 0), "vec_id", "embedding",
        e.where(col("vec_id") === 0), 10)
    }),

    // ---- similarity search: hyperplane-LSH buckets ------------------------
    "q25_ann_lsh" -> ((s, dir) => {
      val e = s.read.parquet(s"$dir/embeddings.parquet")
      Ann.lshBuckets(e, "vec_id", "embedding", 8, 64).orderBy("vec_id")
    }),

    // ---- multimodal: binary payload plumbing + stub decode ----------------
    "q26_multimodal" -> ((s, dir) => {
      val assets = Multimodal.fromText(docs(s, dir), "doc_id", "text")
      Multimodal.decodeStub(assets).toDF()
        .select(col("asset_id"), col("n_bytes"), col("width"), col("height"),
          col("duration_ms"))
        .orderBy("asset_id")
    }),

    // ---- text: language-ID heuristic --------------------------------------
    "q27_lang_id" -> ((s, dir) => {
      docs(s, dir).select(col("doc_id"), col("lang"),
        TextStats.langId(col("text")).as("lang_pred")).orderBy("doc_id")
    }),

    // ---- text: quality scoring --------------------------------------------
    "q28_text_quality" -> ((s, dir) => {
      val t = col("text")
      docs(s, dir).select(col("doc_id"),
        TextStats.tokenCount(t).cast("long").as("n_tokens"),
        round(TextStats.punctRatio(t), 6).as("punct_ratio"),
        round(TextStats.stopwordRatio(t), 6).as("stop_ratio"),
        round(TextStats.meanWordLen(t), 6).as("mean_word_len"),
        TextStats.qualityScore(t).as("quality")).orderBy("doc_id")
    }),

    // ---- text: token counting ----------------------------------------------
    "q29_token_count" -> ((s, dir) => {
      docs(s, dir).select(col("doc_id"),
        TextStats.tokenCount(col("text")).cast("long").as("n_tokens"),
        TextStats.tokenEstimate(col("text")).cast("long").as("n_tokens_est"),
        col("n_chars")).orderBy("doc_id")
    }),

    // ---- text: rolling-hash document fingerprint ---------------------------
    "q30_fingerprint" -> ((s, dir) => {
      docs(s, dir).select(col("doc_id"),
        TextStats.fingerprint(col("text"), 8, 4).as("fingerprint")).orderBy("doc_id")
    }),

    // ---- embeddings: per-label centroids (vector aggregate) ----------------
    "q31_embed_centroid" -> ((s, dir) => {
      Ann.centroids(s.read.parquet(s"$dir/embeddings.parquet"), "label", "embedding")
        .select(col("label"), col("dim").cast("long").as("dim"),
          round(col("centroid"), 6).as("centroid"), col("n"))
        .orderBy("label", "dim")
    }))

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** DuckDB CTE fragments shared by the dedup oracles. */
  private val shingleCte =
    """docs AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws FROM documents),
      |sh AS (SELECT doc_id, unnest(list_distinct(CASE WHEN len(ws) >= 3
      |  THEN [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] for i in generate_series(1, len(ws)-2)]
      |  ELSE [array_to_string(ws, ' ')] END)) AS s FROM docs)""".stripMargin

  private val jaccardCte =
    s"""$shingleCte,
       |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
       |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
       |jac AS (SELECT id_a, id_b, i * 1.0 / (sa.n + sb.n - i) AS jaccard
       |  FROM inter JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q00_tpch_q1" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity),6) AS sum_qty,
        | round(sum(l_extendedprice*(1-l_discount)),6) AS revenue, count(*) AS n
        |FROM lineitem GROUP BY 1,2 ORDER BY 1,2""".stripMargin,

    "q01_roll_mean" ->
      s"""WITH ${segCte(DAY, 6 * HOUR)}
         |SELECT we AS ts_anchor, round(avg(value),6) AS "value__mean__w=1D"
         |FROM seg LEFT JOIN events ON epoch_us(ts) >= ws AND epoch_us(ts) < we
         |GROUP BY we ORDER BY ts_anchor""".stripMargin,

    "q02_roll_multi" ->
      s"""WITH ${segCte(DAY, 6 * HOUR)}
         |SELECT we AS ts_anchor,
         | round(min(value),6) AS "value__min__w=1D",
         | round(max(value),6) AS "value__max__w=1D",
         | round(sum(value),6) AS "value__sum__w=1D",
         | count(value) AS "value__len__w=1D",
         | round(stddev_pop(value),6) AS "value__std__w=1D",
         | round(var_pop(value),6) AS "value__var__w=1D",
         | round(median(value),6) AS "value__median__w=1D"
         |FROM seg LEFT JOIN events ON epoch_us(ts) >= ws AND epoch_us(ts) < we
         |GROUP BY we ORDER BY ts_anchor""".stripMargin,

    "q03_two_windows" ->
      s"""WITH ${segCte(DAY, 6 * HOUR)},
         |agg1 AS (SELECT we AS a, round(avg(value),6) AS f1
         |  FROM seg LEFT JOIN events ON epoch_us(ts) >= ws AND epoch_us(ts) < we GROUP BY we),
         |b2 AS (SELECT epoch_us(min(ts)) AS s, epoch_us(max(ts)) AS e FROM events),
         |bn2 AS (SELECT s, e, CAST(GREATEST((e - s - $HOUR) // ${15 * 60 * 1000000L} + 1, 0) AS BIGINT) AS nb FROM b2),
         |seg2 AS (SELECT s + k*${15 * 60 * 1000000L} AS ws, s + k*${15 * 60 * 1000000L} + $HOUR AS we
         |         FROM bn2, unnest(generate_series(0, nb - 1)) AS t(k)),
         |agg2 AS (SELECT we AS a, round(avg(value),6) AS f2
         |  FROM seg2 LEFT JOIN events ON epoch_us(ts) >= ws AND epoch_us(ts) < we GROUP BY we)
         |SELECT coalesce(agg1.a, agg2.a) AS ts_anchor, f1 AS "value__mean__w=1D", f2 AS "value__mean__w=1h"
         |FROM agg1 FULL OUTER JOIN agg2 ON agg1.a = agg2.a ORDER BY ts_anchor""".stripMargin,

    "q04_multi_stride" ->
      s"""WITH b AS (SELECT epoch_us(min(ts)) AS s, epoch_us(max(ts)) AS e FROM events),
         |n1 AS (SELECT s, e, CAST(GREATEST((e - s - $DAY) // ${7 * HOUR} + 1, 0) AS BIGINT) AS nb FROM b),
         |s1 AS (SELECT s + k*${7 * HOUR} AS ws FROM n1, unnest(generate_series(0, nb - 1)) AS t(k)),
         |n2 AS (SELECT s, e, CAST(GREATEST((e - s - $DAY) // ${11 * HOUR} + 1, 0) AS BIGINT) AS nb FROM b),
         |s2 AS (SELECT s + k*${11 * HOUR} AS ws FROM n2, unnest(generate_series(0, nb - 1)) AS t(k)),
         |seg AS (SELECT ws, ws + $DAY AS we FROM (SELECT ws FROM s1 UNION SELECT ws FROM s2))
         |SELECT we AS ts_anchor, round(sum(value),6) AS "value__sum__w=1D"
         |FROM seg LEFT JOIN events ON epoch_us(ts) >= ws AND epoch_us(ts) < we
         |GROUP BY we ORDER BY ts_anchor""".stripMargin,

    "q05_final_window" ->
      s"""WITH ${segCte(DAY, 7 * HOUR, includeFinal = true)}
         |SELECT we AS ts_anchor, count(value) AS "value__len__w=1D"
         |FROM seg LEFT JOIN events ON epoch_us(ts) >= ws AND epoch_us(ts) < we
         |GROUP BY we ORDER BY ts_anchor""".stripMargin,

    "q06_anchor_begin" ->
      s"""WITH ${segCte(DAY, 6 * HOUR)}
         |SELECT ws AS ts_anchor, round(max(value),6) AS "value__max__w=1D"
         |FROM seg LEFT JOIN events ON epoch_us(ts) >= ws AND epoch_us(ts) < we
         |GROUP BY ws ORDER BY ts_anchor""".stripMargin,

    "q07_manual_segments" -> {
      val jan1 = java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli * 1000L
      val rows = (4 to 10).map(d => s"(${jan1 + d.toLong * DAY}, ${jan1 + (d + 1).toLong * DAY})").mkString(", ")
      s"""WITH seg(ws, we) AS (VALUES $rows)
         |SELECT we AS ts_anchor, count(value) AS "value__len__w=manual",
         | round(avg(value),6) AS "value__mean__w=manual"
         |FROM seg LEFT JOIN events ON epoch_us(ts) >= ws AND epoch_us(ts) < we
         |GROUP BY we ORDER BY ts_anchor""".stripMargin
    },

    "q08_sample_windows" ->
      s"""WITH r AS (SELECT ts, value, CAST(row_number() OVER (ORDER BY ts) - 1 AS DOUBLE) AS pos FROM events),
         |b AS (SELECT CAST(0 AS DOUBLE) AS s, CAST(count(*) - 1 AS DOUBLE) AS e FROM r),
         |bn AS (SELECT s, e, CAST(GREATEST(FLOOR((e - s - 500) / 250) + 1, 0) AS BIGINT) AS nb FROM b),
         |seg AS (SELECT s + k*250 AS ws, s + k*250 + 500 AS we
         |        FROM bn, unnest(generate_series(0, nb - 1)) AS t(k)),
         |agg AS (SELECT ws, round(avg(value),6) AS f
         |  FROM seg LEFT JOIN r ON pos >= ws AND pos < we GROUP BY ws)
         |SELECT epoch_us(r.ts) AS ts_anchor, f AS "value__mean__w=500"
         |FROM agg JOIN r ON r.pos = agg.ws ORDER BY ts_anchor""".stripMargin,

    "q09_robust" ->
      s"""WITH ${segCte(2 * HOUR, 2 * HOUR)}
         |SELECT we AS ts_anchor,
         | CASE WHEN count(value) >= 40 THEN round(avg(value),6) ELSE -1.0 END AS "value__mean__w=2h"
         |FROM seg LEFT JOIN events ON epoch_us(ts) >= ws AND epoch_us(ts) < we
         |GROUP BY we ORDER BY ts_anchor""".stripMargin,

    "q10_cat_counts" ->
      s"""WITH ${segCte(DAY, DAY)}
         |SELECT we AS ts_anchor,
         | CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS "etype__count_click__w=1D",
         | CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS "etype__count_purchase__w=1D"
         |FROM seg LEFT JOIN events ON epoch_us(ts) >= ws AND epoch_us(ts) < we
         |GROUP BY we ORDER BY ts_anchor""".stripMargin,

    "q11_group_by_all" ->
      """SELECT event_type AS etype, count(value) AS "value__len__w=manual",
        | round(avg(value),6) AS "value__mean__w=manual",
        | round(sum(value),6) AS "value__sum__w=manual"
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q12_group_by_consecutive" ->
      """WITH g AS (SELECT ts, user_id, value,
        |  CASE WHEN lag(user_id) OVER (ORDER BY ts) IS DISTINCT FROM user_id THEN 1 ELSE 0 END AS chg
        |  FROM events),
        |r AS (SELECT *, sum(chg) OVER (ORDER BY ts ROWS UNBOUNDED PRECEDING) AS run FROM g),
        |runs AS (SELECT run, min(ts) AS s, max(ts) AS e, any_value(user_id) AS uid FROM r GROUP BY run),
        |segs AS (SELECT run, uid, s, e,
        |  coalesce(lead(s) OVER (ORDER BY s), e + INTERVAL 1 DAY) AS seg_end FROM runs)
        |SELECT segs.uid AS uid, count(ev.value) AS "value__len__w=manual",
        | round(avg(ev.value),6) AS "value__mean__w=manual",
        | epoch_us(segs.s) AS __start, epoch_us(segs.e) AS __end
        |FROM segs LEFT JOIN events ev ON ev.ts >= segs.s AND ev.ts < segs.seg_end
        |GROUP BY segs.run, segs.uid, segs.s, segs.e ORDER BY __start""".stripMargin,

    "q13_two_series_bounds" ->
      s"""WITH ba AS (SELECT epoch_us(min(ts)) AS s, epoch_us(max(ts)) AS e FROM events WHERE event_type='click'),
         |bb AS (SELECT epoch_us(min(ts)) AS s, epoch_us(max(ts)) AS e FROM events WHERE event_type='purchase'),
         |b AS (SELECT GREATEST(ba.s, bb.s) AS s, LEAST(ba.e, bb.e) AS e FROM ba, bb),
         |bn AS (SELECT s, e, CAST(GREATEST((e - s - $DAY) // ${12 * HOUR} + 1, 0) AS BIGINT) AS nb FROM b),
         |seg AS (SELECT s + k*${12 * HOUR} AS ws, s + k*${12 * HOUR} + $DAY AS we
         |        FROM bn, unnest(generate_series(0, nb - 1)) AS t(k)),
         |a1 AS (SELECT we, round(avg(value),6) AS f1 FROM seg
         |  LEFT JOIN events ON event_type='click' AND epoch_us(ts) >= ws AND epoch_us(ts) < we GROUP BY we),
         |a2 AS (SELECT we, round(avg(value),6) AS f2 FROM seg
         |  LEFT JOIN events ON event_type='purchase' AND epoch_us(ts) >= ws AND epoch_us(ts) < we GROUP BY we)
         |SELECT a1.we AS ts_anchor, f1 AS "click__mean__w=1D", f2 AS "purchase__mean__w=1D"
         |FROM a1 JOIN a2 ON a1.we = a2.we ORDER BY ts_anchor""".stripMargin,

    "q14_chunks" ->
      """WITH d AS (SELECT ts, value,
        |  epoch_us(ts) - lag(epoch_us(ts)) OVER (ORDER BY ts) AS diff FROM events),
        |c AS (SELECT *, CAST(sum(CASE WHEN diff IS NULL OR diff > 900000000 THEN 1 ELSE 0 END)
        |  OVER (ORDER BY ts ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS chunk_id FROM d),
        |spans AS (SELECT chunk_id, min(epoch_us(ts)) AS chunk_start, max(epoch_us(ts)) AS chunk_end,
        |  count(value) AS n FROM c GROUP BY chunk_id)
        |SELECT chunk_id, chunk_start, chunk_end, n FROM spans
        |WHERE chunk_end - chunk_start >= 3600000000 ORDER BY chunk_start""".stripMargin,

    "q15_wide_join" ->
      """WITH a AS (SELECT ts, value AS click FROM events WHERE event_type='click'),
        |b AS (SELECT ts, value AS purchase FROM events WHERE event_type='purchase')
        |SELECT epoch_us(coalesce(a.ts, b.ts)) AS ts_anchor,
        | round(click,6) AS click, round(purchase,6) AS purchase
        |FROM a FULL OUTER JOIN b ON a.ts = b.ts ORDER BY ts_anchor""".stripMargin,

    "q16_pipeline" ->
      """SELECT epoch_us(ts) AS ts_anchor,
        | round(LEAST(GREATEST(value, 10.0), 300.0),6) AS value,
        | round(ln(LEAST(GREATEST(value, 10.0), 300.0)),6) AS vlog
        |FROM events ORDER BY ts_anchor""".stripMargin,

    "q20_dedup_exact" ->
      """WITH k AS (SELECT doc_id,
        |  md5(array_to_string(list_sort(list_distinct(string_split_regex(trim(text), '\s+'))), ' ')) AS key
        |  FROM documents)
        |SELECT min(doc_id) AS rep_id, count(*) AS n,
        | array_to_string(list_sort(list(doc_id)), ',') AS members
        |FROM k GROUP BY key HAVING count(*) >= 2 ORDER BY rep_id""".stripMargin,

    "q21_dedup_jaccard" ->
      s"""WITH $jaccardCte
         |SELECT id_a, id_b, round(jaccard, 6) AS jaccard FROM jac
         |WHERE jaccard >= 0.6 ORDER BY id_a, id_b""".stripMargin,

    "q22_minhash_lsh" -> {
      // 4 independent 32-bit hash slices per md5 — mirrors Dedup.sliceHash
      val mhCols = (0 until 16).map(i =>
        s"min(substr(md5(s || '#${i / 4}'), ${(i % 4) * 8 + 1}, 8)) AS m$i").mkString(", ")
      val bandSel = (0 until 8).map(b =>
        s"SELECT doc_id, $b AS b, md5(m${2 * b} || '|' || m${2 * b + 1}) AS key FROM mh")
        .mkString(" UNION ALL ")
      s"""WITH $jaccardCte,
         |mh AS (SELECT doc_id, $mhCols FROM sh GROUP BY doc_id),
         |bands AS ($bandSel),
         |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM bands a JOIN bands b ON a.b = b.b AND a.key = b.key AND a.doc_id < b.doc_id)
         |SELECT id_a, id_b, round(jaccard, 6) AS jaccard
         |FROM cand JOIN jac USING (id_a, id_b)
         |WHERE jaccard >= 0.6 ORDER BY id_a, id_b""".stripMargin
    },

    "q23_simhash" -> {
      val odd = "('1','3','5','7','9','b','d','f')"
      val sums = (0 until 32).map(j =>
        s"sum(CASE WHEN substr(h, ${j + 1}, 1) IN $odd THEN 1 ELSE -1 END) AS s$j").mkString(", ")
      val fp = (0 until 32).map(j =>
        s"CASE WHEN s$j >= 0 THEN ${1L << j} ELSE 0 END").mkString(" + ")
      s"""WITH tok AS (SELECT doc_id, md5(unnest(string_split_regex(trim(text), '\\s+'))) AS h FROM documents),
         |sums AS (SELECT doc_id, $sums FROM tok GROUP BY doc_id)
         |SELECT doc_id, CAST($fp AS BIGINT) AS simhash FROM sums ORDER BY doc_id""".stripMargin
    },

    "q24_ann_cosine" ->
      """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0)
        |SELECT vec_id, round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), qe), 6) AS cosine
        |FROM embeddings, q WHERE vec_id != 0
        |ORDER BY cosine DESC, vec_id LIMIT 10""".stripMargin,

    "q25_ann_lsh" ->
      """WITH w AS (SELECT p, d,
        |  CASE WHEN substr(md5(p || '_' || d), 1, 1) IN ('1','3','5','7','9','b','d','f')
        |  THEN 1.0 ELSE -1.0 END AS w
        |  FROM range(8) t1(p), range(64) t2(d)),
        |x AS (SELECT vec_id, d, CAST(embedding[CAST(d AS INT) + 1] AS DOUBLE) AS v
        |  FROM embeddings, range(64) t(d)),
        |dots AS (SELECT vec_id, p, sum(v * w.w) AS s FROM x JOIN w USING (d) GROUP BY 1, 2)
        |SELECT vec_id, CAST(sum(CASE WHEN s >= 0 THEN 1::BIGINT << CAST(p AS INT) ELSE 0 END) AS BIGINT) AS bucket
        |FROM dots GROUP BY vec_id ORDER BY vec_id""".stripMargin,

    "q26_multimodal" ->
      """SELECT doc_id AS asset_id, octet_length(encode(text)) AS n_bytes,
        | 16 + (ascii(substr(text, 1, 1)) % 64) * 16 AS width,
        | 16 + (ascii(substr(text, 2, 1)) % 64) * 16 AS height,
        | octet_length(encode(text)) * 7 AS duration_ms
        |FROM documents ORDER BY asset_id""".stripMargin,

    "q27_lang_id" -> {
      val scores = TextStats.langMarkers.map { case (lang, ms) =>
        val set = ms.map(m => s"'$m'").mkString(", ")
        s"len(list_filter(toks, t -> t IN ($set))) AS s_$lang"
      }.mkString(", ")
      val langs = TextStats.langMarkers.map(_._1)
      val best = s"GREATEST(${langs.map(l => s"s_$l").mkString(", ")})"
      val pick = langs.map(l => s"WHEN s_$l = best AND best > 0 THEN '$l'").mkString(" ")
      s"""WITH t AS (SELECT doc_id, lang, string_split_regex(lower(trim(text)), '\\s+') AS toks FROM documents),
         |sc AS (SELECT doc_id, lang, $scores FROM t),
         |b AS (SELECT *, $best AS best FROM sc)
         |SELECT doc_id, lang, CASE $pick ELSE 'und' END AS lang_pred
         |FROM b ORDER BY doc_id""".stripMargin
    },

    "q28_text_quality" -> {
      val stop = TextStats.stopwords.map(w => s"'$w'").mkString(", ")
      s"""WITH t AS (SELECT doc_id, text, string_split_regex(trim(text), '\\s+') AS toks,
         |  CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens
         |  FROM documents),
         |m AS (SELECT doc_id, n_tokens,
         |  CAST(length(text) - length(regexp_replace(text, '$punctClass', '', 'g')) AS DOUBLE)
         |    / GREATEST(length(text), 1) AS punct_ratio,
         |  CAST(len(list_filter(list_transform(toks, x -> lower(x)), t -> t IN ($stop))) AS DOUBLE)
         |    / GREATEST(len(toks), 1) AS stop_ratio,
         |  CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / GREATEST(len(toks), 1) AS mean_word_len
         |  FROM t)
         |SELECT doc_id, n_tokens, round(punct_ratio, 6) AS punct_ratio,
         | round(stop_ratio, 6) AS stop_ratio, round(mean_word_len, 6) AS mean_word_len,
         | round(LEAST(n_tokens / 50.0, 1.0)
         |   * (CASE WHEN punct_ratio <= 0.2 THEN 1.0 ELSE 0.5 END)
         |   * (CASE WHEN stop_ratio BETWEEN 0.01 AND 0.6 THEN 1.0 ELSE 0.7 END), 6) AS quality
         |FROM m ORDER BY doc_id""".stripMargin
    },

    "q29_token_count" ->
      s"""SELECT doc_id,
         | CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens,
         | CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(string_split_regex(trim(text), '\\s+')) END
         |   + length(text) - length(regexp_replace(text, '$punctClass', '', 'g')) AS n_tokens_est,
         | n_chars
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q30_fingerprint" ->
      """SELECT doc_id,
        | list_aggregate([md5(substr(text, CAST(i AS INT), 8)) for i in
        |   generate_series(1, GREATEST(length(text) - 7, 1), 4)], 'min') AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q31_embed_centroid" ->
      """WITH x AS (SELECT label, d, CAST(embedding[CAST(d AS INT) + 1] AS DOUBLE) AS v
        |  FROM embeddings, range(64) t(d))
        |SELECT label, d AS dim, round(avg(v), 6) AS centroid, count(*) AS n
        |FROM x GROUP BY label, d ORDER BY label, dim""".stripMargin)

  /** ASCII punctuation class shared with TextStats (identical meaning in
    * Java regex and RE2/DuckDB, unlike `\p{Punct}`).
    */
  private def punctClass = TextStats.punctClass
}
