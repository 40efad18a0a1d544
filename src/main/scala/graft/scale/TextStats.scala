package graft.scale

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines: token counting, quality
  * scoring, language ID, document fingerprinting. All pure Column
  * expressions (whole-stage codegen; no UDFs), each with a DuckDB-equivalent
  * formulation for the oracle.
  */
object TextStats {

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, 0).otherwise(size(split(trim(text), "\\s+")))

  /** ASCII punctuation class — written explicitly (not `\p{Punct}`) so the
    * same pattern means the same thing in Java regex and RE2/DuckDB.
    */
  val punctClass: String = """[!-/:-@\[-`{-~]"""

  /** PII redaction patterns — written to mean the SAME thing in Java regex
    * (Spark codegen) and RE2 (DuckDB oracle): ASCII classes, bounded
    * repetition, `\b` (ASCII word boundary in both). Replacement order
    * matters: emails first (their local parts can contain digit runs),
    * then IPv4 dotted quads, then 13–19-digit runs (card/account-like).
    */
  val emailPat: String = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  val ipv4Pat: String = """\b\d{1,3}(\.\d{1,3}){3}\b"""
  val longNumPat: String = """\b\d{13,19}\b"""

  /** Redact common PII (emails, IPv4 addresses, long digit runs) with typed
    * placeholders — the standard scrub before training-corpus release.
    * Three chained codegen'd regexp_replace passes, map-only at any scale.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailPat, "[EMAIL]"),
        ipv4Pat, "[IP]"),
      longNumPat, "[NUM]")

  /** BPE-ish token estimate: word tokens + standalone punctuation runs —
    * a cheap proxy for subword tokenizers (≈ tokens for ASCII prose).
    */
  def tokenEstimate(text: Column): Column =
    tokenCount(text) + (length(text) - length(regexp_replace(text, punctClass, "")))

  /** Ratio of punctuation characters. */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, punctClass, ""))).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  /** English stopword set for the quality measures (small on purpose: the
    * ratio is a signal, not an NLP dictionary). */
  val stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "at", "by", "be", "this")

  /** Fraction of tokens that are (lowercased) stopwords. */
  def stopwordRatio(text: Column): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    size(filter(toks, t => t.isin(stopwords: _*))).cast("double") /
      greatest(size(toks), lit(1)).cast("double")
  }

  /** Mean word length. */
  def meanWordLen(text: Column): Column = {
    val toks = split(trim(text), "\\s+")
    aggregate(toks, lit(0.0), (s, t) => s + length(t)).cast("double") /
      greatest(size(toks), lit(1)).cast("double")
  }

  /** Composite quality score in [0,1] from ALREADY-MATERIALIZED measures
    * (length sweet-spot, low punctuation, some-but-not-too-many stopwords —
    * C4-style heuristics). Compute the measures in their own projection:
    * the when-branches here would otherwise re-run each measure's regex.
    */
  def qualityFromMeasures(nTokens: Column, punct: Column, stop: Column): Column = {
    val lenScore = least(nTokens.cast("double") / lit(50.0), lit(1.0))
    val punctOk = when(punct <= 0.2, 1.0).otherwise(0.5)
    val stopOk = when(stop.between(0.01, 0.6), 1.0).otherwise(0.7)
    round(lenScore * punctOk * stopOk, 6)
  }

  /** One-shot convenience form; prefer `qualityFromMeasures` in hot paths. */
  def qualityScore(text: Column): Column =
    qualityFromMeasures(tokenCount(text), punctRatio(text), stopwordRatio(text))

  /** Stopword-hit language ID heuristic: count distinctive function-word
    * tokens per language, argmax with fixed precedence (en,de,fr,es,zh).
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "es" -> Seq("el", "que", "los", "por", "una"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  /** Per-language marker-token hit counts (one codegen'd filter per
    * language over the token split; map-only). Feeds [[langId]]; oracle:
    * q27_lang_id. */
  def langScores(text: Column): Seq[(String, Column)] = {
    val toks = split(lower(trim(text)), "\\s+")
    langMarkers.map { case (lang, ms) =>
      lang -> size(filter(toks, t => t.isin(ms: _*)))
    }
  }

  /** Marker-hit counts per language as one int array. Tokenize via this
    * column in its OWN projection, then scan the materialized token array
    * once per language — branching `when` chains defeat common-
    * subexpression elimination, so never inline the split into them.
    */
  def langCounts(text: Column): Column =
    langCountsFromToks(split(lower(trim(text)), "\\s+"))

  /** Per-language marker counts from an already-materialized token array. */
  def langCountsFromToks(toks: Column): Column =
    array(langMarkers.map { case (_, ms) =>
      size(filter(toks, t => t.isin(ms: _*)))
    }: _*)

  /** argmax over a `langCounts` array ('und' when no marker hits; ties
    * break by the fixed marker order).
    */
  def langIdFromCounts(counts: Column): Column = {
    val best = array_max(counts)
    langMarkers.zipWithIndex.foldRight(lit("und"): Column) {
      case (((lang, _), i), acc) =>
        when(element_at(counts, i + 1) === best && best > 0, lit(lang))
          .otherwise(acc)
    }
  }

  /** Predicted language — convenience one-shot form; prefer
    * `langCounts` + `langIdFromCounts` across two projections in hot paths.
    */
  def langId(text: Column): Column = langIdFromCounts(langCounts(text))

  /** Canonical text normalization: lowercase, strip ASCII control chars,
    * collapse whitespace runs to single spaces, trim. The regexes use
    * explicit ASCII classes so Java regex (Spark) and RE2 (DuckDB/the
    * oracle) agree byte-for-byte.
    */
  def normalize(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[\\x00-\\x1f]", ""),
      "\\s+", " "))

  /** Document fingerprint: minimum md5 over character k-grams sampled every
    * `stride` positions — the winnowing/rolling-hash family reduced to its
    * deterministic core (identical in DuckDB for the oracle). `stride > 1`
    * is the standard winnowing density/cost lever.
    */
  def fingerprint(text: Column, k: Int = 8, stride: Int = 1): Column =
    array_min(transform(
      sequence(lit(1), greatest(length(text) - (k - 1), lit(1)), lit(stride)),
      i => md5(text.substr(i, lit(k)))))

  /** Top-`topK` tf-idf terms per document: tf = raw in-doc count,
    * idf = ln(N / df), ties broken by token so ranks are engine-stable.
    *
    * Scale shape: two partial-aggregated groupBys (term counts, document
    * frequencies), the doc count broadcast as a one-row scalar, and the
    * per-doc rank window partitioned by doc_id — every stage shuffles on a
    * key, nothing global. Returns (idCol, token, tfidf, rk).
    */
  def tfIdf(df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
            topK: Int): org.apache.spark.sql.DataFrame = {
    val toks = df.select(col(idCol),
      explode(split(lower(trim(col(textCol))), "\\s+")).as("token"))
    val tf = toks.groupBy(idCol, "token").agg(count(lit(1)).as("__tf"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("__df"))
    val nDocs = df.agg(count(lit(1)).as("__N"))
    tf.join(dfreq, Seq("token"))
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf", col("__tf") * log(col("__N") / col("__df")))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(idCol).orderBy(col("tfidf").desc, col("token"))))
      .where(col("rk") <= topK)
      .select(col(idCol), col("token"), col("tfidf"), col("rk"))
  }

  /** RAG-style document chunking: overlapping token windows of `size`
    * tokens every `size - overlap` tokens (the last chunk may be shorter;
    * every token is covered; a doc shorter than `size` is one chunk). The
    * same half-open window arithmetic as the rolling segmenter, applied at
    * document granularity. Returns (idCol, chunk_id, chunk_text, n_tokens).
    *
    * Scale shape: pure map-side — tokenize once into a column, generate
    * chunk starts arithmetically (`sequence`), slice per chunk, posexplode.
    * No shuffle at all; chunking a 100 TB corpus is a single scan.
    */
  def chunkText(df: org.apache.spark.sql.DataFrame, idCol: String,
                textCol: String, size: Int, overlap: Int): org.apache.spark.sql.DataFrame = {
    require(size >= 1, "chunk size must be >= 1")
    require(overlap >= 0 && overlap < size, "need 0 <= overlap < size")
    val stride = size - overlap
    val w = col("__w")
    val len = size_(w)
    val nb = when(len <= size, lit(1L))
      .otherwise(ceil((len - lit(size)).cast("double") / stride) + 1L)
    df.withColumn("__w", split(trim(col(textCol)), "\\s+"))
      .select(col(idCol), posexplode(transform(
        sequence(lit(0L), nb - 1L),
        k => slice(w, (k * stride + 1L).cast("int"), lit(size))))
        .as(Seq("chunk_id", "__c")))
      .select(col(idCol), col("chunk_id"),
        concat_ws(" ", col("__c")).as("chunk_text"),
        size_(col("__c")).cast("long").as("n_tokens"))
  }
  private def size_(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.functions.size(c)

  /** CCNet-style perplexity scoring: a unigram language model with
    * add-one smoothing is fit on `train` and every `target` document gets
    * the perplexity of its token stream under that model,
    * `exp(-avg ln p(t))` with `p(t) = (count(t) + 1) / (N + V)` (`N` total
    * training tokens, `V` vocabulary size; an unseen token scores
    * `1 / (N + V)`). Low perplexity ≈ looks like the training corpus — the
    * standard quality gate of CCNet/CC-pipeline curation, here with a
    * relational LM instead of KenLM. Returns (idCol, ppl).
    *
    * Scale shape: the LM IS a DataFrame (token → count) built by one
    * hash groupBy over the training corpus; scoring is an equi-join of the
    * target's exploded tokens against it (shuffles on the token — vocab
    * tables at web scale exceed broadcast, so no broadcast is forced) plus
    * a one-row scalar cross-join for (N, V). Nothing collects.
    */
  def unigramPerplexity(train: org.apache.spark.sql.DataFrame,
                        target: org.apache.spark.sql.DataFrame,
                        idCol: String, textCol: String): org.apache.spark.sql.DataFrame = {
    val lm = train
      .select(explode(split(trim(col(textCol)), "\\s+")).as("__t"))
      .groupBy("__t").agg(count(lit(1)).as("__c"))
    val scalars = lm.agg(sum("__c").as("__n"), count(lit(1)).as("__v"))
    val toks = target.select(col(idCol),
      explode(split(trim(col(textCol)), "\\s+")).as("__t"))
    toks.join(lm, Seq("__t"), "left")
      .crossJoin(broadcast(scalars))
      .withColumn("__lp",
        log((coalesce(col("__c"), lit(0L)) + lit(1)) /
          (col("__n") + col("__v")).cast("double")))
      .groupBy(idCol).agg(exp(-avg(col("__lp"))).as("ppl"))
  }

  /** Gopher/MassiveText-style repetition statistics per document:
    *   - the most frequent word `topN`-gram (ties broken by gram asc, both
    *     engines), its occurrence count, and the fraction of the doc's
    *     characters it covers (`count * length(gram) / length(text)`);
    *   - the number of distinct `dupN`-grams occurring more than once.
    * High values on either flag template/boilerplate docs for removal —
    * the standard repetition filters of large-scale text pipelines.
    *
    * Scale shape: two explode → partial-aggregated groupBy(id, gram)
    * pipelines; the per-doc argmax is `min(struct(-cnt, gram))` — a plain
    * aggregate, no rank window. Docs shorter than the gram size survive via
    * the left joins (zero counts, null top gram).
    */
  def repetition(df: org.apache.spark.sql.DataFrame, idCol: String,
                 textCol: String, topN: Int = 2, dupN: Int = 5): org.apache.spark.sql.DataFrame = {
    val base = df.select(col(idCol), length(col(textCol)).as("__len"),
      col(textCol).as("__text"))
    def counts(n: Int) = base
      .select(col(idCol), explode(graft.expr.WordNgrams(col("__text"), n)).as("__g"))
      .groupBy(idCol, "__g").agg(count(lit(1)).as("__cnt"))
    val top = counts(topN)
      .groupBy(idCol)
      .agg(min(struct((-col("__cnt")).as("nc"), col("__g").as("g"))).as("__top"))
      .select(col(idCol), col("__top.g").as("top_gram"),
        (-col("__top.nc")).as("top_cnt"))
    val dups = counts(dupN).where(col("__cnt") >= 2)
      .groupBy(idCol).agg(count(lit(1)).as("dup_ngrams"))
    base.select(col(idCol), col("__len"))
      .join(top, Seq(idCol), "left")
      .join(dups, Seq(idCol), "left")
      .select(col(idCol), col("top_gram"),
        coalesce(col("top_cnt"), lit(0L)).as("top_cnt"),
        round(coalesce(when(col("__len") > 0,
          col("top_cnt") * length(col("top_gram")) / col("__len")),
          lit(0.0)), 6).as("top_char_frac"),
        coalesce(col("dup_ngrams"), lit(0L)).as("dup_ngrams"))
  }
}
