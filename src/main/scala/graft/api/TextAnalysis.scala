package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines — TF-IDF term
  * extraction, profile-based language identification, and C4-style quality
  * flags — parameterized over caller columns, same design rules as
  * [[GraftOps]] (deterministic ranks with tiebreakers, flat outputs, no
  * UDFs). Tokens are whitespace splits throughout; normalize/tokenize
  * upstream if your corpus needs more. */
object TextAnalysis {

  private def tokens(c: Column): Column = split(c, " ")

  /** Per-document top-`topN` TF-IDF terms. idf = ln((N+1)/(df+1)) + 1
    * (+1-smoothed); the corpus count N comes from a SCALAR SUBQUERY, so
    * the plan carries no join against a 1-row aggregate. Emits
    * (doc_id, rn, word, tf, df, score_raw) ranked per document by
    * (score desc, word asc). */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
      topN: Int = 1): DataFrame = {
    require(topN >= 1, "topN must be positive")
    val d = docs.select(col(idCol).as("doc_id"), col(textCol).as("__text"))
    val tok = d.select(col("doc_id"), explode(tokens(col("__text"))).as("word"))
    val tf = tok.groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
    val dfreq = tok.groupBy("word").agg(countDistinct("doc_id").as("df"))
    val n = d.agg(count(lit(1)).as("n")).scalar()
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score_raw").desc, col("word").asc)
    tf.join(dfreq, "word")
      .withColumn("score_raw",
        col("tf") * (log((n + 1).cast("double") / (col("df") + 1)) + 1))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= topN)
      .select(col("doc_id"), col("rn").cast("int").as("rn"), col("word"),
        col("tf"), col("df"), col("score_raw"))
  }

  /** Top-`topN` terms by frequency within each group (corpus
    * vocabularies, per-language stopword candidates, …), rank ties to the
    * alphabetically first word. Emits (group, rn, word, cnt). */
  def topTermsPerGroup(docs: DataFrame, groupCol: String, textCol: String,
      topN: Int = 10): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(col("cnt").desc, col("word").asc)
    docs.select(col(groupCol), explode(tokens(col(textCol))).as("word"))
      .groupBy(groupCol, "word").agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= topN)
      .select(col(groupCol), col("rn").cast("int").as("rn"), col("word"), col("cnt"))
  }

  /** Top-`topN` distinct-token profiles per language from a labeled corpus
    * — the training half of [[langId]]. Emits (p_lang, token). */
  def langProfiles(labeled: DataFrame, langCol: String, textCol: String,
      topN: Int = 10): DataFrame = {
    val tok = labeled.select(col(langCol).as("p_lang"),
      explode(array_distinct(tokens(col(textCol)))).as("token"))
    val w = Window.partitionBy("p_lang").orderBy(col("cnt").desc, col("token").asc)
    tok.groupBy("p_lang", "token").agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= topN)
      .select("p_lang", "token")
  }

  /** Profile-overlap language ID: score = |distinct doc tokens ∩ profile
    * tokens| per language, argmax with (score desc, lang asc) tiebreak;
    * zero-overlap docs emit ("unknown", 0). The profile table is tiny
    * metadata — broadcast; the corpus streams. Emits
    * (doc_id, pred_lang, score). */
  def langId(docs: DataFrame, idCol: String, textCol: String,
      profiles: DataFrame): DataFrame = {
    val tok = docs.select(col(idCol).as("doc_id"),
      explode(array_distinct(tokens(col(textCol)))).as("token"))
    val scores = tok.join(broadcast(profiles), "token")
      .groupBy("doc_id", "p_lang").agg(count(lit(1)).as("score"))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("p_lang").asc)
    val pred = scores.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
    docs.select(col(idCol).as("doc_id"))
      .join(pred, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("p_lang"), lit("unknown")).as("pred_lang"),
        coalesce(col("score"), lit(0L)).as("score"))
  }

  /** C4-style quality flags per document — length band, word-count band,
    * stopword ratio, duplicated-prefix detection, and the combined `pass`
    * bit. `charLen` is the character-length column (pass
    * `length(col(textCol))` when not precomputed — the testdata carries it
    * as `n_chars`). The only shuffle is the prefix-hash window. Emits
    * (doc_id, wc, mwl, stop_ratio, len_ok, wc_ok, dup_prefix, pass). */
  def qualityFlags(docs: DataFrame, idCol: String, textCol: String,
      charLen: Column, stopWords: Seq[String],
      lenRange: (Int, Int) = (100, 450), wcRange: (Int, Int) = (10, 100),
      maxStopRatio: Double = 0.3, dupPrefixLen: Int = 50): DataFrame = {
    val stop = stopWords.map(t => s"'$t'").mkString(", ")
    val w = Window.partitionBy("ph")
    docs
      .withColumn("tk", tokens(col(textCol)))
      .withColumn("wc", size(col("tk")))
      .withColumn("mwl", (charLen - (col("wc") - 1)).cast("double") / col("wc"))
      .withColumn("stop_ratio",
        expr(s"size(filter(tk, x -> x IN ($stop)))").cast("double") / col("wc"))
      .withColumn("len_ok", charLen.between(lenRange._1, lenRange._2).cast("int"))
      .withColumn("wc_ok", col("wc").between(wcRange._1, wcRange._2).cast("int"))
      .withColumn("ph", md5(substring(col(textCol), 1, dupPrefixLen)))
      .withColumn("dup_prefix", (count(lit(1)).over(w) > 1).cast("int"))
      .withColumn("pass",
        (col("len_ok") === 1 && col("wc_ok") === 1 &&
          col("stop_ratio") <= maxStopRatio && col("dup_prefix") === 0).cast("int"))
      .select(col(idCol).as("doc_id"), col("wc"), col("mwl"), col("stop_ratio"),
        col("len_ok"), col("wc_ok"), col("dup_prefix"), col("pass"))
  }
}
