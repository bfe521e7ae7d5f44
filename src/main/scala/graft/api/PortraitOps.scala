package graft.api

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Public, parameterized user-portrait operators — the reference's two
  * hallmark computations as library functions over caller-supplied frames:
  * RFM customer-value scoring and the BaseModel profile merge. Same design
  * rules as [[GraftOps]]: deterministic (ntile windows carry the entity key
  * as tiebreaker — ntile is tie-order-sensitive), flat outputs, fixed
  * anchors instead of current_date. */
object PortraitOps {

  /** RFM scoring: per `keyCol` entity compute R = days from last `dateCol`
    * to `anchor` (an ISO date literal), F = row count, M = exact
    * DECIMAL-summed `amountCol`; score each 1–5 by global ntile (R
    * inverted: fresher = higher), deterministic under ties via the entity
    * key. Scale note: the global ntile is a single-partition sort — at
    * 100 TB swap in approx-percentile boundaries (see
    * engine.Portrait.rfmScoredApprox, the tested variant). */
  def rfmScored(orders: DataFrame, keyCol: String, dateCol: String,
      amountCol: String, anchor: String): DataFrame = {
    val base = orders.groupBy(keyCol).agg(
      datediff(lit(anchor).cast("date"), max(to_date(col(dateCol))))
        .cast("long").as("r_days"),
      count(lit(1)).as("f"),
      graft.engine.Tables.decSum(col(amountCol)).as("m"))
    val wR = Window.orderBy(col("r_days").desc, col(keyCol).asc)
    val wF = Window.orderBy(col("f").asc, col(keyCol).asc)
    val wM = Window.orderBy(col("m").asc, col(keyCol).asc)
    base
      .withColumn("r_score", ntile(5).over(wR))
      .withColumn("f_score", ntile(5).over(wF))
      .withColumn("m_score", ntile(5).over(wM))
  }

  /** Full RFM model: scores plus the composite 100r+10f+m code and the
    * value-segment banding. */
  def rfm(orders: DataFrame, keyCol: String, dateCol: String,
      amountCol: String, anchor: String): DataFrame =
    rfmScored(orders, keyCol, dateCol, amountCol, anchor)
      .withColumn("rfm",
        (col("r_score") * 100 + col("f_score") * 10 + col("m_score")).cast("int"))
      .withColumn("segment",
        when(col("r_score") >= 4 && col("f_score") >= 4 && col("m_score") >= 4, "champion")
          .when(col("r_score") >= 3 && col("f_score") >= 3, "loyal")
          .when(col("r_score") >= 3, "potential")
          .when(col("f_score") >= 3 || col("m_score") >= 3, "at_risk")
          .otherwise("hibernating"))
      .select(col(keyCol), col("r_days"), col("f"), col("m"),
        col("r_score"), col("f_score"), col("m_score"), col("rfm"), col("segment"))
      .orderBy(keyCol)

  /** Profile merge (the reference's BaseModel upsert): full-outer-join
    * yesterday's and today's per-entity tag arrays, union, dedupe, sort,
    * emit comma-joined. Idempotent and commutative; null-safe on either
    * side (new entities, disappeared entities). Both inputs: (`keyCol`,
    * `tagsCol`: array<string>). */
  def profileMerge(oldTags: DataFrame, newTags: DataFrame, keyCol: String,
      tagsCol: String = "tags"): DataFrame = {
    val old = oldTags.select(col(keyCol), col(tagsCol).as("old_tags"))
    val neu = newTags.select(col(keyCol), col(tagsCol).as("new_tags"))
    neu.join(old, Seq(keyCol), "full")
      .select(col(keyCol),
        array_join(
          array_sort(array_distinct(concat(
            coalesce(col("old_tags"), array()),
            coalesce(col("new_tags"), array())))), ",").as("profile"))
      .orderBy(keyCol)
  }
}
