package graft.api

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Public, parameterized user-portrait operators — the reference's hallmark
  * computations as library functions over caller-supplied frames: rule-driven
  * tag models (rules as DATA, parsed from the reference's `##`/`=` rule
  * strings), RFM-style quintile scoring (exact and approximate), and the
  * BaseModel profile merge + partitioned upsert write path. Same design
  * rules as [[GraftOps]]: deterministic (ntile windows carry the entity key
  * as tiebreaker — ntile is tie-order-sensitive), flat outputs, fixed
  * anchors instead of current_date. */
object PortraitOps {

  // ---------------------------------------------------------------- rules

  /** Parse the reference's rule strings — `##`-separated `k=v` pairs (the
    * 4-level tag metadata format, e.g. `"seg=AUTOMOBILE"` or
    * `"lo=2000##hi=5000"`) — into a `rule_kv` map column. Rules arrive as
    * DATA (any DataFrame with a rule-string column: a JDBC read of the tag
    * metadata table, a CSV, a literal frame), so real tag metadata feeds
    * the same operators the test bindings use. */
  def parseRules(rules: DataFrame, ruleCol: String = "rule"): DataFrame =
    rules.withColumn("rule_kv", str_to_map(col(ruleCol), lit("##"), lit("=")))

  /** Match-type tag model (the Gender/Job shape): rows of `df` whose
    * `attrCol` equals a rule's value for `ruleKey` pick up that rule row's
    * remaining columns (tag id, tag name, …). The rule table is tiny tag
    * metadata — broadcast; the fact side streams. */
  def ruleMatch(df: DataFrame, attrCol: String, ruleKey: String,
      rules: DataFrame, ruleCol: String = "rule"): DataFrame = {
    val parsed = parseRules(rules, ruleCol)
      .withColumn("__match_v", element_at(col("rule_kv"), lit(ruleKey)))
      .filter(col("__match_v").isNotNull)
      .drop("rule_kv", ruleCol)
    df.join(broadcast(parsed), col(attrCol) === col("__match_v"))
      .drop("__match_v")
  }

  /** Band-type tag model (the age-range shape): rules carry `lo`/`hi`
    * bounds (`"lo=0##hi=2000"`); a row matches when
    * `lo <= valCol < hi`. Broadcast band join — the band table is metadata,
    * never the fact side. */
  def rangeBand(df: DataFrame, valCol: String,
      rules: DataFrame, ruleCol: String = "rule"): DataFrame = {
    val parsed = parseRules(rules, ruleCol)
      .withColumn("__lo", element_at(col("rule_kv"), lit("lo")).cast("double"))
      .withColumn("__hi", element_at(col("rule_kv"), lit("hi")).cast("double"))
      .filter(col("__lo").isNotNull && col("__hi").isNotNull)
      .drop("rule_kv", ruleCol)
    df.join(broadcast(parsed),
        col(valCol) >= col("__lo") && col(valCol) < col("__hi"))
      .drop("__lo", "__hi")
  }

  /** Mode tag (most-frequent value, the payment-type model shape): per
    * entity the most frequent `valCol` with (count desc, value asc)
    * tiebreak — two-level aggregation, then a per-entity rank. Emits
    * (keyCol, top_value, cnt). */
  def mostFrequent(df: DataFrame, keyCol: String, valCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col("cnt").desc, col(valCol).asc)
    df.groupBy(keyCol, valCol).agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col(keyCol), col(valCol).as("top_value"), col("cnt"))
  }

  /** Recency-cycle tag: days from each entity's latest `dateCol` to
    * `anchor` (ISO date literal), banded by ascending (name, maxDays)
    * thresholds with `elseName` past the last. Emits
    * (keyCol, days_since, band). */
  def recencyBands(df: DataFrame, keyCol: String, dateCol: String,
      anchor: String, bands: Seq[(String, Int)], elseName: String): DataFrame = {
    require(bands.nonEmpty && bands.map(_._2) == bands.map(_._2).sorted,
      "bands must be (name, maxDays) in ascending maxDays order")
    val banded = bands.reverse.foldLeft(lit(elseName): Column) {
      case (rest, (nm, hi)) => when(col("days_since") <= hi, nm).otherwise(rest)
    }
    df.groupBy(keyCol)
      .agg(datediff(lit(anchor).cast("date"), max(to_date(col(dateCol))))
        .cast("long").as("days_since"))
      .withColumn("band", banded)
  }

  /** Sequential conversion funnel (the behavior-analysis model shape): for
    * the ordered `steps` values of `typeCol`, each entity's time of the
    * FIRST occurrence of step i STRICTLY AFTER its step i−1 time, plus
    * `level` = how deep the entity converted. k steps cost k (join +
    * min-aggregation) passes, every shuffle on the entity key — no
    * per-entity event collection, no window over the full stream. Emits
    * (keyCol, step0_ts … stepN_ts, level); step times are whatever type
    * `tsCol` is (nulls past the conversion depth). */
  def funnelSteps(events: DataFrame, keyCol: String, typeCol: String,
      tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val ev = events.select(col(keyCol), col(typeCol).as("__t"), col(tsCol).as("__ts"))
    var acc = ev.select(col(keyCol)).distinct()
    steps.zipWithIndex.foreach { case (st, i) =>
      val source =
        if (i == 0) ev.filter(col("__t") === st)
        else ev.filter(col("__t") === st)
          .join(acc.select(col(keyCol), col(s"step${i - 1}_ts")), Seq(keyCol))
          .filter(col("__ts") > col(s"step${i - 1}_ts"))
      acc = acc.join(
        source.groupBy(keyCol).agg(min("__ts").as(s"step${i}_ts")),
        Seq(keyCol), "left")
    }
    acc.withColumn("level",
      steps.indices.map(i => col(s"step${i}_ts").isNotNull.cast("int"))
        .reduce(_ + _))
  }

  /** PSM price-sensitivity model (the reference's hallmark mining tag next
    * to RFM): rolls per-ORDER discount structure up to the entity —
    * tdonr = discounted-order ratio, adar = mean per-order
    * discount-amount ratio, tdar = total-discount ratio (exact: the
    * per-order doubles re-enter DECIMAL so the totals ratio carries no
    * float accumulation error) — sums them into the psm score (4dp) and
    * bands it. `perOrder` must carry one row per (entity, order) with a
    * 0/1 discounted flag, the order's discount amount, and its gross.
    * Bands are ascending (name, upper-bound) pairs; `elseName` past the
    * last. */
  def psmScores(perOrder: DataFrame, keyCol: String, hasDiscCol: String,
      discAmtCol: String, grossCol: String,
      bands: Seq[(String, Double)] = Seq("insensitive" -> 0.9, "low" -> 1.0,
        "mid" -> 1.05, "high" -> 1.1),
      elseName: String = "very_high"): DataFrame = {
    require(bands.nonEmpty && bands.map(_._2) == bands.map(_._2).sorted,
      "bands must be (name, upperBound) in ascending bound order")
    val banded = bands.reverse.foldLeft(lit(elseName): Column) {
      case (rest, (nm, hi)) => when(col("psm") < hi, nm).otherwise(rest)
    }
    perOrder.groupBy(keyCol).agg(
        (sum(col(hasDiscCol)) / count(lit(1))).as("tdonr_raw"),
        avg(col(discAmtCol) / col(grossCol)).as("adar_raw"),
        (sum(col(discAmtCol).cast("decimal(18,4)")).cast("double") /
          sum(col(grossCol).cast("decimal(18,2)")).cast("double")).as("tdar_raw"))
      .withColumn("psm",
        round(col("tdonr_raw") + col("adar_raw") + col("tdar_raw"), 4))
      .withColumn("psm_band", banded)
  }

  /** Batch sessionization (lag-gap/cumsum form): events within
    * `gap` of the previous event of the same entity share a session; a
    * larger gap starts a new one. Two window passes over one shuffle on
    * the entity key. `tsCol` must be a numeric time (any unit — `gap` is
    * in the same unit); `tieCol` breaks equal-timestamp ordering. Emits
    * one row per event: (all input columns, session_id) with session ids
    * numbered 1.. per entity. The streaming twin is
    * [[graft.streaming.StreamOps.sessionize]]. */
  def sessionize(events: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, gap: Long): DataFrame = {
    val wOrd = Window.partitionBy(keyCol).orderBy(col(tsCol).asc, col(tieCol).asc)
    val wCum = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("__prev_ts", lag(tsCol, 1).over(wOrd))
      .withColumn("__is_new",
        when(col("__prev_ts").isNull ||
          col(tsCol) - col("__prev_ts") > gap, 1).otherwise(0))
      .withColumn("session_id", sum("__is_new").over(wCum))
      .drop("__prev_ts", "__is_new")
  }

  /** Retention cohorts (the second behavior-analysis staple next to
    * [[funnelSteps]]): entities cohort by their FIRST active day (aligned
    * to `periodDays`-wide periods on the 1970-01-01 epoch grid), and each
    * (cohort, period-offset) cell counts the distinct entities active in
    * that period. Two distinct-aggregations and one broadcast-size join —
    * the cohort table is one row per cohort. Emits (cohort_start, offset,
    * active_users, cohort_size, retention); offset 0 always has
    * retention 1.0. */
  def retentionCohorts(events: DataFrame, keyCol: String, tsCol: String,
      periodDays: Int = 7): DataFrame = {
    require(periodDays >= 1, "periodDays must be positive")
    val perUser = events.groupBy(keyCol)
      .agg(min(to_date(col(tsCol))).as("first_day"))
      .withColumn("cohort_start", date_sub(col("first_day"),
        pmod(datediff(col("first_day"), lit("1970-01-01").cast("date")),
          lit(periodDays)).cast("int")))
      .select(col(keyCol), col("cohort_start"))
    val sizes = perUser.groupBy("cohort_start")
      .agg(countDistinct(keyCol).as("cohort_size"))
    val activity = events.select(col(keyCol), to_date(col(tsCol)).as("day")).distinct()
    activity.join(perUser, Seq(keyCol))
      .withColumn("offset",
        expr(s"datediff(day, cohort_start) div $periodDays").cast("int"))
      .groupBy("cohort_start", "offset")
      .agg(countDistinct(keyCol).as("active_users"))
      .join(broadcast(sizes), Seq("cohort_start"))
      // raw double ratio, NOT rounded: active/size is an exact small-int
      // ratio, and rounding exact ties diverges between HALF_UP and
      // HALF_EVEN engines (Tables.scala parity rules)
      .withColumn("retention",
        col("active_users").cast("double") / col("cohort_size"))
  }

  // -------------------------------------------------------------- scoring

  /** Score metric columns 1–5 by quintile. `specs` rows are
    * (metricCol, scoreCol, higherIsBetter).
    *
    *  - `exact = false` (the DEFAULT — the 100 TB path): quintile
    *    boundaries from one `percentile_approx` pass, then scores are a
    *    pure projection — no global sort, no single-partition stage.
    *    Scores can differ from exact ntile by ±1 near quintile boundaries.
    *  - `exact = true` (the reference/oracle semantics): global `ntile(5)`
    *    with the entity key as tiebreaker — bit-deterministic, but each
    *    window is a single-partition sort of ALL entities. Fine into the
    *    10^8-entity range; opt in when bit-exact quintiles matter more
    *    than the single-reducer sort (the driver's oracle bindings do).
    */
  def quintileScores(base: DataFrame, keyCol: String,
      specs: Seq[(String, String, Boolean)], exact: Boolean = false): DataFrame =
    if (exact) {
      specs.foldLeft(base) { case (df, (metric, score, hib)) =>
        val ord = if (hib) col(metric).asc else col(metric).desc
        df.withColumn(score,
          ntile(5).over(Window.orderBy(ord, col(keyCol).asc)))
      }
    } else {
      val qs = array(lit(0.2), lit(0.4), lit(0.6), lit(0.8))
      val aggs = specs.map { case (metric, score, _) =>
        percentile_approx(col(metric), qs, lit(10000)).as(s"__b_$score")
      }
      // the 1-row bounds frame joins as an explicit broadcast cross join —
      // a constant equi-key would be folded away by Catalyst and re-planned
      // as a nested loop anyway, so say what it is
      val bounds = base.agg(aggs.head, aggs.tail: _*)
      val joined = base.crossJoin(broadcast(bounds))
      specs.foldLeft(joined) { case (df, (metric, score, hib)) =>
        val b = col(s"__b_$score")
        def beats(i: Int): Column =
          if (hib) (col(metric) > b(i)).cast("int")
          else (col(metric) < b(i)).cast("int")
        df.withColumn(score,
          ((0 until 4).map(beats).reduce(_ + _) + lit(1)).cast("int"))
      }.drop(specs.map(s => s"__b_${s._2}"): _*)
    }

  /** RFM scoring: per `keyCol` entity compute R = days from last `dateCol`
    * to `anchor` (an ISO date literal), F = row count, M = exact
    * DECIMAL-summed `amountCol`; score each 1–5 by quintile (R inverted:
    * fresher = higher) via [[quintileScores]] — `exact` defaults to the
    * approx-boundary scale path; pass `exact = true` for bit-exact ntiles. */
  def rfmScored(orders: DataFrame, keyCol: String, dateCol: String,
      amountCol: String, anchor: String, exact: Boolean = false): DataFrame = {
    val base = orders.groupBy(keyCol).agg(
      datediff(lit(anchor).cast("date"), max(to_date(col(dateCol))))
        .cast("long").as("r_days"),
      count(lit(1)).as("f"),
      graft.engine.Tables.decSum(col(amountCol)).as("m"))
    quintileScores(base, keyCol, Seq(
      ("r_days", "r_score", false), ("f", "f_score", true),
      ("m", "m_score", true)), exact)
  }

  /** Full RFM model: scores plus the composite 100r+10f+m code and the
    * value-segment banding. */
  def rfm(orders: DataFrame, keyCol: String, dateCol: String,
      amountCol: String, anchor: String, exact: Boolean = false): DataFrame =
    rfmScored(orders, keyCol, dateCol, amountCol, anchor, exact)
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

  // -------------------------------------------------------------- profile

  /** Tag-array merge, array-valued (the reusable core of the BaseModel
    * upsert): full-outer-join old and new per-entity tag arrays, union,
    * dedupe, sort. Idempotent and commutative; null-safe on either side.
    * Both inputs: (`keyCol`, `tagsCol`: array<string>). */
  def profileMergeTags(oldTags: DataFrame, newTags: DataFrame, keyCol: String,
      tagsCol: String = "tags"): DataFrame = {
    val old = oldTags.select(col(keyCol), col(tagsCol).as("__old_tags"))
    val neu = newTags.select(col(keyCol), col(tagsCol).as("__new_tags"))
    neu.join(old, Seq(keyCol), "full")
      .select(col(keyCol),
        array_sort(array_distinct(concat(
          coalesce(col("__old_tags"), array()),
          coalesce(col("__new_tags"), array())))).as(tagsCol))
  }

  /** Profile merge (the reference's BaseModel upsert, compute half):
    * [[profileMergeTags]] emitted as the comma-joined profile string. */
  def profileMerge(oldTags: DataFrame, newTags: DataFrame, keyCol: String,
      tagsCol: String = "tags"): DataFrame =
    profileMergeTags(oldTags, newTags, keyCol, tagsCol)
      .select(col(keyCol), array_join(col(tagsCol), ",").as("profile"))
      .orderBy(keyCol)

  /** Day-over-day profile upsert — the WRITE half of the BaseModel cycle.
    * The profile table lives at `tableDir` as parquet partitioned by
    * `bucket = pmod(xxhash64(key), nBuckets)`. An upsert merges the
    * incoming tag arrays with the existing rows of ONLY the buckets that
    * contain affected keys, then dynamic-partition-overwrites just those
    * partitions — a day's delta rewrites a bounded set of partitions, not
    * the table. Untouched partitions are never read or written. Returns
    * the read-back table (keyCol, tagsCol, bucket).
    *
    * CONCURRENCY CONTRACT: dynamic partition overwrite is NOT atomic
    * across partitions and carries no table-level lock — the caller must
    * serialize upserts to one table (one writer at a time; a streaming
    * `foreachBatch` loop satisfies this by construction since batches run
    * sequentially). Two concurrent upserts can interleave partition
    * swaps and lose one writer's merge. A reader overlapping a write can
    * see some buckets new and some old (bucket-level, not table-level,
    * snapshot consistency). Deployments needing concurrent writers or
    * atomic table swaps should put a transactional table format
    * (Delta/Iceberg-style commit protocol) under this same merge logic. */
  def profileUpsert(spark: SparkSession, tableDir: String, newTags: DataFrame,
      keyCol: String, tagsCol: String = "tags", nBuckets: Int = 16): DataFrame = {
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    def bucketOf(c: Column): Column = pmod(xxhash64(c), lit(nBuckets)).cast("int")
    val neu = newTags.select(col(keyCol), col(tagsCol))
    val path = new org.apache.hadoop.fs.Path(tableDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val merged =
      if (!fs.exists(path))
        neu.select(col(keyCol), array_sort(array_distinct(col(tagsCol))).as(tagsCol))
      else {
        val old = spark.read.parquet(tableDir).select(col(keyCol), col(tagsCol))
        val touched = neu.select(bucketOf(col(keyCol)).as("bucket")).distinct()
        val oldAffected = old.withColumn("bucket", bucketOf(col(keyCol)))
          .join(broadcast(touched), "bucket").drop("bucket")
        profileMergeTags(oldAffected, neu, keyCol, tagsCol)
      }
    merged.withColumn("bucket", bucketOf(col(keyCol)))
      .write.mode("overwrite").partitionBy("bucket").parquet(tableDir)
    spark.read.parquet(tableDir)
  }
}
