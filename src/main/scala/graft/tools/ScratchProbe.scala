package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway measurement probe for the r18 optimization round (not
  * part of the declared surface; deleted before round close). */
object ScratchProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val docs = spark.read.parquet(s"$d/documents.parquet")
    println("docs=" + docs.count())
    val dt = docs.select(col("doc_id"),
      sort_array(array_distinct(split(col("text"), " "))).as("tk"))
    val tok = dt.select(col("doc_id"), explode(col("tk")).as("token"))
    val hashCols = (0 until 32).map(i =>
      min(xxhash64(concat_ws("#", col("token"), lit(i.toString)))).as(s"h$i"))
    val perDoc = tok.groupBy("doc_id").agg(hashCols.head, hashCols.tail: _*)
      .join(dt, "doc_id").withColumn("sz", size(col("tk")).cast("long"))
    val sigCols = (0 until 8).map { b =>
      xxhash64((0 until 4).map(r => col(s"h${b * 4 + r}")): _*) }
    val buckets = perDoc.select(col("doc_id"), col("sz"),
      posexplode(array(sigCols: _*)).as(Seq("band", "sig")))
    val a = buckets.select(col("band"), col("sig"),
      col("doc_id").as("d1"), col("sz").as("sz1"))
    val b = buckets.select(col("band"), col("sig"),
      col("doc_id").as("d2"), col("sz").as("sz2"))
    val joined = a.join(b, Seq("band", "sig")).filter(col("d1") < col("d2"))
    println("candidates (all bands, d1<d2) = " + joined.count())
    println("candidates after sz ratio = " + joined
      .filter(col("sz1") * 100 >= col("sz2") * 80 &&
        col("sz2") * 100 >= col("sz1") * 80).count())
    // size-class cut: c = floor(ln(sz)/ln(1.25)); compatible iff |c1-c2|<=1
    val cls = floor(log(col("sz").cast("double")) / math.log(1.25))
    val a2 = a.withColumn("c1", floor(log(col("sz1").cast("double")) / math.log(1.25)))
    val b2 = b.withColumn("c2", floor(log(col("sz2").cast("double")) / math.log(1.25)))
    val j2 = a2.join(b2, Seq("band", "sig"))
      .filter(col("d1") < col("d2"))
      .filter(abs(col("c1") - col("c2")) <= 1)
    println("candidates after class prefilter = " + j2.count())
    spark.stop()
  }
}
