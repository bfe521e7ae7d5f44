package graft.tools
import org.apache.spark.sql.SparkSession
/** Replicates the driver's entry() smoke check (rows > 0 at sf0.001). */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(s"ENTRY_ROWS=${graft.SparkEntry.entry(spark).count()}")
    spark.stop()
  }
}
