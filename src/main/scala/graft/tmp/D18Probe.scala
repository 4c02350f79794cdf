package graft.tmp
import org.apache.spark.sql.SparkSession
object D18Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.sql.adaptive.enabled","false")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.01", "documents")
    val df = graft.ops.Dedup.boilerplateScrub(docs)
    println(df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
      .linesIterator.filter(l => l.contains("Exchange") || l.contains("Reused") || l.contains("Join") || l.contains("Aggregate") || l.contains("Sort")).take(30).mkString("\n"))
    spark.stop()
  }
}
