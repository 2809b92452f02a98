package graft
object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries("join_asof_nearest")(spark, "/root/testdata/sf0.1").explain("formatted")
    spark.stop()
  }
}
