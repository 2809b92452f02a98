package graft
object OneOff {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val name = args(0); val sf = args(1)
    SparkEntry.queries(name)(spark, sf).coalesce(1)
      .write.mode("overwrite").parquet(s"/tmp/oneoff_$name")
    spark.stop()
  }
}
