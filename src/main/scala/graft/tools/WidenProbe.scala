package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe: can Spark 4.1's parquet readers serve an int32/float
  * file under a widened long/double requested schema? */
object WidenProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("widen-probe").toString
    Seq((1, 1.5f), (2, 2.5f)).toDF("i", "f").write.parquet(s"$dir/t")
    val widened = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("i", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("f", org.apache.spark.sql.types.DoubleType)))
    try {
      val rows = spark.read.schema(widened).parquet(s"$dir/t").collect()
      println("VECTORIZED-OK " + rows.map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).mkString(","))
    } catch { case e: Throwable => println("VECTORIZED-FAIL " + e) }
    try {
      spark.conf.set("spark.sql.parquet.enableVectorizedReader", "false")
      val rows = spark.read.schema(widened).parquet(s"$dir/t").collect()
      println("ROWBASED-OK " + rows.map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).mkString(","))
    } catch { case e: Throwable => println("ROWBASED-FAIL " + e) }
    spark.stop()
  }
}
