package graft.examples

import org.apache.spark.sql.SparkSession
import graft.api.{HttpApi, PromEngine}
import graft.model.TimeSeriesModel
import graft.sources.Tables

/** The `serve` command analog (ref cmd/serve.go): Prometheus-compatible HTTP
  * API over the events fixture.
  * `runMain graft.examples.Serve [port] [sfDir] [lookbackMs]` */
object Serve {
  def main(args: Array[String]): Unit = {
    val port = args.headOption.map(_.toInt).getOrElse(9090)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val lookback = if (args.length > 2) args(2).toLong else 86400000L
    val spark = SparkSession.builder().master("local[8]")
      .appName("graft-serve")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // accept either a raw fixture dir or a converted layout (<dir>/samples)
    val samples =
      if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get(s"$sfDir/samples")))
        graft.etl.Ingest.openSamples(spark, sfDir)
      else TimeSeriesModel.samples(Tables(spark, sfDir).events)
    val api = new HttpApi(new PromEngine(samples, lookback), port).start()
    println(s"SERVING on http://127.0.0.1:${api.boundPort}/api/v1/query")
    Thread.currentThread().join() // serve until killed
  }
}
