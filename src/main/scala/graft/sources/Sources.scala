package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** A1-A3 — the engine's source surface (SURVEY §2.A).
  *
  * The reference consumes one gRPC stream demultiplexed over typed Go
  * channels (process.go:15-67) plus two batch snapshots (securities
  * directory, history candles). Spark-first mapping: ONE source per event
  * type — batch `spark.read` with an explicit schema (never inference;
  * the reference declares DDL up front, main.go:61-65) and
  * `spark.readStream` over the same layout for the live path. Demux is
  * "separate sources", not a union-then-split: each stream keeps its own
  * schema, watermark and sink.
  *
  * Scale notes: sources take explicit schemas so the parquet footer scan
  * is the only metadata read; a production deployment points the same
  * readers at a Kafka topic per event type with identical downstream
  * plumbing (the transforms only see a typed DataFrame).
  */
object Sources {

  /** A2-analog batch read with enforced schema. */
  def batch(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).parquet(path)

  /** A1-analog file stream: tails a directory of parquet drops with the
    * same schema as the batch path (tests feed it via MemoryStream
    * instead — see StreamingSpec — since the semantics live in the
    * transforms, not the transport).
    */
  def stream(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(path)
}
