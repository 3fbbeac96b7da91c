package graft.streaming

import graft.model.WooSchemas
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery

/** The reference ETL as a STRUCTURED STREAM: raw order JSON lands in a
  * directory (one order object per line — the shape the paged client
  * yields), each micro-batch runs the exact batch pipeline
  * ([[graft.Run.processRawOrders]]: normalize → enrich → apply refunds)
  * and upserts both facts idempotently through foreachBatch.
  *
  * This closes the SURVEY §2.8 "foreachBatch + idempotent overwrite" row
  * with executed code: the transform body is the SAME function the CLI
  * twin runs, so a warehouse fed by this stream is equal row-for-row to
  * one fed by `graft.Run` over the same orders — and a REPLAYED file
  * (re-delivery) is absorbed by the keyed upsert, the streaming
  * expression of run.py's re-fetch window idempotence. Both pinned in
  * OrderStreamSpec.
  *
  * Scale notes: the file source checkpoints its processed-file log under
  * `checkpointDir` (exactly-once per file); micro-batch size is bounded
  * by `maxFilesPerTrigger` when backfilling a large landing dir; state
  * here is the warehouse itself — the stream holds none. */
object OrderStream {

  /** Start the streaming ETL over a landing directory of order-JSON
    * files. `data` backs the per-batch product/refund lookups (the same
    * fixture API the batch twin calls). */
  def startEtlStream(
      spark: SparkSession,
      ordersJsonDir: String,
      data: String,
      warehouse: String,
      checkpointDir: String,
      maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    val reader = spark.readStream
      .schema(WooSchemas.rawOrder)
      .option("pathGlobFilter", "*.json")
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    reader.json(ordersJsonDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.Run.processRawOrders(spark, batch.toDF(), data, warehouse)
        ()
      }
      .start()
  }
}
