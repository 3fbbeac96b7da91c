package graft.queries

import graft.SparkTestSession
import graft.io.LogTable
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** x53's contract: gram tables maintained INCREMENTALLY off the change
  * feed (insert images add their counts, delete images subtract, zeros
  * drop) are bit-identical to a full rebuild at the post-batch snapshot
  * — and the feed that drives them is served by the delta path, never a
  * snapshot diff. The fold algebra is pinned here against an adversarial
  * mini-corpus (deleted docs sharing grams with survivors, a gram that
  * drains to zero, a doc under two tokens contributing no bigrams).
  */
class IncrementalLmSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def gramTable(src: org.apache.spark.sql.DataFrame) =
    ExtQueries.gramTfOf(src)
      .groupBy("tag", "h").agg(sum("tf").cast("long").as("ctf"))

  test("incrementally maintained gram tables == full rebuild at the post-batch snapshot") {
    val vocab = Vector("only", "the", "quick", "fox", "ever", "jumps", "here")
    def text(id: Long): String =
      if (id % 11 == 0) vocab((id % 7).toInt) // single-token doc: no bigrams
      else if (id % 10 == 3) s"unicorn$id ${vocab((id % 7).toInt)} the fox"
      else (0 until (3 + (id % 5)).toInt)
        .map(j => vocab(((id * 13 + j * 3) % 7).toInt)).mkString(" ")
    val docs = (0L until 120L).map(i => (i, text(i))).toDF("doc_id", "text")

    val t = java.nio.file.Files.createTempDirectory("graft-x53spec")
      .resolve("docs_log").toString
    LogTable.create(spark, t,
      docs.filter(col("doc_id") % 5 =!= 0)
        .repartitionByRange(4, col("doc_id")), "doc_id")
    val v1 = LogTable.version(t)
    val preGrams = gramTable(LogTable.read(spark, t)).localCheckpoint()

    // the increment: retire a clustered slice, ingest fresh ids
    LogTable.deleteKeysDV(spark, t, "doc_id", (1L to 30L).filterNot(_ % 5 == 0))
    LogTable.append(spark, t,
      docs.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 1000).as("doc_id"), col("text")), "doc_id")

    val served0 = LogTable.cdcDeltaServes.get()
    val feed = LogTable.changes(spark, t, "doc_id", v1, LogTable.version(t))
    val ins = ExtQueries.gramTfOf(feed.filter(col("_change_type") =!= "delete")
      .select(col("doc_id"), col("text")))
      .select(col("tag"), col("h"), col("tf").cast("long").as("ctf"))
    val del = ExtQueries.gramTfOf(feed.filter(col("_change_type") === "delete")
      .select(col("doc_id"), col("text")))
      .select(col("tag"), col("h"), (-col("tf")).cast("long").as("ctf"))
    val maintained = preGrams.unionByName(ins).unionByName(del)
      .groupBy("tag", "h").agg(sum("ctf").as("ctf"))
      .filter(col("ctf") > 0)
      .select(col("tag"), col("h"), col("ctf").cast("long").as("ctf"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(LogTable.cdcDeltaServes.get() > served0,
      "x53's window (append + inline key delete) must ride the CDC delta path")

    val rebuilt = gramTable(LogTable.read(spark, t))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(maintained == rebuilt,
      "incremental maintenance diverged from the full rebuild: " +
        s"only-maintained=${(maintained -- rebuilt).take(5)} " +
        s"only-rebuilt=${(rebuilt -- maintained).take(5)}")
    // the subtraction genuinely fired: some gram must have drained out
    val pre = preGrams.collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert((pre -- rebuilt.map(x => (x._1, x._2))).nonEmpty,
      "fixture too tame: no gram drained to zero, the delete half is untested")
  }
}
