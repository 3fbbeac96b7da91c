package graft.sources.v2

import graft.SparkTestSession
import graft.io.LogTable
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import scala.util.Random

/** Model-based random walk over the SQL row-level surface — the
  * catalog-served verbs that make a log table a lakehouse table:
  * INSERT INTO, UPDATE (range and IN-subquery), DELETE FROM, MERGE INTO
  * (matched-update / not-matched-insert / NOT MATCHED BY SOURCE
  * windowed DELETE), INSERT OVERWRITE, CALL system.restore, and the
  * maintenance procedures, interleaved by a seeded generator and
  * checked after EVERY statement against an in-memory model plus a
  * VERSION AS OF probe of recorded history.
  *
  * This surface shipped broken once (round 12's MERGE resolution) —
  * [[graft.io.LogTableModelSpec]] nets the Scala verbs; this walk nets
  * the SQL path end-to-end: GraftRowLevelAlignment's resolution, the
  * group-based rewrite, runtime group filtering, and the procedures all
  * fire under every interleaving the generator produces. */
class SqlModelSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("random SQL walk: UPDATE/DELETE/MERGE/OVERWRITE/restore track the model exactly") {
    val rnd = new Random(1414L)
    val wh = Files.createTempDirectory("graft-sqlmodel").toString
    spark.conf.set("spark.sql.catalog.graftsqlm", classOf[LogCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftsqlm.warehouse", wh)
    spark.sql("CREATE NAMESPACE graftsqlm.etl")
    spark.sql("CREATE TABLE graftsqlm.etl.m (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('keyCol'='k')")
    val path = s"$wh/etl/m"
    val T = "graftsqlm.etl.m"

    var model: Map[Long, String] = (1L to 50L).map(k => k -> s"init$k").toMap
    model.toSeq.toDF("k", "v").createOrReplaceTempView("sqlm_init")
    spark.sql(s"INSERT INTO $T SELECT k, v FROM sqlm_init")
    var history = Map(LogTable.version(path) -> model)
    var nextFresh = 500L

    def check(step: Int, op: String): Unit = {
      val got = spark.sql(s"SELECT k, v FROM $T").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got == model, s"step $step ($op): SQL surface diverged from model\n" +
        s"extra=${(got.toSet -- model.toSet).take(5)} missing=${(model.toSet -- got.toSet).take(5)}")
      val earliest = LogTable.history(path).head.version
      history = history.filter { case (v, _) => v >= earliest }
      val (probeV, probeModel) = history.toSeq(rnd.nextInt(history.size))
      val asOf = spark.sql(s"SELECT k, v FROM $T VERSION AS OF $probeV")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(asOf == probeModel,
        s"step $step ($op): VERSION AS OF $probeV diverged from recorded history")
      // manifest-stats aggregation must track the model after EVERY verb
      // (every write path registers stats, so the pushed answer is never
      // allowed to fall back) — this nets stale/wrong stats from any
      // rewrite, restore, compact, or truncation
      val agg = spark.sql(
        s"SELECT count(*) AS n, count(v) AS nv, min(k) AS mn, max(k) AS mx FROM $T")
        .collect()(0)
      val planned = LogTableScan.lastPlannedFiles.get()
      assert(agg.getLong(0) == model.size && agg.getLong(1) == model.size,
        s"step $step ($op): stats count diverged from model")
      if (model.isEmpty)
        assert(agg.isNullAt(2) && agg.isNullAt(3),
          s"step $step ($op): empty table must answer NULL bounds")
      else
        assert(agg.getLong(2) == model.keys.min && agg.getLong(3) == model.keys.max,
          s"step $step ($op): stats min/max diverged from model " +
            s"(got ${agg.getLong(2)}..${agg.getLong(3)}, " +
            s"want ${model.keys.min}..${model.keys.max})")
      // live deletion vectors CORRECTLY disable the stats-only answer
      // (manifest row counts include vector-dead rows): the fallback
      // scan must still answer exactly (asserted above); vector-free
      // snapshots must answer from the manifest alone
      if (LogTable.liveDvs(path, None).isEmpty)
        assert(planned == 0,
          s"step $step ($op): stats aggregation planned $planned data files — " +
            "every write path registers stats, the manifest must answer alone")
    }

    for (step <- 1 to 22) {
      // every row-level verb runs under a RANDOM physical strategy: the
      // same model must hold whether the statement rewrote files
      // (copy-on-write groups) or committed vectors + appends
      // (merge-on-read deltas) — interleaved with restore/compact/
      // truncation, which is where strategy-specific state would leak
      val mode =
        if (rnd.nextBoolean()) "merge-on-read" else "copy-on-write"
      spark.conf.set("spark.graft.rowLevel.mode", mode)
      val op = try rnd.nextInt(100) match {
        case r if r < 15 => // fresh-key INSERT
          val ks = nextFresh until nextFresh + 1 + rnd.nextInt(6)
          nextFresh += 20
          ks.map(k => (k, s"i$step-$k")).toDF("k", "v")
            .createOrReplaceTempView("sqlm_batch")
          spark.sql(s"INSERT INTO $T SELECT k, v FROM sqlm_batch")
          model = model ++ ks.map(k => k -> s"i$step-$k")
          "insert"
        case r if r < 32 => // range UPDATE
          val lo = 1L + rnd.nextInt(50); val hi = lo + rnd.nextInt(12)
          spark.sql(s"UPDATE $T SET v = 'u$step' WHERE k BETWEEN $lo AND $hi")
          model = model.map { case (k, v) =>
            k -> (if (k >= lo && k <= hi) s"u$step" else v) }
          "update-range"
        case r if r < 45 => // IN-subquery UPDATE (runtime group filtering)
          val probe = (1L to 50L).filter(_ => rnd.nextBoolean()).take(8)
          probe.map(k => Tuple1(k)).toDF("pk")
            .createOrReplaceTempView("sqlm_probe")
          spark.sql(s"UPDATE $T SET v = 'q$step' " +
            "WHERE k IN (SELECT pk FROM sqlm_probe)")
          model = model.map { case (k, v) =>
            k -> (if (probe.contains(k)) s"q$step" else v) }
          "update-subquery"
        case r if r < 58 => // range DELETE
          val lo = 1L + rnd.nextInt(60); val hi = lo + rnd.nextInt(10)
          spark.sql(s"DELETE FROM $T WHERE k BETWEEN $lo AND $hi")
          model = model.filter { case (k, _) => k < lo || k > hi }
          "delete"
        case r if r < 74 => // MERGE: matched update, unmatched insert,
          // NMBS windowed delete — the reference's full-sync shape
          val lo = 1L + rnd.nextInt(40); val hi = lo + 10 + rnd.nextInt(10)
          val srcKs = (lo to hi).filter(_ => rnd.nextBoolean())
          srcKs.map(k => (k, s"m$step-$k")).toDF("k", "v")
            .createOrReplaceTempView("sqlm_src")
          spark.sql(
            s"""MERGE INTO $T AS tgt USING sqlm_src AS src
               |ON tgt.k = src.k
               |WHEN MATCHED THEN UPDATE SET v = src.v
               |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (src.k, src.v)
               |WHEN NOT MATCHED BY SOURCE AND
               |  tgt.k BETWEEN $lo AND $hi THEN DELETE""".stripMargin)
          model = model.filter { case (k, _) =>
            k < lo || k > hi || srcKs.contains(k) } ++
            srcKs.map(k => k -> s"m$step-$k")
          "merge-full-sync"
        case r if r < 82 => // replace-all
          val ks = 1L to (10L + rnd.nextInt(25))
          ks.map(k => (k, s"o$step-$k")).toDF("k", "v")
            .createOrReplaceTempView("sqlm_ow")
          spark.sql(s"INSERT OVERWRITE $T SELECT k, v FROM sqlm_ow")
          model = ks.map(k => k -> s"o$step-$k").toMap
          "overwrite"
        case r if r < 89 => // restore to a surviving recorded version
          val v = history.keys.toSeq(rnd.nextInt(history.size))
          spark.sql(s"CALL graftsqlm.system.restore('etl.m', $v)")
          model = history(v)
          "restore"
        case r if r < 95 =>
          spark.sql("CALL graftsqlm.system.compact('etl.m', 500)")
          "compact"
        case _ =>
          spark.sql(s"CALL graftsqlm.system.truncate_history('etl.m', ${3 + rnd.nextInt(3)}, 0)")
          "truncate_history"
      } finally spark.conf.unset("spark.graft.rowLevel.mode")
      history += LogTable.version(path) -> model
      check(step, s"$op[$mode]")
    }
  }
}
