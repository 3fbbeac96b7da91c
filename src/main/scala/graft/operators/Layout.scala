package graft.operators

import org.apache.spark.sql.DataFrame

/** File-skipping evaluator over parquet FOOTER statistics — the
  * driver-side half of every lakehouse data-skipping design (Delta/
  * Iceberg file stats, parquet row-group min/max): given a layout on
  * disk, would a min/max-pruning reader skip files for a predicate, and
  * how many? Used to PROVE a layout pays (ZOrderSpec pins the skip
  * ratio of [[ZOrder.layoutBy]] on both dimensions; README records the
  * measured ratio) rather than assert it in prose. Footer reads only —
  * no Spark jobs, no data pages — same cost class as
  * [[Bucketing.footerRowCount]].
  */
object Layout {

  /** Per-file [min, max] of an integral column, aggregated across the
    * file's row groups from footer statistics alone. Files whose chunks
    * carry no stats for the column are returned as full-range (a
    * pruning reader must scan them). */
  def fileRanges(df: DataFrame, column: String): Seq[(String, Long, Long)] = {
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    df.inputFiles.toSeq.map { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(new org.apache.hadoop.fs.Path(f), conf)
      val r = graft.util.Footers.open(in)
      try {
        var lo = Long.MaxValue
        var hi = Long.MinValue
        var statless = false
        r.getFooter.getBlocks.forEach { block =>
          block.getColumns.forEach { chunk =>
            if (chunk.getPath.toDotString == column) {
              val st = chunk.getStatistics
              if (st == null || !st.hasNonNullValue) statless = true
              else {
                val (mn, mx) = (asLong(st.genericGetMin.asInstanceOf[AnyRef]),
                  asLong(st.genericGetMax.asInstanceOf[AnyRef]))
                lo = math.min(lo, mn)
                hi = math.max(hi, mx)
              }
            }
          }
        }
        if (statless || lo > hi) (f, Long.MinValue, Long.MaxValue)
        else (f, lo, hi)
      } finally r.close()
    }
  }

  private def asLong(v: AnyRef): Long = v match {
    case l: java.lang.Long => l
    case i: java.lang.Integer => i.toLong
    case s: java.lang.Short => s.toLong
    case b: java.lang.Byte => b.toLong
    case other => throw new IllegalArgumentException(
      s"file-range pruning needs an integral column, got ${other.getClass}")
  }

  /** How many of `df`'s files a min/max reader must SCAN for the
    * predicate `column BETWEEN lo AND hi` — the rest are skipped on
    * footer stats alone. */
  def scannedFileCount(df: DataFrame, column: String, lo: Long, hi: Long): Int =
    fileRanges(df, column).count { case (_, mn, mx) => mx >= lo && mn <= hi }
}
