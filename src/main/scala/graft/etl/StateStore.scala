package graft.etl

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.time.{Duration, Instant}

/** Incremental watermark state — the reference's single-JSON-file cursor
  * (reference `src/etl/utils/state.py:6-21`): `{"since_iso": "<ts>"}`,
  * default lookback now−30d, advance = max(order_date) + 1 minute
  * (reference `src/run.py:148-152`).
  *
  * Driver-side by design: one tiny file per pipeline, no distribution
  * concern. The streaming analogue is `withWatermark` + checkpointing
  * (graft.streaming.EventStream).
  */
final class StateStore(path: Path, lookback: Duration = Duration.ofDays(30)) {

  def this(path: String) = this(Paths.get(path))

  /** Read the cursor; missing/corrupt file → now − lookback
    * (reference `state.py:9-16`). */
  def sinceIso(now: Instant = Instant.now()): String =
    readCursor().getOrElse(fmt(now.minus(lookback)))

  def readCursor(): Option[String] =
    if (!Files.exists(path)) None
    else {
      val text = new String(Files.readAllBytes(path), StandardCharsets.UTF_8)
      """"since_iso"\s*:\s*"([^"]+)"""".r.findFirstMatchIn(text).map(_.group(1))
    }

  /** Persist a new cursor atomically (write-then-move). */
  def set(sinceIso: String): Unit = {
    Option(path.getParent).foreach(Files.createDirectories(_))
    val tmp = path.resolveSibling(path.getFileName.toString + ".tmp")
    Files.write(tmp, s"""{"since_iso": "$sinceIso"}""".getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, path, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  /** A10 — conservative advance: max event time + 1 minute
    * (reference `run.py:150`). */
  def advanceFrom(maxEventTime: Instant): Unit =
    set(fmt(maxEventTime.plus(Duration.ofMinutes(1))))

  private def fmt(i: Instant): String =
    i.toString.replace("T", " ").takeWhile(_ != '.') match {
      case s if s.length == 19 => s
      case s                   => (s + ":00:00").take(19)
    }
}
