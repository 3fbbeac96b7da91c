package graft.etl

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import java.time.{Duration, Instant}

class IncrementalSpec extends AnyFunSuite {

  test("state store: missing file -> now - lookback; roundtrip; +1min advance") {
    val p = Files.createTempDirectory("graft_state").resolve("state.json")
    val st = new StateStore(p, Duration.ofDays(30))
    val now = Instant.parse("2024-02-01T12:00:00Z")
    assert(st.sinceIso(now) == "2024-01-02 12:00:00")
    st.set("2024-01-15 00:00:00")
    assert(st.sinceIso(now) == "2024-01-15 00:00:00")
    st.advanceFrom(Instant.parse("2024-01-20T10:30:00Z"))
    assert(st.sinceIso(now) == "2024-01-20 10:31:00")
  }

  test("backfill walks bounded windows, advances to max+1min, jumps when empty") {
    val seen = scala.collection.mutable.ArrayBuffer[(Instant, Instant)]()
    val start = Instant.parse("2024-01-01T00:00:00Z")
    val end = Instant.parse("2024-01-25T00:00:00Z")
    Incremental.backfill(start, end, Duration.ofDays(10)) { (a, b) =>
      seen += ((a, b))
      // first window: data up to Jan 5; later windows: empty
      if (a == start) Some(Instant.parse("2024-01-05T00:00:00Z")) else None
    }
    assert(seen(0) == ((start, Instant.parse("2024-01-11T00:00:00Z"))))
    // cursor advanced conservatively to Jan 5 00:01, not the window end
    assert(seen(1) == ((Instant.parse("2024-01-05T00:01:00Z"),
      Instant.parse("2024-01-15T00:01:00Z"))))
    // empty window -> jump to its end; final partial window capped at `end`
    assert(seen(2) == ((Instant.parse("2024-01-15T00:01:00Z"), end)))
    assert(seen.length == 3)
  }
}
