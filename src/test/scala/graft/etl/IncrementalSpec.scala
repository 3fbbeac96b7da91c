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

  test("runFlow: idle run (no new orders) re-enriches missing categories, cursor holds") {
    val p = Files.createTempDirectory("graft_state").resolve("state.json")
    val st = new StateStore(p)
    st.set("2024-01-15 00:00:00")
    var enrichCalls = Vector.empty[Boolean]
    val run = Incremental.runFlow(st) (
      since => { assert(since == "2024-01-15 00:00:00"); (0L, None) },
      forceAll => { enrichCalls :+= forceAll; 7L })
    assert(run == Incremental.FlowRun(0L, Some((false, 7L))))
    assert(enrichCalls == Vector(false)) // missing-only mode
    assert(st.sinceIso() == "2024-01-15 00:00:00") // no watermark advance
  }

  test("runFlow: reEnrich flag is the reference's dead flag — idle still re-enriches") {
    // reference flow.py:212 `elif re_enrich or True:` — re-enrich of
    // missing categories on an idle run cannot be disabled
    val p = Files.createTempDirectory("graft_state").resolve("state.json")
    val st = new StateStore(p)
    st.set("2024-01-15 00:00:00")
    var calls = 0
    Incremental.runFlow(st, reEnrich = false)(_ => (0L, None), _ => { calls += 1; 0L })
    Incremental.runFlow(st, reEnrich = true)(_ => (0L, None), _ => { calls += 1; 0L })
    assert(calls == 2)
  }

  test("runFlow: forceEnrichAll upgrades the idle pass to force_all") {
    val p = Files.createTempDirectory("graft_state").resolve("state.json")
    val st = new StateStore(p)
    st.set("2024-01-15 00:00:00")
    var enrichCalls = Vector.empty[Boolean]
    val run = Incremental.runFlow(st, forceEnrichAll = true)(
      _ => (0L, None),
      forceAll => { enrichCalls :+= forceAll; 42L })
    assert(run == Incremental.FlowRun(0L, Some((true, 42L))))
    assert(enrichCalls == Vector(true))
  }

  test("runFlow: new orders advance the watermark and skip re-enrich") {
    val p = Files.createTempDirectory("graft_state").resolve("state.json")
    val st = new StateStore(p)
    st.set("2024-01-15 00:00:00")
    var enrichCalls = 0
    val run = Incremental.runFlow(st, forceEnrichAll = true)(
      _ => (5L, Some(Instant.parse("2024-01-20T10:30:00Z"))),
      _ => { enrichCalls += 1; 0L })
    assert(run == Incremental.FlowRun(5L, None))
    assert(enrichCalls == 0) // flow.py:215-216: loaded-orders path, no re-enrich
    assert(st.sinceIso() == "2024-01-20 10:31:00")
  }

  test("runFlow: a failing batch invokes onFailure with the error and rethrows (notify.py twin)") {
    val p = Files.createTempDirectory("graft_state").resolve("state.json")
    val st = new StateStore(p)
    st.set("2024-01-15 00:00:00")
    var seen: Option[Throwable] = None
    val boom = new RuntimeException("planted batch failure")
    val thrown = intercept[RuntimeException] {
      Incremental.runFlow(st, onFailure = e => seen = Some(e))(
        _ => throw boom, _ => 0L)
    }
    assert(thrown eq boom, "the original failure must propagate")
    assert(seen.exists(_ eq boom), "the hook must receive the failure")
    // the default hook routes through Notify's transport with the
    // reference's subject tag — and a THROWING transport never masks
    // the pipeline error (notify.py:31-32 swallows send failures)
    val captured = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val saved = Notify.transport
    try {
      Notify.transport = (m, l) => captured += ((m, l))
      Notify.onFailure(boom)
      assert(captured.size == 1 && captured.head._2 == "error")
      assert(captured.head._1.startsWith("[ETL ERROR] WooCommerce Pipeline"))
      Notify.transport = (_, _) => throw new IllegalStateException("smtp down")
      Notify.onFailure(boom) // must not throw
    } finally Notify.transport = saved
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
