package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bench self-healing prior parsing: the re-run gate compares against
  * dev/bench_full.json and must silently no-op when the file is absent,
  * malformed, or recorded at a different scale factor (re-running
  * against wrong-scale priors would re-measure everything).
  */
class BenchPriorsSpec extends AnyFunSuite {

  private def tmp(content: String): String = {
    val f = java.nio.file.Files.createTempFile("bench_prior", ".json")
    java.nio.file.Files.writeString(f, content)
    f.toString
  }

  test("parses per-query priors for the matching sf") {
    val p = tmp("""{"metric":"detail","value":57.4,"unit":"sec","queries":{"q1_agg":0.298,"q_dedup_keyed":0.27,"q_fail":-1.0},"errors":{},"n_failed":0,"sf":"/root/testdata/sf0.1"}""")
    val priors = Bench.readPriors("/root/testdata/sf0.1", p)
    assert(priors("q1_agg") == 0.298)
    assert(priors("q_dedup_keyed") == 0.27)
    assert(priors("q_fail") == -1.0) // kept; caller gates on prior > 0
  }

  test("different sf, missing file, or malformed content → no priors") {
    val p = tmp("""{"metric":"detail","queries":{"q1_agg":0.3},"sf":"/root/testdata/sf0.1"}""")
    assert(Bench.readPriors("/root/testdata/sf0.001", p).isEmpty)
    assert(Bench.readPriors("/root/testdata/sf0.1", "/nonexistent/x.json").isEmpty)
    val bad = tmp("""not json at all""")
    assert(Bench.readPriors("/root/testdata/sf0.1", bad).isEmpty)
  }
}
