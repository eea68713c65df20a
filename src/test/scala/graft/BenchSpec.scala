package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench stdout line is parsed by the driver from a bounded log
  * tail, so its trim-to-fit path must work BEFORE the suite grows big
  * enough to exercise it live (the r1-r3 parsed:null lessons). Drives
  * [[Bench.pickLine]] directly.
  */
class BenchSpec extends AnyFunSuite {

  private def lineWith(q: String, dropped: Int): String = {
    val dj = if (dropped == 0) "" else s""","q_dropped":$dropped"""
    s"""{"metric":"total","value":1.0,"queries":$q$dj}"""
  }

  test("line under the cap is the full map, no q_dropped") {
    val rs = Seq("q01_a" -> 0.1, "q02_b" -> 0.2)
    val line = Bench.pickLine(rs, lineWith, cap = 1900)
    assert(line.contains(""""q01":100""") && line.contains(""""q02":200"""))
    assert(!line.contains("q_dropped"))
  }

  test("over the cap: keeps the slowest, reports the dropped count") {
    // 60 queries at ~12 bytes each overruns a 300-byte cap
    val rs = (1 to 60).map(i => f"q$i%02d_x" -> i * 0.01)
    val line = Bench.pickLine(rs, lineWith, cap = 300)
    assert(line.length <= 300, s"${line.length}: $line")
    assert(line.contains("q_dropped"))
    // the slowest query survives, the fastest is dropped
    assert(line.contains(""""q60":600"""), line)
    assert(!line.contains(""""q01":10"""), line)
    // dropped count + kept count == total
    val dropped = """"q_dropped":(\d+)""".r
      .findFirstMatchIn(line).get.group(1).toInt
    val kept = """"q\d\d":""".r.findAllIn(line).size
    assert(kept + dropped == rs.size)
  }

  test("failed queries (-1) outrank even the slowest successes") {
    val rs = (1 to 60).map(i => f"q$i%02d_x" -> i * 0.01) :+ ("qf_boom" -> -1.0)
    val line = Bench.pickLine(rs, lineWith, cap = 300)
    assert(line.contains(""""qf":-1"""), line)
  }

  test("short keys cut at the first underscore") {
    assert(Bench.short("dd12_bloom_dedup") == "dd12")
    assert(Bench.short("plain") == "plain")
  }
}
