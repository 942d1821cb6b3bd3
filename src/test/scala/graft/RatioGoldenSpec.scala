package graft

import graft.functions.TextKernels
import org.scalatest.funsuite.AnyFunSuite

/** 43 random (a, b, ratio) triples generated with CPython 3.x
  * difflib.SequenceMatcher(None, a, b).ratio() — including >=200-char inputs
  * that exercise the autojunk "popular element" heuristic. Pins the Scala
  * port bit-exactly.
  */
class RatioGoldenSpec extends AnyFunSuite {

  private def loadGolden(): Seq[(String, String, Double)] = {
    val raw = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/graft/ratio_golden.json"), "UTF-8").mkString
    // minimal JSON parse of [[str, str, num], ...] without a JSON dep:
    // use Spark's bundled Jackson.
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(raw)
    (0 until node.size()).map { i =>
      val t = node.get(i)
      (t.get(0).asText(), t.get(1).asText(), t.get(2).asDouble())
    }
  }

  test("ratio matches CPython difflib on 43 golden pairs") {
    loadGolden().foreach { case (a, b, expected) =>
      val got = TextKernels.ratio(a, b)
      assert(got == expected, s"ratio(${a.take(30)}, ${b.take(30)}) = $got != $expected")
    }
  }
}
