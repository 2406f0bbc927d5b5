package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.testkit.W3CRunner

/** W3C-style conformance: manifest-driven evaluation tests over the vendored
  * mini-corpus (aggregates, negation, property paths, optional) — the runner
  * reads each manifest.ttl with the engine's own Turtle parser and compares
  * results modulo blank-node bijection (reference harness:
  * kasei/kineo `Sources/Kineo/W3C/SPARQLTestSuite.swift:11-501`).
  */
class W3CSpec extends AnyFunSuite {
  lazy val spark = SparkBase.spark
  val root = "src/test/resources/w3c"

  private def runArea(area: String): Unit = {
    val failures = W3CRunner.runDir(spark, s"$root/$area")
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("w3c: aggregates manifest") { runArea("aggregates") }
  test("w3c: negation manifest") { runArea("negation") }
  test("w3c: property-path manifest") { runArea("property-path") }
  test("w3c: optional manifest") { runArea("optional") }
  test("w3c: functions manifest") { runArea("functions") }
  test("w3c: construct manifest") { runArea("construct") }
  test("w3c: sort manifest (ordered compare)") { runArea("sort") }
  test("w3c: subquery manifest") { runArea("subquery") }

  test("w3c: manifest loader finds every vendored test") {
    val n = Seq("aggregates", "negation", "property-path", "optional", "functions", "construct", "sort", "subquery")
      .map(a => W3CRunner.loadManifest(new java.io.File(s"$root/$a")).size).sum
    assert(n == 40, s"expected 40 vendored tests, found $n")
  }
}
