package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pure-function coverage for the session factory's conf plumbing (the
  * `GRAFT_EXTRA_CONF` operational hook — env vars can't be mutated in-JVM,
  * so the parse is factored out and tested directly).
  */
class SessionsSpec extends AnyFunSuite {

  test("parseExtraConf splits on ';', trims, and keeps '=' inside values") {
    assert(Sessions.parseExtraConf(
      "spark.shuffle.compress=false; spark.executorEnv.X=a=b") ===
      Seq("spark.shuffle.compress" -> "false", "spark.executorEnv.X" -> "a=b"))
  }

  test("parseExtraConf drops empty and malformed entries") {
    assert(Sessions.parseExtraConf("") === Seq.empty)
    assert(Sessions.parseExtraConf(";;noequals; k=v ;") === Seq("k" -> "v"))
  }
}
