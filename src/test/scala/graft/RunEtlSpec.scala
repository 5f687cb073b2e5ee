package graft

import org.scalatest.funsuite.AnyFunSuite

class RunEtlSpec extends AnyFunSuite {

  test("parseArgs: full flag set") {
    val o = RunEtl.parseArgs(Array(
      "--input", "/in", "--warehouse", "/wh", "--start-dt", "2024-06-01",
      "--stop-dt", "2024-06-30", "--test-mode", "--test-limit", "50", "--daily"))
    assert(o.input === "/in" && o.warehouse === "/wh")
    assert(o.startDt === Some("2024-06-01") && o.stopDt === Some("2024-06-30"))
    assert(o.testMode && o.testLimit === 50 && o.daily)
  }

  test("parseArgs: file-sink mode needs no warehouse") {
    val o = RunEtl.parseArgs(Array("--input", "/in", "--load-to", "csv", "--out", "/o"))
    assert(o.loadTo === Some("csv") && o.out === Some("/o"))
  }

  test("parseArgs: rejects unknown flags and missing required args") {
    assert(intercept[IllegalArgumentException](
      RunEtl.parseArgs(Array("--input", "/in", "--wat"))).getMessage.contains("--wat"))
    assert(intercept[IllegalArgumentException](
      RunEtl.parseArgs(Array("--warehouse", "/wh"))).getMessage.contains("--input"))
    assert(intercept[IllegalArgumentException](
      RunEtl.parseArgs(Array("--input", "/in"))).getMessage.contains("--warehouse"))
  }

  test("test-mode default limit matches the reference's 200 (settings.py:19)") {
    val o = RunEtl.parseArgs(Array("--input", "/in", "--warehouse", "/wh", "--test-mode"))
    assert(o.testLimit === 200)
  }
}
