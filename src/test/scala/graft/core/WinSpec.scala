package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Naming goldens from the reference's `timedelta_to_str`
  * (tsflex/utils/argument_parsing.py:48-85) and time-string parsing.
  */
class WinSpec extends AnyFunSuite {
  private def s2us(s: Long) = s * 1000000L

  test("timedeltaToStr compact rendering") {
    assert(Win.timedeltaToStr(s2us(30)) == "30s")
    assert(Win.timedeltaToStr(s2us(60)) == "1m")
    assert(Win.timedeltaToStr(s2us(90)) == "1m30s")
    assert(Win.timedeltaToStr(s2us(3600)) == "1h")
    assert(Win.timedeltaToStr(s2us(86400)) == "1D")
    assert(Win.timedeltaToStr(s2us(86400 + 2 * 3600 + 30 * 60 + 15)) == "1D_2h30m15s")
    assert(Win.timedeltaToStr(250000L) == "0.25s")
    assert(Win.timedeltaToStr(s2us(1) + 500000L) == "1.5s")
    assert(Win.timedeltaToStr(-s2us(30)) == "NEG30s")
    assert(Win.timedeltaToStr(s2us(7200)) == "2h")
  }

  test("time-string parsing") {
    assert(Win.time("30s").micros == s2us(30))
    assert(Win.time("15m").micros == s2us(900))
    assert(Win.time("1h").micros == s2us(3600))
    assert(Win.time("1D").micros == s2us(86400))
    assert(Win.time("1D2h30m15s").micros == s2us(86400 + 9015))
    assert(Win.time("250ms").micros == 250000L)
    assert(Win.time("5us").micros == 5L)
    assert(Win.time("1s500ms").micros == 1500000L)
    assert(Win.time("2min").micros == s2us(120))
    intercept[IllegalArgumentException](Win.time("30"))
    intercept[IllegalArgumentException](Win.time(""))
    // trailing garbage after a valid token must be rejected, not ignored
    intercept[IllegalArgumentException](Win.time("5secx"))
    intercept[IllegalArgumentException](Win.time("x5sec"))
  }

  test("output name construction (W10)") {
    assert(Win.outputName(Seq("EDA"), "mean", "30s") == "EDA__mean__w=30s")
    assert(Win.outputName(Seq("a", "b"), "corr", "manual") == "a|b__corr__w=manual")
  }

  test("sequence window rendering keeps the user's spelling") {
    assert(Win.seq(3L).render == "3")
    assert(Win.seq(2.5).render == "2.5")
  }
}
