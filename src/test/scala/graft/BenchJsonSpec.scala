package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench_scaling.json inlining gate: a truncated blob whose last
  * byte is an inner '}' must be rejected (startsWith/endsWith alone
  * accepted it, emitting an unparseable per-round bench line). */
class BenchJsonSpec extends AnyFunSuite {
  test("balancedJson accepts whole objects, rejects inner-brace truncations") {
    assert(Bench.balancedJson("""{"a":1,"b":{"c":[1,2]}}"""))
    assert(Bench.balancedJson("""{"s":"br{ace } in string","n":2}"""))
    assert(Bench.balancedJson("""{"esc":"quote \" then {","x":{}}"""))
    // truncated after an inner object's closing brace: starts '{',
    // ends '}', still invalid
    assert(!Bench.balancedJson("""{"gen":"x","levels":[{"cpus":2,"g":0.07}"""))
    assert(!Bench.balancedJson("""{"a":{"b":1}"""))
    assert(!Bench.balancedJson("""{"a":"unterminated string }"""))
    assert(!Bench.balancedJson("""{"a":1}}"""))
  }
}
