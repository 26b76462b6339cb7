package graft.model

import org.scalatest.funsuite.AnyFunSuite

/** Byte-compatibility with Python json.dumps(ensure_ascii=False,
  * indent=2) — the reference's stringify boundary (utils.py:10-17).
  * Expected strings generated with CPython 3.11. */
class JsonUtilSpec extends AnyFunSuite {

  test("pretty matches python json.dumps(indent=2, ensure_ascii=False)") {
    val jv = JsonUtil.parse(
      """{"a": 1, "b": [1, 2], "c": {"d": "xü"}, "e": null, "f": true,
        |"g": 1.5, "h": [], "i": {}, "j": "line\nbreak\ttab"}""".stripMargin)
    val expected =
      "{\n  \"a\": 1,\n  \"b\": [\n    1,\n    2\n  ],\n  \"c\": {\n    \"d\": \"xü\"\n  },\n  \"e\": null,\n  \"f\": true,\n  \"g\": 1.5,\n  \"h\": [],\n  \"i\": {},\n  \"j\": \"line\\nbreak\\ttab\"\n}"
    assert(JsonUtil.pretty(jv) == expected)
  }

  test("nested array of objects") {
    val jv = JsonUtil.parse("""[{"x": 2.0}]""")
    assert(JsonUtil.pretty(jv) == "[\n  {\n    \"x\": 2.0\n  }\n]")
  }

  test("json2strKv: strings pass through, others stringify, order kept") {
    val kv = JsonUtil.json2strKv(JsonUtil.parse(
      """{"s": "plain", "n": 7, "arr": ["a"], "obj": {"k": "v"}}"""))
    assert(kv.keys.toSeq == Seq("s", "n", "arr", "obj"))
    assert(kv("s") == "plain")
    assert(kv("n") == "7")
    assert(kv("arr") == "[\n  \"a\"\n]")
    assert(kv("obj") == "{\n  \"k\": \"v\"\n}")
  }
}
