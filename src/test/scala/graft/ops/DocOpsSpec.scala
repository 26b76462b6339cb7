package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.model.Instruction

class DocOpsSpec extends AnyFunSuite {

  val fields = Map("a" -> "1", "b" -> "2", "c" -> "3")

  test("scopeProject: None keeps all (instructions_runners.py:38-39)") {
    assert(DocOps.scopeProject(fields, None) == fields)
  }

  test("scopeProject: subset kept, missing keys silently dropped") {
    assert(DocOps.scopeProject(fields, Some(Seq("a", "zz"))) == Map("a" -> "1"))
  }

  test("scopeProject: empty scope yields empty projection, not error") {
    assert(DocOps.scopeProject(fields, Some(Nil)) == Map.empty)
  }

  test("buildSysMsg section order: Instruction, Role, Input, Output") {
    val msg = DocOps.buildSysMsg(Instruction(
      name = "x", role = Some("R"), content = Some("C"),
      inputDesc = Some("I"), outputDesc = Some("O")))
    assert(msg ==
      "# Instruction\nC\n\n# Role\nR\n\n# Input Description\nI\n\n# Expected Output\nO")
  }

  test("buildSysMsg omits absent sections") {
    val msg = DocOps.buildSysMsg(Instruction(name = "x", content = Some("C")))
    assert(msg == "# Instruction\nC")
  }

  test("buildUserMsg renders key/value blocks") {
    assert(DocOps.buildUserMsg(
      scala.collection.immutable.ListMap("k1" -> "v1", "k2" -> "v2")) ==
      "k1:\nv1\n\nk2:\nv2")
  }

  test("xmlPack wraps fields in name tags (self_verification_mr.py:457-471)") {
    assert(DocOps.xmlPack(scala.collection.immutable.ListMap("A" -> "x", "B" -> "y")) ==
      "<A>\nx\n</A>\n\n<B>\ny\n</B>")
  }

  test("jsonClean strips code fences (self_verification_mr.py:52-53)") {
    assert(DocOps.jsonClean("```json\n[\"a\"]\n```") == "[\"a\"]")
    assert(DocOps.jsonClean("plain") == "plain")
  }

  test("mdRender emits # name / content sections (instructions.py:62-70)") {
    assert(DocOps.mdRender(Seq("s1" -> "b1", "s2" -> "b2")) ==
      "# s1\nb1\n\n# s2\nb2")
  }

  test("initChatml: system+user, or user-only when system empty") {
    assert(DocOps.initChatml("sys", "usr").map(_.role) == Seq("system", "user"))
    assert(DocOps.initChatml("", "usr").map(_.role) == Seq("user"))
  }
}
