package graft

import graft.functions.Lens
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

class LensSpec extends AnyFunSpec with Matchers {
  private val upper: String => String = _.toUpperCase

  describe("Direct") {
    it("applies the function to the whole string") {
      Lens.Direct.modify(upper)("hello") shouldBe "HELLO"
    }
    it("modifyOpt passes Options straight through") {
      Lens.Direct.modifyOpt(_.map(upper))(Some("a")) shouldBe Some("A")
      Lens.Direct.modifyOpt(identity)(None) shouldBe None
    }
  }

  describe("Field") {
    it("transforms a named field, preserving other fields and order") {
      Lens.Field("name").modify(upper)("""{"name":"bob","age":3}""") shouldBe
        """{"name":"BOB","age":3}"""
    }
    it("composes for nested objects") {
      Lens.Field("address", Lens.Field("city")).modify(upper)(
        """{"address":{"city":"rome","zip":"1"},"x":true}"""
      ) shouldBe """{"address":{"city":"ROME","zip":"1"},"x":true}"""
    }
    it("missing field → unchanged (compact re-serialization)") {
      Lens.Field("nope").modify(upper)("""{"a": 1}""") shouldBe """{"a":1}"""
    }
    it("non-object JSON → unchanged") {
      Lens.Field("a").modify(upper)("""[1,2]""") shouldBe """[1,2]"""
    }
    it("non-string field value → unchanged") {
      Lens.Field("k").modify(upper)("""{"k": 87}""") shouldBe """{"k":87}"""
    }
  }

  describe("ArrayElements") {
    it("maps a field lens over each element") {
      val l = Lens.ArrayElements(Lens.Field("number"))
      l.modify(_ => "X")(
        """[{"type":"home","number":"555-1234"},{"type":"work","number":"555-9876"}]"""
      ) shouldBe """[{"type":"home","number":"X"},{"type":"work","number":"X"}]"""
    }
    it("maps Direct over string elements") {
      Lens.ArrayElements(Lens.Direct).modify(upper)("""["a","b"]""") shouldBe """["A","B"]"""
    }
    it("mixed element kinds: non-matching elements pass through") {
      Lens.ArrayElements(Lens.Direct).modify(upper)("""["a",1,null]""") shouldBe """["A",1,null]"""
    }
    it("non-array JSON → unchanged") {
      Lens.ArrayElements(Lens.Direct).modify(upper)("""{"a":"b"}""") shouldBe """{"a":"b"}"""
    }
  }

  describe("error tolerance (the never-fail contract)") {
    it("malformed JSON → returned verbatim") {
      Lens.Field("a").modify(upper)("not json at all") shouldBe "not json at all"
      Lens.ArrayElements(Lens.Direct).modify(upper)("[1,") shouldBe "[1,"
      Lens.Field("a").modify(upper)("""{"a":1} trailing""") shouldBe """{"a":1} trailing"""
    }
    it("empty string → returned verbatim") {
      Lens.Field("a").modify(upper)("") shouldBe ""
    }
    it("modifyOpt(None) → None") {
      Lens.Field("a").modifyOpt(identity)(None) shouldBe None
    }
  }

  describe("structure preservation") {
    it("does not disturb untargeted nested structure") {
      val in = """{"phones":[{"type":"home","number":"1"}],"settings":{"theme":"dark","n":2}}"""
      Lens.Field("settings", Lens.Field("theme")).modify(upper)(in) shouldBe
        """{"phones":[{"type":"home","number":"1"}],"settings":{"theme":"DARK","n":2}}"""
    }
  }
}
