package graft

import graft.functions.{Anonymizer, DataLists}
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

class AnonymizerSpec extends AnyFunSpec with Matchers {

  // Deterministic sample corpus: ASCII, unicode, punctuation, long strings.
  private val samples: Seq[String] =
    (1 to 200).map(i => s"input-$i") ++
      Seq("John", "Jane Smith", "日本語テキスト", "ünïcodé", "a", "x" * 500,
        "  spaces  ", "tabs\tand\nnewlines", "123-456-7890", "O'Brien; DROP TABLE--")

  private val all: Seq[(String, Anonymizer)] = Seq(
    "FirstName"       -> Anonymizer.FirstName,
    "MaleFirstName"   -> Anonymizer.MaleFirstName,
    "FemaleFirstName" -> Anonymizer.FemaleFirstName,
    "LastName"        -> Anonymizer.LastName,
    "FullName"        -> Anonymizer.FullName,
    "State"           -> Anonymizer.State,
    "StateAbbr"       -> Anonymizer.StateAbbr,
    "Country"         -> Anonymizer.Country,
    "Email"           -> Anonymizer.Email,
    "PhoneNumber"     -> Anonymizer.PhoneNumber,
    "StreetAddress"   -> Anonymizer.StreetAddress,
    "City"            -> Anonymizer.City,
    "ZipCode"         -> Anonymizer.ZipCode,
    "Redact"          -> Anonymizer.Redact,
    "PartialRedact"   -> Anonymizer.PartialRedact(),
    "LoremText"       -> Anonymizer.LoremText
  )

  describe("stableHash") {
    it("matches the MD5 first-4-bytes-masked-positive contract") {
      // Goldens cross-checked against DuckDB md5_number_upper byteswap and
      // python hashlib during oracle design.
      Anonymizer.stableHash("John") shouldBe 1631623841
      Anonymizer.stableHash("hello") shouldBe 1564557354
      Anonymizer.stableHash("日本語") shouldBe 1116920
      Anonymizer.stableHash("a") shouldBe 214005177
      Anonymizer.stableHash("Customer#000000001") shouldBe 444712942
    }
    it("returns 0 for null and empty") {
      Anonymizer.stableHash(null) shouldBe 0
      Anonymizer.stableHash("") shouldBe 0
    }
    it("is non-negative for arbitrary input") {
      samples.foreach(s => Anonymizer.stableHash(s) should be >= 0)
    }
    it("distributes across a list over many inputs") {
      val hits = (1 to 1000).map(i => Anonymizer.stableHash(s"input$i") % 50).toSet
      hits.size should be > 40
    }
  }

  describe("null/empty preservation (every function)") {
    for ((name, f) <- all) {
      it(s"$name preserves null and empty") {
        f(null) shouldBe null
        f("") shouldBe ""
      }
    }
  }

  describe("determinism (every function)") {
    for ((name, f) <- all) {
      it(s"$name is deterministic") {
        samples.foreach(s => f(s) shouldBe f(s))
      }
    }
  }

  describe("format invariants") {
    it("FirstName selects from the combined male-first list") {
      DataLists.firstNames should contain(Anonymizer.FirstName("whatever"))
      DataLists.firstNames.take(DataLists.maleFirstNames.size) shouldBe DataLists.maleFirstNames
    }
    it("FullName is 'First Last' from the lists") {
      val Array(f, l) = Anonymizer.FullName("Jane Smith").split(" ")
      DataLists.firstNames should contain(f)
      DataLists.lastNames should contain(l)
    }
    it("Email is first.last@domain with an allowed domain") {
      samples.foreach { s =>
        Anonymizer.Email(s) should fullyMatch regex
          "[a-z]+\\.[a-z]+@(example\\.com|test\\.com|fake\\.org|sample\\.net)"
      }
    }
    it("PhoneNumber matches (XXX) XXX-XXXX") {
      samples.foreach(s => Anonymizer.PhoneNumber(s) should fullyMatch regex "\\(\\d{3}\\) \\d{3}-\\d{4}")
    }
    it("ZipCode is 5 digits in [10000, 99999]") {
      samples.foreach(s => Anonymizer.ZipCode(s).toInt should (be >= 10000 and be <= 99999))
    }
    it("Redact preserves length with all asterisks") {
      samples.foreach(s => Anonymizer.Redact(s) shouldBe "*" * s.length)
    }
    it("PartialRedact keeps first/last and stars the middle") {
      Anonymizer.PartialRedact(2, 2)("hello123") shouldBe "he****23"
      Anonymizer.PartialRedact(2, 2)("abcd") shouldBe "****"
      Anonymizer.PartialRedact(2, 2)("abc") shouldBe "***"
      Anonymizer.PartialRedact(1, 3)("secretvalue") shouldBe "s*******lue"
    }
    it("LoremText preserves exact length") {
      samples.foreach(s => Anonymizer.LoremText(s).length shouldBe s.length)
    }
    it("LoremText equals its closed form (join len words, truncate)") {
      samples.foreach { s =>
        val h      = Anonymizer.stableHash(s)
        val closed = (0 until s.length)
          .map(j => DataLists.loremWords(((h.toLong + j) % DataLists.loremWords.size).toInt))
          .mkString(" ")
          .take(s.length)
        Anonymizer.LoremText(s) shouldBe closed
      }
    }
    it("StreetAddress has number in [1, 9999] then street then suffix") {
      val parts = Anonymizer.StreetAddress("123 Real St").split(" ")
      parts(0).toInt should (be >= 1 and be <= 9999)
      DataLists.lastNames should contain(parts(1))
      DataLists.streetSuffixes should contain(parts(2))
    }
    it("City is lastName+suffix with no space") {
      val c = Anonymizer.City("Springfield")
      DataLists.citySuffixes.exists(suf =>
        c.endsWith(suf) && DataLists.lastNames.contains(c.dropRight(suf.length))
      ) shouldBe true
    }
  }

  describe("salting") {
    it("uses distinct salts so component selections are independent") {
      val in   = "SaltCheck"
      val last = Anonymizer.selectByHash(in + "_last", DataLists.lastNames)
      Anonymizer.FullName(in).split(" ")(1) shouldBe last
    }
  }
}
