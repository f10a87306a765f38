package graft

import java.nio.file.{Files, Paths}

/** GateCache sharing contracts. The serving gates lean on two promises:
  * a key's builder runs at most once per JVM, and `privateCopy` hands out
  * directories a mutating gate can tombstone without ever touching the
  * pristine artifact other gates re-read.
  */
class GateCacheSpec extends SparkSpec {

  private def write(dir: String, name: String, body: String): Unit =
    Files.write(Paths.get(dir, name), body.getBytes("UTF-8"))

  private def read(dir: String, name: String): String =
    new String(Files.readAllBytes(Paths.get(dir, name)), "UTF-8")

  describe("GateCache.dir") {
    it("builds once per key and returns the same directory on re-resolve") {
      var builds = 0
      val key = s"spec_dir_once_${System.nanoTime()}"
      val d1 = GateCache.dir(key) { p => builds += 1; write(p, "a.txt", "v1") }
      val d2 = GateCache.dir(key) { p => builds += 1; write(p, "a.txt", "WRONG") }
      builds shouldBe 1
      d2 shouldBe d1
      read(d1, "a.txt") shouldBe "v1"
    }

    it("caches nothing when the builder throws, so a retry can succeed") {
      val key = s"spec_dir_fail_${System.nanoTime()}"
      an[RuntimeException] should be thrownBy
        GateCache.dir(key)(_ => throw new RuntimeException("boom"))
      val d = GateCache.dir(key)(p => write(p, "ok.txt", "recovered"))
      read(d, "ok.txt") shouldBe "recovered"
    }

    it("a builder may resolve ANOTHER cache key (no ConcurrentHashMap recursive-update failure)") {
      // Before round 10 the builder ran inside computeIfAbsent's bin lock,
      // so a builder that transitively resolved a second key could throw
      // IllegalStateException("Recursive update") depending on bin layout.
      val outer = s"spec_dir_nested_outer_${System.nanoTime()}"
      val inner = s"spec_dir_nested_inner_${System.nanoTime()}"
      val d = GateCache.dir(outer) { p =>
        val di = GateCache.dir(inner)(pi => write(pi, "i.txt", "inner"))
        write(p, "o.txt", read(di, "i.txt") + "+outer")
      }
      read(d, "o.txt") shouldBe "inner+outer"
      read(GateCache.dir(inner)(_ => fail("must be cached")), "i.txt") shouldBe "inner"
    }

    it("concurrent resolves of one key run the builder once and all see its result") {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val builds = new java.util.concurrent.atomic.AtomicInteger(0)
      val key = s"spec_dir_conc_${System.nanoTime()}"
      val dirs = Await.result(
        Future.sequence((1 to 8).map(_ => Future {
          GateCache.dir(key) { p =>
            builds.incrementAndGet(); Thread.sleep(50); write(p, "v.txt", "one")
          }
        })), 30.seconds)
      builds.get shouldBe 1
      dirs.toSet should have size 1
      read(dirs.head, "v.txt") shouldBe "one"
    }
  }

  describe("GateCache.releasePrivateCopies") {
    it("reclaims outstanding copies; the pristine artifact survives") {
      val key = s"spec_release_${System.nanoTime()}"
      def build(p: String): Unit = write(p, "a.txt", "pristine")
      val c1 = GateCache.privateCopy(key)(build)
      val c2 = GateCache.privateCopy(key)(build)
      Files.exists(Paths.get(c1, "a.txt")) shouldBe true
      GateCache.releasePrivateCopies()
      Files.exists(Paths.get(c1)) shouldBe false
      Files.exists(Paths.get(c2)) shouldBe false
      // Pristine untouched; a later copy still works.
      read(GateCache.dir(key)(_ => fail("must be cached")), "a.txt") shouldBe "pristine"
      val c3 = GateCache.privateCopy(key)(build)
      read(c3, "a.txt") shouldBe "pristine"
      GateCache.releasePrivateCopies()
      Files.exists(Paths.get(c3)) shouldBe false
    }
  }

  describe("GateCache.privateCopy") {
    it("mutating a copy never leaks into the pristine dir or later copies") {
      val key = s"spec_cow_${System.nanoTime()}"
      def build(p: String): Unit = {
        Files.createDirectories(Paths.get(p, "postings", "bucket=0"))
        write(p, "meta.txt", "pristine")
        write(s"$p/postings/bucket=0", "part-0.parquet", "rows")
      }
      val c1 = GateCache.privateCopy(key)(build)
      // Mutate the first copy the way a delete gate would: tombstone file
      // plus an in-place overwrite.
      write(c1, "_tombstones.txt", "doc 3")
      write(c1, "meta.txt", "mutated")

      val pristine = GateCache.dir(key)(build)
      pristine should not be c1
      read(pristine, "meta.txt") shouldBe "pristine"
      Files.exists(Paths.get(pristine, "_tombstones.txt")) shouldBe false

      val c2 = GateCache.privateCopy(key)(build)
      c2 should not be c1
      read(c2, "meta.txt") shouldBe "pristine"
      Files.exists(Paths.get(c2, "_tombstones.txt")) shouldBe false
      // Nested partition layout survives the deep copy.
      read(s"$c2/postings/bucket=0", "part-0.parquet") shouldBe "rows"
    }

    it("builds the pristine at most once across dir and privateCopy resolves") {
      var builds = 0
      val key = s"spec_cow_once_${System.nanoTime()}"
      GateCache.privateCopy(key) { p => builds += 1; write(p, "x", "1") }
      GateCache.dir(key) { p => builds += 1; write(p, "x", "1") }
      GateCache.privateCopy(key) { p => builds += 1; write(p, "x", "1") }
      builds shouldBe 1
    }

    it("concurrent privateCopy resolves of one key build once and isolate every copy") {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val builds = new java.util.concurrent.atomic.AtomicInteger(0)
      val key = s"spec_cow_conc_${System.nanoTime()}"
      val copies = Await.result(
        Future.sequence((1 to 8).map(i => Future {
          val c = GateCache.privateCopy(key) { p =>
            builds.incrementAndGet(); write(p, "v.txt", "shared")
          }
          write(c, "v.txt", s"mutated-$i") // every thread scribbles on its own copy
          c
        })), 30.seconds)
      builds.get shouldBe 1
      copies.toSet should have size 8
      copies.zipWithIndex.foreach { case (c, i) => read(c, "v.txt") shouldBe s"mutated-${i + 1}" }
      read(GateCache.dir(key)(_ => fail("must be cached")), "v.txt") shouldBe "shared"
    }
  }
}
