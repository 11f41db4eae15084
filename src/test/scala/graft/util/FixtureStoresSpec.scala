package graft.util

import java.nio.file.{Files, Path, Paths}
import java.util.concurrent.atomic.AtomicInteger
import org.scalatest.funsuite.AnyFunSuite

/** Contract of the JVM-wide fixture-template registry the parity
  * gates lean on: build-once per key, byte-identical clones, clone
  * mutations isolated from the template, reset() forcing a rebuild —
  * and (round-12 regression) a template builder may resolve ANOTHER
  * template without deadlock/Recursive-update, because `template`
  * runs builders outside the map's locks.
  *
  * No SparkSession needed: the registry deals only in directories.
  */
class FixtureStoresSpec extends AnyFunSuite {

  private def write(dir: String, name: String, bytes: Array[Byte]): Unit = {
    val p = Paths.get(dir, name)
    Files.createDirectories(p.getParent)
    Files.write(p, bytes): Unit
  }

  private def slurp(root: Path): Map[String, Vector[Byte]] = {
    val walk = Files.walk(root)
    try {
      import scala.jdk.CollectionConverters._
      walk.iterator().asScala
        .filter(Files.isRegularFile(_))
        .map(p => root.relativize(p).toString -> Files.readAllBytes(p).toVector)
        .toMap
    } finally walk.close()
  }

  test("template builds exactly once per key and is stable across calls") {
    FixtureStores.reset()
    val builds = new AtomicInteger(0)
    def get(): String = FixtureStores.template("spec-once") { store =>
      builds.incrementAndGet(): Unit
      write(store, "data.bin", Array[Byte](1, 2, 3))
    }
    val first = get()
    val second = get()
    assert(first === second)
    assert(builds.get() === 1)
    assert(Files.readAllBytes(Paths.get(first, "data.bin")).toSeq === Seq[Byte](1, 2, 3))
  }

  test("reset() drops templates (files swept) and forces a rebuild") {
    FixtureStores.reset()
    val builds = new AtomicInteger(0)
    def get(): String = FixtureStores.template("spec-reset") { store =>
      builds.incrementAndGet(): Unit
      write(store, "f", Array[Byte](9))
    }
    val p1 = get()
    assert(builds.get() === 1)
    FixtureStores.reset()
    assert(!Files.exists(Paths.get(p1)), "reset must sweep the template's files")
    get(): Unit
    assert(builds.get() === 2, "post-reset call must rebuild")
  }

  test("cloneInto copies the template byte-identically into a fresh dir") {
    FixtureStores.reset()
    val tmpl = FixtureStores.template("spec-clone") { store =>
      write(store, "a.parquet", Array.tabulate(256)(_.toByte))
      write(store, "_commits/000001.json", "{\"v\":1}".getBytes)
    }
    val destRoot = Files.createTempDirectory("spec-clone-dest-")
    val clone = FixtureStores.cloneInto(tmpl, destRoot)
    assert(clone !== tmpl)
    assert(slurp(Paths.get(clone)) === slurp(Paths.get(tmpl)))
  }

  test("mutating a clone never touches the template") {
    FixtureStores.reset()
    val tmpl = FixtureStores.template("spec-isolate") { store =>
      write(store, "keep.bin", Array[Byte](7, 7))
    }
    val before = slurp(Paths.get(tmpl))
    val clone = FixtureStores.cloneInto(tmpl, Files.createTempDirectory("spec-iso-"))
    write(clone, "extra.bin", Array[Byte](1))
    Files.write(Paths.get(clone, "keep.bin"), Array[Byte](0)): Unit
    Files.delete(Paths.get(clone, "extra.bin"))
    assert(slurp(Paths.get(tmpl)) === before)
  }

  test("a builder may resolve another template (round-12 Recursive-update regression)") {
    FixtureStores.reset()
    // The r12 crash was computeIfAbsent-inside-computeIfAbsent when two
    // keys landed in one bin; with build-outside-lock this must work
    // for ANY keys, so exercise a 3-deep chain.
    val outer = FixtureStores.template("spec-nest-outer") { store =>
      val mid = FixtureStores.template("spec-nest-mid") { midStore =>
        val inner = FixtureStores.template("spec-nest-inner") { innerStore =>
          write(innerStore, "seed", Array[Byte](42))
        }
        val cloned = FixtureStores.cloneInto(inner,
          Paths.get(midStore).getParent)
        write(cloned, "mid-extra", Array[Byte](1))
      }
      FixtureStores.cloneInto(mid, Paths.get(store).getParent): Unit
    }
    assert(Files.readAllBytes(Paths.get(outer, "seed")).toSeq === Seq[Byte](42))
    assert(Files.exists(Paths.get(outer, "mid-extra")))
  }

  test("concurrent first use of one cold key yields one surviving template") {
    FixtureStores.reset()
    val builds = new AtomicInteger(0)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val paths = Await.result(
      Future.sequence((1 to 8).map(_ => Future {
        FixtureStores.template("spec-race") { store =>
          builds.incrementAndGet(): Unit
          write(store, "r", Array[Byte](5))
        }
      })), 30.seconds)
    assert(paths.toSet.size === 1, "all callers must converge on one path")
    val winner = paths.head
    assert(Files.readAllBytes(Paths.get(winner, "r")).toSeq === Seq[Byte](5))
    // Losers' directories must have been swept (only the winner's
    // temp root may remain among those built).
    assert(builds.get() >= 1)
  }
}
