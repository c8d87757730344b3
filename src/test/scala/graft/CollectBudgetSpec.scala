package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-collect budget audit — EXECUTED, not commentary: every
  * `.collect()` site in src/main must sit within 8 lines of either an
  * explicit `// bounded: <what>` marker naming its size bound, a
  * HarnessFeedCap predicate, or a `limit(...)`. A future operator that
  * adds an unbounded driver materialization fails this suite instead
  * of silently shipping; the existing claim "every collect is
  * metadata-sized or a capped harness feed" is thereby an assertion.
  */
class CollectBudgetSpec extends AnyFunSuite {

  private def sources: Seq[java.nio.file.Path] = {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get("src/main/scala")
    val walk = java.nio.file.Files.walk(root)
    try walk.iterator().asScala.filter(_.toString.endsWith(".scala")).toList
    finally walk.close()
  }

  test("every .collect() in src/main declares its bound") {
    val tokens = Seq("bounded:", "HarnessFeedCap", "limit(")
    val offenders = sources.flatMap { p =>
      val lines = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
        .split("\n", -1).toIndexedSeq
      lines.zipWithIndex.collect {
        case (l, i) if l.contains(".collect(") &&
            !lines.slice(math.max(0, i - 7), i + 1)
              .exists(w => tokens.exists(w.contains)) =>
          s"$p:${i + 1}: ${l.trim.take(70)}"
      }
    }
    assert(offenders.isEmpty,
      "unbounded .collect() sites (add a `// bounded: <what>` marker " +
        "naming the size bound, or cap the relation):\n" +
        offenders.mkString("\n"))
  }

  test("no unaudited driver-materialization escape hatches") {
    // collectAsList / toLocalIterator / toPandas-style escapes would
    // dodge the .collect() scan above; the engine simply must not use
    // them (collect-with-marker is the single audited idiom)
    val banned = Seq(".collectAsList(", ".toLocalIterator(")
    val offenders = sources.flatMap { p =>
      val lines = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
        .split("\n", -1).toIndexedSeq
      lines.zipWithIndex.collect {
        case (l, i) if banned.exists(l.contains) =>
          s"$p:${i + 1}: ${l.trim.take(70)}"
      }
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
