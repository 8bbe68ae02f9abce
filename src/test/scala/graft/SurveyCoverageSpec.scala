package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry ↔ SURVEY.md §8 consistency (round-10 hygiene directive): every
  * query in `SparkEntry.queries` must be mapped in the §8 coverage tables,
  * so the coverage map can never silently rot behind the registry again
  * (it went stale for a full round at q281–q290). §8 references queries as
  * `qNNN` tokens and `qNNN–qMMM` ranges — both count. */
class SurveyCoverageSpec extends AnyFunSuite {

  test("every registry query number appears in SURVEY.md §8") {
    val survey = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")), "UTF-8")
    val s8 = survey.substring(survey.indexOf("## 8."))
    assert(s8.nonEmpty, "SURVEY.md §8 header not found")

    // ranges first (q166–q173, ASCII or en dash), then single tokens
    val range = """q(\d+)\s*[–-]\s*q?(\d+)""".r
    val single = """q(\d+)""".r
    val mapped: Set[Int] =
      range.findAllMatchIn(s8).flatMap(m =>
        (m.group(1).toInt to m.group(2).toInt).iterator).toSet ++
      single.findAllMatchIn(s8).map(_.group(1).toInt).toSet

    val registry = SparkEntry.queries.keys.map { name =>
      name -> """^q(\d+)""".r.findFirstMatchIn(name).map(_.group(1).toInt)
    }.toSeq
    registry.foreach { case (name, num) =>
      assert(num.isDefined, s"registry name '$name' is not qNNN-prefixed")
    }
    val missing = registry.collect {
      case (name, Some(n)) if !mapped.contains(n) => name
    }.sorted
    assert(missing.isEmpty,
      s"${missing.size} registry queries unmapped in SURVEY.md §8 — add " +
        s"coverage rows for: ${missing.mkString(", ")}")
  }
}
