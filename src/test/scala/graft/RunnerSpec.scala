package graft

import org.apache.spark.sql.functions._

/** Runner-harness semantics without spawning the CLI: seeded shuffle
  * determinism (SURVEY.md §2.1 A17) and the Laghos-schema flagship shape. */
class RunnerSpec extends SparkTestBase {
  import spark.implicits._

  test("seed-1 shuffle is deterministic across runs") {
    val xs = (1 to 100).map(i => s"file_$i.parquet")
    val a = new scala.util.Random(1).shuffle(xs)
    val b = new scala.util.Random(1).shuffle(xs)
    assert(a == b && a != xs)
  }

  test("flagship on laghos schema: boundary rows excluded, sorted by E") {
    val df = Seq(
      (1, 1.55, 1.55, 1.55, 10.0),  // inside
      (1, 1.55, 1.55, 1.55, 20.0),  // inside, same key
      (2, 1.5, 1.55, 1.55, 5.0),    // x on boundary → excluded
      (3, 1.55, 1.55, 1.55, 1.0)    // inside, smaller avg → first
    ).toDF("vertex_id", "x", "y", "z", "e")
    val got = df.filter($"x" > 1.5 && $"x" < 1.6 &&
                        $"y" > 1.5 && $"y" < 1.6 &&
                        $"z" > 1.5 && $"z" < 1.6)
      .groupBy($"vertex_id")
      .agg(min($"vertex_id").as("VID"), avg($"e").as("E"))
      .select("VID", "E")
      .orderBy(asc_nulls_last("E"))
      .as[(Int, Double)].collect()
    assert(got.toSeq == Seq((3, 1.0), (1, 15.0)))
  }
}
