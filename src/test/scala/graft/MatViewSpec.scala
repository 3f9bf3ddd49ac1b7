package graft

import graft.operators.MatView
import org.apache.spark.sql.functions._

/** Incremental materialized aggregate: K appends must serve exactly the
  * bulk aggregate, appends must never rewrite committed files, and
  * compaction must change the file layout but not the served rows.
  */
class MatViewSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables(spark, sf, "documents")
    .withColumn("tok", size(split($"text", " ")).cast("long"))

  private def tmpDir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_mv_$tag")
    d.toFile.deleteOnExit()
    d.toString
  }

  private def served(dir: String): Set[(String, String, Long, Long, Long, Long, Long)] =
    MatView.serveAgg(MatView.loadAggState(spark, dir))
      .select($"lang", $"source", $"cnt", $"sum_v", $"min_v", $"max_v",
        $"avg_micro")
      .as[(String, String, Long, Long, Long, Long, Long)].collect().toSet

  private def bulk: Set[(String, String, Long, Long, Long, Long, Long)] =
    MatView.serveAgg(MatView.buildAggState(docs, Seq("lang", "source"), "tok"))
      .select($"lang", $"source", $"cnt", $"sum_v", $"min_v", $"max_v",
        $"avg_micro")
      .as[(String, String, Long, Long, Long, Long, Long)].collect().toSet

  test("K appends ≡ bulk aggregate (counts, sums, extremes, exact mean)") {
    val dir = tmpDir("appends")
    MatView.saveAggState(
      MatView.buildAggState(docs.filter($"doc_id" % 3 === 0),
        Seq("lang", "source"), "tok"), dir)
    MatView.appendAggState(spark, dir, docs.filter($"doc_id" % 3 === 1))
    MatView.appendAggState(spark, dir, docs.filter($"doc_id" % 3 === 2))
    val b = bulk
    assert(served(dir) == b && b.nonEmpty)
  }

  test("append writes new files only; committed state files untouched") {
    val dir = tmpDir("mtime")
    MatView.saveAggState(
      MatView.buildAggState(docs.filter($"doc_id" % 2 === 0),
        Seq("lang", "source"), "tok"), dir)
    Thread.sleep(1100) // mtime granularity
    val before = parquetStamps(s"$dir/state")
    MatView.appendAggState(spark, dir, docs.filter($"doc_id" % 2 === 1))
    val after = parquetStamps(s"$dir/state")
    assert(after.size > before.size, "append must add files")
    before.foreach { case (path, mtime) =>
      assert(after.contains(path), s"append deleted $path")
      assert(after(path) == mtime, s"append rewrote $path")
    }
    assert(served(dir) == bulk)
  }

  test("compactAggState: served rows identical, fewer state files") {
    val dir = tmpDir("compact")
    MatView.saveAggState(
      MatView.buildAggState(docs.filter($"doc_id" % 4 === 0),
        Seq("lang", "source"), "tok"), dir)
    for (m <- 1 to 3)
      MatView.appendAggState(spark, dir, docs.filter($"doc_id" % 4 === m))
    val (before, filesBefore) = (served(dir), parquetStamps(s"$dir/state").size)
    MatView.compactAggState(spark, dir)
    assert(served(dir) == before)
    assert(parquetStamps(s"$dir/state").size < filesBefore,
      "compaction must reduce the file count")
    // the compacted state is still appendable
    MatView.appendAggState(spark, dir,
      docs.filter($"doc_id" % 4 === 0)) // duplicate keys merge, not break
    assert(served(dir) != before) // counts doubled for the %4==0 slice
  }

  test("retraction: counts/sums/mean exact immediately; extremes repaired by refreshExtremes") {
    val dir = tmpDir("retract")
    MatView.saveAggState(
      MatView.buildAggState(docs, Seq("lang", "source"), "tok"), dir)
    val survivors = docs.filter($"doc_id" % 7 =!= 3)
    MatView.retractAggState(spark, dir, docs.filter($"doc_id" % 7 === 3))
    val want = MatView.serveAgg(
        MatView.buildAggState(survivors, Seq("lang", "source"), "tok"))
      .select($"lang", $"source", $"cnt", $"sum_v", $"min_v", $"max_v",
        $"avg_micro")
      .as[(String, String, Long, Long, Long, Long, Long)].collect().toSet
    // before the repair: counts/sums/mean already exact, extremes are
    // conservative bounds (min_v ≤ true min, max_v ≥ true max)
    val interim = served(dir)
    val wantByKey = want.map(r => (r._1, r._2) -> r).toMap
    interim.foreach { r =>
      wantByKey.get((r._1, r._2)).foreach { w =>
        assert(r._3 == w._3 && r._4 == w._4 && r._7 == w._7,
          s"cnt/sum/avg must be exact pre-repair: $r vs $w")
        assert(r._5 <= w._5 && r._6 >= w._6,
          s"pre-repair extremes must bound the truth: $r vs $w")
      }
    }
    MatView.refreshExtremes(spark, dir, survivors)
    assert(served(dir) == want)
    // untouched after a no-retraction refresh: idempotent
    MatView.refreshExtremes(spark, dir, survivors)
    assert(served(dir) == want)
  }

  test("retraction to zero rows removes the key after refreshExtremes") {
    val dir = tmpDir("retract_zero")
    MatView.saveAggState(
      MatView.buildAggState(docs, Seq("lang", "source"), "tok"), dir)
    // wipe out one entire (lang, source) group
    val victimKeys = docs.groupBy($"lang", $"source").count()
      .orderBy($"lang", $"source").limit(1)
      .select($"lang", $"source")
    val victims = docs.join(victimKeys, Seq("lang", "source"), "left_semi")
    MatView.retractAggState(spark, dir, victims)
    MatView.refreshExtremes(spark, dir,
      docs.join(victimKeys, Seq("lang", "source"), "left_anti"))
    val keys = served(dir).map(r => (r._1, r._2))
    val gone = victimKeys.as[(String, String)].head()
    assert(!keys.contains(gone), s"zeroed key $gone must disappear")
  }
}
