package graft

import graft.operators.Cdc
import org.apache.spark.sql.functions._

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def toks(t: String) = t.split(" ").filter(_.nonEmpty)

  test("spans partition the token sequence exactly, within length bounds") {
    val docs = Tables.documents(spark, sf001).select($"text").as[String]
      .collect().take(50)
    docs.foreach { t =>
      val tk = toks(t)
      val spans = Cdc.spansOf(tk, window = 4, modulus = 16, minLen = 8, maxLen = 64)
      // exact cover, in order, no gaps
      assert(spans.map(_._1) == spans.scanLeft(0)((acc, s) => acc + s._2).init)
      assert(spans.map(_._2).sum == tk.length)
      // every chunk but the last respects [min, max]
      spans.dropRight(1).foreach { case (_, n) =>
        assert(n >= 8 && n <= 64, s"span $n out of bounds")
      }
      assert(spans.last._2 <= 64)
    }
  }

  test("edit stability: a prefix insertion preserves most downstream chunks") {
    val texts = Tables.documents(spark, sf001).select($"text").as[String]
      .collect().filter(t => toks(t).length >= 60).take(20)
    assert(texts.nonEmpty)
    var shared = 0; var total = 0
    texts.foreach { t =>
      val a = toks(t)
      val b = Array("zzz", "yyy", "xxx") ++ a
      def hashes(tk: Array[String]) =
        Cdc.spansOf(tk, 4, 16, 8, 64)
          .map { case (s, n) => tk.slice(s, s + n).mkString(" ") }
      val ha = hashes(a).toSet
      val hb = hashes(b).toSet
      shared += (ha & hb).size; total += ha.size
      // fixed-size chunking would shift EVERY boundary after the edit; the
      // content-defined boundaries must resynchronize
      assert((ha & hb).nonEmpty, "no chunk survived a 3-token prefix edit")
    }
    assert(shared.toDouble / total >= 0.5,
      s"only $shared/$total chunks stable under prefix edits")
  }

  test("chunkDocuments reconstructs documents and dedups shared passages") {
    val docs = Seq(
      (1L, "alpha " * 0 + ("one two three four five six seven eight nine ten " * 4).trim),
      (2L, ("one two three four five six seven eight nine ten " * 4).trim),
      (3L, "totally different words here that do not repeat the passage at all padding padding padding more more more")
    ).toDF("doc_id", "text")
    val chunks = Cdc.chunkDocuments(docs, minLen = 5, maxLen = 20)
    // reconstruction: concatenating each doc's chunks in chunk_idx order
    // yields the original token stream
    val rebuilt = chunks.orderBy($"doc_id", $"chunk_idx")
      .groupBy($"doc_id")
      .agg(concat_ws(" ", collect_list($"chunk_text")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    docs.collect().foreach { r =>
      assert(rebuilt(r.getLong(0)) == r.getString(1))
    }
    // identical docs 1 and 2 produce identical chunk hash sequences, so
    // chunk-level dedup collapses them
    val dups = chunks.groupBy($"chunk_hash")
      .agg(countDistinct($"doc_id").as("nd"))
      .filter($"nd" > 1).count()
    assert(dups > 0, "shared passage not detected at chunk level")
  }

  test("determinism across partitionings") {
    val docs = Tables.documents(spark, sf001)
    def run(p: Int) = Cdc.chunkDocuments(docs.repartition(p))
      .select($"doc_id", $"chunk_idx", $"chunk_hash")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(run(2) == run(7))
  }
}
