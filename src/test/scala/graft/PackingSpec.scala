package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.Packing

/** Sequence packing: per-source contiguity and boundary arithmetic. */
class PackingSpec extends AnyFunSuite with Matchers with TestSpark {

  test("token stream is contiguous per source and chop boundaries hold") {
    val out = Packing.seqPack(
      Tables.load(spark, "/root/testdata/sf0.01", "documents")).collect()
    out.groupBy(_.getString(1)).foreach { case (_, rows) =>
      // rows arrive ordered by doc_id within source; starts are contiguous
      var expectedStart = 0L
      rows.foreach { r =>
        r.getLong(3) shouldBe expectedStart
        expectedStart += r.getLong(2)
        // a doc occupies exactly the sequences its token interval overlaps
        r.getLong(4) shouldBe r.getLong(3) / Packing.SeqLen
        r.getLong(5) shouldBe
          (r.getLong(3) + math.max(r.getLong(2) - 1, 0)) / Packing.SeqLen
        r.getLong(4) should be <= r.getLong(5)
      }
    }
  }

  test("a SINGLE source packs across many partitions (two-phase prefix " +
      "sum), no serial per-source window") {
    import spark.implicits._
    // one source, 10k docs: the round-2 impl put all of this through ONE
    // window task; the two-phase form must spread it over `parts` slices
    // and still produce the exact global running sum
    val docs = (1L to 10000L).map(i =>
      (i, "the_only_source", ("tok " * (i % 7 + 1).toInt).trim))
      .toDF("doc_id", "source", "text")
    val out = Packing.seqPack(docs, seqLen = 64, parts = 16)
    var expected = 0L
    out.collect().foreach { r =>
      r.getLong(3) shouldBe expected // start_tok: globally contiguous
      expected += r.getLong(2)
    }
    // the plan must carry the range exchange of phase 1 and must NOT
    // funnel the corpus through a single-partition exchange
    val plan = out.queryExecution.executedPlan.toString
    plan should include("rangepartitioning")
    plan should not include "Exchange SinglePartition"
    // the big-side window groups by (_pid, source), never by source alone
    plan should include("hashpartitioning(_pid")
  }

  test("a custom seq length changes the chop, not the stream") {
    import spark.implicits._
    val docs = Seq((1L, "a", "one two three"), (2L, "a", "four five"),
      (3L, "a", "six"))
      .toDF("doc_id", "source", "text")
    val out = Packing.seqPack(docs, seqLen = 4)
      .select("doc_id", "n_tokens", "start_tok", "seq_first", "seq_last")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // doc1 tokens [0,3) -> seq 0; doc2 [3,5) -> seqs 0-1; doc3 [5,6) -> 1
    out shouldBe Array((1L, 3L, 0L, 0L, 0L), (2L, 2L, 3L, 0L, 1L),
      (3L, 1L, 5L, 1L, 1L))
  }

  test("shardPack snake placement: exact assignment from the global " +
      "token rank, every shard hit, token totals balanced") {
    import spark.implicits._
    val n = 4
    // 2 full passes + a 3-row remainder; token counts descend 11..1 with
    // a tie pair (doc 4 and 5 both get 7 tokens -> doc_id breaks the tie)
    val sizes = Seq(11, 9, 8, 7, 7, 5, 4, 3, 2, 1, 1)
    val docs = sizes.zipWithIndex.map { case (t, i) =>
      (i.toLong, ("w " * t).trim)
    }.toDF("doc_id", "text")
    val out = Packing.shardPack(docs, shards = n).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // rank order IS doc_id order here (sizes already descend, ties by id):
    // pass 0 deals 0,1,2,3 -> shards 0,1,2,3; pass 1 deals 4,5,6,7 ->
    // shards 3,2,1,0 (reversed); pass 2 deals 8,9,10 -> shards 0,1,2
    val expected = Map(
      0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L,
      4L -> 3L, 5L -> 2L, 6L -> 1L, 7L -> 0L,
      8L -> 0L, 9L -> 1L, 10L -> 2L)
    out.map { case (d, (_, s)) => d -> s } shouldBe expected
    val totals = out.values.groupBy(_._2).view
      .mapValues(_.map(_._1).sum).toMap
    totals.keySet shouldBe (0L until n).toSet
    // snake balance: consecutive pass pairs cancel drift — the spread
    // stays under the largest document
    (totals.values.max - totals.values.min) should be < sizes.max.toLong
  }

  test("shardPack ranks through the two-phase distributed prefix sum — " +
      "no whole-corpus single-task window") {
    val out = Packing.shardPack(
      Tables.load(spark, "/root/testdata/sf0.01", "documents"),
      tokenizer = graft.functions.BpeTokenCount(_))
    val plan = out.queryExecution.executedPlan.toString
    // the big-side window groups by (_pid, key), never the bare constant
    // key (which would put the whole corpus through one window task)
    plan should include("hashpartitioning(_pid")
    // per-shard totals at real data: every shard populated, spread tiny
    val rows = out.collect()
    val totals = rows.groupBy(_.getLong(2)).view
      .mapValues(_.map(_.getLong(1)).sum).toMap
    totals.keySet shouldBe (0L until Packing.ShardCount.toLong).toSet
    val maxDoc = rows.map(_.getLong(1)).max
    (totals.values.max - totals.values.min) should be <= maxDoc
  }
}
