package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Laws for the two corpus-partitioning pipeline ops: greedy contiguous
  * sequence packing (q_pack_sequences) and the deterministic hash split
  * (q_sample_split). The graded keys pin the values against DuckDB;
  * these tests pin the ALGEBRA — boundary arithmetic, partition
  * completeness, oversize behavior — on both fixture and synthetic
  * inputs. */
class PackSplitSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"
  private val Cap = 512L

  test("packing partitions the corpus: every doc in exactly one sequence") {
    val docs = Tables.documents(spark, dir)
    val packed = ops.TextAnalysis.packSequences(docs, Cap)
    assert(packed.count() == docs.count())
    assert(packed.select("doc_id").distinct().count() == docs.count())
  }

  test("packing boundary law: seq_id equals an independently recomputed cumsum DIV cap") {
    // Independent of the engine's window arithmetic: take only the
    // per-doc token counts from the output, re-fold the exclusive
    // running total driver-side in (lang, doc_id) order, and demand
    // seq_id == own_cum DIV cap for every row (plus monotonicity).
    // Only `tok` is trusted from the engine here; the fold-model test
    // below independently re-derives tok too.
    val rows = ops.TextAnalysis.packSequences(Tables.documents(spark, dir), Cap)
      .orderBy(col("lang"), col("doc_id"))
      .select("lang", "doc_id", "tok", "seq_id")
      .collect()
    rows.groupBy(_.getString(0)).foreach { case (_, docs) =>
      var cum = 0L
      var prevSeq = -1L
      docs.sortBy(_.getLong(1)).foreach { r =>
        val seq = r.getLong(3)
        assert(seq == cum / Cap,
          s"doc ${r.getLong(1)}: seq_id=$seq but independent cumsum says ${cum / Cap}")
        assert(seq >= prevSeq, "sequence ids never decrease in doc order")
        cum += r.getLong(2)
        prevSeq = seq
      }
    }
  }

  test("BPE-budgeted packing (q_pack_bpe): same boundary algebra on the " +
    "frozen tokenizer counts, and tok equals bpeTokens' count per doc") {
    val docs = Tables.documents(spark, dir)
    val cap = 128L
    val packed = ops.TextAnalysis.packSequences(docs, cap,
        tokCol = ops.TextAnalysis.bpeCountOf(ops.TextAnalysis.BpeCorpusVocab))
      .orderBy(col("lang"), col("doc_id"))
      .select("lang", "doc_id", "tok", "seq_id").collect()
    // the budget column IS the graded tokenizer's count
    val bpe = ops.TextAnalysis.bpeTokens(docs, ops.TextAnalysis.BpeCorpusVocab)
      .select("doc_id", "n_tok_bpe").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    packed.foreach(r => assert(r.getLong(2) == bpe(r.getLong(1))))
    // and the boundary law holds on those counts
    packed.groupBy(_.getString(0)).foreach { case (_, ds) =>
      var cum = 0L
      ds.sortBy(_.getLong(1)).foreach { r =>
        assert(r.getLong(3) == cum / cap)
        cum += r.getLong(2)
      }
    }
  }

  test("packing sequence ranges are contiguous and never interleave") {
    val agg = SparkEntry.queries("q_pack_sequences")(spark, dir)
      .orderBy(col("lang"), col("seq_id")).collect()
    agg.groupBy(_.getString(0)).foreach { case (_, bins) =>
      bins.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("last_doc") < b.getAs[Long]("first_doc"),
            "doc ranges of consecutive sequences must be disjoint and ordered")
        case _ =>
      }
    }
  }

  test("an oversize doc keeps its own sequence and skips the ids it covers") {
    import spark.implicits._
    // tok estimates: 'aaaa' = 1 word * ceil(4/4) = 1 token per 'aaaa';
    // craft one 1200-token doc between two small ones (cap 512)
    val big = Seq.fill(1200)("aaaa").mkString(" ")
    val docs = Seq((1L, "en", "aaaa aaaa"), (2L, "en", big), (3L, "en", "aaaa"))
      .toDF("doc_id", "lang", "text")
    val out = ops.TextAnalysis.packSequences(docs, Cap)
      .orderBy("doc_id").select("doc_id", "seq_id").as[(Long, Long)].collect()
    // doc1: cum 0 → seq 0; doc2: cum 2 → seq 0 (starts inside 0, overflows);
    // doc3: cum 1202 → seq 2 — id 1 is skipped, never assigned out of order
    assert(out.toSeq == Seq((1L, 0L), (2L, 0L), (3L, 2L)))
  }

  test("packing accepts an arbitrary pack key (the production sharded form)") {
    val docs = Tables.documents(spark, dir)
      .withColumn("shard", pmod(col("doc_id"), lit(8)))
    val packed = ops.TextAnalysis.packSequences(docs, Cap, packKey = "shard")
    assert(packed.count() == docs.count())
    assert(packed.select("shard").distinct().count() == 8)
  }

  test("sharded packing bounds every shard and stays deterministic") {
    val docs = Tables.documents(spark, dir)
    val packed = ops.TextAnalysis.packSequencesSharded(docs, Cap, nShards = 16)
    assert(packed.count() == docs.count())
    val shardSizes = packed.groupBy("shard").count().collect().map(_.getLong(1))
    // 500 docs over 16 md5 shards: no shard should carry the corpus
    assert(shardSizes.length > 8 && shardSizes.max < docs.count() / 2,
      s"shard skew: ${shardSizes.toSeq.sorted.reverse.take(3)}")
    val a = packed.select("doc_id", "shard", "seq_id").orderBy("doc_id").collect().toSeq
    val b = ops.TextAnalysis.packSequencesSharded(docs.repartition(5), Cap, nShards = 16)
      .select("doc_id", "shard", "seq_id").orderBy("doc_id").collect().toSeq
    assert(a == b, "sharded packing must be repartition-invariant")
  }

  test("packing matches a sequential-fold model on a seeded random corpus") {
    import spark.implicits._
    // seeded random corpus: ragged doc sizes across 3 pack keys
    val rnd = new scala.util.Random(42)
    val docs = (1L to 300L).map { id =>
      val lang = Seq("en", "de", "fr")(rnd.nextInt(3))
      val text = Seq.fill(1 + rnd.nextInt(60))("w" * (1 + rnd.nextInt(9)))
        .mkString(" ")
      (id, lang, text)
    }
    val out = ops.TextAnalysis.packSequences(docs.toDF("doc_id", "lang", "text"), 128L)
      .select("doc_id", "seq_id").as[(Long, Long)].collect().toMap
    // driver-local model: same ceil(len/4) token estimate, same
    // exclusive-running-total // capacity assignment, one fold per key
    val model = docs.groupBy(_._2).flatMap { case (_, ds) =>
      var cum = 0L
      ds.sortBy(_._1).map { case (id, _, text) =>
        val seq = cum / 128L
        cum += text.split(" ").map(w => ((w.length + 3) / 4).toLong).sum
        id -> seq
      }
    }.toMap
    assert(out == model)
  }

  test("hash split partitions the corpus with stable in-range buckets") {
    val docs = Tables.documents(spark, dir)
    val split = ops.TextAnalysis.hashSplit(docs)
    assert(split.count() == docs.count())
    assert(split.filter(col("bucket") < 0 || col("bucket") >= 100).count() == 0)
    // every split nonempty at 500 docs, and the three are disjoint by
    // construction (CASE) — check the partition sums instead
    val bySplit = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.keySet == Set("train", "validation", "test"))
    assert(bySplit.values.sum == docs.count())
    assert(bySplit("train") > bySplit("validation") &&
      bySplit("train") > bySplit("test"), "train is the bulk split")
  }

  test("hash split is deterministic: same assignment on re-run and under repartition") {
    val docs = Tables.documents(spark, dir)
    val a = ops.TextAnalysis.hashSplit(docs)
      .select("doc_id", "split").orderBy("doc_id").collect().toSeq
    val b = ops.TextAnalysis.hashSplit(docs.repartition(7))
      .select("doc_id", "split").orderBy("doc_id").collect().toSeq
    assert(a == b)
  }
}
