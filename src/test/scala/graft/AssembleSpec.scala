package graft

import org.apache.spark.sql.functions._
import graft.operators.{Assemble, Dedup}

/** Sequence packing, context chunking, decontamination. */
class AssembleSpec extends SparkTestBase {
  import spark.implicits._

  private def docsDf(rows: Seq[(Long, String)]) =
    rows.toDF("doc_id", "text")

  test("packSequences: offsets within capacity, contiguous layout, straddle flag") {
    val docs = docsDf(Seq(
      (0L, Seq.fill(30)("w").mkString(" ")), // 30 tokens
      (1L, Seq.fill(50)("w").mkString(" ")), // 50 -> straddles 64-cap at offset 30
      (2L, Seq.fill(10)("w").mkString(" ")),
      (100L, Seq.fill(5)("w").mkString(" ")) // new shard (shardSize 100)
    ))
    val packed = Assemble.packSequences(docs, capacityTokens = 64, shardSize = 100)
      .orderBy("doc_id").collect()
    val byId = packed.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(3), r.getLong(4), r.getBoolean(5))).toMap
    assert(byId(0L) == (0L, 0L, 0L, false))
    assert(byId(1L) == (0L, 0L, 30L, true)) // 30 + 50 > 64
    assert(byId(2L) == (0L, 1L, 80L % 64, false)) // cum 80 -> seq 1, offset 16
    assert(byId(100L) == (1L, 1000000L, 0L, false)) // fresh shard, fresh seq
    // offsets always inside the capacity
    assert(packed.forall(r => r.getLong(4) >= 0 && r.getLong(4) < 64))
  }

  test("chunk: overlap-stripped chunks reassemble the document") {
    val texts = Seq(
      (0L, "abcdefghij" * 60), // 600 chars
      (1L, "short"),
      (2L, "")
    )
    val chunks = Assemble.chunk(docsDf(texts), size = 256, overlap = 32)
      .orderBy("doc_id", "chunk_idx").collect()
    val byDoc = chunks.groupBy(_.getLong(0))
    texts.foreach { case (id, text) =>
      val cs = byDoc(id).sortBy(_.getInt(1)).map(_.getString(2))
      val rebuilt = cs.head + cs.tail.map(_.drop(32)).mkString
      assert(rebuilt == text, s"doc $id reassembly")
      // every chunk except the last is full-size
      cs.init.foreach(c => assert(c.length == 256))
    }
  }

  test("stratifiedSample: keep fraction tracks the rate; membership stable under corpus growth") {
    val docs = (0L until 2000L).map(i => (i, "t")).toDF("doc_id", "text")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
    val s = graft.operators.TextAnalysis.stratifiedSample(docs, Map("en" -> 0.3))
    val keptFrac = s.filter(col("kept")).count().toDouble / 2000.0
    assert(math.abs(keptFrac - 0.3) < 0.05)
    // growth invariance: the same doc_ids stay kept when the corpus doubles
    val bigger = (0L until 4000L).map(i => (i, "t")).toDF("doc_id", "text")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
    val keptSmall = s.filter(col("kept")).select("doc_id").collect().map(_.getLong(0)).toSet
    val keptBig = graft.operators.TextAnalysis.stratifiedSample(bigger, Map("en" -> 0.3))
      .filter(col("kept") && col("doc_id") < 2000).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptSmall == keptBig)
  }

  test("repetitionStats: repeated grams raise the ratio; short docs are zero") {
    val docs = Seq(
      (0L, "a b a b a b"), // grams: aba, bab, aba, bab -> 4 total, 2 distinct
      (1L, "one two three four"), // all distinct
      (2L, "x")
    ).toDF("doc_id", "text")
    val r = graft.operators.TextAnalysis.repetitionStats(docs)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getDouble(3))).toMap
    assert(r(0L) == (4L, 2L, 0.5))
    assert(r(1L) == (2L, 2L, 0.0))
    assert(r(2L) == (0L, 0L, 0.0))
  }

  test("piiStats: planted PII counted and scrubbed with typed placeholders") {
    val docs = docsDf(Seq(
      (0L, "contact me at jane.doe+x@example.org or +14155550123 from 10.0.0.1 thanks"),
      (1L, "clean text with no identifiers at all")
    ))
    val r = graft.operators.TextAnalysis.piiStats(docs).orderBy("doc_id").collect()
    assert(r(0).getInt(1) == 1 && r(0).getInt(2) == 1 && r(0).getInt(3) == 1)
    assert(r(0).getString(4) == "contact me at [EMAIL] or [PHONE] from [IP] thanks")
    assert(r(0).getBoolean(5))
    assert(r(1).getInt(1) == 0 && !r(1).getBoolean(5))
    assert(r(1).getString(4) == "clean text with no identifiers at all")
  }

  test("cdcChunks: chunks tile the document; boundaries resync after an insertion") {
    val base = (1 to 40).map(i => f"segment$i%02d content word").mkString(" ")
    val edited = "INSERTED PREFIX " + base // early insertion
    val docs = docsDf(Seq((0L, base), (1L, edited), (2L, "")))
    val chunks = Dedup.cdcChunks(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getString(4)))
    // tiling: contiguous, starts at 1, lengths sum to the doc length
    Seq(0L -> base, 1L -> edited).foreach { case (id, text) =>
      val cs = chunks.filter(_._1 == id).sortBy(_._2)
      assert(cs.head._3 == 1)
      assert(cs.map(_._4).sum == text.length)
      cs.sliding(2).foreach {
        case Array(a, b) => assert(b._3 == a._3 + a._4)
        case _ =>
      }
    }
    // empty docs contribute no chunks
    assert(!chunks.exists(_._1 == 2L))
    // resync: the edited doc shares most chunk HASHES with the original
    // (only the chunks overlapping the insertion differ) — fixed-size
    // chunking would shift and change every chunk hash
    val h0 = chunks.filter(_._1 == 0L).map(_._5).toSet
    val h1 = chunks.filter(_._1 == 1L).map(_._5).toSet
    val shared = (h0 & h1).size
    assert(shared >= h0.size - 2, s"only $shared of ${h0.size} chunk hashes survived the edit")
  }

  test("decontaminationPairs: a test doc sharing a long substring with a train doc is flagged") {
    // find doc_ids landing in test vs train under the hash split
    val ids = Dedup.trainSplit(docsDf((0L to 200L).map(i => (i, "x"))).select("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val testId = ids.collectFirst { case (i, "test") => i }.get
    val trainId = ids.collectFirst { case (i, "train") => i }.get
    val otherTrain = ids.collect { case (i, "train") if i != trainId => i }.head
    val shared = "the quick brown fox jumps over the lazy dog again and again"
    val docs = docsDf(Seq(
      (testId, s"evaluation prompt: $shared :: answer"),
      (trainId, s"training corpus line containing $shared inside it"),
      (otherTrain, "completely unrelated content with no overlap at all zzz")
    ))
    val pairs = Dedup.decontaminationPairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((testId, trainId)))
    assert(!pairs.contains((testId, otherTrain)))
  }
}
