package graft.streaming

import graft.SparkSpec
import graft.operators.Dedup
import org.apache.spark.sql.types._

/** The streaming near-dup path: per-row sketch parity with the batch
  * aggregate, and stream-vs-batch pair-set equality across real
  * micro-batch boundaries (file source, one file per trigger). */
class NearDupStreamSpec extends SparkSpec {
  import spark.implicits._

  private val vocab = Vector("red", "green", "blue", "cyan", "magenta", "yellow", "black", "white")

  private def corpus: Seq[(Long, String)] = {
    val rnd = new scala.util.Random(42)
    val base = (0 until 30).map { i =>
      (i.toLong, Seq.fill(6 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    // exact copies far apart in id space, so the pair members land in
    // different micro-batch files below
    base ++ Seq((30L, base(2)._2), (31L, base(11)._2), (32L, base(2)._2))
  }

  test("per-row sketch equals the SimHashAgg batch aggregate") {
    val docs = corpus.toDF("doc_id", "text")
    val batch = Dedup.simhashTable(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    corpus.foreach { case (id, text) =>
      assert(NearDupStream.sketch(text).contains(batch(id)), s"doc $id")
    }
    assert(NearDupStream.sketch("").isEmpty && NearDupStream.sketch("  ").isEmpty)
  }

  test("streaming pairs equal the batch pairs across micro-batch boundaries") {
    val dir = java.nio.file.Files.createTempDirectory("neardup").toString + "/in"
    val schema = StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType)))
    // three files -> three micro-batches with maxFilesPerTrigger=1; the
    // injected copies pair across them, so band state must carry over
    corpus.grouped(11).foreach { slice =>
      slice.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(dir)
    }
    val stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(dir)
    val q = EventStream.runToMemory(
      NearDupStream.simhashDupPairs(stream, "doc_id", "text", 3).toDF(), "neardup_pairs", "append")
    q.awaitTermination(60000)
    val streamed = spark.table("neardup_pairs")
      .as[(Long, Long, Long)].collect().toSet
    val batch = Dedup.simhashPairs(corpus.toDF("doc_id", "text"), "doc_id", "text", 3)
      .select("id_a", "id_b", "hamming")
      .as[(Long, Long, Int)].collect().map { case (a, b, h) => (a, b, h.toLong) }.toSet
    assert(streamed == batch)
    // the copies guarantee non-trivial coverage, incl. a hamming-0 pair
    // whose members arrived in different micro-batches
    assert(batch.contains((2L, 30L, 0L)) && batch.contains((11L, 31L, 0L)))
    // each pair appears EXACTLY once (chunk-minimal emission): the
    // memory sink preserves duplicates, so compare with count
    assert(spark.table("neardup_pairs").count() == streamed.size)
  }
}
