package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, ObjectInputStream, ObjectOutputStream}

import graft.SparkSpec
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.util.sketch.BloomFilter

class BloomProbeSpec extends SparkSpec {

  private def broadcastFilter(): Broadcast[Array[Byte]] = {
    val f = BloomFilter.create(1000, 0.01)
    (1L to 100L).foreach(f.putLong)
    val bos = new ByteArrayOutputStream()
    f.writeTo(bos)
    spark.sparkContext.broadcast(bos.toByteArray)
  }

  test("filterFor memoizes deserialization per executor") {
    val b = broadcastFilter()
    assert(BloomProbe.filterFor(b) eq BloomProbe.filterFor(b))
  }

  test("filterFor hits the cache from a fresh per-task Broadcast wrapper") {
    val b = broadcastFilter()
    val first = BloomProbe.filterFor(b)
    // each task deserializes its OWN Broadcast wrapper; only `b.value`
    // (served by the block manager) is identity-stable per executor.
    // A wrapper-keyed cache misses here and re-reads the filter per task.
    val bos = new ByteArrayOutputStream()
    new ObjectOutputStream(bos).writeObject(b)
    val taskCopy = new ObjectInputStream(new ByteArrayInputStream(bos.toByteArray))
      .readObject().asInstanceOf[Broadcast[Array[Byte]]]
    assert(taskCopy ne b)
    assert(BloomProbe.filterFor(taskCopy) eq first,
      "a per-task wrapper must resolve to the executor-cached filter, not a fresh readFrom")
  }
}
