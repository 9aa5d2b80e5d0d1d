package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Boilerplate line removal — the sub-document dedup pass of a web
  * training corpus: a line whose exact content recurs across more than
  * `maxDocFreq` distinct documents is navigation/footer/cookie-banner
  * furniture, not prose, and is dropped from EVERY document (the
  * MassiveText/C4-style repetition filter, line granularity; extends
  * the SURVEY §2.8 text surface like t01–t13).
  *
  * Scale shape, and why it holds at 100 TB:
  *  - lines explode once (linear, no shuffle);
  *  - the document-frequency pass shuffles (id, line-md5) pairs only —
  *    16-byte hashes, never line text — with a distinct to count each
  *    (doc, line) once and map-side combine on the count;
  *  - the frequent set is small by definition (boilerplate repeats;
  *    distinct frequent lines number in the thousands), so the
  *    anti-join against it broadcasts under AQE;
  *  - reassembly shuffles the kept (id, pos, line) rows once, ordered
  *    per document by the original position.
  *
  * Empty/whitespace-only lines never count toward frequency (they'd be
  * universally "boilerplate") and are preserved verbatim, so clean
  * documents round-trip byte-identical.
  */
object Boilerplate {

  /** (id, clean, n_lines, n_dropped): text with boilerplate lines
    * removed, the original line count, and how many were dropped. */
  def strip(docs: DataFrame, idCol: String, textCol: String, maxDocFreq: Int): DataFrame = {
    val lines = docs
      .select(col(idCol).as("id"), posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
      .withColumn("h", md5(col("line")))
    val frequent = lines
      .filter(length(trim(col("line"))) > 0)
      .select("id", "h").distinct()
      .groupBy("h").agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDocFreq)
      .select("h")
    lines
      .join(frequent.withColumn("drop", lit(1)), Seq("h"), "left")
      .groupBy(col("id"))
      .agg(
        concat_ws("\n",
          transform(
            array_sort(collect_list(when(col("drop").isNull, struct(col("pos"), col("line"))))),
            x => x("line"))).as("clean"),
        count(lit(1)).as("n_lines"),
        count(col("drop")).as("n_dropped"))
      .select(col("id").as(idCol), col("clean"), col("n_lines"), col("n_dropped"))
  }
}
