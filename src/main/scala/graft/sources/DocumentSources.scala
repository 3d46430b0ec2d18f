package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.unsafe.types.UTF8String

/** Document-corpus source adapters — the LLM-pipeline counterpart of
  * [[MetricSources]]. Web-scraped training corpora ship as JSONL (one JSON
  * object per line: CommonCrawl derivatives, RedPajama, Dolma, FineWeb all
  * use the shape), so a pipeline engine needs a first-class JSONL path next
  * to parquet.
  *
  * Scale stance: reads take an EXPLICIT schema — `spark.read.json` schema
  * inference is a full extra pass over the data (at 100 TB that is a second
  * 100 TB scan before the first real one), and inferred types drift with
  * content (a batch whose doc_ids all fit in int changes the column type).
  * Writes go through Spark's distributed JSON writer: per-partition files,
  * no driver involvement.
  */
object DocumentSources {

  /** The canonical documents schema (matches the fixture tables). All fields
    * nullable: a JSONL line can omit any key, and Spark's JSON reader forces
    * nullable anyway — declaring non-null here would silently diverge from
    * what the read actually returns.
    */
  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = true),
    StructField("text", StringType, nullable = true),
    StructField("lang", StringType, nullable = true),
    StructField("source", StringType, nullable = true),
    StructField("n_chars", LongType, nullable = true)))

  /** Distributed JSONL write (one JSON object per line, gzip-free so the
    * files stay splittable for the read side).
    */
  def writeJsonl(docs: DataFrame, path: String): Unit =
    docs.write.mode("overwrite").json(path)

  /** JSONL read with the explicit documents schema — NO inference pass.
    * Corrupt lines land in no row rather than poisoning the batch
    * (PERMISSIVE with all-null detection left to the caller's filters,
    * matching how pipeline tools treat malformed crawl records).
    */
  def readDocumentsJsonl(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(documentsSchema).json(path)

  /** Unicode NFC normalization (java.text.Normalizer, one imperative pass per
    * row — map-side, zero shuffle). Crawled text mixes composed and
    * decomposed forms of the same grapheme ("é" as U+00E9 vs e+U+0301);
    * exact dedup, shingling and token counting all disagree across the two
    * unless the corpus is normalized first, which is why NFC is the first
    * step of most pipeline recipes. DuckDB's nfc_normalize computes the
    * identical mapping, so the operator is oracle hash-gated.
    */
  case class NfcNormalize(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String].toString
      val n =
        if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) s
        else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
      UTF8String.fromString(n)
    }
    override protected def withNewChildInternal(c: Expression): NfcNormalize =
      copy(child = c)
  }

  def nfcNormalize(text: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      NfcNormalize(org.apache.spark.sql.GraftBridge.expression(text)))
}
