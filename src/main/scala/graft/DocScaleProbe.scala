package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the LLM-pipeline operators: synthesizes a corpus with
  * PLANTED exact and near duplicates, then runs exact dedup, MinHash+LSH
  * near-dup, contamination, repetition and vocab top-k at millions-of-docs
  * scale. Verifies the planted structure is actually recovered (not just that
  * the jobs finish) and prints per-op throughput.
  *
  * Corpus shape (deterministic, xxhash64-derived):
  *  - base doc: 80 words drawn from a 1000-word vocab keyed on (base_id, pos);
  *  - id % 40 == 1  → EXACT copy of id-1 (id-1 is its own base);
  *  - id % 40 == 21 → NEAR dup of id-21 (also its own base): same words except
  *    the last replaced → ~77/81 shingles shared, Jaccard ≈ 0.93;
  *  - else unique text.
  */
object DocScaleProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toLong else 1000000L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](name: String)(f: => T): T = {
      val t = System.nanoTime(); val r = f
      println(f"[docs] $name: ${(System.nanoTime() - t) / 1e9}%.2f s"); r
    }

    val docs = spark.range(0L, nDocs, 1L, 64)
      .withColumn("base_id",
        when(col("id") % 40 === 1, col("id") - 1)
          .when(col("id") % 40 === 21, col("id") - 21)
          .otherwise(col("id")))
      .withColumn("words", expr(
        "transform(sequence(1, 80), p -> concat('w', pmod(xxhash64(base_id, p), 1000)))"))
      .withColumn("text",
        when(col("id") % 40 === 21,
          concat(array_join(slice(col("words"), 1, 79), " "), lit(" zmut")))
          .otherwise(array_join(col("words"), " ")))
      .select(col("id").as("doc_id"), col("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = time("generate corpus")(docs.count())
    println(s"[docs] corpus: $n docs, ~80 words each")

    val plantedExact = n / 40
    val kept = time("exact dedup")(graft.dedup.Dedup.exact(docs).count())
    println(s"[docs] exact dedup: kept $kept of $n " +
      s"(expected ${n - plantedExact}; planted $plantedExact exact dups) " +
      (if (kept == n - plantedExact) "OK" else "MISMATCH"))

    val nearPairs = time("minhash near-dup")(
      graft.dedup.Dedup.minhashNearDupPairs(docs, threshold = 0.8,
        numHashes = 32, bands = 16).count())
    // each 40-block plants a TRIPLE {base, exact copy, near dup} → 3 pairs
    // with jaccard ≥ 0.8 per block
    println(s"[docs] minhash pairs at j>=0.8: $nearPairs " +
      s"(planted ${3 * (n / 40)}; recall " +
      f"${nearPairs.toDouble / (3 * (n / 40))}%.3f)")

    val contaminated = time("contamination")(
      graft.dedup.Dedup.contamination(docs, col("doc_id") % 1000 === 0, k = 5).count())
    println(s"[docs] contaminated corpus docs (share 5-grams with probe set): $contaminated")

    time("repetition stats")(graft.text.TextFunctions.repetitionStats(docs).count())
    val top = time("vocab top-k")(
      graft.text.TextFunctions.vocabTopK(docs, 10).collect())
    println(s"[docs] top token: ${top.head.getString(0)} ×${top.head.getLong(1)}")

    val simPairs = time("simhash near-dup")(
      graft.dedup.Dedup.simhashNearDupPairs(docs, maxHamming = 3).count())
    println(s"[docs] simhash pairs at hamming<=3: $simPairs")

    // incremental (daily-ingest) shape: a 2.5% "new batch" deduped against the
    // rest WITHOUT re-deduping the corpus; the corpus side contributes only a
    // distinct-fingerprint set. A batch doc survives iff its text is unseen —
    // exact copies of corpus docs (id%40==1 with the base outside the batch)
    // must drop. Here every id%40==1 in the batch has its base in the corpus,
    // so expected survivors = batch − plantedCopiesInBatch − batchInternalDups.
    val batchFilter = col("doc_id") % 40 === 1 // all planted exact copies
    val newBatch = docs.filter(batchFilter)
    val corpus = docs.filter(!batchFilter)
    val survivors = time("incremental exact dedup (2.5% batch vs corpus)")(
      graft.dedup.Dedup.incrementalExactDedup(newBatch, corpus).count())
    println(s"[docs] incremental dedup: ${newBatch.count()} batch docs, " +
      s"$survivors survived (expected 0 — every batch doc is a planted copy) " +
      (if (survivors == 0) "OK" else "MISMATCH"))

    // same batch through the Bloom prefilter: answer must be identical and the
    // corpus anti-join sees only the might-contain slice
    val bloomSurvivors = time("incremental exact dedup via bloom prefilter") {
      graft.dedup.Dedup.incrementalExactDedupBloom(newBatch, corpus).count()
    }
    println(s"[docs] bloom incremental dedup: $bloomSurvivors survived " +
      (if (bloomSurvivors == survivors) "== exact OK" else "MISMATCH vs exact"))

    // materialized LSH index: build ONCE over the 97.5% corpus, probe the 2.5%
    // batch — steady-state probe cost tracks the batch, not the corpus (the
    // one-shot near-dup above re-LSHes everything every run). Every batch doc
    // is a planted exact copy of a corpus doc, so every batch id must match.
    val idxRoot = java.nio.file.Files.createTempDirectory("mh_probe_idx_").toString
    time("MinHashIndex.build (97.5% corpus)") {
      graft.dedup.MinHashIndex.build(corpus, idxRoot, numHashes = 32, bands = 16)
    }
    val nBatch = newBatch.count()
    val probed = time("MinHashIndex.probe (2.5% batch)") {
      graft.dedup.MinHashIndex.probe(spark, idxRoot, newBatch, corpus, threshold = 0.8)
        .select("batch_id").distinct().count()
    }
    println(s"[docs] index probe: $probed of $nBatch batch docs matched " +
      (if (probed == nBatch) "OK" else "MISMATCH"))

    // sequence packing: two-phase distributed prefix sum — verify the tape is
    // gap-free (last offset + tokens == total tokens) and time the layout
    val tape = time("sequence packing (512-tok seqs)") {
      graft.pipeline.Pipeline.packSequences(docs, "doc_id", "text", seqTokens = 512)
        .agg(max(col("start_tok") + col("n_tok")).as("tape_end"),
          sum("n_tok").as("total_tok"), count(lit(1)).as("docs_packed"))
        .collect()(0)
    }
    println(s"[docs] packing: ${tape.getAs[Long]("docs_packed")} docs, " +
      s"${tape.getAs[Long]("total_tok")} tokens → " +
      s"${(tape.getAs[Long]("tape_end") + 511) / 512} sequences; tape " +
      (if (tape.getAs[Long]("tape_end") == tape.getAs[Long]("total_tok")) "gap-free OK"
       else "HAS GAPS"))

    // r5 ops at scale: passage-remove (window-key agg + per-doc reassembly,
    // linear in corpus + dup mass) and winnowing fingerprints (per-doc
    // window-min sketch at ~2/(w+1) density)
    val removed = time("removeDuplicatedPassages (13-token windows)") {
      graft.dedup.Dedup.removeDuplicatedPassages(docs, 13)
        .agg(sum("n_removed").as("rm"), sum("n_kept").as("kp")).collect()(0)
    }
    println(s"[docs] passage-remove: ${removed.getAs[Long]("rm")} tokens removed, " +
      s"${removed.getAs[Long]("kp")} kept")
    val fps = time("winnowingFingerprints (k=5, w=4)") {
      graft.dedup.Dedup.winnowingFingerprints(docs, k = 5, w = 4).count()
    }
    // ~80 words/doc → ~76 k-grams/doc; winnowing density should be ≈ 2/(w+1)
    println(f"[docs] winnowing: $fps fingerprints " +
      f"(density ${fps.toDouble / (n * 76.0)}%.3f of grams; expected ≈ ${2.0 / 5}%.3f)")
    spark.stop()
  }
}
