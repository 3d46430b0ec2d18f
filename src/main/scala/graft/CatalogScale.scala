package graft

import graft.catalog.{ChunkCatalog, ChunkMeta, ColumnStats}
import java.nio.file.Files

/** Catalog metadata scale probe — pure driver-side, no Spark. At 100 TB the
  * catalog holds 10⁵–10⁶ chunk entries (100 TB / ~100-500 MB chunks), and
  * register / prune / GC become driver work on one JSON document (the
  * reference keeps the same single-document design with an hour-bucket
  * time_index, src/metadata/s3.rs:104-116). This probe measures, at 10⁵ and
  * 10⁶ synthetic chunks:
  *   - cold load (parse the full document),
  *   - warm prune via chunksInRange + zone-map predicate filter (the
  *     per-query path — must stay in single-digit ms),
  *   - batched registration (the ingest path — amortized per flush),
  *   - single-chunk registration (worst case: one full-document rewrite),
  *   - render (serialize the full document).
  * Emits CATALOG_SCALE.json. Chunks are spread over 2 years of hours with
  * ~57 chunks/hour at 10⁶ — the realistic density for hour-bucketed flushes
  * across many shards.
  */
object CatalogScale {

  private def timeMs[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e6)
  }

  private def round2(d: Double): Double = math.round(d * 100.0) / 100.0

  def main(args: Array[String]): Unit = {
    val hourNs = 3600L * 1000000000L
    val baseNs = 1704067200L * 1000000000L
    val spanHours = 17520 // 2 years

    val sections = Seq(100000, 1000000).map { n =>
      val dir = Files.createTempDirectory(s"graft_catscale_${n}_")
      val cat = new ChunkCatalog(dir, cacheTtlMs = 60000L)

      def mkChunk(i: Int): ChunkMeta = {
        val hour = i % spanHours
        val minTs = baseNs + hour * hourNs + (i / spanHours) * 1000000L
        ChunkMeta(
          path = s"s3://warehouse/default/data/chunk_$i",
          minTimestampNs = minTs,
          maxTimestampNs = minTs + hourNs - 1,
          rowCount = 1000000L,
          sizeBytes = 256L << 20,
          level = i % 4,
          schemaDdl = Some("timestamp TIMESTAMP,timestamp_ns BIGINT,metric_name STRING,host STRING,value_f64 DOUBLE"),
          columnStats = Map(
            "metric_name" -> ColumnStats.ofString(s"metric_${i % 50}", s"metric_${i % 50 + 4}"),
            "host" -> ColumnStats.ofString(s"host-${i % 100}", s"host-${i % 100 + 9}")))
      }

      // ---- build via batched registration (the ingest path). Every mutate
      // is a full-document parse+render+rewrite (single-JSON-doc design,
      // faithful to the reference's s3.rs CAS document): the per-batch cost
      // IS the measurement — it grows with the doc, so big deployments must
      // register in flush-sized batches, exactly what ChunkWriter does.
      val batch = math.max(10000, n / 10)
      val batchTimes = (0 until n by batch).map { start =>
        val chunks = (start until math.min(start + batch, n)).map(mkChunk)
        timeMs(cat.registerAll(chunks))._2
      }
      // ---- single-chunk registration (worst case full rewrite) -------------
      val singleRegMs = (0 until 3).map { j =>
        timeMs(cat.register(mkChunk(n + j)))._2
      }

      // ---- cold load -------------------------------------------------------
      val cold = new ChunkCatalog(dir, cacheTtlMs = 60000L)
      val (_, coldLoadMs) = timeMs(cold.state)

      // ---- warm prune (per-query path): 1 h window + zone predicates -------
      val pruneTimes = (0 until 200).map { i =>
        val start = baseNs + (i * 97 % spanHours) * hourNs
        val (hits, ms) = timeMs {
          cold.chunksInRange(start, start + hourNs - 1)
            .filter(_.columnStats.get("metric_name")
              .forall(s => s.minString.exists(_ <= "metric_30") &&
                s.maxString.exists(_ >= "metric_30")))
        }
        (hits.size, ms)
      }
      val pruneMs = pruneTimes.map(_._2).sorted
      val meanHits = pruneTimes.map(_._1).sum / pruneTimes.size

      // ---- render (full-document serialize, the cost inside every mutate) --
      val (_, renderMs) = timeMs(ChunkCatalog.render(cold.state))

      // ---- gc --------------------------------------------------------------
      cold.deferDelete((0 until 1000).map(i => s"s3://warehouse/default/data/chunk_$i"),
        nowMs = 0L, graceMs = 0L)
      val (_, gcMs) = timeMs(cold.gc(nowMs = System.currentTimeMillis()))

      val docBytes = Files.size(dir.resolve("catalog.json"))
      System.err.println(s"[catscale] n=$n prune p50=${round2(pruneMs(pruneMs.size / 2))} ms " +
        s"p99=${round2(pruneMs((pruneMs.size * 99) / 100))} ms singleReg=${round2(singleRegMs.min)} ms")
      s""""n_$n":{"doc_bytes":$docBytes,""" +
        s""""cold_load_ms":${round2(coldLoadMs)},""" +
        s""""prune_p50_ms":${round2(pruneMs(pruneMs.size / 2))},""" +
        s""""prune_p99_ms":${round2(pruneMs((pruneMs.size * 99) / 100))},""" +
        s""""prune_mean_hits":$meanHits,""" +
        s""""register_batch10k_mean_ms":${round2(batchTimes.sum / batchTimes.size)},""" +
        s""""register_single_min_ms":${round2(singleRegMs.min)},""" +
        s""""render_ms":${round2(renderMs)},""" +
        s""""gc_1k_ms":${round2(gcMs)}}"""
    }

    val json = s"""{"metric":"catalog_scale","span_hours":17520,${sections.mkString(",")}}"""
    java.nio.file.Files.write(java.nio.file.Paths.get("CATALOG_SCALE.json"),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(json)
  }
}
