package graft

import graft.catalog.{ChunkCatalog, ChunkMeta, ColumnStats}
import java.nio.file.Files

/** Catalog metadata scale probe — pure driver-side, no Spark. At 100 TB the
  * catalog holds 10⁵–10⁶ chunk entries (100 TB / ~100-500 MB chunks), and
  * register / prune / GC become driver work on the metadata store. The
  * reference keeps ONE JSON document CAS-committed per mutation
  * (src/metadata/s3.rs:104-116) — measured here in round 7 at ~780 MB and
  * ~30 s per single-chunk registration at 10⁶ chunks. The sharded layout
  * (hour-range shard files under a manifest, ChunkCatalog.scala) replaces
  * that; this probe measures, at 10⁵ and 10⁶ synthetic chunks:
  *   - cold load (manifest + all shards, parallel parse),
  *   - warm prune via chunksInRange + zone-map predicate filter (the
  *     per-query path — must stay in single-digit ms),
  *   - worst-case batched registration (10⁴–10⁵ chunks spread across the
  *     WHOLE 2-year span — touches every shard),
  *   - flush-shaped registration (50 chunks in one hour — the real ingest
  *     pattern, touches one shard),
  *   - single-chunk registration (one shard + manifest),
  *   - GC of 1 k pending deletes (manifest-only mutation).
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

      // ---- build via batched registration. Each build batch is spread over
      // the WHOLE 2-year span, so it dirties every shard — the worst case for
      // the sharded layout (a real flush lands in one hour). Kept as the
      // upper bound; the flush-shaped cost is measured separately below.
      val batch = math.max(10000, n / 10)
      val batchTimes = (0 until n by batch).map { start =>
        val chunks = (start until math.min(start + batch, n)).map(mkChunk)
        timeMs(cat.registerAll(chunks))._2
      }
      // ---- flush-shaped registration: 50 chunks, one hour, one shard -------
      val flushRegMs = (0 until 5).map { j =>
        val hour = 7000 + j
        val chunks = (0 until 50).map { i =>
          mkChunk(n + 100 + j * 50 + i).copy(
            path = s"s3://warehouse/default/data/flush_${j}_$i",
            minTimestampNs = baseNs + hour * hourNs + i * 1000000L,
            maxTimestampNs = baseNs + hour * hourNs + i * 1000000L + hourNs / 60)
        }
        timeMs(cat.registerAll(chunks))._2
      }
      // ---- single-chunk registration (one shard + manifest rewrite) --------
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

      // ---- gc (manifest-only mutation in the sharded layout) ---------------
      cold.deferDelete((0 until 1000).map(i => s"s3://warehouse/default/data/gcfile_$i"),
        nowMs = 0L, graceMs = 0L)
      val (_, gcMs) = timeMs(cold.gc(nowMs = System.currentTimeMillis()))

      // ---- concurrent writers: the multi-driver maintenance shape ----------
      // 8 independent instances (own caches, shared directory) race
      // flush-shaped registrations into DISTINCT hours. Two legs (r10):
      //  - grouped (default ctor): the 8 instances share this JVM's per-root
      //    GroupCommitter — the realistic fan-in of one ingester node's
      //    flush + maintenance threads, which coalesce into few CAS links;
      //  - nogroup (groupCommit = false): every instance runs the raw
      //    optimistic-CAS loop — separate PROCESSES in all but address
      //    space, the cross-process contention floor.
      // Both prove no acknowledged commit is lost.
      val writers = 8
      val commitsPerWriter = 12
      def concurrentLeg(tag: String, hourBase: Int, grouped: Boolean): Double = {
        val casErrors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
        val start = new java.util.concurrent.CountDownLatch(1)
        val threads = (0 until writers).map { w =>
          val t = new Thread(() => {
            val mine = new ChunkCatalog(dir, cacheTtlMs = 60000L,
              casMaxRetries = 100, groupCommit = grouped)
            start.await()
            try (0 until commitsPerWriter).foreach { j =>
              val hour = hourBase + w * commitsPerWriter + j
              mine.registerAll((0 until 50).map { i =>
                mkChunk(i).copy(
                  path = s"s3://warehouse/default/data/${tag}_${w}_${j}_$i",
                  minTimestampNs = baseNs + hour * hourNs + i * 1000000L,
                  maxTimestampNs = baseNs + hour * hourNs + i * 1000000L + hourNs / 60)
              })
            } catch { case e: Throwable => casErrors.add(e) }
          }, s"catscale-$tag-w$w")
          t.start(); t
        }
        val concT0 = System.nanoTime()
        start.countDown()
        threads.foreach(_.join(600000))
        val concWallMs = (System.nanoTime() - concT0) / 1e6
        require(casErrors.isEmpty, s"concurrent CAS writers failed ($tag): $casErrors")
        val verify = new ChunkCatalog(dir, cacheTtlMs = 60000L)
        val concCount = verify.allChunks.count(_.path.contains(s"/${tag}_"))
        require(concCount == writers * commitsPerWriter * 50,
          s"lost updates ($tag): expected ${writers * commitsPerWriter * 50} chunks, found $concCount")
        writers * commitsPerWriter / (concWallMs / 1000.0)
      }
      val concCommitsPerSecNogroup = concurrentLeg("concraw", 3000, grouped = false)
      val concCommitsPerSec = concurrentLeg("concflush", 1000, grouped = true)

      // total on-disk metadata: manifest + shard files
      val docBytes = {
        val rootStream = Files.list(dir)
        val base =
          try rootStream
            .filter(p => p.getFileName.toString.matches("manifest\\.\\d+\\.json"))
            .mapToLong(p => Files.size(p)).sum
          finally rootStream.close()
        val stream = Files.list(dir.resolve("shards"))
        try base + stream.mapToLong(p => Files.size(p)).sum
        finally stream.close()
      }
      val shardCount = {
        val stream = Files.list(dir.resolve("shards"))
        try stream.count() finally stream.close()
      }
      // spent-version ledger size after ~n/batch + concurrent commits: must
      // stay bounded by SpentVersions floor compaction, not grow per-commit
      val ledgerFiles = {
        val stream = Files.list(dir.resolve(".versions"))
        try stream.count() finally stream.close()
      }
      System.err.println(s"[catscale] n=$n prune p50=${round2(pruneMs(pruneMs.size / 2))} ms " +
        s"p99=${round2(pruneMs((pruneMs.size * 99) / 100))} ms singleReg=${round2(singleRegMs.min)} ms " +
        s"flushReg=${round2(flushRegMs.min)} ms gc1k=${round2(gcMs)} ms shards=$shardCount " +
        s"ledger=$ledgerFiles " +
        s"concWriters=$writers commits/s=${round2(concCommitsPerSec)} " +
        s"(nogroup floor ${round2(concCommitsPerSecNogroup)})")
      s""""n_$n":{"meta_bytes":$docBytes,""" +
        s""""shard_files":$shardCount,""" +
        s""""cold_load_ms":${round2(coldLoadMs)},""" +
        s""""prune_p50_ms":${round2(pruneMs(pruneMs.size / 2))},""" +
        s""""prune_p99_ms":${round2(pruneMs((pruneMs.size * 99) / 100))},""" +
        s""""prune_mean_hits":$meanHits,""" +
        s""""register_fullspan_batch_mean_ms":${round2(batchTimes.sum / batchTimes.size)},""" +
        s""""register_flush50_min_ms":${round2(flushRegMs.min)},""" +
        s""""register_single_min_ms":${round2(singleRegMs.min)},""" +
        s""""gc_1k_ms":${round2(gcMs)},""" +
        s""""spent_ledger_files":$ledgerFiles,""" +
        s""""concurrent_writers":$writers,""" +
        s""""concurrent_commits":${writers * commitsPerWriter},""" +
        s""""concurrent_commits_per_sec":${round2(concCommitsPerSec)},""" +
        s""""concurrent_commits_per_sec_nogroup":${round2(concCommitsPerSecNogroup)},""" +
        s""""concurrent_lost_updates":0}"""
    }

    // Commit-rate REQUIREMENT vs measured (r8 directive #5). Commits are per
    // FLUSH, not per chunk/byte: ChunkWriter.write registers a whole batch in
    // ONE manifest commit, so the required rate is the fleet's flush cadence.
    // At 100 TB/day sustained ingest with 256 MB flush batches (the
    // aggressive end — the soak itself flushes far less often):
    //   (100e12 B / 86400 s) / 256e6 B = 4.52 flush commits/s,
    // plus dual lease-coordinated maintenance (~0.2/s of swap/GC commits)
    // ≈ 4.7/s required. Two measured numbers answer it (r10):
    //  - concurrent_commits_per_sec (GROUPED): same-JVM fan-in coalesced by
    //    the per-root GroupCommitter — the realistic shape, since a node's
    //    flush threads share one process; w writers cost ~1 CAS link per
    //    in-flight window regardless of w.
    //  - concurrent_commits_per_sec_nogroup: the raw optimistic-CAS floor
    //    (8 process-like instances), attempt-cost-bound, independent of
    //    data volume; flush size is the lever there (1 GB batches → 1.2/s).
    val requiredCommitsPerSec = round2(100e12 / 86400.0 / 256e6 + 0.2)
    val json = s"""{"metric":"catalog_scale","span_hours":17520,""" +
      s""""commits_per_sec_required":$requiredCommitsPerSec,""" +
      s""""commits_per_sec_required_basis":"100TB/day @ 256MB flush batches + 0.2/s maintenance; 1 commit per flush regardless of chunk count",""" +
      sections.mkString(",") + "}"
    java.nio.file.Files.write(java.nio.file.Paths.get("CATALOG_SCALE.json"),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(json)
  }
}
