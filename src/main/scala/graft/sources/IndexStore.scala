package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import scala.collection.concurrent.TrieMap
import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Persist-and-load for the pinned serving indexes (VERDICT r14 #2).
  *
  * The memoized cross-query index tables — the NN-descent / HNSW
  * denormalized adjacency, the MinHash signature + LSH band tables,
  * the k-truss witness/support tables — are described throughout
  * SCALING.md as "the persisted index a real pipeline maintains at
  * ingest", but until now they existed only as per-session pinned
  * localCheckpoints: every new JVM paid the full build. This closes
  * the ingest→serve loop: [[save]] writes each table as parquet under
  * one store directory with a manifest, and the memo functions consult
  * [[lookup]] BEFORE building, so a session pointed at a store
  * (`SPARK_GRAFT_INDEX_DIR`, or [[loadDir]] programmatically) serves
  * every downstream query from the loaded artifact. Correctness
  * contract: every index build is deterministic (the family's gate
  * discipline), so loaded ≡ rebuilt content-exactly and the gated
  * queries hash-identically either way — pinned by IndexStoreSpec and
  * demonstrated end-to-end by running the DuckDB gate with the env var
  * set.
  *
  * At 100 TB this is the real shape: indexes are built once at ingest
  * on the cluster, written to object storage as parquet, and every
  * serving/analysis job reads them instead of rebuilding — the store
  * is laid out exactly that way (one parquet directory per index, a
  * manifest keyed by (index name, corpus) for audit and staleness
  * checks). Locally the same artifact spares each new JVM the build
  * cost (build-once/load-many timings in SCALING.md).
  *
  * Manifest: `manifest.jsonl`, one JSON object per line —
  * `{"name":..., "corpus":..., "rows":N, "schema":"<ddl>"}` — written
  * LAST so a partially-written store has no manifest and every lookup
  * misses (no torn reads). The recorded schema is the parquet
  * READ-BACK schema (not the in-memory one) so the load-time equality
  * check compares like with like; a mismatch (stale store after a
  * schema change) logs and falls back to the build path rather than
  * serving wrong shapes.
  */
object IndexStore {

  /** Store directory consulted by [[lookup]]; None disables loading.
    * Settable programmatically (tests restore it in finally); defaults
    * from the environment so the driver's Verify/Bench runs can be
    * pointed at a store without code changes.
    */
  @volatile var loadDir: Option[String] = sys.env.get("SPARK_GRAFT_INDEX_DIR")

  /** Observability for specs and audits: how many memo builds were
    * served from a store vs built live this JVM.
    */
  val hits = new java.util.concurrent.atomic.AtomicInteger(0)
  val misses = new java.util.concurrent.atomic.AtomicInteger(0)

  private final case class Entry(name: String, corpus: String, rows: Long, schema: String)

  /** The persistable index catalog: name → memo-backed builder. The
    * names embed the build parameters exactly as the memo-cache keys
    * do (the r11-ADVICE memo-key rule), so a store can never serve an
    * index built with different m/probe/rounds than the requester's.
    */
  private[graft] def catalog: Seq[(String, (SparkSession, String) => DataFrame)] = {
    import graft.similarity.Similarity
    Seq(
      "dedup_minhash_sig" -> ((s, d) => graft.dedup.Dedup.memoSig(s, d)),
      "dedup_lsh_bands" -> ((s, d) => graft.dedup.Dedup.memoBands(s, d)),
      s"nn_graph_m${Similarity.HnswM}_p${Similarity.HnswBuildProbe}" ->
        ((s, d) => Similarity.nnGraph(s, d)),
      s"nn_descent_m${Similarity.NndM}_r${Similarity.NndRounds}" ->
        ((s, d) => Similarity.nnDescentGraph(s, d)),
      "descent_serve" -> ((s, d) => Similarity.descentServeGraph(s, d)),
      "ktruss_witnesses" -> ((s, d) => graft.operators.Graph.memoWitnesses(s, d)),
      "ktruss_support" -> ((s, d) => graft.operators.Graph.memoSupport(s, d)))
  }

  /** Build (or reuse the session's pinned copy of) each catalog index
    * over `corpusDir` and write it under `storeDir`. Returns
    * (name, rows, seconds) per index. Manifest written last.
    */
  def save(s: SparkSession, corpusDir: String, storeDir: String,
      names: Seq[String] = Nil): Seq[(String, Long, Double)] = {
    val wanted = if (names.isEmpty) catalog else catalog.filter(c => names.contains(c._1))
    require(wanted.nonEmpty, s"no catalog index matches $names")
    Files.createDirectories(Paths.get(storeDir))
    val entries = wanted.map { case (name, build) =>
      val t0 = System.nanoTime()
      val path = s"$storeDir/$name"
      build(s, corpusDir).write.mode("overwrite").parquet(path)
      // record the READ-BACK schema + count so load-time validation
      // compares parquet-vs-parquet, not parquet-vs-checkpoint
      val back = s.read.parquet(path)
      val rows = back.count()
      (Entry(name, corpusDir, rows, back.schema.toDDL),
        (System.nanoTime() - t0) / 1e9)
    }
    val jsonl = entries.map { case (e, _) =>
      s"""{"name":"${e.name}","corpus":"${e.corpus}","rows":${e.rows},"schema":"${e.schema}"}"""
    }.mkString("", "\n", "\n")
    // write-then-move so a concurrent reader never sees a torn manifest
    val tmp = Paths.get(storeDir, ".manifest.jsonl.tmp")
    Files.write(tmp, jsonl.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, Paths.get(storeDir, "manifest.jsonl"),
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
    manifestCache.remove(storeDir) // a re-save must be visible to this JVM
    entries.map { case (e, sec) => (e.name, e.rows, sec) }
  }

  private val manifestCache = TrieMap.empty[String, Map[(String, String), Entry]]

  // the manifest writer above emits no escapes (names/paths/DDL carry
  // no quotes or backslashes), so field extraction is a fixed regex
  private val lineRe =
    """\{"name":"([^"]*)","corpus":"([^"]*)","rows":(\d+),"schema":"([^"]*)"\}""".r

  private def manifest(dir: String): Map[(String, String), Entry] =
    manifestCache.getOrElseUpdate(dir, {
      val p = Paths.get(dir, "manifest.jsonl")
      if (!Files.exists(p)) Map.empty
      else new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
        .linesIterator.flatMap {
          case lineRe(n, c, r, sch) => Some((n, c) -> Entry(n, c, r.toLong, sch))
          case bad if bad.trim.nonEmpty =>
            System.err.println(s"IndexStore: skipping malformed manifest line: ${bad.take(160)}")
            None
          case _ => None
        }.toMap
    })

  /** Serve index `name` for `corpus` from the configured store, if the
    * store has it and its recorded schema matches the parquet on disk.
    * None → the caller builds live (every failure mode degrades to a
    * rebuild, never to serving a mismatched table).
    */
  def lookup(s: SparkSession, corpus: String, name: String): Option[DataFrame] = {
    val served = loadDir.flatMap { dir =>
      manifest(dir).get((name, corpus)).flatMap { e =>
        Try {
          val df = s.read.parquet(s"$dir/$name")
          require(df.schema.toDDL == e.schema,
            s"schema drift: store=${e.schema} vs disk=${df.schema.toDDL}")
          df
        } match {
          case Success(df) => Some(df)
          case Failure(ex) =>
            System.err.println(s"IndexStore: load of $name failed, rebuilding: ${ex.getMessage}")
            None
        }
      }
    }
    if (served.isDefined) hits.incrementAndGet() else misses.incrementAndGet()
    served
  }
}
