package graft

import java.nio.file.Files

import graft.sources.IndexStore
import org.scalatest.funsuite.AnyFunSuite

/** The ingest→serve contract (VERDICT r14 #2): every gated query that
  * consumes a persisted index must return byte-identical results
  * whether the index was BUILT in this session or LOADED from a saved
  * store. The loaded session is a `newSession()` over the same
  * context, giving the memo caches a fresh keyspace — the single-JVM
  * stand-in for "a different job reads the ingest artifact".
  */
class IndexStoreSpec extends AnyFunSuite {
  import SparkTestSession._

  // queries whose serving tables live in the store catalog: descent
  // adjacency (ann_descent_topk), HNSW adjacency (ann_hnsw_topk),
  // LSH signature/band tables (dedup_minhash_lsh), k-truss
  // witness/support (q_ktruss)
  private val servedQueries =
    Seq("ann_descent_topk", "ann_hnsw_topk", "dedup_minhash_lsh", "q_ktruss")

  test("gated queries served from a LOADED store equal the built ones") {
    val store = Files.createTempDirectory("graft-index-store").toString
    // 1. build-side session: run the queries (warming the pinned memo
    //    tables), then persist the full catalog
    val built = servedQueries.map { q =>
      q -> SparkEntry.queries(q)(spark, sf).collect().map(_.toString).toSeq
    }.toMap
    val entries = IndexStore.save(spark, sf, store)
    assert(entries.map(_._1).toSet.size == entries.size, "duplicate index names")
    assert(entries.forall(_._2 > 0), s"empty index in store: $entries")

    // 2. serve-side session: fresh memo keyspace + store enabled
    val s2 = spark.newSession()
    val prevDir = IndexStore.loadDir
    val hits0 = IndexStore.hits.get()
    IndexStore.loadDir = Some(store)
    try {
      val loaded = servedQueries.map { q =>
        q -> SparkEntry.queries(q)(s2, sf).collect().map(_.toString).toSeq
      }.toMap
      servedQueries.foreach { q =>
        assert(loaded(q) == built(q), s"$q differs when served from the loaded store")
      }
      // the loads must actually have happened — otherwise this test
      // just re-ran the build path twice
      val hitCount = IndexStore.hits.get() - hits0
      assert(hitCount >= 4,
        s"expected >=4 store hits (descent/hnsw/lsh/ktruss), got $hitCount")
    } finally {
      IndexStore.loadDir = prevDir
    }
  }

  test("lookup degrades to a rebuild on corpus mismatch and schema drift") {
    val store = Files.createTempDirectory("graft-index-store2").toString
    IndexStore.save(spark, sf, store, Seq("ktruss_support"))
    val prevDir = IndexStore.loadDir
    IndexStore.loadDir = Some(store)
    try {
      val s2 = spark.newSession()
      // wrong corpus: the manifest is keyed by (name, corpus) — a
      // store built at one SF must never serve another
      assert(IndexStore.lookup(s2, "/root/testdata/sf0.01", "ktruss_support").isEmpty)
      // unknown name: miss
      assert(IndexStore.lookup(s2, sf, "no_such_index").isEmpty)
      // right key: hit, with the manifest-recorded schema
      val hit = IndexStore.lookup(s2, sf, "ktruss_support")
      assert(hit.isDefined)
      assert(hit.get.schema.fieldNames.toSeq == Seq("a", "b", "support"))
    } finally {
      IndexStore.loadDir = prevDir
    }
  }

  test("a store directory without a manifest is invisible (atomic publish)") {
    val store = Files.createTempDirectory("graft-index-store3").toString
    val prevDir = IndexStore.loadDir
    IndexStore.loadDir = Some(store)
    try {
      // no manifest.jsonl → every lookup misses, nothing throws
      assert(IndexStore.lookup(spark, sf, "ktruss_support").isEmpty)
    } finally {
      IndexStore.loadDir = prevDir
    }
  }
}
