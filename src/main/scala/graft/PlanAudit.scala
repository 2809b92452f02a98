package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Physical-plan audit: dumps `explain("formatted")` for representative
  * queries plus targeted probes (parquet pushdown on uncached reads,
  * broadcast selection, TakeOrderedAndProject fusion, codegen spans).
  * Run: `sbt "runMain graft.PlanAudit"` — findings recorded in PLANS.md.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"

    def section(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      println(s"\n======== $name ========")
      df.explain("formatted")
    }

    // Pushdown on a DIRECT parquet read (the 100 TB path — Tables
    // caching is a bench-scale choice; production scans must push).
    section("direct_scan_pushdown") {
      spark.read.parquet(s"$d/lineitem.parquet")
        .filter(col("l_shipdate") >= lit("2000-01-01").cast("timestamp"))
        .select("l_orderkey", "l_linenumber")
    }

    for (name <- Seq("q5_local_supplier", "q3_shipping_priority", "topk_global",
                     "join_broadcast_dim", "sim_pairs_threshold",
                     "dedup_minhash_lsh", "join_asof_last_signup",
                     "stream_session_30m",
                     // round-2 scale machinery
                     "win_ntile", "pack_token_shards", "ann_ivf_topk",
                     "subq_exists_correlated",
                     // round-3 pipeline operators
                     "decontaminate_ngram", "corpus_shuffle_shards",
                     "embedding_quantize", "stream_topk_per_day",
                     // round-4 waves 10-19 flagships
                     "q9_product_profit", "profile_table_stats",
                     "text_tfidf_topk", "ml_kmeans_2iter", "ml_auc_rank",
                     "graph_triangle_count", "embedding_pca_power",
                     "join_scd2_pointintime", "join_skew_salted",
                     // round-11 scale machinery
                     "ml_ks_weekday_weekend", "corpus_length_token_deciles",
                     "events_peak_concurrency_daily", "sample_systematic"))
      section(name)(SparkEntry.queries(name)(spark, d))

    spark.stop()
  }
}
