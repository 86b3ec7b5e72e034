package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-series similarity search over event streams — the
  * behavioral-profile query shape (find keys whose activity over time looks
  * alike: similar users, correlated sensors, near-duplicate traffic
  * patterns), re-expressed Spark-first: the raw stream collapses ONCE to a
  * fixed-length profile vector per key (a keyed aggregate — at 100 TB the
  * only pass over raw events), and the similarity search then runs over the
  * compact profile table with the SAME machinery the embedding operators
  * use ([[Similarity.bruteForceTopK]] exact, [[Similarity]] LSH/IVF when
  * the key space is large). Distance over count profiles is cosine, so
  * scale-invariant — two users with identical rhythm but different volumes
  * match.
  *
  * Determinism: profiles are INTEGER counts densified in bucket order
  * (`transform(sequence(...))` — fixed array order), so the vectors are
  * bit-identical in any engine and the downstream cosine reuses the
  * IEEE-fold contract the similarity family already pins.
  */
object TimeSeries {

  /** Fixed-length activity profile per key: event counts in `buckets`
    * time-of-day bins of width `bucketMs` (defaults: 24 hourly bins — the
    * daily rhythm profile; `(ts div bucketMs) % buckets` folds all days
    * onto one cycle). One `(key, bucket)` count aggregate over the raw
    * events, then a per-key densify into bucket order — the second
    * aggregate's input is at most `buckets` rows per key. Keys with no
    * events simply have no profile (never a zero vector, so cosine is
    * always defined). */
  def activityProfiles(df: DataFrame, keyCol: String, tsMsCol: String,
                       buckets: Int = 24, bucketMs: Long = 3600000L): DataFrame = {
    require(buckets >= 1 && bucketMs >= 1)
    // `div`, not `/`: Column./ is DOUBLE division, and trunc-of-rounded can
    // land one bucket off exact integer floor-division at ms magnitudes.
    // pmod, not `%`: a pre-epoch (negative) timestamp under `%` lands in a
    // negative bucket that the densify step silently drops — the event
    // would vanish from the profile; floor-mod folds it onto the cycle
    // like any other instant. (`div` truncates toward zero rather than
    // flooring for negatives — one-bucket phase shift at worst within the
    // pre-1970 era, acceptable for a rhythm profile; the invariant that
    // matters is no dropped events, which pmod restores.)
    val counts = df
      .groupBy(col(keyCol),
        pmod(expr(s"CAST($tsMsCol AS BIGINT) div $bucketMs"), lit(buckets))
          .cast("int").as("_b"))
      .agg(count(lit(1)).as("_n"))
    counts
      .groupBy(col(keyCol))
      .agg(map_from_entries(collect_list(struct(col("_b"), col("_n")))).as("_m"))
      .select(col(keyCol),
        transform(sequence(lit(0), lit(buckets - 1)),
          h => coalesce(element_at(col("_m"), h.cast("int")), lit(0L)).cast("double"))
          .as("profile"))
  }

  /** Top-k most-similar keys per query key, by cosine over activity
    * profiles — [[activityProfiles]] + [[Similarity.bruteForceTopK]]
    * (broadcast queries, corpus streams once; swap in the LSH/IVF search
    * for large key spaces — profiles are ordinary vectors). */
  def topKSimilar(profiles: DataFrame, queries: DataFrame, keyCol: String,
                  k: Int): DataFrame =
    Similarity.bruteForceTopK(profiles, queries, keyCol, "profile", k)
}
