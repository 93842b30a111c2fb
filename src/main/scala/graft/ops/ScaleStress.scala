package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synthetic ×N corpus inflation for scale-stress testing. No fixture
  * beyond sf0.1 exists, so the stress harness inflates a real table
  * executor-side: each input row explodes into N variants inside its own
  * partition — nothing materializes on the driver, and the inflated
  * frame is plain lineage any query plan consumes like a real table.
  * Used by ScaleStressSpec to pin that the dedup/ANN plans keep their
  * shape (banded equi-joins, broadcast ADC, no nested-loop fallback) and
  * that shuffle volume scales linearly when the corpus grows 10×.
  */
object ScaleStress {

  /** documents ×n: variant 0 is the original; variants 1..n−1 append
    * deterministic rep-specific noise tokens, so each group of n stays a
    * tight near-dup cluster without collapsing to exact dups (the
    * adversarial shape for MinHash/SimHash banding: every band bucket
    * fills with the variant groups). doc_id' = doc_id·n + rep keeps ids
    * unique and provenance recoverable (original = doc_id' div n).
    */
  def inflateDocs(docs: DataFrame, n: Int): DataFrame =
    docs
      .select(col("*"), explode(sequence(lit(0), lit(n - 1))).as("rep"))
      .select(
        (col("doc_id") * n + col("rep")).as("doc_id"),
        when(col("rep") === 0, col("text"))
          .otherwise(concat(col("text"), lit(" zq"), col("rep"),
            lit("q"), pmod(col("doc_id"), lit(89)))).as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")))

  /** events ×n: event_id' = event_id·n + rep; variants keep their
    * window (same ts) and group (same event_type) but perturb `value`
    * by a deterministic per-rep cent so the per-group value sets GROW
    * with n — the adversarial shape for distinct-bounded sketches
    * (forces the compaction path, not just bigger exact heads).
    */
  def inflateEvents(events: DataFrame, n: Int): DataFrame =
    events
      .select(col("*"), explode(sequence(lit(0), lit(n - 1))).as("rep"))
      .select(
        (col("event_id") * n + col("rep")).as("event_id"),
        col("ts"), col("user_id"), col("event_type"),
        (col("value") + col("rep").cast("double") * lit(0.0001) *
          pmod(col("event_id"), lit(997)).cast("double")).as("value"),
        col("props"))

  /** embeddings ×n: vec_id' = vec_id·n + rep; variants 1.. get a small
    * deterministic per-rep offset on every dimension — distinct vectors,
    * same neighborhood structure.
    */
  def inflateEmbeddings(emb: DataFrame, n: Int): DataFrame =
    emb
      .select(col("*"), explode(sequence(lit(0), lit(n - 1))).as("rep"))
      .select(
        (col("vec_id") * n + col("rep")).as("vec_id"),
        transform(col("embedding"),
          x => (x + col("rep").cast("float") * lit(0.0013f)).cast("float"))
          .as("embedding"),
        col("label"))
}
