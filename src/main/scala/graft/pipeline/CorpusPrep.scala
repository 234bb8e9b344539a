package graft.pipeline

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{QualityGate, TextKernels}

/** End-to-end training-corpus preparation — the composition a user of
  * this engine actually runs, built from the oracle-checked pieces:
  *
  *   quality gate (observed, single pass)
  *     → exact dedup (keep lowest doc_id per content hash)
  *     → deterministic train/val/test split (md5 bucket)
  *     → decontamination (drop TRAIN docs sharing any 32-char gram
  *       with a TEST doc — evaluation integrity beats corpus size)
  *     → sequence packing of the train split (sharded next-fit)
  *
  * Every stage is a declarative plan: the whole prepare() composes
  * into ONE Spark job graph per output, with shuffles only where the
  * algorithm requires them (dedup groupBy, decontamination semi join,
  * packing's per-shard window). Determinism: every decision is a pure
  * function of document content/id, so reruns — at any partitioning,
  * any cluster size — produce identical corpora (the property that
  * makes 100 TB pipeline runs diffable and resumable).
  */
object CorpusPrep {

  final case class Prepared(
      train: DataFrame,   // doc_id, text, n_tok, pack_id
      valid: DataFrame,   // doc_id, text
      test: DataFrame,    // doc_id, text
      metrics: Observation)

  private def bucket(c: org.apache.spark.sql.Column) =
    TextKernels.mdBucket(c, 100)

  def prepare(spark: SparkSession, docs: DataFrame,
      minTokens: Int = 20, packBudget: Long = 2048L,
      shards: Int = 16): Prepared = {

    // 1. quality gate (metrics via observe — no second scan)
    val gated = QualityGate.filterDocuments(docs, minTokens)

    // 2. exact dedup: canonical copy = lowest doc_id per content hash
    val w = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
    val deduped = gated.df
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")

    // 3. split
    // PERSISTED (round 21 — guide §1.2/§5): the gate→dedup→split
    // subtree feeds THREE branches of the one output plan (the test
    // grams, the train grams, and the anti-joined train split
    // itself), and as a lazy plan each branch re-ran the full scan
    // plus the dedup window's corpus-wide shuffle — the pipeline's
    // most expensive stage, paid 3×. One tracked cache fill (eager:
    // the branches' stages run concurrently and would race the
    // unfilled cache — the measured round-12 rule) makes it one
    // pass; harnesses release it with the query's other
    // intermediates via PersistRegistry.
    val withSplit = graft.PersistRegistry.cached(
      deduped.withColumn("split",
        when(bucket(col("doc_id")) < 80, "train")
          .when(bucket(col("doc_id")) < 90, "val").otherwise("test")))

    // 4. decontamination: 32-char grams at stride 16 (any shared run
    // >= 47 chars produces an aligned-equal gram); LEFT ANTI join
    // drops contaminated TRAIN docs, never the pair space
    def grams(df: DataFrame) = df
      .filter(length(col("text")) >= 32)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0), length(col("text")) - 32, lit(16))).as("gs"))
      .select(col("doc_id"), col("text").substr(col("gs") + 1, lit(32)).as("g"))
    val testGrams = grams(withSplit.filter(col("split") === "test"))
      .select("g").distinct()
    val contaminated = grams(withSplit.filter(col("split") === "train"))
      .join(testGrams, Seq("g"), "left_semi")
      .select("doc_id").distinct()
    val trainClean = withSplit.filter(col("split") === "train")
      .join(contaminated, Seq("doc_id"), "left_anti")

    // 5. pack the train split: next-fit within md5-shards (packing is
    // sequential; sharding is what parallelizes it)
    val shard = TextKernels.mdBucket(col("doc_id"), shards)
    val pw = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val train = trainClean
      .withColumn("n_tok", size(split(trim(col("text")), "\\s+")).cast("bigint"))
      .withColumn("shard", shard)
      .withColumn("__cum", sum(col("n_tok")).over(pw))
      // 1e12 packs of per-shard headroom (1e6 would collide at corpus
      // scale — ~6e8 packs per shard at 100 TB)
      .withColumn("pack_id", col("shard") * 1000000000000L +
        floor((col("__cum") - col("n_tok")) / packBudget.toDouble).cast("bigint"))
      .select("doc_id", "text", "n_tok", "pack_id")

    Prepared(
      train,
      withSplit.filter(col("split") === "val").select("doc_id", "text"),
      withSplit.filter(col("split") === "test").select("doc_id", "text"),
      gated.observation)
  }

  /** Streaming form of the pipeline's front half — quality gate +
    * exact content dedup — for continuous ingestion: the gate is
    * stateless (same single-pass expressions), dedup keeps the first
    * arrival per content hash via dropDuplicates state. The split /
    * decontamination / packing stages are inherently global and stay
    * batch (run them on the accumulated deduped store); at production
    * rates bound the dedup state with
    * `.withWatermark(...)` + dropDuplicatesWithinWatermark on an
    * event-time column, trading cross-window dedup for bounded state.
    */
  def gateAndDedupStream(docs: DataFrame, minTokens: Int = 20): DataFrame =
    QualityGate.filterStream(docs, minTokens)
      .withColumn("__h", md5(col("text")))
      .dropDuplicates("__h")
      .drop("__h")

  /** Order-independent corpus checksum: sum of the docs' md5-derived
    * 60-bit ids mod 2^61 — identical for any partitioning/ordering of
    * the same document set, different for any insertion/removal. */
  private def checksum(df: DataFrame): Long = {
    val M = 2305843009213693951L // 2^61 - 1
    val h = TextKernels.mdHash60(col("doc_id"))
    // sum in decimal(38,0): Long sums of 2^61-sized terms overflow
    df.agg((sum((h % M).cast("decimal(38,0)")) % M).cast("long"))
      .head.getLong(0)
  }

  /** Persist the prepared corpus as partitioned parquet plus a
    * manifest of row counts and content checksums — the artifact that
    * makes two pipeline runs comparable without reading the data:
    * deterministic prep + order-independent checksums means reruns of
    * the same input produce the SAME manifest on any cluster. */
  def save(prepared: Prepared, dir: String): Map[String, Long] = {
    prepared.train.write.mode("overwrite").parquet(s"$dir/train")
    prepared.valid.write.mode("overwrite").parquet(s"$dir/val")
    prepared.test.write.mode("overwrite").parquet(s"$dir/test")
    val manifest = Map(
      "train_rows" -> prepared.train.count(),
      "val_rows" -> prepared.valid.count(),
      "test_rows" -> prepared.test.count(),
      "train_checksum" -> checksum(prepared.train),
      "val_checksum" -> checksum(prepared.valid),
      "test_checksum" -> checksum(prepared.test))
    val json = manifest.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    // scheme-addressed output dirs write the manifest through the
    // Hadoop FS (round-20 review, same split as the warehouse data
    // plane): the splits above already land wherever Spark writes,
    // but a java.nio write of the manifest threw on a store-scheme'd
    // dir — failing the prep on exactly the deployment target, after
    // the data was written. Bare local paths keep the nio write.
    if (dir.matches("^[A-Za-z][A-Za-z0-9+.\\-]*:/.*")) {
      val p = new org.apache.hadoop.fs.Path(s"$dir/manifest.json")
      val fs = p.getFileSystem(prepared.train.sparkSession
        .sessionState.newHadoopConf())
      val out = fs.create(p, true)
      try out.write(json.getBytes("UTF-8")) finally out.close()
    } else
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/manifest.json"),
        json.getBytes("UTF-8"))
    manifest
  }
}
