package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Multimodal columns: image/audio/video as opaque `binary` with typed
  * metadata, plus decode / feature-extract / frame-sample operators.
  *
  * No media libraries exist in this environment, so the DECODE KERNEL is a
  * clearly-marked deterministic stub — but the Spark-side plumbing is the
  * real thing and is what matters at 100 TB:
  *  - binary payloads stay columnar (never stringified);
  *  - decoding runs per-partition via `mapPartitions` (the Scala analog of
  *    `mapInPandas`: one iterator per batch, library handles amortized per
  *    partition, not per row);
  *  - metadata extraction is declarative so Catalyst prunes the blob column
  *    away entirely when only metadata is selected;
  *  - frame sampling is an explode shape — rows out ∝ frames, no driver
  *    materialization.
  *
  * Blobs are derived deterministically from `documents.text` bytes so the
  * whole path is oracle-checkable.
  */
object Multimodal {

  /** The media table: documents re-typed as (doc_id, media_type, blob,
    * n_bytes). This is the schema a real pipeline would read from parquet;
    * here it is derived so the testdata stays driver-provided. */
  def media(s: SparkSession, d: String): DataFrame =
    Tables(s, d, "documents")
      .select(col("doc_id"),
        element_at(typedLit(Seq("image", "audio", "video")),
          (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
        col("text").cast("binary").as("blob"),
        col("n_chars").as("n_bytes"))

  case class Decoded(doc_id: Long, media_type: String, width: Int,
      height: Int, n_px: Long, checksum: Long)

  /** Per-partition decode: the `mapPartitions` shape a real image decoder
    * uses (decoder initialized once per partition, streamed over rows).
    * The pixel decode itself is STUBBED with a deterministic stand-in —
    * in production replace `fakeDecode` with the real library call.
    */
  def decode(s: SparkSession, df: DataFrame): DataFrame = {
    import s.implicits._
    df.select(col("doc_id"), col("media_type"), col("blob"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // real decoder init would happen HERE, once per partition
        it.map { case (id, mt, blob) => fakeDecode(id, mt, blob) }
      }
      .toDF()
  }

  /** STUB: deterministic stand-in for a media decoder. Width/height derive
    * from the payload BYTE length; the checksum sums the payload's decoded
    * Unicode CODE POINTS — the same quantity the DuckDB oracle's per-char
    * `ord()` sums, so parity holds even if the corpus stops being ASCII
    * (a UTF-8 byte sum would silently diverge on the first 'é'). */
  private def fakeDecode(id: Long, mediaType: String,
      blob: Array[Byte]): Decoded = {
    val w = (blob.length % 64) + 16
    val h = (blob.length % 48) + 9
    var sum = 0L
    val text = new String(blob, java.nio.charset.StandardCharsets.UTF_8)
    var k = 0
    while (k < text.length) {
      val cp = text.codePointAt(k)
      sum += cp
      k += Character.charCount(cp)
    }
    Decoded(id, mediaType, w, h, w.toLong * h, sum)
  }

  val queries: Seq[Q] = Seq(

    // ---- metadata over binary payloads (declarative; blob prunable) ------
    Q("q_multimodal_meta",
      (s, d) => media(s, d)
        .groupBy("media_type")
        .agg(count(lit(1)).as("n_assets"),
          sum(length(col("blob")).cast("long")).as("total_bytes"),
          min(col("n_bytes")).as("min_bytes"),
          max(col("n_bytes")).as("max_bytes"),
          countDistinct(md5(col("blob"))).as("n_distinct"))
        .orderBy("media_type"),
      Some("""SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
                          WHEN doc_id % 3 = 1 THEN 'audio'
                          ELSE 'video' END AS media_type,
              COUNT(*) AS n_assets,
              CAST(SUM(strlen(text)) AS BIGINT) AS total_bytes,
              MIN(n_chars) AS min_bytes, MAX(n_chars) AS max_bytes,
              COUNT(DISTINCT md5(text)) AS n_distinct
              FROM documents GROUP BY 1 ORDER BY media_type""")),

    // ---- content-hash dedup with bytes-saved accounting -------------------
    // Exact media dedup — the first pass every multimodal pipeline runs
    // (the same asset re-crawled under many URLs): group by md5 of the
    // BLOB, keep the minimum doc_id per content group, and report per
    // media type what dedup buys: asset/unique counts, duplicate rows
    // dropped, and the bytes a dedup'd store saves (Σ (n−1)·n_bytes per
    // group — every copy in a group is byte-identical, so one size
    // describes them all). Scale shape: the only wide exchange keys on
    // the 16-byte digest (map-side partial agg collapses per-partition
    // copies first); blobs never shuffle — only (hash, n_bytes, count)
    // triples flow, and the final rollup is a bounded-cardinality
    // media_type aggregate.
    Q("q_multimodal_dedup",
      (s, d) => media(s, d)
        .groupBy(col("media_type"), md5(col("blob")).as("h"))
        .agg(count(lit(1)).as("n"), min(col("n_bytes")).as("bytes"),
          min(col("doc_id")).as("keeper"))
        .groupBy("media_type")
        .agg(sum(col("n")).as("n_assets"),
          count(lit(1)).as("n_unique"),
          sum(col("n") - 1).as("n_dup_rows"),
          sum((col("n") - 1) * col("bytes")).as("bytes_saved"),
          min(col("keeper")).as("min_keeper"))
        .orderBy("media_type"),
      Some("""WITH g AS (
                SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
                            WHEN doc_id % 3 = 1 THEN 'audio'
                            ELSE 'video' END AS media_type,
                  md5(text) AS h, COUNT(*) AS n,
                  MIN(n_chars) AS bytes, MIN(doc_id) AS keeper
                FROM documents GROUP BY 1, 2)
              SELECT media_type, CAST(SUM(n) AS BIGINT) AS n_assets,
                COUNT(*) AS n_unique,
                CAST(SUM(n - 1) AS BIGINT) AS n_dup_rows,
                CAST(SUM((n - 1) * bytes) AS BIGINT) AS bytes_saved,
                MIN(keeper) AS min_keeper
              FROM g GROUP BY media_type ORDER BY media_type""")),

    // ---- mapPartitions decode (stubbed kernel, real plumbing) ------------
    Q("q_multimodal_decode",
      (s, d) => decode(s, media(s, d))
        .groupBy("media_type")
        .agg(count(lit(1)).as("n"),
          sum(col("n_px")).as("total_px"),
          sum(col("checksum")).as("sum_checksum"))
        .orderBy("media_type"),
      Some("""WITH dec AS (
                SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
                            WHEN doc_id % 3 = 1 THEN 'audio'
                            ELSE 'video' END AS media_type,
                  ((strlen(text) % 64) + 16) * ((strlen(text) % 48) + 9) AS n_px,
                  list_sum([ord(x) FOR x IN string_split_regex(text, '')
                            IF x <> '']) AS checksum
                FROM documents)
              SELECT media_type, COUNT(*) AS n,
                CAST(SUM(n_px) AS BIGINT) AS total_px,
                CAST(SUM(checksum) AS BIGINT) AS sum_checksum
              FROM dec GROUP BY media_type ORDER BY media_type""")),

    // ---- frame sampling (explode shape) ----------------------------------
    // Every asset yields ceil(n_bytes / 100) "frames" of ≤ 100 bytes; the
    // per-frame fingerprint is md5 of the slice. Rows out ∝ total frames.
    // The slice runs on the RAW BYTES (Substring supports BinaryType) —
    // the prior string-cast slice indexed by CHARACTER, and code-point
    // counting over a blob that is not valid UTF-8 has ill-defined
    // boundaries (Spark's UTF8String preserves the raw bytes but walks
    // them as if UTF-8), so frame offsets/lengths on real binary media
    // would be byte-position-unstable; byte indexing is the well-defined
    // contract a blob store needs (pinned with planted 0-255/NUL/invalid
    // UTF-8 payloads in MultimodalSpec, r18). The DuckDB oracle slices
    // text by CHARACTER (DuckDB cannot slice BLOBs); byte-slice ==
    // char-slice on this ASCII corpus (verified: zero docs with
    // octet_length <> strlen at every sf), so the hashes agree — a
    // future non-ASCII corpus needs a byte-level oracle.
    Q("q_multimodal_frames",
      (s, d) => media(s, d)
        // n_bytes = 0 would make sequence(0, -1) count DOWNWARD ([0, -1]);
        // empty payloads yield zero frames on both engines.
        .filter(col("n_bytes") > 0)
        .withColumn("frame",
          explode(transform(
            sequence(lit(0), ceil(col("n_bytes") / 100).cast("int") - 1),
            i => struct(i.as("frame_no"),
              md5(substring(col("blob"),
                (i * 100 + 1).cast("int"), lit(100))).as("fp")))))
        .groupBy("media_type")
        .agg(count(lit(1)).as("n_frames"),
          countDistinct(col("frame.fp")).as("n_distinct_frames"))
        .orderBy("media_type"),
      Some("""WITH f AS (
                SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
                            WHEN doc_id % 3 = 1 THEN 'audio'
                            ELSE 'video' END AS media_type,
                  md5(substr(text, fno * 100 + 1, 100)) AS fp
                FROM documents,
                  LATERAL unnest(generate_series(0,
                    CAST(ceil(n_chars / 100.0) AS INTEGER) - 1)) AS t(fno)
                WHERE n_chars > 0)
              SELECT media_type, COUNT(*) AS n_frames,
                COUNT(DISTINCT fp) AS n_distinct_frames
              FROM f GROUP BY media_type ORDER BY media_type""")),

    // ---- fixed-size audio chunking (the ASR-pipeline front door) ----------
    // Speech pipelines feed models fixed-duration windows; for byte-PCM
    // that is fixed-size byte ranges. Chunk boundaries derive from the
    // payload LENGTH only — integer arithmetic, no decode — so the blob
    // column prunes away entirely and the explode emits (asset × chunks)
    // narrow rows; the downstream decoder then reads ONLY the ranges it
    // was assigned (the substring/offset pattern object stores serve
    // natively). Exact integer ceil-division, half-open ranges, last
    // chunk short.
    Q("q_multimodal_chunks",
      (s, d) => media(s, d)
        .filter(col("media_type") === "audio" && col("n_bytes") > 0)
        .withColumn("chunk_idx",
          explode(sequence(lit(0L),
            expr("CAST((n_bytes + 255) DIV 256 AS LONG)") - 1)))
        .select(col("doc_id"), col("chunk_idx"),
          (col("chunk_idx") * 256L).as("offset"),
          least(lit(256L), col("n_bytes") - col("chunk_idx") * 256L)
            .as("chunk_len"))
        .orderBy("doc_id", "chunk_idx"),
      Some("""SELECT doc_id, CAST(fno AS BIGINT) AS chunk_idx,
                CAST(fno * 256 AS BIGINT) AS offset,
                CAST(LEAST(256, n_chars - fno * 256) AS BIGINT) AS chunk_len
              FROM documents,
                LATERAL unnest(generate_series(0,
                  CAST(ceil(n_chars / 256.0) AS INTEGER) - 1)) AS t(fno)
              WHERE doc_id % 3 = 1 AND n_chars > 0
              ORDER BY doc_id, chunk_idx"""))
  )
}
