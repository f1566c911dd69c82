package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{QueryModule, Tables}

/** Multimodal column plumbing: opaque `binary` payloads with typed
  * metadata, partition-wise decode/feature-extraction.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic STUB (`fakeDecode`); everything around it —
  * binary column, metadata struct, mapPartitions batch shape, schema — is
  * the real pipeline a 100 TB media table would use (payloads never leave
  * executors, decode runs once per partition iterator, feature vectors are
  * fixed-width arrays).
  */
object Multimodal extends QueryModule {

  // Raw scan: the stub decode/meta passes are cheap per row — the
  // small-file fan-out shuffle costs more than it saves.
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.raw(s, dir, name)

  /** STUB decoder: stands in for an image/audio decode. Deterministic
    * function of the payload bytes only. Feature sums are INTEGER-valued
    * (raw byte sums, exact in Float up to 2^24) so the result is
    * bit-reproducible by any engine — the /255 normalization happens once,
    * in double, at projection time. */
  private[operators] def fakeDecode(payload: Array[Byte]): (Int, Int, Array[Float]) = {
    val w = 64 + (payload.length % 640)
    val h = 64 + ((payload.length * 7) % 480)
    // "feature vector": byte-histogram-ish 8-dim summary, deterministic.
    val feat = new Array[Float](8)
    var i = 0
    while (i < payload.length) { feat(i % 8) += (payload(i) & 0xff); i += 1 }
    (w, h, feat)
  }

  private val decodedSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("feat", ArrayType(FloatType))))

  /** STUB "luma plane" for the perceptual hash: 60 stripe sums (bytes at
    * payload positions ≡ k mod 60) + the total — stands in for the
    * downsampled grayscale grid an image aHash averages. Integer-exact,
    * deterministic, bit-replicable by any engine that can index bytes. */
  private[operators] def fakeStripes(payload: Array[Byte]): (Array[Long], Long) = {
    val s = new Array[Long](60)
    var tot = 0L
    var i = 0
    while (i < payload.length) {
      val v = payload(i) & 0xff
      s(i % 60) += v; tot += v; i += 1
    }
    (s, tot)
  }

  private val stripesSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("stripes", ArrayType(LongType)),
    StructField("total", LongType)))

  /** STUB audio decoder: payload bytes as 8-bit PCM, 16 samples/frame,
    * per-frame energy Σ(v−128)² — integer-exact and deterministic, so
    * the frame profile is bit-replicable from the text bytes by any
    * engine (the tail frame is partial, same on both sides). */
  private[operators] def fakeFrameEnergies(payload: Array[Byte]): Array[Long] = {
    val n = (payload.length + 15) / 16
    val e = new Array[Long](n)
    var i = 0
    while (i < payload.length) {
      val d = (payload(i) & 0xff) - 128
      e(i / 16) += d.toLong * d
      i += 1
    }
    e
  }

  private val audioSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("energies", ArrayType(LongType))))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Binary payload + metadata struct, metadata-only projection (at scale:
    // reads ONLY the metadata columns — payload never deserialized).
    "q_mm_meta" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          encode(col("text"), "UTF-8").as("payload"),
          struct(col("lang"), col("source"), col("n_chars")).as("meta"))
        .select(
          col("doc_id"),
          length(col("payload")).as("payload_bytes"),
          col("meta.lang").as("lang"),
          (length(col("payload")) % 640).as("fake_width"))
        .orderBy("doc_id")
    }),

    // Frame sampling: each payload fans out to its frames (1→N media
    // expansion — the video/audio shape). Frame count and the stub
    // per-frame feature are deterministic functions of payload bytes, so
    // the full pipeline (binary → frames → features) is oracle-checkable.
    "q_mm_frames" -> ((s, dir) => {
      val plen = length(encode(col("text"), "UTF-8"))
      t(s, dir, "documents")
        .select(col("doc_id"), plen.as("payload_bytes"))
        .select(col("doc_id"), col("payload_bytes"),
          posexplode(sequence(lit(0), col("payload_bytes") % 8)).as(Seq("pos", "frame_id")))
        .select(col("doc_id"), col("frame_id"),
          ((col("payload_bytes") * 7 + col("frame_id") * 13) % 255).as("feat"))
        .orderBy("doc_id", "frame_id")
    }),

    // Resize planning: target dims for a max-256 aspect-preserving resize
    // of each (stub-decoded) image, plus the scale factor — the metadata
    // half of a resize kernel (the pixel work itself is the stubbed decode
    // path; dims and scale are what the pipeline partitions/bills by).
    "q_mm_resize" -> ((s, dir) => {
      val plen = length(encode(col("text"), "UTF-8"))
      val w = lit(64) + plen % 640
      val h = lit(64) + (plen * 7) % 480
      val maxSide = greatest(w, h).cast("double")
      val scale = when(maxSide <= 256.0, lit(1.0)).otherwise(lit(256.0) / maxSide)
      t(s, dir, "documents").select(
        col("doc_id"), w.as("width"), h.as("height"),
        round(scale, 6).as("scale"),
        floor(w.cast("double") * scale).cast("int").as("out_w"),
        floor(h.cast("double") * scale).cast("int").as("out_h"))
        .orderBy("doc_id")
    }),

    // Cross-modal star join: text metadata (documents) ⋈ vectors
    // (embeddings) on the shared id, rolled up per embedding label — the
    // "join the caption table to the image-embedding table" shape every
    // multimodal corpus query starts from. Per-label means are exact fixed
    // point (quality is the TextOps 4-decimal score ×1e4, the embedding's
    // first component ×1e4) so the rollup is engine-stable. Equi join on
    // the id — at 100 TB both sides bucket on it and the join is
    // exchange-free.
    "q_mm_crossmodal" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("lang"),
        floor(TextOps.qualityC * 10000 + 0.5).cast("long").as("q4"))
      // try_element_at, not element_at: under Spark 4's ANSI default a
      // short/empty vector would throw INVALID_ARRAY_INDEX while the
      // oracle's embedding[1] yields NULL and skips the row — degrade to
      // NULL on both sides instead of diverging on a malformed fixture.
      val vecs = t(s, dir, "embeddings").select(col("vec_id").as("doc_id"),
        col("label"),
        floor(try_element_at(col("embedding"), lit(1)).cast("double") * 10000 + 0.5)
          .cast("long").as("e0_4"))
      docs.join(vecs, Seq("doc_id"))
        .groupBy("label")
        .agg(count(lit(1)).as("n_docs"), countDistinct("lang").as("n_langs"),
          expr("sum(q4) div count(1)").as("avg_quality_e4"),
          sum("e0_4").as("sum_e0_e4"))
        .orderBy("label")
    }),

    // Perceptual-hash near-dup over binary payloads — the image-dedup
    // operator (aHash family): stub-decode each payload to 60 stripe sums
    // (the "luma grid"), bit_k = stripe_k above the mean → a 60-bit
    // signature; candidates come ONLY from 4×15-bit band-bucket collisions
    // (the same LSH shape as MinHash/ANN — linear in docs, never
    // all-pairs), then exact Hamming ≤ 8 verifies. Everything is integer
    // arithmetic (stripe*60 > total avoids the mean division), so the
    // DuckDB oracle replicates the full pipeline bit-for-bit.
    "q_mm_phash" -> ((s, dir) => {
      // length > 0 guard on BOTH sides: an empty/NULL payload has no
      // stripes — the oracle's range() unnest drops such docs implicitly,
      // so the Spark side must too (an all-zero signature would otherwise
      // bucket every empty doc together at hamming 0).
      val src = t(s, dir, "documents")
        .filter(length(col("text")) > 0)
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(stripesSchema)
      val stripes = src.mapPartitions { rows =>
        rows.map { r =>
          val (st, tot) = fakeStripes(r.getAs[Array[Byte]]("payload"))
          Row(r.getLong(0), st.toSeq, tot)
        }
      }(enc)
      val phashExpr = (0 until 60).map(k =>
        when(element_at(col("stripes"), k + 1) * 60 > col("total"), lit(1L << k))
          .otherwise(0L)).reduce(_ + _)
      val ph = stripes.select(col("doc_id"), phashExpr.as("phash"))
      val bands = ph.select(col("doc_id"), col("phash"),
        explode(array((0 until 4).map(j => struct(lit(j).as("j"),
          shiftright(col("phash"), 15 * j).bitwiseAND(32767).as("bv"))): _*)).as("b"))
        .select(col("doc_id"), col("phash"), col("b.j").as("j"), col("b.bv").as("bv"))
        .localCheckpoint(true) // feeds both sides of the bucket self-join
      bands.as("x").join(bands.as("y"),
          col("x.j") === col("y.j") && col("x.bv") === col("y.bv") &&
          col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("da"), col("y.doc_id").as("db"),
          col("x.phash").as("pa"), col("y.phash").as("pb"))
        .distinct()
        .withColumn("hamming", expr("CAST(bit_count(pa ^ pb) AS INT)"))
        .filter(col("hamming") <= 8)
        .select("da", "db", "hamming")
        .orderBy("da", "db")
    }),

    // Partition-wise decode: binary → (width, height, feature vector).
    // The stub's byte arithmetic is exactly replicated by the DuckDB oracle
    // (documents.text is ASCII, so char positions == byte positions);
    // determinism additionally pinned in PipelineSpec.
    "q_mm_decode" -> ((s, dir) => {
      val src = t(s, dir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(decodedSchema)
      src.mapPartitions { rows =>
        rows.map { r =>
          val (w, h, f) = fakeDecode(r.getAs[Array[Byte]]("payload"))
          Row(r.getLong(0), w, h, f.toSeq)
        }
      }(enc)
        .select(col("doc_id"), col("width"), col("height"),
          round(element_at(col("feat"), 1).cast("double") / 255.0, 4).as("f0"))
        .orderBy("doc_id")
    }),

    // Audio frame analysis — the silence-detection/energy-profiling pass a
    // speech pipeline runs before transcription: the payload's bytes stand
    // in for 8-bit PCM samples (STUB, like fakeDecode), 16 samples per
    // frame, per-frame energy Σ(v−128)² in exact integers; per-clip output
    // is the frame count, silent-frame count (energy < 30000 — a real mix
    // on this corpus: ~27% of frames), peak energy, and total energy.
    // Decode runs once per partition iterator (mapPartitions — payloads
    // never leave executors); everything downstream of the stub is the
    // real frame-explode + per-clip aggregate shape.
    "q_mm_audio" -> ((s, dir) => {
      val src = t(s, dir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
        .encoderFor(audioSchema)
      src.mapPartitions { rows =>
        rows.map { r =>
          Row(r.getLong(0),
            fakeFrameEnergies(r.getAs[Array[Byte]]("payload")).toSeq)
        }
      }(enc)
        .select(col("doc_id"), explode(col("energies")).as("e"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_frames"),
          sum(when(col("e") < 30000L, 1L).otherwise(0L)).as("n_silent"),
          max("e").as("peak_energy"), sum("e").as("total_energy"))
        .orderBy("doc_id")
    }),

    // Scene-boundary detection — the shot-segmentation pass a video
    // pipeline runs before per-scene sampling/captioning: the same stub
    // frame-energy track as q_mm_audio (bytes-as-frames, mapPartitions
    // decode), a CUT wherever the energy jumps by > 20000 between
    // adjacent frames (the ~p93 of the fixture's delta distribution — a
    // real mix: multi-scene and single-scene clips both occur), scene
    // ids by running cut sum, per-clip scene stats. Everything after the
    // stub is the real lag-window + gaps-and-islands shape; integers
    // end-to-end, so the oracle replays it bit-for-bit.
    "q_mm_scene" -> ((s, dir) => {
      val src = t(s, dir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
        .encoderFor(audioSchema)
      val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id").orderBy("f")
      val wRun = w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
      src.mapPartitions { rows =>
        rows.map { r =>
          Row(r.getLong(0),
            fakeFrameEnergies(r.getAs[Array[Byte]]("payload")).toSeq)
        }
      }(enc)
        .select(col("doc_id"), posexplode(col("energies")).as(Seq("f", "e")))
        .withColumn("cut",
          when(abs(col("e") - lag("e", 1).over(w)) > 20000L, 1L).otherwise(0L))
        .withColumn("scene", sum("cut").over(wRun))
        .groupBy("doc_id", "scene").agg(count(lit(1)).as("len"))
        .groupBy("doc_id")
        .agg(sum("len").as("n_frames"), count(lit(1)).as("n_scenes"),
          max("len").as("longest_scene"))
        .orderBy("doc_id")
    })
  )

  def oracles: Map[String, String] = Map(
    "q_mm_crossmodal" ->
      s"""SELECT label,
         COUNT(*) AS n_docs,
         COUNT(DISTINCT lang) AS n_langs,
         CAST(CAST(SUM(CAST(FLOOR(q * 10000 + 0.5) AS BIGINT)) AS BIGINT)
           // COUNT(*) AS BIGINT) AS avg_quality_e4,
         CAST(SUM(CAST(FLOOR(CAST(embedding[1] AS DOUBLE) * 10000 + 0.5) AS BIGINT))
           AS BIGINT) AS sum_e0_e4
         FROM (SELECT doc_id, lang, ${TextOps.qualitySql} AS q FROM documents) d
         JOIN embeddings e ON e.vec_id = d.doc_id
         GROUP BY label ORDER BY label""",
    "q_mm_frames" ->
      """SELECT doc_id, CAST(frame_id AS INT) AS frame_id,
         CAST((octet_length(encode(text)) * 7 + frame_id * 13) % 255 AS INT) AS feat
         FROM (SELECT doc_id, text,
                 unnest(range(0, octet_length(encode(text)) % 8 + 1)) AS frame_id
               FROM documents)
         ORDER BY doc_id, frame_id""",
    "q_mm_meta" ->
      """SELECT doc_id,
         CAST(octet_length(encode(text)) AS INT) AS payload_bytes,
         lang,
         CAST(octet_length(encode(text)) % 640 AS INT) AS fake_width
         FROM documents ORDER BY doc_id""",
    "q_mm_resize" ->
      """WITH d AS (SELECT doc_id,
             64 + octet_length(encode(text)) % 640 AS w,
             64 + (octet_length(encode(text)) * 7) % 480 AS h
           FROM documents),
         s AS (SELECT doc_id, w, h,
             CASE WHEN GREATEST(w, h) <= 256 THEN 1.0
                  ELSE 256.0 / GREATEST(w, h) END AS sc
           FROM d)
         SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           ROUND(sc, 6) AS scale,
           CAST(FLOOR(w * sc) AS INT) AS out_w,
           CAST(FLOOR(h * sc) AS INT) AS out_h
         FROM s ORDER BY doc_id""",
    // Byte-exact replica of the full phash pipeline: stripe sums via
    // ascii() on char positions (== byte values — documents.text is
    // ASCII), the same integer mean test, band buckets, and Hamming
    // verify. Stripes with no bytes (docs shorter than 60) contribute bit
    // 0 on both sides: the Spark stub sums them to 0 and 0*60 > total is
    // false, while the SQL group-by simply has no row for that k.
    "q_mm_phash" ->
      """WITH pos AS (SELECT doc_id, text, unnest(range(1, len(text) + 1)) AS p
             FROM documents WHERE len(text) > 0),
         st AS (SELECT doc_id, (p - 1) % 60 AS k,
               SUM(ascii(substr(text, CAST(p AS INT), 1))) AS sk
             FROM pos GROUP BY doc_id, k),
         tot AS (SELECT doc_id, CAST(SUM(sk) AS BIGINT) AS total
             FROM st GROUP BY doc_id),
         ph AS (SELECT st.doc_id,
               CAST(SUM(CASE WHEN sk * 60 > total
                 THEN (1::BIGINT << CAST(k AS INT)) ELSE 0 END) AS BIGINT) AS phash
             FROM st JOIN tot USING (doc_id) GROUP BY st.doc_id),
         bands AS (SELECT doc_id, phash, j, (phash >> (15 * j)) & 32767 AS bv
             FROM ph CROSS JOIN (SELECT unnest(range(0, 4)) AS j)),
         cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db,
               a.phash AS pa, b.phash AS pb
             FROM bands a JOIN bands b
               ON a.j = b.j AND a.bv = b.bv AND a.doc_id < b.doc_id)
         SELECT da, db, CAST(bit_count(xor(pa, pb)) AS INT) AS hamming
         FROM cand WHERE bit_count(xor(pa, pb)) <= 8
         ORDER BY da, db""",
    // Byte-exact replica of fakeDecode: width/height from octet_length,
    // f0 = (sum of bytes at 0-based positions ≡ 0 mod 8) / 255. ascii() on
    // char positions equals byte indexing because documents.text is ASCII.
    "q_mm_decode" ->
      """WITH pos AS (SELECT doc_id, text,
             unnest(range(1, len(text) + 1, 8)) AS p FROM documents),
         f AS (SELECT doc_id,
             SUM(ascii(substr(text, CAST(p AS INT), 1))) AS s0
           FROM pos GROUP BY doc_id)
         SELECT d.doc_id,
           CAST(64 + octet_length(encode(d.text)) % 640 AS INT) AS width,
           CAST(64 + (octet_length(encode(d.text)) * 7) % 480 AS INT) AS height,
           ROUND(COALESCE(f.s0, 0) / 255.0, 4) AS f0
         FROM documents d LEFT JOIN f ON f.doc_id = d.doc_id
         ORDER BY d.doc_id""",
    // Same byte-as-PCM frame arithmetic: ord() of each ASCII char == the
    // payload byte, (p−1)//16 is the frame, energies sum exactly. This
    // spelling is CHARACTER-indexed and equals the Spark side's byte
    // framing only for pure-ASCII text — an assumption PipelineSpec pins
    // loudly (a regenerated non-ASCII fixture fails the pin, not the
    // hash gate).
    "q_mm_audio" ->
      """WITH b AS (SELECT doc_id, (p - 1) // 16 AS f,
             ord(substring(text, p, 1)) AS v
           FROM (SELECT doc_id, text,
                   unnest(range(1, strlen(text) + 1)) AS p FROM documents)),
         fe AS (SELECT doc_id, f,
             CAST(SUM((v - 128) * (v - 128)) AS BIGINT) AS e
           FROM b GROUP BY doc_id, f)
         SELECT doc_id, COUNT(*) AS n_frames,
           CAST(SUM(CASE WHEN e < 30000 THEN 1 ELSE 0 END) AS BIGINT) AS n_silent,
           MAX(e) AS peak_energy, CAST(SUM(e) AS BIGINT) AS total_energy
         FROM fe GROUP BY doc_id ORDER BY doc_id""",
    // Same byte-as-PCM frame energies, same 20000 cut threshold, same
    // running-cut-sum scene ids.
    "q_mm_scene" ->
      """WITH b AS (SELECT doc_id, (p - 1) // 16 AS f,
             ord(substring(text, p, 1)) AS v
           FROM (SELECT doc_id, text,
                   unnest(range(1, strlen(text) + 1)) AS p FROM documents)),
         fe AS (SELECT doc_id, f,
             CAST(SUM((v - 128) * (v - 128)) AS BIGINT) AS e
           FROM b GROUP BY doc_id, f),
         c AS (SELECT doc_id, f,
             CASE WHEN ABS(e - LAG(e) OVER (PARTITION BY doc_id ORDER BY f))
                    > 20000 THEN 1 ELSE 0 END AS cut
           FROM fe),
         sc AS (SELECT doc_id, f, SUM(cut) OVER (PARTITION BY doc_id
                  ORDER BY f ROWS UNBOUNDED PRECEDING) AS scene
           FROM c),
         sl AS (SELECT doc_id, scene, COUNT(*) AS len
           FROM sc GROUP BY doc_id, scene)
         SELECT doc_id, CAST(SUM(len) AS BIGINT) AS n_frames,
           COUNT(*) AS n_scenes, CAST(MAX(len) AS BIGINT) AS longest_scene
         FROM sl GROUP BY doc_id ORDER BY doc_id"""
  )
}
