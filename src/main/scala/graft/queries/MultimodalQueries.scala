package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Multimodal
import graft.util.Tables.load

/** Multimodal surface (m01-m03): the documents' text bytes stand in
  * for media payloads (ASCII ⇒ 1 byte/char, so DuckDB's VARCHAR
  * functions mirror the Spark side's real binary operations exactly).
  * m03 exercises the batched stub decoder — hash/impl-defined, so
  * rows-only.
  */
object MultimodalQueries {

  private val FrameSize = 32

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- binary payload + typed metadata struct ----
    "m01_media_meta" -> { (s, d) =>
      import s.implicits._
      load(s, d, "documents")
        .select($"doc_id",
          Multimodal.asMedia(encode($"text", "UTF-8"), "text/fake").as("media"))
        .select($"doc_id",
          $"media.meta.kind".as("kind"),
          $"media.meta.n_bytes".as("n_bytes"),
          $"media.meta.sha256".as("sha"))
        .orderBy($"doc_id")
    },

    // ---- frame sampling over the binary payload ----
    "m02_frame_sample" -> { (s, d) =>
      import s.implicits._
      load(s, d, "documents")
        .select($"doc_id", encode($"text", "UTF-8").as("payload"))
        .select($"doc_id",
          size(Multimodal.sampleFrames($"payload", FrameSize)).cast("long")
            .as("n_frames"),
          lower(sha2($"payload".substr(lit(1), lit(FrameSize)), 256))
            .as("first_frame_sha"))
        .orderBy($"doc_id")
    },

    // ---- exact media dedup by content hash (the first dedup pass a
    //      multimodal corpus gets: identical bytes collapse before any
    //      decode/feature work) ----
    "m04_media_dedup" -> { (s, d) =>
      import s.implicits._
      load(s, d, "documents")
        .select($"doc_id",
          lower(sha2(encode($"text", "UTF-8"), 256)).as("sha"))
        .groupBy($"sha")
        .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
        .orderBy($"keep_id")
    },

    // ---- frame-level dedup ACROSS documents: chunks shared by more
    //      than one payload (storyboard/intro detection in video
    //      corpora; here 32-byte frames over the stand-in payloads).
    //      One explode + hash aggregate — bytes hash once, nothing
    //      quadratic, the frame hash is the shuffle key ----
    // ---- cross-modal consistency: every text near-dup pair checked
    //      against its embedding cosine — the dataset-QA pass that
    //      catches a drifted embedding pipeline. Near-dup pairs come
    //      from the LSH candidate path (no all-pairs stage); the two
    //      embedding joins are PK lookups on the pair ids ----
    "m06_crossmodal_check" -> { (s, d) =>
      import s.implicits._
      import graft.ops.Dedup
      import graft.functions.Vectors
      // pair relation via the persisted index (the d11 discipline:
      // one shared artifact per corpus, not a re-shingle per
      // analysis — the session-memoized fixture IS that artifact)
      val dir = DedupQueries.nearDupIndexFixture(s, d)
      val pairs = Dedup.pairsFromIndex(s, dir, threshold = 0.8)
      val emb = load(s, d, "embeddings")
      pairs
        .join(emb.select($"vec_id".as("a"), $"embedding".as("ea")), "a")
        .join(emb.select($"vec_id".as("b"), $"embedding".as("eb")), "b")
        .select($"a", $"b", $"jaccard",
          round(Vectors.cosine($"ea", $"eb"), 6).as("cos"))
        .withColumn("consistent", $"cos" >= 0.9)
        .orderBy($"a", $"b")
    },

    "m05_frame_dedup" -> { (s, d) =>
      import s.implicits._
      load(s, d, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .select($"doc_id", encode($"text", "UTF-8").as("payload"))
        .select($"doc_id",
          explode(Multimodal.sampleFrames($"payload", FrameSize)).as("frame"))
        .select($"doc_id", lower(sha2($"frame", 256)).as("fsha"))
        .groupBy($"fsha")
        .agg(countDistinct($"doc_id").as("n_docs"),
          count(lit(1)).as("n_occ"),
          min($"doc_id").as("min_doc"))
        .filter($"n_docs" > 1)
        .orderBy($"fsha")
    },

    // ---- byte-budget shard layout (WebDataset-style export) ----
    // media shards must bound BYTES, not rows: per-source strata take
    // payloads in doc_id order and close a shard when 4 KiB would
    // overflow (Export.byteBudgetShards, the p01/d14 prefix-sum
    // discipline on bytes). The gate rolls each shard up — item count,
    // exact byte total, id range — so any assignment drift fails the
    // hash. Payload bytes = UTF-8 text (ASCII corpus ⇒ DuckDB's char
    // length mirrors the binary length exactly, the m01 convention).
    "m07_media_shards" -> { (s, d) =>
      import s.implicits._
      import graft.ops.Export
      val media = load(s, d, "documents")
        .select($"doc_id", $"source", encode($"text", "UTF-8").as("payload"))
      Export.byteBudgetShards(media, "doc_id",
          length($"payload"), budget = 4096L, strataCols = Seq("source"))
        .groupBy($"source", $"shard_id")
        .agg(count(lit(1)).as("n_items"),
          sum($"__bytes").cast("long").as("total_bytes"),
          min($"doc_id").as("first_doc"),
          max($"doc_id").as("last_doc"))
        .orderBy($"source", $"shard_id")
    },

    // ---- REAL media decode, end-to-end oracled: every payload is a
    //      complete binary PPM (P6) file built in-plan — ASCII header
    //      (width 16, data-derived height, maxval 255) + the
    //      document's bytes as the RGB raster, truncated/padded to
    //      exactly w·h·3 — and Multimodal.PpmDecoder parses it like
    //      any netpbm reader (header tokenizing, comments, maxval,
    //      raster stride). The oracle recomputes the dimensions and
    //      the maxval-normalized channel means from the same bytes
    //      character-wise, so a decoder that mis-parses the header,
    //      strides the raster wrong, or mixes channels hash-fails.
    //      (Formats whose codecs the container doesn't ship — JPEG,
    //      audio — stay behind the same MediaDecoder seam with the
    //      deterministic FakeDecoder stand-in; spec-gated.) ----
    "m03_ppm_features" -> { (s, d) =>
      import s.implicits._
      val docs = load(s, d, "documents")
        .select($"doc_id", $"text",
          greatest(lit(1L), floor(length($"text") / lit(48)).cast("long"))
            .cast("int").as("h"))
      val media = docs.select($"doc_id",
        concat(
          encode(concat(lit("P6\n16 "), $"h".cast("string"), lit("\n255\n")),
            "UTF-8"),
          encode(expr("rpad(text, h * 48, ' ')"), "UTF-8")).as("payload"))
      Multimodal.extractFeatures(media, "doc_id", "payload",
          Multimodal.PpmDecoder)
        .select($"id".as("doc_id"),
          element_at($"features", 1).cast("long").as("w"),
          element_at($"features", 2).cast("long").as("h"),
          round(element_at($"features", 3).cast("double"), 6).as("mean_r"),
          round(element_at($"features", 4).cast("double"), 6).as("mean_g"),
          round(element_at($"features", 5).cast("double"), 6).as("mean_b"))
        .orderBy($"doc_id")
    },

    // ---- REAL image decode #2: uncompressed BMP (round-11 verdict
    //      item 8 — BI_RGB is header + raw rows, the same honest
    //      codec class as P6/WAV; shrinks FakeDecoder's remit) ----
    // payloads are complete bottom-up 24-bit BI_RGB files built
    // in-plan: the little-endian header fields (file size, height,
    // image size) are computed per document, the raster is the
    // document's chars at 16 px/row (48 bytes — already 4-byte
    // aligned, so the writer needs no padding; the DECODER still
    // handles padded strides, spec-gated). On-disk pixel order is
    // BGR, so the char at 3j is the BLUE sample — the oracle swaps
    // channels accordingly. m03's rounding discipline throughout.
    "m11_bmp_features" -> { (s, d) =>
      import s.implicits._
      def le32(c: org.apache.spark.sql.Column) = {
        // all four little-endian bytes: the first cut emitted only two
        // (header fields capped at 65535 — latent divergence on any
        // corpus with a long document)
        def byteAt(i: Int) = pmod(
          floor(c.cast("long") / math.pow(256, i).toLong).cast("long"),
          lit(256)).cast("int")
        unhex(format_string("%02x%02x%02x%02x",
          byteAt(0), byteAt(1), byteAt(2), byteAt(3)))
      }
      val docs = load(s, d, "documents")
        .select($"doc_id", $"text",
          greatest(lit(1L), floor(length($"text") / lit(48)).cast("long"))
            .as("h"))
      val media = docs.select($"doc_id",
        concat(
          lit("BM".getBytes("US-ASCII")),
          le32($"h" * 48 + 54),              // file size
          lit(Array.fill[Byte](4)(0)),       // reserved
          le32(lit(54)),                     // pixel-data offset
          le32(lit(40)),                     // BITMAPINFOHEADER
          le32(lit(16)),                     // width
          le32($"h"),                        // height (bottom-up)
          unhex(lit("01001800")),            // planes=1, bpp=24 (LE)
          le32(lit(0)),                      // BI_RGB
          le32($"h" * 48),                   // image size
          lit(Array.fill[Byte](16)(0)),      // resolutions + palette
          encode(expr("rpad(text, h * 48, ' ')"), "UTF-8")).as("payload"))
      Multimodal.extractFeatures(media, "doc_id", "payload",
          Multimodal.BmpDecoder)
        .select($"id".as("doc_id"),
          element_at($"features", 1).cast("long").as("w"),
          element_at($"features", 2).cast("long").as("h"),
          round(element_at($"features", 3).cast("double"), 6).as("mean_r"),
          round(element_at($"features", 4).cast("double"), 6).as("mean_g"),
          round(element_at($"features", 5).cast("double"), 6).as("mean_b"))
        .orderBy($"doc_id")
    },

    // ---- REAL audio decode: RIFF/WAVE PCM (m03's audio counterpart) ----
    // payloads are complete 8-bit mono PCM WAVE files built in-plan
    // (256 samples of the document's chars — fixed frame count keeps
    // the binary header a literal; the DECODER still walks the full
    // chunk grammar, and WavDecoderSpec pins 16-bit/stereo/pad-byte/
    // malformed legs the fixed query shape can't reach). The oracle
    // recomputes mean absolute amplitude character-wise: sums are
    // exact integers, one double division, round 6 — the m03
    // float32-round-trip discipline.
    "m08_wav_features" -> { (s, d) =>
      import s.implicits._
      import Multimodal.{wavLe16 => le16, wavLe32 => le32}
      val hdr: Array[Byte] =
        "RIFF".getBytes("US-ASCII") ++ le32(36 + 256) ++
          "WAVE".getBytes("US-ASCII") ++
          "fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(1) ++ le16(1) ++
          le32(8000) ++ le32(8000) ++ le16(1) ++ le16(8) ++
          "data".getBytes("US-ASCII") ++ le32(256)
      // non-ASCII chars would desync bytes (UTF-8 multi-byte) from the
      // oracle's per-CHARACTER codes — sanitize identically on both
      // sides so the gate is corpus-independent, not ascii-lucky
      val media = load(s, d, "documents").select($"doc_id",
        concat(lit(hdr),
          encode(rpad(regexp_replace($"text", "[^\\x20-\\x7e]", "?"),
            256, " "), "UTF-8")).as("payload"))
      Multimodal.extractFeatures(media, "doc_id", "payload",
          Multimodal.WavDecoder)
        .select($"id".as("doc_id"),
          element_at($"features", 1).cast("long").as("channels"),
          element_at($"features", 2).cast("long").as("sample_rate"),
          element_at($"features", 3).cast("long").as("n_frames"),
          round(element_at($"features", 4).cast("double"), 6).as("mean_abs"))
        .orderBy($"doc_id")
    },

    // ---- audio energy-delta fingerprint: exact-hash audio dedup ----
    // the audio counterpart of m09's image dHash: each PCM payload
    // frames into 32 segments, per-frame EXACT integer energy sums
    // (Multimodal.WavFrameEnergies — raw longs, not rounded means, so
    // the neighbor comparisons below are engine-exact), and the
    // 31-bit fingerprint packs sign(energy[j+1] - energy[j]) — the
    // classic band-energy-delta audio hash shape. Identical
    // fingerprints group as duplicate candidates (one linear groupBy,
    // the radius-0 report that scales unconditionally). Payload
    // construction is m08's byte-identical WAV build, so the oracle
    // re-derives frame energies straight from the document's ascii
    // codes.
    "m13_audio_fingerprint" -> { (s, d) =>
      import s.implicits._
      import Multimodal.{wavLe16 => le16, wavLe32 => le32}
      val hdr: Array[Byte] =
        "RIFF".getBytes("US-ASCII") ++ le32(36 + 256) ++
          "WAVE".getBytes("US-ASCII") ++
          "fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(1) ++ le16(1) ++
          le32(8000) ++ le32(8000) ++ le16(1) ++ le16(8) ++
          "data".getBytes("US-ASCII") ++ le32(256)
      val media = load(s, d, "documents").select($"doc_id",
        concat(lit(hdr),
          encode(rpad(regexp_replace($"text", "[^\\x20-\\x7e]", "?"),
            256, " "), "UTF-8")).as("payload"))
      val fp = Multimodal.extractFeatures(media, "doc_id", "payload",
          Multimodal.WavFrameEnergies(32))
        .withColumn("fingerprint", expr(
          "aggregate(sequence(1, 31), 0L, (acc, j) -> acc + " +
            "IF(element_at(features, j + 1) > element_at(features, j), " +
            "shiftleft(1L, j - 1), 0L))"))
        .select($"id".as("doc_id"), $"fingerprint")
      val counts = fp.groupBy($"fingerprint").agg(count(lit(1)).as("n_docs"))
      fp.join(counts, "fingerprint")
        .select($"doc_id", $"fingerprint", $"n_docs")
        .orderBy($"doc_id")
    },

    // ---- perceptual image near-dup: dHash + pigeonhole hamming join ----
    // the image counterpart of d03's SimHash text pass — the near-dup
    // check an image pipeline runs on thumbnails. Every payload is a
    // complete 9×7 P6 image built in-plan (sanitized document chars as
    // the raster; documents under one raster skipped — a pushable
    // length filter), Multimodal.ppmDhash decodes it through the REAL
    // parser and packs the 56-bit difference hash, and
    // Dedup.hammingPairs finds all pairs within hamming 2 by the same
    // Manku banding d03 uses — never an all-pairs scan. The oracle
    // recomputes the hash character-wise (cell grays are exact integer
    // sums, bits exact comparisons, the pack a shift-sum) and
    // brute-force-joins: SQL states the semantics, the engine answers
    // through banding (the d02/d03 discipline).
    //
    // The radius is a MEASURED trade against the 56-bit signature's
    // band entropy: pigeonhole banding partitions the bits into
    // maxHamming+1 blocks, and the CANDIDATE volume is
    // birthday-bounded by the per-band value space. Radius 8 (2^6
    // values/band) measured a 12.8× wall on a 10× corpus; radius 4
    // (2^11) fixed 10× but read 48× on a 100× corpus; radius 2
    // (2^18.7) holds near-linear at 100×. The boundary is
    // information-theoretic, not a plan bug — a wider radius at
    // billion-image scale needs a wider hash (256-bit grids), not
    // more blocks; exact-hash grouping (radius 0, plain groupBy) is
    // the unbounded-scale fallback, the d05 division of labor.
    "m09_phash_pairs" -> { (s, d) =>
      import s.implicits._
      val media = load(s, d, "documents")
        .filter(length($"text") >= 189)
        .select($"doc_id",
          concat(lit("P6\n9 7\n255\n".getBytes("US-ASCII")),
            encode(rpad(regexp_replace($"text", "[^\\x20-\\x7e]", "?"),
              189, " "), "UTF-8")).as("payload"))
      val sigs = Multimodal.dhashOf(media, "doc_id", "payload")
        .filter($"sig".isNotNull)
      graft.ops.Dedup.hammingPairs(sigs, maxHamming = 2, sigBits = 56)
        .select($"a", $"b", $"hamming".cast("int").as("hamming"))
        .orderBy($"a", $"b")
    },

    // ---- WIDE perceptual near-dup: the 256-bit grid m09's boundary
    //      names (round-11 verdict item 6) ----
    // m09's 56-bit hash is information-limited: radius 4 banding has
    // a 2^11 per-band value space and read 48× on a 100× corpus. The
    // wide hash (17×16 cells → 16 comparisons × 16 rows) packs into
    // SIXTEEN 16-bit words; Manku banding over radius+1 word-aligned
    // multi-row blocks gives 48-64 bits per band, so radius 4 — the
    // radius the narrow hash couldn't hold — is serviceable at
    // scale. Payload: a complete
    // 17×16 P6 built in-plan — m09's 189-char head window CYCLED to
    // the 816-char raster (one char triplet per pixel, one pixel per
    // cell), decoded by the real parser; pairs from
    // Dedup.hammingPairsWide. The raster is text-dependent at EVERY
    // position — a constant pad tail would make the padding rows'
    // words a single degenerate band bucket shared by every short
    // document, turning the banded join quadratic at scale (measured:
    // the space-padded variant diverged on the 100× corpus; this one
    // panels below). Oracle recomputes the 16 words character-wise
    // and brute-force joins — SQL states the semantics, the engine
    // answers through banding.
    "m10_phash_wide" -> { (s, d) =>
      import s.implicits._
      // per-row raster build + decode is CPU-bound and the corpus may
      // arrive as a handful of parquet splits — spread it first (the
      // m05/d18 discipline)
      val media = load(s, d, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .filter(length($"text") >= 189)
        .select($"doc_id",
          concat(lit("P6\n17 16\n255\n".getBytes("US-ASCII")),
            encode(substring(repeat(substring(
                regexp_replace($"text", "[^\\x20-\\x7e]", "?"),
                1, 189), 5), 1, 816), "UTF-8")).as("payload"))
      val sigs = Multimodal.dhashWideOf(media, "doc_id", "payload")
      graft.ops.Dedup.hammingPairsWide(sigs, maxHamming = 4, nWords = 16)
        .select($"a", $"b", $"hamming".cast("int").as("hamming"))
        .orderBy($"a", $"b")
    },

    // COUNT-ONLY perceptual-dup report: m10's banded join folded to a
    // per-item DISTINCT-partner degree without the global pair-level
    // distinct or any materialized pair relation
    // (Dedup.hammingDupDegreesWide) — the 100 TB report shape where
    // m10's output is the quadratic part. Oracle: degrees from m10's
    // exact pair relation.
    "m12_phash_degree" -> { (s, d) =>
      import s.implicits._
      val media = load(s, d, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .filter(length($"text") >= 189)
        .select($"doc_id",
          concat(lit("P6\n17 16\n255\n".getBytes("US-ASCII")),
            encode(substring(repeat(substring(
                regexp_replace($"text", "[^\\x20-\\x7e]", "?"),
                1, 189), 5), 1, 816), "UTF-8")).as("payload"))
      val sigs = Multimodal.dhashWideOf(media, "doc_id", "payload")
      graft.ops.Dedup.hammingDupDegreesWide(sigs, maxHamming = 4,
          nWords = 16)
        .select($"id".as("doc_id"), $"dup_degree")
        .orderBy($"doc_id")
    }
  )

  // single-line (embedded into stripMargin'd SQL)
  private val pairShingleSql =
    "list_distinct(list_transform(range(1, len(string_split(text,' ')) - 1), " +
      "i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] " +
      "|| ' ' || string_split(text,' ')[i+2]))"

  val oracle: Map[String, String] = Map(
    // m03: the raster is the document's chars truncated/padded to
    // w·h·3; channel c's samples sit at positions 3j+c. Sums are
    // exact integers (ascii codes), the single double division and
    // round(…,6) mirror the decoder's arithmetic.
    "m03_ppm_features" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    GREATEST(1, CAST(FLOOR(length(text) / 48) AS BIGINT)) AS h,
        |    rpad(text, CAST(GREATEST(1, FLOOR(length(text) / 48)) * 48
        |      AS INT), ' ') AS raster
        |  FROM documents)
        |SELECT doc_id, CAST(16 AS BIGINT) AS w, h,
        |  round(list_sum(list_transform(range(0, CAST(16 * h AS INT)),
        |    j -> ascii(substring(raster, CAST(3 * j + 1 AS INT), 1))))
        |    / (16 * h * 255.0), 6) AS mean_r,
        |  round(list_sum(list_transform(range(0, CAST(16 * h AS INT)),
        |    j -> ascii(substring(raster, CAST(3 * j + 2 AS INT), 1))))
        |    / (16 * h * 255.0), 6) AS mean_g,
        |  round(list_sum(list_transform(range(0, CAST(16 * h AS INT)),
        |    j -> ascii(substring(raster, CAST(3 * j + 3 AS INT), 1))))
        |    / (16 * h * 255.0), 6) AS mean_b
        |FROM p ORDER BY doc_id""".stripMargin,

    // m13: frame energies re-derived from the padded document's ascii
    // codes (the m08 byte identity); fingerprint bit j set iff frame
    // j+1's exact integer energy sum exceeds frame j's
    "m13_audio_fingerprint" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    rpad(regexp_replace(text, '[^\x20-\x7e]', '?', 'g'),
        |      256, ' ') AS s
        |  FROM documents),
        |e AS (
        |  SELECT doc_id, list_transform(range(1, 33), f ->
        |    list_sum(list_transform(range(1, 9), m ->
        |      abs(ascii(substring(s,
        |        CAST((f - 1) * 8 + m AS INT), 1)) - 128)))) AS en
        |  FROM p),
        |fp AS (
        |  SELECT doc_id, CAST(list_sum(list_transform(range(1, 32),
        |    j -> CASE WHEN en[CAST(j AS INT) + 1] > en[CAST(j AS INT)]
        |      THEN 1 << (j - 1) ELSE 0 END)) AS BIGINT) AS fingerprint
        |  FROM e)
        |SELECT doc_id, fingerprint,
        |  CAST(COUNT(*) OVER (PARTITION BY fingerprint) AS BIGINT)
        |    AS n_docs
        |FROM fp ORDER BY doc_id""".stripMargin,

    // m08: 8-bit PCM samples are the padded document's ascii codes;
    // mean absolute amplitude = Σ|code − 128| / (256·128), exact
    // integer sum, one double division, round 6
    "m08_wav_features" ->
      """SELECT doc_id,
        |  CAST(1 AS BIGINT) AS channels,
        |  CAST(8000 AS BIGINT) AS sample_rate,
        |  CAST(256 AS BIGINT) AS n_frames,
        |  round(list_sum(list_transform(range(1, 257),
        |    j -> abs(ascii(substring(
        |      rpad(regexp_replace(text, '[^\x20-\x7e]', '?', 'g'),
        |        256, ' '),
        |      CAST(j AS INT), 1)) - 128)))
        |    / (256 * 128.0), 6) AS mean_abs
        |FROM documents ORDER BY doc_id""".stripMargin,

    // m11: like m03 but the on-disk order is BGR — the char at raster
    // position 3j+1 (1-indexed) is the BLUE sample, 3j+3 the RED
    "m11_bmp_features" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    GREATEST(1, CAST(FLOOR(length(text) / 48) AS BIGINT)) AS h,
        |    rpad(text, CAST(GREATEST(1, FLOOR(length(text) / 48)) * 48
        |      AS INT), ' ') AS raster
        |  FROM documents)
        |SELECT doc_id, CAST(16 AS BIGINT) AS w, h,
        |  round(list_sum(list_transform(range(0, CAST(16 * h AS INT)),
        |    j -> ascii(substring(raster, CAST(3 * j + 3 AS INT), 1))))
        |    / (16 * h * 255.0), 6) AS mean_r,
        |  round(list_sum(list_transform(range(0, CAST(16 * h AS INT)),
        |    j -> ascii(substring(raster, CAST(3 * j + 2 AS INT), 1))))
        |    / (16 * h * 255.0), 6) AS mean_g,
        |  round(list_sum(list_transform(range(0, CAST(16 * h AS INT)),
        |    j -> ascii(substring(raster, CAST(3 * j + 1 AS INT), 1))))
        |    / (16 * h * 255.0), 6) AS mean_b
        |FROM p ORDER BY doc_id""".stripMargin,

    // m09: the 9×7 raster is the sanitized document's first 189
    // chars, so each grid cell is exactly one pixel — gray = sum of
    // the 3 ascii codes, bit b compares cell (b div 8, b mod 8) to
    // its right neighbor (grid stride 9), packed at 1<<b (56 bits —
    // the sign bit stays clear, so checked shifts accept it)
    "m09_phash_pairs" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    rpad(regexp_replace(text, '[^\x20-\x7e]', '?', 'g'),
        |      189, ' ') AS raster
        |  FROM documents WHERE length(text) >= 189),
        |g AS (
        |  SELECT doc_id,
        |    list_transform(range(0, 63),
        |      k -> ascii(substring(raster, CAST(3*k+1 AS INT), 1))
        |         + ascii(substring(raster, CAST(3*k+2 AS INT), 1))
        |         + ascii(substring(raster, CAST(3*k+3 AS INT), 1))) AS gray
        |  FROM p),
        |hsh AS (
        |  SELECT doc_id,
        |    CAST(list_sum(list_transform(range(0, 56),
        |      b -> CASE WHEN gray[CAST((b//8)*9 + (b%8) + 1 AS INT)]
        |                   > gray[CAST((b//8)*9 + (b%8) + 2 AS INT)]
        |           THEN (1::BIGINT << CAST(b AS INT)) ELSE 0 END))
        |      AS BIGINT) AS sig
        |  FROM g)
        |SELECT l.doc_id AS a, r.doc_id AS b,
        |  CAST(bit_count(xor(l.sig, r.sig)) AS INT) AS hamming
        |FROM hsh l JOIN hsh r ON l.doc_id < r.doc_id
        |WHERE bit_count(xor(l.sig, r.sig)) <= 2
        |ORDER BY a, b""".stripMargin,

    // m10: the 17×16 raster is the sanitized document's 189-char head
    // window cycled to 816 chars, one pixel per cell — word r packs
    // the 16 right-neighbor comparisons of grid row r (stride 17) at
    // 1<<c; hamming sums bit_count(xor) over the 16 aligned words
    "m10_phash_wide" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    substring(repeat(substring(
        |      regexp_replace(text, '[^\x20-\x7e]', '?', 'g'),
        |      1, 189), 5), 1, 816) AS raster
        |  FROM documents WHERE length(text) >= 189),
        |g AS (
        |  SELECT doc_id,
        |    list_transform(range(0, 272),
        |      k -> ascii(substring(raster, CAST(3*k+1 AS INT), 1))
        |         + ascii(substring(raster, CAST(3*k+2 AS INT), 1))
        |         + ascii(substring(raster, CAST(3*k+3 AS INT), 1))) AS gray
        |  FROM p),
        |hsh AS (
        |  SELECT doc_id,
        |    list_transform(range(0, 16), r ->
        |      CAST(list_sum(list_transform(range(0, 16),
        |        c -> CASE WHEN gray[CAST(r*17 + c + 1 AS INT)]
        |                     > gray[CAST(r*17 + c + 2 AS INT)]
        |             THEN (1::BIGINT << CAST(c AS INT)) ELSE 0 END))
        |        AS BIGINT)) AS sig
        |  FROM g),
        |pairs AS (
        |  SELECT l.doc_id AS a, r.doc_id AS b,
        |    CAST(list_sum(list_transform(range(1, 17),
        |      i -> bit_count(xor(l.sig[CAST(i AS INT)],
        |                         r.sig[CAST(i AS INT)]))))
        |      AS INT) AS hamming
        |  FROM hsh l JOIN hsh r ON l.doc_id < r.doc_id)
        |SELECT a, b, hamming FROM pairs
        |WHERE hamming <= 4 ORDER BY a, b""".stripMargin,

    "m12_phash_degree" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    substring(repeat(substring(
        |      regexp_replace(text, '[^\x20-\x7e]', '?', 'g'),
        |      1, 189), 5), 1, 816) AS raster
        |  FROM documents WHERE length(text) >= 189),
        |g AS (
        |  SELECT doc_id,
        |    list_transform(range(0, 272),
        |      k -> ascii(substring(raster, CAST(3*k+1 AS INT), 1))
        |         + ascii(substring(raster, CAST(3*k+2 AS INT), 1))
        |         + ascii(substring(raster, CAST(3*k+3 AS INT), 1))) AS gray
        |  FROM p),
        |hsh AS (
        |  SELECT doc_id,
        |    list_transform(range(0, 16), r ->
        |      CAST(list_sum(list_transform(range(0, 16),
        |        c -> CASE WHEN gray[CAST(r*17 + c + 1 AS INT)]
        |                     > gray[CAST(r*17 + c + 2 AS INT)]
        |             THEN (1::BIGINT << CAST(c AS INT)) ELSE 0 END))
        |        AS BIGINT)) AS sig
        |  FROM g),
        |pairs AS (
        |  SELECT l.doc_id AS a, r.doc_id AS b,
        |    CAST(list_sum(list_transform(range(1, 17),
        |      i -> bit_count(xor(l.sig[CAST(i AS INT)],
        |                         r.sig[CAST(i AS INT)]))))
        |      AS INT) AS hamming
        |  FROM hsh l JOIN hsh r ON l.doc_id < r.doc_id),
        |q AS (SELECT a, b FROM pairs WHERE hamming <= 4),
        |e AS (SELECT a AS doc_id FROM q UNION ALL SELECT b AS doc_id FROM q)
        |SELECT doc_id, COUNT(*) AS dup_degree FROM e
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "m07_media_shards" ->
      """WITH c AS (
        |  SELECT source, doc_id, length(text) AS n_bytes,
        |    SUM(length(text)) OVER (PARTITION BY source
        |      ORDER BY doc_id) AS cum
        |  FROM documents)
        |SELECT source, CAST((cum - n_bytes) // 4096 AS BIGINT) AS shard_id,
        |  COUNT(*) AS n_items, CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
        |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "m06_crossmodal_check" ->
      s"""WITH d AS (SELECT doc_id, $pairShingleSql AS sh FROM documents),
         |prs AS (
         |  SELECT a.doc_id AS a, b.doc_id AS b,
         |    round(len(list_intersect(a.sh, b.sh))::DOUBLE
         |      / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
         |  FROM d a JOIN d b ON a.doc_id < b.doc_id
         |  WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
         |      / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.8)
         |SELECT prs.a, prs.b, prs.jaccard,
         |  round(list_cosine_similarity(ea.embedding::DOUBLE[],
         |    eb.embedding::DOUBLE[]), 6) AS cos,
         |  round(list_cosine_similarity(ea.embedding::DOUBLE[],
         |    eb.embedding::DOUBLE[]), 6) >= 0.9 AS consistent
         |FROM prs
         |JOIN embeddings ea ON prs.a = ea.vec_id
         |JOIN embeddings eb ON prs.b = eb.vec_id
         |ORDER BY a, b""".stripMargin,
    "m01_media_meta" ->
      """SELECT doc_id, 'text/fake' AS kind,
        |  octet_length(encode(text)) AS n_bytes,
        |  sha256(text) AS sha
        |FROM documents ORDER BY doc_id""".stripMargin,

    "m02_frame_sample" ->
      s"""SELECT doc_id,
         |  CAST(ceil(octet_length(encode(text)) / $FrameSize.0) AS BIGINT)
         |    AS n_frames,
         |  sha256(substring(text, 1, $FrameSize)) AS first_frame_sha
         |FROM documents ORDER BY doc_id""".stripMargin,

    "m04_media_dedup" ->
      """SELECT sha256(text) AS sha, MIN(doc_id) AS keep_id,
        |  COUNT(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY keep_id""".stripMargin,

    "m05_frame_dedup" ->
      s"""WITH f AS (
         |  SELECT doc_id, unnest(list_transform(
         |    range(0, CAST(ceil(octet_length(encode(text)) / $FrameSize.0)
         |      AS INT)),
         |    j -> sha256(substring(text, 1 + $FrameSize * j, $FrameSize))))
         |    AS fsha
         |  FROM documents)
         |SELECT fsha, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_occ,
         |  MIN(doc_id) AS min_doc
         |FROM f GROUP BY 1 HAVING COUNT(DISTINCT doc_id) > 1
         |ORDER BY fsha""".stripMargin
  )
}
