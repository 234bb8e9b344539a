package graft.operators

import org.apache.spark.sql.functions._

import graft.multimodal.MediaOps
import graft.sources.Tables

/** Multimodal-column operators (binary payload + typed metadata over
  * the documents corpus — see MediaOps for the stub-decoder policy).
  */
object MediaQueries {

  /** m06's fingerprint table — eligible media plus their planted
    * re-encode twins, with the 256-bit multi-offset gradient hash
    * (w0..w3) and the 8 bit-mixed MIH band values (bv0..bv7), all
    * map-only expressions on top of the resize. Extracted so the
    * query and [[m06CappedKeyCount]] share one definition. */
  private def m06Fingerprints(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val TwinShift = 1000000000000L
    val media = MediaOps.mediaTable(Tables.documents(s, d))
      .filter(length(col("payload")) >= 128)
    val rs = MediaOps.resize(s, media) // doc_id, out_len, resized
    // L >= 128 => every one of the 64 buckets is populated.
    //
    // PRIMITIVE-LOOP KERNEL (round 20 — guide §1.2/§4: per-task work):
    // the former expression form built ~800 nodes per row (4 words ×
    // 64 comparison CASEs + 8 bands × 32 shift/ORs + a 256-element
    // higher-order filter for the near-tie probes — the HOF is
    // CodegenFallback, interpreted per element), the largest plan in
    // the suite (the >600-field select behind the bench's
    // maxToStringFields bump). One mapPartitions pass computes the
    // identical integer arithmetic — same comparisons, same shifts,
    // same mixing permutation, verified bit-for-bit by the unchanged
    // DuckDB oracle — in a tight loop, and ALSO emits the adaptive
    // multi-probe keys (b, bv-with-bit-flipped) that the old tieRows
    // expression derived from `resized` downstream, so the cached
    // fingerprint table no longer carries the resized signal at all.
    //
    // Twin guard semantics preserved: a source doc_id at or past the
    // twin shift would alias a twin id and silently corrupt the
    // probe's planted truth — fail loudly (require in the task, the
    // kernel form of the old raise_error column).
    import s.implicits._
    val offsets = Array(1, 2, 4, 8)
    rs.select(col("doc_id"), col("resized"))
      .as[(Long, Array[Int])]
      .mapPartitions { it =>
        it.flatMap { case (id0, r0) =>
          require(id0 < TwinShift,
            s"m06: source doc_id $id0 >= twin shift $TwinShift")
          val twin = new Array[Int](r0.length)
          var t = 0
          while (t < r0.length) {
            twin(t) = r0(t) + (if (t % 7 == 0) 1 else 0); t += 1
          }
          Iterator((id0, r0), (id0 + TwinShift, twin)).map {
            case (id, arr) =>
              // the old element_at((j + off) % 64 + 1) errored on a
              // short array under ANSI; keep the same loudness
              require(arr.length == 64,
                s"m06: resized signal of doc $id has ${arr.length} " +
                "buckets (eligibility guarantees 64)")
              val w = new Array[Long](4)
              var k = 0
              while (k < 4) {
                val off = offsets(k)
                var word = 0L
                var j = 0
                while (j < 64) {
                  if (arr(j) > arr((j + off) % 64)) word |= (1L << j)
                  j += 1
                }
                w(k) = word
                k += 1
              }
              // mixed MIH bands: hash bit g lands in band
              // (163g + 71) mod 256 div 32 at slot mod 32
              val bv = new Array[Long](8)
              var g = 0
              while (g < 256) {
                val bit = (w(g / 64) >>> (g % 64)) & 1L
                val p = (g * 163 + 71) % 256
                bv(p / 32) |= bit << (p % 32)
                g += 1
              }
              // adaptive multi-probe keys: for every near-tie
              // comparison (diff in [1, 2]) the band value with that
              // bit flipped — identical rule to the old tieRows expr
              val probes =
                scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
              g = 0
              while (g < 256) {
                val diff = arr(g % 64) - arr((g % 64 + offsets(g / 64)) % 64)
                if (diff >= 1 && diff <= 2) {
                  val p = (g * 163 + 71) % 256
                  probes += ((p / 32, bv(p / 32) ^ (1L << (p % 32))))
                }
                g += 1
              }
              (id, w(0), w(1), w(2), w(3), bv(0), bv(1), bv(2), bv(3),
                bv(4), bv(5), bv(6), bv(7), probes.toArray)
          }
        }
      }
      .toDF("doc_id", "w0", "w1", "w2", "w3", "bv0", "bv1", "bv2",
        "bv3", "bv4", "bv5", "bv6", "bv7", "probes")
  }

  /** Number of exact MIH band keys whose multiplicity exceeds m06's
    * 200-cap (the hot-pattern rule drops them from the probe TARGET
    * set). The pigeonhole recall guarantee is conditional on this
    * count: a twin pair whose ONLY <=1-bit-differing band key is
    * capped would be missed. 0 on the test corpus at every SF
    * (spec-pinned), so recall is unconditional there; a degenerate
    * deployment corpus can check the precondition with this one
    * aggregate before trusting radius-15 recall. */
  private[graft] def m06CappedKeyCount(
      s: org.apache.spark.sql.SparkSession, d: String): Long = {
    val fpr = m06Fingerprints(s, d)
    val bandArr = array((0 until 8).map(b => col(s"bv$b")): _*)
    fpr.select(col("doc_id"), posexplode(bandArr))
      .toDF("doc_id", "b", "bv")
      .groupBy("b", "bv").agg(count(lit(1)).as("n"))
      .filter(col("n") > 200)
      .count()
  }

  val all: Seq[QueryDef] = Seq(

    // Metadata + content fingerprint of the binary payload —
    // projection-only over the media table (no shuffle; sha256 and
    // octet_length run codegen'd on the scan).
    QueryDef(
      "m01_media_metadata",
      """SELECT doc_id, 'blob/' || source AS format,
        |       CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        |       lang, sha256(text) AS payload_sha
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      MediaOps.mediaTable(Tables.documents(s, d))
        .select(col("doc_id"), col("format"),
          col("meta.n_bytes").as("n_bytes"), col("meta.lang").as("lang"),
          sha2(col("payload"), 256).as("payload_sha"))
        .orderBy("doc_id")
    },

    // Frame sampling: 1 media row → 4 fixed-offset frames (the video
    // frame-sample shape: stride = len/4, 32-byte windows), each
    // fingerprinted. Generator (1→N) + projection, no shuffle.
    QueryDef(
      "m02_frame_sample",
      """SELECT doc_id, CAST(frame_no AS INT) AS frame_no,
        |       md5(substring(text, 1 + frame_no * (length(text) // 4), 32))
        |         AS frame_sig
        |FROM documents, generate_series(0, 3) t(frame_no)
        |ORDER BY doc_id, frame_no""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), col("text"),
          explode(sequence(lit(0), lit(3))).as("frame_no"))
        .select(col("doc_id"), col("frame_no"),
          md5(expr("substring(text, 1 + frame_no * (length(text) div 4), 32)"))
            .as("frame_sig"))
        .orderBy("doc_id", "frame_no")
    },

    // Batched stub-decode feature extraction (MediaOps.extractFeatures
    // — mapPartitions with bounded batches). The stub's statistics are
    // over the payload BYTES (a codec sees bytes, not characters), so
    // the oracle recomputes them byte-true through hex() — byte i of
    // the payload is hex chars [2i-1, 2i] — and parity holds for any
    // UTF-8 corpus, not just an all-ASCII fixture. A real codec would
    // drop this to a rows-only check.
    QueryDef(
      "m03_media_features",
      """WITH m AS (SELECT doc_id, 'blob/' || source AS format,
        |                  hex(encode(text)) AS hx,
        |                  octet_length(encode(text)) AS L
        |           FROM documents),
        |v AS (SELECT doc_id, ('0x' || substr(hx, CAST(2*i-1 AS INT), 2))::BIGINT
        |               AS bv
        |      FROM (SELECT doc_id, hx, unnest(range(1, L + 1)) AS i FROM m) t),
        |a AS (SELECT doc_id, sum(bv) AS s, max(bv) AS mx,
        |             count(DISTINCT bv) AS nd
        |      FROM v GROUP BY doc_id)
        |SELECT m.doc_id, format,
        |       CAST(L AS DOUBLE) AS f_len,
        |       CASE WHEN L = 0 THEN 0.0
        |            ELSE CAST(a.s AS DOUBLE) / L END AS f_mean,
        |       CASE WHEN L = 0 THEN 0.0
        |            ELSE CAST(a.mx AS DOUBLE) END AS f_max,
        |       CASE WHEN L = 0 THEN 0.0
        |            ELSE CAST(a.nd AS DOUBLE) END AS f_distinct,
        |       'stub-v1' AS decoder
        |FROM m LEFT JOIN a USING (doc_id)
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      MediaOps.extractFeatures(s,
          MediaOps.mediaTable(Tables.documents(s, d)))
        .select(col("doc_id"), col("format"),
          col("features")(0).as("f_len"), col("features")(1).as("f_mean"),
          col("features")(2).as("f_max"), col("features")(3).as("f_distinct"),
          col("decoder"))
        .orderBy("doc_id")
    },

    // Batched stub resize (MediaOps.resize — box-average the payload
    // bytes into 64 buckets; the resample shape for image thumbnails /
    // audio downsampling). The bucket rule (i·W div L, floored mean)
    // is pure integer arithmetic over the payload BYTES; the oracle
    // recomputes the byte values through hex() (m03's recipe) so the
    // md5 of the resized signal matches exactly on any UTF-8 corpus.
    QueryDef(
      "m04_media_resize",
      """WITH m AS (SELECT doc_id, hex(encode(text)) AS hx,
        |                  octet_length(encode(text)) AS L
        |           FROM documents),
        |pos AS (SELECT doc_id, L, hx, unnest(range(1, L + 1)) AS i FROM m),
        |bk AS (SELECT doc_id, CAST(((i-1) * 64) // L AS INT) AS j,
        |              CAST(sum(('0x' || substr(hx, CAST(2*i-1 AS INT), 2))
        |                       ::BIGINT)
        |                   // count(*) AS INT) AS bv
        |       FROM pos GROUP BY doc_id, j)
        |SELECT doc_id, CAST(count(*) AS INT) AS out_len,
        |       md5(string_agg(bv, ',' ORDER BY j)) AS sig,
        |       CAST(sum(bv) AS BIGINT) AS checksum
        |FROM bk GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
      MediaOps.resize(s, MediaOps.mediaTable(Tables.documents(s, d)))
        .select(col("doc_id"), col("out_len"),
          md5(concat_ws(",", col("resized"))).as("sig"),
          expr("aggregate(resized, 0L, (a, v) -> a + v)").as("checksum"))
        .orderBy("doc_id")
    },

    // Media near-duplicate detection via shared frame fingerprints —
    // the video-dedup shape: sample fixed-offset frames from each
    // binary payload (m02's sampler, here over the payload BYTES),
    // fingerprint each frame, and report media pairs sharing at least
    // one aligned frame signature. Scale design mirrors d04's
    // inverted index: document-frequency FIRST on the (frame_no, sig)
    // key (one long per distinct signature through the shuffle), keep
    // only signatures appearing in 2..100 medias — the upper bound
    // drops pathological hot frames (black/intro frames in real
    // video) that would otherwise blow the candidate join quadratic —
    // then one equi-join on the signature key and a pair-count
    // aggregate. Payloads shorter than 4 x 32 bytes are ineligible
    // (too little signal to fingerprint; also excludes degenerate
    // empty-frame matches). The pair space is never materialized
    // beyond signature-sharing candidates.
    //
    // BYTE semantics throughout — eligibility, frame offsets, and the
    // fingerprinted window are all over the payload BYTES, never
    // characters (a video/image payload has no characters). DuckDB
    // has no blob substring/md5, so the oracle recomputes the same
    // bytes through hex(): byte i of the payload is hex chars
    // [2i-1, 2i] (both engines emit uppercase hex), and the declared
    // frame signature is md5 over the window's hex form on BOTH
    // sides. Parity therefore holds for any UTF-8 corpus, not just an
    // all-ASCII fixture where chars happen to equal bytes.
    QueryDef(
      "m05_frame_dedup",
      """WITH m AS (
        |  SELECT doc_id, hex(encode(text)) AS hx,
        |         octet_length(encode(text)) AS L
        |  FROM documents WHERE octet_length(encode(text)) >= 128),
        |frames AS (
        |  SELECT doc_id, frame_no,
        |         md5(substring(hx, 1 + 2 * frame_no * (L // 4), 64))
        |           AS frame_sig
        |  FROM m, generate_series(0, 3) t(frame_no)),
        |fdf AS (SELECT frame_no, frame_sig FROM frames
        |        GROUP BY frame_no, frame_sig
        |        HAVING count(*) BETWEEN 2 AND 100),
        |rare AS (SELECT f.doc_id, f.frame_no, f.frame_sig
        |         FROM frames f JOIN fdf
        |           ON f.frame_no = fdf.frame_no
        |          AND f.frame_sig = fdf.frame_sig)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |       CAST(count(*) AS INT) AS shared_frames
        |FROM rare a JOIN rare b
        |  ON a.frame_sig = b.frame_sig AND a.frame_no = b.frame_no
        | AND a.doc_id < b.doc_id
        |GROUP BY doc_a, doc_b
        |ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
      val media = MediaOps.mediaTable(Tables.documents(s, d))
        .filter(length(col("payload")) >= 128) // length(binary) = bytes
      val frames = graft.PersistRegistry.cached(
        media.select(col("doc_id"),
            explode(sequence(lit(0), lit(3))).as("frame_no"), col("payload"))
          .select(col("doc_id"), col("frame_no"),
            md5(hex(expr("substring(payload, " +
              "1 + frame_no * (length(payload) div 4), 32)")))
              .as("frame_sig")))
      val fdf = frames.groupBy("frame_no", "frame_sig")
        .agg(count(lit(1)).as("fdf"))
        .filter(col("fdf").between(2, 100))
        .select("frame_no", "frame_sig")
      val rare = frames.join(fdf, Seq("frame_no", "frame_sig"))
      val a = rare.select(col("frame_no").as("fa"),
        col("frame_sig").as("siga"), col("doc_id").as("doc_a"))
      val b = rare.select(col("frame_no").as("fb"),
        col("frame_sig").as("sigb"), col("doc_id").as("doc_b"))
      a.join(b, col("siga") === col("sigb") && col("fa") === col("fb") &&
          col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(count(lit(1)).cast("int").as("shared_frames"))
        .orderBy("doc_a", "doc_b")
    },

    // Perceptual-hash media NEAR-dup — the pHash/dHash video-dedup
    // shape m05's exact frame signatures cannot cover (a re-encoded
    // or slightly-edited payload shares zero exact frames but nearly
    // identical coarse structure). Round 9 shipped this as a 60-bit
    // aHash whose own scale row flagged the fixed keyspace; the first
    // round-10 cut widened the hash to 256 bits but banded it 16 x 16
    // BITS, and ScaleCheck caught the consequence: a 16-bit band
    // keyspace (65k values) turns birthday collisions quadratic —
    // 373.7x shuffle at 25x data (N^2/2^16 junk candidates per band
    // on fingerprints that cluster like word-soup text does).
    //
    // Final design: the fingerprint stays a 256-BIT multi-offset
    // gradient hash (dHash generalized) over m04's 64-bucket
    // stub-resized signal — word k (of 4 BIGINTs), bit j =
    // bucket[j] > bucket[(j + off_k) mod 64], offsets (1, 2, 4, 8):
    // four gradient scales, integer-exact on both engines. Blocking
    // is multi-index Hamming search (MIH): 8 bands x 32 BITS (4.3B
    // values per band — the birthday term N^2/2^32 is negligible to
    // ~100M media), with the hash bits dealt to bands by a FIXED
    // mixing permutation (bit g lands at position (163g + 71) mod
    // 256 — 163 is odd so it is a bijection): CONTIGUOUS bands
    // inherit the gradient's local correlation (adjacent comparisons
    // share buckets, so tie runs make whole sub-words agree across
    // unrelated docs — measured 2.3 mean/270 max exact-key
    // multiplicity and a still-quadratic candidate count at 25x),
    // while mixed bands sample 32 near-independent bits each, so
    // band values spread over the full 2^32 and both exact and
    // 1-bit-neighborhood collisions collapse. Bands stay DISJOINT
    // 32-bit subsets, so every pigeonhole argument below survives
    // the permutation verbatim. On top of that, ADAPTIVE MULTI-PROBE
    // keeps the radius-15 guarantee that 16 exact-match bands gave:
    //   * MIH pigeonhole: Hamming <= 15 over 8 bands => some band
    //     differs in <= floor(15/8) = 1 bit.
    //   * A gradient bit can flip between two versions of a signal
    //     with per-bucket delta <= 1 ONLY at a near-tie comparison:
    //     sign(x-y) changes and |Δ(x-y)| <= 2 forces |x-y| <= 2 on
    //     BOTH sides. A differing bit is SET on exactly one side, so
    //     it suffices for the set side to probe the cleared variant
    //     (canonical direction — halves probe volume): each doc
    //     emits, besides its 8 exact band values, the band value
    //     with bit g cleared for every near-tie comparison g with
    //     diff in [1, 2]. If the <=1 differing bit in the surviving
    //     band is bit g, the set side's probe equals the clear
    //     side's exact value: recall is exact rather than
    //     probabilistic — CONDITIONAL on the 200-cap below dropping
    //     no band key the pair needs (a degenerate corpus where a
    //     pair's only <=1-bit-differing band key is hot would lose
    //     that pair; m06CappedKeyCount observes the precondition —
    //     0 capped keys on the test corpus, spec-pinned, so recall
    //     IS exact there) — and the probe volume is per-doc bounded
    //     (~24 rows/doc measured at sf0.1), never corpus-quadratic.
    // Candidates = probes ⋈ exact keys (per-key candidates bounded
    // by the 200 exact-side frequency cap — m05's hot-pattern rule,
    // so total candidates <= 200·|probes|, linear), then confirmed
    // at true Hamming <= 15 over all 256 bits via two fingerprint
    // joins. At ~1B media the same fingerprint re-bands as 6 x 42
    // bits with 2-flip probes over near-tie pairs — the d14 widening
    // schedule applied to the BAND KEY, never the stored hash.
    //
    // The corpus plants no positionally-aligned payload variants, so
    // the operator is demonstrated the way v06 demonstrates recall —
    // on a deterministic synthetic RE-ENCODE probe: each eligible
    // payload gets a twin (doc_id + 10^12 — OUTSIDE any reachable id
    // space: ScaleCheck's per-copy shift is i*10^9, p03's pack ids
    // are shard*10^12, and the engine side raise_error()s if a
    // source doc_id ever reaches the shift) whose resized signal is
    // perturbed by +1 on every 7th bucket, the stand-in for lossy
    // re-encoding (per-bucket delta 1 — inside the multi-probe
    // contract's bound). Measured twin distances span 0..14 of 256
    // bits while DISTINCT docs sit at a floor of 62 — the <= 15
    // radius captures every twin with a 4x separation margin.
    // Scale: fingerprinting and probe generation are map-only on
    // top of the resize; the blocking join shuffles the exact keys
    // (8 rows/media) plus the near-tie probes (data-dependent,
    // per-media bounded by the 256 comparisons). Byte semantics
    // throughout via the m03/m04 hex recipe — parity on any UTF-8
    // corpus.
    QueryDef(
      "m06_phash_neardup",
      """WITH m AS (SELECT doc_id, hex(encode(text)) AS hx,
        |                  octet_length(encode(text)) AS L
        |           FROM documents
        |           WHERE octet_length(encode(text)) >= 128),
        |pos AS (SELECT doc_id, L, hx, unnest(range(1, L + 1)) AS i FROM m),
        |bk AS (SELECT doc_id, CAST(((i-1) * 64) // L AS INT) AS j,
        |              CAST(sum(('0x' || substr(hx, CAST(2*i-1 AS INT), 2))
        |                       ::BIGINT)
        |                   // count(*) AS INT) AS bv
        |       FROM pos GROUP BY doc_id, j),
        |al AS (SELECT doc_id, j, bv FROM bk
        |       UNION ALL
        |       SELECT doc_id + 1000000000000, j,
        |              bv + CASE WHEN j % 7 = 0 THEN 1 ELSE 0 END
        |       FROM bk),
        |cmp AS (SELECT a.doc_id, o.k, a.j, a.bv AS x, b.bv AS y
        |        FROM al a
        |        JOIN (VALUES (0,1),(1,2),(2,4),(3,8)) o(k, off) ON true
        |        JOIN al b ON b.doc_id = a.doc_id
        |                 AND b.j = (a.j + o.off) % 64),
        |g AS (SELECT doc_id, k,
        |             bit_or(CASE WHEN x > y THEN
        |                      CASE WHEN j = 63
        |                           THEN (-9223372036854775807-1)::BIGINT
        |                           ELSE (1::BIGINT << j) END
        |                    ELSE 0::BIGINT END) AS w
        |      FROM cmp GROUP BY doc_id, k),
        |fp AS (SELECT doc_id,
        |              max(CASE WHEN k=0 THEN w END) AS w0,
        |              max(CASE WHEN k=1 THEN w END) AS w1,
        |              max(CASE WHEN k=2 THEN w END) AS w2,
        |              max(CASE WHEN k=3 THEN w END) AS w3
        |       FROM g GROUP BY doc_id),
        |bits AS (SELECT doc_id, g,
        |              ((CASE g // 64 WHEN 0 THEN w0 WHEN 1 THEN w1
        |                             WHEN 2 THEN w2 ELSE w3 END)
        |               >> (g % 64)) & 1 AS bit,
        |              ((g * 163 + 71) % 256) // 32 AS b,
        |              ((g * 163 + 71) % 256) % 32 AS slot
        |         FROM fp, generate_series(0, 255) t(g)),
        |eb AS (SELECT doc_id, b, bit_or(bit << slot) AS bv
        |       FROM bits GROUP BY doc_id, b),
        |ties AS (SELECT doc_id, k * 64 + j AS gidx
        |         FROM cmp WHERE x - y BETWEEN 1 AND 2),
        |pr AS (SELECT doc_id, b, bv FROM eb
        |       UNION ALL
        |       SELECT t.doc_id,
        |              ((t.gidx * 163 + 71) % 256) // 32 AS b,
        |              xor(e.bv, 1::BIGINT <<
        |                  (((t.gidx * 163 + 71) % 256) % 32)) AS bv
        |       FROM ties t JOIN eb e
        |         ON e.doc_id = t.doc_id
        |        AND e.b = ((t.gidx * 163 + 71) % 256) // 32),
        |keep AS (SELECT b, bv FROM eb GROUP BY b, bv
        |         HAVING count(*) <= 200),
        |cand AS (SELECT DISTINCT least(p.doc_id, e.doc_id) AS doc_a,
        |                greatest(p.doc_id, e.doc_id) AS doc_b
        |         FROM pr p JOIN keep USING (b, bv)
        |              JOIN eb e ON p.b = e.b AND p.bv = e.bv
        |               AND p.doc_id <> e.doc_id)
        |SELECT c.doc_a, c.doc_b,
        |       CAST(bit_count(xor(fa.w0, fb.w0)) AS INT)
        |       + CAST(bit_count(xor(fa.w1, fb.w1)) AS INT)
        |       + CAST(bit_count(xor(fa.w2, fb.w2)) AS INT)
        |       + CAST(bit_count(xor(fa.w3, fb.w3)) AS INT) AS hamming
        |FROM cand c
        |JOIN fp fa ON fa.doc_id = c.doc_a
        |JOIN fp fb ON fb.doc_id = c.doc_b
        |WHERE CAST(bit_count(xor(fa.w0, fb.w0)) AS INT)
        |      + CAST(bit_count(xor(fa.w1, fb.w1)) AS INT)
        |      + CAST(bit_count(xor(fa.w2, fb.w2)) AS INT)
        |      + CAST(bit_count(xor(fa.w3, fb.w3)) AS INT) <= 15
        |ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
      // fingerprints + twins: see m06Fingerprints above. The cache is
      // released by the caller through PersistRegistry (and
      // materialized eagerly there — three downstream branches scan
      // fpr, and lazy materialization let their concurrent stages
      // each recompute the fingerprint map: ~2.4 s of the round-10
      // stamped cost).
      val fpr = graft.PersistRegistry.cached(m06Fingerprints(s, d))
      val bandArr = array((0 until 8).map(b => col(s"bv$b")): _*)
      // exact MIH keys, one row per (media, band)
      val eb = fpr.select(col("doc_id"), posexplode(bandArr))
        .toDF("doc_id", "b", "bv")
      // adaptive multi-probe keys: for every near-tie comparison
      // (global bit g: word g div 64, bucket pair (g % 64, +off)),
      // the band value with bit g flipped — the only single-bit
      // corruptions a delta-bounded re-encode can produce. Canonical
      // direction halves the volume: a pair differing at bit g has
      // the bit SET on exactly one side, so only that side probes
      // the cleared variant (bit set <=> diff >= 1; near-tie at the
      // contract's delta <=> diff <= 2) — the 0-side's exact key is
      // the match target. Measured on sf0.1 eligible media: ~24
      // probe rows/doc (vs 8 exact keys), per-doc bounded. Probe
      // keys come precomputed from the fingerprint kernel (one
      // explode — the former 256-element interpreted HOF filter per
      // row is gone).
      val tieRows = fpr
        .select(col("doc_id"), explode(col("probes")).as("p"))
        .select(col("doc_id"), col("p._1").as("b"), col("p._2").as("bv"))
      val pr = eb.unionByName(tieRows)
      // hot-pattern cap on the EXACT side only (no lower bound: a
      // singleton exact key is a legitimate probe target) — total
      // candidates <= 200 * |probes|, linear by construction
      val keep = eb.groupBy("b", "bv")
        .agg(count(lit(1)).as("n"))
        .filter(col("n") <= 200)
        .select("b", "bv")
      val cand = pr.select(col("b"), col("bv"), col("doc_id").as("doc_p"))
        .join(keep, Seq("b", "bv"))
        .join(eb.select(col("b"), col("bv"), col("doc_id").as("doc_e")),
          Seq("b", "bv"))
        .filter(col("doc_p") =!= col("doc_e"))
        .select(least(col("doc_p"), col("doc_e")).as("doc_a"),
          greatest(col("doc_p"), col("doc_e")).as("doc_b"))
        .distinct()
      val fa = fpr.select(col("doc_id").as("doc_a"), col("w0").as("a0"),
        col("w1").as("a1"), col("w2").as("a2"), col("w3").as("a3"))
      val fb = fpr.select(col("doc_id").as("doc_b"), col("w0").as("c0"),
        col("w1").as("c1"), col("w2").as("c2"), col("w3").as("c3"))
      val ham = (0 until 4)
        .map(k => bit_count(col(s"a$k").bitwiseXOR(col(s"c$k"))).cast("int"))
        .reduce(_ + _)
      cand.join(fa, "doc_a").join(fb, "doc_b")
        .select(col("doc_a"), col("doc_b"), ham.as("hamming"))
        .filter(col("hamming") <= 15)
        .orderBy("doc_a", "doc_b")
    },
  )
}
