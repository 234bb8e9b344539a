package graft.operators

import org.apache.spark.sql.functions._

import graft.multimodal.MediaOps
import graft.sources.Tables

/** Multimodal-column operators (binary payload + typed metadata over
  * the documents corpus — see MediaOps for the stub-decoder policy).
  */
object MediaQueries {

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
    // aHash, and its own scale row flagged the flaw: a FIXED 60-bit
    // keyspace saturates as N grows (107.9x in-bucket shuffle at
    // 25x), and the rescue was a payload-size side key. Round 10
    // applies d14's widening lesson to the hash ITSELF: a 256-BIT
    // multi-offset gradient hash (dHash generalized) over m04's
    // 64-bucket stub-resized signal — word k (of 4 BIGINTs), bit j =
    // bucket[j] > bucket[(j + off_k) mod 64], offsets (1, 2, 4, 8):
    // four gradient scales, integer-exact on both engines. Banding
    // is 16 bands x 16 BITS (the >=16-bit width the keyspace needs
    // to grow with N; at 1B+ docs the same 256 bits re-band as
    // 8 x 32 without touching the fingerprint), candidates share a
    // band value, confirmed at true Hamming <= 15 over all 256 bits
    // — the pigeonhole bound: <= 15 flipped bits can corrupt at most
    // 15 of 16 bands, so every true pair ALWAYS shares a band.
    // Measured on the corpus: the bare (band, value) key now spreads
    // cleanly (max bucket occupancy 46 at sf0.1, ZERO buckets at the
    // 200 cap) — no size side key needed; the 2..200 band-frequency
    // cap (m05's hot-frame rule) stays as the bound on any
    // degenerate bucket a real corpus might plant.
    //
    // The corpus plants no positionally-aligned payload variants, so
    // the operator is demonstrated the way v06 demonstrates recall —
    // on a deterministic synthetic RE-ENCODE probe: each eligible
    // payload gets a twin (doc_id + 10^12 — OUTSIDE any reachable id
    // space: ScaleCheck's per-copy shift is i*10^9, p03's pack ids
    // are shard*10^12, and the engine side raise_error()s if a
    // source doc_id ever reaches the shift) whose resized signal is
    // perturbed by +1 on every 7th bucket, the stand-in for lossy
    // re-encoding. Text bucket means cluster tightly, so the
    // perturbation flips every near-tie comparison it touches:
    // measured twin distances span 0..14 of 256 bits while DISTINCT
    // docs sit at a floor of 62 — the <= 15 radius captures every
    // twin (perfect recall by pigeonhole) with a 4x separation
    // margin. Scale: fingerprinting is map-only on top of the
    // resize; the band join shuffles 16 shorts per media. Byte
    // semantics throughout via the m03/m04 hex recipe — parity on
    // any UTF-8 corpus.
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
        |g AS (SELECT a.doc_id, o.k,
        |             bit_or(CASE WHEN a.bv > b.bv THEN
        |                      CASE WHEN a.j = 63
        |                           THEN (-9223372036854775807-1)::BIGINT
        |                           ELSE (1::BIGINT << a.j) END
        |                    ELSE 0::BIGINT END) AS w
        |      FROM al a
        |      JOIN (VALUES (0,1),(1,2),(2,4),(3,8)) o(k, off) ON true
        |      JOIN al b ON b.doc_id = a.doc_id AND b.j = (a.j + o.off) % 64
        |      GROUP BY a.doc_id, o.k),
        |fp AS (SELECT doc_id,
        |              max(CASE WHEN k=0 THEN w END) AS w0,
        |              max(CASE WHEN k=1 THEN w END) AS w1,
        |              max(CASE WHEN k=2 THEN w END) AS w2,
        |              max(CASE WHEN k=3 THEN w END) AS w3
        |       FROM g GROUP BY doc_id),
        |bands AS (SELECT doc_id, w0, w1, w2, w3, b,
        |                 ((CASE b // 4 WHEN 0 THEN w0 WHEN 1 THEN w1
        |                               WHEN 2 THEN w2 ELSE w3 END)
        |                  >> ((b % 4) * 16)) & 65535 AS bv
        |          FROM fp, generate_series(0, 15) t(b)),
        |keep AS (SELECT b, bv FROM bands GROUP BY b, bv
        |         HAVING count(*) BETWEEN 2 AND 200),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b,
        |                a.w0 AS a0, a.w1 AS a1, a.w2 AS a2, a.w3 AS a3,
        |                c.w0 AS c0, c.w1 AS c1, c.w2 AS c2, c.w3 AS c3
        |         FROM bands a JOIN keep USING (b, bv)
        |              JOIN bands c ON a.b = c.b AND a.bv = c.bv
        |               AND a.doc_id < c.doc_id)
        |SELECT doc_a, doc_b,
        |       CAST(bit_count(xor(a0, c0)) AS INT)
        |       + CAST(bit_count(xor(a1, c1)) AS INT)
        |       + CAST(bit_count(xor(a2, c2)) AS INT)
        |       + CAST(bit_count(xor(a3, c3)) AS INT) AS hamming
        |FROM cand
        |WHERE CAST(bit_count(xor(a0, c0)) AS INT)
        |      + CAST(bit_count(xor(a1, c1)) AS INT)
        |      + CAST(bit_count(xor(a2, c2)) AS INT)
        |      + CAST(bit_count(xor(a3, c3)) AS INT) <= 15
        |ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
      val TwinShift = 1000000000000L
      val media = MediaOps.mediaTable(Tables.documents(s, d))
        .filter(length(col("payload")) >= 128)
      val rs = MediaOps.resize(s, media) // doc_id, out_len, resized
      // L >= 128 => every one of the 64 buckets is populated.
      // Guard (distributed, zero-cost until violated): a source
      // doc_id at or past the twin shift would alias a twin id and
      // silently corrupt the probe's planted truth — fail loudly.
      val twins = rs.select(
        when(col("doc_id") >= TwinShift,
          raise_error(concat(lit("m06: source doc_id "), col("doc_id"),
            lit(s" >= twin shift $TwinShift"))))
          .otherwise(col("doc_id") + TwinShift).as("doc_id"),
        transform(col("resized"),
          (v, j) => v + when(j % 7 === 0, 1).otherwise(0)).as("resized"))
      val all = rs.select(col("doc_id"), col("resized")).unionByName(twins)
      // 256-bit gradient fingerprint, one word per comparison offset —
      // pure per-row expressions (map-only; bitwiseOR keeps every term
      // a bit-pattern op, no ANSI-overflow surface)
      val offsets = Seq(1, 2, 4, 8)
      val wordCols = offsets.zipWithIndex.map { case (off, k) =>
        (0 until 64).map { j =>
          when(element_at(col("resized"), j + 1) >
            element_at(col("resized"), (j + off) % 64 + 1),
            lit(1L << j)).otherwise(lit(0L))
        }.reduce(_ bitwiseOR _).as(s"w$k")
      }
      val fp = graft.PersistRegistry.cached(
        all.select(col("doc_id") +: wordCols: _*))
      val bands = fp
        .select(col("doc_id"), col("w0"), col("w1"), col("w2"), col("w3"),
          explode(sequence(lit(0), lit(15))).as("b"))
        .withColumn("bv",
          expr("shiftright(element_at(array(w0, w1, w2, w3), " +
            "CAST(b div 4 AS INT) + 1), CAST((b % 4) * 16 AS INT)) " +
            "& CAST(65535 AS BIGINT)"))
      val keep = bands.groupBy("b", "bv")
        .agg(count(lit(1)).as("n"))
        .filter(col("n").between(2, 200))
        .select("b", "bv")
      val rare = bands.join(keep, Seq("b", "bv"))
      val a = rare.select(col("b").as("ba"), col("bv").as("bva"),
        col("doc_id").as("doc_a"), col("w0").as("a0"), col("w1").as("a1"),
        col("w2").as("a2"), col("w3").as("a3"))
      val c = rare.select(col("b").as("bc"), col("bv").as("bvc"),
        col("doc_id").as("doc_b"), col("w0").as("c0"), col("w1").as("c1"),
        col("w2").as("c2"), col("w3").as("c3"))
      val ham = (0 until 4)
        .map(k => bit_count(col(s"a$k").bitwiseXOR(col(s"c$k"))).cast("int"))
        .reduce(_ + _)
      a.join(c, col("ba") === col("bc") && col("bva") === col("bvc") &&
          col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          col("a0"), col("a1"), col("a2"), col("a3"),
          col("c0"), col("c1"), col("c2"), col("c3")).distinct()
        .select(col("doc_a"), col("doc_b"), ham.as("hamming"))
        .filter(col("hamming") <= 15)
        .orderBy("doc_a", "doc_b")
    },
  )
}
