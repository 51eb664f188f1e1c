package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{MinHashLsh, SimHash, TextFns}
import graft.multimodal.Multimodal

/** Training-data-pipeline queries over the `documents` table: exact +
  * near dedup (MinHash/LSH, n-gram Jaccard, SimHash), text analysis
  * (tokens, quality, language-ID, fingerprints), and the multimodal
  * binary-column stub.
  *
  * Oracle parity notes:
  *  - shingling = word n-grams over a literal single-space split, so
  *    DuckDB's `string_split` and Spark's `split` agree exactly;
  *  - all hashes are md5 hex strings (portable); MinHash compares
  *    digests lexicographically — a total order is all MinHash needs;
  *  - SimHash bit extraction is integer arithmetic on hex nibbles.
  */
object DocQueries {

  private val MinhashK = 12
  private val Bands = 4

  /** DuckDB CTEs producing distinct (doc_id, sh) word n-gram shingles. */
  private[queries] def shingleCtes(n: Int, withSource: Boolean = false): String = {
    val src = if (withSource) ", source" else ""
    val gram = (0 until n).map(o => s"t[i+$o]").mkString(" || ' ' || ")
    s"""toks AS (SELECT doc_id$src, string_split(text, ' ') AS t FROM documents),
        idx AS (SELECT doc_id$src, t, unnest(range(1, greatest(len(t) - ${n - 2}, 1))) AS i FROM toks),
        sh AS (SELECT DISTINCT doc_id$src, $gram AS sh FROM idx WHERE i + ${n - 1} <= len(t))"""
  }

  /** DuckDB CTE: 28-bit base hash per (doc_id, sh) — the same
    * 2-universal MinHash family as `MinHashLsh.baseHash`.
    */
  private def hashCte: String = s"""
        hh AS (SELECT doc_id,
                      CAST('0x' || substr(md5(sh), 1, 7) AS BIGINT)
                        % ${MinHashLsh.P} AS x
               FROM sh)"""

  private def sigSelect: String =
    (0 until MinhashK).map(i =>
      s"min((x * ${MinHashLsh.aConst(i)} + ${MinHashLsh.bConst(i)})" +
        s" % ${MinHashLsh.P}) AS s$i").mkString(", ")

  val queries: Map[String, Q] = Map(
    // ---- exact dedup: hash-groupBy ---------------------------------
    "q21_doc_exact_dedup" -> Q(
      impl = (s, d) =>
        Tables.load(s, d, "documents")
          .groupBy(md5(col("text")).as("h"))
          .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
          .select("keep_id", "n_copies")
          .orderBy("keep_id"),
      oracle = Some("""
        SELECT CAST(min(doc_id) AS BIGINT) AS keep_id,
               CAST(count(*) AS BIGINT) AS n_copies
        FROM documents GROUP BY md5(text) ORDER BY keep_id""")),

    // ---- token counting --------------------------------------------
    "q22_doc_tokens" -> Q(
      impl = (s, d) =>
        Tables.load(s, d, "documents")
          .select(
            col("doc_id"),
            TextFns.tokenCount(col("text")).cast("long").as("n_tokens"),
            size(TextFns.tokensWs(col("text"))).cast("long").as("n_ws_tokens"),
            length(col("text")).cast("long").as("n_chars_actual"))
          .orderBy("doc_id"),
      oracle = Some("""
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_tokens,
               len(string_split_regex(text, '\s+')) AS n_ws_tokens,
               length(text) AS n_chars_actual
        FROM documents ORDER BY doc_id""")),

    // ---- quality scoring -------------------------------------------
    "q23_doc_quality" -> Q(
      impl = (s, d) =>
        Tables.load(s, d, "documents")
          .select(
            col("doc_id"),
            length(col("text")).cast("long").as("n_chars_actual"),
            TextFns.punctRatio(col("text")).as("punct_ratio"),
            TextFns.meanTokenLength(col("text")).as("mean_tok_len"),
            TextFns.stopwordRatio(col("text"),
              Seq("the", "a", "of", "and", "to")).as("stop_ratio"))
          .orderBy("doc_id"),
      oracle = Some("""
        SELECT doc_id,
               length(text) AS n_chars_actual,
               round(length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) / length(text), 4)
                 AS punct_ratio,
               round((length(text) - (length(text) - length(replace(text, ' ', ''))))
                 / ((length(text) - length(replace(text, ' ', ''))) + 1), 4) AS mean_tok_len,
               round(len(list_filter(string_split(text, ' '),
                 x -> x IN ('the', 'a', 'of', 'and', 'to')))
                 / len(string_split(text, ' ')), 4) AS stop_ratio
        FROM documents ORDER BY doc_id""")),

    // ---- language-ID heuristic -------------------------------------
    "q24_doc_langid" -> Q(
      impl = (s, d) =>
        Tables.load(s, d, "documents")
          .withColumn("t", TextFns.tokens(col("text")))
          .select(
            col("doc_id"),
            TextFns.langScoreFromTokens(col("t"), "en").cast("long").as("s_en"),
            TextFns.langScoreFromTokens(col("t"), "de").cast("long").as("s_de"),
            TextFns.langScoreFromTokens(col("t"), "fr").cast("long").as("s_fr"),
            TextFns.langIdentifyFromTokens(col("t")).as("pred_lang"))
          .orderBy("doc_id"),
      oracle = Some {
        def score(words: Seq[String]) =
          s"len(list_filter(string_split(text, ' '), x -> x IN (${words.map(w => s"'$w'").mkString(", ")})))"
        val en = score(TextFns.langMarkers("en"))
        val de = score(TextFns.langMarkers("de"))
        val fr = score(TextFns.langMarkers("fr"))
        s"""
        SELECT doc_id, $en AS s_en, $de AS s_de, $fr AS s_fr,
               CASE WHEN $en >= $de AND $en >= $fr THEN 'en'
                    WHEN $de >= $fr THEN 'de'
                    ELSE 'fr' END AS pred_lang
        FROM documents ORDER BY doc_id"""
      }),

    // ---- document fingerprinting -----------------------------------
    "q25_doc_fingerprint" -> Q(
      impl = (s, d) =>
        Tables.load(s, d, "documents")
          .select(
            col("doc_id"),
            TextFns.fingerprint(col("text")).as("fp"),
            substring(TextFns.fingerprint(col("text")), 1, 8).as("fp_prefix"))
          .orderBy("doc_id"),
      oracle = Some("""
        SELECT doc_id,
               md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
               substr(md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))), 1, 8) AS fp_prefix
        FROM documents ORDER BY doc_id""")),

    // ---- MinHash signatures (k=12, word 3-gram shingles) -----------
    "q26_minhash_sig" -> Q(
      impl = (s, d) => {
        // One-pass local form: each doc's k mins complete inside the
        // scan (no shingle explode, no aggregation shuffle); values
        // are bit-equal to the exploded formulation (MinHashAggSpec).
        val docs = Tables.docsParallel(s, d)
          .withColumn("t", TextFns.tokens(col("text")))
        MinHashLsh.signaturesFromTokens(docs, "doc_id", "t", 3, MinhashK)
          .orderBy("doc_id")
      },
      oracle = Some(s"""
        WITH ${shingleCtes(3)}, $hashCte
        SELECT doc_id, $sigSelect
        FROM hh GROUP BY doc_id ORDER BY doc_id"""),
      bench = true),

    // ---- LSH candidate pairs (4 bands × 3 rows) --------------------
    "q27_lsh_pairs" -> Q(
      impl = (s, d) => {
        val docs = Tables.docsParallel(s, d)
          .withColumn("t", TextFns.tokens(col("text")))
        val sigs =
          MinHashLsh.signaturesFromTokens(docs, "doc_id", "t", 3, MinhashK)
        MinHashLsh.candidatePairs(sigs, "doc_id", MinhashK, Bands)
          .orderBy("a", "b")
      },
      oracle = Some {
        val r = MinhashK / Bands
        val bandRows = (0 until Bands).map { b =>
          val key = (b * r until (b + 1) * r).map(i => s"s$i")
            .mkString(" || '|' || ")
          s"SELECT doc_id, $b AS band, ${MinHashLsh.bandKeySql(key)} AS key, " +
            (0 until MinhashK).map(i => s"s$i").mkString(", ") + " FROM sig"
        }.mkString("\n UNION ALL\n ")
        val matches = (0 until MinhashK)
          .map(i => s"CASE WHEN l.s$i = r.s$i THEN 1 ELSE 0 END").mkString(" + ")
        s"""
        WITH ${shingleCtes(3)}, $hashCte,
        sig AS (SELECT doc_id, $sigSelect FROM hh GROUP BY doc_id),
        band AS ($bandRows)
        SELECT DISTINCT l.doc_id AS a, r.doc_id AS b,
               round(($matches) / ${MinhashK.toDouble}, 4) AS est
        FROM band l JOIN band r
          ON l.band = r.band AND l.key = r.key AND l.doc_id < r.doc_id
        ORDER BY a, b"""
      }),

    // ---- exact n-gram Jaccard within source ------------------------
    "q28_ngram_jaccard" -> Q(
      impl = (s, d) => {
        // Jaccard counts DISTINCT shingle sets — and distinctness per
        // (doc, shingle) never crosses documents, so each doc's set is
        // built inside a typed flatMap (local hash set, no corpus-wide
        // dedup shuffle), then reduced to 64-bit xxhash64 ints: every
        // downstream shuffle (self-join sides, sizes) moves 8-byte
        // native keys instead of n-gram strings. The hash is internal
        // identity only, so the oracle joins raw shingle strings —
        // intersection counts agree up to negligible 64-bit collisions.
        // Partition by the JOIN key (source, sh) up front: both
        // self-join sides reuse this exact partitioning, so the
        // persisted frame is shuffled once, not twice.
        val sh = TextFns
          .distinctShinglesBySource(Tables.docsParallel(s, d), 2)
          .select(col("doc_id"), col("source"), xxhash64(col("shs")).as("sh"))
          .repartition(col("source"), col("sh"))
          .persist()
        val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
        val x = sh.toDF("a", "source", "sh")
        val y = sh.toDF("b", "source", "sh")
        val inter = x.join(y, Seq("source", "sh"))
          .filter(col("a") < col("b"))
          .groupBy("a", "b")
          .agg(count(lit(1)).as("c"))
        val j = inter
          .join(sizes.toDF("a", "na"), "a")
          .join(sizes.toDF("b", "nb"), "b")
          .withColumn("jaccard", round(col("c") / (col("na") + col("nb") - col("c")), 4))
          .filter(col("jaccard") >= 0.05)
        j.select("a", "b", "jaccard").orderBy("a", "b")
      },
      oracle = Some(s"""
        WITH ${shingleCtes(2, withSource = true)},
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        inter AS (
          SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS c
          FROM sh x JOIN sh y
            ON x.source = y.source AND x.sh = y.sh AND x.doc_id < y.doc_id
          GROUP BY 1, 2)
        SELECT a, b, round(c / (sa.n + sb.n - c), 4) AS jaccard
        FROM inter
          JOIN sizes sa ON sa.doc_id = a
          JOIN sizes sb ON sb.doc_id = b
        WHERE round(c / (sa.n + sb.n - c), 4) >= 0.05
        ORDER BY a, b""")),

    // ---- SimHash fingerprints --------------------------------------
    "q29_simhash" -> Q(
      impl = (s, d) =>
        // one-pass hash-dedup fingerprints (round 19 retired the
        // string-dedup compatibility mode): per-doc tokens dedup on
        // the 16-bit md5 prefix, the oracle on its hex form — a
        // bijection, so both sides select the same vote set
        // (SimHashOnePassSpec pins it)
        SimHash.fingerprintsFromTokens(
          Tables.docsParallel(s, d)
            .withColumn("t", split(col("text"), " ")),
          "doc_id", "t", 1)
          .select(col("doc_id"), col("sh").as("simhash"))
          .orderBy("doc_id"),
      oracle = Some {
        val bitSums = (0 until SimHash.bits).map { b =>
          val hexPos = 4 - b / 4
          val pw = 1 << (b % 4)
          val nib = s"(instr('0123456789abcdef', substr(hx, $hexPos, 1)) - 1)"
          s"CASE WHEN 2 * sum(($nib // $pw) % 2) > count(*) THEN ${1L << b} ELSE 0 END"
        }.mkString(" + ")
        s"""
        WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                    FROM documents),
        hx AS (SELECT DISTINCT doc_id, substr(md5(tok), 1, 4) AS hx FROM tk)
        SELECT doc_id, CAST($bitSums AS BIGINT) AS simhash
        FROM hx GROUP BY doc_id ORDER BY doc_id"""
      }),

    // ---- end-to-end corpus cleaning: the composed training-data
    // pipeline — quality filter → language filter → exact dedup →
    // LSH near-dup removal → surviving document ids ------------------
    "q58_corpus_pipeline" -> Q(
      impl = (s, d) => {
        val docs = Tables.docsParallel(s, d)
          .withColumn("t", TextFns.tokens(col("text")))
        val filtered = docs.filter(
          TextFns.punctRatio(col("text")) < 0.1
            && size(col("t")) >= 10
            && TextFns.langIdentifyFromTokens(col("t")) === "en")
        // exact dedup: keep the smallest doc_id per content hash
        val keepIds = filtered
          .groupBy(md5(col("text")).as("h"))
          .agg(min("doc_id").as("doc_id"))
          .select("doc_id")
        val kept = filtered.join(keepIds, Seq("doc_id"), "left_semi")
          .persist()
        // near-dup removal: LSH candidates with est >= 0.5 drop the
        // larger id of each pair
        val sigs =
          MinHashLsh.signaturesFromTokens(kept, "doc_id", "t", 3, MinhashK)
        val dropIds = MinHashLsh.candidatePairs(sigs, "doc_id", MinhashK, Bands)
          .filter(col("est") >= 0.5)
          .select(col("b").as("doc_id")).distinct()
        kept.join(dropIds, Seq("doc_id"), "left_anti")
          .select("doc_id")
          .orderBy("doc_id")
      },
      oracle = Some {
        val r = MinhashK / Bands
        val bandRows = (0 until Bands).map { b =>
          val key = (b * r until (b + 1) * r).map(i => s"s$i")
            .mkString(" || '|' || ")
          s"SELECT doc_id, $b AS band, ${MinHashLsh.bandKeySql(key)} AS key, " +
            (0 until MinhashK).map(i => s"s$i").mkString(", ") + " FROM sig"
        }.mkString("\n UNION ALL\n ")
        val matches = (0 until MinhashK)
          .map(i => s"CASE WHEN l.s$i = r.s$i THEN 1 ELSE 0 END").mkString(" + ")
        s"""
        WITH filtered AS (
          SELECT doc_id, text FROM documents
          WHERE round(length(regexp_replace(text, '[a-z0-9 ]', '', 'g'))
                  / length(text), 4) < 0.1
            AND len(string_split(text, ' ')) >= 10
            AND (CASE WHEN len(list_filter(string_split(text, ' '),
                        x -> x IN ('the', 'a', 'of', 'and', 'to')))
                      >= len(list_filter(string_split(text, ' '),
                        x -> x IN ('der', 'die', 'das', 'und', 'ist')))
                   AND len(list_filter(string_split(text, ' '),
                        x -> x IN ('the', 'a', 'of', 'and', 'to')))
                      >= len(list_filter(string_split(text, ' '),
                        x -> x IN ('le', 'la', 'les', 'et', 'est')))
                 THEN 'en'
                 WHEN len(list_filter(string_split(text, ' '),
                        x -> x IN ('der', 'die', 'das', 'und', 'ist')))
                      >= len(list_filter(string_split(text, ' '),
                        x -> x IN ('le', 'la', 'les', 'et', 'est')))
                 THEN 'de' ELSE 'fr' END) = 'en'),
        kept AS (
          SELECT doc_id, text FROM filtered
          WHERE doc_id IN (SELECT min(doc_id) FROM filtered GROUP BY md5(text))),
        toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM kept),
        idx AS (SELECT doc_id, t,
                       unnest(range(1, greatest(len(t) - 1, 1))) AS i FROM toks),
        sh AS (SELECT DISTINCT doc_id,
                      t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
               FROM idx WHERE i + 2 <= len(t)), $hashCte,
        sig AS (SELECT doc_id, $sigSelect FROM hh GROUP BY doc_id),
        band AS ($bandRows),
        pairs AS (
          SELECT DISTINCT l.doc_id AS a, r.doc_id AS b,
                 round(($matches) / ${MinhashK.toDouble}, 4) AS est
          FROM band l JOIN band r
            ON l.band = r.band AND l.key = r.key AND l.doc_id < r.doc_id),
        dropids AS (SELECT DISTINCT b AS doc_id FROM pairs WHERE est >= 0.5)
        SELECT doc_id FROM kept
        WHERE doc_id NOT IN (SELECT doc_id FROM dropids)
        ORDER BY doc_id"""
      },
      bench = true),

    // ---- multimodal binary columns: REAL header decode. Payloads
    // carry byte-exact PNG/GIF/BMP headers (format rotates by doc_id)
    // and the decoder sniffs magic bytes + extracts dimensions at each
    // format's offsets/endianness. The oracle recomputes dims from the
    // generator formulas and size from text length + per-format header
    // size — a wrong offset or endianness on either side breaks the
    // hash match -----------------------------------------------------
    "q32_media_decode" -> Q(
      impl = (s, d) => Multimodal.decodeStats(s, d),
      oracle = Some("""
        SELECT source,
               CASE doc_id % 5 WHEN 0 THEN 'png' WHEN 1 THEN 'gif'
                 WHEN 2 THEN 'bmp' WHEN 3 THEN 'jpeg' ELSE 'wav' END AS format,
               CAST(count(*) AS BIGINT) AS n_media,
               CAST(sum(CASE WHEN doc_id % 5 = 4 THEN 0
                 ELSE 1 + doc_id % 1920 END) AS BIGINT) AS sum_width,
               CAST(sum(CASE WHEN doc_id % 5 = 4 THEN 0
                 ELSE 1 + (doc_id * 7) % 1080 END) AS BIGINT) AS sum_height,
               CAST(sum(CASE WHEN doc_id % 5 = 4
                 THEN octet_length(encode(text)) * 1000 // 32000
                 ELSE 0 END) AS BIGINT) AS sum_duration_ms,
               CAST(sum(octet_length(encode(text)) +
                 CASE doc_id % 5 WHEN 0 THEN 33 WHEN 1 THEN 13
                   WHEN 2 THEN 26 WHEN 3 THEN 39 ELSE 44 END) AS BIGINT) AS sum_bytes
        FROM documents
        GROUP BY 1, 2 ORDER BY source, format"""))
  )
}
