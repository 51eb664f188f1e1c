package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.AsOfJoin

/** Round-8 batch eight: snapshot diffing (replication/backup
  * validation), SCD-2 validity-interval construction (the warehouse
  * history-table build), and last-touch attribution on the native
  * as-of join.
  */
object Extended15 {

  val queries: Map[String, Q] = Map(
    // ---- snapshot diff: classify every row of two table snapshots as
    // added / removed / changed / unchanged via ONE full outer join on
    // the key with content-hash compare — the anti-entropy check a
    // replicated store runs after a migration. The second snapshot is
    // derived deterministically in-query (md5-prefix buckets: 'a'
    // deleted, 'b' rewritten, 'c' duplicated under a shifted id as
    // additions) so both engines see identical inputs. One hash
    // shuffle per side on the join key --------------------------------
    "q151_snapshot_diff" -> Q(
      impl = (s, d) => {
        val old = Tables.load(s, d, "documents")
          .select(col("doc_id"), md5(col("text")).as("h"))
        val neu = old.filter(!col("h").startsWith("a"))
          .withColumn("h",
            when(col("h").startsWith("b"), md5(concat(col("h"), lit("v2"))))
              .otherwise(col("h")))
          .unionByName(old.filter(col("h").startsWith("c"))
            .select((col("doc_id") + 1000000000L).as("doc_id"), col("h")))
        old.toDF("id", "oh").join(neu.toDF("id", "nh"), Seq("id"), "full_outer")
          .select(
            when(col("oh").isNull, "added")
              .when(col("nh").isNull, "removed")
              .when(col("oh") =!= col("nh"), "changed")
              .otherwise("unchanged").as("status"))
          .groupBy("status").agg(count(lit(1)).as("n"))
          .orderBy("status")
      },
      oracle = Some("""
        WITH old AS (SELECT doc_id, md5(text) AS h FROM documents),
        neu AS (SELECT doc_id,
                       CASE WHEN h LIKE 'b%' THEN md5(h || 'v2') ELSE h END AS h
                FROM old WHERE h NOT LIKE 'a%'
                UNION ALL
                SELECT doc_id + 1000000000, h FROM old WHERE h LIKE 'c%'),
        j AS (SELECT CASE WHEN o.h IS NULL THEN 'added'
                          WHEN n.h IS NULL THEN 'removed'
                          WHEN o.h <> n.h THEN 'changed'
                          ELSE 'unchanged' END AS status
              FROM old o FULL OUTER JOIN neu n ON n.doc_id = o.doc_id)
        SELECT status, CAST(count(*) AS BIGINT) AS n
        FROM j GROUP BY 1 ORDER BY 1""")),

    // ---- SCD-2 validity intervals: each 'error' event opens a
    // version valid [its time, next same-user error); the open row
    // carries NULL valid_to. One window per user (high-cardinality
    // partitioning; (us, event_id) is a total order) — the standard
    // history-table build -----------------------------------------
    "q152_scd2_intervals" -> Q(
      impl = (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("us", "event_id")
        Tables.events(s, d)
          .filter(col("event_type") === "error")
          .select(col("user_id"), col("event_id"), col("us"))
          .withColumn("valid_to", lead("us", 1).over(w) - 1L)
          .select(col("user_id"), col("event_id"),
            col("us").as("valid_from"), col("valid_to"))
          .orderBy("user_id", "valid_from", "event_id")
      },
      oracle = Some("""
        WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us
                   FROM events WHERE event_type = 'error')
        SELECT user_id, event_id, us AS valid_from,
               lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) - 1
                 AS valid_to
        FROM e ORDER BY user_id, valid_from, event_id NULLS FIRST""")),

    // ---- last-touch attribution on the native as-of join: each
    // purchase attributes to the user's most recent click at or
    // before it. Clicks reduce to one per (user, time) first — max
    // event_id wins — so the as-of carry-forward is deterministic
    // under timestamp ties; the operator is one key shuffle + one
    // in-partition sort, never a per-key range join (AsOfJoin.scala)
    "q153_last_touch" -> Q(
      impl = (s, d) => {
        val ev = Tables.events(s, d)
        val clicks = ev.filter(col("event_type") === "click")
          .groupBy(col("user_id"), col("us").as("cus"))
          .agg(max("event_id").as("click_id"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("purchase_id"), col("us"))
        AsOfJoin.lastBefore(purchases, clicks,
          Seq("user_id"), "us", "cus", Seq("click_id", "cus"))
          .select(col("purchase_id"), col("asof_match.click_id").as("click_id"),
            (col("us") - col("asof_match.cus")).as("lag_us"))
          .orderBy("purchase_id")
      },
      oracle = Some("""
        WITH c AS (SELECT user_id, epoch_us(ts) AS cus,
                          CAST(max(event_id) AS BIGINT) AS click_id
                   FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        p AS (SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS pus
              FROM events WHERE event_type = 'purchase'),
        j AS (SELECT p.purchase_id, c.click_id, p.pus - c.cus AS lag_us,
                row_number() OVER (PARTITION BY p.purchase_id
                                   ORDER BY c.cus DESC) AS rk
              FROM p JOIN c ON c.user_id = p.user_id AND c.cus <= p.pus)
        SELECT purchase_id, click_id, lag_us FROM j WHERE rk = 1
        ORDER BY purchase_id"""),
      bench = true),

    // ---- edit-distance verification of near-dup candidates: the
    // post-LSH "prove it" stage — exact Levenshtein over the LSH
    // candidate pairs only (never all-pairs; the candidate set is
    // LSH-bounded, and per-pair O(len²) DP is the verification cost
    // you signed up for, paid on ~candidates not ~corpus²). Integer
    // distances; both engines implement classic edit distance -------
    "q154_editdist_verify" -> Q(
      impl = (s, d) => {
        val docs = graft.Tables.docsParallel(s, d)
          .withColumn("t", graft.functions.TextFns.tokens(col("text")))
        val sigs = graft.functions.MinHashLsh
          .signaturesFromTokens(docs, "doc_id", "t", 3, 12)
        val pairs = graft.functions.MinHashLsh.candidatePairs(sigs, "doc_id", 12, 4)
          .filter(col("est") >= 0.5)
        val txt = Tables.load(s, d, "documents").select("doc_id", "text")
        pairs
          .join(txt.toDF("a", "ta"), "a")
          .join(txt.toDF("b", "tb"), "b")
          .select(col("a"), col("b"),
            levenshtein(col("ta"), col("tb")).cast("long").as("edit_dist"),
            greatest(length(col("ta")), length(col("tb"))).cast("long").as("max_len"))
          .orderBy("a", "b")
      },
      oracle = Some(s"""
        WITH ${Extended2.lshPairCtes(0.5)}
        SELECT p.a, p.b,
               CAST(levenshtein(x.text, y.text) AS BIGINT) AS edit_dist,
               CAST(greatest(length(x.text), length(y.text)) AS BIGINT) AS max_len
        FROM pairs p
          JOIN documents x ON x.doc_id = p.a
          JOIN documents y ON y.doc_id = p.b
        ORDER BY p.a, p.b"""),
      bench = true),

    // ---- discrete quantiles: percentile_disc returns an ACTUAL input
    // value (the smallest with cume_dist ≥ p) — byte-identical across
    // engines with no interpolation caveat, unlike the continuous
    // variant's derived doubles (pinned separately by q57/q126) ------
    "q155_disc_quantiles" -> Q(
      impl = (s, d) => {
        Tables.events(s, d).createOrReplaceTempView("__ev155")
        s.sql("""
          SELECT event_type,
                 percentile_disc(0.25) WITHIN GROUP (ORDER BY value) AS p25,
                 percentile_disc(0.5)  WITHIN GROUP (ORDER BY value) AS p50,
                 percentile_disc(0.75) WITHIN GROUP (ORDER BY value) AS p75
          FROM __ev155 GROUP BY event_type ORDER BY event_type""")
      },
      oracle = Some("""
        SELECT event_type,
               quantile_disc(value, 0.25) AS p25,
               quantile_disc(value, 0.5)  AS p50,
               quantile_disc(value, 0.75) AS p75
        FROM events GROUP BY 1 ORDER BY 1"""))
  )
}
