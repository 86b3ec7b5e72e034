package graft

import graft.functions.Portable

/** DuckDB oracle SQL for every SparkEntry query.
  *
  * Each statement recomputes the query's expected result from the same sf
  * parquet tables (exposed as views named `events`, `documents`, `lineitem`,
  * ...). Numeric results are engineered to be bit-reproducible across
  * engines: integer-valued aggregates, identical fold orders for double
  * reductions, `//` integer division mirrored by Spark's `div`, and the
  * portable 60-bit md5 hash for every pseudo-random choice.
  *
  * The stream fixtures sort events by `event_id` (contiguous 0..n-1), so
  * `base_offset = event_id` — which is what lets plain SQL predict offsets.
  */
object Oracles {

  private val H = Portable // hash60Sql helpers

  // ---- shared fragments ----

  /** Word-3-gram shingles of documents.text, reduced to their 60-bit portable
    * hash mod 2^31-1 and made distinct per (doc_id, hm), with the same
    * document-frequency cap the Spark side applies
    * ([[graft.operators.Dedup.cappedShingles]]); the shingle expression comes
    * from the same generator the Spark side mirrors, so the two can never
    * drift. */
  private val shingleRows =
    s"""sh0 AS (
       |  SELECT doc_id, unnest(${H.wordShinglesSql(3)}) AS s
       |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)),
       |shd AS (SELECT DISTINCT doc_id, ${H.uhashBaseSql("s")} AS hm FROM sh0),
       |heavy AS (SELECT hm FROM shd GROUP BY hm HAVING count(*) > ${graft.operators.Dedup.DefaultMaxDf}),
       |sh AS (SELECT doc_id, hm FROM shd WHERE hm NOT IN (SELECT hm FROM heavy))""".stripMargin

  /** Parameterized distinct-hashed-shingle CTE chain over `src` (table name
    * or parenthesized subquery), mirroring [[graft.operators.Dedup.cappedShingles]]
    * with its df cap — same generator expressions, so Spark and the oracle
    * can never drift. */
  private def shingleCte(src: String, alias: String, k: Int): String =
    s"""${alias}0 AS (
       |  SELECT doc_id, unnest(${H.wordShinglesSql(k)}) AS s
       |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM $src t)),
       |${alias}d AS (SELECT DISTINCT doc_id, ${H.uhashBaseSql("s")} AS hm FROM ${alias}0),
       |${alias}h AS (SELECT hm FROM ${alias}d GROUP BY hm HAVING count(*) > ${graft.operators.Dedup.DefaultMaxDf}),
       |$alias AS (SELECT doc_id, hm FROM ${alias}d WHERE hm NOT IN (SELECT hm FROM ${alias}h))""".stripMargin

  private def minhashCols(numHashes: Int): String =
    (0 until numHashes).map(i => s"min(${H.uhashSql(i, "hm")}) AS m$i").mkString(", ")

  // ---- eslog ----

  private val esAppendScan =
    "SELECT event_id AS base_offset, epoch_ms(ts) AS ts_ms, event_type, props FROM events"

  // Both interop ingests round-trip the events table bit-for-bit (offsets
  // re-assigned in embedded order == event_id), so the oracle is the same
  // projection the append/scan lifecycle proves.
  private val esIngestObject =
    "SELECT event_id AS base_offset, epoch_ms(ts) AS ts_ms, event_type, props FROM events"

  private val esIngestWal =
    "SELECT event_id AS base_offset, epoch_ms(ts) AS ts_ms, event_type, props FROM events"

  // PD metadata migration (Fixtures.pdMigrationCatalog): stream 95, replica
  // 2, 1-day retention; trim = n/5 (the first range's start), sealed range
  // [n/5, n/2) under epoch 3, open range [n/2, -1) under epoch 4; stream
  // epoch = the last range's. After backfill, per-range record counts are
  // the range spans (single-record batches).
  private val esIngestPd =
    """WITH n AS (SELECT CAST(count(*) AS BIGINT) AS c FROM events)
      |SELECT CAST(95 AS BIGINT) AS stream_id, CAST(4 AS BIGINT) AS epoch,
      |       CAST(2 AS BIGINT) AS replica, CAST(1 AS BIGINT) AS ack_count,
      |       CAST(86400000 AS BIGINT) AS retention_ms,
      |       c // 5 AS start_offset, c AS next_offset,
      |       CAST(0 AS BIGINT) AS seg_index, c // 5 AS seg_start,
      |       c // 2 AS seg_end, true AS sealed, c // 2 - c // 5 AS n_records
      |FROM n
      |UNION ALL
      |SELECT CAST(95 AS BIGINT), CAST(4 AS BIGINT), CAST(2 AS BIGINT),
      |       CAST(1 AS BIGINT), CAST(86400000 AS BIGINT),
      |       c // 5, c, CAST(1 AS BIGINT), c // 2, CAST(-1 AS BIGINT),
      |       false, c - c // 2
      |FROM n""".stripMargin

  // the data half: original offsets survive the migration, pre-trim drops
  private val esPdBackfill =
    """SELECT event_id AS base_offset, epoch_ms(ts) AS ts_ms, event_type, props
      |FROM events WHERE event_id >= (SELECT count(*) // 5 FROM events)""".stripMargin

  // migration-out round trips re-assign offsets contiguously after the
  // embedded-offset sort, so base_offset == event_id again
  private val esExportObject =
    "SELECT event_id AS base_offset, epoch_ms(ts) AS ts_ms, event_type, props FROM events"

  private val esExportWal =
    "SELECT event_id AS base_offset, epoch_ms(ts) AS ts_ms, event_type, props FROM events"

  // streaming offload drains the whole stream (AvailableNow) and the
  // bootstrap re-ingest restores logical order, so the round trip is the
  // identity over events
  private val esStreamExport =
    "SELECT event_id AS base_offset, epoch_ms(ts) AS ts_ms, event_type, props FROM events"

  // The batch-admin lifecycle is deterministic end-to-end (block-allocated
  // ids in spec order, per-stream statuses), so the oracle is the expected
  // response table itself.
  private val esCatalogBatch =
    """SELECT * FROM (VALUES
      |  ('create1', 'ba', CAST(0 AS BIGINT), 'OK'),
      |  ('create1', 'bb', CAST(1 AS BIGINT), 'OK'),
      |  ('create2', 'bb', CAST(1 AS BIGINT), 'ALREADY_EXISTS'),
      |  ('create2', 'bc', CAST(3 AS BIGINT), 'OK'),
      |  ('delete', 'ba', CAST(0 AS BIGINT), 'OK'),
      |  ('delete', 'missing', CAST(-1 AS BIGINT), 'NOT_FOUND'),
      |  ('describe', 'bb', CAST(1 AS BIGINT), 'OK'),
      |  ('describe', 'ba', CAST(-1 AS BIGINT), 'NOT_FOUND'),
      |  ('describe', 'bc', CAST(3 AS BIGINT), 'OK')
      |) AS t(batch, name, stream_id, status)""".stripMargin

  private val esFetchRange =
    """SELECT event_id AS base_offset, event_type FROM events
      |WHERE event_id >= (SELECT count(*) // 10 FROM events)
      |  AND event_id < (SELECT count(*) // 2 FROM events)""".stripMargin

  private val esFetchHot =
    """SELECT event_id AS base_offset, event_type FROM events
      |WHERE event_id >= (SELECT count(*) // 2 FROM events)""".stripMargin

  private val esFetchStraddle =
    """WITH b AS (
      |  SELECT id, CAST(id % 3 + 1 AS BIGINT) AS delta,
      |    CAST(COALESCE(SUM(id % 3 + 1) OVER (ORDER BY id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS base_offset
      |  FROM range(1000) t(id))
      |SELECT base_offset, delta AS last_offset_delta, CAST(id AS VARCHAR) AS payload_str
      |FROM b WHERE base_offset + delta > 667 AND base_offset < 1333""".stripMargin

  private val esSnapshot =
    """SELECT event_id AS base_offset, event_type FROM events
      |WHERE event_id < (SELECT count(*) // 2 FROM events)""".stripMargin

  /** scanDelta between the first data commit and head = the second half of
    * the events stream (offsets = event_id, as in the snapshot/trim rows). */
  private val esScanDelta =
    """SELECT event_id AS base_offset, event_type FROM events
      |WHERE event_id >= (SELECT count(*) // 2 FROM events)""".stripMargin

  /** fetchByTime over the [t0+span/4, t0+span/2) event-time window; the
    * millisecond bounds use the same integer division the query computes
    * driver-side. */
  private val esFetchTime =
    """WITH b AS (SELECT epoch_ms(min(ts)) AS t0, epoch_ms(max(ts)) AS t1 FROM events)
      |SELECT event_id AS base_offset, epoch_ms(ts) AS ts_ms, event_type
      |FROM events, b
      |WHERE epoch_ms(ts) >= t0 + (t1 - t0) // 4
      |  AND epoch_ms(ts) <  t0 + (t1 - t0) // 2""".stripMargin

  /** offsetForTimestamp = min(event_id) with ts >= probe (offsets ==
    * event_id); a probe past the newest record resolves to next_offset =
    * count(*). */
  private val esOffsetForTime =
    """WITH b AS (SELECT epoch_ms(min(ts)) AS t0, epoch_ms(max(ts)) AS t1,
      |                  CAST(count(*) AS BIGINT) AS n FROM events),
      |p AS (SELECT t0 - 1000 AS probe_ms FROM b
      |      UNION ALL SELECT t0 + (t1 - t0) // 3 FROM b
      |      UNION ALL SELECT t1 + 1 FROM b)
      |SELECT probe_ms,
      |       coalesce((SELECT min(event_id) FROM events WHERE epoch_ms(ts) >= p.probe_ms),
      |                (SELECT n FROM b)) AS "offset"
      |FROM p""".stripMargin

  // es_group_commit: the catch-up read (committed at n/2, head at n) is
  // exactly the second half — the same rows as esScanDelta; registered as
  // an alias below (the "es_clone" -> esSnapshot pattern).

  /** Group lag over the group fixture: "etl" committed at n/2, head n. */
  private val esGroupLag =
    """WITH n AS (SELECT CAST(count(*) AS BIGINT) AS c FROM events)
      |SELECT 'etl' AS grp, true AS committed, c // 2 AS position,
      |       c AS next_offset, c - c // 2 AS lag FROM n""".stripMargin

  /** Catalog-wide lag over the two-stream parity fixture. */
  private val esCatalogGroupLag =
    """WITH n AS (SELECT
      |  CAST(count(*) FILTER (event_id % 2 = 0) AS BIGINT) AS na,
      |  CAST(count(*) FILTER (event_id % 2 = 1) AS BIGINT) AS nb FROM events)
      |SELECT 'lagA' AS stream, 'etl' AS grp, true AS committed,
      |       na // 2 AS position, na AS next_offset, na - na // 2 AS lag FROM n
      |UNION ALL
      |SELECT 'lagB', 'audit', true, nb, nb, 0 FROM n""".stripMargin

  /** The crashed fan-out pipeline's surviving intent: the dead run fixed the
    * span (head/2, head) over the even-event source before dying between
    * destinations — the sweep re-derives it from the events table alone. */
  private val esCatalogFanOutIntents =
    """WITH n AS (SELECT CAST(count(*) FILTER (event_id % 2 = 0) AS BIGINT) AS na
      |           FROM events)
      |SELECT 'src' AS stream, 'fan' AS grp, na // 2 AS intent_from,
      |       na AS intent_up_to, na // 2 AS position, na AS next_offset
      |FROM n""".stripMargin

  /** The exactly-once ETL destination: every click exactly once (the job ran
    * twice — a duplicate-producing replay would double these rows), offsets
    * dense in source order. */
  private val esEtl =
    """WITH c AS (SELECT event_id, event_type,
      |             row_number() OVER (ORDER BY event_id) - 1 AS dst_off
      |           FROM events WHERE event_type = 'click')
      |SELECT CAST(dst_off AS BIGINT) AS base_offset, event_id AS src_off, event_type
      |FROM c""".stripMargin

  /** The fan-in ETL destination: clicks from three %3-split sources exactly
    * once (the job ran twice), destination offsets dense in (source,
    * per-source offset) order. */
  private val esEtlFanIn =
    """WITH e AS (SELECT event_id, event_type, event_id % 3 AS src,
      |             row_number() OVER (PARTITION BY event_id % 3 ORDER BY event_id) - 1 AS src_off
      |           FROM events),
      |c AS (SELECT *, row_number() OVER (ORDER BY src, src_off) - 1 AS dst_off
      |      FROM e WHERE event_type = 'click')
      |SELECT CAST(dst_off AS BIGINT) AS base_offset, CAST(src AS BIGINT) AS src,
      |       CAST(src_off AS BIGINT) AS src_off, event_type
      |FROM c""".stripMargin

  // fan-out: source offsets = event_id rank (one stream, sortKey event_id);
  // clicks route by src_off % 3; per-destination offsets = row_number in
  // source-offset order (the fixture's sortKey)
  private val esEtlFanOut =
    """WITH e AS (SELECT event_id, event_type,
      |             row_number() OVER (ORDER BY event_id) - 1 AS src_off
      |           FROM events),
      |r AS (SELECT *, src_off % 3 AS dst FROM e WHERE event_type = 'click'),
      |c AS (SELECT *, row_number() OVER (PARTITION BY dst ORDER BY src_off) - 1 AS dst_off
      |      FROM r)
      |SELECT CAST(dst AS BIGINT) AS dst, CAST(dst_off AS BIGINT) AS base_offset,
      |       CAST(src_off AS BIGINT) AS src_off, event_type
      |FROM c""".stripMargin

  private val esTrim =
    """SELECT event_id AS base_offset, event_type FROM events
      |WHERE event_id >= (SELECT count(*) // 4 FROM events)""".stripMargin

  private val esRetention =
    """SELECT event_id AS base_offset, event_id AS base_timestamp FROM events
      |WHERE event_id >= (SELECT count(*) // 2 FROM events)""".stripMargin

  private val esSegments =
    """WITH n AS (SELECT CAST(count(*) AS BIGINT) AS c FROM events)
      |SELECT CAST(0 AS BIGINT) AS seg_index, CAST(0 AS BIGINT) AS start_offset,
      |       c // 2 AS end_offset, true AS sealed, CAST(1 AS BIGINT) AS epoch,
      |       c // 2 AS num_records FROM n
      |UNION ALL
      |SELECT CAST(1 AS BIGINT), c // 2, c, false, CAST(2 AS BIGINT), c - c // 2 FROM n""".stripMargin

  private val esDescribe =
    """SELECT CAST(42 AS BIGINT) AS stream_id, CAST(2 AS BIGINT) AS epoch,
      |       CAST(0 AS BIGINT) AS start_offset, CAST(count(*) AS BIGINT) AS next_offset,
      |       CAST(1 AS BIGINT) AS replica, CAST(1 AS BIGINT) AS ack_count FROM events""".stripMargin

  private val esOffsets =
    """SELECT 'events' AS stream, CAST(0 AS BIGINT) AS start_offset,
      |       CAST(count(*) AS BIGINT) AS next_offset FROM events
      |UNION ALL
      |SELECT 'events_trimmed', CAST(count(*) // 4 AS BIGINT), CAST(count(*) AS BIGINT) FROM events""".stripMargin

  private val esObjectLog =
    "SELECT event_id AS base_offset, event_type FROM events WHERE event_id < 4000"

  /** Offsets of the scrambled stream are pure arithmetic: `skey = (event_id
    * * 48271) % n` is a permutation of 0..n-1, and append sorted by skey
    * makes base_offset == skey (see Fixtures.zorderStream). */
  private val esCompactZorder =
    """SELECT (event_id * 48271) % (SELECT count(*) FROM events) AS base_offset,
      |       epoch_ms(ts) AS base_timestamp, event_type
      |FROM events
      |WHERE (epoch_ms(ts) // 3600000) % 24 BETWEEN 3 AND 5""".stripMargin

  private val esKv =
    """SELECT * FROM (VALUES ('k1', 'a2'), ('k3', 'c'), ('t1', 'yes'), ('t2', 'fallback')) AS t("key", "value")"""

  private val esUpdateDescribe =
    """SELECT CAST(77 AS BIGINT) AS stream_id, CAST(3 AS BIGINT) AS replica,
      |       CAST(2 AS BIGINT) AS ack_count, CAST(86400000 AS BIGINT) AS retention_ms,
      |       CAST(0 AS BIGINT) AS epoch, false AS deleted""".stripMargin

  private val esDelete =
    "SELECT true AS deleted, CAST(0 AS BIGINT) AS n_live_files"

  private val esIdempotent =
    "SELECT true AS retry_rejected, true AS gap_rejected, CAST(100 AS BIGINT) AS n_rows"

  private val esCodec =
    "SELECT doc_id, text FROM documents"

  private val esWindowHourly =
    """SELECT epoch_ms(ts) // 3600000 AS hour, CAST(count(*) AS BIGINT) AS n,
      |       min(event_id) AS first_off, max(event_id) AS last_off
      |FROM events GROUP BY 1""".stripMargin

  private val esAggByType =
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |       min(event_id) AS first_off, max(event_id) AS last_off
      |FROM events GROUP BY 1""".stripMargin

  private val esCompact =
    """WITH b AS (
      |  SELECT id, CAST(id % 3 + 1 AS BIGINT) AS delta,
      |    CAST(COALESCE(SUM(id % 3 + 1) OVER (ORDER BY id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS base_offset
      |  FROM range(1000) t(id))
      |SELECT base_offset, delta AS last_offset_delta, CAST(id AS VARCHAR) AS payload_str FROM b""".stripMargin

  private val esCatalog =
    """SELECT * FROM (VALUES
      |  ('alpha', CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(7 AS BIGINT), false),
      |  ('gamma', CAST(3 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), false)
      |) AS t(name, stream_id, epoch, start_offset, next_offset, deleted)""".stripMargin

  private val esCatalogScan =
    """SELECT CAST(1 AS BIGINT) AS stream_id, CAST(id AS BIGINT) AS base_offset,
      |       CAST(id AS VARCHAR) AS payload_str
      |FROM range(7) t(id)""".stripMargin

  /** Whole-catalog subscription: streams hold `event_id % 3` slices of
    * events, appended in event_id order, so per-stream offsets are the
    * dense rank within the residue class. */
  private val esCatalogSubscribe =
    """SELECT CAST(event_id % 3 AS BIGINT) AS stream_id,
      |       CAST(row_number() OVER (PARTITION BY event_id % 3 ORDER BY event_id) - 1
      |            AS BIGINT) AS base_offset,
      |       event_type AS payload_str
      |FROM events""".stripMargin

  private val esStreamRoundtrip =
    "SELECT epoch_ms(ts) AS ts_ms, event_type, props FROM events"

  private val esStreamWindow =
    """SELECT (epoch_ms(ts) // 3600000) * 3600000 AS hour_start_ms,
      |       CAST(count(*) AS BIGINT) AS n
      |FROM events GROUP BY 1""".stripMargin

  private val esStreamDedup =
    "SELECT DISTINCT event_id % 100 AS k FROM events"

  /** Stream-static enrichment relationally: the same two joins + aggregate
    * the streaming query ran per micro-batch. */
  private val esStreamEnrichDim =
    """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_events,
      |       min(user_id) AS min_user, max(user_id) AS max_user
      |FROM events e JOIN customer c ON e.user_id = c.c_custkey
      |GROUP BY 1""".stripMargin

  /** Window-form KMV per hour window over the same events the streaming
    * aggregate consumed: equality proves the custom aggregate's
    * state-store merge path (arrivals split across micro-batches). */
  private val esStreamKmv = graft.operators.Sketch.kmvDistinctSql(64,
    """SELECT DISTINCT (epoch_ms(ts) // 3600000) * 3600000 AS hour_start_ms,
      |       props AS v FROM events""".stripMargin,
    Seq("hour_start_ms"))

  /** Streaming CMS grid: DuckDB recomputes the full (hour, d, slot, cnt)
    * grid from the events table — bit-equality proves the streaming
    * cell-wise merge across micro-batches. */
  private val esStreamCms = {
    val depth = 4; val width = 1024
    val cells = (0 until depth).map(i =>
      s"SELECT hour_start_ms, $i AS d, ${H.uhashSql(i, "hm")} % $width AS slot FROM h")
      .mkString("\n  UNION ALL ")
    s"""WITH occ AS (SELECT (epoch_ms(ts) // 3600000) * 3600000 AS hour_start_ms,
       |                    props AS v FROM events),
       |h AS (SELECT hour_start_ms, ${H.uhashBaseSql("v")} AS hm FROM occ),
       |cells AS ($cells)
       |SELECT hour_start_ms, d, slot, CAST(count(*) AS BIGINT) AS cnt
       |FROM cells GROUP BY 1, 2, 3""".stripMargin
  }

  /** Streaming HLL registers: DuckDB recomputes the per-hour register table
    * from the events table — bit-equality proves the streaming per-bucket-max
    * merge across micro-batches. */
  private val esStreamHll = graft.operators.Sketch.hllSketchSql(6,
    """SELECT (epoch_ms(ts) // 3600000) * 3600000 AS hour_start_ms,
      |       props AS v FROM events""".stripMargin,
    Seq("hour_start_ms"))

  /** Streaming Bloom slot set, summarized per window. The rank filter
    * mirrors the bounded carrier's cap (complete set at every tested SF;
    * deterministic k-smallest subset beyond). */
  private val esStreamBloom = {
    val m = 1 << 20; val k = 5; val cap = 4096
    val slots = (0 until k).map(i =>
      s"SELECT hour_start_ms, ${H.uhashSql(i, "hm")} % $m AS slot FROM h")
      .mkString("\n  UNION ALL ")
    s"""WITH occ AS (SELECT (epoch_ms(ts) // 3600000) * 3600000 AS hour_start_ms,
       |                    props AS v FROM events),
       |h AS (SELECT hour_start_ms, ${H.uhashBaseSql("v")} AS hm FROM occ),
       |raw AS ($slots),
       |dedup AS (SELECT DISTINCT hour_start_ms, slot FROM raw),
       |rk AS (SELECT hour_start_ms, slot,
       |              row_number() OVER (PARTITION BY hour_start_ms ORDER BY slot) AS rn
       |       FROM dedup)
       |SELECT hour_start_ms, CAST(count(*) AS BIGINT) AS n_slots,
       |       min(slot) AS slot_min, max(slot) AS slot_max,
       |       bit_xor(slot) AS slot_xor
       |FROM rk WHERE rn <= $cap GROUP BY 1""".stripMargin
  }

  /** Streaming sample quantiles: DuckDB recomputes the bottom-64-by-hash
    * sample of payload lengths per hour (rowKey = event_id = base_offset)
    * and reads the same integer permille ranks — bit-equality proves the
    * QuantileSampleAgg state-store merge across micro-batches. */
  private val esStreamQuantile = {
    val h = graft.functions.Portable.hash60Sql("CAST(event_id AS VARCHAR)")
    s"""WITH occ AS (SELECT (epoch_ms(ts) // 3600000) * 3600000 AS hour_start_ms,
       |                    $h AS h, CAST(length(props) AS BIGINT) AS v FROM events),
       |s AS (SELECT DISTINCT hour_start_ms, h, v FROM occ),
       |w AS (SELECT hour_start_ms, v,
       |        row_number() OVER (PARTITION BY hour_start_ms ORDER BY h, v) AS hr
       |      FROM s),
       |r AS (SELECT hour_start_ms, v,
       |        row_number() OVER (PARTITION BY hour_start_ms ORDER BY v) - 1 AS rn,
       |        count(*) OVER (PARTITION BY hour_start_ms) AS n
       |      FROM w WHERE hr <= 64),
       |p AS (SELECT CAST(unnest([0, 500, 1000]) AS BIGINT) AS permille)
       |SELECT hour_start_ms, permille, v AS q_value
       |FROM r JOIN p ON rn = ((n - 1) * permille) // 1000""".stripMargin
  }

  /** Streaming k-per-window sample: DuckDB recomputes the 20 smallest
    * seeded-hash draws per hour (event_id = base_offset) — bit-equality
    * proves TopKAgg's state-store merge across micro-batches. */
  private val esStreamSample = {
    val h = graft.functions.Portable.hash60Sql(7, "CAST(event_id AS VARCHAR)")
    s"""WITH occ AS (SELECT (epoch_ms(ts) // 3600000) * 3600000 AS hour_start_ms,
       |                    event_id FROM events),
       |r AS (SELECT hour_start_ms, event_id,
       |        row_number() OVER (PARTITION BY hour_start_ms ORDER BY $h, event_id) AS rn
       |      FROM occ)
       |SELECT hour_start_ms, event_id FROM r WHERE rn <= 20""".stripMargin
  }

  private val esWatchMeta =
    """SELECT * FROM (VALUES
      |  (CAST(0 AS BIGINT), CAST(0 AS BIGINT), 'createStream'),
      |  (CAST(1 AS BIGINT), CAST(0 AS BIGINT), 'kvPut'),
      |  (CAST(2 AS BIGINT), CAST(0 AS BIGINT), 'kvPut'),
      |  (CAST(3 AS BIGINT), CAST(0 AS BIGINT), 'kvPut'),
      |  (CAST(4 AS BIGINT), CAST(0 AS BIGINT), 'kvDel'),
      |  (CAST(5 AS BIGINT), CAST(0 AS BIGINT), 'kvPut'),
      |  (CAST(5 AS BIGINT), CAST(1 AS BIGINT), 'kvPut'),
      |  (CAST(6 AS BIGINT), CAST(0 AS BIGINT), 'kvPut'),
      |  (CAST(7 AS BIGINT), CAST(0 AS BIGINT), 'kvPut'),
      |  (CAST(8 AS BIGINT), CAST(0 AS BIGINT), 'kvPut'),
      |  (CAST(9 AS BIGINT), CAST(0 AS BIGINT), 'kvDelRange'),
      |  (CAST(10 AS BIGINT), CAST(0 AS BIGINT), 'kvPut'),
      |  (CAST(10 AS BIGINT), CAST(1 AS BIGINT), 'kvDel'),
      |  (CAST(11 AS BIGINT), CAST(0 AS BIGINT), 'kvPut'),
      |  (CAST(11 AS BIGINT), CAST(1 AS BIGINT), 'kvDel')
      |) AS t(version, seq, action)""".stripMargin

  /** Registry watch events of [[graft.Fixtures.catalogWatchRoot]]'s fixed
    * lifecycle (create alpha/beta/gamma, drop beta, recreate beta).
    * Revisions: catalog init = 0; each createStream = 2 commits (id
    * allocation, then name reservation — the registry event); dropStream =
    * 1 registry commit. The recreate carries id 3 at revision 9 — name
    * reuse stays unambiguous in the feed. */
  private val esWatchCatalog =
    """SELECT * FROM (VALUES
      |  (CAST(2 AS BIGINT), CAST(0 AS BIGINT), 'put', 'alpha', CAST(0 AS BIGINT)),
      |  (CAST(4 AS BIGINT), CAST(0 AS BIGINT), 'put', 'beta', CAST(1 AS BIGINT)),
      |  (CAST(6 AS BIGINT), CAST(0 AS BIGINT), 'put', 'gamma', CAST(2 AS BIGINT)),
      |  (CAST(7 AS BIGINT), CAST(0 AS BIGINT), 'del', 'beta', CAST(NULL AS BIGINT)),
      |  (CAST(9 AS BIGINT), CAST(0 AS BIGINT), 'put', 'beta', CAST(3 AS BIGINT))
      |) AS t(revision, seq, op, name, stream_id)""".stripMargin

  /** Shared session CTE: gap = 1 day over per-user event times. */
  private val sessionCte =
    """e AS (SELECT user_id, epoch_ms(ts) AS t FROM events),
      |m AS (SELECT user_id, t,
      |        CASE WHEN lag(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL
      |               OR t - lag(t) OVER (PARTITION BY user_id ORDER BY t) > 86400000
      |             THEN 1 ELSE 0 END AS ns
      |      FROM e),
      |s AS (SELECT user_id, t,
      |        CAST(SUM(ns) OVER (PARTITION BY user_id ORDER BY t ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
      |      FROM m),
      |sess AS (SELECT user_id, sid, min(t) AS start_ms, max(t) AS end_ms,
      |                CAST(count(*) AS BIGINT) AS n
      |         FROM s GROUP BY 1, 2)""".stripMargin

  private val esSessions =
    s"""WITH $sessionCte
       |SELECT user_id, sid, start_ms, end_ms, n FROM sess""".stripMargin

  private val esStreamJoin =
    """SELECT a.event_id // 2 AS pair_id, a.event_id AS even_id,
      |  b.event_id AS odd_id, a.event_type AS even_type, b.event_type AS odd_type
      |FROM events a JOIN events b
      |  ON a.event_id % 2 = 0 AND b.event_id % 2 = 1
      | AND a.event_id // 2 = b.event_id // 2
      | AND abs(epoch_ms(a.ts) - epoch_ms(b.ts)) <= 3600000""".stripMargin

  private val esStreamSessions =
    s"""WITH $sessionCte
       |SELECT user_id, sid, start_ms, end_ms, n FROM sess
       |QUALIFY sid < max(sid) OVER (PARTITION BY user_id)""".stripMargin

  // ---- LLM pipelines ----

  private val dedupExact =
    """SELECT min(doc_id) AS doc_id, sha256(text) AS h, CAST(count(*) AS BIGINT) AS dups
      |FROM documents GROUP BY sha256(text)""".stripMargin

  private val dedupJaccard =
    s"""WITH $shingleRows,
       |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY doc_id),
       |pairs AS (
       |  SELECT a.doc_id AS i, b.doc_id AS j, CAST(count(*) AS BIGINT) AS inter
       |  FROM sh a JOIN sh b ON a.hm = b.hm AND a.doc_id < b.doc_id GROUP BY 1, 2)
       |SELECT i, j, inter / (si.n + sj.n - inter) AS jaccard
       |FROM pairs JOIN sizes si ON pairs.i = si.doc_id JOIN sizes sj ON pairs.j = sj.doc_id
       |WHERE inter / (si.n + sj.n - inter) >= 0.5""".stripMargin

  private val dedupMinhash = {
    val bands = (0 until 4).map { b =>
      val sig = (0 until 4).map(i => s"CAST(m${b * 4 + i} AS VARCHAR)").mkString(" || ',' || ")
      s"SELECT doc_id, $b AS band, $sig AS sig FROM m"
    }.mkString("\nUNION ALL\n")
    s"""WITH $shingleRows,
       |m AS (SELECT doc_id, ${minhashCols(16)} FROM sh GROUP BY doc_id),
       |b AS (
       |$bands)
       |SELECT DISTINCT a.doc_id AS i, b2.doc_id AS j
       |FROM b a JOIN b b2 ON a.band = b2.band AND a.sig = b2.sig AND a.doc_id < b2.doc_id""".stripMargin
  }

  /** Incremental dedup oracle: index slice (95%) vs probe slice (5%), same
    * shingle/universal-hash/band generators as dedup_minhash, band buckets
    * joined across the two slices. */
  private val dedupIncremental = {
    val r = 4
    def bandRows(m: String) = (0 until 4).map { b =>
      val sig = (0 until r).map(i => s"CAST(m${b * r + i} AS VARCHAR)").mkString(" || ',' || ")
      s"SELECT doc_id, $b AS band, $sig AS sig FROM $m"
    }.mkString("\nUNION ALL\n")
    val h = H.hash60Sql("CAST(doc_id AS VARCHAR)")
    val old = s"(SELECT doc_id, text FROM documents WHERE $h % 20 < 19)"
    val nw = s"(SELECT doc_id, text FROM documents WHERE $h % 20 >= 19)"
    s"""WITH ${shingleCte(old, "so", 3)},
       |${shingleCte(nw, "sn", 3)},
       |mo AS (SELECT doc_id, ${minhashCols(16)} FROM so GROUP BY doc_id),
       |mn AS (SELECT doc_id, ${minhashCols(16)} FROM sn GROUP BY doc_id),
       |bo AS (
       |${bandRows("mo")}),
       |bn AS (
       |${bandRows("mn")})
       |SELECT DISTINCT bo.doc_id AS existing, bn.doc_id AS incoming
       |FROM bo JOIN bn ON bo.band = bn.band AND bo.sig = bn.sig
       | AND bo.doc_id <> bn.doc_id""".stripMargin
  }

  /** Probe against the APPENDED persisted MinHash index: the `h % 20 < 13`
    * build slice and the `13 <= h % 20 < 19` appended slice each carry
    * their OWN stop-shingle cap (the documented per-slice incremental
    * contract — the cap acts before signatures, so it is slice-local by
    * construction), then the 5% batch probes the union. */
  private val dedupIncrementalAppended = {
    val r = 4
    def bandRows(m: String) = (0 until 4).map { b =>
      val sig = (0 until r).map(i => s"CAST(m${b * r + i} AS VARCHAR)").mkString(" || ',' || ")
      s"SELECT doc_id, $b AS band, $sig AS sig FROM $m"
    }.mkString("\nUNION ALL\n")
    val h = H.hash60Sql("CAST(doc_id AS VARCHAR)")
    val base = s"(SELECT doc_id, text FROM documents WHERE $h % 20 < 13)"
    val added = s"(SELECT doc_id, text FROM documents WHERE $h % 20 >= 13 AND $h % 20 < 19)"
    val nw = s"(SELECT doc_id, text FROM documents WHERE $h % 20 >= 19)"
    s"""WITH ${shingleCte(base, "sb", 3)},
       |${shingleCte(added, "sa", 3)},
       |${shingleCte(nw, "sn", 3)},
       |mb AS (SELECT doc_id, ${minhashCols(16)} FROM sb GROUP BY doc_id),
       |ma AS (SELECT doc_id, ${minhashCols(16)} FROM sa GROUP BY doc_id),
       |mn AS (SELECT doc_id, ${minhashCols(16)} FROM sn GROUP BY doc_id),
       |bb AS (
       |${bandRows("mb")}),
       |ba AS (
       |${bandRows("ma")}),
       |bi AS (SELECT * FROM bb UNION ALL SELECT * FROM ba),
       |bn AS (
       |${bandRows("mn")})
       |SELECT DISTINCT bi.doc_id AS existing, bn.doc_id AS incoming
       |FROM bi JOIN bn ON bi.band = bn.band AND bi.sig = bn.sig
       | AND bi.doc_id <> bn.doc_id""".stripMargin
  }

  /** Probe against the STREAM-appended persisted MinHash index: the build
    * slice carries its own cap; the appended slice arrives in exactly 4
    * micro-batches (`ceil(n/4)` offsets each, offsets sorted by doc_id —
    * so batch membership is `(row_number - 1) // per`), and EACH batch
    * caps itself ([[graft.Fixtures.streamMinHashAppendRoot]]'s
    * `foreachBatch` contract). */
  private val esStreamDedupAppend = {
    val r = 4
    def bandRows(m: String) = (0 until 4).map { b =>
      val sig = (0 until r).map(i => s"CAST(m${b * r + i} AS VARCHAR)").mkString(" || ',' || ")
      s"SELECT doc_id, $b AS band, $sig AS sig FROM $m"
    }.mkString("\nUNION ALL\n")
    val h = H.hash60Sql("CAST(doc_id AS VARCHAR)")
    val base = s"(SELECT doc_id, text FROM documents WHERE $h % 20 < 13)"
    val nw = s"(SELECT doc_id, text FROM documents WHERE $h % 20 >= 19)"
    // the 4 micro-batch slices: rank within the appended slice by doc_id,
    // ceil(n/4) rows per batch — exactly the fixture's maxOffsetsPerTrigger
    val mid =
      s"""mid AS (
         |  SELECT doc_id, text,
         |    CAST((row_number() OVER (ORDER BY doc_id) - 1)
         |      // greatest((count(*) OVER () + 3) // 4, 1) AS BIGINT) AS bk
         |  FROM documents WHERE $h % 20 >= 13 AND $h % 20 < 19)""".stripMargin
    def batchSrc(k: Int) = s"(SELECT doc_id, text FROM mid WHERE bk = $k)"
    val batchCtes = (0 until 4).map(k =>
      s"""${shingleCte(batchSrc(k), s"sm$k", 3)},
         |mm$k AS (SELECT doc_id, ${minhashCols(16)} FROM sm$k GROUP BY doc_id),
         |bm$k AS (
         |${bandRows(s"mm$k")})""".stripMargin).mkString(",\n")
    s"""WITH $mid,
       |${shingleCte(base, "sb", 3)},
       |$batchCtes,
       |${shingleCte(nw, "sn", 3)},
       |mb AS (SELECT doc_id, ${minhashCols(16)} FROM sb GROUP BY doc_id),
       |mn AS (SELECT doc_id, ${minhashCols(16)} FROM sn GROUP BY doc_id),
       |bb AS (
       |${bandRows("mb")}),
       |bi AS (SELECT * FROM bb UNION ALL SELECT * FROM bm0
       |  UNION ALL SELECT * FROM bm1 UNION ALL SELECT * FROM bm2
       |  UNION ALL SELECT * FROM bm3),
       |bn AS (
       |${bandRows("mn")})
       |SELECT DISTINCT bi.doc_id AS existing, bn.doc_id AS incoming
       |FROM bi JOIN bn ON bi.band = bn.band AND bi.sig = bn.sig
       | AND bi.doc_id <> bn.doc_id""".stripMargin
  }

  /** Probe against the STREAM-appended library: the appended quarter
    * arrived in 4 deterministic micro-batches (row_number arithmetic over
    * doc_id mirroring the fixture's maxOffsetsPerTrigger), and the df cap
    * applies per MICRO-BATCH slice — each batch's own cap re-derived. */
  private val esStreamMediaAppend = {
    val inc = cdcChunksSql("documents", "media_id")
    val lib = cdcChunksSql("(SELECT * FROM documents WHERE doc_id % 2 = 0)", "existing_id")
    def slice(b: Int) = cdcChunksSql(
      s"""(SELECT doc_id, text FROM (
         |    SELECT doc_id, text,
         |      CAST((row_number() OVER (ORDER BY doc_id) - 1)
         |        // greatest((count(*) OVER () + 3) // 4, 1) AS BIGINT) AS bk
         |    FROM documents WHERE doc_id % 4 = 1) WHERE bk = $b)""".stripMargin,
      "existing_id")
    val addParts = (0 until 4).map { b =>
      s"""add$b AS (SELECT * FROM ${slice(b)} s$b),
         |heavy$b AS (SELECT ch FROM add$b GROUP BY ch HAVING count(*) > 64),
         |cap$b AS (SELECT * FROM add$b WHERE ch NOT IN (SELECT ch FROM heavy$b))""".stripMargin
    }.mkString(",\n")
    s"""WITH incch AS (SELECT * FROM $inc i),
       |libb AS (SELECT * FROM $lib l),
       |heavyb AS (SELECT ch FROM libb GROUP BY ch HAVING count(*) > 64),
       |capb AS (SELECT * FROM libb WHERE ch NOT IN (SELECT ch FROM heavyb)),
       |$addParts,
       |libch AS (SELECT * FROM capb
       |  UNION ALL SELECT * FROM cap0 UNION ALL SELECT * FROM cap1
       |  UNION ALL SELECT * FROM cap2 UNION ALL SELECT * FROM cap3)
       |SELECT i.media_id AS incoming, l.existing_id AS existing,
       |       CAST(count(*) AS BIGINT) AS n_shared
       |FROM incch i JOIN libch l USING (ch)
       |WHERE i.media_id <> l.existing_id
       |GROUP BY 1, 2 HAVING count(*) >= 4""".stripMargin
  }

  /** Connected components over the Jaccard pairs via transitive closure
    * (recursive CTE) — min reachable id per doc, mirroring
    * [[graft.operators.Dedup.nearDupClusters]]'s converged labels. */
  private val dedupClusters =
    s"""WITH RECURSIVE p AS (SELECT i, j FROM ($dedupJaccard) q),
       |e AS (SELECT i AS a, j AS b FROM p UNION SELECT j, i FROM p),
       |reach(a, b) AS (
       |  SELECT a, b FROM e
       |  UNION
       |  SELECT r.a, e2.b FROM reach r JOIN e e2 ON r.b = e2.a)
       |SELECT a AS doc_id, least(a, min(b)) AS cluster_id FROM reach GROUP BY a""".stripMargin

  /** Cluster representatives: same recursive-CTE cluster assignment as
    * [[dedupClusters]], then per-cluster argmax by (n_chars DESC, id ASC). */
  private val dedupClusterBest =
    s"""WITH RECURSIVE p AS (SELECT i, j FROM ($dedupJaccard) q),
       |e AS (SELECT i AS a, j AS b FROM p UNION SELECT j, i FROM p),
       |reach(a, b) AS (
       |  SELECT a, b FROM e
       |  UNION
       |  SELECT r.a, e2.b FROM reach r JOIN e e2 ON r.b = e2.a),
       |c AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id FROM reach GROUP BY a),
       |s AS (SELECT c.cluster_id, c.doc_id, CAST(d.n_chars AS BIGINT) AS score,
       |        row_number() OVER (PARTITION BY c.cluster_id
       |          ORDER BY d.n_chars DESC, c.doc_id ASC) AS rk
       |      FROM c JOIN documents d ON c.doc_id = d.doc_id)
       |SELECT cluster_id, doc_id AS rep_id, score AS rep_score FROM s WHERE rk = 1""".stripMargin

  private val dedupSimhash = {
    val terms = (0 until 60).map { b =>
      s"CASE WHEN sum(((h >> $b) & 1) * 2 - 1) > 0 THEN ${1L << b} ELSE 0 END"
    }.mkString("\n      + ")
    s"""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
       |h AS (SELECT doc_id, ${H.hash60Sql("tok")} AS h FROM t)
       |SELECT doc_id, CAST($terms AS BIGINT) AS simhash
       |FROM h GROUP BY doc_id""".stripMargin
  }

  private val textStats =
    """SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
      |  CAST(list_aggregate(list_transform(string_split(text, ' '), t -> CAST(length(t) AS BIGINT)), 'sum') AS BIGINT)
      |    / len(string_split(text, ' ')) AS avg_token_len
      |FROM documents""".stripMargin

  private val stopList = TextOps_markers

  private def TextOps_markers: Seq[(String, Seq[String])] =
    graft.operators.TextOps.langMarkers

  private val textQuality = {
    val stops = stopList.flatMap(_._2).map(w => s"'$w'").mkString(", ")
    s"""SELECT doc_id,
       |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |  CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) / len(string_split(text, ' ')) AS lexical_diversity,
       |  CAST(len(list_filter(string_split(text, ' '), t -> t IN ($stops))) AS DOUBLE) / len(string_split(text, ' ')) AS stopword_ratio,
       |  CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE) / length(text) AS digit_ratio,
       |  CAST(len(regexp_extract_all(text, '[.!?,;:]')) AS DOUBLE) / length(text) AS punct_ratio
       |FROM documents""".stripMargin
  }

  private val textLangId = {
    val classes = graft.operators.TextOps.langCharClasses.toMap
    val scoreCols = stopList.map { case (lang, markers) =>
      val set = markers.map(w => s"'$w'").mkString(", ")
      val words = s"len(list_filter(string_split(text, ' '), t -> t IN ($set)))"
      // + the character-class half of the score (TextOps.langCharClasses):
      // same plain-class/\x{...} patterns, identical in Java regex and RE2
      val chars = classes.getOrElse(lang, "") match {
        case ""  => ""
        case cls => s" + len(regexp_extract_all(text, '$cls'))"
      }
      s"CAST($words$chars AS BIGINT) AS s_$lang"
    }.mkString(",\n  ")
    val langs = stopList.map(_._1)
    val pred = langs.init.map { lang =>
      val ge = langs.filter(_ != lang).map(o => s"s_$lang >= s_$o").mkString(" AND ")
      s"WHEN $ge THEN '$lang'"
    }.mkString("\n    ")
    s"""WITH scored AS (SELECT doc_id,
       |  $scoreCols
       |FROM documents)
       |SELECT doc_id,
       |  CASE $pred ELSE '${langs.last}' END AS lang_pred,
       |  ${langs.map(l => s"s_$l").mkString(", ")}
       |FROM scored""".stripMargin
  }

  private val textFingerprint = {
    val norm = "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))"
    s"""SELECT doc_id, md5($norm) AS fp_md5, ${H.hash60Sql(norm)} AS fp60 FROM documents"""
  }

  private val textTokens =
    """SELECT doc_id,
      |  CAST(len(regexp_extract_all(text, '[a-zA-Z]+')) AS BIGINT) AS n_words,
      |  CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_numbers,
      |  CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS BIGINT) AS n_marks,
      |  CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS BIGINT) AS n_bpe_ish
      |FROM documents""".stripMargin

  /** Mirrors [[graft.operators.TextOps.redactions]] in application order. */
  private val textRedact = {
    // DuckDB single-quoted strings are literal (no backslash processing), so
    // the Java-regex pattern text goes in verbatim; only quotes need doubling
    val scrubbed = graft.operators.TextOps.redactions.foldLeft("text") {
      case (expr, (pat, repl)) =>
        s"regexp_replace($expr, '${pat.replace("'", "''")}', '$repl', 'g')"
    }
    s"SELECT doc_id, $scrubbed AS text_redacted FROM documents"
  }

  /** TextOps.normalize twin over the same deterministic mangling the Spark
    * query applies (upper-cased copy + punctuation + digits), so every
    * normalization stage fires on every row. */
  private val textNormalize =
    """SELECT doc_id,
      |  trim(regexp_replace(regexp_replace(regexp_replace(
      |    lower(upper(text) || '!!  42, ' || text),
      |    '[^a-z0-9 ]+', ' ', 'g'), '[0-9]', '0', 'g'), ' +', ' ', 'g')) AS text_norm
      |FROM documents""".stripMargin

  private val textTruncate =
    """SELECT doc_id,
      |  array_to_string(string_split(text, ' ')[1:16], ' ') AS text_truncated,
      |  CAST(least(len(string_split(text, ' ')), 16) AS BIGINT) AS n_tokens_kept
      |FROM documents""".stripMargin

  /** chunkTokens twin: chunkSize 64, overlap 16 (stride 48) — same integer
    * chunk-count and slice arithmetic. */
  private val textChunk =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |d AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n,
      |        1 + (greatest(CAST(len(toks) AS BIGINT) - 64, 0) + 47) // 48 AS c
      |      FROM t),
      |e AS (SELECT doc_id, toks, n, unnest(range(0, c)) AS cid FROM d)
      |SELECT doc_id, CAST(cid AS BIGINT) AS chunk_id,
      |  CAST(least(n - cid * 48, 64) AS BIGINT) AS n_tokens,
      |  array_to_string(list_slice(toks, cid * 48 + 1, cid * 48 + 64), ' ') AS chunk
      |FROM e""".stripMargin

  /** Repetition signals over word bigrams — the n-gram expression comes from
    * the same generator the Spark side mirrors, so the two can never drift. */
  private val textRepetition =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |g AS (SELECT doc_id, unnest(${H.wordShinglesSql(2)}) AS g FROM t),
       |c AS (SELECT doc_id, g, count(*) AS c FROM g GROUP BY 1, 2),
       |a AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS total, max(c) AS topc,
       |             CAST(count(*) AS BIGINT) AS uniq
       |      FROM c GROUP BY 1)
       |SELECT d.doc_id,
       |  coalesce(CAST(a.topc AS DOUBLE) / a.total, 0.0) AS top_ngram_frac,
       |  coalesce(CAST(a.total - a.uniq AS DOUBLE) / a.total, 0.0) AS dup_ngram_frac
       |FROM documents d LEFT JOIN a ON d.doc_id = a.doc_id""".stripMargin

  /** Bigram LM score: same occurrence/rollup lattice as TextOps.lmScore,
    * ln scaled to a 6-decimal integer before the occurrence-weighted sum, so
    * the emitted totals are integer-exact across engines. */
  /** Shared CTE body of the bigram-LM score (`lmx` = one row per doc with
    * (doc_id, n_bigrams, nll_scaled)) — reused by [[textLm]] and the
    * CCNet-bucketing oracle. */
  private val textLmCtes =
    s"""t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |g AS (SELECT doc_id, unnest(${H.wordShinglesSql(2)}) AS g FROM t),
       |occ AS (SELECT doc_id, g, CAST(count(*) AS BIGINT) AS c FROM g GROUP BY 1, 2),
       |big AS (SELECT g, CAST(sum(c) AS BIGINT) AS bc FROM occ GROUP BY 1),
       |uni AS (SELECT split_part(g, ' ', 1) AS w, CAST(sum(bc) AS BIGINT) AS uc
       |        FROM big GROUP BY 1),
       |s AS (SELECT occ.doc_id,
       |        CAST(sum(occ.c) AS BIGINT) AS n_bigrams,
       |        CAST(-sum(occ.c * CAST(round(ln(CAST(big.bc AS DOUBLE) / uni.uc) * 1000000) AS BIGINT)) AS BIGINT)
       |          AS nll_scaled
       |      FROM occ
       |      JOIN big USING (g)
       |      JOIN uni ON split_part(occ.g, ' ', 1) = uni.w
       |      GROUP BY 1),
       |lmx AS (SELECT d.doc_id,
       |          coalesce(s.n_bigrams, 0) AS n_bigrams,
       |          coalesce(s.nll_scaled, 0) AS nll_scaled
       |        FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id)""".stripMargin

  private val textLm =
    s"""WITH $textLmCtes
       |SELECT doc_id, n_bigrams, nll_scaled FROM lmx""".stripMargin

  // streaming twin scores against the persisted artifact: same derivation,
  // minus the bigram-less docs a stream cannot left-join into existence
  private val esStreamLm =
    s"""WITH $textLmCtes
       |SELECT doc_id, n_bigrams, nll_scaled FROM lmx WHERE n_bigrams > 0""".stripMargin

  // CCNet head/middle/tail: per-source tercile thresholds are ORDER
  // STATISTICS of mean_nll (value at rank (n-1)·p div 1000 — the
  // quantilesDisc rule), so ties cannot make them engine-dependent; docs
  // without a bigram take Long.MaxValue and land in tail. The thresholds
  // ALWAYS derive from the full corpus; `finalFilter` only restricts the
  // emitted rows (the streaming twin scores against the batch artifacts
  // but cannot emit bigram-less docs).
  private def textLmBucketsSql(finalFilter: String): String =
    s"""WITH $textLmCtes,
       |m AS (SELECT lmx.doc_id, d.source, lmx.n_bigrams,
       |        CASE WHEN lmx.n_bigrams > 0 THEN lmx.nll_scaled // lmx.n_bigrams
       |             ELSE 9223372036854775807 END AS mean_nll
       |      FROM lmx JOIN documents d USING (doc_id)),
       |rk AS (SELECT *, row_number() OVER (PARTITION BY source ORDER BY mean_nll) - 1 AS rn,
       |              count(*) OVER (PARTITION BY source) AS n FROM m),
       |thr AS (SELECT source,
       |          max(CASE WHEN rn = (n - 1) * 333 // 1000 THEN mean_nll END) AS q333,
       |          max(CASE WHEN rn = (n - 1) * 667 // 1000 THEN mean_nll END) AS q667
       |        FROM rk GROUP BY source)
       |SELECT m.doc_id, m.source, CAST(m.mean_nll AS BIGINT) AS mean_nll,
       |  CASE WHEN m.mean_nll <= t.q333 THEN 'head'
       |       WHEN m.mean_nll <= t.q667 THEN 'middle' ELSE 'tail' END AS bucket
       |FROM m JOIN thr t USING (source)
       |$finalFilter""".stripMargin

  private val textLmBuckets = textLmBucketsSql("")
  private val esStreamLmBuckets = textLmBucketsSql("WHERE m.n_bigrams > 0")

  private val decontaminate = {
    val bench =
      s"(SELECT doc_id, text FROM documents WHERE ${H.hash60Sql("CAST(doc_id AS VARCHAR)")} % 20 < 1)"
    s"""WITH ${shingleCte("documents", "cs", 3)},
       |${shingleCte(bench, "bs", 3)},
       |bh AS (SELECT DISTINCT hm FROM bs)
       |SELECT cs.doc_id, CAST(count(*) AS BIGINT) AS n_shared
       |FROM cs JOIN bh ON cs.hm = bh.hm GROUP BY 1""".stripMargin
  }

  /** Fuzzy-decontamination oracle: the dedup_minhash band generators split
    * across the corpus/benchmark frames (slice-local df caps, like
    * `decontaminate`), candidates from the cross-frame band join, true
    * Jaccard verify, best benchmark match per flagged doc. */
  private val decontaminateFuzzy = {
    val r = 4
    def bandRows(m: String) = (0 until 4).map { b =>
      val sig = (0 until r).map(i => s"CAST(m${b * r + i} AS VARCHAR)").mkString(" || ',' || ")
      s"SELECT doc_id, $b AS band, $sig AS sig FROM $m"
    }.mkString("\nUNION ALL\n")
    val bench =
      s"(SELECT doc_id, text FROM documents WHERE ${H.hash60Sql("CAST(doc_id AS VARCHAR)")} % 20 < 1)"
    s"""WITH ${shingleCte("documents", "cs", 3)},
       |${shingleCte(bench, "bs", 3)},
       |mc AS (SELECT doc_id, ${minhashCols(16)} FROM cs GROUP BY doc_id),
       |mb AS (SELECT doc_id, ${minhashCols(16)} FROM bs GROUP BY doc_id),
       |bc AS (
       |${bandRows("mc")}),
       |bb AS (
       |${bandRows("mb")}),
       |cand AS (SELECT DISTINCT bc.doc_id AS i, bb.doc_id AS j
       |  FROM bc JOIN bb ON bc.band = bb.band AND bc.sig = bb.sig),
       |szc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM cs GROUP BY doc_id),
       |szb AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM bs GROUP BY doc_id),
       |inter AS (
       |  SELECT cand.i, cand.j, CAST(count(*) AS BIGINT) AS inter
       |  FROM cand JOIN cs x ON x.doc_id = cand.i
       |            JOIN bs y ON y.doc_id = cand.j AND y.hm = x.hm
       |  GROUP BY 1, 2),
       |sc AS (
       |  SELECT i, j, inter / (ci.n + bj.n - inter) AS jaccard
       |  FROM inter JOIN szc ci ON inter.i = ci.doc_id
       |             JOIN szb bj ON inter.j = bj.doc_id
       |  WHERE inter / (ci.n + bj.n - inter) >= 0.5),
       |rr AS (SELECT i, j, jaccard,
       |        row_number() OVER (PARTITION BY i ORDER BY jaccard DESC, j ASC) AS rk FROM sc)
       |SELECT i AS doc_id, j AS bench_doc, jaccard FROM rr WHERE rk = 1""".stripMargin
  }

  /** Uncapped shingle cte — the streaming fuzzy probe disables the
    * stop-shingle cap so trigger boundaries cannot change results. */
  private def shingleCteNoCap(src: String, alias: String, k: Int): String =
    s"""${alias}0 AS (
       |  SELECT doc_id, unnest(${H.wordShinglesSql(k)}) AS s
       |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM $src t)),
       |$alias AS (SELECT DISTINCT doc_id, ${H.uhashBaseSql("s")} AS hm FROM ${alias}0)""".stripMargin

  /** Streaming fuzzy-decontamination oracle: identical probe math with
    * BOTH shingle lattices uncapped (the fixture's `maxDf = MaxValue`) —
    * per-doc verdicts depend only on the doc and the static benchmark, so
    * the micro-batched union equals this one-shot form. */
  private val esStreamDecontaminateFuzzy = {
    val r = 4
    def bandRows(m: String) = (0 until 4).map { b =>
      val sig = (0 until r).map(i => s"CAST(m${b * r + i} AS VARCHAR)").mkString(" || ',' || ")
      s"SELECT doc_id, $b AS band, $sig AS sig FROM $m"
    }.mkString("\nUNION ALL\n")
    val bench =
      s"(SELECT doc_id, text FROM documents WHERE ${H.hash60Sql("CAST(doc_id AS VARCHAR)")} % 20 < 1)"
    s"""WITH ${shingleCteNoCap("documents", "cs", 3)},
       |${shingleCteNoCap(bench, "bs", 3)},
       |mc AS (SELECT doc_id, ${minhashCols(16)} FROM cs GROUP BY doc_id),
       |mb AS (SELECT doc_id, ${minhashCols(16)} FROM bs GROUP BY doc_id),
       |bc AS (
       |${bandRows("mc")}),
       |bb AS (
       |${bandRows("mb")}),
       |cand AS (SELECT DISTINCT bc.doc_id AS i, bb.doc_id AS j
       |  FROM bc JOIN bb ON bc.band = bb.band AND bc.sig = bb.sig),
       |szc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM cs GROUP BY doc_id),
       |szb AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM bs GROUP BY doc_id),
       |inter AS (
       |  SELECT cand.i, cand.j, CAST(count(*) AS BIGINT) AS inter
       |  FROM cand JOIN cs x ON x.doc_id = cand.i
       |            JOIN bs y ON y.doc_id = cand.j AND y.hm = x.hm
       |  GROUP BY 1, 2),
       |sc AS (
       |  SELECT i, j, inter / (ci.n + bj.n - inter) AS jaccard
       |  FROM inter JOIN szc ci ON inter.i = ci.doc_id
       |             JOIN szb bj ON inter.j = bj.doc_id
       |  WHERE inter / (ci.n + bj.n - inter) >= 0.5),
       |rr AS (SELECT i, j, jaccard,
       |        row_number() OVER (PARTITION BY i ORDER BY jaccard DESC, j ASC) AS rk FROM sc)
       |SELECT i AS doc_id, j AS bench_doc, jaccard FROM rr WHERE rk = 1""".stripMargin
  }

  /** decontaminateReport twin: same df-capped shingle lattice as
    * `decontaminate`, but a LEFT join so every doc reports (n_grams,
    * n_shared, integer permille). */
  private val decontaminateReport = {
    val bench =
      s"(SELECT doc_id, text FROM documents WHERE ${H.hash60Sql("CAST(doc_id AS VARCHAR)")} % 20 < 1)"
    s"""WITH ${shingleCte("documents", "cs", 3)},
       |${shingleCte(bench, "bs", 3)},
       |bh AS (SELECT DISTINCT hm FROM bs),
       |per AS (SELECT cs.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
       |          CAST(count(bh.hm) AS BIGINT) AS n_shared
       |        FROM cs LEFT JOIN bh ON cs.hm = bh.hm GROUP BY 1)
       |SELECT d.doc_id,
       |  CAST(coalesce(per.n_grams, 0) AS BIGINT) AS n_grams,
       |  CAST(coalesce(per.n_shared, 0) AS BIGINT) AS n_shared,
       |  CAST(CASE WHEN coalesce(per.n_grams, 0) > 0
       |            THEN (per.n_shared * 1000) // per.n_grams
       |            ELSE 0 END AS BIGINT) AS permille
       |FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id""".stripMargin
  }

  /** dedupSegments/reassembleSegments twin over 12-token chunk segments
    * (stride 12 — same integer arithmetic as the `text_chunk` twin): drop
    * segments in >= 2 distinct docs, rebuild in order, report drop counts. */
  private val dedupLines =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |d AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n,
       |        1 + (greatest(CAST(len(toks) AS BIGINT) - 12, 0) + 11) // 12 AS c
       |      FROM t),
       |e AS (SELECT doc_id, toks, unnest(range(0, c)) AS cid FROM d),
       |ch AS (SELECT doc_id, CAST(cid AS BIGINT) AS pos,
       |         array_to_string(list_slice(toks, cid * 12 + 1, cid * 12 + 12), ' ') AS line
       |       FROM e),
       |h AS (SELECT doc_id, pos, line, ${H.hash60Sql("line")} AS hm FROM ch),
       |dups AS (SELECT hm FROM (SELECT hm, count(DISTINCT doc_id) AS df
       |                         FROM h WHERE length(line) >= 1
       |                         GROUP BY 1) WHERE df >= 2),
       |kept AS (SELECT doc_id, pos, line FROM h
       |         WHERE hm NOT IN (SELECT hm FROM dups)),
       |reb AS (SELECT doc_id, string_agg(line, ' ' ORDER BY pos) AS text_dedup,
       |          CAST(count(*) AS BIGINT) AS n_kept FROM kept GROUP BY 1),
       |tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines FROM ch GROUP BY 1)
       |SELECT tot.doc_id, coalesce(reb.text_dedup, '') AS text_dedup, tot.n_lines,
       |  CAST(tot.n_lines - coalesce(reb.n_kept, 0) AS BIGINT) AS n_dropped
       |FROM tot LEFT JOIN reb ON tot.doc_id = reb.doc_id""".stripMargin

  /** Duplicated-span removal twin: window hashes, cross-doc df, the same
    * cumulative-max interval merge, anti-join cut, ordered reassembly. */
  private val dedupSpans = {
    val K = 8
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |w AS (SELECT doc_id, unnest(range(0, greatest(len(toks) - $K + 1, 0))) AS p, toks FROM t),
       |wh AS (SELECT doc_id, p,
       |         ${H.hash60Sql(s"array_to_string(list_slice(toks, p + 1, p + $K), ' ')")} AS hm
       |       FROM w),
       |dup AS (SELECT hm FROM (SELECT hm, count(DISTINCT doc_id) AS df FROM wh GROUP BY 1)
       |        WHERE df >= 2),
       |mk AS (SELECT doc_id, p FROM wh WHERE hm IN (SELECT hm FROM dup)),
       |m AS (SELECT doc_id, p, CASE WHEN p >= coalesce(max(p + $K) OVER
       |        (PARTITION BY doc_id ORDER BY p ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
       |        -1) THEN 1 ELSE 0 END AS newgrp FROM mk),
       |g AS (SELECT doc_id, p, sum(newgrp) OVER (PARTITION BY doc_id ORDER BY p) AS grp FROM m),
       |spans AS (SELECT doc_id, min(p) AS lo, max(p) + $K AS hi FROM g GROUP BY doc_id, grp),
       |tok AS (SELECT doc_id, unnest(toks) AS tokv,
       |          generate_subscripts(toks, 1) - 1 AS pos FROM t),
       |kept AS (SELECT tok.doc_id, tok.pos, tok.tokv FROM tok ANTI JOIN spans
       |         ON tok.doc_id = spans.doc_id AND tok.pos >= spans.lo AND tok.pos < spans.hi),
       |re AS (SELECT doc_id, string_agg(tokv, ' ' ORDER BY pos) AS text_dedup,
       |         CAST(count(*) AS BIGINT) AS n_kept FROM kept GROUP BY 1)
       |SELECT t.doc_id, coalesce(re.text_dedup, '') AS text_dedup,
       |  CAST(len(t.toks) AS BIGINT) AS n_tokens,
       |  CAST(len(t.toks) - coalesce(re.n_kept, 0) AS BIGINT) AS n_removed
       |FROM t LEFT JOIN re ON t.doc_id = re.doc_id""".stripMargin
  }

  /** Bloom-decontamination twin: whole benchmark gram set as a slot table,
    * per (doc, gram) probe, docs with any hit. Bit-exact hashes make the
    * `maybe_present` verdicts — false positives included — identical on
    * both engines. */
  private val decontaminateBloom = {
    val m = 1 << 20; val hashes = 5
    val bench =
      s"(SELECT doc_id, text FROM documents WHERE ${H.hash60Sql("CAST(doc_id AS VARCHAR)")} % 20 < 1)"
    val slotSel = (0 until hashes).map(i =>
      s"SELECT ${H.uhashSql(i, "hm")} % $m AS slot FROM bh").mkString("\n  UNION ALL ")
    val candCells = (0 until hashes).map(i =>
      s"SELECT doc_id, s, ${H.uhashSql(i, "hm")} % $m AS slot FROM ch").mkString("\n  UNION ALL ")
    s"""WITH b0 AS (SELECT unnest(${H.wordShinglesSql(3)}) AS s
       |           FROM (SELECT string_split(text, ' ') AS toks FROM $bench t)),
       |bg AS (SELECT DISTINCT s FROM b0),
       |bh AS (SELECT ${H.uhashBaseSql("s")} AS hm FROM bg),
       |slots AS (SELECT DISTINCT slot FROM ($slotSel)),
       |c0 AS (SELECT doc_id, unnest(${H.wordShinglesSql(3)}) AS s
       |       FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents t)),
       |cg AS (SELECT DISTINCT doc_id, s FROM c0),
       |ch AS (SELECT doc_id, s, ${H.uhashBaseSql("s")} AS hm FROM cg),
       |cc AS ($candCells),
       |hit AS (SELECT doc_id, s, count(sl.slot) = $hashes AS p
       |        FROM cc LEFT JOIN slots sl ON cc.slot = sl.slot GROUP BY doc_id, s)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_flagged FROM hit WHERE p GROUP BY 1""".stripMargin
  }

  /** Streaming decontamination twin: same benchmark split and slot family as
    * [[decontaminateBloom]], but per gram OCCURRENCE (positions kept — the
    * streaming path counts multiplicity because a per-doc distinct would be
    * a second stateful aggregation); a doc appears iff any occurrence hits
    * all `hashes` slots. */
  private val esStreamDecontaminate = {
    val m = 1 << 20; val hashes = 5
    val bench =
      s"(SELECT doc_id, text FROM documents WHERE ${H.hash60Sql("CAST(doc_id AS VARCHAR)")} % 20 < 1)"
    val slotSel = (0 until hashes).map(i =>
      s"SELECT ${H.uhashSql(i, "hm")} % $m AS slot FROM bh").mkString("\n  UNION ALL ")
    val candCells = (0 until hashes).map(i =>
      s"SELECT doc_id, pos, ${H.uhashSql(i, "hm")} % $m AS slot FROM ch").mkString("\n  UNION ALL ")
    s"""WITH b0 AS (SELECT unnest(${H.wordShinglesSql(3)}) AS s
       |           FROM (SELECT string_split(text, ' ') AS toks FROM $bench t)),
       |bg AS (SELECT DISTINCT s FROM b0),
       |bh AS (SELECT ${H.uhashBaseSql("s")} AS hm FROM bg),
       |slots AS (SELECT DISTINCT slot FROM ($slotSel)),
       |c0 AS (SELECT doc_id, unnest(g) AS s, generate_subscripts(g, 1) AS pos
       |       FROM (SELECT doc_id, ${H.wordShinglesSql(3)} AS g
       |             FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents t))),
       |ch AS (SELECT doc_id, pos, ${H.uhashBaseSql("s")} AS hm FROM c0),
       |cc AS ($candCells),
       |hit AS (SELECT doc_id, pos, count(sl.slot) = $hashes AS p
       |        FROM cc LEFT JOIN slots sl ON cc.slot = sl.slot GROUP BY doc_id, pos)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits FROM hit WHERE p GROUP BY 1""".stripMargin
  }

  private val sampleHash =
    s"""SELECT doc_id FROM documents
       |WHERE ${H.hash60Sql("CAST(doc_id AS VARCHAR)")} % 10 < 3""".stripMargin

  /** Split-assignment twin: the same permille bucket chain over the seeded
    * id hash. */
  private val sampleSplit = {
    val p = s"${H.hash60Sql(11, "CAST(doc_id AS VARCHAR)")} % 1000"
    s"""SELECT doc_id,
       |  CASE WHEN $p < 800 THEN 'train'
       |       WHEN $p < 900 THEN 'val'
       |       ELSE 'test' END AS split
       |FROM documents""".stripMargin
  }

  /** Vocabulary twin: corpus token counts + doc frequency, top-100 by
    * (occurrences desc, term asc), dense rank ids. Terms are distinct, so
    * the rank order — and therefore token_id — is total. */
  private val textVocab =
    """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |tt AS (SELECT * FROM t WHERE term <> ''),
      |s AS (SELECT term, CAST(count(*) AS BIGINT) AS n_occ,
      |        CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs FROM tt GROUP BY term),
      |top AS (SELECT * FROM s WHERE n_occ >= 2 ORDER BY n_occ DESC, term ASC LIMIT 100)
      |SELECT term, n_occ, n_docs,
      |  CAST(row_number() OVER (ORDER BY n_occ DESC, term ASC) - 1 AS BIGINT) AS token_id
      |FROM top""".stripMargin

  /** Encode twin: positions from the raw whitespace split (0-based, empty
    * tokens hold their slot), inner join = OOV dropped. */
  private val textVocabEncode =
    """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |tt AS (SELECT * FROM t WHERE term <> ''),
      |s AS (SELECT term, CAST(count(*) AS BIGINT) AS n_occ,
      |        CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs FROM tt GROUP BY term),
      |top AS (SELECT * FROM s WHERE n_occ >= 2 ORDER BY n_occ DESC, term ASC LIMIT 100),
      |v AS (SELECT term,
      |        CAST(row_number() OVER (ORDER BY n_occ DESC, term ASC) - 1 AS BIGINT) AS token_id
      |      FROM top),
      |e AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term,
      |        CAST(generate_subscripts(string_split(text, ' '), 1) - 1 AS BIGINT) AS pos
      |      FROM documents WHERE doc_id % 10 = 0)
      |SELECT e.doc_id, e.pos, v.token_id
      |FROM e JOIN v USING (term) WHERE e.term <> ''""".stripMargin

  /** Weighted-sample twin: identical IEEE double arithmetic (len/400,
    * clamp, *2^60, floor) then a pure integer hash comparison. */
  private val sampleWeighted =
    s"""SELECT doc_id FROM (
       |  SELECT doc_id,
       |    least(greatest(len(string_split(text, ' ')) / 400.0, 0), 1) AS w
       |  FROM documents)
       |WHERE ${H.hash60Sql(7, "CAST(doc_id AS VARCHAR)")} <
       |      CAST(floor(w * 1152921504606846976.0) AS BIGINT)""".stripMargin

  /** Mixture sampling: the same in-plan fraction derivation (per-source
    * mass → limiting-source total → per-source keep fraction) and the same
    * floor-threshold draw as the Spark operator — the IEEE double chain is
    * written in the identical order so both engines agree bit-for-bit. */
  /** Token-budget mixing: seeded-hash admission order per source, integer
    * running token sum, cut where the running total would cross the
    * budget — all-integer, bit-exact. */
  private val sampleTokenBudget = {
    val budgetRows = (0 until 10).map(i => s"('src$i', CAST(600 AS BIGINT))").mkString(", ")
    s"""WITH t AS (SELECT doc_id, source,
       |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |             ${H.hash60Sql(7, "CAST(doc_id AS VARCHAR)")} AS h
       |           FROM documents),
       |c AS (SELECT doc_id, source, n_tokens,
       |        CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY h ASC, doc_id ASC
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
       |      FROM t),
       |b AS (SELECT * FROM (VALUES $budgetRows) x(source, budget))
       |SELECT doc_id, source, n_tokens, cum_tokens
       |FROM c JOIN b USING (source)
       |WHERE cum_tokens <= budget""".stripMargin
  }

  private val sampleMix =
    s"""WITH d AS (SELECT doc_id, source, CAST(n_chars AS BIGINT) AS mass FROM documents),
       |w AS (SELECT * FROM (VALUES
       |  ('src0', CAST(0.5 AS DOUBLE)), ('src1', CAST(0.3 AS DOUBLE)),
       |  ('src2', CAST(0.2 AS DOUBLE))) t(source, wt)),
       |a AS (SELECT d.source, wt, CAST(sum(mass) AS DOUBLE) AS avail
       |      FROM d JOIN w ON d.source = w.source GROUP BY d.source, wt),
       |t AS (SELECT min(avail / wt) AS total FROM a),
       |f AS (SELECT source, wt * (SELECT total FROM t) / avail AS frac FROM a)
       |SELECT d.doc_id, d.source
       |FROM d JOIN f ON d.source = f.source
       |WHERE ${H.hash60Sql("CAST(doc_id AS VARCHAR)")} <
       |      CAST(floor(frac * 1152921504606846976.0) AS BIGINT)""".stripMargin

  /** k-per-group sample as the window formulation (the Spark side runs the
    * bounded-state aggregate — hash-match proves the two paths equal). */
  private val sampleTopkGroup = {
    val h = H.hash60Sql(7, "CAST(doc_id AS VARCHAR)")
    s"""WITH r AS (SELECT lang, doc_id,
       |  row_number() OVER (PARTITION BY lang ORDER BY $h, doc_id) AS rn
       |  FROM documents)
       |SELECT lang, doc_id FROM r WHERE rn <= 20""".stripMargin
  }

  private val sampleStratified = {
    val h = H.hash60Sql("CAST(doc_id AS VARCHAR)")
    s"""SELECT doc_id, lang FROM documents
       |WHERE CASE WHEN lang = 'en' THEN $h % 10 < 1
       |           WHEN lang = 'de' THEN $h % 2 < 1
       |           ELSE TRUE END""".stripMargin
  }

  private val shuffleShards = {
    val h = H.hash60Sql(7, "CAST(doc_id AS VARCHAR)")
    s"""SELECT doc_id, $h AS shuffle_key, $h % 8 AS shard,
       |  CAST(row_number() OVER (PARTITION BY $h % 8 ORDER BY $h, doc_id) AS BIGINT)
       |    AS shard_pos
       |FROM documents""".stripMargin
  }

  private val layoutZorder = {
    val z = graft.operators.Layout.zValueSql(
      Seq("user_id & 65535", "event_id & 65535"), 16)
    s"SELECT event_id, CAST($z AS BIGINT) AS z_value FROM events"
  }

  private val textDomains =
    """WITH aug AS (SELECT doc_id,
      |  concat(text, ' see http://site', CAST(doc_id % 7 AS VARCHAR),
      |         '.example/page/', CAST(doc_id AS VARCHAR),
      |         ' and https://mirror', CAST(doc_id % 3 AS VARCHAR),
      |         '.example/x') AS text
      |  FROM documents),
      |d AS (SELECT doc_id,
      |  unnest(regexp_extract_all(text, 'https?://([^/ ]+)', 1)) AS domain FROM aug)
      |SELECT domain, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
      |  CAST(count(*) AS BIGINT) AS n_urls
      |FROM d GROUP BY 1""".stripMargin

  /** The quality-gate first-fail CASE: same rule order as
    * TextOps.qualityFilter, same IEEE double ratios, so keep/reason match
    * bit-for-bit. Shared by text_filter and pipeline_export. */
  private val textFilterCase = {
    val stops = stopList.flatMap(_._2).map(w => s"'$w'").mkString(", ")
    val nTok = "len(string_split(text, ' '))"
    val avgLen = s"CAST(list_aggregate(list_transform(string_split(text, ' '), t -> CAST(length(t) AS BIGINT)), 'sum') AS DOUBLE) / $nTok"
    val stopR = s"CAST(len(list_filter(string_split(text, ' '), t -> t IN ($stops))) AS DOUBLE) / $nTok"
    val digitR = s"CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE) / length(text)"
    val lexDiv = s"CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) / $nTok"
    s"""CASE WHEN $nTok < 30 THEN 'too_short'
       |         WHEN $nTok > 90 THEN 'too_long'
       |         WHEN $avgLen < 4.0 THEN 'short_tokens'
       |         WHEN $avgLen > 5.0 THEN 'long_tokens'
       |         WHEN $digitR > 0.2 THEN 'digit_heavy'
       |         WHEN $stopR < 0.01 THEN 'no_stopwords'
       |         WHEN $lexDiv < 0.35 THEN 'repetitive'
       |         ELSE NULL END""".stripMargin
  }

  private val textFilter =
    s"""SELECT doc_id, r AS drop_reason, r IS NULL AS keep FROM (
       |  SELECT doc_id, $textFilterCase AS r
       |  FROM documents)""".stripMargin

  /** The composed curation pipeline: gate -> exact dedup (min id) ->
    * deterministic 80% sample -> 64-token truncation. */
  private val pipelineExport =
    s"""WITH kept AS (
       |  SELECT doc_id, text FROM documents
       |  WHERE ($textFilterCase) IS NULL),
       |ded AS (
       |  SELECT min(doc_id) AS doc_id FROM kept GROUP BY text),
       |sam AS (
       |  SELECT k.doc_id, k.text FROM ded JOIN kept k USING (doc_id)
       |  WHERE ${H.hash60Sql("CAST(k.doc_id AS VARCHAR)")} % 10 < 8)
       |SELECT doc_id,
       |  array_to_string(string_split(text, ' ')[1:64], ' ') AS text_truncated,
       |  CAST(least(len(string_split(text, ' ')), 64) AS BIGINT) AS n_tokens_kept
       |FROM sam""".stripMargin

  /** TF-IDF ranks via the 6-decimal-scaled ln — integer score, so the rank
    * (and the whole output) is float-free and engine-exact. */
  private val textTfidf = {
    val norm = "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))"
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split($norm, ' ')) AS term FROM documents),
       |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
       |       FROM tok WHERE term <> '' GROUP BY 1, 2),
       |dfx AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
       |n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
       |s AS (SELECT doc_id, tf.term AS term, tf, df,
       |        tf * CAST(round(ln((n_docs + 1.0) / (df + 1.0)) * 1000000) AS BIGINT) AS score
       |      FROM tf JOIN dfx USING (term) CROSS JOIN n),
       |r AS (SELECT doc_id, term, tf, df,
       |        CAST(row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term ASC) AS BIGINT)
       |          AS term_rank
       |      FROM s)
       |SELECT doc_id, term, tf, df, term_rank FROM r WHERE term_rank <= 5""".stripMargin
  }

  private val textPack =
    """SELECT doc_id, CAST(doc_id % 8 AS BIGINT) AS shard,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |  CAST(COALESCE(SUM(len(string_split(text, ' '))) OVER
      |    (PARTITION BY doc_id % 8 ORDER BY doc_id
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |    // 512 AS pack_id
      |FROM documents""".stripMargin

  /** dot(a,b) with the same left fold Spark's `aggregate` uses. */
  private def dotSql(a: String, b: String): String =
    s"list_reduce(list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i]), (acc, x) -> acc + x)"

  private def cosineSql(a: String, b: String): String =
    s"${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}))"

  private val simExact =
    s"""WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id < 10),
       |c AS (SELECT vec_id AS nid, embedding::DOUBLE[] AS nvec FROM embeddings),
       |s AS (SELECT qid, nid, ${cosineSql("qvec", "nvec")} AS score FROM q, c WHERE nid <> qid),
       |r AS (SELECT qid, nid, score,
       |        row_number() OVER (PARTITION BY qid ORDER BY score DESC, nid ASC) AS rk FROM s)
       |SELECT qid, nid, CAST(rk AS BIGINT) AS rank, score FROM r WHERE rk <= 5""".stripMargin

  /** One JL projected coordinate: the md5-derived ±1 Rademacher fold over
    * `vec`, scaled by 1/√16 = 0.25 (exact in IEEE, so the multiply is
    * bit-safe) — same values as [[graft.operators.Similarity.randomProject]]
    * (left-to-right `list_reduce` fold == the codegen'd loop). */
  private def rprojectTermSql(t: Int, p: Int, outDim: Int, vec: String): String =
    s"(list_reduce(list_transform(range(1, len($vec) + 1), " +
      s"d -> CASE WHEN (${H.hash60Sql(s"concat('$t:$p:', CAST(d - 1 AS VARCHAR))")} & 1) = 1 " +
      s"THEN $vec[d] ELSE -$vec[d] END), (acc, x) -> acc + x) " +
      // reciprocal-then-multiply, NOT divide-by-sqrt: mirrors the Spark
      // expression's `s * (1.0 / sqrt(outDim))` for bit-identical doubles
      s"* (1.0 / sqrt($outDim.0)))"

  private def rprojectListSql(t: Int, outDim: Int, vec: String): String =
    (0 until outDim).map(p => rprojectTermSql(t, p, outDim, vec))
      .mkString("list_value(", ",\n      ", ")")

  private val simProject =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |p AS (SELECT vec_id, ${rprojectListSql(0, 16, "v")} AS y FROM e)
       |SELECT vec_id, CAST(generate_subscripts(y, 1) - 1 AS INT) AS i, unnest(y) AS yi
       |FROM p""".stripMargin

  private val simProjectTopk =
    s"""WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |e AS (SELECT vec_id, v, ${rprojectListSql(0, 32, "v")} AS y FROM e0),
       |q AS (SELECT vec_id AS qid, v AS qvec, y AS qproj FROM e WHERE vec_id < 10),
       |c AS (SELECT vec_id AS nid, v AS nvec, y AS nproj FROM e),
       |s AS (SELECT qid, nid, qvec, nvec, ${cosineSql("qproj", "nproj")} AS pscore
       |      FROM q, c WHERE nid <> qid),
       |pr AS (SELECT qid, nid, qvec, nvec,
       |         row_number() OVER (PARTITION BY qid ORDER BY pscore DESC, nid ASC) AS prank
       |       FROM s),
       |sv AS (SELECT qid, nid, ${cosineSql("qvec", "nvec")} AS score FROM pr WHERE prank <= 128),
       |r AS (SELECT qid, nid, score,
       |        row_number() OVER (PARTITION BY qid ORDER BY score DESC, nid ASC) AS rk FROM sv)
       |SELECT qid, nid, CAST(rk AS BIGINT) AS rank, score FROM r WHERE rk <= 5""".stripMargin

  /** SQL-surface top-k (graft_cosine in SQL text == CosineSim == this). */
  private val sqlTopk =
    s"""WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec FROM embeddings
       |           WHERE vec_id >= 10 AND vec_id < 20),
       |c AS (SELECT vec_id AS nid, embedding::DOUBLE[] AS nvec FROM embeddings),
       |s AS (SELECT qid, nid, ${cosineSql("qvec", "nvec")} AS score FROM q, c WHERE nid <> qid),
       |r AS (SELECT qid, nid, score,
       |        row_number() OVER (PARTITION BY qid ORDER BY score DESC, nid ASC) AS rk FROM s)
       |SELECT qid, nid, CAST(rk AS BIGINT) AS rank, score FROM r WHERE rk <= 3""".stripMargin

  /** SQL-surface TVF fetch: graft_fetch('dir', n/3, 2n/3) + graft_hash60. */
  private val sqlFetch =
    s"""SELECT event_id AS base_offset, event_type,
       |  ${H.hash60Sql("CAST(event_id AS VARCHAR)")} AS h
       |FROM events
       |WHERE event_id >= (SELECT count(*) // 3 FROM events)
       |  AND event_id < (SELECT 2 * count(*) // 3 FROM events)""".stripMargin

  /** Int8 quantization: integer codes + IEEE-exact scale, byte-identical.
    * Codes are unnested to scalar rows (one per element) — the driver's
    * pandas-based compare cannot sort array cells. */
  private val simQuantize =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |s AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS q_scale FROM e),
      |q AS (SELECT vec_id, q_scale,
      |  CASE WHEN q_scale = 0 THEN list_transform(v, x -> CAST(0 AS TINYINT))
      |       ELSE list_transform(v, x -> CAST(round(x * 127.0 / q_scale) AS TINYINT)) END AS q
      |FROM s)
      |SELECT vec_id, q_scale,
      |  CAST(generate_subscripts(q, 1) - 1 AS INT) AS i, unnest(q) AS qi
      |FROM q""".stripMargin

  /** bucket(table t) of `vec` = sum over planes p of 2^p iff the Rademacher
    * projection (weights = hash60(t:p:d) & 1 -> +/-1, folded over dims
    * left-to-right) is > 0 — same values as [[graft.operators.Similarity.lshBucket]]. */
  private def lshBucketSql(t: Int, vec: String, planes: Int = 8): String = {
    val planeTerms = (0 until planes).map { p =>
      val proj = s"list_reduce(list_transform(range(1, len($vec) + 1), " +
        s"d -> CASE WHEN (${H.hash60Sql(s"concat('$t:$p:', CAST(d - 1 AS VARCHAR))")} & 1) = 1 " +
        s"THEN $vec[d] ELSE -$vec[d] END), (acc, x) -> acc + x)"
      s"CASE WHEN $proj > 0 THEN ${1L << p} ELSE 0 END"
    }
    planeTerms.mkString("(", " + ", ")")
  }

  private val simLsh = {
    def buckets(src: String, id: String, vec: String, out: String) =
      (0 until 4).map(t =>
        s"SELECT $id, $vec, $t AS tbl, ${lshBucketSql(t, vec)} AS bucket FROM $src")
        .mkString("\nUNION ALL\n")
    s"""WITH q0 AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id < 10),
       |c0 AS (SELECT vec_id AS nid, embedding::DOUBLE[] AS nvec FROM embeddings),
       |qb AS (
       |${buckets("q0", "qid", "qvec", "qb")}),
       |cb AS (
       |${buckets("c0", "nid", "nvec", "cb")}),
       |cand AS (
       |  SELECT DISTINCT qid, qvec, nid, nvec
       |  FROM cb JOIN qb ON cb.tbl = qb.tbl AND cb.bucket = qb.bucket AND nid <> qid),
       |s AS (SELECT qid, nid, ${cosineSql("qvec", "nvec")} AS score FROM cand),
       |r AS (SELECT qid, nid, score,
       |        row_number() OVER (PARTITION BY qid ORDER BY score DESC, nid ASC) AS rk FROM s)
       |SELECT qid, nid, CAST(rk AS BIGINT) AS rank, score FROM r WHERE rk <= 5""".stripMargin
  }

  /** Mirrors [[graft.operators.Similarity.embeddingNearDupsLsh]]: candidates
    * from the (table, bucket) self-equi-join, exact cosine on candidates. */
  private val dedupEmbedding = {
    val buckets = (0 until 12).map(t =>
      s"SELECT id, v, $t AS tbl, ${lshBucketSql(t, "v", planes = 4)} AS bucket FROM e")
      .mkString("\nUNION ALL\n")
    s"""WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
       |eb AS (
       |$buckets),
       |cand AS (
       |  SELECT DISTINCT a.id AS i, a.v AS va, b.id AS j, b.v AS vb
       |  FROM eb a JOIN eb b ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.id < b.id)
       |SELECT i, j, ${cosineSql("va", "vb")} AS cosine
       |FROM cand WHERE ${cosineSql("va", "vb")} >= 0.45""".stripMargin
  }

  /** SemDeDup: same coarse quantizer as the IVF oracle (lowest-16-id
    * centroids, cosine assignment with the (score DESC, cid ASC)
    * tie-break), pairwise within cell, keep-lowest-id survivors. */
  private val dedupSemantic =
    s"""WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
       |cent AS (SELECT id AS cid, v AS cvec FROM e ORDER BY id LIMIT 16),
       |cc AS (SELECT id, v, cid,
       |         row_number() OVER (PARTITION BY id
       |           ORDER BY ${cosineSql("v", "cvec")} DESC, cid ASC) AS r
       |       FROM e, cent),
       |cells AS (SELECT id, v, cid AS cell FROM cc WHERE r = 1),
       |dropped AS (
       |  SELECT DISTINCT b.id FROM cells a JOIN cells b
       |  ON a.cell = b.cell AND a.id < b.id
       |  WHERE ${cosineSql("a.v", "b.v")} >= 0.45)
       |SELECT c.id AS vec_id, c.cell FROM cells c
       |WHERE c.id NOT IN (SELECT id FROM dropped)""".stripMargin

  /** Incremental semantic dedup: index (vec_id < 400) with the lowest-16-id
    * quantizer, assign BOTH sides to their nearest cell with the
    * (score DESC, cid ASC) tie-break, pair across the cell equi-join. */
  private val dedupSemanticProbe =
    s"""WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
       |ex AS (SELECT * FROM e WHERE id < 400),
       |inc AS (SELECT * FROM e WHERE id >= 400),
       |cent AS (SELECT id AS cid, v AS cvec FROM ex ORDER BY id LIMIT 16),
       |xc AS (SELECT id, v, cid, row_number() OVER (PARTITION BY id
       |         ORDER BY ${cosineSql("v", "cvec")} DESC, cid ASC) AS r FROM ex, cent),
       |xcells AS (SELECT id, v, cid AS cell FROM xc WHERE r = 1),
       |ic AS (SELECT id, v, cid, row_number() OVER (PARTITION BY id
       |         ORDER BY ${cosineSql("v", "cvec")} DESC, cid ASC) AS r FROM inc, cent),
       |icells AS (SELECT id, v, cid AS cell FROM ic WHERE r = 1)
       |SELECT x.id AS existing, y.id AS incoming,
       |       ${cosineSql("x.v", "y.v")} AS cosine
       |FROM xcells x JOIN icells y ON x.cell = y.cell
       |WHERE ${cosineSql("x.v", "y.v")} >= 0.4""".stripMargin

  /** Streaming diversity draw: sampled quantizer (lowest-id 16 corpus
    * vectors, like [[dedupSemanticProbe]]'s), incoming side vec_id >= 400,
    * per-cell draw = (hash60('11:'||id) ASC, id ASC) rank <= 6 — mirrors
    * the TopKAgg reservoir riding the streaming state store. */
  private val esStreamDiverse =
    s"""WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
       |cent AS (SELECT id AS cid, v AS cvec FROM e WHERE id < 400 ORDER BY id LIMIT 16),
       |inc AS (SELECT * FROM e WHERE id >= 400),
       |a AS (SELECT id, cid, row_number() OVER (PARTITION BY id
       |        ORDER BY ${cosineSql("v", "cvec")} DESC, cid ASC) AS r FROM inc, cent),
       |cells AS (SELECT id, cid AS cell FROM a WHERE r = 1),
       |rk AS (SELECT cell, id, row_number() OVER (PARTITION BY cell
       |         ORDER BY ${H.hash60Sql(11, "CAST(id AS VARCHAR)")} ASC, id ASC) AS rn
       |       FROM cells)
       |SELECT cell, id AS vec_id FROM rk WHERE rn <= 6""".stripMargin

  /** IVF search oracle, parameterized on the coarse-quantizer source:
    * `centSql` must yield `(cid BIGINT, cvec DOUBLE[])`. */
  private def ivfSql(centSql: String, candWhere: String = ""): String =
    s"""WITH c AS (SELECT vec_id AS nid, embedding::DOUBLE[] AS nvec FROM embeddings$candWhere),
       |q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id < 10),
       |cent AS ($centSql),
       |cc AS (SELECT nid, nvec, cid,
       |         row_number() OVER (PARTITION BY nid ORDER BY ${cosineSql("nvec", "cvec")} DESC, cid ASC) AS r
       |       FROM c, cent),
       |cells AS (SELECT nid, nvec, cid AS cell FROM cc WHERE r = 1),
       |qq AS (SELECT qid, qvec, cid,
       |         row_number() OVER (PARTITION BY qid ORDER BY ${cosineSql("qvec", "cvec")} DESC, cid ASC) AS r
       |       FROM q, cent),
       |probes AS (SELECT qid, qvec, cid AS cell FROM qq WHERE r <= 4),
       |cand AS (SELECT DISTINCT qid, qvec, nid, nvec
       |         FROM cells JOIN probes USING (cell) WHERE nid <> qid),
       |s AS (SELECT qid, nid, ${cosineSql("qvec", "nvec")} AS score FROM cand),
       |r AS (SELECT qid, nid, score,
       |        row_number() OVER (PARTITION BY qid ORDER BY score DESC, nid ASC) AS rk FROM s)
       |SELECT qid, nid, CAST(rk AS BIGINT) AS rank, score FROM r WHERE rk <= 5""".stripMargin

  private val simIvf = ivfSql(
    "SELECT vec_id AS cid, embedding::DOUBLE[] AS cvec FROM embeddings ORDER BY vec_id LIMIT 16")

  /** Appended-index search: the quantizer trained on the even-id BASE half
    * only (append never re-trains), candidates span the whole corpus. */
  private val simIvfAppend = ivfSql(
    "SELECT vec_id AS cid, embedding::DOUBLE[] AS cvec FROM embeddings " +
      "WHERE vec_id % 2 = 0 ORDER BY vec_id LIMIT 16")

  /** TIME TRAVEL to the appended index's version 0 (the pre-append build):
    * same even-trained quantizer, but the CANDIDATE set is the even half
    * alone — the odd delta tree is not in that committed snapshot. */
  private val simIvfTimeTravel = ivfSql(
    "SELECT vec_id AS cid, embedding::DOUBLE[] AS cvec FROM embeddings " +
      "WHERE vec_id % 2 = 0 ORDER BY vec_id LIMIT 16",
    candWhere = " WHERE vec_id % 2 = 0")

  /** A double literal DuckDB parses AS DOUBLE. Bare decimal literals type as
    * DECIMAL, and a bracketed list of mixed-scale DECIMALs unifies to ONE
    * decimal type BEFORE any `::DOUBLE[]` cast — rounding some elements by
    * an ULP (observed on the PQ codebooks, whose raw-mean magnitudes vary;
    * the unit-normalized IVF centroids merely got lucky). An exponent
    * suffix forces the DOUBLE parse path; `Double.toString` round-trips, so
    * the suffix changes only the parse type, never the value. */
  private def doubleLit(v: Double): String = {
    require(!v.isNaN && !v.isInfinite,
      s"non-finite value $v cannot be spliced as a SQL double literal " +
        "(a NaN/Inf here means a quantizer trained on non-finite input)")
    val s = v.toString
    if (s.contains("E") || s.contains("e")) s else s + "e0"
  }

  private def doubleArrayLit(v: Array[Double]): String =
    s"[${v.map(doubleLit).mkString(", ")}]::DOUBLE[]"

  /** Oracle for the PCA projection: the driver-trained components + bias
    * spliced as literal rows; [[dotSql]]'s index-order fold equals
    * AffineProjectExpr's loop and the bias subtracts once — bit-identical
    * doubles, like the kmeans/PQ oracles. */
  def simPcaSql(comps: Array[Array[Double]], bias: Array[Double],
                where: String = ""): String = {
    val rows = comps.zipWithIndex.map { case (w, p) =>
      s"(CAST($p AS INT), ${doubleArrayLit(w)}, ${doubleLit(bias(p))})"
    }.mkString(",\n    ")
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings$where),
       |w AS (SELECT * FROM (VALUES
       |    $rows) AS t(p, w, b))
       |SELECT vec_id, p AS i, ${dotSql("v", "w")} - b AS yi FROM e, w""".stripMargin
  }

  /** Oracle for the PCA-space candidate generation + exact re-rank: the
    * projected vector is built per component from the spliced literals
    * (index-order fold − bias, bit-identical to AffineProjectExpr), then
    * the same candidate/re-rank shape as [[simProjectTopk]]. */
  def simPcaTopkSql(comps: Array[Array[Double]], bias: Array[Double],
                    candidates: Int): String = {
    val terms = comps.zipWithIndex.map { case (w, p) =>
      s"(${dotSql("v", s"(${doubleArrayLit(w)})")} - ${doubleLit(bias(p))})"
    }.mkString("list_value(", ",\n      ", ")")
    s"""WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |e AS (SELECT vec_id, v, $terms AS y FROM e0),
       |q AS (SELECT vec_id AS qid, v AS qvec, y AS qproj FROM e WHERE vec_id < 10),
       |c AS (SELECT vec_id AS nid, v AS nvec, y AS nproj FROM e),
       |s AS (SELECT qid, nid, qvec, nvec, ${cosineSql("qproj", "nproj")} AS pscore
       |      FROM q, c WHERE nid <> qid),
       |pr AS (SELECT qid, nid, qvec, nvec,
       |         row_number() OVER (PARTITION BY qid ORDER BY pscore DESC, nid ASC) AS prank
       |       FROM s),
       |sv AS (SELECT qid, nid, ${cosineSql("qvec", "nvec")} AS score FROM pr WHERE prank <= $candidates),
       |r AS (SELECT qid, nid, score,
       |        row_number() OVER (PARTITION BY qid ORDER BY score DESC, nid ASC) AS rk FROM sv)
       |SELECT qid, nid, CAST(rk AS BIGINT) AS rank, score FROM r WHERE rk <= 5""".stripMargin
  }

  /** Oracle for the PCA variance report: the model's eigenvalues are the
    * expected table itself (deterministic sample + driver eigensolve). */
  def simPcaVarianceSql(evar: Array[Double], ratio: Array[Double]): String = {
    val rows = evar.indices.map(i =>
      s"(CAST($i AS INT), ${doubleLit(evar(i))}, ${doubleLit(ratio(i))})")
      .mkString(",\n    ")
    s"SELECT * FROM (VALUES\n    $rows) AS t(i, evar, ratio)"
  }

  /** Oracle for the k-means IVF variant: the driver-computed centroids are
    * deterministic literals ([[graft.operators.Similarity.kmeansCentroids]]),
    * so splicing them into a VALUES quantizer reproduces the search
    * bit-for-bit — double literals round-trip exactly through
    * `Double.toString` / SQL parse ([[doubleLit]] pins the parse type).
    * Generated AFTER the query runs ([[SparkEntry.oracleSql]] is dumped
    * last by [[Verify]]). */
  def simIvfKmeansSql(cents: Array[Array[Double]]): String = {
    val rows = cents.zipWithIndex.map { case (v, i) =>
      s"(CAST($i AS BIGINT), ${doubleArrayLit(v)})"
    }.mkString(",\n    ")
    ivfSql(s"SELECT * FROM (VALUES\n    $rows) AS t(cid, cvec)")
  }

  /** Oracle for the embedding-diversity sample: the spliced centroids drive
    * the same score-DESC/cid-ASC nearest-cell assignment as [[ivfSql]], and
    * the per-cell draw mirrors [[graft.operators.Sampling
    * .sampleKPerGroupViaWindow]]'s (hash60(seed:id) ASC, id ASC) rank —
    * deterministic integers end to end, so the sample reproduces
    * bit-for-bit. k = 8, seed = 7 (the registered query's parameters). */
  def sampleDiverseSql(cents: Array[Array[Double]]): String = {
    val rows = cents.zipWithIndex.map { case (v, i) =>
      s"(CAST($i AS BIGINT), ${doubleArrayLit(v)})"
    }.mkString(",\n    ")
    s"""WITH cent AS (SELECT * FROM (VALUES
       |    $rows) AS t(cid, cvec)),
       |e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
       |a AS (SELECT id, cid, row_number() OVER (PARTITION BY id
       |        ORDER BY ${cosineSql("v", "cvec")} DESC, cid ASC) AS r FROM e, cent),
       |cells AS (SELECT id, cid AS cell FROM a WHERE r = 1),
       |rk AS (SELECT cell, id, row_number() OVER (PARTITION BY cell
       |         ORDER BY ${H.hash60Sql(7, "CAST(id AS VARCHAR)")} ASC, id ASC) AS rn
       |       FROM cells)
       |SELECT cell, id AS vec_id FROM rk WHERE rn <= 8""".stripMargin
  }

  /** Oracle for the learned classifier gate: the quantized model
    * ([[graft.operators.TextClassifier.LinearModel]]) is spliced in as the
    * F-row weight VALUES table after the query runs — all-integer math
    * (BIGINT token-bucket dot product + n·bias), so the margin reproduces
    * bit-for-bit with no float aggregation anywhere. */
  def textClassifySql(m: graft.operators.TextClassifier.LinearModel): String = {
    val rows = m.wMicro.zipWithIndex.map { case (wm, b) =>
      s"(CAST($b AS BIGINT), CAST($wm AS BIGINT))"
    }.mkString(",\n    ")
    val bucket = s"(${graft.functions.Portable.hash60Sql("tok")} % ${m.nFeatures})"
    s"""WITH w(b, wm) AS (VALUES
       |    $rows),
       |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
       |SELECT t.doc_id,
       |       CAST(count(*) AS BIGINT) AS n_tokens,
       |       CAST(SUM(w.wm) + count(*) * ${m.biasMicro} AS BIGINT) AS score_micro,
       |       (SUM(w.wm) + count(*) * ${m.biasMicro}) >= 0 AS pred
       |FROM tok t JOIN w ON $bucket = w.b
       |GROUP BY t.doc_id""".stripMargin
  }

  /** Oracle for the BPE tokenizer: the learned merges are spliced in as the
    * identical literal REPLACE chain over the spaced-char representation —
    * Java/Spark and DuckDB `replace` share left-to-right non-overlapping
    * sweep semantics, so token streams agree byte-for-byte. */
  /** The literal REPLACE chain of a merge list over the spaced-char
    * representation of word expression `w`. */
  private def bpeChainSql(merges: Seq[(String, String)]): String = {
    def q(s: String): String = "'" + s.replace("'", "''") + "'"
    merges.foldLeft("' ' || array_to_string(string_split(w, ''), ' ') || ' '") {
      case (r, (x, y)) => s"replace($r, ${q(s" $x $y ")}, ${q(s" $x$y ")})"
    }
  }

  /** Oracle for temperature sampling: the driver-computed (source,
    * 60-bit threshold) artifact is spliced as VALUES and the draw replays
    * as the same integer hash comparison — bit-exact (seed 5, the
    * registered query's). */
  def sampleTemperatureSql(thr: Seq[(String, Long)]): String = {
    val rows = thr.map { case (s, t) =>
      s"('${s.replace("'", "''")}', CAST($t AS BIGINT))"
    }.mkString(",\n    ")
    s"""WITH thr(source, t) AS (VALUES
       |    $rows)
       |SELECT d.doc_id, d.source
       |FROM documents d JOIN thr USING (source)
       |WHERE ${H.hash60Sql(5, "CAST(d.doc_id AS VARCHAR)")} < thr.t""".stripMargin
  }

  /** Oracle for the end-to-end SQL pipeline row: re-derives the FULL chain
    * — exact-dedup representatives ∩ quality gate, temperature draw against
    * the spliced stage-2 threshold artifact (seed 5), token-budget
    * admission in seeded-hash order (seed 7, 400 tokens/source) — from the
    * documents table alone, using the per-stage expressions the individual
    * rows already pin (textQuality / dedupExact / sampleTemperatureSql /
    * sampleTokenBudget). */
  def pipelineSqlOracle(thr: Seq[(String, Long)]): String = {
    val thrRows = thr.map { case (s, t) =>
      s"('${s.replace("'", "''")}', CAST($t AS BIGINT))"
    }.mkString(",\n    ")
    val budgetRows = (0 until 10).map(i => s"('src$i', CAST(400 AS BIGINT))").mkString(", ")
    val nTok = "len(string_split(text, ' '))"
    val digitR = "CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE) / length(text)"
    val lexDiv = s"CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) / $nTok"
    s"""WITH ded AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY sha256(text)),
       |q AS (SELECT doc_id FROM documents
       |      WHERE $nTok BETWEEN 30 AND 90 AND $digitR <= 0.2 AND $lexDiv >= 0.35),
       |s1 AS (SELECT d.doc_id, d.source, d.text FROM documents d
       |       JOIN ded USING (doc_id) JOIN q USING (doc_id)),
       |thr(source, t) AS (VALUES
       |    $thrRows),
       |s2 AS (SELECT s1.doc_id, s1.source, s1.text FROM s1 JOIN thr USING (source)
       |       WHERE ${H.hash60Sql(5, "CAST(s1.doc_id AS VARCHAR)")} < thr.t),
       |tk AS (SELECT doc_id, source, CAST($nTok AS BIGINT) AS n_tokens,
       |         ${H.hash60Sql(7, "CAST(doc_id AS VARCHAR)")} AS h FROM s2),
       |c AS (SELECT doc_id, source, n_tokens,
       |        CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY h ASC, doc_id ASC
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
       |      FROM tk),
       |b AS (SELECT * FROM (VALUES $budgetRows) x(source, budget))
       |SELECT doc_id, source, n_tokens, cum_tokens
       |FROM c JOIN b USING (source) WHERE cum_tokens <= budget""".stripMargin
  }

  def textUnigramSql(m: graft.operators.Unigram.UnigramModel): String =
    textUnigramSqlWhere(m, "WHERE doc_id % 10 = 0")

  /** Streaming-tokenization variant: every doc (the stream covers the whole
    * corpus). */
  def esStreamUnigramSql(m: graft.operators.Unigram.UnigramModel): String =
    textUnigramSqlWhere(m, "")

  /** Oracle for the unigram tokenizer: the learned artifact — the
    * word→segmentation table and the piece-id table — is spliced in as
    * VALUES, and the SQL replays [[graft.operators.Unigram.encodeIds]]'s
    * plan: filtered 0-based word index, LEFT JOIN to the segmentation with
    * per-character fallback, piece positions from array order, id join
    * (OOV pieces drop). All strings and integers — bit-exact. */
  private def textUnigramSqlWhere(m: graft.operators.Unigram.UnigramModel,
                                  where: String): String = {
    def q(s: String): String = "'" + s.replace("'", "''") + "'"
    val segRows = m.wordPieces.map { case (w, ps) =>
      s"(${q(w)}, ${q(ps.mkString(" "))})"
    }.mkString(",\n    ")
    val idRows = m.pieceIds.toSeq.sortBy(_._2).map { case (p, i) =>
      s"(${q(p)}, CAST($i AS BIGINT))"
    }.mkString(",\n    ")
    s"""WITH seg(w, toks) AS (VALUES
       |    $segRows),
       |ids(piece, piece_id) AS (VALUES
       |    $idRows),
       |d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents
       |      $where),
       |wz AS (SELECT doc_id, u.p[1] AS w, u.p[2] AS wo FROM (
       |        SELECT doc_id, unnest(list_zip(ws, range(1, len(ws)+1))) AS p FROM d) u),
       |nz AS (SELECT doc_id, w, row_number() OVER (PARTITION BY doc_id ORDER BY wo) - 1 AS wi
       |       FROM wz WHERE w <> ''),
       |sg AS (SELECT n.doc_id, n.wi,
       |         string_split(coalesce(s.toks,
       |           array_to_string(string_split(n.w, ''), ' ')), ' ') AS ps
       |       FROM nz n LEFT JOIN seg s ON n.w = s.w),
       |pz AS (SELECT doc_id, wi, u.p[1] AS piece, u.p[2] - 1 AS pj FROM (
       |        SELECT doc_id, wi, unnest(list_zip(ps, range(1, len(ps)+1))) AS p FROM sg) u)
       |SELECT p.doc_id, CAST(p.wi AS BIGINT) AS wi, CAST(p.pj AS BIGINT) AS pj,
       |       i.piece_id
       |FROM pz p JOIN ids i ON p.piece = i.piece""".stripMargin
  }

  def textBpeSql(merges: Seq[(String, String)]): String =
    s"""WITH w AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
       |nz AS (SELECT w FROM w WHERE w <> ''),
       |t AS (SELECT unnest(string_split(trim(${bpeChainSql(merges)}), ' ')) AS token FROM nz)
       |SELECT token, CAST(count(*) AS BIGINT) AS n FROM t GROUP BY 1""".stripMargin

  /** Byte-level chain: the spaced representation is the word's UTF-8 bytes
    * as uppercase hex pairs — `hex(encode(w))` split every two chars (the
    * regexp's trailing space + the prepended `' '` give the same sentinel
    * spacing as the char chain). Hex text is byte-identical across
    * engines, so the replace chain replays exactly. */
  private def bpeBytesChainSql(merges: Seq[(String, String)]): String = {
    def q(s: String): String = "'" + s.replace("'", "''") + "'"
    merges.foldLeft("""' ' || regexp_replace(hex(encode(w)), '(..)', '\1 ', 'g')""") {
      case (r, (x, y)) => s"replace($r, ${q(s" $x $y ")}, ${q(s" $x$y ")})"
    }
  }

  def textBpeBytesSql(merges: Seq[(String, String)]): String =
    s"""WITH w AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
       |nz AS (SELECT w FROM w WHERE w <> ''),
       |t AS (SELECT unnest(string_split(trim(${bpeBytesChainSql(merges)}), ' ')) AS token FROM nz)
       |SELECT token, CAST(count(*) AS BIGINT) AS n FROM t GROUP BY 1""".stripMargin

  /** Oracle for the token-ID capstone: same spliced REPLACE chain, then
    * frequency-ranked ids over the WHOLE corpus (count DESC, token ASC) and
    * word-major positions per doc — output restricted to every 10th doc
    * like the query. Word/token ordinals ride `list_zip(xs, range(...))`
    * (numeric struct fields: [1]=element, [2]=ordinal). */
  def textBpeIdsSql(merges: Seq[(String, String)]): String =
    textBpeIdsSqlWhere(merges, "WHERE p.doc_id % 10 = 0")

  /** Streaming-tokenization variant: every doc (the stream covers the whole
    * corpus). */
  def esStreamBpeSql(merges: Seq[(String, String)]): String =
    textBpeIdsSqlWhere(merges, "")

  /** The byte-level ids capstone: the same ranked-id/position machinery as
    * the char chain, over the spaced-hex representation. */
  def textBpeBytesIdsSql(merges: Seq[(String, String)]): String =
    bpeIdsSqlWhere(bpeBytesChainSql(merges), "WHERE p.doc_id % 10 = 0")

  private def textBpeIdsSqlWhere(merges: Seq[(String, String)], where: String): String =
    bpeIdsSqlWhere(bpeChainSql(merges), where)

  private def bpeIdsSqlWhere(chainSql: String, where: String): String =
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |wz AS (SELECT doc_id, u.p[1] AS w, u.p[2] AS wi FROM (
       |         SELECT doc_id, unnest(list_zip(ws, range(1, len(ws)+1))) AS p FROM d) u),
       |nz AS (SELECT * FROM wz WHERE w <> ''),
       |enc AS (SELECT doc_id, wi,
       |          string_split(trim($chainSql), ' ') AS toks FROM nz),
       |tz AS (SELECT doc_id, wi, u.p[1] AS token, u.p[2] AS ti FROM (
       |         SELECT doc_id, wi, unnest(list_zip(toks, range(1, len(toks)+1))) AS p
       |         FROM enc) u),
       |ids AS (SELECT token,
       |          row_number() OVER (ORDER BY n DESC, token ASC) - 1 AS token_id
       |        FROM (SELECT token, count(*) AS n FROM tz GROUP BY 1
       |              ORDER BY n DESC, token ASC LIMIT 65536)),
       |pos AS (SELECT doc_id, token,
       |          row_number() OVER (PARTITION BY doc_id ORDER BY wi, ti) - 1 AS pos
       |        FROM tz)
       |SELECT p.doc_id, CAST(p.pos AS BIGINT) AS pos,
       |       CAST(i.token_id AS BIGINT) AS token_id
       |FROM pos p JOIN ids i USING (token)
       |$where""".stripMargin

  // ---- Shared generated-SQL scaffolding for the PQ oracles: ONE copy of
  // the codebook VALUES, the per-subspace squared-distance lambda (book
  // vector aliased `bvec`), the codes/distance-table CTE block, and the
  // explicit left-to-right ADC sum — [[simPqSql]] and [[simIvfPqSql]]
  // differ only in candidate generation.
  private def pqBookRows(books: Array[Array[Array[Double]]]): String =
    (for { j <- books.indices; c <- books(j).indices }
      yield s"($j, $c, ${doubleArrayLit(books(j)(c))})").mkString(",\n    ")

  private def pqSqSql(dsub: Int)(vec: String): String =
    s"list_reduce(list_transform(range(1, $dsub + 1), " +
      s"i -> ($vec[j * $dsub + i] - bvec[i]) * ($vec[j * $dsub + i] - bvec[i])), " +
      "(acc, x) -> acc + x)"

  private def pqAdcSql(m: Int): String =
    (1 to m).map(p => s"dt[$p][codes[$p] + 1]").mkString(" + ")

  /** The codes + per-query distance-table CTEs; `src` must expose
    * `(nid, nvec)` and the enclosing query must define `q(qid, qvec)` and
    * `book(j, cnum, bvec)`. */
  private def pqCodeCtes(src: String, dsub: Int): String = {
    val sq = pqSqSql(dsub) _
    s"""cd AS (SELECT nid, j, cnum,
       |         row_number() OVER (PARTITION BY nid, j ORDER BY ${sq("nvec")} ASC, cnum ASC) AS r
       |       FROM $src, book),
       |codes AS (SELECT nid, list(cnum ORDER BY j) AS codes FROM cd WHERE r = 1 GROUP BY nid),
       |dtc AS (SELECT qid, j, cnum, ${sq("qvec")} AS d FROM q, book),
       |dtj AS (SELECT qid, j, list(d ORDER BY cnum) AS ds FROM dtc GROUP BY qid, j),
       |dtm AS (SELECT qid, list(ds ORDER BY j) AS dt FROM dtj GROUP BY qid)""".stripMargin
  }

  /** Oracle for PQ asymmetric-distance search: like [[simIvfKmeansSql]], the
    * deterministic codebooks ([[graft.operators.Similarity.pqCodebooks]])
    * are spliced in as a VALUES table AFTER the query runs. Codes = per
    * (vector, subspace) argmin over the subspace's centroids (ties to the
    * lowest centroid id, Spark's first-match `array_position`); adist = the
    * explicit left-to-right m-term sum of table lookups — every term
    * `>= +0.0`, so Spark's zero-seeded fold equals this init-free one
    * bit-for-bit. */
  def simPqSql(books: Array[Array[Array[Double]]]): String = {
    val m = books.length
    val dsub = books(0)(0).length
    s"""WITH c AS (SELECT vec_id AS nid, embedding::DOUBLE[] AS nvec FROM embeddings),
       |q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id < 10),
       |book AS (SELECT * FROM (VALUES
       |    ${pqBookRows(books)}) AS t(j, cnum, bvec)),
       |${pqCodeCtes("c", dsub)},
       |s AS (SELECT qid, nid, ${pqAdcSql(m)} AS adist FROM codes, dtm WHERE nid <> qid),
       |r AS (SELECT qid, nid, adist,
       |        row_number() OVER (PARTITION BY qid ORDER BY adist ASC, nid ASC) AS rk FROM s)
       |SELECT qid, nid, CAST(rk AS BIGINT) AS rank, adist FROM r WHERE rk <= 5""".stripMargin
  }

  /** Oracle for IVF-PQ: both quantizers spliced as VALUES tables (the IVF
    * centroids AND the PQ codebooks are deterministic literals). Cell
    * assignment/probing mirrors [[ivfSql]]'s cosine rank; codes and the ADC
    * sum mirror [[simPqSql]]; candidates come from the cell join. */
  def simIvfPqSql(cents: Array[Array[Double]], books: Array[Array[Array[Double]]],
                  nprobe: Int = 4): String = {
    val m = books.length
    val dsub = books(0)(0).length
    val centRows = cents.zipWithIndex.map { case (v, i) =>
      s"(CAST($i AS BIGINT), ${doubleArrayLit(v)})" }.mkString(",\n    ")
    s"""WITH c AS (SELECT vec_id AS nid, embedding::DOUBLE[] AS nvec FROM embeddings),
       |q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id < 10),
       |cent AS (SELECT * FROM (VALUES
       |    $centRows) AS t(cid, cvec)),
       |book AS (SELECT * FROM (VALUES
       |    ${pqBookRows(books)}) AS t2(j, cnum, bvec)),
       |cellr AS (SELECT nid, nvec, cid,
       |            row_number() OVER (PARTITION BY nid ORDER BY ${cosineSql("nvec", "cvec")} DESC, cid ASC) AS r
       |          FROM c, cent),
       |cells AS (SELECT nid, nvec, cid AS cell FROM cellr WHERE r = 1),
       |qr AS (SELECT qid, qvec, cid,
       |         row_number() OVER (PARTITION BY qid ORDER BY ${cosineSql("qvec", "cvec")} DESC, cid ASC) AS r
       |       FROM q, cent),
       |probes AS (SELECT qid, cid AS cell FROM qr WHERE r <= $nprobe),
       |${pqCodeCtes("cells", dsub)},
       |cand AS (SELECT p.qid, cl.nid FROM cells cl JOIN probes p USING (cell)
       |         WHERE cl.nid <> p.qid),
       |s AS (SELECT cand.qid, cand.nid, ${pqAdcSql(m)} AS adist
       |      FROM cand JOIN codes ON cand.nid = codes.nid JOIN dtm ON cand.qid = dtm.qid),
       |r AS (SELECT qid, nid, adist,
       |        row_number() OVER (PARTITION BY qid ORDER BY adist ASC, nid ASC) AS rk FROM s)
       |SELECT qid, nid, CAST(rk AS BIGINT) AS rank, adist FROM r WHERE rk <= 5""".stripMargin
  }

  /** Bloom probe oracle: same uhash slot family, whole-corpus sketch (the
    * union-distinct merge law makes it equal to the Spark side's two merged
    * shard sketches), candidates = top-20 tokens + five fabricated absents.
    * `maybe_present` verdicts are deterministic on both engines — even a
    * false positive reproduces bit-for-bit. */
  private val sketchBloom = {
    val m = 1 << 20; val k = 5
    val slotSel = (0 until k).map(i =>
      s"SELECT ${H.uhashSql(i, "hm")} % $m AS slot FROM h").mkString("\n  UNION ALL ")
    val candCells = (0 until k).map(i =>
      s"SELECT tok, ${H.uhashSql(i, "hm")} % $m AS slot FROM ch").mkString("\n  UNION ALL ")
    s"""WITH t AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
       |tt AS (SELECT tok FROM t WHERE tok <> ''),
       |h AS (SELECT DISTINCT tok, ${H.uhashBaseSql("tok")} AS hm FROM tt),
       |slots AS (SELECT DISTINCT slot FROM ($slotSel)),
       |top AS (SELECT tok FROM (SELECT tok, count(*) AS c FROM tt GROUP BY tok
       |        ORDER BY c DESC, tok ASC LIMIT 20)),
       |cand AS (SELECT tok FROM top UNION ALL
       |         SELECT tok FROM (VALUES ('__graft_absent_1'), ('__graft_absent_2'),
       |           ('__graft_absent_3'), ('__graft_absent_4'), ('__graft_absent_5')) v(tok)),
       |ch AS (SELECT tok, ${H.uhashBaseSql("tok")} AS hm FROM cand),
       |cc AS ($candCells)
       |SELECT cc.tok, count(s.slot) = $k AS maybe_present
       |FROM cc LEFT JOIN slots s ON cc.slot = s.slot
       |GROUP BY cc.tok""".stripMargin
  }

  /** PIVOT as conditional aggregation (Spark's explicit-value pivot plans
    * to exactly this single aggregate). */
  private val pivotOrders = {
    val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    val cols = prios.zipWithIndex.map { case (p, i) =>
      s"CAST(count(*) FILTER (WHERE o_orderpriority = '$p') AS BIGINT) AS p$i" }
      .mkString(",\n  ")
    s"""SELECT o_orderstatus,
       |  $cols
       |FROM orders GROUP BY 1""".stripMargin
  }

  /** DuckDB's `sum(BIGINT)` widens to HUGEINT (int128), which a pandas/arrow
    * fetch renders as float64 — hash-diverging from Spark's int64 even when
    * every value matches. Every BIGINT-sum an oracle exposes must be CAST back
    * to BIGINT. */
  private val windowRunning =
    """WITH o AS (SELECT o_custkey, o_orderkey, o_orderdate,
      |             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |           FROM orders WHERE o_custkey % 10 = 0)
      |SELECT o_custkey, o_orderkey, cents,
      |  CAST(row_number() OVER w AS BIGINT) AS order_seq,
      |  CAST(sum(cents) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_cents,
      |  lag(o_orderkey, 1) OVER w AS prev_order
      |FROM o WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin

  /** Discrete quantiles: value at rank floor((n-1)p/1000) — integer rank
    * arithmetic mirrored exactly ([[graft.operators.Stats.quantilesDisc]]). */
  private val statsQuantiles =
    """WITH s AS (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qty FROM lineitem),
      |r AS (SELECT l_returnflag, qty,
      |       row_number() OVER (PARTITION BY l_returnflag ORDER BY qty) - 1 AS rn,
      |       count(*) OVER (PARTITION BY l_returnflag) AS n
      |      FROM s),
      |p AS (SELECT CAST(unnest([0, 250, 500, 750, 1000]) AS BIGINT) AS permille)
      |SELECT l_returnflag, permille, qty AS q_value
      |FROM r JOIN p ON rn = ((n - 1) * permille) // 1000""".stripMargin

  private val statsHistogram = {
    val b = graft.operators.RangeJoin.floorDivSql("v", 50)
    s"""WITH t AS (SELECT event_type, CAST(round(value) AS BIGINT) AS v FROM events),
       |b AS (SELECT event_type, $b AS bucket FROM t)
       |SELECT event_type, bucket, CAST(count(*) AS BIGINT) AS n, bucket * 50 AS bucket_lo
       |FROM b GROUP BY 1, 2""".stripMargin
  }

  /** Histogram-sketch quantiles: rank r = (n-1)p div 1000 falls in the
    * bucket where cum-n <= r < cum (the [[graft.operators.Stats
    * .quantilesFromHistogram]] rule, integer-exact on both engines; the
    * window sums stay in predicates, so DuckDB's HUGEINT widening never
    * reaches the projected columns). */
  private val statsQuantilesApprox = {
    val b = graft.operators.RangeJoin.floorDivSql("v", 50)
    s"""WITH t AS (SELECT event_type, CAST(round(value) AS BIGINT) AS v FROM events),
       |h AS (SELECT event_type, $b AS bucket, count(*) AS n FROM t GROUP BY 1, 2),
       |c AS (SELECT event_type, bucket, n,
       |        sum(n) OVER (PARTITION BY event_type ORDER BY bucket) AS cum,
       |        sum(n) OVER (PARTITION BY event_type) AS tot FROM h),
       |p AS (SELECT CAST(unnest([0, 250, 500, 750, 1000]) AS BIGINT) AS permille)
       |SELECT event_type, permille, CAST(bucket * 50 AS BIGINT) AS q_lo
       |FROM c JOIN p ON (cum - n) <= ((tot - 1) * permille) // 1000
       |              AND ((tot - 1) * permille) // 1000 < cum""".stripMargin
  }

  /** Sample quantiles: the bottom-k-by-hash sample is a pure function of the
    * input multiset (`DISTINCT flag, h, v` then the k smallest `(h, v)` per
    * flag), so plain SQL reproduces the Spark aggregate bit-for-bit; the
    * rank rule is [[graft.operators.Stats.quantilesDisc]]'s integer form. */
  private val statsQuantilesSample = {
    val h = graft.functions.Portable.hash60Sql("concat(l_orderkey, ':', l_linenumber)")
    s"""WITH t AS (SELECT l_returnflag, $h AS h,
       |             CAST(round(l_extendedprice * 100) AS BIGINT) AS v FROM lineitem),
       |s AS (SELECT DISTINCT l_returnflag, h, v FROM t),
       |w AS (SELECT l_returnflag, v,
       |        row_number() OVER (PARTITION BY l_returnflag ORDER BY h, v) AS hr
       |      FROM s),
       |r AS (SELECT l_returnflag, v,
       |        row_number() OVER (PARTITION BY l_returnflag ORDER BY v) - 1 AS rn,
       |        count(*) OVER (PARTITION BY l_returnflag) AS n
       |      FROM w WHERE hr <= 256),
       |p AS (SELECT CAST(unnest([0, 250, 500, 900, 1000]) AS BIGINT) AS permille)
       |SELECT l_returnflag, permille, v AS q_value
       |FROM r JOIN p ON rn = ((n - 1) * permille) // 1000""".stripMargin
  }

  private val joinSalted =
    """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_lines, sum(l_quantity) AS sum_qty
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1""".stripMargin

  /** Backward as-of join, recomputed the naive way (per-left-row LATERAL
    * lookup) — correctness only; the Spark side is the union-and-sweep plan.
    * Tie rules must mirror [[graft.operators.AsOfJoin.asOf]]: match at or
    * before the left time in MILLISECONDS (the emitted unit — ordering by
    * raw ts would resolve sub-ms ties differently), greatest right event_id
    * wins a time tie, matches older than one hour null out (implemented here
    * by the lateral WHERE, so the whole match row goes NULL). */
  private val joinAsof =
    """SELECT l.user_id, l.event_id, epoch_ms(l.ts) AS ts_ms,
      |  c.mid AS matched_event_id, c.mts AS matched_ts_ms, c.mval AS matched_value
      |FROM events l LEFT JOIN LATERAL (
      |  SELECT r.event_id AS mid, epoch_ms(r.ts) AS mts, r.value AS mval
      |  FROM events r
      |  WHERE r.user_id = l.user_id AND r.event_type = 'click'
      |    AND epoch_ms(r.ts) <= epoch_ms(l.ts)
      |    AND epoch_ms(l.ts) - epoch_ms(r.ts) <= 3600000
      |  ORDER BY epoch_ms(r.ts) DESC, r.event_id DESC LIMIT 1) c ON true
      |WHERE l.event_type = 'view'""".stripMargin

  /** Keyed point-in-interval join as the plain non-equi join the bucketed
    * Spark plan must exactly reproduce. */
  private val joinRange =
    """WITH e AS (SELECT event_id, user_id, event_type, epoch_ms(ts) AS ts_ms FROM events),
      |iv AS (SELECT user_id, event_id AS interval_id, ts_ms - 14400000 AS lo, ts_ms AS hi
      |       FROM e WHERE event_type = 'purchase' AND user_id % 2 = 0),
      |p AS (SELECT user_id, event_id AS point_id, ts_ms FROM e WHERE event_type = 'view')
      |SELECT iv.interval_id, p.point_id, p.user_id, p.ts_ms, iv.lo, iv.hi
      |FROM iv JOIN p ON p.user_id = iv.user_id AND p.ts_ms >= iv.lo AND p.ts_ms <= iv.hi""".stripMargin

  /** Streaming as-of enrichment: arrival order IS offset order (the fixture
    * appends sorted by event_id), so "latest click the stream had delivered
    * before this view" = the lateral lookup on a strictly smaller event_id —
    * chunking-invariant, hence exactly recomputable in batch SQL. */
  private val esStreamAsof =
    """WITH e AS (SELECT event_id, user_id, event_type, epoch_ms(ts) AS ts_ms FROM events)
      |SELECT v.user_id, v.event_id AS offset, v.ts_ms AS t,
      |       c.moff AS matched_offset, c.mt AS matched_t
      |FROM e v LEFT JOIN LATERAL (
      |  SELECT r.event_id AS moff, r.ts_ms AS mt FROM e r
      |  WHERE r.user_id = v.user_id AND r.event_type = 'click'
      |    AND r.event_id < v.event_id
      |  ORDER BY r.event_id DESC LIMIT 1) c ON true
      |WHERE v.event_type = 'view'""".stripMargin

  /** Interval-overlap join as the plain non-equi join the first-cell-emit
    * bucketed Spark plan must exactly reproduce (inclusive ends). */
  private val joinOverlap =
    """WITH e AS (SELECT event_id, user_id, event_type, epoch_ms(ts) AS ts_ms FROM events),
      |a AS (SELECT user_id, event_id AS aid, ts_ms - 7200000 AS alo, ts_ms AS ahi
      |      FROM e WHERE event_type = 'purchase'),
      |b AS (SELECT user_id, event_id AS bid, ts_ms - 7200000 AS blo, ts_ms AS bhi
      |      FROM e WHERE event_type = 'error')
      |SELECT a.user_id, aid, bid, alo, ahi, blo, bhi
      |FROM a JOIN b ON a.user_id = b.user_id AND alo <= bhi AND blo <= ahi""".stripMargin

  private val sketchKmv = graft.operators.Sketch.kmvDistinctSql(64,
    """SELECT lang, tok AS v FROM
      |  (SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents)
      |WHERE tok <> ''""".stripMargin, Seq("lang"))

  /** Dataset card: every metric recomputed independently — counts/sums,
    * duplicate-doc mass over the text hash, the exact lower-median document
    * length at rank (n+1)//2, and the same KMV vocabulary estimator. */
  private val textDatacard = {
    val kmv = graft.operators.Sketch.kmvDistinctSql(256,
      """SELECT lang, tok AS v FROM
        |  (SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents)
        |WHERE tok <> ''""".stripMargin, Seq("lang"))
    s"""WITH base AS (SELECT lang, doc_id,
       |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
       |         CAST(length(text) AS BIGINT) AS n_chars,
       |         ${H.hash60Sql("text")} AS h FROM documents),
       |per AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       |               CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       |               CAST(sum(n_chars) AS BIGINT) AS n_chars FROM base GROUP BY 1),
       |dup AS (SELECT lang,
       |               CAST(coalesce(sum(c) FILTER (WHERE c > 1), 0) AS BIGINT) AS n_dup_docs
       |        FROM (SELECT lang, h, count(*) AS c FROM base GROUP BY 1, 2) GROUP BY 1),
       |med AS (SELECT lang, n_tok AS median_doc_tokens FROM (
       |          SELECT lang, n_tok,
       |                 row_number() OVER (PARTITION BY lang ORDER BY n_tok) AS rn,
       |                 count(*) OVER (PARTITION BY lang) AS cnt FROM base)
       |        WHERE rn = (cnt + 1) // 2),
       |voc AS (SELECT lang, n_distinct_est AS vocab_est FROM ($kmv))
       |SELECT per.lang, n_docs, n_tokens, n_chars, n_dup_docs, median_doc_tokens, vocab_est
       |FROM per JOIN dup USING (lang) JOIN med USING (lang) JOIN voc USING (lang)""".stripMargin
  }

  /** KMV overlap of the two doc-parity shard vocabularies per language —
    * the same k-min coincidence estimator over the same md5 hashes. */
  private val sketchKmvOverlap = graft.operators.Sketch.kmvOverlapSql(256,
    """SELECT lang, tok AS v FROM
      |  (SELECT lang, doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
      |WHERE tok <> '' AND doc_id % 2 = 0""".stripMargin,
    """SELECT lang, tok AS v FROM
      |  (SELECT lang, doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
      |WHERE tok <> '' AND doc_id % 2 <> 0""".stripMargin,
    Seq("lang"))

  /** HLL register table (p=6) per language — whole-corpus registers equal the
    * Spark side's two merged doc-parity shard sketches by the per-bucket-max
    * merge law; rho is integer-exact via bit length (no float log). */
  private val sketchHll = graft.operators.Sketch.hllSketchSql(6,
    """SELECT lang, tok AS v FROM
      |  (SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents)
      |WHERE tok <> ''""".stripMargin, Seq("lang"))

  /** Count-min grid + point reads for the true top-10 tokens, depth 4 ×
    * width 1024 — every cell count and estimate an exact integer. */
  private val sketchCms = {
    val depth = 4; val width = 1024
    val cells = (0 until depth).map(i =>
      s"SELECT $i AS d, ${H.uhashSql(i, "hm")} % $width AS slot, CAST(count(*) AS BIGINT) AS cnt FROM h GROUP BY 1, 2")
      .mkString("\n  UNION ALL ")
    val candCells = (0 until depth).map(i =>
      s"SELECT tok, true_cnt, $i AS d, ${H.uhashSql(i, "hm")} % $width AS slot FROM ch")
      .mkString("\n  UNION ALL ")
    s"""WITH t AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
       |tt AS (SELECT tok FROM t WHERE tok <> ''),
       |h AS (SELECT tok, ${H.uhashBaseSql("tok")} AS hm FROM tt),
       |cells AS ($cells),
       |cand AS (SELECT tok, CAST(count(*) AS BIGINT) AS true_cnt FROM tt
       |         GROUP BY tok ORDER BY true_cnt DESC, tok ASC LIMIT 10),
       |ch AS (SELECT tok, true_cnt, ${H.uhashBaseSql("tok")} AS hm FROM cand),
       |cc AS ($candCells)
       |SELECT cc.tok, cc.true_cnt, min(cells.cnt) AS est_cnt
       |FROM cc JOIN cells USING (d, slot)
       |GROUP BY cc.tok, cc.true_cnt""".stripMargin
  }

  private val multimodalDecode =
    """SELECT doc_id AS media_id,
      |  ['image/png', 'audio/wav', 'video/mp4'][CAST(doc_id % 3 + 1 AS INT)] AS content_type,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  CAST(CASE WHEN doc_id % 3 IN (0, 2) THEN octet_length(encode(text)) % 640 + 16 ELSE 0 END AS BIGINT) AS width,
      |  CAST(CASE WHEN doc_id % 3 IN (0, 2) THEN (octet_length(encode(text)) * 7) % 480 + 16 ELSE 0 END AS BIGINT) AS height,
      |  CAST(CASE WHEN doc_id % 3 IN (1, 2) THEN octet_length(encode(text)) % 10000 ELSE 0 END AS BIGINT) AS duration_ms,
      |  CAST(CASE WHEN length(text) = 0 THEN 0
      |       ELSE ascii(substr(text, 1, 1)) * 256 + ascii(substr(text, -1, 1)) END AS BIGINT) AS checksum
      |FROM documents""".stripMargin

  /** [[graft.Fixtures.syntheticWav]]'s closed form re-derived in SQL: the
    * decoder's output must equal the generator's arithmetic — n samples of
    * ((id·31 + i·17) mod 2048) − 1024 at 8 kHz mono PCM16. */
  private val multimodalDecodeWav =
    """WITH d AS (SELECT doc_id, 64 + doc_id % 128 AS n FROM documents),
      |e AS (SELECT doc_id, n, unnest(range(n)) AS i FROM d)
      |SELECT doc_id AS media_id, CAST(1 AS BIGINT) AS channels,
      |       CAST(8000 AS BIGINT) AS sample_rate, n AS n_samples,
      |       n * 1000 // 8000 AS duration_ms,
      |       CAST(sum(abs((doc_id*31 + i*17) % 2048 - 1024)) AS BIGINT) AS sum_abs,
      |       CAST(max(abs((doc_id*31 + i*17) % 2048 - 1024)) AS BIGINT) AS peak
      |FROM e GROUP BY 1,2,3,4,5""".stripMargin

  /** [[graft.Fixtures.syntheticPng]]'s closed form: channel c at (x, y) =
    * (id·5 + 2x + 11y + 3c) mod 256 — PNG is lossless, so the JDK ImageIO
    * decode reproduces the generator's arithmetic exactly. */
  private val multimodalDecodePng =
    """WITH d AS (SELECT doc_id, 5 + doc_id % 7 AS w, 4 + doc_id % 6 AS h FROM documents),
      |px AS (SELECT doc_id, w, h, unnest(range(w)) AS x FROM d),
      |pxy AS (SELECT doc_id, w, h, x, unnest(range(h)) AS y FROM px)
      |SELECT doc_id AS media_id, w AS width, h AS height,
      |  CAST(sum((doc_id*5 + 2*x + 11*y) % 256) AS BIGINT) AS sum_r,
      |  CAST(sum((doc_id*5 + 2*x + 11*y + 3) % 256) AS BIGINT) AS sum_g,
      |  CAST(sum((doc_id*5 + 2*x + 11*y + 6) % 256) AS BIGINT) AS sum_b
      |FROM pxy GROUP BY 1,2,3""".stripMargin

  /** [[graft.Fixtures.syntheticBmp]]'s closed form: channel c at (x, y) =
    * (id + 3x + 7y + c) mod 256 over a w×h grid. */
  private val multimodalDecodeBmp =
    """WITH d AS (SELECT doc_id, 4 + doc_id % 8 AS w, 3 + doc_id % 5 AS h FROM documents),
      |px AS (SELECT doc_id, w, h, unnest(range(w)) AS x FROM d),
      |pxy AS (SELECT doc_id, w, h, x, unnest(range(h)) AS y FROM px)
      |SELECT doc_id AS media_id, w AS width, h AS height,
      |  CAST(sum((doc_id + 3*x + 7*y) % 256) AS BIGINT) AS sum_r,
      |  CAST(sum((doc_id + 3*x + 7*y + 1) % 256) AS BIGINT) AS sum_g,
      |  CAST(sum((doc_id + 3*x + 7*y + 2) % 256) AS BIGINT) AS sum_b
      |FROM pxy GROUP BY 1,2,3""".stripMargin

  /** [[graft.Fixtures.syntheticMp4]]'s closed form: the box walk must
    * return exactly the generator's container fields — timescale 600 with
    * duration 600·k makes duration_ms = 1000·k exactly; sample counts sum
    * the video track's 30·k with the odd-id audio track's 48·k. */
  private val multimodalDecodeMp4 =
    """SELECT doc_id AS media_id, 'isom' AS brand,
      |  CAST(1 + doc_id % 2 AS BIGINT) AS n_tracks,
      |  CAST(16 * (4 + doc_id % 9) AS BIGINT) AS width,
      |  CAST(16 * (3 + doc_id % 7) AS BIGINT) AS height,
      |  CAST(1000 * (1 + doc_id % 10) AS BIGINT) AS duration_ms,
      |  CAST(30 * (1 + doc_id % 10)
      |       + (doc_id % 2) * 48 * (1 + doc_id % 10) AS BIGINT) AS n_samples,
      |  CAST(CASE WHEN doc_id % 2 = 1 THEN 48000 ELSE 0 END AS BIGINT) AS audio_rate,
      |  CASE WHEN doc_id % 2 = 1 THEN 'avc1,mp4a' ELSE 'avc1' END AS codecs
      |FROM documents""".stripMargin

  /** [[graft.Fixtures.syntheticFlac]]'s closed form: STREAMINFO bit-field
    * unpack must return the generator's fields; duration_ms is floor
    * integer division on both engines (`//` here, Long division there). */
  private val multimodalDecodeFlac =
    """SELECT doc_id AS media_id,
      |  CAST(8000 + 4000 * (doc_id % 3) AS BIGINT) AS sample_rate,
      |  CAST(1 + doc_id % 2 AS BIGINT) AS channels,
      |  CAST(8 + 4 * (doc_id % 3) AS BIGINT) AS bits_per_sample,
      |  CAST(1000 * (1 + doc_id % 8) AS BIGINT) AS n_samples,
      |  CAST(1000 * (1 + doc_id % 8) * 1000
      |       // (8000 + 4000 * (doc_id % 3)) AS BIGINT) AS duration_ms
      |FROM documents""".stripMargin

  /** [[graft.Fixtures.syntheticMp4Samples]]' closed form: the stbl walk
    * (stsz table + stts + stsc + stco/co64 expansion) must land every
    * sample at the track-contiguous prefix-sum offset the generator laid
    * out — video track of `3 + id mod 6` samples sized `1 + (id+i) mod 7`
    * at dts `100·i`; odd ids add an audio track of `2 + id mod 4` samples
    * sized `1 + (2·id+i) mod 5` at dts `1024·i`, offset past the whole
    * video track. The window sum ordered (track, i) IS that layout. */
  private val multimodalMp4Samples =
    """WITH v AS (
      |  SELECT doc_id, 1 AS track_id, unnest(range(0, 3 + doc_id % 6)) AS i
      |  FROM documents),
      |a AS (
      |  SELECT doc_id, 2 AS track_id, unnest(range(0, 2 + doc_id % 4)) AS i
      |  FROM documents WHERE doc_id % 2 = 1),
      |u AS (
      |  SELECT doc_id, track_id, i, 1 + (doc_id + i) % 7 AS sz, 100 * i AS dts FROM v
      |  UNION ALL
      |  SELECT doc_id, track_id, i, 1 + (2 * doc_id + i) % 5 AS sz, 1024 * i AS dts FROM a)
      |SELECT doc_id AS media_id,
      |  CAST(track_id AS BIGINT) AS track_id,
      |  CAST(i AS BIGINT) AS sample_idx,
      |  CAST(SUM(sz) OVER (PARTITION BY doc_id ORDER BY track_id, i
      |                     ROWS UNBOUNDED PRECEDING) - sz AS BIGINT) AS rel_offset,
      |  CAST(sz AS BIGINT) AS size,
      |  CAST(dts AS BIGINT) AS dts
      |FROM u""".stripMargin

  /** [[graft.Fixtures.syntheticFlacFrames]]' closed form: the frame-header
    * walk must index frame `i` at `42 + 6·i + prefix-sum(payload sizes)`
    * (fixed 42-byte fLaC+STREAMINFO head, 6-byte headers while frame
    * numbers stay under 128) with sample offset `4096·i`. */
  private val multimodalFlacFrames =
    """WITH f AS (
      |  SELECT doc_id, unnest(range(0, 3 + doc_id % 6)) AS i FROM documents),
      |s AS (SELECT doc_id, i, 4 + (doc_id + i) % 9 AS sz FROM f)
      |SELECT doc_id AS media_id,
      |  CAST(i AS BIGINT) AS frame_idx,
      |  CAST(42 + 6 * i + SUM(sz) OVER (PARTITION BY doc_id ORDER BY i
      |                                  ROWS UNBOUNDED PRECEDING) - sz
      |       AS BIGINT) AS byte_offset,
      |  CAST(4096 * i AS BIGINT) AS sample_offset
      |FROM s""".stripMargin

  /** Keyframe/pts closed form over [[multimodalMp4Samples]]' fixture: the
    * video track's stss marks every `2 + id mod 3`-th sample (1-based, so
    * 0-based idx i is sync iff i mod k = 0) and its ctts offsets are
    * `10·(i mod 3)` (pts = 100·i + that); the audio track has neither box,
    * so every sample is sync and pts = dts = 1024·i. */
  private val multimodalMp4Keyframes =
    """WITH v AS (
      |  SELECT doc_id, 1 AS track_id, unnest(range(0, 3 + doc_id % 6)) AS i
      |  FROM documents),
      |a AS (
      |  SELECT doc_id, 2 AS track_id, unnest(range(0, 2 + doc_id % 4)) AS i
      |  FROM documents WHERE doc_id % 2 = 1),
      |u AS (
      |  SELECT doc_id, track_id, i, 100 * i + 10 * (i % 3) AS pts,
      |         CASE WHEN i % (2 + doc_id % 3) = 0 THEN 1 ELSE 0 END AS is_sync
      |  FROM v
      |  UNION ALL
      |  SELECT doc_id, track_id, i, 1024 * i AS pts, 1 AS is_sync FROM a)
      |SELECT doc_id AS media_id,
      |  CAST(track_id AS BIGINT) AS track_id,
      |  CAST(i AS BIGINT) AS sample_idx,
      |  CAST(pts AS BIGINT) AS pts,
      |  CAST(is_sync AS BIGINT) AS is_sync
      |FROM u""".stripMargin

  /** Slice checksums over [[multimodalMp4Samples]]' layout: sample content
    * byte j of (track ordinal t, sample i) is `t·31 + i·7 + j` — the
    * generator's mod-251 never binds at fixture scale (max 86) — so
    * `byte_sum = sz·(t·31 + i·7) + sz·(sz−1)/2`, arithmetic-series exact. */
  private val multimodalMp4Slice =
    """WITH v AS (
      |  SELECT doc_id, 1 AS track_id, unnest(range(0, 3 + doc_id % 6)) AS i
      |  FROM documents),
      |a AS (
      |  SELECT doc_id, 2 AS track_id, unnest(range(0, 2 + doc_id % 4)) AS i
      |  FROM documents WHERE doc_id % 2 = 1),
      |u AS (
      |  SELECT doc_id, track_id, i, 1 + (doc_id + i) % 7 AS sz FROM v
      |  UNION ALL
      |  SELECT doc_id, track_id, i, 1 + (2 * doc_id + i) % 5 AS sz FROM a)
      |SELECT doc_id AS media_id,
      |  CAST(track_id AS BIGINT) AS track_id,
      |  CAST(i AS BIGINT) AS sample_idx,
      |  CAST(sz AS BIGINT) AS n_bytes,
      |  CAST(sz * ((track_id - 1) * 31 + i * 7) + sz * (sz - 1) // 2
      |       AS BIGINT) AS byte_sum
      |FROM u""".stripMargin

  /** Slice checksums over [[multimodalFlacFrames]]' layout: payload byte j
    * of frame i is `i·13 + j` (mod-127 never binds at fixture scale, max
    * 103), so `byte_sum = sz·i·13 + sz·(sz−1)/2`. */
  private val multimodalFlacSlice =
    """WITH f AS (
      |  SELECT doc_id, unnest(range(0, 3 + doc_id % 6)) AS i FROM documents),
      |s AS (SELECT doc_id, i, 4 + (doc_id + i) % 9 AS sz FROM f)
      |SELECT doc_id AS media_id,
      |  CAST(i AS BIGINT) AS frame_idx,
      |  CAST(sz AS BIGINT) AS n_bytes,
      |  CAST(sz * i * 13 + sz * (sz - 1) // 2 AS BIGINT) AS byte_sum
      |FROM s""".stripMargin

  /** [[graft.Fixtures.syntheticFlacSeekable]]' closed form: one point per
    * 2 frames; point for frame i carries sample `4096·i` and byte offset
    * `6·i + prefix-sum(sizes)` from the first frame (6-byte headers while
    * frame numbers stay under 128), frame_samples = the 4096 block size. */
  private val multimodalFlacSeektable =
    """WITH f AS (
      |  SELECT doc_id, unnest(range(0, 4 + doc_id % 5)) AS i FROM documents),
      |s AS (SELECT doc_id, i, 5 + (doc_id + i) % 8 AS sz FROM f),
      |c AS (SELECT doc_id, i,
      |        6 * i + SUM(sz) OVER (PARTITION BY doc_id ORDER BY i
      |                              ROWS UNBOUNDED PRECEDING) - sz AS off
      |      FROM s)
      |SELECT doc_id AS media_id,
      |  CAST(i // 2 AS BIGINT) AS point_idx,
      |  CAST(4096 * i AS BIGINT) AS sample_number,
      |  CAST(off AS BIGINT) AS byte_offset,
      |  CAST(4096 AS BIGINT) AS frame_samples
      |FROM c WHERE i % 2 = 0""".stripMargin

  /** [[graft.Fixtures.syntheticFlacPcm]]' closed form: the bit-unpacked
    * samples must equal the generator's — sample `i` of (frame f,
    * channel c) is `(id·7 + f·131 + c·17 + i·29) mod 121`, or the
    * constant `id mod 121` when `(id+f+c) mod 4 = 0` (the CONSTANT
    * subframe case). Ids with `id mod 5 = 4` end in a SHORT 192-sample
    * last frame (inline-blocksize header); ids with `id mod 10 = 7`
    * encode ESCAPE (raw-bits) rice partitions — the oracle stays
    * decode-side, so every layout must reproduce the same samples. The
    * oracle regenerates all samples per channel and aggregates — REAL
    * sample decode checked sample-by-sample in aggregate. */
  private val multimodalFlacPcm =
    """WITH fr AS (
      |  SELECT doc_id, unnest(range(0, 2 + doc_id % 3)) AS f FROM documents),
      |ch AS (SELECT doc_id, f, unnest(range(0, 1 + doc_id % 2)) AS c FROM fr),
      |sm AS (SELECT doc_id, f, c,
      |         unnest(range(0, CASE WHEN doc_id % 5 = 4 AND f = 1 + doc_id % 3
      |                              THEN 192 ELSE 256 END)) AS i
      |       FROM ch),
      |v AS (SELECT doc_id, f, c, i,
      |        CASE WHEN (doc_id + f + c) % 4 = 0 THEN doc_id % 121
      |             ELSE (doc_id * 7 + f * 131 + c * 17 + i * 29) % 121
      |        END AS s
      |      FROM sm)
      |SELECT doc_id AS media_id,
      |  CAST(f AS BIGINT) AS frame_idx,
      |  CAST(c AS BIGINT) AS channel,
      |  CAST(count(*) AS BIGINT) AS n_samples,
      |  CAST(SUM(s) AS BIGINT) AS sum_pcm,
      |  CAST(MAX(s) AS BIGINT) AS peak
      |FROM v GROUP BY doc_id, f, c""".stripMargin

  /** The curation filter over [[multimodalDecodeMp4]]'s closed form: the
    * WHERE recomputes the predicate from the generator arithmetic —
    * width ≥ 96 ⇔ doc_id mod 9 ≥ 2, duration ∈ [3 s, 8 s] ⇔
    * doc_id mod 10 ∈ [2, 7], has-audio ⇔ odd id. */
  private val multimodalCurate =
    """SELECT doc_id AS media_id,
      |  CAST(16 * (4 + doc_id % 9) AS BIGINT) AS width,
      |  CAST(16 * (3 + doc_id % 7) AS BIGINT) AS height,
      |  CAST(1000 * (1 + doc_id % 10) AS BIGINT) AS duration_ms,
      |  CAST(48000 AS BIGINT) AS audio_rate,
      |  CAST(30 * (1 + doc_id % 10)
      |       + 48 * (1 + doc_id % 10) AS BIGINT) AS n_samples
      |FROM documents
      |WHERE 16 * (4 + doc_id % 9) >= 96
      |  AND 1000 * (1 + doc_id % 10) BETWEEN 3000 AND 8000
      |  AND doc_id % 2 = 1""".stripMargin

  private val multimodalFrames =
    """WITH f AS (
      |  SELECT doc_id AS media_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
      |  FROM documents WHERE doc_id % 3 = 2)
      |SELECT media_id, n_bytes % 30 AS n_frames,
      |       unnest(range(0, n_bytes % 30, 5)) AS frame_idx
      |FROM f WHERE n_bytes % 30 > 0""".stripMargin

  /** Codec-free media near-dup: 32-byte (64 hex chars) fixed-grid chunks of
    * the payload bytes, distinct 60-bit chunk hashes with the df cap, pairs
    * sharing >= 2 — mirrors [[graft.operators.Multimodal.binaryNearDups]]
    * (upper-hex encoding makes the chunk text byte-identical across
    * engines). */
  private val multimodalDedup =
    s"""WITH m AS (SELECT doc_id AS media_id, upper(hex(encode(text))) AS hx FROM documents),
       |cz AS (SELECT media_id,
       |         unnest(list_transform(range(0, greatest((length(hx) - 1) // 64, 0) + 1),
       |           i -> substring(hx, CAST(i * 64 + 1 AS BIGINT), 64))) AS c
       |       FROM m),
       |chd AS (SELECT DISTINCT media_id, ${H.hash60Sql("c")} AS ch FROM cz WHERE c <> ''),
       |heavy AS (SELECT ch FROM chd GROUP BY ch HAVING count(*) > 64),
       |ch AS (SELECT media_id, ch FROM chd WHERE ch NOT IN (SELECT ch FROM heavy))
       |SELECT a.media_id AS i, b.media_id AS j, CAST(count(*) AS BIGINT) AS n_shared
       |FROM ch a JOIN ch b USING (ch) WHERE a.media_id < b.media_id
       |GROUP BY 1, 2 HAVING count(*) >= 2""".stripMargin

  /** CDC media near-dup over the byte-inserted-twin fixture: cuts at byte
    * offsets whose trailing 8-byte polynomial window hash
    * (Σ B[c−k]·131^k, exact BIGINT) is 0 mod 16 — the purely
    * position-local content-defined rule — chunks between consecutive
    * cuts, then the same df-cap + shared-chunk pair join; mirrors
    * [[graft.operators.Multimodal.binaryNearDupsCdc]]. */
  /** One side's DISTINCT (id, ch) CDC chunk rows as a derived-table SQL
    * fragment (shared by the batch CDC pair row and the streaming media
    * screen): polynomial window hash, cuts, chunks, 60-bit chunk hashes. */
  private def cdcChunksSql(from: String, idAs: String): String = {
    val winHash = graft.operators.Multimodal.gearPow(8).zipWithIndex
      .map { case (p, k) => s"bv[c-$k] * $p" }.mkString(" + ")
    s"""(WITH m AS (SELECT doc_id AS $idAs, upper(hex(encode(text))) AS hx FROM $from),
       | b AS (SELECT $idAs, hx, CAST(length(hx) / 2 AS BIGINT) AS n,
       |         list_transform(range(1, CAST(length(hx) / 2 AS BIGINT) + 1),
       |           j -> CAST(concat('0x', substr(hx, CAST((j-1)*2+1 AS BIGINT), 2)) AS BIGINT)) AS bv
       |       FROM m),
       | cz0 AS (SELECT $idAs, hx,
       |   list_concat(list_concat([CAST(0 AS BIGINT)],
       |     list_filter(range(8, n), c -> ($winHash) % 16 = 0)), [n]) AS cs
       |   FROM b),
       | cz AS (SELECT $idAs,
       |   unnest(list_transform(range(1, len(cs)),
       |     k -> substring(hx, cs[k]*2+1, CAST((cs[k+1]-cs[k])*2 AS BIGINT)))) AS c
       |   FROM cz0)
       | SELECT DISTINCT $idAs, ${H.hash60Sql("c")} AS ch FROM cz WHERE c <> '')""".stripMargin
  }

  /** Streaming media screen: every doc probed against the even-id library's
    * df-capped chunk index — mirrors [[graft.operators.Multimodal
    * .mediaDedupProbe]] over [[graft.Fixtures.streamMediaDedupTable]]. */
  private val esStreamMediaDedup = {
    val inc = cdcChunksSql("documents", "media_id")
    val lib = cdcChunksSql("(SELECT * FROM documents WHERE doc_id % 2 = 0)", "existing_id")
    s"""WITH incch AS (SELECT * FROM $inc i),
       |libch0 AS (SELECT * FROM $lib l),
       |heavy AS (SELECT ch FROM libch0 GROUP BY ch HAVING count(*) > 64),
       |libch AS (SELECT * FROM libch0 WHERE ch NOT IN (SELECT ch FROM heavy))
       |SELECT i.media_id AS incoming, l.existing_id AS existing,
       |       CAST(count(*) AS BIGINT) AS n_shared
       |FROM incch i JOIN libch l USING (ch)
       |WHERE i.media_id <> l.existing_id
       |GROUP BY 1, 2 HAVING count(*) >= 4""".stripMargin
  }

  /** Probe against the APPENDED library: the even-id build slice and the
    * `doc_id % 4 == 1` appended slice each carry their OWN df cap (the
    * documented per-slice incremental contract), then probe as usual. */
  private val multimodalProbeAppended = {
    val inc = cdcChunksSql("documents", "media_id")
    val lib = cdcChunksSql("(SELECT * FROM documents WHERE doc_id % 2 = 0)", "existing_id")
    val add = cdcChunksSql("(SELECT * FROM documents WHERE doc_id % 4 = 1)", "existing_id")
    s"""WITH incch AS (SELECT * FROM $inc i),
       |libb AS (SELECT * FROM $lib l),
       |heavyb AS (SELECT ch FROM libb GROUP BY ch HAVING count(*) > 64),
       |capb AS (SELECT * FROM libb WHERE ch NOT IN (SELECT ch FROM heavyb)),
       |adda AS (SELECT * FROM $add a),
       |heavya AS (SELECT ch FROM adda GROUP BY ch HAVING count(*) > 64),
       |capa AS (SELECT * FROM adda WHERE ch NOT IN (SELECT ch FROM heavya)),
       |libch AS (SELECT * FROM capb UNION ALL SELECT * FROM capa)
       |SELECT i.media_id AS incoming, l.existing_id AS existing,
       |       CAST(count(*) AS BIGINT) AS n_shared
       |FROM incch i JOIN libch l USING (ch)
       |WHERE i.media_id <> l.existing_id
       |GROUP BY 1, 2 HAVING count(*) >= 4""".stripMargin
  }

  /** Probe against the COMPACTED appended library: compaction re-applies
    * the df cap GLOBALLY over the union of the per-slice-capped chunk sets
    * ([[graft.operators.Multimodal.compactMediaLibraryIndex]]) — chunks a
    * single slice's cap let through but whose df across slices exceeds the
    * cap lose their postings, so this oracle is [[multimodalProbeAppended]]
    * with one extra global-heavy filter over the union. (The global cap
    * sees only postings that SURVIVED their slice's cap — a chunk dropped
    * within a slice never reaches compaction — which is exactly how the
    * engine's compaction reads the committed trees.) */
  private val multimodalProbeCompacted = {
    val inc = cdcChunksSql("documents", "media_id")
    val lib = cdcChunksSql("(SELECT * FROM documents WHERE doc_id % 2 = 0)", "existing_id")
    val add = cdcChunksSql("(SELECT * FROM documents WHERE doc_id % 4 = 1)", "existing_id")
    s"""WITH incch AS (SELECT * FROM $inc i),
       |libb AS (SELECT * FROM $lib l),
       |heavyb AS (SELECT ch FROM libb GROUP BY ch HAVING count(*) > 64),
       |capb AS (SELECT * FROM libb WHERE ch NOT IN (SELECT ch FROM heavyb)),
       |adda AS (SELECT * FROM $add a),
       |heavya AS (SELECT ch FROM adda GROUP BY ch HAVING count(*) > 64),
       |capa AS (SELECT * FROM adda WHERE ch NOT IN (SELECT ch FROM heavya)),
       |libu AS (SELECT * FROM capb UNION ALL SELECT * FROM capa),
       |heavyg AS (SELECT ch FROM libu GROUP BY ch HAVING count(*) > 64),
       |libch AS (SELECT * FROM libu WHERE ch NOT IN (SELECT ch FROM heavyg))
       |SELECT i.media_id AS incoming, l.existing_id AS existing,
       |       CAST(count(*) AS BIGINT) AS n_shared
       |FROM incch i JOIN libch l USING (ch)
       |WHERE i.media_id <> l.existing_id
       |GROUP BY 1, 2 HAVING count(*) >= 4""".stripMargin
  }

  private val multimodalDedupCdc = {
    val winHash = graft.operators.Multimodal.gearPow(8).zipWithIndex
      .map { case (p, k) => s"bv[c-$k] * $p" }.mkString(" + ")
    s"""WITH base AS (SELECT doc_id AS media_id, text FROM documents),
       |ins AS (SELECT media_id + 1000000 AS media_id, 'X' || text AS text
       |        FROM base WHERE media_id % 7 = 0),
       |m AS (SELECT media_id, upper(hex(encode(text))) AS hx
       |      FROM (SELECT * FROM base UNION ALL SELECT * FROM ins)),
       |b AS (SELECT media_id, hx, CAST(length(hx) / 2 AS BIGINT) AS n,
       |        list_transform(range(1, CAST(length(hx) / 2 AS BIGINT) + 1),
       |          j -> CAST(concat('0x', substr(hx, CAST((j-1)*2+1 AS BIGINT), 2)) AS BIGINT)) AS bv
       |      FROM m),
       |cz0 AS (SELECT media_id, hx,
       |  list_concat(list_concat([CAST(0 AS BIGINT)],
       |    list_filter(range(8, n), c -> ($winHash) % 16 = 0)), [n]) AS cs
       |  FROM b),
       |cz AS (SELECT media_id,
       |  unnest(list_transform(range(1, len(cs)),
       |    k -> substring(hx, cs[k]*2+1, CAST((cs[k+1]-cs[k])*2 AS BIGINT)))) AS c
       |  FROM cz0),
       |chd AS (SELECT DISTINCT media_id, ${H.hash60Sql("c")} AS ch FROM cz WHERE c <> ''),
       |heavy AS (SELECT ch FROM chd GROUP BY ch HAVING count(*) > 64),
       |ch AS (SELECT media_id, ch FROM chd WHERE ch NOT IN (SELECT ch FROM heavy))
       |SELECT a.media_id AS i, b.media_id AS j, CAST(count(*) AS BIGINT) AS n_shared
       |FROM ch a JOIN ch b USING (ch) WHERE a.media_id < b.media_id
       |GROUP BY 1, 2 HAVING count(*) >= 4""".stripMargin
  }

  /** Time-series similarity: dense 24-bucket daily profiles (cross join ×
    * left join × ordered list — integer counts, so vectors are
    * bit-identical), then the [[simExact]] cosine/rank recipe over them. */
  private val tsSimilarity =
    s"""WITH e AS (SELECT user_id, (epoch_ms(ts) // 3600000) % 24 AS b FROM events),
       |cnt AS (SELECT user_id, b, CAST(count(*) AS BIGINT) AS n FROM e GROUP BY 1, 2),
       |u AS (SELECT DISTINCT user_id FROM e),
       |grid AS (SELECT u.user_id, h.h FROM u CROSS JOIN (SELECT unnest(range(0, 24)) AS h) h),
       |dense AS (SELECT g.user_id, g.h, CAST(coalesce(c.n, 0) AS DOUBLE) AS n
       |          FROM grid g LEFT JOIN cnt c ON c.user_id = g.user_id AND c.b = g.h),
       |prof AS (SELECT user_id, list(n ORDER BY h) AS v FROM dense GROUP BY user_id),
       |q AS (SELECT user_id AS qid, v AS qvec FROM prof WHERE user_id < 10),
       |c AS (SELECT user_id AS nid, v AS nvec FROM prof),
       |s AS (SELECT qid, nid, ${cosineSql("qvec", "nvec")} AS score FROM q, c WHERE nid <> qid),
       |r AS (SELECT qid, nid, score,
       |        row_number() OVER (PARTITION BY qid ORDER BY score DESC, nid ASC) AS rk FROM s)
       |SELECT qid, nid, CAST(rk AS BIGINT) AS rank, score FROM r WHERE rk <= 5""".stripMargin

  // ---- relational ----

  private val lineitemAgg =
    """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
      |  CAST(count(*) AS BIGINT) AS n, avg(l_quantity) AS avg_qty,
      |  epoch_ms(min(l_shipdate)) AS min_ship_ms, epoch_ms(max(l_shipdate)) AS max_ship_ms
      |FROM lineitem GROUP BY 1, 2""".stripMargin

  private val joinAgg =
    """SELECT c_mktsegment, o_orderpriority, CAST(count(*) AS BIGINT) AS n_lines,
      |  min(o_orderkey) AS min_order, max(l_partkey) AS max_part, sum(l_quantity) AS sum_qty
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |GROUP BY 1, 2""".stripMargin

  private val topkOrders =
    """WITH r AS (
      |  SELECT o_custkey, o_orderkey,
      |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
      |  FROM orders)
      |SELECT o_custkey, o_orderkey, CAST(rk AS BIGINT) AS rank FROM r WHERE rk <= 3""".stripMargin

  private val regionChain =
    """SELECT r_name, n_name, CAST(count(*) AS BIGINT) AS n_lines,
      |  sum(l_quantity) AS sum_qty, max(o_orderkey) AS max_order
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY 1, 2""".stripMargin

  private val rollupOrders =
    """SELECT o_orderpriority, o_orderstatus, CAST(count(*) AS BIGINT) AS n,
      |  min(o_orderkey) AS min_key
      |FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)""".stripMargin

  private val customersNoOrders =
    """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_inactive,
      |  min(c_custkey) AS min_cust
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |GROUP BY 1""".stripMargin

  val all: Map[String, String] = Map(
    "es_append_scan" -> esAppendScan,
    "es_fetch_range" -> esFetchRange,
    "es_fetch_hot" -> esFetchHot,
    "es_fetch_straddle" -> esFetchStraddle,
    "es_trim" -> esTrim,
    "es_retention" -> esRetention,
    "es_segments" -> esSegments,
    "es_describe" -> esDescribe,
    "es_offsets" -> esOffsets,
    "es_kv" -> esKv,
    "es_object_log" -> esObjectLog,
    "es_update_describe" -> esUpdateDescribe,
    "es_delete" -> esDelete,
    "es_idempotent" -> esIdempotent,
    "es_codec" -> esCodec,
    "es_ingest_object" -> esIngestObject,
    "es_ingest_pd" -> esIngestPd,
    "es_pd_backfill" -> esPdBackfill,
    "es_ingest_wal" -> esIngestWal,
    "es_export_object" -> esExportObject,
    "es_export_wal" -> esExportWal,
    "es_stream_export" -> esStreamExport,
    "es_catalog_batch" -> esCatalogBatch,
    "es_window_hourly" -> esWindowHourly,
    "es_agg_by_type" -> esAggByType,
    "es_compact" -> esCompact,
    "es_compact_zorder" -> esCompactZorder,
    "sample_token_budget" -> sampleTokenBudget,
    "es_stream_token_budget" -> sampleTokenBudget, // one-batch twin: same set

    "es_snapshot" -> esSnapshot,
    "es_scan_delta" -> esScanDelta,
    "es_fetch_time" -> esFetchTime,
    "es_offset_for_time" -> esOffsetForTime,
    "es_group_commit" -> esScanDelta, // catch-up read == the second append
    // rows+bytes capacity retention leaves exactly the newest half
    "es_retention_size" -> esScanDelta,
    "es_etl" -> esEtl,
    "es_group_lag" -> esGroupLag,
    "es_catalog_group_lag" -> esCatalogGroupLag,
    "es_catalog_fanout_intents" -> esCatalogFanOutIntents,
    "es_etl_fanin" -> esEtlFanIn,
    "es_etl_fanout" -> esEtlFanOut,
    // the manifest-exported external view must equal the full stream
    "es_symlink" -> "SELECT event_id AS base_offset, event_type FROM events",
    "es_clone" -> esSnapshot, // clone pinned at the first commit == that snapshot
    "es_catalog" -> esCatalog,
    "es_catalog_scan" -> esCatalogScan,
    "es_catalog_subscribe" -> esCatalogSubscribe,
    "es_stream_roundtrip" -> esStreamRoundtrip,
    "es_stream_window" -> esStreamWindow,
    "es_stream_dedup" -> esStreamDedup,
    "es_stream_kmv" -> esStreamKmv,
    "es_stream_cms" -> esStreamCms,
    "es_stream_hll" -> esStreamHll,
    "es_stream_bloom" -> esStreamBloom,
    "es_stream_quantile" -> esStreamQuantile,
    "es_stream_sample" -> esStreamSample,
    "es_stream_diverse" -> esStreamDiverse,
    "es_stream_enrich_dim" -> esStreamEnrichDim,
    "es_watch_meta" -> esWatchMeta,
    "es_watch_catalog" -> esWatchCatalog,
    "es_history" -> esWatchMeta, // batch twin: same fixture, same feed
    "es_sessions" -> esSessions,
    "es_stream_sessions" -> esStreamSessions,
    "es_stream_join" -> esStreamJoin,
    "dedup_exact" -> dedupExact,
    "dedup_jaccard" -> dedupJaccard,
    "dedup_minhash" -> dedupMinhash,
    "dedup_incremental" -> dedupIncremental,
    "dedup_incremental_persisted" -> dedupIncremental, // persisted roundtrip: identical
    "dedup_incremental_appended" -> dedupIncrementalAppended,
    "es_stream_dedup_append" -> esStreamDedupAppend,
    "dedup_simhash" -> dedupSimhash,
    "dedup_clusters" -> dedupClusters,
    "text_stats" -> textStats,
    "text_quality" -> textQuality,
    "text_langid" -> textLangId,
    "text_fingerprint" -> textFingerprint,
    "text_tokens" -> textTokens,
    "text_redact" -> textRedact,
    "text_normalize" -> textNormalize,
    "text_truncate" -> textTruncate,
    "text_chunk" -> textChunk,
    "text_repetition" -> textRepetition,
    "decontaminate" -> decontaminate,
    "decontaminate_bloom" -> decontaminateBloom,
    "decontaminate_fuzzy" -> decontaminateFuzzy,
    "decontaminate_fuzzy_persisted" -> decontaminateFuzzy, // artifact probe ≡ in-memory probe
    "es_stream_decontaminate_fuzzy" -> esStreamDecontaminateFuzzy,
    "es_stream_decontaminate" -> esStreamDecontaminate,
    // the streaming semantic screen's flagged pair set IS the batch probe's
    "es_stream_semantic" -> dedupSemanticProbe,
    "decontaminate_report" -> decontaminateReport,
    "dedup_lines" -> dedupLines,
    "dedup_spans" -> dedupSpans,
    "sample_hash" -> sampleHash,
    "sample_weighted" -> sampleWeighted,
    "sample_split" -> sampleSplit,
    "text_vocab" -> textVocab,
    "text_vocab_encode" -> textVocabEncode,
    "sample_mix" -> sampleMix,
    "sample_stratified" -> sampleStratified,
    "sample_topk_group" -> sampleTopkGroup,
    "shuffle_shards" -> shuffleShards,
    "text_tfidf" -> textTfidf,
    "text_filter" -> textFilter,
    "text_domains" -> textDomains,
    "layout_zorder" -> layoutZorder,
    "pipeline_export" -> pipelineExport,
    "text_lm" -> textLm,
    "text_lm_buckets" -> textLmBuckets,
    "es_stream_lm" -> esStreamLm,
    "es_stream_lm_buckets" -> esStreamLmBuckets,
    "text_pack" -> textPack,
    "sim_exact" -> simExact,
    "sim_project" -> simProject,
    "sim_project_topk" -> simProjectTopk,
    "sql_topk" -> sqlTopk,
    "sql_fetch" -> sqlFetch,
    "sim_quantize" -> simQuantize,
    "sim_lsh" -> simLsh,
    "sim_lsh_persisted" -> simLsh, // persisted-index roundtrip: identical result
    "sim_lsh_append" -> simLsh, // positional hyperplanes: incremental == one-pass
    "sim_lsh_compact" -> simLsh, // compaction changes layout, never results

    "dedup_embedding" -> dedupEmbedding,
    "dedup_cluster_best" -> dedupClusterBest,
    "dedup_semantic" -> dedupSemantic,
    "dedup_semantic_probe" -> dedupSemanticProbe,
    "sim_ivf" -> simIvf,
    "sim_ivf_persisted" -> simIvf, // persisted-index roundtrip: identical result
    "sim_ivf_append" -> simIvfAppend,
    "sim_ivf_time_travel" -> simIvfTimeTravel,
    "es_stream_ivf_append" -> simIvfAppend, // micro-batch appends: same cell rows
    "es_stream_lsh_append" -> simLsh, // positional hyperplanes: streamed == one-pass
    "sim_ivf_compact" -> simIvfAppend, // compaction changes layout, never results
    "sim_ivf_replay" -> simIvfAppend, // replayed batch id: guard skips the duplicate

    "pivot_orders" -> pivotOrders,
    "window_running" -> windowRunning,
    "stats_quantiles" -> statsQuantiles,
    "stats_histogram" -> statsHistogram,
    "stats_quantiles_approx" -> statsQuantilesApprox,
    "stats_quantiles_sample" -> statsQuantilesSample,
    "join_salted" -> joinSalted,
    "join_asof" -> joinAsof,
    "es_stream_asof" -> esStreamAsof,
    "join_range" -> joinRange,
    "join_overlap" -> joinOverlap,
    "sketch_kmv" -> sketchKmv,
    "sketch_cms" -> sketchCms,
    "sketch_bloom" -> sketchBloom,
    "sketch_hll" -> sketchHll,
    "sketch_kmv_overlap" -> sketchKmvOverlap,
    "text_datacard" -> textDatacard,
    "multimodal_decode" -> multimodalDecode,
    "multimodal_decode_wav" -> multimodalDecodeWav,
    "multimodal_decode_bmp" -> multimodalDecodeBmp,
    "multimodal_decode_png" -> multimodalDecodePng,
    "multimodal_decode_mp4" -> multimodalDecodeMp4,
    "multimodal_decode_flac" -> multimodalDecodeFlac,
    "multimodal_mp4_samples" -> multimodalMp4Samples,
    "multimodal_flac_frames" -> multimodalFlacFrames,
    "multimodal_mp4_keyframes" -> multimodalMp4Keyframes,
    "multimodal_mp4_slice" -> multimodalMp4Slice,
    "multimodal_flac_slice" -> multimodalFlacSlice,
    "multimodal_flac_seektable" -> multimodalFlacSeektable,
    "multimodal_flac_pcm" -> multimodalFlacPcm,
    // streaming twin: stateless per-micro-batch decode of the same
    // generated containers — the batch closed form IS the oracle
    "es_stream_media_decode" -> multimodalDecodeMp4,
    "es_stream_mp4_samples" -> multimodalMp4Samples,
    "multimodal_curate" -> multimodalCurate,
    "multimodal_frames" -> multimodalFrames,
    "multimodal_dedup" -> multimodalDedup,
    "multimodal_dedup_cdc" -> multimodalDedupCdc,
    // the persisted-index probe shares the stream row's SQL: same library
    // (even-id docs), same incoming set, and the bucket-partitioned parquet
    // roundtrip changes no result rows
    "multimodal_probe_persisted" -> esStreamMediaDedup,
    "multimodal_probe_appended" -> multimodalProbeAppended,
    "es_stream_media_append" -> esStreamMediaAppend,
    "multimodal_probe_compacted" -> multimodalProbeCompacted,
    "es_stream_media_dedup" -> esStreamMediaDedup,
    "ts_similarity" -> tsSimilarity,
    "lineitem_agg" -> lineitemAgg,
    "join_agg" -> joinAgg,
    "topk_orders" -> topkOrders,
    "region_chain" -> regionChain,
    "rollup_orders" -> rollupOrders,
    "customers_no_orders" -> customersNoOrders)
}
