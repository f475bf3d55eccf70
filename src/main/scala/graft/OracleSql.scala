package graft

/** DuckDB-equivalent SQL per oracle-checked query key — the other half
  * of the driver contract ([[SparkEntry.oracleSql]] re-exports this).
  * Table names map to `<sfDir>/<table>.parquet` on the driver side.
  * Kept as its own compilation unit so SparkEntry holds query
  * definitions only (round-12 verdict ask #7).
  */
private[graft] object OracleSql {

  import graft.ext.TextAnalysis
  import SparkEntry.{splitFractions, mixWeights, sqlHashUnit16}

  val map: Map[String, String] = Map(
    // PDF fixtures: page text / xref metadata are exact functions of
    // the id-derived layout (see pdfFixture)
    "q227_pdf_text" ->
      """SELECT d.doc_id, t.p AS page_idx,
        |  'doc ' || d.doc_id || ' page ' || t.p || ' line 0' || chr(10) ||
        |  'doc ' || d.doc_id || ' page ' || t.p || ' line 1' AS text
        |FROM documents d CROSS JOIN generate_series(0, 2) AS t(p)
        |WHERE d.doc_id < 100 AND t.p < 1 + d.doc_id % 3
        |ORDER BY doc_id, page_idx""".stripMargin,

    "q228_pdf_meta" ->
      """WITH f AS (
        |  SELECT doc_id, 1 + doc_id % 3 AS n, doc_id % 7 AS m
        |  FROM documents WHERE doc_id < 100)
        |SELECT doc_id,
        |  CASE WHEN m IN (2, 3) THEN '1.5' ELSE '1.4' END AS version,
        |  CASE WHEN m IN (2, 3) THEN 'stream' ELSE 'table' END
        |    AS xref_kind,
        |  CASE WHEN m = 3 THEN 2 * n + 5
        |       WHEN m = 2 THEN 2 * n + 4
        |       ELSE 2 * n + 3 END AS n_objects,
        |  n AS n_pages
        |FROM f ORDER BY doc_id""".stripMargin,

    "q229_pdf_corpus_pipeline" ->
      """WITH base AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id < 200),
        |planted AS (
        |  SELECT doc_id, text FROM base
        |  UNION ALL SELECT doc_id + 1000000 AS doc_id, text FROM base)
        |SELECT doc_id,
        |       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |FROM planted
        |WHERE doc_id IN (SELECT min(doc_id) FROM planted GROUP BY md5(text))
        |ORDER BY doc_id""".stripMargin,

    "q232_arrow_meta" ->
      """SELECT doc_id,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 2 END AS BIGINT)
        |    AS n_fields,
        |  CAST((3 + doc_id % 5 + 1) // 2 AS BIGINT) AS n_batches,
        |  CAST(0 AS BIGINT) AS n_dicts,
        |  CAST(3 + doc_id % 5 AS BIGINT) AS n_rows
        |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin,

    "q233_arrow_fields" ->
      """SELECT d.doc_id, t.i AS field_idx,
        |  CASE t.i WHEN 0 THEN 'id' WHEN 1 THEN 'txt' ELSE 'score'
        |  END AS name,
        |  CASE t.i WHEN 0 THEN 'int' WHEN 1 THEN 'utf8'
        |  ELSE 'floatingpoint' END AS type,
        |  t.i <> 0 AS nullable
        |FROM documents d CROSS JOIN generate_series(0, 2) AS t(i)
        |WHERE d.doc_id < 100 AND t.i < 2 + (1 - d.doc_id % 2)
        |ORDER BY doc_id, field_idx""".stripMargin,

    "q234_pdf_cid_text" ->
      """SELECT d.doc_id, t.p AS page_idx,
        |  'cid doc ' || d.doc_id || ' page ' || t.p || chr(10) ||
        |  'second line!' AS text
        |FROM documents d CROSS JOIN generate_series(0, 1) AS t(p)
        |WHERE d.doc_id < 100 AND t.p < 1 + d.doc_id % 2
        |ORDER BY doc_id, page_idx""".stripMargin,

    // compaction changes file layout, never the row set: probes are
    // bit-identical pre/post (pre_eq_post), fragmentation drops
    // (files_dropped), and the q103 probability-1 twin constant is
    // answered by the compacted index (found)
    "q237_minhash_index_compact" ->
      """SELECT doc_id, CAST(1 AS BOOLEAN) AS found,
        |       CAST(1 AS BOOLEAN) AS pre_eq_post,
        |       CAST(1 AS BOOLEAN) AS files_dropped
        |FROM documents WHERE doc_id < 400 ORDER BY doc_id""".stripMargin,

    // the q106 constants must survive a mid-stream compaction (batch 3
    // probes the compacted index), and the compaction must have fired
    "q238_streaming_neardup_compact" ->
      """SELECT doc_id, CAST(1 AS BOOLEAN) AS found,
        |       CAST(1 AS BOOLEAN) AS within_ok,
        |       CAST(2 AS BIGINT) AS n_twin_batches,
        |       CAST(1 AS BOOLEAN) AS compact_ran
        |FROM documents WHERE doc_id < 50 ORDER BY doc_id""".stripMargin,

    // every wire encoding, the detected charset, AND the confidence
    // flag predicted from id arithmetic; the Cyrillic planted string
    // is chr(0x430 + (id+k)%30) — а..ъ, no 0xFE/0xFF cp1251 bytes that
    // would collide with BOM sniffing — so the round-trip is exact
    "q239_charset_transcode" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    array_to_string(list_transform(range(0, 12),
        |      k -> chr(1072 + CAST((doc_id + k) % 30 AS INT))), '')
        |      || ' ' || CAST(doc_id AS VARCHAR) AS cyr
        |  FROM documents WHERE doc_id < 350)
        |SELECT doc_id,
        |  CASE CAST(doc_id % 7 AS INT)
        |    WHEN 0 THEN 'plain ascii document ' || CAST(doc_id AS VARCHAR)
        |    WHEN 6 THEN 'summary ' || CAST(doc_id AS VARCHAR) || ' caf'
        |      || chr(CAST(224 + doc_id % 16 AS INT))
        |    ELSE cyr END AS text,
        |  CASE CAST(doc_id % 7 AS INT)
        |    WHEN 0 THEN 'us-ascii' WHEN 1 THEN 'utf-8' WHEN 2 THEN 'utf-8'
        |    WHEN 3 THEN 'utf-16le' WHEN 4 THEN 'utf-16be'
        |    WHEN 5 THEN 'windows-1251' ELSE 'windows-1252' END AS charset,
        |  (doc_id % 7 <> 6) AS confident
        |FROM p ORDER BY doc_id""".stripMargin,

    // one page content, three wire encodings -> one clean text; the
    // 1251 arm is tag-diluted below the confidence margin
    "q240_charset_web_pipeline" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    array_to_string(list_transform(range(0, 12),
        |      k -> chr(1072 + CAST((doc_id + k) % 30 AS INT))), '')
        |      || ' ' || CAST(doc_id AS VARCHAR) AS cyr
        |  FROM documents WHERE doc_id < 300)
        |SELECT doc_id, cyr || ' ' || cyr || ' ' || cyr AS clean,
        |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'utf-8'
        |    WHEN 1 THEN 'windows-1251' ELSE 'utf-16le' END AS charset,
        |  (doc_id % 3 <> 1) AS confident
        |FROM p ORDER BY doc_id""".stripMargin,

    // every cell's sheet/ref/coords/kind/value from id arithmetic;
    // A is always a shared-table string, C always inline (the
    // builder's alternation), B a number
    "q241_xlsx_cells" ->
      """WITH d AS (SELECT doc_id FROM documents WHERE doc_id < 120),
        |r AS (SELECT d.doc_id, t.ri
        |      FROM d CROSS JOIN generate_series(0, 1) AS t(ri)
        |      WHERE t.ri < 1 + d.doc_id % 2),
        |cells AS (
        |  SELECT doc_id, 'data' AS sheet, 'A' || (ri + 1) AS ref,
        |    ri + 1 AS row, 1 AS col, 'shared' AS kind,
        |    'cell ' || doc_id || ' r' || ri || ' alpha' AS value FROM r
        |  UNION ALL
        |  SELECT doc_id, 'data', 'B' || (ri + 1), ri + 1, 2, 'num',
        |    CAST(doc_id * 3 + ri AS VARCHAR) FROM r
        |  UNION ALL
        |  SELECT doc_id, 'data', 'C' || (ri + 1), ri + 1, 3, 'inline',
        |    'v ' || doc_id || ' r' || ri || ' beta' FROM r
        |  UNION ALL
        |  SELECT doc_id, 'notes', 'A1', 1, 1, 'shared',
        |    'note ' || doc_id FROM d)
        |SELECT doc_id, sheet, ref, CAST(row AS BIGINT) AS row,
        |       CAST(col AS BIGINT) AS col, kind, value
        |FROM cells ORDER BY doc_id, sheet, ref""".stripMargin,

    // slide and paragraph indices and text from id arithmetic
    "q242_pptx_text" ->
      """SELECT d.doc_id, s.k AS slide_idx, p.j AS para_idx,
        |  CASE p.j WHEN 0
        |    THEN 'deck ' || d.doc_id || ' slide ' || s.k || ' title'
        |    ELSE 'point a&b ' || d.doc_id END AS text
        |FROM documents d
        |CROSS JOIN generate_series(0, 2) AS s(k)
        |CROSS JOIN generate_series(0, 1) AS p(j)
        |WHERE d.doc_id < 120 AND s.k < 1 + d.doc_id % 3
        |ORDER BY doc_id, slide_idx, para_idx""".stripMargin,

    // the q231 corpus algebra — the oracle never sees a container;
    // the engine must recover identical text from three formats for
    // the cross-format dedup to produce this row set
    "q243_office_corpus_pipeline" ->
      """WITH base AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id < 150),
        |planted AS (
        |  SELECT doc_id, text FROM base
        |  UNION ALL SELECT doc_id + 1000000 AS doc_id, text FROM base)
        |SELECT doc_id,
        |       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |FROM planted
        |WHERE doc_id IN (SELECT min(doc_id) FROM planted GROUP BY md5(text))
        |ORDER BY doc_id""".stripMargin,

    // the q240 constants through the WARC layer too: container,
    // gunzip, charset, and tag stripping all replayed arithmetically
    "q244_warc_charset_pipeline" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    array_to_string(list_transform(range(0, 12),
        |      k -> chr(1072 + CAST((doc_id + k) % 30 AS INT))), '')
        |      || ' ' || CAST(doc_id AS VARCHAR) AS cyr
        |  FROM documents WHERE doc_id < 150)
        |SELECT doc_id, cyr || ' ' || cyr || ' ' || cyr AS clean,
        |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'utf-8'
        |    WHEN 1 THEN 'windows-1251' ELSE 'utf-16le' END AS charset,
        |  (doc_id % 3 <> 1) AS confident
        |FROM p ORDER BY doc_id""".stripMargin,

    // hiragana text, detected charset, and confidence from id
    // arithmetic (chr(12354 + (id+k)%20) = U+3042..U+3055)
    "q245_charset_shiftjis" ->
      """SELECT doc_id,
        |  array_to_string(list_transform(range(0, 12),
        |    k -> chr(12354 + CAST((doc_id + k) % 20 AS INT))), '')
        |    || ' ' || CAST(doc_id AS VARCHAR) AS text,
        |  'shift_jis' AS charset, CAST(1 AS BOOLEAN) AS confident
        |FROM documents WHERE doc_id < 120 ORDER BY doc_id""".stripMargin,

    // locked vs corrupt separable: error strings predicted from the id
    "q236_pdf_error_triage" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 1 THEN 'encrypted'
        |       ELSE 'bad magic' END AS error
        |FROM documents WHERE doc_id < 100 AND doc_id % 3 <> 0
        |ORDER BY doc_id""".stripMargin,

    "q235_docx_meta" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 0
        |       THEN 'Title & <' || doc_id || '>' END AS title,
        |  CASE WHEN doc_id % 2 = 0
        |       THEN 'author' || doc_id END AS creator,
        |  CASE WHEN doc_id % 2 = 0
        |       THEN '2024-01-' || lpad(CAST(1 + doc_id % 28 AS VARCHAR),
        |                               2, '0') || 'T00:00:00Z'
        |  END AS created,
        |  CASE WHEN doc_id % 2 = 0
        |       THEN '2024-01-' || lpad(CAST(1 + doc_id % 28 AS VARCHAR),
        |                               2, '0') || 'T00:00:00Z'
        |  END AS modified
        |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin,

    "q230_docx_text" ->
      """SELECT d.doc_id, t.p AS para_idx,
        |  'doc ' || d.doc_id || ' para ' || t.p || ' a&b' || chr(9) ||
        |  'x<y end' AS text
        |FROM documents d CROSS JOIN generate_series(0, 2) AS t(p)
        |WHERE d.doc_id < 100 AND t.p < 1 + d.doc_id % 3
        |ORDER BY doc_id, para_idx""".stripMargin,

    "q231_docx_corpus_pipeline" ->
      """WITH base AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id < 200),
        |planted AS (
        |  SELECT doc_id, text FROM base
        |  UNION ALL SELECT doc_id + 1000000 AS doc_id, text FROM base)
        |SELECT doc_id,
        |       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |FROM planted
        |WHERE doc_id IN (SELECT min(doc_id) FROM planted GROUP BY md5(text))
        |ORDER BY doc_id""".stripMargin,

    // per-(doc, rowgroup, column) statistics formulas
    "q226_parquet_stats" ->
      """WITH d AS (
        |  SELECT doc_id FROM documents
        |  WHERE doc_id < 150 AND doc_id % 41 != 0 AND doc_id % 37 != 0),
        |g AS (
        |  SELECT doc_id, k AS g FROM d, range(0, 3) t(k)
        |  WHERE k < 1 + doc_id % 3),
        |c AS (
        |  SELECT doc_id, g, k AS c FROM g, range(0, 3) u(k)
        |  WHERE k < 2 + doc_id % 2)
        |SELECT doc_id, CAST(g AS INTEGER) AS rg_idx,
        |  printf('c%d', CAST(c AS INTEGER)) AS "column",
        |  CAST(10 + (doc_id*3 + g*7) % 90 AS BIGINT) AS num_values,
        |  CAST((doc_id + g + c) % 5 AS BIGINT) AS null_count,
        |  CAST(doc_id*10 + g*100 + c AS BIGINT) AS min_v,
        |  CAST(doc_id*10 + g*100 + c + 500 + (doc_id + g) % 50 AS BIGINT)
        |    AS max_v
        |FROM c ORDER BY doc_id, rg_idx, "column"""".stripMargin,

    // eleven new families keyed by id%11
    "q225_format_sniff_extended" ->
      """SELECT doc_id,
        |  CASE CAST(doc_id % 12 AS INTEGER)
        |    WHEN 0 THEN 'lz4' WHEN 1 THEN 'parquet' WHEN 2 THEN 'orc'
        |    WHEN 3 THEN 'npy' WHEN 4 THEN 'safetensors' WHEN 5 THEN 'flv'
        |    WHEN 6 THEN 'au' WHEN 7 THEN 'tiff' WHEN 8 THEN '7z'
        |    WHEN 9 THEN 'xz' WHEN 10 THEN 'bzip2' ELSE 'arrow'
        |  END AS format
        |FROM documents WHERE doc_id < 150 ORDER BY doc_id""".stripMargin,

    // the census is exact: eos bit position = 32 header bits + every
    // planted (gap + 48-bit magic)
    "q224_bzip2_blocks" ->
      """WITH d AS (
        |  SELECT doc_id FROM documents
        |  WHERE doc_id < 150 AND doc_id % 41 != 0 AND doc_id % 37 != 0),
        |g AS (
        |  SELECT doc_id, SUM(7 + (doc_id*5 + j*13) % 40 + 48) AS span,
        |    COUNT(*) AS k
        |  FROM d, range(0, 3) t(j) WHERE j < 1 + doc_id % 3
        |  GROUP BY doc_id)
        |SELECT doc_id, CAST(1 + doc_id % 9 AS INTEGER) AS level,
        |  CAST(k AS BIGINT) AS n_blocks,
        |  CAST(32 + span AS BIGINT) AS eos_at_bit
        |FROM g ORDER BY doc_id""".stripMargin,

    // per-block size formulas summed; check type by id%3
    "q223_xz_streams" ->
      """WITH d AS (
        |  SELECT doc_id FROM documents
        |  WHERE doc_id < 150 AND doc_id % 41 != 0 AND doc_id % 37 != 0),
        |g AS (
        |  SELECT doc_id, 50 + (doc_id*7 + k*11) % 200 AS up
        |  FROM d, range(0, 3) t(k) WHERE k < 1 + doc_id % 3)
        |SELECT doc_id,
        |  CAST(CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 0
        |       WHEN 1 THEN 1 ELSE 4 END AS INTEGER) AS check_type,
        |  CAST(COUNT(*) AS BIGINT) AS n_blocks,
        |  CAST(SUM(up) AS BIGINT) AS unpadded_sum,
        |  CAST(SUM(up * 3 + doc_id % 17) AS BIGINT) AS uncompressed_sum
        |FROM g GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // locator fields by formula; sums over the fill byte
    "q222_sevenzip_header" ->
      """WITH d AS (
        |  SELECT doc_id FROM documents
        |  WHERE doc_id < 150 AND doc_id % 41 != 0 AND doc_id % 37 != 0)
        |SELECT doc_id, CAST(0 AS INTEGER) AS ver_major,
        |  CAST(4 AS INTEGER) AS ver_minor,
        |  CAST(30 + doc_id % 200 AS BIGINT) AS next_header_offset,
        |  CAST(20 + (doc_id*7) % 100 AS BIGINT) AS next_header_size,
        |  CAST((20 + (doc_id*7) % 100) * ((doc_id*3) % 251) AS BIGINT)
        |    AS next_header_sum
        |FROM d ORDER BY doc_id""".stripMargin,

    // in-class pairs regardless of carrier (png/bmp/tiff by id%3)
    "q220_tiff_image_dedup" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id % 8 AS acls FROM documents
        |  WHERE doc_id < 120 AND doc_id % 41 != 0)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       CAST(30 + (a.acls % 4) * 6 AS BIGINT) AS w
        |FROM d a, d b
        |WHERE a.doc_id < b.doc_id AND a.acls = b.acls
        |ORDER BY id_a, id_b""".stripMargin,

    // in-class pairs regardless of container (wav/aiff/au by id%3)
    "q221_audio_container_dedup" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id % 6 AS acls FROM documents
        |  WHERE doc_id < 120 AND doc_id % 41 != 0)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       CAST(150 + a.acls * 50 AS BIGINT) AS nf
        |FROM d a, d b
        |WHERE a.doc_id < b.doc_id AND a.acls = b.acls
        |ORDER BY id_a, id_b""".stripMargin,

    // even ids: the q99 PCM16 sum formula; odd ids: the q215 mu-law
    // expansion — one container, both encodings
    "q219_audio_au" ->
      """WITH d AS (
        |  SELECT doc_id, 200 + (doc_id*3) % 300 AS n FROM documents
        |  WHERE doc_id < 150 AND doc_id % 41 != 0),
        |s AS (
        |  SELECT doc_id, n, k,
        |    (doc_id*7 + k*13) % 256 AS b,
        |    ((doc_id * 2654435761 + k * 40503) % 65536) - 32768 AS pcm
        |  FROM d, range(0, 500) t(k) WHERE k < n),
        |v AS (
        |  SELECT doc_id, n,
        |    CASE WHEN doc_id % 2 = 0 THEN pcm
        |    ELSE
        |      CASE WHEN (255 - b) >= 128
        |        THEN 132 - ((((255 - b) & 15) * 8 + 132)
        |                    * (1 << (((255 - b) & 112) // 16)))
        |        ELSE ((((255 - b) & 15) * 8 + 132)
        |              * (1 << (((255 - b) & 112) // 16))) - 132 END
        |    END AS dec
        |  FROM s)
        |SELECT doc_id, CAST(MAX(n) AS BIGINT) AS n_frames,
        |  CAST(SUM(dec) AS BIGINT) AS sample_sum
        |FROM v GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // the q106-family constant: every base vector's twin found, the
    // same-batch pair surfaced, twins confined to exactly 2 batches
    "q218_streaming_vecdup" ->
      """SELECT vec_id, true AS found, true AS within_ok,
        |       CAST(2 AS BIGINT) AS n_twin_batches
        |FROM embeddings WHERE vec_id < 30 ORDER BY vec_id""".stripMargin,

    // the q99 sample formulas, container-independent
    "q217_audio_aiff" ->
      """WITH d AS (SELECT doc_id,
        |                  CAST(300 + (doc_id % 5) * 100 AS BIGINT) AS n
        |           FROM documents
        |           WHERE doc_id < 150 AND doc_id % 41 != 0)
        |SELECT d.doc_id, d.n AS n_frames,
        |       CAST(sum(((d.doc_id * 2654435761 + t.i * 40503)
        |                 % 65536) - 32768) AS BIGINT) AS sample_sum,
        |       CAST(max(abs(((d.doc_id * 2654435761 + t.i * 40503)
        |                 % 65536) - 32768)) AS INT) AS peak
        |FROM d CROSS JOIN generate_series(0, 699) AS t(i)
        |WHERE t.i < d.n
        |GROUP BY d.doc_id, d.n
        |ORDER BY d.doc_id""".stripMargin,

    // the q212/q213 inventory shape under BSON coding, plus the
    // key-name byte mass (top keys 15B + ts/opt; array keys 1B each)
    "q216_bson_fields" ->
      """WITH d AS (
        |  SELECT doc_id, 2 + doc_id % 3 AS nr FROM documents
        |  WHERE doc_id < 150 AND doc_id % 41 != 0 AND doc_id % 37 != 0),
        |r AS (
        |  SELECT doc_id, nr, k AS r,
        |    doc_id % 2 = 0 AS ts,
        |    (doc_id + k) % 3 = 0 AS opt,
        |    1 + (doc_id + k) % 4 AS m,
        |    5 + (doc_id + k*3) % 20 AS sl
        |  FROM d, range(0, 4) t(k) WHERE k < nr),
        |tags AS (
        |  SELECT doc_id, SUM((doc_id + t*7) % 50) AS tag_sum,
        |    COUNT(*) AS tag_n
        |  FROM r, range(0, 4) u(t) WHERE t < m GROUP BY doc_id),
        |base AS (
        |  SELECT doc_id, COUNT(*) AS nr,
        |    SUM(5 + CASE WHEN ts THEN 1 ELSE 0 END
        |          + CASE WHEN opt THEN 1 ELSE 0 END) AS elem_sum,
        |    SUM(5 + CASE WHEN ts THEN 1 ELSE 0 END
        |          + CASE WHEN opt THEN 1 ELSE 0 END + m) AS key_n,
        |    SUM(15 + CASE WHEN ts THEN 2 ELSE 0 END
        |          + CASE WHEN opt THEN 3 ELSE 0 END + m) AS key_sum,
        |    SUM(doc_id * 100 + r) AS id_sum,
        |    SUM(doc_id * 1000000 + r) AS big_sum,
        |    SUM(sl) AS sl_sum,
        |    SUM(m) AS m_sum,
        |    SUM(CASE WHEN (doc_id + r) % 2 = 0 THEN 1 ELSE 0 END)
        |      AS true_n,
        |    SUM(CASE WHEN ts THEN doc_id * 10 + r ELSE 0 END) AS ts_sum,
        |    SUM(CASE WHEN opt THEN 1 ELSE 0 END) AS null_n,
        |    MAX(CASE WHEN ts THEN 1 ELSE 0 END) AS has_ts
        |  FROM r GROUP BY doc_id),
        |fam AS (
        |  SELECT b.doc_id, 'doc' AS family, b.nr AS n,
        |    b.elem_sum AS val_sum FROM base b
        |  UNION ALL
        |  SELECT b.doc_id, 'array', b.nr, b.m_sum FROM base b
        |  UNION ALL
        |  SELECT b.doc_id, 'int', 2 * b.nr + g.tag_n,
        |    b.id_sum + b.big_sum + g.tag_sum
        |  FROM base b JOIN tags g ON b.doc_id = g.doc_id
        |  UNION ALL
        |  SELECT b.doc_id, 'string', b.nr, b.sl_sum FROM base b
        |  UNION ALL
        |  SELECT b.doc_id, 'bool', b.nr, b.true_n FROM base b
        |  UNION ALL
        |  SELECT b.doc_id, 'key', b.key_n, b.key_sum FROM base b
        |  UNION ALL
        |  SELECT b.doc_id, 'datetime', b.nr, b.ts_sum FROM base b
        |  WHERE b.has_ts = 1
        |  UNION ALL
        |  SELECT b.doc_id, 'null', b.null_n, 0 FROM base b
        |  WHERE b.null_n > 0)
        |SELECT doc_id, family, CAST(n AS BIGINT) AS n,
        |  CAST(val_sum AS BIGINT) AS val_sum
        |FROM fam ORDER BY doc_id, family""".stripMargin,

    // the G.711 expansions as integer SQL: mu-law complements the
    // byte, A-law xors with 0x55; both expand segment/mantissa
    "q215_audio_g711" ->
      """WITH d AS (
        |  SELECT doc_id, 200 + (doc_id*3) % 300 AS n FROM documents
        |  WHERE doc_id < 150 AND doc_id % 41 != 0),
        |s AS (
        |  SELECT doc_id, n, (doc_id*7 + k*13) % 256 AS b
        |  FROM d, range(0, 500) t(k) WHERE k < n),
        |v AS (
        |  SELECT doc_id, n,
        |    CASE WHEN doc_id % 2 = 0 THEN
        |      CASE WHEN (255 - b) >= 128
        |        THEN 132 - ((((255 - b) & 15) * 8 + 132)
        |                    * (1 << (((255 - b) & 112) // 16)))
        |        ELSE ((((255 - b) & 15) * 8 + 132)
        |              * (1 << (((255 - b) & 112) // 16))) - 132 END
        |    ELSE
        |      CASE WHEN xor(b, 85) >= 128 THEN 1 ELSE -1 END *
        |      CASE WHEN ((xor(b, 85) & 112) // 16) = 0
        |             THEN ((xor(b, 85) & 15) * 16) + 8
        |           WHEN ((xor(b, 85) & 112) // 16) = 1
        |             THEN ((xor(b, 85) & 15) * 16) + 264
        |           ELSE (((xor(b, 85) & 15) * 16) + 264)
        |                * (1 << (((xor(b, 85) & 112) // 16) - 1)) END
        |    END AS dec
        |  FROM s)
        |SELECT doc_id, CAST(MAX(n) AS BIGINT) AS n_frames,
        |  CAST(SUM(dec) AS BIGINT) AS sample_sum
        |FROM v GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // per-shard family sums across the CRC-framed record payloads;
    // keys id(2)+text(4)+flag(4)=10 bytes of str per record
    "q214_tfrecord_msgpack" ->
      """WITH d AS (
        |  SELECT doc_id, 2 + doc_id % 3 AS nr FROM documents
        |  WHERE doc_id < 150 AND doc_id % 41 != 0 AND doc_id % 37 != 0),
        |r AS (
        |  SELECT doc_id, nr, k AS r, 5 + (doc_id + k*3) % 20 AS tl
        |  FROM d, range(0, 4) t(k) WHERE k < nr),
        |base AS (
        |  SELECT doc_id, COUNT(*) AS nr,
        |    SUM(doc_id * 100 + r) AS id_sum,
        |    SUM(10 + tl) AS str_sum,
        |    SUM(CASE WHEN (doc_id + r) % 2 = 0 THEN 1 ELSE 0 END)
        |      AS true_n
        |  FROM r GROUP BY doc_id),
        |fam AS (
        |  SELECT doc_id, 'bool' AS family, nr AS n, true_n AS val_sum
        |  FROM base
        |  UNION ALL
        |  SELECT doc_id, 'int', nr, id_sum FROM base
        |  UNION ALL
        |  SELECT doc_id, 'map', nr, 3 * nr FROM base
        |  UNION ALL
        |  SELECT doc_id, 'str', 4 * nr, str_sum FROM base)
        |SELECT doc_id, family, CAST(n AS BIGINT) AS n,
        |  CAST(val_sum AS BIGINT) AS val_sum
        |FROM fam ORDER BY doc_id, family""".stripMargin,

    // the q212 inventory shape under CBOR coding; indefinite text
    // reassembles to the same length, so the oracle is carriage-free
    "q213_cbor_fields" ->
      """WITH d AS (
        |  SELECT doc_id, 2 + doc_id % 3 AS nr FROM documents
        |  WHERE doc_id < 150 AND doc_id % 41 != 0 AND doc_id % 37 != 0),
        |r AS (
        |  SELECT doc_id, nr, k AS r,
        |    doc_id % 4 = 0 AS ts,
        |    (doc_id + k) % 3 = 0 AS opt,
        |    1 + (doc_id + k) % 4 AS m,
        |    10 + (doc_id*3 + k) % 40 AS tl
        |  FROM d, range(0, 4) t(k) WHERE k < nr),
        |tags AS (
        |  SELECT doc_id, SUM((doc_id + t*11) % 100) AS tag_sum,
        |    COUNT(*) AS tag_n
        |  FROM r, range(0, 4) u(t) WHERE t < m GROUP BY doc_id),
        |base AS (
        |  SELECT doc_id,
        |    COUNT(*) AS nr,
        |    SUM(5 + CASE WHEN ts THEN 1 ELSE 0 END
        |          + CASE WHEN opt THEN 1 ELSE 0 END) AS pair_sum,
        |    SUM(5 + CASE WHEN ts THEN 1 ELSE 0 END
        |          + CASE WHEN opt THEN 1 ELSE 0 END + 1) AS text_n,
        |    SUM(17 + CASE WHEN ts THEN 2 ELSE 0 END
        |          + CASE WHEN opt THEN 3 ELSE 0 END + tl) AS text_sum,
        |    SUM(doc_id * 1000 + r) AS id_sum,
        |    SUM(-(1 + (doc_id + r*7) % 200)) AS neg_sum,
        |    SUM(CASE WHEN ts THEN 1600000000 + doc_id + r ELSE 0 END)
        |      AS ts_sum,
        |    SUM(m) AS m_sum,
        |    SUM(CASE WHEN (doc_id + r) % 2 = 0 THEN 1 ELSE 0 END)
        |      AS true_n,
        |    SUM(CASE WHEN opt THEN 1 ELSE 0 END) AS null_n,
        |    MAX(CASE WHEN ts THEN 1 ELSE 0 END) AS has_ts
        |  FROM r GROUP BY doc_id),
        |fam AS (
        |  SELECT b.doc_id, 'map' AS family, b.nr AS n,
        |    b.pair_sum AS val_sum FROM base b
        |  UNION ALL
        |  SELECT b.doc_id, 'text', b.text_n, b.text_sum FROM base b
        |  UNION ALL
        |  SELECT b.doc_id, 'int',
        |    (2 + b.has_ts) * b.nr + g.tag_n,
        |    b.id_sum + b.neg_sum + b.ts_sum + g.tag_sum
        |  FROM base b JOIN tags g ON b.doc_id = g.doc_id
        |  UNION ALL
        |  SELECT b.doc_id, 'array', b.nr, b.m_sum FROM base b
        |  UNION ALL
        |  SELECT b.doc_id, 'bool', b.nr, b.true_n FROM base b
        |  UNION ALL
        |  SELECT b.doc_id, 'tag', b.nr, b.nr FROM base b
        |  WHERE b.has_ts = 1
        |  UNION ALL
        |  SELECT b.doc_id, 'null', b.null_n, 0 FROM base b
        |  WHERE b.null_n > 0)
        |SELECT doc_id, family, CAST(n AS BIGINT) AS n,
        |  CAST(val_sum AS BIGINT) AS val_sum
        |FROM fam ORDER BY doc_id, family""".stripMargin,

    // per-family counts and value masses, summed over the (doc,
    // record) grid; families with zero occurrences emit no row
    "q212_msgpack_fields" ->
      """WITH d AS (
        |  SELECT doc_id, 2 + doc_id % 3 AS nr FROM documents
        |  WHERE doc_id < 150 AND doc_id % 41 != 0 AND doc_id % 37 != 0),
        |r AS (
        |  SELECT doc_id, nr, k AS r,
        |    doc_id % 2 = 0 AS score,
        |    (doc_id + k) % 3 = 0 AS opt,
        |    1 + (doc_id + k) % 4 AS m,
        |    10 + (doc_id*3 + k) % 40 AS tl
        |  FROM d, range(0, 4) t(k) WHERE k < nr),
        |tags AS (
        |  SELECT doc_id, SUM((doc_id + t*11) % 100) AS tag_sum,
        |    COUNT(*) AS tag_n
        |  FROM r, range(0, 4) u(t) WHERE t < m GROUP BY doc_id),
        |base AS (
        |  SELECT doc_id,
        |    COUNT(*) AS nr,
        |    SUM(5 + CASE WHEN score THEN 1 ELSE 0 END
        |          + CASE WHEN opt THEN 1 ELSE 0 END) AS pair_sum,
        |    SUM(5 + CASE WHEN score THEN 1 ELSE 0 END
        |          + CASE WHEN opt THEN 1 ELSE 0 END + 1) AS str_n,
        |    SUM(17 + CASE WHEN score THEN 5 ELSE 0 END
        |          + CASE WHEN opt THEN 3 ELSE 0 END + tl) AS str_sum,
        |    SUM(doc_id * 1000 + r) AS id_sum,
        |    SUM(-(1 + (doc_id + r*7) % 200)) AS neg_sum,
        |    SUM(m) AS m_sum,
        |    SUM(CASE WHEN (doc_id + r) % 2 = 0 THEN 1 ELSE 0 END)
        |      AS true_n,
        |    SUM(CASE WHEN opt THEN 1 ELSE 0 END) AS nil_n,
        |    MAX(CASE WHEN score THEN 1 ELSE 0 END) AS has_score
        |  FROM r GROUP BY doc_id),
        |fam AS (
        |  SELECT b.doc_id, 'map' AS family, b.nr AS n,
        |    b.pair_sum AS val_sum FROM base b
        |  UNION ALL
        |  SELECT b.doc_id, 'str', b.str_n, b.str_sum FROM base b
        |  UNION ALL
        |  SELECT b.doc_id, 'int', 2 * b.nr + g.tag_n,
        |    b.id_sum + b.neg_sum + g.tag_sum
        |  FROM base b JOIN tags g ON b.doc_id = g.doc_id
        |  UNION ALL
        |  SELECT b.doc_id, 'array', b.nr, b.m_sum FROM base b
        |  UNION ALL
        |  SELECT b.doc_id, 'bool', b.nr, b.true_n FROM base b
        |  UNION ALL
        |  SELECT b.doc_id, 'float', b.nr, 0 FROM base b
        |  WHERE b.has_score = 1
        |  UNION ALL
        |  SELECT b.doc_id, 'nil', b.nil_n, 0 FROM base b
        |  WHERE b.nil_n > 0)
        |SELECT doc_id, family, CAST(n AS BIGINT) AS n,
        |  CAST(val_sum AS BIGINT) AS val_sum
        |FROM fam ORDER BY doc_id, family""".stripMargin,

    // the q177 entry formulas, identical under both codings
    "q211_zip64_members" ->
      """WITH d AS (
        |  SELECT doc_id FROM documents
        |  WHERE doc_id < 150 AND doc_id % 41 != 0 AND doc_id % 37 != 0),
        |e AS (
        |  SELECT doc_id, unnest(range(0, 2 + doc_id % 3)) AS k FROM d)
        |SELECT doc_id, CAST(k AS INTEGER) AS entry_idx,
        |  printf('e%04d_%02d.dat', CAST(doc_id AS INTEGER),
        |    CAST(k AS INTEGER)) AS name,
        |  CAST(CASE WHEN (doc_id + k) % 2 = 0 THEN 0 ELSE 8 END
        |    AS INTEGER) AS method,
        |  CAST(20 + (doc_id*11 + k*7) % 300 AS BIGINT) AS usize,
        |  CAST((20 + (doc_id*11 + k*7) % 300) * ((doc_id + k*13) % 251)
        |    AS BIGINT) AS payload_sum
        |FROM e ORDER BY doc_id, entry_idx""".stripMargin,

    // in-class docs share both keyframes regardless of container
    "q210_legacy_video_dedup" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id % 8 AS acls FROM documents
        |  WHERE doc_id < 120 AND doc_id % 41 != 0)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       CAST(2 AS BIGINT) AS nf
        |FROM d a, d b
        |WHERE a.doc_id < b.doc_id AND a.acls = b.acls
        |ORDER BY id_a, id_b""".stripMargin,

    // tag order is script, videos, audios (even ids only); the odd-id
    // video timestamps start past 2^24 so the extended byte matters
    "q209_flv_tags" ->
      """WITH d AS (
        |  SELECT doc_id FROM documents
        |  WHERE doc_id < 150 AND doc_id % 41 != 0 AND doc_id % 37 != 0),
        |sc AS (
        |  SELECT doc_id, 0 AS tag_idx, 18 AS tag_type,
        |    CAST(20 + doc_id % 30 AS BIGINT) AS data_size,
        |    CAST(0 AS BIGINT) AS timestamp_ms,
        |    CAST((20 + doc_id % 30) * ((doc_id*3) % 251) AS BIGINT)
        |      AS payload_sum
        |  FROM d),
        |v AS (
        |  SELECT doc_id, CAST(1 + k AS INTEGER) AS tag_idx, 9 AS tag_type,
        |    CAST(40 + (doc_id*7 + k*13) % 200 AS BIGINT) AS data_size,
        |    CAST(20000000 * (doc_id % 2) + k * 40 AS BIGINT)
        |      AS timestamp_ms,
        |    CAST((40 + (doc_id*7 + k*13) % 200) * ((doc_id + k) % 251)
        |      AS BIGINT) AS payload_sum
        |  FROM d, range(0, 5) t(k) WHERE k < 2 + doc_id % 3),
        |a AS (
        |  SELECT doc_id, CAST(1 + (2 + doc_id % 3) + k AS INTEGER),
        |    8, CAST(25 + (doc_id*11 + k*5) % 90 AS BIGINT),
        |    CAST(k * 23 AS BIGINT),
        |    CAST((25 + (doc_id*11 + k*5) % 90) * ((doc_id*5 + k) % 251)
        |      AS BIGINT)
        |  FROM d, range(0, 2) t(k) WHERE doc_id % 2 = 0)
        |SELECT * FROM (
        |  SELECT * FROM sc UNION ALL SELECT * FROM v
        |  UNION ALL SELECT * FROM a)
        |ORDER BY doc_id, tag_idx""".stripMargin,

    // stream and chunk fields restated by the fixture formulas; the
    // audio stream exists on even ids only
    "q208_avi_streams" ->
      """WITH d AS (
        |  SELECT doc_id FROM documents
        |  WHERE doc_id < 150 AND doc_id % 41 != 0 AND doc_id % 37 != 0),
        |vc AS (
        |  SELECT doc_id, SUM((20 + (doc_id*7 + c*13) % 100)
        |    * ((doc_id + c) % 251)) AS vsum,
        |    COUNT(*) AS vn
        |  FROM d, range(0, 5) t(c) WHERE c < 2 + doc_id % 3
        |  GROUP BY doc_id),
        |ac AS (
        |  SELECT doc_id, SUM((30 + (doc_id*11 + c*17) % 80)
        |    * ((doc_id*3 + c) % 251)) AS asum
        |  FROM d, range(0, 2) t(c) WHERE doc_id % 2 = 0
        |  GROUP BY doc_id),
        |s AS (
        |  SELECT d.doc_id, 0 AS stream_idx, 'vids' AS fcc_type,
        |    CAST(1 AS BIGINT) AS scale,
        |    CAST(24 + d.doc_id % 10 AS BIGINT) AS rate,
        |    CAST(10 + d.doc_id % 20 AS BIGINT) AS length,
        |    CAST(vn AS INTEGER) AS n_chunks, CAST(vsum AS BIGINT)
        |      AS payload_sum
        |  FROM d JOIN vc ON d.doc_id = vc.doc_id
        |  UNION ALL
        |  SELECT d.doc_id, 1, 'auds', CAST(1 AS BIGINT),
        |    CAST(8000 * (1 + d.doc_id % 3) AS BIGINT),
        |    CAST(100 + d.doc_id % 50 AS BIGINT),
        |    CAST(2 AS INTEGER), CAST(asum AS BIGINT)
        |  FROM d JOIN ac ON d.doc_id = ac.doc_id)
        |SELECT s.doc_id, CAST(stream_idx AS INTEGER) AS stream_idx,
        |  fcc_type, scale, rate, length, n_chunks, payload_sum,
        |  CAST(160 + (s.doc_id % 16) * 8 AS BIGINT) AS width,
        |  CAST(120 + (s.doc_id % 9) * 8 AS BIGINT) AS height,
        |  CAST(2 + s.doc_id % 3 AS BIGINT) AS total_frames
        |FROM s ORDER BY doc_id, stream_idx""".stripMargin,

    // in-class pairs share the pixel field regardless of carrier;
    // w is the class geometry formula
    "q207_cross_format_image_dedup" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id % 8 AS acls FROM documents
        |  WHERE doc_id < 120 AND doc_id % 41 != 0)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       CAST(30 + (a.acls % 5) * 7 AS BIGINT) AS w
        |FROM d a, d b
        |WHERE a.doc_id < b.doc_id AND a.acls = b.acls
        |ORDER BY id_a, id_b""".stripMargin,

    // one (format, num_rows) row per shard; num_rows is the same
    // stripe/row-group/block sum for every family
    "q206_columnar_triage" ->
      """WITH d AS (
        |  SELECT doc_id FROM documents
        |  WHERE doc_id < 150 AND doc_id % 41 != 0),
        |g AS (
        |  SELECT doc_id, unnest(range(0, 1 + doc_id % 3)) AS g FROM d),
        |a AS (
        |  SELECT doc_id,
        |    CAST(SUM(50 + (doc_id*11 + g*7) % 300) AS BIGINT) AS num_rows
        |  FROM g GROUP BY doc_id),
        |classic AS (
        |  SELECT doc_id,
        |    CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'parquet'
        |         WHEN 1 THEN 'orc' ELSE 'avro' END AS format,
        |    num_rows
        |  FROM a),
        |arrowed AS (
        |  SELECT doc_id, 'arrow' AS format,
        |         CAST(3 + doc_id % 5 AS BIGINT) AS num_rows
        |  FROM documents
        |  WHERE doc_id >= 150 AND doc_id < 200 AND doc_id % 41 != 0)
        |SELECT doc_id, format, num_rows FROM classic
        |UNION ALL SELECT doc_id, format, num_rows FROM arrowed
        |ORDER BY doc_id""".stripMargin,

    // footer fields are pure (doc, stripe) formulas, codec-independent
    "q205_orc_footer" ->
      """WITH d AS (
        |  SELECT doc_id FROM documents
        |  WHERE doc_id < 150 AND doc_id % 41 != 0 AND doc_id % 37 != 0),
        |g AS (
        |  SELECT doc_id, unnest(range(0, 1 + doc_id % 3)) AS g FROM d),
        |a AS (
        |  SELECT doc_id,
        |    CAST(SUM(100 + (doc_id*7 + g*13) % 400) AS BIGINT) AS num_rows,
        |    CAST(COUNT(*) AS INTEGER) AS n_stripes
        |  FROM g GROUP BY doc_id)
        |SELECT doc_id,
        |  CASE CAST(doc_id % 4 AS INTEGER) WHEN 0 THEN 'NONE'
        |       WHEN 1 THEN 'ZLIB' WHEN 2 THEN 'SNAPPY'
        |       ELSE 'LZ4' END AS compression,
        |  n_stripes, CAST(2 + doc_id % 3 AS INTEGER) AS n_cols,
        |  num_rows, CAST(5000 + doc_id * 3 AS BIGINT) AS content_length
        |FROM a ORDER BY doc_id""".stripMargin,

    // in-class pairs share the data region regardless of carrier
    "q204_cross_format_tensor_dedup" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id % 8 AS acls FROM documents
        |  WHERE doc_id < 120 AND doc_id % 41 != 0)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       CAST(500 + a.acls * 37 AS BIGINT) AS nbytes
        |FROM d a, d b
        |WHERE a.doc_id < b.doc_id AND a.acls = b.acls
        |ORDER BY id_a, id_b""".stripMargin,

    // the q43/q44 twin constant: decoded-vector ranking must equal
    // raw-table ranking exactly
    "q203_safetensors_ann" ->
      """SELECT vec_id AS query_id, CAST(9 AS BIGINT) AS n_exact,
        |       CAST(9 AS BIGINT) AS n_found
        |FROM embeddings WHERE vec_id < 5 ORDER BY query_id""".stripMargin,

    // values < 256 make elem_sum == byte_sum for every width — the
    // LE-decode pin
    "q201_npy_tensors" ->
      """WITH d AS (
        |  SELECT doc_id, 2 + doc_id % 3 AS n, 3 + doc_id % 2 AS m
        |  FROM documents
        |  WHERE doc_id < 150 AND doc_id % 41 != 0 AND doc_id % 37 != 0),
        |s AS (
        |  SELECT doc_id, n, m, SUM((doc_id*3 + k*7) % 101) AS es
        |  FROM d, range(0, 16) t(k) WHERE k < n * m
        |  GROUP BY doc_id, n, m)
        |SELECT doc_id,
        |  CASE CAST(doc_id % 4 AS INTEGER) WHEN 0 THEN '|u1'
        |       WHEN 1 THEN '<i2' WHEN 2 THEN '<i4' ELSE '<i8' END AS descr,
        |  doc_id % 5 = 0 AS fortran,
        |  CAST(2 AS INTEGER) AS ndim,
        |  CAST(n AS BIGINT) AS shape0, CAST(m AS BIGINT) AS shape1,
        |  CAST(n * m AS BIGINT) AS n_elems,
        |  CAST(es AS BIGINT) AS elem_sum, CAST(es AS BIGINT) AS byte_sum
        |FROM s ORDER BY doc_id""".stripMargin,

    // per-member range sums through the CRC-verified zip layer
    "q202_npz_tensor_store" ->
      """WITH d AS (
        |  SELECT doc_id, 2 + doc_id % 4 AS n, 3 + doc_id % 3 AS m
        |  FROM documents
        |  WHERE doc_id < 150 AND doc_id % 41 != 0 AND doc_id % 37 != 0),
        |r AS (
        |  SELECT doc_id, 'emb.npy' AS name, '<i4' AS descr,
        |    CAST(n AS BIGINT) AS n_elems,
        |    SUM((doc_id + k*3) % 97) AS elem_sum
        |  FROM d, range(0, 6) t(k) WHERE k < n
        |  GROUP BY doc_id, n
        |  UNION ALL
        |  SELECT doc_id, 'ids.npy', '<i8', CAST(m AS BIGINT),
        |    SUM((doc_id*5 + k) % 89)
        |  FROM d, range(0, 6) t(k) WHERE k < m
        |  GROUP BY doc_id, m)
        |SELECT doc_id, name, descr, n_elems,
        |  CAST(elem_sum AS BIGINT) AS elem_sum
        |FROM r ORDER BY doc_id, name""".stripMargin,

    // three tensors with formula shapes/fills; __metadata__ excluded
    "q200_safetensors" ->
      """WITH d AS (
        |  SELECT doc_id, 4 + doc_id % 4 AS n FROM documents
        |  WHERE doc_id < 150 AND doc_id % 41 != 0 AND doc_id % 37 != 0),
        |t AS (
        |  SELECT doc_id, 'emb' AS tensor_name, 'F32' AS dtype,
        |    n * 8 AS n_elems, n * 32 AS nbytes,
        |    n * 32 * (doc_id % 251) AS byte_sum FROM d
        |  UNION ALL
        |  SELECT doc_id, 'ids', 'I64', n, n * 8,
        |    n * 8 * ((doc_id * 3) % 251) FROM d
        |  UNION ALL
        |  SELECT doc_id, 'mask', 'U8', n, n,
        |    n * ((doc_id * 7) % 251) FROM d WHERE doc_id % 2 = 0)
        |SELECT doc_id, tensor_name, dtype,
        |  CAST(n_elems AS BIGINT) AS n_elems,
        |  CAST(nbytes AS BIGINT) AS nbytes,
        |  CAST(byte_sum AS BIGINT) AS byte_sum,
        |  true AS extent_ok
        |FROM t ORDER BY doc_id, tensor_name""".stripMargin,

    // the q169 member formulas under a codec column; decode must be
    // byte-exact for the tar checksums to hold
    "q199_compressed_shard_triage" ->
      """WITH d AS (
        |  SELECT doc_id FROM documents
        |  WHERE doc_id < 150 AND doc_id % 41 != 0),
        |s AS (
        |  SELECT doc_id, unnest(range(0, 2 + doc_id % 3)) AS j FROM d),
        |c AS (
        |  SELECT doc_id, j, 'txt' AS ext, 0 AS e FROM s
        |  UNION ALL
        |  SELECT doc_id, j, 'jpg', 1 FROM s WHERE (doc_id + j) % 2 = 0
        |  UNION ALL
        |  SELECT doc_id, j, 'json', 2 FROM s WHERE (doc_id + j) % 3 = 0)
        |SELECT doc_id,
        |  CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'gzip'
        |       WHEN 1 THEN 'lz4' ELSE 'zstd' END AS outer,
        |  printf('shard%d/s%05d_%02d.%s', CAST(doc_id % 7 AS INTEGER),
        |    CAST(doc_id AS INTEGER), CAST(j AS INTEGER), ext) AS name,
        |  CAST(10 + (13*doc_id + 7*j + 3*e) % 200 AS BIGINT) AS msize,
        |  CAST((10 + (13*doc_id + 7*j + 3*e) % 200)
        |    * ((doc_id + 31*j + 17*e) % 251) AS BIGINT) AS payload_sum
        |FROM c ORDER BY doc_id, name""".stripMargin,

    // footer fields are pure (doc, group) formulas; num_rows and
    // total_bytes are row-group sums
    "q198_parquet_footer" ->
      """WITH d AS (
        |  SELECT doc_id FROM documents
        |  WHERE doc_id < 150 AND doc_id % 41 != 0 AND doc_id % 37 != 0),
        |g AS (
        |  SELECT doc_id, unnest(range(0, 1 + doc_id % 3)) AS g FROM d),
        |a AS (
        |  SELECT doc_id,
        |    CAST(SUM(10 + (doc_id*3 + g*7) % 90) AS BIGINT) AS num_rows,
        |    CAST(COUNT(*) AS INTEGER) AS n_row_groups,
        |    CAST(SUM(1000 + (doc_id*13 + g*29) % 5000) AS BIGINT)
        |      AS total_bytes
        |  FROM g GROUP BY doc_id)
        |SELECT doc_id, CAST(1 + doc_id % 2 AS INTEGER) AS version,
        |  num_rows, n_row_groups,
        |  CAST(2 + doc_id % 4 AS INTEGER) AS n_columns, total_bytes,
        |  printf('writer %d', CAST(doc_id % 5 AS INTEGER)) AS created_by
        |FROM a ORDER BY doc_id""".stripMargin,

    // frame order is fixed (TIT2, TPE1, [TALB], [PRIV], TRCK); text
    // round-trips every encoding, so the oracle is encoding-free
    "q197_id3v2_frames" ->
      """WITH d AS (
        |  SELECT doc_id FROM documents
        |  WHERE doc_id < 150 AND doc_id % 41 != 0 AND doc_id % 37 != 0),
        |f AS (
        |  SELECT doc_id, 0 AS frame_idx, 'TIT2' AS frame_id,
        |    printf('title %d', CAST(doc_id AS INTEGER))
        |      || CASE WHEN doc_id % 6 = 5 THEN chr(255) ELSE '' END
        |      AS text FROM d
        |  UNION ALL
        |  SELECT doc_id, 1, 'TPE1',
        |    printf('artist %d', CAST(doc_id % 13 AS INTEGER)) FROM d
        |  UNION ALL
        |  SELECT doc_id, 2, 'TALB',
        |    printf('album %d', CAST(doc_id % 7 AS INTEGER))
        |  FROM d WHERE doc_id % 3 = 0
        |  UNION ALL
        |  SELECT doc_id,
        |    2 + CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END, 'PRIV',
        |    NULL FROM d WHERE doc_id % 4 = 0
        |  UNION ALL
        |  SELECT doc_id,
        |    2 + CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END
        |      + CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END, 'TRCK',
        |    printf('%d', CAST(doc_id % 20 AS INTEGER)) FROM d)
        |SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
        |  frame_id, text
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin,

    // block inventory is a pure function of (doc, block) — the codec
    // (null/deflate/snappy by id%3) must not change it
    "q196_avro_codecs" ->
      """WITH d AS (
        |  SELECT doc_id FROM documents
        |  WHERE doc_id < 150 AND doc_id % 41 != 0 AND doc_id % 37 != 0),
        |b AS (
        |  SELECT doc_id, unnest(range(0, 1 + doc_id % 4)) AS b FROM d)
        |SELECT doc_id, CAST(b AS INTEGER) AS block_idx,
        |  CAST(1 + (doc_id + b) % 5 AS BIGINT) AS n_records,
        |  CAST(100 + (doc_id*7 + b*13) % 200 AS BIGINT) AS usize,
        |  CAST((100 + (doc_id*7 + b*13) % 200) * ((doc_id + b*11) % 251)
        |    AS BIGINT) AS payload_sum
        |FROM b ORDER BY doc_id, block_idx""".stripMargin,

    // member fields restated by the fixture formulas; %37 (trailer
    // poison) and %41 (empty) excluded
    "q192_gzip_members" ->
      """WITH d AS (
        |  SELECT doc_id FROM documents
        |  WHERE doc_id < 150 AND doc_id % 41 != 0 AND doc_id % 37 != 0),
        |m AS (
        |  SELECT doc_id, unnest(range(0, 1 + doc_id % 3)) AS m FROM d)
        |SELECT doc_id, CAST(m AS INTEGER) AS member_idx,
        |  doc_id % 2 = 0 AS is_text,
        |  CAST(doc_id * 1000 + m AS BIGINT) AS mtime,
        |  CAST((doc_id % 3) * 7 AS INTEGER) AS os,
        |  CAST(CASE WHEN (doc_id + m) % 4 = 0 THEN 6 + doc_id % 10
        |            ELSE 0 END AS INTEGER) AS extra_len,
        |  CASE WHEN (doc_id + m) % 2 = 0
        |       THEN printf('doc%05d_m%d.txt', CAST(doc_id AS INTEGER),
        |                   CAST(m AS INTEGER)) END AS fname,
        |  CASE WHEN (doc_id + m) % 5 = 0
        |       THEN printf('c%d', CAST(doc_id AS INTEGER)) END AS comment,
        |  CAST(200 + (doc_id*11 + m*17) % 300 AS BIGINT) AS decomp_len,
        |  CAST((200 + (doc_id*11 + m*17) % 300) * ((doc_id + m*7) % 251)
        |    AS BIGINT) AS content_sum
        |FROM m ORDER BY doc_id, member_idx""".stripMargin,

    // per-frame fields restated by the fixture formulas; the skippable
    // padding frame (id%6==0) indexes after the lz4 frames
    "q194_lz4_frames" ->
      """WITH d AS (
        |  SELECT doc_id FROM documents
        |  WHERE doc_id < 150 AND doc_id % 41 != 0 AND doc_id % 37 != 0),
        |f AS (
        |  SELECT doc_id, unnest(range(0, 1 + doc_id % 2)) AS f FROM d),
        |lz AS (
        |  SELECT doc_id, CAST(f AS INTEGER) AS frame_idx, 'lz4' AS kind,
        |    CAST(2 AS INTEGER) AS n_blocks,
        |    CAST((150 + (doc_id*7 + f*13) % 200)
        |      + (50 + (doc_id*11 + f) % 100) AS BIGINT) AS content_len,
        |    CAST((150 + (doc_id*7 + f*13) % 200) * ((doc_id + f) % 251)
        |      + (50 + (doc_id*11 + f) % 100) * ((doc_id*3 + f*5) % 251)
        |      AS BIGINT) AS content_sum,
        |    doc_id % 4 != 0 AS block_indep,
        |    CASE WHEN doc_id % 2 = 0 THEN true END AS checksum_ok
        |  FROM f),
        |sk AS (
        |  SELECT doc_id, CAST(1 + doc_id % 2 AS INTEGER) AS frame_idx,
        |    'skippable' AS kind, CAST(0 AS INTEGER) AS n_blocks,
        |    CAST(10 + doc_id % 40 AS BIGINT) AS content_len,
        |    CAST((10 + doc_id % 40) * (doc_id % 251) AS BIGINT)
        |      AS content_sum,
        |    true AS block_indep, CAST(NULL AS BOOLEAN) AS checksum_ok
        |  FROM d WHERE doc_id % 6 = 0)
        |SELECT * FROM (SELECT * FROM lz UNION ALL SELECT * FROM sk)
        |ORDER BY doc_id, frame_idx""".stripMargin,

    // in-class pairs share the decoded content; wrappers differ
    "q195_lz4_wrapper_invariant_dedup" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id % 8 AS acls FROM documents
        |  WHERE doc_id < 120 AND doc_id % 41 != 0)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       CAST(600 + a.acls * 37 AS BIGINT) AS clen
        |FROM d a, d b
        |WHERE a.doc_id < b.doc_id AND a.acls = b.acls
        |ORDER BY id_a, id_b""".stripMargin,

    // the q169 member formulas, reached through the gzip layer
    "q193_targz_members" ->
      """WITH d AS (
        |  SELECT doc_id FROM documents
        |  WHERE doc_id < 150 AND doc_id % 41 != 0 AND doc_id % 37 != 0),
        |s AS (
        |  SELECT doc_id, unnest(range(0, 2 + doc_id % 3)) AS j FROM d),
        |c AS (
        |  SELECT doc_id, j, 'txt' AS ext, 0 AS e FROM s
        |  UNION ALL
        |  SELECT doc_id, j, 'jpg', 1 FROM s WHERE (doc_id + j) % 2 = 0
        |  UNION ALL
        |  SELECT doc_id, j, 'json', 2 FROM s WHERE (doc_id + j) % 3 = 0)
        |SELECT doc_id,
        |  printf('shard%d/s%05d_%02d.%s', CAST(doc_id % 7 AS INTEGER),
        |    CAST(doc_id AS INTEGER), CAST(j AS INTEGER), ext) AS name,
        |  CAST(10 + (13*doc_id + 7*j + 3*e) % 200 AS BIGINT) AS msize,
        |  CAST((10 + (13*doc_id + 7*j + 3*e) % 200)
        |    * ((doc_id + 31*j + 17*e) % 251) AS BIGINT) AS payload_sum
        |FROM c ORDER BY doc_id, name""".stripMargin,

    "q01_agg_lineitem" ->
      """SELECT l_returnflag, sum(l_quantity) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q02_filter_sort_part" ->
      """SELECT p_partkey, p_size, p_retailprice FROM part
        |WHERE p_size > 40 ORDER BY p_retailprice DESC, p_partkey""".stripMargin,

    "q03_join_agg_segment" ->
      """SELECT c_mktsegment, count(*) AS n, sum(l_quantity) AS sum_qty
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q04_window_first_order" ->
      """SELECT o_custkey, o_orderkey AS first_order, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_orderdate, o_orderkey) AS rn
        |  FROM orders) WHERE rn = 1 ORDER BY o_custkey""".stripMargin,

    "q05_anti_join_customer" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_totalprice > 200000)
        |ORDER BY c_custkey""".stripMargin,

    "q06_semi_join_part" ->
      """SELECT p_partkey, p_name FROM part
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_partkey = p_partkey AND l_quantity >= 49)
        |ORDER BY p_partkey""".stripMargin,

    "q07_distinct_orders" ->
      """SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
        |ORDER BY 1, 2""".stripMargin,

    "q08_topk_customer" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |ORDER BY c_acctbal DESC, c_custkey LIMIT 10""".stripMargin,

    "q09_events_hourly" ->
      """SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS w_start,
        |       event_type, count(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q10_text_stats" ->
      """SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
        |       length(text) AS n_chars_calc
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q11_text_fingerprint" ->
      """SELECT doc_id,
        |       md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q12_dedup_docs_exact" ->
      """SELECT doc_id, lang, source, n_chars FROM documents
        |WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY md5(text))
        |ORDER BY doc_id""".stripMargin,

    "q13_dedup_docs_report" ->
      """SELECT md5(text) AS text_hash, count(*) AS refs_num,
        |       min(doc_id) AS first_id
        |FROM documents GROUP BY 1 HAVING count(*) > 1
        |ORDER BY refs_num DESC, text_hash""".stripMargin,

    "q14_text_langid" ->
      """SELECT doc_id,
        |  CASE WHEN en > 0 AND en = best THEN 'en'
        |       WHEN es > 0 AND es = best THEN 'es'
        |       WHEN de > 0 AND de = best THEN 'de'
        |       WHEN fr > 0 AND fr = best THEN 'fr'
        |       ELSE 'und' END AS lang_id
        |FROM (
        |  SELECT doc_id, en, es, de, fr, greatest(en, es, de, fr) AS best
        |  FROM (
        |    SELECT doc_id,
        |      len(list_filter(string_split(text, ' '),
        |          x -> x IN ('the','a','of','and','is'))) AS en,
        |      len(list_filter(string_split(text, ' '),
        |          x -> x IN ('el','la','de','que','es'))) AS es,
        |      len(list_filter(string_split(text, ' '),
        |          x -> x IN ('der','die','das','und','ist'))) AS de,
        |      len(list_filter(string_split(text, ' '),
        |          x -> x IN ('le','la','les','et','est'))) AS fr
        |    FROM documents))
        |ORDER BY doc_id""".stripMargin,

    "q15_dedup_ngram_jaccard" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh AS (
        |  SELECT DISTINCT doc_id AS id,
        |    unnest(list_transform(range(1, greatest(len(t) - 1, 0) + 1),
        |           i -> t[i] || ' ' || t[i + 1])) AS shingle
        |  FROM toks),
        |cnt AS (SELECT id, count(*) AS n FROM sh GROUP BY 1),
        |cand AS (
        |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS common
        |  FROM sh a JOIN sh b USING (shingle)
        |  WHERE a.id < b.id GROUP BY 1, 2)
        |SELECT id_a, id_b, common, na, nb FROM (
        |  SELECT c.id_a, c.id_b, c.common, ca.n AS na, cb.n AS nb
        |  FROM cand c
        |  JOIN cnt ca ON ca.id = c.id_a
        |  JOIN cnt cb ON cb.id = c.id_b)
        |WHERE 10 * common >= 7 * (na + nb - common)
        |ORDER BY id_a, id_b""".stripMargin,

    "q16_join_region_customers" ->
      """SELECT r_name, count(*) AS n_cust
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q17_events_stats" ->
      """SELECT event_type, count(*) AS n, min(value) AS min_v,
        |       max(value) AS max_v, count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q18_ann_bruteforce" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv
        |           FROM embeddings WHERE vec_id < 5),
        |s AS (SELECT query_id, vec_id AS neighbor_id,
        |             list_cosine_similarity(embedding, qv) AS sim
        |      FROM embeddings, q WHERE vec_id <> query_id),
        |r AS (SELECT query_id, neighbor_id,
        |             row_number() OVER (PARTITION BY query_id
        |                                ORDER BY sim DESC, neighbor_id)
        |               AS "rank"
        |      FROM s)
        |SELECT query_id, neighbor_id, "rank" FROM r WHERE "rank" <= 10
        |ORDER BY query_id, "rank"""".stripMargin,

    // r13 restatements of the legacy rows-only queries (verdict ask #8)
    "q19_dedup_minhash_lsh" ->
      """WITH base AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id < 500),
        |pl AS (
        |  SELECT doc_id, text FROM base
        |  UNION ALL SELECT doc_id + 1000000 AS doc_id, text FROM base),
        |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM pl),
        |sh AS (
        |  SELECT DISTINCT doc_id AS id,
        |    unnest(list_transform(range(1, greatest(len(t) - 1, 0) + 1),
        |           i -> t[i] || ' ' || t[i + 1])) AS shingle
        |  FROM toks),
        |cnt AS (SELECT id, count(*) AS n FROM sh GROUP BY 1),
        |cand AS (
        |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS common
        |  FROM sh a JOIN sh b USING (shingle)
        |  WHERE a.id < b.id GROUP BY 1, 2)
        |SELECT id_a, id_b, common, na, nb FROM (
        |  SELECT c.id_a, c.id_b, c.common, ca.n AS na, cb.n AS nb
        |  FROM cand c
        |  JOIN cnt ca ON ca.id = c.id_a
        |  JOIN cnt cb ON cb.id = c.id_b)
        |WHERE 10 * common >= 7 * (na + nb - common)
        |ORDER BY id_a, id_b""".stripMargin,

    "q20_dedup_simhash" ->
      """SELECT 'organic_variant_violations' AS probe,
        |       CAST(0 AS BIGINT) AS value
        |UNION ALL
        |SELECT 'twin_pairs' AS probe,
        |       (SELECT count(*) FROM documents WHERE doc_id < 1000)
        |ORDER BY probe""".stripMargin,

    "q21_ann_lsh" ->
      """SELECT vec_id AS query_id,
        |       vec_id + 1000000 * t.j AS neighbor_id
        |FROM embeddings CROSS JOIN generate_series(1, 9) AS t(j)
        |WHERE vec_id < 5 ORDER BY query_id, neighbor_id""".stripMargin,

    "q22_ann_cosine_neardup" ->
      """WITH av AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 1000000 AS vec_id,
        |         list_transform(embedding, x -> x * 2) AS embedding
        |  FROM embeddings)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |FROM av a JOIN av b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.9
        |ORDER BY id_a, id_b""".stripMargin,

    "q23_multimodal_decode" ->
      """SELECT doc_id,
        |       CAST(8 + doc_id % 5 AS INT) AS width,
        |       CAST(5 + doc_id % 3 AS INT) AS height,
        |       TRUE AS ok
        |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin,

    "q24_multimodal_frames" ->
      """SELECT doc_id,
        |  CAST(floor((greatest(octet_length(CAST(text AS BLOB)), 1) - 1)
        |             / 1024) + 1 AS BIGINT) AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q27_text_rolling_hash" ->
      """WITH tt AS (
        |  SELECT doc_id, string_split(text, ' ') AS t
        |  FROM documents WHERE doc_id < 1000)
        |SELECT doc_id,
        |  (len(t) < 2 OR t[1] = t[2]) AS swap_same_hash,
        |  (len(t) < 2 OR t[1] = t[2]) AS swap_identity
        |FROM tt ORDER BY doc_id""".stripMargin,

    "q25_text_quality" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    CAST(length(text) AS DOUBLE) AS n_chars,
        |    CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tok,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      x -> x IN ('the','a','of','and','is','el','la','de','que',
        |                 'es','der','die','das','und','ist','le','la',
        |                 'les','et','est'))) AS DOUBLE) AS n_stop,
        |    CAST(len(regexp_extract_all(text, '[.,!?]')) AS DOUBLE)
        |      AS n_punct
        |  FROM documents)
        |SELECT doc_id,
        |  least(n_chars / 200.0, 1.0) * 0.4
        |  + (CASE WHEN n_chars / greatest(n_tok, 1.0) BETWEEN 3.0 AND 12.0
        |          THEN 1.0 ELSE 0.3 END) * 0.3
        |  + (CASE WHEN n_punct > 0 THEN 1.0 ELSE 0.5 END) * 0.15
        |  + least(n_stop / greatest(n_tok, 1.0) * 5.0, 1.0) * 0.15
        |    AS quality
        |FROM f ORDER BY doc_id""".stripMargin,

    "q26_chunk_repetition" ->
      """SELECT md5(chunk) AS chunk_hash, count(*) AS refs_num FROM (
        |  SELECT unnest(list_transform(range(1, length(text) + 1, 64),
        |         s -> substr(text, s, 64))) AS chunk
        |  FROM documents)
        |GROUP BY 1 HAVING count(*) > 1
        |ORDER BY refs_num DESC, chunk_hash""".stripMargin,

    "q28_dedup_encode" ->
      """WITH chunks AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(1, length(text) + 1, 64),
        |      s -> {'pos': CAST((s - 1) // 64 AS BIGINT),
        |            'chunk': substr(text, s, 64)})) AS rec
        |  FROM documents),
        |c AS (SELECT doc_id, rec.pos AS pos, rec.chunk AS chunk,
        |             md5(rec.chunk) AS hash FROM chunks),
        |e AS (SELECT doc_id, pos,
        |        row_number() OVER w AS rn,
        |        first_value(doc_id) OVER w AS first_doc,
        |        first_value(pos) OVER w AS first_pos
        |      FROM c WINDOW w AS (PARTITION BY hash ORDER BY doc_id, pos))
        |SELECT doc_id, pos, rn > 1 AS is_pointer,
        |       CASE WHEN rn > 1 THEN first_doc END AS ref_doc,
        |       CASE WHEN rn > 1 THEN first_pos END AS ref_pos
        |FROM e ORDER BY doc_id, pos""".stripMargin,

    "q29_recovery_resolve" ->
      """WITH chunks AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(1, length(text) + 1, 64),
        |      s -> {'pos': CAST((s - 1) // 64 AS BIGINT),
        |            'chunk': substr(text, s, 64)})) AS rec
        |  FROM documents),
        |c AS (SELECT doc_id, rec.pos AS pos, rec.chunk AS chunk,
        |             md5(rec.chunk) AS hash FROM chunks),
        |e AS (SELECT doc_id, pos, chunk,
        |        row_number() OVER w AS rn,
        |        first_value(doc_id) OVER w AS ref_doc,
        |        first_value(pos) OVER w AS ref_pos
        |      FROM c WINDOW w AS (PARTITION BY hash ORDER BY doc_id, pos)),
        |p AS (SELECT chunk AS ptr_chunk, ref_doc, ref_pos FROM e WHERE rn > 1)
        |SELECT count(*) AS n_pointers, count(t.target_chunk) AS n_resolved,
        |       CAST(sum(CASE WHEN p.ptr_chunk = t.target_chunk
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_equal
        |FROM p LEFT JOIN (SELECT doc_id AS ref_doc, pos AS ref_pos,
        |                         chunk AS target_chunk FROM c) t
        |  USING (ref_doc, ref_pos)""".stripMargin,

    "q31_set_except" ->
      """SELECT c_nationkey AS nk FROM customer
        |EXCEPT
        |SELECT c_nationkey AS nk FROM customer WHERE c_acctbal > 9650
        |ORDER BY nk""".stripMargin,

    "q32_distinct_chunks" ->
      """SELECT count(DISTINCT md5(chunk)) AS n_distinct,
        |       count(*) AS n_total FROM (
        |  SELECT unnest(list_transform(range(1, length(text) + 1, 64),
        |         s -> substr(text, s, 64))) AS chunk
        |  FROM documents)""".stripMargin,

    "q54_distinct_chunks_hll" ->
      """SELECT count(DISTINCT md5(chunk)) AS n_distinct,
        |       TRUE AS within_2pct FROM (
        |  SELECT unnest(list_transform(range(1, length(text) + 1, 64),
        |         s -> substr(text, s, 64))) AS chunk
        |  FROM documents)""".stripMargin,

    "q36_percentiles" ->
      """SELECT l_returnflag,
        |       quantile_cont(l_quantity, 0.5) AS p50,
        |       quantile_cont(l_quantity, 0.9) AS p90,
        |       quantile_cont(l_quantity, 0.99) AS p99
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q34_events_sliding" ->
      """SELECT w_start, event_type, count(*) AS n FROM (
        |  SELECT CAST(make_timestamp(w_start_ms * 1000) AS VARCHAR) AS w_start,
        |         event_type
        |  FROM (
        |    SELECT unnest([
        |             (epoch_ms(ts) // 300000) * 300000 - 300000,
        |             (epoch_ms(ts) // 300000) * 300000]) AS w_start_ms,
        |           event_type
        |    FROM events))
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q35_rollup_orders" ->
      """SELECT coalesce(CAST(yr AS VARCHAR), 'ALL') AS yr_s,
        |       coalesce(o_orderstatus, 'ALL') AS st,
        |       count(*) AS n,
        |       GROUPING(yr, o_orderstatus) AS gid
        |FROM (SELECT year(o_orderdate) AS yr, o_orderstatus FROM orders)
        |GROUP BY ROLLUP (yr, o_orderstatus)
        |ORDER BY gid, yr_s, st""".stripMargin,

    "q33_text_bpe_tokens" -> {
      // the pattern contains an apostrophe → double it for the SQL literal
      val pat = TextAnalysis.BpePattern.replace("'", "''")
      s"""SELECT doc_id,
         |       len(regexp_extract_all(text, '$pat')) AS n_bpe,
         |       md5(array_to_string(regexp_extract_all(text, '$pat'),
         |           chr(1))) AS tok_md5
         |FROM documents ORDER BY doc_id""".stripMargin
    },

    "q30_ordered_reassembly" ->
      """WITH chunks AS (
        |  SELECT doc_id, text,
        |    unnest(list_transform(range(1, length(text) + 1, 64),
        |      s -> {'pos': CAST((s - 1) // 64 AS BIGINT),
        |            'chunk': substr(text, s, 64)})) AS rec
        |  FROM documents),
        |r AS (SELECT doc_id, text,
        |        string_agg(rec.chunk, '' ORDER BY rec.pos) AS rebuilt
        |      FROM chunks GROUP BY doc_id, text)
        |SELECT count(*) AS n_docs,
        |       CAST(sum(CASE WHEN rebuilt = text THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_equal
        |FROM r""".stripMargin,

    // probability-1 constant (see the query comment): every indexed doc's
    // identical twin probe must find it
    "q55_neardup_index_planted" ->
      """SELECT doc_id, CAST(1 AS BOOLEAN) AS found FROM documents
        |WHERE doc_id < 500 ORDER BY doc_id""".stripMargin,

    "q56_corpus_split" -> {
      val Seq(c1, c2) = graft.ext.CorpusPrep.splitCuts(splitFractions)
      val u = sqlHashUnit16("doc_id", "graft", 1)
      s"""SELECT doc_id,
         |  CASE WHEN u < $c1 THEN 'train'
         |       WHEN u < $c2 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM (SELECT doc_id, $u AS u FROM documents)
         |ORDER BY doc_id""".stripMargin
    },

    "q57_corpus_mix" -> {
      val cases = mixWeights.toSeq.sortBy(_._1).map { case (src, w) =>
        s"WHEN '$src' THEN ${graft.ext.CorpusPrep.threshold16(w)}"
      }.mkString(" ")
      val u = sqlHashUnit16("doc_id", "mix", 5)
      s"""SELECT doc_id, source FROM documents
         |WHERE $u < CASE source $cases ELSE 0 END
         |ORDER BY doc_id""".stripMargin
    },

    // "shares a 32-gram of normalized text" == "normalized text contains
    // the snippet" because every snippet IS a full 32-gram (see the
    // query comment); DuckDB checks the containment form directly.
    "q58_decontaminate" ->
      """WITH norm AS (
        |  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g'))
        |           AS nt
        |  FROM documents),
        |snips AS (
        |  SELECT substr(nt, 10, 32) AS snippet FROM norm
        |  WHERE doc_id % 50 = 7 AND length(nt) >= 41)
        |SELECT doc_id,
        |  CAST(CASE WHEN EXISTS (SELECT 1 FROM snips
        |                         WHERE contains(nt, snippet))
        |       THEN 1 ELSE 0 END AS INT) AS contaminated
        |FROM norm ORDER BY doc_id""".stripMargin,

    "q60_curation_pipeline" -> {
      val cases = mixWeights.toSeq.sortBy(_._1).map { case (src, w) =>
        s"WHEN '$src' THEN ${graft.ext.CorpusPrep.threshold16(w)}"
      }.mkString(" ")
      val Seq(c1, c2) = graft.ext.CorpusPrep.splitCuts(splitFractions)
      val uMix = sqlHashUnit16("doc_id", "mix", 5)
      val uSplit = sqlHashUnit16("doc_id", "graft", 1)
      s"""WITH planted AS (
         |  SELECT doc_id, source, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000 AS doc_id, source, text FROM documents),
         |norm AS (
         |  SELECT doc_id, source, text,
         |         trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt
         |  FROM planted),
         |snips AS (
         |  SELECT substr(trim(regexp_replace(lower(text), '\\s+', ' ',
         |                     'g')), 10, 32) AS snippet
         |  FROM documents
         |  WHERE doc_id % 50 = 7
         |    AND length(trim(regexp_replace(lower(text), '\\s+', ' ',
         |                    'g'))) >= 41),
         |q AS (
         |  SELECT * FROM norm
         |  WHERE len(string_split(text, ' ')) >= 20
         |    AND length(text) >= 150),
         |d AS (
         |  SELECT * FROM q
         |  WHERE doc_id IN (SELECT min(doc_id) FROM q GROUP BY md5(text))),
         |c AS (
         |  SELECT * FROM d
         |  WHERE NOT EXISTS (SELECT 1 FROM snips
         |                    WHERE contains(nt, snippet))),
         |m AS (SELECT doc_id, source FROM c
         |      WHERE $uMix < CASE source $cases ELSE 0 END)
         |SELECT doc_id, source,
         |  CASE WHEN $uSplit < $c1 THEN 'train'
         |       WHEN $uSplit < $c2 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM m ORDER BY doc_id""".stripMargin
    },

    "q59_pack_sequences" ->
      """WITH t AS (
        |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, tok,
        |    coalesce(sum(tok) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s
        |  FROM t)
        |SELECT doc_id, tok, CAST(s // 512 AS BIGINT) AS first_window,
        |       CAST((s + tok - 1) // 512 AS BIGINT) AS last_window
        |FROM c ORDER BY doc_id""".stripMargin,

    "q61_intradoc_repetition" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |b AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(1, greatest(len(t) - 1, 0) + 1),
        |           i -> t[i] || ' ' || t[i + 1])) AS bg
        |  FROM toks),
        |c AS (SELECT doc_id, bg, count(*) AS c FROM b GROUP BY 1, 2)
        |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
        |       count(*) AS n_distinct, CAST(max(c) AS BIGINT) AS top_count,
        |       CAST(CASE WHEN 20 * (sum(c) - count(*)) >= sum(c)
        |            THEN 1 ELSE 0 END AS INT) AS repetitive
        |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q62_pii_redaction" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    text || ' contact user' || CAST(doc_id AS VARCHAR)
        |      || '@mail.example.org see https://ex.org/p/'
        |      || CAST(doc_id AS VARCHAR)
        |      || CASE WHEN doc_id % 3 = 0
        |           THEN ' alt id '
        |             || CAST(doc_id * 1234567 + 7654321 AS VARCHAR)
        |           ELSE '' END AS pt
        |  FROM documents)
        |SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(pt,
        |    'https?://[^ ]+', '<URL>', 'g'),
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
        |    '<EMAIL>', 'g'),
        |    '[0-9]{7,}', '<NUM>', 'g') AS red,
        |  CAST(len(regexp_extract_all(pt, 'https?://[^ ]+')) AS INT)
        |    AS n_url,
        |  CAST(len(regexp_extract_all(pt,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT)
        |    AS n_email,
        |  CAST(len(regexp_extract_all(pt, '[0-9]{7,}')) AS INT) AS n_num
        |FROM p ORDER BY doc_id""".stripMargin,

    "q63_duplicate_windows" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |win AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(1, greatest(len(t) - 7, 0) + 1),
        |           i -> md5(array_to_string(t[i:i+7], ' ')))) AS wh
        |  FROM toks),
        |dup AS (
        |  SELECT wh FROM win GROUP BY wh
        |  HAVING count(DISTINCT doc_id) > 1)
        |SELECT doc_id, count(*) AS n_windows,
        |  CAST(coalesce(sum(CASE WHEN wh IN (SELECT wh FROM dup)
        |       THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_dup_windows
        |FROM win GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q64_strip_dup_windows" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |win AS (
        |  SELECT doc_id,
        |    unnest(range(1, greatest(len(t) - 7, 0) + 1)) - 1 AS wpos,
        |    unnest(list_transform(range(1, greatest(len(t) - 7, 0) + 1),
        |           i -> md5(array_to_string(t[i:i+7], ' ')))) AS wh
        |  FROM toks),
        |own AS (
        |  SELECT wh, min(doc_id) AS keeper FROM win GROUP BY wh
        |  HAVING count(DISTINCT doc_id) > 1),
        |cut AS (
        |  SELECT DISTINCT doc_id, ti FROM (
        |    SELECT win.doc_id, unnest(range(wpos, wpos + 8)) AS ti
        |    FROM win JOIN own USING (wh) WHERE doc_id <> keeper)),
        |tk AS (
        |  SELECT doc_id, unnest(t) AS tok,
        |         unnest(range(0, len(t))) AS ti FROM toks),
        |kept AS (
        |  SELECT tk.doc_id, string_agg(tok, ' ' ORDER BY ti) AS kept_text,
        |         count(*) AS n_kept
        |  FROM tk ANTI JOIN cut
        |    ON tk.doc_id = cut.doc_id AND tk.ti = cut.ti
        |  GROUP BY tk.doc_id)
        |SELECT t.doc_id, coalesce(kept_text, '') AS clean_text,
        |  CAST(len(t.t) - coalesce(n_kept, 0) AS BIGINT) AS n_removed
        |FROM toks t LEFT JOIN kept USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "q65_source_cap" -> {
      val u = sqlHashUnit16("doc_id", "cap", 9)
      s"""WITH r AS (
         |  SELECT doc_id, source,
         |    row_number() OVER (PARTITION BY source
         |      ORDER BY $u, doc_id) AS rk
         |  FROM documents)
         |SELECT doc_id, source FROM r WHERE rk <= 10
         |ORDER BY doc_id""".stripMargin
    },

    "q66_paragraph_dedup" ->
      """WITH p AS (
        |  SELECT doc_id, concat('common header boilerplate', chr(10),
        |    text, chr(10), 'footer ', source) AS text FROM documents),
        |tok AS (SELECT doc_id, string_split(text, chr(10)) AS t FROM p),
        |para AS (
        |  SELECT doc_id, unnest(range(0, len(t))) AS pos,
        |         unnest(t) AS para FROM tok),
        |k AS (
        |  SELECT doc_id, pos, para, row_number() OVER (
        |    PARTITION BY md5(para) ORDER BY doc_id, pos) AS rn
        |  FROM para),
        |kept AS (
        |  SELECT doc_id,
        |    string_agg(para, chr(10) ORDER BY pos) AS clean_text,
        |    count(*) AS n_kept
        |  FROM k WHERE rn = 1 GROUP BY doc_id)
        |SELECT tok.doc_id, coalesce(kept.clean_text, '') AS clean_text,
        |  CAST(len(tok.t) AS BIGINT) AS n_paras,
        |  CAST(coalesce(kept.n_kept, 0) AS BIGINT) AS n_kept
        |FROM tok LEFT JOIN kept USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "q74_minhash_estimate" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t
        |  FROM documents WHERE doc_id < 200),
        |sh AS (
        |  SELECT DISTINCT doc_id // 2 AS pair, doc_id % 2 AS side,
        |    unnest(list_transform(range(1, greatest(len(t) - 1, 0) + 1),
        |           i -> t[i] || ' ' || t[i + 1])) AS sh
        |  FROM toks),
        |both_sides AS (
        |  SELECT pair FROM (SELECT DISTINCT pair, side FROM sh)
        |  GROUP BY pair HAVING count(*) = 2),
        |agg AS (
        |  SELECT pair,
        |    CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_inter,
        |    CAST(count(*) AS BIGINT) AS n_union
        |  FROM (SELECT pair, sh, count(*) AS c FROM sh GROUP BY pair, sh)
        |  GROUP BY pair)
        |SELECT pair, n_inter, n_union, TRUE AS within_bound
        |FROM agg JOIN both_sides USING (pair)
        |ORDER BY pair""".stripMargin,

    "q75_asof_join" ->
      """WITH c AS (
        |  SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'click'),
        |p AS (
        |  SELECT user_id, ts, event_id AS purchase_id,
        |         value AS purchase_value
        |  FROM events WHERE event_type = 'purchase')
        |SELECT c.event_id, c.user_id, epoch_us(c.ts) AS click_us,
        |       epoch_us(p.ts) AS purchase_us,
        |       p.purchase_id, p.purchase_value
        |FROM c ASOF LEFT JOIN p
        |  ON c.user_id = p.user_id AND c.ts >= p.ts
        |ORDER BY c.event_id""".stripMargin,

    "q76_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
        |m AS (
        |  SELECT user_id, us,
        |    CASE WHEN lag(us) OVER w IS NULL
        |           OR us - lag(us) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS is_new,
        |    event_id
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |x AS (
        |  SELECT user_id, us,
        |    sum(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
        |      ROWS UNBOUNDED PRECEDING) AS session_idx
        |  FROM m)
        |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
        |       CAST(count(*) AS BIGINT) AS n_events,
        |       min(us) AS start_us, max(us) AS end_us,
        |       max(us) - min(us) AS span_us
        |FROM x GROUP BY user_id, session_idx
        |ORDER BY user_id, session_idx""".stripMargin,

    "q77_interval_join" ->
      """WITH bands(lo, hi, band) AS (
        |  VALUES (0.0, 50.0, 'b00'), (40.0, 120.0, 'b01'),
        |         (100.0, 250.0, 'b02'), (200.0, 480.0, 'b03'),
        |         (450.0, 500.1, 'b04'))
        |SELECT band, CAST(count(*) AS BIGINT) AS n_events,
        |       min(e.event_id) AS min_event, max(e.event_id) AS max_event
        |FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
        |GROUP BY band ORDER BY band""".stripMargin,

    "q78_shuffle_order" ->
      """SELECT doc_id,
        |  CAST(row_number() OVER (
        |    ORDER BY md5(doc_id || ':r8:shuffle'), doc_id) - 1 AS BIGINT)
        |    AS ord
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q79_length_percentiles" ->
      """SELECT source,
        |  quantile_cont(n_chars, 0.5) AS p50,
        |  quantile_cont(n_chars, 0.9) AS p90,
        |  TRUE AS p50_ok, TRUE AS p90_ok
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    "q80_cms_heavyhitters" ->
      """SELECT tok, n_occ, TRUE AS never_under, TRUE AS within_bound
        |FROM (
        |  SELECT tok, CAST(count(*) AS BIGINT) AS n_occ
        |  FROM (SELECT unnest(string_split(text, ' ')) AS tok
        |        FROM documents)
        |  GROUP BY tok ORDER BY n_occ DESC, tok LIMIT 20)
        |ORDER BY tok""".stripMargin,

    "q82_semantic_decon" ->
      """SELECT vec_id FROM embeddings
        |WHERE vec_id >= 5 AND vec_id < 500
        |ORDER BY vec_id""".stripMargin,

    // Left-join the char stats back onto the doc universe so a
    // zero-length document compares as (0,0,0,0.0) — matching the
    // Spark ByteStats kernel — instead of dropping the oracle row.
    "q96_byte_entropy" ->
      """WITH docs AS (
        |  SELECT doc_id FROM documents WHERE doc_id < 200),
        |chars AS (
        |  SELECT doc_id, c
        |  FROM (SELECT doc_id, unnest(string_split_regex(text, ''))
        |          AS c
        |        FROM documents WHERE doc_id < 200)
        |  WHERE c <> ''),
        |stats AS (
        |  SELECT doc_id,
        |    CAST(count(*) AS BIGINT) AS n_bytes,
        |    CAST(count(DISTINCT c) AS BIGINT) AS n_distinct,
        |    CAST(max(cnt) AS BIGINT) AS top_count,
        |    round(entropy, 6) AS entropy_r
        |  FROM (
        |    SELECT doc_id, c, count(*) OVER (PARTITION BY doc_id, c)
        |      AS cnt, entropy(c) OVER (PARTITION BY doc_id) AS entropy
        |    FROM chars)
        |  GROUP BY doc_id, entropy)
        |SELECT d.doc_id,
        |  CAST(coalesce(s.n_bytes, 0) AS BIGINT) AS n_bytes,
        |  CAST(coalesce(s.n_distinct, 0) AS BIGINT) AS n_distinct,
        |  CAST(coalesce(s.top_count, 0) AS BIGINT) AS top_count,
        |  CAST(coalesce(s.entropy_r, 0.0) AS DOUBLE) AS entropy_r
        |FROM docs d LEFT JOIN stats s USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    "q95_catalog_stats" ->
      """WITH chunks AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(1, length(text) + 1, 64),
        |      s -> md5(substr(text, s, 64)))) AS hash
        |  FROM documents WHERE doc_id < 200),
        |l AS (SELECT hash, count(*) AS refs FROM chunks GROUP BY hash)
        |SELECT CAST(1 AS BIGINT) AS version, CAST(1 AS BIGINT) AS n_files,
        |       CAST(count(*) AS BIGINT) AS n_links,
        |       CAST(sum(refs) AS BIGINT) AS sum_refs,
        |       CAST(sum(CASE WHEN refs > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_dup_links
        |FROM l""".stripMargin,

    "q94_event_funnel" ->
      """WITH s AS (
        |  SELECT user_id, min(epoch_us(ts)) AS signup_us
        |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
        |p AS (
        |  SELECT user_id, epoch_us(ts) AS pus
        |  FROM events WHERE event_type = 'purchase')
        |SELECT s.user_id, s.signup_us,
        |  min(CASE WHEN p.pus >= s.signup_us THEN p.pus END)
        |    AS first_purchase_us,
        |  coalesce(min(CASE WHEN p.pus >= s.signup_us THEN p.pus END)
        |    <= s.signup_us + 604800000000, FALSE) AS converted_7d
        |FROM s LEFT JOIN p USING (user_id)
        |GROUP BY s.user_id, s.signup_us
        |ORDER BY s.user_id""".stripMargin,

    "q93_canonical_dedup" ->
      """WITH originals AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id < 100 THEN text || chr(233) ELSE text END
        |      AS text
        |  FROM documents),
        |copies AS (
        |  SELECT doc_id + 20000 AS doc_id,
        |    upper(substr(text, 1, 1)) ||
        |      replace(substr(text, 2), ' ', '  ') ||
        |      'e' || chr(769) AS text
        |  FROM documents WHERE doc_id < 100),
        |corpus AS (
        |  SELECT * FROM originals UNION ALL SELECT * FROM copies),
        |k AS (
        |  SELECT min(doc_id) AS doc_id
        |  FROM (SELECT doc_id,
        |          md5(nfc_normalize(trim(regexp_replace(lower(text),
        |            '\s+', ' ', 'g')))) AS ck
        |        FROM corpus)
        |  GROUP BY ck)
        |SELECT doc_id FROM k ORDER BY doc_id""".stripMargin,

    "q92_pack_slices" ->
      """WITH t AS (
        |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT)
        |    AS tok
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, tok,
        |    CAST(coalesce(sum(tok) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS s
        |  FROM t),
        |x AS (
        |  SELECT doc_id, tok, s,
        |    unnest(range(s // 512, (s + tok - 1) // 512 + 1)) AS win
        |  FROM c WHERE tok > 0)
        |SELECT doc_id, win,
        |  greatest(s, win * 512) - s AS off_in_doc,
        |  greatest(s, win * 512) - win * 512 AS off_in_window,
        |  least(s + tok, (win + 1) * 512) - greatest(s, win * 512)
        |    AS n_toks
        |FROM x ORDER BY doc_id, win""".stripMargin,

    "q91_quality_quartiles" ->
      """WITH f AS (
        |  SELECT doc_id, source,
        |    CAST(length(text) AS DOUBLE) AS n_chars,
        |    CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tok,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      x -> x IN ('the','a','of','and','is','el','la','de','que',
        |                 'es','der','die','das','und','ist','le','la',
        |                 'les','et','est'))) AS DOUBLE) AS n_stop,
        |    CAST(len(regexp_extract_all(text, '[.,!?]')) AS DOUBLE)
        |      AS n_punct
        |  FROM documents),
        |scored AS (
        |  SELECT doc_id, source,
        |    least(n_chars / 200.0, 1.0) * 0.4
        |    + (CASE WHEN n_chars / greatest(n_tok, 1.0)
        |              BETWEEN 3.0 AND 12.0
        |            THEN 1.0 ELSE 0.3 END) * 0.3
        |    + (CASE WHEN n_punct > 0 THEN 1.0 ELSE 0.5 END) * 0.15
        |    + least(n_stop / greatest(n_tok, 1.0) * 5.0, 1.0) * 0.15
        |      AS q
        |  FROM f),
        |b AS (
        |  SELECT source,
        |    CAST(ntile(4) OVER (PARTITION BY source ORDER BY q, doc_id)
        |      AS BIGINT) AS quartile,
        |    doc_id
        |  FROM scored)
        |SELECT source, quartile, CAST(count(*) AS BIGINT) AS n,
        |       min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM b GROUP BY source, quartile
        |ORDER BY source, quartile""".stripMargin,

    "q90_nfc_normalize" ->
      """SELECT doc_id,
        |  md5(nfc_normalize(text ||
        |    CASE WHEN doc_id % 2 = 0 THEN chr(233)
        |         ELSE 'e' || chr(769) END)) AS fp
        |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin,

    "q89_zorder_box" ->
      """SELECT event_id, user_id,
        |  CAST((epoch_us(ts) % 86400000000) // 3600000000 AS BIGINT)
        |    AS hr
        |FROM events
        |WHERE user_id % 256 BETWEEN 30 AND 60
        |  AND (epoch_us(ts) % 86400000000) // 3600000000 BETWEEN 5 AND 15
        |ORDER BY event_id""".stripMargin,

    "q87_salted_join" ->
      """WITH dim(event_type, wt) AS (
        |  VALUES ('click', 1), ('error', 10), ('purchase', 5),
        |         ('signup', 2), ('view', 1))
        |SELECT e.event_type, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(d.wt) AS BIGINT) AS sum_wt,
        |       min(e.event_id) AS min_id
        |FROM events e JOIN dim d USING (event_type)
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,

    "q88_pipeline_mix_order" -> {
      val Seq(c1, c2) = graft.ext.CorpusPrep.splitCuts(splitFractions)
      val u13 = sqlHashUnit16("d.doc_id", "p2", 13)
      val u1 = sqlHashUnit16("doc_id", "p2", 1)
      s"""WITH corpus AS (
         |  SELECT doc_id, text,
         |    CASE WHEN doc_id % 4 = 0 THEN 'rare' ELSE 'common' END
         |      AS source
         |  FROM (SELECT doc_id, text FROM documents
         |        UNION ALL
         |        SELECT doc_id + 10000, text FROM documents
         |        WHERE doc_id < 100)),
         |keep AS (
         |  SELECT min(doc_id) AS doc_id FROM corpus GROUP BY md5(text)),
         |deduped AS (
         |  SELECT d.doc_id, d.source FROM corpus d JOIN keep USING (doc_id)),
         |c AS (SELECT source, CAST(count(*) AS BIGINT) AS n
         |      FROM deduped GROUP BY source),
         |m AS (SELECT min(n) AS n_min FROM c),
         |t AS (SELECT source,
         |        CAST(floor(sqrt(CAST(n_min AS DOUBLE) / CAST(n AS DOUBLE))
         |          * 65536.0) AS INT) AS thr
         |      FROM c, m),
         |sampled AS (
         |  SELECT d.doc_id, d.source FROM deduped d JOIN t USING (source)
         |  WHERE $u13 < t.thr),
         |final AS (
         |  SELECT doc_id, source,
         |    CASE WHEN $u1 < $c1 THEN 'train'
         |         WHEN $u1 < $c2 THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM sampled)
         |SELECT doc_id, source, split,
         |  CAST(row_number() OVER (
         |    ORDER BY md5(doc_id || ':p2:shuffle'), doc_id) - 1 AS BIGINT)
         |    AS ord
         |FROM final ORDER BY doc_id""".stripMargin
    },

    "q85_catalog_time_travel" ->
      """WITH chunks AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(1, length(text) + 1, 64),
        |      s -> md5(substr(text, s, 64)))) AS hash
        |  FROM documents WHERE doc_id < 200),
        |e AS (SELECT * FROM chunks WHERE doc_id % 2 = 0)
        |SELECT CAST(1 AS BIGINT) AS ver,
        |       CAST(count(DISTINCT hash) AS BIGINT) AS n_links,
        |       CAST(count(*) AS BIGINT) AS sum_refs
        |FROM e
        |UNION ALL
        |SELECT CAST(2 AS BIGINT),
        |       CAST(count(DISTINCT hash) AS BIGINT),
        |       CAST(count(*) AS BIGINT)
        |FROM chunks
        |ORDER BY ver""".stripMargin,

    "q86_multimodal_resize" ->
      """SELECT doc_id, CAST(5 AS INT) AS width, CAST(4 AS INT) AS height,
        |       TRUE AS ok, TRUE AS gray_ok
        |FROM documents WHERE doc_id < 60 ORDER BY doc_id""".stripMargin,

    "q83_cube_events" ->
      """WITH e AS (
        |  SELECT event_type,
        |    CAST((epoch_us(ts) % 86400000000) // 3600000000 AS BIGINT)
        |      AS hr
        |  FROM events)
        |SELECT coalesce(event_type, 'ALL') AS et,
        |       coalesce(CAST(hr AS VARCHAR), 'ALL') AS hr_s,
        |       CAST(count(*) AS BIGINT) AS n,
        |       GROUPING(event_type, hr) AS gid
        |FROM e GROUP BY CUBE (event_type, hr)
        |ORDER BY gid, et, hr_s""".stripMargin,

    "q84_pivot_events" ->
      """SELECT user_id,
        |  CAST(count(*) FILTER (event_type = 'click') AS BIGINT)
        |    AS click,
        |  CAST(count(*) FILTER (event_type = 'error') AS BIGINT)
        |    AS error,
        |  CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT)
        |    AS purchase,
        |  CAST(count(*) FILTER (event_type = 'signup') AS BIGINT)
        |    AS signup,
        |  CAST(count(*) FILTER (event_type = 'view') AS BIGINT)
        |    AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q81_temperature_mix" -> {
      val u = sqlHashUnit16("d.doc_id", "r8t", 13)
      s"""WITH c AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS n_total
         |  FROM documents GROUP BY source),
         |m AS (SELECT min(n_total) AS n_min FROM c),
         |t AS (
         |  SELECT source, n_total,
         |    CAST(floor(sqrt(CAST(n_min AS DOUBLE) / CAST(n_total AS DOUBLE))
         |      * 65536.0) AS INT) AS thr
         |  FROM c, m),
         |k AS (
         |  SELECT d.source, count(*) AS n_kept
         |  FROM documents d JOIN t USING (source)
         |  WHERE $u < t.thr
         |  GROUP BY d.source)
         |SELECT t.source, t.n_total,
         |       CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept
         |FROM t LEFT JOIN k USING (source) ORDER BY source""".stripMargin
    },

    "q73_corpus_diff" ->
      """WITH old AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 0),
        |new_v AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END
        |      AS text
        |  FROM documents WHERE doc_id % 7 <> 0)
        |SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
        |  CASE WHEN o.doc_id IS NULL THEN 'added'
        |       WHEN n.doc_id IS NULL THEN 'removed'
        |       WHEN md5(o.text) = md5(n.text) THEN 'unchanged'
        |       ELSE 'changed' END AS status
        |FROM old o FULL OUTER JOIN new_v n ON o.doc_id = n.doc_id
        |ORDER BY doc_id""".stripMargin,

    "q72_source_overlap" ->
      """WITH ch AS (
        |  SELECT DISTINCT source, hash FROM (
        |    SELECT source,
        |      unnest(list_transform(range(1, length(text) + 1, 64),
        |        s -> md5(substr(text, s, 64)))) AS hash
        |    FROM documents))
        |SELECT a.source AS src_a, b.source AS src_b,
        |  CAST(count(*) AS BIGINT) AS n_shared
        |FROM ch a JOIN ch b USING (hash)
        |WHERE a.source <= b.source
        |GROUP BY src_a, src_b
        |ORDER BY src_a, src_b""".stripMargin,

    "q71_tfidf" ->
      """WITH tf AS (
        |  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |        FROM documents)
        |  GROUP BY doc_id, tok),
        |df AS (SELECT tok, CAST(count(*) AS BIGINT) AS df
        |       FROM tf GROUP BY tok),
        |n AS (SELECT count(*) AS n_docs FROM documents)
        |SELECT doc_id, tok, tf, df,
        |  CAST(tf AS DOUBLE) * ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE))
        |    AS tfidf
        |FROM tf JOIN df USING (tok), n
        |ORDER BY doc_id, tok""".stripMargin,

    "q70_catalog_bloom" ->
      """WITH chunks AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(1, length(text) + 1, 64),
        |      s -> md5(substr(text, s, 64)))) AS hash
        |  FROM documents),
        |probe AS (SELECT DISTINCT hash FROM chunks),
        |member AS (SELECT DISTINCT hash FROM chunks WHERE doc_id < 200)
        |SELECT
        |  CAST((SELECT count(*) FROM probe) AS BIGINT) AS n_probe,
        |  CAST((SELECT count(*) FROM probe
        |        WHERE hash IN (SELECT hash FROM member)) AS BIGINT)
        |    AS n_member,
        |  TRUE AS members_all_flagged,
        |  TRUE AS fpr_within_bound""".stripMargin,

    "q69_vocabulary" ->
      """SELECT tok, CAST(count(*) AS BIGINT) AS n_occ,
        |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
        |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |      FROM documents)
        |GROUP BY tok ORDER BY n_occ DESC, tok LIMIT 50""".stripMargin,

    "q68_semdedup_planted" ->
      """SELECT vec_id FROM embeddings WHERE vec_id < 50
        |ORDER BY vec_id""".stripMargin,

    "q67_bloom_membership" ->
      """WITH fp AS (
        |  SELECT doc_id,
        |    md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS f
        |  FROM documents),
        |seen AS (SELECT DISTINCT f FROM fp WHERE doc_id % 2 = 0)
        |SELECT
        |  CAST((SELECT count(*) FROM fp
        |        WHERE f IN (SELECT f FROM seen)) AS BIGINT) AS n_members,
        |  TRUE AS members_all_flagged,
        |  TRUE AS fpr_within_bound""".stripMargin,

    "q37_dedup_planted" ->
      """WITH planted AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 1000000 AS doc_id, text FROM documents)
        |SELECT doc_id, md5(text) AS text_hash FROM planted
        |WHERE doc_id IN (SELECT min(doc_id) FROM planted GROUP BY md5(text))
        |ORDER BY doc_id""".stripMargin,

    "q38_dedup_planted_report" ->
      """WITH planted AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 1000000 AS doc_id, text FROM documents)
        |SELECT md5(text) AS text_hash, count(*) AS refs_num,
        |       min(doc_id) AS first_id
        |FROM planted GROUP BY 1 HAVING count(*) > 1
        |ORDER BY refs_num DESC, text_hash""".stripMargin,

    "q39_catalog_merge" ->
      """WITH chunks AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(1, length(text) + 1, 64),
        |      s -> {'pos': CAST((s - 1) // 64 AS BIGINT),
        |            'chunk': substr(text, s, 64)})) AS rec
        |  FROM documents),
        |c AS (SELECT doc_id, md5(rec.chunk) AS hash,
        |             doc_id * 1000000 + rec.pos AS gl FROM chunks),
        |r1 AS (SELECT hash, min(gl) AS line, count(*) AS refs FROM c
        |       WHERE doc_id % 2 = 0 GROUP BY 1),
        |r2 AS (SELECT hash, min(gl) AS line, count(*) AS refs FROM c
        |       WHERE doc_id % 2 = 1 GROUP BY 1)
        |SELECT coalesce(r1.hash, r2.hash) AS hash,
        |       CAST(CASE WHEN r1.hash IS NOT NULL THEN 1 ELSE 2 END AS BIGINT)
        |         AS file_id,
        |       CASE WHEN r1.hash IS NOT NULL THEN r1.line ELSE r2.line END
        |         AS line,
        |       coalesce(r1.refs, 0) + coalesce(r2.refs, 0) AS refs_num
        |FROM r1 FULL OUTER JOIN r2 ON r1.hash = r2.hash
        |ORDER BY hash""".stripMargin,

    "q40_lsh_recall_text" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |  WHERE doc_id < 1000),
        |sh AS (
        |  SELECT DISTINCT doc_id AS id,
        |    unnest(list_transform(range(1, greatest(len(t) - 1, 0) + 1),
        |           i -> t[i] || ' ' || t[i + 1])) AS shingle
        |  FROM toks),
        |cnt AS (SELECT id, count(*) AS n FROM sh GROUP BY 1),
        |cand AS (
        |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS common
        |  FROM sh a JOIN sh b USING (shingle)
        |  WHERE a.id < b.id GROUP BY 1, 2),
        |pairs AS (
        |  SELECT c.id_a FROM cand c
        |  JOIN cnt ca ON ca.id = c.id_a
        |  JOIN cnt cb ON cb.id = c.id_b
        |  WHERE 10 * c.common >= 7 * (ca.n + cb.n - c.common))
        |SELECT count(*) AS n_exact, count(*) AS n_found,
        |       CAST(0 AS BIGINT) AS n_extra
        |FROM pairs""".stripMargin,

    "q41_ann_planted_neardup" ->
      """WITH av AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL SELECT vec_id + 1000000 AS vec_id, embedding
        |            FROM embeddings)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |FROM av a JOIN av b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.9
        |ORDER BY id_a, id_b""".stripMargin,

    // q43/q44: the planted-cluster construction makes per-query recall
    // provably 9/9 (see the query comments) — DuckDB predicts the
    // constant row per query, the q46 arithmetic-prediction pattern.
    "q43_ann_recall" ->
      """SELECT vec_id AS query_id, CAST(9 AS BIGINT) AS n_exact,
        |       CAST(9 AS BIGINT) AS n_found
        |FROM embeddings WHERE vec_id < 5 ORDER BY query_id""".stripMargin,

    "q44_ann_ivf_recall" ->
      """SELECT vec_id AS query_id, CAST(9 AS BIGINT) AS n_exact,
        |       CAST(9 AS BIGINT) AS n_found
        |FROM embeddings WHERE vec_id < 5 ORDER BY query_id""".stripMargin,

    // planted clones share all PQ codes -> deterministic full recall
    "q152_ann_pq_recall" ->
      """SELECT vec_id AS query_id, CAST(9 AS BIGINT) AS n_exact,
        |       CAST(9 AS BIGINT) AS n_found
        |FROM embeddings WHERE vec_id < 5 ORDER BY query_id""".stripMargin,

    // clones share cell and codes -> full recall through the composed
    // pruned path
    "q153_ann_ivfpq_index_planted" ->
      """SELECT vec_id AS query_id, CAST(9 AS BIGINT) AS n_exact,
        |       CAST(9 AS BIGINT) AS n_found
        |FROM embeddings WHERE vec_id < 5 ORDER BY query_id""".stripMargin,

    // every output column restated as string arithmetic from the
    // fixture formulas; the record's Content-Length for responses is
    // the HTTP head (52 + len(ctype) + len(digits(blen))) + body; the
    // oracle is gzip-mode-independent (mode is doc_id%2 on the Spark
    // side only)
    "q154_warc_extract" ->
      """WITH d AS (
        |  SELECT doc_id, 3 + doc_id % 5 AS n FROM documents
        |  WHERE doc_id < 200 AND doc_id % 47 != 0 AND doc_id % 43 != 0),
        |r AS (
        |  SELECT d.doc_id, j.j AS rec_idx FROM d,
        |       generate_series(0, 7) AS j(j) WHERE j.j < d.n),
        |f AS (
        |  SELECT doc_id, rec_idx,
        |    CASE WHEN rec_idx = 0 THEN 'warcinfo'
        |         WHEN rec_idx % 2 = 1 THEN 'request'
        |         ELSE 'response' END AS warc_type,
        |    5 + (doc_id * 3 + rec_idx * 11) % 40 AS blen,
        |    chr(97 + CAST((doc_id + rec_idx) % 26 AS INTEGER)) AS ch,
        |    CASE (doc_id * 7 + rec_idx) % 4 WHEN 0 THEN 200
        |         WHEN 1 THEN 301 WHEN 2 THEN 404 ELSE 503 END AS status,
        |    CASE WHEN (doc_id + rec_idx) % 2 = 0
        |         THEN 'text/html' ELSE 'text/plain' END AS ctype,
        |    chr(13) || chr(10) AS crlf
        |  FROM r)
        |SELECT doc_id, CAST(rec_idx AS INTEGER) AS rec_idx, warc_type,
        |  CASE WHEN rec_idx = 0 THEN NULL
        |       ELSE 'http://ex.com/' || doc_id || '/' || rec_idx
        |  END AS target_uri,
        |  CAST(CASE
        |    WHEN rec_idx = 0 THEN 16 + length(CAST(doc_id AS VARCHAR))
        |    WHEN rec_idx % 2 = 1 THEN
        |      length('GET /' || doc_id || '/' || rec_idx || ' HTTP/1.1')
        |        + 2 + length('Host: ex.com') + 4
        |    ELSE 52 + length(ctype) + length(CAST(blen AS VARCHAR)) + blen
        |  END AS INTEGER) AS content_len,
        |  CAST(CASE WHEN warc_type = 'response' THEN status END
        |       AS INTEGER) AS http_status,
        |  CASE WHEN warc_type = 'response' THEN ctype END AS http_ctype,
        |  CASE
        |    WHEN rec_idx = 0 THEN 'software: graft ' || doc_id
        |    WHEN rec_idx % 2 = 1 THEN
        |      'GET /' || doc_id || '/' || rec_idx || ' HTTP/1.1' || crlf
        |        || 'Host: ex.com' || crlf || crlf
        |    ELSE repeat(ch, blen)
        |  END AS body_str
        |FROM f ORDER BY doc_id, rec_idx""".stripMargin,

    // the published MPEG bitrate/sample-rate tables as list literals;
    // frame_bytes = (144|72)·br·1000 // sr + pad (Layer I absent from
    // the fixture classes); offset = id3v2 length + running sum of
    // preceding frame sizes — a wrong table or size formula breaks
    // every subsequent offset
    "q155_mp3_frames" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id % 3 AS cls, 4 + doc_id % 5 AS nf,
        |         15 + doc_id % 50 AS id3
        |  FROM documents
        |  WHERE doc_id < 200 AND doc_id % 41 != 0 AND doc_id % 37 != 0),
        |f AS (
        |  SELECT d.doc_id, d.cls, d.id3, j.j AS frame_idx,
        |         1 + CAST((d.doc_id * 5 + j.j * 3) % 14 AS INTEGER) AS bidx,
        |         CAST((d.doc_id + j.j) % 3 AS INTEGER) AS sidx,
        |         CAST((d.doc_id + j.j) % 2 AS INTEGER) AS pad,
        |         CAST((d.doc_id + j.j) % 4 AS INTEGER) AS mode,
        |         1 + (d.doc_id * 7 + j.j * 13) % 200 AS fill
        |  FROM d, generate_series(0, 8) AS j(j) WHERE j.j < d.nf),
        |g AS (
        |  SELECT doc_id, frame_idx, id3, pad, mode, fill,
        |    CASE cls WHEN 0 THEN 3 WHEN 1 THEN 3 ELSE 2 END AS version_id,
        |    CASE cls WHEN 0 THEN 3 WHEN 1 THEN 2 ELSE 3 END AS layer,
        |    CASE cls
        |      WHEN 0 THEN ([32,40,48,56,64,80,96,112,128,160,192,224,256,320])[bidx]
        |      WHEN 1 THEN ([32,48,56,64,80,96,112,128,160,192,224,256,320,384])[bidx]
        |      ELSE ([8,16,24,32,40,48,56,64,80,96,112,128,144,160])[bidx]
        |    END AS br,
        |    CASE WHEN cls = 2 THEN ([22050,24000,16000])[sidx + 1]
        |         ELSE ([44100,48000,32000])[sidx + 1] END AS sr,
        |    CASE WHEN cls = 2 THEN 72 ELSE 144 END AS factor,
        |    CASE WHEN cls = 2 THEN 576 ELSE 1152 END AS spf
        |  FROM f),
        |h AS (
        |  SELECT *, CAST(factor * br * 1000 // sr + pad AS INTEGER)
        |              AS frame_bytes
        |  FROM g)
        |SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
        |  CAST(id3 + COALESCE(SUM(frame_bytes) OVER (
        |         PARTITION BY doc_id ORDER BY frame_idx
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |       AS BIGINT) AS "offset",
        |  CAST(version_id AS INTEGER) AS version_id,
        |  CAST(layer AS INTEGER) AS layer,
        |  CAST(br AS INTEGER) AS bitrate_kbps,
        |  CAST(sr AS INTEGER) AS sample_rate,
        |  pad AS padding, mode AS channel_mode, frame_bytes,
        |  CAST(spf AS INTEGER) AS spf,
        |  CAST((frame_bytes - 4) * fill AS BIGINT) AS payload_sum
        |FROM h ORDER BY doc_id, frame_idx""".stripMargin,

    // the pair set is pure planted structure: within-class pairs of
    // block-carrying docs; the shared header is capped out, filler is
    // doc-unique by construction
    "q156_winnow_substring" ->
      """WITH d AS (
        |  SELECT doc_id FROM documents
        |  WHERE doc_id < 150 AND doc_id % 3 = 0)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       CAST(true AS BOOLEAN) AS matched
        |FROM d a, d b
        |WHERE a.doc_id < b.doc_id AND a.doc_id % 10 = b.doc_id % 10
        |ORDER BY id_a, id_b""".stripMargin,

    // container-mode-independent sample arithmetic (the q146
    // discipline): ts = cluster base + signed relative, sizes/fills
    // from the fixture formulas, scale from the Info element
    "q157_webm_samples" ->
      """WITH d AS (
        |  SELECT doc_id, 1 + (doc_id // 3) % 3 AS nt,
        |         2 + doc_id % 3 AS nclu
        |  FROM documents
        |  WHERE doc_id < 200 AND doc_id % 41 != 0 AND doc_id % 37 != 0),
        |s AS (
        |  SELECT d.doc_id, t.t AS trk, c.c AS clu
        |  FROM d, generate_series(1, 3) AS t(t),
        |       generate_series(0, 4) AS c(c)
        |  WHERE t.t <= d.nt AND c.c < d.nclu)
        |SELECT doc_id, CAST(trk AS BIGINT) AS track_id,
        |  CAST(CASE WHEN trk % 2 = 1 THEN 1 ELSE 2 END AS INTEGER)
        |    AS track_type,
        |  CASE WHEN trk % 2 = 1 THEN 'V_TEST' || trk
        |       ELSE 'A_TEST' || trk END AS codec_id,
        |  CAST(clu AS INTEGER) AS sample_idx,
        |  CAST(clu * 1000 + (doc_id % 7) * 10 + 10 * trk + clu AS BIGINT)
        |    AS ts_ticks,
        |  CAST(1000000 * CASE WHEN doc_id % 5 = 4 THEN 2 ELSE 1 END
        |       AS BIGINT) AS ts_scale,
        |  CAST((trk + clu) % 2 = 0 AS BOOLEAN) AS is_key,
        |  CAST(8 + (trk * 7 + clu * 5 + doc_id) % 9 AS INTEGER)
        |    AS sample_size,
        |  CAST((8 + (trk * 7 + clu * 5 + doc_id) % 9)
        |       * ((trk * 31 + clu * 17 + doc_id) % 251) AS BIGINT)
        |    AS payload_sum
        |FROM s ORDER BY doc_id, track_id, sample_idx""".stripMargin,

    // CONSTANT frame sums are per-channel closed forms; VERBATIM sums
    // expand the full (channel, sample) grid — the oracle re-adds
    // every decoded sample the bit-walk must reproduce
    "q173_flac_frames" ->
      """WITH d AS (
        |  SELECT doc_id, 2 + doc_id % 3 AS nf, 1 + doc_id % 3 AS nch,
        |         CASE WHEN doc_id % 2 = 0 THEN 16 ELSE 8 END AS bps,
        |         8000 * (1 + doc_id % 5) AS rate
        |  FROM documents
        |  WHERE doc_id < 150 AND doc_id % 41 != 0 AND doc_id % 37 != 0),
        |fr AS (SELECT d.*, unnest(range(0, nf)) AS fi FROM d),
        |chs AS (SELECT fr.*, unnest(range(0, nch)) AS c FROM fr),
        |con AS (
        |  SELECT doc_id, fi,
        |         ((doc_id*7 + fi*13 + c*31) % 200 - 100) * 256 AS v
        |  FROM chs WHERE fi % 2 = 0),
        |ver AS (
        |  SELECT doc_id, fi,
        |         (doc_id + fi*3 + c*5 + t.sx*11) % 200 - 100 AS v
        |  FROM chs, range(0, 256) AS t(sx) WHERE fi % 2 = 1),
        |sums AS (
        |  SELECT doc_id, fi, SUM(v) AS ssum
        |  FROM (SELECT * FROM con UNION ALL SELECT * FROM ver)
        |  GROUP BY doc_id, fi)
        |SELECT fr.doc_id, fi AS frame_idx,
        |       fi * 256 AS first_sample,
        |       CAST(256 AS INTEGER) AS block_size,
        |       CAST(fr.nch AS INTEGER) AS n_channels,
        |       CAST(fr.bps AS INTEGER) AS bps,
        |       CAST(fr.rate AS BIGINT) AS sample_rate,
        |       CAST(sums.ssum AS BIGINT) AS sample_sum
        |FROM fr JOIN sums USING (doc_id, fi)
        |ORDER BY doc_id, frame_idx""".stripMargin,

    // per-doc unit counts and payload sums by each family's formula;
    // the family itself is doc_id % 3
    "q191_mixed_archive_triage" ->
      """WITH d AS (
        |  SELECT doc_id FROM documents
        |  WHERE doc_id < 150 AND doc_id % 41 != 0),
        |ts AS (
        |  SELECT doc_id, unnest(range(0, 2 + doc_id % 3)) AS j
        |  FROM d WHERE doc_id % 3 = 0),
        |tc AS (
        |  SELECT doc_id, j, 0 AS e FROM ts
        |  UNION ALL SELECT doc_id, j, 1 FROM ts WHERE (doc_id + j) % 2 = 0
        |  UNION ALL SELECT doc_id, j, 2 FROM ts WHERE (doc_id + j) % 3 = 0),
        |tarc AS (
        |  SELECT doc_id, 'tar' AS format, COUNT(*) AS n_units,
        |    CAST(SUM((10 + (13*doc_id + 7*j + 3*e) % 200)
        |      * ((doc_id + 31*j + 17*e) % 251)) AS BIGINT) AS payload_sum
        |  FROM tc GROUP BY doc_id),
        |zs AS (
        |  SELECT doc_id, unnest(range(0, 2 + doc_id % 3)) AS k
        |  FROM d WHERE doc_id % 3 = 1),
        |zipc AS (
        |  SELECT doc_id, 'zip' AS format, COUNT(*) AS n_units,
        |    CAST(SUM((20 + (doc_id*11 + k*7) % 300)
        |      * ((doc_id + k*13) % 251)) AS BIGINT) AS payload_sum
        |  FROM zs GROUP BY doc_id),
        |fs AS (
        |  SELECT doc_id, unnest(range(0, 2 + doc_id % 4)) AS k
        |  FROM d WHERE doc_id % 3 = 2),
        |tfc AS (
        |  SELECT doc_id, 'tfrecord' AS format, COUNT(*) AS n_units,
        |    CAST(SUM((15 + (doc_id*9 + k*17) % 400)
        |      * ((doc_id + k*29) % 251)) AS BIGINT) AS payload_sum
        |  FROM fs GROUP BY doc_id)
        |SELECT * FROM (
        |  SELECT * FROM tarc UNION ALL SELECT * FROM zipc
        |  UNION ALL SELECT * FROM tfc)
        |ORDER BY doc_id""".stripMargin,

    // format is a pure function of doc_id % 16; empties stay 'empty'
    "q190_format_sniff" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 41 = 0 THEN 'empty' ELSE
        |    CASE CAST(doc_id % 16 AS INTEGER)
        |      WHEN 0 THEN 'tar' WHEN 1 THEN 'zip' WHEN 2 THEN 'flac'
        |      WHEN 3 THEN 'ogg' WHEN 4 THEN 'webm' WHEN 5 THEN 'wav'
        |      WHEN 6 THEN 'png' WHEN 7 THEN 'jpeg' WHEN 8 THEN 'gif'
        |      WHEN 9 THEN 'webp' WHEN 10 THEN 'zstd' WHEN 11 THEN 'avro'
        |      WHEN 12 THEN 'gzip' WHEN 13 THEN 'mp3' WHEN 14 THEN 'warc'
        |      ELSE 'tfrecord' END END AS format
        |FROM documents WHERE doc_id < 200
        |ORDER BY doc_id""".stripMargin,

    // one sample per (doc, j) exactly as q170, under zip naming; the
    // dir entry contributes nothing
    "q188_zip_webdataset_group" ->
      """WITH d AS (
        |  SELECT doc_id FROM documents
        |  WHERE doc_id < 150 AND doc_id % 41 != 0 AND doc_id % 37 != 0),
        |s AS (
        |  SELECT doc_id, unnest(range(0, 2 + doc_id % 3)) AS j FROM d),
        |c AS (
        |  SELECT doc_id, j, 'txt' AS ext, 0 AS e FROM s
        |  UNION ALL
        |  SELECT doc_id, j, 'jpg', 1 FROM s WHERE (doc_id + j) % 2 = 0
        |  UNION ALL
        |  SELECT doc_id, j, 'json', 2 FROM s WHERE (doc_id + j) % 3 = 0)
        |SELECT doc_id,
        |  printf('shard%d/w%05d_%02d', CAST(doc_id % 5 AS INTEGER),
        |    CAST(doc_id AS INTEGER), CAST(j AS INTEGER)) AS sample_key,
        |  COUNT(*) AS n_components,
        |  string_agg(ext, ',' ORDER BY ext) AS exts,
        |  CAST(SUM(10 + (13*doc_id + 7*j + 3*e) % 200) AS BIGINT)
        |    AS total_bytes
        |FROM c GROUP BY doc_id, j ORDER BY doc_id, sample_key""".stripMargin,

    // in-class pairs share the full ordered transcript (2 + class%3
    // cues); times and formats differ per doc
    "q189_subtitle_shift_dedup" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id % 8 AS acls FROM documents
        |  WHERE doc_id < 120 AND doc_id % 41 != 0)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       CAST(2 + a.acls % 3 AS BIGINT) AS n_cues
        |FROM d a, d b
        |WHERE a.doc_id < b.doc_id AND a.acls = b.acls
        |ORDER BY id_a, id_b""".stripMargin,

    // geometry by formula; color_type 0 (gray) on even ids, 2 (RGB)
    // on odd; poisoned rows keep their typed reason
    "q187_png_chunks" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    doc_id % 41 = 0 AS empty_p, doc_id % 37 = 0 AS crc_p
        |  FROM documents WHERE doc_id < 150),
        |c AS (SELECT *, NOT empty_p AND NOT crc_p AS good FROM d)
        |SELECT doc_id,
        |  CASE WHEN good THEN CAST(8 + doc_id % 40 AS BIGINT) END AS width,
        |  CASE WHEN good THEN CAST(6 + doc_id % 30 AS BIGINT) END AS height,
        |  CASE WHEN good THEN CAST(8 AS INTEGER) END AS bit_depth,
        |  CASE WHEN good THEN
        |    CAST(CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 2 END AS INTEGER)
        |  END AS color_type,
        |  CASE WHEN good THEN CAST(0 AS INTEGER) END AS interlace,
        |  good AS ok,
        |  CASE WHEN empty_p THEN 'empty blob'
        |       WHEN crc_p THEN 'bad chunk crc' END AS error
        |FROM c ORDER BY doc_id""".stripMargin,

    // variant/geometry/flags/chunk counts by the id%4 style formula;
    // poisoned rows keep their typed reason
    "q186_webp_meta" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id % 4 AS style,
        |    doc_id % 41 = 0 AS empty_p, doc_id % 37 = 0 AS form_p
        |  FROM documents WHERE doc_id < 150),
        |c AS (SELECT *, NOT empty_p AND NOT form_p AS good FROM d)
        |SELECT doc_id,
        |  CASE WHEN good THEN
        |    CASE style WHEN 0 THEN 'vp8' WHEN 1 THEN 'vp8l'
        |               ELSE 'vp8x' END END AS variant,
        |  CASE WHEN good THEN CAST(16 + (doc_id*7) % 2000 AS BIGINT) END
        |    AS width,
        |  CASE WHEN good THEN CAST(9 + (doc_id*11) % 1500 AS BIGINT) END
        |    AS height,
        |  CASE WHEN good THEN style = 1 OR style = 3 END AS has_alpha,
        |  CASE WHEN good THEN style = 3 END AS has_animation,
        |  CASE WHEN good THEN
        |    CAST(CASE style WHEN 2 THEN 3 WHEN 3 THEN 2 ELSE 1 END
        |      AS INTEGER) END AS n_chunks,
        |  good AS ok,
        |  CASE WHEN empty_p THEN 'empty blob'
        |       WHEN form_p THEN 'not a webp form' END AS error
        |FROM c ORDER BY doc_id""".stripMargin,

    // in-class pairs share the decoded content (length 600 + 37·class);
    // wrappers (split point / checksum / fcs width / padding) differ
    "q185_zstd_wrapper_invariant_dedup" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id % 8 AS acls FROM documents
        |  WHERE doc_id < 120 AND doc_id % 41 != 0)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       CAST(600 + a.acls * 37 AS BIGINT) AS clen
        |FROM d a, d b
        |WHERE a.doc_id < b.doc_id AND a.acls = b.acls
        |ORDER BY id_a, id_b""".stripMargin,

    // zstd rows by formula with the skippable frame shifting indexes;
    // checksum_ok is true on even ids and NULL (absent) on odd
    "q184_zstd_frames" ->
      """WITH d AS (
        |  SELECT doc_id FROM documents
        |  WHERE doc_id < 150 AND doc_id % 41 != 0 AND doc_id % 37 != 0),
        |z AS (
        |  SELECT doc_id, unnest(range(0, 1 + doc_id % 3)) AS f FROM d),
        |zr AS (
        |  SELECT doc_id,
        |    CAST(f + CASE WHEN doc_id % 5 = 0 AND f >= 1 THEN 1 ELSE 0 END
        |      AS INTEGER) AS frame_idx,
        |    'zstd' AS kind,
        |    CAST(300 + (doc_id*7 + f*11) % 200
        |      + CASE WHEN (doc_id + f) % 2 = 0
        |             THEN 100 + (doc_id*3 + f) % 150 ELSE 0 END
        |      AS BIGINT) AS content_size,
        |    CAST((300 + (doc_id*7 + f*11) % 200) * ((doc_id + f) % 251)
        |      + CASE WHEN (doc_id + f) % 2 = 0
        |             THEN (100 + (doc_id*3 + f) % 150)
        |                  * ((doc_id + f*13) % 251) ELSE 0 END
        |      AS BIGINT) AS payload_sum,
        |    CAST(CASE WHEN (doc_id + f) % 2 = 0 THEN 2 ELSE 1 END
        |      AS INTEGER) AS n_blocks,
        |    CASE WHEN doc_id % 2 = 0 THEN true END AS checksum_ok
        |  FROM z),
        |sk AS (
        |  SELECT doc_id, CAST(1 AS INTEGER) AS frame_idx,
        |    'skippable' AS kind,
        |    CAST(20 + doc_id % 50 AS BIGINT) AS content_size,
        |    CAST((20 + doc_id % 50) * (doc_id % 251) AS BIGINT)
        |      AS payload_sum,
        |    CAST(0 AS INTEGER) AS n_blocks,
        |    CAST(NULL AS BOOLEAN) AS checksum_ok
        |  FROM d WHERE doc_id % 5 = 0)
        |SELECT * FROM (SELECT * FROM zr UNION ALL SELECT * FROM sk)
        |ORDER BY doc_id, frame_idx""".stripMargin,

    // cue times/text by formula, identical for both carriage formats
    "q183_subtitle_cues" ->
      """WITH d AS (
        |  SELECT doc_id FROM documents
        |  WHERE doc_id < 150 AND doc_id % 41 != 0 AND doc_id % 37 != 0),
        |c AS (
        |  SELECT doc_id, unnest(range(0, 2 + doc_id % 3)) AS cue FROM d)
        |SELECT doc_id, CAST(cue AS INTEGER) AS cue_idx,
        |  CAST(doc_id * 977 + cue * 90017 AS BIGINT) AS start_ms,
        |  CAST(doc_id * 977 + cue * 90017 + 500 + (doc_id + cue*7) % 2000
        |    AS BIGINT) AS end_ms,
        |  printf('cue %d of doc %d', CAST(cue AS INTEGER),
        |    CAST(doc_id AS INTEGER)) AS cue_text
        |FROM c ORDER BY doc_id, cue_idx""".stripMargin,

    // one row per (doc, record, field): field 1's occurrence count and
    // sum, field 2's total length, field 3/4's fixed-width values —
    // all pure formulas; %37 shards are CRC-poisoned
    "q182_tfrecord_proto_fields" ->
      """WITH d AS (
        |  SELECT doc_id FROM documents
        |  WHERE doc_id < 150 AND doc_id % 41 != 0 AND doc_id % 37 != 0),
        |r AS (
        |  SELECT doc_id, unnest(range(0, 2 + doc_id % 3)) AS k FROM d),
        |f AS (
        |  SELECT doc_id, k, 1 AS field_no, 0 AS wire_type,
        |    1 + (doc_id + k) % 2 AS n_occur,
        |    (1 + (doc_id + k) % 2) * (100 + (doc_id*7 + k*3) % 1000)
        |      AS value_sum
        |  FROM r
        |  UNION ALL
        |  SELECT doc_id, k, 2, 2, 1, 5 + (doc_id + k*11) % 50 FROM r
        |  UNION ALL
        |  SELECT doc_id, k, 3, 5, 1, (doc_id*13 + k) % 100000 FROM r
        |  UNION ALL
        |  SELECT doc_id, k, 4, 1, 1, doc_id*1000 + k FROM r
        |  WHERE (doc_id + k) % 3 = 0)
        |SELECT doc_id, CAST(k AS INTEGER) AS rec_idx,
        |  CAST(field_no AS INTEGER) AS field_no,
        |  CAST(wire_type AS INTEGER) AS wire_type,
        |  CAST(n_occur AS BIGINT) AS n_occur,
        |  CAST(value_sum AS BIGINT) AS value_sum
        |FROM f ORDER BY doc_id, rec_idx, field_no""".stripMargin,

    // three row classes restated exactly: typed errors (%41/%37),
    // exif-less quarantine (%3), and full metadata rows by formula
    "q181_jpeg_exif" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    doc_id % 41 = 0 AS empty_p, doc_id % 37 = 0 AS trunc_p,
        |    doc_id % 3 = 0 AS noexif
        |  FROM documents WHERE doc_id < 150),
        |c AS (
        |  SELECT *, NOT empty_p AND NOT trunc_p AND NOT noexif AS exif_ok
        |  FROM d)
        |SELECT doc_id,
        |  exif_ok AS has_exif,
        |  CASE WHEN exif_ok AND doc_id % 2 = 0 THEN true ELSE false END
        |    AS byte_order_le,
        |  CASE WHEN exif_ok THEN CAST(1 + doc_id % 8 AS INTEGER) END
        |    AS orientation,
        |  CASE WHEN exif_ok THEN CAST(100 + doc_id % 900 AS BIGINT) END
        |    AS width,
        |  CASE WHEN exif_ok THEN CAST(80 + doc_id % 700 AS BIGINT) END
        |    AS height,
        |  CASE WHEN exif_ok THEN CAST(3 + doc_id % 4 AS INTEGER) END
        |    AS n_entries,
        |  NOT empty_p AND NOT trunc_p AS ok,
        |  CASE WHEN empty_p THEN 'empty blob'
        |       WHEN trunc_p THEN 'truncated segment' END AS error
        |FROM c ORDER BY doc_id""".stripMargin,

    // block counts/sizes/fills are formula-determined and codec-
    // INDEPENDENT (usize is the decompressed size); %37 blobs are
    // sync-poisoned and contribute nothing
    "q180_avro_blocks" ->
      """WITH d AS (
        |  SELECT doc_id FROM documents
        |  WHERE doc_id < 150 AND doc_id % 41 != 0 AND doc_id % 37 != 0),
        |e AS (
        |  SELECT doc_id, unnest(range(0, 1 + doc_id % 3)) AS b FROM d)
        |SELECT doc_id, CAST(b AS INTEGER) AS block_idx,
        |  CAST(5 + (doc_id*3 + b*7) % 50 AS BIGINT) AS n_records,
        |  CAST(30 + (doc_id*13 + b*11) % 300 AS BIGINT) AS usize,
        |  CAST((30 + (doc_id*13 + b*11) % 300) * ((doc_id + b*19) % 251)
        |    AS BIGINT) AS payload_sum
        |FROM e ORDER BY doc_id, block_idx""".stripMargin,

    // record sizes/fills are formula-determined; %37 shards are
    // CRC-poisoned and contribute nothing
    "q179_tfrecord_records" ->
      """WITH d AS (
        |  SELECT doc_id FROM documents
        |  WHERE doc_id < 150 AND doc_id % 41 != 0 AND doc_id % 37 != 0),
        |e AS (
        |  SELECT doc_id, unnest(range(0, 2 + doc_id % 4)) AS k FROM d)
        |SELECT doc_id, CAST(k AS INTEGER) AS rec_idx,
        |  CAST(15 + (doc_id*9 + k*17) % 400 AS BIGINT) AS rsize,
        |  CAST((15 + (doc_id*9 + k*17) % 400) * ((doc_id + k*29) % 251)
        |    AS BIGINT) AS payload_sum
        |FROM e ORDER BY doc_id, rec_idx""".stripMargin,

    // shard a carries classes {a, a+1, a+2} mod 6: the overlap with
    // shard b is a pure function of (b - a) mod 6
    "q178_webdataset_image_dedup" ->
      """WITH d AS (
        |  SELECT doc_id FROM documents
        |  WHERE doc_id < 120 AND doc_id % 41 != 0 AND doc_id % 37 != 0)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(CASE (b.doc_id - a.doc_id) % 6
        |    WHEN 0 THEN 3 WHEN 1 THEN 2 WHEN 5 THEN 2
        |    WHEN 2 THEN 1 WHEN 4 THEN 1 END AS BIGINT) AS n_shared
        |FROM d a, d b
        |WHERE a.doc_id < b.doc_id AND (b.doc_id - a.doc_id) % 6 != 3
        |ORDER BY id_a, id_b""".stripMargin,

    // entry names/methods/sizes/fills are formula-determined; %37 docs
    // are CRC-poisoned and contribute nothing
    "q177_zip_entries" ->
      """WITH d AS (
        |  SELECT doc_id FROM documents
        |  WHERE doc_id < 150 AND doc_id % 41 != 0 AND doc_id % 37 != 0),
        |e AS (
        |  SELECT doc_id, unnest(range(0, 2 + doc_id % 3)) AS k FROM d)
        |SELECT doc_id, CAST(k AS INTEGER) AS entry_idx,
        |  printf('e%04d_%02d.dat', CAST(doc_id AS INTEGER),
        |    CAST(k AS INTEGER)) AS name,
        |  CAST(CASE WHEN (doc_id + k) % 2 = 0 THEN 0 ELSE 8 END
        |    AS INTEGER) AS method,
        |  CAST(20 + (doc_id*11 + k*7) % 300 AS BIGINT) AS usize,
        |  CAST((20 + (doc_id*11 + k*7) % 300) * ((doc_id + k*13) % 251)
        |    AS BIGINT) AS payload_sum
        |FROM e ORDER BY doc_id, entry_idx""".stripMargin,

    // deterministic by the fixture: every block doc (mod 3) is found
    // by a same-class probe through the index; the within pair exists;
    // twin matches span exactly the two probe batches
    "q176_streaming_cdcdup" ->
      """SELECT doc_id, CAST(doc_id % 3 = 0 AS BOOLEAN) AS found,
        |       CAST(true AS BOOLEAN) AS within_ok,
        |       CAST(2 AS BIGINT) AS n_twin_batches
        |FROM documents WHERE doc_id < 60
        |ORDER BY doc_id""".stripMargin,

    // every WAV doc pairs every FLAC doc of its class ((id//2) % 6);
    // class sums are distinct so no cross-class digest collides
    "q175_cross_format_audio_dedup" ->
      """WITH w AS (
        |  SELECT doc_id, (doc_id // 2) % 6 AS cls FROM documents
        |  WHERE doc_id < 120 AND doc_id % 41 != 0 AND doc_id % 2 = 0),
        |f AS (
        |  SELECT doc_id, (doc_id // 2) % 6 AS cls FROM documents
        |  WHERE doc_id < 120 AND doc_id % 41 != 0 AND doc_id % 2 = 1)
        |SELECT w.doc_id AS id_wav, f.doc_id AS id_flac,
        |       CAST(true AS BOOLEAN) AS matched
        |FROM w, f WHERE w.cls = f.cls
        |ORDER BY id_wav, id_flac""".stripMargin,

    // in-class pairs share the full frame stream (2 + class%3 frames);
    // the padding wrapper differs per doc
    "q174_flac_tag_invariant_dedup" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id % 8 AS acls FROM documents
        |  WHERE doc_id < 120 AND doc_id % 41 != 0)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       CAST(2 + a.acls % 3 AS BIGINT) AS n_frames
        |FROM d a, d b
        |WHERE a.doc_id < b.doc_id AND a.acls = b.acls
        |ORDER BY id_a, id_b""".stripMargin,

    // every probe pairs every same-class corpus doc (payload shared at
    // three different shifts: corpus-even, corpus-odd-appended, probe)
    "q172_cdc_index_planted" ->
      """WITH c AS (
        |  SELECT doc_id FROM documents
        |  WHERE doc_id < 120 AND doc_id % 41 != 0),
        |p AS (
        |  SELECT doc_id FROM documents
        |  WHERE doc_id >= 120 AND doc_id < 150 AND doc_id % 41 != 0)
        |SELECT p.doc_id AS id_a, c.doc_id AS id_b,
        |       CAST(true AS BOOLEAN) AS matched
        |FROM p, c WHERE p.doc_id % 10 = c.doc_id % 10
        |ORDER BY id_a, id_b""".stripMargin,

    // id-header fields restated by formula; the unknown stream keeps
    // its row with nulls (quarantine semantics)
    "q171_ogg_codec_id" ->
      """WITH d AS (
        |  SELECT doc_id FROM documents
        |  WHERE doc_id < 150 AND doc_id % 41 != 0)
        |SELECT doc_id, doc_id * 3 + 1 AS serial, 'opus' AS codec,
        |  CAST(1 + doc_id % 2 AS INTEGER) AS channels,
        |  CAST(48000 - (doc_id % 5) * 4000 AS BIGINT) AS sample_rate,
        |  CAST(100 + doc_id % 300 AS INTEGER) AS pre_skip
        |FROM d
        |UNION ALL
        |SELECT doc_id, doc_id * 3 + 2, 'vorbis',
        |  CAST(2 + doc_id % 4 AS INTEGER),
        |  CAST(44100 - (doc_id % 3) * 100 AS BIGINT), NULL
        |FROM d WHERE doc_id % 3 = 0
        |UNION ALL
        |SELECT doc_id, doc_id * 3 + 3, 'unknown', NULL, NULL, NULL
        |FROM d WHERE doc_id % 5 = 0
        |ORDER BY doc_id, serial""".stripMargin,

    // member names/sizes/fills are formula-determined; %37 docs are
    // checksum-poisoned (one flipped byte) and contribute nothing
    "q169_tar_members" ->
      """WITH d AS (
        |  SELECT doc_id FROM documents
        |  WHERE doc_id < 150 AND doc_id % 41 != 0 AND doc_id % 37 != 0),
        |s AS (
        |  SELECT doc_id, unnest(range(0, 2 + doc_id % 3)) AS j FROM d),
        |c AS (
        |  SELECT doc_id, j, 'txt' AS ext, 0 AS e FROM s
        |  UNION ALL
        |  SELECT doc_id, j, 'jpg', 1 FROM s WHERE (doc_id + j) % 2 = 0
        |  UNION ALL
        |  SELECT doc_id, j, 'json', 2 FROM s WHERE (doc_id + j) % 3 = 0)
        |SELECT doc_id,
        |  printf('shard%d/s%05d_%02d.%s', CAST(doc_id % 7 AS INTEGER),
        |    CAST(doc_id AS INTEGER), CAST(j AS INTEGER), ext) AS name,
        |  CAST(10 + (13*doc_id + 7*j + 3*e) % 200 AS BIGINT) AS msize,
        |  CAST((10 + (13*doc_id + 7*j + 3*e) % 200)
        |    * ((doc_id + 31*j + 17*e) % 251) AS BIGINT) AS payload_sum
        |FROM c ORDER BY doc_id, name""".stripMargin,

    // one sample per (doc, j); exts sorted lexicographically; the
    // checksum-poisoned %37 docs DO group (blob untouched here)
    "q170_webdataset_group" ->
      """WITH d AS (
        |  SELECT doc_id FROM documents
        |  WHERE doc_id < 150 AND doc_id % 41 != 0),
        |s AS (
        |  SELECT doc_id, unnest(range(0, 2 + doc_id % 3)) AS j FROM d),
        |c AS (
        |  SELECT doc_id, j, 'txt' AS ext, 0 AS e FROM s
        |  UNION ALL
        |  SELECT doc_id, j, 'jpg', 1 FROM s WHERE (doc_id + j) % 2 = 0
        |  UNION ALL
        |  SELECT doc_id, j, 'json', 2 FROM s WHERE (doc_id + j) % 3 = 0)
        |SELECT doc_id,
        |  printf('shard%d/s%05d_%02d', CAST(doc_id % 7 AS INTEGER),
        |    CAST(doc_id AS INTEGER), CAST(j AS INTEGER)) AS sample_key,
        |  COUNT(*) AS n_components,
        |  string_agg(ext, ',' ORDER BY ext) AS exts,
        |  CAST(SUM(10 + (13*doc_id + 7*j + 3*e) % 200) AS BIGINT)
        |    AS total_bytes
        |FROM c GROUP BY doc_id, j ORDER BY doc_id, sample_key""".stripMargin,

    // CDC pairs exactly the in-class pairs (payload shared at shifted
    // offsets); fixed-512 chunking shares nothing (prefix lengths are
    // pairwise distinct, all < 512, so every window is misaligned)
    "q168_cdc_shift_dedup" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id % 10 AS acls FROM documents
        |  WHERE doc_id < 150 AND doc_id % 41 != 0)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       TRUE AS matched_cdc, CAST(0 AS BIGINT) AS n_fixed
        |FROM d a, d b
        |WHERE a.doc_id < b.doc_id AND a.acls = b.acls
        |ORDER BY id_a, id_b""".stripMargin,

    // in-class pairs share the full packet stream (4 + class%4
    // packets); wrappers (serial/granule/page grouping) differ per doc
    "q167_ogg_wrapper_invariant_dedup" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id % 8 AS acls FROM documents
        |  WHERE doc_id < 120 AND doc_id % 41 != 0)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       CAST(4 + a.acls % 4 AS BIGINT) AS n_packets
        |FROM d a, d b
        |WHERE a.doc_id < b.doc_id AND a.acls = b.acls
        |ORDER BY id_a, id_b""".stripMargin,

    // page occupancy is formula-determined (1 page, or 2 when the
    // packet spans), so the ending page's granule is a window sum
    "q166_ogg_packets" ->
      """WITH d AS (
        |  SELECT doc_id, 4 + doc_id % 4 AS npk FROM documents
        |  WHERE doc_id < 200 AND doc_id % 41 != 0 AND doc_id % 37 != 0),
        |p AS (
        |  SELECT d.doc_id, j.j AS packet_idx,
        |         30 + (d.doc_id * 7 + j.j * 13) % 500 AS psize,
        |         (d.doc_id + j.j * 37) % 251 AS fill
        |  FROM d, generate_series(0, 7) AS j(j) WHERE j.j < d.npk),
        |q AS (
        |  SELECT *, SUM(CASE WHEN psize > 300 THEN 2 ELSE 1 END)
        |    OVER (PARTITION BY doc_id ORDER BY packet_idx) AS cum
        |  FROM p)
        |SELECT doc_id, CAST(doc_id AS BIGINT) AS serial,
        |  CAST(packet_idx AS INTEGER) AS packet_idx,
        |  CAST(cum * 1000 + doc_id % 7 AS BIGINT) AS granule,
        |  CAST(psize AS INTEGER) AS psize,
        |  CAST(psize * fill AS BIGINT) AS payload_sum,
        |  CAST(psize > 300 AS BOOLEAN) AS spans_pages
        |FROM q ORDER BY doc_id, packet_idx""".stripMargin,

    // one arithmetic for both carriage layouts; is_key = (c+f)%2
    // regardless of whether it came from a flag bit or a missing
    // ReferenceBlock
    "q165_webm_blockgroup" ->
      """WITH d AS (
        |  SELECT doc_id, 2 + doc_id % 3 AS nclu FROM documents
        |  WHERE doc_id < 200 AND doc_id % 41 != 0),
        |s AS (
        |  SELECT d.doc_id, c.c AS clu, f.f AS frm
        |  FROM d, generate_series(0, 4) AS c(c),
        |       generate_series(0, 2) AS f(f)
        |  WHERE c.c < d.nclu)
        |SELECT doc_id, CAST(1 AS BIGINT) AS track_id,
        |  CAST(clu * 3 + frm AS INTEGER) AS sample_idx,
        |  CAST(clu * 1000 + (doc_id % 7) * 10 + 10 * frm + clu AS BIGINT)
        |    AS ts_ticks,
        |  CAST((clu + frm) % 2 = 0 AS BOOLEAN) AS is_key,
        |  CAST(8 + (doc_id + clu * 5 + frm * 7) % 9 AS INTEGER)
        |    AS sample_size,
        |  CAST((8 + (doc_id + clu * 5 + frm * 7) % 9)
        |       * ((doc_id + clu * 17 + frm * 31) % 251) AS BIGINT)
        |    AS payload_sum
        |FROM s ORDER BY doc_id, sample_idx""".stripMargin,

    // one arithmetic for all four carriage modes: cluster c carries
    // three frames of size 8+(id+c)%9 at ts = c*1000+(id%7)*10+5
    "q164_webm_lacing" ->
      """WITH d AS (
        |  SELECT doc_id, 2 + doc_id % 3 AS nclu FROM documents
        |  WHERE doc_id < 200 AND doc_id % 41 != 0),
        |s AS (
        |  SELECT d.doc_id, c.c AS clu, f.f AS frm
        |  FROM d, generate_series(0, 4) AS c(c),
        |       generate_series(0, 2) AS f(f)
        |  WHERE c.c < d.nclu)
        |SELECT doc_id, CAST(1 AS BIGINT) AS track_id,
        |  CAST(clu * 3 + frm AS INTEGER) AS sample_idx,
        |  CAST(clu * 1000 + (doc_id % 7) * 10 + 5 AS BIGINT) AS ts_ticks,
        |  CAST(clu % 2 = 0 AS BOOLEAN) AS is_key,
        |  CAST(8 + (doc_id + clu) % 9 AS INTEGER) AS sample_size,
        |  CAST((8 + (doc_id + clu) % 9)
        |       * ((doc_id + clu * 17 + frm * 31) % 251) AS BIGINT)
        |    AS payload_sum
        |FROM s ORDER BY doc_id, sample_idx""".stripMargin,

    // pure planted structure: same video class pairs regardless of
    // container; n_shared = 3 only when BOTH sides are WebM (all three
    // frames keyed), else 2 (MP4 exposes sync samples {0,2})
    "q158_cross_container_dedup" ->
      """WITH d AS (
        |  SELECT doc_id, (doc_id // 2) % 6 AS vcls FROM documents
        |  WHERE doc_id < 60 AND doc_id % 41 != 0)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(CASE WHEN a.doc_id % 2 = 1 AND b.doc_id % 2 = 1
        |       THEN 3 ELSE 2 END AS BIGINT) AS n_shared
        |FROM d a, d b
        |WHERE a.doc_id < b.doc_id AND a.vcls = b.vcls
        |ORDER BY id_a, id_b""".stripMargin,

    // in-class pairs share the full stream (4 + class%5 frames);
    // wrappers differ per doc, so a byte-equality dedup finds nothing
    // and a content dedup finds exactly these
    "q159_mp3_tag_invariant_dedup" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id % 8 AS acls FROM documents
        |  WHERE doc_id < 120 AND doc_id % 41 != 0)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       CAST(4 + a.acls % 5 AS BIGINT) AS n_frames
        |FROM d a, d b
        |WHERE a.doc_id < b.doc_id AND a.acls = b.acls
        |ORDER BY id_a, id_b""".stripMargin,

    // bodies are class-determined, so dedup-by-body ≡ dedup-by-class:
    // first occurrence in (doc_id, rec_idx) order among 200-responses
    "q160_warc_text_pipeline" ->
      """WITH d AS (
        |  SELECT doc_id, 3 + doc_id % 5 AS n FROM documents
        |  WHERE doc_id < 150 AND doc_id % 41 != 0),
        |r AS (
        |  SELECT d.doc_id, j.j AS rec_idx,
        |         (d.doc_id * 3 + j.j) % 20 AS c
        |  FROM d, generate_series(0, 7) AS j(j)
        |  WHERE j.j >= 2 AND j.j % 2 = 0 AND j.j < d.n
        |    AND (d.doc_id * 7 + j.j) % 4 = 0)
        |SELECT doc_id, CAST(rec_idx AS INTEGER) AS rec_idx,
        |  CAST(5 + c % 7 AS INTEGER) AS n_tokens,
        |  CAST(row_number() OVER (PARTITION BY c
        |         ORDER BY doc_id, rec_idx) = 1 AS BOOLEAN) AS is_first
        |FROM r ORDER BY doc_id, rec_idx""".stripMargin,

    // block-carrying probes pair with every same-class indexed doc —
    // the winnowing guarantee through the persisted index, append
    // boundary included
    "q161_winnow_index_planted" ->
      """WITH idx AS (
        |  SELECT doc_id FROM documents
        |  WHERE doc_id < 150 AND doc_id % 3 = 0),
        |p AS (
        |  SELECT 10000 + doc_id AS pid FROM documents
        |  WHERE doc_id >= 20 AND doc_id < 50
        |    AND (10000 + doc_id) % 3 = 0)
        |SELECT p.pid AS id_a, idx.doc_id AS id_b,
        |       CAST(true AS BOOLEAN) AS matched
        |FROM p, idx WHERE p.pid % 10 = idx.doc_id % 10
        |ORDER BY id_a, id_b""".stripMargin,

    // pointer resolution restated: every surviving doc's revisit
    // resolves to its group leader's response IFF the leader's
    // archive survived the poison filter
    "q162_warc_revisit_resolve" ->
      """WITH d AS (
        |  SELECT doc_id FROM documents
        |  WHERE doc_id < 150 AND doc_id % 41 != 0)
        |SELECT r.doc_id,
        |  CAST(r.doc_id - r.doc_id % 5 AS BIGINT) AS orig_doc,
        |  repeat(chr(97 + CAST((r.doc_id - r.doc_id % 5) % 26 AS INTEGER)),
        |         CAST(5 + ((r.doc_id - r.doc_id % 5) * 7) % 40 AS INTEGER))
        |    AS body_str,
        |  CAST(5 + ((r.doc_id - r.doc_id % 5) * 7) % 40 AS INTEGER)
        |    AS orig_len
        |FROM d r JOIN d t ON t.doc_id = r.doc_id - r.doc_id % 5
        |ORDER BY r.doc_id""".stripMargin,

    // deterministic by the winnowing theorem: every block doc (mod 3)
    // is found by some same-class twin probe; the within pair exists;
    // twin matches span exactly the two probe batches
    "q163_streaming_exactdup" ->
      """SELECT doc_id, CAST(doc_id % 3 = 0 AS BOOLEAN) AS found,
        |       CAST(true AS BOOLEAN) AS within_ok,
        |       CAST(2 AS BIGINT) AS n_twin_batches
        |FROM documents WHERE doc_id < 60
        |ORDER BY doc_id""".stripMargin,

    "q51_ann_index_planted" ->
      """SELECT vec_id AS query_id, CAST(9 AS BIGINT) AS n_exact,
        |       CAST(9 AS BIGINT) AS n_found
        |FROM embeddings WHERE vec_id < 5 ORDER BY query_id""".stripMargin,

    "q53_ann_ivf_index_planted" ->
      """SELECT vec_id AS query_id, CAST(9 AS BIGINT) AS n_exact,
        |       CAST(9 AS BIGINT) AS n_found
        |FROM embeddings WHERE vec_id < 5 ORDER BY query_id""".stripMargin,

    "q42_supplier_nation" ->
      """SELECT n_name, count(*) AS n_supp,
        |       min(s_acctbal) AS min_bal, max(s_acctbal) AS max_bal
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q45_dedup_clusters" ->
      """WITH RECURSIVE base AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id < 40),
        |planted AS (
        |  SELECT doc_id + 1000000 * t.j AS doc_id, text
        |  FROM base, generate_series(0, 16) AS t(j)),
        |h AS (SELECT doc_id, md5(text) AS h FROM planted),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |      FROM h a JOIN h b ON a.h = b.h
        |      WHERE b.doc_id - a.doc_id = 1000000),
        |e AS (SELECT id_a AS s, id_b AS d FROM p
        |      UNION SELECT id_b, id_a FROM p),
        |reach(id, r) AS (
        |  SELECT s, s FROM e
        |  UNION
        |  SELECT reach.id, e.d FROM reach JOIN e ON reach.r = e.s)
        |SELECT id AS doc_id, min(r) AS cluster
        |FROM reach GROUP BY 1 ORDER BY 1""".stripMargin,

    "q47_simhash_planted" ->
      """SELECT doc_id AS id_a, doc_id + 1000000 AS id_b,
        |       CAST(0 AS BIGINT) AS hamming
        |FROM documents WHERE doc_id < 1000 ORDER BY id_a""".stripMargin,

    "q52_rolling_hash_planted" ->
      """SELECT doc_id, TRUE AS same_hash,
        |  text = array_to_string(list_reverse(string_split(text, ' ')),
        |                         ' ') AS palindrome,
        |  text != array_to_string(list_reverse(string_split(text, ' ')),
        |                          ' ') AS fwd_ne_rev
        |FROM documents WHERE doc_id < 1000 ORDER BY doc_id""".stripMargin,

    // The batch-plan prediction of the streaming run: 10 files, each =
    // doc 0's padded text (planted cross-batch duplicate) + 20 docs
    // padded to 64-byte multiples, chunked at 64 chars from each FILE's
    // start; refs_num per repeated chunk hash (order-invariant), plus
    // the pinned incremental-commit count.
    "q97_streaming_dedup" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    rpad(text, CAST(((length(text)+63)//64)*64 AS INTEGER), ' ') AS pt
        |  FROM documents WHERE doc_id < 200),
        |f AS (
        |  SELECT doc_id // 20 AS g,
        |         (SELECT pt FROM p WHERE doc_id = 0) ||
        |           string_agg(pt, '' ORDER BY doc_id) AS content
        |  FROM p GROUP BY 1)
        |SELECT CAST(cnt AS BIGINT) AS refs_num,
        |       CAST(3 AS BIGINT) AS n_batches FROM (
        |  SELECT count(*) AS cnt FROM (
        |    SELECT md5(chunk) AS h FROM (
        |      SELECT unnest(list_transform(range(1, length(content) + 1, 64),
        |             s -> substr(content, s, 64))) AS chunk
        |      FROM f))
        |  GROUP BY h HAVING count(*) > 1)
        |ORDER BY refs_num DESC""".stripMargin,

    "q48_catalog_repetition" ->
      """SELECT CAST(cnt AS BIGINT) AS refs_num FROM (
        |  SELECT count(*) AS cnt FROM (
        |    SELECT md5(chunk) AS h FROM (
        |      SELECT unnest(list_transform(range(1, length(text) + 1, 64),
        |             s -> substr(text, s, 64))) AS chunk
        |      FROM documents WHERE doc_id < 200))
        |  GROUP BY h HAVING count(*) > 1)
        |ORDER BY refs_num DESC""".stripMargin,

    "q49_catalog_point_reads" ->
      """WITH chunks AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(1, length(text) + 1, 64),
        |      s -> {'pos': CAST((s - 1) // 64 AS BIGINT),
        |            'chunk': substr(text, s, 64)})) AS rec
        |  FROM documents WHERE doc_id < 200),
        |c AS (SELECT doc_id, md5(rec.chunk) AS hash,
        |             doc_id * 1000000 + rec.pos AS gl FROM chunks),
        |l AS (SELECT hash, min(gl) AS line, count(*) AS refs_num
        |      FROM c GROUP BY 1),
        |h0 AS (SELECT md5(substr(text, 1, 64)) AS h FROM documents
        |       WHERE doc_id = 0)
        |SELECT probe, hash, CAST(1 AS BIGINT) AS file_id, line, refs_num
        |FROM (
        |  SELECT 'by_hash' AS probe, hash, line, refs_num FROM l
        |  WHERE hash = (SELECT h FROM h0)
        |  UNION ALL
        |  SELECT 'by_line' AS probe, hash, line, refs_num FROM l
        |  WHERE line = 0
        |  UNION ALL
        |  SELECT 'by_filename', 'run1', CAST(64 AS BIGINT),
        |         CAST(1 AS BIGINT))
        |ORDER BY probe""".stripMargin,

    "q46_multimodal_real_decode" ->
      """SELECT doc_id,
        |       CAST(16 + doc_id % 8 AS INT) AS width,
        |       CAST(9 + doc_id % 5 AS INT) AS height,
        |       CAST(3 AS INT) AS channels,
        |       TRUE AS ok
        |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin,

    "q50_multimodal_gif_frames" ->
      """SELECT doc_id, CAST(t.j AS BIGINT) AS frame_idx,
        |       CAST(8 + doc_id % 5 AS INT) AS width,
        |       CAST(5 + doc_id % 3 AS INT) AS height,
        |       TRUE AS ok
        |FROM documents CROSS JOIN generate_series(0, 7) AS t(j)
        |WHERE doc_id < 100 AND t.j < 2 + doc_id % 7
        |ORDER BY doc_id, frame_idx""".stripMargin,

    "q98_multimodal_jpeg" ->
      """SELECT doc_id,
        |       CAST(10 + doc_id % 6 AS INT) AS width,
        |       CAST(6 + doc_id % 4 AS INT) AS height,
        |       CAST(3 AS INT) AS channels,
        |       TRUE AS ok, TRUE AS gray_ok
        |FROM documents WHERE doc_id < 80 ORDER BY doc_id""".stripMargin,

    "q99_audio_wav" ->
      """WITH d AS (SELECT doc_id,
        |                  CAST(500 + (doc_id % 7) * 100 AS BIGINT) AS n
        |           FROM documents WHERE doc_id < 80)
        |SELECT d.doc_id,
        |       CAST(8000 AS INT) AS sample_rate,
        |       CAST(1 AS INT) AS channels,
        |       CAST(16 AS INT) AS bits,
        |       d.n AS n_frames,
        |       CAST(sum(((d.doc_id * 2654435761 + t.i * 40503)
        |                 % 65536) - 32768) AS BIGINT) AS sample_sum,
        |       CAST(max(abs(((d.doc_id * 2654435761 + t.i * 40503)
        |                 % 65536) - 32768)) AS INT) AS peak,
        |       TRUE AS ok
        |FROM d CROSS JOIN generate_series(0, 1099) AS t(i)
        |WHERE t.i < d.n
        |GROUP BY d.doc_id, d.n
        |ORDER BY d.doc_id""".stripMargin,

    // independent restatement of NormalizeUrl: regexp part extraction +
    // list_filter/list_sort — shares no code path with the Spark kernel
    "q100_url_normalize" ->
      """WITH raw AS (
        |  SELECT doc_id,
        |    CASE doc_id % 8
        |      WHEN 0 THEN 'http://Example.COM/p' || (doc_id // 8)
        |      WHEN 1 THEN 'HTTP://example.com:80/p' || (doc_id // 8)
        |      WHEN 2 THEN 'http://example.com/p' || (doc_id // 8) || '/'
        |      WHEN 3 THEN 'http://example.com/p' || (doc_id // 8)
        |                  || '#sec'
        |      WHEN 4 THEN 'http://example.com/p' || (doc_id // 8)
        |                  || '?utm_source=tw&utm_campaign=x'
        |      WHEN 5 THEN 'http://example.com/p' || (doc_id // 8)
        |                  || '?b=2&a=1'
        |      WHEN 6 THEN 'http://example.com/p' || (doc_id // 8)
        |                  || '?a=1&utm_medium=email&b=2'
        |      ELSE 'https://example.com:443/p' || (doc_id // 8)
        |           || '?fbclid=abc'
        |    END AS url
        |  FROM documents WHERE doc_id < 400),
        |p AS (
        |  SELECT doc_id, url,
        |    lower(regexp_extract(url,
        |      '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        |    lower(regexp_extract(url,
        |      '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS auth,
        |    regexp_extract(url,
        |      '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS pth,
        |    CASE WHEN regexp_matches(url, '^[^#?]*\?')
        |         THEN list_sort(list_filter(
        |           string_split(regexp_extract(url,
        |             '^[^#?]*\?([^#]*)', 1), '&'),
        |           x -> x <> '' AND NOT regexp_matches(x,
        |             '^(utm_[a-z0-9]+|fbclid|gclid)(=|$)', 'i')))
        |         ELSE NULL END AS kept
        |  FROM raw),
        |n AS (
        |  SELECT doc_id, url,
        |    scheme || '://' ||
        |    CASE WHEN scheme = 'http' AND auth LIKE '%:80'
        |           THEN substr(auth, 1, length(auth) - 3)
        |         WHEN scheme = 'https' AND auth LIKE '%:443'
        |           THEN substr(auth, 1, length(auth) - 4)
        |         ELSE auth END ||
        |    CASE WHEN pth = '' THEN '/'
        |         WHEN length(pth) > 1 AND pth LIKE '%/'
        |           THEN substr(pth, 1, length(pth) - 1)
        |         ELSE pth END ||
        |    CASE WHEN kept IS NULL OR len(kept) = 0 THEN ''
        |         ELSE '?' || array_to_string(kept, '&') END AS norm_url
        |  FROM p)
        |SELECT doc_id, url, norm_url,
        |       CAST(count(*) OVER (PARTITION BY norm_url) AS BIGINT)
        |         AS n_same
        |FROM n ORDER BY doc_id""".stripMargin,

    // independent restatement of c4LineFilter's predicates over the
    // identically-derived 4-line fixture page
    "q101_c4_line_filter" ->
      """WITH pg AS (
        |  SELECT doc_id,
        |    [array_to_string(toks[1:5], ' ') || '.',
        |     array_to_string(toks[6:7], ' '),
        |     'please enable javascript to view this page.',
        |     array_to_string(toks[8:12], ' ') ||
        |       (CASE WHEN doc_id % 3 = 0 THEN '!' ELSE '' END)] AS ls
        |  FROM (SELECT doc_id, string_split(text, ' ') AS toks
        |        FROM documents WHERE doc_id < 300)),
        |k AS (
        |  SELECT doc_id, len(ls) AS n_lines,
        |    list_filter(ls, x -> regexp_matches(x, '[.!?"]$')
        |      AND len(string_split(x, ' ')) >= 4
        |      AND NOT contains(lower(x), 'javascript')) AS kept
        |  FROM pg)
        |SELECT doc_id,
        |       array_to_string(kept, chr(10)) AS clean_text,
        |       CAST(n_lines AS BIGINT) AS n_lines,
        |       CAST(len(kept) AS BIGINT) AS n_kept
        |FROM k WHERE len(kept) >= 2 ORDER BY doc_id""".stripMargin,

    "q102_inverted_index" ->
      """WITH td AS (
        |  SELECT DISTINCT doc_id, t.tok
        |  FROM documents, unnest(string_split(text, ' ')) AS t(tok)
        |  WHERE doc_id < 300 AND length(t.tok) >= 6)
        |SELECT tok,
        |       array_to_string(list(doc_id ORDER BY doc_id), ',')
        |         AS postings,
        |       CAST(count(*) AS BIGINT) AS df
        |FROM td GROUP BY tok ORDER BY tok""".stripMargin,

    // found is the q55 probability-1 constant; the row counts pin the
    // incremental write (8 band rows per doc with >= 2 tokens)
    "q103_minhash_index_append" ->
      """WITH n AS (
        |  SELECT
        |    CAST(8 * sum(CASE WHEN doc_id < 250
        |          AND len(string_split(text, ' ')) >= 2
        |          THEN 1 ELSE 0 END) AS BIGINT) AS rows_built,
        |    CAST(8 * sum(CASE WHEN len(string_split(text, ' ')) >= 2
        |          THEN 1 ELSE 0 END) AS BIGINT) AS rows_total
        |  FROM documents WHERE doc_id < 500)
        |SELECT doc_id, CAST(1 AS BOOLEAN) AS found,
        |       n.rows_built, n.rows_total
        |FROM documents, n WHERE doc_id < 500 ORDER BY doc_id""".stripMargin,

    // digest of the PARQUET originals — equality proves the JSONL
    // round-trip lost nothing
    "q104_jsonl_roundtrip" ->
      """SELECT doc_id, md5(text) AS text_md5, lang, source, n_chars
        |FROM documents WHERE doc_id < 300 ORDER BY doc_id""".stripMargin,

    // independent restatement of the Gopher rules: same exact-integer
    // signals, same IEEE divides, DuckDB's own list/regex machinery
    "q105_gopher_filter" ->
      """WITH b AS (
        |  SELECT doc_id, text,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
        |    CAST(len(regexp_extract_all(text, '#|\.\.\.')) AS BIGINT)
        |      AS n_sym,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS n_alpha,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      x -> x IN ('the','be','to','of','and','that','have',
        |                 'with'))) AS BIGINT) AS n_stop
        |  FROM documents WHERE doc_id < 300),
        |c AS (
        |  SELECT doc_id, n AS n_words,
        |    CAST(length(text) - n + 1 AS DOUBLE) / CAST(n AS DOUBLE)
        |      AS mean_word_len,
        |    CAST(n_sym AS DOUBLE) / CAST(n AS DOUBLE) AS symbol_ratio,
        |    CAST(n_alpha AS DOUBLE) / CAST(n AS DOUBLE) AS alpha_frac,
        |    n_stop
        |  FROM b)
        |SELECT doc_id, n_words, mean_word_len, symbol_ratio, alpha_frac,
        |  n_stop,
        |  (n_words BETWEEN 20 AND 100000) AS words_ok,
        |  (mean_word_len BETWEEN 3.0 AND 10.0) AS mean_ok,
        |  (symbol_ratio < 0.1) AS sym_ok,
        |  (alpha_frac > 0.8) AS alpha_ok,
        |  (n_stop >= 2) AS stop_ok,
        |  ((n_words BETWEEN 20 AND 100000)
        |   AND (mean_word_len BETWEEN 3.0 AND 10.0)
        |   AND symbol_ratio < 0.1 AND alpha_frac > 0.8
        |   AND n_stop >= 2) AS keep
        |FROM c ORDER BY doc_id""".stripMargin,

    // probability-1 constants (see the query comment): identical twins
    // collide in every band; twin matches span exactly batches 1 and 2
    "q106_streaming_neardup" ->
      """SELECT doc_id, CAST(1 AS BOOLEAN) AS found,
        |       CAST(1 AS BOOLEAN) AS within_ok,
        |       CAST(2 AS BIGINT) AS n_twin_batches
        |FROM documents WHERE doc_id < 50 ORDER BY doc_id""".stripMargin,

    "q107_audio_features" ->
      """WITH d AS (SELECT doc_id,
        |             CAST(500 + (doc_id % 7) * 100 AS BIGINT) AS n
        |           FROM documents WHERE doc_id < 60),
        |s AS (SELECT d.doc_id, t.i // 256 AS win,
        |        ((d.doc_id * 2654435761 + t.i * 40503) % 65536) - 32768
        |          AS v
        |      FROM d CROSS JOIN generate_series(0, 1099) AS t(i)
        |      WHERE t.i < d.n)
        |SELECT doc_id, CAST(win AS INT) AS win,
        |       CAST(count(*) AS BIGINT) AS n_samples,
        |       CAST(sum(v) AS BIGINT) AS "sum",
        |       CAST(sum(v * v) AS BIGINT) AS sum_sq
        |FROM s GROUP BY doc_id, win ORDER BY doc_id, win""".stripMargin,

    // all four stages restated in pipeline order: URL normalize +
    // min-id dedup, Gopher keep, exact text dedup
    // the two-level (lb, sb, h, key) rank equals this single global
    // row_number because sb is the md5's own hex prefix (q78 argument)
    "q109_length_batches" ->
      """WITH r AS (
        |  SELECT doc_id, n_chars,
        |    row_number() OVER (ORDER BY n_chars // 32,
        |      md5(doc_id || ':r9:lenbatch'), doc_id) - 1 AS rk
        |  FROM documents WHERE doc_id < 500),
        |a AS (SELECT doc_id, n_chars,
        |        CAST(rk // 32 AS BIGINT) AS batch,
        |        CAST(rk % 32 AS INT) AS pos
        |      FROM r),
        |st AS (SELECT batch, CAST(count(*) AS BIGINT) AS n_docs,
        |         CAST(max(n_chars) AS BIGINT) AS batch_max,
        |         CAST(sum(n_chars) AS BIGINT) AS batch_sum
        |       FROM a GROUP BY batch)
        |SELECT a.doc_id, a.batch, a.pos, st.batch_max,
        |       CAST(st.n_docs * st.batch_max - st.batch_sum AS BIGINT)
        |         AS batch_waste
        |FROM a JOIN st USING (batch)
        |ORDER BY a.doc_id""".stripMargin,

    // the three stages restated in order: fused strip + entity decode,
    // Gopher keep over the EXTRACTED text, min-id exact dedup
    "q119_crawl_pipeline" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id - doc_id % 2 AS pid
        |  FROM documents WHERE doc_id < 300),
        |p AS (
        |  SELECT d.doc_id,
        |    '<html><head><title>T' || d.pid ||
        |    '</title><style>x{p:1}</style></head>' ||
        |    '<body><script>var z=9;</script><p>' || dd.text ||
        |    ' &amp; end</p></body></html>' AS page
        |  FROM d JOIN documents dd ON dd.doc_id = d.pid),
        |s4 AS (SELECT doc_id, regexp_replace(page,
        |  '(?is)<script[^>]*>.*?</script[ \t\n\r]*>' ||
        |  '|<style[^>]*>.*?</style[ \t\n\r]*>' ||
        |  '|<!--.*?-->' ||
        |  '|<[^>]*>', ' ', 'g') AS t
        |  FROM p),
        |c AS (SELECT doc_id,
        |  trim(regexp_replace(
        |    replace(replace(replace(replace(replace(t,
        |      '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
        |      '&#39;', ''''), '&amp;', '&'),
        |    '[ \t\n\r]+', ' ', 'g')) AS clean
        |  FROM s4),
        |sig AS (
        |  SELECT doc_id, clean,
        |    CAST(len(string_split(clean, ' ')) AS BIGINT) AS nw,
        |    CAST(len(regexp_extract_all(clean, '#|\.\.\.')) AS BIGINT)
        |      AS nsym,
        |    CAST(len(list_filter(string_split(clean, ' '),
        |      x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS nalpha,
        |    CAST(len(list_filter(string_split(clean, ' '),
        |      x -> x IN ('the','be','to','of','and','that','have',
        |                 'with'))) AS BIGINT) AS nstop
        |  FROM c),
        |q AS (
        |  SELECT doc_id, clean FROM sig
        |  WHERE nw BETWEEN 20 AND 100000
        |    AND (CAST(length(clean) - nw + 1 AS DOUBLE) /
        |         CAST(nw AS DOUBLE)) BETWEEN 3.0 AND 10.0
        |    AND CAST(nsym AS DOUBLE) / CAST(nw AS DOUBLE) < 0.1
        |    AND CAST(nalpha AS DOUBLE) / CAST(nw AS DOUBLE) > 0.8
        |    AND nstop >= 2)
        |SELECT doc_id, CAST(length(clean) AS BIGINT) AS n_clean_chars
        |FROM q
        |WHERE doc_id IN (SELECT min(doc_id) FROM q GROUP BY md5(clean))
        |ORDER BY doc_id""".stripMargin,

    // the analytically-derived merge sequence and final segmentations
    // for the planted histogram (ties resolved lexicographically)
    "q118_bpe_learn" ->
      """SELECT * FROM (VALUES
        |  (CAST(0 AS BIGINT), 'e', 's', CAST(9 AS BIGINT)),
        |  (1, 'es', 't', 9),
        |  (2, 'l', 'o', 7),
        |  (3, 'lo', 'w', 7),
        |  (4, 'e', 'w', 6),
        |  (5, 'ew', 'est', 6),
        |  (6, 'n', 'ewest', 6),
        |  (7, 'd', 'est', 3),
        |  (100, 'low', 'low', 5),
        |  (100, 'lower', 'low e r', 2),
        |  (100, 'newest', 'newest', 6),
        |  (100, 'widest', 'w i dest', 3)
        |) AS t(step, a, b, n) ORDER BY step, a""".stripMargin,

    // independent application of the same RE2-subset patterns; DuckDB
    // regexp_replace needs the explicit 'g' flag (Spark's is global)
    "q117_html_strip" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    '<html><head><title>T' || doc_id ||
        |    '</title><style>body{color:red}</style></head>' ||
        |    '<body><script type="text/javascript">var x=1;' ||
        |    '</script><h1>Doc ' || doc_id ||
        |    '</h1><!-- hidden' || chr(10) || 'comment --><p>' ||
        |    array_to_string((string_split(text, ' '))[1:8], ' ') ||
        |    ' &amp; more &lt;tags&gt; &amp;lt;kept&amp;gt; ' ||
        |    '&quot;q&quot; &#39;s&#39;</p></body></html>' AS page
        |  FROM documents WHERE doc_id < 300),
        |s4 AS (SELECT doc_id, regexp_replace(page,
        |  '(?is)<script[^>]*>.*?</script[ \t\n\r]*>' ||
        |  '|<style[^>]*>.*?</style[ \t\n\r]*>' ||
        |  '|<!--.*?-->' ||
        |  '|<[^>]*>', ' ', 'g') AS t
        |  FROM h),
        |s5 AS (SELECT doc_id,
        |  replace(replace(replace(replace(replace(t,
        |    '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
        |    '&#39;', ''''), '&amp;', '&') AS t
        |  FROM s4)
        |SELECT doc_id,
        |  trim(regexp_replace(t, '[ \t\n\r]+', ' ', 'g')) AS clean
        |FROM s5 ORDER BY doc_id""".stripMargin,

    "q116_corpus_datasheet" ->
      """WITH k AS (
        |  SELECT doc_id, source, lang, text,
        |    len(string_split(text, ' ')) AS nw,
        |    len(regexp_extract_all(text, '#|\.\.\.')) AS nsym,
        |    len(list_filter(string_split(text, ' '),
        |      x -> regexp_matches(x, '[A-Za-z]'))) AS nalpha,
        |    len(list_filter(string_split(text, ' '),
        |      x -> x IN ('the','be','to','of','and','that','have',
        |                 'with'))) AS nstop
        |  FROM documents),
        |q AS (
        |  SELECT *, (nw BETWEEN 20 AND 100000
        |    AND (CAST(length(text) - nw + 1 AS DOUBLE) /
        |         CAST(nw AS DOUBLE)) BETWEEN 3.0 AND 10.0
        |    AND CAST(nsym AS DOUBLE) / CAST(nw AS DOUBLE) < 0.1
        |    AND CAST(nalpha AS DOUBLE) / CAST(nw AS DOUBLE) > 0.8
        |    AND nstop >= 2) AS keep
        |  FROM k),
        |d AS (
        |  SELECT source,
        |    CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
        |      AS n_dup_docs
        |  FROM (SELECT source, md5(text) AS h, count(*) AS c
        |        FROM documents GROUP BY 1, 2)
        |  GROUP BY source)
        |SELECT q.source, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(nw) AS BIGINT) AS sum_tokens,
        |       CAST(sum(length(text)) AS BIGINT) AS sum_chars,
        |       CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_gopher_keep,
        |       array_to_string(list_sort(list(DISTINCT lang)), ',')
        |         AS langs,
        |       any_value(d.n_dup_docs) AS n_dup_docs
        |FROM q JOIN d ON q.source = d.source
        |GROUP BY q.source ORDER BY q.source""".stripMargin,

    // classes emitted only when non-empty, matching the groupBy shape
    "q115_catalog_changefeed" ->
      """WITH chunks AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(1, length(text) + 1, 64),
        |      s -> md5(substr(text, s, 64)))) AS hash
        |  FROM documents WHERE doc_id < 200),
        |e AS (SELECT hash, count(*) AS c FROM chunks
        |      WHERE doc_id % 2 = 0 GROUP BY hash),
        |o AS (SELECT hash, count(*) AS c FROM chunks
        |      WHERE doc_id % 2 = 1 GROUP BY hash)
        |SELECT * FROM (
        |  SELECT 'added' AS change, CAST(count(*) AS BIGINT) AS n_hashes,
        |         CAST(sum(c) AS BIGINT) AS sum_refs_to,
        |         CAST(sum(c) AS BIGINT) AS sum_delta
        |  FROM o WHERE hash NOT IN (SELECT hash FROM e)
        |  HAVING count(*) > 0
        |  UNION ALL
        |  SELECT 'refs_changed', CAST(count(*) AS BIGINT),
        |         CAST(sum(e.c + o.c) AS BIGINT), CAST(sum(o.c) AS BIGINT)
        |  FROM e JOIN o USING (hash)
        |  HAVING count(*) > 0
        |  UNION ALL
        |  SELECT 'unchanged', CAST(count(*) AS BIGINT),
        |         CAST(sum(c) AS BIGINT), CAST(0 AS BIGINT)
        |  FROM e WHERE hash NOT IN (SELECT hash FROM o)
        |  HAVING count(*) > 0)
        |ORDER BY change""".stripMargin,

    "q114_compression_quality" ->
      """SELECT doc_id,
        |  CAST(1024 AS BIGINT) AS b_bytes,
        |  CAST(length(text) * 8 AS BIGINT) AS p_bytes,
        |  CAST(512 AS BIGINT) AS j_bytes,
        |  TRUE AS b_lt_p, TRUE AS p_lt_j,
        |  TRUE AS b_small, TRUE AS p_band, TRUE AS j_big
        |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin,

    "q113_shard_export" ->
      """WITH d AS (
        |  SELECT doc_id, n_chars,
        |    CAST(('0x' || substr(md5(doc_id || ':r9shard'), 1, 4))::INT
        |         % 8 AS INT) AS shard
        |  FROM documents)
        |SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |       min(doc_id) AS min_id, max(doc_id) AS max_id,
        |       md5(string_agg(doc_id, ',' ORDER BY doc_id)) AS ids_md5
        |FROM d GROUP BY shard ORDER BY shard""".stripMargin,

    "q112_fim_transform" ->
      """WITH b AS (
        |  SELECT doc_id, text, string_split(text, ' ') AS tk,
        |    len(string_split(text, ' ')) AS n,
        |    ('0x' || substr(md5(doc_id || ':r9:fim1'), 1, 4))::INT AS u1,
        |    ('0x' || substr(md5(doc_id || ':r9:fim2'), 1, 4))::INT AS u2,
        |    ('0x' || substr(md5(doc_id || ':r9:fim'), 1, 4))::INT AS uf
        |  FROM documents WHERE doc_id < 300),
        |c AS (
        |  SELECT doc_id, text, tk, n,
        |    least(u1 % (n + 1), u2 % (n + 1)) AS lo,
        |    greatest(u1 % (n + 1), u2 % (n + 1)) AS hi,
        |    uf < 32768 AS fim
        |  FROM b)
        |SELECT doc_id, fim,
        |  -- coalesce: DuckDB's array_to_string([]) is NULL, Spark's
        |  -- array_join(empty) is ''
        |  CASE WHEN fim THEN
        |    '<PRE> ' || coalesce(array_to_string(tk[1:lo], ' '), '') ||
        |    ' <SUF> ' || coalesce(array_to_string(tk[hi+1:n], ' '), '') ||
        |    ' <MID> ' || coalesce(array_to_string(tk[lo+1:hi], ' '), '')
        |  ELSE text END AS out_text
        |FROM c ORDER BY doc_id""".stripMargin,

    // identical window formulation in DuckDB; threshold16(0.15) = 9830
    "q111_span_corrupt" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS tk
        |  FROM documents WHERE doc_id < 200),
        |p AS (
        |  SELECT doc_id, r.i - 1 AS pos, tk[r.i] AS tok
        |  FROM t, unnest(range(1, len(tk) + 1)) AS r(i)),
        |m AS (
        |  SELECT doc_id, pos, tok,
        |    CASE WHEN ('0x' || substr(md5(doc_id || '_' || pos
        |             || ':r9:span'), 1, 4))::INT < 9830
        |         THEN 1 ELSE 0 END AS st
        |  FROM p),
        |c AS (
        |  SELECT *, max(st) OVER (PARTITION BY doc_id ORDER BY pos
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS cov
        |  FROM m),
        |r AS (
        |  SELECT *, CASE WHEN cov = 1 AND coalesce(lag(cov) OVER
        |      (PARTITION BY doc_id ORDER BY pos), 0) = 0
        |    THEN 1 ELSE 0 END AS rs
        |  FROM c),
        |sp AS (
        |  SELECT *, sum(rs) OVER (PARTITION BY doc_id ORDER BY pos)
        |    AS span
        |  FROM r)
        |SELECT doc_id,
        |  coalesce(string_agg(CASE WHEN cov = 0 THEN tok
        |    WHEN rs = 1 THEN '<extra_id_' || (span - 1) || '>' END,
        |    ' ' ORDER BY pos), '') AS input_text,
        |  coalesce(string_agg(CASE
        |    WHEN cov = 1 AND rs = 1
        |      THEN '<extra_id_' || (span - 1) || '> ' || tok
        |    WHEN cov = 1 THEN tok END, ' ' ORDER BY pos), '')
        |    AS target_text,
        |  CAST(max(span) AS BIGINT) AS n_spans
        |FROM sp GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q110_bigram_lm" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t
        |  FROM documents WHERE doc_id < 300),
        |bi AS (
        |  SELECT unnest(list_transform(range(1, greatest(len(t) - 1, 0) + 1),
        |         i -> t[i] || ' ' || t[i + 1])) AS bg
        |  FROM toks),
        |bc AS (
        |  SELECT string_split(bg, ' ')[1] AS w1,
        |         string_split(bg, ' ')[2] AS w2,
        |         CAST(count(*) AS BIGINT) AS c12
        |  FROM bi GROUP BY 1, 2),
        |uni AS (
        |  SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM
        |    (SELECT unnest(t) AS w1 FROM toks) GROUP BY w1)
        |SELECT bc.w1, bc.w2, bc.c12, uni.c1
        |FROM bc JOIN uni ON bc.w1 = uni.w1
        |ORDER BY bc.w1, bc.w2""".stripMargin,

    "q108_web_pipeline" ->
      """WITH raw AS (
        |  SELECT doc_id, text, source,
        |    CASE doc_id % 8
        |      WHEN 0 THEN 'http://Example.COM/p' || (doc_id // 8)
        |      WHEN 1 THEN 'HTTP://example.com:80/p' || (doc_id // 8)
        |      WHEN 2 THEN 'http://example.com/p' || (doc_id // 8) || '/'
        |      WHEN 3 THEN 'http://example.com/p' || (doc_id // 8)
        |                  || '#sec'
        |      WHEN 4 THEN 'http://example.com/p' || (doc_id // 8)
        |                  || '?utm_source=tw&utm_campaign=x'
        |      WHEN 5 THEN 'http://example.com/p' || (doc_id // 8)
        |                  || '?b=2&a=1'
        |      WHEN 6 THEN 'http://example.com/p' || (doc_id // 8)
        |                  || '?a=1&utm_medium=email&b=2'
        |      ELSE 'https://example.com:443/p' || (doc_id // 8)
        |           || '?fbclid=abc'
        |    END AS url
        |  FROM documents WHERE doc_id < 400),
        |p AS (
        |  SELECT doc_id, text, source, url,
        |    lower(regexp_extract(url,
        |      '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        |    lower(regexp_extract(url,
        |      '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS auth,
        |    regexp_extract(url,
        |      '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS pth,
        |    CASE WHEN regexp_matches(url, '^[^#?]*\?')
        |         THEN list_sort(list_filter(
        |           string_split(regexp_extract(url,
        |             '^[^#?]*\?([^#]*)', 1), '&'),
        |           x -> x <> '' AND NOT regexp_matches(x,
        |             '^(utm_[a-z0-9]+|fbclid|gclid)(=|$)', 'i')))
        |         ELSE NULL END AS kept
        |  FROM raw),
        |n AS (
        |  SELECT doc_id, text, source,
        |    scheme || '://' ||
        |    CASE WHEN scheme = 'http' AND auth LIKE '%:80'
        |           THEN substr(auth, 1, length(auth) - 3)
        |         WHEN scheme = 'https' AND auth LIKE '%:443'
        |           THEN substr(auth, 1, length(auth) - 4)
        |         ELSE auth END ||
        |    CASE WHEN pth = '' THEN '/'
        |         WHEN length(pth) > 1 AND pth LIKE '%/'
        |           THEN substr(pth, 1, length(pth) - 1)
        |         ELSE pth END ||
        |    CASE WHEN kept IS NULL OR len(kept) = 0 THEN ''
        |         ELSE '?' || array_to_string(kept, '&') END AS norm_url
        |  FROM p),
        |u AS (SELECT * FROM n WHERE doc_id IN
        |        (SELECT min(doc_id) FROM n GROUP BY norm_url)),
        |sig AS (
        |  SELECT doc_id, text, source, norm_url,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS nw,
        |    CAST(len(regexp_extract_all(text, '#|\.\.\.')) AS BIGINT)
        |      AS nsym,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS nalpha,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      x -> x IN ('the','be','to','of','and','that','have',
        |                 'with'))) AS BIGINT) AS nstop
        |  FROM u),
        |q AS (
        |  SELECT doc_id, text, source, norm_url FROM sig
        |  WHERE nw BETWEEN 20 AND 100000
        |    AND (CAST(length(text) - nw + 1 AS DOUBLE) /
        |         CAST(nw AS DOUBLE)) BETWEEN 3.0 AND 10.0
        |    AND CAST(nsym AS DOUBLE) / CAST(nw AS DOUBLE) < 0.1
        |    AND CAST(nalpha AS DOUBLE) / CAST(nw AS DOUBLE) > 0.8
        |    AND nstop >= 2)
        |SELECT doc_id, source, norm_url FROM q
        |WHERE doc_id IN (SELECT min(doc_id) FROM q GROUP BY md5(text))
        |ORDER BY doc_id""".stripMargin,

    // the container metadata predicted arithmetically from doc_id —
    // the parser must invert syntheticMp4's box layout for BOTH
    // physical encodings (doc_id%2) to reproduce it
    "q120_mp4_metadata" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 41 = 0 OR doc_id % 37 = 0 THEN NULL
        |       WHEN doc_id % 3 = 0 THEN 'isom'
        |       WHEN doc_id % 3 = 1 THEN 'mp42'
        |       ELSE 'qt  ' END AS brand,
        |  CAST(CASE WHEN doc_id % 41 = 0 OR doc_id % 37 = 0 THEN 0
        |       ELSE 600 * (1 + doc_id % 5) END AS INTEGER) AS timescale,
        |  CAST(CASE WHEN doc_id % 41 = 0 OR doc_id % 37 = 0 THEN 0
        |       ELSE 600 * (1 + doc_id % 5) * (1 + doc_id % 11) + doc_id
        |       END AS BIGINT) AS duration,
        |  CAST(CASE WHEN doc_id % 41 = 0 OR doc_id % 37 = 0 THEN 0
        |       ELSE 1 + doc_id % 3 END AS INTEGER) AS n_traks,
        |  CAST(CASE WHEN doc_id % 41 = 0 OR doc_id % 37 = 0 THEN 0
        |       ELSE (2 + doc_id % 3) // 2 END AS INTEGER)
        |    AS n_video_tracks,
        |  CAST(CASE WHEN doc_id % 41 = 0 OR doc_id % 37 = 0 THEN 0
        |       ELSE (1 + doc_id % 3) // 2 END AS INTEGER)
        |    AS n_audio_tracks,
        |  CAST(CASE WHEN doc_id % 41 = 0 OR doc_id % 37 = 0 THEN 0
        |       ELSE 3 END AS INTEGER) AS n_top_boxes,
        |  (doc_id % 41 != 0 AND doc_id % 37 != 0) AS ok,
        |  CASE WHEN doc_id % 41 = 0 THEN 'empty blob'
        |       WHEN doc_id % 37 = 0 THEN 'truncated box'
        |       ELSE NULL END AS error
        |FROM documents WHERE doc_id < 300 ORDER BY doc_id""".stripMargin,

    // the analytically-derived BYTE-level merge sequence for the
    // planted non-ASCII histogram: é's UTF-8 bytes 0xC3 0xA9 map to
    // 'Ã' '©' under the GPT-2 byte↔unicode table, and their
    // intra-character pair (count 11 = 2·4 + 3) is merge 0
    "q121_bpe_byte_level" ->
      """SELECT * FROM (VALUES
        |  (CAST(0 AS BIGINT), 'Ã', '©', CAST(11 AS BIGINT)),
        |  (1, 'Ã©', 'Ã©', 4),
        |  (2, 'Ã©', 's', 3),
        |  (3, 's', 'e', 2),
        |  (4, 't', 'e', 2),
        |  (100, 'éé', 'Ã©Ã©', 4),
        |  (100, 'és', 'Ã©s', 3),
        |  (100, 'se', 'se', 2),
        |  (100, 'te', 'te', 2)
        |) AS t(step, a, b, n) ORDER BY step, a""".stripMargin,

    // the changefeed over a DROP of run2: odd-only hashes removed
    // (refs hit zero), shared hashes lose the odd occurrences,
    // even-only hashes untouched — same chunk arithmetic as q115
    "q122_catalog_drop" ->
      """WITH chunks AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(1, length(text) + 1, 64),
        |      s -> md5(substr(text, s, 64)))) AS hash
        |  FROM documents WHERE doc_id < 200),
        |e AS (SELECT hash, count(*) AS c FROM chunks
        |      WHERE doc_id % 2 = 0 GROUP BY hash),
        |o AS (SELECT hash, count(*) AS c FROM chunks
        |      WHERE doc_id % 2 = 1 GROUP BY hash)
        |SELECT * FROM (
        |  SELECT 'refs_changed' AS change,
        |         CAST(count(*) AS BIGINT) AS n_hashes,
        |         CAST(sum(e.c + o.c) AS BIGINT) AS sum_refs_from,
        |         CAST(sum(e.c) AS BIGINT) AS sum_refs_to
        |  FROM e JOIN o USING (hash) HAVING count(*) > 0
        |  UNION ALL
        |  SELECT 'removed', CAST(count(*) AS BIGINT),
        |         CAST(sum(c) AS BIGINT), CAST(0 AS BIGINT)
        |  FROM o WHERE hash NOT IN (SELECT hash FROM e)
        |  HAVING count(*) > 0
        |  UNION ALL
        |  SELECT 'unchanged', CAST(count(*) AS BIGINT),
        |         CAST(sum(c) AS BIGINT), CAST(sum(c) AS BIGINT)
        |  FROM e WHERE hash NOT IN (SELECT hash FROM o)
        |  HAVING count(*) > 0
        |) ORDER BY change""".stripMargin,

    // logical invariance under compaction (same chunk arithmetic) plus
    // the physical outcome: one file per bucket, version 3 after
    // commit+commit+compact, both files still cataloged
    "q123_catalog_compact" ->
      """WITH chunks AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(1, length(text) + 1, 64),
        |      s -> md5(substr(text, s, 64)))) AS hash
        |  FROM documents WHERE doc_id < 200),
        |h AS (SELECT hash, count(*) AS c FROM chunks GROUP BY hash)
        |SELECT CAST(count(*) AS BIGINT) AS n_links,
        |       CAST(sum(c) AS BIGINT) AS sum_refs,
        |       CAST(count(DISTINCT substr(hash, 1, 1)) AS INTEGER)
        |         AS n_buckets,
        |       TRUE AS one_file_per_bucket,
        |       CAST(3 AS BIGINT) AS version,
        |       CAST(2 AS BIGINT) AS n_files
        |FROM h""".stripMargin,

    // the sample geometry restated: track t carries 3 samples, sample
    // j is 8+(t*7+j*5)%9 bytes, byte b of it is (t*31+j*17+b)%256 —
    // byte_sum over the extractor's ACTUAL mdat reads must equal the
    // arithmetic
    "q124_mp4_samples" ->
      """WITH d AS (
        |  SELECT doc_id, 1 + doc_id % 3 AS nt FROM documents
        |  WHERE doc_id < 200 AND doc_id % 41 != 0 AND doc_id % 37 != 0),
        |s AS (
        |  SELECT d.doc_id, t.t AS track_id, j.j AS sample_idx,
        |         8 + (t.t * 7 + j.j * 5) % 9 AS sz
        |  FROM d, generate_series(1, 3) AS t(t),
        |       generate_series(0, 2) AS j(j)
        |  WHERE t.t <= d.nt),
        |x AS (
        |  SELECT doc_id, track_id, sample_idx, sz,
        |         (track_id * 31 + sample_idx * 17 + b.b) % 256 AS v
        |  FROM s, generate_series(0, 16) AS b(b)
        |  WHERE b.b < s.sz)
        |SELECT doc_id, CAST(track_id AS INTEGER) AS track_id,
        |       CAST(sample_idx AS INTEGER) AS sample_idx,
        |       CAST(sz AS INTEGER) AS sample_size,
        |       CAST(sample_idx * (90 + 10 * track_id) AS BIGINT) AS dts,
        |       CAST(sample_idx * (90 + 10 * track_id) AS BIGINT) AS pts,
        |       CAST(CASE WHEN sample_idx < 2 THEN 90 + 10 * track_id
        |            ELSE 50 + 10 * track_id END AS INTEGER) AS dur,
        |       CAST(track_id % 3 = 0 OR sample_idx = 0
        |            OR (track_id + sample_idx) % 3 = 0 AS BOOLEAN)
        |         AS is_sync,
        |       CAST(sum(v) AS BIGINT) AS byte_sum
        |FROM x GROUP BY doc_id, track_id, sample_idx, sz
        |ORDER BY doc_id, track_id, sample_idx""".stripMargin,

    // hand-derived id sequences under the q121 merge table: merges get
    // ids 256..260 in learned order ((Ã,©)=256, (Ã©,Ã©)=257, (Ã©,s)=258,
    // (s,e)=259, (t,e)=260); base ids are the raw byte values
    // (s=115, t=116, a=97)
    "q125_bpe_encode_ids" ->
      """SELECT * FROM (VALUES
        |  ('se', '259', 1),
        |  ('set', '259,116', 2),
        |  ('te', '260', 1),
        |  ('éa', '256,97', 2),
        |  ('és', '258', 1),
        |  ('éé', '257', 1)
        |) AS t(word, ids, n_tokens) ORDER BY word""".stripMargin,

    // the sampling policy as pure arithmetic: dts_j = j*(90+10*t),
    // bucket k = dts // 150, first sample per (doc, track, k)
    "q126_mp4_frame_policy" ->
      """WITH d AS (
        |  SELECT doc_id, 1 + doc_id % 3 AS nt FROM documents
        |  WHERE doc_id < 200 AND doc_id % 41 != 0 AND doc_id % 37 != 0),
        |s AS (
        |  SELECT d.doc_id, t.t AS track_id, j.j AS sample_idx,
        |         j.j * (90 + 10 * t.t) AS dts
        |  FROM d, generate_series(1, 3) AS t(t),
        |       generate_series(0, 2) AS j(j)
        |  WHERE t.t <= d.nt),
        |b AS (SELECT *, dts // 150 AS k FROM s)
        |SELECT doc_id, CAST(track_id AS INTEGER) AS track_id,
        |       CAST(k AS BIGINT) AS k,
        |       CAST(min(sample_idx) AS INTEGER) AS sample_idx,
        |       CAST(min(dts) AS BIGINT) AS dts
        |FROM b GROUP BY doc_id, track_id, k
        |ORDER BY doc_id, track_id, k""".stripMargin,

    // keyframe-only: restrict to sync samples first (stss pattern —
    // absent box on t%3==0 means all sync), then first per bucket
    "q127_mp4_keyframe_policy" ->
      """WITH d AS (
        |  SELECT doc_id, 1 + doc_id % 3 AS nt FROM documents
        |  WHERE doc_id < 200 AND doc_id % 41 != 0 AND doc_id % 37 != 0),
        |s AS (
        |  SELECT d.doc_id, t.t AS track_id, j.j AS sample_idx,
        |         j.j * (90 + 10 * t.t) AS dts
        |  FROM d, generate_series(1, 3) AS t(t),
        |       generate_series(0, 2) AS j(j)
        |  WHERE t.t <= d.nt
        |    AND (t.t % 3 = 0 OR j.j = 0 OR (t.t + j.j) % 3 = 0)),
        |b AS (SELECT *, dts // 150 AS k FROM s)
        |SELECT doc_id, CAST(track_id AS INTEGER) AS track_id,
        |       CAST(k AS BIGINT) AS k,
        |       CAST(min(sample_idx) AS INTEGER) AS sample_idx,
        |       CAST(min(dts) AS BIGINT) AS dts,
        |       TRUE AS is_sync
        |FROM b GROUP BY doc_id, track_id, k
        |ORDER BY doc_id, track_id, k""".stripMargin,

    // q110's LM restated, then applied: every bigram OCCURRENCE joins
    // its corpus counts; score = avg of -ln((c12+1)/(c1+V))
    "q128_bigram_lm_score" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t
        |  FROM documents WHERE doc_id < 300),
        |bi AS (
        |  SELECT doc_id,
        |         unnest(list_transform(range(1, greatest(len(t) - 1, 0) + 1),
        |         i -> t[i] || ' ' || t[i + 1])) AS bg
        |  FROM toks),
        |bo AS (
        |  SELECT doc_id, string_split(bg, ' ')[1] AS w1,
        |         string_split(bg, ' ')[2] AS w2
        |  FROM bi),
        |bc AS (SELECT w1, w2, count(*) AS c12 FROM bo GROUP BY 1, 2),
        |uni AS (SELECT w1, count(*) AS c1 FROM
        |  (SELECT unnest(t) AS w1 FROM toks) GROUP BY w1),
        |v AS (SELECT count(DISTINCT w1) AS v
        |      FROM (SELECT unnest(t) AS w1 FROM toks))
        |SELECT bo.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |       round(avg(-ln((bc.c12 + 1.0) / (uni.c1 + v.v))), 6)
        |         AS avg_nll_r
        |FROM bo JOIN bc USING (w1, w2) JOIN uni USING (w1) CROSS JOIN v
        |GROUP BY bo.doc_id ORDER BY bo.doc_id""".stripMargin,

    // cross-impl: DuckDB's levenshtein over the identically
    // constructed candidate set must agree with Spark's on every pair
    "q129_editdist_verify" ->
      """WITH base AS (
        |  SELECT doc_id, text, doc_id % 3 AS cls FROM documents
        |  WHERE doc_id < 300 AND len(text) >= 60),
        |edited AS (
        |  SELECT doc_id + 100000 AS doc_id,
        |    CASE WHEN cls = 0
        |           THEN substr(text, 1, 40) || '#' || substr(text, 42)
        |         WHEN cls = 1
        |           THEN substr(text, 1, 40) || substr(text, 42)
        |         ELSE substr(text, 1, 40) || '#' || substr(text, 42)
        |           || ' ###' END AS text
        |  FROM base),
        |u AS (SELECT doc_id, text FROM base
        |      UNION ALL SELECT doc_id, text FROM edited)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       CAST(levenshtein(a.text, b.text) AS INTEGER) AS dist,
        |       levenshtein(a.text, b.text) <= 2 AS is_dup
        |FROM u a JOIN u b ON substr(a.text, 1, 32) = substr(b.text, 1, 32)
        |  AND a.doc_id < b.doc_id
        |ORDER BY id_a, id_b""".stripMargin,

    // the aHash recomputed without a codec: cell floor-means over the
    // integer pixel field, global floor-mean, bit per cell; the 64-bit
    // hash assembled in HUGEINT (power(2,c) is a double but powers of
    // two are exact) and wrapped to the signed BIGINT Spark emits
    "q130_image_ahash" ->
      """WITH d AS (
        |  SELECT doc_id, 30 + (doc_id % 5) * 7 AS w,
        |         26 + (doc_id % 3) * 9 AS h
        |  FROM documents WHERE doc_id < 120 AND doc_id % 41 != 0),
        |px AS (
        |  SELECT doc_id, w, h,
        |         ((y.y * 8) // h) * 8 + ((x.x * 8) // w) AS c,
        |         ((x.x * 3 + y.y * 5 + 7) * (1 + doc_id % 13) + doc_id)
        |           % 256 AS v
        |  FROM d, generate_series(0, 57) AS x(x),
        |       generate_series(0, 43) AS y(y)
        |  WHERE x.x < w AND y.y < h),
        |cells AS (
        |  SELECT doc_id, w, h, c, sum(v) // count(*) AS cm
        |  FROM px GROUP BY doc_id, w, h, c),
        |mm AS (SELECT doc_id, sum(cm) // 64 AS mean
        |       FROM cells GROUP BY doc_id),
        |hs AS (
        |  SELECT cells.doc_id, w, h,
        |         sum(CASE WHEN cm > mean THEN CAST(power(2, c) AS HUGEINT)
        |             ELSE 0::HUGEINT END) AS s
        |  FROM cells JOIN mm USING (doc_id) GROUP BY cells.doc_id, w, h),
        |res AS (
        |  SELECT doc_id, w, h,
        |    CAST(CASE WHEN s >= 9223372036854775808::HUGEINT
        |         THEN s - 18446744073709551616::HUGEINT ELSE s END
        |      AS BIGINT) AS ahash, TRUE AS ok
        |  FROM hs
        |  UNION ALL
        |  SELECT doc_id, 0, 0, 0, FALSE FROM documents
        |  WHERE doc_id < 120 AND doc_id % 41 = 0)
        |SELECT doc_id, CAST(w AS INTEGER) AS w, CAST(h AS INTEGER) AS h,
        |       CAST(ahash AS BIGINT) AS ahash, ok
        |FROM res ORDER BY doc_id""".stripMargin,

    // both hash sets (originals + tweaked partners), the SAME quarter
    // blocking ((hash >> 16q) & 65535 — arithmetic shift + mask agrees
    // with Spark's), and bit_count(xor) — all arithmetic
    "q131_image_neardup" ->
      """WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 80),
        |u AS (SELECT doc_id, doc_id AS base, 0 AS tw FROM ids
        |      UNION ALL
        |      SELECT doc_id + 200000, doc_id, 31 FROM ids),
        |g AS (SELECT doc_id, base, tw, 30 + (base % 5) * 7 AS w,
        |             26 + (base % 3) * 9 AS h FROM u),
        |px AS (
        |  SELECT doc_id, ((y.y * 8) // h) * 8 + ((x.x * 8) // w) AS c,
        |         CASE WHEN tw > 0 AND (x.x + y.y) % 31 = 0
        |           THEN least(((x.x * 3 + y.y * 5 + 7) * (1 + base % 13)
        |             + base) % 256 + 1, 255)
        |           ELSE ((x.x * 3 + y.y * 5 + 7) * (1 + base % 13)
        |             + base) % 256 END AS v
        |  FROM g, generate_series(0, 57) AS x(x),
        |       generate_series(0, 43) AS y(y)
        |  WHERE x.x < w AND y.y < h),
        |cells AS (SELECT doc_id, c, sum(v) // count(*) AS cm
        |          FROM px GROUP BY doc_id, c),
        |mm AS (SELECT doc_id, sum(cm) // 64 AS mean
        |       FROM cells GROUP BY doc_id),
        |hs AS (
        |  SELECT cells.doc_id,
        |         sum(CASE WHEN cm > mean THEN CAST(power(2, c) AS HUGEINT)
        |             ELSE 0::HUGEINT END) AS s
        |  FROM cells JOIN mm USING (doc_id) GROUP BY cells.doc_id),
        |sig AS (
        |  SELECT doc_id,
        |    CAST(CASE WHEN s >= 9223372036854775808::HUGEINT
        |         THEN s - 18446744073709551616::HUGEINT ELSE s END
        |      AS BIGINT) AS ahash
        |  FROM hs),
        |blk AS (SELECT doc_id, q.q, (ahash >> (16 * q.q)) & 65535 AS qv
        |        FROM sig, generate_series(0, 3) AS q(q)),
        |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |         FROM blk a JOIN blk b
        |           ON a.q = b.q AND a.qv = b.qv AND a.doc_id < b.doc_id),
        |ham AS (
        |  SELECT id_a, id_b, bit_count(xor(sa.ahash, sb.ahash)) AS hamming
        |  FROM cand JOIN sig sa ON sa.doc_id = cand.id_a
        |       JOIN sig sb ON sb.doc_id = cand.id_b)
        |SELECT id_a, id_b, CAST(hamming AS BIGINT) AS hamming
        |FROM ham WHERE hamming <= 3 ORDER BY id_a, id_b""".stripMargin,

    // the track manifest restated: handler/codec from the id-parity
    // formulas, aggregates from the per-sample size/duration/sync
    // arithmetic
    "q132_mp4_track_manifest" ->
      """WITH d AS (
        |  SELECT doc_id, 1 + doc_id % 3 AS nt FROM documents
        |  WHERE doc_id < 200 AND doc_id % 41 != 0 AND doc_id % 37 != 0),
        |s AS (
        |  SELECT d.doc_id, t.t, j.j,
        |         8 + (t.t * 7 + j.j * 5) % 9 AS sz,
        |         CASE WHEN j.j < 2 THEN 90 + 10 * t.t
        |              ELSE 50 + 10 * t.t END AS dur,
        |         CASE WHEN t.t % 3 = 0 OR j.j = 0
        |                OR (t.t + j.j) % 3 = 0 THEN 1 ELSE 0 END AS sy
        |  FROM d, generate_series(1, 3) AS t(t),
        |       generate_series(0, 2) AS j(j)
        |  WHERE t.t <= d.nt)
        |SELECT doc_id, CAST(t AS INTEGER) AS track_id,
        |       CASE WHEN t % 2 = 1 THEN 'vide' ELSE 'soun' END AS handler,
        |       CASE WHEN t % 2 = 0 THEN 'mp4a'
        |            WHEN t % 4 = 3 THEN 'hvc1' ELSE 'avc1' END AS codec,
        |       CAST(count(*) AS INTEGER) AS n_samples,
        |       CAST(sum(sz) AS BIGINT) AS sum_bytes,
        |       CAST(sum(dur) AS BIGINT) AS total_dur,
        |       CAST(sum(sy) AS INTEGER) AS n_sync,
        |       CAST(0 AS INTEGER) AS n_edits
        |FROM s GROUP BY doc_id, t ORDER BY doc_id, track_id""".stripMargin,

    // the whole image pipeline replayed: hashes (q130's construction,
    // base id + tweak for 50..99), quarter blocking, hamming verdict,
    // keep-min drop, survivor manifest
    "q133_image_pipeline" ->
      """WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 100),
        |g AS (SELECT doc_id,
        |             CASE WHEN doc_id >= 50 THEN doc_id - 50
        |                  ELSE doc_id END AS base,
        |             CASE WHEN doc_id >= 50 THEN 31 ELSE 0 END AS tw
        |      FROM ids),
        |geo AS (SELECT doc_id, base, tw, 30 + (base % 5) * 7 AS w,
        |               26 + (base % 3) * 9 AS h FROM g),
        |px AS (
        |  SELECT doc_id, w, h,
        |         ((y.y * 8) // h) * 8 + ((x.x * 8) // w) AS c,
        |         CASE WHEN tw > 0 AND (x.x + y.y) % 31 = 0
        |           THEN least(((x.x * 3 + y.y * 5 + 7) * (1 + base % 13)
        |             + base) % 256 + 1, 255)
        |           ELSE ((x.x * 3 + y.y * 5 + 7) * (1 + base % 13)
        |             + base) % 256 END AS v
        |  FROM geo, generate_series(0, 57) AS x(x),
        |       generate_series(0, 43) AS y(y)
        |  WHERE x.x < w AND y.y < h),
        |cells AS (SELECT doc_id, w, h, c, sum(v) // count(*) AS cm
        |          FROM px GROUP BY doc_id, w, h, c),
        |mm AS (SELECT doc_id, sum(cm) // 64 AS mean
        |       FROM cells GROUP BY doc_id),
        |hs AS (
        |  SELECT cells.doc_id, w, h,
        |         sum(CASE WHEN cm > mean THEN CAST(power(2, c) AS HUGEINT)
        |             ELSE 0::HUGEINT END) AS s
        |  FROM cells JOIN mm USING (doc_id) GROUP BY cells.doc_id, w, h),
        |sig AS (
        |  SELECT doc_id, w, h,
        |    CAST(CASE WHEN s >= 9223372036854775808::HUGEINT
        |         THEN s - 18446744073709551616::HUGEINT ELSE s END
        |      AS BIGINT) AS ahash
        |  FROM hs),
        |blk AS (SELECT doc_id, q.q, (ahash >> (16 * q.q)) & 65535 AS qv
        |        FROM sig, generate_series(0, 3) AS q(q)),
        |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |         FROM blk a JOIN blk b
        |           ON a.q = b.q AND a.qv = b.qv AND a.doc_id < b.doc_id),
        |dropped AS (
        |  SELECT DISTINCT id_b AS doc_id
        |  FROM cand JOIN sig sa ON sa.doc_id = cand.id_a
        |       JOIN sig sb ON sb.doc_id = cand.id_b
        |  WHERE bit_count(xor(sa.ahash, sb.ahash)) <= 3)
        |SELECT sig.doc_id, CAST(w AS INTEGER) AS w, CAST(h AS INTEGER) AS h,
        |       ahash
        |FROM sig LEFT JOIN dropped USING (doc_id)
        |WHERE dropped.doc_id IS NULL
        |ORDER BY sig.doc_id""".stripMargin,

    // q131's arithmetic replay, oriented probe → indexed: id_a is the
    // perturbed probe (200000+), id_b the indexed original
    "q134_image_hamming_index" ->
      """WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 80),
        |u AS (SELECT doc_id, doc_id AS base, 0 AS tw FROM ids
        |      UNION ALL
        |      SELECT doc_id + 200000, doc_id, 31 FROM ids),
        |g AS (SELECT doc_id, base, tw, 30 + (base % 5) * 7 AS w,
        |             26 + (base % 3) * 9 AS h FROM u),
        |px AS (
        |  SELECT doc_id, ((y.y * 8) // h) * 8 + ((x.x * 8) // w) AS c,
        |         CASE WHEN tw > 0 AND (x.x + y.y) % 31 = 0
        |           THEN least(((x.x * 3 + y.y * 5 + 7) * (1 + base % 13)
        |             + base) % 256 + 1, 255)
        |           ELSE ((x.x * 3 + y.y * 5 + 7) * (1 + base % 13)
        |             + base) % 256 END AS v
        |  FROM g, generate_series(0, 57) AS x(x),
        |       generate_series(0, 43) AS y(y)
        |  WHERE x.x < w AND y.y < h),
        |cells AS (SELECT doc_id, c, sum(v) // count(*) AS cm
        |          FROM px GROUP BY doc_id, c),
        |mm AS (SELECT doc_id, sum(cm) // 64 AS mean
        |       FROM cells GROUP BY doc_id),
        |hs AS (
        |  SELECT cells.doc_id,
        |         sum(CASE WHEN cm > mean THEN CAST(power(2, c) AS HUGEINT)
        |             ELSE 0::HUGEINT END) AS s
        |  FROM cells JOIN mm USING (doc_id) GROUP BY cells.doc_id),
        |sig AS (
        |  SELECT doc_id,
        |    CAST(CASE WHEN s >= 9223372036854775808::HUGEINT
        |         THEN s - 18446744073709551616::HUGEINT ELSE s END
        |      AS BIGINT) AS ahash
        |  FROM hs),
        |blk AS (SELECT doc_id, q.q, (ahash >> (16 * q.q)) & 65535 AS qv
        |        FROM sig, generate_series(0, 3) AS q(q)),
        |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |         FROM blk a JOIN blk b ON a.q = b.q AND a.qv = b.qv
        |         WHERE a.doc_id >= 200000 AND b.doc_id < 200000
        |           AND a.doc_id != b.doc_id)
        |SELECT id_a, id_b,
        |       CAST(bit_count(xor(sa.ahash, sb.ahash)) AS BIGINT)
        |         AS hamming
        |FROM cand JOIN sig sa ON sa.doc_id = cand.id_a
        |     JOIN sig sb ON sb.doc_id = cand.id_b
        |WHERE bit_count(xor(sa.ahash, sb.ahash)) <= 3
        |ORDER BY id_a, id_b""".stripMargin,

    // the decimated stream restated: per-block integer means over the
    // synthesis formula (// truncates toward zero, matching Java /
    // on negative sums), digested exactly as decodeAudio reports
    "q135_audio_resample" ->
      """WITH d AS (
        |  SELECT doc_id, 500 + (doc_id % 7) * 100 + (doc_id % 3) AS n
        |  FROM documents WHERE doc_id < 80 AND doc_id % 41 != 0),
        |i AS (
        |  SELECT doc_id,
        |         ((doc_id * 2654435761 + ii.i * 40503) % 65536) - 32768
        |           AS v, ii.i
        |  FROM d, generate_series(0, 1101) AS ii(i) WHERE ii.i < n),
        |b AS (
        |  SELECT doc_id, ii4, sum(v) // count(*) AS ov
        |  FROM (SELECT doc_id, v, i // 4 AS ii4 FROM i)
        |  GROUP BY doc_id, ii4),
        |res AS (
        |  SELECT doc_id, 2000 AS sample_rate,
        |         count(*) AS n_frames, sum(ov) AS sample_sum,
        |         max(abs(ov)) AS peak, TRUE AS ok
        |  FROM b GROUP BY doc_id
        |  UNION ALL
        |  SELECT doc_id, 0, 0, 0, 0, FALSE FROM documents
        |  WHERE doc_id < 80 AND doc_id % 41 = 0)
        |SELECT doc_id, CAST(sample_rate AS INTEGER) AS sample_rate,
        |       CAST(n_frames AS BIGINT) AS n_frames,
        |       CAST(sample_sum AS BIGINT) AS sample_sum,
        |       CAST(peak AS INTEGER) AS peak, ok
        |FROM res ORDER BY doc_id""".stripMargin,

    // hashes replayed arithmetically; edges = blocked pairs (shared
    // 16-bit quarter AND hamming <= 3 — identical hashes included);
    // labels by transitive closure (the q45 pattern), singletons
    // label themselves
    "q136_image_clusters" ->
      """WITH RECURSIVE u AS (
        |  SELECT doc_id, doc_id % 24 AS base, 0 AS tw
        |  FROM documents WHERE doc_id < 120
        |  UNION ALL
        |  SELECT doc_id + 200000, doc_id, 31
        |  FROM documents WHERE doc_id < 24),
        |g AS (SELECT doc_id, base, tw, 30 + (base % 5) * 7 AS w,
        |             26 + (base % 3) * 9 AS h FROM u),
        |px AS (
        |  SELECT doc_id, ((y.y * 8) // h) * 8 + ((x.x * 8) // w) AS c,
        |         CASE WHEN tw > 0 AND (x.x + y.y) % 31 = 0
        |           THEN least(((x.x * 3 + y.y * 5 + 7) * (1 + base % 13)
        |             + base) % 256 + 1, 255)
        |           ELSE ((x.x * 3 + y.y * 5 + 7) * (1 + base % 13)
        |             + base) % 256 END AS v
        |  FROM g, generate_series(0, 57) AS x(x),
        |       generate_series(0, 43) AS y(y)
        |  WHERE x.x < w AND y.y < h),
        |cells AS (SELECT doc_id, c, sum(v) // count(*) AS cm
        |          FROM px GROUP BY doc_id, c),
        |mm AS (SELECT doc_id, sum(cm) // 64 AS mean
        |       FROM cells GROUP BY doc_id),
        |hs AS (
        |  SELECT cells.doc_id,
        |         sum(CASE WHEN cm > mean THEN CAST(power(2, c) AS HUGEINT)
        |             ELSE 0::HUGEINT END) AS s
        |  FROM cells JOIN mm USING (doc_id) GROUP BY cells.doc_id),
        |sig AS (
        |  SELECT doc_id,
        |    CAST(CASE WHEN s >= 9223372036854775808::HUGEINT
        |         THEN s - 18446744073709551616::HUGEINT ELSE s END
        |      AS BIGINT) AS ahash
        |  FROM hs),
        |e0 AS (
        |  SELECT a.doc_id AS s, b.doc_id AS d
        |  FROM sig a, sig b
        |  WHERE a.doc_id < b.doc_id
        |    AND bit_count(xor(a.ahash, b.ahash)) <= 3
        |    AND EXISTS (SELECT 1 FROM generate_series(0, 3) AS q(q)
        |      WHERE ((a.ahash >> (16 * q.q)) & 65535) =
        |            ((b.ahash >> (16 * q.q)) & 65535))),
        |e AS (SELECT s, d FROM e0 UNION SELECT d, s FROM e0),
        |reach(id, r) AS (
        |  SELECT s, s FROM e
        |  UNION
        |  SELECT reach.id, e.d FROM reach JOIN e ON reach.r = e.s),
        |lbl AS (SELECT id, min(r) AS cluster FROM reach GROUP BY id)
        |SELECT sig.doc_id, coalesce(lbl.cluster, sig.doc_id) AS cluster
        |FROM sig LEFT JOIN lbl ON lbl.id = sig.doc_id
        |ORDER BY sig.doc_id""".stripMargin,

    // the q106 gate shape: every original matched by its later-batch
    // twin through the pruned index probe, the within-batch double
    // observed, across exactly the 2 twin-bearing batches
    "q137_streaming_image_dedup" ->
      """SELECT doc_id, CAST(1 AS BOOLEAN) AS found,
        |       CAST(1 AS BOOLEAN) AS within_ok,
        |       CAST(2 AS BIGINT) AS n_twin_batches
        |FROM documents WHERE doc_id < 40 ORDER BY doc_id""".stripMargin,

    // every datasheet number predicted: token/char sums from the text,
    // image hashes + clusters replayed arithmetically over the base
    // formulas, audio frames/peak from the synthesis arithmetic
    "q138_multimodal_datasheet" ->
      """WITH RECURSIVE docs AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id < 100),
        |txt AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |         CAST(sum(len(string_split(text, ' '))) AS BIGINT)
        |           AS n_tokens,
        |         CAST(sum(len(text)) AS BIGINT) AS n_chars
        |  FROM docs),
        |okimg AS (SELECT doc_id, doc_id % 24 AS base FROM docs
        |          WHERE doc_id % 41 != 0),
        |g AS (SELECT doc_id, base, 30 + (base % 5) * 7 AS w,
        |             26 + (base % 3) * 9 AS h FROM okimg),
        |px AS (
        |  SELECT doc_id, ((y.y * 8) // h) * 8 + ((x.x * 8) // w) AS c,
        |         ((x.x * 3 + y.y * 5 + 7) * (1 + base % 13) + base)
        |           % 256 AS v
        |  FROM g, generate_series(0, 57) AS x(x),
        |       generate_series(0, 43) AS y(y)
        |  WHERE x.x < w AND y.y < h),
        |cells AS (SELECT doc_id, c, sum(v) // count(*) AS cm
        |          FROM px GROUP BY doc_id, c),
        |mm AS (SELECT doc_id, sum(cm) // 64 AS mean
        |       FROM cells GROUP BY doc_id),
        |hs AS (
        |  SELECT cells.doc_id,
        |         sum(CASE WHEN cm > mean THEN CAST(power(2, c) AS HUGEINT)
        |             ELSE 0::HUGEINT END) AS s
        |  FROM cells JOIN mm USING (doc_id) GROUP BY cells.doc_id),
        |sig AS (
        |  SELECT doc_id,
        |    CAST(CASE WHEN s >= 9223372036854775808::HUGEINT
        |         THEN s - 18446744073709551616::HUGEINT ELSE s END
        |      AS BIGINT) AS ahash
        |  FROM hs),
        |istat AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_images_ok,
        |         CAST(count(DISTINCT ahash) AS BIGINT)
        |           AS n_distinct_ahash
        |  FROM sig),
        |rsig AS (SELECT min(doc_id) AS id, ahash FROM sig
        |         GROUP BY ahash),
        |e0 AS (
        |  SELECT a.id AS s, b.id AS d FROM rsig a, rsig b
        |  WHERE a.id < b.id
        |    AND bit_count(xor(a.ahash, b.ahash)) <= 3
        |    AND EXISTS (SELECT 1 FROM generate_series(0, 3) AS q(q)
        |      WHERE ((a.ahash >> (16 * q.q)) & 65535) =
        |            ((b.ahash >> (16 * q.q)) & 65535))),
        |e AS (SELECT s, d FROM e0 UNION SELECT d, s FROM e0),
        |reach(id, r) AS (
        |  SELECT s, s FROM e
        |  UNION
        |  SELECT reach.id, e.d FROM reach JOIN e ON reach.r = e.s),
        |lbl AS (SELECT id, min(r) AS cluster FROM reach GROUP BY id),
        |cl AS (
        |  SELECT CAST(count(DISTINCT coalesce(lbl.cluster, rsig.id))
        |    AS BIGINT) AS n_image_clusters
        |  FROM rsig LEFT JOIN lbl ON lbl.id = rsig.id),
        |aud AS (
        |  SELECT CAST(sum(n) AS BIGINT) AS audio_frames,
        |         CAST(max(pk) AS INTEGER) AS audio_peak
        |  FROM (
        |    SELECT d.doc_id, d.n,
        |           max(abs(((d.doc_id * 2654435761 + i.i * 40503)
        |             % 65536) - 32768)) AS pk
        |    FROM (SELECT doc_id, 100 + (doc_id % 5) * 50 AS n
        |          FROM docs WHERE doc_id % 41 != 0) d,
        |         generate_series(0, 299) AS i(i)
        |    WHERE i.i < d.n
        |    GROUP BY d.doc_id, d.n))
        |SELECT txt.*, istat.*, cl.*, aud.* FROM txt, istat, cl, aud"""
        .stripMargin,

    // all three layers replayed: sync frames are j in {0, 2} (the stss
    // pattern for track 1), the PNG pixel field and aHash are the q130
    // arithmetic with seed = base*100 + j*7, pairs share both hashes
    "q139_video_dedup" ->
      """WITH v AS (
        |  SELECT doc_id AS vid, doc_id % 12 AS base FROM documents
        |  WHERE doc_id < 60 AND doc_id % 41 != 0),
        |fr AS (
        |  SELECT DISTINCT base, j.j AS j, 16 + (base % 3) * 8 AS w,
        |         base * 100 + j.j * 7 AS seed
        |  FROM v, (VALUES (0), (2)) AS j(j)),
        |px AS (
        |  SELECT base, j, ((y.y * 8) // 16) * 8 + ((x.x * 8) // w) AS c,
        |         ((x.x * 3 + y.y * 5 + 7) * (1 + seed % 13) + seed)
        |           % 256 AS pv
        |  FROM fr, generate_series(0, 31) AS x(x),
        |       generate_series(0, 15) AS y(y)
        |  WHERE x.x < w),
        |cells AS (SELECT base, j, c, sum(pv) // count(*) AS cm
        |          FROM px GROUP BY base, j, c),
        |mm AS (SELECT base, j, sum(cm) // 64 AS mean
        |       FROM cells GROUP BY base, j),
        |hs AS (
        |  SELECT cells.base, cells.j,
        |         sum(CASE WHEN cm > mean THEN CAST(power(2, c) AS HUGEINT)
        |             ELSE 0::HUGEINT END) AS s
        |  FROM cells JOIN mm USING (base, j)
        |  GROUP BY cells.base, cells.j),
        |sig AS (
        |  SELECT base, j,
        |    CAST(CASE WHEN s >= 9223372036854775808::HUGEINT
        |         THEN s - 18446744073709551616::HUGEINT ELSE s END
        |      AS BIGINT) AS h
        |  FROM hs),
        |vf AS (SELECT v.vid, s.j, s.h FROM v JOIN sig s ON s.base = v.base)
        |SELECT a.vid AS v_a, b.vid AS v_b,
        |       CAST(count(*) AS BIGINT) AS n_shared
        |FROM vf a JOIN vf b ON a.j = b.j AND a.h = b.h AND a.vid < b.vid
        |GROUP BY a.vid, b.vid HAVING count(*) >= 2
        |ORDER BY v_a, v_b""".stripMargin,

    // the dHash recomputed without a codec: 9x8 cell floor-means, bit
    // per horizontal brighter-than comparison at position cy*8+cx
    "q140_image_dhash" ->
      """WITH d AS (
        |  SELECT doc_id, 30 + (doc_id % 5) * 7 AS w,
        |         26 + (doc_id % 3) * 9 AS h
        |  FROM documents WHERE doc_id < 120 AND doc_id % 41 != 0),
        |px AS (
        |  SELECT doc_id, w, h, (y.y * 8) // h AS cy, (x.x * 9) // w AS cx,
        |         ((x.x * 3 + y.y * 5 + 7) * (1 + doc_id % 13) + doc_id)
        |           % 256 AS v
        |  FROM d, generate_series(0, 57) AS x(x),
        |       generate_series(0, 43) AS y(y)
        |  WHERE x.x < w AND y.y < h),
        |cells AS (
        |  SELECT doc_id, w, h, cy, cx, sum(v) // count(*) AS cm
        |  FROM px GROUP BY doc_id, w, h, cy, cx),
        |hs AS (
        |  SELECT l.doc_id, l.w, l.h,
        |         sum(CASE WHEN l.cm > r.cm
        |             THEN CAST(power(2, l.cy * 8 + l.cx) AS HUGEINT)
        |             ELSE 0::HUGEINT END) AS s
        |  FROM cells l JOIN cells r
        |    ON l.doc_id = r.doc_id AND l.cy = r.cy AND r.cx = l.cx + 1
        |  WHERE l.cx < 8
        |  GROUP BY l.doc_id, l.w, l.h),
        |res AS (
        |  SELECT doc_id, w, h,
        |    CAST(CASE WHEN s >= 9223372036854775808::HUGEINT
        |         THEN s - 18446744073709551616::HUGEINT ELSE s END
        |      AS BIGINT) AS dhash, TRUE AS ok
        |  FROM hs
        |  UNION ALL
        |  SELECT doc_id, 0, 0, 0, FALSE FROM documents
        |  WHERE doc_id < 120 AND doc_id % 41 = 0)
        |SELECT doc_id, CAST(w AS INTEGER) AS w, CAST(h AS INTEGER) AS h,
        |       CAST(dhash AS BIGINT) AS dhash, ok
        |FROM res ORDER BY doc_id""".stripMargin,

    // logically identical to q124 — the stco/co64 offset width is a
    // physical detail the extraction sees through; a parser without
    // co64 drops every doc_id%4>=2 row and fails the hash
    "q141_mp4_co64" ->
      """WITH d AS (
        |  SELECT doc_id, 1 + doc_id % 3 AS nt FROM documents
        |  WHERE doc_id < 200 AND doc_id % 41 != 0 AND doc_id % 37 != 0),
        |s AS (
        |  SELECT d.doc_id, t.t AS track_id, j.j AS sample_idx,
        |         8 + (t.t * 7 + j.j * 5) % 9 AS sz
        |  FROM d, generate_series(1, 3) AS t(t),
        |       generate_series(0, 2) AS j(j)
        |  WHERE t.t <= d.nt),
        |x AS (
        |  SELECT doc_id, track_id, sample_idx, sz,
        |         (track_id * 31 + sample_idx * 17 + b.b) % 256 AS v
        |  FROM s, generate_series(0, 16) AS b(b)
        |  WHERE b.b < s.sz)
        |SELECT doc_id, CAST(track_id AS INTEGER) AS track_id,
        |       CAST(sample_idx AS INTEGER) AS sample_idx,
        |       CAST(sz AS INTEGER) AS sample_size,
        |       CAST(sample_idx * (90 + 10 * track_id) AS BIGINT) AS dts,
        |       CAST(sample_idx * (90 + 10 * track_id) AS BIGINT) AS pts,
        |       CAST(CASE WHEN sample_idx < 2 THEN 90 + 10 * track_id
        |            ELSE 50 + 10 * track_id END AS INTEGER) AS dur,
        |       CAST(track_id % 3 = 0 OR sample_idx = 0
        |            OR (track_id + sample_idx) % 3 = 0 AS BOOLEAN)
        |         AS is_sync,
        |       CAST(sum(v) AS BIGINT) AS byte_sum
        |FROM x GROUP BY doc_id, track_id, sample_idx, sz
        |ORDER BY doc_id, track_id, sample_idx""".stripMargin,

    // the pts arithmetic of the ctts+elst fixture: with D = 90+10t and
    // E = 50+10t, pts = [0, D+E, D] while dts = [0, D, 2D]; bucket on
    // pts // 150, keep the first sample BY PTS per bucket
    "q142_mp4_pts_policy" ->
      """WITH d AS (
        |  SELECT doc_id, 1 + doc_id % 3 AS nt FROM documents
        |  WHERE doc_id < 200 AND doc_id % 41 != 0 AND doc_id % 37 != 0),
        |s AS (
        |  SELECT d.doc_id, t.t AS track_id, j.j AS sample_idx,
        |         j.j * (90 + 10 * t.t) AS dts,
        |         CASE j.j WHEN 0 THEN 0
        |                  WHEN 1 THEN 140 + 20 * t.t
        |                  ELSE 90 + 10 * t.t END AS pts
        |  FROM d, generate_series(1, 3) AS t(t),
        |       generate_series(0, 2) AS j(j)
        |  WHERE t.t <= d.nt),
        |b AS (SELECT *, pts // 150 AS k FROM s)
        |SELECT doc_id, CAST(track_id AS INTEGER) AS track_id,
        |       CAST(k AS BIGINT) AS k,
        |       CAST(arg_min(sample_idx, pts) AS INTEGER) AS sample_idx,
        |       CAST(min(pts) AS BIGINT) AS pts,
        |       CAST(arg_min(dts, pts) AS BIGINT) AS dts
        |FROM b GROUP BY doc_id, track_id, k
        |ORDER BY doc_id, track_id, k""".stripMargin,

    // the canonical 16-bit view restated: width map per sample, then
    // truncating-mean downmix per frame (DuckDB's // truncates toward
    // zero exactly like the Java division in the decode loop)
    "q143_audio_widths" ->
      """WITH d AS (
        |  SELECT doc_id,
        |         CASE doc_id % 4 WHEN 0 THEN 8 WHEN 1 THEN 16
        |              WHEN 2 THEN 24 ELSE 32 END AS bits,
        |         1 + (doc_id % 8) // 4 AS ch,
        |         300 + (doc_id % 5) * 50 AS n
        |  FROM documents WHERE doc_id < 160 AND doc_id % 41 != 0),
        |k AS (
        |  SELECT d.doc_id, d.bits, d.ch, kk.k,
        |         ((d.doc_id * 2654435761 + kk.k * 40503) % 65536) - 32768
        |           AS r
        |  FROM d, generate_series(0, 1099) AS kk(k)
        |  WHERE kk.k < d.n * d.ch),
        |c AS (
        |  SELECT doc_id, bits, ch, k // ch AS frame,
        |         CASE WHEN bits = 8
        |              THEN CAST(256 * floor(r / 256.0) AS BIGINT)
        |              ELSE r END AS cv
        |  FROM k),
        |f AS (
        |  SELECT doc_id, bits, ch, frame, sum(cv) // ch AS v
        |  FROM c GROUP BY doc_id, bits, ch, frame),
        |res AS (
        |  SELECT doc_id, 8000 AS sample_rate, ch AS channels, bits,
        |         count(*) AS n_frames, sum(v) AS sample_sum,
        |         max(abs(v)) AS peak, TRUE AS ok
        |  FROM f GROUP BY doc_id, ch, bits
        |  UNION ALL
        |  SELECT doc_id, 0, 0, 0, 0, 0, 0, FALSE FROM documents
        |  WHERE doc_id < 160 AND doc_id % 41 = 0)
        |SELECT doc_id, CAST(sample_rate AS INTEGER) AS sample_rate,
        |       CAST(channels AS INTEGER) AS channels,
        |       CAST(bits AS INTEGER) AS bits,
        |       CAST(n_frames AS BIGINT) AS n_frames,
        |       CAST(sample_sum AS BIGINT) AS sample_sum,
        |       CAST(peak AS INTEGER) AS peak, ok
        |FROM res ORDER BY doc_id""".stripMargin,

    // the integer DCT recomputed without a codec: 32x32 cell floor-
    // means, the SAME 128-entry fixed-point cosine table the kernel
    // hard-codes (q(k) = round(cos(k*pi/64)*4096) stated as literals),
    // full double sum per coefficient in BIGINT, median = 32nd
    // smallest non-DC coefficient, bits assembled in HUGEINT and
    // wrapped to the signed BIGINT Spark emits
    "q144_image_phash" ->
      """WITH d AS (
        |  SELECT doc_id, 34 + (doc_id % 4) * 6 AS w,
        |         33 + (doc_id % 3) * 9 AS h
        |  FROM documents WHERE doc_id < 100 AND doc_id % 41 != 0),
        |qt AS (
        |  SELECT [4096, 4091, 4076, 4052, 4017, 3973, 3920, 3857,
        |    3784, 3703, 3612, 3513, 3406, 3290, 3166, 3035,
        |    2896, 2751, 2598, 2440, 2276, 2106, 1931, 1751,
        |    1567, 1380, 1189, 995, 799, 601, 401, 201,
        |    0, -201, -401, -601, -799, -995, -1189, -1380,
        |    -1567, -1751, -1931, -2106, -2276, -2440, -2598, -2751,
        |    -2896, -3035, -3166, -3290, -3406, -3513, -3612, -3703,
        |    -3784, -3857, -3920, -3973, -4017, -4052, -4076, -4091,
        |    -4096, -4091, -4076, -4052, -4017, -3973, -3920, -3857,
        |    -3784, -3703, -3612, -3513, -3406, -3290, -3166, -3035,
        |    -2896, -2751, -2598, -2440, -2276, -2106, -1931, -1751,
        |    -1567, -1380, -1189, -995, -799, -601, -401, -201,
        |    0, 201, 401, 601, 799, 995, 1189, 1380,
        |    1567, 1751, 1931, 2106, 2276, 2440, 2598, 2751,
        |    2896, 3035, 3166, 3290, 3406, 3513, 3612, 3703,
        |    3784, 3857, 3920, 3973, 4017, 4052, 4076, 4091] AS ql),
        |px AS (
        |  SELECT doc_id, w, h, (y.y * 32) // h AS cy, (x.x * 32) // w AS cx,
        |         ((x.x * 3 + y.y * 5 + 7) * (1 + doc_id % 13) + doc_id)
        |           % 256 AS v
        |  FROM d, generate_series(0, 51) AS x(x),
        |       generate_series(0, 50) AS y(y)
        |  WHERE x.x < w AND y.y < h),
        |cells AS (
        |  SELECT doc_id, w, h, cy, cx, sum(v) // count(*) AS cm
        |  FROM px GROUP BY doc_id, w, h, cy, cx),
        |coef AS (
        |  SELECT c.doc_id, any_value(c.w) AS w, any_value(c.h) AS h,
        |         u.u, v.v,
        |         sum(c.cm * qt.ql[((2 * c.cx + 1) * u.u) % 128 + 1]
        |                  * qt.ql[((2 * c.cy + 1) * v.v) % 128 + 1]) AS cf
        |  FROM cells c
        |  CROSS JOIN generate_series(0, 7) AS u(u)
        |  CROSS JOIN generate_series(0, 7) AS v(v)
        |  CROSS JOIN qt
        |  GROUP BY c.doc_id, u.u, v.v),
        |medv AS (
        |  SELECT doc_id, cf AS med FROM (
        |    SELECT doc_id, cf,
        |           row_number() OVER (PARTITION BY doc_id ORDER BY cf)
        |             AS rn
        |    FROM coef WHERE NOT (u = 0 AND v = 0))
        |  WHERE rn = 32),
        |hs AS (
        |  SELECT coef.doc_id, any_value(coef.w) AS w,
        |         any_value(coef.h) AS h,
        |         sum(CASE WHEN coef.cf > m.med
        |             THEN CAST(power(2, v * 8 + u) AS HUGEINT)
        |             ELSE 0::HUGEINT END) AS s
        |  FROM coef JOIN medv m USING (doc_id)
        |  GROUP BY coef.doc_id),
        |res AS (
        |  SELECT doc_id, w, h,
        |    CAST(CASE WHEN s >= 9223372036854775808::HUGEINT
        |         THEN s - 18446744073709551616::HUGEINT ELSE s END
        |      AS BIGINT) AS phash, TRUE AS ok
        |  FROM hs
        |  UNION ALL
        |  SELECT doc_id, 0, 0, 0, FALSE FROM documents
        |  WHERE doc_id < 100 AND doc_id % 41 = 0)
        |SELECT doc_id, CAST(w AS INTEGER) AS w, CAST(h AS INTEGER) AS h,
        |       CAST(phash AS BIGINT) AS phash, ok
        |FROM res ORDER BY doc_id""".stripMargin,

    // the q142 pts arithmetic plus the empty-edit delay: with D =
    // 90+10t and E = 50+10t, pts = [0, D+E, D] + 2*(30+10t) — the
    // factor 2 IS the movie->media timescale conversion
    "q151_mp4_empty_edit" ->
      """WITH d AS (
        |  SELECT doc_id, 1 + doc_id % 3 AS nt FROM documents
        |  WHERE doc_id < 200 AND doc_id % 41 != 0 AND doc_id % 37 != 0)
        |SELECT d.doc_id, CAST(t.t AS INTEGER) AS track_id,
        |       CAST(j.j AS INTEGER) AS sample_idx,
        |       CAST(j.j * (90 + 10 * t.t) AS BIGINT) AS dts,
        |       CAST(CASE j.j WHEN 0 THEN 0
        |                     WHEN 1 THEN 140 + 20 * t.t
        |                     ELSE 90 + 10 * t.t END
        |            + 2 * (30 + 10 * t.t) AS BIGINT) AS pts
        |FROM d, generate_series(1, 3) AS t(t),
        |     generate_series(0, 2) AS j(j)
        |WHERE t.t <= d.nt
        |ORDER BY doc_id, track_id, sample_idx""".stripMargin,

    // the fixture arithmetic is CONTAINER-MODE-INDEPENDENT: sizes,
    // bytes, dts, ctts+elst pts, durations, and sync flags are the
    // q124/q142 formulas regardless of whether samples sit in stbl or
    // in trun boxes — which is exactly the parity this gate pins
    "q146_mp4_fragmented" ->
      """WITH d AS (
        |  SELECT doc_id, 1 + (doc_id // 3) % 3 AS nt FROM documents
        |  WHERE doc_id < 200 AND doc_id % 41 != 0 AND doc_id % 37 != 0),
        |s AS (
        |  SELECT d.doc_id, t.t AS track_id, j.j AS sample_idx,
        |         8 + (t.t * 7 + j.j * 5) % 9 AS sz
        |  FROM d, generate_series(1, 3) AS t(t),
        |       generate_series(0, 2) AS j(j)
        |  WHERE t.t <= d.nt),
        |x AS (
        |  SELECT doc_id, track_id, sample_idx, sz,
        |         (track_id * 31 + sample_idx * 17 + b.b) % 256 AS v
        |  FROM s, generate_series(0, 16) AS b(b)
        |  WHERE b.b < s.sz)
        |SELECT doc_id, CAST(track_id AS INTEGER) AS track_id,
        |       CAST(sample_idx AS INTEGER) AS sample_idx,
        |       CAST(sz AS INTEGER) AS sample_size,
        |       CAST(sample_idx * (90 + 10 * track_id) AS BIGINT) AS dts,
        |       CAST(CASE sample_idx WHEN 0 THEN 0
        |            WHEN 1 THEN 140 + 20 * track_id
        |            ELSE 90 + 10 * track_id END AS BIGINT) AS pts,
        |       CAST(CASE WHEN sample_idx < 2 THEN 90 + 10 * track_id
        |            ELSE 50 + 10 * track_id END AS INTEGER) AS dur,
        |       CAST(track_id % 3 = 0 OR sample_idx = 0
        |            OR (track_id + sample_idx) % 3 = 0 AS BOOLEAN)
        |         AS is_sync,
        |       CAST(sum(v) AS BIGINT) AS byte_sum
        |FROM x GROUP BY doc_id, track_id, sample_idx, sz
        |ORDER BY doc_id, track_id, sample_idx""".stripMargin,

    // composition restated: the q139 aHash replay for the video leg,
    // the q143 canonical-PCM replay per (audio class, sample) for the
    // audio leg, pairs must survive BOTH
    "q145_av_dedup" ->
      """WITH v AS (
        |  SELECT doc_id AS vid, doc_id % 12 AS vb, doc_id % 8 AS ab
        |  FROM documents WHERE doc_id < 60 AND doc_id % 41 != 0),
        |fr AS (
        |  SELECT DISTINCT vb, j.j AS j, 16 + (vb % 3) * 8 AS w,
        |         vb * 100 + j.j * 7 AS seed
        |  FROM v, (VALUES (0), (2)) AS j(j)),
        |px AS (
        |  SELECT vb, j, ((y.y * 8) // 16) * 8 + ((x.x * 8) // w) AS c,
        |         ((x.x * 3 + y.y * 5 + 7) * (1 + seed % 13) + seed)
        |           % 256 AS pv
        |  FROM fr, generate_series(0, 31) AS x(x),
        |       generate_series(0, 15) AS y(y)
        |  WHERE x.x < w),
        |cells AS (SELECT vb, j, c, sum(pv) // count(*) AS cm
        |          FROM px GROUP BY vb, j, c),
        |mm AS (SELECT vb, j, sum(cm) // 64 AS mean
        |       FROM cells GROUP BY vb, j),
        |hs AS (
        |  SELECT cells.vb, cells.j,
        |         sum(CASE WHEN cm > mean THEN CAST(power(2, c) AS HUGEINT)
        |             ELSE 0::HUGEINT END) AS s
        |  FROM cells JOIN mm USING (vb, j)
        |  GROUP BY cells.vb, cells.j),
        |sig AS (
        |  SELECT vb, j,
        |    CAST(CASE WHEN s >= 9223372036854775808::HUGEINT
        |         THEN s - 18446744073709551616::HUGEINT ELSE s END
        |      AS BIGINT) AS h
        |  FROM hs),
        |vf AS (SELECT v.vid, s.j, s.h FROM v JOIN sig s ON s.vb = v.vb),
        |vp AS (
        |  SELECT a.vid AS v_a, b.vid AS v_b, count(*) AS n_video
        |  FROM vf a JOIN vf b ON a.j = b.j AND a.h = b.h AND a.vid < b.vid
        |  GROUP BY a.vid, b.vid HAVING count(*) >= 2),
        |au AS (
        |  SELECT DISTINCT v.ab, j.j AS j,
        |         CASE v.ab % 4 WHEN 0 THEN 8 WHEN 1 THEN 16
        |              WHEN 2 THEN 24 ELSE 32 END AS bits,
        |         1 + v.ab % 2 AS ch, 60 + j.j * 20 AS n,
        |         v.ab * 1000 + j.j AS seed
        |  FROM v, generate_series(0, 2) AS j(j)),
        |ak AS (
        |  SELECT au.ab, au.j, au.bits, au.ch, g.k,
        |         ((seed * 2654435761 + g.k * 40503) % 65536) - 32768 AS r
        |  FROM au, generate_series(0, 219) AS g(k)
        |  WHERE g.k < au.n * au.ch),
        |ac AS (
        |  SELECT ab, j, ch, k // ch AS frame,
        |         CASE WHEN bits = 8
        |              THEN CAST(256 * floor(r / 256.0) AS BIGINT)
        |              ELSE r END AS cv
        |  FROM ak),
        |af0 AS (
        |  SELECT ab, j, ch, frame, sum(cv) // ch AS val
        |  FROM ac GROUP BY ab, j, ch, frame),
        |dig AS (
        |  SELECT ab, j, count(*) AS nf, sum(val) AS ss,
        |         max(abs(val)) AS pk
        |  FROM af0 GROUP BY ab, j),
        |af AS (SELECT v.vid, d.j, d.nf, d.ss, d.pk
        |       FROM v JOIN dig d ON d.ab = v.ab),
        |ap AS (
        |  SELECT a.vid AS v_a, b.vid AS v_b, count(*) AS n_audio
        |  FROM af a JOIN af b ON a.j = b.j AND a.nf = b.nf
        |    AND a.ss = b.ss AND a.pk = b.pk AND a.vid < b.vid
        |  GROUP BY a.vid, b.vid HAVING count(*) = 3)
        |SELECT vp.v_a, vp.v_b, CAST(n_video AS BIGINT) AS n_video,
        |       CAST(n_audio AS BIGINT) AS n_audio
        |FROM vp JOIN ap USING (v_a, v_b) ORDER BY v_a, v_b""".stripMargin,

    // the q144 fixed-point DCT replayed over BOTH populations (tweak
    // arm for the probes), then quarter blocking + bit_count verify —
    // the q134 adjudication pattern with the third signature
    "q148_phash_hamming_index" ->
      """WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 60),
        |u AS (SELECT doc_id, doc_id AS base, 0 AS tw FROM ids
        |      UNION ALL SELECT doc_id + 200000, doc_id, 3 FROM ids),
        |d AS (SELECT doc_id, base, tw, 34 + (base % 4) * 6 AS w,
        |             33 + (base % 3) * 9 AS h FROM u),
        |qt AS (
        |  SELECT [4096, 4091, 4076, 4052, 4017, 3973, 3920, 3857,
        |    3784, 3703, 3612, 3513, 3406, 3290, 3166, 3035,
        |    2896, 2751, 2598, 2440, 2276, 2106, 1931, 1751,
        |    1567, 1380, 1189, 995, 799, 601, 401, 201,
        |    0, -201, -401, -601, -799, -995, -1189, -1380,
        |    -1567, -1751, -1931, -2106, -2276, -2440, -2598, -2751,
        |    -2896, -3035, -3166, -3290, -3406, -3513, -3612, -3703,
        |    -3784, -3857, -3920, -3973, -4017, -4052, -4076, -4091,
        |    -4096, -4091, -4076, -4052, -4017, -3973, -3920, -3857,
        |    -3784, -3703, -3612, -3513, -3406, -3290, -3166, -3035,
        |    -2896, -2751, -2598, -2440, -2276, -2106, -1931, -1751,
        |    -1567, -1380, -1189, -995, -799, -601, -401, -201,
        |    0, 201, 401, 601, 799, 995, 1189, 1380,
        |    1567, 1751, 1931, 2106, 2276, 2440, 2598, 2751,
        |    2896, 3035, 3166, 3290, 3406, 3513, 3612, 3703,
        |    3784, 3857, 3920, 3973, 4017, 4052, 4076, 4091] AS ql),
        |px AS (
        |  SELECT doc_id, (y.y * 32) // h AS cy, (x.x * 32) // w AS cx,
        |         CASE WHEN tw > 0 AND (x.x + y.y) % tw = 0
        |           THEN least(((x.x * 3 + y.y * 5 + 7) * (1 + base % 13)
        |             + base) % 256 + 1, 255)
        |           ELSE ((x.x * 3 + y.y * 5 + 7) * (1 + base % 13)
        |             + base) % 256 END AS v
        |  FROM d, generate_series(0, 51) AS x(x),
        |       generate_series(0, 50) AS y(y)
        |  WHERE x.x < w AND y.y < h),
        |cells AS (
        |  SELECT doc_id, cy, cx, sum(v) // count(*) AS cm
        |  FROM px GROUP BY doc_id, cy, cx),
        |coef AS (
        |  SELECT c.doc_id, u.u, v.v,
        |         sum(c.cm * qt.ql[((2 * c.cx + 1) * u.u) % 128 + 1]
        |                  * qt.ql[((2 * c.cy + 1) * v.v) % 128 + 1]) AS cf
        |  FROM cells c
        |  CROSS JOIN generate_series(0, 7) AS u(u)
        |  CROSS JOIN generate_series(0, 7) AS v(v)
        |  CROSS JOIN qt
        |  GROUP BY c.doc_id, u.u, v.v),
        |medv AS (
        |  SELECT doc_id, cf AS med FROM (
        |    SELECT doc_id, cf,
        |           row_number() OVER (PARTITION BY doc_id ORDER BY cf)
        |             AS rn
        |    FROM coef WHERE NOT (u = 0 AND v = 0))
        |  WHERE rn = 32),
        |hs AS (
        |  SELECT coef.doc_id,
        |         sum(CASE WHEN coef.cf > m.med
        |             THEN CAST(power(2, v * 8 + u) AS HUGEINT)
        |             ELSE 0::HUGEINT END) AS s
        |  FROM coef JOIN medv m USING (doc_id)
        |  GROUP BY coef.doc_id),
        |sig AS (
        |  SELECT doc_id,
        |    CAST(CASE WHEN s >= 9223372036854775808::HUGEINT
        |         THEN s - 18446744073709551616::HUGEINT ELSE s END
        |      AS BIGINT) AS phash
        |  FROM hs),
        |blk AS (SELECT doc_id, q.q, (phash >> (16 * q.q)) & 65535 AS qv
        |        FROM sig, generate_series(0, 3) AS q(q)),
        |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |         FROM blk a JOIN blk b ON a.q = b.q AND a.qv = b.qv
        |         WHERE a.doc_id >= 200000 AND b.doc_id < 200000)
        |SELECT id_a, id_b,
        |       CAST(bit_count(xor(sa.phash, sb.phash)) AS BIGINT)
        |         AS hamming
        |FROM cand JOIN sig sa ON sa.doc_id = cand.id_a
        |     JOIN sig sb ON sb.doc_id = cand.id_b
        |WHERE bit_count(xor(sa.phash, sb.phash)) <= 3
        |ORDER BY id_a, id_b""".stripMargin,

    // the float fixed-point convention restated: per-sample
    // clamp(raw16*gain) via greatest/least, then the truncating-mean
    // downmix and the digest — all integer arithmetic
    "q147_audio_float" ->
      """WITH d AS (
        |  SELECT doc_id,
        |         CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 2 ELSE 4 END
        |           AS gain,
        |         1 + (doc_id % 6) // 3 AS ch,
        |         200 + (doc_id % 5) * 40 AS n
        |  FROM documents WHERE doc_id < 150 AND doc_id % 41 != 0),
        |k AS (
        |  SELECT d.doc_id, d.gain, d.ch, kk.k,
        |         ((d.doc_id * 2654435761 + kk.k * 40503) % 65536) - 32768
        |           AS r
        |  FROM d, generate_series(0, 719) AS kk(k)
        |  WHERE kk.k < d.n * d.ch),
        |c AS (
        |  SELECT doc_id, gain, ch, k // ch AS frame,
        |         greatest(-32768, least(32767, r * gain)) AS cv
        |  FROM k),
        |f AS (
        |  SELECT doc_id, ch, frame, sum(cv) // ch AS v
        |  FROM c GROUP BY doc_id, ch, frame),
        |res AS (
        |  SELECT doc_id, 8000 AS sample_rate, ch AS channels, 32 AS bits,
        |         count(*) AS n_frames, sum(v) AS sample_sum,
        |         max(abs(v)) AS peak, TRUE AS ok
        |  FROM f GROUP BY doc_id, ch
        |  UNION ALL
        |  SELECT doc_id, 0, 0, 0, 0, 0, 0, FALSE FROM documents
        |  WHERE doc_id < 150 AND doc_id % 41 = 0)
        |SELECT doc_id, CAST(sample_rate AS INTEGER) AS sample_rate,
        |       CAST(channels AS INTEGER) AS channels,
        |       CAST(bits AS INTEGER) AS bits,
        |       CAST(n_frames AS BIGINT) AS n_frames,
        |       CAST(sample_sum AS BIGINT) AS sample_sum,
        |       CAST(peak AS INTEGER) AS peak, ok
        |FROM res ORDER BY doc_id""".stripMargin,

    // the block cap restated as a window count filter; every surviving
    // candidate pair replays the full Levenshtein cross-impl
    "q149_editdist_blockcap" ->
      """WITH base AS (
        |  SELECT doc_id, text FROM documents
        |  WHERE doc_id < 200 AND len(text) >= 60),
        |edited AS (
        |  SELECT doc_id + 100000 AS doc_id,
        |         substr(text, 1, 40) || '#' || substr(text, 42) AS text
        |  FROM base),
        |hot AS (
        |  SELECT 200000 + g AS doc_id,
        |         'COOKIE-BANNER-BOILERPLATE-PREFIX-' || CAST(g AS VARCHAR)
        |           AS text
        |  FROM generate_series(0, 599) t(g)),
        |med AS (
        |  SELECT 300000 + g AS doc_id,
        |         'MEDIUM-SHARED-PREFIX-BLOCK-AAAAA'
        |           || repeat('x', CAST(1 + g % 7 AS INTEGER)) AS text
        |  FROM generate_series(0, 99) t(g)),
        |u AS (SELECT * FROM base UNION ALL SELECT * FROM edited
        |      UNION ALL SELECT * FROM hot UNION ALL SELECT * FROM med),
        |c AS (SELECT doc_id, text, substr(text, 1, 32) AS pfx,
        |             COUNT(*) OVER (PARTITION BY substr(text, 1, 32)) AS bc
        |      FROM u),
        |k AS (SELECT * FROM c WHERE bc <= 500)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       CAST(levenshtein(a.text, b.text) AS INTEGER) AS dist,
        |       levenshtein(a.text, b.text) <= 2 AS is_dup
        |FROM k a JOIN k b ON a.pfx = b.pfx AND a.doc_id < b.doc_id
        |ORDER BY id_a, id_b""".stripMargin,

    // both levels restated as nested window count filters: level-0
    // blocks <= 100 pair on the 32-char prefix, the overflow re-blocks
    // on 64 chars, still-oversized level-1 blocks stay dropped
    "q150_editdist_adaptive" ->
      """WITH base AS (
        |  SELECT doc_id, text FROM documents
        |  WHERE doc_id < 150 AND len(text) >= 60),
        |edited AS (
        |  SELECT doc_id + 100000 AS doc_id,
        |         substr(text, 1, 40) || '#' || substr(text, 42) AS text
        |  FROM base),
        |hotA AS (
        |  SELECT 400000 + g AS doc_id,
        |         'ADAPTIVE-REBLOCK-BOILERPLATE-P32'
        |           || lpad(CAST(g % 10 AS VARCHAR), 4, '0')
        |           || repeat('y', 28)
        |           || repeat('z', CAST(g % 3 AS INTEGER)) AS text
        |  FROM generate_series(0, 299) t(g)),
        |hotB AS (
        |  SELECT 500000 + g AS doc_id,
        |         'STILL-HOT-AT-LEVEL-ONE-PREFIX-XX' || 'SUBK'
        |           || repeat('y', 28) || '-' || CAST(g AS VARCHAR) AS text
        |  FROM generate_series(0, 149) t(g)),
        |salt0 AS (
        |  SELECT 600000 + g AS doc_id,
        |         'SALTED-TIER-LEVEL-ZERO-BLOCK-32C'
        |           || repeat('w', CAST(1 + g % 5 AS INTEGER)) AS text
        |  FROM generate_series(0, 79) t(g)),
        |u AS (SELECT * FROM base UNION ALL SELECT * FROM edited
        |      UNION ALL SELECT * FROM hotA UNION ALL SELECT * FROM hotB
        |      UNION ALL SELECT * FROM salt0),
        |c0 AS (SELECT doc_id, text, substr(text, 1, 32) AS p0,
        |              COUNT(*) OVER (PARTITION BY substr(text, 1, 32))
        |                AS bc0
        |       FROM u),
        |k0 AS (SELECT * FROM c0 WHERE bc0 <= 100),
        |o0 AS (SELECT * FROM c0 WHERE bc0 > 100),
        |c1 AS (SELECT doc_id, text, substr(text, 1, 64) AS p1,
        |              COUNT(*) OVER (PARTITION BY substr(text, 1, 64))
        |                AS bc1
        |       FROM o0),
        |k1 AS (SELECT * FROM c1 WHERE bc1 <= 100),
        |p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |         levenshtein(a.text, b.text) AS d
        |  FROM k0 a JOIN k0 b ON a.p0 = b.p0 AND a.doc_id < b.doc_id
        |  UNION ALL
        |  SELECT a.doc_id, b.doc_id, levenshtein(a.text, b.text)
        |  FROM k1 a JOIN k1 b ON a.p1 = b.p1 AND a.doc_id < b.doc_id)
        |SELECT id_a, id_b, CAST(d AS INTEGER) AS dist, d <= 1 AS is_dup
        |FROM p ORDER BY id_a, id_b""".stripMargin,

    // Bounded-retention streaming dedup: kept = first occurrence per
    // (key, episode) — within an episode, key k's first firing is at
    // offset k (offsets cycle k, k+10 … k+40 over 50 ids), so kept ⇔
    // doc_id % 50 < 10; the episode column re-emits each key once per
    // 10 000 s epoch after the watermark evicts the previous state.
    "q246_streaming_watermark_dedup" ->
      """SELECT doc_id,
        |       CAST(doc_id % 10 AS BIGINT) AS key,
        |       CAST(doc_id // 50 AS BIGINT) AS episode
        |FROM documents
        |WHERE doc_id < 150 AND doc_id % 50 < 10
        |ORDER BY doc_id""".stripMargin,

    // Cost-triggered compaction: deterministic one-file-per-band layout
    // (sigBuckets = 1) gives post-batch counts 8/16/24 against the
    // 20-file threshold — two skips, one fire, 8 files after the
    // rewrite; match constants are the q238 protocol's.
    "q247_streaming_cost_compact" ->
      """SELECT doc_id, CAST(1 AS BOOLEAN) AS found,
        |       CAST(1 AS BOOLEAN) AS within_ok,
        |       CAST(2 AS BIGINT) AS n_skips,
        |       CAST(1 AS BIGINT) AS n_fires,
        |       CAST(8 AS BIGINT) AS files_final
        |FROM documents WHERE doc_id < 50 ORDER BY doc_id""".stripMargin,

    // Pure-streaming state-store resolve: 200 events, hash = id % 40,
    // batch = id // 50, pos = id % 50 ⇒ first occurrence of hash h is
    // id h (batch 0, pos h); every id ≥ 40 is a pointer at it.
    "q248_streaming_state_resolve" ->
      """SELECT concat('h', doc_id % 40) AS hash,
        |       concat('f', doc_id // 50) AS file,
        |       CAST(doc_id % 50 AS BIGINT) AS pos,
        |       doc_id >= 40 AS is_pointer,
        |       'f0' AS target_file,
        |       CAST(doc_id % 40 AS BIGINT) AS target_pos
        |FROM documents WHERE doc_id < 200
        |ORDER BY file, pos""".stripMargin,

    // Streaming as-of enrichment: query generation j (ids 100-199,
    // qq = id-100, key qq % 5, us = 1000j+500+k) enriches from state
    // generation j-1 (id (j-1)*5+k at us = 1000j+k); generation 0 has
    // no at-or-before state.
    "q249_streaming_asof" ->
      """SELECT concat('k', (doc_id - 100) % 5) AS key,
        |       doc_id AS id,
        |       CAST(1000 * ((doc_id - 100) // 5) + 500
        |            + (doc_id - 100) % 5 AS BIGINT) AS us,
        |       (doc_id - 100) // 5 > 0 AS matched,
        |       CAST(CASE WHEN (doc_id - 100) // 5 > 0
        |            THEN 1000 * ((doc_id - 100) // 5) + (doc_id - 100) % 5
        |            ELSE 0 END AS BIGINT) AS state_us,
        |       CAST(CASE WHEN (doc_id - 100) // 5 > 0
        |            THEN ((doc_id - 100) // 5 - 1) * 5 + (doc_id - 100) % 5
        |            ELSE 0 END AS DOUBLE) AS state_value
        |FROM documents WHERE doc_id >= 100 AND doc_id < 200
        |ORDER BY id""".stripMargin,

    // Streaming session windows: per (key = id % 10, group g =
    // (id // 10) // 3) one session of 3 events at offsets 0/4/8 from
    // 100000 + 100g; session end = last event + the 30 s gap.
    "q250_streaming_sessions" ->
      """SELECT CAST(100000 + g * 100 AS BIGINT) AS ss,
        |       CAST(100000 + g * 100 + 8 + 30 AS BIGINT) AS se,
        |       concat('k', k) AS key, CAST(3 AS BIGINT) AS n
        |FROM (SELECT DISTINCT doc_id % 10 AS k,
        |             (doc_id // 10) // 3 AS g
        |      FROM documents WHERE doc_id < 300) t
        |ORDER BY ss, key""".stripMargin,

    // Streaming tumbling windows: per (key = id % 8, window w =
    // (id // 8) // 5) five events at 7 s offsets inside the 1-minute
    // window starting 300000 + 60w.
    "q251_streaming_windowed_counts" ->
      """SELECT CAST(300000 + w * 60 AS BIGINT) AS ws,
        |       concat('k', k) AS key, CAST(5 AS BIGINT) AS n
        |FROM (SELECT DISTINCT doc_id % 8 AS k,
        |             (doc_id // 8) // 5 AS w
        |      FROM documents WHERE doc_id < 240) t
        |ORDER BY ws, key""".stripMargin
  )
}
