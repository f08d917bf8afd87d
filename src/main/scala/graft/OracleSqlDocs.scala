package graft

import graft.functions.AnnPrims

/** DuckDB oracle SQL for the LLM-pipeline queries (p13–p23).
  *
  * These mirror [[graft.functions.TextPrims]] / [[graft.functions.AnnPrims]]
  * primitive-for-primitive: the polynomial hashes stay under 2^63 (no
  * overflow divergence), double math is the same left-to-right fold on both
  * engines (bit-identical under IEEE-754), and the LSH plane literals are
  * printed from the very same Scala doubles the Spark side uses
  * (Double.toString round-trips exactly). Several fragments are assembled
  * programmatically so the two implementations cannot drift apart silently.
  */
object OracleSqlDocs {

  private val P = "1000000007"

  /** charHash twin: fold (h*31 + codepoint) mod P, seed 7. */
  private def hash(s: String): String =
    s"list_reduce(list_prepend(CAST(7 AS BIGINT), list_transform(string_split($s, ''), " +
      s"c -> CAST(ascii(c) AS BIGINT))), (a, b) -> (a*31 + b) % $P)"

  private def norm(s: String): String =
    s"regexp_replace(lower(trim($s)), '\\s+', ' ', 'g')"

  /** Left-to-right double fold of element-wise products (dot product). */
  private def dot(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(list_zip($a, $b), " +
      "z -> CAST(z[1] AS DOUBLE)*CAST(z[2] AS DOUBLE))), (acc, v) -> acc + v)"

  private def cos(a: String, b: String): String =
    s"${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)}))"

  /** Left-to-right double fold of squared element differences — the twin
    * of the codegen'd [[graft.functions.L2Sq]] (same index-order
    * accumulation, so the doubles match bitwise). */
  private def l2sq(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(list_zip($a, $b), " +
      "z -> (CAST(z[1] AS DOUBLE) - CAST(z[2] AS DOUBLE)) * " +
      "(CAST(z[1] AS DOUBLE) - CAST(z[2] AS DOUBLE)))), (acc, v) -> acc + v)"

  /** Shared PQ CTE tail: given `cb` (m, code, cv) already in scope plus
    * `v`, rebuilds every vector's codes (argmin L2 per subspace, ties
    * toward the smaller code — the struct-ordering twin) and its decoded
    * reconstruction `de` (codebook entries concatenated in subspace
    * order). Subspace width rides `len(cv)`; subspace count rides the
    * artifact's DISTINCT m — both pinned by the persisted codebook. */
  private def pqDecodedCtesOver(src: String, vc: String): String =
    s"""sub AS (
       |  SELECT $src.vec_id, ms.m, list_slice($src.$vc, ms.m * ms.sd + 1, (ms.m + 1) * ms.sd) AS sv
       |  FROM $src CROSS JOIN (SELECT DISTINCT m, len(cv) AS sd FROM cb) ms
       |),
       |cscored AS (
       |  SELECT s.vec_id, s.m, c.code, ${l2sq("s.sv", "c.cv")} AS dd
       |  FROM sub s JOIN cb c USING (m)
       |),
       |codes AS (
       |  SELECT vec_id, m, code FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id, m
       |                                 ORDER BY dd ASC, code) AS rn
       |    FROM cscored
       |  ) WHERE rn = 1
       |),
       |decoded AS (
       |  SELECT vec_id, flatten(list(cv ORDER BY m)) AS de
       |  FROM (SELECT co.vec_id, co.m, c.cv
       |        FROM codes co JOIN cb c USING (m, code))
       |  GROUP BY vec_id
       |)""".stripMargin

  private val pqDecodedCtes: String = pqDecodedCtesOver("v", "e")

  /** Exact float32 elementwise subtraction of two REAL lists: a float
    * difference computed in double rounds to the identical float, so this
    * is bit-identical to Spark-side float subtraction (zip_with x − c and
    * the fused CellResidual loop). */
  private def fsub(a: String, b: String): String =
    s"list_transform(list_zip($a, $b), " +
      "z -> CAST(CAST(z[1] AS DOUBLE) - CAST(z[2] AS DOUBLE) AS REAL))"

  /** Shared CTE chain of the residual-PQ twins (p109/p110): coarse
    * lowest-id-8 assignment (ties toward the smaller centroid id),
    * float32 residuals, residual codes + decoded reconstructions from
    * the persisted codebooks, per-cell query residuals for `nProbe`
    * probes, and the residual-ADC candidate distances `sims(query_id,
    * neighbor_id, dist)`. */
  private def pqResidualCtes(cbPath: String, nProbe: Int,
      centsCte: String =
        "cents AS (SELECT vec_id AS cid, e AS ce FROM v ORDER BY vec_id LIMIT 8)")
      : String =
    s"""WITH v AS (SELECT vec_id, embedding AS e FROM embeddings),
       |cb AS (SELECT m, code, cv FROM read_parquet('$cbPath/*.parquet')),
       |$centsCte,
       |scored AS (
       |  SELECT v.vec_id, v.e, c.cid, c.ce, ${cos("v.e", "c.ce")} AS cs
       |  FROM v CROSS JOIN cents c
       |),
       |assigned AS (
       |  SELECT vec_id, e, cid AS cell, ce FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id
       |                                 ORDER BY cs DESC, cid) AS rn
       |    FROM scored
       |  ) WHERE rn = 1
       |),
       |rv AS (
       |  SELECT vec_id, cell, ${fsub("e", "ce")} AS r FROM assigned
       |),
       |${pqDecodedCtesOver("rv", "r")},
       |probes AS (
       |  SELECT vec_id AS query_id, e AS qe, cid AS cell, ce FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id
       |                                 ORDER BY cs DESC, cid) AS rn
       |    FROM scored WHERE vec_id < 20
       |  ) WHERE rn <= $nProbe
       |),
       |qres AS (
       |  SELECT query_id, cell, ${fsub("qe", "ce")} AS qr FROM probes
       |),
       |sims AS (
       |  SELECT q.query_id, a.vec_id AS neighbor_id, ${l2sq("q.qr", "d.de")} AS dist
       |  FROM qres q JOIN (SELECT vec_id, cell FROM assigned) a USING (cell)
       |  JOIN decoded d ON d.vec_id = a.vec_id
       |  WHERE a.vec_id <> q.query_id
       |)""".stripMargin

  /** One hyperplane as a DOUBLE[] literal — e0-suffixed so DuckDB parses
    * DOUBLE, not DECIMAL. */
  private def planeLit(j: Int): String =
    AnnPrims.plane(j).map { d =>
      val s = d.toString
      if (s.contains("E") || s.contains("e")) s else s + "e0"
    }.mkString("[", ", ", "]")

  private def dotPlane(vec: String, j: Int): String = dot(vec, planeLit(j))

  /** signBucket twin: bit j set iff dot(vec, plane_{first+j}) > 0. */
  private def bucket(vec: String, firstPlane: Int, nPlanes: Int): String =
    "CAST(" + (0 until nPlanes).map { j =>
      s"(CASE WHEN ${dotPlane(vec, firstPlane + j)} > CAST(0 AS DOUBLE) THEN ${1L << j} ELSE 0 END)"
    }.mkString(" + ") + " AS BIGINT)"

  /** Shared token/shingle CTE prefix over `documents`. `sh` is the
    * DISTINCT HASHED shingle set (fixed-width longs): token hashes first,
    * then a (acc*31 + v) mod P fold over each k-window — mirroring the
    * Spark side, which never materializes shingle strings. */
  private val shingleCtes: String =
    s"""WITH toks AS (
       |  SELECT doc_id AS id, string_split(${norm("text")}, ' ') AS t FROM documents
       |), thd AS (
       |  SELECT id, list_transform(t, tok -> ${hash("tok")}) AS th FROM toks
       |), shdocs AS (
       |  SELECT id, list_distinct(CASE WHEN len(th) >= 3
       |    THEN [list_reduce(list_prepend(CAST(7 AS BIGINT), th[i:i+2]),
       |          (a, b) -> (a*31 + b) % $P) for i in range(1, len(th)-1)]
       |    ELSE CAST([] AS BIGINT[]) END) AS sh
       |  FROM thd
       |), shn AS (SELECT id, sh FROM shdocs WHERE len(sh) > 0)""".stripMargin

  private val stopList = "('the','a','of','and','to','in','is','on','for','with')"

  /** Shared CTE chain of the trained-quality-scorer twins (p99/p100), up
    * to the coalesced per-document evidence frame `filled`: tokenization,
    * the p18 quality fold as a 0/1 label, hashed-bucket occurrences
    * (charHash mod 4096 — QualityScorer.NumBuckets), NB class counts as
    * conditional sums over the id % 10 <> 0 train split, exact-sign
    * bucket votes, and the per-document rollup. Constants (4096, 10,
    * 0.25) mirror [[graft.text.QualityScorer]]. */
  /** Per-document conditional-bigram LM surprisal CTE chain shared by
    * p138/p139 — the [[graft.text.TextStats.lmPerDoc]] twin. B is
    * interpolated from the Scala constant so the two sides cannot drift;
    * `range(1, len(bs))` is empty for len < 2, which IS the Spark side's
    * size ≥ 2 guard. */
  private val lmPerDocCte: String = {
    val B = graft.text.TextStats.LmBuckets
    s"""WITH toks AS (
       |  SELECT doc_id AS id, string_split(${norm("text")}, ' ') AS t FROM documents
       |), bkt AS (
       |  SELECT id, list_transform(t, tok -> ${hash("tok")} % $B) AS bs FROM toks
       |), prs AS (
       |  SELECT id, [bs[i]*$B + bs[i+1] for i in range(1, len(bs))] AS bgs FROM bkt
       |), ex AS (
       |  SELECT id, unnest(bgs) AS bg FROM prs
       |), c12 AS (
       |  SELECT bg, CAST(sum(CASE WHEN id % 10 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS c12
       |  FROM ex GROUP BY bg
       |), c1 AS (
       |  SELECT bg // $B AS w1, CAST(sum(c12) AS BIGINT) AS c1 FROM c12 GROUP BY 1
       |), sc AS (
       |  SELECT ex.id,
       |         length(bin((c1.c1 + $B) // (c12.c12 + 1))) - 1 AS bits
       |  FROM ex JOIN c12 USING (bg) JOIN c1 ON ex.bg // $B = c1.w1
       |), per AS (
       |  SELECT id, count(*) AS n_bigrams, CAST(sum(bits) AS BIGINT) AS total_bits
       |  FROM sc GROUP BY id
       |)""".stripMargin
  }

  private val scorerFilledCte: String =
    s"""WITH toks AS (
       |  SELECT doc_id AS id, string_split(${norm("text")}, ' ') AS t FROM documents
       |), lab AS (
       |  SELECT id, t,
       |    CASE WHEN least(CAST(1.0 AS DOUBLE), CAST(len(t) AS DOUBLE) / CAST(200.0 AS DOUBLE))
       |         * (CAST(1.0 AS DOUBLE)
       |            - CAST(len(list_filter(t, x -> x IN $stopList)) AS DOUBLE) / len(t))
       |         >= CAST(0.25 AS DOUBLE) THEN 1 ELSE 0 END AS hiq
       |  FROM toks
       |), ex AS (
       |  SELECT id, hiq, unnest(list_transform(t, tok -> ${hash("tok")} % 4096)) AS b FROM lab
       |), model AS (
       |  SELECT b,
       |    CAST(sum(CASE WHEN id % 10 <> 0 AND hiq = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c_pos,
       |    CAST(sum(CASE WHEN id % 10 <> 0 AND hiq = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c_neg
       |  FROM ex GROUP BY b
       |), totals AS (
       |  SELECT CAST(sum(c_pos) AS BIGINT) AS n_pos,
       |         CAST(sum(c_neg) AS BIGINT) AS n_neg
       |  FROM model
       |), voted AS (
       |  SELECT b, (c_pos + c_neg = 0) AS oov,
       |    CASE WHEN CAST(c_pos AS HUGEINT) * n_neg > CAST(c_neg AS HUGEINT) * n_pos THEN 1
       |         WHEN CAST(c_pos AS HUGEINT) * n_neg < CAST(c_neg AS HUGEINT) * n_pos THEN -1
       |         ELSE 0 END AS v
       |  FROM model CROSS JOIN totals
       |), per AS (
       |  SELECT ex.id, CAST(count(*) AS BIGINT) AS n_tokens,
       |    CAST(sum(CASE WHEN oov THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       |    CAST(sum(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT) AS pos_votes,
       |    CAST(sum(CASE WHEN v = -1 THEN 1 ELSE 0 END) AS BIGINT) AS neg_votes,
       |    max(hiq) AS label_hiq
       |  FROM ex JOIN voted USING (b) GROUP BY ex.id
       |), filled AS (
       |  SELECT d.doc_id,
       |    coalesce(per.n_tokens, 0) AS n_tokens,
       |    coalesce(per.n_oov, 0) AS n_oov,
       |    coalesce(per.pos_votes, 0) AS pos_votes,
       |    coalesce(per.neg_votes, 0) AS neg_votes,
       |    CAST(per.label_hiq AS INT) AS label_hiq
       |  FROM documents d LEFT JOIN per ON d.doc_id = per.id
       |)""".stripMargin

  /** Shared CTE chain of the trained language-id twins (p112/p113), up to
    * the per-document frame `lfilled`: hashed-bucket occurrences labeled
    * by the metadata lang, per-(bucket, lang) NB counts over the
    * id % 10 <> 0 train split, the zero-filled class grid, the
    * (smoothed-likelihood DESC, lang ASC) per-bucket argmax vote —
    * (c+1)/(n+4096) in double, correctly rounded on both engines — and
    * the per-document vote rollup with '__oov' abstentions and the 'und'
    * zero-vote fallback. Constants mirror [[graft.text.LangClassifier]]. */
  private val langScoredCte: String =
    s"""WITH toks AS (
       |  SELECT doc_id AS id, lang AS label_lang,
       |         string_split(${norm("text")}, ' ') AS t
       |  FROM documents
       |), ex AS (
       |  SELECT id, label_lang,
       |         unnest(list_transform(t, tok -> ${hash("tok")} % 4096)) AS b
       |  FROM toks
       |), model AS (
       |  SELECT b, label_lang AS lang, CAST(count(*) AS BIGINT) AS c
       |  FROM ex WHERE id % 10 <> 0 GROUP BY b, label_lang
       |), totals AS (
       |  SELECT lang, CAST(sum(c) AS BIGINT) AS n FROM model GROUP BY lang
       |), grid AS (
       |  SELECT g.b, t.lang, t.n, COALESCE(m.c, 0) AS c
       |  FROM (SELECT DISTINCT b FROM model) g CROSS JOIN totals t
       |  LEFT JOIN model m ON m.b = g.b AND m.lang = t.lang
       |), voted AS (
       |  SELECT b, lang AS vlang FROM (
       |    SELECT *, row_number() OVER (PARTITION BY b ORDER BY
       |      (CAST(c + 1 AS DOUBLE) / CAST(n + 4096 AS DOUBLE)) DESC, lang) AS rn
       |    FROM grid) WHERE rn = 1
       |), occ AS (
       |  SELECT e.id, e.label_lang, COALESCE(v.vlang, '__oov') AS vl
       |  FROM ex e LEFT JOIN voted v USING (b)
       |), votes AS (
       |  SELECT id, label_lang, vl, CAST(count(*) AS BIGINT) AS cnt
       |  FROM occ GROUP BY id, label_lang, vl
       |), per AS (
       |  SELECT id, label_lang, CAST(sum(cnt) AS BIGINT) AS n_tokens,
       |    CAST(sum(CASE WHEN vl = '__oov' THEN cnt ELSE 0 END) AS BIGINT) AS n_oov
       |  FROM votes GROUP BY id, label_lang
       |), best AS (
       |  SELECT id, vl, cnt FROM (
       |    SELECT *, row_number() OVER (PARTITION BY id
       |                                 ORDER BY cnt DESC, vl) AS rn
       |    FROM votes WHERE vl <> '__oov') WHERE rn = 1
       |), lfilled AS (
       |  SELECT d.doc_id,
       |    COALESCE(p.n_tokens, 0) AS n_tokens,
       |    COALESCE(p.n_oov, 0) AS n_oov,
       |    COALESCE(bb.cnt, 0) AS top_votes,
       |    COALESCE(bb.vl, 'und') AS predicted_lang,
       |    d.lang AS label_lang
       |  FROM documents d LEFT JOIN per p ON d.doc_id = p.id
       |  LEFT JOIN best bb ON d.doc_id = bb.id
       |)""".stripMargin

  /** Shared CTE chain of the BPE-apply twins (p114/p117), up to `fin`
    * (doc_id, norm, repr, n_bpe_tokens): the persisted merge table drives
    * a recursive CTE replaying the delimited-symbol replace chain — one
    * recursion step per merge rank, each the identical
    * `replace(⟨1⟩l⟨2⟩⟨1⟩r⟨2⟩ → ⟨1⟩lr⟨2⟩)` the Spark fold applies. */
  private def bpeApplyCtes(mergesPath: String): String =
    s"""WITH RECURSIVE m AS (
       |  SELECT merge_rank, l, r FROM read_parquet('$mergesPath/*.parquet')
       |), mx AS (SELECT CAST(coalesce(max(merge_rank), 0) AS INT) AS mm FROM m),
       |d0 AS (
       |  SELECT doc_id, ${norm("text")} AS norm FROM documents
       |), r0 AS (
       |  SELECT doc_id, norm,
       |    array_to_string(list_transform(string_split(norm, ' '), w ->
       |      array_to_string(list_transform(string_split(w, ''),
       |        c -> chr(1) || c || chr(2)), '')
       |      || chr(1) || '</w>' || chr(2)), '') AS repr
       |  FROM d0
       |), steps AS (
       |  SELECT doc_id, norm, repr, 0 AS i FROM r0
       |  UNION ALL
       |  SELECT s.doc_id, s.norm,
       |    replace(s.repr,
       |      chr(1) || m.l || chr(2) || chr(1) || m.r || chr(2),
       |      chr(1) || m.l || m.r || chr(2)),
       |    s.i + 1
       |  FROM steps s JOIN m ON m.merge_rank = s.i + 1
       |), fin AS (
       |  SELECT doc_id, norm, repr,
       |    CAST(len(string_split(substring(repr, 2, length(repr) - 2),
       |      chr(2) || chr(1))) AS BIGINT) AS n_bpe_tokens
       |  FROM steps, mx WHERE i = mm
       |)""".stripMargin

  /** WORD-level twin of [[bpeApplyCtes]] for the coverage queries
    * (p144/p145): the same delimited replace recursion, but over the
    * corpus (word, freq) VOCABULARY — one row per type — ending at
    * `wfin(word, freq, n_tokens)`. */
  private def bpeVocabCtes(mergesPath: String): String =
    s"""WITH RECURSIVE m AS (
       |  SELECT merge_rank, l, r FROM read_parquet('$mergesPath/*.parquet')
       |), mx AS (SELECT CAST(coalesce(max(merge_rank), 0) AS INT) AS mm FROM m),
       |wv AS (
       |  SELECT w AS word, CAST(count(*) AS BIGINT) AS freq FROM (
       |    SELECT unnest(string_split(${norm("text")}, ' ')) AS w FROM documents
       |  ) GROUP BY 1
       |), w0 AS (
       |  SELECT word, freq,
       |    array_to_string(list_transform(string_split(word, ''),
       |      c -> chr(1) || c || chr(2)), '')
       |    || chr(1) || '</w>' || chr(2) AS repr
       |  FROM wv
       |), wsteps AS (
       |  SELECT word, freq, repr, 0 AS i FROM w0
       |  UNION ALL
       |  SELECT s.word, s.freq,
       |    replace(s.repr,
       |      chr(1) || m.l || chr(2) || chr(1) || m.r || chr(2),
       |      chr(1) || m.l || m.r || chr(2)),
       |    s.i + 1
       |  FROM wsteps s JOIN m ON m.merge_rank = s.i + 1
       |), wfin AS (
       |  SELECT word, freq,
       |    CAST(len(string_split(substring(repr, 2, length(repr) - 2),
       |      chr(2) || chr(1))) AS BIGINT) AS n_tokens
       |  FROM wsteps, mx WHERE i = mm
       |)""".stripMargin

  /** The synthesized url of [[graft.ops.DocAnalytics.withUrl]], character
    * for character (scheme/www/extra-segment/query vary by doc_id
    * residues). */
  private val urlSynthSql: String =
    "(CASE WHEN doc_id % 5 = 0 THEN 'http' ELSE 'https' END) || '://' || " +
      "(CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END) || " +
      "source || '-example.com/' || lang || '/doc/' || CAST(doc_id AS VARCHAR) || " +
      "(CASE WHEN doc_id % 4 = 0 THEN '/extra' ELSE '' END) || " +
      "(CASE WHEN doc_id % 7 = 0 THEN '?ref=feed' ELSE '' END)"

  /** Shared url → host/domain CTE prefix of the p101/p102 twins — same
    * anchored RE2/Java-portable regexes as TextCuration.urlParts. */
  private val urlCtes: String =
    s"""WITH u AS (
       |  SELECT doc_id AS id, $urlSynthSql AS url FROM documents
       |), h AS (
       |  SELECT id, url,
       |         regexp_extract(url, '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1) AS host
       |  FROM u
       |)""".stripMargin

  /** simhash twin: 30 per-bit balance folds over the token-hash list. */
  private val simhashExpr: String = {
    val terms = (0 until 30).map { i =>
      s"(CASE WHEN list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        s"list_transform(h, x -> ((x >> $i) % 2)*2 - 1)), (a, b) -> a + b) > 0 " +
        s"THEN ${1L << i} ELSE 0 END)"
    }
    "CAST(" + terms.mkString(" + ") + " AS BIGINT)"
  }


  /** Corpus CTEs of the perceptual queries, ending in
    * `gen(asset_id, raster)`: the planted-variant corpus, plus (when
    * `flat`) the degenerate constant-raster population of
    * [[graft.multimodal.Media.degenerateCorpus]]. */
  private def perceptualGenCtes(flat: Boolean): String = {
    val flatCte = if (!flat) "" else
      s""", flatg AS (
         |  SELECT vec_id + ${graft.multimodal.Media.FlatOffset} AS asset_id,
         |    [42 for i in range(0, 65)] AS raster
         |  FROM embeddings WHERE vec_id % 2 = 0
         |)""".stripMargin
    val genUnion = "SELECT * FROM base UNION ALL SELECT * FROM pert" +
      (if (flat) " UNION ALL SELECT * FROM flatg" else "")
    s"""WITH base AS (
       |  SELECT vec_id AS asset_id,
       |    [(vec_id*31 + 7*i*i + (vec_id % 13)*i) % 256 for i in range(0, 65)] AS raster
       |  FROM embeddings
       |), pert AS (
       |  SELECT vec_id + ${graft.multimodal.Media.VariantOffset} AS asset_id,
       |    [CASE WHEN i % 64 = 1
       |          THEN ((vec_id*31 + 7*i*i + (vec_id % 13)*i) % 256 + 16) % 256
       |          ELSE (vec_id*31 + 7*i*i + (vec_id % 13)*i) % 256 END
       |     for i in range(0, 65)] AS raster
       |  FROM embeddings WHERE vec_id % 4 = 0
       |)$flatCte, gen AS ($genUnion)""".stripMargin
  }

  /** 64-bit Hamming distance between hx/hy hash prefix `p` (4 16-bit
    * words). */
  private def hamSql(p: String): String =
    "CAST(" + (0 until 4).map(j =>
      s"bit_count(xor(hx.$p$j, hy.$p$j))").mkString(" + ") + " AS BIGINT)"

  /** The shared perceptual-hash pipeline over a `gen(asset_id, raster)`
    * CTE chain: hashes (4 16-bit words each for aHash/dHash), the EIGHT
    * 8-bit aHash blocking bands, bucket sizes, the `cap` filter, and the
    * capped candidate set `cand` — mirroring
    * [[graft.multimodal.Media.perceptualNearDup]] clause for clause. */
  private def perceptualCtes(genCtes: String, cap: Long): String = {
    def aband(j: Int): String =
      "CAST(" + (0 until 16).map { k =>
        s"(CASE WHEN raster[${16 * j + k + 1}] * 64 > s THEN ${1 << k} ELSE 0 END)"
      }.mkString(" + ") + s" AS INT) AS a$j"
    def dband(j: Int): String =
      "CAST(" + (0 until 16).map { k =>
        s"(CASE WHEN raster[${16 * j + k + 1}] > raster[${16 * j + k + 2}] THEN ${1 << k} ELSE 0 END)"
      }.mkString(" + ") + s" AS INT) AS d$j"
    val bands = ((0 until 4).map(aband) ++ (0 until 4).map(dband)).mkString(",\n    ")
    val bandedUnion = (0 until 8).map { j =>
      val w = s"a${j / 2}"
      val bv = if (j % 2 == 0) s"$w & 255" else s"$w >> 8"
      s"SELECT asset_id, $j AS bi, $bv AS bv FROM hb"
    }.mkString(" UNION ALL ")
    s"""$genCtes,
       |hs AS (
       |  SELECT asset_id, raster,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT), raster[1:64]),
       |      (a, b) -> a + b) AS s
       |  FROM gen
       |), hb AS (
       |  SELECT asset_id,
       |    $bands
       |  FROM hs
       |), banded AS (
       |  $bandedUnion
       |), bsz AS (
       |  SELECT bi, bv, count(*) AS m FROM banded GROUP BY bi, bv
       |), elig AS (SELECT bi, bv FROM bsz WHERE m <= $cap),
       |cb AS (SELECT banded.* FROM banded JOIN elig USING (bi, bv)),
       |cand AS (
       |  SELECT DISTINCT x.asset_id AS asset_a, y.asset_id AS asset_b
       |  FROM cb x JOIN cb y
       |    ON x.bi = y.bi AND x.bv = y.bv AND x.asset_id < y.asset_id
       |)""".stripMargin
  }

  /** Corpus CTEs of the pHash queries, ending in `gen256(asset_id,
    * raster)` — the 256-byte (16×16) rasters of
    * [[graft.multimodal.Media.ditherCorpus]]: every base asset, the +16
    * histogram variants (id ≡ 0 mod 4), and the clamped ±32 checkerboard
    * dithers (id ≡ 2 mod 4). */
  private def phashGenCtes: String = {
    val form = "(vec_id*31 + 7*i*i + (vec_id % 13)*i) % 256"
    val amp = graft.multimodal.Media.DitherAmp
    s"""WITH base AS (
       |  SELECT vec_id AS asset_id,
       |    [$form for i in range(0, 256)] AS raster
       |  FROM embeddings
       |), pert AS (
       |  SELECT vec_id + ${graft.multimodal.Media.VariantOffset} AS asset_id,
       |    [CASE WHEN i % 64 = 1 THEN ($form + 16) % 256 ELSE $form END
       |     for i in range(0, 256)] AS raster
       |  FROM embeddings WHERE vec_id % 4 = 0
       |), dith AS (
       |  SELECT vec_id + ${graft.multimodal.Media.DitherOffset} AS asset_id,
       |    [CASE WHEN i < 64 THEN least(255, greatest(0, $form
       |        + CASE WHEN i % 2 = 0 THEN $amp ELSE -$amp END))
       |      ELSE $form END for i in range(0, 256)] AS raster
       |  FROM embeddings WHERE vec_id % 4 = 2
       |), gen256 AS (SELECT * FROM base UNION ALL SELECT * FROM pert
       |              UNION ALL SELECT * FROM dith)""".stripMargin
  }

  /** The fixed-point DCT pipeline over `gen256`, ending at
    * `ph(asset_id, p0..p3)` — [[graft.multimodal.Media.phashes]] clause
    * for clause: the 8×16 integer basis literal is generated from the
    * SAME `DctBasis` array the Spark expression carries, the 2-D
    * transform is one 49M-row integer aggregate, DC is dropped, and bit
    * u·8+v−1 is the cross-multiplied above-AC-mean test `f·63 > Σf`. */
  private def phashCtes: String = {
    val t = graft.multimodal.Media.DctBasis
      .map(_.mkString("[", ", ", "]")).mkString("[", ", ", "]")
    val words = (0 until 4).map(w =>
      s"CAST(sum(CASE WHEN bi // 16 = $w AND f*63 > tot " +
        s"THEN (1 << CAST(bi % 16 AS INT)) ELSE 0 END) AS INT) AS p$w")
      .mkString(",\n    ")
    s"""$phashGenCtes,
       |tb AS (SELECT $t AS t),
       |px AS (
       |  SELECT asset_id,
       |    CAST(generate_subscripts(raster, 1) - 1 AS BIGINT) AS i,
       |    CAST(unnest(raster) AS BIGINT) AS r
       |  FROM gen256
       |),
       |co AS (
       |  SELECT asset_id, u, v,
       |    CAST(sum(r * t[u+1][(i % 16)+1] * t[v+1][(i // 16)+1]) AS BIGINT) AS f
       |  FROM px CROSS JOIN tb
       |  CROSS JOIN range(0, 8) uu(u) CROSS JOIN range(0, 8) vv(v)
       |  GROUP BY asset_id, u, v
       |),
       |ac AS (SELECT asset_id, u*8 + v - 1 AS bi, f FROM co
       |       WHERE NOT (u = 0 AND v = 0)),
       |tot AS (SELECT asset_id, CAST(sum(f) AS BIGINT) AS tot FROM ac
       |        GROUP BY asset_id),
       |ph AS (
       |  SELECT ac.asset_id,
       |    $words
       |  FROM ac JOIN tot USING (asset_id) GROUP BY ac.asset_id
       |)""".stripMargin
  }

  /** Final verified pair-list select over the [[perceptualCtes]] chain. */
  private def perceptualPairSelect: String =
    s"""
       |SELECT c.asset_a, c.asset_b,
       |  ${hamSql("a")} AS hamming_a,
       |  ${hamSql("d")} AS hamming_d
       |FROM cand c
       |JOIN hb hx ON hx.asset_id = c.asset_a
       |JOIN hb hy ON hy.asset_id = c.asset_b
       |WHERE ${hamSql("a")} <= 6
       |ORDER BY c.asset_a, c.asset_b""".stripMargin

  /** The IVF-flat SEARCH given a centroid CTE (`cents(cid, ce)`): argmax
    * cell assignment with ties toward the smallest centroid id, a 2-cell
    * probe list per query, and (sim DESC, neighbor_id ASC) top-5 — shared
    * by p38 (lowest-id quantizer) and p50 (trained quantizer read back
    * from the parquet the query persisted), so the two search oracles
    * cannot drift apart. */
  private def ivfSearchSql(centsCte: String): String =
    s"""WITH v AS (SELECT vec_id, embedding AS e FROM embeddings),
       |$centsCte,
       |scored AS (
       |  SELECT v.vec_id, v.e, c.cid, ${cos("v.e", "c.ce")} AS cs
       |  FROM v CROSS JOIN cents c
       |),
       |assigned AS (
       |  SELECT vec_id AS neighbor_id, e AS ne, cid AS cell FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id
       |                                 ORDER BY cs DESC, cid) AS rn
       |    FROM scored
       |  ) WHERE rn = 1
       |),
       |probes AS (
       |  SELECT vec_id AS query_id, e AS qe, cid AS cell FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id
       |                                 ORDER BY cs DESC, cid) AS rn
       |    FROM scored WHERE vec_id < 20
       |  ) WHERE rn <= 2
       |),
       |sims AS (
       |  SELECT query_id, neighbor_id, ${cos("qe", "ne")} AS sim
       |  FROM probes JOIN assigned USING (cell) WHERE neighbor_id <> query_id
       |),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |                               ORDER BY sim DESC, neighbor_id) AS rn
       |  FROM sims
       |)
       |SELECT query_id, CAST(rn AS BIGINT) AS knn_rank, neighbor_id, sim
       |FROM ranked WHERE rn <= 5 ORDER BY query_id, knn_rank""".stripMargin

  /** Parameterized polynomial-hash twin (seed/multiplier/modulus) — the
    * generic form of [[hash]], for the CMS hash-row families (printed
    * from the same [[graft.text.Sketches.CmsParams]] constants the Spark
    * side uses). */
  private def hashWith(s: String, seed: Long, mult: Long, mod: Long): String =
    s"list_reduce(list_prepend(CAST($seed AS BIGINT), list_transform(string_split($s, ''), " +
      s"c -> CAST(ascii(c) AS BIGINT))), (a, b) -> (a*$mult + b) % $mod)"

  /** A Scala double printed as a DuckDB DOUBLE literal (e0-suffixed so it
    * parses DOUBLE, not DECIMAL). */
  private def dblLit(d: Double): String = {
    val s = d.toString
    if (s.contains("E") || s.contains("e")) s else s + "e0"
  }

  /** The p40 synthetic-PII augmentation — the `||` twin of
    * DocAnalytics.piiAugmented's concat chain. */
  private val piiAug: String =
    "text || ' contact user' || doc_id || '@example.com call +1 555 010 ' || doc_id" +
      " || ' ip 10.0.0.' || (doc_id % 256) || ' ref ' || (900000000 + doc_id)"

  /** Word k-gram CTE prefix (distinct hashed k-grams per doc), the
    * generalized form of [[shingleCtes]] for any window size. */
  private def gramCtes(k: Int): String =
    s"""WITH toks AS (
       |  SELECT doc_id AS id, string_split(${norm("text")}, ' ') AS t FROM documents
       |), thd AS (
       |  SELECT id, list_transform(t, tok -> ${hash("tok")}) AS th FROM toks
       |), gr AS (
       |  SELECT id, list_distinct(CASE WHEN len(th) >= $k
       |    THEN [list_reduce(list_prepend(CAST(7 AS BIGINT), th[i:i+${k - 1}]),
       |          (a, b) -> (a*31 + b) % $P) for i in range(1, len(th)-${k - 2})]
       |    ELSE CAST([] AS BIGINT[]) END) AS g
       |  FROM thd
       |)""".stripMargin

  /** MMR twin of [[graft.ann.Similarity.mmrRerank]]: the m-step greedy
    * UNROLLED into generated CTEs, one (anti-join, penalty, argmax)
    * block per step — assembled programmatically from the same λ/(1−λ)
    * Scala doubles the Spark side multiplies by (Double.toString
    * round-trips exactly), so the scores compare bit-for-bit. */
  private def mmrSql(kCand: Int, m: Int, lam: Double): String =
    s"""WITH v AS (SELECT vec_id, embedding AS e FROM embeddings),
       |q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < 20),
       |sims AS (
       |  SELECT query_id, v.vec_id AS neighbor_id, ${cos("qe", "e")} AS sim
       |  FROM q JOIN v ON v.vec_id <> query_id
       |),
       |cand AS (
       |  SELECT query_id, neighbor_id, sim, e FROM (
       |    SELECT s.query_id, s.neighbor_id, s.sim, v.e,
       |      row_number() OVER (PARTITION BY s.query_id
       |        ORDER BY s.sim DESC, s.neighbor_id) AS rn
       |    FROM sims s JOIN v ON v.vec_id = s.neighbor_id) WHERE rn <= $kCand
       |)""".stripMargin + mmrGreedySql(m, lam)

  /** The IVFADC+R search chain (Jégou §VI) ending in
    * `rranked(query_id, neighbor_id, sim, rn)` — the p129 oracle body,
    * replayed from the persisted codebooks at `cbPath`: lowest-id coarse
    * cells, residual decode, nProbe=2 ADC over the kShort-deep
    * shortlist, exact-cosine re-rank. Factored so the deployment MMR
    * config (p161) composes the exact same chain. */
  private def ivfadcRerankCtes(cbPath: String, kShort: Int): String =
    s"""WITH v AS (SELECT vec_id, embedding AS e FROM embeddings),
       |cb AS (SELECT m, code, cv FROM read_parquet(
       |  '$cbPath/*.parquet')),
       |cents AS (SELECT vec_id AS cid, e AS ce FROM v ORDER BY vec_id LIMIT 8),
       |scored AS (
       |  SELECT v.vec_id, v.e, c.cid, c.ce, ${cos("v.e", "c.ce")} AS cs
       |  FROM v CROSS JOIN cents c
       |),
       |assigned AS (
       |  SELECT vec_id, e, cid AS cell, ce FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id
       |                                 ORDER BY cs DESC, cid) AS rn
       |    FROM scored
       |  ) WHERE rn = 1
       |),
       |rv AS (
       |  SELECT vec_id, cell, ${fsub("e", "ce")} AS r FROM assigned
       |),
       |${pqDecodedCtesOver("rv", "r")},
       |probes AS (
       |  SELECT vec_id AS query_id, e AS qe, cid AS cell, ce FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id
       |                                 ORDER BY cs DESC, cid) AS rn
       |    FROM scored WHERE vec_id < 20
       |  ) WHERE rn <= 2
       |),
       |qres AS (
       |  SELECT query_id, cell, ${fsub("qe", "ce")} AS qr FROM probes
       |),
       |psub AS (
       |  SELECT q.query_id, co.vec_id AS neighbor_id, co.m,
       |    ${l2sq(
             "list_slice(q.qr, ms.m * ms.sd + 1, (ms.m + 1) * ms.sd)",
             "c.cv")} AS pd
       |  FROM qres q
       |  JOIN (SELECT vec_id, cell FROM rv) a USING (cell)
       |  JOIN codes co ON co.vec_id = a.vec_id
       |  JOIN (SELECT DISTINCT m, len(cv) AS sd FROM cb) ms ON ms.m = co.m
       |  JOIN cb c ON c.m = co.m AND c.code = co.code
       |  WHERE a.vec_id <> q.query_id
       |),
       |sims AS (
       |  SELECT query_id, neighbor_id,
       |    list_reduce(list_prepend(CAST(0 AS DOUBLE), list(pd ORDER BY m)),
       |      (a, b) -> a + b) AS dist
       |  FROM psub GROUP BY query_id, neighbor_id
       |),
       |short AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |                                 ORDER BY dist ASC, neighbor_id) AS rn
       |    FROM sims
       |  ) WHERE rn <= $kShort
       |),
       |rr AS (
       |  SELECT s.query_id, s.neighbor_id, ${cos("q2.qe2", "v.e")} AS sim
       |  FROM short s
       |  JOIN v ON v.vec_id = s.neighbor_id
       |  JOIN (SELECT vec_id AS query_id, e AS qe2 FROM v WHERE vec_id < 20)
       |    q2 USING (query_id)
       |),
       |rranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |                               ORDER BY sim DESC, neighbor_id) AS rn
       |  FROM rr
       |)""".stripMargin

  /** The m-step MMR greedy as generated CTEs — one (anti-join, penalty,
    * argmax) block per step, continuing a WITH chain that already
    * defined `cand(query_id, neighbor_id, sim, e)`. Assembled from the
    * same λ/(1−λ) Scala doubles the Spark side multiplies by
    * (Double.toString round-trips exactly), so the scores compare
    * bit-for-bit. Shared by p160 (brute-force candidates) and p161 (the
    * IVFADC+R re-ranked shortlist). */
  private def mmrGreedySql(m: Int, lam: Double): String = {
    val lc = s"CAST($lam AS DOUBLE)"
    val mc = s"CAST(${1.0 - lam} AS DOUBLE)"
    val sel1 =
      s""",
         |sel1 AS (
         |  SELECT query_id, CAST(1 AS BIGINT) AS mmr_rank, neighbor_id, sim,
         |         $lc*sim AS mmr_score, e
         |  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
         |          ORDER BY $lc*sim DESC, neighbor_id) AS r1 FROM cand)
         |  WHERE r1 = 1
         |)""".stripMargin
    val steps = (2 to m).map { j =>
      val prev = (1 until j).map(i => s"SELECT * FROM sel$i").mkString(" UNION ALL ")
      s""",
         |prev$j AS ($prev),
         |rem$j AS (
         |  SELECT c.* FROM cand c ANTI JOIN prev$j p
         |    ON p.query_id = c.query_id AND p.neighbor_id = c.neighbor_id
         |),
         |pen$j AS (
         |  SELECT r.query_id, r.neighbor_id, max(${cos("r.e", "p.e")}) AS pen
         |  FROM rem$j r JOIN prev$j p ON p.query_id = r.query_id
         |  GROUP BY 1, 2
         |),
         |sel$j AS (
         |  SELECT query_id, CAST($j AS BIGINT) AS mmr_rank, neighbor_id, sim,
         |         score AS mmr_score, e
         |  FROM (SELECT r.query_id, r.neighbor_id, r.sim, r.e,
         |          $lc*r.sim - $mc*pn.pen AS score,
         |          row_number() OVER (PARTITION BY r.query_id
         |            ORDER BY $lc*r.sim - $mc*pn.pen DESC, r.neighbor_id) AS rj
         |        FROM rem$j r JOIN pen$j pn
         |          ON pn.query_id = r.query_id AND pn.neighbor_id = r.neighbor_id)
         |  WHERE rj = 1
         |)""".stripMargin
    }.mkString
    val all = (1 to m).map(i => s"SELECT * FROM sel$i").mkString(" UNION ALL ")
    sel1 + steps +
      s"""
         |SELECT query_id, mmr_rank, neighbor_id, sim, mmr_score
         |FROM ($all) ORDER BY query_id, mmr_rank""".stripMargin
  }

  /** Shared CTE chain producing simhash near-dup candidates (`cand` with
    * both signatures) — p17's body, also the pair source for p37's
    * connected components. */
  private val simhashCandCtes: String =
    s"""WITH toks AS (
       |  SELECT doc_id AS id, string_split(${norm("text")}, ' ') AS t FROM documents
       |), th AS (SELECT id, list_transform(t, tok -> ${hash("tok")}) AS h FROM toks),
       |sigs AS (SELECT id, $simhashExpr AS sig FROM th),
       |bands0 AS (
       |  SELECT id, sig, r.band AS band, (sig >> (r.band*15)) % 32768 AS bucket
       |  FROM sigs, range(0, 2) r(band)
       |),
       |bsize AS (SELECT band, bucket FROM bands0 GROUP BY band, bucket
       |          HAVING count(*) <= ${graft.text.TextDedup.DefaultMaxBucket}),
       |bands AS (SELECT bands0.* FROM bands0 JOIN bsize USING (band, bucket)),
       |cand AS (
       |  SELECT DISTINCT a.id AS da, a.sig AS sa, b.id AS db, b.sig AS sb
       |  FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id
       |)""".stripMargin

  /** The p14 MinHash-LSH chain, parameterized by the band-bucket cap so
    * the default-cap (p14) and cap-biting (p91) rows share one body and
    * cannot drift. */
  /** The df-capped n-gram Jaccard twin at an arbitrary cap (p15b = 4,
    * p93 = 16): common shingles leave the inverted index before
    * pairing, set sizes stay full — jaccard is a lower bound, exactly
    * `TextDedup.ngramJaccardPairs(MaxDf(cap))`. */
  private def ngramCappedSql(cap: Int): String = shingleCtes +
    s""",
       |sizes AS (SELECT id, len(sh) AS n FROM shn),
       |ex AS (SELECT id, unnest(sh) AS g FROM shn),
       |rare AS (SELECT g FROM (SELECT g, count(*) AS df FROM ex GROUP BY g)
       |         WHERE df <= $cap),
       |exc AS (SELECT ex.id, ex.g FROM ex JOIN rare USING (g)),
       |inter AS (
       |  SELECT a.id AS da, b.id AS db, count(*) AS i
       |  FROM exc a JOIN exc b ON a.g = b.g AND a.id < b.id GROUP BY 1, 2
       |)
       |SELECT da AS doc_a, db AS doc_b, CAST(i AS DOUBLE)/(sa.n + sb.n - i) AS jaccard
       |FROM inter JOIN sizes sa ON da = sa.id JOIN sizes sb ON db = sb.id
       |WHERE CAST(i AS DOUBLE)/(sa.n + sb.n - i) >= CAST(0.8 AS DOUBLE)
       |ORDER BY doc_a, doc_b""".stripMargin

  private def minhashSql(maxBucket: Int): String = shingleCtes +
    s""",
       |sigs AS (
       |  SELECT id, sh, list_transform(range(0, 32), j ->
       |    list_min(list_transform(sh, x ->
       |      (((j*2+1)*2654435761 % $P) * x + ((j*40503+17) % $P)) % $P))) AS sig
       |  FROM shn
       |),
       |bands0 AS (
       |  SELECT id, r.band AS band,
       |    list_reduce(list_prepend(CAST(7 AS BIGINT), sig[r.band*4+1 : r.band*4+4]),
       |                (a, v) -> (a*31 + v) % $P) AS bucket
       |  FROM sigs, range(0, 8) r(band)
       |),
       |bsize AS (SELECT band, bucket FROM bands0 GROUP BY band, bucket
       |          HAVING count(*) <= $maxBucket),
       |bands AS (SELECT bands0.* FROM bands0 JOIN bsize USING (band, bucket)),
       |cand AS (
       |  SELECT DISTINCT a.id AS da, b.id AS db
       |  FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id
       |),
       |ver AS (
       |  SELECT da, db, len(list_intersect(x.sh, y.sh)) AS i,
       |         len(x.sh) AS na, len(y.sh) AS nb
       |  FROM cand JOIN shn x ON da = x.id JOIN shn y ON db = y.id
       |)
       |SELECT da AS doc_a, db AS doc_b, CAST(i AS DOUBLE)/(na + nb - i) AS jaccard
       |FROM ver WHERE CAST(i AS DOUBLE)/(na + nb - i) >= CAST(0.8 AS DOUBLE)
       |ORDER BY doc_a, doc_b""".stripMargin

  /** The p23 multi-table-LSH embedding near-dup chain up to `sims`
    * (candidate pairs with exact cosine) — shared by p23 and the p59
    * component closure so the two cannot drift apart. Auto planes (the
    * round-16 `nearDupPairs` default): the per-table plane count is
    * derived in SQL from count(*) over the vector CTE. */
  private val embPairCtes: String =
    "WITH v AS (SELECT vec_id, embedding AS e FROM embeddings),\n" +
      embPairTailAuto(tables = 4,
        maxBucket = graft.text.TextDedup.DefaultMaxBucket)

  /** The Auto-planes banded-miner tail (`v(vec_id, e)` must be in
    * scope) — the twin of the `nearDupPairs` default configuration,
    * shared by p23/p59 (embeddings table), p122/p127 (hashed-BoW text
    * embeddings) and p164 (biting-cap config): the per-table plane
    * count `p` is derived IN SQL from
    * count(*) over `v` — `least(20, greatest(4, length(bin(n−1)) − 4))`,
    * the integer-exact twin of [[graft.ops.Adaptive.lshPlanes]] at the
    * MINER occupancy target ([[graft.ops.Adaptive.MinerBucketRows]] = 16
    * = 2⁴ expected rows/bucket; floor 4, cap 20; AdaptiveSpec pins the
    * forms together) — and table t buckets over planes [t·p, t·p+p)
    * indexed dynamically into a `tables`×20-plane literal (the plane-cap
    * supply), with the hot-bucket cap / DISTINCT candidate / exact-
    * cosine tail after. */
  private def embPairTailAuto(tables: Int, maxBucket: Int): String = {
    val pls = (0 until tables * 20).map(planeLit).mkString("[", ",\n    ", "]")
    s"""np AS (SELECT least(CAST(20 AS BIGINT), greatest(CAST(4 AS BIGINT),
       |  CAST(length(bin(count(*) - 1)) AS BIGINT) - 4)) AS p FROM v),
       |pl AS (SELECT $pls AS pls),
       |bk0 AS (
       |  SELECT vec_id, e, tbl,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      [CASE WHEN ${dot("e", "pls[tbl*p + j + 1]")} > CAST(0 AS DOUBLE)
       |            THEN (CAST(1 AS BIGINT) << CAST(j AS INT))
       |            ELSE CAST(0 AS BIGINT) END
       |       for j in range(0, p)]), (a, b) -> a + b) AS bucket
       |  FROM v CROSS JOIN np CROSS JOIN pl CROSS JOIN range(0, $tables) t(tbl)
       |),
       |bksize AS (SELECT tbl, bucket FROM bk0 GROUP BY tbl, bucket
       |           HAVING count(*) <= $maxBucket),
       |bk AS (SELECT bk0.* FROM bk0 JOIN bksize USING (tbl, bucket)),
       |cand AS (
       |  SELECT DISTINCT a.vec_id AS va, b.vec_id AS vb
       |  FROM bk a JOIN bk b ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id
       |),
       |sims AS (
       |  SELECT va AS vec_a, vb AS vec_b, ${cos("x.e", "y.e")} AS sim
       |  FROM cand JOIN v x ON va = x.vec_id JOIN v y ON vb = y.vec_id
       |)""".stripMargin
  }

  /** Hashed-BoW text-embedding construction ending at `v(vec_id, e)` —
    * the twin of [[graft.text.TextStats.hashedEmbedding]] (dim 64):
    * integer signed sums per hashed bucket, dense-assembled in j order,
    * cast exactly to REAL. */
  private val hashedEmbCte: String =
    s"""WITH toks AS (
       |  SELECT doc_id AS id, string_split(${norm("text")}, ' ') AS t FROM documents
       |), hx AS (
       |  SELECT id, ${hash("tok")} AS h
       |  FROM (SELECT id, unnest(t) AS tok FROM toks)
       |), ex AS (
       |  SELECT id, h % 64 AS j,
       |    CASE WHEN ((h * 48271) % 998244353) % 2 = 0 THEN 1 ELSE -1 END AS s
       |  FROM hx
       |), sums AS (
       |  SELECT id, j, CAST(sum(s) AS BIGINT) AS sv FROM ex GROUP BY id, j
       |), grid AS (
       |  SELECT d.id, r.range AS j FROM (SELECT DISTINCT id FROM sums) d
       |  CROSS JOIN range(0, 64) r
       |), dense AS (
       |  SELECT g.id, g.j, CAST(COALESCE(s.sv, 0) AS REAL) AS val
       |  FROM grid g LEFT JOIN sums s ON s.id = g.id AND s.j = g.j
       |), v AS (SELECT id AS vec_id, list(val ORDER BY j) AS e FROM dense GROUP BY id)""".stripMargin

  /** The idf-weighted hashed-embedding CTE chain (p126/p127's twin of
    * [[hashedEmbCte]]): per-token document frequency, the log2-quantized
    * integer idf `length(bin(N // df))`, occurrence contribution
    * sign × idf — integer sums throughout, the same dense assembly. */
  private val hashedEmbIdfCte: String =
    s"""WITH toks AS (
       |  SELECT doc_id AS id, string_split(${norm("text")}, ' ') AS t FROM documents
       |), occ AS (
       |  SELECT id, unnest(t) AS tok FROM toks
       |), nd AS (SELECT count(*) AS n FROM documents),
       |dfq AS (
       |  SELECT tok, count(DISTINCT id) AS dfq FROM occ GROUP BY tok
       |), wx AS (
       |  SELECT id, ${hash("tok")} AS h,
       |    CAST(length(bin(n // dfq)) AS BIGINT) AS w
       |  FROM occ JOIN dfq USING (tok) CROSS JOIN nd
       |), ex AS (
       |  SELECT id, h % 64 AS j,
       |    (CASE WHEN ((h * 48271) % 998244353) % 2 = 0 THEN 1 ELSE -1 END) * w AS s
       |  FROM wx
       |), sums AS (
       |  SELECT id, j, CAST(sum(s) AS BIGINT) AS sv FROM ex GROUP BY id, j
       |), grid AS (
       |  SELECT d.id, r.range AS j FROM (SELECT DISTINCT id FROM sums) d
       |  CROSS JOIN range(0, 64) r
       |), dense AS (
       |  SELECT g.id, g.j, CAST(COALESCE(s.sv, 0) AS REAL) AS val
       |  FROM grid g LEFT JOIN sums s ON s.id = g.id AND s.j = g.j
       |), v AS (SELECT id AS vec_id, list(val ORDER BY j) AS e FROM dense GROUP BY id)""".stripMargin

  /** Shared twin of TextStats.repetitionSignals over the planted
    * line-augmented corpus — p131 emits it directly; p132 wraps it
    * with the Gopher thresholds. */
  private val repetitionSignalsSql: String =
      s"""WITH aug AS (
         |  SELECT doc_id, coalesce(text, '') || chr(10)
         |    || substr(coalesce(text, ''), 1, 40) || chr(10)
         |    || substr(coalesce(text, ''), 1, 40) || chr(10)
         |    || substr(coalesce(text, ''), 1, CAST(10 + doc_id % 20 AS INT))
         |    AS text
         |  FROM documents
         |),
         |lines AS (
         |  SELECT doc_id,
         |    list_filter(list_transform(string_split(text, chr(10)),
         |                x -> trim(x)), x -> x <> '') AS ls
         |  FROM aug
         |),
         |lstats AS (
         |  SELECT doc_id,
         |    CAST(len(ls) AS BIGINT) AS n_lines,
         |    CAST(len(ls) - len(list_distinct(ls)) AS BIGINT) AS n_dup_lines,
         |    list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(ls, x -> CAST(len(x) AS BIGINT))),
         |      (a, b) -> a + b) AS line_chars,
         |    list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(list_distinct(ls), x -> CAST(len(x) AS BIGINT))),
         |      (a, b) -> a + b) AS distinct_chars
         |  FROM lines
         |),
         |toks AS (
         |  SELECT doc_id, string_split(${norm("text")}, ' ') AS t,
         |    CAST(len(${norm("text")}) AS BIGINT) AS n_chars
         |  FROM aug
         |),
         |grams2 AS (
         |  SELECT doc_id, unnest(CASE WHEN len(t) >= 2
         |    THEN [t[i] || ' ' || t[i+1] for i in range(1, len(t))]
         |    ELSE CAST([] AS VARCHAR[]) END) AS g
         |  FROM toks
         |),
         |top2 AS (
         |  SELECT doc_id, g, c FROM (
         |    SELECT doc_id, g, CAST(count(*) AS BIGINT) AS c,
         |      row_number() OVER (PARTITION BY doc_id
         |                         ORDER BY count(*) DESC, g) AS rn
         |    FROM grams2 GROUP BY doc_id, g
         |  ) WHERE rn = 1
         |),
         |grams3 AS (
         |  SELECT doc_id, unnest(CASE WHEN len(t) >= 3
         |    THEN [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
         |          for i in range(1, len(t) - 1)]
         |    ELSE CAST([] AS VARCHAR[]) END) AS g
         |  FROM toks
         |),
         |top3 AS (
         |  SELECT doc_id, g, c FROM (
         |    SELECT doc_id, g, CAST(count(*) AS BIGINT) AS c,
         |      row_number() OVER (PARTITION BY doc_id
         |                         ORDER BY count(*) DESC, g) AS rn
         |    FROM grams3 GROUP BY doc_id, g
         |  ) WHERE rn = 1
         |),
         |g5 AS (
         |  SELECT doc_id,
         |    CASE WHEN len(t) >= 5
         |      THEN [t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
         |            || ' ' || t[i+4] for i in range(1, len(t) - 3)]
         |      ELSE CAST([] AS VARCHAR[]) END AS gs
         |  FROM toks
         |),
         |f5 AS (
         |  SELECT doc_id, CAST(len(gs) AS BIGINT) AS n_5grams,
         |    CAST(len(gs) - len(list_distinct(gs)) AS BIGINT) AS n_dup_5grams
         |  FROM g5
         |)
         |SELECT l.doc_id AS id,
         |  l.n_lines,
         |  l.n_dup_lines,
         |  CASE WHEN l.n_lines = 0 THEN CAST(0 AS DOUBLE)
         |       ELSE CAST(l.n_dup_lines AS DOUBLE) / CAST(l.n_lines AS DOUBLE)
         |       END AS dup_line_frac,
         |  CASE WHEN l.line_chars = 0 THEN CAST(0 AS DOUBLE)
         |       ELSE CAST(l.line_chars - l.distinct_chars AS DOUBLE)
         |            / CAST(l.line_chars AS DOUBLE)
         |       END AS dup_line_char_frac,
         |  top2.g AS top_2gram,
         |  CAST(COALESCE(top2.c, 0) AS BIGINT) AS top_2gram_count,
         |  CASE WHEN top2.g IS NULL OR tk.n_chars = 0 THEN CAST(0 AS DOUBLE)
         |       ELSE CAST(top2.c * len(top2.g) AS DOUBLE)
         |            / CAST(tk.n_chars AS DOUBLE)
         |       END AS top_2gram_char_frac,
         |  CASE WHEN top3.g IS NULL OR tk.n_chars = 0 THEN CAST(0 AS DOUBLE)
         |       ELSE CAST(top3.c * len(top3.g) AS DOUBLE)
         |            / CAST(tk.n_chars AS DOUBLE)
         |       END AS top_3gram_char_frac,
         |  f5.n_5grams,
         |  f5.n_dup_5grams,
         |  CASE WHEN f5.n_5grams = 0 THEN CAST(0 AS DOUBLE)
         |       ELSE CAST(f5.n_dup_5grams AS DOUBLE) / CAST(f5.n_5grams AS DOUBLE)
         |       END AS dup_5gram_frac
         |FROM lstats l
         |JOIN toks tk USING (doc_id)
         |LEFT JOIN top2 USING (doc_id)
         |LEFT JOIN top3 USING (doc_id)
         |JOIN f5 USING (doc_id)
         |ORDER BY l.doc_id""".stripMargin

  /** Shared twin of TextStats.gopherRepetitionFilter — p132 emits it
    * directly; p134 rolls it up. */
  private val gopherFilterSql: String =
      ("""SELECT id,
         |  dup_line_frac > CAST(0.30 AS DOUBLE) AS bad_dup_lines,
         |  dup_line_char_frac > CAST(0.20 AS DOUBLE) AS bad_dup_line_chars,
         |  top_2gram_char_frac > CAST(0.20 AS DOUBLE) AS bad_top_2gram,
         |  top_3gram_char_frac > CAST(0.18 AS DOUBLE) AS bad_top_3gram,
         |  dup_5gram_frac > CAST(0.15 AS DOUBLE) AS bad_dup_5grams,
         |  NOT (dup_line_frac > CAST(0.30 AS DOUBLE)
         |    OR dup_line_char_frac > CAST(0.20 AS DOUBLE)
         |    OR top_2gram_char_frac > CAST(0.20 AS DOUBLE)
         |    OR top_3gram_char_frac > CAST(0.18 AS DOUBLE)
         |    OR dup_5gram_frac > CAST(0.15 AS DOUBLE)) AS kept
         |FROM (""".stripMargin + "\n" + repetitionSignalsSql +
        "\n)\nORDER BY id")

  /** Shared twin of TextStats.gopherQualityRules over the planted
    * bullet/ellipsis/stopword-line corpus — p133 emits it directly;
    * p134 rolls it up. */
  /** Shared planted-corpus CTE of the Gopher-quality family (p133/p134
    * consume it via [[gopherQualitySql]]; p137 line-dedups the same
    * corpus): bullet / ellipsis / stopword lines as doc_id functions —
    * the mirror of DocAnalytics.qualityAugmented, defined ONCE so the
    * twins cannot drift apart. */
  private val qualityAugSql: String =
    """aug AS (
      |  SELECT doc_id,
      |    coalesce(text, '') || chr(10) ||
      |    CASE WHEN doc_id % 3 = 0
      |         THEN '• ' || substr(coalesce(text, ''), 1, 20)
      |         ELSE 'plain ' || substr(coalesce(text, ''), 1, 20)
      |         END || chr(10) ||
      |    CASE WHEN doc_id % 4 = 0
      |         THEN substr(coalesce(text, ''), 1, 15) || '...'
      |         ELSE substr(coalesce(text, ''), 1, 15)
      |         END || chr(10) ||
      |    CASE WHEN doc_id % 2 = 0 THEN 'words of and that flow'
      |         ELSE 'words flow' END AS text
      |  FROM documents
      |)""".stripMargin

  private val gopherQualitySql: String =
      s"""WITH $qualityAugSql,
         |base AS (
         |  SELECT doc_id AS id, ${norm("text")} AS nm, text FROM aug
         |),
         |arrs AS (
         |  SELECT id, string_split(nm, ' ') AS t,
         |    list_filter(list_transform(string_split(text, chr(10)),
         |                x -> trim(x)), x -> x <> '') AS ls,
         |    nm
         |  FROM base
         |),
         |counted AS (
         |  SELECT id,
         |    CAST(len(t) AS BIGINT) AS word_count,
         |    list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(t, w -> CAST(len(w) AS BIGINT))),
         |      (a, b) -> a + b) AS len_sum,
         |    CAST(len(list_filter(t, w -> regexp_matches(w, '[a-z]')))
         |      AS BIGINT) AS n_alpha_words,
         |    CAST(len(regexp_extract_all(nm, '#')) AS BIGINT) AS n_hash,
         |    CAST(len(regexp_extract_all(nm, '\\.\\.\\.')) AS BIGINT)
         |      AS n_ellipsis,
         |    CAST(len(list_intersect(list_distinct(t),
         |      ['the','be','to','of','and','that','have','with']))
         |      AS BIGINT) AS n_stops,
         |    CAST(len(ls) AS BIGINT) AS n_lines,
         |    CAST(len(list_filter(ls, x -> starts_with(x, '• ')
         |      OR starts_with(x, '- '))) AS BIGINT) AS n_bullet_lines,
         |    CAST(len(list_filter(ls, x -> ends_with(x, '...')))
         |      AS BIGINT) AS n_ellipsis_lines
         |  FROM arrs
         |),
         |m AS (
         |  SELECT id, word_count,
         |    CAST(len_sum AS DOUBLE) / CAST(word_count AS DOUBLE) AS mean_word_len,
         |    CAST(n_alpha_words AS DOUBLE) / CAST(word_count AS DOUBLE)
         |      AS alpha_word_frac,
         |    CAST(n_hash AS DOUBLE) / CAST(word_count AS DOUBLE)
         |      AS hash_word_ratio,
         |    CAST(n_ellipsis AS DOUBLE) / CAST(word_count AS DOUBLE)
         |      AS ellipsis_word_ratio,
         |    n_stops AS n_distinct_stopwords,
         |    CASE WHEN n_lines = 0 THEN CAST(0 AS DOUBLE)
         |         ELSE CAST(n_bullet_lines AS DOUBLE) / CAST(n_lines AS DOUBLE)
         |         END AS bullet_line_frac,
         |    CASE WHEN n_lines = 0 THEN CAST(0 AS DOUBLE)
         |         ELSE CAST(n_ellipsis_lines AS DOUBLE) / CAST(n_lines AS DOUBLE)
         |         END AS ellipsis_line_frac
         |  FROM counted
         |)
         |SELECT id, word_count, mean_word_len, alpha_word_frac,
         |  hash_word_ratio, ellipsis_word_ratio, n_distinct_stopwords,
         |  bullet_line_frac, ellipsis_line_frac,
         |  (word_count < 50 OR word_count > 100000) AS bad_word_count,
         |  (mean_word_len < CAST(3 AS DOUBLE)
         |    OR mean_word_len > CAST(10 AS DOUBLE)) AS bad_mean_word_len,
         |  (alpha_word_frac < CAST(0.80 AS DOUBLE)) AS bad_alpha_words,
         |  (hash_word_ratio > CAST(0.10 AS DOUBLE)
         |    OR ellipsis_word_ratio > CAST(0.10 AS DOUBLE)) AS bad_symbol_ratio,
         |  (n_distinct_stopwords < 2) AS bad_stopwords,
         |  (bullet_line_frac > CAST(0.90 AS DOUBLE)) AS bad_bullets,
         |  (ellipsis_line_frac > CAST(0.30 AS DOUBLE)) AS bad_ellipsis,
         |  NOT ((word_count < 50 OR word_count > 100000)
         |    OR (mean_word_len < CAST(3 AS DOUBLE)
         |        OR mean_word_len > CAST(10 AS DOUBLE))
         |    OR (alpha_word_frac < CAST(0.80 AS DOUBLE))
         |    OR (hash_word_ratio > CAST(0.10 AS DOUBLE))
         |    OR (ellipsis_word_ratio > CAST(0.10 AS DOUBLE))
         |    OR (n_distinct_stopwords < 2)
         |    OR (bullet_line_frac > CAST(0.90 AS DOUBLE))
         |    OR (ellipsis_line_frac > CAST(0.30 AS DOUBLE))) AS kept
         |FROM m ORDER BY id""".stripMargin

  /** Twin of TextStats.curationReport: one aggregate row per family over
    * the two rule twins, melted into (family, rule, n_flagged, n_docs,
    * frac) rows. Generated from the same rule lists the branches quote,
    * so an added rule cannot silently fall out of the report twin. */
  private val curationReportSql: String = {
    val qRules = Seq("bad_word_count", "bad_mean_word_len",
      "bad_alpha_words", "bad_symbol_ratio", "bad_stopwords", "bad_bullets",
      "bad_ellipsis", "kept")
    val rRules = Seq("bad_dup_lines", "bad_dup_line_chars", "bad_top_2gram",
      "bad_top_3gram", "bad_dup_5grams", "kept")
    def sums(rules: Seq[String]): String = rules.map(r =>
      s"CAST(sum(CASE WHEN $r THEN 1 ELSE 0 END) AS BIGINT) AS $r")
      .mkString(",\n    ")
    def branches(src: String, family: String, rules: Seq[String]): String =
      rules.map(r =>
        s"SELECT '$family' AS family, '$r' AS rule, $r AS n_flagged, " +
        s"n_docs, CAST($r AS DOUBLE) / CAST(n_docs AS DOUBLE) AS frac " +
        s"FROM $src").mkString("\nUNION ALL\n")
    "WITH qa AS (\n  SELECT CAST(count(*) AS BIGINT) AS n_docs,\n    " +
      sums(qRules) + "\n  FROM (\n" + gopherQualitySql + "\n  )\n),\n" +
      "ra AS (\n  SELECT CAST(count(*) AS BIGINT) AS n_docs,\n    " +
      sums(rRules) + "\n  FROM (\n" + gopherFilterSql + "\n  )\n)\n" +
      "SELECT * FROM (\n" + branches("qa", "quality", qRules) +
      "\nUNION ALL\n" + branches("ra", "repetition", rRules) +
      "\n)\nORDER BY family, rule"
  }

  val docs: Map[String, String] = Map(
    "p134_curation_report" -> curationReportSql,
    // hashed-BoW text knn: constructed vectors + the p21 brute-force tail
    "p121_text_knn" -> (hashedEmbCte +
      s""",
         |q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < 20),
         |qsims AS (
         |  SELECT query_id, v.vec_id AS neighbor_id, ${cos("qe", "e")} AS sim
         |  FROM q JOIN v ON v.vec_id <> query_id
         |),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |                               ORDER BY sim DESC, neighbor_id) AS rn
         |  FROM qsims
         |)
         |SELECT query_id, CAST(rn AS BIGINT) AS knn_rank, neighbor_id, sim
         |FROM ranked WHERE rn <= 5 ORDER BY query_id, knn_rank""".stripMargin),

    // p121's idf-weighted config: the same brute-force tail over the
    // weighted vectors
    "p126_text_knn_idf" -> (hashedEmbIdfCte +
      s""",
         |q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < 20),
         |qsims AS (
         |  SELECT query_id, v.vec_id AS neighbor_id, ${cos("qe", "e")} AS sim
         |  FROM q JOIN v ON v.vec_id <> query_id
         |),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |                               ORDER BY sim DESC, neighbor_id) AS rn
         |  FROM qsims
         |)
         |SELECT query_id, CAST(rn AS BIGINT) AS knn_rank, neighbor_id, sim
         |FROM ranked WHERE rn <= 5 ORDER BY query_id, knn_rank""".stripMargin),

    // p122's idf-weighted config: the same banded-miner tail
    "p127_text_embed_neardup_idf" -> (hashedEmbIdfCte + ",\n" +
      embPairTailAuto(tables = 4,
        maxBucket = graft.text.TextDedup.DefaultMaxBucket) +
      s"""
         |SELECT vec_a, vec_b, sim FROM sims
         |WHERE sim >= CAST(0.9 AS DOUBLE) ORDER BY vec_a, vec_b""".stripMargin),

    // embedding-cosine near-dup over TEXT: constructed vectors + the
    // banded-miner tail at cosine >= 0.9 (Auto planes — the round-16
    // default; the twin derives the plane count from count(*) in SQL)
    "p122_text_embed_neardup" -> (hashedEmbCte + ",\n" +
      embPairTailAuto(tables = 4,
        maxBucket = graft.text.TextDedup.DefaultMaxBucket) +
      s"""
         |SELECT vec_a, vec_b, sim FROM sims
         |WHERE sim >= CAST(0.9 AS DOUBLE) ORDER BY vec_a, vec_b""".stripMargin),

    // p122's Auto-planes cap-biting config: the plane count itself is
    // derived IN SQL from count(*) — the integer-exact lshPlanes twin —
    // and the biting cap 100 drops hot sign-buckets at both gate scales
    "p164_text_embed_neardup_auto" -> (hashedEmbCte + ",\n" +
      embPairTailAuto(tables = 4, maxBucket = 100) +
      s"""
         |SELECT vec_a, vec_b, sim FROM sims
         |WHERE sim >= CAST(0.9 AS DOUBLE) ORDER BY vec_a, vec_b""".stripMargin),

    // C4 line-dedup twin of TextDedup.lineDedup over the p133 planted
    // corpus: lines keyed by the SAME two polynomial hashes as p13,
    // keeper = row_number() 1 under (id, lpos), cleanup row-local.
    "p137_line_dedup" ->
      s"""WITH $qualityAugSql,
         |lf AS (
         |  SELECT doc_id AS id,
         |    list_filter(list_transform(string_split(text, chr(10)),
         |                x -> trim(x)), x -> x <> '') AS ls
         |  FROM aug
         |),
         |ex AS (
         |  SELECT id, generate_subscripts(ls, 1) - 1 AS lpos, unnest(ls) AS l
         |  FROM lf
         |),
         |keyed AS (
         |  SELECT id, lpos, ${hash("l")} AS h1,
         |    list_reduce(list_prepend(CAST(11 AS BIGINT),
         |      list_transform(string_split(l, ''),
         |        c -> CAST(ascii(c) AS BIGINT))),
         |      (a, b) -> (a*37 + b) % 998244353) AS h2
         |  FROM ex
         |),
         |marked AS (
         |  SELECT id, lpos,
         |    count(*) OVER (PARTITION BY h1, h2) AS cnt,
         |    row_number() OVER (PARTITION BY h1, h2 ORDER BY id, lpos) AS rn
         |  FROM keyed
         |),
         |rmv AS (
         |  SELECT id, list_sort(list(lpos)) AS rm
         |  FROM marked WHERE cnt >= 2 AND rn > 1 GROUP BY id
         |),
         |cl AS (
         |  SELECT lf.id, len(lf.ls) AS n_lines,
         |    coalesce(len(r.rm), 0) AS n_removed,
         |    list_filter(lf.ls, (x, i) ->
         |      len(list_filter(coalesce(r.rm, CAST([] AS BIGINT[])),
         |          p -> p = i - 1)) = 0) AS cls
         |  FROM lf LEFT JOIN rmv r USING (id)
         |)
         |SELECT id AS doc_id, CAST(n_lines AS BIGINT) AS n_lines,
         |  CAST(n_removed AS BIGINT) AS n_removed,
         |  coalesce(array_to_string(cls, chr(10)), '') AS cleaned_text
         |FROM cl ORDER BY doc_id""".stripMargin,

    "p13_exact_dedup" ->
      s"""SELECT ${hash(norm("text"))} AS text_hash,
         |       list_reduce(list_prepend(CAST(11 AS BIGINT),
         |         list_transform(string_split(${norm("text")}, ''),
         |           c -> CAST(ascii(c) AS BIGINT))),
         |         (a, b) -> (a*37 + b) % 998244353) AS text_hash2,
         |       MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
         |FROM documents GROUP BY 1, 2 ORDER BY text_hash, text_hash2""".stripMargin,

    // span-level dedup twin of TextDedup.spanDedup (k = 8, minCount = 2):
    // positional window keys are the SAME packed two-fold hashes
    // (w1 mod P)·P2 + (w2 mod P2) over the charHash token hashes; the
    // canonical keeper is row_number() = 1 under (id, pos) — the argmin
    // the Spark side takes as min(struct(id, pos)) — and removal is the
    // same 1-based-index list_filter coverage test (Spark's lambda index
    // is 0-based, hence the i-1). array_to_string of an empty list is
    // NULL in DuckDB where Spark's array_join gives '' — coalesced.
    // extents twin of TextDedup.dupSpanExtents: the p87 window-key fold,
    // then count >= 2 marks duplicated starts (keepers INCLUDED), then
    // per-id gaps-and-islands (new extent iff pos > lag + 8) and the
    // token slice for the covered text.
    "p135_dup_span_extents" ->
      s"""WITH toks AS (
         |  SELECT doc_id AS id, string_split(${norm("coalesce(text, '')")}, ' ') AS t FROM documents
         |), thd AS (
         |  SELECT id, list_transform(t, tok -> ${hash("tok")}) AS th FROM toks
         |), win AS (
         |  SELECT id, CASE WHEN len(th) >= 8
         |    THEN [list_reduce(list_prepend(CAST(7 AS BIGINT), th[i:i+7]),
         |            (a, b) -> (a*31 + b) % $P) * 998244353
         |          + list_reduce(list_prepend(CAST(11 AS BIGINT), th[i:i+7]),
         |            (a, b) -> (a*37 + b) % 998244353)
         |          for i in range(1, len(th)-6)]
         |    ELSE CAST([] AS BIGINT[]) END AS ws
         |  FROM thd
         |), ex AS (
         |  SELECT id, unnest(ws) AS wh, generate_subscripts(ws, 1) - 1 AS pos FROM win
         |), dup AS (
         |  SELECT id, pos FROM (
         |    SELECT id, pos, count(*) OVER (PARTITION BY wh) AS cnt FROM ex
         |  ) WHERE cnt >= 2
         |), isl AS (
         |  SELECT id, pos,
         |    CASE WHEN lag(pos) OVER (PARTITION BY id ORDER BY pos) IS NULL
         |           OR pos > lag(pos) OVER (PARTITION BY id ORDER BY pos) + 8
         |         THEN 1 ELSE 0 END AS new_ext
         |  FROM dup
         |), ext AS (
         |  SELECT id, pos, sum(new_ext) OVER (PARTITION BY id ORDER BY pos
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ext_id
         |  FROM isl
         |), spans AS (
         |  SELECT id, ext_id, min(pos) AS span_start, max(pos) + 8 AS span_end,
         |    CAST(count(*) AS BIGINT) AS n_windows
         |  FROM ext GROUP BY id, ext_id
         |)
         |SELECT id AS doc_id, CAST(span_start AS BIGINT) AS span_start,
         |  CAST(span_end AS BIGINT) AS span_end,
         |  CAST(span_end - span_start AS BIGINT) AS span_tokens, n_windows,
         |  array_to_string(t[span_start+1:span_end], ' ') AS span_text
         |FROM spans JOIN toks USING (id)
         |ORDER BY doc_id, span_start""".stripMargin,

    "p87_span_dedup" ->
      s"""WITH toks AS (
         |  SELECT doc_id AS id, string_split(${norm("coalesce(text, '')")}, ' ') AS t FROM documents
         |), thd AS (
         |  SELECT id, list_transform(t, tok -> ${hash("tok")}) AS th FROM toks
         |), win AS (
         |  SELECT id, CASE WHEN len(th) >= 8
         |    THEN [list_reduce(list_prepend(CAST(7 AS BIGINT), th[i:i+7]),
         |            (a, b) -> (a*31 + b) % $P) * 998244353
         |          + list_reduce(list_prepend(CAST(11 AS BIGINT), th[i:i+7]),
         |            (a, b) -> (a*37 + b) % 998244353)
         |          for i in range(1, len(th)-6)]
         |    ELSE CAST([] AS BIGINT[]) END AS ws
         |  FROM thd
         |), ex AS (
         |  SELECT id, unnest(ws) AS wh, generate_subscripts(ws, 1) - 1 AS pos FROM win
         |), marked AS (
         |  SELECT id, pos,
         |         count(*) OVER (PARTITION BY wh) AS cnt,
         |         row_number() OVER (PARTITION BY wh ORDER BY id, pos) AS rn
         |  FROM ex
         |), st AS (
         |  SELECT id, list_sort(list(pos)) AS starts
         |  FROM marked WHERE cnt >= 2 AND rn > 1 GROUP BY id
         |), cl AS (
         |  SELECT t.id, len(t.t) AS n_toks, coalesce(len(s.starts), 0) AS n_spans,
         |         list_filter(t.t, (tok, i) ->
         |           len(list_filter(coalesce(s.starts, CAST([] AS BIGINT[])),
         |               w -> w <= i-1 AND i-1 < w+8)) = 0) AS ct
         |  FROM toks t LEFT JOIN st s USING (id)
         |)
         |SELECT id AS doc_id, CAST(n_toks AS BIGINT) AS n_tokens,
         |       CAST(n_spans AS BIGINT) AS n_dup_spans,
         |       CAST(n_toks - len(ct) AS BIGINT) AS n_removed,
         |       coalesce(array_to_string(ct, ' '), '') AS cleaned_text
         |FROM cl ORDER BY doc_id""".stripMargin,

    // span-scrub twin of TextDedup.spanScrub (k = 8, bench = doc_id < 25,
    // corpus = doc_id >= 25): the p87 window fold and coverage cleanup
    // with removal marked by membership in the benchmark's distinct
    // window-key set instead of a count/keeper.
    "p90_span_scrub" ->
      s"""WITH toks AS (
         |  SELECT doc_id AS id, string_split(${norm("coalesce(text, '')")}, ' ') AS t
         |  FROM documents
         |), thd AS (
         |  SELECT id, list_transform(t, tok -> ${hash("tok")}) AS th FROM toks
         |), win AS (
         |  SELECT id, CASE WHEN len(th) >= 8
         |    THEN [list_reduce(list_prepend(CAST(7 AS BIGINT), th[i:i+7]),
         |            (a, b) -> (a*31 + b) % $P) * 998244353
         |          + list_reduce(list_prepend(CAST(11 AS BIGINT), th[i:i+7]),
         |            (a, b) -> (a*37 + b) % 998244353)
         |          for i in range(1, len(th)-6)]
         |    ELSE CAST([] AS BIGINT[]) END AS ws
         |  FROM thd
         |), ex AS (
         |  SELECT id, unnest(ws) AS wh, generate_subscripts(ws, 1) - 1 AS pos
         |  FROM win WHERE id >= 25
         |), bench AS (
         |  SELECT DISTINCT unnest(ws) AS wh FROM win WHERE id < 25
         |), st AS (
         |  SELECT id, list_sort(list(pos)) AS starts
         |  FROM ex JOIN bench USING (wh) GROUP BY id
         |), cl AS (
         |  SELECT t.id, len(t.t) AS n_toks, coalesce(len(s.starts), 0) AS n_spans,
         |         list_filter(t.t, (tok, i) ->
         |           len(list_filter(coalesce(s.starts, CAST([] AS BIGINT[])),
         |               w -> w <= i-1 AND i-1 < w+8)) = 0) AS ct
         |  FROM toks t LEFT JOIN st s USING (id) WHERE t.id >= 25
         |)
         |SELECT id AS doc_id, CAST(n_toks AS BIGINT) AS n_tokens,
         |       CAST(n_spans AS BIGINT) AS n_contaminated_spans,
         |       CAST(n_toks - len(ct) AS BIGINT) AS n_removed,
         |       coalesce(array_to_string(ct, ' '), '') AS cleaned_text
         |FROM cl ORDER BY doc_id""".stripMargin,

    // bigram-novelty twin of TextStats.bigramNovelty (holdoutMod = 10):
    // the k=2 instance of the packed two-fold window key, train counts as
    // a conditional sum (id % 10 <> 0 — ids non-negative, ≡ Spark's
    // pmod), division CASE-guarded so no-bigram docs score NULL. DuckDB
    // sums BIGINT into HUGEINT — cast back so schemas match.
    "p88_bigram_novelty" ->
      s"""WITH toks AS (
         |  SELECT doc_id AS id, string_split(${norm("text")}, ' ') AS t FROM documents
         |), thd AS (
         |  SELECT id, list_transform(t, tok -> ${hash("tok")}) AS th FROM toks
         |), bgd AS (
         |  SELECT id, CASE WHEN len(th) >= 2
         |    THEN [list_reduce(list_prepend(CAST(7 AS BIGINT), th[i:i+1]),
         |            (a, b) -> (a*31 + b) % $P) * 998244353
         |          + list_reduce(list_prepend(CAST(11 AS BIGINT), th[i:i+1]),
         |            (a, b) -> (a*37 + b) % 998244353)
         |          for i in range(1, len(th))]
         |    ELSE CAST([] AS BIGINT[]) END AS bg
         |  FROM thd
         |), ex AS (
         |  SELECT id, unnest(bg) AS bg FROM bgd
         |), c2 AS (
         |  SELECT bg, CAST(sum(CASE WHEN id % 10 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS c2
         |  FROM ex GROUP BY bg
         |), per AS (
         |  SELECT ex.id, count(*) AS n_bigrams,
         |         CAST(sum(CASE WHEN c2.c2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
         |         CAST(sum(c2.c2) AS BIGINT) AS support_sum
         |  FROM ex JOIN c2 USING (bg) GROUP BY ex.id
         |)
         |SELECT d.doc_id, coalesce(per.n_bigrams, 0) AS n_bigrams,
         |       coalesce(per.n_oov, 0) AS n_oov,
         |       coalesce(per.support_sum, 0) AS support_sum,
         |       CASE WHEN per.n_bigrams IS NOT NULL
         |            THEN CAST(per.support_sum AS DOUBLE) / per.n_bigrams END AS avg_support,
         |       CASE WHEN per.n_bigrams IS NOT NULL
         |            THEN CAST(per.n_oov AS DOUBLE) / per.n_bigrams END AS oov_rate
         |FROM documents d LEFT JOIN per ON d.doc_id = per.id ORDER BY d.doc_id""".stripMargin,

    // conditional-bigram LM surprisal (CCNet archetype): token buckets
    // hash % B, bigram key b1·B + b2, Laplace-smoothed conditional
    // surprisal quantized to whole bits — ⌊log2 n⌋ = length(bin(n)) − 1,
    // one integer division, no transcendentals — mirroring
    // TextStats.lmSurprisal fragment for fragment. Context counts derive
    // from the bigram model (c1 = Σ c12 over bg // B), exactly as the
    // Spark side derives its broadcast c1 table.
    "p138_lm_surprisal" ->
      s"""$lmPerDocCte
         |SELECT d.doc_id, coalesce(per.n_bigrams, 0) AS n_bigrams,
         |       coalesce(per.total_bits, 0) AS total_bits,
         |       CASE WHEN per.n_bigrams IS NOT NULL
         |            THEN CAST(per.total_bits AS DOUBLE) / per.n_bigrams
         |       END AS bits_per_bigram
         |FROM documents d LEFT JOIN per ON d.doc_id = per.id
         |ORDER BY d.doc_id""".stripMargin,

    // CCNet head/middle/tail buckets: per-LANGUAGE exact tertiles of
    // bits-per-bigram at ascending rank ceil(q·n) (the p52 sorted-list
    // selection mirroring Percentiles.exactRankSelect), thresholds
    // applied with <= in tertile order. The q literals are printed from
    // the very Scala doubles the Spark side uses and CAST AS DOUBLE so
    // both engines multiply identical bits.
    "p139_ccnet_buckets" ->
      s"""$lmPerDocCte, scored AS (
         |  SELECT d.doc_id, d.lang, coalesce(per.n_bigrams, 0) AS n_bigrams,
         |         CASE WHEN per.n_bigrams IS NOT NULL
         |              THEN CAST(per.total_bits AS DOUBLE) / per.n_bigrams
         |         END AS bits_per_bigram
         |  FROM documents d LEFT JOIN per ON d.doc_id = per.id
         |), byl AS (
         |  SELECT lang, list_sort(list(bits_per_bigram)) AS vs
         |  FROM scored WHERE n_bigrams > 0 GROUP BY lang
         |), thr AS (
         |  SELECT lang,
         |    vs[CAST(greatest(1, ceil(CAST(${graft.text.TextStats.TertileQs(0)}
         |      AS DOUBLE) * len(vs))) AS INT)] AS t1,
         |    vs[CAST(greatest(1, ceil(CAST(${graft.text.TextStats.TertileQs(1)}
         |      AS DOUBLE) * len(vs))) AS INT)] AS t2
         |  FROM byl
         |)
         |SELECT s.doc_id, s.lang, s.n_bigrams, s.bits_per_bigram,
         |       CASE WHEN s.n_bigrams = 0 THEN 'none'
         |            WHEN s.bits_per_bigram <= thr.t1 THEN 'head'
         |            WHEN s.bits_per_bigram <= thr.t2 THEN 'middle'
         |            ELSE 'tail' END AS ppl_bucket
         |FROM scored s LEFT JOIN thr ON s.lang = thr.lang
         |ORDER BY s.doc_id""".stripMargin,

    // trained-quality-scorer twin of QualityScorer.qualityScorer: heuristic
    // label = p18's quality_score fold ≥ 0.25, hashed-bucket NB counts as
    // conditional sums over the id % 10 <> 0 split, per-bucket sign-of-
    // log-likelihood-ratio votes via exact HUGEINT cross-multiplication
    // (no ln — not correctly-rounded-guaranteed), ONE final division.
    // DuckDB sums into HUGEINT — cast back so schemas match.
    "p99_quality_scorer" -> (scorerFilledCte +
      s"""
         |SELECT doc_id, n_tokens, n_oov, pos_votes, neg_votes,
         |  CAST(pos_votes + 1 AS DOUBLE) / (pos_votes + neg_votes + 2) AS nb_score,
         |  CAST(CASE WHEN CAST(pos_votes + 1 AS DOUBLE) / (pos_votes + neg_votes + 2)
         |            >= CAST(0.5 AS DOUBLE) THEN 1 ELSE 0 END AS INT) AS predicted_hiq,
         |  label_hiq
         |FROM filled ORDER BY doc_id""".stripMargin),

    // held-out confusion matrix + accuracy of the p99 scorer (one row;
    // integer sums, one division)
    "p100_scorer_eval" -> (scorerFilledCte +
      s"""
         |, pred AS (
         |  SELECT doc_id, label_hiq,
         |    CASE WHEN CAST(pos_votes + 1 AS DOUBLE) / (pos_votes + neg_votes + 2)
         |         >= CAST(0.5 AS DOUBLE) THEN 1 ELSE 0 END AS p
         |  FROM filled WHERE doc_id % 10 = 0
         |)
         |SELECT CAST(count(*) AS BIGINT) AS n_holdout,
         |  CAST(sum(CASE WHEN p = 1 AND label_hiq = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         |  CAST(sum(CASE WHEN p = 1 AND label_hiq = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         |  CAST(sum(CASE WHEN p = 0 AND label_hiq = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
         |  CAST(sum(CASE WHEN p = 0 AND label_hiq = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
         |  CAST(sum(CASE WHEN p = label_hiq THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS accuracy
         |FROM pred""".stripMargin),

    // threshold sweep twin of QualityScorer.thresholdSweep: the same
    // filled CTE restricted to the holdout split, cross-joined with the
    // DefaultThresholds literals (printed from the SAME Scala doubles the
    // Spark plan inlines), integer confusion sums + guarded divisions
    "p107_threshold_sweep" -> (scorerFilledCte +
      s"""
         |, hold AS (
         |  SELECT CAST(pos_votes + 1 AS DOUBLE) / (pos_votes + neg_votes + 2)
         |           AS nb_score,
         |         label_hiq
         |  FROM filled WHERE doc_id % 10 = 0
         |), sweep AS (
         |  SELECT t.threshold,
         |    CAST(count(*) AS BIGINT) AS n_holdout,
         |    CAST(sum(CASE WHEN nb_score >= t.threshold THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
         |    CAST(sum(CASE WHEN nb_score >= t.threshold AND label_hiq = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         |    CAST(sum(CASE WHEN nb_score >= t.threshold AND label_hiq = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         |    CAST(sum(CASE WHEN nb_score < t.threshold AND label_hiq = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
         |    CAST(sum(CASE WHEN nb_score < t.threshold AND label_hiq = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
         |  FROM hold CROSS JOIN (VALUES ${
             graft.text.QualityScorer.DefaultThresholds
               .map(t => s"(${dblLit(t)})").mkString(", ")
           }) t(threshold)
         |  GROUP BY t.threshold
         |)
         |SELECT threshold, n_holdout, n_keep, tp, fp, fn, tn,
         |  CASE WHEN tp + fp > 0 THEN CAST(tp AS DOUBLE) / (tp + fp) END AS "precision",
         |  CASE WHEN tp + fn > 0 THEN CAST(tp AS DOUBLE) / (tp + fn) END AS "recall"
         |FROM sweep ORDER BY threshold""".stripMargin),

    // Bloom-probe twin of TextCuration.bloomSeenProbe: fingerprints =
    // the whole-text polynomial hash, bit positions from the SAME
    // (multiplier, offset) families mod 64, membership = all k probe
    // positions present in the seen set's distinct positions; is_seen is
    // the exact fingerprint match, so false positives verify explicitly
    "p108_bloom_probe" ->
      s"""WITH fp AS (
         |  SELECT doc_id AS id, ${hash(norm("text"))} AS f, doc_id < 25 AS seen
         |  FROM documents
         |), hs AS (
         |  SELECT * FROM (VALUES ${
             graft.text.TextCuration.BloomHashes
               .map { case (a, b) => s"(CAST($a AS BIGINT), CAST($b AS BIGINT))" }
               .mkString(", ")
           }) h(a, b)
         |), seenpos AS (
         |  SELECT DISTINCT ((s.f * h.a + h.b) % $P) % 64 AS pos
         |  FROM fp s CROSS JOIN hs h WHERE s.seen
         |), probe AS (
         |  SELECT fp.id, ((fp.f * h.a + h.b) % $P) % 64 AS pos
         |  FROM fp CROSS JOIN hs h
         |), hits AS (
         |  SELECT id, count(*) AS nh FROM probe JOIN seenpos USING (pos)
         |  GROUP BY id
         |), seenfp AS (SELECT DISTINCT f FROM fp WHERE seen)
         |SELECT fp.id,
         |  COALESCE(h.nh, 0) = ${graft.text.TextCuration.BloomHashes.size}
         |    AS maybe_seen,
         |  COALESCE(fp.f IN (SELECT f FROM seenfp), FALSE) AS is_seen
         |FROM fp LEFT JOIN hits h USING (id) ORDER BY fp.id""".stripMargin,

    // URL-curation twins of TextCuration.urlParts / domainCapSample over
    // the synthesized url column (urlSynthSql ≡ DocAnalytics.withUrl)
    "p101_url_parts" -> (urlCtes +
      s"""
         |SELECT id,
         |  regexp_extract(url, '^([a-z][a-z0-9+.-]*)://', 1) AS scheme,
         |  host,
         |  regexp_extract(host, '([a-z0-9-]+\\.[a-z0-9-]+)$$', 1) AS domain,
         |  CAST(len(list_filter(string_split(
         |    regexp_replace(regexp_replace(url, '^[a-z][a-z0-9+.-]*://[^/?#]*', ''),
         |                   '[?#].*$$', ''), '/'), x -> x <> '')) AS BIGINT) AS path_depth,
         |  contains(url, '?') AS has_query
         |FROM h ORDER BY id""".stripMargin),

    // per-domain cap: row_number in id order per domain, kept while
    // <= 15 — the keyed-prefix-sum rank the Spark side computes without
    // a per-domain window funnel
    "p102_domain_cap" -> (urlCtes +
      s"""
         |, dom AS (
         |  SELECT id, regexp_extract(host, '([a-z0-9-]+\\.[a-z0-9-]+)$$', 1) AS domain
         |  FROM h
         |), ranked AS (
         |  SELECT id, domain,
         |         row_number() OVER (PARTITION BY domain ORDER BY id) AS doc_rank
         |  FROM dom
         |)
         |SELECT id, domain, CAST(doc_rank AS BIGINT) AS doc_rank
         |FROM ranked WHERE doc_rank <= 15 ORDER BY id""".stripMargin),

    // SemDeDup twin of Similarity.semanticDedup over the TRAINED quantizer
    // the p103 query persisted: argmax cell assignment (ties toward the
    // smallest centroid id — the p38/p50 convention), then drop any vector
    // with a lower-id same-cell neighbor at cosine ≥ SemDedupMinSim.
    "p103_semantic_dedup" ->
      s"""WITH v AS (SELECT vec_id, embedding AS e FROM embeddings),
         |cents AS (SELECT cent_id AS cid, ce FROM read_parquet(
         |  '${graft.ops.DocAnalytics.P103CentroidsPath}/*.parquet')),
         |scored AS (
         |  SELECT v.vec_id, v.e, c.cid, ${cos("v.e", "c.ce")} AS cs
         |  FROM v CROSS JOIN cents c
         |),
         |assigned AS (
         |  SELECT vec_id, e, cid AS cell FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |                                 ORDER BY cs DESC, cid) AS rn
         |    FROM scored
         |  ) WHERE rn = 1
         |)
         |SELECT a.vec_id, a.cell FROM assigned a
         |WHERE NOT EXISTS (
         |  SELECT 1 FROM assigned b
         |  WHERE b.cell = a.cell AND b.vec_id < a.vec_id
         |    AND ${cos("b.e", "a.e")} >= ${dblLit(graft.ops.DocAnalytics.SemDedupMinSim)})
         |ORDER BY a.vec_id""".stripMargin,

    // IVF-PQ twin of ProductQuantizer.knnIvfPq: codes + reconstructions
    // replayed from the codebooks the p105 query trained and persisted
    // (argmin ties toward the smaller code — the p50 convention), coarse
    // cells = p38's lowest-id quantizer, 2-cell probes, then ADC ranking
    // by the single left-to-right l2sq fold over the 64-dim decoded
    // vector under (dist ASC, neighbor_id ASC).
    "p105_knn_ivfpq" ->
      s"""WITH v AS (SELECT vec_id, embedding AS e FROM embeddings),
         |cb AS (SELECT m, code, cv FROM read_parquet(
         |  '${graft.ops.DocAnalytics.P105CodebooksPath}/*.parquet')),
         |$pqDecodedCtes,
         |cents AS (SELECT vec_id AS cid, e AS ce FROM v ORDER BY vec_id LIMIT 8),
         |scored AS (
         |  SELECT v.vec_id, v.e, c.cid, ${cos("v.e", "c.ce")} AS cs
         |  FROM v CROSS JOIN cents c
         |),
         |assigned AS (
         |  SELECT vec_id AS neighbor_id, cid AS cell FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |                                 ORDER BY cs DESC, cid) AS rn
         |    FROM scored
         |  ) WHERE rn = 1
         |),
         |probes AS (
         |  SELECT vec_id AS query_id, e AS qe, cid AS cell FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |                                 ORDER BY cs DESC, cid) AS rn
         |    FROM scored WHERE vec_id < 20
         |  ) WHERE rn <= 2
         |),
         |sims AS (
         |  SELECT query_id, neighbor_id, ${l2sq("qe", "de")} AS dist
         |  FROM probes JOIN assigned USING (cell)
         |  JOIN decoded d ON d.vec_id = neighbor_id
         |  WHERE neighbor_id <> query_id
         |),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |                               ORDER BY dist ASC, neighbor_id) AS rn
         |  FROM sims
         |)
         |SELECT query_id, CAST(rn AS BIGINT) AS knn_rank, neighbor_id, dist
         |FROM ranked WHERE rn <= 5 ORDER BY query_id, knn_rank""".stripMargin,

    // PQ recall twin: exhaustive ADC top-5 (from the p106 codebooks)
    // set-intersected with the exact brute-force top-5 per query —
    // integer hits, one exact division (the p58 convention, per query).
    "p106_pq_recall" ->
      s"""WITH v AS (SELECT vec_id, embedding AS e FROM embeddings),
         |cb AS (SELECT m, code, cv FROM read_parquet(
         |  '${graft.ops.DocAnalytics.P106CodebooksPath}/*.parquet')),
         |$pqDecodedCtes,
         |q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < 20),
         |bsims AS (
         |  SELECT query_id, v.vec_id AS neighbor_id, ${cos("qe", "e")} AS sim
         |  FROM q JOIN v ON v.vec_id <> query_id
         |),
         |btop AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |                                 ORDER BY sim DESC, neighbor_id) AS rn
         |    FROM bsims
         |  ) WHERE rn <= 5
         |),
         |psims AS (
         |  SELECT query_id, d.vec_id AS neighbor_id, ${l2sq("qe", "de")} AS dist
         |  FROM q JOIN decoded d ON d.vec_id <> query_id
         |),
         |ptop AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |                                 ORDER BY dist ASC, neighbor_id) AS rn
         |    FROM psims
         |  ) WHERE rn <= 5
         |),
         |hits AS (
         |  SELECT query_id, count(*) AS n_hits
         |  FROM btop JOIN ptop USING (query_id, neighbor_id)
         |  GROUP BY query_id
         |),
         |poss AS (
         |  SELECT query_id, count(*) AS n_possible FROM btop GROUP BY query_id
         |)
         |SELECT p.query_id,
         |  CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
         |  p.n_possible,
         |  CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / CAST(p.n_possible AS DOUBLE)
         |    AS recall_at_k
         |FROM poss p LEFT JOIN hits h USING (query_id)
         |ORDER BY p.query_id""".stripMargin,

    // Residual IVF-PQ twin of ProductQuantizer.knnIvfPqResidual: coarse
    // lowest-id-8 cells, float32 residuals, 8-bit codes replayed from the
    // persisted p109 codebooks, per-cell query residuals, 2-cell probes,
    // ADC ranking under (dist ASC, neighbor_id ASC).
    "p109_knn_ivfpq_residual" ->
      (pqResidualCtes(graft.ops.DocAnalytics.P109CodebooksPath, 2) +
      s""",
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |                               ORDER BY dist ASC, neighbor_id) AS rn
         |  FROM sims
         |)
         |SELECT query_id, CAST(rn AS BIGINT) AS knn_rank, neighbor_id, dist
         |FROM ranked WHERE rn <= 5 ORDER BY query_id, knn_rank""".stripMargin),

    // residual-PQ recall twin: residual ADC probing ALL 8 cells (the
    // exhaustive residual ranking) set-intersected with exact brute-force
    // top-5 per query — the p106 rollup over the residual tier.
    "p110_pqr_recall" ->
      (pqResidualCtes(graft.ops.DocAnalytics.P110CodebooksPath, 8) +
      s""",
         |q2 AS (SELECT vec_id AS query_id, e AS qe2 FROM v WHERE vec_id < 20),
         |bsims AS (
         |  SELECT query_id, v.vec_id AS neighbor_id, ${cos("qe2", "v.e")} AS sim
         |  FROM q2 JOIN v ON v.vec_id <> query_id
         |),
         |btop AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |                                 ORDER BY sim DESC, neighbor_id) AS rn
         |    FROM bsims
         |  ) WHERE rn <= 5
         |),
         |ptop AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |                                 ORDER BY dist ASC, neighbor_id) AS rn
         |    FROM sims
         |  ) WHERE rn <= 5
         |),
         |hits AS (
         |  SELECT query_id, count(*) AS n_hits
         |  FROM btop JOIN ptop USING (query_id, neighbor_id)
         |  GROUP BY query_id
         |),
         |poss AS (
         |  SELECT query_id, count(*) AS n_possible FROM btop GROUP BY query_id
         |)
         |SELECT p.query_id,
         |  CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
         |  p.n_possible,
         |  CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / CAST(p.n_possible AS DOUBLE)
         |    AS recall_at_k
         |FROM poss p LEFT JOIN hits h USING (query_id)
         |ORDER BY p.query_id""".stripMargin),

    // LUT-ADC twin of ProductQuantizer.knnIvfPqResidualLut: same coarse/
    // residual/encode chain as p109, but the distance is the m-term
    // ORDER BY m fold of per-subspace L2 partials (the LUT contract) —
    // each partial computed between the query residual's subvector and
    // the candidate's codebook entry, never via a decoded reconstruction.
    // p118's deployment-split twin THROUGH THE STORE: codes come from the
    // persisted cell-partitioned index parquet (hive cell= directories),
    // not an encode re-derivation — the stored bytes are what verifies.
    // Same m-term ordered LUT-ADC fold, same probe structure.
    "p128_persisted_index_search" ->
      s"""WITH v AS (SELECT vec_id, embedding AS e FROM embeddings),
         |cb AS (SELECT m, code, cv FROM read_parquet(
         |  '${graft.ops.DocAnalytics.P128CodebooksPath}/*.parquet')),
         |idx AS (
         |  SELECT vec_id, CAST(cell AS BIGINT) AS cell, codes
         |  FROM read_parquet(
         |    '${graft.ops.DocAnalytics.P128IndexPath}/*/*.parquet',
         |    hive_partitioning = 1)
         |),
         |codes AS (
         |  SELECT vec_id, CAST(unnest(range(len(codes))) AS INT) AS m,
         |    unnest(codes) AS code
         |  FROM idx
         |),
         |cents AS (SELECT vec_id AS cid, e AS ce FROM v ORDER BY vec_id LIMIT 8),
         |scored AS (
         |  SELECT v.vec_id, v.e, c.cid, c.ce, ${cos("v.e", "c.ce")} AS cs
         |  FROM v CROSS JOIN cents c
         |),
         |probes AS (
         |  SELECT vec_id AS query_id, e AS qe, cid AS cell, ce FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |                                 ORDER BY cs DESC, cid) AS rn
         |    FROM scored WHERE vec_id < 20
         |  ) WHERE rn <= 2
         |),
         |qres AS (
         |  SELECT query_id, cell, ${fsub("qe", "ce")} AS qr FROM probes
         |),
         |psub AS (
         |  SELECT q.query_id, co.vec_id AS neighbor_id, co.m,
         |    ${l2sq(
               "list_slice(q.qr, ms.m * ms.sd + 1, (ms.m + 1) * ms.sd)",
               "c.cv")} AS pd
         |  FROM qres q
         |  JOIN (SELECT vec_id, cell FROM idx) a USING (cell)
         |  JOIN codes co ON co.vec_id = a.vec_id
         |  JOIN (SELECT DISTINCT m, len(cv) AS sd FROM cb) ms ON ms.m = co.m
         |  JOIN cb c ON c.m = co.m AND c.code = co.code
         |  WHERE a.vec_id <> q.query_id
         |),
         |sims AS (
         |  SELECT query_id, neighbor_id,
         |    list_reduce(list_prepend(CAST(0 AS DOUBLE), list(pd ORDER BY m)),
         |      (a, b) -> a + b) AS dist
         |  FROM psub GROUP BY query_id, neighbor_id
         |),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |                               ORDER BY dist ASC, neighbor_id) AS rn
         |  FROM sims
         |)
         |SELECT query_id, CAST(rn AS BIGINT) AS knn_rank, neighbor_id, dist
         |FROM ranked WHERE rn <= 5 ORDER BY query_id, knn_rank""".stripMargin,

    "p118_knn_ivfpq_lut" ->
      s"""WITH v AS (SELECT vec_id, embedding AS e FROM embeddings),
         |cb AS (SELECT m, code, cv FROM read_parquet(
         |  '${graft.ops.DocAnalytics.P118CodebooksPath}/*.parquet')),
         |cents AS (SELECT vec_id AS cid, e AS ce FROM v ORDER BY vec_id LIMIT 8),
         |scored AS (
         |  SELECT v.vec_id, v.e, c.cid, c.ce, ${cos("v.e", "c.ce")} AS cs
         |  FROM v CROSS JOIN cents c
         |),
         |assigned AS (
         |  SELECT vec_id, e, cid AS cell, ce FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |                                 ORDER BY cs DESC, cid) AS rn
         |    FROM scored
         |  ) WHERE rn = 1
         |),
         |rv AS (
         |  SELECT vec_id, cell, ${fsub("e", "ce")} AS r FROM assigned
         |),
         |${pqDecodedCtesOver("rv", "r")},
         |probes AS (
         |  SELECT vec_id AS query_id, e AS qe, cid AS cell, ce FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |                                 ORDER BY cs DESC, cid) AS rn
         |    FROM scored WHERE vec_id < 20
         |  ) WHERE rn <= 2
         |),
         |qres AS (
         |  SELECT query_id, cell, ${fsub("qe", "ce")} AS qr FROM probes
         |),
         |psub AS (
         |  SELECT q.query_id, co.vec_id AS neighbor_id, co.m,
         |    ${l2sq(
               "list_slice(q.qr, ms.m * ms.sd + 1, (ms.m + 1) * ms.sd)",
               "c.cv")} AS pd
         |  FROM qres q
         |  JOIN (SELECT vec_id, cell FROM rv) a USING (cell)
         |  JOIN codes co ON co.vec_id = a.vec_id
         |  JOIN (SELECT DISTINCT m, len(cv) AS sd FROM cb) ms ON ms.m = co.m
         |  JOIN cb c ON c.m = co.m AND c.code = co.code
         |  WHERE a.vec_id <> q.query_id
         |),
         |sims AS (
         |  SELECT query_id, neighbor_id,
         |    list_reduce(list_prepend(CAST(0 AS DOUBLE), list(pd ORDER BY m)),
         |      (a, b) -> a + b) AS dist
         |  FROM psub GROUP BY query_id, neighbor_id
         |),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |                               ORDER BY dist ASC, neighbor_id) AS rn
         |  FROM sims
         |)
         |SELECT query_id, CAST(rn AS BIGINT) AS knn_rank, neighbor_id, dist
         |FROM ranked WHERE rn <= 5 ORDER BY query_id, knn_rank""".stripMargin,

    // IVFADC+R twin of ProductQuantizer.knnIvfPqRerank: p118's LUT-ADC
    // fold widened to a 30-deep shortlist, then each survivor re-scored
    // by EXACT cosine against the source vectors (the p21 contract) and
    // the top-5 cut re-taken under (sim DESC, neighbor_id).
    "p129_knn_ivfpq_rerank" ->
      (ivfadcRerankCtes(graft.ops.DocAnalytics.P129CodebooksPath, 30) +
      s"""
         |SELECT query_id, CAST(rn AS BIGINT) AS knn_rank, neighbor_id, sim
         |FROM rranked WHERE rn <= 5 ORDER BY query_id, knn_rank""".stripMargin),

    // MMR over the DEPLOYMENT search path (p161): the p129 IVFADC+R
    // chain re-ranked to a top-8 candidate pool, then the shared greedy.
    "p161_mmr_deployed" ->
      (ivfadcRerankCtes(graft.ops.DocAnalytics.P161CodebooksPath, 30) +
      s""",
         |cand AS (
         |  SELECT r.query_id, r.neighbor_id, r.sim, v.e
         |  FROM rranked r JOIN v ON v.vec_id = r.neighbor_id
         |  WHERE r.rn <= ${graft.ann.Similarity.MmrKCand}
         |)""".stripMargin + mmrGreedySql(graft.ann.Similarity.MmrM,
        graft.ann.Similarity.MmrLambda)),

    // what re-ranking buys, as p110's rollup: the SAME decoded-ADC chain
    // at nProbe=8 widened to a 30-deep shortlist, exact-cosine re-ranked,
    // top-5 re-cut, then recall@5 against exact brute force.
    "p130_rerank_recall" ->
      (pqResidualCtes(graft.ops.DocAnalytics.P130CodebooksPath, 8) +
      s""",
         |q2 AS (SELECT vec_id AS query_id, e AS qe2 FROM v WHERE vec_id < 20),
         |bsims AS (
         |  SELECT query_id, v.vec_id AS neighbor_id, ${cos("qe2", "v.e")} AS sim
         |  FROM q2 JOIN v ON v.vec_id <> query_id
         |),
         |btop AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |                                 ORDER BY sim DESC, neighbor_id) AS rn
         |    FROM bsims
         |  ) WHERE rn <= 5
         |),
         |short AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |                                 ORDER BY dist ASC, neighbor_id) AS rn
         |    FROM sims
         |  ) WHERE rn <= 30
         |),
         |rtop AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT s.query_id, s.neighbor_id,
         |      row_number() OVER (PARTITION BY s.query_id
         |                         ORDER BY ${cos("q2.qe2", "v.e")} DESC,
         |                                  s.neighbor_id) AS rn
         |    FROM short s
         |    JOIN v ON v.vec_id = s.neighbor_id
         |    JOIN q2 USING (query_id)
         |  ) WHERE rn <= 5
         |),
         |hits AS (
         |  SELECT query_id, count(*) AS n_hits
         |  FROM btop JOIN rtop USING (query_id, neighbor_id)
         |  GROUP BY query_id
         |),
         |poss AS (
         |  SELECT query_id, count(*) AS n_possible FROM btop GROUP BY query_id
         |)
         |SELECT p.query_id,
         |  CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
         |  p.n_possible,
         |  CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / CAST(p.n_possible AS DOUBLE)
         |    AS recall_at_k
         |FROM poss p LEFT JOIN hits h USING (query_id)
         |ORDER BY p.query_id""".stripMargin),

    // p110's rollup with the TRAINED coarse layer: centroids read back
    // from the parquet the p119 query persisted (the p50 convention),
    // residual chain + exhaustive 8-cell ADC + recall@5 vs brute force.
    "p119_pqr_recall_trained" ->
      (pqResidualCtes(graft.ops.DocAnalytics.P119CodebooksPath, 8,
        "cents AS (SELECT cent_id AS cid, ce FROM read_parquet(" +
          s"'${graft.ops.DocAnalytics.P119CentroidsPath}/*.parquet'))") +
      s""",
         |q2 AS (SELECT vec_id AS query_id, e AS qe2 FROM v WHERE vec_id < 20),
         |bsims AS (
         |  SELECT query_id, v.vec_id AS neighbor_id, ${cos("qe2", "v.e")} AS sim
         |  FROM q2 JOIN v ON v.vec_id <> query_id
         |),
         |btop AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |                                 ORDER BY sim DESC, neighbor_id) AS rn
         |    FROM bsims
         |  ) WHERE rn <= 5
         |),
         |ptop AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |                                 ORDER BY dist ASC, neighbor_id) AS rn
         |    FROM sims
         |  ) WHERE rn <= 5
         |),
         |hits AS (
         |  SELECT query_id, count(*) AS n_hits
         |  FROM btop JOIN ptop USING (query_id, neighbor_id)
         |  GROUP BY query_id
         |),
         |poss AS (
         |  SELECT query_id, count(*) AS n_possible FROM btop GROUP BY query_id
         |)
         |SELECT p.query_id,
         |  CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
         |  p.n_possible,
         |  CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / CAST(p.n_possible AS DOUBLE)
         |    AS recall_at_k
         |FROM poss p LEFT JOIN hits h USING (query_id)
         |ORDER BY p.query_id""".stripMargin),

    // DSIR twin of ImportanceSampler.dsirSelect (target = lang 'en'):
    // hashed-bigram buckets (the p88 two-fold window key mod 4096),
    // per-bucket smoothed log-ratio SIGN via exact HUGEINT
    // cross-multiplication, Beta-smoothed vote share, deterministic
    // top-100 under (importance DESC, id). DuckDB sums into HUGEINT —
    // cast back so schemas match.
    "p104_dsir_select" ->
      s"""WITH toks AS (
         |  SELECT doc_id AS id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS tgt,
         |         string_split(${norm("text")}, ' ') AS t FROM documents
         |), thd AS (
         |  SELECT id, tgt, list_transform(t, tok -> ${hash("tok")}) AS th FROM toks
         |), bgd AS (
         |  SELECT id, tgt, CASE WHEN len(th) >= 2
         |    THEN [list_reduce(list_prepend(CAST(7 AS BIGINT), th[i:i+1]),
         |            (a, b) -> (a*31 + b) % $P) * 998244353
         |          + list_reduce(list_prepend(CAST(11 AS BIGINT), th[i:i+1]),
         |            (a, b) -> (a*37 + b) % 998244353)
         |          for i in range(1, len(th))]
         |    ELSE CAST([] AS BIGINT[]) END AS bg
         |  FROM thd
         |), ex AS (
         |  SELECT id, tgt, unnest(bg) % 4096 AS b FROM bgd
         |), model AS (
         |  SELECT b,
         |    CAST(sum(CASE WHEN tgt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c_t,
         |    CAST(sum(CASE WHEN tgt = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c_r
         |  FROM ex GROUP BY b
         |), totals AS (
         |  SELECT CAST(sum(c_t) AS BIGINT) AS n_t,
         |         CAST(sum(c_r) AS BIGINT) AS n_r FROM model
         |), voted AS (
         |  SELECT b,
         |    CASE WHEN CAST(c_t + 1 AS HUGEINT) * (n_r + 4096)
         |            > CAST(c_r + 1 AS HUGEINT) * (n_t + 4096) THEN 1
         |         WHEN CAST(c_t + 1 AS HUGEINT) * (n_r + 4096)
         |            < CAST(c_r + 1 AS HUGEINT) * (n_t + 4096) THEN -1
         |         ELSE 0 END AS v
         |  FROM model CROSS JOIN totals
         |), per AS (
         |  SELECT ex.id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |    CAST(sum(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT) AS t_votes,
         |    CAST(sum(CASE WHEN v = -1 THEN 1 ELSE 0 END) AS BIGINT) AS r_votes
         |  FROM ex JOIN voted USING (b) WHERE tgt = 0 GROUP BY ex.id
         |), sel AS (
         |  SELECT id AS doc_id, n_bigrams, t_votes, r_votes,
         |    CAST(t_votes + 1 AS DOUBLE) / (t_votes + r_votes + 2) AS importance
         |  FROM per ORDER BY importance DESC, id LIMIT 100
         |)
         |SELECT doc_id, n_bigrams, t_votes, r_votes, importance,
         |  CAST(row_number() OVER (ORDER BY importance DESC, doc_id) AS BIGINT)
         |    AS sel_rank
         |FROM sel ORDER BY sel_rank""".stripMargin,

    "p14_minhash_neardup" -> minhashSql(graft.text.TextDedup.DefaultMaxBucket),
    // the cap-BITING configuration: at sf0.01 the largest band buckets
    // hold 3 documents, so maxBucket = 2 really drops buckets on both
    // engines — this row pins the cap's semantics themselves, not just
    // the cap-never-bites case p14 exercises
    "p91_minhash_capped" -> minhashSql(2),

    "p15_ngram_jaccard" -> (shingleCtes +
      s""",
         |sizes AS (SELECT id, len(sh) AS n FROM shn),
         |ex AS (SELECT id, unnest(sh) AS g FROM shn),
         |inter AS (
         |  SELECT a.id AS da, b.id AS db, count(*) AS i
         |  FROM ex a JOIN ex b ON a.g = b.g AND a.id < b.id GROUP BY 1, 2
         |)
         |SELECT da AS doc_a, db AS doc_b, CAST(i AS DOUBLE)/(sa.n + sb.n - i) AS jaccard
         |FROM inter JOIN sizes sa ON da = sa.id JOIN sizes sb ON db = sb.id
         |WHERE CAST(i AS DOUBLE)/(sa.n + sb.n - i) >= CAST(0.8 AS DOUBLE)
         |ORDER BY doc_a, doc_b""".stripMargin),

    // the df-capped twin of p15: ultra-common shingles leave the inverted
    // index (rare CTE) before pairing, set sizes stay FULL — mirroring
    // TextDedup.ngramJaccardPairs(maxShingleDf = 4), where the cap filters
    // the exploded index only and jaccard is a lower bound.
    "p15b_ngram_jaccard_capped" -> ngramCappedSql(4),

    // winnowing/MOSS pairs (p158): ORDERED 5-gram hashes (no distinct —
    // winnowing needs positions), window-of-4 minima as the fingerprint
    // set, df-capped inverted-index self-join on the fingerprint value.
    "p158_winnowing_pairs" ->
      s"""WITH toks AS (
         |  SELECT doc_id AS id, string_split(${norm("text")}, ' ') AS t FROM documents
         |), thd AS (
         |  SELECT id, list_transform(t, tok -> ${hash("tok")}) AS th FROM toks
         |), gr AS (
         |  SELECT id, CASE WHEN len(th) >= 5
         |    THEN [list_reduce(list_prepend(CAST(7 AS BIGINT), th[i:i+4]),
         |          (a, b) -> (a*31 + b) % $P) for i in range(1, len(th)-3)]
         |    ELSE CAST([] AS BIGINT[]) END AS g
         |  FROM thd
         |), fps AS (
         |  SELECT id, unnest(CASE
         |    WHEN len(g) >= 4
         |      THEN list_distinct([list_min(g[i:i+3]) for i in range(1, len(g)-2)])
         |    WHEN len(g) >= 1 THEN [list_min(g)]
         |    ELSE CAST([] AS BIGINT[]) END) AS fp
         |  FROM gr
         |), rare AS (
         |  SELECT fp FROM fps GROUP BY fp HAVING count(*) <= 16
         |), ex AS (SELECT id, fp FROM fps JOIN rare USING (fp))
         |SELECT x.id AS doc_a, y.id AS doc_b,
         |  CAST(count(*) AS BIGINT) AS n_shared
         |FROM ex x JOIN ex y ON x.fp = y.fp AND x.id < y.id
         |GROUP BY 1, 2 HAVING count(*) >= 2
         |ORDER BY doc_a, doc_b""".stripMargin,
    // cap biting at sf0.1 (df there reaches ~25, so 16 drops the hottest
    // shingles but keeps the duplicate families' shared ones): the
    // configuration whose POSITIVE rows survive at the dual-gate's
    // larger scale, where p15b's cap-4 output is legitimately empty.
    "p93_ngram_jaccard_cap16" -> ngramCappedSql(16),

    // overlap coefficient |A∩B|/min(|A|,|B|) at cap 16 — mirrors
    // TextDedup.containmentPairs: the df-cap filters the index only
    // (sizes stay full), docs under 5 shingles leave both the index and
    // the size table, and there is NO size-compatibility prune (size-
    // mismatched pairs are the operator's point).
    "p94_containment_pairs" -> (shingleCtes +
      s""",
         |sizes AS (SELECT id, len(sh) AS n FROM shn WHERE len(sh) >= 5),
         |ex AS (SELECT s.id, unnest(s.sh) AS g FROM shn s
         |       WHERE len(s.sh) >= 5),
         |rare AS (SELECT g FROM (SELECT g, count(*) AS df FROM ex GROUP BY g)
         |         WHERE df <= 16),
         |exc AS (SELECT ex.id, ex.g FROM ex JOIN rare USING (g)),
         |inter AS (
         |  SELECT a.id AS da, b.id AS db, count(*) AS i
         |  FROM exc a JOIN exc b ON a.g = b.g AND a.id < b.id GROUP BY 1, 2
         |)
         |SELECT da AS doc_a, db AS doc_b,
         |       CAST(i AS DOUBLE)/least(sa.n, sb.n) AS containment
         |FROM inter JOIN sizes sa ON da = sa.id JOIN sizes sb ON db = sb.id
         |WHERE CAST(i AS DOUBLE)/least(sa.n, sb.n) >= CAST(0.9 AS DOUBLE)
         |ORDER BY doc_a, doc_b""".stripMargin),

    // p94 without the rare/exc df-cap CTEs: uncapped ground truth — the
    // sf0.1 delta against p94 (256 vs 179 pairs) is the cap's bite.
    "p98_containment_exact" -> (shingleCtes +
      s""",
         |sizes AS (SELECT id, len(sh) AS n FROM shn WHERE len(sh) >= 5),
         |ex AS (SELECT s.id, unnest(s.sh) AS g FROM shn s
         |       WHERE len(s.sh) >= 5),
         |inter AS (
         |  SELECT a.id AS da, b.id AS db, count(*) AS i
         |  FROM ex a JOIN ex b ON a.g = b.g AND a.id < b.id GROUP BY 1, 2
         |)
         |SELECT da AS doc_a, db AS doc_b,
         |       CAST(i AS DOUBLE)/least(sa.n, sb.n) AS containment
         |FROM inter JOIN sizes sa ON da = sa.id JOIN sizes sb ON db = sb.id
         |WHERE CAST(i AS DOUBLE)/least(sa.n, sb.n) >= CAST(0.9 AS DOUBLE)
         |ORDER BY doc_a, doc_b""".stripMargin),

    // chunk-level exact dedup over the p81 chunk chain: group by chunk
    // hash, canonical keeper = min (id, chunk_idx) — computed as min(id)
    // then min(chunk_idx) within that id (two steps; engine-independent
    // where Spark uses one min(struct) argmin).
    "p95_chunk_dedup" ->
      s"""WITH n AS (SELECT doc_id AS id, ${norm("text")} AS nrm FROM documents),
         |t AS (SELECT id, string_split(nrm, ' ') AS t,
         |             len(string_split(nrm, ' ')) AS n FROM n),
         |ch AS (
         |  SELECT id, t, n,
         |    unnest(range(0, CAST(ceil(CAST(n AS DOUBLE)/24) AS INT))) AS k
         |  FROM t
         |), chunks AS (
         |  SELECT id, CAST(k AS BIGINT) AS chunk_idx,
         |    ${hash("array_to_string(t[CAST(k*24+1 AS INT) : CAST(k*24+32 AS INT)], ' ')")} AS chunk_hash
         |  FROM ch
         |), grp AS (
         |  SELECT chunk_hash, count(*) AS n_copies, min(id) AS keep_id
         |  FROM chunks GROUP BY 1 HAVING count(*) >= 2
         |)
         |SELECT g.chunk_hash, g.n_copies, g.keep_id,
         |       min(c.chunk_idx) AS keep_chunk_idx
         |FROM grp g JOIN chunks c
         |  ON c.chunk_hash = g.chunk_hash AND c.id = g.keep_id
         |GROUP BY 1, 2, 3
         |ORDER BY g.chunk_hash""".stripMargin,

    // token-budget mixture sampling: per-language running token sum in id
    // order (a plain window here — the oracle corpus is small; Spark
    // computes the SAME sum via the keyed distributed prefix machinery,
    // so the values must agree exactly), keep rows whose interval starts
    // inside the 4000-token budget.
    "p96_mixture_sample" ->
      s"""WITH toks AS (
         |  SELECT doc_id AS id, string_split(${norm("text")}, ' ') AS t FROM documents
         |), hits AS (
         |  SELECT id, CAST(len(t) AS BIGINT) AS n_tokens,
         |    CAST(len(list_filter(t, x -> x IN ('the','is','and','of'))) AS BIGINT) AS en,
         |    CAST(len(list_filter(t, x -> x IN ('el','la','que','de'))) AS BIGINT) AS es,
         |    CAST(len(list_filter(t, x -> x IN ('le','les','une','est'))) AS BIGINT) AS fr,
         |    CAST(len(list_filter(t, x -> x IN ('der','die','und','ist'))) AS BIGINT) AS de
         |  FROM toks
         |), lang AS (
         |  SELECT id, n_tokens,
         |    CASE WHEN en + es + fr + de = 0 THEN 'und'
         |         WHEN en >= es AND en >= fr AND en >= de THEN 'en'
         |         WHEN es >= fr AND es >= de THEN 'es'
         |         WHEN fr >= de THEN 'fr' ELSE 'de' END AS predicted_lang
         |  FROM hits
         |), c AS (
         |  SELECT id, predicted_lang, n_tokens,
         |    CAST(sum(n_tokens) OVER (PARTITION BY predicted_lang ORDER BY id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_lang_tokens
         |  FROM lang
         |)
         |SELECT id, predicted_lang, n_tokens, cum_lang_tokens
         |FROM c WHERE cum_lang_tokens - n_tokens < 4000
         |ORDER BY id""".stripMargin,

    // p96's multi-language twin keyed by the documents' own `lang` column:
    // five languages, each over-budget at sf0.1 (every per-key budget
    // binds); same window shape as p96 incl. the BIGINT cast (DuckDB
    // window sums are HUGEINT).
    "p97_mixture_multilang" ->
      s"""WITH toks AS (
         |  SELECT doc_id AS id, lang, string_split(${norm("text")}, ' ') AS t
         |  FROM documents
         |), c AS (
         |  SELECT id, lang, CAST(len(t) AS BIGINT) AS n_tokens FROM toks
         |), w AS (
         |  SELECT id, lang, n_tokens,
         |    CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |      AS cum_lang_tokens
         |  FROM c
         |)
         |SELECT id, lang, n_tokens, cum_lang_tokens FROM w
         |WHERE cum_lang_tokens - n_tokens < 4000
         |ORDER BY id""".stripMargin,

    "p16_simhash" ->
      s"""WITH toks AS (
         |  SELECT doc_id AS id, string_split(${norm("text")}, ' ') AS t FROM documents
         |), th AS (SELECT id, list_transform(t, tok -> ${hash("tok")}) AS h FROM toks)
         |SELECT id, $simhashExpr AS simhash FROM th ORDER BY id""".stripMargin,

    "p17_simhash_neardup" -> (simhashCandCtes +
      s"""
         |SELECT da AS doc_a, db AS doc_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
         |FROM cand WHERE bit_count(xor(sa, sb)) <= 1 ORDER BY doc_a, doc_b""".stripMargin),

    // duplicate groups over the p17 pair graph: connected components as a
    // recursive reachability closure, component label = min member id —
    // the declarative twin of TextDedup.duplicateGroups' min-label
    // propagation fixpoint (both compute exact components, so they agree
    // row-for-row however many rounds propagation took).
    "p37_dedup_groups" -> (simhashCandCtes.replaceFirst("WITH ", "WITH RECURSIVE ") +
      s""",
         |pairs AS (SELECT da, db FROM cand WHERE bit_count(xor(sa, sb)) <= 1),
         |nodes AS (SELECT da AS id FROM pairs UNION SELECT db AS id FROM pairs),
         |edges AS (SELECT da AS a, db AS b FROM pairs
         |          UNION ALL SELECT db AS a, da AS b FROM pairs),
         |reach AS (
         |  SELECT id, id AS lab FROM nodes
         |  UNION
         |  SELECT e.b AS id, r.lab AS lab FROM reach r JOIN edges e ON e.a = r.id
         |)
         |SELECT id AS doc_id, MIN(lab) AS group_id
         |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin),

    // best-of-group representative: p37's recursive closure joined with
    // the p18 quality formula; the keeper is row_number() = 1 under
    // (quality DESC, doc_id) — the twin of Spark's
    // max(struct(quality, -doc_id, doc_id)) argmax. simhashCandCtes
    // already defines the token CTE the quality formula needs.
    "p89_group_representative" -> (simhashCandCtes.replaceFirst("WITH ", "WITH RECURSIVE ") +
      s""",
         |pairs AS (SELECT da, db FROM cand WHERE bit_count(xor(sa, sb)) <= 1),
         |gnodes AS (SELECT da AS id FROM pairs UNION SELECT db AS id FROM pairs),
         |edges AS (SELECT da AS a, db AS b FROM pairs
         |          UNION ALL SELECT db AS a, da AS b FROM pairs),
         |reach AS (
         |  SELECT id, id AS lab FROM gnodes
         |  UNION
         |  SELECT e.b AS id, r.lab AS lab FROM reach r JOIN edges e ON e.a = r.id
         |),
         |comp AS (SELECT id AS doc_id, MIN(lab) AS group_id FROM reach GROUP BY id),
         |q AS (
         |  SELECT id,
         |    least(CAST(1.0 AS DOUBLE), CAST(len(t) AS DOUBLE) / CAST(200.0 AS DOUBLE))
         |      * (CAST(1.0 AS DOUBLE)
         |         - CAST(len(list_filter(t, x -> x IN $stopList)) AS DOUBLE) / len(t))
         |      AS quality_score
         |  FROM toks
         |),
         |ranked AS (
         |  SELECT c.group_id, c.doc_id, q.quality_score,
         |         row_number() OVER (PARTITION BY c.group_id
         |                            ORDER BY q.quality_score DESC, c.doc_id) AS rn,
         |         count(*) OVER (PARTITION BY c.group_id) AS group_size
         |  FROM comp c JOIN q ON c.doc_id = q.id
         |)
         |SELECT group_id, doc_id AS rep_id, quality_score AS rep_quality,
         |       CAST(group_size AS BIGINT) AS group_size,
         |       CAST(group_size - 1 AS BIGINT) AS n_discarded
         |FROM ranked WHERE rn = 1 ORDER BY group_id""".stripMargin),

    "p18_text_stats" ->
      s"""WITH toks AS (
         |  SELECT doc_id AS id, ${norm("text")} AS norm,
         |         string_split(${norm("text")}, ' ') AS t
         |  FROM documents
         |)
         |SELECT id,
         |  CAST(length(norm) AS BIGINT) AS n_chars,
         |  CAST(len(t) AS BIGINT) AS n_tokens,
         |  CAST(len(list_distinct(t)) AS BIGINT) AS n_unique_tokens,
         |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
         |       list_transform(t, x -> CAST(length(x) AS BIGINT))), (a, b) -> a + b) AS DOUBLE)
         |    / len(t) AS avg_token_len,
         |  CAST(len(list_filter(t, x -> x IN $stopList)) AS DOUBLE) / len(t) AS stopword_ratio,
         |  least(CAST(1.0 AS DOUBLE), CAST(len(t) AS DOUBLE) / CAST(200.0 AS DOUBLE))
         |    * (CAST(1.0 AS DOUBLE)
         |       - CAST(len(list_filter(t, x -> x IN $stopList)) AS DOUBLE) / len(t))
         |    AS quality_score
         |FROM toks ORDER BY id""".stripMargin,

    // language-stratified quality gate (p162): the p18 quality fold, a
    // per-LANGUAGE lower discrete quantile threshold (the p139 rank
    // rule), keep iff score >= threshold.
    "p162_lang_quality_gate" ->
      s"""WITH toks AS (
         |  SELECT doc_id AS id, lang, ${norm("text")} AS norm,
         |         string_split(${norm("text")}, ' ') AS t
         |  FROM documents
         |), q AS (
         |  SELECT id, lang,
         |    least(CAST(1.0 AS DOUBLE), CAST(len(t) AS DOUBLE) / CAST(200.0 AS DOUBLE))
         |      * (CAST(1.0 AS DOUBLE)
         |         - CAST(len(list_filter(t, x -> x IN $stopList)) AS DOUBLE) / len(t))
         |      AS quality_score
         |  FROM toks
         |), byl AS (
         |  SELECT lang, list_sort(list(quality_score)) AS vs
         |  FROM q WHERE quality_score IS NOT NULL GROUP BY lang
         |), thr AS (
         |  SELECT lang,
         |    vs[CAST(greatest(1, ceil(CAST(${graft.text.TextStats.QualityGateQ}
         |      AS DOUBLE) * len(vs))) AS INT)] AS lang_threshold
         |  FROM byl
         |)
         |SELECT q.id AS doc_id, q.lang, q.quality_score, thr.lang_threshold,
         |       q.quality_score >= thr.lang_threshold AS keep
         |FROM q LEFT JOIN thr ON q.lang = thr.lang
         |ORDER BY doc_id""".stripMargin,

    "p19_lang_id" ->
      s"""WITH toks AS (
         |  SELECT doc_id AS id, string_split(${norm("text")}, ' ') AS t FROM documents
         |), hits AS (
         |  SELECT id,
         |    CAST(len(list_filter(t, x -> x IN ('the','is','and','of'))) AS BIGINT) AS en,
         |    CAST(len(list_filter(t, x -> x IN ('el','la','que','de'))) AS BIGINT) AS es,
         |    CAST(len(list_filter(t, x -> x IN ('le','les','une','est'))) AS BIGINT) AS fr,
         |    CAST(len(list_filter(t, x -> x IN ('der','die','und','ist'))) AS BIGINT) AS de
         |  FROM toks
         |)
         |SELECT id, en AS en_hits, es AS es_hits, fr AS fr_hits, de AS de_hits,
         |  CASE WHEN en + es + fr + de = 0 THEN 'und'
         |       WHEN en >= es AND en >= fr AND en >= de THEN 'en'
         |       WHEN es >= fr AND es >= de THEN 'es'
         |       WHEN fr >= de THEN 'fr' ELSE 'de' END AS predicted_lang
         |FROM hits ORDER BY id""".stripMargin,

    // Gopher repetition signals twin: the same planted line structure
    // (text + its 40-char prefix twice + a doc_id-varying prefix), lines
    // space-trimmed and blank-dropped, token n-grams over the house
    // normalization; every fraction one INT/INT double division, gram
    // tie-breaks on DuckDB's binary collation (= the engine's UTF8
    // order), so all eleven columns hash-match.
    "p131_repetition_signals" -> repetitionSignalsSql,

    // the published Gopher thresholds over those signals (Rae et al.
    // Table A1; dup-5-gram applied to the occurrence fraction — the
    // engine's documented deviation): per-rule flags + keep verdict
    // NOTE: built by concatenation, not one interpolated stripMargin —
    // the signals SQL contains lines starting with the `||` concat
    // operator, which an outer stripMargin would corrupt.
    "p132_gopher_filter" -> gopherFilterSql,


    // Gopher QUALITY rules twin: the same planted bullet/ellipsis line
    // structure, token measures over the house normalization, lines per
    // the p131 contract; fractions are single INT/INT double divisions
    // and flags mirror the published thresholds.
    "p133_gopher_quality" -> gopherQualitySql,

    "p36_token_counts" ->
      s"""WITH n AS (SELECT doc_id AS id, ${norm("text")} AS norm FROM documents)
         |SELECT id,
         |  CAST(len(string_split(norm, ' ')) AS BIGINT) AS n_ws_tokens,
         |  CAST(len(regexp_extract_all(norm, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT)
         |    AS n_bpe_tokens,
         |  CAST(len(regexp_extract_all(norm, '[a-z]+')) AS BIGINT) AS n_word_tokens,
         |  CAST(len(regexp_extract_all(norm, '[0-9]+')) AS BIGINT) AS n_num_tokens,
         |  CAST(len(regexp_extract_all(norm, '[^a-z0-9 ]')) AS BIGINT) AS n_punct_tokens
         |FROM n ORDER BY id""".stripMargin,

    "p20_doc_fingerprint" ->
      s"""WITH n AS (SELECT doc_id AS id, ${norm("text")} AS norm FROM documents),
         |g AS (
         |  SELECT id, norm, CASE WHEN length(norm) >= 8
         |    THEN [substr(norm, CAST(i AS INT), 8) for i in range(1, length(norm) - 6)]
         |    ELSE CAST([] AS VARCHAR[]) END AS grams
         |  FROM n
         |), h AS (SELECT id, norm, list_transform(grams, x -> ${hash("x")}) AS gh FROM g)
         |SELECT id, ${hash("norm")} AS content_hash,
         |       list_min(gh) AS min_gram_hash, list_max(gh) AS max_gram_hash,
         |       CAST(len(gh) AS BIGINT) AS n_grams
         |FROM h ORDER BY id""".stripMargin,

    "p160_mmr_rerank" -> mmrSql(kCand = graft.ann.Similarity.MmrKCand,
      m = graft.ann.Similarity.MmrM, lam = graft.ann.Similarity.MmrLambda),

    "p21_knn_bruteforce" ->
      s"""WITH v AS (SELECT vec_id, embedding AS e FROM embeddings),
         |q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < 20),
         |sims AS (
         |  SELECT query_id, v.vec_id AS neighbor_id, ${cos("qe", "e")} AS sim
         |  FROM q JOIN v ON v.vec_id <> query_id
         |),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |                               ORDER BY sim DESC, neighbor_id) AS rn
         |  FROM sims
         |)
         |SELECT query_id, CAST(rn AS BIGINT) AS knn_rank, neighbor_id, sim
         |FROM ranked WHERE rn <= 5 ORDER BY query_id, knn_rank""".stripMargin,

    "p22_knn_lsh" ->
      s"""WITH v AS (SELECT vec_id, embedding AS e FROM embeddings),
         |bk AS (SELECT vec_id, e, ${bucket("e", 0, 8)} AS bucket FROM v),
         |q AS (SELECT vec_id AS query_id, e AS qe, bucket FROM bk WHERE vec_id < 20),
         |sims AS (
         |  SELECT query_id, b.vec_id AS neighbor_id, ${cos("qe", "b.e")} AS sim
         |  FROM q JOIN bk b USING (bucket) WHERE b.vec_id <> query_id
         |),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |                               ORDER BY sim DESC, neighbor_id) AS rn
         |  FROM sims
         |)
         |SELECT query_id, CAST(rn AS BIGINT) AS knn_rank, neighbor_id, sim
         |FROM ranked WHERE rn <= 5 ORDER BY query_id, knn_rank""".stripMargin,

    // p22's OR-construction twin: per-table buckets unioned, candidate
    // pairs deduped across tables, then the same exact-cosine top-5
    "p92_knn_lsh_multi" ->
      s"""WITH v AS (SELECT vec_id, embedding AS e FROM embeddings),
         |bk AS (
         |  SELECT vec_id, e, 0 AS tbl, ${bucket("e", 0, 8)} AS bucket FROM v
         |  UNION ALL SELECT vec_id, e, 1, ${bucket("e", 8, 8)} FROM v
         |  UNION ALL SELECT vec_id, e, 2, ${bucket("e", 16, 8)} FROM v
         |  UNION ALL SELECT vec_id, e, 3, ${bucket("e", 24, 8)} FROM v
         |),
         |q AS (SELECT vec_id AS query_id, tbl, bucket FROM bk WHERE vec_id < 20),
         |cand AS (
         |  SELECT DISTINCT query_id, b.vec_id AS neighbor_id
         |  FROM q JOIN bk b USING (tbl, bucket) WHERE b.vec_id <> query_id
         |),
         |sims AS (
         |  SELECT query_id, neighbor_id, ${cos("x.e", "y.e")} AS sim
         |  FROM cand JOIN v x ON query_id = x.vec_id JOIN v y ON neighbor_id = y.vec_id
         |),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |                               ORDER BY sim DESC, neighbor_id) AS rn
         |  FROM sims
         |)
         |SELECT query_id, CAST(rn AS BIGINT) AS knn_rank, neighbor_id, sim
         |FROM ranked WHERE rn <= 5 ORDER BY query_id, knn_rank""".stripMargin,

    // corpus vocabulary: term + document frequency per whitespace token of
    // the normalized text, top 50 under the strict (tf DESC, token) order
    "p61_vocab_top" ->
      s"""WITH toks AS (
         |  SELECT doc_id AS id, unnest(string_split(${norm("text")}, ' ')) AS token
         |  FROM documents
         |)
         |SELECT token, count(*) AS tf, count(DISTINCT id) AS df
         |FROM toks GROUP BY token ORDER BY tf DESC, token LIMIT 50""".stripMargin,

    // IVF index balance profile: the same argmax cell assignment as p38's
    // search (ties toward the smallest centroid id), aggregated per cell;
    // share is one exact double division by the corpus count.
    "p62_cluster_profile" ->
      s"""WITH v AS (SELECT vec_id, embedding AS e FROM embeddings),
         |cents AS (SELECT vec_id AS cid, e AS ce FROM v ORDER BY vec_id LIMIT 8),
         |scored AS (
         |  SELECT v.vec_id, c.cid, ${cos("v.e", "c.ce")} AS cs
         |  FROM v CROSS JOIN cents c
         |),
         |assigned AS (
         |  SELECT vec_id, cid AS cell FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |                                 ORDER BY cs DESC, cid) AS rn
         |    FROM scored
         |  ) WHERE rn = 1
         |),
         |g AS (
         |  SELECT cell, count(*) AS n_vectors,
         |         min(vec_id) AS min_vec_id, max(vec_id) AS max_vec_id
         |  FROM assigned GROUP BY cell
         |)
         |SELECT cell, n_vectors, min_vec_id, max_vec_id,
         |  CAST(n_vectors AS DOUBLE) / CAST((SELECT count(*) FROM v) AS DOUBLE) AS share
         |FROM g ORDER BY cell""".stripMargin,

    // stratified deterministic sample: top-3 per predicted language under
    // the scrambled-content-hash priority (p19's language vote + p39's
    // scramble family with a different reduction range); ties break by id
    // on both engines.
    "p63_lang_sample" ->
      s"""WITH n AS (SELECT doc_id AS id, ${norm("text")} AS nrm FROM documents),
         |t AS (SELECT id, nrm, string_split(nrm, ' ') AS t FROM n),
         |hits AS (
         |  SELECT id,
         |    CAST(len(list_filter(t, x -> x IN ('the','is','and','of'))) AS BIGINT) AS en,
         |    CAST(len(list_filter(t, x -> x IN ('el','la','que','de'))) AS BIGINT) AS es,
         |    CAST(len(list_filter(t, x -> x IN ('le','les','une','est'))) AS BIGINT) AS fr,
         |    CAST(len(list_filter(t, x -> x IN ('der','die','und','ist'))) AS BIGINT) AS de,
         |    ${hash("nrm")} * 2654435761 % $P % 1000000 AS priority
         |  FROM t
         |),
         |lang AS (
         |  SELECT id, priority,
         |    CASE WHEN en + es + fr + de = 0 THEN 'und'
         |         WHEN en >= es AND en >= fr AND en >= de THEN 'en'
         |         WHEN es >= fr AND es >= de THEN 'es'
         |         WHEN fr >= de THEN 'fr' ELSE 'de' END AS predicted_lang
         |  FROM hits
         |),
         |ranked AS (
         |  SELECT predicted_lang, id, priority,
         |    row_number() OVER (PARTITION BY predicted_lang
         |                       ORDER BY priority, id) AS rn
         |  FROM lang
         |)
         |SELECT predicted_lang, CAST(rn AS BIGINT) AS sample_rank, id, priority
         |FROM ranked WHERE rn <= 3 ORDER BY predicted_lang, sample_rank""".stripMargin,

    // corpus length histogram: 100-char integer-DIV buckets over the
    // normalized length, token budget per bucket.
    "p64_length_histogram" ->
      s"""WITH n AS (SELECT doc_id AS id, ${norm("text")} AS nrm FROM documents),
         |st AS (SELECT id, CAST(length(nrm) AS BIGINT) AS n_chars,
         |              CAST(len(string_split(nrm, ' ')) AS BIGINT) AS n_tokens
         |       FROM n)
         |SELECT n_chars // 100 AS bucket, count(*) AS n_docs,
         |       min(n_chars) AS min_chars, max(n_chars) AS max_chars,
         |       CAST(sum(n_tokens) AS BIGINT) AS total_tokens
         |FROM st GROUP BY 1 ORDER BY bucket""".stripMargin,

    // the curation-funnel capstone: exact dedup → simhash CC over the
    // keepers → quality flags → splits, as one recursive-CTE statement
    // assembled from the same helper fragments as p13/p17/p37/p41/p39 —
    // integer counts only, so the composed pipeline verifies end-to-end.
    "p78_curation_funnel" ->
      s"""WITH RECURSIVE kd AS (
         |  SELECT min(doc_id) AS id FROM documents
         |  GROUP BY ${hash(norm("text"))},
         |    list_reduce(list_prepend(CAST(11 AS BIGINT),
         |      list_transform(string_split(${norm("text")}, ''),
         |        c -> CAST(ascii(c) AS BIGINT))), (a, b) -> (a*37 + b) % 998244353)
         |), kdd AS (
         |  SELECT d.doc_id AS id, d.text FROM documents d JOIN kd ON d.doc_id = kd.id
         |),
         |toks AS (SELECT id, string_split(${norm("text")}, ' ') AS t FROM kdd),
         |th AS (SELECT id, list_transform(t, tok -> ${hash("tok")}) AS h FROM toks),
         |sigs AS (SELECT id, $simhashExpr AS sig FROM th),
         |bands AS (
         |  SELECT id, sig, r.band AS band, (sig >> (r.band*15)) % 32768 AS bucket
         |  FROM sigs, range(0, 2) r(band)
         |),
         |cand AS (
         |  SELECT DISTINCT a.id AS da, a.sig AS sa, b.id AS db, b.sig AS sb
         |  FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id
         |),
         |prs AS (SELECT da, db FROM cand WHERE bit_count(xor(sa, sb)) <= 1),
         |nodes AS (SELECT da AS id FROM prs UNION SELECT db AS id FROM prs),
         |edges AS (SELECT da AS a, db AS b FROM prs
         |          UNION ALL SELECT db AS a, da AS b FROM prs),
         |reach AS (
         |  SELECT id, id AS lab FROM nodes
         |  UNION
         |  SELECT e.b AS id, r.lab AS lab FROM reach r JOIN edges e ON e.a = r.id
         |),
         |grp AS (SELECT id, MIN(lab) AS group_id FROM reach GROUP BY id),
         |noncanon AS (SELECT id FROM grp WHERE id <> group_id),
         |canon AS (SELECT id, text FROM kdd
         |          WHERE id NOT IN (SELECT id FROM noncanon)),
         |cn AS (SELECT id, ${norm("text")} AS nrm FROM canon),
         |ct AS (SELECT id, nrm, string_split(nrm, ' ') AS t FROM cn),
         |cc AS (SELECT id, nrm,
         |  CAST(len(t) AS BIGINT) AS n_tokens,
         |  CAST(list_max(list_transform(list_distinct(t),
         |    d -> len(list_filter(t, x -> x = d)))) AS BIGINT) AS top_cnt,
         |  CAST(greatest(0, len(t) - 1) AS BIGINT) AS n_bigrams,
         |  CAST(len(list_distinct(CASE WHEN len(t) >= 2
         |    THEN [t[i] || ' ' || t[i+1] for i in range(1, len(t))]
         |    ELSE CAST([] AS VARCHAR[]) END)) AS BIGINT) AS n_uniq_bigrams,
         |  CAST(length(nrm) - length(regexp_replace(nrm, '[^a-z0-9 ]', '', 'g'))
         |    AS BIGINT) AS n_sym,
         |  CAST(length(nrm) AS BIGINT) AS n_chars
         |FROM ct),
         |keepq AS (
         |  SELECT id, nrm FROM cc
         |  WHERE CAST(top_cnt AS DOUBLE)/n_tokens <= CAST(0.2 AS DOUBLE)
         |    AND (CASE WHEN n_bigrams > 0
         |         THEN CAST(n_bigrams - n_uniq_bigrams AS DOUBLE)/n_bigrams
         |         ELSE CAST(0.0 AS DOUBLE) END) <= CAST(0.3 AS DOUBLE)
         |    AND CAST(n_sym AS DOUBLE)/n_chars <= CAST(0.2 AS DOUBLE)
         |),
         |sp AS (SELECT id, ${hash("nrm")} * 2654435761 % $P % 1000 AS bucket FROM keepq)
         |SELECT
         |  (SELECT count(*) FROM documents) AS n_total,
         |  (SELECT count(*) FROM kd) AS n_exact,
         |  (SELECT count(*) FROM canon) AS n_canonical,
         |  (SELECT count(*) FROM keepq) AS n_quality,
         |  (SELECT count(*) FROM sp WHERE bucket < 800) AS n_train,
         |  (SELECT count(*) FROM sp WHERE bucket >= 800 AND bucket < 900) AS n_val,
         |  (SELECT count(*) FROM sp WHERE bucket >= 900) AS n_test""".stripMargin,

    // deterministic HyperLogLog distinct-shingle estimate: 256 integer
    // registers (max rank each), harmonic denominator as ONE register-
    // ordered L-R fold seeded with the absent registers — double math
    // order-identical to the Spark side; alpha·m² printed from the same
    // Scala double.
    // BPE apply twin of BpeTokenizer.tokenize: the persisted merge table
    // drives a recursive CTE replaying the IDENTICAL delimited-symbol
    // replace chain (delimiters chr(1)/chr(2) fully consumed per match →
    // left-to-right non-overlapping replace is exactly the BPE merge
    // pass on both engines). Training itself is spec-pinned (integer
    // argmax — BpeTokenizerSpec's hand-computed Sennrich fixture).
    "p114_bpe_tokenize" -> (bpeApplyCtes(graft.ops.DocAnalytics.P114MergesPath) +
      s"""
         |SELECT doc_id,
         |  CAST(len(string_split(norm, ' ')) AS BIGINT) AS n_words,
         |  CAST(length(norm) AS BIGINT) AS n_chars,
         |  n_bpe_tokens,
         |  CAST(length(norm) AS DOUBLE) / n_bpe_tokens AS chars_per_token
         |FROM fin ORDER BY doc_id""".stripMargin),

    // BPE-token mixture budget twin (p117): the recursive apply chain
    // from p117's own persisted merges, then the p97 keyed prefix-sum
    // budget window over n_bpe_tokens keyed by the metadata lang.
    "p117_bpe_budget" -> (bpeApplyCtes(graft.ops.DocAnalytics.P117MergesPath) +
      s"""
         |, lx AS (
         |  SELECT f.doc_id AS id, d.lang, f.n_bpe_tokens
         |  FROM fin f JOIN documents d USING (doc_id)
         |), w AS (
         |  SELECT id, lang, n_bpe_tokens,
         |    CAST(sum(n_bpe_tokens) OVER (PARTITION BY lang ORDER BY id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |      AS cum_lang_tokens
         |  FROM lx
         |)
         |SELECT id, lang, n_bpe_tokens, cum_lang_tokens FROM w
         |WHERE cum_lang_tokens - n_bpe_tokens < 8000
         |ORDER BY id""".stripMargin),

    // per-language BPE fertility (p140): the p114 recursive apply chain
    // from p140's own persisted merges, rolled up per metadata lang —
    // integer sums then ONE double division per rate, the p114 shape.
    "p140_token_fertility" -> (bpeApplyCtes(graft.ops.DocAnalytics.P140MergesPath) +
      s"""
         |, lx AS (
         |  SELECT f.doc_id, d.lang,
         |         CAST(len(string_split(f.norm, ' ')) AS BIGINT) AS n_words,
         |         CAST(length(f.norm) AS BIGINT) AS n_chars, f.n_bpe_tokens
         |  FROM fin f JOIN documents d USING (doc_id)
         |)
         |SELECT lang, count(*) AS n_docs,
         |  CAST(sum(n_words) AS BIGINT) AS total_words,
         |  CAST(sum(n_bpe_tokens) AS BIGINT) AS total_tokens,
         |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
         |  CAST(sum(n_bpe_tokens) AS DOUBLE) / CAST(sum(n_words) AS BIGINT)
         |    AS tokens_per_word,
         |  CAST(sum(n_chars) AS DOUBLE) / CAST(sum(n_bpe_tokens) AS BIGINT)
         |    AS chars_per_token
         |FROM lx GROUP BY lang ORDER BY lang""".stripMargin),

    // ICLM semantic packing (p152): the p121 hashed-embedding chain,
    // cosine argmax against the persisted trained centroids (p147
    // convention), then the cell-partitioned token prefix sum and the
    // integer bin cut — every stage exact, so the composed pipeline
    // verifies end-to-end.
    "p152_semantic_packing" -> (hashedEmbCte +
      s""",
         |cents AS (SELECT cent_id AS cid, ce FROM read_parquet(
         |  '${graft.ops.DocAnalytics.P152CentroidsPath}/*.parquet')),
         |asg AS (SELECT vec_id, cid AS cell FROM (
         |  SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
         |    ORDER BY ${cos("e", "ce")} DESC, cid) AS rn
         |  FROM v CROSS JOIN cents) WHERE rn = 1),
         |nt AS (SELECT id, CAST(len(t) AS BIGINT) AS n_tokens FROM toks),
         |w AS (SELECT a.vec_id AS doc_id, a.cell, n.n_tokens,
         |  CAST(sum(n.n_tokens) OVER (PARTITION BY a.cell ORDER BY a.vec_id
         |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cell_tokens
         |  FROM asg a JOIN nt n ON n.id = a.vec_id)
         |SELECT doc_id, cell, n_tokens, cum_cell_tokens,
         |  (cum_cell_tokens - n_tokens) // 512 AS bin
         |FROM w ORDER BY doc_id""".stripMargin),

    // c-TF-IDF cluster labels (p154): the p152 hashed-embedding + trained
    // cell chain, then p143's rational-idf rank at CELL granularity
    "p154_cell_topterms" -> (hashedEmbCte +
      s""",
         |cents AS (SELECT cent_id AS cid, ce FROM read_parquet(
         |  '${graft.ops.DocAnalytics.P154CentroidsPath}/*.parquet')),
         |asg AS (SELECT vec_id, cid AS cell FROM (
         |  SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
         |    ORDER BY ${cos("e", "ce")} DESC, cid) AS rn
         |  FROM v CROSS JOIN cents) WHERE rn = 1),
         |tok AS (SELECT a.cell, unnest(t.t) AS w
         |        FROM toks t JOIN asg a ON a.vec_id = t.id),
         |tf AS (SELECT cell, w, CAST(count(*) AS BIGINT) AS tf
         |       FROM tok GROUP BY 1, 2),
         |cfr AS (SELECT w, CAST(count(*) AS BIGINT) AS cf FROM tf GROUP BY 1),
         |nc AS (SELECT CAST(count(DISTINCT cell) AS BIGINT) AS n_cells FROM tf),
         |scored AS (
         |  SELECT cell, w, tf, cf,
         |    CAST(tf AS DOUBLE) * n_cells / cf AS ctfidf,
         |    row_number() OVER (PARTITION BY cell
         |      ORDER BY CAST(tf AS DOUBLE) * n_cells / cf DESC, w) AS rnk
         |  FROM tf JOIN cfr USING (w), nc
         |)
         |SELECT cell, CAST(rnk AS INT) AS rank, w AS term, tf, cf, ctfidf
         |FROM scored WHERE rnk <= 3 ORDER BY cell, rank""".stripMargin),

    // quantizer assignment churn (p151): the p147 flat cosine argmax
    // replayed against BOTH persisted quantizers; moved is their
    // disagreement. Ties toward the smaller cent_id, the cellOf
    // convention.
    "p151_quantizer_churn" ->
      s"""WITH co AS (SELECT cent_id AS cid, ce FROM read_parquet(
         |  '${graft.ops.DocAnalytics.P151OldCentroidsPath}/*.parquet')),
         |cn AS (SELECT cent_id AS cid, ce FROM read_parquet(
         |  '${graft.ops.DocAnalytics.P151NewCentroidsPath}/*.parquet')),
         |e AS (SELECT vec_id, embedding AS qe FROM embeddings),
         |ao AS (SELECT vec_id, cid AS cell_old FROM (
         |  SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
         |    ORDER BY ${cos("qe", "ce")} DESC, cid) AS rn
         |  FROM e CROSS JOIN co) WHERE rn = 1),
         |an AS (SELECT vec_id, cid AS cell_new FROM (
         |  SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
         |    ORDER BY ${cos("qe", "ce")} DESC, cid) AS rn
         |  FROM e CROSS JOIN cn) WHERE rn = 1)
         |SELECT vec_id, cell_old, cell_new, cell_old <> cell_new AS moved
         |FROM ao JOIN an USING (vec_id) ORDER BY vec_id""".stripMargin,

    // quantizer inertia audit (p159): flat cosine argmax over the
    // persisted centroids, per-row l2sq to the OWN centroid quantized to
    // 2^-20 fixed point, integer sums, one division each for mean/share.
    "p159_quantizer_inertia" ->
      s"""WITH cents AS (SELECT cent_id AS cid, ce FROM read_parquet(
         |  '${graft.ops.DocAnalytics.P159CentroidsPath}/*.parquet')),
         |e AS (SELECT vec_id, embedding AS qe FROM embeddings),
         |asg AS (SELECT vec_id, cid AS cell FROM (
         |  SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
         |    ORDER BY ${cos("qe", "ce")} DESC, cid) AS rn
         |  FROM e CROSS JOIN cents) WHERE rn = 1),
         |qd AS (
         |  SELECT a.cell,
         |    CAST(floor(${l2sq("qe", "ce")} * 1048576.0) AS BIGINT) AS q
         |  FROM asg a JOIN e ON e.vec_id = a.vec_id
         |  JOIN cents c ON c.cid = a.cell),
         |per AS (
         |  SELECT cell, CAST(count(*) AS BIGINT) AS n_vecs,
         |         CAST(sum(q) AS BIGINT) AS sse_q20
         |  FROM qd GROUP BY 1),
         |tot AS (SELECT CAST(sum(sse_q20) AS BIGINT) AS t FROM per)
         |SELECT cell, n_vecs, sse_q20,
         |  CAST(sse_q20 AS DOUBLE) / CAST(n_vecs * 1048576 AS DOUBLE)
         |    AS mean_sse,
         |  CAST(sse_q20 AS DOUBLE) / CAST(t AS DOUBLE) AS sse_share
         |FROM per CROSS JOIN tot ORDER BY cell""".stripMargin,

    // D4 prototypicality audit (p147): flat cosine argmax over the
    // persisted trained centroids (the p125 flat convention), cosine to
    // the OWN centroid as proto_sim, within-cell rank (sim DESC, id),
    // and the integer-exact drop verdict rank > (n·25) // 100.
    "p147_prototypicality" ->
      s"""WITH cents AS (SELECT cent_id AS cid, ce FROM read_parquet(
         |  '${graft.ops.DocAnalytics.P147CentroidsPath}/*.parquet')),
         |e AS (SELECT vec_id, embedding AS qe FROM embeddings),
         |fs AS (SELECT e.vec_id, c.cid, ${cos("qe", "ce")} AS cs
         |       FROM e CROSS JOIN cents c),
         |asg AS (SELECT vec_id, cid AS cell, cs AS proto_sim FROM (
         |  SELECT vec_id, cid, cs, row_number() OVER (PARTITION BY vec_id
         |    ORDER BY cs DESC, cid) AS rn FROM fs) WHERE rn = 1),
         |rk AS (SELECT vec_id, cell, proto_sim,
         |  CAST(row_number() OVER (PARTITION BY cell
         |    ORDER BY proto_sim DESC, vec_id) AS INT) AS proto_rank
         |  FROM asg),
         |ct AS (SELECT cell, CAST(count(*) AS BIGINT) AS n_cell
         |       FROM asg GROUP BY 1)
         |SELECT vec_id, cell, proto_sim, proto_rank, n_cell,
         |  proto_rank > (n_cell * 25) // 100 AS kept
         |FROM rk JOIN ct USING (cell) ORDER BY vec_id""".stripMargin,

    // merge-budget curve (p146): the SAME recursive chain, snapshotted
    // at three depths — a prefix of a sequential merge table is a valid
    // smaller tokenizer, so step i's repr IS the i-merge tokenization.
    // (bpeApplyCtes' fin CTE goes unused here; snap reads steps.)
    "p146_merge_budget" ->
      (bpeApplyCtes(graft.ops.DocAnalytics.P146MergesPath) +
      s"""
         |, snap AS (
         |  SELECT CAST(i AS INT) AS n_merges,
         |    CAST(len(string_split(substring(repr, 2, length(repr) - 2),
         |      chr(2) || chr(1))) AS BIGINT) AS n_tokens,
         |    CAST(length(norm) AS BIGINT) AS n_chars
         |  FROM steps WHERE i IN (10, 20, 40)
         |)
         |SELECT n_merges, CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
         |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
         |  CAST(sum(n_chars) AS DOUBLE) / CAST(sum(n_tokens) AS BIGINT)
         |    AS chars_per_token
         |FROM snap GROUP BY 1 ORDER BY 1""".stripMargin),

    // tokenizer vocabulary coverage (p144): the merge chain replayed at
    // WORD level over the corpus vocabulary — same delimited replace
    // recursion as bpeApplyCtes, but each row is a (word, freq) type.
    "p144_token_coverage" ->
      (bpeVocabCtes(graft.ops.DocAnalytics.P144MergesPath) +
      s"""
         |SELECT word, freq, n_tokens, n_tokens = 1 AS is_single
         |FROM wfin ORDER BY freq DESC, word LIMIT 25""".stripMargin),

    // coverage summary twin (p145): one row of integer totals with one
    // correctly-rounded double division per rate.
    "p145_coverage_summary" ->
      (bpeVocabCtes(graft.ops.DocAnalytics.P145MergesPath) +
      s"""
         |SELECT CAST(count(*) AS BIGINT) AS n_word_types,
         |  CAST(sum(freq) AS BIGINT) AS n_occurrences,
         |  CAST(sum(CASE WHEN n_tokens = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS single_token_types,
         |  CAST(sum(CASE WHEN n_tokens = 1 THEN freq ELSE 0 END) AS BIGINT)
         |    AS single_token_occurrences,
         |  CAST(sum(CASE WHEN n_tokens = 1 THEN freq ELSE 0 END) AS DOUBLE)
         |    / CAST(sum(freq) AS BIGINT) AS single_token_fraction,
         |  CAST(sum(freq * n_tokens) AS DOUBLE) / CAST(sum(freq) AS BIGINT)
         |    AS tokens_per_occurrence
         |FROM wfin""".stripMargin),

    // PMI collocations (p142): bigram counts with position marginals
    // DERIVED by re-aggregating the bigram table (the Spark shape);
    // pmi_ratio = (double)c12 · N / (c1·c2) — exact integer products,
    // one correctly-rounded division, identical on both engines.
    // Heaps'-law vocabulary growth (p148): same integer checkpoint
    // bucketing (ceil((id-lo+1)·n/width) via exact integer div), token
    // first-appearance min(doc_id) per TYPE, prefix sums over the
    // 10-row spine; the ratio is the same single correctly-rounded
    // division both engines perform on identical integers.
    "p148_vocab_growth" ->
      s"""WITH base AS (
         |  SELECT doc_id, string_split(
         |    ${norm("coalesce(text, '')")}, ' ') AS t FROM documents
         |), b AS (
         |  SELECT min(doc_id) AS lo, max(doc_id) - min(doc_id) + 1 AS wd
         |  FROM base
         |), pd AS (
         |  SELECT ((doc_id - lo + 1) * 10 + wd - 1) // wd AS bk,
         |         CAST(count(*) AS BIGINT) AS nd,
         |         CAST(sum(len(t)) AS BIGINT) AS nt
         |  FROM base CROSS JOIN b GROUP BY 1
         |), ft AS (
         |  SELECT tok, min(doc_id) AS fid FROM (
         |    SELECT doc_id, unnest(t) AS tok FROM base) GROUP BY 1
         |), tb AS (
         |  SELECT ((fid - lo + 1) * 10 + wd - 1) // wd AS bk,
         |         CAST(count(*) AS BIGINT) AS ny
         |  FROM ft CROSS JOIN b GROUP BY 1
         |), sp AS (
         |  SELECT CAST(i AS INT) AS checkpoint,
         |         lo + (wd * i) // 10 - 1 AS cut_id
         |  FROM range(1, 11) r(i) CROSS JOIN b
         |), j AS (
         |  SELECT checkpoint, cut_id, coalesce(nd, 0) AS nd,
         |         coalesce(nt, 0) AS nt, coalesce(ny, 0) AS ny
         |  FROM sp LEFT JOIN pd ON pd.bk = sp.checkpoint
         |          LEFT JOIN tb ON tb.bk = sp.checkpoint
         |)
         |SELECT checkpoint, cut_id,
         |  CAST(sum(nd) OVER win AS BIGINT) AS cum_docs,
         |  CAST(sum(nt) OVER win AS BIGINT) AS cum_tokens,
         |  CAST(sum(ny) OVER win AS BIGINT) AS cum_types,
         |  CAST(sum(ny) OVER win AS DOUBLE) / CAST(sum(nt) OVER win AS BIGINT)
         |    AS type_token_ratio
         |FROM j
         |WINDOW win AS (ORDER BY checkpoint ROWS UNBOUNDED PRECEDING)
         |ORDER BY checkpoint""".stripMargin,

    "p142_collocations" ->
      s"""WITH nrm AS (
         |  SELECT doc_id, ${norm("text")} AS norm FROM documents
         |), toks AS (
         |  SELECT doc_id, string_split(norm, ' ') AS t FROM nrm
         |), bg AS (
         |  SELECT unnest(t[:len(t)-1]) AS w1, unnest(t[2:]) AS w2
         |  FROM toks WHERE len(t) >= 2
         |), c12 AS (
         |  SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_pair
         |  FROM bg GROUP BY 1, 2
         |), u AS (
         |  SELECT w1 AS w, CAST(sum(n_pair) AS BIGINT) AS n_w1
         |  FROM c12 GROUP BY 1
         |), v AS (
         |  SELECT w2 AS w, CAST(sum(n_pair) AS BIGINT) AS n_w2
         |  FROM c12 GROUP BY 1
         |), tot AS (
         |  SELECT CAST(sum(n_pair) AS BIGINT) AS n_total FROM c12
         |)
         |SELECT w1, w2, n_pair, u.n_w1, v.n_w2,
         |  CAST(n_pair AS DOUBLE) * n_total / (u.n_w1 * v.n_w2) AS pmi_ratio
         |FROM c12 JOIN u ON u.w = c12.w1 JOIN v ON v.w = c12.w2, tot
         |WHERE n_pair >= 5
         |ORDER BY pmi_ratio DESC, w1, w2 LIMIT 30""".stripMargin,

    // per-document TF-IDF keywords (p143): tf from the (doc, token)
    // group, df by re-aggregating the TF table, rational idf surrogate
    // tf·N/df, per-doc rank breaking ties by term.
    "p143_tfidf_keywords" ->
      s"""WITH nrm AS (
         |  SELECT doc_id, ${norm("text")} AS norm FROM documents
         |), tok AS (
         |  SELECT doc_id, unnest(string_split(norm, ' ')) AS w FROM nrm
         |), tf AS (
         |  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
         |  FROM tok GROUP BY 1, 2
         |), dfr AS (
         |  SELECT w, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
         |), nd AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_docs FROM nrm
         |), scored AS (
         |  SELECT doc_id, w, tf, df,
         |    CAST(tf AS DOUBLE) * n_docs / df AS tfidf,
         |    row_number() OVER (PARTITION BY doc_id
         |      ORDER BY CAST(tf AS DOUBLE) * n_docs / df DESC, w) AS rnk
         |  FROM tf JOIN dfr USING (w), nd
         |)
         |SELECT doc_id, CAST(rnk AS INT) AS rank, w AS term, tf, df, tfidf
         |FROM scored WHERE rnk <= 3 ORDER BY doc_id, rank""".stripMargin,

    // FineWeb dedup-scope report (p141): scoped-vs-global keep-min-id
    // exact dedup over the planted cross-source duplicates, counted at
    // GROUP level exactly like the Spark side (skeep = gkeep <=> the
    // scope owns the global keeper).
    "p141_scoped_dedup" ->
      s"""WITH aug AS (
         |  SELECT doc_id, source,
         |    CASE WHEN doc_id % 16 = 5
         |         THEN 'planted duplicate corpus block ' || CAST(doc_id % 3 AS VARCHAR)
         |         ELSE text END AS text
         |  FROM documents
         |), nrm AS (
         |  SELECT doc_id AS id, source AS scope, ${norm("text")} AS norm FROM aug
         |), h AS (
         |  SELECT id, scope, ${hash("norm")} AS h1,
         |         list_reduce(list_prepend(CAST(11 AS BIGINT),
         |           list_transform(string_split(norm, ''),
         |             c -> CAST(ascii(c) AS BIGINT))),
         |           (a, b) -> (a*37 + b) % 998244353) AS h2
         |  FROM nrm
         |), sg AS (
         |  SELECT scope, h1, h2, MIN(id) AS skeep, count(*) AS n
         |  FROM h GROUP BY 1, 2, 3
         |), gg AS (
         |  SELECT h1, h2, MIN(skeep) AS gkeep FROM sg GROUP BY 1, 2
         |)
         |SELECT scope AS source, CAST(sum(n) AS BIGINT) AS n_docs,
         |       CAST(sum(n - 1) AS BIGINT) AS n_removed_scoped,
         |       CAST(sum(CASE WHEN skeep = gkeep THEN n - 1 ELSE n END) AS BIGINT)
         |         AS n_removed_global,
         |       CAST(sum(CASE WHEN skeep = gkeep THEN n - 1 ELSE n END)
         |         - sum(n - 1) AS BIGINT) AS n_cross_scope_extra
         |FROM sg JOIN gg USING (h1, h2) GROUP BY scope ORDER BY source""".stripMargin,

    // mixture sampling keyed by the TRAINED prediction (p116): the
    // lang-id chain's lfilled frame, then the p97 budget window keyed by
    // predicted_lang (lfilled.n_tokens = the p18 token count).
    "p116_mixture_trained" -> (langScoredCte +
      s"""
         |, w AS (
         |  SELECT doc_id AS id, predicted_lang, n_tokens,
         |    CAST(sum(n_tokens) OVER (PARTITION BY predicted_lang ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |      AS cum_lang_tokens
         |  FROM lfilled
         |)
         |SELECT id, predicted_lang, n_tokens, cum_lang_tokens FROM w
         |WHERE cum_lang_tokens - n_tokens < 4000
         |ORDER BY id""".stripMargin),

    // trained language-id twin of LangClassifier.langScorer
    "p112_langid_trained" -> (langScoredCte +
      s"""
         |SELECT doc_id, n_tokens, n_oov, top_votes, predicted_lang, label_lang
         |FROM lfilled ORDER BY doc_id""".stripMargin),

    // its held-out confusion matrix (LangClassifier.langConfusion)
    "p113_langid_confusion" -> (langScoredCte +
      s"""
         |SELECT label_lang, predicted_lang, CAST(count(*) AS BIGINT) AS n_docs
         |FROM lfilled WHERE doc_id % 10 = 0
         |GROUP BY label_lang, predicted_lang
         |ORDER BY label_lang, predicted_lang""".stripMargin),

    // temperature-mixture twin of TextCuration.mixtureWeights: per-lang
    // token mass, sqrt (correctly rounded on both engines), and the
    // key-ascending left-to-right denominator fold.
    "p120_mixture_weights" ->
      s"""WITH c AS (
         |  SELECT lang AS key, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(len(string_split(${norm("text")}, ' '))) AS BIGINT)
         |      AS n_tokens
         |  FROM documents GROUP BY lang
         |), sq AS (
         |  SELECT key, n_docs, n_tokens,
         |         sqrt(CAST(n_tokens AS DOUBLE)) AS sqrt_tokens
         |  FROM c
         |), dn AS (
         |  SELECT list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |    list(sqrt_tokens ORDER BY key)), (a, b) -> a + b) AS denom
         |  FROM sq
         |)
         |SELECT key, n_docs, n_tokens, sqrt_tokens,
         |  sqrt_tokens / denom AS weight_share
         |FROM sq CROSS JOIN dn ORDER BY key""".stripMargin,

    // UniMax epoch-capped allocation (p155): water-filling closed form —
    // keys ascending by cap mass, capped iff cap·(C−rn+1) ≤ B − cum_prev
    // (all integer), uncapped share is ONE double division.
    "p155_unimax_alloc" ->
      s"""WITH c AS (
         |  SELECT lang AS key, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(len(string_split(${norm("text")}, ' '))) AS BIGINT)
         |      AS n_tokens
         |  FROM documents GROUP BY lang
         |), b AS (
         |  SELECT CAST((sum(n_tokens) * 3) // 2 AS BIGINT) AS bud FROM c
         |), w AS (
         |  SELECT key, n_docs, n_tokens,
         |    CAST(n_tokens * 2 AS BIGINT) AS cap_tokens,
         |    CAST(row_number() OVER (ORDER BY n_tokens * 2, key) AS BIGINT)
         |      AS rn,
         |    CAST(sum(n_tokens * 2) OVER (ORDER BY n_tokens * 2, key
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
         |    CAST(count(*) OVER () AS BIGINT) AS cc
         |  FROM c
         |), f AS (
         |  SELECT w.*, bud,
         |    cap_tokens * (cc - rn + 1) <= bud - (cum - cap_tokens) AS capped
         |  FROM w CROSS JOIN b
         |), g AS (
         |  SELECT *,
         |    CAST(sum(CASE WHEN capped THEN 1 ELSE 0 END) OVER () AS BIGINT)
         |      AS k,
         |    CAST(sum(CASE WHEN capped THEN cap_tokens ELSE 0 END) OVER ()
         |      AS BIGINT) AS cmass
         |  FROM f
         |), a AS (
         |  SELECT key, n_docs, n_tokens, cap_tokens, capped,
         |    CASE WHEN capped THEN CAST(cap_tokens AS DOUBLE)
         |         ELSE CAST(bud - cmass AS DOUBLE) / (cc - k) END
         |      AS alloc_tokens
         |  FROM g
         |)
         |SELECT key, n_docs, n_tokens, cap_tokens, capped, alloc_tokens,
         |  CASE WHEN n_tokens > 0 THEN alloc_tokens / n_tokens
         |       ELSE 0.0 END AS n_epochs
         |FROM a ORDER BY key""".stripMargin,

    // KMV bottom-k quantile-sketch twin of Sketches.kmvQuantiles: same
    // hash-priority sample (pr ASC, id ASC — the negated-heap order),
    // lower discrete quantile of the sample at rank max(1, ceil(q·k)),
    // exact twin at the same rank rule over the full corpus.
    "p111_quantile_sketch" ->
      s"""WITH vals AS (
         |  SELECT doc_id AS id,
         |         CAST(len(string_split(${norm("text")}, ' ')) AS BIGINT) AS v
         |  FROM documents
         |), pri AS (
         |  SELECT id, v, (id * 2654435761) % 1000000007 AS pr FROM vals
         |), samp AS (
         |  SELECT id, v FROM pri ORDER BY pr, id LIMIT 256
         |), sv AS (
         |  SELECT v, row_number() OVER (ORDER BY v) AS rn,
         |         count(*) OVER () AS kk
         |  FROM samp
         |), ex AS (
         |  SELECT v, row_number() OVER (ORDER BY v) AS rn,
         |         count(*) OVER () AS n
         |  FROM vals
         |), probes AS (
         |  SELECT unnest([0.1e0, 0.25e0, 0.5e0, 0.75e0, 0.9e0, 0.99e0]) AS q
         |), est AS (
         |  SELECT q, kk AS sample_k, v AS est_value FROM probes JOIN sv
         |    ON rn = greatest(1, CAST(ceil(q * kk) AS BIGINT))
         |), exq AS (
         |  SELECT q, n AS n_rows, v AS exact_value FROM probes JOIN ex
         |    ON rn = greatest(1, CAST(ceil(q * n) AS BIGINT))
         |)
         |SELECT e.q, CAST(e.sample_k AS BIGINT) AS sample_k,
         |  CAST(x.n_rows AS BIGINT) AS n_rows,
         |  e.est_value, x.exact_value,
         |  e.est_value - x.exact_value AS abs_error
         |FROM est e JOIN exq x ON e.q = x.q ORDER BY e.q""".stripMargin,

    "p66_hll_cardinality" -> (shingleCtes +
      s""",
         |grams AS (SELECT unnest(sh) AS g FROM shn),
         |gv AS (SELECT g, (g * 48271) % 998244353 % 4194304 AS v FROM grams),
         |regs AS (
         |  SELECT g % 256 AS register,
         |         max(CASE WHEN v = 0 THEN 23
         |                  ELSE 23 - length(bin(v)) END) AS m_j
         |  FROM gv GROUP BY 1
         |),
         |folded AS (
         |  SELECT list(m_j ORDER BY register) AS ms, count(*) AS n_present
         |  FROM regs
         |),
         |ex AS (SELECT count(DISTINCT g) AS n_exact FROM grams),
         |den AS (
         |  SELECT n_present, n_exact,
         |    list_reduce(list_prepend(CAST(256 AS DOUBLE) - CAST(n_present AS DOUBLE),
         |      list_transform(ms, x -> CAST(1 AS DOUBLE) / (CAST(1 AS BIGINT) << x))),
         |      (a, b) -> a + b) AS denom
         |  FROM folded CROSS JOIN ex
         |)
         |SELECT CAST(256 AS BIGINT) AS m, n_present, n_exact,
         |  ${dblLit(graft.text.Sketches.HllAlphaM2)} / denom AS estimate,
         |  (${dblLit(graft.text.Sketches.HllAlphaM2)} / denom
         |     - CAST(n_exact AS DOUBLE)) / CAST(n_exact AS DOUBLE) AS rel_error
         |FROM den""".stripMargin),

    // per-language HLL (p163): p66's chain with every stage keyed by
    // lang — registers, fold, exact harness and the bias constant all
    // identical, grouped.
    "p163_hll_by_lang" -> (shingleCtes +
      s""",
         |grams AS (
         |  SELECT d.lang AS key, unnest(s.sh) AS g
         |  FROM shn s JOIN documents d ON d.doc_id = s.id
         |),
         |gv AS (SELECT key, g, (g * 48271) % 998244353 % 4194304 AS v FROM grams),
         |regs AS (
         |  SELECT key, g % 256 AS register,
         |         max(CASE WHEN v = 0 THEN 23
         |                  ELSE 23 - length(bin(v)) END) AS m_j
         |  FROM gv GROUP BY 1, 2
         |),
         |folded AS (
         |  SELECT key, list(m_j ORDER BY register) AS ms, count(*) AS n_present
         |  FROM regs GROUP BY key
         |),
         |ex AS (SELECT key, count(DISTINCT g) AS n_exact FROM grams GROUP BY key),
         |den AS (
         |  SELECT f.key, n_present, n_exact,
         |    list_reduce(list_prepend(CAST(256 AS DOUBLE) - CAST(n_present AS DOUBLE),
         |      list_transform(ms, x -> CAST(1 AS DOUBLE) / (CAST(1 AS BIGINT) << x))),
         |      (a, b) -> a + b) AS denom
         |  FROM folded f JOIN ex ON ex.key = f.key
         |)
         |SELECT key, CAST(256 AS BIGINT) AS m, n_present, n_exact,
         |  ${dblLit(graft.text.Sketches.HllAlphaM2)} / denom AS estimate,
         |  (${dblLit(graft.text.Sketches.HllAlphaM2)} / denom
         |     - CAST(n_exact AS DOUBLE)) / CAST(n_exact AS DOUBLE) AS rel_error
         |FROM den ORDER BY key""".stripMargin),

    // Count-Min token-frequency estimates for the exact top-10 tokens —
    // integer-only, so overestimates (hash collisions) compare exactly;
    // the four hash rows are printed from the same CmsParams constants.
    "p67_cms_frequency" -> {
      val rows = graft.text.Sketches.CmsParams.zipWithIndex
      val cellUnion = rows.map { case ((seed, mult, mod), j) =>
        s"SELECT $j AS rw, ${hashWith("token", seed, mult, mod)} % 1024 AS cell FROM toks"
      }.mkString("\n    UNION ALL ")
      val probeUnion = rows.map { case ((seed, mult, mod), j) =>
        s"SELECT token, tf_exact, $j AS rw, ${hashWith("token", seed, mult, mod)} % 1024 AS cell FROM top"
      }.mkString("\n    UNION ALL ")
      s"""WITH n AS (SELECT ${norm("text")} AS nrm FROM documents),
         |toks AS (SELECT unnest(string_split(nrm, ' ')) AS token FROM n),
         |cells AS (
         |  SELECT rw, cell, count(*) AS c FROM (
         |    $cellUnion
         |  ) GROUP BY rw, cell
         |),
         |top AS (
         |  SELECT token, count(*) AS tf_exact FROM toks
         |  GROUP BY token ORDER BY tf_exact DESC, token LIMIT 10
         |),
         |probes AS (
         |    $probeUnion
         |),
         |est AS (
         |  SELECT token, tf_exact, min(c) AS tf_cms
         |  FROM probes JOIN cells USING (rw, cell) GROUP BY token, tf_exact
         |)
         |SELECT token, tf_exact, tf_cms, tf_cms - tf_exact AS overestimate
         |FROM est ORDER BY tf_exact DESC, token""".stripMargin
    },

    // dedup-group profile: p37's recursive component closure joined with
    // per-document token counts, rolled up per group.
    "p65_group_profile" -> (simhashCandCtes.replaceFirst("WITH ", "WITH RECURSIVE ") +
      s""",
         |pairs AS (SELECT da, db FROM cand WHERE bit_count(xor(sa, sb)) <= 1),
         |nodes AS (SELECT da AS id FROM pairs UNION SELECT db AS id FROM pairs),
         |edges AS (SELECT da AS a, db AS b FROM pairs
         |          UNION ALL SELECT db AS a, da AS b FROM pairs),
         |reach AS (
         |  SELECT id, id AS lab FROM nodes
         |  UNION
         |  SELECT e.b AS id, r.lab AS lab FROM reach r JOIN edges e ON e.a = r.id
         |),
         |grp AS (SELECT id, MIN(lab) AS group_id FROM reach GROUP BY id),
         |ntok AS (SELECT id, CAST(len(t) AS BIGINT) AS n_tokens FROM toks)
         |SELECT group_id, count(*) AS n_members, max(g.id) AS max_doc_id,
         |       CAST(sum(n_tokens) AS BIGINT) AS total_tokens
         |FROM grp g JOIN ntok USING (id)
         |GROUP BY group_id ORDER BY group_id""".stripMargin),

    // content-hash split twin: same hash, same Knuth re-scramble, same
    // per-mille thresholds
    // cross-source contamination matrix (p150): the p17 cand pairs
    // labeled with endpoint sources, orientation normalized by
    // least/greatest, counted per unordered source pair; the share is
    // one exact-integer division per cell.
    "p150_contamination_matrix" -> (simhashCandCtes +
      s""",
         |pairs AS (SELECT da, db FROM cand WHERE bit_count(xor(sa, sb)) <= 1),
         |lab AS (SELECT least(x.source, y.source) AS source_a,
         |               greatest(x.source, y.source) AS source_b
         |        FROM pairs p JOIN documents x ON x.doc_id = p.da
         |                     JOIN documents y ON y.doc_id = p.db),
         |m AS (SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS n_pairs
         |      FROM lab GROUP BY 1, 2),
         |t AS (SELECT CAST(sum(n_pairs) AS BIGINT) AS tt FROM m)
         |SELECT source_a, source_b, n_pairs,
         |  CAST(n_pairs AS DOUBLE) / tt AS pair_share
         |FROM m CROSS JOIN t ORDER BY source_a, source_b""".stripMargin),

    // group-aware leakage-safe split (p149): p37's recursive component
    // closure decides each doc's group; the split bucket is the group
    // REPRESENTATIVE's p39 scramble, joined back by group label, so
    // members move together and singletons reproduce p39 bit-for-bit.
    "p149_group_split" -> (simhashCandCtes.replaceFirst("WITH ", "WITH RECURSIVE ") +
      s""",
         |pairs AS (SELECT da, db FROM cand WHERE bit_count(xor(sa, sb)) <= 1),
         |gnodes AS (SELECT da AS id FROM pairs UNION SELECT db AS id FROM pairs),
         |edges AS (SELECT da AS a, db AS b FROM pairs
         |          UNION ALL SELECT db AS a, da AS b FROM pairs),
         |reach AS (
         |  SELECT id, id AS lab FROM gnodes
         |  UNION
         |  SELECT e.b AS id, r.lab AS lab FROM reach r JOIN edges e ON e.a = r.id
         |),
         |comp AS (SELECT id, MIN(lab) AS g FROM reach GROUP BY id),
         |n AS (SELECT doc_id AS id, ${norm("text")} AS nrm FROM documents),
         |bkt AS (SELECT id, ${hash("nrm")} * 2654435761 % $P % 1000 AS bucket FROM n),
         |wg AS (SELECT b.id, coalesce(c.g, b.id) AS group_id
         |       FROM bkt b LEFT JOIN comp c ON c.id = b.id)
         |SELECT w.id AS doc_id, w.group_id, r.bucket,
         |  CASE WHEN r.bucket < 800 THEN 'train'
         |       WHEN r.bucket < 900 THEN 'val' ELSE 'test' END AS split
         |FROM wg w JOIN bkt r ON r.id = w.group_id
         |ORDER BY doc_id""".stripMargin),

    "p39_hash_split" ->
      s"""WITH n AS (SELECT doc_id AS id, ${norm("text")} AS nrm FROM documents),
         |b AS (SELECT id, ${hash("nrm")} * 2654435761 % $P % 1000 AS bucket FROM n)
         |SELECT id, bucket,
         |  CASE WHEN bucket < 800 THEN 'train'
         |       WHEN bucket < 900 THEN 'val' ELSE 'test' END AS split
         |FROM b ORDER BY id""".stripMargin,

    "p40_pii_scrub" -> {
      val counts = graft.text.TextCuration.PiiPatterns.map { case (name, pat, _) =>
        s"CAST(len(regexp_extract_all(nrm, '$pat')) AS BIGINT) AS n_$name"
      }.mkString(",\n  ")
      val scrubbed = graft.text.TextCuration.PiiPatterns.foldLeft("nrm") {
        case (acc, (_, pat, repl)) => s"regexp_replace($acc, '$pat', '$repl', 'g')"
      }
      s"""WITH aug AS (SELECT doc_id AS id, $piiAug AS text FROM documents),
         |n AS (SELECT id, ${norm("text")} AS nrm FROM aug)
         |SELECT id, $scrubbed AS clean_text,
         |  $counts
         |FROM n ORDER BY id""".stripMargin
    },

    "p41_repetition" ->
      s"""WITH n AS (SELECT doc_id AS id, ${norm("text")} AS nrm FROM documents),
         |t AS (SELECT id, nrm, string_split(nrm, ' ') AS t FROM n),
         |c AS (SELECT id,
         |  CAST(len(t) AS BIGINT) AS n_tokens,
         |  CAST(list_max(list_transform(list_distinct(t),
         |    d -> len(list_filter(t, x -> x = d)))) AS BIGINT) AS top_cnt,
         |  CAST(greatest(0, len(t) - 1) AS BIGINT) AS n_bigrams,
         |  CAST(len(list_distinct(CASE WHEN len(t) >= 2
         |    THEN [t[i] || ' ' || t[i+1] for i in range(1, len(t))]
         |    ELSE CAST([] AS VARCHAR[]) END)) AS BIGINT) AS n_uniq_bigrams,
         |  CAST(length(nrm) - length(regexp_replace(nrm, '[^a-z0-9 ]', '', 'g'))
         |    AS BIGINT) AS n_sym,
         |  CAST(length(nrm) AS BIGINT) AS n_chars
         |FROM t)
         |SELECT id,
         |  CAST(top_cnt AS DOUBLE)/n_tokens AS top_token_ratio,
         |  CASE WHEN n_bigrams > 0
         |    THEN CAST(n_bigrams - n_uniq_bigrams AS DOUBLE)/n_bigrams
         |    ELSE CAST(0.0 AS DOUBLE) END AS dup_bigram_frac,
         |  CAST(n_sym AS DOUBLE)/n_chars AS symbol_ratio,
         |  (CAST(top_cnt AS DOUBLE)/n_tokens <= CAST(0.2 AS DOUBLE)
         |   AND (CASE WHEN n_bigrams > 0
         |        THEN CAST(n_bigrams - n_uniq_bigrams AS DOUBLE)/n_bigrams
         |        ELSE CAST(0.0 AS DOUBLE) END) <= CAST(0.3 AS DOUBLE)
         |   AND CAST(n_sym AS DOUBLE)/n_chars <= CAST(0.2 AS DOUBLE)) AS keep
         |FROM c ORDER BY id""".stripMargin,

    // 5-gram decontamination twin: docs < 25 are the held-out benchmark
    "p42_contamination" -> (gramCtes(5) +
      s""",
         |corpus AS (SELECT id, unnest(g) AS g FROM gr WHERE id >= 25),
         |bench AS (SELECT DISTINCT unnest(g) AS g FROM gr WHERE id < 25),
         |j AS (
         |  SELECT c.id, CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END AS hit
         |  FROM corpus c LEFT JOIN bench b ON c.g = b.g
         |)
         |SELECT id, count(*) AS n_grams, CAST(sum(hit) AS BIGINT) AS n_hits,
         |  CAST(sum(hit) AS DOUBLE)/count(*) AS contamination_ratio,
         |  sum(hit) >= 1 AS is_contaminated
         |FROM j GROUP BY id ORDER BY id""".stripMargin),

    // eval-set dirtiness (p153): p42 flipped — per benchmark example,
    // its distinct grams found anywhere in the corpus
    "p153_eval_dirtiness" -> (gramCtes(5) +
      s""",
         |bench AS (SELECT id, unnest(g) AS g FROM gr WHERE id < 25),
         |hits AS (
         |  SELECT DISTINCT c.g
         |  FROM (SELECT unnest(g) AS g FROM gr WHERE id >= 25) c
         |  JOIN (SELECT DISTINCT g FROM bench) b ON c.g = b.g
         |),
         |j AS (
         |  SELECT bench.id, CASE WHEN hits.g IS NOT NULL THEN 1 ELSE 0 END AS hit
         |  FROM bench LEFT JOIN hits ON bench.g = hits.g
         |)
         |SELECT id, count(*) AS n_grams, CAST(sum(hit) AS BIGINT) AS n_hits,
         |  CAST(sum(hit) AS DOUBLE)/count(*) AS dirtiness_ratio,
         |  sum(hit) >= 1 AS is_dirty
         |FROM j GROUP BY id ORDER BY id""".stripMargin),

    "p43_hash_sample" ->
      s"""WITH n AS (SELECT doc_id AS id, ${norm("text")} AS nrm FROM documents),
         |b AS (SELECT id, ${hash("nrm")} * 48271 % $P % 100 AS sample_key FROM n)
         |SELECT id, sample_key FROM b WHERE sample_key < 10 ORDER BY id""".stripMargin,

    // Pearson correlation from exact integer moments — the variance
    // factors convert to double BEFORE multiplying (their integer product
    // would overflow BIGINT), mirroring the Spark expression order
    "p84_token_char_corr" ->
      s"""WITH t AS (
         |  SELECT CAST(len(string_split(${norm("text")}, ' ')) AS BIGINT) AS x,
         |         CAST(length(${norm("text")}) AS BIGINT) AS y
         |  FROM documents
         |), m AS (
         |  SELECT count(*) AS n,
         |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |    CAST(sum(x*x) AS BIGINT) AS sxx, CAST(sum(y*y) AS BIGINT) AS syy,
         |    CAST(sum(x*y) AS BIGINT) AS sxy
         |  FROM t
         |)
         |SELECT n AS n_docs, sx AS sum_tokens, sy AS sum_chars,
         |  CAST(n*sxy - sx*sy AS DOUBLE)
         |    / (sqrt(CAST(n*sxx - sx*sx AS DOUBLE))
         |       * sqrt(CAST(n*syy - sy*sy AS DOUBLE))) AS token_char_corr
         |FROM m""".stripMargin,

    // context-window chunking: stride-24 windows of 32 tokens; DuckDB's
    // inclusive 1-based list slice clamps exactly like Spark's slice()
    "p81_token_chunks" ->
      s"""WITH n AS (SELECT doc_id AS id, ${norm("text")} AS nrm FROM documents),
         |t AS (SELECT id, string_split(nrm, ' ') AS t,
         |             len(string_split(nrm, ' ')) AS n FROM n),
         |ch AS (
         |  SELECT id, t, n,
         |    unnest(range(0, CAST(ceil(CAST(n AS DOUBLE)/24) AS INT))) AS k
         |  FROM t
         |)
         |SELECT id, CAST(k AS BIGINT) AS chunk_idx,
         |  CAST(k*24 AS BIGINT) AS start_tok,
         |  CAST(least(32, n - k*24) AS BIGINT) AS n_chunk_tokens,
         |  ${hash("array_to_string(t[CAST(k*24+1 AS INT) : CAST(k*24+32 AS INT)], ' ')")} AS chunk_hash
         |FROM ch ORDER BY id, chunk_idx""".stripMargin,

    // sequence packing: global prefix sum over id order → token-budget
    // bins; the Spark side computes the same sum distributed (range
    // partitions + offsets), so the values must agree exactly
    // token-balanced shard assignment twin: the p82 prefix-sum chain,
    // shard = (cum_before * 16) // total (integer-exact, contiguous cuts)
    "p136_shard_assign" ->
      s"""WITH n AS (
         |  SELECT doc_id AS id,
         |         CAST(len(string_split(${norm("text")}, ' ')) AS BIGINT) AS n_tokens
         |  FROM documents
         |), c AS (
         |  SELECT id, n_tokens,
         |    CAST(sum(n_tokens) OVER (ORDER BY id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |      AS cum_tokens
         |  FROM n
         |), t AS (
         |  SELECT greatest(CAST(sum(n_tokens) AS BIGINT), 1) AS total FROM n
         |)
         |SELECT id, n_tokens, cum_tokens,
         |       ((cum_tokens - n_tokens) * 16) // total AS shard
         |FROM c CROSS JOIN t ORDER BY id""".stripMargin,

    "p82_sequence_packing" ->
      s"""WITH n AS (
         |  SELECT doc_id AS id,
         |         CAST(len(string_split(${norm("text")}, ' ')) AS BIGINT) AS n_tokens
         |  FROM documents
         |), c AS (
         |  SELECT id, n_tokens,
         |    CAST(sum(n_tokens) OVER (ORDER BY id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |      AS cum_tokens
         |  FROM n
         |)
         |SELECT id, n_tokens, cum_tokens,
         |       (cum_tokens - n_tokens) // 512 AS bin
         |FROM c ORDER BY id""".stripMargin,

    // systematic PPS sample: k=40 integer thresholds over the token-mass
    // prefix sum; keep docs whose cumulative interval contains one
    // (n_hits = multiplicity). Keep k and the step rule in lockstep with
    // DocAnalytics ("p86_pps_sample") / TextCuration.ppsSample.
    "p86_pps_sample" ->
      s"""WITH n AS (
         |  SELECT doc_id AS id,
         |         CAST(len(string_split(${norm("text")}, ' ')) AS BIGINT) AS n_tokens
         |  FROM documents
         |), c AS (
         |  SELECT id, n_tokens,
         |    CAST(sum(n_tokens) OVER (ORDER BY id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |      AS cum_tokens
         |  FROM n
         |), s AS (
         |  SELECT GREATEST(1, CAST(sum(n_tokens) AS BIGINT) // 40) AS step FROM n
         |)
         |SELECT id, n_tokens, cum_tokens,
         |       (cum_tokens // step) - ((cum_tokens - n_tokens) // step) AS n_hits
         |FROM c, s
         |WHERE (cum_tokens // step) - ((cum_tokens - n_tokens) // step) > 0
         |ORDER BY id""".stripMargin,

    // composed curation report: lang-id (p19), content-hash split (p39),
    // repetition keep flag (p41), and token counts (p18) recomputed per
    // doc, rolled up by (lang, split) with integer-exact aggregates
    "p53_curation_summary" ->
      s"""WITH n AS (SELECT doc_id AS id, ${norm("text")} AS nrm FROM documents),
         |t AS (SELECT id, nrm, string_split(nrm, ' ') AS t FROM n),
         |feat AS (
         |  SELECT id,
         |    ${hash("nrm")} * 2654435761 % $P % 1000 AS bucket,
         |    CAST(len(list_filter(t, x -> x IN ('the','is','and','of'))) AS BIGINT) AS en,
         |    CAST(len(list_filter(t, x -> x IN ('el','la','que','de'))) AS BIGINT) AS es,
         |    CAST(len(list_filter(t, x -> x IN ('le','les','une','est'))) AS BIGINT) AS fr,
         |    CAST(len(list_filter(t, x -> x IN ('der','die','und','ist'))) AS BIGINT) AS de,
         |    CAST(len(t) AS BIGINT) AS n_tokens,
         |    CAST(list_max(list_transform(list_distinct(t),
         |      d -> len(list_filter(t, x -> x = d)))) AS BIGINT) AS top_cnt,
         |    CAST(greatest(0, len(t) - 1) AS BIGINT) AS n_bigrams,
         |    CAST(len(list_distinct(CASE WHEN len(t) >= 2
         |      THEN [t[i] || ' ' || t[i+1] for i in range(1, len(t))]
         |      ELSE CAST([] AS VARCHAR[]) END)) AS BIGINT) AS n_uniq_bigrams,
         |    CAST(length(nrm) - length(regexp_replace(nrm, '[^a-z0-9 ]', '', 'g'))
         |      AS BIGINT) AS n_sym,
         |    CAST(length(nrm) AS BIGINT) AS n_chars
         |  FROM t
         |), lab AS (
         |  SELECT id, n_tokens,
         |    CASE WHEN en + es + fr + de = 0 THEN 'und'
         |         WHEN en >= es AND en >= fr AND en >= de THEN 'en'
         |         WHEN es >= fr AND es >= de THEN 'es'
         |         WHEN fr >= de THEN 'fr' ELSE 'de' END AS predicted_lang,
         |    CASE WHEN bucket < 800 THEN 'train'
         |         WHEN bucket < 900 THEN 'val' ELSE 'test' END AS split,
         |    (CAST(top_cnt AS DOUBLE)/n_tokens <= CAST(0.2 AS DOUBLE)
         |     AND (CASE WHEN n_bigrams > 0
         |          THEN CAST(n_bigrams - n_uniq_bigrams AS DOUBLE)/n_bigrams
         |          ELSE CAST(0.0 AS DOUBLE) END) <= CAST(0.3 AS DOUBLE)
         |     AND CAST(n_sym AS DOUBLE)/n_chars <= CAST(0.2 AS DOUBLE)) AS keep
         |  FROM feat
         |)
         |SELECT predicted_lang, split, count(*) AS n_docs,
         |       CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
         |       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
         |FROM lab GROUP BY 1, 2 ORDER BY predicted_lang, split""".stripMargin,

    // IVF-flat twin of Similarity.knnIvf: centroids are the 8 lowest-id
    // vectors (the deterministic quantizer the Spark side collects), cell
    // assignment is argmax cosine with ties toward the smallest centroid id
    // (the struct-ordering trick on the Spark side ≡ ORDER BY cs DESC, cid
    // ASC here), each query probes its 2 nearest cells, and ranking matches
    // the bounded top-k aggregate's (sim DESC, neighbor_id ASC) total order.
    "p38_knn_ivf" -> ivfSearchSql(
      "cents AS (SELECT vec_id AS cid, e AS ce FROM v ORDER BY vec_id LIMIT 8)"),

    // trained-IVF twin of Similarity.knnIvfWith over the TRAINED quantizer:
    // the p50 query persists the centroids its plan inlined as literals;
    // this oracle replays the identical search against those exact floats —
    // same argmax assignment, same 2-cell probe list, same top-k order.
    // (The trainer itself is pinned by SimilaritySpec's recall test; a SQL
    // re-run of Lloyd would verify the trainer against itself.)
    "p50_knn_ivf_trained" -> ivfSearchSql(
      "cents AS (SELECT cent_id AS cid, ce FROM read_parquet(" +
        s"'${graft.ops.DocAnalytics.P50CentroidsPath}/*.parquet'))"),

    // two-level coarse assignment: top-2 superclusters (cos DESC, sid
    // ASC) from the persisted supercluster table, then argmax over only
    // those superclusters' cells — replayed beside the flat argmax over
    // the full cell table so the agreement column is itself verified.
    "p125_two_level_assign" ->
      s"""WITH sup AS (SELECT sid, se FROM read_parquet(
         |  '${graft.ops.DocAnalytics.P125SupersPath}/*.parquet')),
         |cent AS (SELECT cid, sid, ce FROM read_parquet(
         |  '${graft.ops.DocAnalytics.P125CellsPath}/*.parquet')),
         |e AS (SELECT vec_id, embedding AS qe FROM embeddings),
         |ss AS (SELECT e.vec_id, s.sid, ${cos("qe", "se")} AS cs
         |       FROM e CROSS JOIN sup s),
         |sel AS (SELECT vec_id, sid FROM (
         |  SELECT vec_id, sid, row_number() OVER (PARTITION BY vec_id
         |    ORDER BY cs DESC, sid) AS rn FROM ss) WHERE rn <= 2),
         |cs2 AS (SELECT e.vec_id, c.cid, ${cos("e.qe", "c.ce")} AS cs
         |        FROM sel JOIN e ON e.vec_id = sel.vec_id
         |        JOIN cent c ON c.sid = sel.sid),
         |two AS (SELECT vec_id, cid AS cell_two_level FROM (
         |  SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
         |    ORDER BY cs DESC, cid) AS rn FROM cs2) WHERE rn = 1),
         |fs AS (SELECT e.vec_id, c.cid, ${cos("qe", "ce")} AS cs
         |       FROM e CROSS JOIN cent c),
         |flat AS (SELECT vec_id, cid AS cell_flat FROM (
         |  SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
         |    ORDER BY cs DESC, cid) AS rn FROM fs) WHERE rn = 1)
         |SELECT t.vec_id, t.cell_two_level, f.cell_flat,
         |  CAST(t.cell_two_level = f.cell_flat AS BIGINT) AS agree
         |FROM two t JOIN flat f USING (vec_id)
         |ORDER BY t.vec_id""".stripMargin,

    // recall@k of the approximate paths vs exact brute force — all three
    // top-k sets recomputed here with the same expressions as their own
    // oracles (p21/p22/p38), then set-intersected per query. Integer hit
    // counts; the single division matches Spark's double math exactly.
    "p58_ann_recall" ->
      s"""WITH v AS (SELECT vec_id, embedding AS e FROM embeddings),
         |q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < 20),
         |bsims AS (
         |  SELECT query_id, v.vec_id AS neighbor_id, ${cos("qe", "e")} AS sim
         |  FROM q JOIN v ON v.vec_id <> query_id
         |),
         |btop AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |                                 ORDER BY sim DESC, neighbor_id) AS rn
         |    FROM bsims
         |  ) WHERE rn <= 5
         |),
         |bk AS (SELECT vec_id, e, ${bucket("e", 0, 8)} AS bucket FROM v),
         |lq AS (SELECT vec_id AS query_id, e AS qe, bucket FROM bk WHERE vec_id < 20),
         |lsims AS (
         |  SELECT query_id, b.vec_id AS neighbor_id, ${cos("qe", "b.e")} AS sim
         |  FROM lq JOIN bk b USING (bucket) WHERE b.vec_id <> query_id
         |),
         |ltop AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |                                 ORDER BY sim DESC, neighbor_id) AS rn
         |    FROM lsims
         |  ) WHERE rn <= 5
         |),
         |cents AS (SELECT vec_id AS cid, e AS ce FROM v ORDER BY vec_id LIMIT 8),
         |scored AS (
         |  SELECT v.vec_id, v.e, c.cid, ${cos("v.e", "c.ce")} AS cs
         |  FROM v CROSS JOIN cents c
         |),
         |assigned AS (
         |  SELECT vec_id AS neighbor_id, e AS ne, cid AS cell FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |                                 ORDER BY cs DESC, cid) AS rn
         |    FROM scored
         |  ) WHERE rn = 1
         |),
         |probes AS (
         |  SELECT vec_id AS query_id, e AS qe, cid AS cell FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |                                 ORDER BY cs DESC, cid) AS rn
         |    FROM scored WHERE vec_id < 20
         |  ) WHERE rn <= 2
         |),
         |isims AS (
         |  SELECT query_id, neighbor_id, ${cos("qe", "ne")} AS sim
         |  FROM probes JOIN assigned USING (cell) WHERE neighbor_id <> query_id
         |),
         |itop AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |                                 ORDER BY sim DESC, neighbor_id) AS rn
         |    FROM isims
         |  ) WHERE rn <= 5
         |),
         |poss AS (SELECT count(*) AS n_possible FROM btop),
         |lh AS (SELECT count(*) AS n_hits
         |       FROM btop JOIN ltop USING (query_id, neighbor_id)),
         |ih AS (SELECT count(*) AS n_hits
         |       FROM btop JOIN itop USING (query_id, neighbor_id))
         |SELECT * FROM (
         |  SELECT 'ivf' AS method, ih.n_hits AS n_hits,
         |         poss.n_possible AS n_possible,
         |         CAST(ih.n_hits AS DOUBLE)/poss.n_possible AS recall_at_k
         |  FROM ih, poss
         |  UNION ALL
         |  SELECT 'lsh', lh.n_hits, poss.n_possible,
         |         CAST(lh.n_hits AS DOUBLE)/poss.n_possible
         |  FROM lh, poss
         |) ORDER BY method""".stripMargin,

    // perceptual near-dup twin of Media.perceptualNearDup over the
    // planted-variant corpus: rasters regenerated from the closed form
    // (base + every-64th-byte-offset-1 perturbed variants), aHash bit =
    // pixel·64 > Σ pixels (integer cross-multiplication), dHash bit =
    // gradient sign, EIGHT 8-bit aHash blocking bands (exact recall to
    // Hamming 7 by pigeonhole), hot-bucket cap mirrored, XOR+bit_count
    // Hamming verify at threshold 6. p123/p124 run the same pipeline
    // over the degenerate corpus (planted constant rasters sharing one
    // all-zero aHash bucket) — p123 the capped pair list, p124 the
    // capped-vs-uncapped count delta proving the cap bites.
    "p115_perceptual_neardup" ->
      (perceptualCtes(perceptualGenCtes(flat = false), cap = 1000) +
        perceptualPairSelect),

    "p123_perceptual_capped" ->
      (perceptualCtes(perceptualGenCtes(flat = true), cap = 100) +
        perceptualPairSelect),

    "p124_perceptual_cap_bite" ->
      (perceptualCtes(perceptualGenCtes(flat = true), cap = 100) +
        s""",
         |cand_all AS (
         |  SELECT DISTINCT x.asset_id AS asset_a, y.asset_id AS asset_b
         |  FROM banded x JOIN banded y
         |    ON x.bi = y.bi AND x.bv = y.bv AND x.asset_id < y.asset_id
         |),
         |vcap AS (
         |  SELECT count(*) AS n FROM cand c
         |  JOIN hb hx ON hx.asset_id = c.asset_a
         |  JOIN hb hy ON hy.asset_id = c.asset_b
         |  WHERE ${hamSql("a")} <= 6
         |),
         |vall AS (
         |  SELECT count(*) AS n FROM cand_all c
         |  JOIN hb hx ON hx.asset_id = c.asset_a
         |  JOIN hb hy ON hy.asset_id = c.asset_b
         |  WHERE ${hamSql("a")} <= 6
         |)
         |SELECT * FROM (
         |  SELECT 'capped' AS config, n AS n_pairs FROM vcap
         |  UNION ALL
         |  SELECT 'uncapped', n FROM vall
         |) ORDER BY config""".stripMargin),

    // DCT pHash table (p167) over the dither corpus: the full
    // fixed-point transform replayed from the closed-form rasters
    "p167_phash_table" -> (phashCtes +
      "\nSELECT asset_id, p0, p1, p2, p3 FROM ph ORDER BY asset_id"),

    // pHash recovery report (p168): planted dither pairs with aHash
    // Hamming > 6 (the aHash miner provably drops them) and pHash
    // Hamming <= 6 (within the banded miner's pigeonhole bound)
    "p168_phash_recovery" -> (phashCtes + {
      def aband(j: Int): String =
        "CAST(" + (0 until 16).map { k =>
          s"(CASE WHEN raster[${16 * j + k + 1}] * 64 > s THEN ${1 << k} ELSE 0 END)"
        }.mkString(" + ") + s" AS INT) AS a$j"
      def hamW(w: String, x: String, y: String): String =
        "CAST(" + (0 until 4).map(j =>
          s"bit_count(xor($x.$w$j, $y.$w$j))").mkString(" + ") + " AS BIGINT)"
      s""",
         |g65 AS (
         |  SELECT asset_id, raster[1:65] AS raster FROM gen256
         |  WHERE asset_id < ${graft.multimodal.Media.VariantOffset}
         |     OR asset_id >= ${graft.multimodal.Media.DitherOffset}
         |),
         |hs65 AS (
         |  SELECT asset_id, raster,
         |    list_reduce(list_prepend(CAST(0 AS BIGINT), raster[1:64]),
         |      (a, b) -> a + b) AS s
         |  FROM g65
         |),
         |ha AS (
         |  SELECT asset_id,
         |    ${(0 until 4).map(aband).mkString(",\n    ")}
         |  FROM hs65
         |),
         |rep AS (
         |  SELECT ax.asset_id,
         |    ${hamW("a", "ax", "ay")} AS hamming_a,
         |    ${hamW("p", "px", "py")} AS hamming_p
         |  FROM ha ax
         |  JOIN ha ay ON ay.asset_id = ax.asset_id + ${graft.multimodal.Media.DitherOffset}
         |  JOIN ph px ON px.asset_id = ax.asset_id
         |  JOIN ph py ON py.asset_id = ay.asset_id
         |)
         |SELECT asset_id, hamming_a, hamming_p FROM rep
         |WHERE hamming_p <= 6 AND hamming_a > 6 ORDER BY asset_id""".stripMargin
    }),

    "p30_media_stats" ->
      s"""WITH gen AS (
         |  SELECT vec_id AS asset_id,
         |    CASE CAST(vec_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
         |         ELSE 'video' END AS kind,
         |    256 + (vec_id % 7) * 128 AS n,
         |    [(vec_id*31 + 7*i*i) % 256 for i in range(0, CAST(256 + (vec_id % 7) * 128 AS INT))]
         |      AS bytes
         |  FROM embeddings
         |)
         |SELECT asset_id, kind, CAST(n AS BIGINT) AS n_bytes,
         |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), bytes), (a, b) -> a + b)
         |       AS DOUBLE) / n AS mean_byte,
         |  CAST(list_min(bytes) AS BIGINT) AS min_byte,
         |  CAST(list_max(bytes) AS BIGINT) AS max_byte
         |FROM gen ORDER BY asset_id""".stripMargin,

    // frame-window twin: regenerate each video's byte array from the
    // formula, split into 64-byte windows, keep every 4th — count and sum
    // per window pin the sampler's boundaries exactly.
    "p80_frame_windows" ->
      s"""WITH gen AS (
         |  SELECT vec_id AS asset_id,
         |    CAST(256 + (vec_id % 7) * 128 AS INT) AS n
         |  FROM embeddings WHERE vec_id % 3 = 2
         |), w AS (
         |  SELECT asset_id, n, unnest(range(0, CAST(ceil(CAST(n AS DOUBLE)/64) AS INT))) AS widx
         |  FROM gen
         |)
         |SELECT asset_id, CAST(widx AS BIGINT) AS frame_idx,
         |  CAST(least(n, (widx+1)*64) - widx*64 AS BIGINT) AS n_bytes,
         |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
         |    [(asset_id*31 + 7*i*i) % 256
         |     for i in range(CAST(widx*64 AS INT), CAST(least(n, (widx+1)*64) AS INT))]),
         |    (a, b) -> a + b) AS BIGINT) AS byte_sum
         |FROM w WHERE widx % 4 = 0
         |ORDER BY asset_id, frame_idx""".stripMargin,

    "p31_media_dedup" ->
      s"""WITH gen AS (
         |  SELECT vec_id AS asset_id, 256 + (vec_id % 7) * 128 AS n,
         |    [(vec_id*31 + 7*i*i) % 256 for i in range(0, CAST(256 + (vec_id % 7) * 128 AS INT))]
         |      AS bytes
         |  FROM embeddings
         |), hist AS (
         |  SELECT asset_id,
         |    [CAST(len(list_filter(bytes, b -> b // 16 = h)) AS DOUBLE) / len(bytes)
         |     for h in range(0, 16)] AS features
         |  FROM gen
         |)
         |SELECT MIN(asset_id) AS keep_id, COUNT(*) AS n_copies
         |FROM hist GROUP BY features ORDER BY keep_id""".stripMargin,

    "p23_embedding_neardup" -> (embPairCtes +
      s"""
         |SELECT vec_a, vec_b, sim FROM sims
         |WHERE sim >= CAST(0.4 AS DOUBLE) ORDER BY vec_a, vec_b""".stripMargin),

    // connected components over the EMBEDDING near-dup pair graph — the
    // p23 pair chain closed by the same recursive-reachability CTE as p37,
    // component label = min member id
    "p59_embedding_dedup_groups" ->
      (embPairCtes.replaceFirst("WITH ", "WITH RECURSIVE ") +
      s""",
         |pairs AS (SELECT vec_a AS va, vec_b AS vb FROM sims
         |          WHERE sim >= CAST(0.4 AS DOUBLE)),
         |nodes AS (SELECT va AS id FROM pairs UNION SELECT vb AS id FROM pairs),
         |edges AS (SELECT va AS a, vb AS b FROM pairs
         |          UNION ALL SELECT vb AS a, va AS b FROM pairs),
         |reach AS (
         |  SELECT id, id AS lab FROM nodes
         |  UNION
         |  SELECT e.b AS id, r.lab AS lab FROM reach r JOIN edges e ON e.a = r.id
         |)
         |SELECT id AS vec_id, MIN(lab) AS group_id
         |FROM reach GROUP BY id ORDER BY vec_id""".stripMargin),

    // the dedup keep-list: every document except non-canonical members of
    // a simhash duplicate group (p37's closure, membership-inverted)
    "p60_dedup_keep_list" ->
      (simhashCandCtes.replaceFirst("WITH ", "WITH RECURSIVE ") +
      s""",
         |pairs AS (SELECT da, db FROM cand WHERE bit_count(xor(sa, sb)) <= 1),
         |nodes AS (SELECT da AS id FROM pairs UNION SELECT db AS id FROM pairs),
         |edges AS (SELECT da AS a, db AS b FROM pairs
         |          UNION ALL SELECT db AS a, da AS b FROM pairs),
         |reach AS (
         |  SELECT id, id AS lab FROM nodes
         |  UNION
         |  SELECT e.b AS id, r.lab AS lab FROM reach r JOIN edges e ON e.a = r.id
         |),
         |members AS (SELECT id, MIN(lab) AS g FROM reach GROUP BY id)
         |SELECT doc_id FROM documents
         |WHERE doc_id NOT IN (SELECT id FROM members WHERE id <> g)
         |ORDER BY doc_id""".stripMargin))
}
