package graft

import graft.core.Pt

/** DuckDB oracle-SQL generation for the q20–q27 family.
  *
  * The driver's correctness gate (Verify → DuckDB) can only see queries with
  * an `oracleSql` entry. These queries run over synthetic inputs derived by
  * engine kernels (splitmix64, rolling hashes, SimHash, hyperplane LSH,
  * ray-cast PIP), so the oracle must replay those kernels in pure SQL with
  * bit-identical results:
  *
  *  - wrapping 64-bit integer arithmetic is emulated in UBIGINT/HUGEINT with
  *    explicit `% 2^64` (HUGEINT is signed 128-bit, so 64×64-bit products are
  *    split into 32-bit halves to avoid INT128 overflow);
  *  - splitmix64 is expanded as a staged column chain (DuckDB lateral column
  *    aliases), one stage per xorshift/multiply step;
  *  - per-character rolling hashes use list_reduce over unicode() codes
  *    (the corpus is pure ASCII — verified — so Java charAt == codepoint);
  *  - double arithmetic (phash→lon/lat, hyperplane dot products, ray-cast
  *    crossing tests) is written with the exact same operation order as the
  *    Scala kernels; IEEE-754 ops are deterministic across engines, and
  *    sequential folds use list_reduce (guaranteed left fold);
  *  - polygon vertices are inlined as shortest-round-trip double literals
  *    produced by the very Scala code the Spark side uses, so both engines
  *    ray-cast against identical coordinates.
  *
  * Everything here mirrors a named kernel: cite per method.
  */
object OracleSqlGen {

  private val W = "18446744073709551616" // 2^64

  private def u(c: Long): String = java.lang.Long.toUnsignedString(c)

  /** (x + c) mod 2^64 over UBIGINT expressions. */
  private def addc(x: String, c: Long): String =
    s"CAST((CAST($x AS HUGEINT) + ${u(c)}) % $W AS UBIGINT)"

  /** (x * c) mod 2^64 — 32-bit split so no intermediate exceeds INT128. */
  private def mulmod(x: String, c: Long): String = {
    val cl = u(c & 0xFFFFFFFFL)
    s"CAST(((CAST(($x & 4294967295) AS HUGEINT) * ${u(c)}) + " +
      s"((CAST(($x >> 32) AS HUGEINT) * $cl) % 4294967296) * 4294967296) % $W AS UBIGINT)"
  }

  private def xsr(x: String, n: Int): String = s"xor($x, ($x >> $n))"

  /** Staged splitmix64 (Kernels.mix64): emits 4 SELECT-list items, the last
    * aliased `out`. Use inside a subquery/CTE stage; reference `out` above. */
  def mix64Cols(base: String, out: String): String = {
    val z1 = s"${out}_z1"; val z2 = s"${out}_z2"; val z3 = s"${out}_z3"
    s"${addc(base, 0x9E3779B97F4A7C15L)} AS $z1,\n  " +
      s"${mulmod(xsr(z1, 30), 0xBF58476D1CE4E5B9L)} AS $z2,\n  " +
      s"${mulmod(xsr(z2, 27), 0x94D049BB133111EBL)} AS $z3,\n  " +
      s"${xsr(z3, 31)} AS $out"
  }

  /** UBIGINT → BIGINT with two's-complement wraparound (Scala Long). */
  def toSigned(x: String): String =
    s"(CASE WHEN $x >= 9223372036854775808 THEN CAST(CAST($x AS HUGEINT) - $W AS BIGINT) " +
      s"ELSE CAST($x AS BIGINT) END)"

  /** Rolling polynomial hash h = h*31 + code over the chars of string expr
    * `s` (Kernels.fp64 / token hashing), as a left fold with 64-bit wrap. */
  def rollHash(s: String): String =
    s"""list_reduce(list_prepend(CAST(1125899906842597 AS UBIGINT),
       |    [CAST(unicode(($s)[i]) AS UBIGINT) for i in generate_series(1, len($s))]),
       |    (h, c) -> CAST((CAST(h AS HUGEINT) * 31 + c) % $W AS UBIGINT))""".stripMargin

  /** Rolling hash of the 4 chars of `t` starting at 1-based position `j`
    * (Kernels.shingleHashes inner loop, shingleLen=4). Single mod at the end
    * is congruent to per-step wrapping. */
  private def roll4(t: String, j: String): String =
    s"CAST(((((CAST(1125899906842597 AS HUGEINT) * 31 + unicode($t[$j])) * 31 + " +
      s"unicode($t[$j + 1])) * 31 + unicode($t[$j + 2])) * 31 + unicode($t[$j + 3])) % $W AS UBIGINT)"

  // =================================================================
  // synthetic image table (ImageTable.metaDf / Kernels.phashFor)
  // =================================================================

  /** Image count for the scale factor, derived from the customer table:
    * imageCount = max(1000, sf·2e6) and |customer| = sf·150000 ⇒
    * n = max(1000, |customer|·40/3) (exact: |customer| divisible by 3). */
  val nImagesExpr: String =
    "(SELECT GREATEST(1000, COUNT(*) * 40 // 3) FROM customer)"

  /** WITH-fragment (no leading WITH) ending in a `pts` relation:
    * (id, phash UBIGINT, lon, lat) for ids 0..n-1 — replays
    * Kernels.phashFor (hotspot placement + jitter) and phashLon/Lat. */
  def ptsCtes(nExpr: String): String =
    s"""nimg AS (SELECT $nExpr AS n),
       |ids AS (SELECT unnest(generate_series(0, (SELECT n FROM nimg) - 1)) AS id),
       |mx AS (SELECT id,
       |  ${mix64Cols("CAST(id AS UBIGINT)", "m0")},
       |  ${mix64Cols("CAST(id + 1 AS UBIGINT)", "m1")},
       |  ${mix64Cols("CAST(id + 2 AS UBIGINT)", "m2")}
       |  FROM ids),
       |hp AS (SELECT id, m0,
       |  CASE WHEN id % 3 = 0 THEN 121.5654 WHEN id % 3 = 1 THEN -0.1278 ELSE -74.006 END
       |    + (CAST(m1 >> 40 AS DOUBLE) / 16777216.0 - 0.5) * 0.1 AS hlon,
       |  CASE WHEN id % 3 = 0 THEN 25.033 WHEN id % 3 = 1 THEN 51.5074 ELSE 40.7128 END
       |    + (CAST(m2 >> 40 AS DOUBLE) / 16777216.0 - 0.5) * 0.1 AS hlat
       |  FROM mx),
       |ph AS (SELECT id,
       |  CASE WHEN id % 10 < 3 THEN
       |    CAST(LEAST(4294967295, GREATEST(0, CAST(TRUNC((hlon + 180.0) / 360.0 * 4294967296.0) AS BIGINT))) AS UBIGINT) * 4294967296
       |    + CAST(LEAST(4294967295, GREATEST(0, CAST(TRUNC((hlat + 85.0) / 170.0 * 4294967296.0) AS BIGINT))) AS UBIGINT)
       |  ELSE m0 END AS phash
       |  FROM hp),
       |pts AS (SELECT id, phash,
       |  CAST(phash >> 32 AS DOUBLE) / 4294967296.0 * 360.0 - 180.0 AS lon,
       |  CAST(phash & 4294967295 AS DOUBLE) / 4294967296.0 * 170.0 - 85.0 AS lat
       |  FROM ph)""".stripMargin

  // =================================================================
  // district PIP (EntryQueries.districtRings / Kernels.polygonContains)
  // =================================================================

  /** Shortest-round-trip double literal — DuckDB parses decimal strings to
    * nearest double, so Java's shortest repr round-trips exactly. */
  private def dlit(d: Double): String = {
    val s = d.toString
    if (s.contains("E")) s.replace("E", "e") else s
  }

  /** hexes CTE: 3 hotspot hexagon rings as literal vertex columns
    * (x0..x6, y0..y6), doubles identical to the Spark WKB dictionary. */
  def hexesCte(rings: Seq[(String, Vector[Pt])]): String = {
    val rows = rings.map { case (name, ring) =>
      require(ring.length == 7, s"hexagon ring must have 7 points, got ${ring.length}")
      val coords = ring.flatMap(p => Seq(dlit(p.x), dlit(p.y))).mkString(", ")
      s"('$name', $coords)"
    }
    val cols = (0 to 6).flatMap(i => Seq(s"x$i", s"y$i")).mkString(", ")
    s"hexes AS (SELECT * FROM (VALUES\n  ${rows.mkString(",\n  ")})\n  AS t(district, $cols))"
  }

  /** Even-odd ray-cast parity over the 6 hexagon edges — the exact
    * expression of Kernels.polygonContains (same IEEE op order), evaluated
    * against `p.lon`/`p.lat`. */
  def hexContains: String = {
    val terms = (1 to 6).map { i =>
      val xi = s"h.x$i"; val yi = s"h.y$i"; val xj = s"h.x${i - 1}"; val yj = s"h.y${i - 1}"
      s"(CASE WHEN (($yi > p.lat) != ($yj > p.lat)) AND " +
        s"(p.lon < ($xj - $xi) * (p.lat - $yi) / ($yj - $yi) + $xi) THEN 1 ELSE 0 END)"
    }
    s"(${terms.mkString(" +\n      ")}) % 2 = 1"
  }

  /** joined CTE: every (point, containing district) pair. Band membership is
    * the ray-cast's exact half-open semantics for axis-aligned rectangles
    * (xmin ≤ px < xmax ∧ ymin ≤ py < ymax — derived from the even-odd
    * crossing rule; horizontal edges never cross). */
  def joinedCte: String =
    s"""joined AS (
       |  SELECT p.id, p.phash, p.lon, p.lat, 'band_' || CAST(b.i AS VARCHAR) AS district
       |  FROM pts p JOIN (SELECT unnest(generate_series(0, 11)) AS i) b
       |    ON p.lon >= CAST(b.i AS DOUBLE) * 30.0 - 180.0 AND p.lon < CAST(b.i AS DOUBLE) * 30.0 - 150.0
       |   AND p.lat >= -85.0 AND p.lat < 85.0
       |  UNION ALL
       |  SELECT p.id, p.phash, p.lon, p.lat, h.district
       |  FROM pts p JOIN hexes h ON $hexContains)""".stripMargin

  /** q06: the salted skew join over the synthetic image points vs the
    * region rectangles — the oracle replays points + the plain BETWEEN join
    * (salting must be row-invisible). `sqlRectCte` is EntryQueries' rect
    * derivation (strict bounds, same literals as the Spark residual). */
  def q06Sql(sqlRectCte: String): String =
    s"""WITH ${ptsCtes(nImagesExpr)},
       |rect AS ($sqlRectCte)
       |SELECT 'img' || lpad(CAST(id AS VARCHAR), 9, '0') AS image_id, r_regionkey
       |FROM pts JOIN rect
       |  ON lon > lon_min AND lon < lon_max AND lat > lat_min AND lat < lat_max""".stripMargin

  /** q20: flagship image pipeline — PIP join + tile grid + exact per-tile
    * stats (CellIndex x/y = floor arithmetic at res 7). */
  def q20Sql(rings: Seq[(String, Vector[Pt])]): String =
    s"""WITH ${ptsCtes(nImagesExpr)},
       |${hexesCte(rings)},
       |$joinedCte
       |SELECT district,
       |  CAST(FLOOR((lon + 180.0) / 360.0 * 128.0) AS BIGINT) AS tile_x,
       |  CAST(FLOOR((lat + 90.0) / 180.0 * 128.0) AS BIGINT) AS tile_y,
       |  COUNT(*) AS n_images,
       |  COUNT(DISTINCT phash) AS n_phashes
       |FROM joined GROUP BY district, tile_x, tile_y""".stripMargin

  /** q27: snapshot lineage rollup — batch ranges replay the lo/hi integer
    * slicing of the resumable pipeline; buckets are res-7 tiles. */
  def q27Sql(rings: Seq[(String, Vector[Pt])]): String =
    s"""WITH ${ptsCtes(s"LEAST($nImagesExpr, 20000)")},
       |${hexesCte(rings)},
       |$joinedCte
       |SELECT 'b' || CAST(CASE
       |    WHEN id >= (SELECT n FROM nimg) * 3 // 4 THEN 3
       |    WHEN id >= (SELECT n FROM nimg) * 2 // 4 THEN 2
       |    WHEN id >= (SELECT n FROM nimg) // 4 THEN 1
       |    ELSE 0 END AS VARCHAR) AS batch_id,
       |  COUNT(DISTINCT CAST(FLOOR((lon + 180.0) / 360.0 * 128.0) AS BIGINT) * 128
       |               + CAST(FLOOR((lat + 90.0) / 180.0 * 128.0) AS BIGINT)) AS n_buckets,
       |  COUNT(*) AS "rows"
       |FROM joined GROUP BY batch_id""".stripMargin

  /** q28: manifest-range read-back — the file skipping itself is a plan
    * property REQUIREd inside the Spark query; the data contract replayed
    * here is the exact per-tile rollup of the res-3 subtree (x=3, y=6): a
    * res-7 tile descends from it iff tile_x//16 = 3 and tile_y//16 = 6. */
  def q28Sql: String =
    s"""WITH ${ptsCtes(s"LEAST($nImagesExpr, 20000)")}
       |SELECT
       |  CAST(FLOOR((lon + 180.0) / 360.0 * 128.0) AS BIGINT) AS tile_x,
       |  CAST(FLOOR((lat + 90.0) / 180.0 * 128.0) AS BIGINT) AS tile_y,
       |  COUNT(*) AS n, COUNT(DISTINCT phash) AS n_phashes
       |FROM pts
       |WHERE CAST(FLOOR((lon + 180.0) / 360.0 * 128.0) AS BIGINT) // 16 = 3
       |  AND CAST(FLOOR((lat + 90.0) / 180.0 * 128.0) AS BIGINT) // 16 = 6
       |GROUP BY tile_x, tile_y""".stripMargin

  /** q29: image near-dup — replays the planted bit-flip variant corpus
    * (groups of 4 ids; in 1-in-8 groups, member d ∈ {1,2,3} XORs d
    * single-bit flips at mix64-chosen positions into the base id's phash)
    * and brute-forces Hamming ≤ maxHamming over ALL pairs — independent of
    * the engine's pigeonhole banding. */
  /** CTE chain (no leading WITH) producing `vr(id, vhash)` — the synthetic
    * q29 variant-hash corpus — shared by q29 (pairs) and q39 (components). */
  private def vrCtes: String = {
    def flip(j: Int): String =
      s"CASE WHEN a.id % 4 >= $j THEN CAST(1 AS UBIGINT) << CAST(m.f$j >> 58 AS INTEGER) ELSE CAST(0 AS UBIGINT) END"
    s"""${ptsCtes(s"LEAST($nImagesExpr, 20000)")},
       |mxf AS (SELECT id,
       |  ${mix64Cols("CAST(id * 8 + 1 AS UBIGINT)", "f1")},
       |  ${mix64Cols("CAST(id * 8 + 2 AS UBIGINT)", "f2")},
       |  ${mix64Cols("CAST(id * 8 + 3 AS UBIGINT)", "f3")},
       |  ${mix64Cols("CAST(id - id % 4 AS UBIGINT)", "gm")}
       |  FROM ids),
       |vr AS (SELECT a.id,
       |  CASE WHEN a.id % 4 = 0 OR (m.gm & CAST(7 AS UBIGINT)) != CAST(0 AS UBIGINT)
       |       THEN p.phash
       |       ELSE xor(xor(xor(b.phash, ${flip(1)}), ${flip(2)}), ${flip(3)})
       |  END AS vhash
       |  FROM ids a JOIN mxf m ON m.id = a.id
       |    JOIN pts p ON p.id = a.id
       |    JOIN pts b ON b.id = a.id - a.id % 4)""".stripMargin
  }

  def q29Sql(maxHamming: Int): String =
    s"""WITH $vrCtes
       |SELECT a.id AS id_a, b.id AS id_b,
       |  CAST(bit_count(xor(a.vhash, b.vhash)) AS BIGINT) AS hamming,
       |  CAST(0 AS BIGINT) AS n_dropped_buckets
       |FROM vr a JOIN vr b
       |  ON a.id < b.id AND bit_count(xor(a.vhash, b.vhash)) <= $maxHamming""".stripMargin

  /** q39: connected components over the q29 near-dup pairs — brute pairs,
    * symmetric closure, a recursive reachability CTE, and comp = the min
    * reachable id per node (exactly the engine's min-label fixpoint),
    * rolled up to (comp, n_members). */
  def q39Sql(maxHamming: Int): String =
    s"""WITH RECURSIVE $vrCtes,
       |prs AS (SELECT a.id AS ia, b.id AS ib
       |  FROM vr a JOIN vr b
       |  ON a.id < b.id AND bit_count(xor(a.vhash, b.vhash)) <= $maxHamming),
       |bidir AS (SELECT ia AS src, ib AS dst FROM prs
       |  UNION ALL SELECT ib, ia FROM prs),
       |nodes AS (SELECT DISTINCT src AS id FROM bidir),
       |reach(src, dst) AS (
       |  SELECT id, id FROM nodes
       |  UNION
       |  SELECT r.src, b.dst FROM reach r JOIN bidir b ON b.src = r.dst),
       |comp AS (SELECT src AS id, MIN(dst) AS comp FROM reach GROUP BY src)
       |SELECT comp, COUNT(*) AS n_members FROM comp GROUP BY comp""".stripMargin

  /** q30: full replay of the deterministic integer k-means training loop
    * (Ann.kmeansAssign): quantize to round(x·1000), seed with the k rows of
    * smallest mix64(vec_id) (UBIGINT order == Spark's sign-flipped order),
    * then `iters` Lloyd's rounds — integer squared-L2 assignment (ties to
    * the lowest cluster), element-wise floor-divided integer means (empty
    * clusters keep the previous centroid) — and a final assignment rollup.
    * Every quantity is an exact integer, so the chained-CTE replay is
    * bit-identical to the Spark loop. */
  /** Integer squared-L2 between two BIGINT[] lists. */
  private def qdist(a: String, b: String): String =
    s"CAST(list_sum(list_transform(list_zip($a, $b), x -> (x[1] - x[2]) * (x[1] - x[2]))) AS BIGINT)"

  /** One nearest-cluster assignment round: rows of `src` (vec_id, q)
    * against centroid table `cents`, ties to the lowest cluster. */
  private def kmAssignCte(name: String, cents: String, src: String = "qv"): String =
    s"""$name AS (SELECT vec_id, q, cluster, dist FROM (
       |  SELECT vec_id, q, cluster, dist,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cluster) AS rk
       |  FROM (SELECT v.vec_id, v.q, c.cluster, ${qdist("v.q", "c.q")} AS dist
       |        FROM $src v CROSS JOIN $cents c)) WHERE rk = 1)""".stripMargin

  /** WITH-fragment (no leading WITH) replaying the k-means training loop:
    * `qv` (quantized corpus), seeds `c0`, `iters` assign/update rounds
    * (`a1`,`c1`,…), and `afin` = the final assignment (vec_id, q, cluster,
    * dist) against the trained centroids `c<iters>`. `corpusWhere`
    * restricts the TRAINING corpus (q45's frozen-codebook append trains on
    * the base rows only); empty trains on the whole table. */
  def kmeansCtes(k: Int, iters: Int, dims: Int, corpusWhere: String = ""): String = {
    def assignCte(name: String, cents: String): String = kmAssignCte(name, cents)
    def updateCte(prev: String, asg: String, name: String): String =
      s"""$name AS (SELECT p.cluster, COALESCE(u.qq, p.q) AS q
         |  FROM $prev p LEFT JOIN (
         |    SELECT cluster, list(cv ORDER BY dim) AS qq FROM (
         |      SELECT cluster, dim, (s - ((s % n + n) % n)) // n AS cv FROM (
         |        SELECT a.cluster, g.i AS dim, SUM(a.q[g.i]) AS s, COUNT(*) AS n
         |        FROM $asg a, generate_series(1, $dims) AS g(i)
         |        GROUP BY a.cluster, g.i))
         |    GROUP BY cluster) u ON u.cluster = p.cluster)""".stripMargin
    val rounds = (1 to iters).map(t => assignCte(s"a$t", s"c${t - 1}") + ",\n" +
      updateCte(s"c${t - 1}", s"a$t", s"c$t")).mkString(",\n")
    val whereSfx = if (corpusWhere.isEmpty) "" else s" $corpusWhere"
    s"""qv AS (SELECT vec_id,
       |    list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
       |  FROM embeddings$whereSfx),
       |mx AS (SELECT vec_id, ${mix64Cols("CAST(vec_id AS UBIGINT)", "m")} FROM embeddings$whereSfx),
       |c0 AS (SELECT ROW_NUMBER() OVER (ORDER BY x.m) - 1 AS cluster, v.q
       |       FROM (SELECT vec_id, m FROM mx ORDER BY m LIMIT $k) x
       |       JOIN qv v ON v.vec_id = x.vec_id),
       |$rounds,
       |${assignCte("afin", s"c$iters")}""".stripMargin
  }

  def q30Sql(k: Int, iters: Int, dims: Int): String =
    s"""WITH ${kmeansCtes(k, iters, dims)}
       |SELECT cluster, COUNT(*) AS n_members, CAST(SUM(dist) AS BIGINT) AS sum_dist
       |FROM afin GROUP BY cluster""".stripMargin

  /** q31: full replay of the k-means-IVF search (Ann.ivfKmeansTopK):
    * trained centroids from [[kmeansCtes]], corpus bucketed by `afin`,
    * each query (vec_id < nq) probes its `probes` nearest centroids
    * (integer distance, ties to the lowest cluster) and is scored exactly
    * (quantized dot) inside them; per-query top-k by (score desc, id). */
  def q31Sql(k: Int, iters: Int, dims: Int, nq: Int, probes: Int, topK: Int): String =
    s"""WITH ${kmeansCtes(k, iters, dims)},
       |qp AS (SELECT q_id, cluster FROM (
       |  SELECT q_id, cluster,
       |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY dist, cluster) AS rk
       |  FROM (SELECT v.vec_id AS q_id, c.cluster, ${qdist("v.q", "c.q")} AS dist
       |        FROM (SELECT vec_id, q FROM qv WHERE vec_id < $nq) v
       |        CROSS JOIN c$iters c)) WHERE rk <= $probes),
       |scored AS (SELECT p.q_id, a.vec_id AS id,
       |    CAST(list_sum(list_transform(list_zip(a.q, v.q), x -> x[1] * x[2])) AS BIGINT) AS score
       |  FROM afin a JOIN qp p ON a.cluster = p.cluster
       |  JOIN qv v ON v.vec_id = p.q_id
       |  WHERE a.vec_id <> p.q_id)
       |SELECT q_id, id, score, rank FROM (
       |  SELECT q_id, id, score,
       |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score DESC, id) AS rank
       |  FROM scored) WHERE rank <= $topK""".stripMargin

  /** q45: frozen-codebook IVF append replay (Ann.appendToIvfIndex): the
    * codebook trains on the BASE corpus only (`baseWhere`), then EVERY row —
    * base and appended alike — is assigned against those frozen centroids
    * (`c<iters>`), exactly what build-then-append produces on the snapshot
    * table; queries probe and score over the union. Identical to [[q31Sql]]
    * except the training corpus is restricted and the scored corpus is the
    * separately-quantized full table (`qvu`/`au`). */
  def q45Sql(k: Int, iters: Int, dims: Int, nq: Int, probes: Int, topK: Int,
      baseWhere: String): String =
    s"""WITH ${kmeansCtes(k, iters, dims, baseWhere)},
       |qvu AS (SELECT vec_id,
       |    list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
       |  FROM embeddings),
       |${kmAssignCte("au", s"c$iters", "qvu")},
       |qp AS (SELECT q_id, cluster FROM (
       |  SELECT q_id, cluster,
       |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY dist, cluster) AS rk
       |  FROM (SELECT v.vec_id AS q_id, c.cluster, ${qdist("v.q", "c.q")} AS dist
       |        FROM (SELECT vec_id, q FROM qvu WHERE vec_id < $nq) v
       |        CROSS JOIN c$iters c)) WHERE rk <= $probes),
       |scored AS (SELECT p.q_id, a.vec_id AS id,
       |    CAST(list_sum(list_transform(list_zip(a.q, v.q), x -> x[1] * x[2])) AS BIGINT) AS score
       |  FROM au a JOIN qp p ON a.cluster = p.cluster
       |  JOIN qvu v ON v.vec_id = p.q_id
       |  WHERE a.vec_id <> p.q_id)
       |SELECT q_id, id, score, rank FROM (
       |  SELECT q_id, id, score,
       |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score DESC, id) AS rank
       |  FROM scored) WHERE rank <= $topK""".stripMargin

  /** q32: training-data mixing replay (Mixing.stratifiedSample): per-source
    * weights become ⌊w⌋ whole copies + one extra iff
    * (mix64(doc_id) >> 1) < ⌊frac(w)·2⁶³⌋ — the SAME precomputed integer
    * thresholds are embedded on both engines, so no float comparison runs
    * anywhere. Copies expand through the list form of generate_series
    * (the table form rejects lateral column bounds). */
  def q32Sql(weights: Seq[(String, Double)]): String = {
    val wholeCase = weights.sortBy(_._1).map { case (k, w) =>
      s"WHEN '$k' THEN ${math.floor(w).toLong}"
    }.mkString(" ")
    val thCase = weights.sortBy(_._1).map { case (k, w) =>
      s"WHEN '$k' THEN CAST(${graft.operators.Mixing.fracThreshold(w)} AS UBIGINT)"
    }.mkString(" ")
    s"""WITH mxd AS (SELECT doc_id, source,
       |  ${mix64Cols("CAST(doc_id AS UBIGINT)", "m")}
       |  FROM documents),
       |c AS (SELECT doc_id, source,
       |  (CASE source $wholeCase ELSE 0 END)
       |  + (CASE WHEN (m >> 1) < (CASE source $thCase ELSE CAST(0 AS UBIGINT) END)
       |     THEN 1 ELSE 0 END) AS copies
       |  FROM mxd),
       |e AS (SELECT doc_id, source,
       |  unnest(generate_series(0, copies - 1)) AS copy FROM c WHERE copies >= 1)
       |SELECT source, COUNT(*) AS n_rows, COUNT(DISTINCT doc_id) AS n_docs,
       |  CAST(SUM(copy) AS BIGINT) AS sum_copy
       |FROM e GROUP BY source""".stripMargin
  }

  /** q33: per-source budget cap replay (Mixing.budgetCap): running SUM of
    * n_chars over the mix64-uniform order per source, rows kept while the
    * running total stays within the source's budget. Window ORDER BY
    * ((m >> 1), doc_id) matches Spark's (u asc, id asc) exactly — both
    * nonnegative integers. */
  /** WITH-fragment (no leading WITH) ending in `r`: documents with their
    * per-source running n_chars sum in the mix64-uniform order — THE
    * window definition both q33 and q35 replay (must match Mixing's Spark
    * window `partitionBy(key).orderBy(u asc, id asc)` exactly). */
  private def runCte: String =
    s"""mxd AS (SELECT doc_id, source, n_chars,
       |  ${mix64Cols("CAST(doc_id AS UBIGINT)", "m")}
       |  FROM documents),
       |r AS (SELECT doc_id, source, n_chars,
       |  SUM(n_chars) OVER (PARTITION BY source ORDER BY (m >> 1), doc_id) AS run
       |  FROM mxd)""".stripMargin

  def q33Sql(budgets: Seq[(String, Long)]): String = {
    val bCase = budgets.sortBy(_._1).map { case (k, b) => s"WHEN '$k' THEN $b" }.mkString(" ")
    s"""WITH $runCte
       |SELECT source, COUNT(*) AS n_docs,
       |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
       |FROM r WHERE run <= CASE source $bCase ELSE 0 END
       |GROUP BY source""".stripMargin
  }

  /** q26: image-invariant rollup — the expected (fmt, n, n_dims_ok=n)
    * distribution from the deterministic synthesis; any decode failure on
    * the Spark side breaks n_dims_ok and the hash compare. */
  def q26Sql: String =
    s"""WITH nimg AS (SELECT LEAST($nImagesExpr, 2000) AS n),
       |ids AS (SELECT unnest(generate_series(0, (SELECT n FROM nimg) - 1)) AS id),
       |mx AS (SELECT id, ${mix64Cols("CAST(id + 5 AS UBIGINT)", "m5")} FROM ids)
       |SELECT CASE WHEN (m5 & 1) = 0 THEN 'png' ELSE 'jpeg' END AS fmt,
       |  COUNT(*) AS n, COUNT(*) AS n_dims_ok
       |FROM mx GROUP BY fmt""".stripMargin

  // =================================================================
  // text kernels (q21 jaccard, q22 simhash, q23 quality)
  // =================================================================

  /** q21: brute-force exact 4-gram Jaccard ≥ minJ over hashed shingle sets
    * (Kernels.shingleHashes + jaccardSorted). The LSH path's 100% recall at
    * this threshold is pinned in OperatorsSpec; the size-ratio prefilter is
    * lossless (J ≥ t ⇒ |A|/|B| ∈ [t, 1/t]). */
  def q21Sql(minJ: Double): String = {
    require(minJ == 0.6, "prefilter ratio hardcoded for 0.6 = 3/5")
    s"""WITH d AS (SELECT doc_id, lower(text) AS t FROM documents),
       |sh AS (SELECT doc_id,
       |  CASE WHEN len(t) < 4 THEN [${rollHash("t")}]
       |       ELSE list_distinct([${roll4("t", "j")} for j in generate_series(1, len(t) - 3)])
       |  END AS s
       |  FROM d),
       |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |    len(list_intersect(a.s, b.s)) AS inter, len(a.s) AS la, len(b.s) AS lb
       |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
       |   AND len(a.s) * 5 >= len(b.s) * 3 AND len(b.s) * 5 >= len(a.s) * 3)
       |SELECT id_a, id_b,
       |  CAST(inter AS DOUBLE) / CAST(la + lb - inter AS DOUBLE) AS jaccard,
       |  CAST(0 AS BIGINT) AS n_dropped_buckets
       |FROM pairs
       |WHERE CAST(inter AS DOUBLE) / CAST(la + lb - inter AS DOUBLE) >= $minJ""".stripMargin
  }

  /** q35: shard-packing replay (Mixing.packBins): running SUM of n_chars in
    * the per-source mix64-uniform order; bin = floor((run − cost)/binSize)
    * — the bin of the row's start offset. Same window/order as q33. */
  def q35Sql(binSize: Long): String =
    s"""WITH $runCte,
       |b AS (SELECT source, n_chars,
       |  CAST(((run - n_chars) - ((((run - n_chars) % $binSize) + $binSize) % $binSize))
       |    // $binSize AS BIGINT) AS bin
       |  FROM r)
       |SELECT source, bin, COUNT(*) AS n_docs,
       |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
       |FROM b GROUP BY source, bin""".stripMargin

  /** q38: globalOrder replay — exact global rank in the (mix64 >> 1,
    * doc_id) order via a plain ROW_NUMBER (the oracle can afford the
    * global sort the engine decomposes into sharded windows). */
  def q38Sql(limit: Long): String =
    s"""WITH mxd AS (SELECT doc_id, source, n_chars,
       |  ${mix64Cols("CAST(doc_id AS UBIGINT)", "m")}
       |  FROM documents),
       |o AS (SELECT doc_id, source, n_chars,
       |  CAST(ROW_NUMBER() OVER (ORDER BY (m >> 1), doc_id) - 1 AS BIGINT) AS ord
       |  FROM mxd)
       |SELECT ord, doc_id, source, n_chars FROM o WHERE ord < $limit""".stripMargin

  /** q43: radius self-join replay — brute-force planar pair scan over the
    * derived image points on integer-quantized milli-degree coords (the
    * engine's cell prefilter is a pure optimization; membership is the
    * exact integer predicate on both engines). */
  def q43Sql(qr: Long): String =
    s"""WITH ${ptsCtes(s"LEAST($nImagesExpr, 20000)")},
       |q AS (SELECT id,
       |  CAST(ROUND(lon * 1000) AS BIGINT) AS qx,
       |  CAST(ROUND(lat * 1000) AS BIGINT) AS qy FROM pts)
       |SELECT a.id AS id_a, b.id AS id_b,
       |  (a.qx - b.qx) * (a.qx - b.qx) + (a.qy - b.qy) * (a.qy - b.qy) AS qdist2
       |FROM q a JOIN q b
       |  ON a.id < b.id
       |  AND (a.qx - b.qx) * (a.qx - b.qx) + (a.qy - b.qy) * (a.qy - b.qy) <= ${qr * qr}""".stripMargin

  /** q46: spatial connectivity clustering replay — the q43 brute quantized
    * pair scan restricted to one hotspot city (id % 10 < 3 AND id % 3 = 0),
    * the q39 recursive-CTE closure over those pairs, and a singleton union
    * (isolated points cluster as themselves). The subset bound keeps the
    * closure at gate-friendly size. */
  def q46Sql(qr: Long): String =
    s"""WITH RECURSIVE ${ptsCtes(s"LEAST($nImagesExpr, 20000)")},
       |sub AS (SELECT id,
       |  CAST(ROUND(lon * 1000) AS BIGINT) AS qx,
       |  CAST(ROUND(lat * 1000) AS BIGINT) AS qy
       |  FROM pts WHERE id % 10 < 3 AND id % 3 = 0),
       |prs AS (SELECT a.id AS ia, b.id AS ib
       |  FROM sub a JOIN sub b
       |  ON a.id < b.id
       |  AND (a.qx - b.qx) * (a.qx - b.qx) + (a.qy - b.qy) * (a.qy - b.qy) <= ${qr * qr}),
       |bidir AS (SELECT ia AS src, ib AS dst FROM prs
       |  UNION ALL SELECT ib, ia FROM prs),
       |nodes AS (SELECT DISTINCT src AS id FROM bidir),
       |reach(src, dst) AS (
       |  SELECT id, id FROM nodes
       |  UNION
       |  SELECT r.src, b.dst FROM reach r JOIN bidir b ON b.src = r.dst),
       |comp AS (SELECT src AS id, MIN(dst) AS comp FROM reach GROUP BY src),
       |allc AS (SELECT s.id, COALESCE(c.comp, s.id) AS cluster
       |  FROM sub s LEFT JOIN comp c ON c.id = s.id)
       |SELECT cluster, COUNT(*) AS n_members FROM allc GROUP BY cluster""".stripMargin

  /** q40: contamination report replay — per eval doc (doc_id < nEval),
    * COUNT of corpus docs at Jaccard ≥ minJ (same shingle kernel + integer
    * ratio prefilter as q34; LEFT JOIN keeps zero-hit eval rows). */
  def q40Sql(minJ: Double, nEval: Int): String = {
    val num = graft.operators.Dedup.ratioNum(minJ)
    val den = graft.operators.Dedup.RatioDen
    s"""WITH d AS (SELECT doc_id, lower(text) AS t FROM documents),
       |sh AS (SELECT doc_id,
       |  CASE WHEN len(t) < 4 THEN [${rollHash("t")}]
       |       ELSE list_distinct([${roll4("t", "j")} for j in generate_series(1, len(t) - 3)])
       |  END AS s
       |  FROM d),
       |ev AS (SELECT doc_id AS eval_id, s FROM sh WHERE doc_id < $nEval)
       |SELECT e.eval_id, CAST(COUNT(a.doc_id) AS BIGINT) AS n_hits
       |FROM ev e LEFT JOIN sh a
       |  ON len(a.s) * $den >= len(e.s) * $num
       |  AND len(e.s) * $den >= len(a.s) * $num
       |  AND CAST(len(list_intersect(a.s, e.s)) AS DOUBLE)
       |      / CAST(len(a.s) + len(e.s) - len(list_intersect(a.s, e.s)) AS DOUBLE) >= $minJ
       |GROUP BY e.eval_id""".stripMargin
  }

  /** q41: top-k vocabulary replay — single-space tokens, lowercased,
    * count + (n DESC, token ASC) top-k. */
  def q41Sql(k: Int): String =
    s"""WITH toks AS (SELECT lower(tok) AS token
       |  FROM documents, unnest(string_split(text, ' ')) AS u(tok)
       |  WHERE len(tok) > 0)
       |SELECT token, COUNT(*) AS n FROM toks GROUP BY token
       |ORDER BY n DESC, token LIMIT $k""".stripMargin

  /** q47: per-document top-k terms by integer-exact tf-idf — score =
    * tf · (nDocs·idfScale // df) with tf/df/nDocs all exact integers;
    * tokenization identical to q41 (single-space split, lowercased).
    * `//` is DuckDB floor division == Spark's `div` on positive longs. */
  def q47Sql(k: Int, idfScale: Long): String =
    s"""WITH toks AS (SELECT doc_id, lower(tok) AS token
       |  FROM documents, unnest(string_split(text, ' ')) AS u(tok)
       |  WHERE len(tok) > 0),
       |tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY doc_id, token),
       |dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
       |nd AS (SELECT COUNT(*) AS n_docs FROM documents),
       |scored AS (SELECT t.doc_id, t.token, t.tf, d.df,
       |  t.tf * ((nd.n_docs * $idfScale) // d.df) AS score
       |  FROM tf t JOIN dfreq d USING (token), nd),
       |ranked AS (SELECT doc_id, token, tf, df, score,
       |  ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, token) AS rnk
       |  FROM scored)
       |SELECT doc_id, token, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
       |  CAST(score AS BIGINT) AS score, CAST(rnk AS BIGINT) AS rnk
       |FROM ranked WHERE rnk <= $k""".stripMargin

  /** q48: canonical keep-set — SimHash pairs (q22's sig CTE), the q39-style
    * recursive-CTE transitive closure, the q23 integer quality blend, then
    * one doc kept per component by (quality DESC, id ASC); docs in no pair
    * are their own component. */
  def q48Sql(maxHamming: Int): String =
    s"""WITH RECURSIVE $simhashCtes,
       |${closureCtes(maxHamming)},
       |${qualityCtesOver("documents")},
       |lab AS (SELECT q.doc_id AS id, q.quality, COALESCE(c.comp, q.doc_id) AS comp
       |  FROM qual q LEFT JOIN comp c ON c.id = q.doc_id),
       |r AS (SELECT id, comp, quality,
       |  ROW_NUMBER() OVER (PARTITION BY comp ORDER BY quality DESC, id) AS rnk,
       |  COUNT(*) OVER (PARTITION BY comp) AS n_members FROM lab)
       |SELECT id, comp, quality, CAST(n_members AS BIGINT) AS n_members
       |FROM r WHERE rnk = 1""".stripMargin

  /** SimHash-pair transitive closure over `sig` → `comp (id, comp)`:
    * pairs at Hamming ≤ maxHamming, bidirected, recursive reachability,
    * min-reachable label (the q39/q48 closure, shared with q64). */
  private def closureCtes(maxHamming: Int): String =
    s"""prs AS (SELECT a.doc_id AS ia, b.doc_id AS ib FROM sig a JOIN sig b
       |  ON a.doc_id < b.doc_id AND bit_count(xor(a.s, b.s)) <= $maxHamming),
       |bidir AS (SELECT ia AS src, ib AS dst FROM prs
       |  UNION ALL SELECT ib, ia FROM prs),
       |gnodes AS (SELECT DISTINCT src AS id FROM bidir),
       |reach(src, dst) AS (
       |  SELECT id, id FROM gnodes
       |  UNION
       |  SELECT r.src, b.dst FROM reach r JOIN bidir b ON b.src = r.dst),
       |comp AS (SELECT src AS id, MIN(dst) AS comp FROM reach GROUP BY src)""".stripMargin

  /** Integer quality score (TextOps.qualityScoreBp) over an arbitrary
    * (doc_id, text) relation → `qual (doc_id, quality)`. */
  private def qualityCtesOver(rel: String): String = {
    val stop = Seq("the", "a", "an", "and", "or", "of", "to", "in", "is",
      "it", "that", "for", "on", "with", "as", "was", "at", "by", "be", "this")
    s"""qb AS (SELECT doc_id,
       |  length(text) AS n,
       |  length(text) - length(regexp_replace(text, '[\\p{P}]', '', 'g')) AS n_punct,
       |  length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit,
       |  list_filter(regexp_split_to_array(lower(text), '[^a-z'']+'), w -> len(w) > 0) AS qwords
       |  FROM $rel),
       |qs AS (SELECT doc_id, n, n_punct, n_digit, len(qwords) AS n_qw,
       |  len(list_filter(qwords, w -> list_contains([${stop.map("'" + _ + "'").mkString(", ")}], w))) AS n_stop
       |  FROM qb),
       |qual AS (SELECT doc_id, CAST(LEAST(n, 500) * 8
       |  + CASE WHEN 200 * n_punct >= n AND 20 * n_punct <= 3 * n THEN 2500 ELSE 750 END
       |  + CASE WHEN n_qw > 0 AND 10 * n_stop >= n_qw AND 10 * n_stop <= 7 * n_qw THEN 2500 ELSE 1000 END
       |  + CASE WHEN 10 * n_digit < 3 * n THEN 1000 ELSE 200 END AS BIGINT) AS quality
       |  FROM qs)""".stripMargin
  }

  /** q64: the README six-line training-data pipeline as ONE gated query —
    * every stage is an already-validated kernel replay, composed:
    * (1) fuzzy eval decontamination (q34's NOT-EXISTS over hashed 4-gram
    * shingles, eval = doc_id % 97 = 3), (2) exact dedup (min doc_id per
    * text), (3) SimHash ≤ maxHamming near-dup clusters → keep-best by
    * integer quality (q48's closure + argmax, signatures computed over the
    * SURVIVORS only), (4) quality gate, (5) per-source deterministic bin
    * packing (q35's mix64-order running sum). Output: (source, bin,
    * n_docs, total_chars). */
  def q64Sql(minJ: Double, maxHamming: Int, qualityMin: Long, binSize: Long): String = {
    val num = graft.operators.Dedup.ratioNum(minJ)
    val den = graft.operators.Dedup.RatioDen
    s"""WITH RECURSIVE d AS (SELECT doc_id, lower(text) AS t FROM documents),
       |sh AS (SELECT doc_id,
       |  CASE WHEN len(t) < 4 THEN [${rollHash("t")}]
       |       ELSE list_distinct([${roll4("t", "j")} for j in generate_series(1, len(t) - 3)])
       |  END AS s
       |  FROM d),
       |ev AS (SELECT s FROM sh WHERE doc_id % 97 = 3),
       |keep1 AS (SELECT a.doc_id FROM sh a WHERE a.doc_id % 97 <> 3 AND NOT EXISTS (
       |  SELECT 1 FROM ev b
       |  WHERE len(a.s) * $den >= len(b.s) * $num
       |    AND len(b.s) * $den >= len(a.s) * $num
       |    AND CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
       |        / CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE) >= $minJ)),
       |k2 AS (SELECT MIN(d2.doc_id) AS doc_id FROM documents d2
       |  JOIN keep1 USING (doc_id) GROUP BY d2.text),
       |base AS (SELECT dd.doc_id, dd.text, dd.source, dd.n_chars
       |  FROM documents dd JOIN k2 USING (doc_id)),
       |${simhashCtesOver("base")},
       |${closureCtes(maxHamming)},
       |${qualityCtesOver("base")},
       |lab AS (SELECT q.doc_id AS id, q.quality, COALESCE(c.comp, q.doc_id) AS comp
       |  FROM qual q LEFT JOIN comp c ON c.id = q.doc_id),
       |r AS (SELECT id, quality,
       |  ROW_NUMBER() OVER (PARTITION BY comp ORDER BY quality DESC, id) AS rnk FROM lab),
       |win AS (SELECT id FROM r WHERE rnk = 1 AND quality >= $qualityMin),
       |mxd AS (SELECT b2.doc_id, b2.source, b2.n_chars,
       |  ${mix64Cols("CAST(b2.doc_id AS UBIGINT)", "m")}
       |  FROM base b2 JOIN win ON win.id = b2.doc_id),
       |rr AS (SELECT doc_id, source, n_chars,
       |  SUM(n_chars) OVER (PARTITION BY source ORDER BY (m >> 1), doc_id) AS run
       |  FROM mxd),
       |bb AS (SELECT source, n_chars,
       |  CAST(((run - n_chars) - ((((run - n_chars) % $binSize) + $binSize) % $binSize))
       |    // $binSize AS BIGINT) AS bin
       |  FROM rr)
       |SELECT source, bin, COUNT(*) AS n_docs,
       |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
       |FROM bb GROUP BY source, bin""".stripMargin
  }

  /** q37: packBins over shardKey(source, doc_id, nShards) — the giant-key
    * sharding recipe replayed end-to-end. nShards MUST be a power of two
    * here: Spark's `pmod(mix64(id), 2^k)` equals `(m & (2^k−1))` on the
    * unsigned DuckDB replay (low bits are sign-independent), so the shard
    * needs no signed-modulo emulation. Same window order as q33/q35 but
    * partitioned by the composite key. */
  def q37Sql(binSize: Long, nShards: Int): String = {
    require(Integer.bitCount(nShards) == 1, "nShards must be a power of two")
    val mask = nShards - 1
    s"""WITH mxd AS (SELECT doc_id, source, n_chars,
       |  ${mix64Cols("CAST(doc_id AS UBIGINT)", "m")}
       |  FROM documents),
       |sk AS (SELECT doc_id, n_chars, m,
       |  source || '#' || CAST((m & $mask) AS VARCHAR) AS skey
       |  FROM mxd),
       |r AS (SELECT skey, n_chars,
       |  SUM(n_chars) OVER (PARTITION BY skey ORDER BY (m >> 1), doc_id) AS run
       |  FROM sk),
       |b AS (SELECT skey, n_chars,
       |  CAST(((run - n_chars) - ((((run - n_chars) % $binSize) + $binSize) % $binSize))
       |    // $binSize AS BIGINT) AS bin
       |  FROM r)
       |SELECT skey, bin, COUNT(*) AS n_docs,
       |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
       |FROM b GROUP BY skey, bin""".stripMargin
  }

  /** q34: eval decontamination replay (Dedup.decontaminate): survivors =
    * corpus docs with NO eval doc at Jaccard ≥ minJ over hashed 4-gram
    * shingle sets (same rollHash kernel as q21), with the same lossless
    * integer size-ratio prefilter the engine applies. Eval = doc_id <
    * `nEval` of the corpus itself, so those docs (J = 1 vs themselves) and
    * their near-dups are removed. */
  def q34Sql(minJ: Double, nEval: Int): String = {
    val num = graft.operators.Dedup.ratioNum(minJ)
    val den = graft.operators.Dedup.RatioDen
    s"""WITH d AS (SELECT doc_id, lower(text) AS t FROM documents),
       |sh AS (SELECT doc_id,
       |  CASE WHEN len(t) < 4 THEN [${rollHash("t")}]
       |       ELSE list_distinct([${roll4("t", "j")} for j in generate_series(1, len(t) - 3)])
       |  END AS s
       |  FROM d),
       |ev AS (SELECT s FROM sh WHERE doc_id < $nEval),
       |keep AS (SELECT a.doc_id FROM sh a WHERE NOT EXISTS (
       |  SELECT 1 FROM ev b
       |  WHERE len(a.s) * $den >= len(b.s) * $num
       |    AND len(b.s) * $den >= len(a.s) * $num
       |    AND CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
       |        / CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE) >= $minJ))
       |SELECT dd.source, COUNT(*) AS n_docs, CAST(SUM(dd.n_chars) AS BIGINT) AS total_chars
       |FROM documents dd JOIN keep k ON dd.doc_id = k.doc_id
       |GROUP BY dd.source""".stripMargin
  }

  /** sig CTE fragment: per-doc 64-bit SimHash (Kernels.simhash64) as a
    * UBIGINT column `s` keyed by doc_id. */
  def simhashCtes: String = simhashCtesOver("documents")

  /** [[simhashCtes]] over an arbitrary (doc_id, text, …) relation — q64
    * signs only the docs surviving its earlier pipeline stages. */
  def simhashCtesOver(rel: String): String =
    s"""docs AS (SELECT doc_id, text FROM $rel),
       |toks AS (SELECT doc_id, lower(tok) AS t
       |         FROM docs, unnest(string_split(text, ' ')) AS u(tok) WHERE len(tok) > 0),
       |hashes AS (SELECT doc_id, ${rollHash("t")} AS h FROM toks),
       |mixed AS (SELECT doc_id, ${mix64Cols("h", "mxh")} FROM hashes),
       |votes AS (SELECT doc_id, b, SUM(CASE WHEN (mxh >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
       |          FROM mixed, generate_series(0, 63) AS g(b) GROUP BY doc_id, b),
       |sig AS (SELECT doc_id, SUM(CASE WHEN v > 0 THEN CAST(1 AS UBIGINT) << b ELSE CAST(0 AS UBIGINT) END) AS s
       |        FROM votes GROUP BY doc_id)""".stripMargin

  /** q22: brute-force SimHash pairs at Hamming ≤ k. The Spark side's
    * pigeonhole blocking (k+1 blocks) guarantees 100% recall, so the
    * bucketed plan and this exhaustive oracle agree exactly. */
  def q22Sql(maxHamming: Int): String =
    s"""WITH $simhashCtes
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |  CAST(bit_count(xor(a.s, b.s)) AS BIGINT) AS hamming,
       |  CAST(0 AS BIGINT) AS n_dropped_buckets
       |FROM sig a JOIN sig b
       |  ON a.doc_id < b.doc_id AND bit_count(xor(a.s, b.s)) <= $maxHamming""".stripMargin

  /** q23: language-ID heuristic, integer quality score, BPE-ish token count,
    * and fp64 fingerprint (TextOps / Kernels.fp64), all replayed exactly.
    * Token-count equivalence: each \\p{P}\\p{S} char is a singleton token
    * under the lookaround split, and the rest split at whitespace — verified
    * char-class parity Java↔RE2 on ASCII. */
  def q23Sql: String = {
    def hits(words: Seq[String]): String =
      s"CAST(len(list_filter(lwords, w -> list_contains([${words.map("'" + _ + "'").mkString(", ")}], w))) AS DOUBLE)"
    val en = hits(Seq("the", "and", "of", "to", "is", "in", "that", "it", "was", "for"))
    val de = hits(Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "sich"))
    val fr = hits(Seq("le", "la", "les", "et", "est", "une", "pour", "que", "dans", "pas"))
    val es = hits(Seq("el", "la", "los", "y", "es", "una", "por", "que", "con", "para"))
    val stop = Seq("the", "a", "an", "and", "or", "of", "to", "in", "is",
      "it", "that", "for", "on", "with", "as", "was", "at", "by", "be", "this")
    s"""WITH d AS (SELECT doc_id, lang, text, lower(text) AS t,
       |    substring(text, 1, 256) AS pfx FROM documents),
       |base AS (SELECT doc_id, lang, text, t, pfx,
       |  length(text) AS n,
       |  length(text) - length(regexp_replace(text, '[\\p{P}]', '', 'g')) AS n_punct,
       |  length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit,
       |  length(text) - length(regexp_replace(text, '[\\p{P}\\p{S}]', '', 'g')) AS n_ps,
       |  len(regexp_extract_all(text, '[^\\p{P}\\p{S}\\s]+')) AS n_runs,
       |  length(regexp_replace(text, '[^\\p{Han}\\p{Hiragana}\\p{Katakana}\\p{Hangul}]', '', 'g')) AS cjk,
       |  list_filter(regexp_split_to_array(t, '[^\\p{L}'']+'), w -> len(w) > 0) AS lwords,
       |  list_filter(regexp_split_to_array(t, '[^a-z'']+'), w -> len(w) > 0) AS qwords
       |  FROM d),
       |feat AS (SELECT doc_id, lang, pfx, n, n_punct, n_digit, n_ps, n_runs, cjk, lwords,
       |  GREATEST(CAST(len(lwords) AS DOUBLE), 1.0) AS nw,
       |  CAST(len(qwords) AS DOUBLE) AS n_qw_d,
       |  len(qwords) AS n_qw,
       |  len(list_filter(qwords, w -> list_contains([${stop.map("'" + _ + "'").mkString(", ")}], w))) AS n_stop
       |  FROM base),
       |fp AS (SELECT doc_id, ${rollHash("pfx")} AS fpu, * EXCLUDE (doc_id) FROM feat)
       |SELECT doc_id, lang,
       |  CASE WHEN cjk > n / 4 THEN 'cjk'
       |       WHEN $en >= $de AND $en >= $fr AND $en >= $es AND $en / nw > 0.02 THEN 'en'
       |       WHEN $de >= $fr AND $de >= $es AND $de / nw > 0.02 THEN 'de'
       |       WHEN $fr >= $es AND $fr / nw > 0.02 THEN 'fr'
       |       WHEN $es / nw > 0.02 THEN 'es'
       |       ELSE 'other' END AS lang_pred,
       |  CAST(LEAST(n, 500) * 8
       |    + CASE WHEN 200 * n_punct >= n AND 20 * n_punct <= 3 * n THEN 2500 ELSE 750 END
       |    + CASE WHEN n_qw > 0 AND 10 * n_stop >= n_qw AND 10 * n_stop <= 7 * n_qw THEN 2500 ELSE 1000 END
       |    + CASE WHEN 10 * n_digit < 3 * n THEN 1000 ELSE 200 END AS BIGINT) AS quality_bp,
       |  CAST(n_ps + n_runs AS BIGINT) AS bpe_tokens,
       |  ${toSigned("fpu")} AS fp
       |FROM fp""".stripMargin
  }

  // =================================================================
  // embedding kernels (q24 IVF replay, q25 banded near-dup replay)
  // =================================================================

  /** planes CTE: hyperplane component p(i,j) = toSigned(mix64(i·100003+j)) /
    * 2^63 — Kernels.hyperplaneSig's plane derivation, exact. */
  private def planesCte(nPlanes: Int, dim: Int): String =
    s"""planes AS (
       |  SELECT i, j, CAST(${toSigned("mxp")} AS DOUBLE) / 9.223372036854776e18 AS p
       |  FROM (SELECT i, j, ${mix64Cols("CAST(i * 100003 + j AS UBIGINT)", "mxp")}
       |        FROM (SELECT unnest(generate_series(0, ${nPlanes - 1})) AS i),
       |             (SELECT unnest(generate_series(0, ${dim - 1})) AS j)))""".stripMargin

  /** sigs CTE over a relation `corpus(vec_id, emb DOUBLE[])`: left-fold dot
    * products per plane (list_reduce = guaranteed sequential order, matching
    * the Scala accumulation loop), sign bits packed into UBIGINT `bucket`. */
  private def sigsCte(nPlanes: Int): String =
    s"""prods AS (SELECT c.vec_id, pl.i, pl.j, c.emb[pl.j + 1] * pl.p AS prod
       |          FROM corpus c, planes pl),
       |accs AS (SELECT vec_id, i,
       |    list_reduce(list_prepend(0.0, list(prod ORDER BY j)), (a, b) -> a + b) AS acc
       |  FROM prods GROUP BY vec_id, i),
       |sigs AS (SELECT vec_id,
       |    SUM(CASE WHEN acc >= 0 THEN CAST(1 AS UBIGINT) << i ELSE CAST(0 AS UBIGINT) END) AS bucket
       |  FROM accs GROUP BY vec_id)""".stripMargin

  /** Integer-quantized dot product of two DOUBLE[] lists (Ann.quantizedDot,
    * scale 1000) — order-independent exact integer sum. */
  private def qdot(a: String, b: String): String =
    s"CAST(list_sum(list_transform(list_zip($a, $b), " +
      s"x -> CAST(ROUND(x[1] * 1000) AS BIGINT) * CAST(ROUND(x[2] * 1000) AS BIGINT))) AS BIGINT)"

  /** q24: full replay of the IVF-style ANN (Ann.ivfTopK, planes=4,
    * probes=5): coarse hyperplane buckets, multi-probe = single-bit flips,
    * in-bucket exact quantized scoring, per-query top-k. This pins the
    * approximate algorithm itself, not just an invariant of it. */
  def q24Sql: String =
    s"""WITH ${planesCte(4, 64)},
       |corpus AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb FROM embeddings),
       |${sigsCte(4)},
       |c AS (SELECT s.vec_id AS id, e.emb, s.bucket FROM corpus e JOIN sigs s ON e.vec_id = s.vec_id),
       |q AS (SELECT e.vec_id AS q_id, e.emb AS q_emb, xor(s.bucket, CAST(m AS UBIGINT)) AS bucket
       |      FROM corpus e JOIN sigs s ON e.vec_id = s.vec_id, unnest([0, 1, 2, 4, 8]) AS u(m)
       |      WHERE e.vec_id < 5),
       |scored AS (SELECT q.q_id, c.id, ${qdot("c.emb", "q.q_emb")} AS score
       |           FROM c JOIN q ON c.bucket = q.bucket AND c.id <> q.q_id)
       |SELECT q_id, id, score, rank FROM (
       |  SELECT q_id, id, score,
       |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score DESC, id) AS rank
       |  FROM scored) WHERE rank <= 10""".stripMargin

  /** q25: full replay of the banded hyperplane near-dup join
    * (Dedup.embeddingNearDup): 64-plane signature, 4×16-bit bands,
    * candidates share ≥1 band, verified by the exact integer predicate
    * cos² ≥ 361/400 (= 0.95²) over quantized vectors. The corpus is
    * augmented with deterministic near-copies (x·1.02 + 0.01) of vec_id<50
    * so true near-duplicates exist to find. */
  def q25Sql: String =
    s"""WITH ${planesCte(64, 64)},
       |base AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb FROM embeddings),
       |corpus AS (SELECT vec_id, emb FROM base
       |  UNION ALL
       |  SELECT vec_id + 1000000 AS vec_id, list_transform(emb, x -> x * 1.02 + 0.01) AS emb
       |  FROM base WHERE vec_id < 50),
       |${sigsCte(64)},
       |qv AS (SELECT c.vec_id, s.bucket,
       |    list_transform(c.emb, x -> CAST(ROUND(x * 1000) AS BIGINT)) AS q
       |  FROM corpus c JOIN sigs s ON c.vec_id = s.vec_id),
       |qn AS (SELECT vec_id, bucket, q,
       |    CAST(list_sum(list_transform(q, v -> v * v)) AS BIGINT) AS nq FROM qv),
       |banded AS (SELECT vec_id, q, nq, b, (bucket >> (b * 16)) & 65535 AS bv
       |           FROM qn, unnest([0, 1, 2, 3]) AS u(b)),
       |cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
       |    a.q AS qa, b.q AS qb, a.nq AS na, b.nq AS nb
       |  FROM banded a JOIN banded b
       |    ON a.b = b.b AND a.bv = b.bv AND a.vec_id < b.vec_id),
       |scored AS (SELECT id_a, id_b,
       |    CAST(list_sum(list_transform(list_zip(qa, qb), x -> x[1] * x[2])) AS BIGINT) AS dot_q,
       |    na, nb FROM cand)
       |SELECT id_a, id_b, dot_q, CAST(0 AS BIGINT) AS n_dropped_buckets FROM scored
       |WHERE dot_q > 0 AND dot_q * dot_q * 400 >= 361 * na * nb""".stripMargin

  /** q55: full replay of product-quantization ANN (Ann.pqTopK): quantize,
    * seed every subspace with the SAME ks globally-mix64-smallest rows
    * (sliced per subspace), `iters` per-subspace Lloyd's rounds (integer
    * squared-L2, ties to the lowest code, floor-divided integer means,
    * empty codes keep their previous centroid), encode the corpus to
    * per-subspace codes, then ADC-score queries as Σ_s q_sub·codebook
    * reconstruction — every quantity an exact integer, so the replay is
    * bit-identical to the Spark loop (same contract as q30/q31/q45). */
  def q55Sql(m: Int, ks: Int, iters: Int, dims: Int, nq: Int, topK: Int): String = {
    require(dims % m == 0, s"dims ($dims) must divide by m ($m)")
    val d = dims / m
    def assign(name: String, cents: String): String =
      s"""$name AS (SELECT vec_id, s, sq, code FROM (
         |  SELECT vec_id, s, sq, code,
         |    ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY dist, code) AS rk
         |  FROM (SELECT v.vec_id, v.s, v.sq, c.code, ${qdist("v.sq", "c.sq")} AS dist
         |        FROM qs v JOIN $cents c ON c.s = v.s)) WHERE rk = 1)""".stripMargin
    def update(prev: String, asg: String, name: String): String =
      s"""$name AS (SELECT p.s, p.code, COALESCE(u.qq, p.sq) AS sq
         |  FROM $prev p LEFT JOIN (
         |    SELECT s, code, list(cv ORDER BY dim) AS qq FROM (
         |      SELECT s, code, dim, (sv - ((sv % n + n) % n)) // n AS cv FROM (
         |        SELECT a.s, a.code, g.i AS dim, SUM(a.sq[g.i]) AS sv, COUNT(*) AS n
         |        FROM $asg a, generate_series(1, $d) AS g(i)
         |        GROUP BY a.s, a.code, g.i))
         |    GROUP BY s, code) u ON u.s = p.s AND u.code = p.code)""".stripMargin
    val rounds = (1 to iters).map(t => assign(s"pa$t", s"pc${t - 1}") + ",\n" +
      update(s"pc${t - 1}", s"pa$t", s"pc$t")).mkString(",\n")
    s"""WITH qv AS (SELECT vec_id,
       |    list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
       |  FROM embeddings),
       |mx AS (SELECT vec_id, ${mix64Cols("CAST(vec_id AS UBIGINT)", "m")} FROM embeddings),
       |seeds AS (SELECT ROW_NUMBER() OVER (ORDER BY x.m) - 1 AS c, v.q
       |          FROM (SELECT vec_id, m FROM mx ORDER BY m LIMIT $ks) x
       |          JOIN qv v ON v.vec_id = x.vec_id),
       |subs AS (SELECT unnest(generate_series(0, ${m - 1})) AS s),
       |qs AS (SELECT vec_id, s, q[s * $d + 1 : s * $d + $d] AS sq FROM qv, subs),
       |pc0 AS (SELECT s, c AS code, q[s * $d + 1 : s * $d + $d] AS sq FROM seeds, subs),
       |$rounds,
       |${assign("pafin", s"pc$iters")},
       |qsub AS (SELECT vec_id AS q_id, s, sq FROM qs WHERE vec_id < $nq),
       |parts AS (SELECT q.q_id, c.vec_id AS id,
       |    CAST(list_sum(list_transform(list_zip(q.sq, b.sq), x -> x[1] * x[2])) AS BIGINT) AS p
       |  FROM pafin c JOIN pc$iters b ON b.s = c.s AND b.code = c.code
       |  JOIN qsub q ON q.s = c.s
       |  WHERE c.vec_id <> q.q_id),
       |scored AS (SELECT q_id, id, CAST(SUM(p) AS BIGINT) AS score
       |           FROM parts GROUP BY q_id, id)
       |SELECT q_id, id, score, rank FROM (
       |  SELECT q_id, id, score,
       |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score DESC, id) AS rank
       |  FROM scored) WHERE rank <= $topK""".stripMargin
  }

  /** q57: full replay of the BPE tokenizer trainer (TextOps.bpeTrain,
    * Sennrich et al. ACL'16): word histogram → char symbols + `</w>` →
    * `k` chained rounds of (pair count, argmax by (n DESC, a, b) LIMIT 1,
    * left-to-right merge rewrite). The merge rewrite is a list_reduce fold
    * with a VARCHAR[] accumulator that looks BACK at the last emitted
    * symbol — exactly [[graft.operators.TextOps]]'s mergeFold — and every
    * round's winner is recomputed in SQL (not embedded), so the replay
    * pins the whole data-dependent training trajectory. */
  def q57Sql(k: Int): String = {
    val unions = (1 to k).map(r =>
      s"SELECT CAST($r AS BIGINT) AS round, a, b, a || b AS merged, CAST(n AS BIGINT) AS n FROM win$r")
      .mkString("\nUNION ALL\n")
    s"""WITH ${bpeCtes(k)}
       |$unions""".stripMargin
  }

  /** Shared BPE training CTE chain for q57/q58: toks → w0 (word histogram
    * with char symbols + `</w>`) → k rounds of (pair count p_r, 1-row
    * argmax win_r, merged state w_r). The word key `w` rides through every
    * w_r so q58 can join documents back to the FINAL segmentation. */
  private def bpeCtes(k: Int): String = {
    val rounds = (1 to k).map { r =>
      s"""p$r AS (SELECT pr[1] AS a, pr[2] AS b, SUM(cnt) AS n
         |  FROM (SELECT list_transform(generate_series(1, len(syms) - 1),
         |                i -> [syms[i], syms[i + 1]]) AS prs, cnt FROM w${r - 1}),
         |       unnest(prs) AS u(pr)
         |  GROUP BY a, b),
         |win$r AS (SELECT a, b, n FROM p$r ORDER BY n DESC, a, b LIMIT 1),
         |w$r AS (SELECT w, list_reduce(
         |    list_prepend(CAST([] AS VARCHAR[]), list_transform(syms, x -> [x])),
         |    (acc, e) -> CASE WHEN len(acc) > 0 AND acc[-1] = win.a AND e[1] = win.b
         |      THEN list_append(acc[1:len(acc) - 1], win.a || win.b)
         |      ELSE list_append(acc, e[1]) END) AS syms, cnt
         |  FROM w${r - 1}, win$r win)""".stripMargin
    }.mkString(",\n")
    s"""toks AS (SELECT lower(tok) AS w FROM documents,
       |    unnest(string_split(text, ' ')) AS u(tok) WHERE len(tok) > 0),
       |w0 AS (SELECT w, list_append(
       |    list_transform(generate_series(1, len(w)), i -> substring(w, i, 1)),
       |    '</w>') AS syms, COUNT(*) AS cnt
       |  FROM toks GROUP BY w),
       |$rounds""".stripMargin
  }

  /** q58: BPE ENCODING replay — train exactly as q57 (the shared CTE
    * chain recomputes every merge winner from the data), then join each
    * document's words to the FINAL per-word segmentation w_k and sum
    * symbol counts: per-document BPE token counts under the trained
    * tokenizer, with zero constants embedded on either engine. */
  def q58Sql(k: Int): String =
    s"""WITH ${bpeCtes(k)},
       |doctoks AS (SELECT doc_id, lower(tok) AS w FROM documents,
       |    unnest(string_split(text, ' ')) AS u(tok) WHERE len(tok) > 0)
       |SELECT d.doc_id, CAST(SUM(len(s.syms)) AS BIGINT) AS n_tokens,
       |  CAST(COUNT(*) AS BIGINT) AS n_words
       |FROM doctoks d JOIN w$k s USING (w)
       |GROUP BY d.doc_id""".stripMargin

  /** q59: KMV distinct-count sketch replay (Sketch.kmvDistinct) — tokens
    * hashed by the rollHash + staged mix64 kernels, then per group the k-th
    * smallest DISTINCT hash in unsigned order (UBIGINT ascending IS unsigned
    * order) feeds the exact-integer estimate ⌊(k−1)·2^64 / kth⌋ in HUGEINT
    * floor division — [[graft.core.Kernels.kmvEst]] bit-for-bit, including
    * the Long.MaxValue cap and the divisor clamp. Groups with fewer than k
    * distinct hashes report their exact count (the sketch is lossless
    * there), matched by taking the row at rank LEAST(cnt, k). */
  def q59Sql(k: Int): String =
    s"""WITH toks AS (SELECT source, lower(tok) AS w FROM documents,
       |    unnest(string_split(text, ' ')) AS u(tok) WHERE len(tok) > 0),
       |fs AS (SELECT source, ${rollHash("w")} AS f FROM toks),
       |mx AS (SELECT source,
       |  ${mix64Cols("f", "h")}
       |  FROM fs),
       |d AS (SELECT DISTINCT source, h FROM mx),
       |r AS (SELECT source, h,
       |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rnk,
       |    COUNT(*) OVER (PARTITION BY source) AS cnt FROM d)
       |SELECT source AS grp, CAST(LEAST(cnt, $k) AS BIGINT) AS n_kept,
       |  CAST(CASE WHEN cnt < $k THEN CAST(cnt AS HUGEINT)
       |    ELSE LEAST(CAST(${k - 1} AS HUGEINT) * CAST(18446744073709551616 AS HUGEINT)
       |      // GREATEST(CAST(h AS HUGEINT), CAST(1 AS HUGEINT)),
       |      CAST(9223372036854775807 AS HUGEINT)) END AS BIGINT) AS est_distinct
       |FROM r WHERE rnk = LEAST(cnt, $k)""".stripMargin

  /** q60: context-window chunking replay (TextOps.chunkTokens) — chunk
    * starts are the integer sequence 0, step, 2·step, … < T; the chunk
    * payload is the exact token-array slice re-joined with single spaces.
    * list_slice is 1-based inclusive and end-clamping — matching Spark's
    * slice(arr, start+1, c). */
  def q60Sql(chunkSize: Int, overlap: Int): String = {
    val step = chunkSize - overlap
    s"""WITH toks AS (SELECT doc_id,
       |    list_filter(string_split(text, ' '), t -> len(t) > 0) AS tk
       |  FROM documents),
       |st AS (SELECT doc_id, tk,
       |    unnest(generate_series(0, len(tk) - 1, $step)) AS start
       |  FROM toks WHERE len(tk) > 0)
       |SELECT doc_id, CAST(start // $step AS BIGINT) AS chunk_id,
       |  CAST(start AS BIGINT) AS start,
       |  CAST(LEAST($chunkSize, len(tk) - start) AS BIGINT) AS n_tokens,
       |  array_to_string(list_slice(tk, start + 1, start + $chunkSize), ' ') AS chunk
       |FROM st""".stripMargin
  }

  /** q61: PII redaction replay (TextOps.redactPii/piiScan) — the SAME
    * pattern strings (Java-regex ∩ RE2 subset, parity-validated) run
    * through DuckDB's regexp_replace(…,'g') / regexp_extract_all. The
    * PII-bearing text is constructed deterministically from doc_id on
    * BOTH engines (the corpus text itself carries none). */
  def q61Sql: String = {
    val email = graft.operators.TextOps.EmailRx
    val ssn = graft.operators.TextOps.SsnRx
    val ip = graft.operators.TextOps.Ipv4Rx
    s"""WITH synth AS (SELECT doc_id,
       |    text || ' contact u' || CAST(doc_id AS VARCHAR) ||
       |    '@ex' || CAST(doc_id % 7 AS VARCHAR) || '.com ssn ' ||
       |    CAST(doc_id % 900 + 100 AS VARCHAR) || '-' ||
       |    CAST(doc_id % 90 + 10 AS VARCHAR) || '-' ||
       |    CAST(doc_id % 9000 + 1000 AS VARCHAR) || ' ip ' ||
       |    CAST(doc_id % 256 AS VARCHAR) || '.' ||
       |    CAST(doc_id * 7 % 256 AS VARCHAR) || '.' ||
       |    CAST(doc_id * 13 % 256 AS VARCHAR) || '.' ||
       |    CAST(doc_id * 31 % 256 AS VARCHAR) AS s
       |  FROM documents)
       |SELECT doc_id,
       |  regexp_replace(regexp_replace(regexp_replace(s,
       |    '$email', '<EMAIL>', 'g'), '$ssn', '<SSN>', 'g'),
       |    '$ip', '<IP>', 'g') AS red,
       |  CAST(len(regexp_extract_all(s, '$email')) AS BIGINT) AS n_email,
       |  CAST(len(regexp_extract_all(s, '$ssn')) AS BIGINT) AS n_ssn,
       |  CAST(len(regexp_extract_all(s, '$ip')) AS BIGINT) AS n_ip
       |FROM synth""".stripMargin
  }

  /** q62: heavy hitters (Sketch.heavyHitters) — the engine's Misra-Gries
    * two-pass output is exact counts of items at ≥ ppm frequency, so the
    * oracle is the straight GROUP BY / HAVING over first letters of the
    * tokens (the sketch only bounds WHICH items can matter; its residual
    * counts never reach the output). */
  def q62Sql(ppm: Long): String =
    s"""WITH toks AS (SELECT lower(tok) AS t FROM documents,
       |    unnest(string_split(text, ' ')) AS u(tok) WHERE len(tok) > 0),
       |v AS (SELECT substring(t, 1, 1) AS w FROM toks),
       |tot AS (SELECT COUNT(*) AS total FROM v)
       |SELECT w, CAST(COUNT(*) AS BIGINT) AS n
       |FROM v, tot GROUP BY w, tot.total
       |HAVING COUNT(*) * 1000000 >= tot.total * $ppm""".stripMargin

  /** q63: per-group heavy hitters (Sketch.heavyHittersByKey) — q62's
    * exact-output contract per source: GROUP BY (grp, w) with a per-group
    * total in the HAVING. */
  def q63Sql(ppm: Long): String =
    s"""WITH toks AS (SELECT source, lower(tok) AS t FROM documents,
       |    unnest(string_split(text, ' ')) AS u(tok) WHERE len(tok) > 0),
       |v AS (SELECT source AS grp, substring(t, 1, 1) AS w FROM toks),
       |tot AS (SELECT grp, COUNT(*) AS total FROM v GROUP BY grp)
       |SELECT v.grp, w, CAST(COUNT(*) AS BIGINT) AS n
       |FROM v JOIN tot USING (grp) GROUP BY v.grp, w, tot.total
       |HAVING COUNT(*) * 1000000 >= tot.total * $ppm""".stripMargin

  /** q65: unigram-LM surprisal replay (TextOps.unigramSurprisal) — the
    * integer floor-log2 surprisal `len(bin(total // cnt)) - 1` (bin prints
    * no leading zeros in either engine), summed per document, mean in
    * basis points by floor division. */
  def q65Sql: String =
    s"""WITH toks AS (SELECT doc_id, lower(tok) AS w FROM documents,
       |    unnest(string_split(text, ' ')) AS u(tok) WHERE len(tok) > 0),
       |cnts AS (SELECT w, COUNT(*) AS c FROM toks GROUP BY w),
       |tot AS (SELECT COUNT(*) AS n FROM toks),
       |sur AS (SELECT w, CAST(len(bin(CAST(n // c AS BIGINT))) - 1 AS BIGINT) AS s
       |  FROM cnts, tot)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       |  CAST(SUM(s) AS BIGINT) AS sum_surprisal,
       |  CAST((SUM(s) * 10000) // COUNT(*) AS BIGINT) AS mean_bp
       |FROM toks JOIN sur USING (w)
       |GROUP BY doc_id""".stripMargin

  /** q54: winnowing fingerprints (TextOps.winnowFingerprints, Schleimer et
    * al. SIGMOD'03) — word k-gram fp64 rolling hashes (the [[rollHash]]
    * replay, converted to SIGNED before the window min so the min order
    * matches Spark's signed longs), per-document window MIN over `wv`
    * consecutive gram hashes (full windows only, plus the truncated window
    * at pos 0 for short docs), distinct selected hashes joined back to
    * their first gram position. */
  def q54Sql(k: Int, wv: Int): String = {
    val gram = (0 until k).map(j => if (j == 0) "w[i]" else s"w[i + $j]").mkString(" || ' ' || ")
    s"""WITH words AS (SELECT doc_id,
       |    list_filter(string_split(lower(text), ' '), x -> len(x) > 0) AS w FROM documents),
       |grams AS (SELECT doc_id, i - 1 AS pos, $gram AS gram
       |  FROM words, unnest(generate_series(1, len(w) - ${k - 1})) AS t(i)
       |  WHERE len(w) >= $k),
       |gh AS (SELECT doc_id, pos, ${toSigned(rollHash("gram"))} AS h FROM grams),
       |st AS (SELECT doc_id, pos, h,
       |   COUNT(*) OVER (PARTITION BY doc_id) AS n_grams,
       |   MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
       |                ROWS BETWEEN CURRENT ROW AND ${wv - 1} FOLLOWING) AS minh
       |  FROM gh),
       |sel AS (SELECT DISTINCT doc_id, minh AS fp FROM st
       |        WHERE pos <= GREATEST(n_grams - $wv, 0)),
       |fpos AS (SELECT doc_id, h, MIN(pos) AS pos FROM gh GROUP BY doc_id, h)
       |SELECT s.doc_id, s.fp, CAST(f.pos AS BIGINT) AS pos
       |FROM sel s JOIN fpos f ON f.doc_id = s.doc_id AND f.h = s.fp""".stripMargin
  }
}
