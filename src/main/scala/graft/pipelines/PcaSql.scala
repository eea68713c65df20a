package graft.pipelines

/** The emb04 DuckDB oracle (round 13, VERDICT r12 #6 — the last
  * `no_oracle` row): a bit-exact SQL replay of the ENTIRE PCA/whitening
  * pipeline, eigensolve included.
  *
  * The hard part is [[graft.functions.SymEigen]]'s cyclic Jacobi: 2016
  * rotations per sweep, each reading the matrix the previous rotation
  * wrote — inherently sequential state. It replays as ONE RECURSIVE CTE
  * whose working row carries the 64×64 matrix and the eigenvector
  * accumulator as flat DOUBLE[4096] lists; each recursion step applies
  * exactly one (p,q) rotation with the same IEEE ops in the same order
  * as the Scala loop (theta → t → c → s with correctly-rounded
  * sqrt/divide; column pass, then row pass reading the column pass's
  * values, then the accumulator's column pass), and the sweep gate
  * re-evaluates the off-diagonal fold only at sweep boundaries (the
  * WHERE's CASE — Scala's `while (sweep < 30 && off > tol)`). Measured
  * bit-exact: the full final matrix AND accumulator match a reference
  * replay 4096/4096 elements at sf0.001 and sf0.01 (16,128 rotations =
  * 8 data-dependent sweeps), and the emitted (vec_id, y0..y7,
  * var_kept_frac) table matches Spark's output bit-for-bit at both
  * gate SFs.
  *
  * Engineering notes from the build (kept here so the next recursive
  * oracle doesn't rediscover them):
  *  - DuckDB inlines plain CTEs — every consumer of `fin` would re-run
  *    the 16k-step recursion; all non-recursive CTEs are MATERIALIZED
  *    (the ann03 lesson, again).
  *  - LATERAL joins inside the recursive term cost ~1.7 ms each per
  *    step (~27 s per lateral over 16k steps); the rotation keeps only
  *    three (theta; c/s; the column-pass intermediate) and the row
  *    pass is list-slice surgery (contiguous rows p and q), not a
  *    4096-element lambda.
  *  - A lambda body can only reference outer columns when the list
  *    argument itself is correlated (hence the (el, ix) form over the
  *    state list instead of `range(...)`).
  *  - `1.0`/`0.0` literals in a bare `list(...)` type as DECIMAL(2,1)
  *    and silently quantize the identity matrix — the accumulator's
  *    anchor casts every element to DOUBLE explicitly.
  *  - Runtime is ~2.2 min at the gate SF (round 14: 157.6 → 131.5 s
  *    measured, bit-identical) — the price of 16,128 sequential
  *    rotations through a SQL engine; corpus-size-independent (the
  *    matrix is d×d regardless of rows), and the moments/projection
  *    stages are the only corpus-touching passes. This is the ONE
  *    oracle over check_oracle.py's 60 s single-query budget — the
  *    committed per-round correctness artifact is the mitigation if a
  *    driver-side timeout ever zeroes the round again.
  *  - Round-14 optimization findings (what worked and what
  *    exploded, measured at 2016 rotations/sweep):
  *      the per-step floor is the LATERAL/join machinery (~8 ms),
  *      not the list math (the two 4096-element transforms cost
  *      ~1.5 ms together; carrying two 32 KB lists through the
  *      recursion costs 0.4 ms). Replacing the 2016-row pq JOIN with
  *      a 1-row MATERIALIZED array lookup saved ~20%. Everything
  *      more aggressive REGRESSED: inlining the theta→t→c/s chain
  *      into the lambdas (DuckDB inlines lateral projections into
  *      every reference, so the sqrt chain re-evaluates per element),
  *      merging the two scalar laterals (the inlined theta tree costs
  *      more than a lateral), and a single 9-arm analytic transform
  *      with scalar-index extracts in the arms (123 ms/step — CASE
  *      arms evaluate over the full vector, so heavy corner arms pay
  *      4096×). The laterals ARE the engine's only CSE — keep them.
  *
  * The moment pass replays [[graft.functions.GramMatrixAgg]] exactly:
  * `CAST(floor(x·2^16 + 0.5) AS BIGINT)` is Math.round, the per-cell
  * sums are exact integers (DuckDB SUM(BIGINT) → HUGEINT ≡ the
  * aggregate's 128-bit cells), and each cell converts to double once.
  * Dimension d = 64 and k = 8 are the fixture's embedding shape
  * (the Spark side reads d from the data; the oracle replays the
  * corpus it checks).
  */
private[pipelines] object PcaSql {
  private val D = 64
  private val NP = D * (D - 1) / 2 // 2016 rotations per sweep
  private val K8 = 8
  private val Scale = "65536.0"
  private val Scale2 = "4294967296.0"

  val sql: String = {
    val pass1m =
      s"""CASE WHEN cs.skip THEN j.m ELSE
         |    list_transform(j.m, (el, ix) ->
         |      CASE WHEN ((ix - 1) % $D) = cs.p THEN cs.c * el - cs.s * j.m[ix - cs.p + cs.q]
         |      WHEN ((ix - 1) % $D) = cs.q THEN cs.s * j.m[ix - cs.q + cs.p] + cs.c * el
         |      ELSE el END) END""".stripMargin
    val mfin =
      s"""CASE WHEN cs.skip THEN j.m ELSE
         |    m1.v[1 : cs.p*$D] ||
         |    list_transform(m1.v[cs.p*$D + 1 : cs.p*$D + $D], (el, ix) -> cs.c * el - cs.s * m1.v[cs.q*$D + ix]) ||
         |    m1.v[cs.p*$D + $D + 1 : cs.q*$D] ||
         |    list_transform(m1.v[cs.q*$D + 1 : cs.q*$D + $D], (el, ix) -> cs.s * m1.v[cs.p*$D + ix] + cs.c * el) ||
         |    m1.v[cs.q*$D + $D + 1 : ${D * D}] END""".stripMargin
    val vtrans =
      s"""CASE WHEN cs.skip THEN j.vm ELSE
         |    list_transform(j.vm, (el, ix) ->
         |      CASE WHEN ((ix - 1) % $D) = cs.p THEN cs.c * el - cs.s * j.vm[ix - cs.p + cs.q]
         |      WHEN ((ix - 1) % $D) = cs.q THEN cs.s * j.vm[ix - cs.q + cs.p] + cs.c * el
         |      ELSE el END) END""".stripMargin
    val offexpr =
      s"""sqrt(list_reduce(list_prepend(0.0, list_transform(j.m, (ov, ix) ->
         |      CASE WHEN ((ix - 1) % $D) > ((ix - 1) // $D) THEN ov * ov ELSE 0.0 END)),
         |      (acc, x) -> acc + x))""".stripMargin
    val frobexpr =
      s"""sqrt(list_reduce(list_prepend(0.0, list_transform(m, fv -> fv * fv)),
         |      (acc, x) -> acc + x))""".stripMargin
    val tt =
      s"""(CASE WHEN cs0.theta >= 0 THEN 1.0 / (cs0.theta + sqrt(cs0.theta * cs0.theta + 1.0))
         |      ELSE -1.0 / (-cs0.theta + sqrt(cs0.theta * cs0.theta + 1.0)) END)""".stripMargin
    // rotation coordinates via a 1-row MATERIALIZED array pair instead
    // of a per-step 2016-row join (round 14: measured ~0.7 ms/step —
    // ~12 s over the 16k rotations; arithmetic untouched)
    val pa = s"pqx.pl[(j.step % $NP)::INT + 1]::BIGINT"
    val qa = s"pqx.ql[(j.step % $NP)::INT + 1]::BIGINT"
    val ys = (0 until K8)
      .map(r => s"MAX(CASE WHEN rnk = ${r + 1} THEN y END) AS y$r")
      .mkString(",\n  ")
    s"""WITH RECURSIVE
       |em AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |qz AS MATERIALIZED (SELECT vec_id,
       |  list_transform(v, x -> CAST(floor(x * $Scale + 0.5) AS BIGINT)) AS codes FROM em),
       |nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM qz),
       |rng AS MATERIALIZED (SELECT unnest(generate_series(0, ${D - 1})) AS i),
       |ms AS MATERIALIZED (SELECT r.i AS i, SUM(codes[r.i + 1]) AS s
       |  FROM qz CROSS JOIN rng r GROUP BY r.i),
       |mu AS MATERIALIZED (SELECT list((CAST(s AS DOUBLE) / (SELECT n FROM nn)) / $Scale
       |  ORDER BY i) AS mu FROM ms),
       |gr AS MATERIALIZED (SELECT a.i AS i, b.i AS j, SUM(codes[a.i + 1] * codes[b.i + 1]) AS g
       |  FROM qz CROSS JOIN rng a CROSS JOIN rng b WHERE b.i >= a.i GROUP BY a.i, b.i),
       |cvu AS MATERIALIZED (SELECT i, j,
       |    (CAST(g AS DOUBLE) / (SELECT n FROM nn)) / $Scale2
       |    - (SELECT mu FROM mu)[i + 1] * (SELECT mu FROM mu)[j + 1] AS e
       |  FROM gr),
       |cvf AS MATERIALIZED (SELECT i, j, e FROM cvu
       |  UNION ALL SELECT j AS i, i AS j, e FROM cvu WHERE i <> j),
       |a0 AS MATERIALIZED (SELECT
       |    (SELECT list(e ORDER BY i * $D + j) FROM cvf) AS m,
       |    (SELECT list(CAST(CASE WHEN a.i = b.i THEN 1 ELSE 0 END AS DOUBLE)
       |       ORDER BY a.i * $D + b.i) FROM rng a CROSS JOIN rng b) AS vm),
       |pq AS MATERIALIZED (SELECT ROW_NUMBER() OVER (ORDER BY a.i, b.i) - 1 AS r,
       |    a.i AS p, b.i AS q
       |  FROM rng a JOIN rng b ON b.i > a.i),
       |pqarr AS MATERIALIZED (SELECT list(p ORDER BY r) AS pl,
       |    list(q ORDER BY r) AS ql FROM pq),
       |jac AS (
       |  SELECT 0::BIGINT AS step, m, vm,
       |    1e-14 * greatest(1.0, $frobexpr) AS tol
       |  FROM a0
       |  UNION ALL
       |  SELECT j.step + 1, $mfin, $vtrans, j.tol
       |  FROM jac j
       |  CROSS JOIN pqarr pqx
       |  CROSS JOIN LATERAL (SELECT $pa AS p0, $qa AS q0,
       |      abs(j.m[($pa)*$D + ($qa) + 1]) = 0.0 AS skip,
       |      ((j.m[($qa)*$D + ($qa) + 1] - j.m[($pa)*$D + ($pa) + 1]) /
       |       (2.0 * j.m[($pa)*$D + ($qa) + 1])) AS theta) cs0
       |  CROSS JOIN LATERAL (SELECT cs0.p0 AS p, cs0.q0 AS q, cs0.skip AS skip,
       |      (1.0 / sqrt($tt * $tt + 1.0)) AS c,
       |      ($tt * (1.0 / sqrt($tt * $tt + 1.0))) AS s) cs
       |  CROSS JOIN LATERAL (SELECT $pass1m AS v) m1
       |  WHERE CASE WHEN j.step % $NP <> 0 THEN j.step < $NP*30
       |        ELSE $offexpr > j.tol AND j.step < $NP*30 END
       |),
       |fin AS MATERIALIZED (SELECT m, vm FROM jac ORDER BY step DESC LIMIT 1),
       |eig AS MATERIALIZED (SELECT r.i AS src,
       |    (SELECT m FROM fin)[r.i * $D + r.i + 1] AS lam FROM rng r),
       |ord AS MATERIALIZED (SELECT src, lam,
       |    ROW_NUMBER() OVER (ORDER BY lam DESC, src ASC) AS rnk FROM eig),
       |vrow AS MATERIALIZED (SELECT o.rnk, o.lam,
       |    (SELECT list((SELECT vm FROM fin)[r.i * $D + o.src + 1] ORDER BY r.i)
       |       FROM rng r) AS row
       |  FROM ord o),
       |sg AS MATERIALIZED (SELECT rnk,
       |    CASE WHEN best < 0 THEN -1.0 ELSE 1.0 END AS sgn FROM (
       |    SELECT v.rnk, v.row[bj.j] AS best,
       |      ROW_NUMBER() OVER (PARTITION BY v.rnk
       |        ORDER BY abs(v.row[bj.j]) DESC, bj.j ASC) AS brn
       |    FROM vrow v CROSS JOIN
       |      (SELECT unnest(generate_series(1, $D)) AS j) bj) WHERE brn = 1),
       |vals AS MATERIALIZED (SELECT list(lam ORDER BY rnk) AS vals FROM ord),
       |vfrac AS MATERIALIZED (SELECT
       |    CASE WHEN vartot > 0 THEN varkept / vartot ELSE 0.0 END AS var_kept_frac
       |  FROM (
       |    SELECT list_reduce(list_prepend(0.0, (SELECT vals FROM vals)),
       |        (a, b) -> a + b) AS vartot,
       |      list_reduce(list_prepend(0.0, (SELECT vals FROM vals)[1 : $K8]),
       |        (a, b) -> a + b) AS varkept)),
       |lm AS MATERIALIZED (SELECT greatest((SELECT vals FROM vals)[1], 0.0) AS lmax),
       |wrows AS MATERIALIZED (SELECT v.rnk, list_transform(v.row, x ->
       |      (CASE WHEN s.sgn < 0 THEN -x ELSE x END) *
       |      (CASE WHEN v.lam > 1e-12 * lm.lmax
       |            THEN 1.0 / sqrt(v.lam) ELSE 0.0 END)) AS w
       |  FROM vrow v JOIN sg s USING (rnk) CROSS JOIN lm WHERE v.rnk <= $K8),
       |proj AS MATERIALIZED (SELECT em.vec_id, w.rnk,
       |    list_reduce(list_prepend(0.0, list_transform(em.v, (x, t) ->
       |      w.w[t] * (x - mc.mu[t]))), (a, b) -> a + b) AS y
       |  FROM em CROSS JOIN wrows w CROSS JOIN mu mc)
       |SELECT vec_id,
       |  $ys,
       |  (SELECT var_kept_frac FROM vfrac) AS var_kept_frac
       |FROM proj GROUP BY vec_id""".stripMargin
  }
}
