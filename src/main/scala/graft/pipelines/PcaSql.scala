package graft.pipelines

/** The emb04 DuckDB oracle (round 13, VERDICT r12 #6 — the last
  * `no_oracle` row): a bit-exact SQL replay of the ENTIRE PCA/whitening
  * pipeline, eigensolve included.
  *
  * The hard part is [[graft.functions.SymEigen]]'s cyclic Jacobi: 2016
  * rotations per sweep, each reading the matrix the previous rotation
  * wrote — inherently sequential state. Since round 14 it replays as a
  * RECURSIVE CTE over SWEEPS whose step folds the sweep's 2016
  * rotations with `list_reduce` over the (p,q) schedule; the fold
  * accumulator is ONE FLAT DOUBLE[8192] list (matrix ‖ eigenvector
  * accumulator, the latter stored TRANSPOSED since round 16 — see the
  * rot comment; VERDICT r15 #3 oracle-cost item). Each fold
  * application is exactly one rotation with the same IEEE ops in the
  * same order as the Scala loop (theta → t → c → s with
  * correctly-rounded sqrt/divide; indexed-CASE column pass over the
  * matrix half, then the row pass reading the column pass's values
  * via contiguous row slices, then vT's two rows from the original
  * accumulator), and the sweep boundary re-evaluates the off-diagonal
  * fold in the recursion's WHERE — Scala's
  * `while (sweep < 30 && off > tol)` literally. Measured bit-exact:
  * full final matrix AND accumulator match the sequential reference
  * 4096+4096/8192 elements through 9 data-dependent sweeps on an SPD
  * probe, and the emitted (vec_id, y0..y7, var_kept_frac) table
  * matches Spark's output bit-for-bit at both gate SFs — re-verified
  * after the round-16 transpose (same hashes; only the storage walk
  * changed).
  *
  * Why a fold instead of the round-13 per-rotation recursion: a
  * recursive-CTE step pays row materialization, the cross joins and
  * (worst) ~0.2-0.5 ms per `[x]`-binding level EVERY rotation — the
  * measured floor was ~8 ms/rotation, 131-148 s per oracle run at
  * 16,128 rotations, the ONE oracle over check_oracle.py's 60 s
  * budget and the prime suspect for the driver's empty
  * CORRECTNESS_r13.json. Folding a whole sweep into one recursion
  * step amortizes all of that: ~3.5 ms/rotation, ~55 s per run —
  * inside the budget with the SAME Scala trajectory (hashes
  * unchanged).
  *
  * Engineering notes from the build (kept so the next recursive
  * oracle doesn't rediscover them — the round-13 lateral notes are in
  * git history; these supersede them):
  *  - DuckDB 1.0.0 `list_reduce` has no initial-value overload: the
  *    accumulator TYPE must equal the element type. The (p,q)
  *    schedule therefore rides as 2-element DOUBLE lists prepended
  *    after the 8192-double state (list_prepend(state, els)).
  *  - `list_reduce` accumulators MUST stay flat lists of scalars: a
  *    STRUCT-of-nested-lists accumulator silently zeroes after the
  *    second application and segfaults at ~500; a DOUBLE[][] (nested
  *    rows) accumulator corrupts as soon as `[x]`-binding levels wrap
  *    transforms of it once total child data crosses the 2048 vector
  *    size (bit-exact at d=16/32, zeroed at d=48/64). Flat DOUBLE[]
  *    accumulators with struct `[x]`-bindings are solid — verified
  *    through 18k+ fold applications.
  *  - Binding levels inside the fold lambda cost ~0.3-0.5 ms each
  *    (the captured 8192-list appears to be re-materialized per
  *    level): five bare-scalar levels measured 7.4 ms/rotation vs
  *    3.45 ms for the two-level shape (one struct for p/q/skip/c/s,
  *    one for the column-pass intermediate). Keep exactly two.
  *  - LATERAL joins are NOT the only CSE: a 1-element
  *    `list_transform([expr], x -> body)` binds expr once. Inside
  *    recursive-CTE steps laterals cost ~5 ms each; inside folds they
  *    are unavailable — the [x]-binding is the only option and it is
  *    cheap enough at two levels.
  *  - `list_dot_product(a, b)` is a plain in-order fold — bit-equal
  *    to `acc += a(i)*b(i)` loops (verified at 64/65/1000 elements) —
  *    usable wherever a sequential dot is replayed.
  *  - A lambda body can only reference outer columns when the list
  *    argument itself is correlated, and `1.0`/`0.0` literals in a
  *    bare `list(...)` type as DECIMAL(2,1) and silently quantize —
  *    both still true from round 13.
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
  private val DD = D * D
  private val NP = D * (D - 1) / 2 // 2016 rotations per sweep
  private val K8 = 8
  private val Scale = "65536.0"
  private val Scale2 = "4294967296.0"

  val sql: String = {
    // one rotation inside the fold: acc[1..4096] = matrix (row-major),
    // acc[4097..8192] = eigenvector accumulator stored TRANSPOSED
    // (vT row-major — round 16, VERDICT r15 #3: v only ever receives
    // COLUMN updates (v(k,p), v(k,q) for all k — SymEigen.rotate's
    // third loop), so storing vT turns them into two CONTIGUOUS row
    // slices and the indexed-CASE column pass shrinks to the matrix
    // half alone; acc[8193] carries the sweep's SKIP THRESHOLD (the
    // SymEigen threshold-Jacobi lockstep — most of this round's
    // measured win: worked rotations drop 16,128 → ~8.7k). Combined
    // effect measured on the real corpus: 49-51 s → 38-42 s per
    // oracle run (DuckDB shows ±15% run-to-run variance on this
    // workload, so treat single samples with suspicion). The
    // per-element expressions are untouched and the skip rule is
    // replayed exactly, so the trajectory stays bit-exact — verified
    // against an independent float64 replica of the Scala loop
    // (8193/8193 elements bitwise through 5 threshold sweeps on an
    // SPD probe, 3 deterministic runs) and hash-green at the gate
    // SFs. Two binding levels: cs (p/q/skip/c/s) and m1 (the matrix
    // column pass — 4096 elements).
    val pp = "el[1]::BIGINT"
    val qq = "el[2]::BIGINT"
    val apq = s"acc[($pp) * $D + ($qq) + 1]"
    val theta =
      s"((acc[($qq) * $D + ($qq) + 1] - acc[($pp) * $D + ($pp) + 1])" +
        s" / (2.0 * $apq))"
    val tt =
      s"""(CASE WHEN $theta >= 0
         |      THEN 1.0 / ($theta + sqrt($theta * $theta + 1.0))
         |      ELSE -1.0 / (-$theta + sqrt($theta * $theta + 1.0)) END)""".stripMargin
    // THRESHOLD skip (round 16, lockstep with SymEigen): the sweep's
    // threshold off/d (SymEigen.scala:59) rides the accumulator as
    // acc[8193]; a pivot
    // with |apq| <= threshold is skipped — Scala's
    // `if (math.abs(apq) > thresh)` negated exactly. Engineering
    // findings of this round's build (the r15 notes' tradition):
    //  - the skip branch must return acc[1 : 8193], NOT `acc`:
    //    returning the fold's accumulator argument ALIASED from the
    //    lambda is nondeterministic in DuckDB 1.0 once skips are
    //    frequent (garbage elements appear run-to-run; measured
    //    8058/8192 run-to-run mismatches aliased vs 0 with the
    //    full-length slice, which forces a copy at ~no cost);
    //  - a fold lambda must NOT reference outer recursion columns
    //    (j.thr) — also nondeterministic; the threshold must ride IN
    //    the accumulator;
    //  - the per-sweep threshold refresh rides the schedule as a
    //    SENTINEL element [0,0] appended after the 2016 pivots
    //    (detected by p = q): wrapping the list_reduce in an
    //    [x]-binding to recompute it corrupts (the r15 nested-wrap
    //    finding), and the sentinel's indices must be IN-BOUNDS
    //    because CASE branches evaluate eagerly inside fold lambdas
    //    (a [-1,-1] sentinel also corrupted).
    val cs =
      s"""struct_pack(p := $pp, q := $qq, skip := abs($apq) <= acc[${2 * DD + 1}],
         |      c := 1.0 / sqrt($tt * $tt + 1.0),
         |      s := $tt * (1.0 / sqrt($tt * $tt + 1.0)))""".stripMargin
    val colpass =
      s"""list_transform(acc[1 : $DD], (x, ix) ->
         |      CASE WHEN ((ix - 1) % $D) = cs.p THEN cs.c * x - cs.s * acc[ix - cs.p + cs.q]
         |      WHEN ((ix - 1) % $D) = cs.q THEN cs.s * acc[ix - cs.q + cs.p] + cs.c * x
         |      ELSE x END)""".stripMargin
    // row pass touches only matrix rows p and q (contiguous slices of
    // m1); vT rows p and q rebuild from the ORIGINAL acc (v's column
    // update reads pre-rotation v — SymEigen.rotate's third loop)
    val rot =
      s"""list_transform([$cs], cs ->
         |      CASE WHEN cs.skip THEN acc[1 : ${2 * DD + 1}] ELSE
         |      list_transform([$colpass], m1 ->
         |        m1[1 : cs.p * $D] ||
         |        list_transform(m1[cs.p * $D + 1 : cs.p * $D + $D], (x, jx) ->
         |          cs.c * x - cs.s * m1[cs.q * $D + jx]) ||
         |        m1[cs.p * $D + $D + 1 : cs.q * $D] ||
         |        list_transform(m1[cs.q * $D + 1 : cs.q * $D + $D], (x, jx) ->
         |          cs.s * m1[cs.p * $D + jx] + cs.c * x) ||
         |        m1[cs.q * $D + $D + 1 : $DD] ||
         |        acc[$DD + 1 : $DD + cs.p * $D] ||
         |        list_transform(acc[$DD + cs.p * $D + 1 : $DD + cs.p * $D + $D], (x, jx) ->
         |          cs.c * x - cs.s * acc[$DD + cs.q * $D + jx]) ||
         |        acc[$DD + cs.p * $D + $D + 1 : $DD + cs.q * $D] ||
         |        list_transform(acc[$DD + cs.q * $D + 1 : $DD + cs.q * $D + $D], (x, jx) ->
         |          cs.s * acc[$DD + cs.p * $D + jx] + cs.c * x) ||
         |        acc[$DD + cs.q * $D + $D + 1 : ${2 * DD + 1}])[1] END)[1]""".stripMargin
    // off-diagonal norm in Scala's exact summation order (i-outer,
    // j>i inner over the flat row-major walk; lower/diagonal cells add
    // +0.0 which is bit-neutral on a non-negative accumulator) — the
    // same fold the earlier rounds proved bit-exact, parameterized
    // over WHICH matrix list it reads
    def offOver(matList: String): String =
      s"""sqrt(list_reduce(list_prepend(0.0, list_transform($matList, (ov, ix) ->
         |      CASE WHEN ((ix - 1) % $D) > ((ix - 1) // $D) THEN ov * ov ELSE 0.0 END)),
         |      (oacc, x) -> oacc + x))""".stripMargin
    val frobexpr =
      s"""sqrt(list_reduce(list_prepend(0.0, list_transform(m, fv -> fv * fv)),
         |      (acc, x) -> acc + x))""".stripMargin
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
       |els AS MATERIALIZED (SELECT list([CAST(p AS DOUBLE), CAST(q AS DOUBLE)]
       |    ORDER BY r) || [[0.0, 0.0]] AS e FROM pq),
       |jac AS (
       |  SELECT 0::BIGINT AS sweep,
       |    m || vm || [${offOver("m")} / $D.0] AS acc,
       |    1e-11 * greatest(1.0, $frobexpr) AS tol
       |  FROM a0
       |  UNION ALL
       |  SELECT j.sweep + 1,
       |    list_reduce(list_prepend(j.acc, elx.e), (acc, el) ->
       |      CASE WHEN ($pp) = ($qq)
       |        THEN acc[1 : ${2 * DD}] ||
       |          [${offOver(s"acc[1 : $DD]")} / $D.0]
       |        ELSE $rot END),
       |    j.tol
       |  FROM jac j
       |  CROSS JOIN els elx
       |  WHERE j.sweep < 30 AND j.acc[${2 * DD + 1}] * $D.0 > j.tol
       |),
       |fin AS MATERIALIZED (SELECT acc[1 : $DD] AS m, acc[$DD + 1 : ${2 * DD}] AS vm
       |  FROM jac ORDER BY sweep DESC LIMIT 1),
       |eig AS MATERIALIZED (SELECT r.i AS src,
       |    (SELECT m FROM fin)[r.i * $D + r.i + 1] AS lam FROM rng r),
       |ord AS MATERIALIZED (SELECT src, lam,
       |    ROW_NUMBER() OVER (ORDER BY lam DESC, src ASC) AS rnk FROM eig),
       |vrow AS MATERIALIZED (SELECT o.rnk, o.lam,
       |    (SELECT vm FROM fin)[o.src * $D + 1 : o.src * $D + $D] AS row
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
