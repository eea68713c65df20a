package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression guards: correctness tests prove WHAT a
  * query returns; these prove it computes it with the plan that
  * survives a 100x scale-up (SURVEY §5). A future edit that silently
  * turns a broadcast star join into a nested loop, un-pushes a
  * parquet filter, or adds an unplanned shuffle fails here instead of
  * in the next round's bench.
  */
class PlanSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.spark

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  private def count(p: String, marker: String): Int =
    marker.r.findAllIn(p).size

  test("bucketed fact tables join and aggregate with zero exchanges") {
    import org.apache.spark.sql.functions.{col, sum}
    // pre-bucketed fact-fact join: the write-time shuffle is the only
    // shuffle this key ever pays — join AND the same-key aggregate
    // must plan with no Exchange at all (broadcast disabled so the
    // tiny test tables can't cheat the proof)
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.saveBucketed(
        Tables.load(spark, sf, "orders")
          .select(col("o_orderkey").as("k"), col("o_totalprice")),
        "bk_orders_t", "k", 8)
      Tables.saveBucketed(
        Tables.load(spark, sf, "lineitem")
          .select(col("l_orderkey").as("k"), col("l_quantity")),
        "bk_li_t", "k", 8)
      val j = spark.table("bk_orders_t").join(spark.table("bk_li_t"), "k")
        .groupBy("k").agg(sum("l_quantity").as("q"))
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        s"expected a co-located join:\n$p")
      assert(!p.contains("Exchange"), s"bucketed join planned a shuffle:\n$p")
      // and it computes the same thing as the unbucketed plan
      val plain = Tables.load(spark, sf, "orders")
        .select(col("o_orderkey").as("k"))
        .join(Tables.load(spark, sf, "lineitem")
          .select(col("l_orderkey").as("k"), col("l_quantity")), "k")
        .groupBy("k").agg(sum("l_quantity").as("q"))
      assert(j.except(plain).count() == 0 && plain.except(j).count() == 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.sql("DROP TABLE IF EXISTS bk_orders_t")
      spark.sql("DROP TABLE IF EXISTS bk_li_t")
    }
  }

  test("q20 HLL: sketches merge map-side, one exchange of 256-byte state") {
    val p = plan("q20_approx_distinct")
    // the whole point of the register sketch: partial_hll_estimate
    // BEFORE the exchange means each task ships two 256-byte register
    // arrays per group, never rows
    assert(p.contains("partial_hll_estimate"),
      s"HLL must partial-aggregate map-side:\n$p")
    assert(count(p, "Exchange") == 1, s"q20 wants exactly one exchange:\n$p")
  }

  test("dd12 bloom: bounded scans, broadcast bitmap, sketch path never shuffles") {
    val p = plan("dd12_bloom_dedup")
    // three scans since round 8: bitmap aggregate, distinct-seen-keys
    // build for the exact-audit hash join (the r7 single-agg
    // collect_set form was an O(n·m) broadcast-array scan — see the
    // dd12 scaladoc), probe side; the single-row bitmap broadcasts
    assert(count(p, "Scan parquet") <= 3, s"extra corpus scans:\n$p")
    assert(p.contains("partial_bloom_bits"),
      s"bloom bitmap must partial-aggregate map-side:\n$p")
    assert(p.contains("BroadcastExchange"), s"aux row must broadcast:\n$p")
    // the SKETCH path must not shuffle the corpus; the audit join may
    // (hash join at scale) but broadcasts at this size
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"probe must not shuffle the corpus at this scale:\n$p")
  }

  test("dd13 exact substring: bounded exchanges, windows reuse the doc partitioning") {
    val p = plan("dd13_exact_substring")
    // the HASH path's exploded (doc, pos, hash) rows shuffle exactly
    // twice — once by hash for the duplicate-count window, once by
    // doc_id, with every run/island window + aggregate downstream
    // reusing the doc_id partitioning. The round-8 byte-exact VERIFY
    // adds dup-mass-bounded exchanges (gram-equality window + per-doc
    // recount), and its flagged-position set joins the token arrays as
    // a BROADCAST at this scale — the corpus must never shuffle for
    // the verify, so the non-broadcast exchange count stays ≤ 4 and
    // corpus scans stay ≤ 3 (hash pass, verify token pass, base)
    val shuffles = count(p, "Exchange") - count(p, "BroadcastExchange")
    assert(shuffles <= 4, s"dd13 wants <= 4 shuffles, got $shuffles:\n$p")
    assert(count(p, "Scan parquet") <= 3, s"extra corpus scans:\n$p")
  }

  test("ann03 IVF probe: broadcast hash join on the list id, no cartesian") {
    val p = plan("ann03_knn_ivf")
    // the probe set (queries x NProbe lists) broadcasts; corpus rows
    // join it on the cluster key — never a nested loop over vectors
    assert(p.contains("BroadcastHashJoin"), s"probe must broadcast:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"ann03 must not plan an all-pairs join:\n$p")
  }

  test("q08 star join: dims broadcast, no nested loop, facts shuffle once") {
    val p = plan("q08_join_star")
    assert(p.contains("BroadcastHashJoin"), "dims must broadcast")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
  }

  test("q02 filter reaches the parquet scan as pushed filters") {
    val p = plan("q02_filter")
    assert("PushedFilters: \\[[^\\]]".r.findAllIn(p).nonEmpty,
      "predicate did not push into the scan")
  }

  test("q17 global sort+limit plans as TakeOrderedAndProject") {
    val p = plan("q17_sort_limit")
    assert(p.contains("TakeOrderedAndProject"),
      "order-by+limit must not global-sort")
  }

  test("q33 uses the custom bounded-heap top-k operator") {
    val p = plan("q33_topk_custom")
    assert(p.contains("TopKPerGroup"), "custom exec node missing from plan")
    assert(!p.contains("Window"), "fell back to a window sort")
  }

  test("tx05 per-doc top-3 heaps on TopKPerGroup; window only re-ranks it") {
    val p = plan("tx05_keyterms")
    assert(p.contains("TopKPerGroup"), s"custom top-k missing:\n$p")
    // the window that re-derives rank must sit directly on the heap
    // output (<=3 rows/doc, already clustered by doc_id) — an Exchange
    // between them would mean the corpus-sized table reshuffled for a
    // full window sort
    val winIdx = p.indexOf("Window")
    val topIdx = p.indexOf("TopKPerGroup")
    assert(winIdx >= 0 && topIdx > winIdx, s"window must wrap the heap:\n$p")
    assert(!p.substring(winIdx, topIdx).contains("Exchange"),
      s"rank window reshuffled the heap output:\n$p")
  }

  test("pk02 chunking is shuffle-free") {
    val p = plan("pk02_chunk_split")
    assert(count(p, "Exchange") == 0,
      s"bounded chunk fan-out must ride the scan:\n$p")
  }

  test("dd10 corpus picks ride the bounded-heap top-k, joins broadcast") {
    val p = plan("dd10_temperature_mix")
    // the corpus-wide path must be the TopKPerGroup heaps (langs x
    // budget rows shuffle, never the table); the quota table joins by
    // broadcast; the only Window ops run over the picked/quota rows
    assert(p.contains("TopKPerGroup"), s"custom top-k missing:\n$p")
    assert(!p.contains("SortMergeJoin"), s"quota join must broadcast:\n$p")
  }

  test("dd01 exact dedup is a single-shuffle hash aggregate") {
    val p = plan("dd01_dedup_exact")
    assert(count(p, "Exchange") <= 2, s"unexpected extra shuffles:\n$p")
    assert(!p.contains("SortAggregate"), "string min forced a sort agg")
  }

  test("dd07 decontamination broadcasts the benchmark index, corpus never shuffles") {
    val p = plan("dd07_decontaminate")
    assert(p.contains("BroadcastExchange"), "benchmark index must broadcast")
    // the only shuffle belongs to building the bounded benchmark-side
    // index (explode+distinct over ~2% of docs); the corpus side must
    // be shuffle-free — with one shuffle on the bench side and its
    // single-row agg, total exchanges stay <= 3
    assert(count(p, "Exchange") - count(p, "BroadcastExchange") <= 3,
      s"corpus side picked up a shuffle:\n$p")
    assert(!p.contains("SortMergeJoin"))
  }

  test("mm02 frame sampling is shuffle-free") {
    val p = plan("mm02_frame_sample")
    assert(count(p, "Exchange") == 0, s"1->N fan-out must ride the scan:\n$p")
  }

  test("tx04 fingerprinting is shuffle-free") {
    val p = plan("tx04_fingerprint")
    assert(count(p, "Exchange") == 0, s"per-doc hashing must ride the scan:\n$p")
  }

  test("emb01 quantization is shuffle-free") {
    val p = plan("emb01_int8_quant")
    assert(count(p, "Exchange") == 0, s"per-vector math must ride the scan:\n$p")
  }

  test("emb02 centroid aggregates natively with a map-side partial") {
    val p = plan("emb02_label_centroid")
    // vec_lsum is an ObjectHashAggregate (TypedImperativeAggregate);
    // partial_vec_lsum before the exchange is the 100 TB property —
    // each task ships one array per label, never the corpus
    assert(p.contains("ObjectHashAggregate"), s"native agg missing:\n$p")
    assert(p.contains("partial_vec_lsum"), s"no map-side partial:\n$p")
    assert(count(p, "Exchange") == 1, s"centroid needs exactly one shuffle:\n$p")
    // treeString renders the generator as "Generate posexplode(...)";
    // the node must sit ABOVE (before, in top-down print order) the
    // aggregate, i.e. explode AFTER aggregation at execution time
    assert(p.contains("Generate "), s"posexplode node missing:\n$p")
    assert(p.indexOf("Generate ") < p.indexOf("ObjectHashAggregate"),
      "posexplode must run AFTER aggregation (print order: above it)")
  }

  test("tx10 filter funnel is shuffle-free") {
    val p = plan("tx10_filter_funnel")
    assert(count(p, "Exchange") == 0, s"per-doc rules must ride the scan:\n$p")
  }

  test("emb05 final pass is a map + broadcast size join, no centroid join") {
    val p = plan("emb05_kmeans")
    // assignment must be the codegen'd expression riding the scan —
    // a relational argmin would show a join/explode against a
    // centroid table here
    assert(p.toLowerCase.contains("nearestcentroid"),
      s"native assignment expression missing:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"size join must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("Cartesian"),
      s"unexpected heavy join:\n$p")
    // one shuffle (the K-row size aggregate) + its broadcast — the
    // corpus itself never exchanges
    assert(count(p, "Exchange") <= 3, s"too many exchanges:\n$p")
  }

  test("emb06 final pass: native assignment, broadcast centroids, no cartesian") {
    // optimization r17: emb06 materializes the assignment pass once
    // (three consumers re-paid it), so the DECLARED frame's plan reads
    // the checkpoint. The assignment-shape pins move to the factored
    // assignment pass itself; the final pass must read the
    // materialized rows and still never go cartesian.
    val pa = graft.pipelines.Embeddings
      .emb06Assigned(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(pa.toLowerCase.contains("nearestcentroid"),
      s"native assignment expression missing:\n$pa")
    assert(pa.contains("BroadcastHashJoin"),
      s"K-row centroid join must broadcast:\n$pa")
    assert(!pa.contains("Cartesian"), s"unexpected cartesian:\n$pa")
    val p = plan("emb06_semdedup")
    assert(p.toLowerCase.contains("existingrdd"),
      s"final pass should read the materialized assignment:\n$p")
    assert(!p.contains("Cartesian"), s"unexpected cartesian:\n$p")
  }

  test("ann05's SQ8 rank fold rewrites to the native dot product") {
    // the mixed double·long fold must hit RewriteZipWithDot — an
    // interpreted per-pair lambda here is the exact hot-loop regression
    // the rule exists to prevent
    val p = SparkEntry.queries("ann05_knn_sq8")(spark, sf)
      .queryExecution.optimizedPlan.toString
    assert("(?i)vecdot".r.findAllIn(p).nonEmpty,
      s"SQ8 rank fold fell back to an interpreted lambda:\n${p.take(2000)}")
  }

  test("dd09 at shuffle scale: identical winnow branches collapse to reused exchanges") {
    // at 100 TB the fp self-join's two sides, the two hot-list
    // subtrees, and the two verify probes are each one corpus pass
    // UNLESS Spark reuses the identical exchanges — broadcast disabled
    // so the tiny fixture plans the same shuffles production would
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = SparkEntry.queries("dd09_passage_overlap")(spark, sf)
      df.collect() // AQE reuse is visible in the final adaptive plan
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("ReusedExchange") || p.contains("ReusedQueryStage"),
        s"dd09 self-join recomputes the winnow pass per branch:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("AQE splits a skewed shuffle-join partition at runtime") {
    // SURVEY §5 leans on AQE skew-join for hot keys at 100 TB; prove
    // the session config actually fires. One key holds ~90% of the
    // left side; with broadcast off and the skew thresholds scaled to
    // test size, the post-execution adaptive plan must show the hot
    // partition split (isSkew=true reads), not one straggler task.
    import org.apache.spark.sql.functions._
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val left = spark.range(0, 300000).select(
        when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id")).as("k"),
        col("id").as("payload"))
      val right = spark.range(0, 1000).select(
        col("id").as("k"), (col("id") * 2).as("v"))
      val joined = left.join(right, "k")
      // execute THIS dataframe's own QueryExecution — count()/write()
      // build separate plan trees and would leave `joined`'s adaptive
      // plan un-finalized (isFinalPlan=false, no skew info)
      joined.queryExecution.toRdd.count()
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.toLowerCase.contains("skew"),
        s"AQE skew handling did not fire:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("pk01 packing never global-sorts: windows are per-shard") {
    val p = plan("pk01_seq_pack")
    assert(!p.contains("rangepartitioning"),
      s"global sort leaked into the packing plan:\n$p")
    assert(count(p, "Exchange") == 1,
      s"one hash shuffle on shard expected:\n$p")
  }

  test("q38 salted join: SMJ keys carry the salt; the hot key spreads ~S-fold") {
    val p = plan("q38_skew_salted_join")
    val smj = p.linesIterator.find(_.contains("SortMergeJoin"))
    assert(smj.isDefined, s"salted join must not degrade to broadcast:\n$p")
    assert(smj.get.contains("salt"),
      s"join keys must include the salt:\n${smj.get}")
    // the spread the salt buys, measured: max rows behind one join
    // key falls ~S× (40% of docs share lang='en' unsalted)
    import org.apache.spark.sql.functions.{col, hash, lit, max, pmod}
    val d = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("lang"),
        pmod(hash(col("doc_id")), lit(16)).as("salt"))
    val maxPlain = d.groupBy("lang").count()
      .agg(max("count")).head.getLong(0)
    val maxSalted = d.groupBy("lang", "salt").count()
      .agg(max("count")).head.getLong(0)
    assert(maxSalted * 8 <= maxPlain,
      s"salting should spread the hot key: plain=$maxPlain salted=$maxSalted")
  }

  test("dd15 incremental probe: delta broadcasts, base index streams, no cartesian") {
    // the query result is checkpointed (plans as an RDD scan), so pin
    // the pre-checkpoint probe plan the exposed hook returns
    val (frame, st) = graft.pipelines.Dedup.incrementalProbe(spark, sf)
    val p = frame.queryExecution.executedPlan.toString
    st.unpersist(blocking = false)
    // the (band, sig) probe must be a broadcast join with the BATCH
    // on the broadcast side — at a 100 TB base the stored index can
    // only ever stream
    assert(p.contains("BroadcastHashJoin"),
      s"delta-signature probe must broadcast:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"unkeyed join leaked into the probe:\n$p")
  }

  test("ann12 hybrid: lexical-leg stats broadcast, corpus never cartesians") {
    val p = plan("ann12_hybrid_rrf")
    // the df table and the query tf-vectors are tiny corpus-level
    // aggregates — both must broadcast onto the streaming (doc, term)
    // rows; the fused window runs over per-query frames only
    assert(count(p, "BroadcastHashJoin") >= 2,
      s"df/query-tf joins must broadcast:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"unkeyed join leaked into the hybrid plan:\n$p")
  }

  test("cdc19 SCD2: both windows reuse one pk partitioning, no joins") {
    val p = plan("cdc19_scd2_history")
    // lead() and the version row_number() both partition by pk — the
    // second window must ride the first's exchange, and a history
    // materialization has no business joining anything
    assert(count(p, "Exchange") == 1,
      s"one pk hash shuffle expected, windows must share it:\n$p")
    assert(!p.contains("Join"), s"unexpected join in SCD2 plan:\n$p")
  }

  test("tx21 dsir: score table broadcasts onto the feature rows") {
    val p = plan("tx21_dsir")
    // the B-bucket score table and the 1-row corpus totals must reach
    // the exploded feature table as broadcasts — a shuffle join there
    // re-partitions the corpus' whole n-gram explosion at 100 TB
    assert(count(p, "BroadcastHashJoin") >= 1,
      s"score join must broadcast:\n$p")
    assert(count(p, "BroadcastNestedLoopJoin|BroadcastExchange") >= 2,
      s"corpus totals must broadcast:\n$p")
    // only the final per-doc assembly may merge-join; the feature
    // path itself must never sort-merge
    assert(count(p, "SortMergeJoin") <= 1,
      s"feature-path join degraded to a shuffle join:\n$p")
  }

  test("tx19 pii redaction is shuffle-free") {
    val p = plan("tx19_pii_redact")
    assert(count(p, "Exchange") == 0,
      s"inject+count+scrub must ride the scan:\n$p")
  }

  test("dd17 url dedup: one canonical shuffle, both windows share it") {
    val p = plan("dd17_url_dedup")
    // group_n and the max-id keeper both partition by canon — one
    // hash exchange, no join (the keeper is a window, not a self-join)
    assert(count(p, "Exchange") == 1,
      s"one canon hash shuffle expected:\n$p")
    assert(!p.contains("Join"), s"unexpected join in url-dedup plan:\n$p")
  }

  test("tx20 classifier: map-side partial agg, scoring never re-shuffles") {
    val p = plan("tx20_quality_classifier")
    // the (doc) margin agg must combine map-side before its exchange
    assert(p.contains("partial_count") || p.contains("partial count") ||
      count(p, "HashAggregate") >= 2,
      s"margin agg must have a partial phase:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"unkeyed join leaked into the classifier plan:\n$p")
    // doc-keyed agg + the base join: bounded exchange count
    assert(count(p, "Exchange") - count(p, "BroadcastExchange") <= 3,
      s"classifier picked up extra shuffles:\n$p")
  }

  test("emb09 hard negatives: anchors broadcast, corpus streams") {
    val p = plan("emb09_hard_negatives")
    assert(p.contains("BroadcastExchange"),
      s"the 10-anchor frame must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the corpus side must never shuffle for the join:\n$p")
    // one shuffle only: the per-anchor top-k window
    assert(count(p, "Exchange") - count(p, "BroadcastExchange") <= 1,
      s"extra corpus shuffle:\n$p")
  }

  test("ing04 replay: the quarantine re-fetch is a broadcast semi join") {
    val p = SparkEntry.queries("ing04_quarantine_replay")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      s"re-fetch must broadcast the quarantine id set:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the changelog side must not shuffle for the re-fetch:\n$p")
  }

  test("q40 match_recognize: one key exchange carries windows, runs and the run join") {
    // the pattern scan's scale claim: every window (lag, boundary sum,
    // run cut), the run aggregation AND the down→up run self-join ride
    // the ONE user_id hash partitioning — HashPartitioning(user_id)
    // satisfies clustering on (user_id, run_id) (subset rule), so a
    // 100 TB event log pattern-matches in a single shuffle pass.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = plan("q40_match_recognize")
      assert(count(p, "Exchange hashpartitioning") == 1,
        s"expected exactly one key exchange:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("dd18 containment: both self-join sides are hot-shingle-capped") {
    // VERDICT r12 #1: the candidate generator must never run an
    // uncapped shingle self-join (one boilerplate 3-gram in 10⁶ docs
    // is 10¹² join rows). Pin on the OPTIMIZED LOGICAL plan of the
    // LAZY frame (the query itself returns an eager checkpoint, which
    // reads back as a LogicalRDD with no joins to inspect): the two
    // self-join inputs are separate subtrees, each must contain the
    // df-cap anti-join; exact verify then reads the stored hash sets.
    val q = graft.pipelines.Dedup
      .containmentPairs(spark, sf, materialize = false)
    val opt = q.queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.logical.Join
    import org.apache.spark.sql.catalyst.plans.{LeftAnti, Inner}
    val selfJoins = opt.collect {
      // the candidate self-join: the only Inner join whose BOTH sides
      // contain a LeftAnti (the hot-shingle drop) below them
      case j: Join if j.joinType == Inner &&
        j.left.collect { case a: Join if a.joinType == LeftAnti => a }.nonEmpty &&
        j.right.collect { case a: Join if a.joinType == LeftAnti => a }.nonEmpty => j
    }
    assert(selfJoins.nonEmpty,
      s"no capped self-join found — the anti-join guard is gone:\n$opt")
    val antis = opt.collect { case a: Join if a.joinType == LeftAnti => a }
    assert(antis.size >= 2,
      s"both self-join sides must anti-join the hot list:\n$opt")
    // and the exact verify reads array_intersect over the stored sets
    assert(opt.toString.contains("array_intersect"),
      s"exact verify must come from stored shingle sets:\n$opt")
  }

  test("cdc33 avro wire: encode and decode both ride the scan, zero exchanges") {
    // the real-wire round trip is per-record map work — at 100 TB its
    // cost must be the scan, never a shuffle; an Exchange appearing
    // here means someone materialized or repartitioned the wire frame
    val p = plan("cdc33_avro_wire")
    assert(count(p, "Exchange") == 0,
      s"wire encode+decode must ride the scan:\n$p")
    // both object boundaries are present: the fixture encode's
    // serialize and the decode flatMap's deserialize
    assert(p.contains("MapPartitions") || p.contains("SerializeFromObject"),
      s"expected the object-codec stages in the plan:\n$p")
  }
}
