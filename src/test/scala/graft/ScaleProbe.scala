package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale probe for the dedup operators' DEGENERATE regime: replicate the
  * sf0.1 documents table `mult`× with remapped ids but IDENTICAL text, so
  * every doc (and every line, and every k-gram) is duplicated mult× — the
  * heavy-duplication corpus where the span operators' survivor set outgrows
  * the broadcast cap and must take the shuffled-join fallback, and where
  * line/minhash dedup hit maximal group sizes.
  *
  * Run by hand (not part of `sbt test` — it is a multi-minute probe):
  *   sbt "Test/runMain graft.ScaleProbe [mult] [sfDir]"
  * Prints one line per operator: name, mult, rows, seconds. Compare runs at
  * mult=1 vs mult=8: the times should scale ~linearly in corpus size (the
  * fallback join is linear; nothing quadratic, nothing OOMs).
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(8)
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .appName("scale-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val docs = (0 until mult)
      .map(i => base.withColumn("doc_id",
        col("doc_id") + lit(i.toLong * 10_000_000L)))
      .reduce(_ union _)
      .repartition(8) // the single-file scan is 1 split — rebalance like
      .localCheckpoint(true) // SparkEntry.par does, or narrow passes serialize
    val n = docs.count()

    // optional 3rd arg: comma-separated probe names to run (default all)
    val only = args.drop(2).headOption
      .map(_.split(",").toSet).getOrElse(Set.empty[String])
    def probe(name: String)(df: => DataFrame): Unit =
      if (only.isEmpty || only(name)) {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"PROBE $name%-22s mult=$mult docs=$n time=$secs%.1fs")
      }

    // line dedup: every line duplicated mult x (and within-corpus repeats)
    probe("dedup_lines") {
      graft.ops.Dedup.dedupLines(docs.withColumn("text",
        regexp_replace(col("text"), "((\\S+ ){9}\\S+) ", "$1\n")))
    }
    // span trio in the survivor-heavy regime (k=60 grams, all duplicated)
    probe("duplicate_spans") {
      graft.ops.Dedup.duplicateSpans(docs, k = 60)
    }
    probe("span_ranges") {
      graft.ops.Dedup.duplicateSpanRanges(docs, k = 60)
    }
    probe("cut_spans") {
      graft.ops.Dedup.cutDuplicateSpans(docs, k = 60)
    }
    probe("minhash_lsh") {
      graft.ops.Dedup.minhashLsh(docs, threshold = 0.8)
    }
    // exact dedup under a CORPUS-HOT fingerprint: 90% of docs collapse to
    // one boilerplate text (the regime the old Window.partitionBy(_fp)
    // version dragged into a single task, text payload included). The
    // agg+join version map-side-combines the hot key and AQE skew-splits
    // the annotate join; time should scale ~linearly in mult.
    probe("exact_hot_fingerprint") {
      graft.ops.Dedup.exact(docs.withColumn("text",
        when(col("doc_id") % 10 === 0, col("text")).otherwise(
          lit("standard cookie consent boilerplate page body repeated " +
            "verbatim across the entire crawled corpus with no variation"))))
    }
    // and fully degenerate: EVERY doc identical — one fingerprint group of
    // size n; the 1-row group table broadcasts, so the text never shuffles
    probe("exact_all_identical") {
      graft.ops.Dedup.exact(docs.withColumn("text",
        lit("the one and only document body every row of this corpus shares")))
    }
    // the SHUFFLED-JOIN regime of the same fix: broadcast disabled, so the
    // annotate join is a sort-merge join with one corpus-hot key — the
    // regime AQE's skew split exists for (a window would have no escape)
    if (only.isEmpty || only("exact_hot_fp_shuffled")) {
      val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      probe("exact_hot_fp_shuffled") {
        graft.ops.Dedup.exact(docs.withColumn("text",
          when(col("doc_id") % 10 === 0, col("text")).otherwise(
            lit("standard cookie consent boilerplate page body repeated " +
              "verbatim across the entire crawled corpus with no variation"))))
      }
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    }
    // span decontamination with a pathologically LARGE "eval" set (the
    // replicated corpus itself): the eval gram table blows through the
    // broadcast cap, forcing the shuffled-equi-join fallback, and every
    // train gram matches — maximal cut volume
    probe("cut_contaminated") {
      graft.ops.Dedup.cutContaminatedSpans(docs, docs, k = 60)
    }

    // round-5 session-3 operators: PQ (embedding tier), DSIR + NB (token
    // tier). The replicated corpora scale the LINEAR term only — the PQ
    // codebooks, DSIR bucket tables, and NB model stay dimension-sized —
    // so times at mult=4 should stay ~4x mult=1, nothing quadratic.
    val embBase = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    val embs = (0 until mult)
      .map(i => embBase.withColumn("vec_id",
        col("vec_id") + lit(i.toLong * 10_000_000L)))
      .reduce(_ union _)
      .repartition(8)
      .localCheckpoint(true)
    probe("pq_train_encode") {
      val cb = graft.ops.Similarity.trainPqCodebooks(embs, m = 16, ksub = 16)
      graft.ops.Similarity.pqEncode(embs, cb)
    }
    if (only.isEmpty || only("pq_probe") || only("pq_probe_rerank")) {
      val cb = graft.ops.Similarity.trainPqCodebooks(embs, m = 16, ksub = 16)
      val enc = graft.ops.Similarity.pqEncode(embs, cb).localCheckpoint(true)
      val q = embBase.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("query_id"), col("embedding"))
      probe("pq_probe") {
        graft.ops.Similarity.pqProbe(q, enc, cb, k = 10)
      }
      probe("pq_probe_rerank") {
        graft.ops.Similarity.pqProbeRerank(q, enc, cb, embs, k = 10)
      }
      enc.unpersist(); cb.release()
    }
    // incremental curation against a replicated-corpus state: the state
    // indexes (fingerprints / lines / minhash) scale with mult, the
    // arriving batch stays FIXED (one sf0.1 corpus) — the deployment
    // shape where only the batch side should pay per-day cost. Time
    // should grow sub-linearly in mult (the state side is narrow index
    // rows; probe joins shuffle the batch).
    if (only.isEmpty || only("curate_batch")) {
      val state = graft.ops.Pipelines.initCorpusState(docs)
      val batch = base.withColumn("doc_id", col("doc_id") + lit(900_000_000L))
      val eval = base.filter(col("doc_id") % 97 === 0)
        .select("doc_id", "text")
      probe("curate_batch") {
        graft.ops.Pipelines.curateBatch(state, batch, eval,
          langs = Seq("en"), minQuality = 0.0, maxRepetition = 0.95,
          nearDupThreshold = 0.7, audit = false).chunks
      }
    }
    probe("filter_paragraphs") {
      graft.ops.TextAnalysis.filterParagraphs(docs.withColumn("text",
        regexp_replace(col("text"), "((\\S+ ){9}\\S+) ", "$1\n")),
        minWords = 8, minStopRatio = 0.1)
    }
    probe("dsir_weights") {
      graft.ops.TextAnalysis.dsirLogRatio(docs,
        docs.filter(col("doc_id") % 10 === 0))
    }
    probe("nb_train_classify") {
      val labeled = docs.withColumn("label",
        (col("doc_id") % 5).cast("string"))
      val m = graft.ops.TextAnalysis.trainNaiveBayes(labeled, "label",
        minCount = 2L)
      graft.ops.TextAnalysis.classifyNaiveBayes(labeled, m)
    }

    // round-5 session-4 operators. bm25: the query set stays FIXED as the
    // corpus replicates, so only the postings term is linear (tf table,
    // df count, candidate scoring); image_neardup replicates near-dup
    // GROUPS (remapped ids land in fresh groups of 4), so bucket sizes
    // stay constant and the pair stage scales linearly in image count.
    probe("bm25_topk") {
      val qs = base.filter(col("doc_id") < 3)
        .select(col("doc_id").as("query_id"),
          array_join(slice(filter(
            split(lower(trim(col("text"))), "\\s+"),
            tk => tk =!= ""), 1, 8), " ").as("text"))
      graft.ops.TextAnalysis.bm25TopK(docs, qs)
    }
    probe("image_neardup") {
      graft.ops.Multimodal.imageNearDups(
        graft.ops.Multimodal.imagesFromDocuments(docs), maxHamming = 6)
    }
    // classification over the replicated embedding store: the query set
    // and label space stay fixed, so knn is linear in corpus (scan term)
    // and rocchio is linear with a constant vote stage
    if (only.isEmpty || only("knn_classify") || only("centroid_classify")) {
      val lemb = embs.withColumn("label", (col("vec_id") % 7).cast("int"))
      val q = embBase.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("query_id"), col("embedding"))
      probe("knn_classify") {
        graft.ops.Similarity.knnClassify(q, lemb, k = 5)
      }
      probe("centroid_classify") {
        graft.ops.Similarity.centroidClassify(q,
          graft.ops.Similarity.centroidsAsArrays(
            graft.ops.Similarity.labelCentroids(lemb)))
      }
    }

    // round-6 batch-4 operators. triangle_counts: edges scale with mult
    // while the md5 vertex space scales TOO (9973·mult), holding density
    // constant — the regime where the degree-ordered wedge join should
    // stay ~linear in edge count (a fixed vertex space would densify and
    // grow triangles ~mult³, measuring the graph, not the operator).
    probe("triangle_counts") {
      val m = 9973L * mult
      graft.graph.GraphOps.triangleCounts(docs.select(
        (conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("long") % m).as("src"),
        (conv(substring(md5(concat(col("doc_id").cast("string"),
          lit(":t"))), 1, 8), 16, 10).cast("long") % m).as("dst")))
    }
    // auc_exact: the md5-fraction score sits on the 6-dp lattice, so the
    // prefix window runs over <= 1e6 NARROW aggregated rows however large
    // the corpus — time should be scan-dominated (linear)
    probe("auc_exact") {
      graft.ops.CorpusOps.aucExact(docs.select(col("doc_id"),
        round((conv(substring(md5(col("doc_id").cast("string")), 1, 8),
          16, 10).cast("double") / 4294967296.0), 6).as("score"),
        (col("doc_id") % 3 === 0).as("label")), "score", "label")
    }
    // pmi: the (prev, term) count table is vocabulary-sized and the
    // replicated corpus only scales the explode-agg term
    probe("pmi_collocations") {
      graft.ops.TextAnalysis.pmiCollocations(docs, k = 40, minCount = 5)
    }
    // snapshot diff: one full-outer equi-join of corpus vs mutated corpus
    probe("snapshot_diff") {
      graft.ops.Cdc.snapshotDiff(
        docs.filter(col("doc_id") % 7 =!= 0),
        docs.filter(col("doc_id") % 11 =!= 0).withColumn("text",
          when(col("doc_id") % 5 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text"))),
        Seq("doc_id"), Seq("text"))
    }
    // tf-idf cosine pairs: heavy-duplication worst case — every doc is
    // replicated mult x, so every candidate pair of the base corpus
    // becomes mult^2 pairs. The df cap must also scale (df multiplies
    // with the corpus) or blocking silently shuts off
    probe("tfidf_cosine_pairs") {
      graft.ops.TextAnalysis.tfidfCosinePairs(docs, threshold = 0.2,
        maxDocFreq = 1000 * mult, n = 3)
    }
    // merge: corpus-sized target vs corpus-sized source batch
    probe("merge_into") {
      graft.ops.Cdc.mergeInto(
        docs.filter(col("doc_id") % 7 =!= 0),
        docs.filter(col("doc_id") % 3 === 0).withColumn("text",
          concat(col("text"), lit(" v2"))),
        Seq("doc_id"), isDelete = col("doc_id") % 9 === 0)
    }
    // expectation suite: 4 row-local checks in one pass + unique +
    // referential anti-join
    probe("expectations") {
      import graft.ops.Profile.Expectation._
      graft.ops.Profile.checkExpectations(docs, Seq(
        NotNull("text"), InRange("doc_id", 0, 1e18),
        MatchesRegex("text", "\\S"), InSet("text", Seq("x")),
        Unique(Seq("doc_id")),
        RefersTo("doc_id", docs.filter(col("doc_id") % 2 === 0),
          "doc_id")))
    }
    // poisson bootstrap: one pass over rows x 32 replicates, one
    // bounded aggregate — should scale linearly in the corpus
    probe("poisson_bootstrap") {
      graft.ops.CorpusOps.poissonBootstrap(
        docs.withColumn("lab", col("doc_id") % 3)
          .withColumn("prd", col("doc_id") % 2),
        "doc_id", "lab", "prd", reps = 32)
    }
    // textrank: the corpus collapses to a vocabulary-sized pair graph
    // in one explode-agg; iteration cost is corpus-independent
    probe("textrank") {
      graft.ops.TextAnalysis.textRankKeywords(docs, k = 20,
        minCount = 2, maxIter = 20)
    }
    // blocked fuzzy join: self-ER against a mutated corpus copy. The
    // all-duplicated regime is the blocking worst case — every replica
    // of a doc shares its (band) block with every other replica, so
    // candidates grow mult^2 within blocks (like tfidf_cosine_pairs);
    // time should track the candidate count, never the cross product
    probe("fuzzy_join") {
      val lhs = docs.select(col("doc_id").as("l_id"),
        (length(col("text")) / 100).cast("int").as("l_band"),
        substring(col("text"), 1, 40).as("l_name"))
      val rhs = docs.select(col("doc_id").as("r_id"),
        (length(col("text")) / 100).cast("int").as("r_band"),
        regexp_replace(substring(col("text"), 1, 40), "a", "")
          .as("r_name"))
      graft.ops.Joins.blockedFuzzyJoin(lhs, rhs,
        Seq("l_band" -> "r_band"), "l_name", "r_name", threshold = 0.85)
    }
    // wordpiece: vocab derivation (bounded collect) + one narrow
    // mapPartitions encode pass — linear, memoized per partition
    probe("wordpiece_encode") {
      val vocab = graft.ops.Tokenize.wordPieceVocab(docs, topWords = 200)
      graft.ops.Tokenize.encodeWordPiece(docs, vocab)
    }
    // dp counts: one aggregate + codegen noise expression
    probe("dp_counts") {
      graft.ops.Profile.dpGroupCounts(
        docs.withColumn("grp", col("doc_id") % 50), Seq("grp"), 0.5)
    }
    // LPA over an md5-random graph whose VERTEX space scales with mult
    // (constant density — a fixed space would densify and measure the
    // graph, not the operator; the triangle_counts discipline)
    probe("label_propagation") {
      val nv = 97 * mult
      graft.graph.GraphOps.labelPropagation(docs.select(
        (conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("long") % nv).as("src"),
        (conv(substring(md5(concat(col("doc_id").cast("string"),
          lit(":t"))), 1, 8), 16, 10).cast("long") % nv).as("dst")),
        maxIter = 10)
    }
    // soft dedup: mult IS the duplication factor here (every text is
    // duplicated mult x), so survivors per group stay ~1 as mult grows
    probe("soft_dedup") {
      graft.ops.Dedup.softKeep(docs).filter(col("kept"))
    }
    // blocklist scaling in PHRASE count at fixed corpus: the theta-join
    // re-scans each doc once per phrase (linear in phrases), the
    // Aho-Corasick pass is one scan regardless — run both at
    // mult x 500 synthetic phrases and compare (probe names ac/theta)
    locally {
      import spark.implicits._
      lazy val phrases = ((1 to 500 * mult).map(i => s"nohit phrase $i")
        ++ Seq("hash join", "merge join")).toDF("phrase")
      probe("blocklist_ac") {
        graft.ops.CorpusOps.flagBlocklistedPhrasesAC(
          docs.select(col("doc_id"), col("text")), phrases)
      }
      probe("blocklist_theta") {
        graft.ops.CorpusOps.flagBlocklistedPhrases(
          docs.select(col("doc_id"), col("text")), phrases)
      }
    }
    // unimax: allocation is source-dimension work; APPLY's fan-out is
    // output-sized (epochs x corpus) — emitted rows, not overhead
    probe("unimax_apply") {
      val srcd = docs.withColumn("source", col("doc_id") % 20)
      graft.ops.CorpusOps.unimaxApply(srcd,
        graft.ops.CorpusOps.unimaxFromCorpus(srcd,
          budget = 500000L * mult, maxEpochs = 2))
    }
    // KMV overlap: two corpus-scale key sets reduce to 60-bit hashes;
    // the k-row head is constant-size whatever the corpus
    probe("overlap_estimate") {
      graft.ops.Sketches.overlapEstimate(
        docs.filter(col("doc_id") % 3 =!= 0),
        docs.filter(col("doc_id") % 2 === 0), "text", k = 256)
    }
    // round-7: the robust-stats DEFAULT (GK sketch) on an ALL-DISTINCT
    // doubles column — the regime exact `percentile` cannot survive (its
    // final merge holds every distinct value in one task's heap, growing
    // linearly in mult with no runtime escape). The sketch path keeps
    // task memory O(accuracy) whatever the cardinality, so time should
    // be scan-linear and memory flat across mult=1 -> 8.
    locally {
      lazy val distinctScores = docs.select(col("doc_id"),
        (conv(substring(md5(col("doc_id").cast("string")), 1, 12), 16, 10)
          .cast("double") / 281474976710656.0).as("score"))
      probe("mad_outliers_distinct") {
        graft.ops.CorpusOps.madOutliers(distinctScores, "score")
      }
      probe("quantile_bins_distinct") {
        graft.ops.CorpusOps.quantileBins(distinctScores, "score", k = 10)
      }
    }
    // hard negatives: bounded query set against the scaled corpus —
    // linear in corpus size (one broadcast BNLJ scan + per-query top-k)
    probe("hard_negatives") {
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val corpus = (0 until mult).map(i => emb.withColumn("vec_id",
        col("vec_id") + lit(i.toLong * 10_000_000L))).reduce(_ union _)
      val qs = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding"), col("label"))
      graft.ops.Similarity.hardNegatives(qs, corpus, k = 5)
    }
    // round-7e: integer covariance moments — the upper-triangle explode
    // is collapsed by map-side hash agg (2,080-entry buffer per task),
    // so time is scan-linear in mult and the shuffle stays
    // partitions x 2,080 tiny rows whatever the corpus size
    probe("emb_moments") {
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val corpus = (0 until mult).map(i => emb.withColumn("vec_id",
        col("vec_id") + lit(i.toLong * 10_000_000L))).reduce(_ union _)
      graft.ops.Similarity.embeddingMoments(corpus, dim = 64)
    }
    // round-9: the NSW graph-ANN tier. nCenters scales WITH mult so cell
    // size stays constant (the deployment discipline — cell-local kNN is
    // per-cell quadratic, so fixed cells + more of them = linear build),
    // the query set stays fixed, and search is run-exactly-N-hops beam
    // joins whose per-hop frontier is (queries x ef) — corpus size only
    // enters through the newly-reached-node vector fetch, so search time
    // should be ~scan-linear and recall@10 should HOLD as the corpus
    // and cell count grow (the gateway mesh grows as nCenters² but stays
    // tiny at these scales).
    if (only.isEmpty || only("nsw_search")) {
      val t0 = System.nanoTime()
      val nsw = graft.ops.Similarity.buildNswGraph(embs,
        nCenters = 16 * mult)
      nsw.edges.count() // force the pinned build
      val buildSecs = (System.nanoTime() - t0) / 1e9
      val q = embBase.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("query_id"), col("embedding"))
        .localCheckpoint(true)
      probe("nsw_search") {
        graft.ops.Similarity.nswSearch(q, nsw, embs, k = 10, ef = 32,
          hops = 3)
      }
      val got = graft.ops.Similarity.nswSearch(q, nsw, embs, k = 10,
          ef = 32, hops = 3)
        .select("query_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val exact = graft.ops.Similarity.bruteForceTopK(q, embs, k = 10)
        .select("query_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall =
        if (exact.isEmpty) 1.0
        else got.intersect(exact).size.toDouble / exact.size
      println(f"PROBE nsw_build_recall     mult=$mult " +
        f"build=$buildSecs%.1fs recall@10=$recall%.3f")
      nsw.release()
    }

    // round-9: index APPEND maintenance — the corpus-side index
    // replicates with mult, the arriving batch stays FIXED (one sf0.1
    // shard), so append time should stay ~flat in mult (assignment
    // scores batch x centroids; the union/pin is narrow index rows) —
    // the deployment claim that appends cost batch-side work only. The
    // postings append is the same shape over term rows (df merge is
    // vocabulary-sized, not corpus-sized).
    if (only.isEmpty || only("ivf_append") || only("bm25_append")) {
      val ivfBase = graft.ops.Similarity.buildIvfIndex(embs, nCenters = 16)
      val batch = embBase.withColumn("vec_id",
        col("vec_id") + lit(900_000_000L))
      // the appended artifacts pin corpus-sized checkpoints — release
      // them after each probe so later probes measure clean storage
      var ivfApp: graft.ops.Similarity.IvfIndex = null
      probe("ivf_append") {
        ivfApp = graft.ops.Similarity.ivfAppend(ivfBase, batch)
        ivfApp.cells
      }
      if (ivfApp != null) ivfApp.releaseDelta()
      ivfBase.release()
      val postBase = graft.ops.TextAnalysis.buildPostingsIndex(docs)
      val dbatch = base.withColumn("doc_id",
        col("doc_id") + lit(900_000_000L))
      var postApp: graft.ops.TextAnalysis.PostingsIndex = null
      probe("bm25_append") {
        postApp = graft.ops.TextAnalysis.appendPostingsIndex(postBase, dbatch)
        postApp.postings
      }
      if (postApp != null) postApp.releaseDelta()
      postBase.release()
    }

    // round-10: the remaining two append tiers. The graph tier's append
    // is one batch beam search (frontier = queries × ef) plus an
    // O(batch) new-edge dedup — after the r10 fix it never unions or
    // re-distincts the existing adjacency, so append time should stay
    // ~flat as the indexed corpus (and its edge table) grows with mult.
    if (only.isEmpty || only("nsw_append")) {
      val nswBase = graft.ops.Similarity.buildNswGraph(embs,
        nCenters = 16 * mult)
      nswBase.edges.count() // force the pinned build outside the probe
      val batch = embBase.filter(col("vec_id") % 100 === 0)
        .withColumn("vec_id", col("vec_id") + lit(900_000_000L))
        .localCheckpoint(true)
      var nswApp: graft.ops.Similarity.NswIndex = null
      probe("nsw_append") {
        nswApp = graft.ops.Similarity.nswAppend(nswBase, batch, embs)
        nswApp.edges
      }
      if (nswApp != null) nswApp.releaseDelta()
      nswBase.release()
    }
    // PQ tier: append = assign-to-cells + PQ-encode against the FROZEN
    // codebooks — both batch-sized (subvector scoring is batch ×
    // codebook entries); the union/pin term is the only index-sized
    // input and it is narrow code rows, so time should stay ~flat too.
    if (only.isEmpty || only("ivfpq_append")) {
      val pqBase = graft.ops.Similarity.buildIvfPqIndex(embs,
        nCenters = 16)
      val batch = embBase.withColumn("vec_id",
        col("vec_id") + lit(900_000_000L))
      var pqApp: graft.ops.Similarity.IvfPqIndex = null
      probe("ivfpq_append") {
        pqApp = graft.ops.Similarity.ivfPqAppend(pqBase, batch)
        pqApp.cells
      }
      if (pqApp != null) pqApp.releaseDelta()
      pqBase.release()
    }

    // round-10: drift reports on a growing index with a FIXED batch.
    // ivf_drift's index histogram is ONE map-side-combinable count over
    // the cells table — time should be ~scan-linear in mult with no
    // shuffle growth; bm25_drift's dictionary joins stream O(vocab)
    // (constant under replication — same text) so it should stay ~flat.
    if (only.isEmpty || only("ivf_drift")) {
      val ivfBase = graft.ops.Similarity.buildIvfIndex(embs, nCenters = 16)
      val batch = embBase.withColumn("vec_id",
        col("vec_id") + lit(900_000_000L))
      probe("ivf_drift") {
        graft.ops.Similarity.indexDriftReport(ivfBase, batch)
      }
      ivfBase.release()
    }
    if (only.isEmpty || only("bm25_drift")) {
      val postBase = graft.ops.TextAnalysis.buildPostingsIndex(docs)
      val dbatch = base.withColumn("doc_id",
        col("doc_id") + lit(900_000_000L))
      probe("bm25_drift") {
        graft.ops.TextAnalysis.postingsDriftReport(postBase, dbatch)
      }
      postBase.release()
    }

    // round-7e: normalize/winsorize DEFAULTS (GK sketch) on the same
    // all-distinct doubles regime as the robust-stats probes — task
    // memory O(accuracy) whatever the cardinality; time scan-linear
    probe("normalize_winsorize_distinct") {
      val distinctScores = docs.select(col("doc_id"),
        (conv(substring(md5(col("doc_id").cast("string")), 1, 12), 16, 10)
          .cast("double") / 281474976710656.0).as("score"))
      graft.ops.CorpusOps.winsorize(
        graft.ops.CorpusOps.normalizeScores(distinctScores, "score",
          method = "robust").withColumnRenamed("norm", "robust_norm"),
        "score")
    }
    spark.stop()
  }
}
