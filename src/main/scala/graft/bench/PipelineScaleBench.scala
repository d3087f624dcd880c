package graft.bench

import org.apache.spark.sql.SparkSession

/** Scaling measurement of the Bronze→Silver→Gold PIPELINE itself
  * (VERDICT r11 #2): the battery families carry nine BENCH_SCALE
  * campaigns, but the ETL path — the reference-parity workload — was
  * only ever measured at 1× (418,676 rows). This main generates the
  * [[OffTsvGen]] TSV at 1×/10×/100× the reference scale and runs the
  * full pipeline per decade with per-stage laps, so the scale story
  * covers the one path that had none.
  *
  * Method mirrors [[graft.Bench]]'s pipeline block: the timed span is
  * CSV scan → silver (materialized to parquet, like the reference's
  * silver write) → all six gold tables (materialized) → metrics → the
  * six reference analytic queries through the noop sink; input
  * generation is untimed. Two full runs per decade, min kept (the
  * first doubles as the warm pass). Suspect stages named by SURVEY
  * §7.4 — the SK assignment windows and the clean-chain regex stack —
  * get their own lap lines so a bend is attributable, not just
  * visible.
  *
  * Emits the per-decade table to stdout and merges
  * `x200_pipeline` / `x201_pipe_silver` / `x202_pipe_gold` rows into
  * BENCH_SCALE.json (same key convention as [[ScaleBench]]).
  */
object PipelineScaleBench {

  private def fmt(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/tmp/graft_pipescale")
    // optional section filter: "all" (default) | "pipeline" | "ab" | "abfile"
    val section = args.lift(1).getOrElse("all")
    def runSection(s: String): Boolean = section == "all" || section == s
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val scales = Seq(("p1x", 1L), ("p10x", 10L), ("p100x", 100L))
    scales.foreach { case (g, mult) =>
      val tsv = s"$base/$g/off"
      if (!BenchFs.exists(spark, tsv)) {
        System.err.println(s"[pipescale] generating $tsv (${mult}x)")
        OffTsvGen.generate(spark, tsv, rows = OffTsvGen.ReferenceRows * mult)
      }
    }

    /** One full pipeline run; returns (total, silver, gold, metrics+queries). */
    def runOnce(g: String, mult: Long): (Double, Double, Double, Double) = {
      graft.CacheReset(spark)
      val tsv = s"$base/$g/off"
      val silverPath = s"$base/$g/silver"
      val t0 = System.nanoTime()
      val bronze = graft.ingest.Ingest.bronzeCsv(spark, tsv)
      val silver = graft.pipeline.OffPipeline.silver(bronze)
      silver.write.mode("overwrite").parquet(silverPath)
      val t1 = System.nanoTime()
      val silverBack = spark.read.parquet(silverPath)
      val gold = graft.pipeline.OffPipeline.goldMaterialized(silverBack, (name, df) => {
        val p = s"$base/$g/gold_$name"
        df.write.mode("overwrite").parquet(p)
        spark.read.parquet(p)
      })
      val t2 = System.nanoTime()
      // rowsIn must track the decade's actual input size — the unscaled
      // constant would silently mis-state rowsIn/rowsRejected at 10x/100x
      graft.metrics.Metrics.compute(
        silverBack, OffTsvGen.ReferenceRows * mult, 0L, 0L)
      val fact = gold("fact_nutrition_snapshot"); val product = gold("dim_product")
      val brand = gold("dim_brand"); val category = gold("dim_category")
      val time = gold("dim_time")
      import graft.analytics.OffQueries
      Seq(
        OffQueries.q1TopBrandsAbShare(fact, product, brand),
        OffQueries.q2GradeByCategory(fact, product, category),
        OffQueries.q3CountryCategorySugar(fact, product, category),
        OffQueries.q4CompletenessByBrand(fact, product, brand),
        OffQueries.q5Anomalies(fact, product, brand),
        OffQueries.q6WeeklyCompleteness(fact, time)
      ).foreach(_.write.format("noop").mode("overwrite").save())
      val t3 = System.nanoTime()
      ((t3 - t0) / 1e9, (t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9)
    }

    val rows = if (!runSection("pipeline")) Seq.empty else scales.map { case (g, mult) =>
      val a = runOnce(g, mult)
      val b = runOnce(g, mult)
      val best = if (b._1 <= a._1) b else a
      System.err.println(f"[pipescale] $g: total=${best._1}%.2fs " +
        f"silver=${best._2}%.2fs gold=${best._3}%.2fs queries=${best._4}%.2fs " +
        f"(runs ${a._1}%.2f/${b._1}%.2f)")
      (g, mult, best)
    }

    // A/B of the silver stage alone: reference-parity multiLine scan vs
    // the splittable fast path (Ingest.bronzeCsvSplittable — quote-parity
    // guard + multiLine=false). The guard pass is INSIDE the timed span:
    // the fast path must win including its own proof, or it isn't a win.
    def silverLap(g: String, splittable: Boolean): Double = {
      graft.CacheReset(spark)
      val tsv = s"$base/$g/off"
      val t0 = System.nanoTime()
      val bronze =
        if (splittable) graft.ingest.Ingest.bronzeCsvSplittable(spark, tsv)
        else graft.ingest.Ingest.bronzeCsv(spark, tsv)
      graft.pipeline.OffPipeline.silver(bronze)
        .write.mode("overwrite").parquet(s"$base/$g/silver_ab")
      (System.nanoTime() - t0) / 1e9
    }
    val abRows = if (!runSection("ab")) Seq.empty else scales.map { case (g, _) =>
      val ml = math.min(silverLap(g, splittable = false), silverLap(g, splittable = false))
      val sp = math.min(silverLap(g, splittable = true), silverLap(g, splittable = true))
      System.err.println(f"[pipescale] $g silver A/B: multiLine=$ml%.2fs splittable=$sp%.2fs " +
        f"(${ml / sp}%.2fx)")
      (g, ml, sp)
    }

    // SINGLE-FILE A/B — the reference's real input shape (ONE TSV dump,
    // docs/readme.md): with files < cores the multiLine scan is the
    // one-task bottleneck the splittable path exists to break. The
    // 32-file layout above deliberately CANNOT show this (32 files
    // saturate 32 cores either way — that A/B isolates the parser-mode
    // cost alone). Run at 1x/10x; the 100x single-file multiLine lap
    // would be one task parsing 12 GB (~30+ min) — the point is made
    // at 10x without burning the bench budget.
    val abFileRows = if (!runSection("abfile")) Seq.empty else
      scales.take(2).map { case (g, _) =>
        val one = s"$base/$g/off_onefile"
        if (!BenchFs.exists(spark, one)) {
          System.err.println(s"[pipescale] coalescing $g to a single file")
          spark.read.option("header", "true").option("sep", "\t")
            .option("quote", "\"").option("escape", "\"")
            .option("multiLine", "true").csv(s"$base/$g/off")
            .coalesce(1).write.mode("overwrite")
            .option("sep", "\t").option("header", "true").csv(one)
        }
        def lap(splittable: Boolean): Double = {
          graft.CacheReset(spark)
          val t0 = System.nanoTime()
          val bronze =
            if (splittable) graft.ingest.Ingest.bronzeCsvSplittable(spark, one)
            else graft.ingest.Ingest.bronzeCsv(spark, one)
          graft.pipeline.OffPipeline.silver(bronze)
            .write.mode("overwrite").parquet(s"$base/$g/silver_ab1")
          (System.nanoTime() - t0) / 1e9
        }
        val ml = math.min(lap(false), lap(false))
        val sp = math.min(lap(true), lap(true))
        System.err.println(f"[pipescale] $g SINGLE-FILE silver A/B: " +
          f"multiLine=$ml%.2fs splittable=$sp%.2fs (${ml / sp}%.2fx)")
        (g, ml, sp)
      }

    // merge into BENCH_SCALE.json under the ScaleBench key convention
    val jsonFile = java.nio.file.Paths.get("BENCH_SCALE.json")
    val existing: Map[String, String] = if (java.nio.file.Files.exists(jsonFile)) {
      val txt = new String(java.nio.file.Files.readAllBytes(jsonFile), "UTF-8")
      """"([qx]\d+\w*)"\s*:\s*(\{[^}]*\})""".r.findAllMatchIn(txt)
        .map(m => m.group(1) -> m.group(2)).toMap
    } else Map.empty
    def by(sel: ((Double, Double, Double, Double)) => Double): String = {
      val m = rows.map { case (g, _, t) => g -> sel(t) }.toMap
      s"""{"t1x":${fmt(m("p1x"))},"t10x":${fmt(m("p10x"))},"t100x":${fmt(m("p100x"))}}"""
    }
    def byAb(sel: ((String, Double, Double)) => Double): String = {
      val m = abRows.map(r => r._1 -> sel(r)).toMap
      s"""{"t1x":${fmt(m("p1x"))},"t10x":${fmt(m("p10x"))},"t100x":${fmt(m("p100x"))}}"""
    }
    def byAbFile(sel: ((String, Double, Double)) => Double): String = {
      val m = abFileRows.map(r => r._1 -> sel(r)).toMap
      s"""{"t1x":${fmt(m("p1x"))},"t10x":${fmt(m("p10x"))}}"""
    }
    val merged = existing ++
      (if (rows.nonEmpty) Map(
        "x200_pipeline" -> by(_._1),
        "x201_pipe_silver" -> by(_._2),
        "x202_pipe_gold" -> by(_._3),
        "x203_pipe_queries" -> by(_._4)) else Map.empty) ++
      (if (abRows.nonEmpty) Map(
        "x204_silver_multiline" -> byAb(_._2),
        "x205_silver_splittable" -> byAb(_._3)) else Map.empty) ++
      (if (abFileRows.nonEmpty) Map(
        "x206_silver1f_multiline" -> byAbFile(_._2),
        "x207_silver1f_splittable" -> byAbFile(_._3)) else Map.empty)
    val json = merged.toSeq.sortBy(_._1)
      .map { case (n, v) => s""""$n":$v""" }.mkString("{", ",", "}")
    java.nio.file.Files.write(jsonFile, (json + "\n").getBytes("UTF-8"))

    println("| decade | rows | total (s) | silver (s) | gold (s) | metrics+queries (s) | rows/s |")
    println("|---|---|---|---|---|---|---|")
    rows.foreach { case (g, mult, (tot, sil, gol, q)) =>
      val n = OffTsvGen.ReferenceRows * mult
      println(f"| $g | $n | ${fmt(tot)} | ${fmt(sil)} | ${fmt(gol)} | ${fmt(q)} | ${(n / tot).toLong} |")
    }
    println("\n| decade | layout | silver multiLine (s) | silver splittable (s) | speedup |")
    println("|---|---|---|---|---|")
    abRows.foreach { case (g, ml, sp) =>
      println(f"| $g | 32 files | ${fmt(ml)} | ${fmt(sp)} | ${ml / sp}%.2fx |")
    }
    abFileRows.foreach { case (g, ml, sp) =>
      println(f"| $g | 1 file | ${fmt(ml)} | ${fmt(sp)} | ${ml / sp}%.2fx |")
    }
    spark.stop()
  }
}
