package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Plan receipts for the r15 optimization round — NOT part of the gated
  * surface. The three operators optimized this round all truncate their
  * final explain at localCheckpoint boundaries, so the per-QUERY plan
  * dumps (PlanDump) cannot show what changed inside the loops. This
  * probe dumps the changed INTERNAL fragment in both forms — the
  * before-form reconstructed inline exactly as the pre-`6433a81`/
  * `1a2ac19` source had it (labeled; the A/B seconds and row-identity
  * diffs in OPTIMIZATION_r15.md are the primary evidence, these are the
  * plan-shape receipts) — into plans/r15 fragment_before/after files.
  * `sbt "runMain graft.tools.R15Receipts [sfDir] [outDir]"` */
object R15Receipts {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = java.nio.file.Paths.get(
      if (args.length > 1) args(1) else "plans/r15")
    java.nio.file.Files.createDirectories(outDir)
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    def dump(name: String, df: DataFrame): Unit = {
      val plan = df.queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(outDir.resolve(s"$name.txt"), plan)
      println(s"wrote $name.txt")
    }

    // ── 1. ccTwoStarsNodes star round: distinct after large-star dropped
    val edges = graft.SparkEntry.coPurchaseEdges(s, sfDir)
    def starRound(in: DataFrame, distinctAfterLarge: Boolean): DataFrame = {
      val sym = in.select(col("a").as("u"), col("b").as("w"))
        .unionAll(in.select(col("b").as("u"), col("a").as("w")))
      val minsL = sym.groupBy(col("u"))
        .agg(least(min(col("w")), col("u")).as("m"))
      val large0 = sym.join(minsL, "u").filter(col("w") > col("u"))
        .select(col("m").as("a"), col("w").as("b"))
      val large = if (distinctAfterLarge) large0.distinct() else large0
      val oriented = large.select(col("b").as("u"), col("a").as("w"))
      val minsS = oriented.groupBy(col("u")).agg(min(col("w")).as("m"))
      oriented.join(minsS, "u")
        .select(col("m").as("a"), col("w").as("b"))
        .unionAll(minsS.select(col("m").as("a"), col("u").as("b")))
        .filter(col("a") =!= col("b"))
        .distinct()
    }
    dump("cc_star_round_fragment_before",
      starRound(edges, distinctAfterLarge = true))
    dump("cc_star_round_fragment_after",
      starRound(edges, distinctAfterLarge = false))

    // ── 2. audioFingerprint energy cells: char-indexed vs byte-indexed
    val media = graft.ops.Multimodal.asMedia(
      s.read.parquet(s"$sfDir/documents.parquet")
        .filter(octet_length(col("text")) === length(col("text")) &&
          octet_length(col("text")) > 0), "doc_id", "text")
    val (win, hop, bands) = (64, 32, 8)
    def cells(byteIndexed: Boolean): DataFrame = {
      val guarded = media.filter(col("n_bytes") >= win)
        .filter(octet_length(col("media")) ===
          length(col("media").cast("string")))
      val frames =
        if (byteIndexed)
          guarded.select(col("media_id"), col("media"),
            explode(sequence(lit(0L),
              expr(s"(n_bytes - $win) div $hop"))).as("t"))
        else
          guarded.select(col("media_id"),
            col("media").cast("string").as("__s"),
            explode(sequence(lit(0L),
              expr(s"(n_bytes - $win) div $hop"))).as("t"))
      val payload = if (byteIndexed) col("media") else col("__s")
      val withBand = frames.select(col("media_id"), payload, col("t"),
        explode(sequence(lit(0L), lit(bands - 1L))).as("b"))
      val e = (0 until win / bands).map { j =>
        val pos = (col("t") * hop + col("b") + lit(1L + bands.toLong * j))
          .cast("int")
        val ch =
          if (byteIndexed) payload.substr(pos, lit(1)).cast("string")
          else payload.substr(pos, lit(1))
        ascii(ch).cast("long")
      }.reduce(_ + _)
      withBand.select(col("media_id"), col("t"), col("b"), e.as("e"))
    }
    dump("mm_audio_cells_fragment_before", cells(byteIndexed = false))
    dump("mm_audio_cells_fragment_after", cells(byteIndexed = true))

    // ── 3. maxRepeatCore gather: 64-way explode+join vs per-doc slice.
    // Shape-only reconstruction over a stand-in rank frame (the real
    // rankT is private): rk plays (doc, pos, len, rks).
    val J = 63
    val docs = s.read.parquet(s"$sfDir/documents.parquet")
    val toks = docs.select(col("doc_id").as("doc"),
        split(trim(col("text")), "\\s+").as("tk"))
      .select(col("doc"), size(col("tk")).as("len"),
        posexplode(col("tk")).as(Seq("pos", "__t")))
    val rk = toks.select(col("doc"), col("pos"), col("len"),
      array(md5(col("__t"))).as("rks"))
    val p0 = rk.filter(col("pos") % 7 === 0).select(col("doc"), col("pos"))
    val gatherBefore = p0
      .select(col("doc"), col("pos"),
        explode(sequence(lit(0), lit(J))).as("__j"))
      .select(col("doc"), col("pos"), col("__j"),
        (col("pos") + col("__j")).as("__rp"))
      .join(rk.select(col("doc"), col("pos").as("__rp"), col("len"),
        col("rks")), Seq("doc", "__rp"))
      .groupBy(col("doc"), col("pos"))
      .agg(max(when(col("__j") === 0, col("len"))).as("len"),
        map_from_entries(collect_list(struct(col("__j"), col("rks"))))
          .as("__rwin"))
    val docArr = rk.groupBy(col("doc"))
      .agg(max(col("len")).as("len"),
        transform(array_sort(collect_list(struct(col("pos"), col("rks")))),
          x => x("rks")).as("__arr"))
    val gatherAfter = p0.join(docArr, Seq("doc"))
      .select(col("doc"), col("pos"), col("len"),
        slice(col("__arr"), col("pos") + 1, lit(J + 1)).as("__rwin"))
    dump("maxrepeat_gather_fragment_before", gatherBefore)
    dump("maxrepeat_gather_fragment_after", gatherAfter)

    // ── 4. audioFingerprint peak pass (second r15 pass): two window
    // exchanges over the band-exploded cells (PARTITION BY (media,b)
    // ORDER BY t + PARTITION BY (media,t) ORDER BY b) vs ONE window over
    // the complete (t,b) grid (PARTITION BY media ORDER BY (t,b); band
    // neighbors at lag/lead 1 guarded by the row's own b, time neighbors
    // at stride `bands`).
    {
      import org.apache.spark.sql.expressions.Window
      val cellsDf = cells(byteIndexed = true)
      val byBand = Window.partitionBy(col("media_id"), col("b"))
        .orderBy(col("t"))
      val byTime = Window.partitionBy(col("media_id"), col("t"))
        .orderBy(col("b"))
      val peaksBefore = cellsDf.select(col("media_id"), col("t"), col("b"),
          col("e"),
          lag(col("e"), 1).over(byBand).as("__tp"),
          lead(col("e"), 1).over(byBand).as("__tn"),
          lag(col("e"), 1).over(byTime).as("__bp"),
          lead(col("e"), 1).over(byTime).as("__bn"))
        .filter(col("e") > coalesce(col("__tp"), lit(-1L)) &&
          col("e") > coalesce(col("__tn"), lit(-1L)) &&
          col("e") > coalesce(col("__bp"), lit(-1L)) &&
          col("e") > coalesce(col("__bn"), lit(-1L)))
        .select(col("media_id"), col("t"), col("b"), col("e"))
      val byCell = Window.partitionBy(col("media_id"))
        .orderBy(col("t"), col("b"))
      val peaksAfter = cellsDf.select(col("media_id"), col("t"), col("b"),
          col("e"),
          lag(col("e"), bands).over(byCell).as("__tp"),
          lead(col("e"), bands).over(byCell).as("__tn"),
          lag(col("e"), 1).over(byCell).as("__bp"),
          lead(col("e"), 1).over(byCell).as("__bn"))
        .filter(col("e") > coalesce(col("__tp"), lit(-1L)) &&
          col("e") > coalesce(col("__tn"), lit(-1L)) &&
          col("e") > coalesce(when(col("b") > 0, col("__bp")), lit(-1L)) &&
          col("e") > coalesce(when(col("b") < bands - 1, col("__bn")),
            lit(-1L)))
        .select(col("media_id"), col("t"), col("b"), col("e"))
      dump("mm_audio_peaks_fragment_before", peaksBefore)
      dump("mm_audio_peaks_fragment_after", peaksAfter)
    }
    s.stop()
  }
}
