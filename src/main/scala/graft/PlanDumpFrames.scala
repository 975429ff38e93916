package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Dev tool: plan evidence for INTERNAL frames that the shipped
  * queries pin behind eager localCheckpoints (so PlanDump's
  * final-plan files cannot show them) — specifically the round-19
  * assignment-pass rewrite. Dumps `.explain("formatted")` for the
  * k-means / two-level-ANN / IVF-cosine assignment frames in BOTH
  * shapes: the pre-round-19 declarative crossJoin→groupBy fold
  * (`_declarative`, the exact code DedupSpec pins the rewrite
  * against) and the shipped row-local form (`_rowlocal`).
  *
  *   sbt "runMain graft.PlanDumpFrames <sfDir> <outDir>"
  */
object PlanDumpFrames {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    graft.functions.DotProduct.register(spark)
    val gdot = graft.functions.DotProduct.dot _

    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", gdot(col("v"), col("v")))
    val cents = e.filter(col("vec_id") >= Similarity.NQueries &&
        col("vec_id") < Similarity.NQueries + Similarity.IvfCells)
      .select(col("vec_id").as("cent_id"), col("v").as("cv"),
        col("nrm").as("cn"))

    // the pre-round-19 declarative folds, verbatim (DedupSpec's twins)
    def declKmAssign(vecs: DataFrame, cs: DataFrame): DataFrame = {
      val dist = col("nrm") -
        lit(2.0) * gdot(col("v"), col("cv")) + col("cn")
      vecs.crossJoin(broadcast(cs))
        .select(col("vec_id"), col("v"), col("nrm"), col("cent_id"),
          dist.as("dist"))
        .groupBy(col("vec_id"))
        .agg(first(col("v")).as("v"), first(col("nrm")).as("nrm"),
          min(struct(col("dist"), col("cent_id"))).as("m"))
        .select(col("vec_id"), col("v"), col("nrm"),
          col("m.cent_id").as("cell"), col("m.dist").as("dist"))
    }
    def declKmAssignAnn(vecs: DataFrame, cs: DataFrame, nCoarse: Int,
        probe: Int): DataFrame = {
      val anchors = cs.orderBy(col("cent_id")).limit(nCoarse)
        .select(col("cent_id").as("anchor_id"), col("cv").as("av"),
          col("cn").as("an"))
      val groupDist = col("cn") -
        lit(2.0) * gdot(col("cv"), col("av")) + col("an")
      val grouped = cs.crossJoin(broadcast(anchors))
        .select(col("cent_id"), col("cv"), col("cn"),
          groupDist.as("ad"), col("anchor_id"))
        .groupBy(col("cent_id"))
        .agg(first(col("cv")).as("cv"), first(col("cn")).as("cn"),
          min(struct(col("ad"), col("anchor_id"))).as("g"))
        .select(col("g.anchor_id").as("grp"), col("cent_id"),
          col("cv"), col("cn"))
      val anchorDist = col("nrm") -
        lit(2.0) * gdot(col("v"), col("av")) + col("an")
      val probed = vecs.crossJoin(broadcast(anchors))
        .select(col("vec_id"), col("v"), col("nrm"),
          struct(anchorDist.as("ad"), col("anchor_id")).as("sc"))
        .groupBy(col("vec_id"))
        .agg(first(col("v")).as("v"), first(col("nrm")).as("nrm"),
          slice(array_sort(collect_list(col("sc"))), 1, probe)
            .as("top"))
        .select(col("vec_id"), col("v"), col("nrm"),
          explode(transform(col("top"), s => s.getField("anchor_id")))
            .as("grp"))
      val dist = col("nrm") -
        lit(2.0) * gdot(col("v"), col("cv")) + col("cn")
      probed.join(broadcast(grouped), Seq("grp"))
        .select(col("vec_id"), col("v"), col("nrm"), col("cent_id"),
          dist.as("dist"))
        .groupBy(col("vec_id"))
        .agg(first(col("v")).as("v"), first(col("nrm")).as("nrm"),
          min(struct(col("dist"), col("cent_id"))).as("m"))
        .select(col("vec_id"), col("v"), col("nrm"),
          col("m.cent_id").as("cell"), col("m.dist").as("dist"))
    }

    def dump(name: String, df: DataFrame): Unit = {
      val s = df.queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"$name.txt"),
        s.getBytes("UTF-8"))
      println(s"[plandumpframes] wrote $name.txt")
    }
    dump("kmassign_flat_declarative", declKmAssign(e, cents))
    dump("kmassign_flat_rowlocal", Similarity.kmAssign(e, cents))
    dump("kmassign_ann_declarative", declKmAssignAnn(e, cents, 4, 4))
    dump("kmassign_ann_rowlocal", Similarity.kmAssignAnn(e, cents, 4, 4))
    spark.stop()
  }
}
