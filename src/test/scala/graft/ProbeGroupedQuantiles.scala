package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import scala.jdk.CollectionConverters._

/** Dev probe (r17): the q172/q175 few-group groupedQuantiles regression —
  * r16's fused shape (counts ride the window) measured 1.7–2× slower than
  * r15's join shape in four independent sessions. Alternating A/B in ONE
  * JVM to find where the time actually goes.
  */
object ProbeGroupedQuantiles {
  /** The r15 shape verbatim (second base aggregation + null-safe join). */
  def joinShape(df: DataFrame, groupCols: Seq[String],
                valueCol: String, ps: Seq[Double]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def label(p: Double): String =
      "p" + (BigDecimal(p.toString) * 100).underlying
        .stripTrailingZeros.toPlainString
        .replace(".", "_").replace("-", "")
    val labels = ps.map(label)
    val gNames = groupCols.indices.map(i => s"__g$i")
    val gs = gNames.map(col)
    val base = df.select(
      groupCols.zip(gNames).map { case (c, g) => col(c).as(g) } :+
        col(valueCol).cast(DoubleType).as("__val"): _*)
    val v = col("__val")
    val counts = base
      .where(v.isNotNull && !isnan(v))
      .groupBy(gs :+ v.as("__v"): _*)
      .agg(count(lit(1)).as("__c"))
    val wOrd = Window.partitionBy(gs: _*).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(gs: _*)
    val ranked = counts
      .withColumn("__cum", sum(col("__c")).over(wOrd))
      .withColumn("__n", sum(col("__c")).over(wAll))
    val aggs = max(col("__n")).as("__total") +:
      ps.zip(labels).flatMap { case (p, l) =>
        val pos = lit(p) * (col("__n") - 1)
        def at(r: org.apache.spark.sql.Column) = max(when(
          col("__cum") - col("__c") <= r && r < col("__cum"),
          col("__v")))
        Seq(at(floor(pos)).as(s"__lo_$l"), at(ceil(pos)).as(s"__hi_$l"))
      }
    val picked = ranked.groupBy(gs: _*).agg(aggs.head, aggs.tail: _*)
    val allGroups = base.groupBy(gs: _*).agg(count(lit(1)).as("__rows"))
    val joinCond = gNames
      .map(g => allGroups(g) <=> picked(g)).reduce(_ && _)
    allGroups.join(picked, joinCond, "left")
      .select(groupCols.zip(gNames).map { case (c, g) =>
          allGroups(g).as(c) } ++
        (col("__rows").as("n") +:
        ps.zip(labels).map { case (p, l) =>
          val pos = lit(p) * (col("__total") - 1)
          val lo = col(s"__lo_$l"); val hi = col(s"__hi_$l")
          when(col("__total").isNull, lit(null).cast(DoubleType))
            .when(ceil(pos) === floor(pos), lo)
            .otherwise(lo * (ceil(pos) - pos) + hi * (pos - floor(pos)))
            .as(l)
        }): _*)
      .orderBy(groupCols.map(c => col(c).asc_nulls_last): _*)
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(f: => Any): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def run(df: DataFrame): Unit = { df.queryExecution.toRdd.count() }
    val li = Queries.table(spark, dir, "lineitem")
    val li175 = li.withColumn("flag_or_null",
      nullif(col("l_returnflag"), lit("N")))
    def fused172() = stats.Describe.groupedQuantiles(li,
      Seq("l_returnflag"), "l_extendedprice", Seq(0.25, 0.5, 0.9))
    def join172() = joinShape(li,
      Seq("l_returnflag"), "l_extendedprice", Seq(0.25, 0.5, 0.9))
    def fused175() = stats.Describe.groupedQuantiles(li175,
      Seq("flag_or_null"), "l_extendedprice", Seq(0.5, 0.9))
    def join175() = joinShape(li175,
      Seq("flag_or_null"), "l_extendedprice", Seq(0.5, 0.9))
    if (args.length > 1 && args(1) == "plans") {
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("/tmp/gq_fused.txt"),
        fused172().queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("/tmp/gq_join.txt"),
        join172().queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "stages") {
      import org.apache.spark.sql.expressions.Window
      val base = li.select(col("l_returnflag").as("__g0"),
        col("l_extendedprice").cast(DoubleType).as("__val"))
      val v = col("__val")
      val counts0 = base.groupBy(col("__g0"), v.as("__v"))
        .agg(count(lit(1)).as("__c"))
      val valid = col("__v").isNotNull && !isnan(col("__v"))
      val wOrd = Window.partitionBy(col("__g0")).orderBy(col("__v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy(col("__g0"))
      def counts0f() = base.groupBy(col("__g0"), v.as("__v"))
        .agg(count(lit(1)).as("__c"))
      def ranked3() = counts0f()
        .withColumn("__cum", sum(when(valid, col("__c")).otherwise(0L))
          .over(wOrd))
        .withColumn("__n", sum(when(valid, col("__c"))).over(wAll))
        .withColumn("__rows", sum(col("__c")).over(wAll))
      def ranked2() = counts0f()
        .withColumn("__cum", sum(col("__c")).over(wOrd))
        .withColumn("__n", sum(col("__c")).over(wAll))
      def ranked1() = counts0f()
        .withColumn("__cum", sum(col("__c")).over(wOrd))
      def bestOf(label: String, df: => DataFrame): Unit = {
        run(df)
        println(f"[gq] $label%-18s ${(1 to 4).map(_ => t(run(df))).min}%6.3f")
      }
      def v1() = {
        val u = stats.Describe.groupedQuantilesUnsorted(li,
          Seq("l_returnflag"), "l_extendedprice", Seq(0.25, 0.5, 0.9))
        u.repartition(32, col("l_returnflag"))
          .orderBy(col("l_returnflag").asc_nulls_last)
      }
      bestOf("v1-num-repart", v1())
      println("[gq] v1 optimized logical:")
      v1().queryExecution.optimizedPlan.toString.split("\n").take(6)
        .foreach(l => println("[gq]   " + l))
      def v2() = {
        import org.apache.spark.sql.expressions.Window
        val base2 = li.select(col("l_returnflag").as("__g0"),
          col("l_extendedprice").cast(DoubleType).as("__val"))
        val v = col("__val")
        val counts0 = base2.groupBy(col("__g0"), v.as("__v"))
          .agg(count(lit(1)).as("__c"))
        val valid = col("__v").isNotNull && !isnan(col("__v"))
        val wOrd = Window.partitionBy(col("__g0")).orderBy(col("__v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wAll = Window.partitionBy(col("__g0"))
        val ranked = counts0
          .withColumn("__cum", sum(when(valid, col("__c")).otherwise(0L))
            .over(wOrd))
          .withColumn("__n", sum(when(valid, col("__c"))).over(wAll))
          .withColumn("__rows", sum(col("__c")).over(wAll))
          .repartition(32, col("__g0"))
        val aggs = max(col("__rows")).as("__gRows") +:
          max(col("__n")).as("__total") +:
          Seq(0.25, 0.5, 0.9).flatMap { pp =>
            val pos = lit(pp) * (col("__n") - 1)
            def at(r: org.apache.spark.sql.Column) = max(when(
              valid && col("__cum") - col("__c") <= r && r < col("__cum"),
              col("__v")))
            Seq(at(floor(pos)).as(s"__lo_$pp"), at(ceil(pos)).as(s"__hi_$pp"))
          }
        ranked.groupBy(col("__g0")).agg(aggs.head, aggs.tail: _*)
          .orderBy(col("__g0").asc_nulls_last)
      }
      bestOf("v2-mid-repart", v2())
      def v3() = {
        val u = stats.Describe.groupedQuantilesUnsorted(li,
          Seq("l_returnflag"), "l_extendedprice", Seq(0.25, 0.5, 0.9))
        u.localCheckpoint(false).orderBy(col("l_returnflag").asc_nulls_last)
      }
      bestOf("v3-lazy-ckpt", v3())
      run(v1())
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("/tmp/gq_v1_final.txt"),
        { val d = v1(); run(d); d.queryExecution.executedPlan.toString })
      bestOf("collapse", counts0f())
      bestOf("w-cum-only", ranked1())
      bestOf("w-join(2fn)", ranked2())
      bestOf("w-fused(3fn)", ranked3())
      bestOf("fused-full", fused172())
      bestOf("join-full", join172())
      // per-stage wall times of one run each, via listener
      val stages = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long, Int)]()
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val ms = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
          stages.put(si.stageId, (si.name.takeWhile(_ != '\n').take(60), ms, si.numTasks))
        }
      }
      spark.sparkContext.addSparkListener(listener)
      stages.clear(); run(fused172())
      Thread.sleep(500)
      println("[gq] fused stages:")
      stages.asScala.toSeq.sortBy(_._1).foreach { case (id, (n, ms, nt)) =>
        println(f"[gq]   stage $id%4d $ms%6d ms  tasks=$nt%3d  $n") }
      stages.clear(); run(join172())
      Thread.sleep(500)
      println("[gq] join stages:")
      stages.asScala.toSeq.sortBy(_._1).foreach { case (id, (n, ms, nt)) =>
        println(f"[gq]   stage $id%4d $ms%6d ms  tasks=$nt%3d  $n") }
      val fq = fused172(); run(fq)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("/tmp/gq_fused_final.txt"),
        fq.queryExecution.executedPlan.toString)
      val jq = join172(); run(jq)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("/tmp/gq_join_final.txt"),
        jq.queryExecution.executedPlan.toString)
      spark.stop(); return
    }
    // warm both plans
    run(fused172()); run(join172()); run(fused175()); run(join175())
    // alternate 5 rounds
    val rs = (1 to 5).map { _ =>
      (t(run(fused172())), t(run(join172())),
       t(run(fused175())), t(run(join175())))
    }
    println(f"[gq] q172 fused: ${rs.map(_._1).min}%6.3f  join: ${rs.map(_._2).min}%6.3f")
    println(f"[gq] q175 fused: ${rs.map(_._3).min}%6.3f  join: ${rs.map(_._4).min}%6.3f")
    println("[gq] rounds fused172=" + rs.map(r => f"${r._1}%.3f").mkString(",") +
      " join172=" + rs.map(r => f"${r._2}%.3f").mkString(","))
    println("[gq] rounds fused175=" + rs.map(r => f"${r._3}%.3f").mkString(",") +
      " join175=" + rs.map(r => f"${r._4}%.3f").mkString(","))
    spark.stop()
  }
}
