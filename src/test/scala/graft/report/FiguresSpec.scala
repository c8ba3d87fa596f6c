package graft.report

import org.scalatest.funsuite.AnyFunSuite

/** S6 figure sink: determinism, geometry, and the two reference figures
  * rendered from the reference's own stored traces/matrices. */
class FiguresSpec extends AnyFunSuite with graft.SharedSpark {

  private def count(hay: String, needle: String): Int =
    hay.sliding(needle.length).count(_ == needle)

  test("ticks: 1/2/5 steps, covers the range, 4-8 ticks") {
    assert(Figures.ticks(0, 10) == Seq(0.0, 2.0, 4.0, 6.0, 8.0, 10.0))
    assert(Figures.ticks(0, 1).head == 0.0)
    for ((lo, hi) <- Seq((0.0, 10.0), (-3.7, 12.2), (0.001, 0.009), (1e6, 9e6))) {
      val t = Figures.ticks(lo, hi)
      assert(t.size >= 4 && t.size <= 9, s"[$lo,$hi] -> $t")
      assert(t.forall(v => v >= lo - 1e-9 && v <= hi + 1e-9))
      assert(t == t.sorted)
    }
  }

  test("lineChart: structural SVG invariants and deterministic output") {
    val s = Seq(
      Figures.Series("a", Seq((0.0, 1.0), (1.0, 2.0), (2.0, 1.5)),
        band = Seq((0.0, 0.8, 1.2), (1.0, 1.7, 2.3), (2.0, 1.2, 1.8))),
      Figures.Series("b", Seq((0.0, 3.0), (2.0, 0.5))))
    val svg = Figures.lineChart(s, hlines = Seq(Figures.HLine("Default", 2.5)),
      title = "T", xLabel = "x", yLabel = "y")
    assert(svg.startsWith("<svg") && svg.endsWith("</svg>"))
    assert(count(svg, "<polyline") == 2, "one polyline per series")
    assert(count(svg, "<polygon") == 1, "one band polygon")
    assert(svg.contains(">Default<") && svg.contains(">T<"))
    assert(svg.contains("stroke-dasharray"))
    // legend entries
    assert(svg.contains(">a<") && svg.contains(">b<"))
    // pure function: byte-identical re-render
    assert(svg == Figures.lineChart(s, hlines = Seq(Figures.HLine("Default", 2.5)),
      title = "T", xLabel = "x", yLabel = "y"))
  }

  test("lineChart: known point maps to the expected pixel") {
    // margins mL=64, mT=16 (no title), pw=720-64-16=640, ph=480-16-48=416.
    // x domain [0,2] -> x=1 lands at 64 + 640/2 = 384
    val svg = Figures.lineChart(Seq(Figures.Series("s",
      Seq((0.0, 0.0), (1.0, 1.0), (2.0, 2.0)))))
    assert(svg.contains("384.00,"), s"midpoint pixel missing:\n$svg")
  }

  test("trajectory figure renders from the reference's stored JOB traces") {
    spark.sparkContext.setLogLevel("ERROR")
    val w = graft.sources.Workloads.matrixFromCsv("/root/reference/dataset/job-matrix.csv")
    val svg = Figures.trajectoryFigure(spark,
      Seq("LimeQO" -> "/root/reference/experiment/job/limeqo/*.json"),
      pgTotal = w.defaultTime, optimalTotal = w.optTime, nGrid = 200)
    assert(svg.startsWith("<svg"))
    assert(count(svg, "<polyline") == 1)
    assert(count(svg, "<polygon") == 1, "mean±std band present")
    assert(svg.contains(">Default<") && svg.contains(">Optimal<"))
    // the mean polyline carries every grid point
    val line = svg.substring(svg.indexOf("<polyline"))
    assert(line.substring(0, line.indexOf("/>")).split(" ").count(_.contains(",")) == 200)
  }

  test("spectrum figure: workload matrix vs random, normalized to sigma1=1") {
    val real = Seq(100.0, 40.0, 10.0, 2.0, 1.0)
    val random = Seq(50.0, 45.0, 40.0, 38.0, 35.0)
    val svg = Figures.spectrumFigure(real, random)
    assert(count(svg, "<polyline") == 2)
    assert(svg.contains("workload matrix") && svg.contains("random matrix"))
    // both series start at (rank 1, value 1.0): identical first y pixel
    val polys = svg.split("<polyline").drop(1).map(_.split("points=\"")(1).split(" ")(0))
    assert(polys(0).split(",")(1) == polys(1).split(",")(1),
      s"normalized heads differ: ${polys.mkString(" vs ")}")
  }

  test("degenerate domains render: single-point series, constant y") {
    // rank-1 spectrum → one point per series, x span 0: the x domain must
    // self-pad instead of tripping ticks' require or emitting NaN pixels
    val svg = Figures.spectrumFigure(Seq(5.0), Seq(3.0))
    assert(!svg.contains("NaN") && svg.contains("<polyline"))
    val flat = Figures.lineChart(
      Seq(Figures.Series("flat", Seq((1.0, 2.0), (2.0, 2.0)))))
    assert(!flat.contains("NaN"))
  }

  test("censor-ablation figure renders from the reference's stored CEB traces") {
    spark.sparkContext.setLogLevel("ERROR")
    val w = graft.sources.Workloads.matrixFromCsv("/root/reference/dataset/ceb-matrix.csv")
    val e = "/root/reference/experiment/ceb"
    def render = Figures.censorFigure(spark,
      censoredGlob = s"$e/limeqo/[0-9]*.json",
      wocensoredGlob = s"$e/limeqo/wocensored_*.json",
      pgTotal = w.defaultTime, optimalTotal = w.optTime, nGrid = 200)
    val svg = render
    assert(svg.startsWith("<svg"))
    assert(count(svg, "<polyline") == 2, "censored + wocensored series")
    assert(count(svg, "<polygon") == 2, "both mean±std bands present")
    assert(svg.contains(">Default<") && svg.contains(">Optimal<"))
    assert(svg.contains("wocensored"))
    assert(svg == render, "not deterministic")
  }

  test("new-query figure renders with the shifted exploration cost") {
    spark.sparkContext.setLogLevel("ERROR")
    val w = graft.sources.Workloads.matrixFromCsv("/root/reference/dataset/ceb-matrix.csv")
    val e = "/root/reference/experiment/ceb"
    val shiftedGlob =
      s"$e/newquery/als_newquery_timeout_rank5_lambda0.2_alpha1_beta15_run*.json"
    def render = Figures.newQueryFigure(spark,
      shifted = Seq("LimeQO (with shift)" -> shiftedGlob),
      baselines = Seq("LimeQO" -> s"$e/limeqo/[0-9]*.json"),
      pgTotal = w.defaultTime, pgTotalBefore = 7886.0, nGrid = 200)
    val svg = render
    assert(svg.startsWith("<svg"))
    assert(count(svg, "<polyline") == 2, "shifted + baseline series")
    assert(count(svg, "<polygon") == 2)
    assert(svg.contains("with shift"))
    assert(svg == render, "not deterministic")
    // the shift must matter: treating the newquery traces as UNshifted
    // yields a different rendering (x re-bases only in the shifted path)
    val unshifted = Figures.newQueryFigure(spark,
      shifted = Nil,
      baselines = Seq("LimeQO (with shift)" -> shiftedGlob, "LimeQO" -> s"$e/limeqo/[0-9]*.json"),
      pgTotal = w.defaultTime, pgTotalBefore = 7886.0, nGrid = 200)
    assert(svg != unshifted, "shifted and unshifted renderings coincide")
  }

  test("labels with XML metacharacters stay well-formed") {
    val svg = Figures.lineChart(
      Seq(Figures.Series("LimeQO & ALS", Seq((0.0, 1.0), (1.0, 2.0)))),
      hlines = Seq(Figures.HLine("y < 2", 1.5)),
      title = "latency < tolerance", xLabel = "a & b", yLabel = "c > d")
    assert(!svg.contains("LimeQO & ALS") && svg.contains("LimeQO &amp; ALS"))
    assert(svg.contains("latency &lt; tolerance") && svg.contains("c &gt; d"))
    // the document parses as XML
    val parsed = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      .newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(svg.getBytes("UTF-8")))
    assert(parsed.getDocumentElement.getTagName == "svg")
  }
}
