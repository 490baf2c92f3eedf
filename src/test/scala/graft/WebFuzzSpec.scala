package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._
import graft.ext.Html

/** Generative differential fuzz of the HTML extraction tier (the FuzzSpec
  * discipline applied to [[Html]]): ScalaCheck builds random page ASTs —
  * blocks of text runs / anchors / inline-wrapped runs with random
  * attributes, empty blocks, anchor-only boilerplate, unicode, stray text
  * after the last block — renders them to markup, and the REAL extractor
  * (the q204 column pipeline, executed through Spark in one job per seed
  * base) is compared page-by-page against [[HtmlFuzzGen.model]], an
  * independent plain-Scala evaluator computed from the AST, never from
  * the rendered string, so a regex bug cannot hide in a shared parser.
  *
  * Each page is its own ScalaCheck seed (`Seed(base+i)`) — a failure
  * reproduces from the printed seed alone. 2 bases × 100 pages, two
  * Spark jobs total.
  *
  * Scope notes (documented, not fuzzed — the [[Html]] sanitizer
  * contract): text content carries no '<'/'>' (tag-stripping would be
  * ambiguous), no tabs (the collapse rule is spaces), and no HTML
  * entities (no decoding layer); anchor text is flat (round 17 RETIRED
  * the href-first contract — href-less and attribute-reordered anchors
  * are generated and must drop from / join the pair set without
  * shifting alignment).
  */
class WebFuzzSpec extends AnyFunSuite {
  import HtmlFuzzGen._

  private lazy val spark = TestSpark.spark

  private def runBatch(base: Long, nPages: Int): Unit = {
    import spark.implicits._
    val pages = (0 until nPages).map { i =>
      genPage.pureApply(Gen.Parameters.default, Seed(base + i))
    }
    // vacuity guards: the batch must exercise kept AND dropped blocks,
    // anchors, empty-visible blocks, and stray tails
    val models = pages.map(p => model(p))
    assert(models.map(_.nKept).sum > 50, s"[base $base] too few kept blocks")
    assert(models.map(m => m.nBlocks - m.nKept).sum > 50,
      s"[base $base] too few dropped blocks")
    assert(pages.count(_.stray.nonEmpty) > 5, s"[base $base] no stray tails")
    assert(pages.flatMap(_.blocks).count(_.elems.exists(_.isInstanceOf[Anchor])) > 30,
      s"[base $base] too few anchors")
    assert(pages.flatMap(_.blocks).flatMap(_.elems)
      .count(_.isInstanceOf[AttrAnchor]) > 10,
      s"[base $base] too few attribute-reordered anchors")
    assert(pages.flatMap(_.blocks).flatMap(_.elems)
      .count(_.isInstanceOf[BareAnchor]) > 10,
      s"[base $base] too few href-less anchors")

    val df = pages.zipWithIndex
      .map { case (p, i) => (i.toLong, render(p)) }.toDF("id", "h")
      .select(col("id"), Html.blockStats(col("h")).as("_st"),
        Html.anchorPairs(col("h")).as("_ap"))
      .select(col("id"), Html.pageSummary(col("_st")).as("e"), col("_ap"))
      .select(col("id"), col("e.n_blocks"), col("e.n_kept"),
        col("e.kept_chars"), col("e.total_chars"), col("e.extracted"),
        expr("transform(_ap, a -> a.href || chr(10) || a.anchor)").as("ap"))
      .as[(Long, Long, Long, Long, Long, String, Seq[String])]
      .collect().sortBy(_._1)

    df.zip(pages.zip(models)).foreach {
      case ((i, nb, nk, kc, tc, ex, ap), (page, m)) =>
        val seed = base + i
        assert(nb == m.nBlocks, s"[seed $seed] n_blocks $nb != ${m.nBlocks}\n${render(page)}")
        assert(nk == m.nKept, s"[seed $seed] n_kept $nk != ${m.nKept}\n${render(page)}")
        assert(kc == m.keptChars, s"[seed $seed] kept_chars $kc != ${m.keptChars}\n${render(page)}")
        assert(tc == m.totalChars, s"[seed $seed] total_chars $tc != ${m.totalChars}\n${render(page)}")
        assert(ex == m.extracted, s"[seed $seed] extracted mismatch\n got: $ex\nwant: ${m.extracted}\n${render(page)}")
        // pairs: href-carrying anchors only (attribute order irrelevant);
        // a bare <a> drops WITHOUT shifting the pairs after it
        val wantAp = page.blocks.flatMap(_.elems).collect {
          case Anchor(h, t) => s"$h\n$t"
          case AttrAnchor(h, t) => s"$h\n$t"
        }
        assert(ap == wantAp, s"[seed $seed] anchor pairs mismatch\n got: $ap\nwant: $wantAp")
    }
  }

  test("extractor ≡ AST model over 100 random pages (seed base 7000)") {
    runBatch(7000L, 100)
  }

  test("extractor ≡ AST model over 100 random pages (seed base 9000)") {
    runBatch(9000L, 100)
  }

  test("main-content extractor ≡ AST model over 100 stopword-mixed pages " +
       "(seed base 23000) — the stopword leg kills and keeps both ways (r19)") {
    import spark.implicits._
    val pages = (0 until 100).map { i =>
      genPageLex.pureApply(Gen.Parameters.default, Seed(23000L + i))
    }
    val models = pages.map(p => modelMain(p))
    val linkModels = pages.map(p => model(p))
    // vacuity guards: blocks killed ONLY by the stopword leg (they pass
    // the q204 rule), blocks KEPT under it, and undecided pages
    assert(models.map(_.nKept).sum > 30, "too few main-content keeps")
    assert(linkModels.map(_.nKept).sum - models.map(_.nKept).sum > 40,
      "too few stopword-leg-only kills")
    val df = pages.zipWithIndex
      .map { case (p, i) => (i.toLong, render(p)) }.toDF("id", "h")
      .select(col("id"), Html.blockStatsLex(col("h")).as("_st"))
      .select(col("id"), Html.mainContentSummary(col("_st")).as("e"))
      .select(col("id"), col("e.n_blocks"), col("e.n_kept"),
        col("e.kept_chars"), col("e.total_chars"), col("e.extracted"))
      .as[(Long, Long, Long, Long, Long, String)]
      .collect().sortBy(_._1)
    df.zip(pages.zip(models)).foreach {
      case ((i, nb, nk, kc, tc, ex), (page, m)) =>
        val seed = 23000L + i
        assert(nb == m.nBlocks, s"[seed $seed] n_blocks $nb != ${m.nBlocks}\n${render(page)}")
        assert(nk == m.nKept, s"[seed $seed] n_kept $nk != ${m.nKept}\n${render(page)}")
        assert(kc == m.keptChars, s"[seed $seed] kept_chars $kc != ${m.keptChars}\n${render(page)}")
        assert(tc == m.totalChars, s"[seed $seed] total_chars $tc != ${m.totalChars}\n${render(page)}")
        assert(ex == m.extracted, s"[seed $seed] extracted mismatch\n got: $ex\nwant: ${m.extracted}\n${render(page)}")
    }
  }

  test("meta-charset prescan ≡ AST model over 400 random heads — decoy " +
       "content=\"…charset=…\" metas can never hijack the encoding (r19)") {
    import graft.ext.Warc
    import MetaFuzzGen._
    var decoys = 0
    var declared = 0
    var undeclared = 0
    (0 until 400).foreach { i =>
      val head = genHead.pureApply(Gen.Parameters.default, Seed(21000L + i))
      val got = Warc.sniffCharset(
        render(head).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val want = model(head)
      assert(got == want,
        s"[seed ${21000L + i}] got '$got' want '$want'\n${render(head)}")
      decoys += head.metas.count(m =>
        m.isInstanceOf[Decoy] || m.isInstanceOf[OtherEquiv])
      if (want.nonEmpty) declared += 1 else undeclared += 1
    }
    // vacuity guards: the batch must exercise decoys, real declarations,
    // and heads with no declaration at all
    assert(decoys > 100, s"too few decoy metas: $decoys")
    assert(declared > 80, s"too few declaring heads: $declared")
    assert(undeclared > 30, s"too few undeclared heads: $undeclared")
  }
}

/** Meta-tag soup generators + the independent prescan model: which
  * charset does a random `<head>` declare, computed from the AST — never
  * from the rendered string — so the attribute tokenizer in
  * [[graft.ext.Warc.sniffCharset]] cannot share a bug with the model.
  * Decoy shapes are the round-19 fidelity classes: a `content` attribute
  * MENTIONING `charset=` with no `http-equiv=Content-Type` beside it
  * must be structurally invisible. */
object MetaFuzzGen {
  sealed trait Meta
  /** `<meta charset=CS>` — quote ∈ {double, single, none}. */
  final case class CharsetAttr(cs: String, quote: Int, spaced: Boolean) extends Meta
  /** Legacy `<meta http-equiv="Content-Type" content="text/html; charset=CS">`;
    * reversed puts content before http-equiv. */
  final case class HttpEquiv(cs: String, reversed: Boolean) extends Meta
  /** `<meta name=… content="… charset=CS …">` — a DECOY, not a declaration. */
  final case class Decoy(cs: String) extends Meta
  /** `http-equiv` on some OTHER header whose content mentions charset=
    * — also a decoy (the equiv name gates the content parse). */
  final case class OtherEquiv(cs: String) extends Meta
  final case class Head(metas: Seq[Meta], filler: Seq[String])

  private val charsets = Seq("ISO-8859-1", "KOI8-R", "utf-8", "UTF-16",
    "utf-16le", "windows-1250", "x-user-defined")

  private val genMeta: Gen[Meta] = Gen.frequency(
    3 -> (for {
      cs <- Gen.oneOf(charsets); q <- Gen.chooseNum(0, 2)
      sp <- Gen.oneOf(true, false)
    } yield CharsetAttr(cs, q, sp)),
    3 -> (for {
      cs <- Gen.oneOf(charsets); r <- Gen.oneOf(true, false)
    } yield HttpEquiv(cs, r)),
    3 -> Gen.oneOf(charsets).map(Decoy(_)),
    2 -> Gen.oneOf(charsets).map(OtherEquiv(_)))

  val genHead: Gen[Head] = for {
    n <- Gen.chooseNum(0, 5)
    metas <- Gen.listOfN(n, genMeta)
    filler <- Gen.listOfN(n + 1,
      Gen.oneOf("", "<title>t</title>", "<p>set charset=EBCDIC by hand</p>",
        "<link rel=\"stylesheet\" href=\"/s.css\">"))
  } yield Head(metas, filler)

  def render(h: Head): String = {
    val sb = new StringBuilder("<html><head>")
    h.metas.zip(h.filler).foreach { case (m, f) =>
      sb.append(f)
      sb.append(m match {
        case CharsetAttr(cs, q, sp) =>
          val eq = if (sp) " = " else "="
          val v = q match {
            case 0 => "\"" + cs + "\""
            case 1 => "'" + cs + "'"
            case _ => cs
          }
          s"<meta charset$eq$v>"
        case HttpEquiv(cs, false) =>
          s"""<meta http-equiv="Content-Type" content="text/html; charset=$cs">"""
        case HttpEquiv(cs, true) =>
          s"""<meta content="text/html; charset=$cs" http-equiv="Content-Type">"""
        case Decoy(cs) =>
          s"""<meta name="description" content="use charset=$cs here">"""
        case OtherEquiv(cs) =>
          s"""<meta http-equiv="refresh" content="0; url=/x?charset=$cs">"""
      })
    }
    sb.append(h.filler.last)
    sb.append("</head><body>body</body></html>")
    sb.toString
  }

  /** First DECLARING meta in document order wins; decoys are invisible;
    * UTF-16 family remaps to UTF-8 and x-user-defined to windows-1252
    * (WHATWG "get an encoding" over prescan results). */
  def model(h: Head): String =
    h.metas.collectFirst {
      case CharsetAttr(cs, _, _) => remap(cs)
      case HttpEquiv(cs, _) => remap(cs)
    }.getOrElse("")

  private def remap(cs: String): String = cs.toLowerCase match {
    case "utf-16" | "utf-16le" | "utf-16be" => "UTF-8"
    case "x-user-defined" => "windows-1252"
    case _ => cs
  }
}

/** Page AST generators + the independent extraction model (WebFuzzSpec). */
object HtmlFuzzGen {
  sealed trait Elem
  final case class Text(s: String) extends Elem
  final case class Anchor(href: String, text: String) extends Elem
  /** href NOT first (other attributes precede it) — must still pair. */
  final case class AttrAnchor(href: String, text: String) extends Elem
  /** No href at all — counts as anchor MASS (it renders as a link-ish
    * element) but must DROP from the pair set without shifting later
    * pairs (the round-16 two-pattern zip misaligned on exactly this). */
  final case class BareAnchor(text: String) extends Elem
  final case class Wrapped(tag: String, s: String) extends Elem
  final case class Block(tag: String, attrs: String, elems: Seq[Elem])
  final case class Page(blocks: Seq[Block], stray: String)

  private val wordChars =
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789" +
      "éüßñøåçÆŒ日本語данные.,:;!?()'&-"
  private val word: Gen[String] = for {
    n <- Gen.chooseNum(1, 10)
    cs <- Gen.listOfN(n, Gen.oneOf(wordChars.toSeq))
  } yield cs.mkString

  private def textRunOf(w: Gen[String]): Gen[String] = for {
    n <- Gen.chooseNum(0, 6)
    ws <- Gen.listOfN(n, w)
    sep <- Gen.oneOf(" ", "  ", " ") // double spaces exercise the collapse
  } yield ws.mkString(sep)

  private val textRun: Gen[String] = textRunOf(word)

  private def elemOf(run: Gen[String]): Gen[Elem] = Gen.frequency(
    5 -> run.map(Text.apply),
    3 -> (for { h <- word; t <- run } yield Anchor(s"/x/$h", t)),
    1 -> (for { h <- word; t <- run } yield AttrAnchor(s"/y/$h", t)),
    1 -> run.map(BareAnchor.apply),
    2 -> (for { tg <- Gen.oneOf("b", "i", "em", "span"); s <- run }
      yield Wrapped(tg, s)))

  private def blockOf(run: Gen[String]): Gen[Block] = for {
    tag <- Gen.oneOf("p", "div", "h1")
    attrs <- Gen.oneOf("", " class=\"c1\"", " id=\"z9\" class=\"nav menu\"")
    n <- Gen.frequency(1 -> Gen.const(0), 6 -> Gen.chooseNum(1, 5))
    es <- Gen.listOfN(n, elemOf(run))
  } yield Block(tag, attrs, es)

  private def genPageOf(run: Gen[String]): Gen[Page] = for {
    nb <- Gen.chooseNum(0, 7)
    bs <- Gen.listOfN(nb, blockOf(run))
    stray <- Gen.frequency(8 -> Gen.const(""), 2 -> run)
  } yield Page(bs, stray)

  val genPage: Gen[Page] = genPageOf(textRun)

  /** Pages whose text MIXES stopwords with random vocabulary — the
    * input class that exercises the jusText stopword-density leg both
    * ways (a page of pure random words is all-drop under it). */
  val genPageLex: Gen[Page] = genPageOf(textRunOf(Gen.frequency(
    9 -> word, 1 -> Gen.oneOf(graft.ext.Html.DefaultStopwords))))

  def render(p: Page): String = {
    val sb = new StringBuilder("<html><head></head><body>")
    p.blocks.foreach { b =>
      sb.append(s"<${b.tag}${b.attrs}>")
      b.elems.foreach {
        case Text(s) => sb.append(s)
        case Anchor(h, t) => sb.append(s"""<a href="$h">$t</a>""")
        case AttrAnchor(h, t) =>
          sb.append(s"""<a rel="nofollow" href="$h">$t</a>""")
        case BareAnchor(t) => sb.append(s"""<a name="n7">$t</a>""")
        case Wrapped(tg, s) => sb.append(s"<$tg>$s</$tg>")
      }
      sb.append(s"</${b.tag}>")
    }
    sb.append(p.stray).append("</body></html>")
    sb.toString
  }

  final case class PageModel(nBlocks: Long, nKept: Long, keptChars: Long,
                             totalChars: Long, extracted: String)

  /** The extraction semantics evaluated from the AST: every tag becomes a
    * space, runs of spaces collapse, trim; anchor mass is the anchors'
    * text length; keep = vis >= 10 && anchor*3 <= vis. The stray tail is
    * one more visible chunk (anchor 0). Computed from the AST, never the
    * rendered string — the extractor's split/strip regexes have no
    * counterpart here to share a bug with. */
  def model(p: Page, minLen: Int = 10): PageModel = {
    val rendered = blockVisAnchor(p)
    val kept = rendered.filter { case (v, a) => v.length >= minLen && a * 3 <= v.length }
    PageModel(
      nBlocks = rendered.length.toLong,
      nKept = kept.length.toLong,
      keptChars = kept.map(_._1.length.toLong).sum,
      totalChars = rendered.map(_._1.length.toLong).sum,
      extracted = kept.map(_._1).mkString("\n"))
  }

  /** (visible, anchor mass) per rendered block, from the AST. */
  private def blockVisAnchor(p: Page): Seq[(String, Int)] = {
    def collapse(s: String) = s.replaceAll(" +", " ").trim
    val blockStats = p.blocks.map { b =>
      val vis = collapse(b.elems.map {
        case Text(s) => s
        case Anchor(_, t) => " " + t + " "
        case AttrAnchor(_, t) => " " + t + " "
        case BareAnchor(t) => " " + t + " "
        case Wrapped(_, s) => " " + s + " "
      }.mkString)
      // anchor MASS counts every <a …>text</a> regardless of href — the
      // link-density rule measures linkiness, not pairability
      val anchor = b.elems.collect {
        case Anchor(_, t) => t.length
        case AttrAnchor(_, t) => t.length
        case BareAnchor(t) => t.length
      }.sum
      (vis, anchor)
    } ++ (if (collapse(p.stray).nonEmpty) Seq((collapse(p.stray), 0)) else Nil)
    blockStats.filter(_._1.nonEmpty)
  }

  /** The MAIN-CONTENT semantics ([[graft.ext.Html.mainContentSummary]])
    * from the AST: the q204 keep legs plus the stopword-density leg
    * (stop*100 >= words*minStopPct, case-insensitive membership). */
  def modelMain(p: Page, minLen: Int = 10, minStopPct: Int = 6): PageModel = {
    val rendered = blockVisAnchor(p)
    val kept = rendered.filter { case (v, a) =>
      val words = v.split(" ").filter(_.nonEmpty)
      val stops = words.count(w =>
        graft.ext.Html.DefaultStopwords.contains(w.toLowerCase))
      v.length >= minLen && a * 3 <= v.length &&
        stops * 100 >= words.length * minStopPct
    }
    PageModel(
      nBlocks = rendered.length.toLong,
      nKept = kept.length.toLong,
      keptChars = kept.map(_._1.length.toLong).sum,
      totalChars = rendered.map(_._1.length.toLong).sum,
      extracted = kept.map(_._1).mkString("\n"))
  }
}
