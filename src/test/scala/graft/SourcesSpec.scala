package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.TextSources

/** S3/S8: URL-list text source (blank-line skipping) and sink round-trip. */
class SourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("url list source skips blanks; sink round-trips") {
    val dir = Files.createTempDirectory("graft_urls")
    Files.writeString(Paths.get(s"$dir/urls.txt"),
      "https://x/a\n\n  \nhttps://x/b\n")
    val urls = TextSources.readUrlList(spark, s"$dir/urls.txt")
    assert(urls.collect().toSeq == Seq("https://x/a", "https://x/b"))
    TextSources.writeUrlList(urls.toDF(), s"$dir/out")
    assert(TextSources.readUrlList(spark, s"$dir/out").count() == 2)
  }
}
