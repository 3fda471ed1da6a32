package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.CatalogScraper

/** E4 analog: dataset-catalog scraping as pure kernels + DataFrame ops. */
class CatalogScraperSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def card(title: String, href: String) =
    s"""<div class="card"><h3><strong>$title</strong></h3>
       |<p>some blurb</p>
       |<a class="wpdm-download-link btn" data-downloadurl="$href" href="#">Download</a>
       |</div>""".stripMargin

  private val page =
    s"""<html><body>
       |${card("OTB 1995&#8211;2009", "/dl?id=1&amp;k=x")}
       |${card("Online 2026-02", "https://cdn.example.org/dl2")}
       |${card("OTB 1995-2009", "/dl-dup")}
       |${card("Monthly newsletter", "/not-a-dataset")}
       |${card("Online Partial Release 2024", "/dl3")}
       |${card("OTB nodate", "/dl4")}
       |<a class="other-link" data-downloadurl="/skipped">x</a>
       |</body></html>""".stripMargin

  test("key derivation: prefix classify + year forms (F12)") {
    assert(CatalogScraper.deriveKey("OTB 1995-2009") ==
      Some(("lumbras_otb_1995_2009", "OTB")))
    assert(CatalogScraper.deriveKey("Online 2025") ==
      Some(("lumbras_online_2025", "Online")))
    assert(CatalogScraper.deriveKey("online 2026-02") ==
      Some(("lumbras_online_2026_02", "Online")))
    assert(CatalogScraper.deriveKey("OTB NoDate") ==
      Some(("lumbras_otb_nodate", "OTB")))
    assert(CatalogScraper.deriveKey("Online Partial Release 2024") ==
      Some(("lumbras_online_2024_partial", "Online")))
    assert(CatalogScraper.deriveKey("Online partial release") ==
      Some(("lumbras_online_partial", "Online")))
    // en/em dash + entity forms normalize before matching (F11)
    assert(CatalogScraper.deriveKey("OTB 1995&#8211;2009") ==
      Some(("lumbras_otb_1995_2009", "OTB")))
    assert(CatalogScraper.deriveKey("Grand Prix 2024") == None)
    assert(CatalogScraper.deriveKey("OTB sometime") == None)
  }

  test("link extraction: class filter, entity-decoded URL resolution, lookback title (F13)") {
    val links = CatalogScraper.extractLinks(page, "https://example.com/en/downloads/")
    assert(links.map(_.key) == Seq(
      "lumbras_otb_1995_2009", "lumbras_online_2026_02", "lumbras_otb_1995_2009",
      "lumbras_online_2024_partial", "lumbras_otb_nodate"))
    // &amp; decoded, relative href resolved against the page URL
    assert(links.head.downloadUrl == "https://example.com/dl?id=1&k=x")
    assert(links(1).downloadUrl == "https://cdn.example.org/dl2")
    assert(links.head.title == "OTB 1995-2009")
  }

  test("datasets table: first-wins dedupe by key in document order + key sort (A4/W2)") {
    val pages = Seq(("https://example.com/en/downloads/", page)).toDF("page_url", "html")
    val ds = CatalogScraper.datasets(pages).collect()
    assert(ds.map(_.getAs[String]("key")).toSeq == Seq(
      "lumbras_online_2024_partial", "lumbras_online_2026_02",
      "lumbras_otb_1995_2009", "lumbras_otb_nodate"))
    // the duplicate OTB 1995-2009 kept the FIRST occurrence (the entity form's URL)
    val dup = ds.find(_.getAs[String]("key") == "lumbras_otb_1995_2009").get
    assert(dup.getAs[String]("download_url") == "https://example.com/dl?id=1&k=x")
  }

  test("anti-join vs registered keys (P6) + YAML emission") {
    val pages = Seq(("https://example.com/", page)).toDF("page_url", "html")
    val registered = CatalogScraper.existingKeys(
      """sources:
        |  lumbras_otb_1995_2009:
        |    mega: "abc#def"
        |  lumbras_otb_nodate:
        |not_a_key_line: true
        |""".stripMargin)
    assert(registered == Seq("lumbras_otb_1995_2009", "lumbras_otb_nodate"))
    val fresh = CatalogScraper.newDatasets(
      CatalogScraper.datasets(pages), registered.toDF("key"))
      .collect().map(_.getAs[String]("key")).toSeq
    assert(fresh == Seq("lumbras_online_2024_partial", "lumbras_online_2026_02"))

    val yaml = CatalogScraper.toYaml(Seq(
      ("lumbras_online_2026_02", "Online", "FILE1#KEY1"),
      ("lumbras_otb_2025", "OTB", "FILE2#KEY2")))
    assert(yaml ==
      """  # Online datasets
        |  lumbras_online_2026_02:
        |    mega: "FILE1#KEY1"
        |    category: "Online"
        |
        |  # OTB datasets
        |  lumbras_otb_2025:
        |    mega: "FILE2#KEY2"
        |    category: "OTB"
        |""".stripMargin)
  }

  test("MEGA key parse from a redirect Location") {
    assert(CatalogScraper.resolveMegaKey(
      "https://mega.nz/file/AbC123#k-e_y?x=1") == Some("AbC123#k-e_y"))
    assert(CatalogScraper.resolveMegaKey("https://elsewhere.example/f") == None)
  }
}
