"""Round-9 operators: HTML/markup -> text extraction (intake edge),
langid wired through mixture + the composed curation run, MJPEG-in-AVI
frame sampling, langid capacity ladder, streaming shard ingest.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.oracle_util import compare_to_oracle, duckdb_conn


def _formatted_plan(spark, df) -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


# ---------------------------------------------------------------------------
# HTML -> text extraction (VERDICT r8 ask #1)
# ---------------------------------------------------------------------------


class TestHtmlExtraction:
    def test_oracle_parity_smoke(self, spark, sf_smoke):
        from map_reduce_framework_spark.registry import REGISTRY

        con = duckdb_conn(sf_smoke)
        for name in ("extract_text", "extraction_report"):
            q = REGISTRY[name]
            compare_to_oracle(q.fn(spark, sf_smoke), con, q.oracle)

    def test_main_content_preserved_byte_exactly(self, spark, sf_smoke):
        """The done-criterion: on the crafted corpus, extraction removes
        every planted boilerplate line (nav/ad/footer/title/script/
        style/comment) and returns the document text BYTE-EXACTLY,
        followed by the entity-decoded summary line."""
        from map_reduce_framework_spark.operators import html_extract as H

        docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
        got = {
            r["doc_id"]: r["extracted_text"]
            for r in H.extract_text(docs).collect()
        }
        for r in docs.select("doc_id", "text").collect():
            want = r["text"] + "\n" + 'summary: "maps & reduces" reference sheet'
            assert got[r["doc_id"]] == want, r["doc_id"]

    def test_planted_boilerplate_accounting(self, spark, sf_smoke):
        """extraction_report exposes the boilerplate mass: every crafted
        page has the same line skeleton (2 kept content lines), nonzero
        link chars from nav/ad/footer anchors, and extracted text
        strictly smaller than the page."""
        from map_reduce_framework_spark.operators import html_extract as H

        docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
        rows = H.extraction_report(docs).collect()
        assert len(rows) == docs.count()
        for r in rows:
            assert r["n_kept"] == 2, r
            assert r["n_lines"] > r["n_kept"], r
            # nav(3) + ad(1) + footer(2) anchors: home page|about us
            # page|contact|buy the thing now|terms of service|privacy
            # policy = 9+13+7+17+16+14
            assert r["n_link_chars"] == 76, r
            assert 0 < r["n_chars_text"] < r["n_chars_html"], r

    def test_extraction_is_shuffle_free(self, spark, sf_smoke):
        """Step 0 of a 100 TB crawl pipeline must be scan-bound map
        work: no hash/range exchange anywhere (the only exchange is the
        round-robin spread of the single-file test scan)."""
        from map_reduce_framework_spark.operators import html_extract as H

        docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
        for df in (H.extract_text(docs), H.extraction_report(docs)):
            plan = _formatted_plan(spark, df)
            assert "hashpartitioning" not in plan, plan
            assert "rangepartitioning" not in plan, plan
            assert plan.count("Exchange (") <= 1, plan

    def test_composes_with_rule_funnel(self, spark, sf_smoke):
        """The composition a real crawl pipeline runs: extraction output
        feeds the existing gopher rule funnel, and the measures come
        out equal to running the funnel on the original clean text
        modulo the one constant summary line -- while the RAW pages'
        measures are visibly markup-polluted (the '#' in the planted
        stylesheet drives symbol_word_ratio > 0 on every page;
        extraction restores it to the clean corpus's exact 0)."""
        from map_reduce_framework_spark.operators import html_extract as H
        from map_reduce_framework_spark.operators.text_analysis import (
            gopher_quality_filter,
        )

        docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
        pages = H.html_corpus(docs)

        def measures(df, col):
            g = gopher_quality_filter(
                df.select("doc_id", F.col(col).alias("text"))
            )
            return {
                r["doc_id"]: r
                for r in g.select(
                    "doc_id", "n_words", "symbol_word_ratio"
                ).collect()
            }

        raw = measures(pages, "html")
        ext = measures(H.extract_text_from(pages), "extracted_text")
        clean = measures(docs, "text")
        # summary: "maps & reduces" reference sheet -> 6 ws-words
        for doc_id, c in clean.items():
            assert ext[doc_id]["n_words"] == c["n_words"] + 6
            assert ext[doc_id]["symbol_word_ratio"] == 0.0
            assert raw[doc_id]["symbol_word_ratio"] > 0.0  # style #333
            assert raw[doc_id]["n_words"] != c["n_words"]

    def test_malformed_html_never_raises(self, spark):
        """Crawl data is hostile: unclosed tags, bare ampersands, stray
        sentinel-free anchors, nested anchors, empty pages -- the
        extractor is total (returns SOME string for every input)."""
        from map_reduce_framework_spark.operators import html_extract as H

        cases = [
            (1, ""),
            (2, "<"),
            (3, "no markup at all just a plain long sentence of text"),
            (4, "<div><p>unclosed everywhere <a href=x>link"),
            (5, "<a><a>nested anchors here</a></a> trailing & bare amp"),
            (6, "<script>while(1){}"),
            (7, "<p>" + "x" * 50000 + "</p>"),
        ]
        pages = spark.createDataFrame(cases, "doc_id long, html string")
        rows = H.extract_text_from(pages).collect()
        assert len(rows) == len(cases)
        by_id = {r["doc_id"]: r["extracted_text"] for r in rows}
        assert by_id[3].startswith("no markup")
        assert by_id[7] == "x" * 50000
