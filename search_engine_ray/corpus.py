"""Deterministic synthetic Common-Crawl-style page corpus + query set.

Produces the ``input_hint`` table shape exactly:
``url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string``
where ``text`` is the expected extraction of ``html`` **by construction**
(built from the same token structure the HTML is rendered from), making it
the byte-identity golden the extract stage is tested against
(BASELINE.json input_hint; SURVEY.md §5.1).

Three generators:

- :func:`tiny_fixture_pages` — ~30 handcrafted edge-case docs (SURVEY.md §5.1
  checklist: nbsp, Russian hyphen words, stop-POS words, entities, emoji,
  scripts/styles, duplicate urls differing in warc_ts, empty pages, snippet
  spoiler / adjacent-match material, per-site term asymmetry).
- :func:`synth_pages_table` — seeded bulk generator for e2e/resume/bench runs.
- :func:`pages_from_documents` — wraps the driver's ``documents`` table
  (``/root/testdata/sf*/documents.parquet``) into HTML pages so the flagship
  pipeline can run over driver-provided data without synthesizing content.

Everything is seeded; no wall-clock, no external data.
"""

from __future__ import annotations

import datetime as _dt
import html as _html

import numpy as np
import pyarrow as pa

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

_EPOCH = _dt.datetime(2024, 1, 1)

EN_WORDS = (
    "search engine index query page site word text data build run running "
    "ranking score relevance token term document corpus crawl link html "
    "fast slow big small test tests testing city cities child children "
    "value table column batch stream shuffle sort hash merge block".split()
)
RU_WORDS = (
    "поиск система индекс запрос страница сайт слово текст данные лемма "
    "кто-то что-то какой-то бегала столами программа быстро медленно "
    "результат документ ссылка значение таблица столбец поток сортировка".split()
)
STOP_EN = "of in at was be on with from".split()
STOP_RU = "и в не на с по для же".split()


def _ts(i: int) -> _dt.datetime:
    return _EPOCH + _dt.timedelta(seconds=int(i))


def _page_html(title: str, paragraphs: list[str], links: list[str] = ()) -> tuple[str, str]:
    """Render (html, expected_text) from a shared structure.

    Expected text per the frozen extraction spec: title and paragraph texts
    separated by single spaces (block boundaries), whitespace collapsed,
    entities decoded, nbsp preserved.
    """
    esc_title = _html.escape(title).replace("\xa0", "&nbsp;")
    body_parts = []
    for p in paragraphs:
        body_parts.append(f"<p>{_html.escape(p).replace(chr(160), '&nbsp;')}</p>")
    for href in links:
        body_parts.append(f'<a href="{href}">link</a>')
    doc = (
        f"<html><head><title>{esc_title}</title>\n"
        f"<style>body {{margin:0}}</style><script>var skip=1;</script></head>\n"
        f"<body>\n{chr(10).join(body_parts)}\n</body></html>"
    )
    import re

    pieces = [title] + list(paragraphs) + ["link"] * len(links)
    expected = " ".join(re.sub(r"[ \t\r\n\f\x0b]+", " ", p).strip(" \t\r\n\f\x0b") for p in pieces if p)
    expected = re.sub(r"[ \t\r\n\f\x0b]+", " ", expected).strip(" \t\r\n\f\x0b")
    return doc, expected


def tiny_fixture_pages() -> pa.Table:
    """Handcrafted edge-case corpus (3 sites) with by-construction goldens."""
    rows: list[tuple[str, _dt.datetime, str, str, str]] = []
    i = 0

    def add(url: str, title: str, paras: list[str], lang: str, links=()):
        nonlocal i
        html_s, text = _page_html(title, paras, links)
        rows.append((url, _ts(i), html_s, text, lang))
        i += 1

    s0, s1, s2 = "https://site0.example", "https://site1.example", "https://site2.example"

    add(f"{s0}/", "Site Zero Home", ["search engine index page", "running tests for cities"], "en",
        links=["/about", "/a?x=1"])
    add(f"{s0}/about", "About Us", ["the search engine builds an index of every page"], "en")
    add(f"{s0}/a?x=1", "Query Param Page", ["query parameters are stripped from paths"], "en")
    add(f"{s0}/b/", "Trailing Slash", ["trailing slashes are normalized away"], "en")
    add(f"{s0}/C/D", "Mixed Case", ["mixed case paths become lowercase"], "en")
    # duplicate url, older warc_ts first — latest must win
    add(f"{s0}/dup", "Old Version", ["stale duplicate page content"], "en")
    add(f"{s0}/dup", "New Version", ["fresh duplicate page content wins"], "en")
    # nbsp glue: "glued\xa0words" survive splitting in the indexer and are
    # dropped; the snippet splitter separates them (LemmasFinder.java:108,261)
    add(f"{s0}/nbsp", "Nbsp Page", ["glued\xa0words here", "normal words here"], "en")
    add(f"{s0}/empty", "", [], "en")
    add(f"{s0}/digits", "Digits", ["test42 2024 x1y plain44word clean words"], "en")
    add(f"{s0}/emoji", "Emoji \U0001f600 Title", ["four byte utf8 \U0001f680 works fine"], "en")
    # long paragraph with many matches -> snippet spoiler (>270 chars)
    add(f"{s0}/spoiler", "Spoiler Page",
        ["needle " + "filler word context area " * 20 + "needle again and needle once more",
         "needle needle adjacent matches merge here"], "en")
    add(f"{s0}/shared", "Shared Term", ["zebra quartz shared vocabulary"], "en")

    add(f"{s1}/", "Сайт Один", ["поиск система индекс страница", "кто-то бегала быстро"], "ru")
    add(f"{s1}/morph", "Морфология", ["столами столы стол", "и в не на с по для же частицы"], "ru")
    add(f"{s1}/mixed", "Mixed Языки", ["search поиск engine система mixed"], "mixed")
    add(f"{s1}/shared", "Общий Термин", ["zebra vocabulary appears here too"], "en")
    # 'quartz' deliberately absent on site1 (SearchServiceImpl.java:126)

    add(f"{s2}/", "Site Two Root", ["stopwords of in at was be on with from survive nothing"], "en")
    add(f"{s2}/rich", "Rich Content", ["zebra quartz zebra quartz zebra high frequency page"], "en")
    add(f"{s2}/plain", "Plain", ["zebra once only"], "en")
    add(f"{s2}/unsupported", "Unsupported", ["日本語 テキスト 漢字"], "other")

    urls, tss, htmls, texts, langs = zip(*rows)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array([h.encode() for h in htmls], pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


FIXTURE_QUERIES: list[dict] = [
    # (SURVEY.md §5.1: single term, multi-term AND, duplicate words,
    #  stop-only, missing-on-one-site, russian, pagination)
    {"query_id": 0, "query": "zebra", "site": None, "limit": 20, "offset": 0},
    {"query_id": 1, "query": "zebra quartz", "site": None, "limit": 20, "offset": 0},
    {"query_id": 2, "query": "zebra zebra quartz", "site": None, "limit": 20, "offset": 0},
    {"query_id": 3, "query": "of in at", "site": None, "limit": 20, "offset": 0},
    {"query_id": 4, "query": "needle", "site": None, "limit": 20, "offset": 0},
    {"query_id": 5, "query": "поиск система", "site": None, "limit": 20, "offset": 0},
    {"query_id": 6, "query": "zebra", "site": "https://site2.example", "limit": 20, "offset": 0},
    {"query_id": 7, "query": "zebra", "site": None, "limit": 2, "offset": 1},
    {"query_id": 8, "query": "zebra", "site": None, "limit": 2, "offset": 99},
    {"query_id": 9, "query": "vocabulary zebra", "site": None, "limit": 20, "offset": 0},
    {"query_id": 10, "query": "кто-то", "site": None, "limit": 20, "offset": 0},
    {"query_id": 11, "query": "nonexistentterm", "site": None, "limit": 20, "offset": 0},
    {"query_id": 12, "query": "running test", "site": None, "limit": 20, "offset": 0},
]


def synth_pages_table(num_docs: int, seed: int = 42, num_sites: int = 10,
                      words_per_doc: int = 120, dup_every: int = 50,
                      start: int = 0) -> pa.Table:
    """Seeded bulk corpus: zipf-ish word draws over EN+RU vocab, URL edge
    cases sprinkled in, one duplicate url per ``dup_every`` docs.
    ``start`` offsets doc numbering so sharded generation yields disjoint
    urls (doc ``d`` of this table is global doc ``start + d``)."""
    rng = np.random.RandomState(seed)
    vocab = EN_WORDS + STOP_EN
    vocab_ru = RU_WORDS + STOP_RU
    # zipf-ish rank weights
    w_en = 1.0 / np.arange(1, len(vocab) + 1)
    w_en /= w_en.sum()
    w_ru = 1.0 / np.arange(1, len(vocab_ru) + 1)
    w_ru /= w_ru.sum()

    urls, tss, htmls, texts, langs = [], [], [], [], []
    for d in range(start, start + num_docs):
        site = f"https://site{d % num_sites}.example"
        is_ru = (d % 7) == 3
        voc, w = (vocab_ru, w_ru) if is_ru else (vocab, w_en)
        n = int(words_per_doc * (0.5 + rng.rand()))
        words = list(rng.choice(voc, size=n, p=w))
        title = " ".join(words[: max(2, min(6, n))]).title()
        paras = [" ".join(words[i: i + 40]) for i in range(0, n, 40)]
        suffix = "?utm=1" if d % 97 == 5 else ("/" if d % 31 == 7 else "")
        url = f"{site}/doc/{d}{suffix}"
        if dup_every and d % dup_every == dup_every - 1:
            url = f"{site}/doc/{d - 1}"  # duplicate of the previous doc's url
        html_s, text = _page_html(title, paras)
        urls.append(url)
        tss.append(_ts(d))
        htmls.append(html_s.encode())
        texts.append(text)
        langs.append("ru" if is_ru else "en")
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def documents_to_pages_batch(batch: pa.Table) -> pa.Table:
    """Wrap driver ``documents`` rows (doc_id, text, lang, source) into the
    input_hint page shape — vectorized enough (string ops per row are cheap
    relative to the downstream parse).  site = source, one page per doc."""
    doc_ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    langs = batch["lang"].to_pylist()
    sources = batch["source"].to_pylist()
    urls, tss, htmls, out_texts = [], [], [], []
    for did, text, src in zip(doc_ids, texts, sources):
        # empty title: the page text must tokenize EXACTLY like the source
        # documents.text (title words would pollute tf/df oracle parity)
        html_s, expected = _page_html("", [text or ""])
        urls.append(f"https://{src}.example/doc/{did}")
        tss.append(_ts(did))
        htmls.append(html_s.encode())
        out_texts.append(expected)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(out_texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            # passthrough: lets index consumers join back to the source table
            "src_doc_id": pa.array(doc_ids, pa.int64()),
        }
    )


def pages_from_documents(sf_dir: str):
    """Lazy Dataset of input_hint pages derived from the driver's documents
    table — streams, never materializes the corpus on the driver."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "lang", "source"])
    return ds.map_batches(documents_to_pages_batch, batch_format="pyarrow")
