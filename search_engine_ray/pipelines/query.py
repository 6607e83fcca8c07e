"""Query side: segment readers, reference scorer, BM25 + block-max WAND.

Re-expresses ``GET /api/search`` (``services/SearchServiceImpl.java``,
SURVEY.md §3.3) over the partitioned segments that the build pipeline wrote.

Two scorers behind one interface (SURVEY.md §2.9):

- ``reference``: the reference's exact semantics — conjunctive AND over the
  query's lemma set, ``abs_rel = Σ tf`` (``SearchServiceImpl.java:152-180``),
  normalized by the global max (``:182-195``), sorted (rel desc, doc_id asc
  — the deterministic tie-break the reference lacks, SURVEY.md §4.1),
  paginated (``:197-237``).  SQL-expressible; powers the DuckDB oracle and
  the rank-identity suite.
- ``bm25``: Lucene-style BM25 (idf = ln(1 + (N-df+0.5)/(df+0.5))) with
  block-max WAND pruning over the compressed postings (north rule), verified
  pruned-vs-exhaustive.  Block upper bounds need no build-time corpus stats:
  ``score(tf, dl)`` is increasing in tf and decreasing in dl, so
  ``ub(block) = idf * score(block_max_tf, block_min_dl)``.

Because a document's postings all live in exactly one partition
(doc-partitioned segments), conjunctive intersection and top-k run per
partition and merge trivially; the shared heap threads the WAND threshold
across partitions so later partitions prune harder.

The per-site "all lemmas present" filter (``SearchServiceImpl.java:126``) is
provably redundant for result CORRECTNESS (a doc containing all lemmas
implies its site has them all); it is retained as the pruning step
``_sites_with_all_terms`` for site-scoped queries only.
"""

from __future__ import annotations

import heapq
import math
import os
from bisect import bisect_left
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..config import Bm25Params, SearchSettings
from ..functions.codec import EncodedPostings, decode_block_docids, decode_block_tfs, decode_postings
from ..functions.morphology import get_morphology
from ..functions.snippets import get_snippet
from ..stages.lemmatize import lemmas_of_query
from .build import GLOBAL_DICT_DIR, load_corpus_stats

DOC_ID_PART_SHIFT = 40


@dataclass
class SearchHit:
    doc_id: int
    score: float
    url: str = ""
    site: str = ""
    site_name: str = ""  # reference SearchData.siteName (configured display name)
    path: str = ""
    title: str = ""
    snippet: str = ""


@dataclass
class SearchResponse:
    """Reference ``dto/search/SearchResponse.java:15-23`` shape."""

    result: bool
    count: int = 0
    data: list[SearchHit] = field(default_factory=list)
    error: str = ""


class SegmentReader:
    """One partition's postings + doc metadata.

    ``preload=False`` (the scale path) reads only the requested terms' rows
    via parquet predicate pushdown per query; ``preload=True`` pins the whole
    postings table in memory for latency benchmarks — segment sizing keeps
    that bounded (IndexBuildConfig.target_docs_per_partition).
    """

    def __init__(self, part_dir: str, preload: bool = False) -> None:
        self.part_dir = part_dir
        self._postings_path = os.path.join(part_dir, "postings.parquet")
        self._docs_path = os.path.join(part_dir, "docs.parquet")
        meta = pq.read_table(self._docs_path,
                             columns=["doc_id", "doc_len", "site"])
        self.doc_ids = meta["doc_id"].to_numpy()
        self.doc_lens = meta["doc_len"].to_numpy().astype(np.int64)
        self.sites = np.asarray(meta["site"].to_pylist(), dtype=object)
        self.base = int(self.doc_ids[0]) if len(self.doc_ids) else 0
        self._cache: dict[str, EncodedPostings | None] = {}
        self._table = None
        if preload:
            self._table = pq.read_table(self._postings_path)
            self._term_index = {t: i for i, t in enumerate(self._table["term"].to_pylist())}

    def _row_to_enc(self, row: dict) -> EncodedPostings:
        return EncodedPostings(
            df=row["df"],
            doc_ids=row["doc_ids"],
            tfs=row["tfs"],
            block_last_docid=np.array(row["block_last_docid"], np.int64),
            block_off_docs=np.array(row["block_off_docs"], np.int64),
            block_off_tfs=np.array(row["block_off_tfs"], np.int64),
            block_max_tf=np.array(row["block_max_tf"], np.int32),
            block_min_dl=np.array(row["block_min_dl"], np.int32),
            block_first_docid=np.array(row["block_first_docid"], np.int64),
        )

    def postings(self, term: str) -> EncodedPostings | None:
        if term in self._cache:
            return self._cache[term]
        if self._table is not None:
            i = self._term_index.get(term)
            enc = self._row_to_enc(self._table.slice(i, 1).to_pylist()[0]) if i is not None else None
        else:
            t = pq.read_table(self._postings_path,
                              filters=[("term", "=", term)])
            enc = self._row_to_enc(t.to_pylist()[0]) if t.num_rows else None
        self._cache[term] = enc
        return enc

    def doc_len(self, doc_id: int) -> int:
        return int(self.doc_lens[doc_id - self.base])

    def site_mask(self, site: str) -> np.ndarray:
        return self.sites == site

    def doc_meta(self, doc_ids: list[int], with_text: bool) -> dict[int, dict]:
        cols = ["doc_id", "url", "site", "path", "title"]
        if with_text:
            cols.append("whole_text")
        t = pq.read_table(self._docs_path, columns=[c for c in cols
                                                    if c in pq.read_schema(self._docs_path).names])
        t = t.filter(pc.is_in(t["doc_id"], value_set=pa.array(doc_ids)))
        return {r["doc_id"]: r for r in t.to_pylist()}


class IndexReader:
    """Whole-index handle: corpus stats, global dictionary, segment readers.

    Load once per process/actor (reference ST5); cheap to construct
    (metadata only), postings stream in per query.
    """

    # Σ df(query terms) / part_docs above which bm25_topk switches from
    # block-max WAND to the vectorized exhaustive kernel (see dispatch note)
    dense_cutoff: float = 0.05

    def __init__(self, index_dir: str, preload: bool = False,
                 parts: list[int] | None = None) -> None:
        self.index_dir = index_dir
        self.stats = load_corpus_stats(index_dir)
        gd = pq.read_table(os.path.join(index_dir, GLOBAL_DICT_DIR))
        self.global_df = dict(zip(gd["term"].to_pylist(),
                                  (int(x) for x in gd["df"].to_pylist())))
        self._preload = preload
        self._readers: dict[int, SegmentReader] = {}
        # ``parts`` restricts this reader to a partition subset — the unit a
        # scatter/gather searcher actor owns (pipelines/scatter.py); corpus
        # stats (N, avgdl, global df) stay GLOBAL so BM25 scores are
        # identical no matter how partitions are sharded across actors.
        all_parts = self.stats["parts"]
        self.parts: list[int] = (all_parts if parts is None
                                 else [p for p in all_parts if p in set(parts)])

    def reader(self, part: int) -> SegmentReader:
        r = self._readers.get(part)
        if r is None:
            r = SegmentReader(os.path.join(self.index_dir, f"part={part:05d}"),
                              preload=self._preload)
            self._readers[part] = r
        return r

    # ------------------------------------------------------------------
    # reference scorer (SearchServiceImpl.java:77-237 semantics)
    # ------------------------------------------------------------------

    def search(
        self,
        query: str,
        *,
        site: str | None = None,
        limit: int | None = None,
        offset: int | None = None,
        morphology: str = "default",
        scorer: str = "reference",
        with_snippets: bool = True,
        settings: SearchSettings | None = None,
        bm25: Bm25Params | None = None,
    ) -> SearchResponse:
        settings = settings or SearchSettings()
        limit = settings.default_limit if limit is None else limit
        offset = settings.default_offset if offset is None else offset
        # validation order per SearchServiceImpl.java:78-86
        if query is None or not query.strip():
            return SearchResponse(result=False, error="empty query")
        if limit <= 0:
            return SearchResponse(result=False, error="limit must be positive")
        if offset < 0:
            return SearchResponse(result=False, error="offset must be non-negative")

        lemmas = lemmas_of_query(query, morphology)
        if not lemmas:
            return SearchResponse(result=True, count=0, data=[])

        # site-scoped pruning (reference J2, SearchServiceImpl.java:126):
        # a site is dropped unless ALL query lemmas exist in its dictionary —
        # redundant for correctness (every match implies coverage) but it
        # skips posting decode entirely when the scoped site lacks a term
        if site is not None:
            ok = self._sites_with_all_terms(lemmas)
            if site not in ok:
                return SearchResponse(result=True, count=0, data=[])

        if scorer == "reference":
            doc_ids, scores = self._reference_scores(lemmas, site)
            count = len(doc_ids)
            if count == 0:
                return SearchResponse(result=True, count=0, data=[])
            rel = scores / scores.max()
            order = np.lexsort((doc_ids, -rel))  # rel desc, doc_id asc
            ranked_ids, ranked_scores = doc_ids[order], rel[order]
        elif scorer == "bm25":
            hits = self.bm25_topk(lemmas, k=offset + limit, site=site,
                                  params=bm25 or Bm25Params())
            # count semantics (total matches) require the exhaustive match
            # count; WAND gives top-k only — count the union cheaply
            count = self._match_count(lemmas, site)
            ranked_ids = np.array([h[1] for h in hits], np.int64)
            ranked_scores = np.array([h[0] for h in hits], np.float64)
        else:
            raise ValueError(f"unknown scorer {scorer!r}")

        page_ids = ranked_ids[offset: offset + limit]
        page_scores = ranked_scores[offset: offset + limit]
        data = self._assemble(page_ids, page_scores, set(lemmas),
                              morphology, with_snippets, settings)
        return SearchResponse(result=True, count=count, data=data)

    def _site_term_sets(self, lemmas: list[str]) -> dict[str, set[str]]:
        """site -> subset of ``lemmas`` present in that site's dictionary,
        over THIS reader's partitions (mergeable by set-union across
        partition-range searchers)."""
        per_site: dict[str, set[str]] = {}
        for part in self.parts:
            path = os.path.join(self.index_dir, f"part={part:05d}", "dict.parquet")
            t = pq.read_table(path, columns=["site", "term"])
            t = t.filter(pc.is_in(t["term"], value_set=pa.array(lemmas)))
            for s, term in zip(t["site"].to_pylist(), t["term"].to_pylist()):
                per_site.setdefault(s, set()).add(term)
        return per_site

    def _sites_with_all_terms(self, lemmas: list[str]) -> set[str]:
        """Site-level pruning via per-part dict.parquet (reference J2)."""
        return {s for s, ts in self._site_term_sets(lemmas).items()
                if len(ts) == len(lemmas)}

    def _reference_scores(self, lemmas: list[str], site: str | None
                          ) -> tuple[np.ndarray, np.ndarray]:
        """Conjunctive intersection + tf sum, vectorized per partition.

        Terms iterate rarest-first (ascending global df) like
        ``SearchServiceImpl.java:157`` — the early-exit optimisation, not a
        semantic requirement.
        """
        missing = [t for t in lemmas if t not in self.global_df]
        if missing:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        ordered = sorted(lemmas, key=lambda t: self.global_df[t])
        all_ids: list[np.ndarray] = []
        all_scores: list[np.ndarray] = []
        for part in self.parts:
            rd = self.reader(part)
            cur_ids: np.ndarray | None = None
            cur_sum: np.ndarray | None = None
            for term in ordered:
                enc = rd.postings(term)
                if enc is None:
                    cur_ids = None
                    break
                ids, tfs = decode_postings(enc)
                if cur_ids is None:
                    cur_ids, cur_sum = ids, tfs.astype(np.float64)
                else:
                    common, ia, ib = np.intersect1d(cur_ids, ids,
                                                    assume_unique=True,
                                                    return_indices=True)
                    if common.size == 0:
                        cur_ids = None
                        break
                    cur_ids = common
                    cur_sum = cur_sum[ia] + tfs[ib].astype(np.float64)
            if cur_ids is None or cur_ids.size == 0:
                continue
            if site is not None:
                mask = rd.sites[cur_ids - rd.base] == site
                cur_ids, cur_sum = cur_ids[mask], cur_sum[mask]
                if cur_ids.size == 0:
                    continue
            all_ids.append(cur_ids)
            all_scores.append(cur_sum)
        if not all_ids:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        return np.concatenate(all_ids), np.concatenate(all_scores)

    def _match_count(self, lemmas: list[str], site: str | None) -> int:
        ids, _ = self._reference_scores(lemmas, site)
        return int(ids.size)

    # ------------------------------------------------------------------
    # BM25 + block-max WAND
    # ------------------------------------------------------------------

    def idf(self, term: str) -> float:
        df = self.global_df.get(term, 0)
        n = self.stats["n_docs"]
        return math.log(1.0 + (n - df + 0.5) / (df + 0.5))

    def bm25_topk(self, lemmas: list[str], k: int, *, site: str | None = None,
                  params: Bm25Params | None = None, pruned: bool = True,
                  floor: float = -math.inf) -> list[tuple[float, int]]:
        """Top-k (score, doc_id), ordered score desc then doc_id asc.

        Disjunctive (standard BM25 top-k).  ``pruned=False`` runs the
        exhaustive scorer — the verification oracle for WAND.

        ``floor``: externally known lower bound on the global k-th score
        (scatter/gather threshold propagation: a subset's k-th best never
        exceeds the global k-th best, so another partition range's k-th
        score is a valid floor).  Docs scoring < floor are pruned; the
        global merge still yields the identical top-k.
        """
        params = params or Bm25Params()
        idfs = {t: self.idf(t) for t in lemmas if t in self.global_df}
        if not idfs:
            return []
        # heap of (score, -doc_id): the min element is the current worst;
        # an external floor only PRUNES (it never enters the heap)
        heap: list[tuple[float, int]] = []
        for part in self.parts:
            rd = self.reader(part)
            if pruned and site is None:
                # density dispatch: block-max WAND wins only when the query
                # terms are selective enough for skipping to pay for the
                # per-posting cursor walk; for dense (stopword-class) terms
                # the vectorized exhaustive kernel is an order of magnitude
                # faster and returns the identical top-k.  Postings are
                # cached in the reader, so this probe costs nothing extra.
                tot_df = sum(e.df for e in (rd.postings(t) for t in idfs)
                             if e is not None)
                if tot_df >= max(4096, self.dense_cutoff * len(rd.doc_ids)):
                    self._exhaustive_part(rd, idfs, k, params, heap,
                                          floor=floor)
                else:
                    self._wand_part(rd, idfs, k, params, heap, floor=floor)
            else:
                self._exhaustive_part(rd, idfs, k, params, heap, site,
                                      floor=floor)
        out = sorted(heap, key=lambda x: (-x[0], -x[1]))
        return [(s, -negid) for s, negid in out][:k]

    def _bm25_score(self, idf: float, tf, dl, params: Bm25Params):
        dl_norm = params.k1 * (1.0 - params.b + params.b * dl / max(self.stats["avgdl"], 1e-9))
        return idf * (tf * (params.k1 + 1.0)) / (tf + dl_norm)

    def _exhaustive_part(self, rd: SegmentReader, idfs: dict[str, float],
                         k: int, params: Bm25Params,
                         heap: list[tuple[float, int]],
                         site: str | None = None, *,
                         floor: float = -math.inf) -> None:
        ids_all, contrib_all = [], []
        for term, idf in idfs.items():
            enc = rd.postings(term)
            if enc is None:
                continue
            ids, tfs = decode_postings(enc)
            dls = rd.doc_lens[ids - rd.base]
            ids_all.append(ids)
            contrib_all.append(self._bm25_score(idf, tfs.astype(np.float64), dls.astype(np.float64), params))
        if not ids_all:
            return
        ids = np.concatenate(ids_all)
        contrib = np.concatenate(contrib_all)
        uniq, inv = np.unique(ids, return_inverse=True)
        scores = np.zeros(uniq.size, np.float64)
        np.add.at(scores, inv, contrib)
        if site is not None:
            mask = rd.sites[uniq - rd.base] == site
            uniq, scores = uniq[mask], scores[mask]
        if uniq.size > k:
            # vectorized preselect: only docs that can enter the top-k heap.
            # kth-largest score as threshold; keep ties AT the threshold so
            # the (score desc, doc_id asc) tie-break stays exact.
            kth = np.partition(scores, uniq.size - k)[uniq.size - k]
            heap_floor = heap[0][0] if len(heap) >= k else -math.inf
            keep = scores >= max(kth, heap_floor, floor)
            uniq, scores = uniq[keep], scores[keep]
        for d, s in zip(uniq.tolist(), scores.tolist()):
            if s < floor:  # below the external bound: not in the global top-k
                continue
            item = (s, -d)
            if len(heap) < k:
                heapq.heappush(heap, item)
            elif item > heap[0]:
                heapq.heapreplace(heap, item)

    def _wand_part(self, rd: SegmentReader, idfs: dict[str, float], k: int,
                   params: Bm25Params, heap: list[tuple[float, int]], *,
                   floor: float = -math.inf) -> None:
        cursors = []
        for order, (term, idf) in enumerate(idfs.items()):
            enc = rd.postings(term)
            if enc is not None:
                cursors.append(_Cursor(enc, idf, self, params, rd, order))
        if not cursors:
            return
        INF = (1 << 62)
        while True:
            cursors = [c for c in cursors if c.doc() < INF]
            if not cursors:
                return
            cursors.sort(key=lambda c: c.doc())
            threshold = max(floor,
                            heap[0][0] if len(heap) >= k else -math.inf)
            # pivot: first index where the cumulative term upper bounds
            # could beat the threshold
            acc = 0.0
            pivot = -1
            for i, c in enumerate(cursors):
                acc += c.term_ub
                if acc >= threshold:
                    pivot = i
                    break
            if pivot == -1:
                return
            pivot_doc = cursors[pivot].doc()
            if cursors[0].doc() == pivot_doc:
                # refine with block maxima at the pivot doc
                block_ub = 0.0
                for c in cursors:
                    if c.doc() > pivot_doc:
                        break
                    block_ub += c.block_ub(pivot_doc)
                if block_ub >= threshold or len(heap) < k:
                    # accumulate in stable term order so pruned and
                    # exhaustive scoring are bit-identical (float addition
                    # is not associative)
                    at_pivot = sorted((c for c in cursors if c.doc() == pivot_doc),
                                      key=lambda c: c.order)
                    score = 0.0
                    for c in at_pivot:
                        score += c.score()
                        c.advance()
                    item = (score, -pivot_doc)
                    if len(heap) < k:
                        heapq.heappush(heap, item)
                    elif item > heap[0]:
                        heapq.heapreplace(heap, item)
                else:
                    for c in cursors:
                        if c.doc() == pivot_doc:
                            c.advance()
            else:
                # advance the first cursor (smallest doc) up to the pivot doc
                cursors[0].next_geq(pivot_doc)

    # ------------------------------------------------------------------

    def _assemble(self, doc_ids: np.ndarray, scores: np.ndarray,
                  lemmas: set[str], morphology: str, with_snippets: bool,
                  settings: SearchSettings) -> list[SearchHit]:
        by_part: dict[int, list[int]] = {}
        for d in doc_ids.tolist():
            by_part.setdefault(d >> DOC_ID_PART_SHIFT, []).append(d)
        meta: dict[int, dict] = {}
        for part, ids in by_part.items():
            meta.update(self.reader(part).doc_meta(ids, with_snippets))
        morph = get_morphology(morphology)
        hits = []
        for d, s in zip(doc_ids.tolist(), scores.tolist()):
            m = meta.get(d, {})
            snippet = ""
            if with_snippets and m.get("whole_text"):
                snippet = get_snippet(m["whole_text"], lemmas, morph,
                                      settings.words_range)
            site = m.get("site", "")
            hits.append(SearchHit(doc_id=d, score=float(s),
                                  url=m.get("url", ""), site=site,
                                  site_name=settings.site_name(site),
                                  path=m.get("path", ""), title=m.get("title", ""),
                                  snippet=snippet))
        return hits


class SegmentSearcher:
    """Actor-pool stage for a batched query SET (reference ST5, SURVEY.md
    §3.3): a Dataset of ``(query_id, query[, site, limit, offset])`` rows
    fans out over actors that each hold the opened index once
    (``map_batches(SegmentSearcher, fn_constructor_kwargs={'index_dir': ...},
    concurrency=N)``), emitting one row per hit.

    Output: ``query_id, rank, doc_id, score, url`` — rank is 1-based with
    the deterministic (score desc, doc_id asc) tie-break.
    """

    def __init__(self, index_dir: str, *, scorer: str = "bm25",
                 morphology: str = "default", preload: bool = True,
                 with_snippets: bool = False,
                 settings: SearchSettings | None = None) -> None:
        self.ix = IndexReader(index_dir, preload=preload)
        self.scorer = scorer
        self.morphology = morphology
        self.with_snippets = with_snippets
        self.settings = settings or SearchSettings()

    def __call__(self, batch: pa.Table) -> pa.Table:
        names = batch.column_names
        qids = batch["query_id"].to_pylist()
        queries = batch["query"].to_pylist()
        sites = batch["site"].to_pylist() if "site" in names else [None] * len(qids)
        limits = batch["limit"].to_pylist() if "limit" in names else [None] * len(qids)
        offsets = batch["offset"].to_pylist() if "offset" in names else [None] * len(qids)

        out_qid, out_rank, out_doc, out_score, out_url, out_snip = [], [], [], [], [], []
        for qid, query, site, limit, offset in zip(qids, queries, sites,
                                                   limits, offsets):
            resp = self.ix.search(query, site=site, limit=limit, offset=offset,
                                  morphology=self.morphology,
                                  scorer=self.scorer,
                                  with_snippets=self.with_snippets,
                                  settings=self.settings)
            base = (offset or 0)
            for i, hit in enumerate(resp.data):
                out_qid.append(qid)
                out_rank.append(base + i + 1)
                out_doc.append(hit.doc_id)
                out_score.append(hit.score)
                out_url.append(hit.url)
                out_snip.append(hit.snippet)
        cols = {
            "query_id": pa.array(out_qid, pa.int64()),
            "rank": pa.array(out_rank, pa.int32()),
            "doc_id": pa.array(out_doc, pa.int64()),
            "score": pa.array(out_score, pa.float64()),
            "url": pa.array(out_url, pa.string()),
        }
        if self.with_snippets:
            cols["snippet"] = pa.array(out_snip, pa.string())
        return pa.table(cols)


def search_queryset(index_dir: str, queries, *, scorer: str = "bm25",
                    morphology: str = "default", with_snippets: bool = False,
                    concurrency=(1, 4)):
    """Fan a query set out over a SegmentSearcher actor pool.

    ``queries``: a Dataset with columns ``query_id, query[, site, limit,
    offset]`` or a plain list of dicts with those keys.  Returns the lazy
    hits Dataset (query_id, rank, doc_id, score, url[, snippet]).
    """
    import ray.data as rd

    if not isinstance(queries, rd.Dataset):
        queries = rd.from_items(list(queries))
    return queries.map_batches(
        SegmentSearcher,
        fn_constructor_kwargs={"index_dir": index_dir, "scorer": scorer,
                               "morphology": morphology,
                               "with_snippets": with_snippets},
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )


class _Cursor:
    """Block-skipping posting cursor (decodes one block at a time)."""

    __slots__ = ("enc", "idf", "ix", "params", "rd", "order", "bi", "pos",
                 "ids", "tfs", "term_ub", "_n_blocks")

    def __init__(self, enc: EncodedPostings, idf: float, ix: IndexReader,
                 params: Bm25Params, rd: SegmentReader, order: int = 0) -> None:
        self.enc = enc
        self.idf = idf
        self.ix = ix
        self.params = params
        self.rd = rd
        self.order = order
        self._n_blocks = enc.block_last_docid.size
        self.bi = -1
        self.pos = 0
        self.ids = None
        self.tfs = None
        self.term_ub = max(
            self._ub(tf, dl) for tf, dl in zip(enc.block_max_tf, enc.block_min_dl)
        )
        self._load_block(0)

    def _ub(self, tf: float, dl: float) -> float:
        p = self.params
        dl_norm = p.k1 * (1.0 - p.b + p.b * dl / max(self.ix.stats["avgdl"], 1e-9))
        return self.idf * (tf * (p.k1 + 1.0)) / (tf + dl_norm)

    def _load_block(self, bi: int) -> None:
        if bi >= self._n_blocks:
            self.bi = self._n_blocks
            self.ids = None
            return
        if bi != self.bi:
            self.bi = bi
            self.ids = decode_block_docids(self.enc, bi)
            self.tfs = decode_block_tfs(self.enc, bi)
        self.pos = 0

    def doc(self) -> int:
        if self.ids is None:
            return 1 << 62
        return int(self.ids[self.pos])

    def block_ub(self, doc: int) -> float:
        """Upper bound of this term's contribution at/after ``doc`` using the
        block containing it (shallow — no decode needed)."""
        bi = bisect_left(self.enc.block_last_docid, doc)
        if bi >= self._n_blocks:
            return 0.0
        return self._ub(float(self.enc.block_max_tf[bi]), float(self.enc.block_min_dl[bi]))

    def score(self) -> float:
        tf = float(self.tfs[self.pos])
        d = int(self.ids[self.pos])
        dl = float(self.rd.doc_lens[d - self.rd.base])
        return self._ub(tf, dl)

    def advance(self) -> None:
        self.pos += 1
        if self.ids is not None and self.pos >= len(self.ids):
            self._load_block(self.bi + 1)

    def next_geq(self, target: int) -> None:
        if self.ids is None:
            return
        if int(self.enc.block_last_docid[self.bi]) < target:
            bi = bisect_left(self.enc.block_last_docid, target)
            self._load_block(bi)
            if self.ids is None:
                return
        # in-block binary search
        self.pos += int(np.searchsorted(self.ids[self.pos:], target, side="left"))
        if self.pos >= len(self.ids):
            self._load_block(self.bi + 1)
