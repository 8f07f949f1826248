"""Naive single-node reference implementation used as the in-test oracle.

Independent of the Spark engine: tokenizes with the same analyzer,
computes BM25 (float32, Lucene semantics) with plain Python dicts +
numpy. Mirrors the role of Lucene's exhaustive BooleanScorer as the
differential-test oracle (SURVEY §5.6).
"""

from __future__ import annotations

from collections import Counter, defaultdict
from typing import Dict, List, Optional, Tuple

import numpy as np

from lucene_spark.functions.bm25 import BM25
from lucene_spark.functions.smallfloat import int_to_byte4


class NaiveIndex:
    def __init__(self, docs: Dict[int, List[str]]):
        """docs: doc_id -> token list (post-analysis)."""
        self.docs = docs
        self.postings: Dict[str, Dict[int, int]] = defaultdict(dict)
        self.norms: Dict[int, int] = {}
        for doc_id, toks in docs.items():
            if not toks:
                continue  # docs with no tokens have no norm entry / postings
            for t, f in Counter(toks).items():
                self.postings[t][doc_id] = f
            self.norms[doc_id] = int(int_to_byte4(len(toks)))
        self.doc_count = len(self.norms)
        self.sttf = sum(len(t) for t in docs.values())

    def term_scores(self, term: str, boost: float = 1.0, k1=1.2, b=0.75) -> Dict[int, float]:
        plist = self.postings.get(term)
        if not plist:
            return {}
        s = BM25(
            doc_freq=len(plist),
            doc_count=self.doc_count,
            sum_total_term_freq=self.sttf,
            boost=boost,
            k1=k1,
            b=b,
        )
        out = {}
        for doc_id, f in plist.items():
            out[doc_id] = float(s.score([f], [self.norms[doc_id]])[0])
        return out

    def disjunction_topk(
        self, term_boosts: Dict[str, float], k: int, min_should_match: int = 0
    ) -> List[Tuple[int, float]]:
        """SHOULD-disjunction BM25 sum, tie-break (score desc, doc asc)."""
        acc: Dict[int, float] = defaultdict(float)  # double accumulator
        nmatch: Dict[int, int] = defaultdict(int)
        for term, boost in term_boosts.items():
            for doc_id, sc in self.term_scores(term, boost).items():
                acc[doc_id] += sc
                nmatch[doc_id] += 1
        need = max(1, min_should_match)
        hits = [
            (doc_id, np.float32(sc)) for doc_id, sc in acc.items() if nmatch[doc_id] >= need
        ]
        hits.sort(key=lambda x: (-x[1], x[0]))
        return [(d, float(s)) for d, s in hits[:k]]
