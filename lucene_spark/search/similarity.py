"""Pluggable per-term similarities (Lucene `search/similarities/`).

The round-2 engine hardcoded BM25; this module makes the per-term
scoring formula a pluggable pair of expressions — one Spark Column
program and one DuckDB SQL string — generated from the SAME statistics
surface Lucene's `SimScorer.score(freq, norm)` sees:

=============  =============================================
input          meaning (Lucene source)
=============  =============================================
``freq``       within-doc term frequency (postings)
``dl``         quantized doc length decoded from the norm
               byte (`SmallFloat.byte4ToInt`, the lossy norm
               semantics every similarity shares)
``doc_freq``   docFreq(term)          (`TermStatistics`)
``ttf``        totalTermFreq(term)    (`TermStatistics`)
``n_docs``     docCount               (`CollectionStatistics`)
``sttf``       sumTotalTermFreq       (`CollectionStatistics`)
``boost``      query boost
=============  =============================================

Built-ins re-express the published formulas:

- :class:`BM25Similarity` — `similarities/BM25Similarity.java:161-170`
- :class:`ClassicSimilarity` — `similarities/ClassicSimilarity.java` /
  `TFIDFSimilarity.java`: idf = ln((N+1)/(df+1)) + 1, tf = sqrt(freq),
  lengthNorm = 1/sqrt(dl)
- :class:`BooleanSimilarity` — `similarities/BooleanSimilarity.java`:
  score = boost per matching term
- :class:`LMDirichletSimilarity` —
  `similarities/LMDirichletSimilarity.java`: Bayesian smoothing with
  mu; collectionProbability = (ttf+1)/(sttf+1)
  (`LMSimilarity.DefaultCollectionModel`); negative scores clamp to 0
  like the reference's `return score > 0.0f ? score : 0.0f`
- :class:`LMJelinekMercerSimilarity` —
  `similarities/LMJelinekMercerSimilarity.java`: linear interpolation
  with lambda, same clamp
- :class:`DFRInL2Similarity` — `similarities/DFRSimilarity.java` with
  BasicModelIn + AfterEffectL + NormalizationH2 (c=1):
  tfn = freq * log2(1 + c * avgdl/dl),
  score = boost * (tfn/(tfn+1)) * log2((N+1)/(df+0.5))
- :class:`AxiomaticF2EXP` — `similarities/AxiomaticF2EXP.java`:
  score = boost * (N/df)^k * freq / (freq + s + s * dl/avgdl)

Anything else plugs in as :class:`ExpressionSimilarity` with a
user-supplied Column function (and optional SQL for oracle parity).
All expressions run JVM-side in whole-stage codegen — pluggability
costs zero Python in the scoring path.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Callable, Dict, Optional

from pyspark.sql import Column, functions as F

__all__ = [
    "Similarity",
    "BM25Similarity",
    "ClassicSimilarity",
    "BooleanSimilarity",
    "LMDirichletSimilarity",
    "LMJelinekMercerSimilarity",
    "DFRInL2Similarity",
    "AxiomaticF2EXP",
    "DFIChiSquared",
    "IBLLSimilarity",
    "ExpressionSimilarity",
    "IndriDirichletSimilarity",
    "RawTFSimilarity",
    "MultiSimilarity",
    "DFRGB2Similarity",
    "IBSPLSimilarity",
    "DFIStandardized",
    "AxiomaticF1EXP",
    "AxiomaticF1LOG",
    "AxiomaticF2LOG",
    "AxiomaticF3EXP",
    "AxiomaticF3LOG",
    "DFRIFLH3Similarity",
    "DFISaturated",
    "DFRIneB1Similarity",
    "IBSPLZSimilarity",
    "SweetSpotHyperbolicSimilarity",
]

_LN2 = math.log(2.0)


class Similarity:
    """Per-term scorer: a Spark Column expression + a DuckDB string.

    ``cols`` maps input names (table above) to Column expressions; the
    SQL variant receives the same names bound in the oracle query's
    scope. Both must compute the identical float64 formula so gate
    value-hashes match.
    """

    def score_col(self, c: Dict[str, Column]) -> Column:
        raise NotImplementedError

    def score_sql(self) -> str:
        """DuckDB expression over columns freq, dl, doc_freq, ttf,
        n_docs, sttf, boost (None = no SQL parity available)."""
        raise NotImplementedError


@dataclass(frozen=True)
class BM25Similarity(Similarity):
    k1: float = 1.2
    b: float = 0.75

    def score_col(self, c):
        avgdl = c["sttf"] / c["n_docs"]
        idf = F.log(
            F.lit(1.0) + (c["n_docs"] - c["doc_freq"] + F.lit(0.5)) / (c["doc_freq"] + F.lit(0.5))
        )
        norm = F.lit(self.k1) * (
            F.lit(1.0 - self.b) + F.lit(self.b) * c["dl"] / avgdl
        )
        return c["boost"] * idf * c["freq"] / (c["freq"] + norm)

    def score_sql(self):
        return (
            "boost * ln(1 + (n_docs - doc_freq + 0.5) / (doc_freq + 0.5)) "
            f"* freq / (freq + {self.k1!r} * (1 - {self.b!r} + {self.b!r} "
            "* dl / (sttf * 1.0 / n_docs)))"
        )


@dataclass(frozen=True)
class ClassicSimilarity(Similarity):
    def score_col(self, c):
        idf = F.log((c["n_docs"] + F.lit(1.0)) / (c["doc_freq"] + F.lit(1.0))) + F.lit(1.0)
        return c["boost"] * idf * F.sqrt(c["freq"]) / F.sqrt(c["dl"])

    def score_sql(self):
        return (
            "boost * (ln((n_docs + 1.0) / (doc_freq + 1.0)) + 1.0) "
            "* sqrt(freq) / sqrt(dl)"
        )


@dataclass(frozen=True)
class SweetSpotSimilarity(Similarity):
    """`misc/src/java/org/apache/lucene/misc/SweetSpotSimilarity.java:34`:
    ClassicSimilarity with a baseline tf floor and a length-norm
    "plateau" of equally-good lengths.

    - ``baselineTf`` (:143): ``freq <= tf_min ? tf_base :
      sqrt(freq + tf_base² − tf_min)`` (freq is never 0 on a match);
    - ``lengthNorm`` (:111): ``1/sqrt(steepness · (|dl−min| + |dl−max|
      − (max−min)) + 1)`` — exactly 1.0 inside [min, max].

    Defaults degrade to Classic's ``sqrt(freq)`` / ``1/sqrt(dl)``.
    """

    tf_min: float = 0.0
    tf_base: float = 0.0
    ln_min: int = 1
    ln_max: int = 1
    steepness: float = 0.5

    def score_col(self, c):
        idf = F.log((c["n_docs"] + F.lit(1.0)) / (c["doc_freq"] + F.lit(1.0))) + F.lit(1.0)
        shift = float(self.tf_base * self.tf_base - self.tf_min)
        tf = F.when(c["freq"] <= F.lit(float(self.tf_min)), F.lit(float(self.tf_base))).otherwise(
            F.sqrt(c["freq"] + F.lit(shift))
        )
        span = float(self.ln_max - self.ln_min)
        ln = F.lit(1.0) / F.sqrt(
            F.lit(float(self.steepness))
            * (
                F.abs(c["dl"] - F.lit(float(self.ln_min)))
                + F.abs(c["dl"] - F.lit(float(self.ln_max)))
                - F.lit(span)
            )
            + F.lit(1.0)
        )
        return c["boost"] * idf * tf * ln

    def score_sql(self):
        shift = repr(float(self.tf_base * self.tf_base - self.tf_min))
        tmin, tbase = repr(float(self.tf_min)), repr(float(self.tf_base))
        lmin, lmax = repr(float(self.ln_min)), repr(float(self.ln_max))
        span, s = repr(float(self.ln_max - self.ln_min)), repr(float(self.steepness))
        return (
            f"boost * (ln((n_docs + 1.0) / (doc_freq + 1.0)) + 1.0) "
            f"* (CASE WHEN freq <= {tmin} THEN {tbase} ELSE sqrt(freq + {shift}) END) "
            f"* (1.0 / sqrt({s} * (abs(dl - {lmin}) + abs(dl - {lmax}) - {span}) + 1.0))"
        )


@dataclass(frozen=True)
class BooleanSimilarity(Similarity):
    def score_col(self, c):
        return c["boost"] + F.lit(0.0)

    def score_sql(self):
        return "boost + 0.0"


@dataclass(frozen=True)
class LMDirichletSimilarity(Similarity):
    mu: float = 2000.0

    def score_col(self, c):
        p = (c["ttf"] + F.lit(1.0)) / (c["sttf"] + F.lit(1.0))
        raw = F.log(F.lit(1.0) + c["freq"] / (F.lit(self.mu) * p)) + F.log(
            F.lit(self.mu) / (c["dl"] + F.lit(self.mu))
        )
        return c["boost"] * F.greatest(raw, F.lit(0.0))

    def score_sql(self):
        mu = repr(float(self.mu))
        return (
            f"boost * greatest(ln(1.0 + freq / ({mu} * ((ttf + 1.0) / (sttf + 1.0)))) "
            f"+ ln({mu} / (dl + {mu})), 0.0)"
        )


@dataclass(frozen=True)
class LMJelinekMercerSimilarity(Similarity):
    lam: float = 0.1

    def score_col(self, c):
        p = (c["ttf"] + F.lit(1.0)) / (c["sttf"] + F.lit(1.0))
        raw = F.log(
            F.lit(1.0)
            + (F.lit(1.0 - self.lam) * c["freq"] / c["dl"]) / (F.lit(self.lam) * p)
        )
        return c["boost"] * F.greatest(raw, F.lit(0.0))

    def score_sql(self):
        lam = repr(float(self.lam))
        return (
            f"boost * greatest(ln(1.0 + ((1.0 - {lam}) * freq / dl) "
            f"/ ({lam} * ((ttf + 1.0) / (sttf + 1.0)))), 0.0)"
        )


@dataclass(frozen=True)
class DFRInL2Similarity(Similarity):
    c: float = 1.0

    def score_col(self, c):
        avgdl = c["sttf"] / c["n_docs"]
        tfn = c["freq"] * (
            F.log(F.lit(1.0) + F.lit(self.c) * avgdl / c["dl"]) / F.lit(_LN2)
        )
        gain = F.log((c["n_docs"] + F.lit(1.0)) / (c["doc_freq"] + F.lit(0.5))) / F.lit(_LN2)
        return c["boost"] * (tfn / (tfn + F.lit(1.0))) * gain

    def score_sql(self):
        cc = repr(float(self.c))
        ln2 = repr(_LN2)
        tfn = f"(freq * (ln(1.0 + {cc} * (sttf * 1.0 / n_docs) / dl) / {ln2}))"
        return (
            f"boost * ({tfn} / ({tfn} + 1.0)) "
            f"* (ln((n_docs + 1.0) / (doc_freq + 0.5)) / {ln2})"
        )


@dataclass(frozen=True)
class AxiomaticF2EXP(Similarity):
    s: float = 0.5
    k: float = 0.35

    def score_col(self, c):
        avgdl = c["sttf"] / c["n_docs"]
        # idf = (N + 1) / df, per AxiomaticF2EXP.java:78 (idf(), which
        # uses docCount + 1 in the numerator)
        return (
            c["boost"]
            * F.pow((c["n_docs"] + F.lit(1.0)) / c["doc_freq"], F.lit(self.k))
            * c["freq"]
            / (c["freq"] + F.lit(self.s) + F.lit(self.s) * c["dl"] / avgdl)
        )

    def score_sql(self):
        s, k = repr(float(self.s)), repr(float(self.k))
        return (
            f"boost * pow((n_docs + 1.0) / doc_freq, {k}) * freq "
            f"/ (freq + {s} + {s} * dl / (sttf * 1.0 / n_docs))"
        )


@dataclass(frozen=True)
class DFIChiSquared(Similarity):
    """Divergence From Independence with the chi-squared measure
    (`similarities/DFISimilarity.java:70-80`,
    `IndependenceChiSquared.java:33-35`): expected = (ttf+1)·dl/(sttf+1);
    freq <= expected scores 0; else boost · log2(χ² + 1) with
    χ² = (freq − expected)²/expected. (Computed in float64 end-to-end;
    the reference narrows intermediate stats to float.)"""

    def score_col(self, c):
        expected = (c["ttf"] + F.lit(1.0)) * c["dl"] / (c["sttf"] + F.lit(1.0))
        chi2 = (c["freq"] - expected) * (c["freq"] - expected) / expected
        raw = F.log(chi2 + F.lit(1.0)) / F.lit(_LN2)
        return F.when(c["freq"] <= expected, F.lit(0.0)).otherwise(
            c["boost"] * raw
        )

    def score_sql(self):
        ln2 = repr(_LN2)
        exp = "((ttf + 1.0) * dl / (sttf + 1.0))"
        chi2 = f"((freq - {exp}) * (freq - {exp}) / {exp})"
        return (
            f"CASE WHEN freq <= {exp} THEN 0.0 "
            f"ELSE boost * (ln({chi2} + 1.0) / {ln2}) END"
        )


@dataclass(frozen=True)
class IBLLSimilarity(Similarity):
    """Information-based model with log-logistic distribution, docFreq
    lambda, and H2 normalization (`similarities/IBSimilarity.java:115-118`
    composing `DistributionLL.java:34` −ln(λ/(tfn+λ)),
    `LambdaDF.java:33` λ=(df+1)/(N+1), `NormalizationH2.java`
    tfn = freq·log2(1 + c·avgdl/dl)). Float64 end-to-end, same note as
    :class:`DFIChiSquared`."""

    c: float = 1.0

    def score_col(self, c):
        avgdl = c["sttf"] / c["n_docs"]
        tfn = c["freq"] * (
            F.log(F.lit(1.0) + F.lit(self.c) * avgdl / c["dl"]) / F.lit(_LN2)
        )
        lam = (c["doc_freq"] + F.lit(1.0)) / (c["n_docs"] + F.lit(1.0))
        return c["boost"] * -F.log(lam / (tfn + lam))

    def score_sql(self):
        cc = repr(float(self.c))
        ln2 = repr(_LN2)
        tfn = f"(freq * (ln(1.0 + {cc} * (sttf * 1.0 / n_docs) / dl) / {ln2}))"
        lam = "((doc_freq + 1.0) / (n_docs + 1.0))"
        return f"boost * -ln({lam} / ({tfn} + {lam}))"


@dataclass(frozen=True)
class ExpressionSimilarity(Similarity):
    """User-plugged similarity: any Column program over the stats
    surface (`Similarity.java`'s extension point). ``sql`` is optional
    — without it the formula has no DuckDB oracle (pytest-only)."""

    fn: Callable[[Dict[str, Column]], Column]
    sql: Optional[str] = None

    def score_col(self, c):
        return self.fn(c)

    def score_sql(self):
        if self.sql is None:
            raise NotImplementedError("ExpressionSimilarity without sql")
        return self.sql


@dataclass(frozen=True)
class IndriDirichletSimilarity(Similarity):
    """`core/search/similarities/IndriDirichletSimilarity.java:68`:
    Indri's Dirichlet smoothing — score = ln((freq + mu*P(t|C)) /
    (docLen + mu)) with the IndriCollectionModel probability
    P(t|C) = totalTermFreq / sumTotalTermFreq (:111). Unlike
    LMDirichlet there is NO clamp to zero: Indri scores are negative
    log-probabilities by design (the reference returns Math.log
    directly), so ordering is what matters."""

    mu: float = 2000.0

    def score_col(self, c):
        p = c["ttf"] / c["sttf"]
        return c["boost"] * F.log(
            (c["freq"] + F.lit(self.mu) * p) / (c["dl"] + F.lit(self.mu))
        )

    def score_sql(self):
        mu = repr(float(self.mu))
        return (
            f"boost * ln((freq + {mu} * (ttf * 1.0 / sttf)) / (dl + {mu}))"
        )


@dataclass(frozen=True)
class RawTFSimilarity(Similarity):
    """`core/search/similarities/RawTFSimilarity.java:16`: score is the
    raw term frequency times boost — no idf, no length norm (the
    building block for feature-style fields)."""

    def score_col(self, c):
        return c["boost"] * c["freq"]

    def score_sql(self):
        return "boost * freq"


@dataclass(frozen=True)
class MultiSimilarity(Similarity):
    """`core/search/similarities/MultiSimilarity.java:33`
    (MultiSimScorer.score): the arithmetic MEAN of the sub-scorers'
    scores for the same (freq, norm). Pure expression composition —
    the sub-formulas fuse into one codegen'd projection, so combining
    k similarities costs zero extra passes."""

    sims: tuple

    def score_col(self, c):
        s = self.sims[0].score_col(c)
        for x in self.sims[1:]:
            s = s + x.score_col(c)
        return s / F.lit(float(len(self.sims)))

    def score_sql(self):
        parts = " + ".join(f"({x.score_sql()})" for x in self.sims)
        return f"(({parts}) / {float(len(self.sims))!r})"


@dataclass(frozen=True)
class DFRGB2Similarity(Similarity):
    """DFR GB2: geometric basic model + Bernoulli after-effect + H2
    length normalization (`similarities/DFRSimilarity.java:127`
    composing `BasicModelG.java:36` — lambda = F/(N+F) with F = ttf+1,
    score (B - (B-A)/(1+tfn)) * aeTimes1pTfn — and
    `AfterEffectB.java:32` — aeTimes1pTfn = (F+1)/n with F = ttf+1,
    n = df+1 — and `NormalizationH2.java` tfn). Float64 end-to-end."""

    c: float = 1.0

    def score_col(self, c):
        avgdl = c["sttf"] / c["n_docs"]
        tfn = c["freq"] * (
            F.log(F.lit(1.0) + F.lit(self.c) * avgdl / c["dl"]) / F.lit(_LN2)
        )
        big_f = c["ttf"] + F.lit(1.0)
        lam = big_f / (c["n_docs"] + big_f)
        a = F.log(lam + F.lit(1.0)) / F.lit(_LN2)
        b = F.log((F.lit(1.0) + lam) / lam) / F.lit(_LN2)
        ae = (big_f + F.lit(1.0)) / (c["doc_freq"] + F.lit(1.0))
        return c["boost"] * (b - (b - a) / (F.lit(1.0) + tfn)) * ae

    def score_sql(self):
        cc, ln2 = repr(float(self.c)), repr(_LN2)
        tfn = f"(freq * (ln(1.0 + {cc} * (sttf * 1.0 / n_docs) / dl) / {ln2}))"
        lam = "((ttf + 1.0) / (n_docs + ttf + 1.0))"
        a = f"(ln({lam} + 1.0) / {ln2})"
        b = f"(ln((1.0 + {lam}) / {lam}) / {ln2})"
        ae = "((ttf + 2.0) / (doc_freq + 1.0))"
        return f"boost * ({b} - ({b} - {a}) / (1.0 + {tfn})) * {ae}"


@dataclass(frozen=True)
class IBSPLSimilarity(Similarity):
    """Information-based model with the smoothed power-law
    distribution and total-term-frequency lambda
    (`similarities/IBSimilarity.java:115` composing
    `DistributionSPL.java:35` — q = 1 - 1/(tfn+1),
    -ln((lambda^q - lambda)/(1 - lambda)) — and `LambdaTTF.java:22`
    lambda = (ttf+1)/(N+1), H2 normalization). The reference's ULP
    nudges (lambda == 1, pow rounding to lambda) guard degenerate
    stats that cannot occur off a real index (ttf < N·avgdl) — both
    emitters compute the plain formula."""

    c: float = 1.0

    def score_col(self, c):
        avgdl = c["sttf"] / c["n_docs"]
        tfn = c["freq"] * (
            F.log(F.lit(1.0) + F.lit(self.c) * avgdl / c["dl"]) / F.lit(_LN2)
        )
        lam = (c["ttf"] + F.lit(1.0)) / (c["n_docs"] + F.lit(1.0))
        q = F.lit(1.0) - F.lit(1.0) / (tfn + F.lit(1.0))
        return c["boost"] * -F.log(
            (F.pow(lam, q) - lam) / (F.lit(1.0) - lam)
        )

    def score_sql(self):
        cc, ln2 = repr(float(self.c)), repr(_LN2)
        tfn = f"(freq * (ln(1.0 + {cc} * (sttf * 1.0 / n_docs) / dl) / {ln2}))"
        lam = "((ttf + 1.0) / (n_docs + 1.0))"
        q = f"(1.0 - 1.0 / ({tfn} + 1.0))"
        return f"boost * -ln((pow({lam}, {q}) - {lam}) / (1.0 - {lam}))"


@dataclass(frozen=True)
class DFIStandardized(Similarity):
    """Divergence From Independence with the standardized measure
    (`similarities/DFISimilarity.java:70`,
    `IndependenceStandardized.java:33` — (freq - expected) /
    sqrt(expected)): same expected = (ttf+1)·dl/(sttf+1) and
    freq <= expected -> 0 gating as :class:`DFIChiSquared`."""

    def score_col(self, c):
        expected = (c["ttf"] + F.lit(1.0)) * c["dl"] / (c["sttf"] + F.lit(1.0))
        ind = (c["freq"] - expected) / F.sqrt(expected)
        raw = F.log(ind + F.lit(1.0)) / F.lit(_LN2)
        return F.when(c["freq"] <= expected, F.lit(0.0)).otherwise(
            c["boost"] * raw
        )

    def score_sql(self):
        ln2 = repr(_LN2)
        exp = "((ttf + 1.0) * dl / (sttf + 1.0))"
        ind = f"((freq - {exp}) / sqrt({exp}))"
        return (
            f"CASE WHEN freq <= {exp} THEN 0.0 "
            f"ELSE boost * (ln({ind} + 1.0) / {ln2}) END"
        )


def _ax_tf1_col(c):
    # F1/F3 tf component (`AxiomaticF1EXP.java:59`): freq += 1, then
    # 1 + ln(1 + ln(freq))
    return F.lit(1.0) + F.log(F.lit(1.0) + F.log(c["freq"] + F.lit(1.0)))


def _ax_tf1_sql():
    return "(1.0 + ln(1.0 + ln(freq + 1.0)))"


@dataclass(frozen=True)
class AxiomaticF1EXP(Similarity):
    """Axiomatic F1EXP (`similarities/AxiomaticF1EXP.java:59-85`,
    composed per `Axiomatic.java:106-116` with the final
    max(0, boost·score) clamp): tf · ln · idf with
    tf = 1+ln(1+ln(freq+1)), ln = (avgdl+s)/(avgdl+dl·s),
    idf = ((N+1)/df)^k."""

    s: float = 0.25
    k: float = 0.35

    def score_col(self, c):
        avgdl = c["sttf"] / c["n_docs"]
        ln_c = (avgdl + F.lit(self.s)) / (avgdl + c["dl"] * F.lit(self.s))
        idf = F.pow((c["n_docs"] + F.lit(1.0)) / c["doc_freq"], F.lit(self.k))
        return F.greatest(c["boost"] * _ax_tf1_col(c) * ln_c * idf, F.lit(0.0))

    def score_sql(self):
        s, k = repr(float(self.s)), repr(float(self.k))
        avgdl = "(sttf * 1.0 / n_docs)"
        ln_c = f"(({avgdl} + {s}) / ({avgdl} + dl * {s}))"
        idf = f"pow((n_docs + 1.0) / doc_freq, {k})"
        return f"greatest(boost * {_ax_tf1_sql()} * {ln_c} * {idf}, 0.0)"


@dataclass(frozen=True)
class AxiomaticF1LOG(Similarity):
    """Axiomatic F1LOG (`AxiomaticF1LOG.java:50-70`): like F1EXP with
    idf = ln((N+1)/df)."""

    s: float = 0.25

    def score_col(self, c):
        avgdl = c["sttf"] / c["n_docs"]
        ln_c = (avgdl + F.lit(self.s)) / (avgdl + c["dl"] * F.lit(self.s))
        idf = F.log((c["n_docs"] + F.lit(1.0)) / c["doc_freq"])
        return F.greatest(c["boost"] * _ax_tf1_col(c) * ln_c * idf, F.lit(0.0))

    def score_sql(self):
        s = repr(float(self.s))
        avgdl = "(sttf * 1.0 / n_docs)"
        ln_c = f"(({avgdl} + {s}) / ({avgdl} + dl * {s}))"
        return (
            f"greatest(boost * {_ax_tf1_sql()} * {ln_c} "
            f"* ln((n_docs + 1.0) / doc_freq), 0.0)"
        )


@dataclass(frozen=True)
class AxiomaticF2LOG(Similarity):
    """Axiomatic F2LOG (`AxiomaticF2LOG.java:61-70`): tfln · idf with
    tfln = freq/(freq + s + s·dl/avgdl), idf = ln((N+1)/df)."""

    s: float = 0.25

    def score_col(self, c):
        avgdl = c["sttf"] / c["n_docs"]
        tfln = c["freq"] / (
            c["freq"] + F.lit(self.s) + F.lit(self.s) * c["dl"] / avgdl
        )
        return F.greatest(
            c["boost"] * tfln * F.log((c["n_docs"] + F.lit(1.0)) / c["doc_freq"]),
            F.lit(0.0),
        )

    def score_sql(self):
        s = repr(float(self.s))
        tfln = f"(freq / (freq + {s} + {s} * dl / (sttf * 1.0 / n_docs)))"
        return f"greatest(boost * {tfln} * ln((n_docs + 1.0) / doc_freq), 0.0)"


@dataclass(frozen=True)
class AxiomaticF3EXP(Similarity):
    """Axiomatic F3EXP (`AxiomaticF3EXP.java:59-85`): tf · idf − gamma
    with gamma = (dl − queryLen)·s·queryLen/avgdl (the component that
    can push raw scores negative — the Axiomatic.java:115 clamp
    applies)."""

    s: float = 0.25
    query_len: int = 1
    k: float = 0.35

    def score_col(self, c):
        avgdl = c["sttf"] / c["n_docs"]
        idf = F.pow((c["n_docs"] + F.lit(1.0)) / c["doc_freq"], F.lit(self.k))
        gamma = (
            (c["dl"] - F.lit(float(self.query_len)))
            * F.lit(self.s)
            * F.lit(float(self.query_len))
            / avgdl
        )
        return F.greatest(
            c["boost"] * (_ax_tf1_col(c) * idf - gamma), F.lit(0.0)
        )

    def score_sql(self):
        s, k = repr(float(self.s)), repr(float(self.k))
        ql = repr(float(self.query_len))
        gamma = f"((dl - {ql}) * {s} * {ql} / (sttf * 1.0 / n_docs))"
        idf = f"pow((n_docs + 1.0) / doc_freq, {k})"
        return f"greatest(boost * ({_ax_tf1_sql()} * {idf} - {gamma}), 0.0)"


@dataclass(frozen=True)
class AxiomaticF3LOG(Similarity):
    """Axiomatic F3LOG (`AxiomaticF3LOG.java:48-75`): like F3EXP with
    idf = ln((N+1)/df)."""

    s: float = 0.25
    query_len: int = 1

    def score_col(self, c):
        avgdl = c["sttf"] / c["n_docs"]
        idf = F.log((c["n_docs"] + F.lit(1.0)) / c["doc_freq"])
        gamma = (
            (c["dl"] - F.lit(float(self.query_len)))
            * F.lit(self.s)
            * F.lit(float(self.query_len))
            / avgdl
        )
        return F.greatest(
            c["boost"] * (_ax_tf1_col(c) * idf - gamma), F.lit(0.0)
        )

    def score_sql(self):
        s, ql = repr(float(self.s)), repr(float(self.query_len))
        gamma = f"((dl - {ql}) * {s} * {ql} / (sttf * 1.0 / n_docs))"
        return (
            f"greatest(boost * ({_ax_tf1_sql()} * ln((n_docs + 1.0) / doc_freq)"
            f" - {gamma}), 0.0)"
        )


@dataclass(frozen=True)
class DFRIFLH3Similarity(Similarity):
    """DFR I(F)/L/H3: inverse-term-frequency basic model + Laplace
    after-effect + Dirichlet-prior length normalization
    (`similarities/BasicModelIF.java:36` — A·aeTimes1pTfn·(1 − 1/(1+tfn))
    with A = log2(1 + (N+1)/(F+0.5)) — `AfterEffectL.java:32`
    aeTimes1pTfn = 1, `NormalizationH3.java:47`
    tfn = (tf + mu·(ttf+1)/(sttf+1))/(dl + mu)·mu). Covers the H3
    normalization axis the other DFR members don't."""

    mu: float = 800.0

    def score_col(self, c):
        p = (c["ttf"] + F.lit(1.0)) / (c["sttf"] + F.lit(1.0))
        tfn = (c["freq"] + F.lit(self.mu) * p) / (c["dl"] + F.lit(self.mu)) * F.lit(
            self.mu
        )
        a = F.log(
            F.lit(1.0) + (c["n_docs"] + F.lit(1.0)) / (c["ttf"] + F.lit(0.5))
        ) / F.lit(_LN2)
        return c["boost"] * a * (F.lit(1.0) - F.lit(1.0) / (F.lit(1.0) + tfn))

    def score_sql(self):
        mu, ln2 = repr(float(self.mu)), repr(_LN2)
        tfn = (
            f"((freq + {mu} * ((ttf + 1.0) / (sttf + 1.0))) / (dl + {mu}) * {mu})"
        )
        a = f"(ln(1.0 + (n_docs + 1.0) / (ttf + 0.5)) / {ln2})"
        return f"boost * {a} * (1.0 - 1.0 / (1.0 + {tfn}))"


@dataclass(frozen=True)
class DFISaturated(Similarity):
    """Divergence From Independence with the saturated measure
    (`IndependenceSaturated.java:33` — (freq − expected)/expected):
    completes the DFI independence axis (ChiSquared and Standardized
    are gated above)."""

    def score_col(self, c):
        expected = (c["ttf"] + F.lit(1.0)) * c["dl"] / (c["sttf"] + F.lit(1.0))
        ind = (c["freq"] - expected) / expected
        raw = F.log(ind + F.lit(1.0)) / F.lit(_LN2)
        return F.when(c["freq"] <= expected, F.lit(0.0)).otherwise(
            c["boost"] * raw
        )

    def score_sql(self):
        ln2 = repr(_LN2)
        exp = "((ttf + 1.0) * dl / (sttf + 1.0))"
        ind = f"((freq - {exp}) / {exp})"
        return (
            f"CASE WHEN freq <= {exp} THEN 0.0 "
            f"ELSE boost * (ln({ind} + 1.0) / {ln2}) END"
        )


@dataclass(frozen=True)
class DFRIneB1Similarity(Similarity):
    """DFR I(ne)/B/H1: the remaining basic-model and normalization
    axes (`similarities/BasicModelIne.java:36` —
    ne = N·(1 − ((N−1)/N)^F), A = log2((N+1)/(ne+0.5)),
    A·aeTimes1pTfn·(1 − 1/(1+tfn)) — `AfterEffectB.java:32`
    aeTimes1pTfn = (ttf+2)/(df+1), `NormalizationH1.java:44`
    tfn = tf·c·avgdl/dl)."""

    c: float = 1.0

    def score_col(self, c):
        avgdl = c["sttf"] / c["n_docs"]
        tfn = c["freq"] * F.lit(self.c) * avgdl / c["dl"]
        n = c["n_docs"]
        ne = n * (
            F.lit(1.0) - F.pow((n - F.lit(1.0)) / n, c["ttf"])
        )
        a = F.log((n + F.lit(1.0)) / (ne + F.lit(0.5))) / F.lit(_LN2)
        ae = (c["ttf"] + F.lit(2.0)) / (c["doc_freq"] + F.lit(1.0))
        return c["boost"] * a * ae * (
            F.lit(1.0) - F.lit(1.0) / (F.lit(1.0) + tfn)
        )

    def score_sql(self):
        cc, ln2 = repr(float(self.c)), repr(_LN2)
        tfn = f"(freq * {cc} * (sttf * 1.0 / n_docs) / dl)"
        ne = "(n_docs * (1.0 - pow((n_docs - 1.0) / n_docs, ttf)))"
        a = f"(ln((n_docs + 1.0) / ({ne} + 0.5)) / {ln2})"
        ae = "((ttf + 2.0) / (doc_freq + 1.0))"
        return f"boost * {a} * {ae} * (1.0 - 1.0 / (1.0 + {tfn}))"


@dataclass(frozen=True)
class IBSPLZSimilarity(Similarity):
    """IB SPL/L/Z: the NormalizationZ axis (`NormalizationZ.java:42`
    tfn = tf·(avgdl/dl)^z, default z=0.30) under the smoothed
    power-law distribution with TTF lambda — same SPL arithmetic as
    :class:`IBSPLSimilarity`."""

    z: float = 0.30

    def score_col(self, c):
        avgdl = c["sttf"] / c["n_docs"]
        tfn = c["freq"] * F.pow(avgdl / c["dl"], F.lit(self.z))
        lam = (c["ttf"] + F.lit(1.0)) / (c["n_docs"] + F.lit(1.0))
        q = F.lit(1.0) - F.lit(1.0) / (tfn + F.lit(1.0))
        return c["boost"] * -F.log(
            (F.pow(lam, q) - lam) / (F.lit(1.0) - lam)
        )

    def score_sql(self):
        zz = repr(float(self.z))
        tfn = f"(freq * pow((sttf * 1.0 / n_docs) / dl, {zz}))"
        lam = "((ttf + 1.0) / (n_docs + 1.0))"
        q = f"(1.0 - 1.0 / ({tfn} + 1.0))"
        return f"boost * -ln((pow({lam}, {q}) - {lam}) / (1.0 - {lam}))"


@dataclass(frozen=True)
class SweetSpotHyperbolicSimilarity(Similarity):
    """SweetSpotSimilarity with the hyperbolic tf function
    (`misc/SweetSpotSimilarity.java:160` hyperbolicTf — min +
    (max−min)/2 · (tanh-shaped ratio in base^±(freq−xoffset)) + 1)/…)
    and the same plateau length norm as :class:`SweetSpotSimilarity`;
    idf is Classic's. The reference's NaN→max guard covers base^x
    overflow at extreme freq; the plain formula is exact for any
    realistic tf (the guard region starts around freq ≈ 700 at the
    default base 1.3)."""

    tf_hyper_min: float = 0.0
    tf_hyper_max: float = 2.0
    tf_hyper_base: float = 1.3
    tf_hyper_xoffset: float = 10.0
    ln_min: int = 1
    ln_max: int = 1
    steepness: float = 0.5

    def score_col(self, c):
        idf = F.log((c["n_docs"] + F.lit(1.0)) / (c["doc_freq"] + F.lit(1.0))) + F.lit(1.0)
        x = c["freq"] - F.lit(float(self.tf_hyper_xoffset))
        b = F.lit(float(self.tf_hyper_base))
        up, dn = F.pow(b, x), F.pow(b, -x)
        tf = F.lit(float(self.tf_hyper_min)) + (
            F.lit(float(self.tf_hyper_max - self.tf_hyper_min)) / F.lit(2.0)
        ) * ((up - dn) / (up + dn) + F.lit(1.0))
        span = float(self.ln_max - self.ln_min)
        ln = F.lit(1.0) / F.sqrt(
            F.lit(float(self.steepness))
            * (
                F.abs(c["dl"] - F.lit(float(self.ln_min)))
                + F.abs(c["dl"] - F.lit(float(self.ln_max)))
                - F.lit(span)
            )
            + F.lit(1.0)
        )
        return c["boost"] * idf * tf * ln

    def score_sql(self):
        mn = repr(float(self.tf_hyper_min))
        half = repr(float(self.tf_hyper_max - self.tf_hyper_min) / 2.0)
        b = repr(float(self.tf_hyper_base))
        xo = repr(float(self.tf_hyper_xoffset))
        lmin, lmax = repr(float(self.ln_min)), repr(float(self.ln_max))
        span = repr(float(self.ln_max - self.ln_min))
        st = repr(float(self.steepness))
        up = f"pow({b}, freq - {xo})"
        dn = f"pow({b}, -(freq - {xo}))"
        tf = f"({mn} + {half} * ((({up} - {dn}) / ({up} + {dn})) + 1.0))"
        ln_c = (
            f"(1.0 / sqrt({st} * (abs(dl - {lmin}) + abs(dl - {lmax})"
            f" - {span}) + 1.0))"
        )
        return (
            f"boost * (ln((n_docs + 1.0) / (doc_freq + 1.0)) + 1.0) "
            f"* {tf} * {ln_c}"
        )
