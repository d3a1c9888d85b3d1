"""Unigram-LM trainer vs an independent pure-Python reference
implementation of the same algorithm (seed -> EM forward-backward ->
prune) — the engine-independent ground truth next to the DuckDB
oracle, mirroring the BPE trainer's reference test."""

from __future__ import annotations

import re
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

import duckdb
import pytest

from text_grabr_orc_spark.operators.unigram_lm import (
    _UNI_K,
    _UNI_LMAX,
    _UNI_ROUNDS,
    _UNI_SEED_MULTI,
    _UNI_V_MULTI,
    unigram_lm_train,
)

_Q = Decimal("0.000000001")


def _quant(x: float) -> Decimal:
    return Decimal(repr(x)).quantize(_Q, rounding=ROUND_HALF_UP)


def _ref_train(word_freqs: dict[str, int]):
    """Pure-Python unigram-LM trainer: same seeding, same fixed-order
    forward-backward in doubles, same DECIMAL(18,9) quantization of
    per-occurrence contributions and M-step probabilities."""
    words = {
        w: n
        for w, n in word_freqs.items()
        if re.fullmatch("[a-z0-9]+", w) and len(w) <= _UNI_LMAX
    }
    cnt: Counter = Counter()
    for w, n in words.items():
        for i in range(1, len(w) + 1):
            for k in range(1, min(_UNI_K, i) + 1):
                cnt[w[i - k : i]] += n
    chars = {p: c for p, c in cnt.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in cnt.items() if len(p) > 1),
        key=lambda t: (-t[1], t[0]),
    )[:_UNI_SEED_MULTI]
    seed = dict(chars)
    seed.update(dict(multi))
    tot = sum(seed.values())
    probs = {p: _quant(float(c) / float(tot)) for p, c in seed.items()}
    for _ in range(_UNI_ROUNDS):
        e: dict[str, Decimal] = {}
        for w, n in words.items():
            L = len(w)
            pv = {}
            for i in range(1, L + 1):
                for k in range(1, min(_UNI_K, i) + 1):
                    pc = probs.get(w[i - k : i])
                    pv[(i, k)] = float(pc) if pc is not None else 0.0
            al = [1.0]
            for i in range(1, L + 1):
                s = 0.0
                for k in range(1, _UNI_K + 1):
                    s += al[i - k] * pv[(i, k)] if i >= k else 0.0
                al.append(s)
            bt = [1.0]
            for mm in range(1, L + 1):
                s = 0.0
                for k in range(1, _UNI_K + 1):
                    # piece starting at j = L-mm+1 (1-based), len k
                    s += (
                        bt[mm - k] * pv[(L - mm + k, k)] if mm >= k else 0.0
                    )
                bt.append(s)
            for i in range(1, L + 1):
                for k in range(1, min(_UNI_K, i) + 1):
                    c = (
                        al[i - k]
                        * pv[(i, k)]
                        * bt[L - i]
                        / al[L]
                        * n
                    )
                    piece = w[i - k : i]
                    e[piece] = e.get(piece, Decimal(0)) + _quant(c)
        t = sum(e.values())
        probs = {p: _quant(float(v) / float(t)) for p, v in e.items()}
    kept = [(p, v) for p, v in probs.items() if len(p) == 1]
    kept += sorted(
        ((p, v) for p, v in probs.items() if len(p) > 1),
        key=lambda x: (-x[1], x[0]),
    )[:_UNI_V_MULTI]
    kept.sort(key=lambda x: (-x[1], x[0]))
    return [
        (r + 1, p, float(v)) for r, (p, v) in enumerate(kept)
    ]


@pytest.fixture(scope="module")
def word_freqs(sf_dir):
    from text_grabr_orc_spark.functions.text import ORACLE_WS_RUN

    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT lower(tok) AS w, count(*) AS n
        FROM (SELECT unnest(list_filter(regexp_split_to_array(text,
                  '{ORACLE_WS_RUN}'), t -> t <> '')) AS tok
              FROM '{sf_dir}/documents.parquet')
        GROUP BY 1
        """
    ).fetchall()
    con.close()
    return dict(rows)


def test_unigram_matches_pure_python_reference(spark, sf_dir, word_freqs):
    got = sorted(
        ((int(r["rank"]), r["piece"], r["p"]) for r in
         unigram_lm_train(spark, sf_dir).collect())
    )
    want = sorted(_ref_train(word_freqs))
    assert len(got) == len(want)
    for (gr, gp, gv), (wr, wp, wv) in zip(got, want):
        assert (gr, gp) == (wr, wp)
        assert abs(gv - wv) < 1e-9, (gp, gv, wv)


def test_viterbi_encode_reconstructs_words_and_maximizes(spark, sf_dir):
    """Every segmentation concatenates back to its word; the path
    probability equals the product of the learned piece probs along
    the path and matches an independent pure-Python Viterbi."""
    from text_grabr_orc_spark.operators.unigram_lm import (
        unigram_encode_viterbi,
    )

    piece_p = {
        r["piece"]: r["p"]
        for r in unigram_lm_train(spark, sf_dir).collect()
    }
    rows = unigram_encode_viterbi(spark, sf_dir).collect()
    assert rows
    for r in rows:
        segs = r["seg"].split("|")
        assert "".join(segs) == r["w"]
        assert len(segs) == r["n_pieces"]
        # independent Viterbi over the learned pieces
        w = r["w"]
        L = len(w)
        v = [1.0] + [0.0] * L
        for i in range(1, L + 1):
            best = -1.0
            for k in range(1, min(_UNI_K, i) + 1):
                p = piece_p.get(w[i - k : i], 0.0)
                best = max(best, v[i - k] * p)
            v[i] = best
        assert abs(r["vprob"] - v[L]) < 1e-9, (w, r["vprob"], v[L])


def test_unigram_probs_form_distribution(spark, sf_dir):
    rows = unigram_lm_train(spark, sf_dir).collect()
    assert all(r["p"] >= 0 for r in rows)
    # chars + top multi only; pruned mass stays below 1
    assert 0.5 < sum(r["p"] for r in rows) <= 1.0 + 1e-9
    ranks = sorted(int(r["rank"]) for r in rows)
    assert ranks == list(range(1, len(rows) + 1))
