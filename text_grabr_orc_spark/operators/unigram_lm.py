"""Unigram-LM (SentencePiece-style) tokenizer training — Kudo 2018
("Subword Regularization", public), the second tokenizer-training
family next to the BPE merge loop in ``curation.py``.

The reference (``/root/reference/main.go``) tokenizes with
``strings.Fields`` only; this module is north-star surface: a 100 TB
training pipeline trains its tokenizer in-engine, and unigram-LM is
the SentencePiece default. The algorithm:

1. SEED a piece vocabulary from frequent substrings of the word-
   frequency table (all single characters are kept unconditionally —
   SentencePiece's required-character set — plus the top-K multi-char
   substrings by corpus-weighted count); initial piece probabilities
   proportional to substring counts.
2. EM rounds: the E-step computes each piece's EXPECTED COUNT over
   every word's segmentation lattice with the forward-backward
   algorithm (alpha/beta over word positions, marginalizing over all
   segmentations, weighted by word frequency); the M-step
   renormalizes expected counts into the next round's probabilities.
3. PRUNE to the final vocabulary: all single characters (coverage
   guarantee) plus the top multi-char pieces by final probability.

The driver hash-checks the LEARNED PIECE TABLE — like
``bpe_train_merges`` and ``train_logreg_quality``, the artifact
under test is the model itself, and the oracle unrolls every EM round
as CTE layers with the per-word lattice DP as a recursive CTE over
word positions (alphas/betas accumulate in a LIST column; the flat
(position x piece-length) probability array rides along each row).

Cross-engine float discipline (the repo's standard devices):

- the forward/backward folds run in IEEE doubles with a FIXED
  evaluation order (positions ascending, piece lengths k = 1..3 in
  order) — identical operation sequences produce identical bits on
  both engines;
- every per-occurrence expected-count contribution is quantized to
  DECIMAL(18,9) BEFORE the corpus-wide sum, so the only cross-row
  aggregation is exact decimal arithmetic (order-independent);
- M-step probabilities are re-quantized to DECIMAL(18,9), making each
  round's input state exactly representable on both engines.

Scale: every round's state is the WORD-FREQUENCY table (vocabulary-
bounded — the initial token count is the only corpus-sized shuffle,
exactly like the BPE trainer); the lattice DP is a per-row
higher-order fold (no shuffle, no UDF — whole-stage codegen); the
piece table (~hundreds of rows) broadcasts into the grid join; the
E-step aggregate exchanges at most |grid| = |words| * Lmax * K rows
partially combined to |pieces|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from text_grabr_orc_spark.functions.text import tokens
from text_grabr_orc_spark.operators.curation import _ORACLE_TOKS
from text_grabr_orc_spark.functions.windows import bounded_window
from text_grabr_orc_spark.registry import register
from text_grabr_orc_spark.tables import load_table

#: max word length the trainer considers (longer words are excluded
#: deterministically on both engines — the pre-tokenizer cap).
_UNI_LMAX = 12
#: max piece length.
_UNI_K = 3
#: multi-char seed pieces kept next to the (unconditional) char set.
_UNI_SEED_MULTI = 120
#: EM rounds.
_UNI_ROUNDS = 2
#: multi-char pieces surviving the final prune.
_UNI_V_MULTI = 64

_WORDS_FILTER = "^[a-z0-9]+$"


def _words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(w, n, L): lowercase [a-z0-9]+ word frequencies, length-capped
    — the same normalization as the BPE trainer plus the Lmax cap."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens("text")).alias("tok"))
        .select(F.lower("tok").alias("w"))
        .filter(F.col("w").rlike(_WORDS_FILTER))
        .filter(F.length("w") <= _UNI_LMAX)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("w", "n", F.length("w").alias("L"))
    )


def _grid(words: DataFrame) -> DataFrame:
    """Full (w, i, k) lattice grid, i = 1..L (piece END position),
    k = 1..K (piece length); slots with k > i carry a NULL piece so
    the per-word flattened probability array has exactly L*K entries
    at fixed offsets (i-1)*K + k."""
    return (
        words.select(
            "w",
            "n",
            "L",
            F.explode(F.sequence(F.lit(1), F.col("L"))).alias("i"),
        )
        .select(
            "w",
            "n",
            "L",
            "i",
            F.explode(
                F.sequence(F.lit(1), F.lit(_UNI_K))
            ).alias("k"),
        )
        .select(
            "w",
            "n",
            "L",
            "i",
            "k",
            F.when(
                F.col("k") <= F.col("i"),
                F.expr(f"substring(w, i - k + 1, k)"),
            ).alias("piece"),
        )
    )


def _seed_probs(grid: DataFrame) -> DataFrame:
    """(piece, p DECIMAL(18,9)): chars unconditionally + top multi
    substrings by weighted count, probabilities proportional to
    counts, quantized."""
    cnt = (
        grid.filter(F.col("piece").isNotNull())
        .groupBy("piece")
        .agg(F.sum("n").alias("cnt"))
    )
    chars = cnt.filter(F.length("piece") == 1)
    multi = (
        cnt.filter(F.length("piece") > 1)
        .orderBy(F.col("cnt").desc(), "piece")
        .limit(_UNI_SEED_MULTI)
    )
    seed = chars.unionAll(multi)
    tot = seed.agg(F.sum("cnt").alias("tot"))
    return seed.crossJoin(F.broadcast(tot)).select(
        "piece",
        F.round(
            F.col("cnt").cast("double") / F.col("tot").cast("double"), 9
        )
        .cast("decimal(18,9)")
        .alias("p"),
    )


def _em_round(grid: DataFrame, probs: DataFrame) -> DataFrame:
    """One EM round: E-step forward-backward expected counts over
    every word lattice, M-step renormalization. Returns the next
    (piece, p DECIMAL(18,9)) table."""
    K = _UNI_K
    gp = grid.join(F.broadcast(probs), "piece", "left").select(
        "w",
        "n",
        "L",
        "i",
        "k",
        "piece",
        F.coalesce(F.col("p").cast("double"), F.lit(0.0)).alias("pv"),
    )
    arr = gp.groupBy("w").agg(
        F.any_value("n").alias("n"),
        F.any_value("L").alias("L"),
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("i", "k", "pv"))
            ),
            lambda s: s["pv"],
        ).alias("parr"),
    )
    # forward: al[m] = alpha_{m-1}; al[1] = 1; alpha_i sums k = 1..K
    # in fixed order (identical operation sequence to the oracle).
    # (An Arrow-batch kernel replacing these two folds was measured
    # this round and REVERTED as a wash — the vocabulary-bounded fold
    # is not the dominant term; see OPTIMIZATION_r14.md §7.)
    def _fwd_step(acc, i):
        terms = None
        for k in range(1, K + 1):
            t = F.when(
                i >= F.lit(k),
                F.element_at(acc, (i - F.lit(k) + 1).cast("int"))
                * F.element_at(
                    F.col("parr"), ((i - 1) * K + k).cast("int")
                ),
            ).otherwise(F.lit(0.0))
            terms = t if terms is None else terms + t
        return F.concat(acc, F.array(terms))

    # backward: bt[m] = beta at boundary L-m+1; bt[1] = beta_L = 1.
    # Computing entry m+1 = beta_{L-m}: the piece spanning boundary
    # j = L-m to j+k ENDS at position i = L-m+k, so its probability
    # sits at parr[(L-m+k-1)*K + k] (1-based flat index)
    def _bwd_step(acc, mm):
        terms = None
        for k in range(1, K + 1):
            t = F.when(
                mm >= F.lit(k),
                F.element_at(acc, (mm - F.lit(k) + 1).cast("int"))
                * F.element_at(
                    F.col("parr"),
                    ((F.col("L") - mm + k - 1) * K + k).cast("int"),
                ),
            ).otherwise(F.lit(0.0))
            terms = t if terms is None else terms + t
        return F.concat(acc, F.array(terms))

    ab = arr.select(
        "w",
        "n",
        "L",
        "parr",
        F.aggregate(
            F.sequence(F.lit(1), F.col("L")),
            F.array(F.lit(1.0)),
            _fwd_step,
        ).alias("al"),
        F.aggregate(
            F.sequence(F.lit(1), F.col("L")),
            F.array(F.lit(1.0)),
            _bwd_step,
        ).alias("bt"),
    )
    # occurrences re-derived from the per-word row itself (round-14,
    # guide §2.4): piece = substring(w, ...) and pv = parr[(i-1)*K+k]
    # are both recoverable from (w, parr), so the former
    # grid-sized-join-back (|grid| rows joined against ab, with gp
    # evaluated a second time under the join) becomes a narrow
    # re-explode of the |words| ab rows — same (piece, contribution)
    # multiset, bit-identically (parr[(i-1)*K+k] IS that slot's pv by
    # construction of the sorted flat array)
    occ = (
        ab.select(
            "w",
            "n",
            "L",
            "parr",
            "al",
            "bt",
            F.explode(F.sequence(F.lit(1), F.col("L"))).alias("i"),
        )
        .select(
            "w", "n", "L", "parr", "al", "bt", "i",
            F.explode(F.sequence(F.lit(1), F.lit(K))).alias("k"),
        )
        .filter(F.col("k") <= F.col("i"))
        .select(
            F.expr("substring(w, i - k + 1, k)").alias("piece"),
            "n",
            "L",
            "i",
            "k",
            "al",
            "bt",
            F.element_at(
                "parr", ((F.col("i") - 1) * K + F.col("k")).cast("int")
            ).alias("pv"),
        )
    )
    # expected count of the occurrence (end i, length k):
    #   alpha_{i-k} * p * beta_i / alpha_L * n
    # with al[m] = alpha_{m-1} and bt[m] = beta_{L-m+1}; quantized to
    # DECIMAL(18,9) per occurrence, summed exactly
    contrib = (
        F.element_at("al", (F.col("i") - F.col("k") + 1).cast("int"))
        * F.col("pv")
        * F.element_at("bt", (F.col("L") - F.col("i") + 1).cast("int"))
        / F.element_at("al", (F.col("L") + 1).cast("int"))
        * F.col("n")
    )
    e = (
        occ.select(
            "piece",
            F.round(contrib, 9).cast("decimal(18,9)").alias("c"),
        )
        .groupBy("piece")
        .agg(F.sum("c").alias("e"))
    )
    t = e.agg(F.sum("e").alias("t"))
    return e.crossJoin(F.broadcast(t)).select(
        "piece",
        F.round(F.col("e").cast("double") / F.col("t").cast("double"), 9)
        .cast("decimal(18,9)")
        .alias("p"),
    )


def _unigram_oracle_chain() -> str:
    """Seed + EM rounds + prune as one CTE chain ending in
    ``pruned(piece, p)`` — shared by the trainer oracle (ranks the
    pruned table) and the Viterbi encoder oracle (segments the word
    table with it): seed CTEs, per-round recursive forward/backward
    CTEs over word positions (alphas/betas accumulate in LIST
    columns), decimal-quantized expected-count aggregation — the same
    layer-unrolling device as the BPE/logreg oracles, extended with
    WITH RECURSIVE for the lattice DP."""
    K, LMAX = _UNI_K, _UNI_LMAX
    head = f"""
    WITH RECURSIVE words AS MATERIALIZED (
        SELECT lower(tok) AS w, count(*) AS n,
               CAST(length(lower(tok)) AS INT) AS L
        FROM (SELECT unnest({_ORACLE_TOKS}) AS tok FROM documents)
        WHERE regexp_full_match(lower(tok), '[a-z0-9]+')
          AND length(lower(tok)) <= {LMAX}
        GROUP BY 1, 3
    ), grid AS MATERIALIZED (
        SELECT w, n, L, i, k,
               CASE WHEN k <= i THEN substr(w, i - k + 1, k) END AS piece
        FROM words
        CROSS JOIN (SELECT unnest(range(1, {LMAX + 1}))::INT AS i) gi
        CROSS JOIN (SELECT unnest(range(1, {K + 1}))::INT AS k) gk
        WHERE i <= L
    ), cnt AS MATERIALIZED (
        SELECT piece, sum(n) AS cnt FROM grid
        WHERE piece IS NOT NULL GROUP BY 1
    ), seed AS MATERIALIZED (
        SELECT piece, cnt FROM cnt WHERE length(piece) = 1
        UNION ALL
        SELECT piece, cnt FROM (
            SELECT piece, cnt FROM cnt WHERE length(piece) > 1
            ORDER BY cnt DESC, piece LIMIT {_UNI_SEED_MULTI})
    ), probs0 AS MATERIALIZED (
        SELECT piece,
               CAST(round(CAST(cnt AS DOUBLE)
                          / CAST((SELECT sum(cnt) FROM seed) AS DOUBLE),
                          9) AS DECIMAL(18,9)) AS p
        FROM seed
    )"""
    layers = []
    for r in range(_UNI_ROUNDS):
        fk = " + ".join(
            f"""CASE WHEN m >= {k} THEN
                 al[m - {k} + 1] * parr[(m - 1) * {K} + {k}]
                 ELSE 0 END"""
            for k in range(1, K + 1)
        )
        bk = " + ".join(
            f"""CASE WHEN m >= {k} THEN
                 bt[m - {k} + 1] * parr[(L - m + {k} - 1) * {K} + {k}]
                 ELSE 0 END"""
            for k in range(1, K + 1)
        )
        layers.append(f"""
    , gp{r} AS MATERIALIZED (
        SELECT g.w, g.n, g.L, g.i, g.k, g.piece,
               coalesce(CAST(p.p AS DOUBLE), 0.0) AS pv
        FROM grid g LEFT JOIN probs{r} p USING (piece)
    ), arr{r} AS MATERIALIZED (
        SELECT w, any_value(n) AS n, any_value(L) AS L,
               list(pv ORDER BY i, k) AS parr
        FROM gp{r} GROUP BY w
    ), fwd{r} AS (
        SELECT w, L, parr, 1 AS m, [CAST(1 AS DOUBLE)] AS al
        FROM arr{r}
        UNION ALL
        SELECT w, L, parr, m + 1, list_append(al, {fk})
        FROM fwd{r} WHERE m <= L
    ), bwd{r} AS (
        SELECT w, L, parr, 1 AS m, [CAST(1 AS DOUBLE)] AS bt
        FROM arr{r}
        UNION ALL
        SELECT w, L, parr, m + 1, list_append(bt, {bk})
        FROM bwd{r} WHERE m <= L
    ), ab{r} AS MATERIALIZED (
        SELECT f.w, f.al, b.bt
        FROM (SELECT w, al FROM fwd{r} WHERE m = L + 1) f
        JOIN (SELECT w, bt FROM bwd{r} WHERE m = L + 1) b USING (w)
    ), e{r} AS MATERIALIZED (
        SELECT g.piece,
               sum(CAST(round(
                   ab.al[g.i - g.k + 1] * g.pv * ab.bt[g.L - g.i + 1]
                   / ab.al[g.L + 1] * g.n, 9) AS DECIMAL(18,9))) AS e
        FROM gp{r} g JOIN ab{r} ab USING (w)
        WHERE g.piece IS NOT NULL
        GROUP BY 1
    ), probs{r + 1} AS MATERIALIZED (
        SELECT piece,
               CAST(round(CAST(e AS DOUBLE)
                          / CAST((SELECT sum(e) FROM e{r}) AS DOUBLE),
                          9) AS DECIMAL(18,9)) AS p
        FROM e{r}
    )""")
    last = f"probs{_UNI_ROUNDS}"
    prune = f"""
    , pruned AS MATERIALIZED (
        SELECT piece, p FROM {last} WHERE length(piece) = 1
        UNION ALL
        SELECT piece, p FROM (
            SELECT piece, p FROM {last} WHERE length(piece) > 1
            ORDER BY p DESC, piece LIMIT {_UNI_V_MULTI})
    )"""
    return head + "".join(layers) + prune


def _unigram_oracle() -> str:
    return (
        _unigram_oracle_chain()
        + """
    SELECT CAST(row_number() OVER (ORDER BY p DESC, piece) AS BIGINT)
               AS rank,
           piece,
           CAST(p AS DOUBLE) AS p
    FROM pruned
    """
    )


def _viterbi_ctes() -> str:
    """Viterbi CTE text appended to the trainer chain — the per-word
    max-prob path (value list + argmax backpointer list, fixed
    smallest-k tie-break) and the backpointer walk, ending in
    ``walk`` whose ``pos = 0`` rows carry (w, n, segs, vbest). Shared
    by the encoder oracle and the tokenizer compression report."""
    K = _UNI_K
    tks = [
        f"""CASE WHEN m >= {k} THEN
             v[m - {k} + 1] * parr[(m - 1) * {K} + {k}]
             ELSE -1 END AS t{k}"""
        for k in range(1, K + 1)
    ]
    return f"""
    , gpv AS MATERIALIZED (
        SELECT g.w, g.n, g.L, g.i, g.k,
               coalesce(CAST(p.p AS DOUBLE), 0.0) AS pv
        FROM grid g LEFT JOIN pruned p USING (piece)
    ), arrv AS MATERIALIZED (
        SELECT w, any_value(n) AS n, any_value(L) AS L,
               list(pv ORDER BY i, k) AS parr
        FROM gpv GROUP BY w
    ), vit AS (
        SELECT w, n, L, parr, 1 AS m,
               [CAST(1 AS DOUBLE)] AS v, []::INT[] AS bp
        FROM arrv
        UNION ALL
        SELECT w, n, L, parr, m + 1,
               list_append(v, greatest(t1, t2, t3)),
               list_append(bp, CASE WHEN t1 >= t2 AND t1 >= t3 THEN 1
                                    WHEN t2 >= t3 THEN 2
                                    ELSE 3 END)
        FROM (SELECT *, {', '.join(tks)} FROM vit) WHERE m <= L
    ), walk AS (
        SELECT w, n, L, bp, v[L + 1] AS vbest, L AS pos,
               []::VARCHAR[] AS segs
        FROM vit WHERE m = L + 1
        UNION ALL
        SELECT w, n, L, bp, vbest, pos - bp[pos],
               list_prepend(substr(w, pos - bp[pos] + 1, bp[pos]), segs)
        FROM walk WHERE pos > 0
    )"""


def _unigram_encode_oracle() -> str:
    """Trainer chain + Viterbi segmentation of the word table with
    the pruned pieces (see _viterbi_ctes)."""
    return (
        _unigram_oracle_chain()
        + _viterbi_ctes()
        + """
    SELECT w, CAST(n AS BIGINT) AS n,
           array_to_string(segs, '|') AS seg,
           CAST(len(segs) AS BIGINT) AS n_pieces,
           round(vbest, 9) AS vprob
    FROM walk WHERE pos = 0
    """
    )


@register("unigram_lm_train", oracle=_unigram_oracle())
def unigram_lm_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-engine unigram-LM tokenizer TRAINING (see module
    docstring): seed substring vocabulary, {rounds} EM rounds of
    forward-backward expected counts over every word's segmentation
    lattice, prune to chars + top-{v} pieces. Returns the learned
    piece table (rank, piece, p) — hash-checked against the oracle's
    unrolled recursive-CTE replica of the identical computation."""
    # one corpus pass total: the word-frequency table is vocabulary-
    # bounded, so localCheckpoint pins it with flat lineage and every
    # EM-round branch (seed, 2 x forward-backward, 2 x E-step) reads
    # the checkpointed rows instead of re-exploding the corpus
    words = _words(spark, sf_dir).localCheckpoint()
    grid = _grid(words)
    pruned = _pruned_probs(spark, sf_dir, grid)
    # rank over the pruned table: bounded (<= chars + V_MULTI rows)
    w = bounded_window("piece", F.col("p").desc(), "piece")
    return pruned.select(
        F.row_number().over(w).cast("bigint").alias("rank"),
        "piece",
        F.col("p").cast("double").alias("p"),
    )


unigram_lm_train.__doc__ = unigram_lm_train.__doc__.format(
    rounds=_UNI_ROUNDS, v=_UNI_V_MULTI
)


def _pruned_probs(spark: SparkSession, sf_dir: str, grid: DataFrame):
    """The trained-and-pruned piece table (piece, p DECIMAL)."""
    # each round's output is vocabulary-bounded (chars + seed multis),
    # so localCheckpoint materializes a few hundred rows and cuts the
    # round's lineage: without it the final plan nests every EM round
    # under BOTH the chars and multi branches of the union below (and
    # gp under both the forward-backward and E-step branches), and
    # the downstream consumers (viterbi, compression report) re-nest
    # it again — exchange reuse catches some but not all of that
    probs = _seed_probs(grid).localCheckpoint()
    for _ in range(_UNI_ROUNDS):
        probs = _em_round(grid, probs).localCheckpoint()
    chars = probs.filter(F.length("piece") == 1)
    multi = (
        probs.filter(F.length("piece") > 1)
        .orderBy(F.col("p").desc(), "piece")
        .limit(_UNI_V_MULTI)
    )
    return chars.unionAll(multi)


def _viterbi_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(w, n, L, d(v, bp), wk(pos, segs)): the trained-vocabulary
    Viterbi segmentation of every eligible word — shared by the
    encoder query and the tokenizer compression report."""
    from text_grabr_orc_spark.opcache import cached_frame

    K = _UNI_K
    words = _words(spark, sf_dir).localCheckpoint()
    grid = _grid(words)
    # train once, encode many: the ENCODER consumers (viterbi query,
    # compression report) reuse the trained-and-pruned piece table via
    # the opcache — the production tokenizer pattern. unigram_lm_train
    # itself stays UNCACHED on purpose: it is the training operator,
    # its steady timing and its scale-curve family must keep measuring
    # real EM work, not a cache read.
    pruned = cached_frame(
        spark,
        sf_dir,
        "unigram_pruned_probs",
        lambda: _pruned_probs(spark, sf_dir, grid),
    )
    gpv = grid.join(F.broadcast(pruned), "piece", "left").select(
        "w",
        "n",
        "L",
        "i",
        "k",
        F.coalesce(F.col("p").cast("double"), F.lit(0.0)).alias("pv"),
    )
    arrv = gpv.groupBy("w").agg(
        F.any_value("n").alias("n"),
        F.any_value("L").alias("L"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "k", "pv"))),
            lambda s: s["pv"],
        ).alias("parr"),
    )

    # Viterbi fold: acc = struct(v array<double>, bp array<int>);
    # impossible k carries -1 so a feasible k (chars have p > 0)
    # always wins; ties break to the SMALLEST k on both engines
    def _vit_step(acc, m):
        ts = []
        for k in range(1, K + 1):
            ts.append(
                F.when(
                    m >= F.lit(k),
                    F.element_at(acc["v"], (m - F.lit(k) + 1).cast("int"))
                    * F.element_at(
                        F.col("parr"), ((m - 1) * K + k).cast("int")
                    ),
                ).otherwise(F.lit(-1.0))
            )
        t1, t2, t3 = ts
        best_k = (
            F.when((t1 >= t2) & (t1 >= t3), F.lit(1))
            .when(t2 >= t3, F.lit(2))
            .otherwise(F.lit(3))
        )
        return F.struct(
            F.concat(acc["v"], F.array(F.greatest(t1, t2, t3))).alias("v"),
            F.concat(acc["bp"], F.array(best_k)).alias("bp"),
        )

    vit = arrv.select(
        "w",
        "n",
        "L",
        F.aggregate(
            F.sequence(F.lit(1), F.col("L")),
            F.struct(
                F.array(F.lit(1.0)).alias("v"),
                F.array().cast("array<int>").alias("bp"),
            ),
            _vit_step,
        ).alias("d"),
    )

    # backpointer walk: at most L steps, folded; acc = (pos, segs)
    def _walk_step(acc, _):
        k = F.element_at(F.col("d.bp"), acc["pos"].cast("int"))
        piece = F.col("w").substr(acc["pos"] - k + 1, k)
        return F.when(
            acc["pos"] > 0,
            F.struct(
                (acc["pos"] - k).alias("pos"),
                F.concat(F.array(piece), acc["segs"]).alias("segs"),
            ),
        ).otherwise(acc)

    out = vit.select(
        "w",
        "n",
        "L",
        "d",
        F.aggregate(
            F.sequence(F.lit(1), F.col("L")),
            F.struct(
                F.col("L").cast("int").alias("pos"),
                F.array().cast("array<string>").alias("segs"),
            ),
            _walk_step,
        ).alias("wk"),
    )
    return out


@register("unigram_encode_viterbi", oracle=_unigram_encode_oracle())
def unigram_encode_viterbi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Viterbi ENCODING with the trained unigram-LM vocabulary: the
    max-probability segmentation of every corpus word under the
    learned piece probabilities — the inference half of the
    SentencePiece pair, companion to ``bpe_encode_corpus``. The DP is
    the same per-row higher-order fold as training (values + argmax
    backpointers, fixed smallest-k tie-break), followed by a bounded
    backpointer walk (<= Lmax steps, also a fold) — no UDF, no
    shuffle beyond the vocabulary-sized join. Output is the word
    segmentation table (w, n, seg, n_pieces, vprob), hash-checked
    against the oracle's recursive-CTE replica; encoding the corpus
    is then a broadcast join of this table onto the token stream."""
    out = _viterbi_table(spark, sf_dir)
    return out.select(
        "w",
        F.col("n").cast("bigint"),
        F.array_join("wk.segs", "|").alias("seg"),
        F.size("wk.segs").cast("bigint").alias("n_pieces"),
        F.round(
            F.element_at("d.v", (F.col("L") + 1).cast("int")), 9
        ).alias("vprob"),
    )


# ---------------------------------------------------------------------------
# Tokenizer compression report: trained BPE vs trained unigram-LM
# ---------------------------------------------------------------------------


def _compression_oracle() -> str:
    """Both trained tokenizers replayed in ONE statement: the BPE
    merge chain (words{{N}} final symbol table) and the unigram
    EM + Viterbi chain share a WITH RECURSIVE list (disjoint CTE
    names), each reduced to corpus-weighted piece statistics."""
    from text_grabr_orc_spark.operators.curation import (
        _BPE_N_MERGES,
        _bpe_oracle_chain,
    )

    bpe_chain, _ = _bpe_oracle_chain()
    bpe_body = bpe_chain.strip()
    assert bpe_body.startswith("WITH ")
    bpe_body = bpe_body[len("WITH ") :]
    uni_chain = _unigram_oracle_chain().strip()
    assert uni_chain.startswith("WITH RECURSIVE ")
    uni_body = uni_chain[len("WITH RECURSIVE ") :]
    return f"""
    WITH RECURSIVE {uni_body}{_viterbi_ctes()}
    , uni AS (
        SELECT count(*) AS n_words, sum(n) AS n_occ,
               sum(len(segs) * n) AS pieces,
               sum(length(w) * n) AS chars
        FROM walk WHERE pos = 0
    ), {bpe_body}
    , bpe AS (
        SELECT count(*) AS n_words, sum(n) AS n_occ,
               sum(len(str_split(substr(s, 2, length(s) - 2), '][')) * n)
                   AS pieces,
               sum(length(w) * n) AS chars
        FROM words{_BPE_N_MERGES}
    )
    SELECT * FROM (
        SELECT 'bpe' AS tokenizer,
               CAST(n_words AS BIGINT) AS n_words,
               CAST(n_occ AS BIGINT) AS n_occurrences,
               CAST(pieces AS BIGINT) AS total_pieces,
               round(CAST(pieces AS DOUBLE) / CAST(n_occ AS DOUBLE), 6)
                   AS pieces_per_word,
               round(CAST(chars AS DOUBLE) / CAST(pieces AS DOUBLE), 6)
                   AS chars_per_piece
        FROM bpe
        UNION ALL
        SELECT 'unigram',
               CAST(n_words AS BIGINT), CAST(n_occ AS BIGINT),
               CAST(pieces AS BIGINT),
               round(CAST(pieces AS DOUBLE) / CAST(n_occ AS DOUBLE), 6),
               round(CAST(chars AS DOUBLE) / CAST(pieces AS DOUBLE), 6)
        FROM uni
    )
    """


@register("tokenizer_compression_report", oracle=_compression_oracle())
def tokenizer_compression_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """HEAD-TO-HEAD tokenizer evaluation: the two in-engine-trained
    tokenizers (BPE merge table, unigram-LM piece table) applied to
    their word-frequency tables and reduced to the numbers a
    tokenizer-selection decision actually uses — corpus-weighted
    pieces per word (sequence-length cost) and characters per piece
    (vocabulary efficiency). Composes BOTH training chains in one
    contract: the oracle nests the unrolled BPE merge CTEs and the
    recursive unigram EM + Viterbi CTEs in a single statement, so the
    report is hash-checked end-to-end through both trainers.

    The two eligible word sets differ by design (BPE trains on all
    [a-z0-9]+ words, unigram caps length at {lmax}), so each row
    reports its own denominator — the comparison is per-tokenizer
    efficiency, not a same-set ratio.

    Scale: both inputs are vocabulary-bounded tables (the trainers'
    state), so the report adds two tiny aggregates on top of shared
    training chains."""
    from text_grabr_orc_spark.operators.curation import _bpe_chain

    # unigram side: Viterbi segmentation statistics
    vt = _viterbi_table(spark, sf_dir).select(
        "w", "n", F.size("wk.segs").alias("np")
    )
    uni = vt.agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum("n").alias("n_occ"),
        F.sum(F.col("np") * F.col("n")).alias("pieces"),
        F.sum(F.length("w") * F.col("n")).alias("chars"),
    )
    # BPE side: final merged symbol table
    _, cur = _bpe_chain(spark, sf_dir)
    n_sym = F.size(
        F.split(F.expr("substr(s, 2, length(s) - 2)"), r"\]\[")
    )
    bpe = cur.select("w", "n", n_sym.alias("np")).agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum("n").alias("n_occ"),
        F.sum(F.col("np") * F.col("n")).alias("pieces"),
        F.sum(F.length("w") * F.col("n")).alias("chars"),
    )

    def row(tag: str, agg: DataFrame) -> DataFrame:
        return agg.select(
            F.lit(tag).alias("tokenizer"),
            F.col("n_words").cast("bigint"),
            F.col("n_occ").cast("bigint").alias("n_occurrences"),
            F.col("pieces").cast("bigint").alias("total_pieces"),
            F.round(
                F.col("pieces").cast("double") / F.col("n_occ").cast("double"),
                6,
            ).alias("pieces_per_word"),
            F.round(
                F.col("chars").cast("double") / F.col("pieces").cast("double"),
                6,
            ).alias("chars_per_piece"),
        )

    return row("bpe", bpe).unionAll(row("unigram", uni))


tokenizer_compression_report.__doc__ = (
    tokenizer_compression_report.__doc__.format(lmax=_UNI_LMAX)
)
