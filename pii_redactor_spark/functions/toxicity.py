"""Toxicity scoring + masking: the word-list half of "PII/toxicity-scrub".

The north-star pipeline scrubs captions for PII *and* toxicity.  The PII
side is span detection (core.detect / operators.scrub); the toxicity side is
the standard word-list approach (e.g. the LDNOOBW blocklists used by C4,
Gopher §A1.1's obscene-word gate): a caption is scored by the fraction of
its tokens that appear in a blocklist, gated at a threshold, and offending
tokens are masked in place.

Everything here is a JVM-side Column expression — tokenize once with
``split``, count/mask with higher-order array functions — so the hot path
stays inside whole-stage codegen with zero Python.  A real deployment swaps
``DEFAULT_BLOCKLIST`` for its curated per-language lexicon.  The expressions
are list-size-linear per token — right for the few-hundred-word lists these
filters use; for a 10^5-phrase lexicon use :func:`with_toxicity_joined`,
which broadcast-hash-joins the exploded token column instead (same
one-shuffle shape as the dedup inverted index).

``DEFAULT_BLOCKLIST`` is a deterministic PLACEHOLDER drawn from the synthetic
corpus vocabulary — this repo ships no real profanity list; the mechanism,
not the lexicon, is the deliverable.  "junk" never occurs in the testdata
and pins the zero-hit path.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BLOCKLIST: tuple[str, ...] = ("slow", "dup", "junk")
# The three score columns every toxicity-enabled output carries; batch
# (pipeline.run) and streaming (streaming.scrub_stream) both reference this
# so the decision schemas cannot drift apart.
TOXICITY_COLS = ("n_toxic", "toxicity", "toxic_flag")
TOXIC_MASK = "[TOXIC]"
DEFAULT_TOXICITY_THRESHOLD = 0.03


def _tokens(text: Column | str) -> Column:
    # Whitespace tokens, matching the quality heuristics' tokenization.
    # Prose with punctuation-adjacent words would tokenize with
    # functions.bpe_ish_tokens instead; the downstream expressions only
    # need *an* array<string>, so both plug in unchanged.
    #
    # NULL text is folded to '' BEFORE split so every downstream
    # expression is total regardless of session ANSI settings: under
    # legacy spark.sql.ansi.enabled=false + sizeOfNull semantics,
    # size(split(NULL)) = -1 would make n_toxic = -1 and
    # toxicity = (-1)/(-1) = 1.0 — silently dropping every NULL-caption
    # row through the keep gate (round-3 advice).  With the fold, NULL
    # scores exactly like empty text: 0 hits, 0.0 toxicity, flag false.
    return F.split(F.coalesce(text, F.lit("")), " ")


def toxic_hits(text: Column | str, blocklist: Sequence[str] = DEFAULT_BLOCKLIST) -> Column:
    """Count of blocklisted tokens (int).  Empty or NULL text -> 0."""
    return F.size(F.filter(_tokens(text), lambda t: t.isin(*blocklist)))


def toxicity_score(
    text: Column | str, blocklist: Sequence[str] = DEFAULT_BLOCKLIST
) -> Column:
    """Blocklisted-token fraction in [0, 1].

    ``split`` never returns an empty array (empty/NULL text -> [""]), so
    the denominator is always >= 1 and the score is total — under ANSI
    and legacy sizeOfNull sessions alike (see ``_tokens``).
    """
    toks = _tokens(text)
    hits = F.size(F.filter(toks, lambda t: t.isin(*blocklist)))
    return hits / F.size(toks)


def mask_toxic(
    text: Column | str,
    blocklist: Sequence[str] = DEFAULT_BLOCKLIST,
    mask: str = TOXIC_MASK,
) -> Column:
    """Replace each blocklisted token with ``mask``, preserving the
    single-space joins the tokenizer split on.  NULL text masks to ''
    (the NULL-as-empty contract of ``_tokens``)."""
    replaced = F.transform(
        _tokens(text),
        lambda t: F.when(t.isin(*blocklist), F.lit(mask)).otherwise(t),
    )
    return F.array_join(replaced, " ")


@dataclass(frozen=True)
class ToxicityConfig:
    """Opt-in pipeline dial: None blocklist disables the stage entirely
    (the default — existing scrub outputs are unchanged unless asked)."""

    blocklist: tuple[str, ...] = DEFAULT_BLOCKLIST
    threshold: float = DEFAULT_TOXICITY_THRESHOLD
    mask: str = TOXIC_MASK


def with_toxicity_joined(
    df: DataFrame,
    text_col: str,
    lexicon: DataFrame,
    id_col: str,
    threshold: float = DEFAULT_TOXICITY_THRESHOLD,
    mask: str = TOXIC_MASK,
) -> DataFrame:
    """The large-lexicon scale path: broadcast-join scoring + masking.

    The expression path (:func:`with_toxicity`) evaluates ``t.isin(*list)``
    per token — linear in the lexicon, perfect for the few-hundred-word
    blocklists these filters actually use, but wrong for a 10^5-phrase
    curated lexicon.  This variant is the same shape as the dedup inverted
    index: tokenize once, ``posexplode``, hash-join the token column against
    a **broadcast** lexicon (O(1) per token), then rebuild the masked text
    with an order-preserving ``array_sort(collect_list(struct(pos, tok)))``.

    ``lexicon`` must have a ``token`` string column (extra columns ignored);
    ``id_col`` must be unique per row.  Output matches
    :func:`with_toxicity`'s ``n_toxic`` / ``toxicity`` / ``toxic_flag``
    columns plus ``masked`` (the joined path can't mask arbitrary other
    columns in place without re-exploding each; callers substitute
    ``masked`` themselves).

    Scale shape: one broadcast hash join on the exploded tokens (no shuffle
    of the corpus), one hash aggregation keyed on ``id_col``, and one
    equi-join back to the input — both AQE-planned.  Nothing is quadratic
    in either corpus or lexicon size.
    """
    lex = F.broadcast(lexicon.select(F.col("token")).distinct())
    toks = df.select(
        F.col(id_col),
        F.posexplode(_tokens(F.col(text_col))).alias("pos", "tok"),
    )
    joined = toks.join(lex, toks["tok"] == lex["token"], "left")
    scored = (
        joined.select(
            id_col,
            "pos",
            F.col("token").isNotNull().alias("hit"),
            F.when(F.col("token").isNotNull(), F.lit(mask))
            .otherwise(F.col("tok"))
            .alias("out_tok"),
        )
        .groupBy(id_col)
        .agg(
            F.sum(F.col("hit").cast("int")).alias("n_toxic"),
            (F.sum(F.col("hit").cast("int")) / F.count("*")).alias("toxicity"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "out_tok"))),
                    lambda s: s["out_tok"],
                ),
                " ",
            ).alias("masked"),
        )
        .withColumn("toxic_flag", F.col("toxicity") >= F.lit(threshold))
    )
    out = df.join(scored, id_col, "left")
    # NULL text folds to '' in _tokens, so every input row survives
    # posexplode with one empty token and scores 0/0.0/false like the
    # expression path; the coalesce is a defensive rail in case a caller
    # swaps in a tokenizer without the NULL-as-empty contract.
    return out.withColumn(
        "toxic_flag", F.coalesce("toxic_flag", F.lit(False))
    )


def with_toxicity(
    df: DataFrame,
    text_col: str,
    cfg: ToxicityConfig = ToxicityConfig(),
    mask_cols: Sequence[str] = (),
    keep_col: str | None = None,
) -> DataFrame:
    """Append ``n_toxic`` / ``toxicity`` / ``toxic_flag`` scored on
    ``text_col``, mask each column in ``mask_cols`` in place, and — when
    ``keep_col`` is given — AND the flag's negation into the existing
    keep/drop decision.

    One narrow projection: no shuffle, no UDF; safe to place either side of
    the scrub stage.  Scoring uses ``text_col`` (the pre-mask text) so the
    flag is independent of mask choice.
    """
    score = toxicity_score(F.col(text_col), cfg.blocklist)
    out = df.withColumns(
        {
            "n_toxic": toxic_hits(F.col(text_col), cfg.blocklist),
            "toxicity": score,
            # score is total (NULL folds to '' in _tokens), so the plain
            # comparison is already total; coalesce kept as a cheap
            # defensive rail for the keep-gate AND below.
            "toxic_flag": F.coalesce(
                score >= F.lit(cfg.threshold), F.lit(False)
            ),
        }
    )
    for c in mask_cols:
        out = out.withColumn(c, mask_toxic(F.col(c), cfg.blocklist, cfg.mask))
    if keep_col is not None:
        out = out.withColumn(
            keep_col, F.col(keep_col) & ~F.col("toxic_flag")
        )
    return out
