"""Shipped linear quality model: score documents under an EXTERNAL
bag-of-words weight file.

Production pipelines filter web text with a trained quality classifier
(a fasttext-style linear model is the standard first tier — cf. CCNet
/ GPT-3 / RedPajama data recipes). Reference anchor: none — the
reference (main.py) has no model-based filtering; this is north-star
scope for the 100 TB pipeline. The model arrives as an ARTIFACT, not
corpus-learned state — the same interop contract as the shipped
GPT-2-style ``merges.txt`` (operators/bpe.py::load_merges_file): a
TSV of ``token<TAB>integer milli-weight`` rows, ``#``/blank lines
skipped.

Scoring is exact integer arithmetic: a document's raw score is the
sum of its tokens' milli-weights (repeats count), and its logit is
``raw div n_words`` (integer division) — bit-identical across
engines, partitionings, and reduction orders, so the quality gate is
reproducible anywhere.

Scale shape: the weight table folds into the plan as a LITERAL map,
so scoring is a pure narrow map (higher-order fold over the token
array) — zero shuffles, no join, no Python; at 100 TB it runs fused
into the scan like the other per-row text signals. A model too large
to inline as a literal (100k+ features) would switch to the exploded
join against a broadcast weight table; the shipped-artifact loader
and scoring contract stay identical.
"""

from __future__ import annotations

import pathlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SHIPPED_WEIGHTS_PATH = str(
    pathlib.Path(__file__).resolve().parents[1]
    / "data"
    / "shipped_quality_weights.tsv"
)


def load_quality_weights(path: str = SHIPPED_WEIGHTS_PATH) -> dict[str, int]:
    """Parse a ``token<TAB>integer`` TSV; ``#``/blank lines skipped.
    Tokens are validated as already-normalized (lowercase, no spaces)
    and unique — a duplicate row would make the scoring
    order-dependent, so it is a loader error, not a data condition."""
    weights: dict[str, int] = {}
    with open(path, encoding="utf-8") as fh:
        for ln, raw in enumerate(fh, 1):
            line = raw.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split("\t")
            if len(parts) != 2:
                raise ValueError(
                    f"{path}:{ln}: expected 'token<TAB>weight', got {line!r}"
                )
            tok, wt = parts
            if not tok or tok != tok.lower() or " " in tok:
                raise ValueError(
                    f"{path}:{ln}: token {tok!r} is not normalized"
                )
            if "'" in tok or "\\" in tok:
                # r7 advice: the oracle embeds tokens in a SQL VALUES
                # literal (escaped there too, but a quote/backslash in
                # a weight token is a malformed artifact, not data)
                raise ValueError(
                    f"{path}:{ln}: token {tok!r} contains a quote/"
                    f"backslash — not a valid normalized weight token"
                )
            if tok in weights:
                raise ValueError(f"{path}:{ln}: duplicate token {tok!r}")
            weights[tok] = int(wt)
    if not weights:
        raise ValueError(f"{path}: no weight rows")
    return weights


def quality_tokens(text_col: str = "text"):
    """The model's token array: lowered, space-split, empty-filtered.
    Exposed so consumers that fuse OTHER per-token signals into the
    same pass (docs_corpus_card's marker counts) share one
    definition of the token stream."""
    return F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), " "),
        lambda w: w != "",
    )


def quality_raw_fold(weights: dict[str, int], toks):
    """The literal-map weight fold over an EXISTING token-array
    column — the single definition of the shipped model's raw score
    (exposed per the r9 review: docs_corpus_card had grown an inline
    copy, which a future weights/tokenization change would have
    silently missed)."""
    pairs: list = []
    for tok, wt in sorted(weights.items()):
        pairs.append(F.lit(tok))
        pairs.append(F.lit(int(wt)).cast("bigint"))
    wmap = F.create_map(*pairs)
    return F.aggregate(
        toks,
        F.lit(0).cast("bigint"),
        lambda acc, w: acc + F.coalesce(wmap[w], F.lit(0).cast("bigint")),
    ).cast("bigint")


def quality_signal_exprs(weights: dict[str, int], text_col: str = "text"):
    """(n_words, raw_milli) column expressions — the literal-map fold
    shared by the per-doc scorer below and aggregate consumers
    (docs_corpus_card) that fold the signal straight into a group-by
    without materializing a per-doc frame."""
    toks = quality_tokens(text_col)
    return F.size(toks).cast("bigint"), quality_raw_fold(weights, toks)


def quality_model_scores(
    docs: DataFrame,
    weights: dict[str, int],
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold_milli: int = 0,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-document linear quality score under ``weights``.

    Returns ``(id, <carry_cols...>, n_words, raw_milli, logit_milli,
    is_quality)``: ``raw_milli`` the exact integer sum of token
    weights, ``logit_milli = raw_milli div n_words`` (0 for wordless
    docs), ``is_quality = logit_milli >= threshold_milli``.
    ``carry_cols`` pass through untouched — stream callers that fuse
    this stateless fold with other per-row signals (the admission
    funnel's fingerprint) carry them here instead of re-implementing
    the gate, so one definition governs batch and ingest.

    Contract note (r7 advice): a WORDLESS document has logit 0 and
    therefore passes the gate under the default ``threshold_milli=0``
    (0 >= 0). That is deliberate — this model scores token evidence,
    and an empty document presents none, so the linear gate is
    neutral on it, identically in both engines. Callers building a
    corpus filter must combine the gate with a minimum-length screen
    (``n_words`` is emitted precisely so ``is_quality AND n_words >=
    k`` is a one-expression follow-up), or raise ``threshold_milli``
    above 0; silently flipping wordless docs to False here would make
    ``is_quality`` disagree with its own documented logit definition.
    """
    n, raw = quality_signal_exprs(weights, text_col)
    carry = list(carry_cols)
    return (
        docs.select(
            F.col(id_col),
            *[F.col(c) for c in carry],
            n.alias("n_words"),
            raw.alias("raw_milli"),
        )
        .selectExpr(
            id_col,
            *carry,
            "n_words",
            "raw_milli",
            # integer div truncates toward zero in both engines for the
            # positive divisor; wordless docs pin logit to 0
            "CASE WHEN n_words > 0 THEN raw_milli div n_words "
            "ELSE CAST(0 AS BIGINT) END AS logit_milli",
        )
        .selectExpr(
            id_col,
            *carry,
            "n_words",
            "raw_milli",
            "logit_milli",
            f"logit_milli >= {int(threshold_milli)} AS is_quality",
        )
    )
