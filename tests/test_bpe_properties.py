"""Property test: the distributed BPE learn loop equals a pure-Python
reference implementation (same delimited-string double-replace merge
semantics) on random corpora — merge table AND final vocabulary. This
is the deepest check on the riskiest new operator: any divergence in
pair counting, tie-breaking, or replace-scan behavior shows up here
before it could reach the cross-engine oracle."""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from universal_importer_duckdb_spark.operators.bpe import (
    learn_bpe,
    word_frequency_table,
)

# small alphabet + repetition → plenty of pair collisions and ties
word_st = st.text(alphabet="abc", min_size=1, max_size=6)
corpus_st = st.lists(
    st.lists(word_st, min_size=1, max_size=8).map(" ".join),
    min_size=1,
    max_size=6,
)


def _reference_learn(texts, n_merges):
    wc = Counter()
    for t in texts:
        for w in t.lower().split(" "):
            if w:
                wc[w] += 1
    vocab = {w: "·" + "·".join(w) + "·" for w in wc}
    merges = []
    for rnd in range(1, n_merges + 1):
        pairs = Counter()
        for w, d in vocab.items():
            syms = d.strip("·").split("·")
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += wc[w]
        if not pairs:
            return merges, vocab, True
        # max count, ties broken lexicographically ascending
        (a, b), c = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rnd, a, b, c))
        pat, rep = f"·{a}·{b}·", f"·{a}{b}·"
        vocab = {
            w: d.replace(pat, rep).replace(pat, rep)
            for w, d in vocab.items()
        }
    return merges, vocab, False


@settings(
    max_examples=8, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(texts=corpus_st)
def test_learn_bpe_matches_python_reference(spark, texts):
    n_merges = 3
    ref_merges, ref_vocab, exhausted = _reference_learn(texts, n_merges)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    words = word_frequency_table(df)
    if exhausted:
        try:
            learn_bpe(words, n_merges=n_merges)
        except ValueError:
            return  # both sides agree the corpus ran dry
        raise AssertionError("reference exhausted but learn_bpe did not")
    merges_df, vocab_df = learn_bpe(words, n_merges=n_merges)
    got_merges = [
        (r.round, r.sym_a, r.sym_b, r.pair_count) for r in merges_df.collect()
    ]
    assert got_merges == ref_merges
    got_vocab = {r.word: r.d for r in vocab_df.collect()}
    assert got_vocab == ref_vocab
