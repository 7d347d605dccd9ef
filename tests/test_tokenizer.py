"""BPE trainer/encoder vs an independent pure-Python true-BPE reference.

The reference implements textbook BPE (Sennrich et al. 2016): exhaustive
left-to-right single-scan merge per round, argmax pair by (count, then
lexicographically smallest 'l r' string).  The engine reproduces the
single-scan merge with ONE literal replace per round via double-space
delimiting (engine/tokenizer.py docstring); these tests pin that
equivalence, including the adversarial identical-symbol-run cases where
a naive single-space encoding provably diverges.
"""

from collections import Counter

import pytest

from engine.tokenizer import EOW, bpe_encode, bpe_train


def _ref_merge(syms, lhs, rhs):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == lhs and syms[i + 1] == rhs:
            out.append(lhs + rhs)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def _ref_bpe(texts, rounds):
    """True BPE over the repo tokenization contract (lower + \\W+)."""
    import re
    words = Counter()
    for t in texts:
        words.update(w for w in re.split(r"\W+", t.lower()) if w)
    vocab = Counter()
    for w, c in words.items():
        vocab[tuple(list(w) + [EOW])] += c
    merges = []
    for r in range(1, rounds + 1):
        pc = Counter()
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += c
        assert pc, "reference corpus exhausted"
        best = min(pc.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}"))
        (lhs, rhs), c = best
        merges.append((r, lhs, rhs, lhs + rhs, c))
        vocab = Counter({_ref_merge(s, lhs, rhs): c
                         for s, c in vocab.items()})
    return merges, vocab


def _mkdocs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])


def test_bpe_train_matches_reference(spark):
    texts = ["low lower lowest low low", "new newer newest new",
             "wide wider widest low newer", "low low lower new new"]
    merges, mdf = bpe_train(_mkdocs(spark, texts), rounds=6)
    assert merges == _ref_bpe(texts, 6)[0]
    assert [tuple(r) for r in mdf.orderBy("round").collect()] == merges


def test_bpe_identical_runs_match_reference(spark):
    # Maximal identical-symbol runs: the exact case where single-space
    # delimiting diverges from single-scan BPE (the consumed boundary
    # space hides every other adjacent occurrence).  Odd and even run
    # lengths, plus words where the merged symbol immediately re-pairs.
    texts = ["a" * 63 + " " + "a" * 64, "aa aaa a", "b ab ba",
             "aaaaaa aaaa"]
    merges, _ = bpe_train(_mkdocs(spark, texts), rounds=6)
    assert merges == _ref_bpe(texts, 6)[0]


def test_bpe_empty_corpus_raises(spark):
    with pytest.raises(ValueError, match="empty"):
        bpe_train(_mkdocs(spark, ["  ...  "]), rounds=1)


def test_bpe_exhausted_corpus_raises(spark):
    # 'ab' offers exactly 2 merge opportunities (a+b, ab+EOW); the third
    # round must raise, not silently return fewer merges.
    with pytest.raises(ValueError, match="exhausted"):
        bpe_train(_mkdocs(spark, ["ab ab"]), rounds=3)


def test_bpe_encode_matches_reference_vocab(spark):
    texts = ["low lower lowest low low", "new newer newest new",
             "wide wider widest low newer", "low low lower new new"]
    docs = _mkdocs(spark, texts)
    merges, _ = bpe_train(docs, rounds=6)
    ref_vocab = _ref_bpe(texts, 6)[1]
    enc = bpe_encode(docs, merges).toPandas()
    # every encoded word must equal the reference's merged symbol tuple
    got = (enc.sort_values(["doc_id", "wpos", "tpos"])
           .groupby(["doc_id", "wpos"])["token"].apply(tuple))
    for (doc_id, wpos), toks in got.items():
        word = [w for w in texts[doc_id].lower().split() if w][wpos]
        assert toks in ref_vocab
        assert "".join(toks) == word + EOW
