"""BPE tokenizer training and encoding as DataFrame transforms.

The trained-tokenizer operator an LLM data pipeline runs over the corpus
before anything else (HuggingFace/SentencePiece BPE-trainer shape,
Sennrich et al. 2016): learn the top-R byte-pair merges from corpus word
frequencies, then encode documents with the learned merge table.

Scale shape (the part that matters at 100 TB):

* The corpus is touched ONCE at train time — a single word-frequency
  groupBy with map-side combine (the shuffle carries (word, partial
  count), never text).  Everything after operates on the VOCAB-sized
  word-frequency table (real tokenizer trainers work the same way: merge
  decisions depend only on word counts, not on the corpus).
* Each merge round = one tiny pair-count aggregation over the vocab table
  (pairs explode to ~avg_word_len rows per word) + a 1-row TakeOrdered
  collect (the argmax pair) + a MAP-ONLY string rewrite of the vocab
  table.  The vocab table is re-persisted per round and the previous
  round released (the kmeans/pagerank cadence), so lineage stays flat.
* Encoding is MAP-ONLY: the R learned merges ride into the codegen
  closure as a literal `replace` chain — scan-speed over 100 TB, zero
  exchanges beyond what the caller asks for.

Exactness contract (why a DuckDB oracle can replay training round for
round, value-exact):

* Symbol sequences are DOUBLE-space-delimited strings with double spaces
  at both ends (`'  l  o  w  ▁  '`); a merge of pair (l, r) is ONE
  literal replacement of `' l  r '` by `' lr '`.  The single flanking
  spaces inside the pattern leave one space on each side for the
  neighboring match, so left-to-right non-overlapping `replace` — whose
  semantics Spark and DuckDB share exactly (verified on the
  adjacent-overlap case) — merges `[a,a,a,a]` to `[aa,aa]` in one pass:
  the scan resumes immediately after the merged symbol's trailing space,
  which is precisely the i -> i+2 continuation of the textbook
  single-scan greedy merge.  One pass IS exhaustive BPE, for any word
  length; pairs involving the just-created symbol wait for a later
  round, exactly as in the reference algorithm (pinned against a pure-
  Python true-BPE implementation in tests/test_tokenizer.py, including
  maximal identical-symbol runs).
* Pair counts are exact int64 sums (order-free); the argmax pair is
  `ORDER BY count DESC, pair ASC LIMIT 1` — UTF-8/code-point ordering
  agrees between Spark and DuckDB for the symbols in play (ASCII plus
  U+2581), so the tie-break is deterministic cross-engine.
* Tokenization is the repo-wide contract: non-empty pieces of
  lower(text) split on \\W+ (engine/text.py).

The end-of-word marker is U+2581 (the SentencePiece meta symbol): it can
never collide with a corpus symbol because \\w never matches it, and no
symbol ever contains a space, so the delimiting is unambiguous.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from engine.text import tokens_col

#: end-of-word marker symbol (SentencePiece's LOWER ONE EIGHTH BLOCK).
EOW = "▁"

#: the inter-symbol delimiter; see module docstring for why it is two
#: spaces (one replace pass == one exhaustive single-scan greedy merge).
SEP = "  "


def _seq_col(word: Column) -> Column:
    """`'  c1  c2  ...  cn  ▁  '` — the double-space-delimited symbol
    sequence of a word (single chars + end-of-word marker).  Same text
    function chain as the DuckDB oracle: one global regexp_replace, two
    concats."""
    return F.concat(F.lit(SEP), F.regexp_replace(word, "(.)", "$1" + SEP),
                    F.lit(EOW + SEP))


def _merge_expr(seq: Column, lhs: str, rhs: str) -> Column:
    """Apply one learned merge exhaustively: ONE literal replace of
    ' lhs  rhs ' with ' lhsrhs ' (single flanking spaces — each match
    shares its outer delimiter space with the neighboring match)."""
    return F.replace(seq, F.lit(f" {lhs}{SEP}{rhs} "),
                     F.lit(f" {lhs}{rhs} "))


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) over the corpus — the one corpus-wide aggregation of
    BPE training.  Map-side combine bounds the exchange by the vocab."""
    return (docs.select(F.explode(tokens_col(F.col(text_col)))
                        .alias("word"))
            .groupBy("word").agg(F.count(F.lit(1)).alias("cnt")))


def _pairs_col(seq: Column) -> Column:
    """Adjacent symbol pairs of a sequence as array<string> ('l r')."""
    arr = F.split(F.trim(seq), SEP)
    n = F.size(arr)
    return F.when(
        n >= 2,
        F.zip_with(F.slice(arr, 1, n - 1), F.slice(arr, 2, n - 1),
                   lambda a, b: F.concat(a, F.lit(" "), b))
    ).otherwise(F.array().cast("array<string>"))


#: Driver-envelope for merge learning (the classifier/k-means precedent):
#: when the word-frequency table — which is what every merge decision is a
#: function of — fits this many characters, all rounds run on one driver
#: collect instead of one pair-count shuffle + one vocab rewrite job per
#: round.  Value-identical: pair counts are exact int64 sums either way,
#: the argmax tie-break (count desc, pair asc) compares UTF-8 byte order
#: in Spark and code-point order in Python, which agree (UTF-8 is
#: order-preserving), and Python str.replace is the same left-to-right
#: non-overlapping literal replace as Spark's.  Past the envelope the
#: distributed rounds run unchanged.
BPE_DRIVER_MAX_CHARS = 16 << 20


def _bpe_rounds_driver(vocab_rows: list[tuple[str, int]],
                       rounds: int) -> list[tuple]:
    """All merge rounds over a collected (word, cnt) vocabulary —
    value-identical twin of the distributed loop (see
    BPE_DRIVER_MAX_CHARS)."""
    seqs = [SEP + "".join(c + SEP for c in w) + EOW + SEP
            for w, _ in vocab_rows]
    cnts = [int(c) for _, c in vocab_rows]
    merges: list[tuple] = []
    for r in range(1, rounds + 1):
        pair_c: dict[str, int] = {}
        for seq, cnt in zip(seqs, cnts):
            arr = seq.strip(" ").split(SEP)
            for i in range(len(arr) - 1):
                p = arr[i] + " " + arr[i + 1]
                pair_c[p] = pair_c.get(p, 0) + cnt
        if not pair_c:
            raise ValueError(
                f"bpe_train: corpus exhausted after {r - 1} merges "
                f"(asked for {rounds})")
        best = min(pair_c.items(), key=lambda kv: (-kv[1], kv[0]))
        pair, c = best
        lhs, rhs = pair.split(" ")
        merges.append((r, lhs, rhs, lhs + rhs, c))
        pat, rep = f" {lhs}{SEP}{rhs} ", f" {lhs}{rhs} "
        seqs = [s.replace(pat, rep) for s in seqs]
    return merges


def bpe_train(docs: DataFrame, rounds: int = 8,
              text_col: str = "text") -> tuple[list[tuple], DataFrame]:
    """Learn `rounds` BPE merges from the corpus.

    Returns (merges, merges_df): merges is the ordered driver-side list
    of (round, lhs, rhs, merged, cnt) — the artifact bpe_encode closes
    over — and merges_df the same rows as a DataFrame for oracle-checked
    output.  Raises ValueError on an empty corpus or if the corpus runs
    out of pairs before `rounds` merges (a contract violation, not a
    silent truncation).

    The ONE corpus-wide pass (word frequencies) always runs distributed;
    sub-envelope vocabularies then learn all merges on the driver
    (value-identical — see BPE_DRIVER_MAX_CHARS), larger ones run the
    per-round distributed loop."""
    spark = docs.sparkSession
    wf = word_frequencies(docs, text_col)
    vocab = (wf.select("word", "cnt",
                       _seq_col(F.col("word")).alias("seq"))
             .persist())
    stats = vocab.agg(F.count(F.lit(1)).alias("n"),
                      F.sum(F.length("word")).alias("chars")).collect()[0]
    if int(stats["n"]) == 0:
        vocab.unpersist()
        raise ValueError("bpe_train: empty corpus")
    merges: list[tuple] = []
    try:
        if int(stats["chars"] or 0) <= BPE_DRIVER_MAX_CHARS:
            rows = vocab.select("word", "cnt").collect()
            merges = _bpe_rounds_driver(
                [(r["word"], r["cnt"]) for r in rows], rounds)
        else:
            for r in range(1, rounds + 1):
                best = (vocab.select("cnt",
                                     F.explode(_pairs_col(F.col("seq")))
                                     .alias("pair"))
                        .groupBy("pair").agg(F.sum("cnt").alias("c"))
                        .orderBy(F.col("c").desc(), F.col("pair").asc())
                        .limit(1).collect())
                if not best:
                    raise ValueError(
                        f"bpe_train: corpus exhausted after {r - 1} merges "
                        f"(asked for {rounds})")
                pair, c = best[0]["pair"], int(best[0]["c"])
                lhs, rhs = pair.split(" ")
                merges.append((r, lhs, rhs, lhs + rhs, c))
                nxt = (vocab.select(
                    "word", "cnt",
                    _merge_expr(F.col("seq"), lhs, rhs).alias("seq"))
                    .persist())
                nxt.count()      # materialize before dropping the parent
                vocab.unpersist()
                vocab = nxt
    finally:
        vocab.unpersist()
    merges_df = spark.createDataFrame(
        merges, "round int, lhs string, rhs string, merged string, cnt long")
    return merges, merges_df


def bpe_encode(docs: DataFrame, merges: list[tuple],
               text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Encode documents with a learned merge list: exploded
    (doc_id, wpos, tpos, token) rows — wpos the word's position in the
    document, tpos the token's position within the word.

    MAP-ONLY: per-word symbol split + the full merge chain as literal
    replaces in one codegen expression (one `replace` per learned merge
    — string ops in whole-stage codegen, no Python, no exchange).
    Merges never cross word boundaries by construction: encoding
    operates per word, exactly like training."""
    seq = _seq_col(F.col("word"))
    for _, lhs, rhs, _, _ in merges:
        seq = _merge_expr(seq, lhs, rhs)
    return (docs
            .select(F.col(id_col),
                    F.posexplode(tokens_col(F.col(text_col)))
                    .alias("wpos", "word"))
            .select(id_col, "wpos",
                    F.posexplode(F.split(F.trim(seq), SEP))
                    .alias("tpos", "token")))
