"""Byte-pair-encoding tokenizer, Spark-first (engine-new surface; no diive
counterpart — the reference has no text tokenization at all, SURVEY.md §2.8).

The public BPE recipe (Sennrich, Haddow & Birch 2016, "Neural Machine
Translation of Rare Words with Subword Units") split into its two
genuinely different scale regimes:

- **Training** = one distributed word-frequency reduction (the only step
  that sees the 100 TB corpus: ``explode(split(text)) -> groupBy(word)``),
  then a driver-side merge loop over the frequency-capped word table.
  Capping to the top ``max_words`` word types is the standard trainer
  shape (every practical BPE trainer operates on a bounded word-count
  dict; the tail it drops is mass-negligible by Zipf) and is what makes
  the driver step O(types), independent of corpus size.
- **Encoding** = a stateless Arrow-batched pandas UDF with the merge
  ranks broadcast and a per-batch word -> ids memo (words repeat
  massively, so each distinct word pays the merge walk once per batch).
  No shuffle; the encode plan is a single projection over the scan.

Determinism: merge selection tie-breaks on the lexicographically smallest
pair at equal count, so the same corpus always yields the same merge
sequence, and token ids are assigned by sorted token string with id 0
reserved for ``<unk>``. The output ``tokens`` column is ``array<int>`` —
exactly the pre-tokenized-sequence shape the rollup engine ingests
(doc_id, tokens, n_tok, source).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: end-of-word marker (its own symbol, per the original recipe) — lets the
#: decoder restore word boundaries exactly.
EOW = "</w>"

UNK_ID = 0


@dataclass(frozen=True)
class BPETokenizer:
    """Trained merge sequence + derived vocab. ``merges`` is ordered (rank =
    position); ``vocab`` maps every token string encode can ever emit
    (alphabet + one new token per merge + ``<unk>``) to a stable id."""

    merges: tuple = ()
    vocab: dict = field(default_factory=dict)

    @property
    def ranks(self) -> dict:
        return {pair: i for i, pair in enumerate(self.merges)}

    @property
    def id_to_token(self) -> dict:
        return {i: t for t, i in self.vocab.items()}


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Distributed word-frequency table — the ONE corpus-sized step of BPE
    training. Partial aggregation (map-side combine) makes the shuffle
    carry word types, not word occurrences."""
    return (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word").agg(F.count("*").alias("freq"))
    )


def _merge_word(symbols: tuple, pair: tuple) -> tuple:
    """Merge every (left-to-right, non-overlapping) occurrence of ``pair``."""
    out, i, n = [], 0, len(symbols)
    a, b = pair
    while i < n:
        if i < n - 1 and symbols[i] == a and symbols[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return tuple(out)


def _train_merges(word_freqs: dict, num_merges: int) -> list:
    """Driver-side merge loop on a bounded word->freq dict. O(types x
    merges) with full pair recounts — simple and exactly-deterministic;
    production trainers keep incremental pair counts, which changes cost,
    not output."""
    seg = {tuple(list(w) + [EOW]): f for w, f in word_freqs.items()}
    merges = []
    for _ in range(num_merges):
        pairs: dict = {}
        for sym, f in seg.items():
            for p in zip(sym, sym[1:]):
                pairs[p] = pairs.get(p, 0) + f
        # only pairs occurring >1 time are worth a merge (ties with 1
        # occurrence would just memorize hapax words)
        pairs = {p: c for p, c in pairs.items() if c > 1}
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        seg = {_merge_word(sym, best): f for sym, f in seg.items()}
    return merges


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 200,
    max_words: int = 100_000,
) -> BPETokenizer:
    """Train on the corpus: distributed word counts, cap to the top
    ``max_words`` types (count desc, word asc — deterministic), run the
    merge loop, derive the id table."""
    wc = word_counts(df, text_col)
    top = (
        wc.orderBy(F.desc("freq"), F.asc("word"))
        .limit(max_words)
        .collect()
    )
    word_freqs = {r["word"]: r["freq"] for r in top}
    merges = _train_merges(word_freqs, num_merges)
    alphabet = {EOW}
    for w in word_freqs:
        alphabet.update(w)
    tokens = sorted(alphabet | {a + b for a, b in merges})
    vocab = {"<unk>": UNK_ID}
    vocab.update({t: i + 1 for i, t in enumerate(tokens)})
    return BPETokenizer(merges=tuple(merges), vocab=vocab)


def _encode_word(word: str, ranks: dict) -> list:
    """Greedy lowest-rank-first merge walk (the standard BPE encoder)."""
    symbols = list(word) + [EOW]
    while len(symbols) > 1:
        best_rank, best_pair = None, None
        for p in zip(symbols, symbols[1:]):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, p
        if best_pair is None:
            break
        symbols = list(_merge_word(tuple(symbols), best_pair))
    return symbols


def encode(
    df: DataFrame,
    tokenizer: BPETokenizer,
    text_col: str = "text",
    out_col: str = "tokens",
) -> DataFrame:
    """Append ``out_col: array<int>`` token ids. Arrow-batched pandas UDF,
    merge ranks + vocab broadcast once per executor via closure capture;
    per-batch memo so each distinct word pays the merge walk once."""
    ranks, vocab = tokenizer.ranks, dict(tokenizer.vocab)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def _enc(texts):
        import pandas as pd

        memo: dict = {}

        def enc_text(text):
            if text is None:
                return None
            ids = []
            for w in text.split(" "):
                if not w:
                    continue
                got = memo.get(w)
                if got is None:
                    got = [vocab.get(s, UNK_ID) for s in _encode_word(w, ranks)]
                    memo[w] = got
                ids.extend(got)
            return ids

        return pd.Series([enc_text(t) for t in texts])

    return df.withColumn(out_col, _enc(F.col(text_col)))


def decode(
    df: DataFrame,
    tokenizer: BPETokenizer,
    tokens_col: str = "tokens",
    out_col: str = "decoded",
) -> DataFrame:
    """Inverse of :func:`encode` for known-vocab ids: join token strings,
    EOW -> space, strip the trailing space. ``<unk>`` ids decode to the
    empty string (information was lost at encode time by construction)."""
    id2tok = tokenizer.id_to_token

    @F.pandas_udf(T.StringType())
    def _dec(tok_arrays):
        import pandas as pd

        def dec(ids):
            if ids is None:
                return None
            s = "".join(id2tok.get(int(i), "") for i in ids)
            return s.replace(EOW, " ").rstrip(" ")

        return pd.Series([dec(ids) for ids in tok_arrays])

    return df.withColumn(out_col, _dec(F.col(tokens_col)))


def encode_to_token_table(
    df: DataFrame,
    tokenizer: BPETokenizer,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """documents -> the engine's ingest shape: (doc_id, tokens:array<int>,
    n_tok:int, source) — a real tokenizer feeding the rollup/retention
    cascade instead of the chars/3.4 estimate."""
    enc = encode(df, tokenizer, text_col=text_col)
    return enc.select(
        F.col(id_col),
        F.col("tokens"),
        F.size("tokens").cast("int").alias("n_tok"),
        F.col(source_col),
    )
