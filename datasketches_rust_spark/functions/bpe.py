"""Real BPE vocabulary application (char-level, greedy lowest-rank merge).

Completes the text-tokenization surface beyond the pretokenizer count
(functions/text.py bpe_token_count_col): this module APPLIES a committed
merge table to every pretoken — the actual byte-pair-encoding step an LLM
tokenizer performs — rather than just counting pretokenizer chunks.

Algorithm (the standard BPE encode loop): split the pretoken into
characters; repeatedly find the merge pair with the LOWEST rank present
as an adjacent pair and fuse ALL its occurrences left-to-right
(non-overlapping) in one pass; stop when no adjacent pair is in the
vocabulary. Char-level rather than byte-level (no byte-to-unicode
remap) — the merge-rank-driven mechanics are identical.

100 TB shape: tokenization is context-free per pretoken, so the encoder
runs once per DISTINCT pretoken (a Zipf-bounded set, millions of rows at
web scale, not trillions), with the merge table broadcast inside the
pandas UDF closure; per-document totals come from one (doc, pretoken)
count aggregate joined to the tiny distinct-token result — the corpus
text itself never passes through Python.

The kernel is Spark-free so the DuckDB oracle side can replay the same
semantics: verify via a WITH RECURSIVE + LATERAL SQL loop over the same
committed MERGES (see queries.oracle for bpe_tokens_per_doc), which
hash-matches exactly.

MERGES was trained once, deterministically (greedy most-frequent pair,
lexicographic tie-break) on the sf0.001 documents corpus and is
committed as the engine's mini-vocab — the same role as a shipped
tokenizer.json.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# fmt: off
MERGES: list[tuple[str, str]] = [
    (" ", "s"), ("e", "r"), ("o", "r"), ("i", "n"), ("o", "w"),
    ("l", "u"), ("a", "r"), ("p", "ar"), (" ", "a"), (" ", "v"),
    ("a", "s"), (" ", "c"), ("m", "er"), ("a", "t"), (" ", "f"),
    (" ", "t"), (" ", "b"), ("a", "n"), ("c", "an"), ("lu", "m"),
    ("lum", "n"), ("o", "lumn"), ("d", "ow"), ("in", "dow"),
    ("w", "indow"), ("d", "er"), ("or", "der"), ("or", "t"),
    ("par", "t"), ("u", "p"), (" s", "ort"), (" ", "window"),
    (" ", "order"), (" c", "olumn"), (" s", "can"), ("g", "g"),
    (" ", "part"), ("a", "lu"), ("alu", "e"), ("in", "e"),
    ("l", "ine"), ("e", "y"), ("k", "ey"), (" a", "gg"), ("j", "o"),
    ("jo", "in"), ("g", "e"), ("mer", "ge"), ("er", "y"), ("g", "r"),
    ("gr", "o"), ("gro", "up"), ("q", "u"), ("qu", "ery"),
    (" v", "alue"), (" ", "line"), ("c", "t"), ("ct", "or"),
    ("e", "ctor"), (" ", "key"), ("as", "h"), ("h", "ash"),
    (" ", "join"), ("l", "ow"),
]
# fmt: on

_RANKS = {pair: i for i, pair in enumerate(MERGES)}


def bpe_encode(pretoken: str,
               ranks: dict[tuple[str, str], int] | None = None) -> list[str]:
    """Encode one pretoken: greedy lowest-rank merges until fixpoint.
    Pure python, Spark-free (shared with tests / oracle reasoning)."""
    if ranks is None:
        ranks = _RANKS
    seq = list(pretoken)
    while len(seq) > 1:
        best_rank, best_pair = None, None
        for i in range(len(seq) - 1):
            r = ranks.get((seq[i], seq[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (seq[i], seq[i + 1])
        if best_pair is None:
            break
        a, b = best_pair
        out, i = [], 0
        while i < len(seq):
            if i < len(seq) - 1 and seq[i] == a and seq[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(seq[i])
                i += 1
        seq = out
    return seq


def bpe_token_counts(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text",
                     merges: list[tuple[str, str]] | None = None
                     ) -> DataFrame:
    """(id_col, n_pretokens, n_bpe_tokens) per document.

    Plan shape: JVM pretokenize+explode -> (doc, tok) count aggregate ->
    distinct toks through the Arrow-batched encoder (the ONLY Python,
    sized by vocabulary not corpus) -> one join back -> per-doc sum.
    """
    from pyspark.sql.functions import pandas_udf

    from datasketches_rust_spark.functions.text import BPE_PRETOKEN_RE

    ranks = (_RANKS if merges is None
             else {p: i for i, p in enumerate(merges)})

    @pandas_udf("int")
    def n_bpe(toks: pd.Series) -> pd.Series:
        return toks.map(lambda t: len(bpe_encode(t, ranks)))

    per_tok = (docs
               .select(F.col(id_col),
                       F.explode(F.regexp_extract_all(
                           F.col(text_col), F.lit(BPE_PRETOKEN_RE),
                           F.lit(0))).alias("tok"))
               .groupBy(id_col, "tok")
               .agg(F.count("*").alias("n_occ")))
    vocab = (per_tok.select("tok").distinct()
             .withColumn("n_bpe", n_bpe("tok")))
    return (per_tok.join(vocab, "tok")
            .groupBy(id_col)
            .agg(F.sum("n_occ").alias("n_pretokens"),
                 F.sum(F.col("n_occ") * F.col("n_bpe"))
                 .alias("n_bpe_tokens")))
