"""Byte-pair-encoding application over the corpus vocabulary.

The GPT-2-family apply loop (Sennrich et al. 2016 merge application):
start from single characters and repeatedly apply the lowest-rank
applicable merge at its leftmost position, one occurrence per step,
until no merge applies.  One-at-a-time leftmost application is
equivalent to the batch all-occurrences form (a merge of pair P never
creates a new occurrence of P — the merged token is strictly longer
than either side), and it is the exact program the DuckDB recursive-CTE
oracle steps, so both engines share semantics by construction.

Scale shape: BPE runs on the DISTINCT-word dimension only (the classic
word-level cache — the corpus reduces to its vocabulary once,
map-side combined, and the Python loop touches each unique word once
per executor batch: the per-UNIQUE-element contract the ST_*/refine
kernels also follow).  The scored corpus side never runs Python: the
(word -> n_tokens) dim broadcasts back onto the word stream.

The merge table is a tokenizer ARTIFACT (fixed literals, not learned
in-query) — the realistic deployment shape where merges ship with the
model.  These twelve were learned offline from the corpus vocabulary
(deterministic max-count tie-break-lexicographic) and include cascades
(pa+r, m+er, sc+a) so rank priority is genuinely exercised.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

# (rank implicit in order) — frozen; shared with the oracle literal.
MERGES: list[tuple[str, str]] = [
    ("e", "r"), ("o", "r"), ("i", "n"), ("o", "w"),
    ("s", "t"), ("l", "u"), ("p", "a"), ("pa", "r"),
    ("m", "er"), ("a", "t"), ("s", "c"), ("sc", "a"),
]


def encode_word(word: str) -> list[str]:
    """Apply MERGES to one word: min-rank, leftmost, one per step."""
    toks = list(word)
    while True:
        best = None  # (rank, pos)
        for rank, (left, right) in enumerate(MERGES):
            for i in range(len(toks) - 1):
                if toks[i] == left and toks[i + 1] == right:
                    if best is None or rank < best[0]:
                        best = (rank, i)
                    break  # leftmost occurrence for this rank
        if best is None:
            return toks
        rank, i = best
        left, right = MERGES[rank]
        toks = toks[:i] + [left + right] + toks[i + 2:]


_TOK_SCHEMA = "word string, n_toks long, toks_pipe string"


def encode_vocab(vocab: DataFrame) -> DataFrame:
    """(word) -> (word, n_toks, toks_pipe) via one Arrow-batched pass
    over the distinct-word dim."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            toks = [encode_word(w) for w in pdf["word"]]
            yield pd.DataFrame({
                "word": pdf["word"],
                "n_toks": [len(t) for t in toks],
                "toks_pipe": ["|".join(t) for t in toks],
            })

    return vocab.mapInPandas(run, schema=_TOK_SCHEMA)
