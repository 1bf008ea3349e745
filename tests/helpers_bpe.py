"""Shared pure-Python iterative BPE reference (Sennrich 2016,
algorithm 1) — the single oracle both test_pairs_negatives (the
registered member) and test_bpe_train (the eager operator) pin
against, so the two suites cannot validate different references."""

from __future__ import annotations

import re


def py_bpe_train(texts, k):
    """Re-count after every merge; one leftmost-greedy non-overlapping
    token pass per learned rank (the pass semantics the encoded
    literal replace implements). Returns (merge_table, final_streams):
    merge_table = [(rank, left, right, count_at_learn)]."""
    enc = [re.findall(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]", t or "") for t in texts]
    merges = []
    for rank in range(1, k + 1):
        counts = {}
        for p in enc:
            for a, b in zip(p, p[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + 1
        if not counts:
            break
        (l, r), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, l, r, c))
        new_enc = []
        for p in enc:
            out, i = [], 0
            while i < len(p):
                if i + 1 < len(p) and p[i] == l and p[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(p[i])
                    i += 1
            new_enc.append(out)
        enc = new_enc
    return merges, enc
