"""Linear-index alignment path.

Reference component #3: HISAT2/Bowtie2 with `-k 10` against the linear
index of all allele sequences (typing_common.py:995-1027; counting
consumed at typing_core.py:1597-1648).  Here: one FM-index over the
concatenation of every allele sequence; exact full-read matches map back
to allele ids through the SA document array.
"""
from __future__ import annotations

import numpy as np

from ..db.catalog import GeneRef
from ..ops.fm import FMIndex, pack_queries
from ..utils.dna import encode_seq, revcomp


class LinearAligner:
    def __init__(self, gene: GeneRef):
        self.gene = gene
        parts = []
        bounds = []
        pos = 0
        for name in gene.allele_names:
            seq = gene.allele_seq(name)
            parts.append(encode_seq(seq))
            parts.append(np.array([4], np.int8))  # N separator
            bounds.append(pos)
            pos += len(seq) + 1
        self.starts = np.array(bounds, np.int64)
        codes = np.concatenate(parts) if parts else np.zeros(0, np.int8)
        self.fm = FMIndex(codes)

    def allele_sets(self, seqs, max_hits=128):
        """For each read: set of allele indices containing it exactly
        (either orientation)."""
        L = max(len(s) for s in seqs)
        out = []
        for batch_seqs in (seqs, [revcomp(s) for s in seqs]):
            q = pack_queries(batch_seqs, L)
            lo, hi = self.fm.search_batch(q)
            out.append((np.asarray(lo), np.asarray(hi)))
        results = []
        for i in range(len(seqs)):
            alleles = set()
            for lo, hi in out:
                l, h = int(lo[i]), int(hi[i])
                if h > l:
                    for p in self.fm.locate(l, h, max_hits):
                        a = int(np.searchsorted(self.starts, p, "right") - 1)
                        alleles.add(a)
            results.append(alleles)
        return results

    def type_linear(self, seqs):
        """The reference's linear-path counting (typing_core.py:1597-1648):
        per read, the allele set feeds Gene_cmpt/Gene_counts directly."""
        counts = np.zeros(self.gene.n_alleles, np.int64)
        cmpt = {}
        for alleles in self.allele_sets(seqs):
            if not alleles:
                continue
            names = sorted(self.gene.allele_names[a] for a in alleles)
            for a in alleles:
                counts[a] += 1
            key = "-".join(names)
            cmpt[key] = cmpt.get(key, 0) + 1
        order = np.argsort(-counts, kind="stable")
        ranked = [(self.gene.allele_names[i], int(counts[i]))
                  for i in order if counts[i] > 0]
        return ranked, cmpt
