"""Family-level alignment: assign reads across a multi-gene catalog.

The reference aligns each family's extracted reads against one graph
index containing all of that family's genes, and downstream drops NH>1
(multi-gene) alignments (typing_core.py:846-848).  TPU-native equivalent:
place the batch against every gene's PWM (one MXU correlation per gene),
verify on the best-scoring genes, and keep a read only when exactly one
gene attains its best cost — the NH==1 uniqueness rule.
"""
from __future__ import annotations

import numpy as np

from ..db.catalog import Catalog
from .aligner import GeneAligner


class FamilyAligner:
    def __init__(self, catalog: Catalog, num_editdist: int = 2, **kw):
        self.catalog = catalog
        self.aligners = {g: GeneAligner(ref, num_editdist=num_editdist, **kw)
                         for g, ref in catalog.genes.items()}

    def align_batch(self, read_ids, seqs, mate: str):
        """Returns {gene: [ReadAln | None]} keeping only reads uniquely
        best in that gene (others set to None)."""
        per_gene = {g: al.align_batch(read_ids, seqs, mate)
                    for g, al in self.aligners.items()}
        genes = list(per_gene)
        n = len(seqs)
        for i in range(n):
            costs = {}
            for g in genes:
                a = per_gene[g][i]
                if a is not None:
                    costs[g] = a.nm
            if not costs:
                continue
            best = min(costs.values())
            best_genes = [g for g, c in costs.items() if c == best]
            keep = best_genes[0] if len(best_genes) == 1 else None
            for g in genes:
                if g != keep:
                    per_gene[g][i] = None
        return per_gene
