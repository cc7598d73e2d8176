"""Read extraction: route raw (e.g. WGS) reads to families/genes.

Functional equivalent of the reference's extract_reads
(typing_process.py:1266-1784): align every read against the catalog of
family references, keep uniquely-best (NH==1) assignments, and emit
per-family read sets.  The reference does this by aligning to the spliced
genotype_genome with HISAT2 and routing by locus interval; here the same
MXU placement + variant-graph verification used for typing does the
routing directly against each gene's reference.
"""
from __future__ import annotations

from collections import defaultdict

from ..align.aligner import GeneAligner


class ReadExtractor:
    def __init__(self, catalogs, num_editdist: int = 2, **kw):
        """catalogs: {family: Catalog}."""
        self.entries = []  # (family, gene, GeneAligner)
        for family, cat in catalogs.items():
            for g, ref in cat.genes.items():
                self.entries.append((family, g, GeneAligner(
                    ref, num_editdist=num_editdist, **kw)))

    def _assign(self, read_ids, seqs, mate):
        per_entry = [al.align_batch(read_ids, seqs, mate)
                     for _, _, al in self.entries]
        out = [None] * len(seqs)
        for i in range(len(seqs)):
            costs = []
            for e, alns in enumerate(per_entry):
                if alns[i] is not None:
                    costs.append((alns[i].nm, e))
            if not costs:
                continue
            best = min(c for c, _ in costs)
            best_entries = [e for c, e in costs if c == best]
            if len(best_entries) == 1:
                out[i] = best_entries[0]
        return out

    def extract(self, reads_1, reads_2=None):
        """reads_*: [(name, seq)].  Returns
        {family: ([(name, seq)], [(name, seq)])} — a pair is routed to a
        family when at least one mate maps uniquely into it and the mates
        don't disagree."""
        ids1 = [n for n, _ in reads_1]
        a1 = self._assign(ids1, [s for _, s in reads_1], "L")
        if reads_2:
            a2 = self._assign([n for n, _ in reads_2],
                              [s for _, s in reads_2], "R")
        else:
            a2 = [None] * len(reads_1)
        out = defaultdict(lambda: ([], []))
        for i in range(len(reads_1)):
            e1, e2 = a1[i], (a2[i] if i < len(a2) else None)
            fams = {self.entries[e][0] for e in (e1, e2) if e is not None}
            if len(fams) != 1:
                continue
            fam = next(iter(fams))
            out[fam][0].append(reads_1[i])
            if reads_2:
                out[fam][1].append(reads_2[i])
        return dict(out)
