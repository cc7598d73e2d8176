"""Whole-genome read extraction against the spliced genotype genome.

This is the reference's actual WGS design (extract_reads,
typing_process.py:1330-1784): align the sample to the genotype genome and
route reads whose unique placement overlaps a family locus into that
family's read set.  TPU-native: a checkpointed FM index over the spliced
genome places fixed-length seeds from both read ends (batched backward
search on device); a read routes to a locus when its seeds place uniquely
and consistently inside the locus interval.
"""
from __future__ import annotations

from collections import defaultdict

import numpy as np

from ..ops.fm import FMIndex, pack_queries
from ..utils.dna import revcomp


class GenomeExtractor:
    def __init__(self, spliced_genome: dict, offsets: dict, catalogs: dict,
                 seed_len: int = 32, checkpoint: bool = True):
        """spliced_genome: {chrom: seq} from build_genotype_genome;
        offsets: {(family, gene): spliced-coordinate left};
        catalogs: {family: Catalog}."""
        from ..utils.dna import encode_seq

        self.seed_len = seed_len
        parts = []
        self.chrom_starts = {}
        pos = 0
        for chrom, seq in spliced_genome.items():
            self.chrom_starts[chrom] = pos
            parts.append(encode_seq(seq))
            parts.append(np.array([4], np.int8))
            pos += len(seq) + 1
        codes = np.concatenate(parts) if parts else np.zeros(0, np.int8)
        self.fm = FMIndex(codes, checkpoint=checkpoint)
        # locus intervals in concatenated coordinates
        self.intervals = []  # (start, end, family)
        for (family, gene), left in offsets.items():
            g = catalogs[family].genes[gene]
            base = self.chrom_starts[g.chrom] + left
            self.intervals.append((base, base + len(g.backbone), family))
        self.intervals.sort()
        self.iv_starts = np.array([iv[0] for iv in self.intervals], np.int64)

    def _locus_of(self, pos):
        i = int(np.searchsorted(self.iv_starts, pos, "right")) - 1
        if i < 0:
            return None
        start, end, family = self.intervals[i]
        return family if pos < end else None

    def extract(self, reads_1, reads_2=None):
        """Batched routing; returns {family: ([(name, seq)], [(name, seq)])}."""
        k = self.seed_len
        out = defaultdict(lambda: ([], []))
        n = len(reads_1)
        # batch all seeds of all reads in one search
        seeds = []
        owners = []
        for i, (name, seq) in enumerate(reads_1):
            pair_seqs = [seq]
            if reads_2:
                pair_seqs.append(revcomp(reads_2[i][1]))
            for seq_i, s in enumerate(pair_seqs):
                for orient_s in (s, revcomp(s)):
                    if len(orient_s) >= k:
                        seeds.append(orient_s[:k])
                        seeds.append(orient_s[-k:])
                        owners.append(i)
                        owners.append(i)
        if not seeds:
            return dict(out)
        lo, hi = self.fm.search_batch(pack_queries(seeds, k))
        lo = np.asarray(lo)
        hi = np.asarray(hi)
        fams_per_read = defaultdict(set)
        for j in range(len(seeds)):
            nh = int(hi[j] - lo[j])
            if nh == 0 or nh > 4:
                continue
            for p in self.fm.locate(int(lo[j]), int(hi[j]), 4):
                fam = self._locus_of(int(p)) or "__genome__"
                fams_per_read[owners[j]].add(fam)
        for i, (name, seq) in enumerate(reads_1):
            fams = fams_per_read.get(i, set())
            fams = {f for f in fams if f != "__genome__"}
            if len(fams) != 1:
                continue
            fam = next(iter(fams))
            out[fam][0].append(reads_1[i])
            if reads_2:
                out[fam][1].append(reads_2[i])
        return dict(out)
