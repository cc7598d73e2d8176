"""Whole-genome read extraction against the spliced genotype genome.

This is the reference's actual WGS design (extract_reads,
typing_process.py:1330-1784): align the sample to the genotype genome,
keep uniquely-mapped reads (NH==1, typing_process.py:1683-1690), route
reads whose placement lands inside a family locus into that family's
read set (:1691-1699), and optionally bin every uniquely-mapped read
into 20-Mbp whole-genome blocks (block_size, :1534-1594, 1700-1702).

TPU-native: a checkpointed FM index over the spliced genome places
fixed-length seeds from both read ends (batched backward search on
device); candidate start positions are then VERIFIED by vectorized
Hamming comparison against the genome, and NH is the count of distinct
verified placements — seed votes alone never route a read.  Reads whose
catalog indel defeats the Hamming check fall back to a both-ends-unique
consistent-seed rule (the same class of heuristic the graph aligner's
seed chaining applies).
"""
from __future__ import annotations

import gzip
import os
from collections import defaultdict

import numpy as np

from ..ops.fm import FMIndex, pack_queries
from ..utils.dna import revcomp


class GenomeExtractor:
    def __init__(self, spliced_genome: dict, offsets: dict, catalogs: dict,
                 seed_len: int = 32, checkpoint: bool = True,
                 max_mm: int = 8, max_hits: int = 8):
        """spliced_genome: {chrom: seq} from build_genotype_genome;
        offsets: {(family, gene): spliced-coordinate left};
        catalogs: {family: Catalog}.

        max_mm: Hamming budget for placement verification — generous
        enough for catalog SNPs between a non-reference allele and the
        spliced backbone (the reference's hisat2 scores those through
        the graph, so its NM stays low; here they cost mismatches).
        """
        from ..utils.dna import encode_seq

        self.seed_len = seed_len
        self.max_mm = max_mm
        self.max_hits = max_hits
        parts = []
        self.chrom_starts = []        # (concat start, chrom)
        pos = 0
        for chrom, seq in spliced_genome.items():
            self.chrom_starts.append((pos, chrom))
            parts.append(encode_seq(seq))
            parts.append(np.array([4], np.int8))
            pos += len(seq) + 1
        self.codes = np.concatenate(parts) if parts \
            else np.zeros(0, np.int8)
        self.fm = FMIndex(self.codes, checkpoint=checkpoint)
        self._cs = np.array([c for c, _ in self.chrom_starts], np.int64)
        self._cnames = [n for _, n in self.chrom_starts]
        # locus intervals in concatenated coordinates
        self.intervals = []  # (start, end, family)
        for (family, gene), left in offsets.items():
            g = catalogs[family].genes[gene]
            base = self._cs[self._cnames.index(g.chrom)] + left
            self.intervals.append((base, base + len(g.backbone), family))
        self.intervals.sort()
        self.iv_starts = np.array([iv[0] for iv in self.intervals], np.int64)

    def _locus_of(self, pos):
        i = int(np.searchsorted(self.iv_starts, pos, "right")) - 1
        if i < 0:
            return None
        start, end, family = self.intervals[i]
        return family if pos < end else None

    def _chrom_of(self, pos):
        i = int(np.searchsorted(self._cs, pos, "right")) - 1
        return self._cnames[i], int(pos - self._cs[i])

    # ------------------------------------------------------------------ #
    def _place_unique(self, seqs):
        """Verified unique placement per sequence.

        Returns [start | None] in concatenated coordinates: the single
        verified placement when NH==1 over both orientations, else None.
        """
        from ..utils.dna import encode_seq

        k = self.seed_len
        n = len(seqs)
        G = len(self.codes)
        # ---- batched seed search: front/mid/back seeds, both
        # orientations (three seeds so one catalog indel can defeat at
        # most one of them)
        seeds, meta = [], []   # meta: (read, orient, read offset)
        orients = []
        for i, s in enumerate(seqs):
            for o, so in enumerate((s, revcomp(s))):
                if len(so) < k:
                    continue
                for off in sorted({0, (len(so) - k) // 2, len(so) - k}):
                    seeds.append(so[off:off + k])
                    meta.append((i, o, off))
            orients.append((s, revcomp(s)))
        if not seeds:
            return [None] * n
        lo, hi = self.fm.search_batch(pack_queries(seeds, k))
        lo = np.asarray(lo)
        hi = np.asarray(hi)
        # candidate starts per (read, orientation)
        cands = defaultdict(set)          # (i, o) -> {start}
        seed_hits = defaultdict(list)     # (i, o) -> [(off, pos)]
        for j, (i, o, off) in enumerate(meta):
            nh = int(hi[j] - lo[j])
            if nh == 0 or nh > self.max_hits:
                continue
            uniq = nh == 1
            for p in self.fm.locate(int(lo[j]), int(hi[j]), self.max_hits):
                p = int(p)
                if uniq:
                    seed_hits[(i, o)].append((off, p))
                start = p - off
                if 0 <= start and start + len(orients[i][o]) <= G:
                    cands[(i, o)].add(start)
        # ---- vectorized Hamming verification of all candidates ---- #
        flat = []                          # (i, o, start)
        for (i, o), starts in cands.items():
            for s in starts:
                flat.append((i, o, s))
        verified = defaultdict(set)        # i -> {(o, start)}
        if flat:
            Ls = np.array([len(orients[i][o]) for i, o, _ in flat])
            Lmax = int(Ls.max())
            starts_a = np.array([s for _, _, s in flat], np.int64)
            jj = np.arange(Lmax)
            gidx = np.minimum(starts_a[:, None] + jj[None, :], G - 1)
            gcodes = self.codes[gidx]
            rcodes = np.full((len(flat), Lmax), 4, np.int8)
            for r, (i, o, _s) in enumerate(flat):
                c = encode_seq(orients[i][o])
                rcodes[r, : len(c)] = c
            valid = jj[None, :] < Ls[:, None]
            mm = ((gcodes != rcodes) & valid).sum(axis=1)
            for r, (i, o, s) in enumerate(flat):
                if mm[r] <= self.max_mm:
                    verified[i].add((o, int(s)))
        out = [None] * n
        for i in range(n):
            v = verified.get(i, set())
            if len(v) == 1:
                out[i] = next(iter(v))[1]
                continue
            if v:
                continue                   # NH > 1: ambiguous
            # indel fallback: an alignment through a catalog indel fails
            # the Hamming check but its unique-hit seeds still agree on
            # one placement (within the indel drift).  Accept when one
            # orientation has >= 1 unique seed, all its unique seeds are
            # mutually consistent, and the other orientation has none.
            pick = None
            ambiguous = False
            for o in (0, 1):
                hits = seed_hits.get((i, o), [])
                if not hits:
                    continue
                starts = [p - off for off, p in hits]
                if max(starts) - min(starts) > 32:
                    continue
                if pick is not None:       # both orientations: ambiguous
                    ambiguous = True
                    break
                off0, p0 = min(hits)       # front-most unique seed
                pick = p0 - off0
            out[i] = None if ambiguous else pick
        return out

    # ------------------------------------------------------------------ #
    def extract(self, reads_1, reads_2=None, block_size: int = 0):
        """Route read (pairs) by verified unique placement.

        Returns {family: ([(name, seq)], [(name, seq)])}.  With
        block_size > 0 returns (families, blocks) where blocks maps
        (chrom, block_index) -> the same pair-of-lists structure — the
        reference's whole-genome 20-Mbp binning
        (typing_process.py:1534-1594; block key `chr-pos/block_size`
        at :1700-1702).
        """
        out = defaultdict(lambda: ([], []))
        blocks = defaultdict(lambda: ([], []))
        n = len(reads_1)
        seqs = [s for _, s in reads_1]
        starts_1 = self._place_unique(seqs)
        starts_2 = [None] * n
        if reads_2:
            starts_2 = self._place_unique([s for _, s in reads_2])
        for i in range(n):
            fams = set()
            bins = set()
            for st in (starts_1[i], starts_2[i]):
                if st is None:
                    continue
                fam = self._locus_of(st)
                if fam is not None:
                    fams.add(fam)
                if block_size > 0:
                    chrom, local = self._chrom_of(st)
                    bins.add((chrom, local // block_size))
            # per-mate routing: the pair goes to every region any mate
            # hit uniquely (ref writes to each extract_read region,
            # typing_process.py:1638-1651)
            for fam in fams:
                out[fam][0].append(reads_1[i])
                if reads_2:
                    out[fam][1].append(reads_2[i])
            for b in bins:
                blocks[b][0].append(reads_1[i])
                if reads_2:
                    blocks[b][1].append(reads_2[i])
        if block_size > 0:
            return dict(out), dict(blocks)
        return dict(out)


def write_block_fastqs(out_dir, base, blocks, block_size, paired=True):
    """Write per-block gzipped FASTQs with the reference's filename
    convention `<base>-<chr>-<start>_<end>M-extracted-{1,2}.fq.gz`
    (typing_process.py:1553-1594).  Returns the written paths."""
    mult = block_size // 1000000 if block_size >= 1000000 else block_size
    paths = []
    for (chrom, bi), (r1, r2) in sorted(blocks.items()):
        stem = "%s-%s-%d_%dM-extracted" % (base, chrom, bi * mult,
                                           (bi + 1) * mult)
        names = ["%s-1.fq.gz" % stem, "%s-2.fq.gz" % stem] if paired \
            else ["%s.fq.gz" % stem]
        for fname, reads in zip(names, [r1, r2][:len(names)]):
            path = os.path.join(out_dir, fname)
            with gzip.open(path, "wt") as f:
                for name, seq in reads:
                    f.write("@%s\n%s\n+\n%s\n" % (name, seq, "I" * len(seq)))
            paths.append(path)
    return paths
