"""Whole-genome ("genotype genome") builder.

Equivalent of hisatgenotype_tools/hisatgenotype_build_genome.py:46-521:
splice every family's backbone (consensus) into the host genome at its
locus, shift variant/haplotype coordinates into genome space, and write
the combined database:

  <out>.fa         spliced genome
  <out>.locus      family-tagged loci (genome format, read_locus isgenome
                   path: typing_common.py:279-309)
  <out>.snp/.index.snp/.haplotype/.link  coordinate-shifted tables
  <out>.coord      liftover segments (new_pos -> old_pos, length)
  <out>.allele/.partial  family-tagged allele lists
"""
from __future__ import annotations

import os
from collections import defaultdict

from .catalog import Catalog, GeneRef, VT_SINGLE, VT_DELETION, VT_INSERTION

_VT_NAME = {VT_SINGLE: "single", VT_DELETION: "deletion",
            VT_INSERTION: "insertion"}


def build_genotype_genome(genome: dict, catalogs: dict, out_prefix: str):
    """genome: {chrom: seq}; catalogs: {family: Catalog} whose genes carry
    chrom/chrom_left/chrom_right placements.  Returns the spliced genome
    dict (also written to <out_prefix>.fa)."""
    os.makedirs(os.path.dirname(out_prefix) or ".", exist_ok=True)
    # genes grouped per chromosome, sorted by placement
    per_chrom = defaultdict(list)
    for family, cat in catalogs.items():
        for gene in cat.genes.values():
            per_chrom[gene.chrom].append((family, gene))
    for genes in per_chrom.values():
        genes.sort(key=lambda fg: fg[1].chrom_left)

    spliced = {}
    offsets = {}      # (family, gene) -> new left coordinate
    coord_lines = []
    for chrom, seq in genome.items():
        parts = []
        cur = 0          # old coordinate
        new_pos = 0
        for family, gene in per_chrom.get(chrom, []):
            left, right = gene.chrom_left, gene.chrom_right
            assert left >= cur, "overlapping loci on %s" % chrom
            parts.append(seq[cur:left])
            coord_lines.append("%s\t%d\t%d\t%d"
                               % (chrom, new_pos, cur, left - cur))
            new_pos += left - cur
            offsets[(family, gene.gene)] = new_pos
            parts.append(gene.backbone)
            new_pos += len(gene.backbone)
            cur = right
        parts.append(seq[cur:])
        coord_lines.append("%s\t%d\t%d\t%d"
                           % (chrom, new_pos, cur, len(seq) - cur))
        spliced[chrom] = "".join(parts)

    with open(out_prefix + ".fa", "w") as f:
        for chrom, seq in spliced.items():
            print(">%s" % chrom, file=f)
            for s in range(0, len(seq), 60):
                print(seq[s:s + 60], file=f)
    with open(out_prefix + ".coord", "w") as f:
        f.write("\n".join(coord_lines) + "\n")

    locus_f = open(out_prefix + ".locus", "w")
    snp_f = open(out_prefix + ".snp", "w")
    isnp_f = open(out_prefix + ".index.snp", "w")
    hap_f = open(out_prefix + ".haplotype", "w")
    link_f = open(out_prefix + ".link", "w")
    allele_f = open(out_prefix + ".allele", "w")
    partial_f = open(out_prefix + ".partial", "w")
    nh = 0
    for family, cat in catalogs.items():
        for gene in cat.genes.values():
            base = offsets[(family, gene.gene)]
            exon_str = ",".join(
                "%d-%d%s" % (l + base, r + base,
                             "p" if (l, r) in [tuple(e) for e in
                                               gene.primary_exons] else "")
                for l, r in gene.exons)
            print("%s\t%s\t%s\t%d\t%d\t%s\t%s"
                  % (family, gene.backbone_name, gene.chrom, base,
                     base + len(gene.backbone) - 1, exon_str, gene.strand),
                  file=locus_f)
            for i, vid in enumerate(gene.var_ids):
                line = "%s\t%s\t%s\t%d\t%s" % (
                    vid, _VT_NAME[int(gene.var_type[i])], gene.chrom,
                    base + int(gene.var_pos[i]), gene.var_data[i])
                print(line, file=snp_f)
                if gene.var_freq[i] >= gene.min_var_freq:
                    print(line, file=isnp_f)
                import numpy as np
                members = [gene.allele_names[a]
                           for a in np.flatnonzero(gene.links[i])]
                print("%s\t%s" % (vid, " ".join(sorted(members))),
                      file=link_f)
            for left, right, vidxs in gene.haplotypes:
                print("ht%d\t%s\t%d\t%d\t%s"
                      % (nh, gene.chrom, base + left, base + right,
                         ",".join(gene.var_ids[v] for v in vidxs)),
                      file=hap_f)
                nh += 1
            for name in gene.allele_names:
                print("%s\t%s" % (family, name), file=allele_f)
                if name in gene.partial:
                    print("%s\t%s" % (family, name), file=partial_f)
    for f in (locus_f, snp_f, isnp_f, hap_f, link_f, allele_f, partial_f):
        f.close()
    return spliced, offsets


def liftover(coord_path):
    """Load the .coord liftover map: returns a function
    (chrom, new_pos) -> old_pos or None inside spliced gene regions."""
    segs = defaultdict(list)
    for line in open(coord_path):
        chrom, new_pos, old_pos, length = line.split()
        segs[chrom].append((int(new_pos), int(old_pos), int(length)))

    def f(chrom, pos):
        for new_pos, old_pos, length in segs.get(chrom, []):
            if new_pos <= pos < new_pos + length:
                return old_pos + (pos - new_pos)
        return None
    return f
