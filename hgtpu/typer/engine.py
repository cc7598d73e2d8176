"""The typing engine: alignments -> compatibility stats -> hierarchical EM.

Re-architecture of the reference's typing() hot loop
(typing_core.py:800-1789) without the SAM/text round trip: consumes
ReadAln batches from hgtpu.align, builds per-read haplotypes, counts
allele compatibility through the vectorized link-matrix counter, and runs
the exon-representative -> full-length EM staging for HLA-style families.
"""
from __future__ import annotations

import dataclasses

import numpy as np

from ..db.catalog import GeneRef
from .counting import GeneCounter, HtOp, StatAccumulator
from .em import single_abundance
from .exons import get_exon_haplotypes


@dataclasses.dataclass
class TypingOptions:
    family: str = "hla"
    num_editdist: int = 2
    allow_discordant: bool = False
    simulation: bool = False
    remove_low_abundance_alleles: bool = False
    output_allele_counts: bool = False
    best_alleles: bool = False


@dataclasses.dataclass
class GeneTypingResult:
    gene: str
    num_reads: int
    num_pairs: int
    counts: list                 # [(allele, count)] desc
    prob: list                   # [[allele, prob]] desc
    cmpt: dict                   # full-level class counts {names-joined: n}
    exon_cmpt: dict
    primary_exon_cmpt: dict


def get_rep_alleles(gene: GeneRef, exon_var_mask, in_alleles=None):
    """Group alleles sharing identical exonic variant sets.

    Ref: get_rep_alleles (typing_core.py:86-115).  Only alleles carrying
    at least one exonic variant participate.  Returns
    (rep_mask [A] bool, groups {rep index: [allele indices]}).
    """
    cols = gene.links[exon_var_mask]          # [Ve, A]
    groups = {}
    for a in range(gene.n_alleles):
        if in_alleles is not None and not in_alleles[a]:
            continue
        key = cols[:, a].tobytes()
        if not cols[:, a].any():
            continue
        groups.setdefault(key, []).append(a)
    rep_mask = np.zeros(gene.n_alleles, dtype=bool)
    rep_groups = {}
    for members in groups.values():
        rep = members[0]  # DB order; deterministic
        rep_mask[rep] = True
        rep_groups[rep] = members
    return rep_mask, rep_groups


def _cmp_to_ops(cmp_list):
    """cmp_list entries -> (left, right, [HtOp]) dropping unknown/novel
    mismatches (merged into matches, ref: typing_core.py:1352-1368)."""
    ops = []
    left = cmp_list[0][1]
    right = left
    for kind, pos, length, var_idx, data in cmp_list:
        if kind in ("match", "deletion"):
            right = max(right, pos + length - 1)
        elif kind == "mismatch":
            right = max(right, pos)
        if kind == "match":
            continue
        if kind == "mismatch" and (var_idx is None or var_idx < 0):
            continue  # unknown/novel substitution -> treated as match
        ops.append(HtOp(kind, pos, length,
                        -1 if var_idx is None else var_idx, data))
    return left, right, ops


def type_gene(gene: GeneRef, read_alns, opts: TypingOptions = None,
              true_alleles=()):
    """read_alns: iterable of (read_id, [ReadAln for its mates]).

    Returns GeneTypingResult.
    """
    opts = opts or TypingOptions()
    counter = GeneCounter(gene)
    A = gene.n_alleles

    exon_vars = gene.exonic_var_mask(gene.exons)
    primary_exon_vars = gene.exonic_var_mask(gene.primary_exons)
    allele_rep_mask, allele_rep_groups = get_rep_alleles(gene, exon_vars)
    primary_rep_mask, primary_rep_groups = get_rep_alleles(
        gene, primary_exon_vars, allele_rep_mask)

    full_stats = StatAccumulator(gene.allele_names)
    exon_stats = StatAccumulator(gene.allele_names, allele_rep_mask)
    primary_stats = StatAccumulator(gene.allele_names, primary_rep_mask)

    num_reads = 0
    num_pairs = 0

    for read_id, alns in read_alns:
        alns = [a for a in alns if a is not None]
        if not alns:
            continue
        if not opts.allow_discordant:
            # concordance: both mates mapped, opposite orientation, within
            # the fragment bound (ref: hisat2 -X 1000 + flag 0x2 check at
            # typing_core.py:826-852)
            left_m = [a for a in alns if a.mate == "L"]
            right_m = [a for a in alns if a.mate == "R"]
            if not left_m or not right_m:
                continue
            lm, rm = left_m[0], right_m[0]
            if lm.is_rc == rm.is_rc:
                continue
            outer = max(lm.right, rm.right) - min(lm.pos, rm.pos)
            if outer > 1000:
                continue
        positive_hts = {}
        for a in alns:
            if a.nm > opts.num_editdist:
                continue
            num_reads += 1
            left, right, ops = _cmp_to_ops(a.cmp)
            key = (left, right, tuple(op.key() for op in ops))
            positive_hts[key] = (left, right, ops)
        if not positive_hts:
            continue
        num_pairs += 1

        cnt_full = np.zeros(A, dtype=np.int32)
        cnt_exon = np.zeros(A, dtype=np.int32)
        cnt_primary = np.zeros(A, dtype=np.int32)
        for (left, right, ops) in positive_hts.values():
            for el, er, eops in get_exon_haplotypes(
                    (left, right, ops), gene.primary_exons):
                cnt_primary += counter.alleles_for_ht(el, er, eops)
            for el, er, eops in get_exon_haplotypes(
                    (left, right, ops), gene.exons):
                cnt_exon += counter.alleles_for_ht(el, er, eops)
            cnt_full += counter.alleles_for_ht(left, right, ops)

        if opts.family == "hla":
            primary_stats.add_read(cnt_primary)
            exon_stats.add_read(cnt_exon)
        full_stats.add_read(cnt_full)

    # ------------------------------------------------------------------ #
    # Hierarchical abundance (ref: typing_core.py:1679-1789)
    # ------------------------------------------------------------------ #
    lengths = {name: len(gene.allele_seq(name)) for name in gene.allele_names}
    full_cmpt = full_stats.cmpt_names()
    exon_cmpt = exon_stats.cmpt_names()
    primary_cmpt = primary_stats.cmpt_names()

    if opts.family == "hla":
        exon_prob = single_abundance(exon_cmpt,
                                     opts.remove_low_abundance_alleles)
        name2idx = {n: i for i, n in enumerate(gene.allele_names)}
        exon_alleles = set()
        exon_prob_sum = 0.0
        for prob_i, (allele, prob) in enumerate(exon_prob):
            if prob_i >= 10 and prob < 0.03:
                break
            group = allele_rep_groups.get(name2idx[allele], [])
            if len(group) <= 1:
                continue
            exon_prob_sum += prob
            exon_alleles |= {gene.allele_names[i] for i in group}

        if exon_alleles:
            cmpt2 = {}
            for cmpt, value in full_cmpt.items():
                kept = [a for a in cmpt.split("-") if a in exon_alleles]
                if not kept:
                    continue
                k = "-".join(kept)
                cmpt2[k] = cmpt2.get(k, 0) + value
            full_prob = single_abundance(cmpt2, True, lengths)
            combined = {a: p for a, p in exon_prob if a not in exon_alleles}
            for a, p in full_prob:
                combined[a] = p * exon_prob_sum
            prob = sorted(([a, p] for a, p in combined.items()),
                          key=lambda x: x[1], reverse=True)
        else:
            prob = exon_prob
    else:
        if len(full_cmpt) <= 1:
            prob = [[list(full_cmpt.keys())[0], 1.0]] if full_cmpt else []
        else:
            prob = single_abundance(full_cmpt)

    return GeneTypingResult(
        gene=gene.gene,
        num_reads=num_reads,
        num_pairs=num_pairs,
        counts=full_stats.ranked_counts(),
        prob=prob,
        cmpt=full_cmpt,
        exon_cmpt=exon_cmpt,
        primary_exon_cmpt=primary_cmpt,
    )
