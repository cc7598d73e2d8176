"""Synthetic polymorphic-locus generator.

The reference pipeline is driven by IMGT/HLA MSF alignments which are
downloaded at runtime (typing_common.py:526-529) and are not available
offline, so tests build structurally equivalent synthetic families: an
ancestral backbone, a pool of SNP/indel events with realistic frequencies,
and alleles drawn as event subsets, rendered into an MSF-style matrix
(columns for every insertion event, '.' for gaps).
"""
from __future__ import annotations

import random

BASES = "ACGT"


def make_gene_msa(
    gene="A",
    n_alleles=40,
    length=2400,
    n_snp=60,
    n_del=8,
    n_ins=6,
    seed=7,
    partial_frac=0.0,
):
    rng = random.Random(seed)
    ancestral = "".join(rng.choice(BASES) for _ in range(length))

    # event pool
    events = []  # (kind, pos, payload, carrier probability)
    used = set()
    def fresh_pos(span=1):
        while True:
            p = rng.randrange(10, length - 10 - span)
            if all((p + o) not in used for o in range(-1, span + 1)):
                for o in range(span):
                    used.add(p + o)
                return p
    for _ in range(n_snp):
        p = fresh_pos()
        alt = rng.choice([b for b in BASES if b != ancestral[p]])
        events.append(("S", p, alt, rng.uniform(0.03, 0.45)))
    for _ in range(n_del):
        ln = rng.randint(1, 6)
        p = fresh_pos(ln)
        events.append(("D", p, ln, rng.uniform(0.03, 0.35)))
    for _ in range(n_ins):
        ln = rng.randint(1, 4)
        p = fresh_pos()
        ins = "".join(rng.choice(BASES) for _ in range(ln))
        events.append(("I", p, ins, rng.uniform(0.02, 0.3)))

    # allele event subsets; correlated via a crude 2-branch phylogeny
    alleles = []
    for a in range(n_alleles):
        branch_bias = 0.8 if a % 2 == 0 else 0.2
        chosen = []
        for ei, (kind, pos, payload, prob) in enumerate(events):
            pr = prob * (1.6 * branch_bias if ei % 3 == 0 else 1.0)
            if rng.random() < min(pr, 0.9):
                chosen.append(ei)
        alleles.append(chosen)
    # ensure allele 0 is event-free (a clean reference allele)
    alleles[0] = []

    # column layout: backbone positions plus insertion-event columns
    ins_events = [(i, e) for i, e in enumerate(events) if e[0] == "I"]
    ins_at = {}
    for ei, (kind, pos, payload, prob) in ins_events:
        ins_at.setdefault(pos, []).append((ei, payload))

    names = []
    rows = []
    for a, chosen in enumerate(alleles):
        chosen = set(chosen)
        row = []
        deleted = set()
        for ei in chosen:
            kind, pos, payload, _ = events[ei]
            if kind == "D":
                deleted.update(range(pos, pos + payload))
        for p in range(length):
            if p in ins_at:
                for ei, payload in ins_at[p]:
                    if ei in chosen:
                        row.append(payload)
                    else:
                        row.append("." * len(payload))
            if p in deleted:
                row.append(".")
                continue
            snp = None
            for ei in chosen:
                kind, pos, payload, _ = events[ei]
                if kind == "S" and pos == p:
                    snp = payload
                    break
            row.append(snp if snp else ancestral[p])
        names.append("%s*%02d:%02d:%02d" % (gene, a // 10 + 1, a % 10 + 1, 1))
        rows.append("".join(row))

    # exons in ref-allele (allele 0, event-free) coordinates
    exon_len = length // 6
    exons = [
        (exon_len, 2 * exon_len - 1),
        (3 * exon_len, 4 * exon_len - 1),
        (5 * exon_len, length - 11),
    ]
    return dict(
        names=names,
        rows=rows,
        ref_allele=names[0],
        exons=exons,
        primary_exon_idx=(0, 1),
    )


def make_nuc_msa(spec, n_partial=4, seed=99):
    """Exon-only (nuc) alignment derived from a gen MSA spec, plus extra
    partial alleles that exist only in the nuc alignment."""
    rng = random.Random(seed)
    ref_row = spec["rows"][0]  # event-free reference allele
    base_cols = [i for i, ch in enumerate(ref_row) if ch in "ACGT"]
    exon_col_ranges = [(base_cols[l], base_cols[r])
                       for l, r in spec["exons"]]

    def to_nuc(row):
        return "".join(row[l:r + 1] for l, r in exon_col_ranges)

    nuc_names = list(spec["names"])
    nuc_rows = [to_nuc(r) for r in spec["rows"]]
    gene = spec["names"][0].split("*")[0]
    # partial alleles: copy an existing row, flip some exon bases
    for k in range(n_partial):
        donor = rng.randrange(len(spec["rows"]))
        row = list(spec["rows"][donor])
        for _ in range(3):
            l, r = exon_col_ranges[rng.randrange(len(exon_col_ranges))]
            p = rng.randrange(l, r + 1)
            if row[p] in "ACGT":
                row[p] = rng.choice([b for b in "ACGT" if b != row[p]])
        nuc_names.append("%s*90:%02d" % (gene, k + 1))
        nuc_rows.append(to_nuc("".join(row)))
    return nuc_names, nuc_rows


def make_family(genes=("A", "B", "C"), n_alleles=24, length=2000, seed=17):
    """Multi-gene family: independent MSAs per gene plus a synthetic host
    genome that embeds each gene's reference allele between random flanks
    (the stand-in for GRCh38 placement used by read extraction)."""
    # distinct stream from the per-gene MSA rngs (same seed would replay
    # identical base draws and make flanks collide with gene backbones)
    rng = random.Random(seed * 7919 + 13)
    specs = {}
    genome_parts = []
    flank = 3000
    pos = 0
    loci = {}
    for gi, g in enumerate(genes):
        spec = make_gene_msa(gene=g, n_alleles=n_alleles, length=length,
                             seed=seed + 101 * gi)
        specs[g] = spec
        fl = "".join(rng.choice(BASES) for _ in range(flank))
        genome_parts.append(fl)
        pos += flank
        ref_seq = spec["rows"][0].replace(".", "")
        loci[g] = (pos, pos + len(ref_seq))
        genome_parts.append(ref_seq)
        pos += len(ref_seq)
    genome_parts.append("".join(rng.choice(BASES) for _ in range(flank)))
    return dict(specs=specs, genome="".join(genome_parts), loci=loci)


def make_hla_scale_msa(gene="A", n_alleles=3600, length=3500, n_snp=1500,
                       n_del=150, n_ins=80, partial_frac=0.3, seed=4):
    """Reference-scale panel (IMGT HLA-A is ~4,000 alleles over a ~3.5 kb
    gene with thousands of catalog variants).  Vectorized with numpy so a
    3,600 x 3,500 MSA renders in seconds; same output contract as
    make_gene_msa.  partial_frac marks a fraction of alleles partial
    (exon-only in the reference DB, devel/hg_test* panels)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    anc = rng.integers(0, 4, length)
    bases = np.frombuffer(b"ACGT", np.uint8)

    # --- event pool over non-overlapping positions --- #
    events = []          # (kind, pos, payload, prob)
    taken = np.zeros(length, bool)

    def claim(span):
        for _ in range(50):
            p = int(rng.integers(10, length - 10 - span))
            if not taken[max(0, p - 1):p + span + 1].any():
                taken[p:p + span] = True
                return p
        return -1

    for _ in range(n_snp):
        p = claim(1)
        if p < 0:
            continue
        alt = int((anc[p] + rng.integers(1, 4)) % 4)
        events.append(("S", p, alt, float(rng.uniform(0.01, 0.4))))
    for _ in range(n_del):
        ln = int(rng.integers(1, 7))
        p = claim(ln)
        if p < 0:
            continue
        events.append(("D", p, ln, float(rng.uniform(0.01, 0.25))))
    for _ in range(n_ins):
        ln = int(rng.integers(1, 5))
        p = claim(1)
        if p < 0:
            continue
        ins = "".join("ACGT"[i] for i in rng.integers(0, 4, ln))
        events.append(("I", p, ins, float(rng.uniform(0.01, 0.2))))
    E = len(events)

    # --- correlated carrier matrix [A, E]: 2-branch phylogeny bias --- #
    probs = np.array([e[3] for e in events])
    bias = np.where(np.arange(n_alleles)[:, None] % 2 == 0, 1.6, 0.6)
    bias = np.where(np.arange(E)[None, :] % 3 == 0, bias, 1.0)
    # cap carrier fraction below 0.5 so the consensus backbone stays the
    # ancestral sequence (variants then mean the same thing for every
    # allele; at 3,600 draws the sampling noise cannot cross 50%)
    carry = rng.random((n_alleles, E)) < np.minimum(probs[None, :] * bias,
                                                    0.45)
    carry[0] = False                         # clean reference allele
    # a handful of SNP-only alleles (as in IMGT, where many alleles differ
    # from the consensus by substitutions alone).  At min_var_freq=0 every
    # insertion column enters the consensus backbone (reference
    # create_consensus_seq semantics), so "no indels vs backbone" means:
    # carry every insertion, no deletion.
    is_del = np.array([e[0] == "D" for e in events])
    is_ins = np.array([e[0] == "I" for e in events])
    carry[1:9, is_del] = False
    carry[1:9, is_ins] = True

    # --- column layout: backbone cols + insertion cols --- #
    col_of = np.zeros(length, np.int64)      # backbone pos -> column
    ins_cols = {}                            # event idx -> (col, len)
    col = 0
    ins_by_pos = {}
    for ei, (k, p, payload, _) in enumerate(events):
        if k == "I":
            ins_by_pos.setdefault(p, []).append(ei)
    total_cols = length + sum(
        len(events[ei][2]) for eis in ins_by_pos.values() for ei in eis)
    mat = np.empty((n_alleles, total_cols), np.uint8)
    for p in range(length):
        for ei in ins_by_pos.get(p, ()):
            ln = len(events[ei][2])
            ins_cols[ei] = (col, ln)
            col += ln
        col_of[p] = col
        col += 1
    assert col == total_cols

    # render: ancestral everywhere, then vectorized event application
    mat[:, col_of] = bases[anc][None, :]
    for ei, (k, p, payload, _) in enumerate(events):
        rows = carry[:, ei]
        if k == "S":
            mat[rows, col_of[p]] = bases[payload]
        elif k == "D":
            for o in range(payload):
                mat[rows, col_of[p + o]] = ord(".")
    for ei, (c0, ln) in ins_cols.items():
        payload = events[ei][2]
        rows = carry[:, ei]
        mat[:, c0:c0 + ln] = ord(".")
        for o in range(ln):
            mat[rows, c0 + o] = ord(payload[o])

    # dedup rows (collapse_alleles would anyway; keep names deterministic)
    names = ["%s*%02d:%02d:%02d:%02d" % (gene, a // 1000 + 1,
                                         (a // 100) % 10 + 1,
                                         (a // 10) % 10 + 1, a % 10 + 1)
             for a in range(n_alleles)]
    rows = [m.tobytes().decode("ascii") for m in mat]

    exon_len = length // 6
    exons = [(exon_len, 2 * exon_len - 1),
             (3 * exon_len, 4 * exon_len - 1),
             (5 * exon_len, length - 11)]
    partial = {names[a] for a in range(n_alleles)
               if a > 0 and rng.random() < partial_frac}
    return dict(names=names, rows=rows, ref_allele=names[0], exons=exons,
                primary_exon_idx=(0, 1), partial=partial)
