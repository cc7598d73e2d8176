"""CODIS STR database converter.

Equivalent of hisatgenotype_tools/hisatgenotype_convert_codis.py: turn STR
repeat-structure tables (NIST STRBase-style bracket notation, e.g.
"[TCTA]5 [TCTG]3 TCA [TCTA]9") into an MSF-style multiple alignment ready
for the DB compiler.  Where the reference merges allele repeat structures
with a repeat-aware Smith-Waterman (SW_alignment/combine_alleles,
convert_codis.py:283-301), the bracket blocks are aligned structurally:
each repeat block is padded to the maximum count observed across alleles,
which yields the same block-wise alignment for STR data.

Input table format (TSV): <allele name> <tab> <structure>
Flanking sequences are supplied separately (the reference pulls them from
GRCh38 via samtools faidx, :186).
"""
from __future__ import annotations

import re

_TOKEN = re.compile(r"\[([ACGT]+)\](\d+)|([ACGT]+)")


def parse_structure(s: str):
    """'[TCTA]5 TCA [TCTG]3' -> [("TCTA", 5), ("TCA", 1), ("TCTG", 3)]."""
    out = []
    for m in _TOKEN.finditer(s.replace(" ", "")):
        if m.group(1):
            out.append((m.group(1), int(m.group(2))))
        else:
            out.append((m.group(3), 1))
    return out


def align_structures(structs):
    """Block-align repeat structures: produce per-allele block count
    vectors over the union block layout.

    Returns (layout [(unit, max_count)], per-allele counts [list[int]]).
    Alleles walk their blocks against the layout greedily by unit match —
    the structural counterpart of the reference's repeat-aware SW merge.
    """
    layout = []
    per_allele = []
    for blocks in structs:
        counts = []
        li = 0
        for unit, count in blocks:
            # find this unit in the remaining layout
            j = li
            while j < len(layout) and layout[j][0] != unit:
                j += 1
            if j == len(layout):
                layout.append([unit, 0])
            # alleles that skipped layout blocks get zeros there
            while li < j:
                counts.append(0)
                li += 1
            counts.append(count)
            layout[li][1] = max(layout[li][1], count)
            li += 1
        per_allele.append(counts)
    # pad tails
    for counts in per_allele:
        counts.extend([0] * (len(layout) - len(counts)))
    return [(u, c) for u, c in layout], per_allele


def codis_msa(table, flank5="", flank3=""):
    """table: [(allele_name, structure string)] ->
    (names, msa rows) with '.' padding aligning repeat blocks."""
    names = [n for n, _ in table]
    structs = [parse_structure(s) for _, s in table]
    layout, per_allele = align_structures(structs)
    rows = []
    for counts in per_allele:
        row = [flank5]
        for (unit, max_count), count in zip(layout, counts):
            row.append(unit * count)
            row.append("." * (len(unit) * (max_count - count)))
        row.append(flank3)
        rows.append("".join(row))
    return names, rows


def convert_codis_table(path, flank5="", flank3=""):
    table = []
    for line in open(path):
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        name, struct = line.split("\t")[:2]
        table.append((name, struct))
    return codis_msa(table, flank5, flank3)
