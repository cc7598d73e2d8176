"""SAM interop: export ReadAln records as SAM, and import SAM back.

The reference's entire data plane is SAM text through samtools pipes
(component #5, typing_common.py:1038-1056).  hgtpu keeps alignments
in memory, but emits/consumes the same SAM representation — including
HISAT2's Zs known-variant annotation (format `offset|S/I/D|varID`,
consumed at typing_core.py:876-944) — so reference tooling and ours
interoperate.
"""
from __future__ import annotations

from ..db.catalog import GeneRef


def aln_to_sam_fields(gene: GeneRef, aln, novel_ids=None):
    """One ReadAln -> (cigar, md, zs, nm) strings."""
    cigar = []
    md = []
    zs = []
    md_match = 0
    nm = 0
    read_pos = 0
    zs_prev_end = 0   # read offset after the last Zs event
    n_m = 0           # current CIGAR M run

    def flush_m():
        nonlocal n_m
        if n_m:
            cigar.append("%dM" % n_m)
            n_m = 0

    for entry in aln.cmp:
        kind, pos, length = entry[0], entry[1], entry[2]
        var_idx = entry[3] if len(entry) > 3 else None
        data = entry[4] if len(entry) > 4 else ""
        if kind == "match":
            n_m += length
            md_match += length
            read_pos += length
        elif kind == "mismatch":
            n_m += 1
            md.append("%d%s" % (md_match, gene.backbone[pos]))
            md_match = 0
            if var_idx is not None and var_idx >= 0:
                zs.append("%d|S|%s" % (read_pos - zs_prev_end,
                                       gene.var_ids[var_idx]))
                zs_prev_end = read_pos + 1
            else:
                nm += 1
            read_pos += 1
        elif kind == "deletion":
            flush_m()
            cigar.append("%dD" % length)
            md.append("%d^%s" % (md_match, gene.backbone[pos:pos + length]))
            md_match = 0
            if var_idx is not None and var_idx >= 0:
                zs.append("%d|D|%s" % (read_pos - zs_prev_end,
                                       gene.var_ids[var_idx]))
                zs_prev_end = read_pos
            else:
                nm += length
        else:  # insertion
            flush_m()
            cigar.append("%dI" % length)
            if var_idx is not None and var_idx >= 0:
                zs.append("%d|I|%s" % (read_pos - zs_prev_end,
                                       gene.var_ids[var_idx]))
                zs_prev_end = read_pos + length
            else:
                nm += length
            read_pos += length
    flush_m()
    md.append(str(md_match))
    return "".join(cigar), "".join(md), ",".join(zs), nm


def write_sam(path, gene: GeneRef, alns_by_read, rg_sample="hgtpu"):
    """alns_by_read: iterable of (read_id, [ReadAln])."""
    with open(path, "w") as f:
        print("@HD\tVN:1.6\tSO:queryname", file=f)
        print("@SQ\tSN:%s\tLN:%d" % (gene.backbone_name, len(gene.backbone)),
              file=f)
        print("@PG\tID:hgtpu\tPN:hgtpu", file=f)
        for read_id, alns in alns_by_read:
            alns = [a for a in alns if a is not None]
            for a in alns:
                flag = 0
                if len(alns) > 1:
                    flag |= 0x1 | 0x2
                    flag |= 0x40 if a.mate == "L" else 0x80
                if a.is_rc:
                    flag |= 0x10
                cigar, md, zs, nm = aln_to_sam_fields(gene, a)
                opt = "NM:i:%d\tMD:Z:%s\tNH:i:1" % (nm, md)
                if zs:
                    opt += "\tZs:Z:%s" % zs
                print("%s\t%d\t%s\t%d\t60\t%s\t*\t0\t0\t%s\t%s\t%s"
                      % (read_id, flag, gene.backbone_name, a.pos + 1, cigar,
                         a.seq, "I" * len(a.seq), opt), file=f)


def parse_sam_line(gene: GeneRef, line):
    """SAM line -> ReadAln-equivalent dict (pos, cigar ops, tags).

    Provides the reference's decode path (typing_core.py:805-844) for
    SAM produced by hisat2 or hgtpu.
    """
    cols = line.rstrip("\n").split("\t")
    read_id, flag, rname, pos, _mapq, cigar = cols[:6]
    seq = cols[9]
    tags = {}
    for col in cols[11:]:
        k, _t, v = col.split(":", 2)
        tags[k] = v
    return dict(read_id=read_id, flag=int(flag), rname=rname,
                pos=int(pos) - 1, cigar=cigar, seq=seq, tags=tags)
