"""Assembly + Viterbi phasing tests — hg_test3 equivalent: the phasing
call line must name the true allele(s)
(ref golden: `A: A*11:29 : A*11:29 (Group score: 1.00000)`)."""
import pytest

from hgtpu.db import build_gene_ref
from hgtpu.pipeline import type_reads
from hgtpu.sim import simulate_reads
from hgtpu.typer.engine import TypingOptions
from tests.synth import make_gene_msa


@pytest.fixture(scope="module")
def generef():
    spec = make_gene_msa(seed=11)
    ref, _ = build_gene_ref(
        "A", spec["names"], spec["rows"], spec["ref_allele"],
        exons_ref_coords=spec["exons"],
        primary_exon_idx=spec["primary_exon_idx"], min_var_freq=0.0,
    )
    return ref


def test_assembly_single_allele(generef):
    allele = generef.allele_names[7]
    r1, r2, _ = simulate_reads(generef, [allele], simulate_interval=2)
    res = type_reads(generef, [(r.name, r.seq) for r in r1],
                     [(r.name, r.seq) for r in r2],
                     TypingOptions(simulation=True, assembly=True))
    assert res.prob[0][0] == allele
    assert res.assembly_call is not None
    alleles, score = res.assembly_call
    assert alleles == [allele, allele]
    assert 10 ** score > 0.5
    assert res.contigs
    # contigs reconstruct (pieces of) the true allele sequence
    aseq = generef.allele_seq(allele)
    for key, seq in res.contigs.items():
        assert len(seq) > 100


def test_assembly_heterozygous(generef):
    a1, a2 = generef.allele_names[3], generef.allele_names[24]
    r1a, r2a, _ = simulate_reads(generef, [a1], simulate_interval=2)
    r1b, r2b, _ = simulate_reads(generef, [a2], simulate_interval=2)
    # interleave with distinct read ids
    reads_1 = [("%d|L_x" % i, r.seq) for i, r in enumerate(r1a + r1b)]
    reads_2 = [("%d|R_x" % i, r.seq) for i, r in enumerate(r2a + r2b)]
    res = type_reads(generef, reads_1, reads_2,
                     TypingOptions(simulation=False, assembly=True))
    top2 = {res.prob[0][0], res.prob[1][0]}
    assert top2 == {a1, a2}
    assert res.assembly_call is not None
    called = set(res.assembly_call[0])
    assert called == {a1, a2}


def test_pdf_per_base_zoom_text(tmp_path):
    """At high zoom (short loci) node rows must render per-base text
    (reference renderer parity, assembly_graph.py:1875-2230)."""
    import re
    import zlib

    from hgtpu.assemble.pdf import draw_assembly

    panels = [("a. Read alignment",
               [("n0", 0, 19, [5], "ACGTACGTACGTACGTACGT")])]
    p = draw_assembly(str(tmp_path / "zoom.pdf"), 60, panels,
                      exons=[(2, 30)])
    data = open(p, "rb").read()
    assert data.endswith(b"%%EOF\n")
    m = re.search(rb"stream\n(.*?)\nendstream", data, re.S)
    ops = zlib.decompress(m.group(1)).decode("latin-1")
    assert "(A) Tj" in ops and "(G) Tj" in ops
    # wide loci must not draw per-base text
    p2 = draw_assembly(str(tmp_path / "wide.pdf"), 3000,
                       [("a", [("n0", 0, 99, [5], "ACGT" * 25)])])
    m2 = re.search(rb"stream\n(.*?)\nendstream", open(p2, "rb").read(), re.S)
    ops2 = zlib.decompress(m2.group(1)).decode("latin-1")
    assert "(A) Tj" not in ops2


def _overlap_oracle(a, b, skipN=False):
    """Slow scalar oracle for AsmNode.overlap_with (the acceptance rule
    of assembly_graph.py:241-295, running-sum form) used to pin the
    vectorized implementation."""
    import sys
    from hgtpu.assemble.graph import (get_major_nt, get_ungapped_seq,
                                      get_ungapped_seq_pos, match_score)
    assert a.left <= b.left
    if a.right < b.left:
        return -1, -1, sys.maxsize
    seq = get_ungapped_seq(a.seq)
    other_seq = get_ungapped_seq(b.seq)
    i_left = get_ungapped_seq_pos(a.seq, b.left - a.left)
    for i in range(i_left - 5, i_left + 6):
        max_mm = 0.012 * (len(seq) - i)
        tmp_mm = 0.0
        for j in range(len(other_seq)):
            if i + j >= len(seq) or i + j < 0:
                break
            d1, d2 = seq[i + j], other_seq[j]
            nt, ont = get_major_nt(d1), get_major_nt(d2)
            mm = 0.0
            if skipN and (nt == "N" or ont == "N"):
                mm = 0.0
            elif nt != ont:
                mm = 1.0 - match_score(d1, d2)
                if d1[nt][1] != d2[ont][1]:
                    adj = min(1.0, d1[nt][0] / a.get_avg_cov()) \
                        * min(1.0, d2[ont][0] / b.get_avg_cov())
                    mm = max(1.0, 5.0 * adj)
            tmp_mm += mm
            if tmp_mm > max_mm:
                break
        if tmp_mm <= max_mm:
            return i, min(len(seq) - i, len(other_seq)), tmp_mm
    return -1, -1, sys.maxsize


def test_overlap_with_matches_oracle():
    """The vectorized overlap scan is bit-equal to the scalar acceptance
    rule on randomized nt-profile nodes (offset, overlap and score)."""
    import random

    from hgtpu.assemble.graph import AsmNode

    rng = random.Random(41)

    def make_node(nid, left, length):
        seq = []
        vars_ = []
        for p in range(length):
            r = rng.random()
            if r < 0.06:
                seq.append("D"); vars_.append("hvD%d" % (p % 7))
            elif r < 0.10:
                seq.append("I" + rng.choice("ACGT")); vars_.append("hvI")
            else:
                seq.append(rng.choice("ACGT"))
                vars_.append("" if rng.random() < 0.7 else "hv%d" % (p % 5))
        node = AsmNode(nid, left, seq, [60] * len(seq), vars_,
                       ref_seq="", ref_vars={}, mpileup=None)
        # thicken some columns with minority counts
        for d in node.seq:
            if rng.random() < 0.3:
                alt = rng.choice("ACGT")
                if alt in d:
                    d[alt][0] += rng.randint(1, 3)
                else:
                    d[alt] = [rng.randint(1, 3), ""]
        node.calculate_avg_cov()
        return node

    for trial in range(60):
        la = rng.randint(40, 90)
        a = make_node("a|L", 100, la)
        b = make_node("b|L", 100 + rng.randint(0, la + 4),
                      rng.randint(20, 80))
        if a.left > b.left or a.right < b.left:
            continue
        for skipN in (False, True):
            got = a.overlap_with(b, skipN)
            want = _overlap_oracle(a, b, skipN)
            assert got[0] == want[0] and got[1] == want[1], (trial, got, want)
            assert abs(got[2] - want[2]) < 1e-9 or got[2] == want[2]
