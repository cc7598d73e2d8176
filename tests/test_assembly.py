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
