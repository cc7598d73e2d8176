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
