"""Partial-allele exon grafting (ref: typing_process.py:646-730): alleles
known only from exon (nuc) alignments are spliced into genomic context
and participate in typing."""
import pytest

from hgtpu.db import build_gene_ref
from hgtpu.pipeline import type_reads
from hgtpu.sim import simulate_reads
from hgtpu.typer.engine import TypingOptions
from tests.synth import make_gene_msa, make_nuc_msa


@pytest.fixture(scope="module")
def generef():
    spec = make_gene_msa(seed=11, n_alleles=20, length=1800)
    nuc_names, nuc_rows = make_nuc_msa(spec, n_partial=3)
    ref, _ = build_gene_ref(
        "A", spec["names"], spec["rows"], spec["ref_allele"],
        exons_ref_coords=spec["exons"],
        primary_exon_idx=spec["primary_exon_idx"],
        partial_msa=(nuc_names, nuc_rows), min_var_freq=0.0)
    return ref


def test_partials_grafted(generef):
    partials = {n for n in generef.allele_names if n.startswith("A*90:")}
    assert len(partials) == 3
    assert partials <= generef.partial
    # grafted alleles' variants lie within exons (their non-exon sequence
    # is the consensus)
    for name in partials:
        for vi in generef.allele_var_indices(name):
            pos = int(generef.var_pos[vi])
            assert any(l <= pos <= r for l, r in generef.exons), \
                (name, pos, generef.exons)


def test_partial_allele_typing(generef):
    allele = sorted(generef.partial)[0]
    r1, r2, _ = simulate_reads(generef, [allele], simulate_interval=3)
    res = type_reads(generef, [(r.name, r.seq) for r in r1],
                     [(r.name, r.seq) for r in r2],
                     TypingOptions(simulation=True))
    names = [a for a, _ in res.prob[:3]]
    assert allele in names[:2], res.prob[:5]
