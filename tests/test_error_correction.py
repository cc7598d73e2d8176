"""Typing with sequencing errors: the mpileup-driven error correction
(ref: error_correct, typing_core.py:119-243) must absorb random errors so
the true allele still ranks #1 at high abundance."""
import pytest

from hgtpu.db import build_gene_ref
from hgtpu.pipeline import simulation_sweep
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


def test_sweep_with_errors(generef):
    n, results = simulation_sweep(
        generef, test_size=3, seed=5, simulate_interval=2,
        perbase_errorrate=1.0)
    assert n == 3
    for alleles, res in results:
        assert res.prob[0][0] == alleles[0]
        assert res.prob[0][1] > 0.95


def test_correction_rescues_reads(generef):
    # with correction off, errored reads keep novel mismatches (nm>0);
    # with correction on, coverage-backed bases are restored
    n_on, res_on = simulation_sweep(
        generef, test_size=2, seed=9, simulate_interval=2,
        perbase_errorrate=2.0,
        opts=TypingOptions(simulation=True, error_correction=True))
    assert n_on == 2


def test_mpileup_weighted_equals_expanded(generef):
    """add_alignments_bulk(weights=...) must equal feeding the duplicate
    alignments expanded — the pair-dedup pileup contract."""
    import numpy as np

    from hgtpu.align import GeneAligner
    from hgtpu.sim import simulate_reads
    from hgtpu.typer.mpileup import Mpileup

    al = GeneAligner(generef)
    r1, r2, _ = simulate_reads(generef, [generef.allele_names[5]],
                               simulate_interval=7, seed=2)
    outs = al.align_batches(
        [([r.name for r in r1], [r.seq for r in r1], "L"),
         ([r.name for r in r2], [r.seq for r in r2], "R")])
    alns = [a for g in outs for a in g if a is not None]
    w = [1 + (i % 3) for i in range(len(alns))]
    mp_w = Mpileup(generef)
    mp_w.add_alignments_bulk(alns, weights=w)
    mp_w.finalize()
    expanded = [a for a, wi in zip(alns, w) for _ in range(wi)]
    mp_e = Mpileup(generef)
    mp_e.add_alignments_bulk(expanded)
    mp_e.finalize()
    assert (mp_w.counts == mp_e.counts).all()
    assert (mp_w.rep == mp_e.rep).all()
