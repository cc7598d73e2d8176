"""Simulator tests: reads must be exact allele substrings and the
truth-name variant lists must match the allele's variants over the read
span (the reference encodes the same info at typing_common.py:780-843)."""
import pytest

from hgtpu.db import build_gene_ref
from hgtpu.sim import simulate_reads, parse_truth_name
from hgtpu.utils.dna import revcomp
from tests.synth import make_gene_msa


@pytest.fixture(scope="module")
def generef():
    spec = make_gene_msa(seed=11)
    ref, _ = build_gene_ref(
        "A", spec["names"], spec["rows"], spec["ref_allele"],
        exons_ref_coords=spec["exons"], min_var_freq=0.0,
    )
    return ref


def test_reads_are_allele_substrings(generef):
    allele = generef.allele_names[3]
    aseq = generef.allele_seq(allele)
    r1, r2, np_ = simulate_reads(generef, [allele], simulate_interval=37)
    assert np_[0] == len(r1) == len(r2) > 0
    for r in r1:
        assert r.seq in aseq
    for r in r2:
        assert revcomp(r.seq) in aseq


def test_truth_vars_subset_of_allele_vars(generef):
    for allele in generef.allele_names[:8]:
        allele_vids = {generef.var_ids[i]
                       for i in generef.allele_var_indices(allele)}
        r1, r2, _ = simulate_reads(generef, [allele], simulate_interval=23)
        seen = set()
        for r in list(r1) + list(r2):
            t = parse_truth_name(r.name)
            assert not t["has_unknown"]
            for vid in t["vars"]:
                assert vid in allele_vids
                seen.add(vid)
            assert 0 <= t["pos"] < len(generef.backbone)
        # tiling at interval 23 with 100bp reads covers the allele densely;
        # every allele variant except ones within frag-end shadow appears
        assert len(seen) >= len(allele_vids) * 0.6 or len(allele_vids) == 0


def test_truth_cigar_consistent(generef):
    allele = generef.allele_names[5]
    r1, _, _ = simulate_reads(generef, [allele], simulate_interval=41)
    for r in r1:
        t = parse_truth_name(r.name)
        # CIGAR M lengths sum to read length
        import re
        ops = re.findall(r"(\d+)([MD])", t["cigar"])
        m = sum(int(n) for n, o in ops if o == "M")
        assert m == len(r.seq)
