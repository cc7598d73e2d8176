"""Fuzz/edge-case hardening: randomized gene structures through the
db builder and aligner, differential native-vs-python verification."""
import random

import numpy as np
import pytest

from hgtpu.db import build_gene_ref
from hgtpu.utils.dna import encode_seq


def _random_msa(rng, n_alleles, length, gapiness=0.1):
    anc = "".join(rng.choice("ACGT") for _ in range(length))
    rows = []
    names = []
    for a in range(n_alleles):
        row = list(anc)
        for _ in range(rng.randrange(0, 8)):
            p = rng.randrange(length)
            op = rng.random()
            if op < 0.6:
                row[p] = rng.choice("ACGT")
            elif op < 0.6 + gapiness * 3:
                for q in range(p, min(length, p + rng.randint(1, 4))):
                    row[q] = "."
        names.append("F*%02d:01" % (a + 1))
        rows.append("".join(row))
    return names, rows


def test_db_builder_fuzz():
    rng = random.Random(99)
    for trial in range(15):
        n = rng.randint(2, 12)
        L = rng.randint(150, 600)
        names, rows = _random_msa(rng, n, L)
        ref, _ = build_gene_ref("F", names, rows, names[0],
                                min_var_freq=0.0)
        # reconstruction invariant must hold for every allele kept
        for name in ref.allele_names:
            i = names.index(name)
            assert ref.allele_seq(name) == rows[i].replace(".", ""), \
                (trial, name)


def test_all_identical_alleles():
    rows = ["ACGTACGTACGTACGTACGT" * 10] * 5
    names = ["X*%02d" % i for i in range(5)]
    ref, _ = build_gene_ref("X", names, rows, names[0], min_var_freq=0.0,
                            collapse=False)
    assert ref.n_vars == 0
    assert len(ref.haplotypes) == 0


def test_leading_trailing_gap_alleles():
    bb = "ACGT" * 60
    rows = [bb,
            "...." + bb[4:],          # missing start
            bb[:-4] + "....",         # missing end
            bb[:100] + "TTTT" + bb[104:]]
    names = ["X*01", "X*02", "X*03", "X*04"]
    ref, _ = build_gene_ref("X", names, rows, "X*01", min_var_freq=0.0,
                            collapse=False, leftshift=False)
    for name, row in zip(names, rows):
        if name in ref.allele_names:
            assert ref.allele_seq(name) == row.replace(".", "")


def test_native_differential_fuzz():
    from hgtpu.align.native_verify import NativeVerifier, native_available
    from hgtpu.align.verify import GeneVerifier

    if not native_available():
        pytest.skip("native library not built")
    rng = random.Random(5)
    from tests.synth import make_gene_msa
    # indel-heavy gene
    spec = make_gene_msa(seed=77, n_alleles=30, length=1500,
                         n_snp=40, n_del=25, n_ins=10)
    ref, _ = build_gene_ref("A", spec["names"], spec["rows"],
                            spec["ref_allele"], min_var_freq=0.0)
    nv = NativeVerifier(ref)
    pv = GeneVerifier(ref)
    reads, starts = [], []
    for _ in range(400):
        allele = ref.allele_names[rng.randrange(ref.n_alleles)]
        aseq = ref.allele_seq(allele)
        if len(aseq) < 120:
            continue
        p = rng.randrange(0, len(aseq) - 100)
        seq = list(aseq[p:p + 100])
        for _ in range(rng.randrange(0, 3)):
            j = rng.randrange(100)
            seq[j] = rng.choice("ACGT")
        codes = encode_seq("".join(seq))
        reads.append(codes)
        starts.append(rng.randrange(0, len(ref.backbone) - 50))
    cost, ops = nv.verify_flat(reads, starts)
    for i in range(len(reads)):
        exp = pv.verify(reads[i], starts[i])
        if exp is None:
            assert cost[i] == -1, i
        else:
            assert (int(cost[i]), ops[i]) == exp, i
